"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas kernels.

Decode is REAL for stdlib-parseable formats: BMP (header dims + pixel
array via `struct`) and WAV (via `wave`) decode actual bytes inside the
mapInPandas kernel. Exotic codecs (PNG/JPEG/video) need libraries not in
this environment, so `decode_media` raises NotImplementedError for them
unless a decoder is injected (`extract_features(decoder=...)`) — the
Spark-side schema, partitioning, UDF signatures and batch shapes are the
same either way.

Oracle-checkable queries: `multimodal_metadata` exercises the binary
column path JVM-side only (encode -> binary, length, sha2);
`multimodal_decode_bmp` synthesizes a real 24bpp BMP per document and
struct-parses it back, checked against the closed-form header math.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakeview_spark.plans.registry import register, t

# payload rows: (doc_id, media_type, payload BINARY, meta fields)
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(LongType())),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as an opaque binary payload column —
    the canonical shape of a multimodal dataset (bytes + metadata)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


# BMP layout constants (Windows BITMAPFILEHEADER + BITMAPINFOHEADER)
_BMP_HEADER_BYTES = 54
_BMP_W_MOD = 64  # synthesized width  = (n_bytes % 64) + 1
_BMP_H_MOD = 64  # synthesized height = ((n_bytes // 64) % 64) + 1


def synthesize_bmp(payload: bytes) -> bytes:
    """Wrap `payload` as the pixel array of a REAL 24bpp BMP (full
    BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes per the
    spec). Dimensions derive from len(payload) so tests and oracles have
    a closed form: w=(n%64)+1, h=((n//64)%64)+1."""
    n = len(payload)
    w = (n % _BMP_W_MOD) + 1
    h = ((n // _BMP_W_MOD) % _BMP_H_MOD) + 1
    stride = (w * 3 + 3) // 4 * 4
    pix = bytearray(stride * h)
    pix[: min(n, len(pix))] = payload[: len(pix)]
    file_header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER_BYTES + len(pix), 0, 0, _BMP_HEADER_BYTES)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(pix)


def decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    """Real BMP decode via struct: header dims + first pixel bytes as
    features. Negative biHeight (top-down rows) normalizes to abs()."""
    magic, _, _, _, pixel_offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, width, height = struct.unpack_from("<Iii", payload, 14)
    pix = payload[pixel_offset:]
    return width, abs(height), [int(b) for b in pix[:8]]


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Real WAV decode via the stdlib wave module: (sample rate,
    channels, first frame bytes as features)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        frames = wf.readframes(8)
        return wf.getframerate(), wf.getnchannels(), [int(b) for b in frames[:8]]


def decode_media(payload: bytes) -> tuple[int, int, list[int]]:
    """Magic-byte dispatch: BMP and WAV decode real bytes in-process;
    codec-library formats (PNG/JPEG/...) raise — inject a decoder via
    extract_features(decoder=...) on a cluster with codecs baked in."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "no stdlib decoder for this format; inject a decoder into "
        "extract_features(decoder=...) instead"
    )


# back-compat name: the decode entry point used by extract_features
decode_image = decode_media


def fake_decoder(payload: bytes) -> tuple[int, int, list[int]]:
    """Deterministic fake decoder for tests: 'decodes' bytes into a
    pseudo image whose dims/features derive from the payload alone."""
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) + 1
    features = [int(b) for b in payload[:8]]
    return width, height, features


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, list[int]]] = decode_media,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    Partitioning contract: payloads stay distributed (never collected);
    each Arrow batch hands the Python worker a bounded pdf. On a real
    cluster, repartition upstream by size so each task decodes a
    similar byte volume.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                width, height, features = decoder(bytes(payload))
                out.append((int(doc_id), mtype, width, height, features))
            yield pd.DataFrame(
                out, columns=["doc_id", "media_type", "width", "height", "features"]
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Frame-sampling analog for byte payloads: take one 'frame' byte
    every N bytes, JVM-side via substring stride (no Python)."""
    idx = F.sequence(F.lit(1), F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)))
    return media.select(
        "doc_id",
        F.transform(
            idx, lambda i: F.substring(F.col("payload").cast("string"), (i - 1) * every_n_bytes + 1, 1)
        ).alias("frames"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256,
           n_chars AS declared_chars,
           octet_length(encode(text)) - n_chars AS multibyte_overhead
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque binary column: byte size, digest,
    and declared-vs-actual size check — all JVM-side."""
    m = media_table(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return m.join(docs, "doc_id").select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.sha2("payload", 256).alias("payload_sha256"),
        F.col("n_chars").alias("declared_chars"),
        (F.col("n_bytes") - F.col("n_chars")).alias("multibyte_overhead"),
    )


_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixel_bytes", LongType()),
    ]
)


@register(
    "multimodal_decode_bmp",
    oracle=f"""
    SELECT doc_id,
           'image/bmp' AS media_type,
           CAST((octet_length(encode(text)) % {_BMP_W_MOD}) + 1 AS BIGINT) AS width,
           CAST(((octet_length(encode(text)) // {_BMP_W_MOD}) % {_BMP_H_MOD}) + 1 AS BIGINT) AS height,
           CAST((((octet_length(encode(text)) % {_BMP_W_MOD}) + 1) * 3 + 3) // 4 * 4
                * (((octet_length(encode(text)) // {_BMP_W_MOD}) % {_BMP_H_MOD}) + 1) AS BIGINT)
             AS pixel_bytes
    FROM documents
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL decode: each document's bytes are wrapped as a
    genuine 24bpp BMP (synthesize_bmp) and struct-parsed back
    (decode_bmp) — both inside Arrow-batched mapInPandas kernels, so the
    distributed plumbing and the byte-level codec are exercised
    together. The oracle is the closed-form header math (w=(n%64)+1,
    h=((n//64)%64)+1, pixel bytes = 4-byte-padded stride x h), so a
    decoder that misreads any header field hash-fails.

    Scale shape: two narrow mapInPandas stages, no shuffle; payload
    bytes never leave the executor."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [synthesize_bmp(bytes(p)) for p in pdf["payload"]],
                }
            )

    media = docs.mapInPandas(
        synth,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                width, height, _ = decode_bmp(raw)
                rows.append(
                    (int(doc_id), "image/bmp", width, height, len(raw) - _BMP_HEADER_BYTES)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "width", "height", "pixel_bytes"]
            )

    return media.mapInPandas(dec, schema=_DECODED_SCHEMA)


def encode_bmp(width: int, height: int, pixel_rows: bytes) -> bytes:
    """Build a real 24bpp BMP around an already-laid-out pixel buffer
    (rows padded to the 4-byte stride for ``width``) — the encode half
    of the resize kernel."""
    stride = (width * 3 + 3) // 4 * 4
    assert len(pixel_rows) == stride * height
    file_header = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_BYTES + len(pixel_rows), 0, 0, _BMP_HEADER_BYTES
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_rows), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(pixel_rows)


def resize_bmp_nearest(payload: bytes) -> bytes:
    """Nearest-neighbor 2x downsample of a 24bpp BMP: resized pixel
    (x, y) = source pixel (2x, 2y) on the stored row grid. Decodes the
    real header, re-encodes a real BMP at max(1, w//2) x max(1, h//2)."""
    magic, _, _, _, pixel_offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h = struct.unpack_from("<Iii", payload, 14)
    h = abs(h)
    buf = payload[pixel_offset:]
    stride = (w * 3 + 3) // 4 * 4
    new_w, new_h = max(1, w // 2), max(1, h // 2)
    new_stride = (new_w * 3 + 3) // 4 * 4
    out = bytearray(new_stride * new_h)
    for y in range(new_h):
        src_row = 2 * y * stride
        dst_row = y * new_stride
        for x in range(new_w):
            s = src_row + 6 * x
            d = dst_row + 3 * x
            out[d : d + 3] = buf[s : s + 3]
    return encode_bmp(new_w, new_h, bytes(out))


_RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixel_checksum", LongType()),
    ]
)

_RESIZE_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             (octet_length(encode(text)) % {_BMP_W_MOD}) + 1 AS w,
             ((octet_length(encode(text)) // {_BMP_W_MOD}) % {_BMP_H_MOD}) + 1 AS h
      FROM documents
    ),
    dims AS (
      SELECT doc_id, text, n,
             (w * 3 + 3) // 4 * 4 AS stride,
             greatest(w // 2, 1) AS new_w,
             greatest(h // 2, 1) AS new_h
      FROM d
    )
    SELECT doc_id,
           CAST(new_w AS BIGINT) AS width,
           CAST(new_h AS BIGINT) AS height,
           CAST(list_sum(flatten(list_transform(range(0, new_h), y ->
             list_transform(range(0, new_w * 3), k ->
               CASE WHEN (2 * y * stride + 6 * (k // 3) + (k % 3)) < n
                    THEN ascii(substr(text, (2 * y * stride + 6 * (k // 3) + (k % 3)) + 1, 1))
                    ELSE 0 END)))) AS BIGINT) AS pixel_checksum
    FROM dims
"""


@register("multimodal_resize_bmp", oracle=_RESIZE_ORACLE)
def multimodal_resize_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image RESIZE through the full codec chain: synthesize a BMP
    from each document's bytes, decode it, nearest-neighbor downsample
    2x on the stored pixel grid, RE-ENCODE a real BMP at the new
    dimensions, decode that again, and report the re-decoded dims plus
    the checksum of the resized pixel bytes (padding excluded).

    The oracle replays the whole chain in closed form — the synthesized
    pixel buffer is the document's (pure-ASCII) bytes zero-padded to
    stride x h, so resized pixel (x, y, c) is text byte
    2y*stride + 6x + c when in range — which means a resize kernel that
    misses the stride padding, the row mapping, or the re-encode header
    hash-fails. One narrow mapInPandas chain, no shuffle; payloads never
    leave the executor."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                resized = resize_bmp_nearest(synthesize_bmp(bytes(payload)))
                w, h, _ = decode_bmp(resized)
                buf = resized[_BMP_HEADER_BYTES:]
                stride = (w * 3 + 3) // 4 * 4
                checksum = sum(
                    buf[y * stride + 3 * x + c]
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                rows.append((int(doc_id), w, h, checksum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixel_checksum"]
            )

    return docs.mapInPandas(run, schema=_RESIZED_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(greatest(octet_length(encode(text)) // 100, 1) AS BIGINT) AS n_frames,
           array_to_string(
             list_transform(range(1, greatest(octet_length(encode(text)) // 100, 1) + 1),
                            i -> substr(text, (i - 1) * 100 + 1, 1)),
             '') AS frames_str
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling under the driver gate: one 'frame' byte every 100
    payload bytes via the JVM-side substring stride (`sample_frames`) —
    the video-frame-sampling analog for opaque byte payloads. Pure
    columnar, no Python kernel, no shuffle."""
    frames = sample_frames(media_table(spark, sf_dir), every_n_bytes=100)
    return frames.select(
        "doc_id",
        F.size("frames").cast("bigint").alias("n_frames"),
        F.concat_ws("", F.col("frames")).alias("frames_str"),
    )


_WAV_RATE_BASE = 8000


def synthesize_wav(payload: bytes) -> bytes:
    """Wrap `payload` as a REAL mono 8-bit WAV (stdlib wave writer):
    1 byte per frame, sample rate 8000 + (n % 8000) so tests and
    oracles have a closed form."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(_WAV_RATE_BASE + (len(payload) % _WAV_RATE_BASE))
        wf.writeframes(payload)
    return buf.getvalue()


_WAV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("head_checksum", LongType()),
    ]
)


@register(
    "multimodal_decode_wav",
    oracle=f"""
    SELECT doc_id,
           CAST({_WAV_RATE_BASE} + (octet_length(encode(text)) % {_WAV_RATE_BASE}) AS BIGINT)
             AS sample_rate,
           CAST(1 AS BIGINT) AS channels,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(
                  range(1, least(octet_length(encode(text)), 8) + 1),
                  i -> ascii(substr(text, i, 1)))) AS BIGINT) AS head_checksum
    FROM documents
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio decode: each document's bytes become the
    frames of a genuine mono 8-bit WAV (stdlib wave writer), decoded
    back with the stdlib wave reader inside one Arrow-batched
    mapInPandas kernel. Oracle = the closed-form header math (rate =
    8000 + n%8000, 1 byte/frame) plus the checksum of the first 8
    frames, so a reader that misparses the RIFF header or frame width
    hash-fails. Same no-shuffle shape as the BMP twin."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = synthesize_wav(bytes(payload))
                with wave.open(io.BytesIO(raw), "rb") as wf:
                    rate = wf.getframerate()
                    channels = wf.getnchannels()
                    n_frames = wf.getnframes()
                    head = wf.readframes(8)
                rows.append(
                    (int(doc_id), rate, channels, n_frames, sum(head))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "channels", "n_frames", "head_checksum"],
            )

    return docs.mapInPandas(run, schema=_WAV_SCHEMA)


_PATCH = 8

_PATCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("patch_y", LongType()),
        StructField("patch_x", LongType()),
        StructField("patch_w", LongType()),
        StructField("patch_h", LongType()),
        StructField("byte_sum", LongType()),
    ]
)

_PATCH_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             (octet_length(encode(text)) % {_BMP_W_MOD}) + 1 AS w,
             ((octet_length(encode(text)) // {_BMP_W_MOD}) % {_BMP_H_MOD}) + 1 AS h
      FROM documents
    ),
    dims AS (
      SELECT doc_id, text, n, w, h, (w * 3 + 3) // 4 * 4 AS stride,
             (w + {_PATCH} - 1) // {_PATCH} AS npx,
             (h + {_PATCH} - 1) // {_PATCH} AS npy
      FROM d
    ),
    px AS (
      SELECT doc_id,
             unnest(flatten(list_transform(range(0, npy), py ->
               list_transform(range(0, npx), px -> struct_pack(
                 patch_y := py,
                 patch_x := px,
                 patch_w := least(w - px * {_PATCH}, {_PATCH}),
                 patch_h := least(h - py * {_PATCH}, {_PATCH}),
                 byte_sum := list_sum(flatten(
                   list_transform(range(py * {_PATCH}, least(py * {_PATCH} + {_PATCH}, h)), y ->
                     list_transform(range(px * {_PATCH} * 3, least(px * {_PATCH} + {_PATCH}, w) * 3), k ->
                       CASE WHEN (y * stride + k) < n
                            THEN ascii(substr(text, y * stride + k + 1, 1))
                            ELSE 0 END))))
               ))))) AS p
      FROM dims
    )
    SELECT doc_id,
           CAST(p.patch_y AS BIGINT) AS patch_y,
           CAST(p.patch_x AS BIGINT) AS patch_x,
           CAST(p.patch_w AS BIGINT) AS patch_w,
           CAST(p.patch_h AS BIGINT) AS patch_h,
           CAST(p.byte_sum AS BIGINT) AS byte_sum
    FROM px
"""


@register("multimodal_patch_stats", oracle=_PATCH_ORACLE)
def multimodal_patch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction through the REAL codec chain: each
    document's bytes become a genuine 24bpp BMP, the decoded pixel grid
    is split into 8x8 patches (edge patches truncated, exactly like a
    ViT preprocessor on non-multiple dimensions), and every patch emits
    one row with its grid position, effective size, and pixel byte sum
    (stride padding excluded) — the per-patch reduction a patch-embed
    stage feeds from.

    The oracle replays the chain in closed form (patch (px, py) covers
    source bytes y*stride + 3x + c), so a patcher that misses the row
    stride, the truncated edge patches, or the pixel/padding boundary
    hash-fails. One Arrow-batched mapInPandas, no shuffle; the output
    fan-out is bounded by pixels / 64, never payload bytes."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(bytes(payload))
                w, h, _ = decode_bmp(bmp)
                buf = bmp[_BMP_HEADER_BYTES:]
                stride = (w * 3 + 3) // 4 * 4
                for py in range((h + _PATCH - 1) // _PATCH):
                    ph = min(_PATCH, h - py * _PATCH)
                    for px in range((w + _PATCH - 1) // _PATCH):
                        pw = min(_PATCH, w - px * _PATCH)
                        s = 0
                        for y in range(py * _PATCH, py * _PATCH + ph):
                            row0 = y * stride
                            s += sum(
                                buf[row0 + 3 * px * _PATCH : row0 + 3 * (px * _PATCH + pw)]
                            )
                        rows.append((int(doc_id), py, px, pw, ph, s))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "patch_y", "patch_x", "patch_w", "patch_h", "byte_sum"],
            )

    return docs.mapInPandas(run, schema=_PATCH_SCHEMA)


_AUDIO_WIN = 400  # 50 ms at the 8 kHz base rate

_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
    ]
)


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    w AS (
      SELECT doc_id, text, n,
             unnest(range(0, (n + {_AUDIO_WIN} - 1) // {_AUDIO_WIN})) AS win
      FROM d
    )
    SELECT doc_id,
           CAST(win AS BIGINT) AS window_idx,
           CAST(least(n - win * {_AUDIO_WIN}, {_AUDIO_WIN}) AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(
                  range(win * {_AUDIO_WIN} + 1, least(win * {_AUDIO_WIN} + {_AUDIO_WIN}, n) + 1),
                  i -> (ascii(substr(text, i, 1)) - 128) * (ascii(substr(text, i, 1)) - 128)))
             AS BIGINT) AS energy
    FROM w
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy through the REAL codec chain: each
    document's bytes become a genuine mono 8-bit WAV, the stdlib wave
    reader streams it back 400 frames (50 ms) at a time, and every
    window emits its bias-centered energy sum((s-128)^2) — the frame
    feature a speech/VAD pipeline computes first. Integer math, so the
    closed-form oracle (samples are the document's bytes) hash-checks
    the full synth -> decode -> window -> energy chain, including the
    short final window. One Arrow-batched mapInPandas, no shuffle;
    fan-out bounded by samples / 400."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = synthesize_wav(bytes(payload))
                with wave.open(io.BytesIO(raw), "rb") as wf:
                    win = 0
                    while True:
                        frames = wf.readframes(_AUDIO_WIN)
                        if not frames:
                            break
                        energy = sum((b - 128) * (b - 128) for b in frames)
                        rows.append((int(doc_id), win, len(frames), energy))
                        win += 1
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_idx", "n_samples", "energy"]
            )

    return docs.mapInPandas(run, schema=_ENERGY_SCHEMA)


# perceptual average-hash: 32 evenly spaced pixel-buffer samples,
# bit i set iff sample_i strictly exceeds the sample mean (compared as
# val*32 > sum — pure integer math, no division, engine-exact)
_PHASH_SAMPLES = 32

_PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


@register(
    "multimodal_phash_twins",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             (octet_length(encode(text)) % {_BMP_W_MOD}) + 1 AS w,
             ((octet_length(encode(text)) // {_BMP_W_MOD}) % {_BMP_H_MOD}) + 1 AS h
      FROM documents
    ),
    d AS (
      SELECT doc_id, text, n, ((w * 3 + 3) // 4 * 4) * h AS npix FROM m
    ),
    s AS (
      SELECT doc_id, text, n, i, (i * npix) // {_PHASH_SAMPLES} AS pos
      FROM d, unnest(range(0, {_PHASH_SAMPLES})) AS u(i)
    ),
    v AS (
      SELECT doc_id, i,
             CASE WHEN pos < n
                  THEN ascii(substr(text, CAST(pos + 1 AS INT), 1))
                  ELSE 0 END AS val
      FROM s
    ),
    tot AS (
      SELECT doc_id, i, val,
             sum(val) OVER (PARTITION BY doc_id) AS total
      FROM v
    ),
    ph AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN val * {_PHASH_SAMPLES} > total
                      THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS phash
      FROM tot GROUP BY doc_id
    )
    SELECT doc_id, phash,
           CAST(count(*) OVER (PARTITION BY phash) - 1 AS BIGINT) AS n_twins
    FROM ph
    """,
)
def multimodal_phash_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: an average-hash (aHash) per synthesized
    BMP — 32 evenly spaced samples of the REAL decoded pixel buffer,
    bit set where the sample exceeds the mean — and, per document, how
    many OTHER documents share its hash. Identical phash == perceptually
    identical image; this is the image-side analogue of text SimHash,
    and the twin counts are the dedup work list. The codec chain is
    real (synthesize_bmp -> struct-parse header -> pixel array inside
    the Arrow kernel); the oracle replays the closed-form layout math
    (pixel buffer = text bytes zero-padded to stride x h — the current
    testdata is pure ASCII, so character indexing equals byte indexing;
    were that to drift, this oracle hash-fails loudly).

    Scale shape: one narrow mapInPandas (payloads never shuffle), then
    ONE shuffle of the 16-byte (doc_id, phash) pairs for the twin-count
    window — partition sizes bounded by the hash's collision count."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = synthesize_bmp(bytes(payload))
                # real decode: header -> pixel offset -> pixel buffer
                _, _, _, _, pixel_offset = struct.unpack_from("<2sIHHI", raw, 0)
                pix = raw[pixel_offset:]
                npix = len(pix)
                vals = [
                    pix[(i * npix) // _PHASH_SAMPLES]
                    for i in range(_PHASH_SAMPLES)
                ]
                total = sum(vals)
                phash = 0
                for i, val in enumerate(vals):
                    if val * _PHASH_SAMPLES > total:
                        phash |= 1 << i
                rows.append((int(doc_id), phash))
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    hashed = docs.mapInPandas(run, schema=_PHASH_SCHEMA)
    twins = (F.count("*").over(Window.partitionBy("phash")) - 1).cast("bigint")
    return hashed.select("doc_id", "phash", twins.alias("n_twins"))
