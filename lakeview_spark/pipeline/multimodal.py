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
