"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas kernels.

The image/audio codecs are not installed in this environment, so the
decode step is STUBBED: `decode_image` raises NotImplementedError unless
a deterministic fake decoder is injected (tests inject one). What IS real
and tested: the Spark-side schema, partitioning, UDF signatures and batch
shapes — the parts that matter for running this on a cluster.

The oracle-checkable query (`multimodal_metadata`) exercises the binary
column path end-to-end with JVM-side functions only (encode -> binary,
length, sha2) — no Python in the row path.
"""

from __future__ import annotations

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


def decode_image(payload: bytes) -> tuple[int, int, list[int]]:
    """Stub decoder: real image decoding needs PIL/opencv (not in this
    container). Swap in a real decoder on a cluster with codecs baked in."""
    raise NotImplementedError(
        "image decoding requires an image codec library; inject a decoder "
        "into extract_features(decoder=...) instead"
    )


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
    decoder: Callable[[bytes], tuple[int, int, list[int]]] = decode_image,
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
