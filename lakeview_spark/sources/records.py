"""Record-file formats: JSONL and CSV read/write with EXPLICIT schemas.

Training corpora arrive as newline-delimited JSON or CSV at least as
often as parquet; these helpers wrap Spark's native readers/writers
with the two disciplines that matter at 100 TB:

1. **Never infer schemas.** `spark.read.json(path)` with no schema runs
   a full extra pass over the data just to guess types (and guesses
   differently as the data drifts). Every reader here REQUIRES a
   StructType, so the scan is one pass and the output schema is a
   contract, not an observation.
2. **Malformed rows are data, not crashes.** Readers run PERMISSIVE
   with a `_corrupt_record` column retained on request, so a bad line
   in shard 40,000 of a crawl surfaces as a countable row instead of a
   failed stage. `read_jsonl(..., keep_corrupt=True)` is the audit
   path; the default drops the column for clean consumption.

JSONL and CSV files ARE line-splittable (unlike the single-row-group
parquet testdata, SCALE.md §6), so Spark parallelizes a single large
file across tasks by byte ranges — these formats need no
repartition-after-scan workaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _keeps_corrupt(schema: StructType, keep_corrupt: bool) -> bool:
    """A caller whose EXPLICIT schema already carries the corrupt column
    has asked for it — dropping it would hand back a frame that
    violates their own schema contract — so the drop is skipped either
    when keep_corrupt is set or when the schema names the column."""
    return keep_corrupt or any(f.name == _CORRUPT for f in schema.fields)


def _with_corrupt(schema: StructType) -> StructType:
    """PERMISSIVE mode only materializes the corrupt column if the read
    schema carries it."""
    if any(f.name == _CORRUPT for f in schema.fields):
        return schema
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Newline-delimited JSON under an explicit schema. PERMISSIVE:
    fields missing from a line are NULL, unparseable lines become a row
    whose `_corrupt_record` holds the raw line (kept only when
    `keep_corrupt`, else dropped after the scan)."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return df if _keeps_corrupt(schema, keep_corrupt) else df.drop(_CORRUPT)


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write as newline-delimited JSON (Spark's json writer emits one
    JSON object per line — JSONL by construction). `partitions` bounds
    the output file count via coalesce (no shuffle); leave None to keep
    the upstream partitioning."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV under an explicit schema (never inferSchema — that is a full
    extra pass). PERMISSIVE with the same corrupt-record contract as
    read_jsonl."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )
    return df if _keeps_corrupt(schema, keep_corrupt) else df.drop(_CORRUPT)


def write_csv(
    df: DataFrame, path: str, header: bool = True, partitions: int | None = None
) -> None:
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def corrupt_record_stats(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Ingest audit for a JSONL drop: total lines, unparseable lines,
    corrupt share — the first telemetry to check on a new crawl shard.

    Deliberately NOT built on the PERMISSIVE `_corrupt_record` column:
    Spark refuses raw-scan queries whose referenced columns are only
    the corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), which is exactly the shape an audit aggregate has. A text
    scan + `from_json` (NULL on parse failure) counts the same lines
    with no such restriction: one splittable pass, one scalar
    aggregation."""
    raw = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        _with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    # `from_json` yields a NULL struct (not a populated corrupt column)
    # for empty/blank lines, so both conditions are needed: a line is
    # corrupt when it failed to parse into a struct at all OR when the
    # struct carries the corrupt-record payload (r5 ADVICE finding —
    # the corrupt-column check alone counts blank lines as clean).
    corrupt = F.when(
        parsed.isNull() | parsed.getField(_CORRUPT).isNotNull(), 1
    ).otherwise(0)
    return raw.agg(
        F.count("*").alias("n_rows"),
        F.sum(corrupt).cast("bigint").alias("n_corrupt"),
        (F.sum(corrupt).cast("double") / F.count("*")).alias("corrupt_share"),
    )
