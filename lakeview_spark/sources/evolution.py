"""Schema evolution over long-lived parquet datasets: footer-only drift
audit + schema-aligned reads.

A 100 TB corpus is written over months by changing producers, so its
shards drift: columns appear, ints widen, fields reorder. Two
disciplines make that survivable:

1. **Audit before read.** `schema_report` scans ONLY parquet footers —
   never data pages — one task per file batch, fully distributed: the
   file list comes from Spark's binaryFile source with the `content`
   column pruned away (so no payload bytes move), and each executor
   opens its files with pyarrow and reads the metadata tail. At 100 TB
   / millions of shards this is minutes of metadata I/O, not a data
   scan; the driver only ever sees the aggregated drift groups.
2. **Read through a contract.** `read_aligned` reads with the TARGET
   schema passed as the explicit parquet read schema — Spark's reader
   then fills columns missing from a file with typed NULLs and widens
   compatible numerics (int32 file -> bigint contract) per file.
   Notably `mergeSchema` CANNOT do this: schema merge requires equal
   per-column types and throws CANNOT_MERGE_SCHEMAS on an int->bigint
   widening (measured on 4.1) — so the contract read is both the
   faster path (no schema-merge file pass) and the more tolerant one.
   For HARD drift (incompatible physical types, e.g. a string-typed id
   era), `per_group=True` reads each footer-report schema group under
   its own native schema and aligns with try_cast (Spark 4 ANSI: a bad
   cell must become NULL, not a failed stage; same rule as
   sources/records.py).

The reference engine reads single-writer metadata files and has no
analogue; this is a beyond-reference ingestion operator in the same
family as the JSONL/CSV corrupt-line audit.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_REPORT_SCHEMA = (
    "path string, num_rows bigint, n_row_groups int, n_cols int, "
    "schema_fp string, columns string"
)


def _footer_scan(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Executor-side kernel: per file path, open the parquet footer with
    pyarrow (metadata tail only — no data pages) and emit row counts
    plus a canonical schema fingerprint (md5 of the sorted
    name:type list, so column ORDER does not split groups but any
    name/type change does)."""
    import hashlib

    import pyarrow.parquet as pq

    for pdf in pdfs:
        out = []
        for path in pdf["path"]:
            # binaryFile yields URIs (file:/t/x or file:///t/x); pyarrow
            # wants a plain local path for the local filesystem
            local = path
            if local.startswith("file://"):
                local = local[len("file://"):]
            elif local.startswith("file:"):
                local = local[len("file:"):]
            pf = pq.ParquetFile(local)
            md = pf.metadata
            arrow_schema = pf.schema_arrow
            cols = sorted(
                (field.name, str(field.type)) for field in arrow_schema
            )
            canon = ";".join(f"{n}:{t}" for n, t in cols)
            out.append(
                (
                    path,
                    md.num_rows,
                    md.num_row_groups,
                    len(cols),
                    hashlib.md5(canon.encode()).hexdigest()[:16],
                    json.dumps(cols),
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "path",
                "num_rows",
                "n_row_groups",
                "n_cols",
                "schema_fp",
                "columns",
            ],
        )


def schema_report(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per parquet file under `path_glob` with its row count and
    schema fingerprint. Footer-only and distributed: the binaryFile
    source provides the listing (content column never selected, so no
    payload I/O), and the pyarrow footer reads run on the executors."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path_glob)
        .select("path")  # prunes `content` out of the scan
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return files.mapInPandas(_footer_scan, schema=_REPORT_SCHEMA)


def drift_groups(report: DataFrame) -> DataFrame:
    """The audit readout: one row per distinct schema shape with file
    and row counts — a healthy dataset has one group; every extra group
    is a producer era that needs an alignment rule before training."""
    return (
        report.groupBy("schema_fp", "columns")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("num_rows").alias("n_rows"),
            F.min("path").alias("example_path"),
        )
        .orderBy(F.desc("n_files"), "schema_fp")
    )


def _align(df: DataFrame, target: StructType) -> DataFrame:
    present = {c.lower() for c in df.columns}
    cols = []
    for field in target.fields:
        if field.name.lower() in present:
            cols.append(
                F.col(field.name).try_cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_aligned(
    spark: SparkSession,
    path_glob: str,
    target: StructType,
    per_group: bool = False,
) -> DataFrame:
    """Read a drifted dataset onto an explicit schema contract.

    Default (fast path): the contract IS the parquet read schema — one
    scan, per-file NULL-fill for missing columns, per-file numeric
    widening, untargeted drifted columns never read. This covers the
    normal evolution story (columns added, fields reordered, ints
    widened) and is what a daily training job should run.

    `per_group=True` (hard drift): each schema group from the footer
    report is read under its own native schema and aligned with
    try_cast — the path for datasets where an era changed a column's
    KIND (string id vs numeric id), which no single read schema can
    express. The driver holds one example path + file list per GROUP
    (groups are few — producer eras, not files); an incompatible cell
    becomes a NULL, never a failed stage."""
    if not per_group:
        return spark.read.schema(target).parquet(path_glob)
    report = schema_report(spark, path_glob)
    groups = (
        report.groupBy("schema_fp")
        .agg(F.collect_list("path").alias("paths"))
        .collect()
    )
    out = None
    for g in groups:
        era_schema = spark.read.parquet(g.paths[0]).schema
        era = _align(
            spark.read.schema(era_schema).parquet(*g.paths), target
        )
        out = era if out is None else out.unionByName(era)
    if out is None:
        return spark.createDataFrame([], target)
    return out
