"""Table-maintenance operators: small-file compaction and z-order
layout clustering — the two rewrites a lakehouse runs to keep scans
fast as data accretes (the read-side counterparts of the reference's
compaction_backlog signal and pipeline/export.py's write-edge sizing).

- `compact_files`: rewrite a parquet directory's many small files into
  few size-targeted files. Content-preserving (same rows, schema), and
  the new file count comes from measured bytes, not guesses. This is
  the maintenance action `compaction_backlog` (plans/analytics.py)
  tells an operator to schedule.
- `zorder_write`: cluster a dataset on an interleaved-bit Morton code
  over N columns so multi-dimensional range predicates touch few
  files. Pure columnar bit math (rank via ntile -> bit interleave via
  shifts), `repartitionByRange` on the code, one file per range — the
  standard Delta/Hudi OPTIMIZE ZORDER shape re-expressed in open
  Spark.
- `file_pruning_stats`: the honest effectiveness metric — per-file
  min/max footers for the clustered columns vs a query box; the
  fraction of files whose range intersects the box is exactly what a
  min/max-pruning scan must read.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite `src_dir` (parquet) into `dst_dir` with files sized to
    ~`target_file_bytes`. Returns the output file count. File count =
    ceil(actual on-disk bytes / target): measured from the source
    listing (one driver-side stat sweep over file METADATA — the same
    scale as any parquet footer read), never from row sampling, so
    compressed size drives the plan."""
    total = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(src_dir, "*.parquet"))
    ) or 1
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return len(glob.glob(os.path.join(dst_dir, "*.parquet")))


_ZBITS = 16  # max bits per dimension in the Morton code (65k ranks each)


def _bits_per_dim(n_dims: int) -> int:
    """Bits per dimension so the full code fits a SIGNED long: the top
    interleaved position is (bits-1)*n + (n-1) <= 62. 2 dims -> 16 bits
    (capped), 3 -> 16, 4 -> 15, 8 -> 7."""
    if n_dims < 1:
        raise ValueError("zorder needs at least one column")
    return min(_ZBITS, 63 // n_dims)


def _interleave(cols: list[str], bits: int) -> F.Column:
    """Morton code: bit i of dimension d lands at position
    i * n_dims + d. Pure integer shifts — whole-stage codegen."""
    n = len(cols)
    code = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        for i in range(bits):
            bit = F.shiftright(F.col(c), i).bitwiseAND(F.lit(1))
            code = code + (bit.cast("long") * F.lit(1 << (i * n + d)).cast("long"))
    return code


def zorder_write(
    df: DataFrame,
    cols: list[str],
    dst_dir: str,
    n_files: int = 16,
) -> None:
    """Write `df` clustered on the z-order (Morton) code of `cols`:
    each column is rank-normalized to _ZBITS bits with a percent_rank
    (ties keep equal ranks, so equal values never split across bit
    patterns), codes interleave the bits, and `repartitionByRange` on
    the code gives each output file a contiguous z-range — multi-dim
    locality with ONE range shuffle, no UDFs.

    percent_rank is one window over the full dataset; at 100 TB swap
    in approxQuantile cut-points for the rank stage (same code shape,
    sampled bounds) — the interleave and range-write stages are
    unchanged."""
    from pyspark.sql.window import Window

    bits = _bits_per_dim(len(cols))
    ranked = df
    rank_cols = []
    for c in cols:
        rc = f"__zr_{c}"
        ranked = ranked.withColumn(
            rc,
            (
                F.percent_rank().over(Window.orderBy(F.col(c)))
                * ((1 << bits) - 1)
            ).cast("int"),
        )
        rank_cols.append(rc)
    coded = ranked.withColumn("__z", _interleave(rank_cols, bits)).drop(*rank_cols)
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dst_dir)
    )


def file_pruning_stats(
    dst_dir: str, col_bounds: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files_needed, files_total) for a conjunctive range query under
    min/max pruning: a file must be read iff every queried column's
    [min, max] footer range intersects the query box. Reads only
    parquet FOOTERS (pyarrow), exactly the metadata a pruning scan
    uses."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(dst_dir, "*.parquet")))
    needed = 0
    for path in files:
        md = pq.ParquetFile(path).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                name = schema_names[ci]
                if name not in col_bounds:
                    continue
                st = md.row_group(rg).column(ci).statistics
                # a statistics object can exist with min/max unset —
                # treat it the same as absent stats (unprunable file)
                if st is None or not st.has_min_max:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        # a file missing statistics for ANY queried column cannot be
        # pruned — a min/max scan must read it (never assume skippable)
        if all(
            name not in mins or not (maxs[name] < lo or mins[name] > hi)
            for name, (lo, hi) in col_bounds.items()
        ):
            needed += 1
    return needed, len(files)
