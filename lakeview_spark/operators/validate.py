"""Declarative data-quality gates (the Deequ/Great-Expectations shape):
a constraint suite evaluated against a DataFrame in ONE aggregation
pass, returning a small report frame the pipeline can assert on, store,
or diff across runs.

Why one pass matters at 100 TB: each constraint is expressed as a
scalar aggregate (a conditional count, a distinct count, a min/max), so
the whole suite compiles into a single aggregation job over one scan —
partial-aggregable, no per-constraint job. Without a `unique`
constraint the plan's only exchange is the final 1-row combine; exact
uniqueness adds the one keyed exchange exact distinct inherently
requires (Spark plans it as a two-phase aggregate on the column —
still the same single job and scan, pinned by test). The only
constraint that cannot ride the pass at all is referential containment
(it needs the other table); it runs as one LEFT ANTI join per
reference, with the reference keys deduplicated and broadcastable when
small.

The report is data, not an exception: a failed gate on shard 40,000 of
a crawl should surface as a row (constraint, passed, observed,
expected) the orchestrator can route on — same crash-containment
philosophy as sources/records.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative expectation. `kind` selects the metric:

    - not_null(col, min_rate): non-null share >= min_rate
    - unique(col): exact distinct count == row count. NULLs are
      violations: countDistinct ignores them, so any NULL (or a
      duplicated NULL) makes distinct < rows and the gate fails —
      a key column must be both present and unique (r7 ADVICE: the
      old verdict compared against the NON-NULL count, so an
      all-NULL column passed silently)
    - in_range(col, lo, hi): every non-null value within [lo, hi]
    - accepted_values(col, values): every non-null value in the set
    - row_count(lo, hi): table row count within [lo, hi]
    - matches(col, regex, min_rate): share of non-null values fully
      matching the anchored regex >= min_rate
    """

    name: str
    kind: str
    col: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    min_rate: float = 1.0
    regex: str | None = None


def not_null(col: str, min_rate: float = 1.0) -> Constraint:
    return Constraint(f"not_null({col})", "not_null", col=col, min_rate=min_rate)


def unique(col: str) -> Constraint:
    return Constraint(f"unique({col})", "unique", col=col)


def in_range(col: str, lo: float, hi: float) -> Constraint:
    return Constraint(f"in_range({col})", "in_range", col=col, lo=lo, hi=hi)


def accepted_values(col: str, values: Sequence) -> Constraint:
    return Constraint(
        f"accepted_values({col})", "accepted_values", col=col, values=tuple(values)
    )


def row_count(lo: int, hi: int | None = None) -> Constraint:
    return Constraint("row_count", "row_count", lo=lo, hi=hi)


def matches(col: str, regex: str, min_rate: float = 1.0) -> Constraint:
    return Constraint(
        f"matches({col})", "matches", col=col, regex=regex, min_rate=min_rate
    )


def _metric(c: Constraint) -> F.Column:
    """The scalar aggregate carrying everything `_verdict` needs —
    every kind reduces to counts so the whole suite is one Aggregate."""
    col = F.col(c.col) if c.col else None
    if c.kind == "not_null":
        return F.count(col)  # non-null count
    if c.kind == "unique":
        return F.countDistinct(col)
    if c.kind == "in_range":
        return F.sum(
            F.when(col.isNotNull() & ~col.between(c.lo, c.hi), 1).otherwise(0)
        )  # violations
    if c.kind == "accepted_values":
        return F.sum(
            F.when(col.isNotNull() & ~col.isin(*c.values), 1).otherwise(0)
        )  # violations
    if c.kind == "row_count":
        return F.lit(0)  # rides n_rows
    if c.kind == "matches":
        return F.sum(
            F.when(col.isNotNull() & col.rlike(f"^(?:{c.regex})$"), 1).otherwise(0)
        )  # full-match count
    raise ValueError(f"unknown constraint kind: {c.kind}")


def _verdict(c: Constraint, observed: float, n_rows: int, n_nonnull: dict) -> tuple:
    if c.kind == "not_null":
        rate = observed / n_rows if n_rows else 1.0
        return rate >= c.min_rate, rate, c.min_rate
    if c.kind == "unique":
        # distinct NON-NULL count must cover every row: a NULL key (or
        # a duplicate) leaves observed < n_rows and fails the gate
        return observed == n_rows, observed, n_rows
    if c.kind in ("in_range", "accepted_values"):
        return observed == 0, observed, 0
    if c.kind == "row_count":
        hi = c.hi if c.hi is not None else float("inf")
        return c.lo <= n_rows <= hi, n_rows, c.lo
    if c.kind == "matches":
        nn = n_nonnull.get(c.col, n_rows)
        rate = observed / nn if nn else 1.0
        return rate >= c.min_rate, rate, c.min_rate
    raise ValueError(c.kind)


def check(df: DataFrame, constraints: Sequence[Constraint]) -> DataFrame:
    """Evaluate the suite in ONE aggregation job and return a report
    DataFrame (constraint, kind, column, passed, observed, expected).
    The aggregate row is tiny (one scalar per constraint), so the
    collect is bounded by the suite size, never the data."""
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    # the matches verdict rates against the column's non-null count;
    # gather those alongside in the same pass (unique compares against
    # n_rows so NULL keys fail — no extra aggregate needed)
    need_nn = {c.col for c in constraints if c.kind == "matches" and c.col}
    for col in sorted(need_nn):
        aggs.append(F.count(F.col(col)).alias(f"__nn_{col}"))
    for i, c in enumerate(constraints):
        aggs.append(_metric(c).alias(f"__m_{i}"))
    row = df.agg(*aggs).collect()[0]
    n_rows = row["__n_rows"]
    n_nonnull = {col: row[f"__nn_{col}"] for col in need_nn}
    report = []
    for i, c in enumerate(constraints):
        observed = row[f"__m_{i}"] or 0
        passed, obs, exp = _verdict(c, observed, n_rows, n_nonnull)
        report.append(
            (c.name, c.kind, c.col, bool(passed), float(obs), float(exp))
        )
    return spark.createDataFrame(
        report,
        "constraint string, kind string, column string, passed boolean, "
        "observed double, expected double",
    )


def contained_in(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str
) -> DataFrame:
    """Referential containment as its own (single) join job: rows of
    `df` whose `col` has no match in `ref.ref_col`. The reference key
    set is deduplicated first, so for dimension-sized references the
    anti join broadcasts. Returns the VIOLATIONS frame — empty means
    the gate passed — so the caller can count it, sample it, or
    quarantine it without re-running anything."""
    keys = ref.select(F.col(ref_col).alias(col)).distinct()
    return df.filter(F.col(col).isNotNull()).join(keys, col, "left_anti")
