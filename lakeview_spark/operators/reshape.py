"""Reshape operators: pivot (long -> wide) and unpivot (wide -> long).

The long<->wide round trip every reporting/feature layer needs:
`pivot_counts` turns a (group, category, value) stream into one row per
group with a column per category (Spark `groupBy().pivot()` — compiled
into conditional aggregates, one shuffle on the group key), and
`unpivot_columns` inverts it with `DataFrame.unpivot` (pure map, no
shuffle; it builds the melt from column objects — the earlier stack()
SQL-string form broke on quoted/backticked column names).

Scale notes: pivot with an EXPLICIT category list (always pass one) is
a single hash aggregate — without the list Spark first runs a distinct
scan over the category column to discover it, which is a second job and
an unbounded-width risk. Wide-side columns are bounded by the category
count, never by row count; unpivot is narrow.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    categories: Sequence[str],
    agg: Optional[F.Column] = None,
) -> DataFrame:
    """One row per ``group_cols``, one column per category in
    ``categories`` (explicit list — see module note), cells = ``agg``.
    With the default count aggregate, missing cells coalesce to 0
    bigint so the wide table is dense and join-ready; a caller-supplied
    ``agg`` keeps its own type and NULL for missing cells (coercing an
    avg/sum to bigint-0 would silently corrupt it)."""
    counting = agg is None
    agg = F.count(F.lit(1)) if counting else agg
    wide = df.groupBy(*group_cols).pivot(pivot_col, list(categories)).agg(agg)
    if not counting:
        return wide
    return wide.select(
        *group_cols,
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in categories],
    )


def unpivot_columns(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    key_name: str = "category",
    value_name: str = "value",
) -> DataFrame:
    """Inverse of :func:`pivot_counts`: melt ``value_cols`` back into
    (key, value) rows via the built-in ``DataFrame.unpivot`` (an Expand
    node — a pure projection, no shuffle). The built-in resolves column
    names as identifiers rather than interpolating them into a SQL
    string, so names containing quotes/backticks melt correctly."""
    return df.unpivot(
        list(id_cols), list(value_cols), key_name, value_name
    )
