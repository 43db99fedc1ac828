"""Custom aggregate/table-function surface (SURVEY §2.10 tail):

- `weighted_median_udaf`: a GROUPED_AGG pandas UDF — the Arrow-batched
  custom-aggregate escape hatch for statistics Spark lacks natively
  (exact weighted median). Used per group via ``groupBy().agg()``; the
  whole group's column arrives as one pandas Series, so this is for
  bounded groups (per-type telemetry, per-partition stats), not
  unbounded keys — the same contract as any holistic aggregate.
- `ngram_udtf`: a Python UDTF (Spark 4) emitting (position, ngram)
  rows per input string. The columnar `zip_with`-based shingle
  expression (pipeline/dedup.py) is the HOT-PATH form — the UDTF
  exists as the lateral-join escape hatch for logic that genuinely
  cannot be a column expression; the test asserts the two agree so the
  slow path can never drift from the fast one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def weighted_median_udaf(values: pd.Series, weights: pd.Series) -> float:
    """Exact weighted median: smallest v whose cumulative weight reaches
    half the total. Deterministic: ties resolved by value order."""
    df = pd.DataFrame({"v": values, "w": weights}).sort_values(
        ["v"], kind="mergesort"
    )
    total = float(df["w"].sum())
    if total <= 0:
        return float("nan")
    cum = df["w"].cumsum()
    return float(df.loc[cum >= total / 2.0, "v"].iloc[0])


@udtf(returnType="pos: int, ngram: string")
class ngram_udtf:
    """Lateral table function: word n-grams with their positions."""

    def __init__(self):
        self.n = 3

    def eval(self, text: str):
        if text is None:
            return
        toks = text.lower().split(" ")
        for i in range(max(len(toks) - self.n + 1, 0)):
            yield i, " ".join(toks[i : i + self.n])
