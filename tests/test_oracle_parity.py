"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from lakeview_spark.plans import QUERIES, ORACLES
from tests.oracle_util import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


# graph-ANN parity instances replay the full index build + unrolled
# beam search in BOTH engines (~4-5 min of the suite on their own);
# they run in the slow tier (the builder's close battery) — each was
# driver-window green in r14 and the every-round sf0.01 oracle sweep
# re-verifies them regardless of tier
_SLOW_PARITY = {
    "similarity_ann_graph",
    "eval_graph_ann_recall",
    "eval_graph_ann_recall_clustered",
    "eval_graph_upsert_recall",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in sorted(ORACLES)
    ],
)
def test_oracle_parity(spark, duck, name):
    issues = compare(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])
    assert not issues, f"{name}: " + "; ".join(issues)


def test_all_queries_run(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
