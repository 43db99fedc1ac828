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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    issues = compare(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])
    assert not issues, f"{name}: " + "; ".join(issues)


def test_all_queries_run(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
