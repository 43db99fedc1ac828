"""Testdata physical-schema probe.

Round 3 regenerated /root/testdata with events.ts as TIMESTAMP(MICROS)
instead of TIMESTAMP(NANOS) and the engine crashed 7 queries before any
test named the real cause. This probe makes the next silent data change
fail in ONE line with the observed-vs-expected types spelled out.

Intentionally pure-pyarrow (no SparkSession): it runs in milliseconds
and fails before the expensive suites touch the data.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# column -> set of acceptable arrow types. Multi-member sets are types
# the engine explicitly dtype-dispatches on (see
# lakeview_spark/plans/registry.py:events_ts_us); single-member sets are
# hard assumptions baked into query math (decimal edges, array kernels).
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int32"}, "n_regionkey": {"int32"}},
    "customer": {"c_custkey": {"int64"}, "c_acctbal": {"double"}},
    "supplier": {"s_suppkey": {"int64"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"int64"}, "p_retailprice": {"double"}},
    "orders": {
        "o_orderkey": {"int64"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # BOTH wire types are supported, each via a different read path:
        # nanos -> bigint (nanosAsLong), micros -> TIMESTAMP_NTZ.
        "ts": {"timestamp[us]", "timestamp[ns]"},
        "user_id": {"int64"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}")
def test_testdata_physical_types_match_engine_assumptions():
    drift = []
    for tname, cols in EXPECTED.items():
        path = f"{SF_DIR}/{tname}.parquet"
        schema = pq.read_schema(path)
        names = set(schema.names)
        for col, accepted in cols.items():
            if col not in names:
                drift.append(f"{tname}.{col}: MISSING (have {sorted(names)})")
                continue
            actual = str(schema.field(col).type)
            if actual not in accepted:
                drift.append(
                    f"{tname}.{col}: {actual} not in accepted {sorted(accepted)}"
                )
    assert not drift, (
        "TESTDATA SCHEMA DRIFT — the driver regenerated parquet with "
        "types the engine does not expect. Audit every query touching "
        "these columns (start at plans/registry.py:events_ts_us):\n  "
        + "\n  ".join(drift)
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}")
def test_all_testdata_tables_present_and_nonempty():
    for tname in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        path = f"{SF_DIR}/{tname}.parquet"
        assert os.path.exists(path), f"missing testdata table {path}"
        assert pq.ParquetFile(path).metadata.num_rows > 0, f"{tname} is empty"
