"""Spark-vs-DuckDB comparison harness — mirrors the driver's t2 check:
row count, schema (column names), and order-insensitive exact values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for tbl in TABLES:
        path = f"{sf_dir}/{tbl}.parquet"
        # tables ship either as a single file (driver testdata) or as a
        # directory of part files (make_sf1 / --split-files layouts)
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{pattern}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize for sorting: NaN/None sort stably via fillna sentinel
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first", kind="mergesort").reset_index(
        drop=True
    )
    return df


def compare(spark_df, con, oracle_sql: str) -> list[str]:
    """Return list of mismatch descriptions (empty = hash-match expected)."""
    issues = []
    sp = spark_df.toPandas()
    du = con.execute(oracle_sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return [f"schema mismatch: spark={sorted(sp.columns)} duck={sorted(du.columns)}"]
    if len(sp) != len(du):
        issues.append(f"row count: spark={len(sp)} duck={len(du)}")
    sp, du = _normalize(sp), _normalize(du)
    if len(sp) == len(du):
        for col in sp.columns:
            a, b = sp[col], du[col]
            kinds = {a.dtype.kind, b.dtype.kind}
            if kinds == {"i", "f"} or kinds == {"u", "f"}:
                # The driver's value hash is dtype-sensitive (3 != 3.0):
                # DuckDB HUGEINT lands as float64 in pandas and silently
                # hash-mismatches Spark's int64. Flag it locally.
                issues.append(
                    f"col {col}: dtype kind mismatch spark={a.dtype} duck={b.dtype}"
                    " (driver hash would fail; CAST the oracle column)"
                )
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af = a.astype("float64")
                    bf = b.astype("float64")
                    neq = ~(
                        (af == bf) | (af.isna() & bf.isna())
                    )
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
            except (TypeError, ValueError):
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                issues.append(
                    f"col {col}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={a[i]!r} duck={b[i]!r}"
                )
    return issues
