"""Schema-evolution sources: footer-only drift audit and contract-
aligned reads over a dataset written by three drifting 'producer
eras'."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakeview_spark.sources.evolution import (
    drift_groups,
    read_aligned,
    schema_report,
)

TARGET = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("quality", LongType()),  # only era 3 has it
    ]
)


def _write_eras(spark, root):
    # era 1: int doc_id, no lang
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id int, text string"
    ).coalesce(1).write.parquet(f"{root}/era1")
    # era 2: widened doc_id, lang added
    spark.createDataFrame(
        [(3, "gamma", "en")], "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{root}/era2")
    # era 3: quality added, columns reordered
    spark.createDataFrame(
        [("de", 4, 9, "delta")], "lang string, doc_id bigint, quality bigint, text string"
    ).coalesce(1).write.parquet(f"{root}/era3")


def test_schema_report_fingerprints_each_era(spark, tmp_path):
    root = str(tmp_path / "drifted")
    _write_eras(spark, root)
    report = schema_report(spark, f"{root}/era*")
    rows = report.collect()
    assert len(rows) == 3  # one parquet file per era
    assert all(r.n_row_groups >= 1 for r in rows)
    assert {r.num_rows for r in rows} == {2, 1}
    groups = drift_groups(report).collect()
    assert len(groups) == 3  # three distinct shapes
    assert sum(g.n_files for g in groups) == 3
    assert sum(g.n_rows for g in groups) == 4


def test_fingerprint_ignores_column_order(spark, tmp_path):
    root = str(tmp_path / "reordered")
    spark.createDataFrame([(1, "a")], "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(f"{root}/a")
    spark.createDataFrame([("b", 2)], "text string, doc_id bigint").coalesce(
        1
    ).write.parquet(f"{root}/b")
    groups = drift_groups(schema_report(spark, f"{root}/*")).collect()
    # same name:type set -> ONE drift group despite physical reorder
    assert len(groups) == 1 and groups[0].n_files == 2


def test_read_aligned_unifies_all_eras(spark, tmp_path):
    root = str(tmp_path / "drifted")
    _write_eras(spark, root)
    df = read_aligned(spark, f"{root}/era*", TARGET)
    assert df.schema == TARGET
    rows = {r.doc_id: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # era-1 rows: lang and quality are typed NULLs
    assert rows[1].lang is None and rows[1].quality is None
    # era-2 row: lang present, quality NULL
    assert rows[3].lang == "en" and rows[3].quality is None
    # era-3 row: everything present despite reorder
    assert rows[4].lang == "de" and rows[4].quality == 9
    # pruning: a 2-column projection reads only those columns
    plan = (
        df.select("doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "quality" not in plan.split("ReadSchema")[-1][:200]


def test_read_aligned_bad_cell_is_null_not_crash(spark, tmp_path):
    """Hard drift: an era typed the id as STRING. No single read schema
    can express string-and-bigint, so this goes through per_group —
    each era read natively, the bad cell try_cast to NULL."""
    root = str(tmp_path / "badcell")
    spark.createDataFrame(
        [("not-a-number", "x")], "doc_id string, text string"
    ).coalesce(1).write.parquet(f"{root}/a")
    out = read_aligned(spark, f"{root}/*", TARGET, per_group=True).collect()
    assert len(out) == 1
    assert out[0].doc_id is None and out[0].text == "x"
