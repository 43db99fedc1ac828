"""Data-quality gates: one-pass constraint suites + referential
containment over the testdata tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeview_spark.operators.validate import (
    accepted_values,
    check,
    contained_in,
    in_range,
    matches,
    not_null,
    row_count,
    unique,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_suite_passes_on_clean_table(spark):
    docs = _docs(spark)
    report = check(
        docs,
        [
            not_null("doc_id"),
            unique("doc_id"),
            not_null("text", min_rate=0.99),
            accepted_values("lang", ["en", "de", "es", "fr", "zh"]),
            in_range("n_chars", 0, 10_000),
            row_count(1, 1_000_000),
            matches("source", r"src[0-9]+"),
        ],
    )
    rows = {r.constraint: r for r in report.collect()}
    assert len(rows) == 7
    assert all(r.passed for r in rows.values()), {
        k: (v.observed, v.expected) for k, v in rows.items() if not v.passed
    }
    # verdict payloads are meaningful, not just booleans
    assert rows["unique(doc_id)"].observed == 500.0
    assert rows["row_count"].observed == 500.0


def test_suite_catches_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 10, "src1"),
            (1, None, -5, "src2"),  # dup id, null lang, out-of-range
            (3, "xx", 7, "oops"),  # bad lang value, bad source format
        ],
        "id long, lang string, n long, source string",
    )
    report = check(
        df,
        [
            unique("id"),
            not_null("lang"),
            accepted_values("lang", ["en", "de"]),
            in_range("n", 0, 100),
            row_count(10, None),
            matches("source", r"src[0-9]+"),
        ],
    )
    rows = {r.constraint: r for r in report.collect()}
    assert not rows["unique(id)"].passed  # 2 distinct vs 3 non-null
    assert not rows["not_null(lang)"].passed
    assert not rows["accepted_values(lang)"].passed
    assert rows["accepted_values(lang)"].observed == 1.0  # one violation
    assert not rows["in_range(n)"].passed
    assert not rows["row_count"].passed
    assert not rows["matches(source)"].passed
    assert abs(rows["matches(source)"].observed - 2 / 3) < 1e-12


def test_suite_is_one_aggregation_job(spark):
    """The suite compiles into one aggregation job over one scan: with
    no `unique` constraint, the only exchange is the final 1-row
    combine; exact uniqueness adds exactly the one keyed exchange
    exact distinct requires. Never a join, never one scan per
    constraint."""
    from lakeview_spark.operators import validate as v

    docs = _docs(spark)

    def plan_for(suite):
        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        aggs += [v._metric(c).alias(f"__m_{i}") for i, c in enumerate(suite)]
        return docs.agg(*aggs)._jdf.queryExecution().executedPlan().toString()

    plain = plan_for(
        [not_null("doc_id"), in_range("n_chars", 0, 1e9), matches("lang", "[a-z]+")]
    )
    assert plain.count("Exchange") == 1 and "SinglePartition" in plain, plain
    assert "Join" not in plain and plain.count("FileScan") == 1

    with_unique = plan_for(
        [not_null("doc_id"), unique("doc_id"), in_range("n_chars", 0, 1e9)]
    )
    assert with_unique.count("Exchange") == 2, with_unique
    assert "Join" not in with_unique and with_unique.count("FileScan") == 1


def test_containment_gate(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    # clean referential pair: every order's customer exists
    bad = contained_in(orders, "o_custkey", customer, "c_custkey")
    assert bad.count() == 0
    # poisoned reference: drop half the customers -> violations surface
    half = customer.filter(F.col("c_custkey") % 2 == 0)
    bad2 = contained_in(orders, "o_custkey", half, "c_custkey")
    n = bad2.count()
    assert n > 0
    assert bad2.filter(F.col("o_custkey") % 2 == 0).count() == 0


def test_unique_counts_nulls_as_violations(spark):
    """r7 ADVICE: the old unique verdict compared countDistinct against
    the NON-NULL count, so an all-NULL (or duplicated-NULL) key column
    passed the uniqueness gate silently. It must fail: a key column
    has to be present AND unique."""
    df = spark.createDataFrame(
        [(None,), (None,), (3,)], "id long"
    )
    rows = {r.constraint: r for r in check(df, [unique("id")]).collect()}
    assert not rows["unique(id)"].passed
    assert rows["unique(id)"].observed == 1.0  # one distinct non-null
    assert rows["unique(id)"].expected == 3.0  # vs 3 rows

    clean = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    rows = {r.constraint: r for r in check(clean, [unique("id")]).collect()}
    assert rows["unique(id)"].passed
