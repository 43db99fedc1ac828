"""Pivot/unpivot semantics: the wide table equals independent
conditional aggregates, and unpivot(pivot(x)) restores the long form."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeview_spark.operators.reshape import pivot_counts, unpivot_columns
from lakeview_spark.plans.registry import t

SF_DIR = "/root/testdata/sf0.001"
TYPES = ["click", "view", "purchase", "signup", "error"]


def test_pivot_counts_equals_conditional_aggregates(spark):
    e = t(spark, SF_DIR, "events").select("user_id", "event_type")
    wide = pivot_counts(e, ["user_id"], "event_type", TYPES)
    expected = e.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == c, 1).otherwise(0))
            .cast("bigint")
            .alias(c)
            for c in TYPES
        ]
    )
    assert sorted(wide.columns) == sorted(expected.columns)
    w = {r.user_id: r for r in wide.collect()}
    x = {r.user_id: r for r in expected.collect()}
    assert set(w) == set(x)
    for uid in w:
        for c in TYPES:
            assert w[uid][c] == x[uid][c], (uid, c)


def test_pivot_with_explicit_categories_avoids_discovery_scan(spark):
    """With an explicit category list the pivot is Spark's standard
    two-phase aggregate — (group, category) partial counts, then
    pivotfirst on the group key: exactly two keyed exchanges, and NO
    eager distinct-discovery job over the category column (which the
    category-less form runs as a separate collect before planning)."""
    e = t(spark, SF_DIR, "events").select("user_id", "event_type")
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    wide = pivot_counts(e, ["user_id"], "event_type", TYPES)  # plan only
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    assert jobs_after == jobs_before, "explicit categories must not launch a job"
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "pivotfirst" in plan


def test_unpivot_inverts_pivot(spark):
    e = t(spark, SF_DIR, "events").select("user_id", "event_type")
    wide = pivot_counts(e, ["user_id"], "event_type", TYPES)
    long = unpivot_columns(wide, ["user_id"], TYPES, "event_type", "n")
    # zero-count cells appear in the long form; drop them to compare
    back = {
        (r.user_id, r.event_type): r.n for r in long.filter(F.col("n") > 0).collect()
    }
    truth = {
        (r.user_id, r.event_type): r.cnt
        for r in e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert back == truth


def test_pivot_custom_aggregate_keeps_type_and_nulls(spark):
    """A caller-supplied agg must come through untruncated (doubles stay
    doubles) with NULL for missing cells, not bigint-0."""
    df = spark.createDataFrame(
        [("u1", "click", 1.5), ("u1", "click", 2.5), ("u2", "view", 3.0)],
        ["user_id", "event_type", "value"],
    )
    wide = pivot_counts(
        df, ["user_id"], "event_type", ["click", "view"], agg=F.avg("value")
    )
    rows = {r.user_id: r for r in wide.collect()}
    assert rows["u1"].click == 2.0  # not truncated to 2
    assert rows["u1"].view is None  # missing cell stays NULL
    assert rows["u2"].view == 3.0
