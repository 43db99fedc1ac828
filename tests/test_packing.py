"""Sequence packing: the bounded two-phase prefix sum must agree with
the naive one-window-per-lang cumsum it replaces (pipeline/packing.py
module docstring), and assignments must tile the token stream."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeview_spark.pipeline.packing import (
    _BUCKET,
    SEQ_BUDGET,
    _cum_before,
    prefix_sum_per_group,
)
from lakeview_spark.plans.registry import t

SF_DIR = "/root/testdata/sf0.001"


def test_two_phase_prefix_sum_matches_naive_window(spark):
    docs = t(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = docs.select(
        "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before")
    )
    two_phase = _cum_before(spark, SF_DIR).select("doc_id", "cum_before")
    diff = naive.join(two_phase, "doc_id", "full").filter(
        naive.cum_before != two_phase.cum_before
    )
    assert diff.count() == 0


def test_packing_tiles_the_stream(spark):
    """Consecutive docs in a lang abut exactly: next.cum == prev.cum +
    prev.n_tokens (no gaps, no overlaps), and offsets stay in budget."""
    c = _cum_before(spark, SF_DIR)
    w = Window.partitionBy("lang").orderBy("doc_id")
    gaps = (
        c.withColumn("prev_end", F.lag(F.col("cum_before") + F.col("n_tokens")).over(w))
        .filter(F.col("prev_end").isNotNull())
        .filter(F.col("cum_before") != F.col("prev_end"))
    )
    assert gaps.count() == 0
    from lakeview_spark.plans import QUERIES

    out = QUERIES["pack_training_sequences"](spark, SF_DIR)
    bad = out.filter(
        (F.col("offset_in_seq") < 0) | (F.col("offset_in_seq") >= SEQ_BUDGET)
    )
    assert bad.count() == 0


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4 * _BUCKET),  # doc_id: spans buckets
            st.sampled_from(["en", "de", "fr"]),
            st.integers(min_value=0, max_value=5000),  # n_tokens incl. 0 and >budget
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],  # doc_id is a primary key
    )
)
def test_two_phase_prefix_sum_property(spark, rows):
    """Random corpora, including doc_ids exactly on bucket boundaries,
    empty docs, and docs longer than a whole sequence: the distributed
    two-phase sum must equal the exclusive prefix sum computed in plain
    Python."""
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_tokens bigint"
    )
    got = {
        r.doc_id: r.cum_before for r in prefix_sum_per_group(df).collect()
    }
    expected: dict[int, int] = {}
    running: dict[str, int] = {}
    for doc_id, lang, n in sorted(rows):
        expected[doc_id] = running.get(lang, 0)
        running[lang] = running.get(lang, 0) + n
    assert got == expected


def test_packing_plan_broadcasts_offsets_and_bounds_windows(spark):
    """The scale contract of the two-phase prefix sum: bucket offsets
    come back via a broadcast join (never a shuffled join against the
    full doc table), and the doc-side window partitions on (lang,
    bucket) — bounded — not on lang alone."""
    from lakeview_spark.plans import QUERIES

    import re

    plan = (
        QUERIES["pack_training_sequences"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the doc-side cumsum window keys on BOTH lang and bucket
    assert re.search(r"windowspecdefinition\(lang#\d+, bucket#\d+", plan), plan
