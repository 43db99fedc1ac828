"""Custom UDAF/UDTF surface tests: the grouped-agg pandas UDF matches a
Python reference, and the n-gram UDTF agrees with the hot-path columnar
shingle expression."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeview_spark.functions import ngram_udtf, weighted_median_udaf
from lakeview_spark.plans.registry import t

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_median_matches_python_reference(spark):
    e = t(spark, SF_DIR, "events").select("event_type", "value").withColumn(
        "w", F.lit(1.0)
    )
    got = {
        r.event_type: r.wmed
        for r in e.groupBy("event_type")
        .agg(weighted_median_udaf("value", "w").alias("wmed"))
        .collect()
    }
    rows = e.collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        vals.sort()
        total = float(len(vals))
        cum = 0.0
        for v in vals:
            cum += 1.0
            if cum >= total / 2.0:
                assert got[et] == v, et
                break


def test_weighted_median_respects_weights(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 100.0, 10.0)],
        ["k", "v", "w"],
    )
    out = df.groupBy("k").agg(weighted_median_udaf("v", "w").alias("wmed")).collect()
    # weight mass sits on 100.0
    assert out[0].wmed == 100.0


def test_ngram_udtf_agrees_with_columnar_shingles(spark):
    from lakeview_spark.pipeline.dedup import _shingles_expr

    docs = t(spark, SF_DIR, "documents").limit(20)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("ngram_udtf", ngram_udtf)
    got = {
        (r.doc_id, r.pos): r.ngram
        for r in spark.sql(
            "SELECT d.doc_id, g.pos, g.ngram FROM udtf_docs d, "
            "LATERAL ngram_udtf(lower(d.text)) g"
        ).collect()
    }
    fast = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                _shingles_expr().replace("toks", "split(lower(text), ' ')")
            )
        ).alias("pos", "ngram"),
    )
    want = {(r.doc_id, r.pos): r.ngram for r in fast.collect()}
    assert got == want and got
