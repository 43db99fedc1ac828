"""Sketch-based approximate statistics over the documents corpus.

At 100 TB you cannot afford exact distinct counts over token-level
columns in every report; sketches are how a training-data pipeline does
cardinality at scale. Spark's built-in approx_count_distinct (HLL++) is
the production tool but is NOT cross-engine reproducible, so the
oracle-checkable variant here is a KMV (k-minimum-values) sketch built
on md5: fully deterministic, identical in any engine, and with the same
"one pass + tiny state" scale shape as HLL.

Estimator (Bar-Yossef et al. 2002, standard KMV): hash every distinct
element to (0, 2^60); if v_k is the k-th smallest distinct hash value,
D ~= (k-1) * 2^60 / v_k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t

K = 256
HASH_SPACE = float(1 << 60)  # md5 prefix of 15 hex digits

# fold 15 hex chars -> exact bigint, identically in both engines
_HEX_FOLD_SQL = (
    "list_reduce(list_transform(range(1, 16), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(token), i, 1)) - 1 AS BIGINT)), "
    "(acc, x) -> acc * 16 + x)"
)


@register(
    "corpus_distinct_kmv",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    hashed AS (SELECT DISTINCT {_HEX_FOLD_SQL} AS hv FROM tok),
    kmin AS (SELECT hv FROM hashed ORDER BY hv LIMIT {K})
    SELECT CAST(count(*) AS BIGINT) AS k_actual,
           max(hv) AS kth_hash,
           CAST(count(*) - 1 AS DOUBLE) * {HASH_SPACE!r} / max(hv) AS est_distinct,
           (SELECT count(*) FROM tok) AS exact_distinct
    FROM kmin
    """,
)
def corpus_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-token estimate next to the exact count.

    Scale shape: the k smallest hashes come from TakeOrderedAndProject
    (per-partition top-k, tiny merge at the driver) over a map-side
    partially-aggregated distinct — state is K values per partition, the
    exact same footprint HLL would keep. The exact count alongside is
    the accuracy check (and is itself one distinct shuffle).
    """
    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .distinct()
    )
    # conv() parses the same 15-hex prefix the oracle folds — exact bigint
    hashed = toks.select(
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("bigint").alias("hv")
    ).distinct()
    kmin = hashed.orderBy("hv").limit(K)
    exact = toks.agg(F.count("*").cast("bigint").alias("exact_distinct"))
    return kmin.agg(
        F.count("*").cast("bigint").alias("k_actual"),
        F.max("hv").alias("kth_hash"),
        (
            (F.count("*") - 1).cast("double") * F.lit(HASH_SPACE) / F.max("hv")
        ).alias("est_distinct"),
    ).crossJoin(F.broadcast(exact))


# count-min sketch geometry: CMS_DEPTH independent md5-salted hash rows
# of CMS_WIDTH counters each. Estimate = min over rows of the counter a
# token hashes into; overestimate-only by construction (collisions can
# only ADD counts), which the query surfaces as `overestimate >= 0`.
CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP_K = 20


def _cms_bucket_spark(row: int) -> F.Column:
    h = F.md5(F.concat(F.lit(str(row)), F.lit(":"), F.col("token")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % CMS_WIDTH
    )


def _cms_bucket_sql(row: str, token: str = "token") -> str:
    return (
        f"(('0x' || substr(md5(CAST({row} AS VARCHAR) || ':' || {token}), 1, 8))::BIGINT"
        f" % {CMS_WIDTH})"
    )


@register(
    "corpus_heavy_hitters_cms",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    rows AS (SELECT unnest(range(0, {CMS_DEPTH})) AS r),
    counters AS (
      SELECT r, {_cms_bucket_sql("r")} AS bucket, count(*) AS cnt
      FROM tok, rows GROUP BY r, bucket
    ),
    exact AS (SELECT token, count(*) AS exact_cnt FROM tok GROUP BY token),
    topk AS (
      SELECT token, exact_cnt FROM (
        SELECT token, exact_cnt,
               row_number() OVER (ORDER BY exact_cnt DESC, token) AS rn
        FROM exact
      ) WHERE rn <= {CMS_TOP_K}
    )
    SELECT t.token, CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS cms_estimate,
           CAST(min(c.cnt) - t.exact_cnt AS BIGINT) AS overestimate
    FROM topk t JOIN rows ON true
    JOIN counters c
      ON c.r = rows.r AND c.bucket = {_cms_bucket_sql("rows.r", "t.token")}
    GROUP BY t.token, t.exact_cnt
    """,
)
def corpus_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audit for heavy hitters: build a CMS_DEPTH x
    CMS_WIDTH counter sketch over the token stream (md5-salted row
    hashes — deterministic, no seed), then compare its estimate against
    the exact count for the exact top-CMS_TOP_K tokens. `overestimate`
    is the CMS's collision error, >= 0 by construction — the telemetry
    that says whether this sketch geometry is tight enough to replace
    the exact vocabulary count in per-shard reports (the sketch is
    ~{CMS_DEPTH}x{CMS_WIDTH} integers of state per shard and merges by
    element-wise ADD, which exact top-k tables do not).

    Scale shape: the counter build is one partial-aggregable groupBy on
    (row, bucket) — at most {CMS_DEPTH}x{CMS_WIDTH} groups, so map-side
    combine collapses the token stream before the shuffle; the exact
    side is the usual vocab count + TakeOrdered; the probe join
    broadcasts {CMS_TOP_K} x {CMS_DEPTH} rows against the tiny counter
    table."""
    tok = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    # all CMS_DEPTH row-buckets in ONE pass over the token stream (a
    # union of per-row projections would re-execute the tokenize/explode
    # lineage once per row — the recompute class dedup_shared_spans was
    # fixed for)
    row_buckets = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _cms_bucket_spark(r).alias("bucket")
            )
            for r in range(CMS_DEPTH)
        ]
    )
    stream = tok.select(F.explode(row_buckets).alias("rb")).select(
        F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket")
    )
    counters = stream.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))
    exact = tok.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    topk = exact.orderBy(F.desc("exact_cnt"), "token").limit(CMS_TOP_K)
    # same one-pass device as the counter build: a union of per-row
    # selects over topk would re-execute the exact-count lineage
    # (scan -> explode -> groupBy -> TakeOrdered) once per row
    probe = topk.select(
        "token", "exact_cnt", F.explode(row_buckets).alias("rb")
    ).select(
        "token",
        "exact_cnt",
        F.col("rb.r").alias("r"),
        F.col("rb.bucket").alias("bucket"),
    )
    est = (
        F.broadcast(probe)
        .join(counters, ["r", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )
    return est.select(
        "token",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).cast("bigint").alias(
            "overestimate"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-filter ingest prune
# ---------------------------------------------------------------------------
#
# The join-pruning sketch: before an incremental ingest pays the full
# fingerprint equi-join against a 100 TB already-ingested corpus, a
# Bloom filter of the seen fingerprints — m bits, sized 16 bits per
# seen doc, packed into m/32 bigint words by bit_or aggregation —
# broadcasts to the incoming scan and answers "definitely new" with
# zero shuffle. Only the `maybe_seen` sliver proceeds to the exact
# join. Everything is md5 + integer bit math, so the filter contents,
# the membership verdicts, AND the false-positive count are
# bit-identical in both engines (no false negatives by construction —
# pytest-pinned).
_BLOOM_K = 3  # hash functions
_BLOOM_BITS_PER_DOC = 16
_BLOOM_MIN_BITS = 4096
_BLOOM_WORD = 32  # bits packed per bigint word (avoids the 1<<63 sign edge)

def _bloom_pos_spark(i: int, fp, m: int):
    h = F.md5(F.concat(F.lit(f"{i}:"), fp))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % m


_BLOOM_PRUNE_SQL_TMPL = f"""
    WITH d AS (
      SELECT doc_id, lang, md5(text) AS fp FROM documents
    ),
    seen AS (SELECT fp FROM d WHERE doc_id < {{half}}),
    positions AS (
      SELECT {{pos_expr}} AS pos
      FROM seen, (SELECT unnest(range(0, {_BLOOM_K})) AS i)
    ),
    bits AS (
      SELECT pos // {_BLOOM_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD} AS INT)) AS bset
      FROM positions GROUP BY pos // {_BLOOM_WORD}
    ),
    inc AS (SELECT doc_id, lang, fp FROM d WHERE doc_id >= {{half}}),
    probes AS (
      SELECT doc_id, {{pos_expr}} AS pos
      FROM inc, (SELECT unnest(range(0, {_BLOOM_K})) AS i)
    ),
    hits AS (
      SELECT p.doc_id, count(*) AS n_hit
      FROM probes p JOIN bits b ON b.word = p.pos // {_BLOOM_WORD}
      WHERE (b.bset & (CAST(1 AS BIGINT) << CAST(p.pos % {_BLOOM_WORD} AS INT))) <> 0
      GROUP BY p.doc_id
    ),
    verdicts AS (
      SELECT i.doc_id, i.lang,
             CASE WHEN coalesce(h.n_hit, 0) = {_BLOOM_K} THEN 1 ELSE 0 END AS maybe_seen,
             CASE WHEN i.fp IN (SELECT fp FROM seen) THEN 1 ELSE 0 END AS actually_seen
      FROM inc i LEFT JOIN hits h USING (doc_id)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_incoming,
           CAST(sum(maybe_seen) AS BIGINT) AS n_maybe_seen,
           CAST(sum(actually_seen) AS BIGINT) AS n_actually_seen,
           CAST(sum(CASE WHEN maybe_seen = 1 AND actually_seen = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(sum(CASE WHEN maybe_seen = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_definitely_new
    FROM verdicts GROUP BY lang
"""


def _bloom_prune_oracle() -> str:
    # half and m are corpus-derived IN SQL (doc_ids are contiguous
    # 0..n-1 by testdata construction, preserved by the sf1 replicas)
    half = "(SELECT count(*) // 2 FROM documents)"
    m = f"(SELECT GREATEST({_BLOOM_MIN_BITS}, {_BLOOM_BITS_PER_DOC} * (count(*) // 2)) FROM documents)"
    pos = f"(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || fp), 1, 8))::BIGINT % {m})"
    return _BLOOM_PRUNE_SQL_TMPL.format(half=half, pos_expr=pos)


@register("dedup_bloom_prune", oracle=_bloom_prune_oracle())
def dedup_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingest prune with its own audit: treat the first
    half of the corpus (by doc_id) as already ingested, Bloom its
    fingerprints, and classify the incoming half per language —
    definitely-new vs maybe-seen, with the exact join as truth and the
    measured false-positive count beside the sketch's verdicts
    (section comment above: why this is THE pre-join device at 100 TB).

    Scale shape: the filter build is one groupBy to <= m/{_BLOOM_WORD}
    bigint words (exactly m bits of state — 2 bytes per seen doc at
    {_BLOOM_BITS_PER_DOC} bits/doc); the word table broadcasts; probing
    is a narrow map + broadcast join, no shuffle of the incoming
    corpus; only the maybe-seen sliver would proceed to the exact
    fingerprint join in production."""
    from lakeview_spark.pipeline.similarity import corpus_n

    n = corpus_n(spark, sf_dir, "documents")
    half = n // 2
    m = max(_BLOOM_MIN_BITS, _BLOOM_BITS_PER_DOC * half)
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5("text").alias("fp")
    )
    seen = d.filter(F.col("doc_id") < half)
    positions = seen.select(
        F.explode(
            F.array(*[_bloom_pos_spark(i, F.col("fp"), m) for i in range(_BLOOM_K)])
        ).alias("pos")
    )
    bits = positions.groupBy(
        F.expr(f"pos div {_BLOOM_WORD}").alias("word")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_WORD} AS INT)))"
        ).alias("bset")
    )
    inc = d.filter(F.col("doc_id") >= half)
    probes = inc.select(
        "doc_id",
        F.explode(
            F.array(*[_bloom_pos_spark(i, F.col("fp"), m) for i in range(_BLOOM_K)])
        ).alias("pos"),
    ).withColumn("word", F.expr(f"pos div {_BLOOM_WORD}"))
    hits = (
        probes.join(F.broadcast(bits), "word")
        .filter(
            F.expr(
                f"(bset & shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_WORD} AS INT))) <> 0"
            )
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    seen_fps = seen.select("fp").distinct()
    verdicts = (
        inc.join(hits, "doc_id", "left")
        .join(
            seen_fps.withColumn("seen_flag", F.lit(1)),
            "fp",
            "left",
        )
        .select(
            "lang",
            F.when(F.coalesce("n_hit", F.lit(0)) == _BLOOM_K, 1)
            .otherwise(0)
            .alias("maybe_seen"),
            F.when(F.col("seen_flag").isNotNull(), 1).otherwise(0).alias("actually_seen"),
        )
    )
    return verdicts.groupBy("lang").agg(
        F.count("*").alias("n_incoming"),
        F.sum("maybe_seen").alias("n_maybe_seen"),
        F.sum("actually_seen").alias("n_actually_seen"),
        F.sum(
            F.when((F.col("maybe_seen") == 1) & (F.col("actually_seen") == 0), 1).otherwise(0)
        ).alias("n_false_positives"),
        F.sum(F.when(F.col("maybe_seen") == 0, 1).otherwise(0)).alias("n_definitely_new"),
    )
