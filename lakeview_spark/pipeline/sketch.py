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


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (integer-exact registers)
# ---------------------------------------------------------------------------
#
# The KMV sketch above still pays a DISTINCT shuffle before ranking the
# k minima. HLL is the sketch that doesn't: registers are max(rank) per
# bucket over the RAW token stream — max is duplicate-insensitive, so
# the whole build is one partial-aggregable groupBy into _HLL_M groups
# with no vocabulary shuffle at all (the shape Spark's own
# approx_count_distinct uses; reimplemented on md5 so the registers,
# the harmonic sum, and the estimate are bit-identical cross-engine —
# HLL++ register hashing is JVM-private and NOT reproducible in DuckDB).
#
# Exact-integer device: bucket = low 8 bits of the 60-bit md5 fold,
# w = the remaining 52 bits, rank = 53 - bitlength(w) (w = 0 -> 53).
# The harmonic sum  sum(2^-r) over all m registers (zeros contribute
# 2^0) is kept EXACT by scaling with 2^53:
#   Z = sum_hit 2^(53 - r_j) + (m - n_hit) * 2^53   (BIGINT, <= 2^61)
# so the only float op is the final  est = alpha*m^2*2^53 / Z  — one
# correctly-rounded int64 cast + one division, identical both engines.
# Raw Flajolet estimator only (no small-range linear counting: that
# needs ln(), which is not correctly rounded cross-engine — the bias
# regime n < 5m/2 is visible from n_hit_buckets instead).
_HLL_M = 256  # 8 bucket bits
# alpha_256 * m^2 * 2^53, round-tripped through repr so both engines
# parse the identical double literal
_HLL_SCALE = repr(0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * 2.0**53)


@register(
    "corpus_distinct_hll",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    hashed AS (SELECT {_HEX_FOLD_SQL} AS hv FROM tok),
    reg AS (
      SELECT hv % {_HLL_M} AS bucket,
             max(CASE WHEN hv // {_HLL_M} = 0 THEN 53
                      ELSE 53 - length(bin(hv // {_HLL_M})) END) AS r
      FROM hashed GROUP BY hv % {_HLL_M}
    ),
    s AS (
      SELECT count(*) AS n_hit, max(r) AS max_rank,
             CAST(sum(CAST(1 AS BIGINT) << CAST(53 - r AS INT)) AS BIGINT) AS hit_sum
      FROM reg
    )
    SELECT CAST(n_hit AS BIGINT) AS n_hit_buckets,
           CAST(max_rank AS BIGINT) AS max_rank,
           hit_sum + ({_HLL_M} - n_hit) * (CAST(1 AS BIGINT) << 53) AS harmonic_scaled,
           {_HLL_SCALE} / CAST(hit_sum + ({_HLL_M} - n_hit) * (CAST(1 AS BIGINT) << 53)
                               AS DOUBLE) AS est_distinct,
           (SELECT CAST(count(DISTINCT token) AS BIGINT) FROM tok) AS exact_distinct
    FROM s
    """,
)
def corpus_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-token estimate next to the exact count (section
    comment above: integer-exact registers, one float op at the edge).

    Scale shape: register build is ONE groupBy into m=256 groups
    over the raw token stream — max() is duplicate-insensitive, so
    map-side combine collapses every partition to <= 256 rows and
    NO distinct/vocabulary shuffle happens (the KMV sketch above pays
    one; this is the cheaper sketch when only cardinality is needed).
    Registers merge by element-wise max, so per-shard sketches roll up
    to any grain for free. The exact count alongside is the accuracy
    audit and is itself the expensive path a production report would
    drop."""
    tok = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    hv = F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("bigint")
    w = F.shiftright(hv, 8)
    rank = F.when(w == 0, 53).otherwise(F.lit(53) - F.length(F.bin(w)))
    reg = (
        tok.select((hv % _HLL_M).alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("r"))
    )
    s = reg.agg(
        F.count("*").alias("n_hit"),
        F.max("r").alias("max_rank"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")
        ).alias("hit_sum"),
    )
    zeros = (F.lit(_HLL_M) - F.col("n_hit")) * F.shiftleft(
        F.lit(1).cast("bigint"), 53
    )
    exact = (
        tok.distinct()
        .agg(F.count("*").cast("bigint").alias("exact_distinct"))
    )
    return s.select(
        F.col("n_hit").cast("bigint").alias("n_hit_buckets"),
        F.col("max_rank").cast("bigint").alias("max_rank"),
        (F.col("hit_sum") + zeros).alias("harmonic_scaled"),
        (
            F.lit(float(_HLL_SCALE)) / (F.col("hit_sum") + zeros).cast("double")
        ).alias("est_distinct"),
    ).crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# Theta-sketch SET ALGEBRA: cross-source overlap estimation.
#
# KMV/HLL answer "how many distinct"; the question a crawl-curation
# pipeline actually asks across dumps is "how much of source A is
# already in source B" — distinct-set UNION / INTERSECTION / Jaccard
# between shards, without ever joining the raw sets. The theta-sketch
# construction (Dasgupta et al., "Theta-Sketch Framework", 2016; the
# DataSketches production design) does exactly that: keep the K
# smallest hashes per set; for any pair, theta = min(theta_A, theta_B)
# and every retained hash below theta is a uniform sample of the union,
# so |{retained < theta, in both}| / theta estimates the intersection.
#
# Determinism: hashes are the same 15-hex md5 fold as the KMV sketch
# (exact BIGINT in both engines); theta / retained counts are exact
# integers; the ONLY float ops are the three edge divisions (cnt *
# 2^60 / theta and the Jaccard ratio), each a single correctly-rounded
# double op on identical operands. Small-set convention: a source with
# fewer than K distinct shingles has theta = 2^60 (the whole hash
# space) and its sketch IS the set — the estimator then returns the
# retained count exactly (cnt * 2^60 / 2^60, both ops exact in
# doubles because cnt <= 2*K < 2^10).
_THETA_K = 256
_THETA_SPACE = 1 << 60
_THETA_FOLD_SQL = (
    "list_reduce(list_transform(range(1, 16), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(sh), i, 1)) - 1 AS BIGINT)), "
    "(acc, x) -> acc * 16 + x)"
)


@register(
    "corpus_source_overlap_theta",
    oracle=f"""
    WITH sh0 AS (
      SELECT DISTINCT source,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (SELECT source, string_split(lower(text), ' ') AS toks FROM documents)
    ),
    hashed AS (SELECT DISTINCT source, {_THETA_FOLD_SQL} AS hv FROM sh0),
    sk AS (
      SELECT source, hv FROM (
        SELECT source, hv,
               row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
        FROM hashed
      ) WHERE rn <= {_THETA_K}
    ),
    stats AS (
      SELECT source,
             CASE WHEN count(*) < {_THETA_K}
                  THEN (CAST(1 AS BIGINT) << 60) ELSE max(hv) END AS theta_s,
             count(*) AS k_actual
      FROM sk GROUP BY source
    ),
    nex AS (SELECT source, count(*) AS n FROM hashed GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             least(a.theta_s, b.theta_s) AS theta
      FROM stats a JOIN stats b ON a.source < b.source
    ),
    inter AS (
      SELECT p.source_a, p.source_b, count(*) AS cnt
      FROM pairs p
      JOIN sk a ON a.source = p.source_a AND a.hv < p.theta
      JOIN sk b ON b.source = p.source_b AND b.hv = a.hv
      GROUP BY 1, 2
    ),
    uni AS (
      SELECT source_a, source_b, count(DISTINCT hv) AS cnt FROM (
        SELECT p.source_a, p.source_b, s.hv
        FROM pairs p JOIN sk s ON s.source = p.source_a AND s.hv < p.theta
        UNION ALL
        SELECT p.source_a, p.source_b, s.hv
        FROM pairs p JOIN sk s ON s.source = p.source_b AND s.hv < p.theta
      ) GROUP BY 1, 2
    ),
    xinter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS cnt
      FROM hashed a JOIN hashed b ON a.hv = b.hv AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.theta,
           CAST(coalesce(i.cnt, 0) AS BIGINT) AS inter_retained,
           CAST(coalesce(u.cnt, 0) AS BIGINT) AS union_retained,
           CAST(coalesce(i.cnt, 0) AS DOUBLE) * {float(_THETA_SPACE)!r}
             / CAST(p.theta AS DOUBLE) AS est_inter,
           CAST(coalesce(u.cnt, 0) AS DOUBLE) * {float(_THETA_SPACE)!r}
             / CAST(p.theta AS DOUBLE) AS est_union,
           CASE WHEN coalesce(u.cnt, 0) > 0
                THEN CAST(coalesce(i.cnt, 0) AS DOUBLE) / CAST(u.cnt AS DOUBLE) END
             AS est_jaccard,
           CAST(coalesce(x.cnt, 0) AS BIGINT) AS exact_inter,
           CAST(na.n + nb.n - coalesce(x.cnt, 0) AS BIGINT) AS exact_union
    FROM pairs p
    LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b
    LEFT JOIN uni u ON u.source_a = p.source_a AND u.source_b = p.source_b
    LEFT JOIN xinter x ON x.source_a = p.source_a AND x.source_b = p.source_b
    JOIN nex na ON na.source = p.source_a
    JOIN nex nb ON nb.source = p.source_b
    """,
)
def corpus_source_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch union/intersection/Jaccard estimates for every
    source pair's word-3-gram shingle sets, next to the exact counts.

    Scale shape: the per-source K-min selection is TWO-PHASE — first
    the K smallest per (source, hv%64) salt group, then the K smallest
    of the <=64*K survivors per source — so no task ever sorts a whole
    source's shingle set (the k smallest of a union are always within
    the union of per-salt k smallest, so the retained set is IDENTICAL
    to the oracle's direct row_number form). After that everything is
    sketch-sized: 20 sketches x 256 hashes; the pair joins run on
    broadcastable frames. The exact intersection alongside is the
    accuracy audit and is itself the one corpus-scale equi-join
    (hv-keyed over the materialized per-source hash table, the same
    inverted-index bound as dedup_ngram_jaccard) a production report
    would drop. Exactness note: the audit counts distinct-HASH matches,
    the same identity the sketches and the per-source counts use, so
    all three columns share one collision model (md5/2^60 — vanishing,
    and in any case identical in both engines).
    """
    from pyspark.sql import Window

    # function-level import: dedup is mid-initialization when the
    # pipeline package imports this module, so a top-level import is a
    # cycle (same device as streaming/pipeline_stream.py's sketch use)
    from lakeview_spark.pipeline.dedup import _shingles_expr, _tokens

    from lakeview_spark.operators.materialize import materialized

    def _hashed_build(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = t(spark, sf_dir, "documents").select(
            "source", _tokens(F.col("text")).alias("toks")
        )
        sh = (
            docs.select("source", F.expr(_shingles_expr()).alias("shs"))
            .select("source", F.explode("shs").alias("sh"))
            .distinct()
        )
        return sh.select(
            "source",
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("hv"),
        ).distinct()

    # the per-source distinct hash table feeds FOUR subtrees (the k-min
    # chain, the per-source counts, and both exact-audit join sides) —
    # derived, each re-executes tokenize+shingle+two distincts.
    # Materialize once per run (the LPA-walk device); the exact audit
    # then joins bigints on the scratch instead of shingle strings.
    hashed = materialized(spark, "theta_hashed", sf_dir, _hashed_build)

    # two-phase per-source K-min (see docstring). The sketch table is
    # itself materialized (r14 optimization): its lineage — two window
    # ranks over the corpus-sized hashed scratch — is referenced by
    # stats/pairs/inter/uni, and pairs is referenced again by every
    # downstream subtree, so the derived form replayed the window chain
    # ~12x per execution (the k-core replay rule). The sketch is
    # sketch-SIZED (<= sources x K rows), so the write is trivial and
    # every consumer becomes a tiny parquet scan; rows identical (the
    # builder expression is unchanged). Before/after numbers:
    # OPTIMIZATION_r14.md.
    def _sk_build(s: SparkSession, d: str) -> DataFrame:
        w_salt = Window.partitionBy("source", F.col("hv") % 64).orderBy("hv")
        w_src = Window.partitionBy("source").orderBy("hv")
        return (
            hashed.withColumn("rn", F.row_number().over(w_salt))
            .filter(F.col("rn") <= _THETA_K)
            .withColumn("rn2", F.row_number().over(w_src))
            .filter(F.col("rn2") <= _THETA_K)
            .select("source", "hv")
        )

    sk = materialized(spark, "theta_sk", sf_dir, _sk_build)
    stats = sk.groupBy("source").agg(
        F.when(F.count("*") < _THETA_K, F.lit(_THETA_SPACE).cast("bigint"))
        .otherwise(F.max("hv"))
        .alias("theta_s"),
    )
    nex = hashed.groupBy("source").agg(F.count("*").alias("n"))
    a, b = stats.alias("a"), stats.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.least("a.theta_s", "b.theta_s").alias("theta"),
    )
    ska, skb = sk.alias("ska"), sk.alias("skb")
    inter = (
        pairs.join(
            F.broadcast(ska),
            (F.col("ska.source") == F.col("source_a"))
            & (F.col("ska.hv") < F.col("theta")),
        )
        .join(
            F.broadcast(skb),
            (F.col("skb.source") == F.col("source_b"))
            & (F.col("skb.hv") == F.col("ska.hv")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("icnt"))
    )
    uni_a = pairs.join(
        F.broadcast(sk.alias("s")),
        (F.col("s.source") == F.col("source_a")) & (F.col("s.hv") < F.col("theta")),
    ).select("source_a", "source_b", "hv")
    uni_b = pairs.join(
        F.broadcast(sk.alias("s")),
        (F.col("s.source") == F.col("source_b")) & (F.col("s.hv") < F.col("theta")),
    ).select("source_a", "source_b", "hv")
    uni = (
        uni_a.unionByName(uni_b)
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("hv").alias("ucnt"))
    )
    ha, hb = hashed.alias("ha"), hashed.alias("hb")
    xinter = (
        ha.join(
            hb,
            (F.col("ha.hv") == F.col("hb.hv"))
            & (F.col("ha.source") < F.col("hb.source")),
        )
        .groupBy(
            F.col("ha.source").alias("source_a"),
            F.col("hb.source").alias("source_b"),
        )
        .agg(F.count("*").alias("xcnt"))
    )
    icnt = F.coalesce("icnt", F.lit(0)).cast("bigint")
    ucnt = F.coalesce("ucnt", F.lit(0)).cast("bigint")
    xcnt = F.coalesce("xcnt", F.lit(0)).cast("bigint")
    return (
        pairs.join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .join(F.broadcast(uni), ["source_a", "source_b"], "left")
        .join(F.broadcast(xinter), ["source_a", "source_b"], "left")
        .join(
            F.broadcast(nex.alias("na")),
            F.col("na.source") == F.col("source_a"),
        )
        .join(
            F.broadcast(nex.alias("nb")),
            F.col("nb.source") == F.col("source_b"),
        )
        .select(
            "source_a",
            "source_b",
            "theta",
            icnt.alias("inter_retained"),
            ucnt.alias("union_retained"),
            (
                icnt.cast("double")
                * F.lit(float(_THETA_SPACE))
                / F.col("theta").cast("double")
            ).alias("est_inter"),
            (
                ucnt.cast("double")
                * F.lit(float(_THETA_SPACE))
                / F.col("theta").cast("double")
            ).alias("est_union"),
            F.when(
                ucnt > 0, icnt.cast("double") / F.col("ucnt").cast("double")
            ).alias("est_jaccard"),
            xcnt.alias("exact_inter"),
            (F.col("na.n") + F.col("nb.n") - xcnt).cast("bigint").alias("exact_union"),
        )
    )
