"""Corpus-curation operators: contamination detection, repetition
scoring, a quality-filter funnel, and simhash hamming-distance pairs.

These are the curation passes a large-scale training-data pipeline runs
after raw dedup (cf. the C4/Gopher-style filter stacks): check corpus
documents for n-gram overlap against a benchmark probe set
(decontamination), score intra-document repetition, measure how many
documents each quality filter stage retains, and turn banded SimHash
signatures into verified hamming-distance near-dup pairs.

Scale notes mirror dedup.py: every join is inverted-index- or
band-bucket-shaped (shuffle bounded by postings, never |docs|^2), the
benchmark shingle set is broadcast (benchmarks are tiny next to the
corpus), and all scoring is integer/string columnar math so every
operator is oracle-exact with no UDFs in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.operators.materialize import materialized
from lakeview_spark.pipeline.dedup import (
    _SHINGLES_SQL,
    _MINHASH_SIG_SQL,
    _SIMHASH_SQL,
    SIMHASH_BITS,
    _doc_shingles,
    _tokens,
    minhash_signatures_materialized,
    simhash_signature,
)
from lakeview_spark.plans.registry import register, t

# Benchmark probe set: every doc_id divisible by _PROBE_MOD plays the
# role of a held-out eval document. Deterministic, present at every SF.
_PROBE_MOD = 29

# SimHash hamming threshold and band layout for the pair query. The
# 64-bit signature (two independent md5-nibble bits per hex digit,
# dedup.py simhash_signature) splits into 4 x 16-bit bands: by
# pigeonhole any pair within hamming distance 3 has at least one
# identical band, so band-blocking is lossless for the <=3 threshold —
# and each band has 65536 distinct values, so chance bucket collisions
# (and the candidate-pair count) stay ~65536x below the all-pairs
# quadratic. The earlier 32-bit/4-byte layout hit the birthday regime
# at ~50k docs: random 32-bit signatures put ~n^2*5489/2^32 chance
# pairs INSIDE hamming<=3 (2.7M measured at 50k, SCALE.md §8), growing
# the verify join's input quadratically. At 64 bits the same estimate
# is ~n^2*43745/2^64 — under one chance pair per 10^6-doc shard — so
# candidate volume tracks true near-dups, not corpus size.
_HAMMING_MAX = 3
_BAND_BITS = 16
_N_BANDS = 4
_BAND_MASK = (1 << _BAND_BITS) - 1
# pigeonhole losslessness needs the bands to tile the whole signature
assert _N_BANDS * _BAND_BITS == SIMHASH_BITS
assert _HAMMING_MAX < _N_BANDS

# band extraction, shared by the pair query and the evaluation audit:
# shift is arithmetic on BIGINT in both engines, and the mask discards
# the sign-extension bits, so the banded values agree bit-for-bit
_BANDS_STACK_EXPR = (
    f"stack({_N_BANDS}, "
    + ", ".join(
        f"{b}, shiftright(simhash, {b * _BAND_BITS}) & {_BAND_MASK}"
        for b in range(_N_BANDS)
    )
    + ") AS (band, band_val)"
)
_BANDS_UNNEST_SQL = (
    "SELECT doc_id, simhash, b.band, (simhash >> (b.band * "
    f"{_BAND_BITS})) & {_BAND_MASK} AS band_val "
    f"FROM sig, (SELECT unnest(range(0, {_N_BANDS})) AS band) b"
)


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH s AS ({_SHINGLES_SQL}),
    probe AS (SELECT DISTINCT unnest(shingles) AS shingle FROM s
              WHERE doc_id % {_PROBE_MOD} = 0),
    corpus AS (SELECT doc_id, shingles FROM s
               WHERE doc_id % {_PROBE_MOD} <> 0 AND len(shingles) > 0),
    m AS (
      SELECT c.doc_id, count(*) AS matched
      FROM (SELECT doc_id, unnest(shingles) AS shingle FROM corpus) c
      JOIN probe USING (shingle)
      GROUP BY c.doc_id
    )
    SELECT corpus.doc_id,
           len(corpus.shingles) AS n_shingles,
           COALESCE(m.matched, 0) AS matched_shingles,
           CAST(COALESCE(m.matched, 0) AS DOUBLE) / len(corpus.shingles)
             AS contamination_share
    FROM corpus LEFT JOIN m ON corpus.doc_id = m.doc_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: per corpus doc, the share of its word
    3-gram shingles that also occur in the probe (benchmark) set.

    The probe shingle set is broadcast — benchmarks are a few thousand
    documents even when the corpus is 100 TB — so the check is one
    narrow hash-semi-join per shingle row plus a groupBy(doc_id);
    no shuffle of the corpus text itself."""
    s = _doc_shingles(spark, sf_dir)
    probe = (
        s.filter(F.col("doc_id") % _PROBE_MOD == 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    corpus = s.filter(
        (F.col("doc_id") % _PROBE_MOD != 0) & (F.col("n_shingles") > 0)
    )
    matched = (
        corpus.select("doc_id", F.explode("shingles").alias("shingle"))
        .join(F.broadcast(probe), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("matched"))
    )
    return (
        corpus.select("doc_id", "n_shingles")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("matched"), F.lit(0).cast("bigint")).alias(
                "matched_shingles"
            ),
            (
                F.coalesce(F.col("matched"), F.lit(0)).cast("double")
                / F.col("n_shingles")
            ).alias("contamination_share"),
        )
    )


@register(
    "text_repetition_score",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    base AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS distinct_tokens
      FROM tk
    ),
    top AS (
      SELECT doc_id, max(c) AS top_token_count FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
        GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ),
    sh AS (SELECT doc_id, len(shingles) AS distinct_shingles FROM ({_SHINGLES_SQL}))
    SELECT base.doc_id, n_tokens, distinct_tokens,
           CAST(n_tokens - distinct_tokens AS DOUBLE) / n_tokens AS dup_token_share,
           top_token_count,
           CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_share,
           CASE WHEN n_tokens > 2
                THEN CAST(n_tokens - 2 - distinct_shingles AS DOUBLE) / (n_tokens - 2)
                ELSE 0.0 END AS dup_shingle_share
    FROM base JOIN top ON base.doc_id = top.doc_id
    JOIN sh ON base.doc_id = sh.doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style filters): duplicate-token
    share, most-frequent-token share, duplicate-3-gram share.

    Token/distinct counts are per-row array math; the top-token count is
    the one grouped pass (explode -> count per (doc, tok) -> max per
    doc), shuffling on doc_id only. All ratios are exact-integer
    divisions cast to double, so the oracle matches bit-for-bit."""
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    base = tk.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("distinct_tokens"),
    )
    top = (
        tk.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_token_count"))
    )
    sh = _doc_shingles(spark, sf_dir).select(
        "doc_id", F.col("n_shingles").alias("distinct_shingles")
    )
    raw = F.col("n_tokens") - 2
    return (
        base.join(top, "doc_id")
        .join(sh, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "distinct_tokens",
            (
                (F.col("n_tokens") - F.col("distinct_tokens")).cast("double")
                / F.col("n_tokens")
            ).alias("dup_token_share"),
            "top_token_count",
            (F.col("top_token_count").cast("double") / F.col("n_tokens")).alias(
                "top_token_share"
            ),
            F.when(
                F.col("n_tokens") > 2,
                (raw - F.col("distinct_shingles")).cast("double") / raw,
            )
            .otherwise(F.lit(0.0))
            .alias("dup_shingle_share"),
        )
    )


_EN_STOP = "'the','and','of','to','a','in','is','it','for','on'"


@register(
    "quality_filter_funnel",
    oracle=f"""
    {_MINHASH_SIG_SQL},
    dup2 AS (
      SELECT DISTINCT b.doc_id
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    ),
    f AS (
      SELECT d.doc_id,
             len(string_split(d.text, ' ')) BETWEEN 40 AND 400 AS f1,
             len(list_filter(string_split(lower(d.text), ' '),
                 x -> x IN ({_EN_STOP}))) >= 1 AS f2,
             len(list_distinct(string_split(lower(d.text), ' '))) * 3
               >= len(string_split(lower(d.text), ' ')) AS f3,
             dup2.doc_id IS NULL AS f4
      FROM documents d LEFT JOIN dup2 ON d.doc_id = dup2.doc_id
    ),
    agg AS (
      SELECT count(*) AS total,
             sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS s1,
             sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS s2,
             sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS s3,
             sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS s4
      FROM f
    )
    SELECT stage, CAST(docs_retained AS BIGINT) AS docs_retained,
           CAST(docs_retained AS DOUBLE) / total AS retention
    FROM (
      SELECT '00_all' AS stage, total AS docs_retained, total FROM agg
      UNION ALL SELECT '01_token_range', s1, total FROM agg
      UNION ALL SELECT '02_en_stopword', s2, total FROM agg
      UNION ALL SELECT '03_distinct_ratio', s3, total FROM agg
      UNION ALL SELECT '04_near_dup', s4, total FROM agg
    )
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: documents retained after each successive
    curation stage — token-length range, english-stopword presence,
    distinct-token ratio >= 1/3 (integer cross-multiply, no float
    threshold), and near-dup removal (drop the doc2 side of every
    MinHash LSH band collision, i.e. keep canonical min-doc_id docs).

    One pass computes all stage flags columnar; the only joins are the
    broadcast-able LSH doc2 set and the final 5-row unpivot. The
    signature table is read from the per-run scratch parquet."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    sig = minhash_signatures_materialized(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    dup2 = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    toks = F.split(F.col("text"), " ")
    ltoks = F.split(F.lower("text"), " ")
    flagged = docs.join(dup2, "doc_id", "left").select(
        (F.size(toks).between(40, 400)).alias("f1"),
        (
            F.size(F.expr(f"filter(split(lower(text), ' '), x -> x IN ({_EN_STOP}))"))
            >= 1
        ).alias("f2"),
        (F.size(F.array_distinct(ltoks)) * 3 >= F.size(ltoks)).alias("f3"),
        F.col("is_dup").isNull().alias("f4"),
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    agg = flagged.agg(
        F.count("*").alias("total"),
        one(F.col("f1")).alias("s1"),
        one(F.col("f1") & F.col("f2")).alias("s2"),
        one(F.col("f1") & F.col("f2") & F.col("f3")).alias("s3"),
        one(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4")).alias("s4"),
    )
    stacked = agg.selectExpr(
        "total",
        "stack(5, '00_all', total, '01_token_range', s1, '02_en_stopword', s2, "
        "'03_distinct_ratio', s3, '04_near_dup', s4) AS (stage, docs_retained)",
    )
    return stacked.select(
        "stage",
        F.col("docs_retained").cast("bigint").alias("docs_retained"),
        # total=0 -> NULL, not an ANSI divide-by-zero (empty-corpus
        # robustness; real data always has total > 0 so the oracle,
        # which keeps the bare division, is unaffected)
        F.when(
            F.col("total") > 0,
            F.col("docs_retained").cast("double") / F.col("total"),
        ).alias("retention"),
    )


# 64-bit signature SQL: shared bit-for-bit with `dedup_simhash`
# (dedup.py builds the string and the matching DataFrame aggregation
# from one bit-weight table, so the engines cannot drift).
_SIMHASH64_SQL = _SIMHASH_SQL


def _simhash64_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition before the md5/explode kernel: single-row-group local
    # parquet is unsplittable (see dedup.py _doc_shingles_build note)
    h = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        .select("doc_id", F.md5("tok").alias("th"))
    )
    return simhash_signature(h)


def simhash64_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash BIGINT) persisted to scratch once per run — both
    sides of the hamming-pair self-join read parquet instead of
    re-running the 64-way conditional-sum groupBy."""
    return materialized(spark, "simhash64_sig", sf_dir, _simhash64_build)


@register(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
    WITH sig AS ({_SIMHASH64_SQL}),
    bands AS ({_BANDS_UNNEST_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
                      a.simhash AS s1, b.simhash AS s2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT doc1, doc2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= {_HAMMING_MAX}
    """,
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band blocking then exact popcount.

    4 bands x 16 bits over the 64-bit signature: any pair within
    hamming distance 3 collides in >=1 band (pigeonhole), so the band
    self-join is a lossless candidate generator, and 65536 values per
    band keep chance bucket collisions ~n^2/65536 — past the birthday
    knee that made the 32-bit layout's candidate set quadratic at ~50k
    docs (SCALE.md §8). Candidates are verified with bit_count(xor),
    one integer op per pair."""
    sig = simhash64_materialized(spark, sf_dir)
    bands = sig.selectExpr("doc_id", "simhash", _BANDS_STACK_EXPR)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        cand.withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .select("doc1", "doc2", "hamming")
    )


# Incremental-ingest split: doc_id % _DELTA_MOD == 0 plays the newly
# arrived batch; the rest is the already-indexed corpus.
_DELTA_MOD = 10


@register(
    "dedup_incremental_lsh",
    oracle=f"""
    {_MINHASH_SIG_SQL}
    SELECT DISTINCT d.doc_id AS delta_doc, c.doc_id AS corpus_doc
    FROM sig d JOIN sig c
      ON d.band = c.band AND d.minhash = c.minhash
     AND d.doc_id % {_DELTA_MOD} = 0 AND c.doc_id % {_DELTA_MOD} <> 0
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup check: newly arrived documents (the delta)
    against the already-indexed corpus via the persisted signature
    table — the production shape for continuous ingestion: signature
    cost is O(|delta|), and the band join touches only the buckets the
    delta hashes into, never the corpus x corpus self-join. Pairs are
    (delta, corpus), so a delta doc matching an indexed doc is flagged
    for drop/canonicalization before it enters the training set."""
    sig = minhash_signatures_materialized(spark, sf_dir)
    delta = sig.filter(F.col("doc_id") % _DELTA_MOD == 0)
    base = sig.filter(F.col("doc_id") % _DELTA_MOD != 0)
    return (
        delta.alias("d")
        .join(
            base.alias("c"),
            (F.col("d.band") == F.col("c.band"))
            & (F.col("d.minhash") == F.col("c.minhash")),
        )
        .select(
            F.col("d.doc_id").alias("delta_doc"),
            F.col("c.doc_id").alias("corpus_doc"),
        )
        .distinct()
    )


@register(
    "quality_filter_apply",
    oracle=f"""
    {_MINHASH_SIG_SQL},
    dup2 AS (
      SELECT DISTINCT b.doc_id
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN dup2 ON d.doc_id = dup2.doc_id
    WHERE len(string_split(d.text, ' ')) BETWEEN 40 AND 400
      AND len(list_filter(string_split(lower(d.text), ' '),
              x -> x IN ({_EN_STOP}))) >= 1
      AND len(list_distinct(string_split(lower(d.text), ' '))) * 3
            >= len(string_split(lower(d.text), ' '))
      AND dup2.doc_id IS NULL
    """,
)
def quality_filter_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's OUTPUT: documents passing every curation stage —
    what actually ships to training. Same flags as
    quality_filter_funnel, conjoined as one columnar filter plus the
    broadcast-able near-dup anti condition; at scale this writes the
    curated corpus partitioned however the trainer wants it."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    sig = minhash_signatures_materialized(spark, sf_dir)
    a, b = sig.alias("a"), sig.alias("b")
    dup2 = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    ltoks = F.split(F.lower("text"), " ")
    kept = (
        docs.join(dup2, "doc_id", "left_anti")
        .filter(F.size(F.split(F.col("text"), " ")).between(40, 400))
        .filter(
            F.size(F.expr(f"filter(split(lower(text), ' '), x -> x IN ({_EN_STOP}))"))
            >= 1
        )
        .filter(F.size(F.array_distinct(ltoks)) * 3 >= F.size(ltoks))
    )
    return kept.select("doc_id", "lang", "source")


# Pseudo-line chunking for line-level boilerplate removal. The corpus
# documents carry no newlines, so the "line" tokenizer chunks every
# _LINE_TOKENS tokens — the operator is the CCNet-style line-frequency
# filter with a pluggable line splitter, not a newline-specific hack.
_LINE_TOKENS = 10
# A line is boilerplate when it appears in >= _LINE_DF_MIN distinct
# documents (CCNet removes any line duplicated elsewhere in the shard).
_LINE_DF_MIN = 2

_LINES_EXPR = (
    f"transform(sequence(1, greatest(CAST(ceil(size(toks) / {_LINE_TOKENS}.0) AS INT), 1)), "
    f"i -> concat_ws(' ', slice(toks, (i - 1) * {_LINE_TOKENS} + 1, {_LINE_TOKENS})))"
)

_LINES_SQL = f"""
    WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    ln AS (
      SELECT doc_id,
             list_transform(range(1, greatest(CAST(ceil(len(toks) / {_LINE_TOKENS}.0) AS BIGINT), 1) + 1),
                            i -> array_to_string(toks[((i - 1) * {_LINE_TOKENS} + 1):(i * {_LINE_TOKENS})], ' ')) AS lines
      FROM tk
    ),
    e AS (SELECT doc_id, unnest(lines) AS line FROM ln),
    el AS (SELECT doc_id, md5(line) AS line_hash,
                  len(string_split(line, ' ')) AS line_ntoks
           FROM e)
"""


def doc_pseudo_lines(docs: DataFrame, with_position: bool = False) -> DataFrame:
    """(doc_id, [pos,] line, line_hash) — THE pseudo-line lineage, used
    by the stats query, the published-set builder, boilerplate_apply,
    and the streaming screen, so the four tiers can never chunk or hash
    differently. `docs` needs (doc_id, text)."""
    tk = docs.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
    if with_position:
        el = tk.select("doc_id", F.posexplode(F.expr(_LINES_EXPR)).alias("pos", "line"))
        return el.withColumn("line_hash", F.md5("line"))
    el = tk.select("doc_id", F.explode(F.expr(_LINES_EXPR)).alias("line"))
    return el.withColumn("line_hash", F.md5("line"))


def _boilerplate_line_set(el: DataFrame) -> DataFrame:
    """(line_hash) with document frequency >= _LINE_DF_MIN over an
    exploded (doc_id, line_hash) frame — the published boilerplate
    set, derived in one place for every tier."""
    return (
        el.select("doc_id", "line_hash")
        .distinct()
        .groupBy("line_hash")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _LINE_DF_MIN)
        .select("line_hash")
    )


@register(
    "text_boilerplate_lines",
    oracle=_LINES_SQL
    + f"""
    , dfreq AS (
      SELECT line_hash, count(DISTINCT doc_id) AS df FROM el GROUP BY line_hash
    ),
    bp AS (SELECT line_hash FROM dfreq WHERE df >= {_LINE_DF_MIN})
    SELECT el.doc_id AS doc_id,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN b.line_hash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate_lines,
           CAST(sum(CASE WHEN b.line_hash IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS boilerplate_ratio,
           CAST(sum(CASE WHEN b.line_hash IS NULL THEN el.line_ntoks ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM el LEFT JOIN bp b ON el.line_hash = b.line_hash
    GROUP BY el.doc_id
    """,
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level boilerplate detection: chunk each document
    into 10-token pseudo-lines, hash every line, count each line's
    document frequency across the corpus, and flag lines appearing in
    >= 2 distinct documents as boilerplate. Per document: line count,
    boilerplate line count/ratio, and the token count that survives
    removal — the shard-dedup pass CCNet runs before model filtering.

    Scale shape: one explode + one 16-byte-key groupBy builds the line
    DF table (the same inverted-index shuffle as dedup), and the
    boilerplate flag is a left join against only the df >= 2 tail —
    in a real web crawl that tail (headers, nav bars, cookie banners)
    is orders of magnitude smaller than the distinct-line set, so AQE
    resolves it to a broadcast; nothing here is ever |docs|^2."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    el = doc_pseudo_lines(docs).select(
        "doc_id",
        "line_hash",
        F.size(F.split("line", " ")).alias("line_ntoks"),
    )
    bp = _boilerplate_line_set(doc_pseudo_lines(docs)).select(
        F.col("line_hash").alias("bp_hash")
    )
    j = el.join(bp, el.line_hash == bp.bp_hash, "left")
    flagged = F.when(F.col("bp_hash").isNotNull(), 1).otherwise(0)
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(flagged).cast("bigint").alias("n_boilerplate_lines"),
        (F.sum(flagged).cast("double") / F.count("*")).alias("boilerplate_ratio"),
        F.sum(F.when(F.col("bp_hash").isNull(), F.col("line_ntoks")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )


def boilerplate_apply(
    docs: DataFrame, boilerplate_lines: DataFrame, max_ratio: float = 1.0
) -> DataFrame:
    """The CCNet pass's OUTPUT: rebuild each document's text with its
    boilerplate pseudo-lines REMOVED (not just counted), dropping
    documents whose boilerplate share exceeds ``max_ratio`` (1.0 keeps
    every doc that retains at least one line). `docs` needs (doc_id,
    text); `boilerplate_lines` is the published df>=2 set (line_hash).

    Shape: explode to (doc, position, line), left-anti-ish flag join on
    the 16-byte hash, then one groupBy(doc_id) that reassembles the
    survivors IN POSITION ORDER via sort_array over (pos, line) structs
    — order restoration costs a struct sort per doc, never a window.
    Documents that are pure boilerplate disappear (their survivor set
    is empty)."""
    el = doc_pseudo_lines(docs, with_position=True)
    j = el.join(
        F.broadcast(boilerplate_lines.select(F.col("line_hash").alias("bp_hash"))),
        el.line_hash == F.col("bp_hash"),
        "left",
    )
    rebuilt = (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("bp_hash").isNotNull(), 1).otherwise(0)).alias("n_bp"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("bp_hash").isNull(), F.struct("pos", "line")
                    )
                )
            ).alias("kept"),
        )
        .filter(F.col("n_bp").cast("double") / F.col("n_lines") <= max_ratio)
        .filter(F.size("kept") > 0)
    )
    return rebuilt.select(
        "doc_id",
        F.concat_ws(" ", F.expr("transform(kept, x -> x.line)")).alias("clean_text"),
        (F.col("n_lines") - F.col("n_bp")).cast("bigint").alias("kept_lines"),
        (F.col("n_bp").cast("double") / F.col("n_lines")).alias("boilerplate_ratio"),
    )


def published_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df>=2 pseudo-line hash set over the corpus — the table the
    batch pass publishes for boilerplate_apply and the streaming screen
    (streaming/pipeline_stream.py stream_boilerplate_filter)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return _boilerplate_line_set(doc_pseudo_lines(docs))


@register(
    "contamination_apply",
    oracle=f"""
    WITH s AS ({_SHINGLES_SQL}),
    probe AS (SELECT DISTINCT unnest(shingles) AS shingle FROM s
              WHERE doc_id % {_PROBE_MOD} = 0),
    corpus AS (SELECT doc_id, shingles FROM s
               WHERE doc_id % {_PROBE_MOD} <> 0 AND len(shingles) > 0),
    m AS (
      SELECT c.doc_id, count(*) AS matched
      FROM (SELECT doc_id, unnest(shingles) AS shingle FROM corpus) c
      JOIN probe USING (shingle)
      GROUP BY c.doc_id
    ),
    scored AS (
      SELECT corpus.doc_id, len(corpus.shingles) AS n_sh,
             COALESCE(m.matched, 0) AS matched
      FROM corpus LEFT JOIN m ON corpus.doc_id = m.doc_id
    ),
    flagged AS (
      SELECT d.lang, d.n_chars, sc.n_sh, sc.matched,
             CASE WHEN 10 * sc.matched >= sc.n_sh THEN 1 ELSE 0 END AS dropped
      FROM scored sc JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs_before,
           CAST(sum(dropped) AS BIGINT) AS docs_dropped,
           CAST(count(*) - sum(dropped) AS BIGINT) AS docs_kept,
           CAST(sum(CASE WHEN dropped = 0 THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_kept,
           max(CASE WHEN dropped = 0
                    THEN CAST(matched AS DOUBLE) / n_sh END) AS max_kept_share
    FROM flagged GROUP BY lang
    """,
)
def contamination_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of benchmark decontamination: drop every corpus
    document whose probe-shingle overlap reaches 10% and report
    per-language retention (docs before/dropped/kept, character mass
    kept) plus the residual audit — the worst contamination share
    SURVIVING the cut, the number a decontamination report is actually
    judged on. The threshold compare is division-free exact integers
    (10 * matched >= n_shingles), the same edge rule family as the
    Jaccard cut; shares only become doubles at the output edge.

    Shares the probe/corpus/overlap construction verbatim with
    `contamination_ngram_overlap` (same `_SHINGLES_SQL` CTE block, same
    `_PROBE_MOD`), so detect and apply can never drift — the
    quality_filter_funnel/apply symmetry, for decontamination.

    Scale shape: identical to the detect pass (broadcast probe set,
    one narrow semi-join + doc grouping) plus one doc_id-keyed equi
    join to the documents table for lang/chars and a 5-group rollup."""
    s = _doc_shingles(spark, sf_dir)
    probe = (
        s.filter(F.col("doc_id") % _PROBE_MOD == 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    corpus = s.filter(
        (F.col("doc_id") % _PROBE_MOD != 0) & (F.col("n_shingles") > 0)
    )
    matched = (
        corpus.select("doc_id", F.explode("shingles").alias("shingle"))
        .join(F.broadcast(probe), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("matched"))
    )
    scored = (
        corpus.select("doc_id", F.col("n_shingles").alias("n_sh"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_sh",
            F.coalesce("matched", F.lit(0).cast("bigint")).alias("matched"),
        )
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    flagged = scored.join(docs, "doc_id").select(
        "lang",
        "n_chars",
        "n_sh",
        "matched",
        F.when(10 * F.col("matched") >= F.col("n_sh"), 1)
        .otherwise(0)
        .alias("dropped"),
    )
    return flagged.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("docs_before"),
        F.sum("dropped").cast("bigint").alias("docs_dropped"),
        (F.count("*") - F.sum("dropped")).cast("bigint").alias("docs_kept"),
        F.sum(F.when(F.col("dropped") == 0, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("chars_kept"),
        F.max(
            F.when(
                F.col("dropped") == 0,
                F.col("matched").cast("double") / F.col("n_sh").cast("double"),
            )
        ).alias("max_kept_share"),
    )
