"""Text analysis operators over the documents table: language-ID,
quality scoring, token counting, fingerprinting.

Everything is integer/string columnar math (counts, ratios of exact
integers, md5) so all four are oracle-exact and stay inside
whole-stage codegen — no UDFs anywhere in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t

# tiny per-language stopword lists for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "sur"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "他", "这", "不"),
}


def _hits_expr(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return f"size(filter(toks, x -> x IN ({lst})))"


def _hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return f"len(list_filter(toks, x -> x IN ({lst})))"


_LANGS = ("en", "de", "es", "fr", "zh")


# WITH-composable: also the base of eval_language_id_confusion
_LANG_ID_SQL = f"""
    WITH tk AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents),
    sc AS (
      SELECT doc_id, lang AS true_lang,
             {", ".join(f"{_hits_sql(lang)} AS hits_{lang}" for lang in _LANGS)}
      FROM tk
    )
    SELECT doc_id, true_lang, hits_en, hits_de, hits_es, hits_fr, hits_zh,
           CASE greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh)
                WHEN hits_en THEN 'en' WHEN hits_de THEN 'de' WHEN hits_es THEN 'es'
                WHEN hits_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
    FROM sc
    """


@register("text_language_id", oracle=_LANG_ID_SQL)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword hit counts, argmax
    with a fixed tie order (en > de > es > fr > zh)."""
    tk = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    sc = tk.select(
        "doc_id",
        "true_lang",
        *[F.expr(_hits_expr(lang)).alias(f"hits_{lang}") for lang in _LANGS],
    )
    hits = [F.col(f"hits_{lang}") for lang in _LANGS]
    best = F.greatest(*hits)
    pred = (
        F.when(best == hits[0], "en")
        .when(best == hits[1], "de")
        .when(best == hits[2], "es")
        .when(best == hits[3], "fr")
        .otherwise("zh")
    )
    return sc.withColumn("predicted_lang", pred)


@register(
    "text_quality_score",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_chars_m,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('the','and','of','to','a','in','is','it','for','on'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens, n_chars_m, n_punct, n_stop,
           CAST(n_punct AS DOUBLE) / n_chars_m AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_chars_m AS DOUBLE) / n_tokens AS avg_token_len
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: length, punctuation ratio, stopword ratio,
    average token length — the standard cheap pre-filters for corpus
    cleaning."""
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    m = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
        F.size(F.expr(r"regexp_extract_all(text, '[.,;:!?]', 0)")).alias("n_punct"),
        F.size(
            F.expr(f"filter(split(lower(text), ' '), x -> x IN ({stop_list}))")
        ).alias("n_stop"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "n_chars_m",
        "n_punct",
        "n_stop",
        (F.col("n_punct").cast("double") / F.col("n_chars_m")).alias("punct_ratio"),
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("stopword_ratio"),
        (F.col("n_chars_m").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS whitespace_tokens,
           CAST(list_reduce(list_transform(string_split(text, ' '),
                w -> CAST(ceil(length(w) / 4.0) AS BIGINT)), (x, y) -> x + y) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate
    (ceil(len/4) pieces per word — the usual ~4-chars-per-token rule)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("whitespace_tokens"),
        F.aggregate(
            F.transform(
                F.split("text", " "),
                lambda w: F.ceil(F.length(w) / 4.0).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("bpe_ish_tokens"),
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH tk AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
    sh AS (
      SELECT doc_id, text,
             list_transform(range(1, greatest(len(toks) - 1, 1)),
                            i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shash
      FROM tk
    )
    SELECT doc_id,
           substr(md5(lower(text)), 1, 16) AS fingerprint,
           list_reduce(shash, (x, y) -> least(x, y)) AS min_shingle_hash
    FROM sh
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 64-bit content hash + winnowing-style
    min shingle hash (rolling-hash family via md5 of 3-gram windows)."""
    from lakeview_spark.pipeline.dedup import _shingles_expr

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.md5(F.lower("text")), 1, 16).alias("fingerprint"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    sh = docs.withColumn("shingles", F.expr(_shingles_expr()))
    return sh.select(
        "doc_id",
        "fingerprint",
        F.array_min(F.transform("shingles", F.md5)).alias("min_shingle_hash"),
    )


# PII scrubbing (the C4/Dolma-style redaction pass). The synthetic
# corpus is PII-free word salad, so the query INJECTS deterministic
# contact strings first (doc_id-derived, identical expression in both
# engines — the same make-the-op-non-vacuous device the multimodal
# queries use to synthesize BMP/WAV payloads) and then detects and
# redacts them with conservative regexes that parse identically under
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition and \b only — no lookaround, no backreferences.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,4}"
_PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _pii_injected_sql() -> str:
    return (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
    )


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id, {_pii_injected_sql()} AS body FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(body, '{_PII_IP}')) AS BIGINT) AS n_ips,
           CAST(length(body) AS BIGINT) AS raw_chars,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(body,
                  '{_PII_EMAIL}', '<EMAIL>', 'g'),
                  '{_PII_PHONE}', '<PHONE>', 'g'),
                  '{_PII_IP}', '<IP>', 'g')) AS BIGINT) AS scrubbed_chars
    FROM injected
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction telemetry: per document, how many
    email / phone / IPv4 literals appear and how many characters the
    redacted form has — the pre-training scrub pass (cf. the C4 and
    Dolma cleanup stages) expressed as pure columnar regexp ops.

    Scale shape: one narrow map over the documents scan (three
    regexp_count + a three-stage regexp_replace chain, all inside
    whole-stage codegen), no shuffle, no join — at 100 TB this is
    scan-bound and embarrassingly parallel, the cheapest kind of
    full-corpus pass. Redaction REPLACES rather than drops, so
    downstream token counts shift but alignment-sensitive consumers
    (span dedup, chunking) still see one coherent text column."""
    body = _pii_body_col()
    scrubbed = _pii_scrub_col(body)
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(body, F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(body, F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_count(body, F.lit(_PII_IP)).cast("bigint").alias("n_ips"),
        F.length(body).cast("bigint").alias("raw_chars"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_chars"),
    )


def _pii_body_col() -> F.Column:
    """documents.text with the deterministic doc_id-derived contact
    strings appended — the Spark twin of _pii_injected_sql (tests reuse
    it to re-scan the SCRUBBED text for residue)."""
    mail = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" mail user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise("")
    phone = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    ip = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" host 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
        ),
    ).otherwise("")
    return F.concat(F.col("text"), mail, phone, ip)


def _pii_scrub_col(body: F.Column) -> F.Column:
    """The three-stage redaction chain over a text column."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )


@register(
    "text_surprisal_bits",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (
      SELECT CAST(length(printf('%b', count(*))) AS BIGINT) AS bln FROM tok
    ),
    perdoc AS (
      SELECT t.doc_id, t.lang, count(*) AS n_tokens,
             CAST(sum(length(printf('%b', v.c))) AS BIGINT) AS sum_blc
      FROM tok t JOIN vocab v USING (token)
      GROUP BY 1, 2
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens * bln - sum_blc AS BIGINT) AS total_bits,
           CASE WHEN n_tokens > 0 THEN
             CAST(n_tokens * bln - sum_blc AS DOUBLE) / CAST(n_tokens AS DOUBLE)
           END AS mean_bits
    FROM perdoc, tot
    """,
)
def text_surprisal_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal scoring in exact INTEGER bit-length space —
    the perplexity-proxy quality filter (low mean surprisal = stock
    phrasing / boilerplate-heavy, high = rare-token-dense or noise)
    without touching log()/exp(), which are not correctly rounded and
    so can never be oracle-exact. Device: floor(log2(x)) ==
    bitlength(x) - 1 exactly, so token surprisal -log2(c/N) is
    approximated by bitlength(N) - bitlength(c) (within 1 bit), and a
    document's total stays in BIGINT: total_bits = n_tokens *
    bitlength(N) - sum(bitlength(c)). One guarded double division at
    the edge for the per-token mean.

    Scale shape: vocabulary count is one partial-aggregable groupBy;
    the count join back to the occurrence stream is token-keyed equi
    (vocabulary-sized build side); the corpus total enters as a 1-row
    broadcast AFTER the per-doc aggregation, so the big stream crosses
    one shuffle (doc grouping) total."""
    tok = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    )
    vocab = tok.groupBy("token").agg(F.count("*").alias("c"))
    # corpus total = sum over the (small) vocab table — not a third
    # pass over the token stream (the sample_dsir_select device)
    tot = vocab.agg(
        F.length(F.bin(F.sum("c"))).cast("bigint").alias("bln")
    )
    perdoc = (
        tok.join(vocab, "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.length(F.bin("c"))).cast("bigint").alias("sum_blc"),
        )
    )
    total_bits = (F.col("n_tokens") * F.col("bln") - F.col("sum_blc")).cast(
        "bigint"
    )
    return perdoc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        total_bits.alias("total_bits"),
        F.when(
            F.col("n_tokens") > 0,
            total_bits.cast("double") / F.col("n_tokens").cast("double"),
        ).alias("mean_bits"),
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, greatest(len(toks), 1)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
            FROM documents)
    ),
    df AS (
      SELECT bg, count(DISTINCT doc_id) AS docs_with FROM feat GROUP BY bg
    ),
    perdoc AS (
      SELECT f.doc_id, f.lang,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(count(DISTINCT f.bg) AS BIGINT) AS n_distinct,
             CAST(count(DISTINCT CASE WHEN d.docs_with = 1 THEN f.bg END)
                  AS BIGINT) AS n_unique
      FROM feat f JOIN df d USING (bg)
      GROUP BY f.doc_id, f.lang
    )
    SELECT doc_id, lang, n_bigrams, n_distinct, n_unique,
           CASE WHEN n_distinct > 0 THEN
             CAST(n_unique AS DOUBLE) / CAST(n_distinct AS DOUBLE)
           END AS novelty
    FROM perdoc
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    bigrams that appear in NO other document (document frequency 1) —
    the leave-one-out memorization/contamination telemetry a training
    pipeline reads next to the dedup reports. novelty ~ 1 means the doc
    is compositionally fresh; novelty ~ 0 means everything in it
    already exists elsewhere (boilerplate, template spin, near-dup
    leakage that survived exact dedup). Pure integers until the one
    guarded edge division.

    Scale shape: one bigram document-frequency count (partial
    aggregable — df counting is the same vocabulary-sized job every
    dedup pass runs), one bigram-keyed equi join back to the doc
    stream, one doc-keyed aggregation. No corpus self-join: df==1 IS
    the leave-one-out test, so the per-pair comparison never happens."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    )
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE "
        "zip_with(slice(toks, 1, size(toks) - 1), "
        "slice(toks, 2, size(toks) - 1), "
        "(x, y) -> concat(x, ' ', y)) END"
    )
    feat = docs.select("doc_id", "lang", F.explode(bigrams).alias("bg"))
    df = feat.groupBy("bg").agg(F.countDistinct("doc_id").alias("docs_with"))
    perdoc = (
        feat.join(df, "bg")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.countDistinct("bg").cast("bigint").alias("n_distinct"),
            F.countDistinct(
                F.when(F.col("docs_with") == 1, F.col("bg"))
            ).cast("bigint").alias("n_unique"),
        )
    )
    return perdoc.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "n_distinct",
        "n_unique",
        F.when(
            F.col("n_distinct") > 0,
            F.col("n_unique").cast("double") / F.col("n_distinct").cast("double"),
        ).alias("novelty"),
    )


# KenLM-style model prune (r12, VERDICT r11 next-4): bigram TYPES
# occurring fewer than _BIGRAM_MIN_COUNT times are dropped from the
# model table — singletons are the bulk of bigram types by Zipf and
# were the 2.9x-at-10x growth term — and pruned/unseen pairs price
# through the unigram backoff with c12 = 0 (add-one smoothing makes
# that bl(1) = 1, so the fallback is exact, never a log(0)). The price
# decomposes as fb1(w1) + fb2(w2) + adj(w1, w2): two PER-TOKEN prices
# assembled on the vocabulary table, plus a model adjustment
# 3*(1 - bl(c12+1)) <= -3 carried only by the BOUNDED kept-model table
# (a discount for attested collocations).
_BIGRAM_MIN_COUNT = 2

# The trained bigram-LM oracle CTE block (tokenize -> doc-level
# adjacent pairs -> unigram/bigram counts -> per-token backoff prices +
# pruned model adjustments) — shared verbatim by the doc-level
# perplexity oracle and the paragraph-granular twins below so the two
# can never disagree on the model (the _CAPPED_PAIRS_SQL convention).
_PPL_LM_CTES = f"""
    tk AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
      FROM documents
    ),
    pr AS (
      SELECT doc_id, lang, unnest(
               CASE WHEN len(toks) < 2 THEN []
                    ELSE list_transform(range(1, len(toks)),
                         i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))
               END) AS p
      FROM tk
    ),
    pairs AS (SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2 FROM pr),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM
        (SELECT unnest(toks) AS w FROM tk) GROUP BY w
    ),
    consts AS (
      SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
      FROM uni
    ),
    fb1 AS (
      SELECT w AS w1,
             3 * (CAST(length(printf('%b', c + v)) AS BIGINT) - 1) AS q1
      FROM uni CROSS JOIN consts
    ),
    fb2 AS (
      SELECT w AS w2,
             CAST(length(printf('%b', n + v)) AS BIGINT)
             - CAST(length(printf('%b', c + 1)) AS BIGINT) AS q2
      FROM uni CROSS JOIN consts
    ),
    model AS (
      SELECT w1, w2,
             3 * (1 - CAST(length(printf('%b', c12 + 1)) AS BIGINT)) AS adj
      FROM (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM pairs GROUP BY w1, w2)
      WHERE c12 >= {_BIGRAM_MIN_COUNT}
    )
"""


def _ppl_bl(c):
    """Exact bitlength (floor-log2 + 1) — the log-free log."""
    return F.length(F.bin(c)).cast("bigint")


def _ppl_tk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    )


def _ppl_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level adjacent token pairs — the LM training stream AND the
    doc-level scoring stream."""
    pair_structs = F.expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE "
        "zip_with(slice(toks, 1, size(toks) - 1), "
        "slice(toks, 2, size(toks) - 1), "
        "(x, y) -> struct(x AS w1, y AS w2)) END"
    )
    return (
        _ppl_tk(spark, sf_dir)
        .select("doc_id", "lang", F.explode(pair_structs).alias("p"))
        .select(
            "doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
    )


def _ppl_prices_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token backoff prices (module-level so the doc-level gate and
    the paragraph twins share ONE `ppl_prices` scratch build)."""
    uni = (
        _ppl_tk(spark, sf_dir)
        .select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wfull = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        uni.withColumn("n", F.sum("c").over(wfull).cast("bigint"))
        .withColumn("v", F.count("*").over(wfull).cast("bigint"))
        .select(
            "w",
            (3 * (_ppl_bl(F.col("c") + F.col("v")) - 1)).alias("q1"),
            (_ppl_bl(F.col("n") + F.col("v")) - _ppl_bl(F.col("c") + 1)).alias("q2"),
        )
    )


def _ppl_model_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-pruned bigram adjustment table (shared scratch build)."""
    return (
        _ppl_doc_pairs(spark, sf_dir)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c12"))
        .filter(F.col("c12") >= _BIGRAM_MIN_COUNT)
        .select("w1", "w2", (3 * (1 - _ppl_bl(F.col("c12") + 1))).alias("adj"))
    )


@register(
    "text_perplexity_bigram",
    oracle=f"""
    WITH {_PPL_LM_CTES}
    SELECT p.doc_id, p.lang,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(f1.q1 + f2.q2 + coalesce(m.adj, 0)) AS BIGINT)
             AS total_qbits,
           CAST(sum(f1.q1 + f2.q2 + coalesce(m.adj, 0)) AS DOUBLE)
             / (4.0 * count(*)) AS bits_per_bigram
    FROM pairs p
    JOIN fb1 f1 ON f1.w1 = p.w1
    JOIN fb2 f2 ON f2.w2 = p.w2
    LEFT JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2
    GROUP BY p.doc_id, p.lang
    """,
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity gate — the CCNet/KenLM-style
    filter `text_surprisal_bits` approximates only at order 1 (VERDICT
    r10 next-3). Per adjacent token pair (w1, w2), the cost is the
    lambda = 3/4 interpolation of the order-2 conditional and the
    order-1 fallback, kept ENTIRELY in the exact integer bit-length
    domain in QUARTER-BIT units (power-of-2 interpolation weights are
    shift-only, so no float ever enters):

        qbits = 3 * [bl(c(w1) + V) - bl(c12 + 1)]      -- bigram cond.
              +     [bl(N + V)     - bl(c(w2) + 1)]    -- unigram

    where bl = bitlength (floor-log2 + 1, exact in both engines), c12
    the corpus bigram count (0 for pairs PRUNED from the model — the
    r12 min-count prune, section comment above), c() unigram counts,
    N total tokens, V vocabulary size — add-one smoothing everywhere,
    so no log(0) and every term a positive BIGINT. Per-doc total_qbits
    is an exact BIGINT sum; the single guarded double division
    (quarter-bits -> bits per bigram) happens at the output edge on
    identical integers. High bits_per_bigram = improbable word
    sequences under the corpus model (noise / shuffled text); low =
    stock phrasing. Every doc has >= 10 tokens in the synthetic
    corpus, so the pair stream covers all docs (no n_bigrams = 0
    branch to keep).

    Scale shape (the sample_dsir_select economics, r12-bounded): the
    MODEL table keeps only bigram types with c12 >= {_BIGRAM_MIN_COUNT}
    — the KenLM prune; singleton types were the unbounded 2.9x-at-10x
    growth term (VERDICT r11 next-4). The trained LM is two
    MATERIALIZED scratch tables (the index-materialization rule: the
    lazy uni/pairs subtrees were referenced 3x/2x in one plan, and the
    derived-plan replay re-tokenized the corpus per reference — 4.3 s
    -> ~1 s steady at sf1): `ppl_prices` (per-token backoff prices,
    one corpus pass — corpus totals come from full-frame windows over
    the vocab-sized agg, never a second scan) and `ppl_model` (the
    pruned bigram adjustments, one corpus pass). Steady state the pair
    stream crosses two vocab-keyed price joins + one left join against
    the bounded model (all build sides scratch scans), then one
    doc-keyed aggregation. No global sort, no all-pairs."""
    from lakeview_spark.operators.materialize import materialized

    pairs = _ppl_doc_pairs(spark, sf_dir)
    prices = materialized(spark, "ppl_prices", sf_dir, _ppl_prices_build)
    model = materialized(spark, "ppl_model", sf_dir, _ppl_model_build)
    fb1 = prices.select(F.col("w").alias("w1"), "q1")
    fb2 = prices.select(F.col("w").alias("w2"), "q2")
    qbits = F.col("q1") + F.col("q2") + F.coalesce(F.col("adj"), F.lit(0))
    return (
        pairs.join(fb1, "w1")
        .join(fb2, "w2")
        .join(model, ["w1", "w2"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(qbits).cast("bigint").alias("total_qbits"),
            (
                F.sum(qbits).cast("double")
                / (4.0 * F.count("*").cast("double"))
            ).alias("bits_per_bigram"),
        )
    )


# Paragraph-granular perplexity filtering (r13, VERDICT r12 next-9 —
# the CCNet stage the doc-level gate above approximates; Wenzek et
# al. 2020, CCNet): CCNet's
# scoring unit is the PARAGRAPH, docs are reassembled from kept
# paragraphs. The synthetic corpus has no newlines, so the paragraph
# stand-in is fixed _PARA_TOKENS-token windows (deterministic,
# position-preserving; with real text the split expression swaps to
# split(text, '\n') and everything downstream is unchanged). Each
# paragraph is scored under the SAME trained corpus LM (the
# materialized ppl_prices / ppl_model scratch), quantized to an exact
# integer score s = total_qbits * 2^20 div n_bigrams, and bucketed
# head/middle/tail by corpus terciles computed with the
# histogram-threshold device (mix_source_caps): thresholds come from a
# cumulative window over the SMALL (s, count) histogram — never a
# global sort of paragraphs — and ties share a bucket, so no rank
# tiebreak is needed. Exact-range note: total_qbits is bounded by the
# paragraph (< _PARA_TOKENS pairs x ~200 quarter-bits), so the 2^20
# quantization stays far below 2^63 at ANY corpus scale — the bound is
# structural, not statistical.
_PARA_TOKENS = 16
_PARA_QSCALE = 1 << 20

_PARA_SCORED_CTES = f"""
    paras AS (
      SELECT doc_id, lang, CAST(i - 1 AS BIGINT) AS para_idx,
             toks[((i - 1) * {_PARA_TOKENS} + 1):least(i * {_PARA_TOKENS}, len(toks))] AS ptoks
      FROM (SELECT doc_id, lang, toks,
                   unnest(range(1, (len(toks) + {_PARA_TOKENS} - 1) // {_PARA_TOKENS} + 1)) AS i
            FROM tk)
    ),
    ppr AS (
      SELECT doc_id, lang, para_idx, unnest(
               CASE WHEN len(ptoks) < 2 THEN []
                    ELSE list_transform(range(1, len(ptoks)),
                         i -> struct_pack(w1 := ptoks[i], w2 := ptoks[i + 1]))
               END) AS p
      FROM paras
    ),
    ppairs AS (SELECT doc_id, lang, para_idx, p.w1 AS w1, p.w2 AS w2 FROM ppr),
    pscored AS (
      SELECT p.doc_id, p.lang, p.para_idx,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(f1.q1 + f2.q2 + coalesce(m.adj, 0)) AS BIGINT) AS total_qbits
      FROM ppairs p
      JOIN fb1 f1 ON f1.w1 = p.w1
      JOIN fb2 f2 ON f2.w2 = p.w2
      LEFT JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2
      GROUP BY p.doc_id, p.lang, p.para_idx
    ),
    pq AS (
      SELECT *, total_qbits * {_PARA_QSCALE} // n_bigrams AS s FROM pscored
    ),
    hist AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM pq GROUP BY s),
    cum AS (
      SELECT s, sum(c) OVER (ORDER BY s) AS cc, sum(c) OVER () AS nn FROM hist
    ),
    thr AS (
      SELECT CAST(min(CASE WHEN 3 * cc >= nn THEN s END) AS BIGINT) AS t1,
             CAST(min(CASE WHEN 3 * cc >= 2 * nn THEN s END) AS BIGINT) AS t2
      FROM cum
    )
"""


def _para_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized per-paragraph score scratch (doc_id, lang,
    para_idx, n_bigrams, total_qbits, s) — built once per (session,
    dataset) because the tercile thresholds AND the bucket readout both
    reference it (the k-core replay rule: two references to the lazy
    pair-scoring subtree would re-tokenize the corpus per reference),
    and the apply half reads it again."""
    from lakeview_spark.operators.materialize import materialized

    def _build(s_, d_):
        tk = t(s_, d_, "documents").select(
            "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
        )
        paras = tk.select(
            "doc_id",
            "lang",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (size(toks) - 1) div {_PARA_TOKENS}), "
                    f"i -> slice(toks, i * {_PARA_TOKENS} + 1, {_PARA_TOKENS}))"
                )
            ).alias("para_idx", "ptoks"),
        ).select(
            "doc_id", "lang", F.col("para_idx").cast("bigint").alias("para_idx"), "ptoks"
        )
        pair_structs = F.expr(
            "CASE WHEN size(ptoks) < 2 THEN array() ELSE "
            "zip_with(slice(ptoks, 1, size(ptoks) - 1), "
            "slice(ptoks, 2, size(ptoks) - 1), "
            "(x, y) -> struct(x AS w1, y AS w2)) END"
        )
        ppairs = paras.select(
            "doc_id", "lang", "para_idx", F.explode(pair_structs).alias("p")
        ).select(
            "doc_id", "lang", "para_idx",
            F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"),
        )
        from lakeview_spark.operators.materialize import materialized as _mat

        prices = _mat(s_, "ppl_prices", d_, _ppl_prices_build)
        model = _mat(s_, "ppl_model", d_, _ppl_model_build)
        fb1 = prices.select(F.col("w").alias("w1"), "q1")
        fb2 = prices.select(F.col("w").alias("w2"), "q2")
        qbits = F.col("q1") + F.col("q2") + F.coalesce(F.col("adj"), F.lit(0))
        scored = (
            ppairs.join(fb1, "w1")
            .join(fb2, "w2")
            .join(model, ["w1", "w2"], "left")
            .groupBy("doc_id", "lang", "para_idx")
            .agg(
                F.count("*").cast("bigint").alias("n_bigrams"),
                F.sum(qbits).cast("bigint").alias("total_qbits"),
            )
        )
        return scored.withColumn(
            "s", F.expr(f"(total_qbits * {_PARA_QSCALE}) div n_bigrams")
        )

    return materialized(spark, "para_scores", sf_dir, _build)


def _para_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (t1, t2) tercile thresholds over the score histogram —
    the histogram-threshold device: the cumulative window runs over the
    distinct-score table (bounded by the quantized score space), never
    the paragraph stream."""
    hist = _para_scores(spark, sf_dir).groupBy("s").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wcum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "s",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wfull).alias("nn"),
    )
    return cum.agg(
        F.min(F.when(3 * F.col("cc") >= F.col("nn"), F.col("s")))
        .cast("bigint")
        .alias("t1"),
        F.min(F.when(3 * F.col("cc") >= 2 * F.col("nn"), F.col("s")))
        .cast("bigint")
        .alias("t2"),
    )


@register(
    "text_paragraph_ppl",
    oracle=f"""
    WITH {_PPL_LM_CTES},
    {_PARA_SCORED_CTES}
    SELECT doc_id, lang, para_idx, n_bigrams, total_qbits, s,
           CASE WHEN s <= t1 THEN 'head'
                WHEN s <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM pq, thr
    """,
)
def text_paragraph_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-paragraph LM scores with CCNet head/middle/tail buckets
    (section comment above): each fixed-window paragraph scored under
    the corpus bigram LM, bucketed by corpus score terciles (head =
    best-scoring third). Scale shape: the paragraph scores are ONE
    materialized corpus pass over vocab-keyed price joins; the tercile
    thresholds are two tiny aggregates over the (s, count) histogram,
    broadcast back — no global sort of paragraphs, no rank tiebreaks
    (value thresholds make ties share a bucket)."""
    scored = _para_scores(spark, sf_dir)
    thr = _para_thresholds(spark, sf_dir)
    bucket = (
        F.when(F.col("s") <= F.col("t1"), F.lit("head"))
        .when(F.col("s") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id", "lang", "para_idx", "n_bigrams", "total_qbits", "s",
        bucket.alias("bucket"),
    )


@register(
    "text_paragraph_apply",
    oracle=f"""
    WITH {_PPL_LM_CTES},
    {_PARA_SCORED_CTES},
    pk AS (
      SELECT pa.doc_id, pa.lang, pa.para_idx,
             array_to_string(pa.ptoks, ' ') AS ptext,
             (sc.s IS NULL OR sc.s <= thr.t2) AS kept
      FROM paras pa
      LEFT JOIN pq sc ON sc.doc_id = pa.doc_id AND sc.para_idx = pa.para_idx
      CROSS JOIN thr
    )
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_paras,
           coalesce(string_agg(CASE WHEN kept THEN ptext END, ' ' ORDER BY para_idx), '')
             AS filtered_text
    FROM pk GROUP BY doc_id, lang
    """,
)
def text_paragraph_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply half: drop tail-bucket (worst-tercile) paragraphs and
    REASSEMBLE each document from its kept paragraphs in order (the
    boilerplate_apply reassembly device) — unscored paragraphs (< 2
    tokens, no bigram evidence) are kept. Output is the filtered doc
    with before/after paragraph counts. Scale shape: one corpus pass
    re-derives paragraph text; the verdicts come from the para_scores
    scratch via a doc-keyed equi join + the broadcast 1-row thresholds;
    reassembly is a doc_id-keyed groupBy whose per-group state is the
    doc's own paragraphs."""
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    )
    paras = tk.select(
        "doc_id",
        "lang",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(toks) - 1) div {_PARA_TOKENS}), "
                f"i -> slice(toks, i * {_PARA_TOKENS} + 1, {_PARA_TOKENS}))"
            )
        ).alias("para_idx", "ptoks"),
    ).select(
        "doc_id",
        "lang",
        F.col("para_idx").cast("bigint").alias("para_idx"),
        F.array_join("ptoks", " ").alias("ptext"),
    )
    scored = _para_scores(spark, sf_dir).select("doc_id", "para_idx", "s")
    thr = _para_thresholds(spark, sf_dir)
    kept = F.col("s").isNull() | (F.col("s") <= F.col("t2"))
    pk = (
        paras.join(scored, ["doc_id", "para_idx"], "left")
        .crossJoin(F.broadcast(thr))
        .select("doc_id", "lang", "para_idx", "ptext", kept.alias("kept"))
    )
    return pk.groupBy("doc_id", "lang").agg(
        F.count("*").cast("bigint").alias("n_paras"),
        F.sum(F.col("kept").cast("bigint")).cast("bigint").alias("kept_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("kept"), F.struct("para_idx", "ptext"))
                    )
                ),
                lambda x: x["ptext"],
            ),
            " ",
        ).alias("filtered_text"),
    )


@register(
    "eval_paragraph_retention",
    oracle=f"""
    WITH {_PPL_LM_CTES},
    {_PARA_SCORED_CTES},
    pb AS (
      SELECT lang,
             CASE WHEN s <= t1 THEN 'head'
                  WHEN s <= t2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             n_bigrams, total_qbits
      FROM pq, thr
    ),
    g AS (
      SELECT lang, bucket,
             CAST(count(*) AS BIGINT) AS n_paras,
             CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
             CAST(sum(total_qbits) AS BIGINT) AS total_qbits
      FROM pb GROUP BY lang, bucket
    )
    SELECT lang, bucket, n_paras, n_bigrams, total_qbits,
           CAST(n_paras AS DOUBLE)
             / CAST(sum(n_paras) OVER (PARTITION BY lang) AS DOUBLE)
             AS para_share,
           CAST(n_bigrams AS DOUBLE)
             / CAST(sum(n_bigrams) OVER (PARTITION BY lang) AS DOUBLE)
             AS bigram_share,
           bucket <> 'tail' AS retained
    FROM g
    """,
)
def eval_paragraph_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, bucket) retention audit rounding out the CCNet
    paragraph family (r14, VERDICT r13 next-5 — CCNet's published
    ablation is exactly this table, Wenzek et al. 2020 Table 2): for
    every language, how many paragraphs and how much bigram mass land
    in each perplexity tercile, each bucket's share of its language,
    and whether the apply stage retains it (head/middle kept, tail
    dropped — text_paragraph_apply's rule, so per lang the retained
    buckets' n_paras sum to apply's kept SCORED paragraphs; the
    composed pytest pins that identity including the unscored-kept
    remainder). Scale shape: reads the materialized para_scores
    scratch + the broadcast 1-row thresholds, one (lang, bucket)
    aggregation (<= langs x 3 groups at any corpus size), lang totals
    from windows over that tiny grouped table — no extra corpus pass.
    The shares divide identical exact integers in both engines, and
    every denominator is a group's own positive count."""
    scored = _para_scores(spark, sf_dir)
    thr = _para_thresholds(spark, sf_dir)
    bucket = (
        F.when(F.col("s") <= F.col("t1"), F.lit("head"))
        .when(F.col("s") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    g = (
        scored.crossJoin(F.broadcast(thr))
        .select("lang", bucket.alias("bucket"), "n_bigrams", "total_qbits")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_paras"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.sum("total_qbits").cast("bigint").alias("total_qbits"),
        )
    )
    wl = Window.partitionBy("lang")
    return g.select(
        "lang",
        "bucket",
        "n_paras",
        "n_bigrams",
        "total_qbits",
        (
            F.col("n_paras").cast("double")
            / F.sum("n_paras").over(wl).cast("double")
        ).alias("para_share"),
        (
            F.col("n_bigrams").cast("double")
            / F.sum("n_bigrams").over(wl).cast("double")
        ).alias("bigram_share"),
        (F.col("bucket") != F.lit("tail")).alias("retained"),
    )
