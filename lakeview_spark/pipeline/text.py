"""Text analysis operators over the documents table: language-ID,
quality scoring, token counting, fingerprinting.

Everything is integer/string columnar math (counts, ratios of exact
integers, md5) so all four are oracle-exact and stay inside
whole-stage codegen — no UDFs anywhere in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
