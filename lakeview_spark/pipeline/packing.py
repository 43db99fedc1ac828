"""Sequence packing: the concat-and-chunk sharding step of LLM
pretraining data prep.

Documents are concatenated per language in doc_id order and the token
stream is cut into fixed-budget training sequences; each document is
assigned the sequence its first token lands in plus its offset there.
This is the standard "tokenize -> concat -> chunk" layout (a doc
crossing a boundary spans into the next sequence; the slicer downstream
consumes (seq_id, offset) to emit the pieces).

Scale shape — the naive form is a window over PARTITION BY lang ORDER BY
doc_id, which Spark executes as ONE task per language: a 100 TB corpus
with 10 languages would serialize into 10 tasks. Instead the prefix sum
is computed with the textbook two-phase plan, so every window partition
is bounded no matter how large a language is:

1. docs are assigned a doc_id range bucket (``_BUCKET`` ids per bucket);
2. per-(lang, bucket) token sums — a tiny aggregate (langs × buckets
   rows, data-independent);
3. running bucket offsets via a window over that TINY table;
4. offsets broadcast-joined back; the final cumsum is a window over
   (lang, bucket) — at most ``_BUCKET`` rows per partition.

Every stage is columnar (no UDFs); token counts reuse
`text_token_count`'s whitespace definition so the two queries agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t

# tokens per packed training sequence
SEQ_BUDGET = 2048
# doc_ids per prefix-sum bucket: window partitions are <= this many rows
_BUCKET = 256


def _cum_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_tokens, cum_before): tokens of all prior docs in
    the same lang (doc_id order) via the bounded two-phase prefix sum."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return prefix_sum_per_group(docs)


def prefix_sum_per_group(docs: DataFrame) -> DataFrame:
    """Distributed exclusive prefix sum of ``n_tokens`` over (lang,
    doc_id order) with every window partition bounded by ``_BUCKET``
    rows — the reusable core of the packing queries (see module
    docstring for the two-phase plan)."""
    docs = docs.withColumn(
        "bucket",
        F.expr(f"doc_id div {_BUCKET}"),  # integer div: exact past 2^53
    )
    # phase 1: tiny per-(lang, bucket) sums -> running offset per lang
    bucket_sums = docs.groupBy("lang", "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_bucket = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_bucket), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    # phase 2: within-bucket cumsum (<= _BUCKET rows per window partition)
    w_doc = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.join(F.broadcast(offsets), ["lang", "bucket"])
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (
                F.col("bucket_offset")
                + F.coalesce(F.sum("n_tokens").over(w_doc), F.lit(0))
            ).alias("cum_before"),
        )
    )


_CUM_SQL = f"""
    SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(sum(len(string_split(text, ' ')))
                  OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS cum_before
    FROM documents
"""


@register(
    "pack_training_sequences",
    oracle=f"""
    WITH c AS ({_CUM_SQL})
    SELECT doc_id, lang, n_tokens,
           cum_before // {SEQ_BUDGET} AS seq_id,
           cum_before % {SEQ_BUDGET} AS offset_in_seq
    FROM c
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang concat-and-chunk packing assignment: each doc's training
    sequence ({SEQ_BUDGET}-token budget) and offset within it. The
    oracle is the closed form (cum_before div/mod budget) over a plain
    windowed cumsum; the Spark side computes the same cumsum with the
    bounded two-phase plan (module docstring)."""
    c = _cum_before(spark, sf_dir)
    return c.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"cum_before div {SEQ_BUDGET}").alias("seq_id"),
        (F.col("cum_before") % SEQ_BUDGET).alias("offset_in_seq"),
    )


@register(
    "pack_sequence_stats",
    oracle=f"""
    WITH c AS ({_CUM_SQL})
    SELECT lang, cum_before // {SEQ_BUDGET} AS seq_id,
           count(*) AS docs_starting,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_starting,
           CAST(min(cum_before % {SEQ_BUDGET}) AS BIGINT) AS first_offset
    FROM c GROUP BY lang, seq_id
    """,
)
def pack_sequence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing telemetry per (lang, sequence): how many docs START in
    each sequence, their total token mass, and the first start offset —
    the fill/fragmentation report a packing job emits next to its
    output."""
    c = _cum_before(spark, sf_dir)
    return (
        c.select(
            "lang",
            F.expr(f"cum_before div {SEQ_BUDGET}").alias("seq_id"),
            "n_tokens",
            (F.col("cum_before") % SEQ_BUDGET).alias("off"),
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count("*").alias("docs_starting"),
            F.sum("n_tokens").alias("tokens_starting"),
            F.min("off").alias("first_offset"),
        )
    )


# context-window chunking: tokens per chunk / stride between chunk starts
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@register(
    "docs_chunk_overlap",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id, len(toks) AS n,
             unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE})) AS start_tok,
             toks
      FROM tk
    )
    SELECT doc_id,
           CAST(start_tok // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least({CHUNK_SIZE}, n - start_tok) AS BIGINT) AS n_tok,
           md5(array_to_string(
               list_slice(toks, start_tok + 1, start_tok + {CHUNK_SIZE}), ' '
           )) AS chunk_hash
    FROM ch
    """,
)
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: cut each document's token
    stream into CHUNK_SIZE-token chunks whose starts advance by
    CHUNK_STRIDE (overlap = size - stride) — the context-window
    chunking step of RAG indexing and long-document pretraining. One
    row per chunk with its position and an md5 over the chunk text
    (the downstream embed/dedup key).

    Scale shape: pure columnar explode — sequence() of starts, slice()
    per start, no shuffle at all (narrow map over the scan); chunk
    counts fan out rows by ~n_tokens/stride, never by n_tokens."""
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    n = F.size("toks")
    ch = tk.select(
        "doc_id",
        n.alias("n"),
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
        ).alias("start_tok"),
    )
    return ch.select(
        "doc_id",
        F.expr(f"start_tok div {CHUNK_STRIDE}").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start_tok"))
        .cast("bigint")
        .alias("n_tok"),
        F.md5(
            F.array_join(
                F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_SIZE), " "
            )
        ).alias("chunk_hash"),
    )


# power-of-two length buckets for padded batching; docs above the top
# cap share the overflow bucket
LENGTH_CAPS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _cap_case_sql() -> str:
    branches = " ".join(
        f"WHEN n <= {c} THEN {c}" for c in LENGTH_CAPS
    )
    return f"CASE {branches} ELSE {2 * LENGTH_CAPS[-1]} END"


@register(
    "pack_length_buckets",
    oracle=f"""
    WITH d AS (
      SELECT lang, len(string_split(text, ' ')) AS n FROM documents
    ),
    b AS (SELECT lang, n, {_cap_case_sql()} AS cap FROM d)
    SELECT lang, cap,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(sum(cap - n) AS BIGINT) AS padding_waste,
           CAST(sum(n) AS DOUBLE) / CAST(sum(cap) AS DOUBLE) AS fill_ratio
    FROM b GROUP BY lang, cap
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching telemetry: assign each document to the
    smallest power-of-two token cap that holds it and report per
    (lang, cap) the doc count, token mass, padding waste, and fill
    ratio — the decision table for padded dynamic batching (the
    alternative to concat-and-chunk packing when document boundaries
    must survive, e.g. SFT). The cap ladder is an explicit CASE chain,
    so both engines bucket identically with no log2 in sight; docs
    longer than the top cap land in one overflow bucket (cap doubled),
    which the report makes visible rather than silently truncating.

    Scale shape: one columnar projection + one (lang x ~9)-cell
    groupBy — partial aggregation does everything map-side."""
    n = F.size(F.split("text", " "))
    cap = F.when(n <= LENGTH_CAPS[0], LENGTH_CAPS[0])
    for c in LENGTH_CAPS[1:]:
        cap = cap.when(n <= c, c)
    cap = cap.otherwise(2 * LENGTH_CAPS[-1])
    b = t(spark, sf_dir, "documents").select(
        "lang", n.alias("n"), cap.alias("cap")
    )
    return b.groupBy("lang", "cap").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.sum(F.col("cap") - F.col("n")).cast("bigint").alias("padding_waste"),
        (
            F.sum("n").cast("double") / F.sum("cap").cast("double")
        ).alias("fill_ratio"),
    )


# content-defined chunking: gear-hash window width and boundary
# probability (first 2 md5 hex chars < '08' -> 8/256 = 1/32 -> mean
# chunk ~32 tokens)
CDC_GEAR = 4
CDC_BOUNDARY_HEX = "08"


_CDC_SQL = f"""
    WITH tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    p AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM tk
    ),
    b AS (
      SELECT doc_id, toks, pos,
             CASE WHEN pos > {CDC_GEAR} AND substr(md5(array_to_string(
                    list_slice(toks, pos - {CDC_GEAR}, pos - 1), ' ')), 1, 2)
                  < '{CDC_BOUNDARY_HEX}' THEN 1 ELSE 0 END AS brk
      FROM p
    ),
    c AS (
      SELECT doc_id, toks, pos,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_id
      FROM b
    ),
    g AS (
      SELECT doc_id, chunk_id, any_value(toks) AS toks,
             min(pos) AS start_tok, count(*) AS n_tok
      FROM c GROUP BY doc_id, chunk_id
    )
    SELECT doc_id, chunk_id, CAST(start_tok AS BIGINT) AS start_tok,
           CAST(n_tok AS BIGINT) AS n_tok,
           md5(array_to_string(
             list_slice(toks, start_tok, start_tok + n_tok - 1), ' ')) AS chunk_hash
    FROM g
    """


def cdc_chunk_frame(docs: DataFrame) -> DataFrame:
    """The CDC chunker over any (doc_id, text) frame — shared by the
    registry query and the edit-stability property test."""
    tk = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    p = tk.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(1), F.size("toks"))).alias("pos")
    )
    # clamp the slice start: at pos <= CDC_GEAR the raw `pos - gear`
    # start would be 0 (Spark throws — array indices start at 1) or
    # negative (slices from the END of the array). The pos > CDC_GEAR
    # guard below means those rows never *use* the gear value, but only
    # And short-circuiting kept them from *evaluating* it — the clamp
    # removes that landmine so the expression is safe standalone.
    gear = F.md5(
        F.array_join(
            F.expr(f"slice(toks, greatest(pos - {CDC_GEAR}, 1), {CDC_GEAR})"), " "
        )
    )
    brk = F.when(
        (F.col("pos") > CDC_GEAR)
        & (F.substring(gear, 1, 2) < CDC_BOUNDARY_HEX),
        1,
    ).otherwise(0)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = p.withColumn("chunk_id", F.sum(brk).over(w).cast("bigint"))
    g = c.groupBy("doc_id", "chunk_id").agg(
        F.first("toks").alias("toks"),
        F.min("pos").alias("start_tok"),
        F.count("*").alias("n_tok"),
    )
    return g.select(
        "doc_id",
        "chunk_id",
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.md5(
            F.array_join(F.expr("slice(toks, start_tok, n_tok)"), " ")
        ).alias("chunk_hash"),
    )


@register("docs_cdc_chunks", oracle=_CDC_SQL)
def docs_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (FastCDC-style gear boundaries over
    tokens): a chunk boundary opens wherever the rolling CDC_GEAR-token
    window's hash falls under the boundary threshold, so chunk edges
    are determined by CONTENT, not position — insert one sentence into
    a document and every chunk except the touched one keeps its hash,
    which is what makes CDC the dedup-stable chunker (fixed-stride
    chunking shifts every downstream chunk). One row per chunk with
    its position, length, and content hash — feed the hashes to the
    exact-dedup pass for block-level dedup across revisions
    (edit-stability is pinned by test_r5_ops.py).

    Scale shape: the position explode is one row per token (the
    shingle-explode row class); the boundary flag is a pure expression;
    the chunk-id prefix sum is a window per document — bounded by
    document length, with the packing module's two-phase bucketed
    prefix sum (prefix_sum_per_group) as the swap-in for mega-docs.
    The final chunk hash slices the token array once per chunk."""
    return cdc_chunk_frame(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# FIM (fill-in-the-middle) span corruption — the code-model training
# prep (Bavarian et al. 2022): each document is split into
# prefix / middle / suffix around a deterministically chosen span; the
# trainer reorders them (PSM/SPM mode) so the model learns infilling.
# No RNG: all span choices derive from a salted md5 of doc_id via the
# 15-hex-digit fold (the sample_priority device), so the corruption is
# reproducible under any partitioning and rerun — the property FIM data
# prep actually needs (the same doc must corrupt the same way across
# epochs/workers). Middle length is capped at a quarter of the doc; the
# start leaves prefix and suffix nonempty by construction.
_FIM_MIN_TOKENS = 8

_FIM_HEX_FOLD_SQL = (
    "list_reduce(list_transform(range(1, 16), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5('fim:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
    "(acc, x) -> acc * 16 + x)"
)


@register(
    "pack_fim_spans",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
      WHERE len(string_split(text, ' ')) >= {_FIM_MIN_TOKENS}
    ),
    h AS (SELECT doc_id, toks, n, {_FIM_HEX_FOLD_SQL} AS hv FROM tk),
    spans AS (
      SELECT doc_id, toks, n, hv,
             1 + hv % greatest(n // 4, 1) AS span_len
      FROM h
    ),
    placed AS (
      SELECT doc_id, toks, n, hv, span_len,
             2 + (hv // 64) % (n - span_len - 1) AS span_start
      FROM spans
    )
    SELECT doc_id, n AS n_tokens,
           CASE WHEN hv % 2 = 0 THEN 'psm' ELSE 'spm' END AS fim_mode,
           CAST(span_start AS BIGINT) AS span_start,
           CAST(span_len AS BIGINT) AS span_len,
           md5(array_to_string(toks[1 : span_start - 1], ' ')) AS prefix_hash,
           md5(array_to_string(toks[span_start : span_start + span_len - 1], ' '))
             AS middle_hash,
           md5(array_to_string(toks[span_start + span_len : n], ' ')) AS suffix_hash
    FROM placed
    """,
)
def pack_fim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic FIM span corruption (section comment above): per
    document of >= 8 tokens, the salted-hash-chosen middle span (length
    <= n/4, prefix and suffix provably nonempty), the PSM/SPM mode bit,
    and md5 digests of the three parts — the reorder-and-train artifact
    plus the integrity keys a downstream loader verifies reassembly
    against.

    Scale shape: one narrow map over the corpus — the hash fold, two
    integer mod/div placements, three array slices, three md5s; no
    join, no shuffle, no window. The one explode-free pass every
    per-document corruption op should be."""
    toks = F.split("text", " ")
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"), F.size(toks).cast("bigint").alias("n"))
        .filter(F.col("n") >= _FIM_MIN_TOKENS)
    )
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("fim:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    placed = (
        d.withColumn("hv", hv)
        .withColumn("span_len", 1 + F.col("hv") % F.expr("greatest(n div 4, 1)"))
        .withColumn(
            "span_start",
            2 + F.expr("hv div 64") % (F.col("n") - F.col("span_len") - 1),
        )
    )
    part = lambda start, length: F.md5(  # noqa: E731
        F.concat_ws(" ", F.slice("toks", start, length))
    )
    return placed.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.when(F.col("hv") % 2 == 0, "psm").otherwise("spm").alias("fim_mode"),
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_len").cast("bigint").alias("span_len"),
        part(F.lit(1), F.col("span_start") - 1).alias("prefix_hash"),
        part(F.col("span_start"), F.col("span_len")).alias("middle_hash"),
        part(
            F.col("span_start") + F.col("span_len"),
            F.col("n") - F.col("span_start") - F.col("span_len") + 1,
        ).alias("suffix_hash"),
    )
