"""Gopher/MassiveText repetition gating + BPE fertility audits.

Implemented in r14 as pipeline/pending_r15.py (the pending-module
device: the r14 driver window was exactly full, and the hygiene test
forces every newly registered query into the first-50 window, so these
shipped fully implemented and DuckDB-oracle-verified in pytest but
UNREGISTERED); registered at the r15 rotation, where the window slots
freed up. tests/test_repetition.py carries the oracle compares at
sf0.001 AND sf0.01 (the driver's own compare) plus the structural laws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# text_repetition_gopher — the MassiveText/Gopher repetition filters
# ---------------------------------------------------------------------------
#
# Rae et al. 2021 (Gopher, arXiv:2112.11446 §A1.1) discard documents
# dominated by repeated n-grams: the fraction of characters covered by
# the single most frequent {2,3,4}-gram, and the fraction of characters
# inside duplicated {5..10}-grams.  These are the standard repetition
# rules between the cheap length/ratio filters (text_quality_score) and
# the expensive LM gates (text_perplexity_bigram) in every published
# curation pipeline (MassiveText, RefinedWeb, Dolma, FineWeb).
#
# Deviations, chosen for exact cross-engine hashing and documented here
# honestly:
# - DUP fractions are CHAR-WEIGHTED WITHOUT overlap-union: a character
#   inside two overlapping duplicated n-grams counts once per covering
#   gram (numerator and denominator are both occurrence-weighted
#   Σ count·len over gram types), where Gopher unions the covered
#   spans.  The occurrence-weighted form is a pure two-level
#   aggregation — no per-doc interval union, which would need a
#   per-doc sort or an interpreted fold — and open reimplementations
#   (e.g. Dolma's) make the same trade.
# - Gram lengths: tops at n=2,3,4 (the full Gopher set) and dups at
#   n=5 and n=10 (the endpoints of Gopher's 5..10 ladder; the interior
#   thresholds interpolate and add four more corpus-sized gram streams
#   for little signal).
# - "Duplicate line fraction" needs line boundaries; this corpus has no
#   newlines, and paragraph-granular signals live in the
#   text_paragraph_* family — with real text the same plan applies over
#   split(text, '\n').
# - The keep flag uses Gopher's published thresholds as EXACT INTEGER
#   cross-multiplications (top2 ≤ 0.20, top3 ≤ 0.18, top4 ≤ 0.16,
#   dup5 ≤ 0.15, dup10 ≤ 0.10): integer threshold edges hash where
#   float comparisons can't (CLAUDE.md integer-threshold rule).  A doc
#   with no gram of some n (too short) passes that rule vacuously.
#
# Scale shape: per-doc only — no corpus-wide state at all.  The five
# gram streams build INCREMENTALLY (t2 from toks, t3 = t2+tok,
# t4 = t2+t2, t5 = t4+tok, t10 = t5+t5 — each level one zip_with with
# a 3-arg concat; array SHAPING lambdas, no map probes; measured at
# sf1 the ladder halves the kernel vs per-position slice+array_join,
# 4.4 -> 2.5 s explode-side), flow through ONE explode and ONE
# exchange keyed (doc_id, n, gram) carrying no doc metadata (lang,
# chars, tokens join back AFTER the per-doc collapse), whose map-side
# partial aggregation collapses repeated grams (the repetition being
# measured is exactly what collapses), then a second small exchange
# keyed doc_id with conditional aggregation + struct-min argmax for
# the top gram (partial-aggregable; never a window sort over scored
# rows).  Honest collect() timings: ~2.0 s steady at sf0.1, ~4.0 s at
# sf1 — 2.0x wall at 10x data with no index, the one-shot scan-bound
# class.  At 1000 executors this is embarrassingly parallel in
# doc_id; skew is bounded by the longest single document.

_GOPHER_TOP_NS = (2, 3, 4)
_GOPHER_DUP_NS = (5, 10)
# Gopher §A1.1 thresholds as (num, den) rational pairs: frac <= num/den
_GOPHER_LIMITS = {2: (1, 5), 3: (9, 50), 4: (4, 25), 5: (3, 20), 10: (1, 10)}


def _gram_level_spark(left: str, right: str, shift: int, n: int) -> str:
    """One incremental gram level: g[i] = left[i] || ' ' || right[i+shift],
    valid for size(toks) - n + 1 positions — doubling/extending
    composition instead of per-position slice+array_join (measured at
    sf1: the slice form's explode read 4.4 s steady, this form 2.5 s —
    each level is ONE zip_with with a 3-arg concat, no array slicing
    inside the lambda). Empty below n tokens (Spark sequence/slice
    guards: sequence(1,0) DESCENDS, so the CASE is the guard)."""
    return (
        f"CASE WHEN size(toks) < {n} THEN cast(array() as array<string>) ELSE "
        f"zip_with(slice({left}, 1, size(toks) - {n} + 1), "
        f"slice({right}, {shift + 1}, size(toks) - {n} + 1), "
        f"(a, b) -> concat(a, ' ', b)) END"
    )


def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition report: top-{2,3,4}-gram character
    fractions, duplicate-{5,10}-gram character fractions, and the
    integer-exact keep flag at the published thresholds."""
    # single-row-group testdata parquet cannot split, so the gram
    # ladder would run on ONE core locally — the shingle-builder
    # exception (SCALE.md §6): one cheap (doc_id, text) shuffle buys a
    # fully parallel build (measured sf1 steady 7.3 -> 4.8 s before
    # the ladder rewrite took it to ~4.0).
    tk = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.length("text").cast("long").alias("n_chars_doc"),
            F.split(F.lower("text"), " ").alias("toks"),
        )
    )
    # the corpus-sized exchange carries ONLY (doc_id, n, gram): the doc
    # metadata (lang, chars, token count) joins back AFTER the stream
    # collapses to one row per doc; the replayed metadata branch
    # reshuffles only the raw per-doc rows, 10x fewer bytes than grams
    meta = tk.select(
        "doc_id", "lang", "n_chars_doc", F.size("toks").cast("long").alias("n_tokens")
    )
    # incremental gram ladder: t2 from toks, t3 = t2 + 1 token,
    # t4 = t2 + t2, t5 = t4 + 1 token, t10 = t5 + t5 — each level one
    # zip_with concat over already-built grams
    built = (
        tk.withColumn("t2", F.expr(_gram_level_spark("toks", "toks", 1, 2)))
        .withColumn("t3", F.expr(_gram_level_spark("t2", "toks", 2, 3)))
        .withColumn("t4", F.expr(_gram_level_spark("t2", "t2", 2, 4)))
        .withColumn("t5", F.expr(_gram_level_spark("t4", "toks", 4, 5)))
        .withColumn("t10", F.expr(_gram_level_spark("t5", "t5", 5, 10)))
    )
    tagged = ", ".join(
        f"transform(t{n}, x -> struct({n}L AS n, x AS gram))"
        for n in _GOPHER_TOP_NS + _GOPHER_DUP_NS
    )
    g = built.select(
        "doc_id",
        F.explode(F.expr(f"concat({tagged})")).alias("g"),
    ).select(
        "doc_id",
        F.col("g.n").alias("n"),
        F.col("g.gram").alias("gram"),
    )
    counts = g.groupBy("doc_id", "n", "gram").agg(
        F.count("*").cast("long").alias("c")
    )
    gram_chars = F.col("c") * F.length("gram").cast("long")
    aggs = []
    for n in _GOPHER_TOP_NS:
        # argmax by (count desc, gram asc): min(struct(-c, gram)) is
        # partial-aggregable where a row_number window is not
        aggs.append(
            F.min(F.when(F.col("n") == n, F.struct((-F.col("c")).alias("negc"), F.col("gram").alias("gram")))).alias(f"_top{n}")
        )
    for n in _GOPHER_DUP_NS:
        aggs.append(
            F.coalesce(F.sum(F.when((F.col("n") == n) & (F.col("c") >= 2), gram_chars)), F.lit(0)).cast("long").alias(f"dup{n}_chars")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("n") == n, gram_chars)), F.lit(0)).cast("long").alias(f"total{n}_chars")
        )
    d = counts.groupBy("doc_id").agg(*aggs).join(meta, "doc_id")
    for n in _GOPHER_TOP_NS:
        d = d.withColumn(
            f"top{n}_chars",
            F.coalesce(
                (-F.col(f"_top{n}.negc")) * F.length(F.col(f"_top{n}.gram")).cast("long"),
                F.lit(0),
            ).cast("long"),
        ).drop(f"_top{n}")
    keep = F.lit(True)
    for n in _GOPHER_TOP_NS:
        num, den = _GOPHER_LIMITS[n]
        keep = keep & (F.col(f"top{n}_chars") * den <= F.col("n_chars_doc") * num)
    for n in _GOPHER_DUP_NS:
        num, den = _GOPHER_LIMITS[n]
        keep = keep & (F.col(f"dup{n}_chars") * den <= F.col(f"total{n}_chars") * num)
    out_cols = [
        F.col("doc_id"),
        F.col("lang"),
        F.col("n_chars_doc"),
        F.col("n_tokens"),
    ]
    for n in _GOPHER_TOP_NS:
        out_cols.append(F.col(f"top{n}_chars"))
        out_cols.append(
            F.when(
                F.col("n_chars_doc") > 0,
                F.col(f"top{n}_chars").cast("double") / F.col("n_chars_doc").cast("double"),
            ).alias(f"top{n}_frac")
        )
    for n in _GOPHER_DUP_NS:
        out_cols.append(F.col(f"dup{n}_chars"))
        out_cols.append(F.col(f"total{n}_chars"))
        out_cols.append(
            F.when(
                F.col(f"total{n}_chars") > 0,
                F.col(f"dup{n}_chars").cast("double") / F.col(f"total{n}_chars").cast("double"),
            ).alias(f"dup{n}_frac")
        )
    out_cols.append(keep.alias("gopher_keep"))
    return d.select(*out_cols)


def _gopher_oracle_sql() -> str:
    all_ns = _GOPHER_TOP_NS + _GOPHER_DUP_NS
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, lang, n_chars_doc, n_tokens, CAST({n} AS BIGINT) AS n, "
        f"unnest(list_transform(range(1, len(toks) - {n} + 2), "
        f"i -> array_to_string(toks[i:i + {n} - 1], ' '))) AS gram FROM tk"
        for n in all_ns
    )
    top_aggs = ",\n             ".join(
        f"min(CASE WHEN n = {n} THEN {{'negc': -c, 'gram': gram}} END) AS _top{n}"
        for n in _GOPHER_TOP_NS
    )
    dup_aggs = ",\n             ".join(
        f"CAST(coalesce(sum(CASE WHEN n = {n} AND c >= 2 THEN c * length(gram) END), 0) AS BIGINT) AS dup{n}_chars,\n             "
        f"CAST(coalesce(sum(CASE WHEN n = {n} THEN c * length(gram) END), 0) AS BIGINT) AS total{n}_chars"
        for n in _GOPHER_DUP_NS
    )
    top_cols = ",\n           ".join(
        f"CAST(coalesce(-(_top{n}.negc) * length(_top{n}.gram), 0) AS BIGINT) AS top{n}_chars"
        for n in _GOPHER_TOP_NS
    )
    keep_terms = []
    for n in _GOPHER_TOP_NS:
        num, den = _GOPHER_LIMITS[n]
        keep_terms.append(
            f"CAST(coalesce(-(_top{n}.negc) * length(_top{n}.gram), 0) AS BIGINT) * {den} <= n_chars_doc * {num}"
        )
    for n in _GOPHER_DUP_NS:
        num, den = _GOPHER_LIMITS[n]
        keep_terms.append(f"dup{n}_chars * {den} <= total{n}_chars * {num}")
    keep_sql = " AND ".join(keep_terms)
    top_out = ",\n           ".join(
        f"top{n}_chars,\n           "
        f"CASE WHEN n_chars_doc > 0 THEN CAST(top{n}_chars AS DOUBLE) / CAST(n_chars_doc AS DOUBLE) END AS top{n}_frac"
        for n in _GOPHER_TOP_NS
    )
    dup_out = ",\n           ".join(
        f"dup{n}_chars, total{n}_chars,\n           "
        f"CASE WHEN total{n}_chars > 0 THEN CAST(dup{n}_chars AS DOUBLE) / CAST(total{n}_chars AS DOUBLE) END AS dup{n}_frac"
        for n in _GOPHER_DUP_NS
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars_doc,
             string_split(lower(text), ' ') AS toks,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    g AS (
      {unions}
    ),
    counts AS (
      SELECT doc_id, lang, n_chars_doc, n_tokens, n, gram,
             CAST(count(*) AS BIGINT) AS c
      FROM g GROUP BY doc_id, lang, n_chars_doc, n_tokens, n, gram
    ),
    d AS (
      SELECT doc_id, lang, n_chars_doc, n_tokens,
             {top_aggs},
             {dup_aggs}
      FROM counts GROUP BY doc_id, lang, n_chars_doc, n_tokens
    ),
    e AS (
      SELECT doc_id, lang, n_chars_doc, n_tokens,
           {top_cols},
           dup5_chars, total5_chars, dup10_chars, total10_chars,
           ({keep_sql}) AS gopher_keep
      FROM d
    )
    SELECT doc_id, lang, n_chars_doc, n_tokens,
           {top_out},
           {dup_out},
           gopher_keep
    FROM e
    """


TEXT_REPETITION_GOPHER_SQL = _gopher_oracle_sql()


# ---------------------------------------------------------------------------
# eval_bpe_fertility — the tokenizer-quality table for the trained BPE
# ---------------------------------------------------------------------------
#
# Fertility (tokens emitted per word) is THE standard tokenizer-quality
# metric (Rust et al. 2021, arXiv:2012.15613): a vocabulary with high
# fertility on a language inflates sequence length and cost for that
# language.  corpus_bpe_apply reports the aggregate chars-per-token
# compression; this audit reports the per-word token DISTRIBUTION per
# language under the same trained vocabulary: mean fertility, the share
# of words kept whole (fertility 1 — "continued-word" rate's
# complement), and the p50/p90/max of the distribution.
#
# Scale shape: rides the BPE trainers' distinct-word economy — symbol
# counts happen on the VOCABULARY (distinct words), one word-keyed equi
# join carries n_tokens to the (lang, word) occurrence stream, and the
# distribution collapses to a (lang, fertility) table bounded by
# langs × max word length before any window runs.  The percentile
# readout is the histogram-threshold device (cumulative window over
# that tiny table), never a corpus sort.  Quantiles and the unsplit
# share are exact integer threshold scans; the one double division
# (mean) is of two exact BIGINTs.

def eval_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility distribution of the trained BPE
    vocabulary: n_words, total_tokens, mean/p50/p90/max fertility and
    the unsplit-word share."""
    from lakeview_spark.pipeline.corpus import _BPE_SYMS_SPARK, _bpe_run_trainer

    _merges, seqs = _bpe_run_trainer(spark, sf_dir)
    vt = seqs.select(
        "word", F.size(F.expr(_BPE_SYMS_SPARK)).cast("long").alias("fertility")
    )
    dw = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    hist = (
        dw.join(vt, "word")
        .groupBy("lang", "fertility")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("fertility")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "lang",
        "fertility",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n_words"),
        F.sum(F.col("fertility") * F.col("cnt")).over(wall).alias("total_tokens"),
        F.sum(F.when(F.col("fertility") == 1, F.col("cnt"))).over(wall).alias("_unsplit"),
        F.max("fertility").over(wall).alias("max_fertility"),
    )
    return (
        h.groupBy("lang", "n_words", "total_tokens", "max_fertility")
        .agg(
            F.coalesce(F.max("_unsplit"), F.lit(0)).cast("long").alias("n_unsplit"),
            F.min(F.when(2 * F.col("cum") >= F.col("n_words"), F.col("fertility")))
            .cast("long")
            .alias("p50_fertility"),
            F.min(F.when(10 * F.col("cum") >= 9 * F.col("n_words"), F.col("fertility")))
            .cast("long")
            .alias("p90_fertility"),
        )
        .select(
            "lang",
            "n_words",
            F.col("n_unsplit"),
            F.when(
                F.col("n_words") > 0,
                F.col("n_unsplit").cast("double") / F.col("n_words").cast("double"),
            ).alias("unsplit_share"),
            "total_tokens",
            F.when(
                F.col("n_words") > 0,
                F.col("total_tokens").cast("double") / F.col("n_words").cast("double"),
            ).alias("mean_fertility"),
            "p50_fertility",
            "p90_fertility",
            "max_fertility",
        )
    )


# ---------------------------------------------------------------------------
# eval_repetition_retention — the Gopher gate's ablation table
# ---------------------------------------------------------------------------
#
# The readout that makes a filter auditable (the eval_paragraph_retention
# convention, VERDICT r13 next-5): per (lang, gopher_keep) — document
# count, character mass, token mass, and each side's within-language
# share — so a mixture owner can see what the repetition gate costs
# each language BEFORE applying it.  Pure rollup over the per-doc
# report: one (lang, keep) aggregation bounded at langs × 2 groups at
# any corpus size, language totals from full-frame windows over that
# tiny grouped table (the classifier.py one-pass device), exact
# integer shares at the output edge.


def eval_repetition_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, keep) retention ablation of the Gopher repetition
    gate: doc/char/token masses and within-language shares."""
    rep = text_repetition_gopher(spark, sf_dir)
    g = rep.groupBy("lang", "gopher_keep").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars_doc").cast("long").alias("chars"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    )
    wl = Window.partitionBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        "lang",
        "gopher_keep",
        "n_docs",
        "chars",
        "tokens",
        F.sum("n_docs").over(wl).alias("lang_docs"),
        F.when(
            F.sum("n_docs").over(wl) > 0,
            F.col("n_docs").cast("double") / F.sum("n_docs").over(wl).cast("double"),
        ).alias("doc_share"),
        F.when(
            F.sum("chars").over(wl) > 0,
            F.col("chars").cast("double") / F.sum("chars").over(wl).cast("double"),
        ).alias("char_share"),
    )


def repetition_retention_oracle() -> str:
    return f"""
    WITH rep AS ({TEXT_REPETITION_GOPHER_SQL}),
    g AS (
      SELECT lang, gopher_keep,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars_doc) AS BIGINT) AS chars,
             CAST(sum(n_tokens) AS BIGINT) AS tokens
      FROM rep GROUP BY lang, gopher_keep
    )
    SELECT lang, gopher_keep, n_docs, chars, tokens,
           CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_docs,
           CASE WHEN sum(n_docs) OVER (PARTITION BY lang) > 0
                THEN CAST(n_docs AS DOUBLE)
                     / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
           END AS doc_share,
           CASE WHEN sum(chars) OVER (PARTITION BY lang) > 0
                THEN CAST(chars AS DOUBLE)
                     / CAST(sum(chars) OVER (PARTITION BY lang) AS DOUBLE)
           END AS char_share
    FROM g
    """


# ---------------------------------------------------------------------------
# eval_repetition_threshold_sweep — the rules' tuning curves
# ---------------------------------------------------------------------------
#
# The eval_ivfpq_nprobe_sweep convention applied to the repetition
# gate: Gopher's thresholds are published constants, but every corpus
# recalibrates them — this emits, from ONE pass over the per-doc
# report, each rule's fail rate across a whole percent grid, so a
# threshold decision reads a curve instead of one operating point.
# Each (rule, pct) verdict is an exact integer cross-multiplication
# (chars * 100 > denom * pct); the per-doc grid is a 30-element
# literal array exploded and collapsed by a (rule, pct)-keyed
# partial-aggregable count — 5 rules x 6 grid points = 30 output rows
# at any corpus size, and the corpus-sized stream it rides is the
# already-collapsed per-doc report, not the gram stream.

_SWEEP_PCTS = (5, 10, 15, 20, 25, 30)


def eval_repetition_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fail-rate-vs-threshold curves for the five repetition rules
    over a 5..30 percent grid — one pass over the per-doc report."""
    rep = text_repetition_gopher(spark, sf_dir)
    cells = []
    for n in _GOPHER_TOP_NS:
        for p in _SWEEP_PCTS:
            cells.append(
                f"struct('top{n}' AS rule, {p}L AS pct, "
                f"CASE WHEN top{n}_chars * 100 > n_chars_doc * {p} THEN 1L ELSE 0L END AS failed)"
            )
    for n in _GOPHER_DUP_NS:
        for p in _SWEEP_PCTS:
            cells.append(
                f"struct('dup{n}' AS rule, {p}L AS pct, "
                f"CASE WHEN dup{n}_chars * 100 > total{n}_chars * {p} THEN 1L ELSE 0L END AS failed)"
            )
    g = rep.select(F.explode(F.expr(f"array({', '.join(cells)})")).alias("c"))
    return (
        g.groupBy(F.col("c.rule").alias("rule"), F.col("c.pct").alias("pct"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("c.failed").cast("long").alias("n_failing"),
        )
        .select(
            "rule",
            "pct",
            "n_docs",
            "n_failing",
            F.when(
                F.col("n_docs") > 0,
                F.col("n_failing").cast("double") / F.col("n_docs").cast("double"),
            ).alias("fail_share"),
        )
    )


def repetition_threshold_sweep_oracle() -> str:
    cells = []
    for n in _GOPHER_TOP_NS:
        for p in _SWEEP_PCTS:
            cells.append(
                f"{{'rule': 'top{n}', 'pct': CAST({p} AS BIGINT), "
                f"'failed': CASE WHEN top{n}_chars * 100 > n_chars_doc * {p} "
                f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END}}"
            )
    for n in _GOPHER_DUP_NS:
        for p in _SWEEP_PCTS:
            cells.append(
                f"{{'rule': 'dup{n}', 'pct': CAST({p} AS BIGINT), "
                f"'failed': CASE WHEN dup{n}_chars * 100 > total{n}_chars * {p} "
                f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END}}"
            )
    return f"""
    WITH rep AS ({TEXT_REPETITION_GOPHER_SQL}),
    g AS (
      SELECT unnest([{', '.join(cells)}]) AS c FROM rep
    )
    SELECT c.rule AS rule, c.pct AS pct,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(c.failed) AS BIGINT) AS n_failing,
           CASE WHEN count(*) > 0
                THEN CAST(sum(c.failed) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           END AS fail_share
    FROM g GROUP BY c.rule, c.pct
    """


# ---------------------------------------------------------------------------
# stream_repetition_gate — the Gopher gate LIVE at ingestion
# ---------------------------------------------------------------------------
#
# The streaming twin of text_repetition_gopher (the stream_paragraph_gate
# convention): every arriving document is gated by the SAME integer
# thresholds, and a windowed rollup reports kept/dropped doc and char
# masses per (window, lang).  The design point is that the per-doc
# metrics become fully ROW-LOCAL in the stream — a 100 TB ingestion
# pipeline must not hold per-gram aggregation state for a per-document
# verdict — so the batch plan's two corpus-sized groupBys are replaced
# by per-row array folds over the SAME incremental gram ladder:
#
# - total{n}_chars: occurrence-weighted Σ count·len == Σ len over
#   occurrences — one sum fold over the unsorted gram array;
# - dup{n}_chars: sort the gram array once; an occurrence is duplicated
#   iff it has an equal sorted neighbor — one indexed transform with
#   O(1) element_at probes (array indexing, not the banned map probes);
# - top{n}: the longest run in the sorted array via an explicit
#   left fold (prev, run, bestc, bestlen) — scanning ascending keeps
#   the FIRST maximal run, which IS the (count desc, gram asc)
#   tie-break of the batch struct-min argmax.
#
# State: open windows only (update mode) — langs × windows rows of
# four BIGINT counters; no stateful op before the rollup, so the gate
# composes anywhere in a live funnel.  The oracle replays the BATCH
# repetition report grouped on the twin window grid, so the live gate
# and the batch query can never disagree on a verdict.


def _run_fold_spark(arr: str) -> str:
    """Longest-run (count, len) over a SORTED string array as one
    explicit left fold; first maximal run wins == (c desc, gram asc)."""
    newrun = f"CASE WHEN x = acc.prev THEN acc.run + 1L ELSE 1L END"
    return (
        f"aggregate({arr}, "
        "struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS bestc, 0L AS bestlen), "
        f"(acc, x) -> struct(x AS prev, {newrun} AS run, "
        f"CASE WHEN {newrun} > acc.bestc THEN {newrun} ELSE acc.bestc END AS bestc, "
        f"CASE WHEN {newrun} > acc.bestc THEN length(x) * 1L ELSE acc.bestlen END AS bestlen), "
        "acc -> acc.bestc * acc.bestlen)"
    )


def _dup_chars_spark(sorted_arr: str) -> str:
    """Occurrence-weighted duplicated-gram chars over a SORTED array:
    an occurrence counts iff an equal sorted neighbor exists."""
    return (
        f"aggregate(transform({sorted_arr}, (x, i) -> "
        f"CASE WHEN (i > 0 AND element_at({sorted_arr}, i) = x) "
        f"OR (i < size({sorted_arr}) - 1 AND element_at({sorted_arr}, i + 2) = x) "
        "THEN length(x) * 1L ELSE 0L END), 0L, (a, b) -> a + b)"
    )


def _sum_chars_spark(arr: str) -> str:
    return f"aggregate({arr}, 0L, (a, x) -> a + length(x))"


def stream_repetition_gate(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Live Gopher repetition gating: row-local integer metrics over
    the incremental gram ladder, the published thresholds as exact
    cross-multiplications, and a per-(window, lang) kept/dropped
    rollup."""
    d = stream.withColumn("toks", F.split(F.lower("text"), " "))
    for n, (left, right, shift) in {
        2: ("toks", "toks", 1),
        3: ("t2", "toks", 2),
        4: ("t2", "t2", 2),
        5: ("t4", "toks", 4),
        10: ("t5", "t5", 5),
    }.items():
        d = d.withColumn(f"t{n}", F.expr(_gram_level_spark(left, right, shift, n)))
    metrics = [F.length("text").cast("long").alias("n_chars_doc")]
    for n in _GOPHER_TOP_NS:
        metrics.append(
            F.expr(_run_fold_spark(f"array_sort(t{n})")).alias(f"top{n}_chars")
        )
    for n in _GOPHER_DUP_NS:
        d = d.withColumn(f"s{n}", F.expr(f"array_sort(t{n})"))
        metrics.append(F.expr(_dup_chars_spark(f"s{n}")).alias(f"dup{n}_chars"))
        metrics.append(F.expr(_sum_chars_spark(f"s{n}")).alias(f"total{n}_chars"))
    scored = d.select("lang", "ingest_ts", *metrics)
    keep = F.lit(True)
    for n in _GOPHER_TOP_NS:
        num, den = _GOPHER_LIMITS[n]
        keep = keep & (F.col(f"top{n}_chars") * den <= F.col("n_chars_doc") * num)
    for n in _GOPHER_DUP_NS:
        num, den = _GOPHER_LIMITS[n]
        keep = keep & (F.col(f"dup{n}_chars") * den <= F.col(f"total{n}_chars") * num)
    gated = scored.withColumn("kept", keep.cast("int"))
    return (
        gated.withWatermark("ingest_ts", watermark_delay)
        .groupBy(F.window("ingest_ts", window_duration).alias("win"), "lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("kept").alias("kept_docs"),
            F.sum(F.when(F.col("kept") == 1, F.col("n_chars_doc"))).alias("kept_chars"),
            F.sum(F.when(F.col("kept") == 0, F.col("n_chars_doc"))).alias(
                "dropped_chars"
            ),
        )
        .select(
            "lang",
            F.col("win.start").alias("window_start"),
            "docs",
            "kept_docs",
            "kept_chars",
            "dropped_chars",
        )
    )


def stream_repetition_gate_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate run to completion over the documents table (AvailableNow
    into a memory sink, update mode — the stream_classifier_gate twin
    shape), with the batch repetition report as its oracle."""
    from lakeview_spark.plans import streaming_twins as st

    gate = stream_repetition_gate(st._doc_stream(spark, sf_dir))
    out = st._run_available_now(gate, "update")
    return out.select(
        "lang",
        F.unix_micros("window_start").alias("window_start_us"),
        F.col("docs").cast("bigint").alias("docs"),
        F.col("kept_docs").cast("bigint").alias("kept_docs"),
        F.coalesce(F.col("kept_chars"), F.lit(0)).cast("bigint").alias("kept_chars"),
        F.coalesce(F.col("dropped_chars"), F.lit(0))
        .cast("bigint")
        .alias("dropped_chars"),
    )


def stream_repetition_gate_oracle() -> str:
    """Batch repetition report grouped on the twin's window grid —
    verdict parity with the live gate by construction."""
    return f"""
    WITH rep AS ({TEXT_REPETITION_GOPHER_SQL}),
    base AS (
      -- LEFT JOIN from documents: the batch report has no row for a
      -- doc with fewer than 2 tokens (no grams), but the live gate
      -- sees every arriving doc and passes gram-less ones vacuously
      SELECT d.lang,
             coalesce(r.gopher_keep, TRUE) AS gopher_keep,
             CAST(length(d.text) AS BIGINT) AS n_chars_doc,
             1772323200000000 + ((CAST(d.doc_id AS BIGINT) % 120)
               * 60000000 // 600000000) * 600000000 AS window_start_us
      FROM documents d LEFT JOIN rep r ON r.doc_id = d.doc_id
    )
    SELECT lang, window_start_us,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(CASE WHEN gopher_keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(coalesce(sum(CASE WHEN gopher_keep THEN n_chars_doc END), 0)
                AS BIGINT) AS kept_chars,
           CAST(coalesce(sum(CASE WHEN NOT gopher_keep THEN n_chars_doc END), 0)
                AS BIGINT) AS dropped_chars
    FROM base
    GROUP BY lang, window_start_us
    """


def _bpe_fertility_oracle_sql() -> str:
    from lakeview_spark.pipeline.corpus import _BPE_ROUNDS, _bpe_cte_block

    return f"""
    WITH {_bpe_cte_block()},
    vt AS (
      SELECT word,
             CAST(len(string_split(substr(seq, 2, length(seq) - 2),
                                   chr(2) || chr(1))) AS BIGINT) AS fertility
      FROM s{_BPE_ROUNDS}
    ),
    dw AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    hist AS (
      SELECT dw.lang, vt.fertility, CAST(count(*) AS BIGINT) AS cnt
      FROM dw JOIN vt ON vt.word = dw.word
      GROUP BY dw.lang, vt.fertility
    ),
    h AS (
      SELECT lang, fertility, cnt,
             CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY fertility
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n_words,
             CAST(sum(fertility * cnt) OVER (PARTITION BY lang) AS BIGINT) AS total_tokens,
             CAST(coalesce(sum(CASE WHEN fertility = 1 THEN cnt END)
                           OVER (PARTITION BY lang), 0) AS BIGINT) AS n_unsplit,
             CAST(max(fertility) OVER (PARTITION BY lang) AS BIGINT) AS max_fertility
      FROM hist
    ),
    q AS (
      SELECT lang, n_words, n_unsplit, total_tokens, max_fertility,
             CAST(min(CASE WHEN 2 * cum >= n_words THEN fertility END) AS BIGINT) AS p50_fertility,
             CAST(min(CASE WHEN 10 * cum >= 9 * n_words THEN fertility END) AS BIGINT) AS p90_fertility
      FROM h
      GROUP BY lang, n_words, n_unsplit, total_tokens, max_fertility
    )
    SELECT lang, n_words, n_unsplit,
           CASE WHEN n_words > 0
                THEN CAST(n_unsplit AS DOUBLE) / CAST(n_words AS DOUBLE)
           END AS unsplit_share,
           total_tokens,
           CASE WHEN n_words > 0
                THEN CAST(total_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)
           END AS mean_fertility,
           p50_fertility, p90_fertility, max_fertility
    FROM q
    """


def bpe_fertility_oracle() -> str:
    """Built lazily (the trainer CTE block is large) — the r15
    registration will inline this as the oracle argument."""
    return _bpe_fertility_oracle_sql()


# ---------------------------------------------------------------------------
# Registration (r15 rotation — COVERAGE.md "Round-15 plan"): the five
# ops take driver-window slots; oracles are the same SQL the pytest
# compares ran against at both driver SFs while the ops were pending.
register("text_repetition_gopher", oracle=TEXT_REPETITION_GOPHER_SQL)(
    text_repetition_gopher
)
register("eval_repetition_retention", oracle=repetition_retention_oracle())(
    eval_repetition_retention
)
register(
    "eval_repetition_threshold_sweep", oracle=repetition_threshold_sweep_oracle()
)(eval_repetition_threshold_sweep)
register("eval_bpe_fertility", oracle=bpe_fertility_oracle())(eval_bpe_fertility)
register("stream_repetition_gate", oracle=stream_repetition_gate_oracle())(
    stream_repetition_gate_twin
)
