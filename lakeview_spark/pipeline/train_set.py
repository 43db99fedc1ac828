"""End-to-end training-set composition (r9 VERDICT next-5).

Every curation stage exists in isolation — quality funnel, keep-longest
near-dup apply, benchmark decontamination apply, char-budget selection,
concat-and-chunk packing — but a training-data pipeline ships their
COMPOSITION: the one artifact where stage order and stage interaction
matter. `pipeline_train_set` chains the registered apply halves into a
single funnel and reports per-language retention at every stage plus
the packed output's shape — the report a data-curation run actually
ends with (reference analog: the per-table metrics rollup the uploader
emits after its own multi-stage pipeline, lakeview
`TableDiscoveryAndUploadJob`; here the stages are the LLM-corpus ones).

Stage semantics (deliberate, documented):

1. QUALITY — `quality_filter_apply`'s exact predicate (length band,
   stopword evidence, distinct-token ratio, minhash-LSH near-dup anti
   join). Corpus-level artifact: the bucketed signature scratch.
2. DEDUP (keep-longest) — `dedup_apply_quality`'s policy. The cluster
   table and its per-cluster argmax are computed over the FULL corpus
   (the published dedup index), not the stage-1 survivors: a doc that
   lost its cluster vote stays dropped even if the winner was later
   quality-filtered — real pipelines publish the dedup verdict once.
3. DECONTAMINATION — `contamination_ngram_overlap`'s per-doc probe
   overlap, cut at the division-free 10% rule (10*matched < n_sh keeps)
   exactly like `contamination_apply`; probe (benchmark) docs
   themselves never enter the training set.
4. SELECTION — `sample_char_budget`'s total order (stopwords DESC,
   tokens DESC, doc_id) and 1/_BUDGET_DIV char budget, but the budget
   derives from the FUNNEL SURVIVORS' mass per language (selecting
   against the raw-corpus budget would overshoot what stage 3 left),
   and the budget-CROSSING document is kept (cum - own < budget): a
   language whose best doc alone overshoots a sparse survivor budget
   still ships that doc.
5. PACKING — `pack_training_sequences`' per-lang concat-and-chunk
   closed form (cum_before div SEQ_BUDGET) over the selected docs in
   doc_id order.

The Spark side composes the REGISTERED callables for stages 1-3 (their
outputs join by doc_id), so the funnel can never drift from the
standalone stages; stages 4-5 re-derive the selection/packing math
scoped to the survivors, reusing the same constants and total orders.
The oracle replays the whole funnel in one WITH chain built from the
same shared CTE blocks (_CLUSTERS_CTE, _SHINGLES_SQL, the minhash sig
construction) the standalone oracles use.

Scale shape: stages 1-3 are doc_id-keyed equi joins/anti joins over
corpus-level scratch artifacts (bucketed signatures, the tiny cluster
member table, the broadcast probe set) — the funnel itself adds no new
shuffle class. Stage 4's per-lang ranked prefix sum and stage 5's
per-lang cumsum are the documented exact forms (sample_char_budget /
packing.py docstrings): inherently ranking problems; at 100 TB the
selection boundary moves to a quantile-sketch cutoff and packing to
the bounded two-phase plan already used by _cum_before. The final
report is a lang-keyed rollup (a handful of groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakeview_spark.pipeline.clustering import _CLUSTERS_CTE, dedup_apply_quality
from lakeview_spark.pipeline.curation import (
    _EN_STOP,
    _PROBE_MOD,
    contamination_ngram_overlap,
    quality_filter_apply,
)
from lakeview_spark.pipeline.dedup import _SHINGLES_SQL, N_BANDS
from lakeview_spark.pipeline.mixing import _BUDGET_DIV, _BUDGET_STOP_SQL
from lakeview_spark.pipeline.packing import SEQ_BUDGET
from lakeview_spark.plans.registry import register, t

_TRAIN_SET_SQL = f"""
    {_CLUSTERS_CTE},
    -- stage 1: quality + near-dup anti (quality_filter_apply verbatim)
    s2 AS ({_SHINGLES_SQL}),
    e2 AS (SELECT doc_id, unnest(shingles) AS shingle FROM s2),
    sig2 AS (
      SELECT doc_id, b.band,
             min(md5(CAST(b.band AS VARCHAR) || ':' || shingle)) AS minhash
      FROM e2, (SELECT unnest(range(1, {N_BANDS + 1})) AS band) b
      GROUP BY doc_id, b.band
    ),
    dup2 AS (
      SELECT DISTINCT b.doc_id
      FROM sig2 a JOIN sig2 b
        ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    ),
    q1 AS (
      SELECT d.doc_id
      FROM documents d LEFT JOIN dup2 ON d.doc_id = dup2.doc_id
      WHERE len(string_split(d.text, ' ')) BETWEEN 40 AND 400
        AND len(list_filter(string_split(lower(d.text), ' '),
                x -> x IN ({_EN_STOP}))) >= 1
        AND len(list_distinct(string_split(lower(d.text), ' '))) * 3
              >= len(string_split(lower(d.text), ' '))
        AND dup2.doc_id IS NULL
    ),
    -- stage 2: keep-longest dedup (corpus-level cluster policy)
    sized AS (
      SELECT c.doc_id, c.cluster_id, len(string_split(d.text, ' ')) AS n_tok
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    ),
    losers AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_tok DESC, doc_id) AS rn
        FROM sized) WHERE rn > 1
    ),
    q2 AS (
      SELECT doc_id FROM q1
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    -- stage 3: decontamination (broadcast probe set, 10% integer cut)
    probe AS (SELECT DISTINCT unnest(shingles) AS shingle FROM s2
              WHERE doc_id % {_PROBE_MOD} = 0),
    m AS (
      SELECT c.doc_id, count(*) AS matched
      FROM (SELECT doc_id, unnest(shingles) AS shingle FROM s2
            WHERE doc_id % {_PROBE_MOD} <> 0) c
      JOIN probe USING (shingle)
      GROUP BY c.doc_id
    ),
    q3 AS (
      SELECT q2.doc_id
      FROM q2 JOIN s2 ON s2.doc_id = q2.doc_id
      LEFT JOIN m ON m.doc_id = q2.doc_id
      WHERE q2.doc_id % {_PROBE_MOD} <> 0
        AND len(s2.shingles) > 0
        AND 10 * COALESCE(m.matched, 0) < len(s2.shingles)
    ),
    -- stage 4: per-lang char-budget selection over the SURVIVORS' mass
    mq AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             len(list_filter(string_split(lower(d.text), ' '),
                 x -> x IN {_BUDGET_STOP_SQL})) AS n_stop,
             len(string_split(d.text, ' ')) AS n_tokens
      FROM documents d JOIN q3 ON q3.doc_id = d.doc_id
    ),
    bud AS (
      SELECT lang, CAST(sum(n_chars) AS BIGINT) // {_BUDGET_DIV} AS budget_chars
      FROM mq GROUP BY lang
    ),
    ranked AS (
      SELECT mq.doc_id, mq.lang, mq.n_chars, mq.n_tokens, bud.budget_chars,
             sum(mq.n_chars) OVER (PARTITION BY mq.lang
                                   ORDER BY mq.n_stop DESC, mq.n_tokens DESC,
                                            mq.doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_chars
      FROM mq JOIN bud USING (lang)
    ),
    q4 AS (
      SELECT doc_id, lang, n_chars, n_tokens
      FROM ranked WHERE cum_chars - n_chars < budget_chars
    ),
    -- stage 5: concat-and-chunk packing over the selected docs
    packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) // {SEQ_BUDGET} AS seq_id
      FROM q4
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS docs_raw,
           CAST(count(x1.doc_id) AS BIGINT) AS docs_quality,
           CAST(count(x2.doc_id) AS BIGINT) AS docs_dedup,
           CAST(count(x3.doc_id) AS BIGINT) AS docs_decontam,
           CAST(count(x4.doc_id) AS BIGINT) AS docs_selected,
           CAST(COALESCE(sum(x4.n_chars), 0) AS BIGINT) AS chars_selected,
           CAST(COALESCE(sum(x4.n_tokens), 0) AS BIGINT) AS tokens_packed,
           CAST(count(DISTINCT p.seq_id) AS BIGINT) AS n_sequences
    FROM documents d
    LEFT JOIN q1 x1 ON x1.doc_id = d.doc_id
    LEFT JOIN q2 x2 ON x2.doc_id = d.doc_id
    LEFT JOIN q3 x3 ON x3.doc_id = d.doc_id
    LEFT JOIN q4 x4 ON x4.doc_id = d.doc_id
    LEFT JOIN packed p ON p.doc_id = d.doc_id
    GROUP BY d.lang
"""


@register("pipeline_train_set", oracle=_TRAIN_SET_SQL)
def pipeline_train_set(
    spark: SparkSession, sf_dir: str, paragraph_filter: bool = False
) -> DataFrame:
    """The composed training-set funnel (module docstring): quality ->
    keep-longest dedup -> decontamination -> char-budget selection ->
    sequence packing, one per-language row with retention at every
    stage, the selected character/token mass, and the packed sequence
    count. Stages 1-3 ARE the registered apply halves composed by
    doc_id joins; stages 4-5 re-derive the selection/packing closed
    forms scoped to the funnel survivors.

    ``paragraph_filter`` (r13, VERDICT r12 next-9, default OFF so the
    registered query and its oracle are unchanged): when True, the
    CCNet paragraph stage (text_paragraph_apply) rewrites each stage-3
    survivor to its kept-paragraph reassembly BEFORE the char-budget
    selection — stages 4-5 then measure/select/pack the FILTERED text
    (n_chars/n_stop/n_tokens from filtered_text), the order a real
    CCNet pipeline applies: doc-level gates first, paragraph surgery
    on survivors, budget over what remains. Stages 1-3 are untouched.
    Pinned by tests/test_train_set.py (flag-on invariants)."""
    docs = t(spark, sf_dir, "documents")
    q1 = quality_filter_apply(spark, sf_dir).select("doc_id")
    q2 = q1.join(
        dedup_apply_quality(spark, sf_dir).select("doc_id"), "doc_id"
    )
    det = contamination_ngram_overlap(spark, sf_dir)
    q3 = (
        q2.join(det, "doc_id")
        .filter(10 * F.col("matched_shingles") < F.col("n_shingles"))
        .select("doc_id")
    )
    from lakeview_spark.pipeline.text import _STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    if paragraph_filter:
        from lakeview_spark.pipeline.text import text_paragraph_apply

        # the paragraph stage rewrites each survivor to its
        # kept-paragraph reassembly; downstream measures read the
        # filtered text (filtered_text is already lowercased tokens,
        # so the stopword filter needs no second lower())
        filt = text_paragraph_apply(spark, sf_dir).select(
            "doc_id", F.col("filtered_text").alias("text_f")
        )
        mq = docs.join(q3, "doc_id").join(filt, "doc_id").select(
            "doc_id",
            "lang",
            F.length("text_f").cast("bigint").alias("n_chars"),
            F.size(
                F.expr(f"filter(split(text_f, ' '), x -> x IN ({stop_list}))")
            ).alias("n_stop"),
            F.size(F.split("text_f", " ")).alias("n_tokens"),
        )
    else:
        mq = docs.join(q3, "doc_id").select(
            "doc_id",
            "lang",
            "n_chars",
            F.size(
                F.expr(f"filter(split(lower(text), ' '), x -> x IN ({stop_list}))")
            ).alias("n_stop"),
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
    bud = mq.groupBy("lang").agg(
        F.expr(f"CAST(sum(n_chars) AS BIGINT) div {_BUDGET_DIV}").alias(
            "budget_chars"
        )
    )
    w_rank = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_stop"), F.desc("n_tokens"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = mq.join(F.broadcast(bud), "lang").withColumn(
        "cum_chars", F.sum("n_chars").over(w_rank)
    )
    # the budget-CROSSING doc is kept (starts before the budget line):
    # unlike sample_char_budget's strict rule, a language whose best doc
    # alone overshoots 1/_BUDGET_DIV of a sparse survivor mass still
    # ships that doc — the composed funnel must never select nothing
    # for a language that survived stages 1-3
    q4 = ranked.filter(
        F.col("cum_chars") - F.col("n_chars") < F.col("budget_chars")
    ).select("doc_id", "lang", "n_chars", "n_tokens")
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = q4.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w_pack), F.lit(0)).cast("bigint"),
    ).select("doc_id", F.expr(f"cum_before div {SEQ_BUDGET}").alias("seq_id"))
    base = docs.select("doc_id", "lang")
    return (
        base.join(q1.withColumn("f1", F.lit(1)), "doc_id", "left")
        .join(q2.withColumn("f2", F.lit(1)), "doc_id", "left")
        .join(q3.withColumn("f3", F.lit(1)), "doc_id", "left")
        .join(
            q4.select("doc_id", F.col("n_chars").alias("sel_chars"),
                      F.col("n_tokens").alias("sel_tokens")),
            "doc_id",
            "left",
        )
        .join(packed.select("doc_id", "seq_id"), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs_raw"),
            F.count("f1").alias("docs_quality"),
            F.count("f2").alias("docs_dedup"),
            F.count("f3").alias("docs_decontam"),
            F.count("sel_chars").alias("docs_selected"),
            F.coalesce(F.sum("sel_chars"), F.lit(0)).cast("bigint").alias(
                "chars_selected"
            ),
            F.coalesce(F.sum("sel_tokens"), F.lit(0)).cast("bigint").alias(
                "tokens_packed"
            ),
            F.countDistinct("seq_id").alias("n_sequences"),
        )
    )
