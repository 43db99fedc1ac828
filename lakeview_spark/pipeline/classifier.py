"""Model-based quality classification: trained-weights inference + ROC.

Every modern curation pipeline (DCLM, FineWeb-Edu) gates documents on a
LEARNED quality score — a linear/fastText-style classifier trained on a
seed of known-good documents — not only on heuristics. The engine's
heuristic filters (text_quality_score, quality_filter_funnel) provide
the SEED; this module adds the missing stage class: train a hashed
linear model on a train split, then score every document with one
columnar dot fold (VERDICT r10 next-2).

Determinism strategy (the exact-integer device, end to end):

- **Features**: the hashing trick — each token maps to one of
  ``CLF_BUCKETS`` buckets via the md5-prefix integer (the CMS/KMV
  device, identical in both engines); per-document features are the
  DISTINCT buckets (binary features, the fastText bag shape).
- **Weak labels**: the DCLM seed rule as a pure integer compare —
  ``16 * n_stopwords >= n_tokens`` (measured ~48% positive on the
  synthetic corpus; stopwords are English, so the signal is learnable
  from hashed tokens). No float threshold edge.
- **Training**: one aggregation. Per feature, count positive / negative
  train documents containing it; the weight is the CENTROID-DIFFERENCE
  linear discriminant kept fully integer:
  ``w = pos_c * n_neg - neg_c * n_pos`` — exactly
  ``n_pos * n_neg * (P(f|pos) - P(f|neg))``, the
  difference-of-class-conditional-frequencies direction for binary
  features. Every term is an exact BIGINT product, full resolution
  (the bit-length log-odds was tried first and quantizes to ~zero:
  1 bit = a 2x odds ratio, which almost no hashed feature clears).
- **Inference**: score(doc) = sum of w over the document's distinct
  feature buckets — one feature-keyed equi join against the (<=
  CLF_BUCKETS)-row broadcast weights table, then a doc-keyed sum.
  Keep verdict = ``score >= 0`` (the class-balanced decision
  boundary), no division anywhere.
- **ROC/AUC** (eval_classifier_roc): scored held-out split, binned by
  the 256-bin integer histogram (no global sort over scores), with
  the tie-aware rank AUC kept as ONE integer numerator
  (``sum(pos_in * (2*neg_below + neg_in))``) until the single edge
  division by ``2*P*N``.

The train/eval holdout is the classifier's OWN 75/25 md5 split
(CLF_TRAIN_HEX) — dataset_split_assign's train/val/test rule holds out
~1% for test, too small to anchor a ROC at correctness scale, and a
model-selection split is a different object from the corpus split
anyway.

Scale shape: two corpus scans (feature build + scoring join are the
same exploded stream, counted once each), all joins feature-keyed with
the weights side broadcast, per-doc and per-lang aggregations partial,
histogram + windowed cumulative over <= 256 rows. No global sort, no
all-pairs, no driver loop. Reference parity: the reference has no ML
stage — this is part of the beyond-reference LLM-pipeline layer
(build brief), same first-class bar (registry + oracle + pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t
# LITERAL copy of curation._EN_STOP (pinned by tests/test_classifier.py
# test_en_stop_literal_matches_curation): this module is imported by
# plans/streaming_twins' oracle builder, which runs while
# pipeline/__init__ is still mid-import — importing curation here would
# re-enter the half-initialized dedup module (the r10 circular-import
# incident; the stream funnel twin uses the same literal device).
_EN_STOP = "'the','and','of','to','a','in','is','it','for','on'"

# feature-hash buckets: tokenizer-scale constant (weights stay a
# broadcast table at ANY corpus size — the vocabulary is capped by
# construction, the _UNI_VOCAB_CAP economics)
CLF_BUCKETS = 1024
# seed rule multiplier: 16 * n_stop >= n_tok (~48% positive measured)
CLF_LABEL_MULT = 16
# md5-prefix train/eval holdout: < c000 -> train (75%), else eval (25%)
CLF_TRAIN_HEX = "c000"


# ---------------------------------------------------------------------------
# Shared CTE block (the contamination detect/apply shared-halves device):
# label -> hash features -> train counts -> bit-length weights -> scores.
_CLF_BLOCK = f"""lab AS (
      SELECT doc_id, lang,
             string_split(lower(text), ' ') AS toks,
             CASE WHEN {CLF_LABEL_MULT} * len(list_filter(string_split(lower(text), ' '),
                        x -> x IN ({_EN_STOP})))
                       >= len(string_split(lower(text), ' '))
                  THEN 1 ELSE 0 END AS y,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{CLF_TRAIN_HEX}'
                  THEN 'train' ELSE 'eval' END AS holdout
      FROM documents
    ),
    feats AS (
      SELECT DISTINCT doc_id, lang, y, holdout,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT % {CLF_BUCKETS}) AS fid
      FROM (SELECT doc_id, lang, y, holdout, unnest(toks) AS tok FROM lab)
    ),
    trc AS (
      SELECT CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM lab WHERE holdout = 'train'
    ),
    cnt AS (
      SELECT fid,
             CAST(sum(y) AS BIGINT) AS pos_c,
             CAST(sum(1 - y) AS BIGINT) AS neg_c
      FROM feats WHERE holdout = 'train'
      GROUP BY fid
    ),
    wts AS (
      SELECT fid, pos_c * n_neg - neg_c * n_pos AS w
      FROM cnt, trc
    ),
    scored AS (
      SELECT f.doc_id,
             any_value(f.lang) AS lang,
             any_value(f.y) AS y,
             any_value(f.holdout) AS holdout,
             CAST(coalesce(sum(w.w), 0) AS BIGINT) AS score
      FROM feats f LEFT JOIN wts w ON w.fid = f.fid
      GROUP BY f.doc_id
    )"""


def _clf_lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, toks, y, holdout) — weak labels + the 75/25
    train/eval holdout."""
    return _lab_project(t(spark, sf_dir, "documents"))


def _lab_project(docs: DataFrame) -> DataFrame:
    ltoks = F.split(F.lower("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        ltoks.alias("toks"),
        F.when(
            CLF_LABEL_MULT
            * F.size(F.expr(f"filter(split(lower(text), ' '), x -> x IN ({_EN_STOP}))"))
            >= F.size(ltoks),
            1,
        )
        .otherwise(0)
        .alias("y"),
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < CLF_TRAIN_HEX,
            "train",
        )
        .otherwise("eval")
        .alias("holdout"),
    )


def _clf_feats(lab: DataFrame) -> DataFrame:
    """Per-document DISTINCT hashed feature buckets (binary features)."""
    return (
        lab.select("doc_id", "lang", "y", "holdout", F.explode("toks").alias("tok"))
        .select(
            "doc_id",
            "lang",
            "y",
            "holdout",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
                % CLF_BUCKETS
            ).alias("fid"),
        )
        .dropDuplicates(["doc_id", "fid"])
    )


def _clf_weights(lab: DataFrame, feats: DataFrame) -> DataFrame:
    """(fid, w) — the trained model: centroid-difference integer
    weights from one aggregation over the train split (<= CLF_BUCKETS
    rows, the broadcast/publishable artifact a deployment ships to its
    streaming gate)."""
    trc = lab.filter(F.col("holdout") == "train").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    cnt = (
        feats.filter(F.col("holdout") == "train")
        .groupBy("fid")
        .agg(
            F.sum("y").cast("bigint").alias("pos_c"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg_c"),
        )
    )
    return cnt.crossJoin(F.broadcast(trc)).select(
        "fid",
        (
            F.col("pos_c") * F.col("n_neg") - F.col("neg_c") * F.col("n_pos")
        ).alias("w"),
    )


def _classifier_weights_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _clf_lab(spark, sf_dir)
    return _clf_weights(lab, _clf_feats(lab))


def classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-published model table (fid, w) — what the streaming
    classifier gate (streaming/pipeline_stream.py
    stream_classifier_gate) joins against, so live and batch verdicts
    cannot disagree.

    MATERIALIZED (r15, guide §2.1 replay — the trained-artifact device
    the PQ codebooks/BPE merges use): the table is <= CLF_BUCKETS rows
    but its lazy lineage is the corpus-sized feats subtree (tokenize +
    explode + md5 + per-doc distinct). Every scoring consumer
    (_clf_scored) referenced it alongside its OWN feats subtree, so one
    classifier query paid the heavy feature pass twice plus the train
    label scan. One vocabulary-sized scratch write makes training run
    once per (session, dataset); every consumer's plan keeps exactly
    ONE corpus pass (its scoring feats scan). First execution still
    trains; a new session or rewritten dataset retrains."""
    from lakeview_spark.operators.materialize import materialized

    return materialized(spark, "clf_weights", sf_dir, _classifier_weights_build)


def _clf_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, y, holdout, score) — the shared Spark half of
    _CLF_BLOCK. Weights are a <= CLF_BUCKETS-row broadcast scratch scan
    (classifier_weights); the scoring join is feature-keyed; score is
    an exact BIGINT. The single-file local scan is spread on doc_id
    BEFORE the tokenize/explode/md5 kernel (guide §2.5, the
    dedup_simhash device): doc_id partitioning satisfies every
    downstream clustering ((doc_id, fid) dedup, doc_id scoring agg),
    so the plan keeps ONE data exchange, moved below the kernel. The
    spread sits on the RAW scan (text, not the token array) so the
    exchange ships each document's bytes once and the whole
    label/tokenize/hash kernel runs post-exchange on every core."""
    from lakeview_spark.operators.scale import spread_unsplittable

    docs = spread_unsplittable(t(spark, sf_dir, "documents"), "doc_id")
    feats = _clf_feats(_lab_project(docs))
    wts = classifier_weights(spark, sf_dir)
    return (
        feats.join(F.broadcast(wts), "fid", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.any_value("y").alias("y"),
            F.any_value("holdout").alias("holdout"),
            F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("score"),
        )
    )


@register(
    "classifier_quality_apply",
    oracle=f"""
    WITH {_CLF_BLOCK}
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(score) AS BIGINT) AS total_score,
           CAST(min(score) AS BIGINT) AS min_score,
           CAST(max(score) AS BIGINT) AS max_score,
           CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS kept_frac
    FROM scored GROUP BY lang
    """,
)
def classifier_quality_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained hashed linear quality model to EVERY document
    (train and eval alike — inference is the product surface) and roll
    the verdicts up per language: document counts, how many clear the
    ``score >= 0`` decision boundary, and the exact integer score
    range. (The synthetic corpus is word salad whose stopword tokens
    appear in every lang, so kept_frac is broad-based rather than
    en-dominated; the learning proof lives in eval_classifier_roc's
    held-out AUC, pytest-pinned well above chance.)

    Scale shape (module docstring): weights broadcast, scoring join
    feature-keyed, two partial aggregations; linear in the token
    stream."""
    scored = _clf_scored(spark, sf_dir)
    kept = F.when(F.col("score") >= 0, 1).otherwise(0)
    return scored.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.sum("score").cast("bigint").alias("total_score"),
        F.min("score").cast("bigint").alias("min_score"),
        F.max("score").cast("bigint").alias("max_score"),
        (F.sum(kept).cast("double") / F.count("*")).alias("kept_frac"),
    )


@register(
    "eval_classifier_roc",
    oracle=f"""
    WITH {_CLF_BLOCK},
    ev AS (SELECT y, score FROM scored WHERE holdout = 'eval'),
    rng AS (
      SELECT CAST(min(score) AS BIGINT) AS mn, CAST(max(score) AS BIGINT) AS mx,
             CAST(sum(y) AS BIGINT) AS p, CAST(sum(1 - y) AS BIGINT) AS n
      FROM ev
    ),
    binned AS (
      SELECT y, ((score - mn) * 255) // greatest(mx - mn, 1) AS bin
      FROM ev, rng
    ),
    bins AS (
      SELECT bin, CAST(sum(y) AS BIGINT) AS pos_in,
             CAST(sum(1 - y) AS BIGINT) AS neg_in
      FROM binned GROUP BY bin
    ),
    cum AS (
      SELECT bin, pos_in, neg_in,
             CAST(sum(pos_in) OVER (ORDER BY bin DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
             CAST(sum(neg_in) OVER (ORDER BY bin DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_neg
      FROM bins
    ),
    auc AS (
      SELECT CAST(sum(pos_in * (2 * (n - cum_neg) + neg_in)) AS BIGINT) AS auc2
      FROM cum, rng
    )
    SELECT bin, pos_in, neg_in,
           CASE WHEN p > 0 THEN CAST(cum_pos AS DOUBLE) / p END AS tpr,
           CASE WHEN n > 0 THEN CAST(cum_neg AS DOUBLE) / n END AS fpr,
           CASE WHEN p > 0 AND n > 0
                THEN CAST(auc2 AS DOUBLE) / (2.0 * p * n) END AS auc
    FROM cum, rng, auc
    """,
)
def eval_classifier_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve + AUC of the quality classifier on its HELD-OUT 25%
    split — the audit that the trained weights generalize past the
    train documents (the seed rule itself is cheap everywhere; the
    model earns its keep only if the hashed features reconstruct it on
    unseen docs). One row per non-empty score bin (256-bin integer
    histogram — no global sort), descending-threshold cumulative
    tpr/fpr, and the tie-aware rank AUC: the numerator
    ``sum(pos_in * (2*neg_below + neg_in))`` stays one exact BIGINT;
    tpr/fpr/auc are single guarded divisions at the output edge.

    Scale shape: the scored table is the shared inference plan; the
    histogram is one 256-key aggregation and the cumulative window
    runs over <= 256 rows (the mix_curriculum_schedule device)."""
    # collapse the eval split to per-SCORE counts in ONE pass — the
    # corpus-sized scored subtree would otherwise be replayed once per
    # downstream reference (range scalars, binning, AUC numerator: 4
    # lazy references — the k-core/PQ-index replay rule); after this
    # groupBy every later stage runs on <= distinct-score rows
    sc = (
        _clf_scored(spark, sf_dir)
        .filter(F.col("holdout") == "eval")
        .groupBy("score")
        .agg(
            F.sum("y").cast("bigint").alias("pos_c"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg_c"),
        )
    )
    # every downstream scalar (range, totals, the AUC numerator) is a
    # full-frame window over the tiny per-score/per-bin tables, NOT an
    # agg + crossJoin — each agg+crossJoin pair would reference the
    # subtree twice and Catalyst replays lazy subtrees per reference
    # (2 of them would put FOUR corpus passes in the plan; this shape
    # keeps exactly one). The unpartitioned windows run over <= 256
    # rows, the mix_curriculum histogram precedent.
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    binned = sc.select(
        "pos_c",
        "neg_c",
        "score",
        F.sum("pos_c").over(w_all).cast("bigint").alias("p"),
        F.sum("neg_c").over(w_all).cast("bigint").alias("n"),
        F.min("score").over(w_all).alias("mn"),
        F.max("score").over(w_all).alias("mx"),
    ).select(
        "pos_c",
        "neg_c",
        "p",
        "n",
        # integer div, exactly the oracle's `//` (operands non-negative)
        F.expr("(score - mn) * 255 div greatest(mx - mn, 1)").alias("bin"),
    )
    bins = binned.groupBy("bin").agg(
        F.sum("pos_c").cast("bigint").alias("pos_in"),
        F.sum("neg_c").cast("bigint").alias("neg_in"),
        F.any_value("p").alias("p"),
        F.any_value("n").alias("n"),
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    w_full = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = bins.select(
        "bin",
        "pos_in",
        "neg_in",
        "p",
        "n",
        F.sum("pos_in").over(w).cast("bigint").alias("cum_pos"),
        F.sum("neg_in").over(w).cast("bigint").alias("cum_neg"),
    )
    cum = cum.withColumn(
        "auc2",
        F.sum(
            F.col("pos_in") * (2 * (F.col("n") - F.col("cum_neg")) + F.col("neg_in"))
        )
        .over(w_full)
        .cast("bigint"),
    )
    return cum.select(
        "bin",
        "pos_in",
        "neg_in",
        F.when(F.col("p") > 0, F.col("cum_pos").cast("double") / F.col("p")).alias(
            "tpr"
        ),
        F.when(F.col("n") > 0, F.col("cum_neg").cast("double") / F.col("n")).alias(
            "fpr"
        ),
        F.when(
            (F.col("p") > 0) & (F.col("n") > 0),
            F.col("auc2").cast("double") / (2.0 * F.col("p") * F.col("n")),
        ).alias("auc"),
    )


# reliability-diagram bins (coarser than the 256-bin ROC histogram:
# calibration needs enough docs per bin for the rate to mean anything)
CLF_CALIB_BINS = 16


@register(
    "eval_classifier_calibration",
    oracle=f"""
    WITH {_CLF_BLOCK},
    ev AS (SELECT y, score FROM scored WHERE holdout = 'eval'),
    sc AS (
      SELECT score, CAST(sum(y) AS BIGINT) AS pos_c,
             CAST(sum(1 - y) AS BIGINT) AS neg_c
      FROM ev GROUP BY score
    ),
    rng AS (
      SELECT CAST(min(score) AS BIGINT) AS mn, CAST(max(score) AS BIGINT) AS mx,
             CAST(sum(pos_c) AS BIGINT) AS p,
             CAST(sum(pos_c + neg_c) AS BIGINT) AS nt
      FROM sc
    ),
    bins AS (
      SELECT ((score - mn) * {CLF_CALIB_BINS - 1}) // greatest(mx - mn, 1) AS bin,
             CAST(sum(pos_c) AS BIGINT) AS n_pos,
             CAST(sum(pos_c + neg_c) AS BIGINT) AS n_docs,
             CAST(sum(score * (pos_c + neg_c)) AS BIGINT) AS sum_score
      FROM sc, rng GROUP BY 1
    ),
    gaps AS (
      SELECT bin, n_pos, n_docs, sum_score, p, nt,
             CAST(abs(n_pos * nt - p * n_docs) AS BIGINT) AS gap_num,
             CAST(sum(abs(n_pos * nt - p * n_docs)) OVER () AS BIGINT)
               AS resolution_num
      FROM bins, rng
    )
    SELECT bin, n_docs, n_pos, sum_score,
           CASE WHEN n_docs > 0
                THEN CAST(n_pos AS DOUBLE) / n_docs END AS pos_rate,
           CASE WHEN n_docs > 0
                THEN CAST(sum_score AS DOUBLE) / n_docs END AS mean_score,
           gap_num, resolution_num,
           CASE WHEN nt > 0
                THEN CAST(resolution_num AS DOUBLE)
                     / (CAST(nt AS DOUBLE) * nt) END AS resolution_l1
    FROM gaps
    """,
)
def eval_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality classifier's HELD-OUT split
    — the companion audit to eval_classifier_roc: ROC/AUC measures
    RANKING quality, this measures whether the score LEVELS carry
    meaning (does a higher score bin actually contain a higher
    fraction of positives — the property a downstream threshold choice
    relies on). One row per non-empty score bin (16 bins over the
    observed integer score range): doc count, positive count,
    positive rate, mean raw score, and the bin's deviation from the
    base rate kept as an exact BIGINT cross-multiplication
    ``|n_pos_b * N - P * n_b|``. Exact-range guard (r13, VERDICT r12
    next-8, the corpus_snapshot_drift device): every cross term is
    <= P * N <= N^2 and the 16-bin gap sum is <= 2 * P * N, so
    N < 2^31 eval docs bounds all intermediates below 2^63 — beyond
    that (a >2.1B-doc eval split, reachable at 100 TB) the gap term
    raises deterministically with the rescale instruction instead of
    overflowing mid-window under ANSI. The full-frame sum of those gaps is
    the L1 resolution mass (the discrimination term of the Brier
    decomposition in L1 form — honest naming: without a probability
    calibration map there is no ECE against predicted probabilities;
    this is calibration-curve telemetry on the raw integer scores),
    divided ONCE by N² at the output edge, guarded.

    Scale shape: the eval split collapses to per-SCORE counts in ONE
    corpus pass (the eval_classifier_roc device); range scalars, the
    16-bin histogram, and the resolution sum are all full-frame
    windows over <= distinct-score / <= 16-row frames — no agg +
    crossJoin subtree replay, no global sort."""
    from pyspark.sql import Window

    sc = (
        _clf_scored(spark, sf_dir)
        .filter(F.col("holdout") == "eval")
        .groupBy("score")
        .agg(
            F.sum("y").cast("bigint").alias("pos_c"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg_c"),
        )
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned = sc.select(
        "score",
        "pos_c",
        "neg_c",
        F.sum("pos_c").over(w_all).cast("bigint").alias("p"),
        F.sum(F.col("pos_c") + F.col("neg_c"))
        .over(w_all)
        .cast("bigint")
        .alias("nt"),
        F.min("score").over(w_all).alias("mn"),
        F.max("score").over(w_all).alias("mx"),
    ).select(
        "pos_c",
        "neg_c",
        "score",
        "p",
        "nt",
        F.expr(
            f"(score - mn) * {CLF_CALIB_BINS - 1} div greatest(mx - mn, 1)"
        ).alias("bin"),
    )
    bins = binned.groupBy("bin").agg(
        F.sum("pos_c").cast("bigint").alias("n_pos"),
        F.sum(F.col("pos_c") + F.col("neg_c")).cast("bigint").alias("n_docs"),
        F.sum(F.col("score") * (F.col("pos_c") + F.col("neg_c")))
        .cast("bigint")
        .alias("sum_score"),
        F.any_value("p").alias("p"),
        F.any_value("nt").alias("nt"),
    )
    # exact-range guard (docstring): nt >= 2^31 can push the BIGINT
    # gap terms past 2^63 — degrade deterministically with the rescale
    # instruction, never by ANSI overflow mid-window
    gap = F.when(
        F.col("nt") < F.lit(1 << 31),
        F.abs(F.col("n_pos") * F.col("nt") - F.col("p") * F.col("n_docs")),
    ).otherwise(
        F.raise_error(
            F.lit(
                "eval_classifier_calibration: eval-split size exceeds the "
                "exact-BIGINT gap range (nt >= 2^31); rescale counts first "
                "(the 2^53 rule, SCALE.md)"
            )
        )
    )
    gaps = bins.select(
        "bin",
        "n_docs",
        "n_pos",
        "sum_score",
        "p",
        "nt",
        gap.cast("bigint").alias("gap_num"),
        F.sum(gap).over(w_all).cast("bigint").alias("resolution_num"),
    )
    return gaps.select(
        "bin",
        "n_docs",
        "n_pos",
        "sum_score",
        F.when(
            F.col("n_docs") > 0, F.col("n_pos").cast("double") / F.col("n_docs")
        ).alias("pos_rate"),
        F.when(
            F.col("n_docs") > 0,
            F.col("sum_score").cast("double") / F.col("n_docs"),
        ).alias("mean_score"),
        "gap_num",
        "resolution_num",
        F.when(
            F.col("nt") > 0,
            F.col("resolution_num").cast("double")
            / (F.col("nt").cast("double") * F.col("nt")),
        ).alias("resolution_l1"),
    )
