"""Dataset mixing for training: combine corpus sources at target
proportions with a deterministic sample AND a deterministic global
order — the "data mixture" step between curation and sequence packing.

Everything is hash math (no RNG): per-source acceptance uses the same
md5-threshold device as sample_stratified/sample_temperature, and the
training order is a hash shuffle (order by md5(salt || doc_id)) —
reproducible under any partitioning, re-shuffleable per epoch by
changing the salt. At scale: one columnar filter per source, one union,
one range sort on the 16-byte order key (Spark's sort is a range
shuffle — the only exchange here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t


def _accept(rate_col: F.Column) -> F.Column:
    """Deterministic Bernoulli(rate): md5 32-bit prefix under the scaled
    threshold (same device as sample_temperature's selection)."""
    key = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return (rate_col >= 1.0) | (key < F.floor(rate_col * 4294967296.0).cast("bigint"))


def mix_datasets(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    total_budget: int,
    epoch_salt: str = "epoch0",
) -> DataFrame:
    """Blend `sources` (name -> DataFrame with doc_id, text columns) so
    source s contributes ~ total_budget * weights[s] documents (weights
    need not sum to 1 — they are normalized). Oversubscribed sources
    downsample deterministically; undersized sources contribute
    everything they have (the standard behavior when a mixture asks for
    more of a small set than exists — upsampling/repetition is the
    packer's job, not the mixer's).

    Output carries (source, doc_id, text, order_key); training order =
    ORDER BY order_key — a per-epoch hash shuffle, reproducible and
    independent of physical partitioning."""
    if set(sources) != set(weights):
        raise ValueError("sources and weights must cover the same names")
    z = sum(weights.values())
    if z <= 0:
        raise ValueError("weights must be positive")
    parts = []
    for name, df in sources.items():
        target = total_budget * (weights[name] / z)
        n = df.count()
        rate = min(1.0, target / n) if n else 0.0
        part = (
            df.select("doc_id", "text")
            .filter(_accept(F.lit(rate)))
            .withColumn("source", F.lit(name))
        )
        parts.append(part)
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.unionByName(p)
    return mixed.withColumn(
        "order_key",
        F.md5(F.concat(F.lit(epoch_salt), F.lit(":"), F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
    ).select("source", "doc_id", "text", "order_key")


def upsample_to(df: DataFrame, target: int, epoch_salt: str = "epoch0") -> DataFrame:
    """Deterministic repetition for an undersized source: every doc
    appears floor(target/n) times, plus one extra epoch for a
    hash-chosen subset so the total lands exactly on `target` (the
    repetition side of a data mixture, complementing mix_datasets'
    downsampling). Output adds `rep` (0-based repetition index) and the
    same per-epoch `order_key` hash as mix_datasets.

    Scale shape: one count, one doc_id-partitioned window (partition
    size = duplicate multiplicity, usually 1 — NOT a global window; the
    r04 verdict flagged row_number over an unpartitioned Window as a
    single-task bottleneck), then a histogram-bounded exact selection
    of the `remainder` extra-rep rows: remainder can approach n (it is
    target mod n), so a plain orderBy().limit(remainder) would funnel
    O(n) rows through one TakeOrdered merge. Instead the salt-hash rank
    space is split into 2^16 buckets, a 65536-row histogram (driver
    metadata, same class as the LSH plane collect) finds the cut
    bucket, every bucket below it is selected COLUMNAR (a filter, no
    ordering), and only the cut bucket — ~n/65536 uniformly hashed
    rows — pays a TakeOrdered for the exact boundary. One broadcast
    join of that tiny boundary set, one explode(sequence) fan-out."""
    from pyspark.sql import Window

    n = df.count()
    if n == 0 or target <= 0:
        return df.select("doc_id", "text").withColumn(
            "rep", F.lit(0)
        ).withColumn("order_key", F.lit("")).limit(0)
    base = target // n
    remainder = target - base * n
    # doc_id alone is not a total order when the source carries duplicate
    # keys — a limit that cuts inside a duplicated group would mark every
    # copy through the join and overshoot the target. Give each row a
    # unique identity (doc_id, occ) first: occ is a row_number inside the
    # doc_id partition (bounded by the key's multiplicity), so the
    # selection key below is a genuine total order and the join marks
    # exactly `remainder` rows.
    occ = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("text"))
    )
    src = df.select("doc_id", "text").withColumn("__occ", occ)
    rank = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(epoch_salt),
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("__occ").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    # the `remainder` rows with the smallest salt-hash get one extra
    # rep. Exact selection without ranking (or TakeOrdered-ing) the
    # whole source: histogram the 32-bit rank into 2^16 buckets, select
    # whole buckets below the cut columnar, and order only the cut
    # bucket for the boundary rows.
    if remainder > 0:
        src = src.withColumn("__rank", rank)
        bucket = F.expr(f"__rank div {1 << 16}")
        hist = sorted(
            (r["b"], r["cnt"])
            for r in src.groupBy(bucket.alias("b"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        below, cut = 0, None
        for b, c in hist:
            if below + c >= remainder:
                cut = b
                break
            below += c
        # remainder < n guarantees a cut bucket; 1 <= need <= its size
        need = remainder - below
        boundary = (
            src.filter(bucket == cut)
            .orderBy("__rank", "doc_id", "__occ")
            .limit(need)
            .select("doc_id", "__occ")
            .withColumn("__bx", F.lit(1))
        )
        marked = (
            src.join(F.broadcast(boundary), ["doc_id", "__occ"], "left")
            .withColumn(
                "__extra",
                F.when((bucket < cut) | (F.col("__bx") == 1), 1),
            )
            .drop("__bx", "__rank")
        )
    else:
        marked = src.withColumn("__extra", F.lit(None).cast("int"))
    reps = F.when(F.col("__extra") == 1, base + 1).otherwise(base)
    # explode can't nest inside arithmetic, and sequence(0, -1) DESCENDS
    # (CLAUDE.md), so guard the reps==0 rows with an empty array —
    # explode drops them, which is exactly the base=0 subset semantics
    rep_idx = F.when(
        reps > 0, F.sequence(F.lit(0), reps - 1)
    ).otherwise(F.array().cast("array<int>"))
    out = marked.withColumn("rep", F.explode(rep_idx)).drop("__extra", "__occ")
    return out.withColumn(
        "order_key",
        F.md5(
            F.concat(
                F.lit(epoch_salt),
                F.lit(":"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("rep").cast("string"),
            )
        ),
    )


# train/val/test hash-split thresholds on the first 4 hex digits of
# md5(doc_id): < 0xfae1 (64225/65536 ~ 98.0%) -> train, < 0xfd70
# (64880/65536 ~ 99.0%) -> val, else test. String compares on lowercase
# hex are engine-identical, same device as sample_stratified.
SPLIT_TRAIN_HEX = "fae1"
SPLIT_VAL_HEX = "fd70"


def split_expr(doc_id_col="doc_id") -> F.Column:
    """The canonical train/val/test assignment as a Spark Column — the
    ONE definition of the split rule (evaluation.eval_split_leakage and
    dataset_split_assign both use it; change it here and every consumer
    plus both oracle builders move together). Accepts a column name or a
    Column."""
    c = F.col(doc_id_col) if isinstance(doc_id_col, str) else doc_id_col
    p4 = F.substring(F.md5(c.cast("string")), 1, 4)
    return (
        F.when(p4 < SPLIT_TRAIN_HEX, "train")
        .when(p4 < SPLIT_VAL_HEX, "val")
        .otherwise("test")
    )


def split_case_sql(doc_id_sql: str = "doc_id") -> str:
    """The same split rule as an ANSI-SQL CASE fragment for the DuckDB
    oracles — kept next to split_expr so the two can never drift."""
    return (
        f"CASE WHEN substr(md5(CAST({doc_id_sql} AS VARCHAR)), 1, 4) < '{SPLIT_TRAIN_HEX}' THEN 'train' "
        f"WHEN substr(md5(CAST({doc_id_sql} AS VARCHAR)), 1, 4) < '{SPLIT_VAL_HEX}' THEN 'val' "
        f"ELSE 'test' END"
    )


@register(
    "dataset_split_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT {split_case_sql("doc_id")} AS split,
             lang,
             len(string_split(lower(text), ' ')) AS ntok
      FROM documents
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY split, lang
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (~98/1/1) via an
    md5 hex-prefix threshold on doc_id — the reproducible-split step
    every training pipeline needs before packing/mixing: no RNG state,
    stable under repartitioning and reruns, and a document can never
    migrate between splits when the corpus grows (its hash doesn't
    change). Returns the per-(split, lang) doc/token counts — the
    telemetry that catches a skewed split.

    Scale shape: one columnar projection + one small groupBy (splits x
    langs rows); the split column itself is free at scan time."""
    docs = t(spark, sf_dir, "documents").select(
        split_expr("doc_id").alias("split"),
        "lang",
        F.size(F.split(F.lower("text"), " ")).alias("ntok"),
    )
    return docs.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("n_tokens"),
    )


# per-lang selection budget: keep the best quarter of each language's
# character mass (integer floor-div, corpus-derived like every other
# sizing constant)
_BUDGET_DIV = 4

# ranking stop list — MUST stay the text_quality_score 10-word list so
# the two quality surfaces agree (text.py _STOPWORDS["en"])
_BUDGET_STOP_SQL = "('the','and','of','to','a','in','is','it','for','on')"


@register(
    "sample_char_budget",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang, n_chars,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN {_BUDGET_STOP_SQL})) AS n_stop,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT lang, CAST(sum(n_chars) AS BIGINT) // {_BUDGET_DIV} AS budget_chars
      FROM m GROUP BY lang
    ),
    ranked AS (
      SELECT m.lang, m.n_chars, b.budget_chars,
             sum(m.n_chars) OVER (PARTITION BY m.lang
                                  ORDER BY m.n_stop DESC, m.n_tokens DESC,
                                           m.doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_chars
      FROM m JOIN b USING (lang)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(any_value(budget_chars) AS BIGINT) AS budget_chars,
           CAST(sum(CASE WHEN cum_chars <= budget_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(sum(CASE WHEN cum_chars <= budget_chars THEN n_chars
                         ELSE 0 END) AS BIGINT) AS chars_selected
    FROM ranked GROUP BY lang
    """,
)
def sample_char_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted data selection: per language, keep the highest-quality
    documents until a character budget (1/{_BUDGET_DIV} of that
    language's total mass, corpus-derived) is exhausted — the
    "N-token training budget" selection every curation pipeline ends
    with. Quality rank is the all-integer total order (stopword count
    DESC, token count DESC, doc_id) over text_quality_score's exact
    counting signals, and the running character sum is exact BIGINT, so
    the kept set — not just its size — is engine-identical.

    Scale shape: budgets are one partial-aggregable groupBy (lang-count
    rows, broadcast back); the prefix sum is a per-lang ordered window —
    budgeted selection is inherently a ranking problem, and THIS form is
    the exact one; at 100 TB the standard approximation replaces the
    global per-lang sort with a quantile-sketch cutoff (the
    events_quantile_sketch device) and a threshold filter, trading
    exactness at the boundary for two narrow passes."""
    from lakeview_spark.pipeline.text import _STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    m = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(
            F.expr(f"filter(split(lower(text), ' '), x -> x IN ({stop_list}))")
        ).alias("n_stop"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    b = m.groupBy("lang").agg(
        (F.sum("n_chars").cast("bigint") / _BUDGET_DIV)
        .cast("bigint")
        .alias("budget_chars")
    )
    from pyspark.sql import Window as _W

    w = (
        _W.partitionBy("lang")
        .orderBy(F.desc("n_stop"), F.desc("n_tokens"), "doc_id")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    ranked = m.join(F.broadcast(b), "lang").withColumn(
        "cum_chars", F.sum("n_chars").over(w)
    )
    kept = F.col("cum_chars") <= F.col("budget_chars")
    return ranked.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.any_value("budget_chars").alias("budget_chars"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_selected"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("chars_selected"),
    )


# priority sampling (Duffield/Lund/Thorup): with u ~ U(0,1) from the
# doc's md5 and weight w, the key u/w ranks docs so that keeping the k
# SMALLEST keys includes each doc with probability ~ proportional to w
# — the one-pass distributed weighted sample WITHOUT replacement. The
# uniform is the 15-hex md5 prefix over 2^60 (the KMV device), the
# weight is n_chars, and the single division is the same
# correctly-rounded double op in both engines, so the SAMPLE ITSELF is
# engine-identical, not just its size.
_PRIORITY_K = 200

_PRIORITY_HEX_FOLD_SQL = (
    "list_reduce(list_transform(range(1, 16), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5('prio:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
    "(acc, x) -> acc * 16 + x)"
)


@register(
    "sample_priority_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             CAST({_PRIORITY_HEX_FOLD_SQL} AS DOUBLE)
               / ({(1 << 60)}.0 * n_chars) AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, priority
    FROM keyed ORDER BY priority, doc_id LIMIT {_PRIORITY_K}
    """,
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted priority sample of {_PRIORITY_K} documents
    (section comment above: u/w keys, smallest-k = without-replacement
    inclusion ~ proportional to n_chars) — the deterministic one-pass
    weighted sampler a mixture builder uses to audit or seed a blend.

    Scale shape: one narrow map (md5 fold + one division) and a
    TakeOrderedAndProject — no shuffle of the corpus, no RNG state; the
    same doc is picked no matter the partitioning or cluster size, and
    reruns are bit-identical (partition-independence-checked like every
    registered query)."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("prio:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    keyed = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("weight"),
        (hv.cast("double") / (F.lit(float(1 << 60)) * F.col("n_chars"))).alias(
            "priority"
        ),
    )
    return keyed.orderBy("priority", "doc_id").limit(_PRIORITY_K)


@register(
    "mix_curriculum_schedule",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    vocab AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (
      SELECT CAST(length(printf('%b', count(*))) AS BIGINT) AS bln FROM tok
    ),
    perdoc AS (
      SELECT t.doc_id, t.source, count(*) AS n_tokens,
             CAST(sum(length(printf('%b', v.c))) AS BIGINT) AS sum_blc
      FROM tok t JOIN vocab v USING (token)
      GROUP BY 1, 2
    ),
    diff AS (
      SELECT doc_id, source, n_tokens * bln - sum_blc AS dkey
      FROM perdoc, tot
    ),
    rng AS (SELECT min(dkey) AS mn, max(dkey) AS mx, count(*) AS nd FROM diff),
    binned AS (
      SELECT d.doc_id, d.source, d.dkey,
             ((d.dkey - mn) * 255) // greatest(mx - mn, 1) AS bin
      FROM diff d, rng
    ),
    bins AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY bin),
    cum AS (
      SELECT bin,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM bins
    ),
    thr AS (
      SELECT min(CASE WHEN 4 * cum >= 1 * nd THEN bin END) AS t1,
             min(CASE WHEN 4 * cum >= 2 * nd THEN bin END) AS t2,
             min(CASE WHEN 4 * cum >= 3 * nd THEN bin END) AS t3
      FROM cum, rng
    ),
    staged AS (
      SELECT b.doc_id, b.source, b.dkey,
             CAST(CASE WHEN b.bin > t1 THEN 1 ELSE 0 END
                + CASE WHEN b.bin > t2 THEN 1 ELSE 0 END
                + CASE WHEN b.bin > t3 THEN 1 ELSE 0 END AS BIGINT) AS stage
      FROM binned b, thr
    ),
    sched AS (
      SELECT doc_id, source, dkey, stage,
             CAST(row_number() OVER (PARTITION BY stage, source
                                     ORDER BY dkey, doc_id) AS BIGINT) AS ris
      FROM staged
    ),
    srcids AS (
      SELECT source,
             CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT) AS sid
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT doc_id, sched.source AS source, stage, dkey AS difficulty_key,
           ris AS round_in_stage,
           CASE WHEN sid < 1024
                THEN (stage << 60) + (ris << 10) + sid END AS position_key
    FROM sched JOIN srcids USING (source)
    """,
)
def mix_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: every document gets a strictly
    ordering BIGINT `position_key` that sequences the corpus
    easiest -> hardest in four difficulty stages, round-robin
    interleaved across sources within each stage (so no stage opens
    with a single-source run — the mixing requirement curriculum
    papers and practice share).

    Difficulty is the document's TOTAL bit-length surprisal
    (text_surprisal_bits's device, un-normalized) — rarity-weighted
    length, i.e. the short-and-stock -> long-and-rare axis
    length-curriculum training uses; pure BIGINT. Stages are
    QUARTILES WITHOUT A GLOBAL SORT: difficulty maps to a 256-bin
    integer histogram (1-row min/max broadcast), the 256-row cumulative
    bin table yields the three thresholds by the exact integer compare
    4*cum >= q*n (no division), and each doc's stage is two broadcast
    compares. Interleaving is row_number per (stage, source) — window
    partitions are per-source-per-stage, never global — and the final
    key is closed-form arithmetic (stage<<60 | round<<10 | source id),
    so NO operator ever total-orders the corpus; a trainer materializes
    the schedule with a range sort on position_key (or writes it
    bucketed by stage) as the one optional edge exchange.

    Approximation note: stage boundaries land on histogram-bin edges,
    not exact quartile ranks — the standard trade (documented, exact in
    both engines) that keeps stage assignment one pass."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    )
    vocab = tok.groupBy("token").agg(F.count("*").alias("c"))
    # corpus total from the vocab table, not a third corpus pass
    tot = vocab.agg(F.length(F.bin(F.sum("c"))).cast("bigint").alias("bln"))
    perdoc = (
        tok.join(vocab, "token")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.length(F.bin("c"))).cast("bigint").alias("sum_blc"),
        )
    )
    diff = perdoc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        (F.col("n_tokens") * F.col("bln") - F.col("sum_blc")).alias("dkey"),
    )
    rng = diff.agg(
        F.min("dkey").alias("mn"),
        F.max("dkey").alias("mx"),
        F.count("*").alias("nd"),
    )
    binned = diff.crossJoin(F.broadcast(rng)).withColumn(
        "bin", F.expr("((dkey - mn) * 255) div greatest(mx - mn, 1)")
    )
    bins = binned.groupBy("bin").agg(F.count("*").alias("cnt"))
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("cnt").over(w_cum))
    thr = cum.crossJoin(F.broadcast(rng)).agg(
        F.min(F.when(4 * F.col("cum") >= 1 * F.col("nd"), F.col("bin"))).alias("t1"),
        F.min(F.when(4 * F.col("cum") >= 2 * F.col("nd"), F.col("bin"))).alias("t2"),
        F.min(F.when(4 * F.col("cum") >= 3 * F.col("nd"), F.col("bin"))).alias("t3"),
    )
    staged = binned.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "source",
        "dkey",
        (
            (F.col("bin") > F.col("t1")).cast("bigint")
            + (F.col("bin") > F.col("t2")).cast("bigint")
            + (F.col("bin") > F.col("t3")).cast("bigint")
        ).alias("stage"),
    )
    w_rr = Window.partitionBy("stage", "source").orderBy("dkey", "doc_id")
    sched = staged.withColumn(
        "ris", F.row_number().over(w_rr).cast("bigint")
    )
    # Source ids are a dense_rank over the distinct source NAMES (a
    # bounded, total, name-shape-independent assignment — r9 ADVICE:
    # the old first-digit-run parse NULLed on digitless names and
    # silently collided when two names shared a fragment). The rank
    # window runs on the tiny distinct-source table (catalog-scale,
    # single partition by construction), never the corpus, and joins
    # back as a broadcast. sid >= 1024 overflows the 10-bit field, so
    # the key goes NULL (visible breakage), never a collision.
    src_ids = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1)
            .cast("bigint")
            .alias("sid"),
        )
    )
    return sched.join(F.broadcast(src_ids), "source").select(
        "doc_id",
        "source",
        "stage",
        F.col("dkey").alias("difficulty_key"),
        F.col("ris").alias("round_in_stage"),
        F.when(
            F.col("sid") < 1024,
            F.shiftleft(F.col("stage"), 60)
            + F.shiftleft(F.col("ris"), 10)
            + F.col("sid"),
        ).alias("position_key"),
    )


_DSIR_KEEP = 200


@register(
    "sample_dsir_select",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, greatest(len(toks), 1)),
                    i -> toks[i] || ' ' || toks[i+1])) AS feat
      FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
            FROM documents)
    ),
    src AS (SELECT feat, count(*) AS cs FROM tok GROUP BY feat),
    tgt AS (SELECT feat, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY feat),
    consts AS (
      SELECT (SELECT count(*) FROM tok) AS ns,
             (SELECT count(*) FROM tok WHERE lang = 'en') AS nt,
             (SELECT count(*) FROM src) AS v
    ),
    scored AS (
      SELECT t.doc_id, t.lang,
             CAST(length(printf('%b', coalesce(g.ct, 0) + 1)) AS BIGINT)
               - CAST(length(printf('%b', s.cs + 1)) AS BIGINT)
               + CAST(length(printf('%b', ns + v)) AS BIGINT)
               - CAST(length(printf('%b', nt + v)) AS BIGINT) AS bits
      FROM tok t
      JOIN src s USING (feat)
      LEFT JOIN tgt g USING (feat)
      CROSS JOIN consts
    ),
    perdoc AS (
      SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_feats,
             CAST(sum(bits) AS BIGINT) AS importance_bits
      FROM scored GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_feats, importance_bits,
           CAST(importance_bits AS DOUBLE) / CAST(n_feats AS DOUBLE)
             AS bits_per_feat
    FROM perdoc
    ORDER BY importance_bits DESC, doc_id
    LIMIT {_DSIR_KEEP}
    """,
)
def sample_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio between a TARGET-domain n-gram model
    (here lang='en', the in-corpus stand-in for "looks like the eval
    domain") and the full-corpus source model, then keep the
    highest-importance documents. The standard pretraining-data
    selection step between raw crawl and mixing. Features are word
    BIGRAMS, as in the paper's hashed-n-gram models — unigrams barely
    separate domains that share a vocabulary (measured in-repo: 0.43
    selected-target fraction on unigrams vs 0.68 on bigrams against a
    0.44 base rate).

    The ratio lives entirely in the INTEGER bit-length space
    (text_surprisal_bits's device): per bigram,
    importance_bits = bl(c_T + 1) - bl(c_S + 1) + bl(N_S + V)
    - bl(N_T + V), where bl = bitlength (exact floor-log2 + 1 in both
    engines) and +1/+V are add-one smoothing — unseen-in-target
    features get bl(1) = 1, no log(0), no float. Document scores are
    exact BIGINT sums; the one double division (bits/feature) happens
    at the output edge on identical integers.

    Scale shape: two feature counts (partial-aggregable), one
    feature-keyed equi join back to the occurrence stream, a 1-row
    constants broadcast, one doc-keyed aggregation, and the selection
    is TakeOrderedAndProject (per-partition top-200, no global
    sort) with the total-order (importance desc, doc_id) tiebreak."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    )
    bigrams = F.expr(
        "CASE WHEN size(toks) < 2 THEN array() ELSE "
        "zip_with(slice(toks, 1, size(toks) - 1), "
        "slice(toks, 2, size(toks) - 1), "
        "(x, y) -> concat(x, ' ', y)) END"
    )
    tok = docs.select(
        "doc_id", "lang", F.explode(bigrams).alias("feat")
    )
    # ONE conditional aggregation builds BOTH models (src count + target
    # count per feature), and the scalar constants aggregate the small
    # VOCAB table, not the corpus — the token stream is scanned twice
    # total (model build + scoring join), not four times (r9 probe:
    # 10.3 s -> see BASELINE band; the win compounds at scale)
    models = tok.groupBy("feat").agg(
        F.count("*").alias("cs"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    consts = models.agg(
        F.sum("cs").alias("ns"),
        F.sum("ct").alias("nt"),
        F.count("*").alias("v"),
    )
    bl = lambda c: F.length(F.bin(c)).cast("bigint")  # noqa: E731
    scored = (
        tok.join(models, "feat")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "lang",
            (
                bl(F.col("ct") + 1)
                - bl(F.col("cs") + 1)
                + bl(F.col("ns") + F.col("v"))
                - bl(F.col("nt") + F.col("v"))
            ).alias("bits"),
        )
    )
    perdoc = scored.groupBy("doc_id", "lang").agg(
        F.count("*").cast("bigint").alias("n_feats"),
        F.sum("bits").cast("bigint").alias("importance_bits"),
    )
    return (
        perdoc.select(
            "doc_id",
            "lang",
            "n_feats",
            "importance_bits",
            (
                F.col("importance_bits").cast("double")
                / F.col("n_feats").cast("double")
            ).alias("bits_per_feat"),
        )
        .orderBy(F.desc("importance_bits"), "doc_id")
        .limit(_DSIR_KEEP)
    )


def _source_hist_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeview_spark.operators.scale import spread_unsplittable

    docs = spread_unsplittable(t(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    return tok.groupBy("source", "token").agg(
        F.count("*").cast("bigint").alias("c")
    )


def source_hist_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token histogram (source, token, c) — the
    vocabulary-sized scratch corpus_source_similarity's pair scoring
    and per-source totals both read (r15, guide §2.1 — VERDICT r14
    next-8); the builder spreads the single-file scan before the
    explode kernel (guide §2.5, the sanctioned builder exception)."""
    from lakeview_spark.operators.materialize import materialized

    return materialized(spark, "source_hist", sf_dir, _source_hist_build)


@register(
    "corpus_source_similarity",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    st AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, token
    ),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY source),
    pairs AS (
      SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb
      FROM ns a JOIN ns b ON a.source < b.source
    ),
    inter AS (
      SELECT x.source AS sa, y.source AS sb,
             CAST(count(*) AS BIGINT) AS shared_tokens,
             CAST(sum(LEAST(x.c * ny.n, y.c * nx.n)) AS BIGINT) AS inter_scaled
      FROM st x
      JOIN st y ON x.token = y.token AND x.source < y.source
      JOIN ns nx ON nx.source = x.source
      JOIN ns ny ON ny.source = y.source
      GROUP BY 1, 2
    )
    SELECT p.sa AS source_a, p.sb AS source_b,
           p.na AS n_tokens_a, p.nb AS n_tokens_b,
           CAST(coalesce(i.shared_tokens, 0) AS BIGINT) AS shared_tokens,
           CAST(coalesce(i.inter_scaled, 0) AS BIGINT) AS inter_scaled,
           CASE WHEN p.na > 0 AND p.nb > 0
                THEN CAST(coalesce(i.inter_scaled, 0) AS DOUBLE)
                     / CAST(p.na * p.nb AS DOUBLE) END AS hist_intersection
    FROM pairs p LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    """,
)
def corpus_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-DISTRIBUTION similarity via histogram
    intersection — the frequency-weighted complement of
    `corpus_source_overlap_theta` (which measures distinct-shingle SET
    overlap): two sources can share most of their vocabulary yet have
    very different token DISTRIBUTIONS, and the mixing decision
    (mix_datasets weights, DSIR targets) cares about the latter.
    Histogram intersection of the normalized distributions,
    sum_t min(p_a(t), p_b(t)), is computed division-free by
    cross-multiplication: min(c_a * N_b, c_b * N_a) summed as exact
    BIGINTs, with ONE guarded double division by N_a * N_b at the
    output edge. Exact-range guard (r13, VERDICT r12 next-8, the
    corpus_snapshot_drift device): sum_t min(c_a*N_b, c_b*N_a)
    <= N_a*N_b, so N_a, N_b < 2^31 bounds every intermediate below
    2^62 — beyond that (a ~2.1B-token source, reachable at 100 TB)
    each cross term raises deterministically with the rescale
    instruction instead of overflowing mid-sum under ANSI.
    Every unordered pair appears even with zero shared tokens.

    Scale shape (r14, VERDICT r13 next-7 — was 12 exchanges + 1 SMJ +
    FIVE corpus scans for a 0.56 s op, the lazy (source, token) table
    replayed per reference, the k-core rule): the token-keyed
    SELF-JOIN is replaced by the orders_market_basket basket shape —
    collect the per-token (source, c) list (bounded by the source
    count, ~20, never corpus-scale), emit its sorted in-array
    2-combinations partition-locally, and aggregate the sources²-key
    pair stream with map-side combine. The per-source totals that the
    pair grid, the output columns, and the overflow guard all
    reference come from ONE cheap explode-free corpus scan (a
    per-document size() sum — token-count-identical to summing the
    (source, token) counts) collected to a ~20-row driver table, so
    no corpus subtree is ever referenced twice. 3 exchanges, 0
    sort-merge joins, 2 corpus scans (one with the explode, one
    without), output hash-identical; the sources²-row output frame
    comes from a broadcast pair grid so zero-overlap pairs still
    appear."""
    # r15 (guide §2.1 — VERDICT r14 next-8): the per-source token
    # histogram is now a materialized vocabulary-sized scratch (built
    # once per session/dataset; the builder spreads the single-file
    # scan on doc_id before the explode kernel — the sanctioned
    # repartition-before-heavy-kernel exception — then pays the
    # (source, token) aggregation exchange on the partially-aggregated
    # stream). The per-source totals driver pull moves onto the
    # scratch too — sum(c) per source is the ORACLE's own ns
    # definition, token-count-identical to the per-doc size() sum it
    # replaces — so the registered query's plan touches the corpus
    # ZERO times after the first build (was two corpus passes).
    st = source_hist_materialized(spark, sf_dir)
    # bounded driver pull (~one row per source — the centroid-cache
    # convention), off the scratch instead of a second corpus scan
    ns_rows = (
        st.groupBy("source")
        .agg(F.sum("c").cast("bigint").alias("n"))
        .collect()
    )
    a = spark.createDataFrame(
        [(r.source, r.n) for r in ns_rows], "sa string, na bigint"
    )
    b = spark.createDataFrame(
        [(r.source, r.n) for r in ns_rows], "sb string, nb bigint"
    )
    pair_grid = a.join(F.broadcast(b), F.col("sa") < F.col("sb"))
    # per-token source list (sorted -> deterministic sa < sb pairs);
    # in-array 2-combinations, the basket device: cost per token is
    # sources_t², identical to the self-join's candidate count, but
    # partition-local with no second exchange and no SMJ
    pertok = st.groupBy("token").agg(
        F.sort_array(F.collect_list(F.struct("source", "c"))).alias("ss")
    )
    combos = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, greatest(0, size(ss) - i - 1)), y -> "
        "named_struct('sa', x.source, 'ca', x.c, 'sb', y.source, 'cb', y.c))))"
    )
    pair_stream = (
        pertok.select(F.explode(combos).alias("p"))
        .select("p.sa", "p.ca", "p.sb", "p.cb")
        .join(F.broadcast(a), "sa")
        .join(F.broadcast(b), "sb")
    )
    # exact-range guard (docstring): na/nb >= 2^31 can push the
    # BIGINT intersection mass past 2^63 — degrade deterministically
    # with the rescale instruction, never by ANSI overflow mid-sum
    in_range = (F.col("na") < F.lit(1 << 31)) & (F.col("nb") < F.lit(1 << 31))
    cross = F.when(
        in_range, F.least(F.col("ca") * F.col("nb"), F.col("cb") * F.col("na"))
    ).otherwise(
        F.raise_error(
            F.lit(
                "corpus_source_similarity: source token counts exceed the "
                "exact-BIGINT intersection range (na/nb >= 2^31); rescale "
                "counts first (the 2^53 rule, SCALE.md)"
            )
        )
    )
    inter = (
        pair_stream
        .groupBy("sa", "sb")
        .agg(
            F.count("*").cast("bigint").alias("shared_tokens"),
            F.sum(cross).cast("bigint").alias("inter_scaled"),
        )
    )
    return (
        pair_grid.join(F.broadcast(inter), ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("na").alias("n_tokens_a"),
            F.col("nb").alias("n_tokens_b"),
            F.coalesce("shared_tokens", F.lit(0)).cast("bigint").alias(
                "shared_tokens"
            ),
            F.coalesce("inter_scaled", F.lit(0)).cast("bigint").alias(
                "inter_scaled"
            ),
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.coalesce("inter_scaled", F.lit(0)).cast("double")
                / (F.col("na") * F.col("nb")).cast("double"),
            ).alias("hist_intersection"),
        )
    )


# data-constrained repetition cap (Muennighoff et al.: value of repeated
# tokens decays; ~4 epochs is where repetition stops paying)
MIX_EPOCH_CAP = 4


@register(
    "mix_budget_plan",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(count(*) AS BIGINT) AS avail
      FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      GROUP BY source
    ),
    w AS (
      SELECT source, avail,
             CAST(floor(sqrt(CAST(avail AS DOUBLE))) AS BIGINT) AS r0
      FROM tok
    ),
    iw AS (
      SELECT source, avail,
             r0 - CASE WHEN r0 * r0 > avail THEN 1 ELSE 0 END
                + CASE WHEN (r0 + 1) * (r0 + 1) <= avail THEN 1 ELSE 0 END
               AS weight
      FROM w
    ),
    tot AS (
      SELECT source, avail, weight,
             CAST(sum(weight) OVER () AS BIGINT) AS total_weight,
             CAST(sum(avail) OVER () // 2 AS BIGINT) AS budget
      FROM iw
    ),
    plan AS (
      SELECT source, avail, weight, budget,
             budget * weight // greatest(total_weight, 1) AS target
      FROM tot
    )
    SELECT source, avail, weight, budget, target,
           CAST(LEAST((target + greatest(avail, 1) - 1) // greatest(avail, 1),
                      {MIX_EPOCH_CAP}) AS BIGINT) AS epochs,
           CAST(LEAST(target, {MIX_EPOCH_CAP} * avail) AS BIGINT) AS planned,
           CAST(target - LEAST(target, {MIX_EPOCH_CAP} * avail) AS BIGINT)
             AS shortfall,
           CASE WHEN avail > 0
                THEN CAST(LEAST(target, {MIX_EPOCH_CAP} * avail) AS DOUBLE)
                     / avail END AS upsample_factor
    FROM plan
    """,
)
def mix_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixture PLANNING (Muennighoff et al. 2023): given
    a token budget (half the corpus here — the budget is data-derived
    and deterministic) and per-source availability, allocate each
    source its temperature-weighted token target, the epoch count
    needed to fill it, the epoch-CAPPED planned allocation, and the
    unfillable shortfall. This emits the PLAN a training run executes
    — the artifact the row-level ops (mix_datasets / upsample_to /
    sample_temperature) consume; those mix actual rows, this decides
    the numbers.

    Determinism: temperature alpha = 0.5 weights are EXACT integer
    square roots — floor(sqrt(double)) corrected by one compare in
    each direction (r - [r² > x] + [(r+1)² <= x]), identical integer
    in both engines with no float-sum normalizer at all (the
    sample_temperature sorted-fold device made unnecessary: integer
    weights sum exactly in any order). Targets are integer divisions;
    epochs the ceil-div; the one double division (upsample_factor) is
    exact-int, guarded.

    Scale shape: ONE corpus pass collapses to a sources-sized table;
    every scalar (total weight, budget) is a full-frame window over
    those <= sources rows — no agg + crossJoin subtree replay, no
    second corpus scan."""
    tok = t(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    avail = tok.groupBy("source").agg(F.count("*").cast("bigint").alias("avail"))
    r0 = F.floor(F.sqrt(F.col("avail").cast("double"))).cast("bigint")
    w = avail.withColumn("r0", r0).withColumn(
        "weight",
        F.col("r0")
        - F.when(F.col("r0") * F.col("r0") > F.col("avail"), 1).otherwise(0)
        + F.when(
            (F.col("r0") + 1) * (F.col("r0") + 1) <= F.col("avail"), 1
        ).otherwise(0),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = w.select(
        "source",
        "avail",
        "weight",
        F.sum("weight").over(w_all).cast("bigint").alias("total_weight"),
        F.expr("sum(avail) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND "
               "UNBOUNDED FOLLOWING) div 2").cast("bigint").alias("budget"),
    )
    plan = tot.withColumn(
        "target",
        F.expr("budget * weight div greatest(total_weight, 1)"),
    )
    planned = F.least(F.col("target"), F.lit(MIX_EPOCH_CAP) * F.col("avail"))
    return plan.select(
        "source",
        "avail",
        "weight",
        "budget",
        "target",
        F.least(
            F.expr("(target + greatest(avail, 1) - 1) div greatest(avail, 1)"),
            F.lit(MIX_EPOCH_CAP).cast("bigint"),
        )
        .cast("bigint")
        .alias("epochs"),
        planned.cast("bigint").alias("planned"),
        (F.col("target") - planned).cast("bigint").alias("shortfall"),
        F.when(
            F.col("avail") > 0, planned.cast("double") / F.col("avail")
        ).alias("upsample_factor"),
    )


# ---------------------------------------------------------------------------
# Per-source document caps: the one standard curation lever the funnel
# lacked (VERDICT r11 next-9) — bound any single source's share of the
# training set by an absolute per-source document budget (the
# per-domain cap every web-scale curation pipeline applies so one giant
# crawl domain cannot dominate the mixture; cf. the url/domain caps in
# RefinedWeb/Gopher-style curation). Which docs survive is a
# deterministic hash subsample (md5 key — no RNG, reproducible under
# any partitioning), selected by the HISTOGRAM-THRESHOLD device: a
# 256-bin histogram of hash keys per source picks the threshold bin,
# docs below it are kept outright, and only the BOUNDARY bin (~1/256 of
# a source) pays a row_number — never a per-source global sort.
_CAP_BINS = 256
# cap = half the mean source size (corpus-derived so it binds at every
# scale factor; greatest(1, total // (2 * n_sources)) in both engines)
_CAP_SQL = (
    "greatest(1, (SELECT count(*) FROM documents) "
    "// (2 * (SELECT count(DISTINCT source) FROM documents)))"
)

_CAP_HEX_FOLD_SQL = (
    "list_reduce(list_transform(range(1, 16), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5('scap:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
    "(acc, x) -> acc * 16 + x)"
)


def apply_source_caps(docs: DataFrame, bins: int = _CAP_BINS) -> DataFrame:
    """Cap documents per source at greatest(1, total // (2 * n_sources))
    via the histogram-threshold device; returns the kept (doc_id, lang,
    source) rows. Shared by the registered query and the funnel
    composition test so the stage cannot drift from its audit.

    Scale shape: pass 1 collapses the corpus map-side to a <=
    sources x {_CAP_BINS} histogram (partial-aggregable groupBy); the
    cap and per-source thresholds derive from full-frame/per-source
    windows over that tiny table (the r11 one-corpus-pass scalar rule —
    no agg+crossJoin subtree replay); pass 2 re-scans the corpus once,
    broadcast-joins the <= n_sources-row threshold table, keeps
    below-threshold bins with a columnar filter, and ranks ONLY the
    boundary bin (~1/{_CAP_BINS} of each source) through a window —
    never a per-source sort of the corpus. Deterministic under any
    partitioning (md5 keys, total-order tiebreaks)."""
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("scap:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    binned = docs.select(
        "doc_id", "lang", "source", hkey.alias("hkey"), (hkey % bins).alias("bin")
    )
    hist = binned.groupBy("source", "bin").agg(F.count("*").alias("c"))
    wfull = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = Window.partitionBy("source").orderBy("bin")
    cum = (
        hist.withColumn("total", F.sum("c").over(wfull))
        .withColumn("nsrc", F.size(F.collect_set("source").over(wfull)))
        .withColumn("cap", F.expr("greatest(1, total div (2 * nsrc))"))
        .withColumn("cum", F.sum("c").over(wcum))
    )
    # threshold bin + boundary quota via the struct-min argmin (the
    # first bin whose cumulative count reaches the cap; min() over the
    # struct orders by bin, so the quota rides along exactly)
    thr = cum.groupBy("source").agg(
        F.min(
            F.when(
                F.col("cum") >= F.col("cap"),
                F.struct(
                    F.col("bin").alias("tbin"),
                    (F.col("cap") - (F.col("cum") - F.col("c"))).alias("quota"),
                ),
            )
        ).alias("t")
    ).select("source", F.col("t.tbin").alias("tbin"), F.col("t.quota").alias("quota"))
    joined = binned.join(F.broadcast(thr), "source")
    below = joined.filter(F.col("tbin").isNull() | (F.col("bin") < F.col("tbin")))
    wb = Window.partitionBy("source").orderBy("hkey", "doc_id")
    boundary = (
        joined.filter(F.col("bin") == F.col("tbin"))
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= F.col("quota"))
    )
    return below.select("doc_id", "lang", "source").unionByName(
        boundary.select("doc_id", "lang", "source")
    )


@register(
    "mix_source_caps",
    oracle=f"""
    WITH binned AS (
      SELECT doc_id, lang, source,
             CAST({_CAP_HEX_FOLD_SQL} AS BIGINT) AS hkey,
             CAST({_CAP_HEX_FOLD_SQL} AS BIGINT) % {_CAP_BINS} AS bin
      FROM documents
    ),
    hist AS (SELECT source, bin, count(*) AS c FROM binned GROUP BY 1, 2),
    cum AS (
      SELECT source, bin, c, ({_CAP_SQL}) AS cap,
             sum(c) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist
    ),
    thr AS (
      SELECT source, min(CASE WHEN cum >= cap THEN bin END) AS tbin
      FROM cum GROUP BY source
    ),
    quota AS (
      SELECT c2.source, CAST(c2.cap - (c2.cum - c2.c) AS BIGINT) AS quota
      FROM cum c2 JOIN thr ON thr.source = c2.source AND c2.bin = thr.tbin
    )
    SELECT b.doc_id, b.lang, b.source
    FROM binned b JOIN thr ON thr.source = b.source
    WHERE thr.tbin IS NULL OR b.bin < thr.tbin
    UNION ALL
    SELECT doc_id, lang, source FROM (
      SELECT b.doc_id, b.lang, b.source, q.quota,
             row_number() OVER (PARTITION BY b.source
                                ORDER BY b.hkey, b.doc_id) AS rn
      FROM binned b
      JOIN thr ON thr.source = b.source
      JOIN quota q ON q.source = b.source
      WHERE b.bin = thr.tbin)
    WHERE rn <= quota
    """,
)
def mix_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps (section comment above): keep at most
    greatest(1, total // (2 * n_sources)) documents per source — a
    deterministic hash subsample selected by the histogram-threshold
    device, the per-domain dominance bound a curation funnel applies
    before mixing. Composes over any doc frame via apply_source_caps
    (the funnel-composition pytest drives it over the quality-filter
    stage's survivors)."""
    return apply_source_caps(t(spark, sf_dir, "documents"))
