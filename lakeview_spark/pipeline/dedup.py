"""Deduplication operators over the documents table (BASELINE.json north
star: LLM-data-pipeline dedup at 100 TB).

All hash logic rides on md5 hex (identical lowercase hex in Spark and
DuckDB) so every operator is oracle-checkable:

- exact dedup: hash-groupBy on the full text (one shuffle on a 16-byte
  key; at 100 TB this is the cheapest possible exact pass)
- n-gram Jaccard: word 3-gram shingles -> shared-shingle equi-join ->
  intersection count / union. The candidate join is the classic
  inverted-index pattern: only docs sharing a shingle ever meet, so the
  shuffle is bounded by shingle-postings, not |docs|^2
- MinHash + LSH: per-band min over md5(band:shingle) — min of fixed-width
  hex == min of the 128-bit integer, so the signature is a plain string
  min-agg; band-bucket self-join yields candidates without any pairwise
  scan
- SimHash: 16-bit signature from per-token md5 nibble parity, majority
  vote per bit — one groupBy with 16 conditional sums

Scale notes: every operator is shuffle-bounded by (shingle, doc) or
(band, signature) keys — no cartesian products, no driver collects; LSH
banding is how near-dup dedup actually runs on petabyte corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.operators.materialize import materialized
from lakeview_spark.plans.registry import register, t

N_BANDS = 8

# Jaccard candidate-join document-frequency cap: a shingle appearing in
# df docs contributes O(df^2) candidate pairs, so one hot "stop shingle"
# is quadratic at corpus scale. Shingles with df > cap are dropped from
# the inverted index (standard near-dup practice; such shingles carry no
# similarity signal anyway). Synthetic testdata maxes out at df=25, so
# the cap never changes test output — it exists for the 100 TB case.
JACCARD_DF_CAP = 1000

# shared tokenization / shingling (Spark side)


def _tokens(col):
    return F.split(F.lower(col), " ")


def _shingles_expr() -> str:
    # word 3-grams via zip_with over three shifted slices — ~10x faster
    # than transform(sequence, i -> element_at(...)): element_at is an
    # O(n) probe per lambda call (O(n^2) per doc) while slice+zip_with
    # streams the arrays once. Guarded: docs under 3 tokens -> empty.
    return (
        "CASE WHEN size(toks) < 3 THEN array() ELSE "
        "zip_with(slice(toks, 1, size(toks) - 2), "
        "zip_with(slice(toks, 2, size(toks) - 2), slice(toks, 3, size(toks) - 2), "
        "(y, z) -> concat(y, ' ', z)), "
        "(x, yz) -> concat(x, ' ', yz)) END"
    )


_SHINGLES_SQL = """
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
"""

# The ONE definition of the df-capped pair-intersection machinery
# (capped inverted index -> self-join -> per-pair intersection counts
# `p(doc1, doc2, inter)` + per-doc set sizes `sizes(doc_id, n)`) —
# shared by the Jaccard pass, the containment pass, and the
# eval-truth CTEs (evaluation.py) so the three can never drift
# (the cluster oracles' shared-CTE convention).
_CAPPED_PAIRS_SQL = f"""
    s AS ({_SHINGLES_SQL}),
    e0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM s),
    live AS (SELECT shingle FROM e0 GROUP BY shingle HAVING count(*) <= {JACCARD_DF_CAP}),
    e AS (SELECT e0.doc_id, e0.shingle FROM e0 JOIN live USING (shingle)),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM s),
    p AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
"""


def capped_pair_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the `p` CTE: (doc1, doc2, inter) — one pair-keyed
    aggregation over the persisted shingle-bucketed df-capped inverted
    index (both self-join sides are co-located scans)."""
    e = jaccard_index_materialized(spark, sf_dir)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("inter"))
    )


def shingle_set_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the `sizes` CTE: (doc_id, n) — full UNCAPPED
    shingle-set sizes (denominators stay exact even when hot shingles
    were dropped from the index). Reads the stored n_shingles column,
    so the scan prunes the array column entirely."""
    return _doc_shingles(spark, sf_dir).select(
        "doc_id", F.col("n_shingles").alias("n")
    )


def _doc_shingles_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Repartition the raw scan before the shingle map: the local
    # testdata tables are single-row-group parquet files, which Spark
    # cannot split, so without this every downstream array/md5 kernel
    # (here and in the signature builder reading this scratch table)
    # would run on ONE core. One cheap shuffle of (doc_id, text) buys a
    # fully parallel build and a multi-file scratch table that every
    # consumer scans in parallel. On real multi-row-group inputs the
    # scan splits on its own and this is a no-op-sized exchange.
    docs = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", _tokens(F.col("text")).alias("toks"))
    )
    # n_shingles is stored alongside the array (r13, VERDICT r12
    # next-5): size-only consumers (Jaccard denominators, prefix-filter
    # sizes, novelty normalizers) then column-prune the scratch scan to
    # two int columns instead of decoding the full shingle arrays —
    # at sf1 the array column is ~10x the testdata text, so the pruned
    # read is the difference between a metadata-light scan and a
    # corpus-sized one.
    return docs.select(
        "doc_id", F.array_distinct(F.expr(_shingles_expr())).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles) materialized once per run: the Jaccard query
    reads it for set sizes, the capped inverted-index builder
    (jaccard_index_materialized) and the MinHash signature builder each
    read it once more."""
    return materialized(spark, "doc_shingles", sf_dir, _doc_shingles_build)


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc, count(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep min doc_id as canonical."""
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc"), F.count("*").alias("dup_count")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_CAPPED_PAIRS_SQL}
    SELECT doc1, doc2, inter,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM p
    JOIN sizes sa ON sa.doc_id = doc1
    JOIN sizes sb ON sb.doc_id = doc2
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: shingle inverted-index join + Jaccard >= 0.1.

    Hot shingles (df > JACCARD_DF_CAP) are dropped from the inverted
    index before the pair join — without the cap one stop-shingle makes
    the join O(df^2). The df filter shuffles on `shingle`, the same key
    as the pair join, so it adds no extra exchange of the postings.
    Jaccard denominators keep the full (uncapped) shingle-set sizes, so
    the score is exact whenever the true intersection avoids hot
    shingles (always true on the testdata; conservative at scale).

    The capped inverted index is materialized BUCKETED on `shingle`
    (jaccard_index_materialized): without it the explode + df-filter
    lineage executes once per self-join side plus once for the df
    count; with it both pair-join sides are co-located parquet scans
    with no exchange before the pair groupBy."""
    pairs = capped_pair_intersections(spark, sf_dir)
    sizes = shingle_set_sizes(spark, sf_dir)
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(F.broadcast(sa), "doc1")
        .join(F.broadcast(sb), "doc2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.1)
        .select("doc1", "doc2", "inter", "jaccard")
    )


_MINHASH_SIG_SQL = f"""
    WITH s AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id, unnest(shingles) AS shingle FROM s),
    sig AS (
      SELECT doc_id, b.band,
             min(md5(CAST(b.band AS VARCHAR) || ':' || shingle)) AS minhash
      FROM e, (SELECT unnest(range(1, {N_BANDS + 1})) AS band) b
      GROUP BY doc_id, b.band
    )
"""


@register(
    "dedup_minhash_signatures",
    oracle=_MINHASH_SIG_SQL + " SELECT doc_id, band, minhash FROM sig",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: per (doc, band) min over salted shingle md5.

    Fixed-width hex min == numeric min of the hash — a plain string
    min-agg. All N_BANDS mins are computed in ONE groupBy over the
    shingle rows (map-side partial agg collapses each partition to one
    row per doc before the shuffle), then unpivoted with stack() —
    ~N_BANDS× less shuffle than exploding a band column."""
    e = _doc_shingles(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    wide = e.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat_ws("", F.lit(f"{b}:"), F.col("shingle")))).alias(f"mh_{b}")
            for b in range(1, N_BANDS + 1)
        ]
    )
    stack_args = ", ".join(f"{b}, mh_{b}" for b in range(1, N_BANDS + 1))
    return wide.selectExpr(
        "doc_id", f"stack({N_BANDS}, {stack_args}) AS (band, minhash)"
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=_MINHASH_SIG_SQL
    + """
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs colliding in any band bucket.

    The signature table is materialized once per run (see
    operators/materialize.py) so the shingle->signature pipeline is NOT
    recomputed per join side or per dependent query
    (minhash_similarity_estimate, dedup_clusters) — each side of the
    self-join is a plain parquet scan of the persisted signatures."""
    sig = minhash_signatures_materialized(spark, sf_dir)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def minhash_signatures_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures persisted to scratch once per (session, dataset)
    — every consumer (LSH self-join sides, similarity estimation,
    clustering) reads the table back instead of recomputing the shingle
    pipeline. Written BUCKETED on (band, minhash): the LSH candidate
    self-join equi-joins exactly those columns, so once the table
    outgrows the broadcast threshold the join is a zero-Exchange
    sort-merge over co-located buckets (tests/test_scale.py proves the
    no-shuffle plan with broadcast disabled)."""
    from lakeview_spark.operators.materialize import materialized_bucketed

    return materialized_bucketed(
        spark, "minhash_sig", sf_dir, dedup_minhash_signatures, ["band", "minhash"]
    )


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")
# hex digits whose second-lowest nibble bit is set — the other
# independent md5 bit each hex digit contributes to the wide signature
_BIT2_HEX = ("2", "3", "6", "7", "a", "b", "e", "f")

# 64-bit SimHash signature (r6 verdict next-2: the 32-bit variant hits
# the birthday regime for hamming<=3 at ~50k docs — 2.7M chance pairs
# measured, SCALE.md §8 — so candidate-join input grew quadratically;
# 64 bits pushes the chance-collision knee past any realistic corpus
# shard and the band domain from 256 to 65536 values). Construction:
# bit i (1..32) = majority vote over tokens of md5 hex digit i's LOWEST
# bit; bit i (33..64) = majority vote of hex digit (i-32)'s SECOND bit
# — two independent bits per digit, same classic simhash majority, and
# byte-for-byte reproducible in any engine with md5. Bit 64 is the
# BIGINT sign bit, so its weight is -(2^63) (two's complement); partial
# sums never overflow because bits 1..63 sum to at most 2^63-1 before
# the single negative term lands.
SIMHASH_BITS = 64


def _simhash_bit_weight(i: int) -> int:
    return -(1 << 63) if i == 64 else 1 << (i - 1)


def _simhash_bit_sql(i: int) -> str:
    digit = i if i <= 32 else i - 32
    in_list = ",".join(f"'{h}'" for h in (_ODD_HEX if i <= 32 else _BIT2_HEX))
    return (
        f"(CASE WHEN sum(CASE WHEN substr(th, {digit}, 1) IN ({in_list}) "
        f"THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({_simhash_bit_weight(i)} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
    )


# Shared with curation.py's hamming-pair query and the evaluation
# band-quality audit: a WITH-composable SELECT producing
# (doc_id, simhash BIGINT).
_SIMHASH_SQL = (
    """
    SELECT doc_id, """
    + " + ".join(_simhash_bit_sql(i) for i in range(1, SIMHASH_BITS + 1))
    + """ AS simhash
    FROM (SELECT doc_id, md5(tok) AS th FROM
          (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents))
    GROUP BY doc_id
    """
)


def simhash_signature(hashed: DataFrame) -> DataFrame:
    """(doc_id, th=md5-hex) token stream -> (doc_id, simhash BIGINT):
    the 64-bit majority-vote aggregation, shared between the one-shot
    `dedup_simhash` query and the materialized builder in curation.py
    (which repartitions its input first — SCALE.md §6).

    Built as ONE sql expression via the same `_simhash_bit_sql` pieces
    the DuckDB oracle uses (r14, the _bucket_expr lesson): the Column
    form issued hundreds of py4j calls — 64 bits x (when/sum/when/
    substring/isin) plus 63 chained adds — and that DRIVER-side
    expression construction cost 2.4-2.9 s per query build, more than
    the query's whole execution. One string parse is ~ms. The SQL is
    operator-for-operator the Column tree (substr == substring,
    left-associative '+' chain, same CASE shape), so the signature is
    bit-identical."""
    expr = " + ".join(_simhash_bit_sql(i) for i in range(1, SIMHASH_BITS + 1))
    return hashed.groupBy("doc_id").agg(F.expr(expr).alias("simhash"))


@register("dedup_simhash", oracle=_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 64-bit signature, bits = majority votes of md5-nibble
    bits over tokens (token multiplicity counts, as in classic
    simhash). Same signature the hamming-pair query banishes into 4 x
    16-bit bands (curation.py).

    The scan goes through spread_unsplittable on doc_id (r14
    optimization, guide §2.5): tokenize + md5 + the 64 vote-sums are
    the engine's heaviest scan-side kernel, and on the single-file
    layout the whole map ran in ONE task. Keyed on the groupBy key, the
    guard's exchange replaces the aggregation's own (still exactly one
    exchange in the plan — it moved below the kernel); on a splittable
    layout the guard is a no-op. Integer vote sums are order-exact, so
    the signature is bit-identical."""
    from lakeview_spark.operators.scale import spread_unsplittable

    docs = spread_unsplittable(
        t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    e = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    return simhash_signature(e.select("doc_id", F.md5("tok").alias("th")))


def _jaccard_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass df-cap (r13, VERDICT r12 next-5; restructured r14 per
    # ADVICE r13): the r12 groupBy-df + join-back form referenced the
    # exploded shingle stream TWICE (two full scans of the shingle-array
    # scratch + two corpus-sized exchanges on `shingle`); the r13
    # posting-collapse form (collect_list -> size filter -> explode)
    # fixed that but materialized each shingle's ENTIRE posting list in
    # one aggregation buffer BEFORE the cap — a per-key memory hazard at
    # large SF, where one boilerplate shingle's df can be corpus-scale.
    # The shipped form applies the cap through a WINDOW COUNT over the
    # same single exchange: count(*) over (partition by shingle) keeps
    # one long of per-key state behind a spillable sort, rows stream
    # through, and over-cap postings never materialize anywhere.
    # Set-identical output, still ONE scan and ONE exchange (the window
    # clusters on `shingle`, the same key the bucketed write needs, so
    # materialized_bucketed's repartition collapses into it).
    from pyspark.sql import Window as _W

    s = _doc_shingles(spark, sf_dir)
    e0 = s.select("doc_id", F.explode("shingles").alias("shingle"))
    w = _W.partitionBy("shingle")
    return (
        e0.withColumn("df", F.count(F.lit(1)).over(w))
        .filter(F.col("df") <= JACCARD_DF_CAP)
        .select("shingle", "doc_id")
    )


def jaccard_index_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-capped (doc_id, shingle) inverted index persisted once per
    (session, dataset), bucketed on `shingle` — the pair self-join's
    equi key — so both join sides read co-located buckets with zero
    exchanges before the pair aggregation (same device as the MinHash
    signature table)."""
    from lakeview_spark.operators.materialize import materialized_bucketed

    return materialized_bucketed(
        spark, "jaccard_index", sf_dir, _jaccard_index_build, ["shingle"]
    )


# asymmetric-containment threshold: inter / |smaller set| — Broder's
# containment coefficient. A truncated copy of a long document scores
# ~1.0 here while its symmetric Jaccard can sit BELOW the 0.1 near-dup
# threshold (inter/min = 1 but inter/union ~ |short|/|long|), so the
# symmetric pass structurally misses truncation/quotation pairs.
CONTAINMENT_MIN = 0.8


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_CAPPED_PAIRS_SQL}
    SELECT doc1, doc2, inter,
           CASE WHEN sa.n <= sb.n THEN doc1 ELSE doc2 END AS contained_doc,
           CAST(inter AS DOUBLE) / least(sa.n, sb.n) AS containment
    FROM p
    JOIN sizes sa ON sa.doc_id = doc1
    JOIN sizes sb ON sb.doc_id = doc2
    WHERE CAST(inter AS DOUBLE) / least(sa.n, sb.n) >= {CONTAINMENT_MIN}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (Broder 1997's containment
    coefficient next to the resemblance/Jaccard the other pair queries
    use): pairs where the SMALLER document's shingle set is >= 80%
    inside the other's — the truncation / quoted-excerpt / superset
    signal that symmetric Jaccard structurally underweights (a 10-line
    excerpt of a 300-line doc has Jaccard ~0.03 but containment 1.0).
    `contained_doc` names the smaller side (ties -> doc1, identical
    CASE in both engines) — the candidate the keep-longest policy
    (dedup_apply_quality) would drop.

    Scale shape: identical to dedup_ngram_jaccard — both self-join
    sides are co-located scans of the persisted shingle-bucketed
    inverted index (df-capped, so no hot-shingle quadratics), one
    pair-keyed aggregation, set sizes broadcast. The df cap makes the
    intersection conservative for pairs relying on hot shingles, same
    caveat as the Jaccard pass. Pair machinery shared with that pass
    via capped_pair_intersections / _CAPPED_PAIRS_SQL."""
    pairs = capped_pair_intersections(spark, sf_dir)
    sizes = shingle_set_sizes(spark, sf_dir)
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("nb"))
    containment = F.col("inter").cast("double") / F.least("na", "nb")
    return (
        pairs.join(F.broadcast(sa), "doc1")
        .join(F.broadcast(sb), "doc2")
        .withColumn("containment", containment)
        .filter(F.col("containment") >= CONTAINMENT_MIN)
        .select(
            "doc1",
            "doc2",
            "inter",
            F.when(F.col("na") <= F.col("nb"), F.col("doc1"))
            .otherwise(F.col("doc2"))
            .alias("contained_doc"),
            "containment",
        )
    )


# shared-span window width (tokens): between the 3-token shingle (pair
# candidates) and the 64-token chunk (RAG blocks) — wide enough that a
# match means copied text, not shared phrasing
SPAN_WIDTH = 8


@register(
    "dedup_shared_spans",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, i, i + {SPAN_WIDTH} - 1), ' ')) AS h
      FROM tk, unnest(range(1, greatest(len(toks) - {SPAN_WIDTH} + 2, 1))) AS u(i)
    ),
    df AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM w GROUP BY h)
    SELECT w.doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS shared_share
    FROM w JOIN df ON w.h = df.h
    GROUP BY w.doc_id
    """,
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication scan (the exact-substring-dedup readout a
    la Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better"): slide an 8-token window with stride 1 over every
    document, hash each window, and report per document how many of its
    windows also occur in ANOTHER document — the copied-boilerplate /
    quoted-passage signal that document-level near-dup (Jaccard over
    3-gram shingles) underweights and chunk-level dedup (64-token
    blocks) misses entirely.

    Scale shape: the heavy kernel (scan -> tokenize -> window explode ->
    md5, ~one row per corpus token) executes exactly ONCE — it feeds a
    single groupBy(h, doc_id) pre-aggregation, and span-frequency
    (ndocs per hash) is then a count() window over the h partitions of
    that compact (hash, doc_id, cnt) table, whose partition sizes are
    bounded by a span's document frequency. The earlier form joined the
    raw window stream against its own groupBy, which re-executed the
    unmaterialized explode/md5 lineage per consumer (the r04
    tf-idf-recompute class). No pair join anywhere: cost is linear in
    corpus tokens."""
    from pyspark.sql import Window

    tk = t(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks")
    # docs shorter than one span emit no windows (the oracle's range()
    # is empty for them) — filter matches that
    w = tk.filter(n >= SPAN_WIDTH).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n - SPAN_WIDTH + 1)).alias("i"),
        "toks",
    ).select(
        "doc_id",
        F.md5(F.array_join(F.expr(f"slice(toks, i, {SPAN_WIDTH})"), " ")).alias("h"),
    )
    per_doc_span = w.groupBy("h", "doc_id").agg(F.count("*").alias("cnt"))
    ndocs = F.count("*").over(Window.partitionBy("h"))
    scored = per_doc_span.withColumn("ndocs", ndocs)
    shared_cnt = F.when(F.col("ndocs") >= 2, F.col("cnt")).otherwise(F.lit(0))
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_spans"),
        F.sum(shared_cnt).cast("bigint").alias("n_shared"),
        (F.sum(shared_cnt).cast("double") / F.sum("cnt")).alias("shared_share"),
    )


@register(
    "dedup_span_apply",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id, i,
             md5(array_to_string(list_slice(toks, i, i + {SPAN_WIDTH} - 1), ' ')) AS h
      FROM tk, unnest(range(1, greatest(len(toks) - {SPAN_WIDTH} + 2, 1))) AS u(i)
    ),
    dup AS (
      SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    starts AS (
      SELECT w.doc_id, w.i,
             CASE WHEN dup.h IS NULL THEN 0 ELSE 1 END AS is_dup
      FROM w LEFT JOIN dup ON w.h = dup.h
    ),
    tokrows AS (
      SELECT doc_id, i AS ti, toks[i] AS tok
      FROM tk, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    cov AS (
      SELECT t.doc_id, t.ti, t.tok,
             max(coalesce(s.is_dup, 0)) OVER (
               PARTITION BY t.doc_id ORDER BY t.ti
               ROWS BETWEEN {SPAN_WIDTH - 1} PRECEDING AND CURRENT ROW) AS covered
      FROM tokrows t LEFT JOIN starts s ON t.doc_id = s.doc_id AND t.ti = s.i
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(1 - covered) AS BIGINT) AS kept_tokens,
           CAST(sum(covered) AS BIGINT) AS removed_tokens,
           coalesce(string_agg(CASE WHEN covered = 0 THEN tok END, ' '
                               ORDER BY ti), '') AS cleaned_text
    FROM cov GROUP BY doc_id
    """,
)
def dedup_span_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup APPLY — the output half of the Lee et al.
    exact-substring pass (dedup_shared_spans is the scan): every token
    covered by an 8-token window whose hash occurs in >= 2 distinct
    documents is REMOVED, and the surviving tokens are reassembled in
    position order into the cleaned (lowercased) text — what actually
    ships to training, next to boilerplate_apply and
    quality_filter_apply for their passes. A token at position ti is
    covered iff some duplicated window starts in [ti-7, ti], which is
    exactly a running max over the last 8 start flags.

    Scale shape, all linear in corpus tokens: the window kernel runs
    once; duplicated hashes come from one (h, doc)-combined groupBy and
    only the df>=2 TAIL is a join side (AQE broadcasts it — the
    boilerplate-lines device); the start flags meet the token stream on
    a (doc_id, ti) equi join; coverage is one per-doc ordered window
    (ROWS 7 PRECEDING) and the reassembly rides the same doc_id
    partitioning. No pair join — cost mirrors dedup_shared_spans.
    Reassembly is engine-identical: Spark sort_array over (ti, tok)
    structs == SQL string_agg ORDER BY ti (the events_session_paths
    precedent)."""
    from pyspark.sql import Window

    tk = t(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks")
    w = (
        tk.filter(n >= SPAN_WIDTH)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), n - SPAN_WIDTH + 1)).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            "i",
            F.md5(F.array_join(F.expr(f"slice(toks, i, {SPAN_WIDTH})"), " ")).alias("h"),
        )
    )
    dup = (
        w.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    starts = w.join(dup, "h", "left").select(
        F.col("doc_id").alias("s_doc"),
        F.col("i").alias("s_i"),
        F.coalesce(F.col("is_dup"), F.lit(0)).alias("is_dup"),
    )
    tokrows = tk.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).select("doc_id", (F.col("pos") + 1).alias("ti"), "tok")
    joined = tokrows.join(
        starts,
        (tokrows.doc_id == starts.s_doc) & (tokrows.ti == starts.s_i),
        "left",
    )
    wcov = (
        Window.partitionBy("doc_id")
        .orderBy("ti")
        .rowsBetween(-(SPAN_WIDTH - 1), 0)
    )
    covered = joined.select(
        "doc_id",
        "ti",
        "tok",
        F.max(F.coalesce(F.col("is_dup"), F.lit(0))).over(wcov).alias("covered"),
    )
    kept_struct = F.when(
        F.col("covered") == 0, F.struct(F.col("ti"), F.col("tok"))
    )
    return covered.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.lit(1) - F.col("covered")).cast("bigint").alias("kept_tokens"),
        F.sum("covered").cast("bigint").alias("removed_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["tok"]
            ),
            " ",
        ).alias("cleaned_text"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join (PPJoin-style)
# ---------------------------------------------------------------------------
#
# The third candidate-generation strategy in the dedup family, next to
# the df-capped inverted index (dedup_ngram_jaccard) and MinHash
# banding: for Jaccard >= t, two sets must share at least one token in
# their RAREST n - ceil(t*n) + 1 tokens (prefix under a global
# rare-first order) — so only the prefix is indexed, and candidate
# volume collapses from "any shared token" to "shared rare-prefix
# token". Chaudhuri/Ganti/Kaushik's SSJoin / Xiao et al.'s PPJoin
# device, the standard high-threshold exact set-similarity join.
#
# No global vocabulary rank is materialized: each doc orders its OWN
# tokens by (df, shingle) — a per-doc window over the posting rows —
# which realizes the same global rare-first prefix without the
# single-partition sort a dense vocab rank would cost. The threshold
# t = 4/5 stays integer end-to-end: prefix_len = n - ceil(4n/5) + 1
# with ceil(4n/5) = (4n+4)//5, the size filter is 4*max <= 5*min, and
# the verify is 5*inter >= 4*union — no float threshold edges anywhere.
_PREFIX_T_NUM = 4
_PREFIX_T_DEN = 5

_PREFIX_PAIRS_SQL = f"""
    WITH s AS ({{shingles}}),
    e AS (SELECT doc_id, unnest(shingles) AS shingle FROM s),
    df AS (SELECT shingle, count(*) AS df FROM e GROUP BY shingle),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM s),
    pos AS (
      SELECT e.doc_id, e.shingle,
             row_number() OVER (PARTITION BY e.doc_id
                                ORDER BY df.df, e.shingle) AS pos,
             z.n
      FROM e JOIN df USING (shingle) JOIN sizes z ON z.doc_id = e.doc_id
    ),
    prefix AS (
      SELECT doc_id, shingle, n FROM pos
      WHERE pos <= n - ({_PREFIX_T_NUM} * n + {_PREFIX_T_NUM}) // {_PREFIX_T_DEN} + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM prefix a JOIN prefix b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE {_PREFIX_T_NUM} * GREATEST(a.n, b.n)
              <= {_PREFIX_T_DEN} * LEAST(a.n, b.n)
    ),
    verified AS (
      SELECT c.doc1, c.doc2,
             len(list_intersect(s1.shingles, s2.shingles)) AS inter,
             len(s1.shingles) AS n1, len(s2.shingles) AS n2
      FROM cand c
      JOIN s s1 ON s1.doc_id = c.doc1
      JOIN s s2 ON s2.doc_id = c.doc2
    )
    SELECT doc1, doc2, CAST(inter AS BIGINT) AS inter,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(inter AS DOUBLE) / (n1 + n2 - inter) AS jaccard
    FROM verified
    WHERE {_PREFIX_T_DEN} * inter >= {_PREFIX_T_NUM} * (n1 + n2 - inter)
"""


@register(
    "dedup_prefix_filter_pairs",
    oracle=_PREFIX_PAIRS_SQL.format(shingles="{}".format(_SHINGLES_SQL)),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-threshold (Jaccard >= {_PREFIX_T_NUM}/{_PREFIX_T_DEN})
    near-dup pairs via prefix filtering (section comment above) —
    candidates must share a RARE-prefix token and pass the integer size
    filter before the exact verify touches the shingle arrays.

    Scale shape: df is one partial-aggregable groupBy; prefix
    positions are per-doc windows (state = one doc's tokens); the
    candidate join is equi on the prefix token whose df is by
    construction the smallest in its doc — the quadratic bucket blowup
    the df-cap guards against cannot arise because hot tokens sit at
    the END of the rare-first order, outside every prefix. The verify
    is per-candidate array intersection, columnar, no further
    shuffle beyond the two array lookups."""
    s = _doc_shingles(spark, sf_dir)
    e = s.select("doc_id", F.explode("shingles").alias("shingle"))
    df_tab = e.groupBy("shingle").agg(F.count("*").alias("df"))
    sizes = s.select("doc_id", F.col("n_shingles").alias("n"))
    from pyspark.sql import Window as _W

    w = _W.partitionBy("doc_id").orderBy("df", "shingle")
    pos = (
        e.join(df_tab, "shingle")
        .join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(w))
    )
    prefix = pos.filter(
        F.col("pos")
        <= F.col("n")
        - F.expr(f"({_PREFIX_T_NUM} * n + {_PREFIX_T_NUM}) div {_PREFIX_T_DEN}")
        + 1
    ).select("doc_id", "shingle", "n")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            _PREFIX_T_NUM * F.greatest("a.n", "b.n")
            <= _PREFIX_T_DEN * F.least("a.n", "b.n")
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    s1 = s.select(F.col("doc_id").alias("doc1"), F.col("shingles").alias("sh1"))
    s2 = s.select(F.col("doc_id").alias("doc2"), F.col("shingles").alias("sh2"))
    verified = (
        cand.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            F.size(F.array_intersect("sh1", "sh2")).cast("bigint").alias("inter"),
            F.size("sh1").cast("bigint").alias("n1"),
            F.size("sh2").cast("bigint").alias("n2"),
        )
    )
    return verified.filter(
        _PREFIX_T_DEN * F.col("inter")
        >= _PREFIX_T_NUM * (F.col("n1") + F.col("n2") - F.col("inter"))
    ).select(
        "doc1",
        "doc2",
        "inter",
        "n1",
        "n2",
        (F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter"))).alias(
            "jaccard"
        ),
    )


# SymSpell candidate generation: minimum token length (shorter tokens
# produce degenerate deletion variants and everything matches)
SYMSPELL_MIN_LEN = 3


@register(
    "dedup_symspell_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE length(tok) >= {SYMSPELL_MIN_LEN} GROUP BY tok
    ),
    vars AS (
      SELECT tok, c, unnest(list_append(
               list_transform(range(1, length(tok) + 1),
                 i -> substr(tok, 1, i - 1)
                      || substr(tok, i + 1, length(tok))),
               tok)) AS variant
      FROM vocab
    ),
    cand AS (
      SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b, a.c AS c_a, b.c AS c_b
      FROM vars a JOIN vars b
        ON a.variant = b.variant AND a.tok < b.tok
    )
    SELECT tok_a, tok_b, c_a, c_b,
           CAST(levenshtein(tok_a, tok_b) AS BIGINT) AS edit_distance
    FROM cand WHERE levenshtein(tok_a, tok_b) <= 1
    """,
)
def dedup_symspell_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy STRING-similarity join over the corpus vocabulary — the
    entity-resolution / typo-detection join class (record linkage,
    spelling normalization before dedup) the token-set joins (PPJoin,
    MinHash) can't express because their unit is the token itself.
    SymSpell candidate generation (Garbe): two strings are within edit
    distance 1 iff they share an entry in each other's
    single-DELETION neighborhoods (a substitution is one deletion on
    each side at the same slot; an insertion/deletion is one side's
    deletion equal to the other string) — so the candidate join is a
    bounded equi join on deletion variants, NEVER an all-pairs
    levenshtein. Every candidate is then VERIFIED with the exact
    Levenshtein distance (the PPJoin filter-verify shape; both engines
    implement the standard unit-cost distance, integer-exact).

    Scale shape: the variant table is vocabulary x avg-token-length
    rows (corpus-INDEPENDENT after the token count); the self-join is
    keyed on variant strings whose per-key fan-out is bounded by the
    neighborhood size; verification is a narrow map on the candidate
    pairs. The del-1 neighborhood generalizes to del-2 for edit
    distance 2 (variants grow to L + L(L-1)/2 per token — still
    vocabulary-scale); threshold 1 is the typo-pair sweet spot."""
    tok = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    vocab = (
        tok.filter(F.length("tok") >= SYMSPELL_MIN_LEN)
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    vars_ = vocab.select(
        "tok",
        "c",
        F.explode(
            F.expr(
                "array_append(transform(sequence(1, length(tok)), "
                "i -> concat(substring(tok, 1, i - 1), "
                "substring(tok, i + 1, length(tok)))), tok)"
            )
        ).alias("variant"),
    )
    a = vars_.select(
        F.col("tok").alias("tok_a"), F.col("c").alias("c_a"), "variant"
    )
    b = vars_.select(
        F.col("tok").alias("tok_b"), F.col("c").alias("c_b"), "variant"
    )
    cand = (
        a.join(b, ["variant"])
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b", "c_a", "c_b")
        .dropDuplicates(["tok_a", "tok_b"])
    )
    ed = F.levenshtein("tok_a", "tok_b")
    return cand.filter(ed <= 1).select(
        "tok_a",
        "tok_b",
        "c_a",
        "c_b",
        ed.cast("bigint").alias("edit_distance"),
    )
