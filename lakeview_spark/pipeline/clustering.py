"""Near-duplicate clustering: connected components over the MinHash-LSH
candidate graph, plus deterministic stratified sampling.

`dedup_clusters` turns pairwise near-dup candidates into dedup groups
(cluster id = min doc_id in the component) via iterative min-label
propagation — the standard large-scale formulation (alternating
star-contraction converges in O(log n) rounds; plain propagation is fine
for the bounded diameters near-dup graphs have). Each round is one
join + groupBy; lineage is cut with localCheckpoint so 20 rounds don't
stack a 20-deep plan.

The DuckDB oracle computes the same fixpoint with a recursive CTE
(transitive closure -> min reachable label), so even this iterative
operator is hash-checkable.

`sample_stratified` is hash-based deterministic sampling (md5 prefix
threshold per stratum) — reproducible train/eval splits with no RNG
state, identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.operators.materialize import materialized
from lakeview_spark.pipeline.dedup import dedup_minhash_lsh_pairs
from lakeview_spark.plans.registry import register, t

_MAX_ITER = 25


def connected_components(edges: DataFrame, src: str = "doc1", dst: str = "doc2") -> DataFrame:
    """(src, dst) edge list -> (doc_id, cluster_id=min doc_id in component).

    Iterative min-label propagation to fixpoint; only vertices that
    appear in an edge are returned."""
    bidir = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        bidir.select(F.col("a").alias("doc_id")).distinct().withColumn("label", F.col("doc_id"))
    ).localCheckpoint()

    for _ in range(_MAX_ITER):
        msgs = bidir.join(
            labels.withColumnRenamed("doc_id", "a"), "a"
        ).select(F.col("b").alias("doc_id"), "label")
        prop = labels.unionByName(msgs).groupBy("doc_id").agg(
            F.min("label").alias("label")
        )
        # pointer doubling: also adopt the label OF my label — turns
        # one-hop-per-round propagation into O(log diameter) rounds
        # (a 1M-node chain converges in ~20 rounds instead of 1M)
        hop = prop.alias("x").join(
            prop.alias("y"), F.col("x.label") == F.col("y.doc_id")
        ).select(F.col("x.doc_id").alias("doc_id"), F.col("y.label").alias("label"))
        new_labels = (
            prop.unionByName(hop).groupBy("doc_id").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


# the recursive-CTE fixpoint (LSH candidate pairs -> transitive closure
# -> min reachable label), shared by every cluster-consuming oracle —
# ONE definition so the four oracles can never drift from each other
_CLUSTERS_CTE = """
    WITH RECURSIVE pairs AS (
      -- inline: the dedup_minhash_lsh_pairs oracle
      WITH s AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
      ),
      e AS (SELECT doc_id, unnest(shingles) AS shingle FROM s),
      sig AS (
        SELECT doc_id, b.band,
               min(md5(CAST(b.band AS VARCHAR) || ':' || shingle)) AS minhash
        FROM e, (SELECT unnest(range(1, 9)) AS band) b
        GROUP BY doc_id, b.band
      )
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc1 AS a, doc2 AS b FROM pairs
      UNION SELECT doc2, doc1 FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    clusters AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src
    )
"""


@register(
    "dedup_clusters",
    oracle=f"{_CLUSTERS_CTE} SELECT doc_id, cluster_id FROM clusters",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup groups: connected components of the LSH candidate
    graph, cluster id = min doc_id in the component.

    The label table is materialized once per run: the iterative
    fixpoint (a multi-job computation) would otherwise re-run for every
    consumer — dedup_apply alone was paying it twice."""
    return clusters_materialized(spark, sf_dir)


def clusters_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return materialized(spark, "dedup_clusters", sf_dir, _clusters_build)


def _clusters_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    return connected_components(pairs)


@register(
    "dedup_apply",
    oracle=f"""
    {_CLUSTERS_CTE}
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
    """,
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's OUTPUT: the corpus with near-duplicates
    removed, keeping one canonical document (min doc_id) per cluster.

    Left-anti join of documents against non-canonical cluster members —
    at scale this is the step that actually shrinks the training set;
    the anti join shuffles only (doc_id) pairs, never text."""
    members = dedup_clusters(spark, sf_dir)
    losers = members.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = t(spark, sf_dir, "documents")
    return docs.join(losers, "doc_id", "left_anti").select("doc_id", "lang", "source")


@register(
    "dedup_apply_quality",
    oracle=f"""
    {_CLUSTERS_CTE},
    sized AS (
      SELECT c.doc_id, c.cluster_id, len(string_split(d.text, ' ')) AS n_tok
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    ),
    losers AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_tok DESC, doc_id) AS rn
        FROM sized
      ) WHERE rn > 1
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
)
def dedup_apply_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup apply: per near-dup cluster keep the LONGEST
    member (token count desc, doc_id tiebreak) instead of dedup_apply's
    min-doc_id canonical — the policy real corpora want (near-dups are
    usually truncations/excerpts of one another, so min-id keeps an
    arbitrary version while longest keeps the most complete). The
    keep-policy is the only delta vs dedup_apply: same cluster table,
    same anti-join output shape, so the two results diff cleanly.

    Scale shape: the cluster member table is tiny relative to the
    corpus (near-dup members only) — its join to the token counts and
    the per-cluster argmax window (partition size = cluster size) cost
    nothing next to the LSH pass; the final anti join shuffles only
    doc_ids, never text."""
    from pyspark.sql import Window

    members = dedup_clusters(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    sized = members.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_tok"), "doc_id")
    losers = (
        sized.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < (CASE WHEN lang = 'en' THEN '20' ELSE '80' END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: md5(doc_id) hex prefix under a
    per-stratum threshold (~12.5% of 'en', ~50% of other languages) —
    reproducible splits with no RNG, stable under repartitioning."""
    docs = t(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit("20")).otherwise(F.lit("80"))
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.filter(key < threshold).select("doc_id", "lang", "source")


@register(
    "dedup_cluster_stats",
    oracle=f"""
    {_CLUSTERS_CTE},
    sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY cluster_id)
    SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS docs_covered
    FROM sizes GROUP BY cluster_size
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over the near-dup components — the
    standard dedup report (how many pair-clusters vs giant components;
    a heavy tail here means the LSH bands are merging unrelated docs).
    Two groupBys over the materialized label table; integer math."""
    labels = clusters_materialized(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).cast("bigint").alias("docs_covered"),
    )


@register(
    "sample_temperature",
    oracle="""
    WITH cnt AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    z AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
                         (a, b) -> a + b) AS z
      FROM cnt
    ),
    rates AS (
      SELECT lang, n_docs,
             sqrt(CAST(n_docs AS DOUBLE)) / z AS weight,
             least(1.0, ((total // 2) * (sqrt(CAST(n_docs AS DOUBLE)) / z)) / n_docs)
               AS sample_rate
      FROM cnt, z
    ),
    thr AS (
      SELECT lang, n_docs, weight, sample_rate,
             lower(lpad(to_hex(CAST(floor(sample_rate * 4294967296.0) AS BIGINT)), 8, '0'))
               AS thr_hex
      FROM rates
    ),
    sel AS (
      SELECT d.lang, count(*) AS sampled
      FROM documents d JOIN thr t ON d.lang = t.lang
      WHERE t.sample_rate >= 1.0
         OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr_hex
      GROUP BY d.lang
    )
    SELECT t.lang AS lang, t.n_docs AS n_docs, t.weight AS weight,
           t.sample_rate AS sample_rate,
           CAST(coalesce(s.sampled, 0) AS BIGINT) AS sampled_docs
    FROM thr t LEFT JOIN sel s ON t.lang = s.lang
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling across languages (the XLM-R/mT5 recipe):
    language l is drawn proportionally to p_l^alpha with alpha = 0.5,
    flattening the head so low-resource languages are over-represented.
    alpha = 0.5 is deliberately sqrt(): IEEE-754 sqrt is correctly
    rounded, so Spark and DuckDB produce bit-identical weights (pow()
    carries no such guarantee). The normalizer folds sqrt(n_l) in
    sorted-language order — an explicit left fold, never an unordered
    float sum. Selection is the same md5-threshold device as
    sample_stratified, with the per-language rate mapped to an 8-hex
    prefix threshold, so the drawn subset is reproducible under any
    partitioning. Output: per language, corpus count, temperature
    weight, effective sample rate at a half-corpus budget, and the
    docs actually drawn.

    Scale shape: one groupBy(lang) for counts, a 1-row normalizer
    broadcast onto the 5-row rate table, and the rate table broadcast
    onto the corpus scan — one shuffle total; the doc-level filter is
    pure columnar md5 math."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    cnt = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    zrow = cnt.select(
        F.sort_array(F.collect_list(F.struct("lang", "n_docs"))).alias("arr")
    ).select(
        F.aggregate(
            F.expr("transform(arr, x -> x.n_docs)"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total"),
        F.aggregate(
            F.expr("transform(arr, x -> x.n_docs)"),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x.cast("double")),
        ).alias("z"),
    )
    weight = F.sqrt(F.col("n_docs").cast("double")) / F.col("z")
    rates = cnt.crossJoin(F.broadcast(zrow)).select(
        "lang",
        "n_docs",
        weight.alias("weight"),
        F.least(
            F.lit(1.0), (F.expr("total div 2") * weight) / F.col("n_docs")
        ).alias("sample_rate"),
    )
    thr = rates.withColumn(
        "thr_hex",
        F.lower(
            F.lpad(
                F.hex(F.floor(F.col("sample_rate") * 4294967296.0).cast("bigint")),
                8,
                "0",
            )
        ),
    )
    sel = (
        docs.join(F.broadcast(thr.select("lang", "sample_rate", "thr_hex")), "lang")
        .filter(
            (F.col("sample_rate") >= 1.0)
            | (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
                < F.col("thr_hex")
            )
        )
        .groupBy("lang")
        .agg(F.count("*").alias("sampled"))
    )
    return thr.join(F.broadcast(sel), "lang", "left").select(
        "lang",
        "n_docs",
        "weight",
        "sample_rate",
        F.coalesce("sampled", F.lit(0)).cast("bigint").alias("sampled_docs"),
    )
