"""Property tests for the round-5 operators, beyond the registry-wide
DuckDB parity harness (which proves value equality): these pin the
SEMANTIC invariants — coverage, partition, bounds — a refactor could
silently break while still hash-matching a co-broken oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeview_spark.plans import QUERIES
from lakeview_spark.plans.registry import t

SF_DIR = "/root/testdata/sf0.001"


def test_chunks_tile_every_document(spark):
    """docs_chunk_overlap: chunk 0 starts at token 0, starts advance by
    exactly the stride, the last chunk reaches the final token, and
    every chunk is full-size except possibly trailing ones."""
    from lakeview_spark.pipeline.packing import CHUNK_SIZE, CHUNK_STRIDE

    chunks = QUERIES["docs_chunk_overlap"](spark, SF_DIR)
    docs = t(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n_tok")
    )
    bad_grid = chunks.filter(
        (F.col("start_tok") != F.col("chunk_idx") * CHUNK_STRIDE)
        | (F.col("n_tok") > CHUNK_SIZE)
        | (F.col("n_tok") < 1)
    )
    assert bad_grid.count() == 0
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_tok")).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.min("start_tok").alias("first_start"),
    )
    j = per_doc.join(docs, "doc_id")
    # last chunk ends exactly at the doc's last token; first starts at 0
    assert j.filter(
        (F.col("covered") != F.col("n_tok")) | (F.col("first_start") != 0)
    ).count() == 0
    # every document with >= 1 token appears
    assert per_doc.count() == docs.count()


def test_split_assignment_partitions_the_corpus(spark):
    """dataset_split_assign: the three splits partition every document
    exactly once and land near the 98/1/1 design proportions."""
    out = QUERIES["dataset_split_assign"](spark, SF_DIR).collect()
    total_docs = t(spark, SF_DIR, "documents").count()
    by_split: dict[str, int] = {}
    for r in out:
        assert r.split in ("train", "val", "test")
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert sum(by_split.values()) == total_docs
    # hash split tolerance at 500 docs: expect ~490/5/5
    assert by_split["train"] >= 0.95 * total_docs
    assert by_split.get("val", 0) + by_split.get("test", 0) <= 0.05 * total_docs


def test_token_concentration_bounds(spark):
    """corpus_token_concentration: sum(cnt^2) is bounded below by
    n_tokens (all-distinct corpus) and above by n_tokens^2 (single
    repeated token), and distinct <= total."""
    for r in QUERIES["corpus_token_concentration"](spark, SF_DIR).collect():
        assert r.distinct_tokens <= r.n_tokens
        assert r.n_tokens <= r.simpson_num <= r.n_tokens * r.n_tokens


def test_split_leakage_pairs_conserve_the_neardup_set(spark):
    """eval_split_leakage: the per-split-pair counts sum to the full
    near-dup pair count, and bucket labels are canonically ordered."""
    leak = QUERIES["eval_split_leakage"](spark, SF_DIR).collect()
    n_pairs = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).count()
    assert sum(r.n_pairs for r in leak) == n_pairs
    assert all(r.split_a <= r.split_b for r in leak)


def test_large_order_customers_threshold_and_keys(spark):
    """large_order_customers: every emitted order's recomputed quantity
    sum exceeds the threshold, and no qualifying order is dropped by
    the join chain (orders/customer are complete dimensions here)."""
    out = QUERIES["large_order_customers"](spark, SF_DIR)
    assert out.filter(F.col("sum_qty") <= 300).count() == 0
    li = t(spark, SF_DIR, "lineitem")
    expected = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"))
        .filter(F.col("s") > 300)
        .count()
    )
    assert out.count() == expected
    # one row per order (the customer join is 1:1 on custkey)
    assert out.select("o_orderkey").distinct().count() == expected


def test_shared_spans_counts_are_symmetric_evidence(spark):
    """dedup_shared_spans: shares are in [0, 1], n_shared <= n_spans,
    every >= SPAN_WIDTH-token document appears, and a shared span
    implies at least TWO documents carry shared spans (sharing is
    between documents, so the flagged set can never have size 1)."""
    from lakeview_spark.pipeline.dedup import SPAN_WIDTH

    out = QUERIES["dedup_shared_spans"](spark, SF_DIR)
    assert out.filter(
        (F.col("n_shared") > F.col("n_spans"))
        | (F.col("shared_share") < 0)
        | (F.col("shared_share") > 1)
    ).count() == 0
    eligible = (
        t(spark, SF_DIR, "documents")
        .filter(F.size(F.split(F.lower("text"), " ")) >= SPAN_WIDTH)
        .count()
    )
    assert out.count() == eligible
    flagged = out.filter(F.col("n_shared") > 0).count()
    assert flagged != 1


def test_quantize_error_bound(spark):
    """embedding_quantize_error: floor quantization's per-coordinate
    error is < scale = max_abs/127, so sq_err < dim * scale^2; and the
    error is never negative."""
    rows = QUERIES["embedding_quantize_error"](spark, SF_DIR).collect()
    dim = len(
        t(spark, SF_DIR, "embeddings").select("embedding").first()["embedding"]
    )
    assert rows
    for r in rows:
        assert r.sq_err >= 0.0
        scale = r.max_abs / 127.0
        assert r.sq_err < dim * scale * scale + 1e-12


def test_multiprobe_dominates_single_bucket_recall(spark):
    """Hamming-1 multiprobe candidates are a SUPERSET of the exact
    bucket's, so per-probe recall@k can only improve — the property
    that justifies multiprobe as the recall knob (eval_ann_recall
    audits the single-bucket floor)."""
    from pyspark.sql import Window

    from lakeview_spark.pipeline.similarity import (
        ANN_RECALL_K,
        _dot,
        _lsh_bucketed,
        _recall_mod_for_n,
        corpus_n,
    )

    idx = _lsh_bucketed(spark, SF_DIR)
    mod = _recall_mod_for_n(corpus_n(spark, SF_DIR))
    q = idx.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    cos = _dot("embedding", "qe") / (F.col("norm") * F.col("qn"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    scored = (
        idx.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            cos.alias("cosine"),
            F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket"))).alias("hd"),
        )
    )
    top_exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_RECALL_K)
        .select("qid", "nid")
    )

    def hits(max_hd):
        top = (
            scored.filter(F.col("hd") <= max_hd)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= ANN_RECALL_K)
            .select("qid", "nid")
        )
        rows = (
            top_exact.join(top, ["qid", "nid"]).groupBy("qid").count().collect()
        )
        return {r.qid: r["count"] for r in rows}

    single, multi = hits(0), hits(1)
    assert single and set(single) <= set(multi) | set(single)
    for qid, s in single.items():
        assert multi.get(qid, 0) >= s, qid
    assert sum(multi.values()) > sum(single.values())


def test_cdc_chunks_are_edit_stable(spark):
    """docs_cdc_chunks: inserting tokens at the FRONT of a document
    shifts every fixed-stride chunk but must leave most CDC chunk
    hashes intact (boundaries are content-defined), and chunks must
    tile the document exactly."""
    from lakeview_spark.pipeline.packing import cdc_chunk_frame

    base = (
        t(spark, SF_DIR, "documents")
        .orderBy("doc_id")
        .limit(20)
        .select("doc_id", "text")
    )
    edited = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("inserted preamble sentence goes here "), F.col("text")).alias(
            "text"
        ),
    )
    chunks = cdc_chunk_frame(base.unionByName(edited))
    # tiling: per doc, sum of chunk lengths == token count, chunk ids
    # are 0..k dense, starts line up
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tok").alias("tok_sum"), F.count("*").alias("k")
    )
    docs = base.unionByName(edited).select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
    )
    assert per_doc.join(docs, "doc_id").filter(
        F.col("tok_sum") != F.col("n")
    ).count() == 0

    got = chunks.select("doc_id", "chunk_hash").collect()
    by_doc: dict[int, set] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add(r.chunk_hash)
    preserved = total = 0
    for doc_id, hashes in by_doc.items():
        if doc_id >= 1_000_000:
            continue
        ed = by_doc.get(doc_id + 1_000_000, set())
        preserved += len(hashes & ed)
        total += len(hashes)
    # the preamble only perturbs chunks up to the first content-defined
    # boundary; everything after re-synchronizes
    assert total > 0 and preserved / total >= 0.5, (preserved, total)


def test_label_purity_invariants(spark):
    """Purity is majority_n / n_vectors, clusters partition the corpus,
    and the majority label really is a modal label of its cluster."""
    pur = QUERIES["embedding_label_purity"](spark, SF_DIR)
    rows = pur.collect()
    n_emb = t(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_emb
    for r in rows:
        assert 1 <= r.majority_n <= r.n_vectors
        assert abs(r.purity - r.majority_n / r.n_vectors) < 1e-12
    # cross-check one cluster's majority against a direct count
    assign = QUERIES["embedding_centroid_assign"](spark, SF_DIR)
    c0 = rows[0].cluster_id
    direct = (
        assign.filter(F.col("cluster_id") == c0)
        .groupBy("label")
        .count()
        .orderBy(F.desc("count"), "label")
        .first()
    )
    assert direct.label == rows[0].majority_label
    assert direct["count"] == rows[0].majority_n


def test_knn_label_accuracy_bounds(spark):
    """Scored set is the vectors with at least one same-bucket
    neighbor; per-class counts partition it; accuracy is exact."""
    from lakeview_spark.pipeline.similarity import _lsh_bucketed

    acc = QUERIES["embedding_knn_label_accuracy"](spark, SF_DIR).collect()
    idx = _lsh_bucketed(spark, SF_DIR)
    sizes = idx.groupBy("bucket").count()
    n_scored_expected = (
        idx.join(sizes, "bucket").filter(F.col("count") >= 2).count()
    )
    assert sum(r.n_scored for r in acc) == n_scored_expected
    for r in acc:
        assert 0 <= r.n_correct <= r.n_scored
        assert abs(r.accuracy - r.n_correct / r.n_scored) < 1e-12


def test_contrastive_pairs_cover_buckets(spark):
    """Each hash bucket of size s contributes exactly s-1 consecutive
    pairs; pair_type agrees with the labels; no self pairs."""
    from lakeview_spark.pipeline.labels import PAIR_BUCKET_ROWS
    from lakeview_spark.pipeline.similarity import corpus_n

    pairs = QUERIES["contrastive_pair_sample"](spark, SF_DIR)
    n = corpus_n(spark, SF_DIR)
    nb = max(1, n // PAIR_BUCKET_ROWS)
    bucket_sizes = (
        t(spark, SF_DIR, "embeddings")
        .select((F.col("vec_id") % nb).alias("bkt"))
        .groupBy("bkt")
        .count()
        .collect()
    )
    expected = sum(r["count"] - 1 for r in bucket_sizes)
    assert pairs.count() == expected
    assert pairs.filter(F.col("anchor_id") == F.col("partner_id")).count() == 0
    mislabeled = pairs.filter(
        (
            (F.col("anchor_label") == F.col("partner_label"))
            & (F.col("pair_type") != "positive")
        )
        | (
            (F.col("anchor_label") != F.col("partner_label"))
            & (F.col("pair_type") != "negative")
        )
    )
    assert mislabeled.count() == 0


def test_error_proximity_matches_bruteforce(spark):
    """The banded (user, band) equi join finds exactly the pairs a
    naive |dt| <= W range predicate finds — the band explosion loses
    nothing at the band boundaries (the claim that makes the banded
    form a valid range join)."""
    from lakeview_spark.plans.registry import events_ts_us
    from lakeview_spark.plans.tpch_extra import _PROX_US

    out = {r.event_id: r.n_nearby for r in QUERIES["events_error_proximity"](spark, SF_DIR).collect()}
    ev = t(spark, SF_DIR, "events")
    e = ev.select(
        "event_id", "user_id", events_ts_us(ev).alias("us"), "event_type"
    ).toPandas()
    errors = e[e.event_type == "error"]
    cands = e[e.event_type.isin(["click", "view"])]
    import pandas as pd  # noqa: F401

    merged = errors.merge(cands, on="user_id", suffixes=("_a", "_b"))
    merged = merged[(merged.us_b - merged.us_a).abs() <= _PROX_US]
    brute = merged.groupby("event_id_a").size().to_dict()
    assert len(out) == len(errors)
    for eid, n in out.items():
        assert n == brute.get(eid, 0), eid


def test_quality_apply_keeps_longest_per_cluster(spark):
    """dedup_apply_quality: same survivor COUNT as dedup_apply (one doc
    per cluster either way), and every cluster's survivor is at least
    as long as every member it displaced."""
    apply_min = QUERIES["dedup_apply"](spark, SF_DIR)
    apply_q = QUERIES["dedup_apply_quality"](spark, SF_DIR)
    assert apply_q.count() == apply_min.count()
    members = QUERIES["dedup_clusters"](spark, SF_DIR)
    lens = t(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    sized = members.join(lens, "doc_id")
    kept = apply_q.select("doc_id").join(sized, "doc_id").select(
        "cluster_id", F.col("n_tok").alias("kept_tok")
    )
    worst = sized.groupBy("cluster_id").agg(F.max("n_tok").alias("max_tok"))
    bad = kept.join(worst, "cluster_id").filter(
        F.col("kept_tok") != F.col("max_tok")
    )
    assert bad.count() == 0


def test_retrieval_ranks_are_contiguous_and_bucket_restricted(spark):
    """retrieval_semantic_docs: per probe, ranks run 1..min(K, bucket
    peers); every neighbor shares the probe's LSH bucket; neighbor
    metadata matches the documents table."""
    from lakeview_spark.pipeline.similarity import RETRIEVAL_K, _lsh_bucketed

    out = QUERIES["retrieval_semantic_docs"](spark, SF_DIR)
    per_probe = out.groupBy("probe_id").agg(
        F.count("*").alias("k"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
    )
    bad = per_probe.filter(
        (F.col("rmin") != 1)
        | (F.col("rmax") != F.col("k"))
        | (F.col("k") > RETRIEVAL_K)
    )
    assert bad.count() == 0
    idx = _lsh_bucketed(spark, SF_DIR).select("vec_id", "bucket")
    j = (
        out.join(idx.withColumnRenamed("vec_id", "probe_id"), "probe_id")
        .withColumnRenamed("bucket", "probe_bucket")
        .join(
            idx.withColumnRenamed("vec_id", "neighbor_doc_id"),
            "neighbor_doc_id",
        )
    )
    assert j.filter(F.col("bucket") != F.col("probe_bucket")).count() == 0
    docs = t(spark, SF_DIR, "documents").select(
        F.col("doc_id").alias("neighbor_doc_id"),
        F.col("lang").alias("d_lang"),
        F.col("source").alias("d_source"),
    )
    mism = out.join(docs, "neighbor_doc_id").filter(
        (F.col("lang") != F.col("d_lang")) | (F.col("source") != F.col("d_source"))
    )
    assert mism.count() == 0


def test_phash_twins_symmetry_and_identical_payloads(spark):
    """multimodal_phash_twins: twin counts are group sizes minus one
    (so the flagged set can never have exactly one member per hash),
    every doc appears once, and two documents with identical text get
    identical hashes."""
    out = QUERIES["multimodal_phash_twins"](spark, SF_DIR)
    n_docs = t(spark, SF_DIR, "documents").count()
    assert out.count() == n_docs
    groups = out.groupBy("phash").agg(
        F.count("*").alias("size"), F.max("n_twins").alias("mx"),
        F.min("n_twins").alias("mn"),
    )
    assert groups.filter(
        (F.col("mx") != F.col("size") - 1) | (F.col("mn") != F.col("mx"))
    ).count() == 0
    dup_texts = (
        t(spark, SF_DIR, "documents")
        .groupBy("text")
        .agg(F.count("*").alias("c"), F.countDistinct("doc_id").alias("d"))
        .filter(F.col("c") >= 2)
    )
    if dup_texts.count():
        joined = (
            t(spark, SF_DIR, "documents")
            .join(dup_texts.select("text"), "text")
            .join(out, "doc_id")
        )
        per_text = joined.groupBy("text").agg(
            F.countDistinct("phash").alias("nh")
        )
        assert per_text.filter(F.col("nh") != 1).count() == 0


def test_cms_never_underestimates(spark):
    """Count-min estimates are lower-bounded by the exact count (a
    counter only ever ADDS colliding tokens), and the probe set is the
    exact top-k."""
    from lakeview_spark.pipeline.sketch import CMS_TOP_K

    rows = QUERIES["corpus_heavy_hitters_cms"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= CMS_TOP_K
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt
        assert r.overestimate == r.cms_estimate - r.exact_cnt


def test_pivot_matrix_conserves_event_counts(spark):
    """The pivot's dense cells sum to the event count and every
    category column is present even when a cell is empty."""
    from lakeview_spark.plans.tpch_extra import _EVENT_TYPES

    out = QUERIES["events_type_hour_pivot"](spark, SF_DIR)
    assert set(_EVENT_TYPES) <= set(out.columns)
    total = out.select(
        sum(F.sum(c) for c in _EVENT_TYPES).alias("s")
    ).collect()[0]["s"]
    assert total == t(spark, SF_DIR, "events").count()


def test_disjunctive_predicates_push_into_both_scans(spark):
    """promo_disjunctive_revenue's docstring claims Catalyst extracts
    the single-side implications of the OR-of-conjunctions into each
    scan — pin it: the lineitem scan must push a quantity disjunction
    and the part scan a brand/size disjunction (a regression here means
    both sides scan everything and the OR evaluates only post-join)."""
    plan = (
        QUERIES["promo_disjunctive_revenue"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li_scan = next(s for s in scans if "lineitem" in s)
    p_scan = next(s for s in scans if "part.parquet" in s)
    assert "PushedFilters" in li_scan and "l_quantity" in li_scan.split("PushedFilters")[1]
    assert "PushedFilters" in p_scan and "p_brand" in p_scan.split("PushedFilters")[1]


def test_graph_invariants(spark):
    """Triangles and mutual edges: each triangle credits exactly 3
    corners (total participation divisible by 3); mutual degree is
    bounded by out degree; every graph vertex appears in the mutual
    report with out_degree <= k."""
    from lakeview_spark.pipeline.similarity import _KNN_K, similarity_knn_graph

    tri = QUERIES["graph_triangle_counts"](spark, SF_DIR)
    total = tri.agg(F.sum("n_triangles")).collect()[0][0]
    assert total is not None and total % 3 == 0 and total > 0
    mut = QUERIES["graph_mutual_edges"](spark, SF_DIR)
    bad = mut.filter(
        (F.col("mutual_degree") > F.col("out_degree"))
        | (F.col("out_degree") > _KNN_K)
        | (F.col("reciprocity") < 0)
        | (F.col("reciprocity") > 1)
    )
    assert bad.count() == 0
    n_sources = (
        similarity_knn_graph(spark, SF_DIR).select("src").distinct().count()
    )
    assert mut.count() == n_sources


def test_pagerank_matches_pure_python_replay(spark):
    """graph_pagerank == an independent Python replay of the integer
    mass walk at sf0.001, seeded from the (separately oracle-proven)
    materialized kNN edge list. Also pins conservation: total final
    mass <= S (damping leaks are floor-truncation and dangling mass,
    never creation)."""
    from lakeview_spark.pipeline.similarity import (
        _PR_ITERATIONS,
        _PR_SCALE,
        _PR_TOP,
        similarity_knn_graph,
    )
    from lakeview_spark.plans.registry import t as _t

    edges = [
        (r.src, r.dst) for r in similarity_knn_graph(spark, SF_DIR).collect()
    ]
    nodes = [r.vec_id for r in _t(spark, SF_DIR, "embeddings").select("vec_id").collect()]
    n = len(nodes)
    outdeg = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    indeg = {}
    for _s, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    base = (15 * _PR_SCALE) // (100 * n)
    rank = {v: _PR_SCALE // n for v in nodes}
    for _ in range(_PR_ITERATIONS):
        msgs = {}
        for s, d in edges:
            msgs[d] = msgs.get(d, 0) + rank[s] // outdeg[s]
        rank = {v: base + (85 * msgs.get(v, 0)) // 100 for v in nodes}
    assert sum(rank.values()) <= _PR_SCALE
    expected = sorted(
        ((v, r, outdeg.get(v, 0), indeg.get(v, 0)) for v, r in rank.items()),
        key=lambda x: (-x[1], x[0]),
    )[:_PR_TOP]
    got = [
        (r.vec_id, r.pagerank, r.out_degree, r.in_degree)
        for r in QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    ]
    assert got == expected
