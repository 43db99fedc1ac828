"""Semantic tests for the corpus-law telemetry operators
(corpus_zipf_fit, corpus_heaps_growth, corpus_snapshot_drift), the
classifier reliability diagram (eval_classifier_calibration), and the
Q9-shape profit star join — beyond the oracle-parity harness: pure
Python replays of the integer devices and the invariants each law must
satisfy."""

from __future__ import annotations

from collections import Counter

import pytest

import pyarrow.parquet as pq

from lakeview_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    return list(zip(t["doc_id"], t["lang"], t["text"]))


def test_zipf_fit_matches_python_replay(spark):
    """The whole fit — rank, bitlengths, regression sums, exponent —
    replays exactly in pure Python (the integer least-squares device)."""
    from lakeview_spark.pipeline.corpus import ZIPF_MIN_COUNT, ZIPF_RANK_CAP

    cnt: dict[str, Counter] = {}
    for _, lang, text in _docs(SF_DIR):
        cnt.setdefault(lang, Counter()).update(text.lower().split(" "))
    expect = {}
    for lang, c in cnt.items():
        head = sorted(
            ((tok, n) for tok, n in c.items() if n >= ZIPF_MIN_COUNT),
            key=lambda kv: (-kv[1], kv[0]),
        )[:ZIPF_RANK_CAP]
        xy = [
            ((rn).bit_length() - 1, n.bit_length() - 1)
            for rn, (_, n) in enumerate(head, start=1)
        ]
        n_r = len(xy)
        sx = sum(x for x, _ in xy)
        sy = sum(y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        sxx = sum(x * x for x, _ in xy)
        num, den = n_r * sxy - sx * sy, n_r * sxx - sx * sx
        expect[lang] = (n_r, sx, sy, sxy, sxx, num, den)
    rows = QUERIES["corpus_zipf_fit"](spark, SF_DIR).collect()
    assert {r.lang for r in rows} == set(expect)
    for r in rows:
        n_r, sx, sy, sxy, sxx, num, den = expect[r.lang]
        assert (r.n_ranked, r.sum_x, r.sum_y, r.sum_xy, r.sum_xx) == (
            n_r,
            sx,
            sy,
            sxy,
            sxx,
        )
        assert (r.slope_num, r.slope_den) == (num, den)
        if den > 0:
            assert abs(r.zipf_exponent - (-num / den)) < 1e-15
            # a frequency-ranked head always slopes DOWN: exponent > 0
            assert r.zipf_exponent > 0


def test_heaps_growth_matches_python_replay(spark):
    """All 8 checkpoint rows replay exactly: the doc-bucket prefix rule
    (doc_id * 8 < nd * j), per-prefix token totals, first-seen
    vocabulary counts, and the shared beta."""
    docs = _docs(SF_DIR)
    nd = max(d for d, _, _ in docs) + 1
    first_doc: dict[str, int] = {}
    doc_len: dict[int, int] = {}
    for doc_id, _, text in docs:
        toks = text.lower().split(" ")
        doc_len[doc_id] = len(toks)
        for tok in toks:
            if tok not in first_doc or doc_id < first_doc[tok]:
                first_doc[tok] = doc_id
    expect = {}
    for j in range(1, 9):
        n_docs = -(-nd * j // 8)  # ceil
        toks = sum(n for d, n in doc_len.items() if d * 8 < nd * j)
        voc = sum(1 for d in first_doc.values() if d * 8 < nd * j)
        expect[j] = (n_docs, toks, voc)
    pts = [
        (t.bit_length() - 1, v.bit_length() - 1)
        for _, t, v in expect.values()
        if t > 0 and v > 0
    ]
    n_f = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n_f * sxx - sx * sx
    beta = (n_f * sxy - sx * sy) / den if den > 0 else None
    rows = {r.j: r for r in QUERIES["corpus_heaps_growth"](spark, SF_DIR).collect()}
    assert set(rows) == set(range(1, 9))
    for j, (n_docs, toks, voc) in expect.items():
        r = rows[j]
        assert (r.n_docs_prefix, r.n_tokens_prefix, r.vocab_prefix) == (
            n_docs,
            toks,
            voc,
        )
        if beta is None:
            assert r.heaps_beta is None
        else:
            assert abs(r.heaps_beta - beta) < 1e-15
    # growth curves are monotone and end at the corpus totals
    seq = [rows[j] for j in range(1, 9)]
    assert all(
        a.vocab_prefix <= b.vocab_prefix and a.n_tokens_prefix <= b.n_tokens_prefix
        for a, b in zip(seq, seq[1:])
    )
    assert seq[-1].vocab_prefix == len(first_doc)
    assert seq[-1].n_tokens_prefix == sum(doc_len.values())


def test_snapshot_drift_matches_python_replay(spark):
    docs = _docs(SF_DIR)
    nd = max(d for d, _, _ in docs) + 1
    per_lang: dict[str, dict[str, list[int]]] = {}
    for doc_id, lang, text in docs:
        side = 0 if doc_id * 2 < nd else 1
        d = per_lang.setdefault(lang, {})
        for tok in text.lower().split(" "):
            d.setdefault(tok, [0, 0])[side] += 1
    rows = {r.lang: r for r in QUERIES["corpus_snapshot_drift"](spark, SF_DIR).collect()}
    assert set(rows) == set(per_lang)
    for lang, d in per_lang.items():
        na = sum(v[0] for v in d.values())
        nb = sum(v[1] for v in d.values())
        tv_num = sum(abs(v[0] * nb - v[1] * na) for v in d.values())
        r = rows[lang]
        assert (r.n_tokens_a, r.n_tokens_b, r.n_types) == (na, nb, len(d))
        assert r.types_only_a == sum(1 for v in d.values() if v[1] == 0)
        assert r.types_only_b == sum(1 for v in d.values() if v[0] == 0)
        assert r.tv_num == tv_num
        if na > 0 and nb > 0:
            assert abs(r.tv_distance - tv_num / (2.0 * na * nb)) < 1e-15
            assert 0.0 <= r.tv_distance <= 1.0


def test_calibration_bins_are_consistent_with_the_scored_split(spark):
    """Bin totals reconcile with the eval split, the resolution mass is
    the shared full-frame sum of the per-bin gaps, and every rate is a
    valid probability."""
    from lakeview_spark.pipeline.classifier import _clf_scored

    ev = [
        (r.y, r.score)
        for r in _clf_scored(spark, SF_MED).collect()
        if r.holdout == "eval"
    ]
    n_eval, n_pos = len(ev), sum(y for y, _ in ev)
    rows = QUERIES["eval_classifier_calibration"](spark, SF_MED).collect()
    assert rows
    assert sum(r.n_docs for r in rows) == n_eval
    assert sum(r.n_pos for r in rows) == n_pos
    assert sum(r.sum_score for r in rows) == sum(s for _, s in ev)
    res = {r.resolution_num for r in rows}
    assert res == {sum(r.gap_num for r in rows)}
    for r in rows:
        assert 0 <= r.bin <= 15
        assert 0.0 <= r.pos_rate <= 1.0
        assert abs(r.pos_rate - r.n_pos / r.n_docs) < 1e-12
        assert abs(r.resolution_l1 - r.resolution_num / (n_eval * float(n_eval))) < 1e-12
    # a discriminating model concentrates positives unevenly: the
    # resolution mass must be strictly positive
    assert rows[0].resolution_num > 0


def test_q9_profit_join_shape_and_grain(spark):
    """Q9 star join: (nation, year) grain is unique, every nation is
    real, years lie in the orders range, and line counts reconcile
    with an independent count of the filtered join."""
    import duckdb

    rows = QUERIES["supplier_profit_q9"](spark, SF_DIR).collect()
    assert rows
    assert len({(r.nation, r.o_year) for r in rows}) == len(rows)
    con = duckdb.connect()
    nations = {
        r[0]
        for r in con.sql(
            f"SELECT n_name FROM '{SF_DIR}/nation.parquet'"
        ).fetchall()
    }
    assert {r.nation for r in rows} <= nations
    expected_lines = con.sql(
        f"""
        SELECT count(*) FROM '{SF_DIR}/lineitem.parquet' l
        JOIN '{SF_DIR}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%red%'
        """
    ).fetchone()[0]
    assert sum(r.n_lines for r in rows) == expected_lines


def test_kcenter_selection_matches_python_replay(spark):
    """The FULL greedy traversal — quantization, seed, three farthest
    picks with (d DESC, vec_id) ties, final assignment with selection-
    order ties — replays exactly in pure Python."""
    import math

    from lakeview_spark.pipeline.iterative import _KC_K, _QUANT

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    qv = {
        vid: [math.floor(float(x) * _QUANT) for x in emb]
        for vid, emb in zip(t["vec_id"], t["embedding"])
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seed = min(qv)
    centers = [(0, seed)]
    dist = {vid: d2(v, qv[seed]) for vid, v in qv.items()}
    for i in range(1, _KC_K):
        far = max(qv, key=lambda vid: (dist[vid], -vid))
        centers.append((i, far))
        dist = {vid: min(dist[vid], d2(v, qv[far])) for vid, v in qv.items()}
    expect: dict[tuple[int, int], list[int]] = {}
    for vid, v in qv.items():
        best = min(
            ((d2(v, qv[cid]), order, cid) for order, cid in centers)
        )
        expect.setdefault((best[1], best[2]), []).append(best[0])
    rows = QUERIES["sample_kcenter_select"](spark, SF_DIR).collect()
    got = {(r.center_order, r.center_vec_id): r for r in rows}
    assert set(got) == set(expect)
    for key, ds in expect.items():
        r = got[key]
        assert (r.n_assigned, r.radius, r.sum_sqdist) == (
            len(ds),
            max(ds),
            sum(ds),
        )
    # the k-center objective is non-degenerate: >1 center selected and
    # every point is covered
    assert len(rows) > 1
    assert sum(r.n_assigned for r in rows) == len(qv)


def test_q14_share_reconciles_with_unconditional_totals(spark):
    rows = QUERIES["promo_type_share_q14"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.promo_revenue <= r.total_revenue + 1e-9
        if r.promo_share_pct is not None:
            assert abs(
                r.promo_share_pct - 100.0 * r.promo_revenue / r.total_revenue
            ) < 1e-9


def test_drift_twin_buckets_literal_matches_corpus_constant():
    """The twin's literal bucket count must track
    pipeline.corpus.DRIFT_BUCKETS (the circular-import literal device —
    same pin as the funnel constants)."""
    from lakeview_spark.pipeline.corpus import DRIFT_BUCKETS
    from lakeview_spark.plans.streaming_twins import _DRIFT_BUCKETS_TWIN

    assert _DRIFT_BUCKETS_TWIN == DRIFT_BUCKETS


def test_stream_drift_windows_fold_to_the_batch_reference(spark):
    """Stream-vs-batch consistency: the window histograms union to the
    whole corpus, so summing every window's n_win per lang must equal
    the published reference total n_ref — the live monitor and the
    batch publisher cannot disagree on the distribution they compare."""
    from collections import defaultdict

    rows = QUERIES["stream_drift_monitor"](spark, SF_DIR).collect()
    assert rows
    per_lang = defaultdict(int)
    n_ref = {}
    for r in rows:
        per_lang[r.lang] += r.n_win
        n_ref[r.lang] = r.n_ref
        assert r.tv_num >= 0
        if r.tv_distance is not None:
            assert 0.0 <= r.tv_distance <= 1.0
    assert per_lang == n_ref


def test_stream_drift_flags_a_lang_missing_from_the_reference(spark):
    """ADVICE r11: a lang with NO reference row — a genuinely new
    language at ingestion, the strongest possible drift signal — must
    not report silently-NULL drift. The live operator (driven here with
    a reference that deliberately drops one lang) emits
    ref_missing = true and tv_distance = 1.0 for that lang's windows,
    NULL n_ref/tv_num (no numerator exists), and the covered langs are
    byte-identical to the full-reference run."""
    from lakeview_spark.pipeline.corpus import drift_reference
    from lakeview_spark.plans.streaming_twins import (
        _DRIFT_BUCKETS_TWIN,
        _doc_stream,
        _run_available_now,
    )
    from lakeview_spark.streaming.pipeline_stream import stream_drift_monitor

    from pyspark.sql import functions as F

    full_ref = drift_reference(spark, SF_DIR, buckets=_DRIFT_BUCKETS_TWIN)
    langs = sorted(r.lang for r in full_ref.select("lang").distinct().collect())
    assert len(langs) >= 2
    dropped = langs[0]
    rows = _run_available_now(
        stream_drift_monitor(
            _doc_stream(spark, SF_DIR),
            full_ref.filter(F.col("lang") != dropped),
            buckets=_DRIFT_BUCKETS_TWIN,
        ),
        "update",
    ).collect()
    missing = [r for r in rows if r.lang == dropped]
    covered = [r for r in rows if r.lang != dropped]
    assert missing and covered
    for r in missing:
        assert r.ref_missing is True
        assert r.tv_distance == 1.0
        assert r.n_ref is None and r.tv_num is None
    # the registered twin reports unix micros (session TZ pinned UTC,
    # Python datetimes tz-naive — normalize via timegm)
    import calendar

    full = {
        (r.lang, r.window_start_us): (r.n_win, r.n_ref, r.tv_num, r.tv_distance)
        for r in QUERIES["stream_drift_monitor"](spark, SF_DIR).collect()
        if r.lang != dropped
    }
    for r in covered:
        assert r.ref_missing is False
        key_us = calendar.timegm(r.window_start.timetuple()) * 1_000_000
        got = full[(r.lang, key_us)]
        assert (r.n_win, r.n_ref, r.tv_num, r.tv_distance) == got


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_symspell_pairs_equal_the_brute_force_truth(spark):
    """The deletion-neighborhood join must find EXACTLY the edit-
    distance<=1 pairs a brute-force O(V^2) Levenshtein sweep finds —
    lossless candidate generation (no false negatives) and a correct
    verify (no false positives)."""
    from collections import Counter

    from lakeview_spark.pipeline.dedup import SYMSPELL_MIN_LEN

    cnt: Counter = Counter()
    for _, _, text in _docs(SF_DIR):
        cnt.update(
            tok for tok in text.lower().split(" ") if len(tok) >= SYMSPELL_MIN_LEN
        )
    vocab = sorted(cnt)
    truth = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if _levenshtein(a, b) <= 1
    }
    rows = QUERIES["dedup_symspell_pairs"](spark, SF_DIR).collect()
    got = {(r.tok_a, r.tok_b) for r in rows}
    assert got == truth
    for r in rows:
        assert r.edit_distance == 1  # a < b excludes ed = 0
        assert (r.c_a, r.c_b) == (cnt[r.tok_a], cnt[r.tok_b])


def test_market_basket_invariants(spark):
    """Support/confidence/lift arithmetic reconciles and the report
    order is the documented all-integer total order."""
    rows = QUERIES["orders_market_basket"](spark, SF_MED).collect()
    assert rows
    keys = [(-r.pair_orders, r.part_a, r.part_b) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.part_a < r.part_b
        assert 2 <= r.pair_orders <= min(r.orders_a, r.orders_b)
        assert max(r.orders_a, r.orders_b) <= r.n_orders
        assert abs(r.confidence_a_to_b - r.pair_orders / r.orders_a) < 1e-15
        assert abs(
            r.lift - (r.pair_orders * r.n_orders) / (r.orders_a * r.orders_b)
        ) < 1e-12


def test_budget_plan_matches_python_replay(spark):
    """Exact-integer replay of the whole plan: isqrt weights, windowed
    totals, integer-division targets, capped epochs, shortfall."""
    import math

    from collections import Counter

    from lakeview_spark.pipeline.mixing import MIX_EPOCH_CAP

    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    avail: Counter = Counter()
    for source, text in zip(t["source"], t["text"]):
        avail[source] += len(text.lower().split(" "))
    weights = {s: math.isqrt(a) for s, a in avail.items()}
    total_w = sum(weights.values())
    budget = sum(avail.values()) // 2
    rows = {r.source: r for r in QUERIES["mix_budget_plan"](spark, SF_DIR).collect()}
    assert set(rows) == set(avail)
    planned_total = 0
    for s, a in avail.items():
        r = rows[s]
        target = budget * weights[s] // max(total_w, 1)
        planned = min(target, MIX_EPOCH_CAP * a)
        assert (r.avail, r.weight, r.budget, r.target) == (
            a,
            weights[s],
            budget,
            target,
        )
        assert r.epochs == min(-(-target // max(a, 1)), MIX_EPOCH_CAP)
        assert (r.planned, r.shortfall) == (planned, target - planned)
        assert abs(r.upsample_factor - planned / a) < 1e-15
        planned_total += planned
    # the plan never allocates more than the budget
    assert planned_total <= budget


def test_collocations_pmi_matches_python_replay(spark):
    """The full extraction — directional marginals, exact ratio
    integers, the (pmi_ratio DESC, keys) top-32 — replays in Python."""
    from collections import Counter

    from lakeview_spark.pipeline.corpus import PMI_MIN_SUPPORT, PMI_TOP

    cxy: Counter = Counter()
    n_pairs = 0
    for _, _, text in _docs(SF_DIR):
        ts = text.lower().split(" ")
        n_pairs += max(len(ts) - 1, 0)
        cxy.update(zip(ts, ts[1:]))
    cl, cr = Counter(), Counter()
    for (x, y), c in cxy.items():
        cl[x] += c
        cr[y] += c
    scored = [
        (
            (c * n_pairs) / (cl[x] * cr[y]),
            x,
            y,
            c,
            cl[x],
            cr[y],
            c * n_pairs,
            cl[x] * cr[y],
            (c * n_pairs).bit_length() - (cl[x] * cr[y]).bit_length(),
        )
        for (x, y), c in cxy.items()
        if c >= PMI_MIN_SUPPORT
    ]
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    expect = scored[:PMI_TOP]
    rows = QUERIES["corpus_collocations_pmi"](spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r, e in zip(rows, expect):
        assert (r.tok_x, r.tok_y, r.pair_count) == (e[1], e[2], e[3])
        assert (r.left_count, r.right_count, r.n_pairs) == (e[4], e[5], n_pairs)
        assert (r.ratio_num, r.ratio_den, r.pmi_bits) == (e[6], e[7], e[8])
        assert abs(r.pmi_ratio - e[0]) < 1e-15


def test_conductance_reconciles_with_modularity_census(spark):
    """Conductance and modularity audit the SAME partition: shared
    communities and member counts; cut + internal endpoints = volume;
    volumes sum to the total directed edge count; phi in [0, 1]."""
    mod = {
        r.community: r
        for r in QUERIES["eval_community_modularity"](spark, SF_MED).collect()
    }
    con = {
        r.community: r
        for r in QUERIES["eval_community_conductance"](spark, SF_MED).collect()
    }
    assert set(mod) == set(con)
    vol_total = sum(r.volume for r in con.values())
    for cid, r in con.items():
        m = mod[cid]
        assert r.n_members == m.n_members
        assert r.volume == m.degree_sum
        # internal directed endpoints = 2 * intra_edges
        assert r.cut_edges == r.volume - 2 * m.intra_edges
        if r.conductance is not None:
            assert 0.0 <= r.conductance <= 1.0
            assert abs(
                r.conductance
                - r.cut_edges / min(r.volume, vol_total - r.volume)
            ) < 1e-15


def test_lsh_scurve_is_a_transfer_function(spark):
    """Bucket grain, count reconciliation against the single-point
    precision/recall audit, and the S shape's defining endpoints: the
    top decile must detect (near-)everything, the bottom decile must
    detect (near-)nothing."""
    rows = sorted(
        QUERIES["eval_lsh_scurve"](spark, SF_MED).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    pr = QUERIES["eval_lsh_precision_recall"](spark, SF_MED).collect()[0]
    assert sum(r.detected for r in rows) == pr.predicted_pairs
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert abs(r.jaccard_lo - r.bucket / 10.0) < 1e-15
        assert 0 <= r.detected <= r.n_pairs
        assert abs(r.detection_rate - r.detected / r.n_pairs) < 1e-15
    lo, hi = rows[0], rows[-1]
    assert lo.bucket == 0 and lo.detection_rate <= 0.2
    assert hi.bucket >= 5 and hi.detection_rate >= 0.8


@pytest.mark.slow
def test_nprobe_sweep_is_monotone_and_pins_the_composed_search(spark):
    """The sweep's defining laws: recall and candidate cost are
    nondecreasing in nprobe, and the nprobe = max point's hit count
    reconciles with the composed search similarity_ann_ivf_pq (its
    top-10 intersected with the same exact truth) — one candidate
    pool, never a divergent re-search."""
    from lakeview_spark.pipeline.similarity import (
        _PQ_RECALL_TOP,
        _k_for_n,
        _nprobe_for_k,
        _nprobe_grid,
        corpus_n,
    )

    rows = sorted(
        QUERIES["eval_ivfpq_nprobe_sweep"](spark, SF_MED).collect(),
        key=lambda r: r.nprobe,
    )
    np_max = _nprobe_for_k(_k_for_n(corpus_n(spark, SF_MED)))
    assert [r.nprobe for r in rows] == list(_nprobe_grid(np_max))
    for a, b in zip(rows, rows[1:]):
        assert a.total_candidates <= b.total_candidates
        assert a.total_hits <= b.total_hits
        assert a.n_probes == b.n_probes
    for r in rows:
        assert 0 <= r.total_hits <= r.n_probes * _PQ_RECALL_TOP
        assert abs(
            r.mean_recall - r.total_hits / (r.n_probes * _PQ_RECALL_TOP)
        ) < 1e-15
    # reconcile the max-nprobe point against the composed search: same
    # pool, same ranking -> the emitted top-10 sets coincide
    search = QUERIES["similarity_ann_ivf_pq"](spark, SF_MED).collect()
    top = {(r.probe_id, r.vec_id) for r in search}
    # recompute exact quantized truth via the rq audit's truth columns:
    # every truth hit the sweep counts at np=max must be a search result
    from lakeview_spark.pipeline.iterative import _kq_sqdist
    from lakeview_spark.pipeline.similarity import (
        _PQ_PROBE_TARGET,
        _pq_emb,
        corpus_n,
    )
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    n = corpus_n(spark, SF_MED)
    stride = max(1, n // _PQ_PROBE_TARGET)
    emb = _pq_emb(spark, SF_MED)
    probes = emb.filter((F.col("vec_id") % stride) == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )
    w = _W.partitionBy("probe_id").orderBy("full_dist", "vec_id")
    truth = {
        (r.probe_id, r.vec_id)
        for r in emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", _kq_sqdist("qv", "pqv").alias("full_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_RECALL_TOP)
        .select("probe_id", "vec_id")
        .collect()
    }
    assert rows[-1].total_hits == len(top & truth)


def test_rfm_segments_match_python_replay(spark):
    """Exact replay of the whole RFM device: per-customer measures,
    256-bin histograms, division-free quartile thresholds, the three
    bin compares, and the segment rollup."""
    import duckdb

    from lakeview_spark.plans.tpch_extra import RFM_BINS

    con = duckdb.connect()
    cust = con.sql(f"""
        SELECT o_custkey,
               CAST(date_diff('day', max(o_orderdate),
                    (SELECT max(o_orderdate)
                     FROM '{SF_DIR}/orders.parquet')) AS BIGINT) AS rec,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS mon
        FROM '{SF_DIR}/orders.parquet' GROUP BY o_custkey
    """).fetchall()
    assert cust

    def scores(vals):
        mn, mx, n = min(vals), max(vals), len(vals)
        bins = sorted({(v - mn) * (RFM_BINS - 1) // max(mx - mn, 1) for v in vals})
        from collections import Counter

        bc = Counter(
            (v - mn) * (RFM_BINS - 1) // max(mx - mn, 1) for v in vals
        )
        cum, cumc, thr = 0, {}, {}
        for b in bins:
            cum += bc[b]
            cumc[b] = cum
        for q in (1, 2, 3):
            thr[q] = min(b for b in bins if 4 * cumc[b] >= q * n)
        out = []
        for v in vals:
            b = (v - mn) * (RFM_BINS - 1) // max(mx - mn, 1)
            out.append(sum(1 for q in (1, 2, 3) if b > thr[q]))
        return out

    recs = scores([r[1] for r in cust])
    freqs = scores([r[2] for r in cust])
    mons = scores([r[3] for r in cust])
    from collections import defaultdict

    seg = defaultdict(lambda: [0, 0])
    for (ck, rec, fq, mn_), ra, fa, ma in zip(cust, recs, freqs, mons):
        key = (4 - ra, 1 + fa, 1 + ma)
        seg[key][0] += 1
        seg[key][1] += mn_
    rows = QUERIES["customer_rfm_segments"](spark, SF_DIR).collect()
    got = {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, r.total_monetary_cents)
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in seg.items()}
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
        assert abs(
            r.avg_monetary_cents - r.total_monetary_cents / r.n_customers
        ) < 1e-9


def test_markov_transitions_matrix_laws(spark):
    """Row-stochastic structure: every from-state's probabilities sum
    to 1; _start_ transitions equal session count; _end_ arrivals equal
    session count; total in-session transitions reconcile with event
    and session counts (|transitions| = n_events - n_sessions)."""
    import duckdb

    from collections import defaultdict

    rows = QUERIES["events_markov_transitions"](spark, SF_MED).collect()
    assert rows
    by_from = defaultdict(float)
    n_by_from = defaultdict(int)
    for r in rows:
        by_from[r.from_type] += r.prob
        n_by_from[r.from_type] += r.n_transitions
        assert r.from_total == sum(
            x.n_transitions for x in rows if x.from_type == r.from_type
        )
    for f, s in by_from.items():
        assert abs(s - 1.0) < 1e-9, f
    starts = n_by_from["_start_"]
    ends = sum(r.n_transitions for r in rows if r.to_type == "_end_")
    assert starts == ends  # every session that starts, ends
    con = duckdb.connect()
    n_events = con.sql(
        f"SELECT count(*) FROM '/root/testdata/sf0.01/events.parquet'"
    ).fetchone()[0]
    # rows from seq = n_events (each event emits exactly one from-row)
    assert sum(
        r.n_transitions for r in rows if r.from_type != "_start_"
    ) == n_events


def test_q2_cheapest_supplier_matches_independent_replay(spark):
    """Q2 argmin-lookup: each reported part appears once, the
    (unit_cents, suppkey)-argmin and the EUROPE region restriction
    replay exactly in an independent DuckDB computation, and the
    report order is the all-integer (unit_cost_cents, p_partkey)."""
    import duckdb

    rows = QUERIES["cheapest_supplier_q2"](spark, SF_DIR).collect()
    assert rows
    assert len({r.p_partkey for r in rows}) == len(rows)
    keys = [(r.unit_cost_cents, r.p_partkey) for r in rows]
    assert keys == sorted(keys)
    con = duckdb.connect()
    expected = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            f"""
            WITH eu AS (
              SELECT s_suppkey, s_name, n_name
              FROM '{SF_DIR}/supplier.parquet'
              JOIN '{SF_DIR}/nation.parquet' ON n_nationkey = s_nationkey
              JOIN '{SF_DIR}/region.parquet' ON r_regionkey = n_regionkey
              WHERE r_name = 'EUROPE'),
            unit AS (
              SELECT l_partkey, s_name, n_name,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) // CAST(l_quantity AS BIGINT) AS uc,
                     l_suppkey
              FROM '{SF_DIR}/lineitem.parquet' JOIN eu ON s_suppkey = l_suppkey)
            SELECT l_partkey, uc, s_name, n_name FROM (
              SELECT *, row_number() OVER (PARTITION BY l_partkey
                                           ORDER BY uc, l_suppkey) AS rn
              FROM unit) WHERE rn = 1
            """
        ).fetchall()
    }
    for r in rows:
        uc, sn, nn = expected[r.p_partkey]
        assert r.unit_cost_cents == uc
        assert (r.supplier, r.nation) == (sn, nn)
        assert r.p_type == "STANDARD"


def test_q20_dominance_threshold_replays_exactly(spark):
    """Q20 threshold semi-join: every reported supplier's dominated
    parts satisfy the strict 8*qty_sp > qty_p rule (the 1/8
    concentration threshold) in an independent DuckDB replay,
    counts/quantities reconcile, and no dominating (supplier, part)
    pair is missed."""
    import duckdb
    from collections import defaultdict

    rows = QUERIES["promo_stock_suppliers_q20"](spark, SF_DIR).collect()
    assert rows
    con = duckdb.connect()
    pairs = con.sql(
        f"""
        WITH sp AS (
          SELECT l_suppkey, l_partkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          FROM '{SF_DIR}/lineitem.parquet'
          JOIN '{SF_DIR}/part.parquet' ON p_partkey = l_partkey
          WHERE p_type = 'PROMO' GROUP BY 1, 2)
        SELECT s_name, n_name, q FROM sp
        JOIN '{SF_DIR}/supplier.parquet' ON s_suppkey = l_suppkey
        JOIN '{SF_DIR}/nation.parquet' ON n_nationkey = s_nationkey
        WHERE 8 * q > (SELECT sum(q) FROM sp i WHERE i.l_partkey = sp.l_partkey)
        """
    ).fetchall()
    expect = defaultdict(lambda: [0, 0])
    for sn, nn, q in pairs:
        expect[(sn, nn)][0] += 1
        expect[(sn, nn)][1] += q
    got = {(r.supplier, r.nation): (r.n_dominated_parts, r.dominated_qty) for r in rows}
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_attribution_walk_replays_from_the_registered_matrix(spark):
    """events_attribution_markov's integer walk replays exactly from
    the REGISTERED transition matrix's counts (an independent path:
    the matrix query output, not the shared helper — catching drift
    between the two), the channel literals pin to the data's
    non-conversion event types, every removal can only lose
    conversion mass, and shares normalize."""
    from lakeview_spark.plans.tpch_extra import (
        _ATTR_CHANNELS,
        _ATTR_CONV,
        _ATTR_MASS,
        _ATTR_STEPS,
    )

    mat = QUERIES["events_markov_transitions"](spark, SF_DIR).collect()
    cnt = {(r.from_type, r.to_type): r.n_transitions for r in mat}
    tot = {}
    for (u, _v), n in cnt.items():
        tot[u] = tot.get(u, 0) + n
    types = {u for u, _ in cnt} | {v for _, v in cnt}
    assert set(_ATTR_CHANNELS) == types - {_ATTR_CONV, "_start_", "_end_"}

    def walk(absorbing):
        conv, moving = 0, {"_start_": _ATTR_MASS}
        for _ in range(_ATTR_STEPS):
            nxt = {}
            for u, mu in moving.items():
                if u in absorbing or u not in tot:
                    continue
                for (uu, v), n in cnt.items():
                    if uu == u:
                        nxt[v] = nxt.get(v, 0) + mu * n // tot[u]
            conv += nxt.get(_ATTR_CONV, 0)
            moving = {v: m for v, m in nxt.items() if v not in absorbing}
        return conv

    base = walk({_ATTR_CONV, "_end_"})
    rows = {r.channel: r for r in QUERIES["events_attribution_markov"](spark, SF_DIR).collect()}
    assert set(rows) == set(_ATTR_CHANNELS)
    assert 0 < base <= _ATTR_MASS
    deltas = []
    for ch, r in rows.items():
        assert r.conv_base == base
        assert r.conv_removed == walk({_ATTR_CONV, "_end_", ch})
        assert r.removed_delta == r.conv_base - r.conv_removed
        assert 0 <= r.conv_removed <= r.conv_base
        deltas.append(r.removed_delta)
        assert abs(r.removal_effect - r.removed_delta / base) < 1e-15
    total = sum(deltas)
    if total > 0:
        assert abs(sum(r.attribution_share for r in rows.values()) - 1.0) < 1e-12


@pytest.mark.slow
def test_mmr_diversity_audit_reconciles_with_the_stage(spark):
    """The audit's sets reconcile with the registered rerank (mmr sums
    = sums over retrieval_mmr_rerank's exact distances), plain never
    beats MMR on min-pairwise diversity in aggregate (the stage's
    reason to exist), and relevance_cost >= 0 (pure-relevance top-k is
    the distance optimum by construction)."""
    rows = QUERIES["eval_mmr_diversity"](spark, SF_DIR).collect()
    assert rows
    sel = {}
    for r in QUERIES["retrieval_mmr_rerank"](spark, SF_DIR).collect():
        sel.setdefault(r.probe_id, []).append(r.exact_dist)
    for r in rows:
        assert r.mmr_sum_dist == sum(sel[r.probe_id])
        assert r.n_sel == len(sel[r.probe_id])
        assert r.relevance_cost is None or r.relevance_cost >= 0.0
        assert 0 < r.plain_min_pair <= r.plain_sum_pair
        assert 0 < r.mmr_min_pair <= r.mmr_sum_pair
    # aggregate laws (a PER-probe gain >= 1 is NOT guaranteed: the 2:1
    # relevance weighting can trade a slightly tighter pair for much
    # better relevance on probes whose nearest-k is already spread):
    # diversification must buy diversity somewhere, and on average
    assert any(r.mmr_min_pair > r.plain_min_pair for r in rows)
    assert sum(r.mmr_min_pair for r in rows) > sum(
        r.plain_min_pair for r in rows
    )


def test_stream_source_caps_twin_oracle_pins_to_the_batch_oracle():
    """The twin's literal oracle must stay IDENTICAL (modulo
    whitespace) to the batch mix_source_caps oracle — the
    literal-constant device's pin (importing pipeline.mixing at
    streaming_twins module scope re-enters half-initialized pipeline
    on the `import lakeview_spark.pipeline` path)."""
    import re

    from lakeview_spark.plans.registry import ORACLES

    norm = lambda s: re.sub(r"\s+", " ", s).strip()  # noqa: E731
    assert norm(ORACLES["stream_source_caps"]) == norm(
        ORACLES["mix_source_caps"]
    )


def test_stream_source_caps_equals_the_batch_selection(spark):
    """One AvailableNow batch covering the corpus admits EXACTLY the
    batch operator's selection — the stream/batch shared-statement
    rule, checked row-for-row."""
    batch = {
        (r.doc_id, r.source)
        for r in QUERIES["mix_source_caps"](spark, SF_DIR).collect()
    }
    live = {
        (r.doc_id, r.source)
        for r in QUERIES["stream_source_caps"](spark, SF_DIR).collect()
    }
    assert live == batch
