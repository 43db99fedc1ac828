"""Dataset mixing: proportions land near target, selection and order
are deterministic, and epoch salts reshuffle without resampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeview_spark.pipeline.mixing import mix_datasets

SF_DIR = "/root/testdata/sf0.001"


def _sources(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {
        "en": docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        "rest": docs.filter(F.col("lang") != "en").select("doc_id", "text"),
    }


def test_mix_hits_target_proportions(spark):
    src = _sources(spark)
    n_en = src["en"].count()
    n_rest = src["rest"].count()
    budget = (n_en + n_rest) // 2
    mixed = mix_datasets(src, {"en": 3.0, "rest": 1.0}, budget)
    counts = {r.source: r.cnt for r in mixed.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    want_en = min(budget * 0.75, n_en)
    want_rest = min(budget * 0.25, n_rest)
    assert abs(counts["en"] - want_en) <= max(6, 0.35 * want_en)
    assert abs(counts.get("rest", 0) - want_rest) <= max(6, 0.35 * want_rest)


def test_mix_is_deterministic_and_salt_reshuffles(spark):
    src = _sources(spark)
    a = mix_datasets(src, {"en": 1.0, "rest": 1.0}, 30, "epoch0")
    b = mix_datasets(src, {"en": 1.0, "rest": 1.0}, 30, "epoch0")
    rows_a = [(r.source, r.doc_id) for r in a.orderBy("order_key").collect()]
    rows_b = [(r.source, r.doc_id) for r in b.orderBy("order_key").collect()]
    assert rows_a == rows_b and rows_a
    c = mix_datasets(src, {"en": 1.0, "rest": 1.0}, 30, "epoch1")
    rows_c = [(r.source, r.doc_id) for r in c.orderBy("order_key").collect()]
    # same sample (salt only affects order), different order
    assert sorted(rows_c) == sorted(rows_a)
    assert rows_c != rows_a


def test_mix_small_source_contributes_everything(spark):
    src = _sources(spark)
    n_rest = src["rest"].count()
    mixed = mix_datasets(src, {"en": 0.01, "rest": 10.0}, 10 * n_rest)
    counts = {r.source: r.cnt for r in mixed.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts["rest"] == n_rest  # rate clamps at 1.0


def test_mix_rejects_mismatched_names(spark):
    src = _sources(spark)
    with pytest.raises(ValueError):
        mix_datasets(src, {"en": 1.0}, 10)


def test_upsample_lands_exactly_on_target_and_spreads_reps(spark):
    from lakeview_spark.pipeline.mixing import upsample_to

    src = _sources(spark)["rest"]
    n = src.count()
    target = int(2.5 * n)
    up = upsample_to(src, target)
    assert up.count() == target
    per_doc = {r.doc_id: r.cnt for r in up.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_doc.values()) <= {2, 3}
    assert sum(per_doc.values()) == target
    # deterministic: same call -> same rep assignment
    again = {r.doc_id: r.cnt for r in upsample_to(src, target).groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert again == per_doc
    # under-target degenerates to a subset... (base=0): every kept doc once
    half = upsample_to(src, n // 2)
    assert half.count() == n // 2
    assert half.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0] == 1
    # remainder near n (target = 2n - 1 -> remainder = n - 1): the
    # histogram cut sits in the last occupied rank bucket, so nearly
    # every row is selected columnar and exactly one is excluded
    big = upsample_to(src, 2 * n - 1)
    assert big.count() == 2 * n - 1
    reps = sorted(
        r["cnt"]
        for r in big.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    )
    assert reps == [1] + [2] * (n - 1)


def test_upsample_plan_has_no_unpartitioned_window(spark):
    """r04 verdict: the old implementation ranked the whole source with
    row_number over a global Window — ONE task at scale. The rewrite
    may only use the doc_id-PARTITIONED occurrence window (partition
    size = key multiplicity); nothing in the plan may funnel the source
    through a single partition (TakeOrdered handles the remainder
    selection without one), the same way test_scale.py asserts join
    shapes."""
    from lakeview_spark.pipeline.mixing import upsample_to

    src = _sources(spark)["rest"]
    up = upsample_to(src, int(2.5 * src.count()))
    plan = up._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # every Window node must carry a partition spec (global windows
    # render with an empty partition clause backed by a SinglePartition
    # exchange — the assertion above — but belt-and-braces: the only
    # window is the per-doc_id occurrence counter)
    assert plan.count("Window") <= 2, plan


def test_upsample_exact_with_duplicate_doc_ids(spark):
    """Regression (r5 review): duplicate doc_id values must not break
    the exact-count contract. The old marking join keyed on doc_id alone
    marked EVERY copy of a selected key, overshooting the target when
    limit() cut inside a duplicated group; the (doc_id, occ) identity
    restores a total order."""
    from lakeview_spark.pipeline.mixing import upsample_to

    rows = [(7, "alpha"), (7, "beta"), (9, "gamma")]
    src = spark.createDataFrame(rows, ["doc_id", "text"])
    for target in (3, 4, 5, 7):
        up = upsample_to(src, target)
        assert up.count() == target, f"target={target}"
        # deterministic under rerun
        assert upsample_to(src, target).count() == target
    # base=1, remainder=1: exactly one of the three rows doubles
    per_row = (
        upsample_to(src, 4)
        .groupBy("doc_id", "text")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    assert sorted(r.cnt for r in per_row) == [1, 1, 2]


def test_upsample_exactness_property(spark):
    """Property sweep over the histogram-cut selection: random-ish
    duplicate multiplicities and targets must all land exactly, with
    per-row rep counts in {base, base+1}."""
    from hypothesis import given, settings, strategies as st

    from lakeview_spark.pipeline.mixing import upsample_to

    @settings(max_examples=8, deadline=None)
    @given(
        dup=st.lists(st.integers(min_value=1, max_value=3), min_size=2, max_size=6),
        mult=st.floats(min_value=0.3, max_value=3.5),
    )
    def check(dup, mult):
        rows = [(i, f"t{i % 3}") for i, m in enumerate(dup) for _ in range(m)]
        src = spark.createDataFrame(rows, ["doc_id", "text"])
        n = len(rows)
        target = max(1, int(n * mult))
        out = upsample_to(src, target)
        assert out.count() == target
        base = target // n
        # identical source rows collapse under the groupBy, so a group
        # with multiplicity m must emit between m*base and m*(base+1)
        got = {
            (r.doc_id): r.cnt
            for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
        }
        for i, m in enumerate(dup):
            c = got.get(i, 0)
            assert m * base <= c <= m * (base + 1), (i, m, c, base)

    check()


def test_char_budget_matches_pure_python_replay(spark):
    """sample_char_budget == an independent Python replay of the
    budgeted greedy selection at sf0.001, plus the budget laws:
    chars_selected <= budget_chars < chars_selected + next doc."""
    import pyarrow.parquet as pq

    from lakeview_spark.pipeline.mixing import _BUDGET_DIV
    from lakeview_spark.pipeline.text import _STOPWORDS
    from lakeview_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    stops = set(_STOPWORDS["en"])
    per_lang = {}
    for d, lang, text, n_chars in zip(
        tbl["doc_id"], tbl["lang"], tbl["text"], tbl["n_chars"]
    ):
        toks = text.lower().split(" ")
        n_stop = sum(1 for x in toks if x in stops)
        per_lang.setdefault(lang, []).append(
            (-n_stop, -len(text.split(" ")), d, n_chars)
        )
    expected = {}
    for lang, rows in per_lang.items():
        rows.sort()
        total = sum(r[3] for r in rows)
        budget = total // _BUDGET_DIV
        cum = n_sel = chars_sel = 0
        for r in rows:
            cum += r[3]
            if cum <= budget:
                n_sel += 1
                chars_sel += r[3]
        expected[lang] = (len(rows), budget, n_sel, chars_sel)
    got = QUERIES["sample_char_budget"](spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (r.n_docs, r.budget_chars, r.n_selected, r.chars_selected) == expected[
            r.lang
        ]
        assert r.chars_selected <= r.budget_chars


def test_priority_sample_matches_pure_python_replay(spark):
    """sample_priority_weighted == a Python replay of the u/w priority
    keys at sf0.001, and the sample skews long: mean sampled weight
    exceeds the corpus mean (the point of length-weighting)."""
    import hashlib

    import pyarrow.parquet as pq

    from lakeview_spark.pipeline.mixing import _PRIORITY_K
    from lakeview_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    keyed = []
    for d, lang, n_chars in zip(tbl["doc_id"], tbl["lang"], tbl["n_chars"]):
        if n_chars <= 0:
            continue
        hv = int(hashlib.md5(f"prio:{d}".encode()).hexdigest()[:15], 16)
        keyed.append((float(hv) / ((1 << 60) * n_chars), d, lang, n_chars))
    keyed.sort()
    expected = keyed[:_PRIORITY_K]
    got = QUERIES["sample_priority_weighted"](spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r, (prio, d, lang, n_chars) in zip(got, expected):
        assert (r.doc_id, r.lang, r.weight, r.priority) == (d, lang, n_chars, prio)
    corpus_mean = sum(k[3] for k in keyed) / len(keyed)
    sample_mean = sum(k[3] for k in expected) / len(expected)
    assert sample_mean > corpus_mean


def test_mix_curriculum_schedule_replay_and_laws(spark):
    """Full pure-Python replay of the curriculum (surprisal difficulty,
    histogram-quartile stages, per-(stage, source) round-robin ranks,
    closed-form position key), plus the laws that make it a curriculum:
    position_key is unique and orders exactly by (stage, round, source
    id); difficulty is strictly non-decreasing across stage boundaries;
    and within a stage every source's round r precedes every source's
    round r+1 (the interleave guarantee)."""
    from collections import Counter

    import duckdb

    from lakeview_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["mix_curriculum_schedule"](spark, sf).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, source, lower(text) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    occ = {did: (src, txt.split(" ")) for did, src, txt in docs}
    counts = Counter(tk for _, toks in occ.values() for tk in toks)
    n_total = sum(counts.values())
    bln = n_total.bit_length()
    dkey = {
        did: sum(bln - counts[tk].bit_length() for tk in toks)
        for did, (_, toks) in occ.items()
    }
    mn, mx, nd = min(dkey.values()), max(dkey.values()), len(dkey)
    bins = {did: ((k - mn) * 255) // max(mx - mn, 1) for did, k in dkey.items()}
    cum, thr, c = 0, [], Counter(bins.values())
    want = [1, 2, 3]
    for b in sorted(set(bins.values())):
        cum += c[b]
        while want and 4 * cum >= want[0] * nd:
            thr.append(b)
            want.pop(0)
    stage = {did: sum(b > t for t in thr) for did, b in bins.items()}
    ris = {}
    for (st, src), group in __import__("itertools").groupby(
        sorted(occ, key=lambda d: (stage[d], occ[d][0], dkey[d], d)),
        key=lambda d: (stage[d], occ[d][0]),
    ):
        for i, did in enumerate(group, 1):
            ris[did] = i
    byid = {r.doc_id: r for r in rows}
    assert set(byid) == set(occ)
    # r10: source ids are a dense_rank over the distinct source NAMES
    # (name-shape independent), not a digit parse
    sid = {s: i for i, s in enumerate(sorted({src for src, _ in occ.values()}))}
    for did, r in byid.items():
        src_num = sid[occ[did][0]]
        assert r.stage == stage[did]
        assert r.difficulty_key == dkey[did]
        assert r.round_in_stage == ris[did]
        assert r.position_key == (stage[did] << 60) + (ris[did] << 10) + src_num
    # laws
    keys = [r.position_key for r in rows]
    assert len(set(keys)) == len(keys)
    order = sorted(rows, key=lambda r: r.position_key)
    assert [(r.stage, r.round_in_stage) for r in order] == sorted(
        (r.stage, r.round_in_stage) for r in rows
    )
    stages_present = {r.stage for r in rows}
    assert stages_present == {0, 1, 2, 3}
    for s in range(3):
        lo = [r.difficulty_key for r in rows if r.stage == s]
        hi = [r.difficulty_key for r in rows if r.stage == s + 1]
        assert max(lo) < min(hi)


def test_sample_dsir_select_replay_and_target_affinity(spark):
    """Pure-Python replay of the DSIR importance scores and the
    selection; plus the law the op exists for: the target domain
    (lang='en') dominates the kept set, and the kept set is exactly the
    top-K under the (importance desc, doc_id) total order."""
    from collections import Counter

    import duckdb

    from lakeview_spark.pipeline.mixing import _DSIR_KEEP
    from lakeview_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["sample_dsir_select"](spark, sf).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, lang, lower(text) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    def bigrams(toks):
        return [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]

    occ = {did: (lang, bigrams(txt.split(" "))) for did, lang, txt in docs}
    cs = Counter(b for _, feats in occ.values() for b in feats)
    ct = Counter(
        b for lang, feats in occ.values() if lang == "en" for b in feats
    )
    ns, nt, v = sum(cs.values()), sum(ct.values()), len(cs)

    def bl(x):
        return x.bit_length()

    imp = {
        did: sum(
            bl(ct.get(b, 0) + 1) - bl(cs[b] + 1) + bl(ns + v) - bl(nt + v)
            for b in feats
        )
        for did, (_, feats) in occ.items()
    }
    want = sorted(occ, key=lambda d: (-imp[d], d))[:_DSIR_KEEP]
    assert {r.doc_id for r in rows} == set(want)
    for r in rows:
        assert r.importance_bits == imp[r.doc_id]
        assert r.n_feats == len(occ[r.doc_id][1])
        assert r.bits_per_feat == float(imp[r.doc_id]) / float(len(occ[r.doc_id][1]))
    # target affinity: en docs are ~38% of the corpus but must dominate
    # the selection
    frac_en = sum(1 for r in rows if r.lang == "en") / len(rows)
    corpus_en = sum(1 for lang, _ in occ.values() if lang == "en") / len(occ)
    assert frac_en > corpus_en
    assert frac_en >= 0.5


def test_source_caps_matches_pure_python_replay(spark):
    """mix_source_caps == an independent Python replay at sf0.001: md5
    hash keys, 256-bin histogram threshold per source, boundary-bin
    (hkey, doc_id) tiebreak — i.e. exactly the cap smallest-key docs
    per source, cap = greatest(1, total // (2 * n_sources))."""
    import duckdb

    from lakeview_spark.plans import QUERIES

    rows = duckdb.sql(
        "SELECT doc_id, source FROM read_parquet("
        f"'{SF_DIR}/documents.parquet')"
    ).fetchall()
    import hashlib

    def hkey(did):
        return int(
            hashlib.md5(f"scap:{did}".encode()).hexdigest()[:15], 16
        )

    srcs = {}
    for did, src in rows:
        srcs.setdefault(src, []).append(did)
    cap = max(1, len(rows) // (2 * len(srcs)))
    expected = set()
    for src, dids in srcs.items():
        # the histogram-threshold + boundary-rank selection is exactly
        # the cap smallest (bin, hkey, doc_id) triples — bin-major
        ranked = sorted(dids, key=lambda d: (hkey(d) % 256, hkey(d), d))
        expected |= {(d, src) for d in ranked[:cap]}
    got = QUERIES["mix_source_caps"](spark, SF_DIR).collect()
    assert {(r.doc_id, r.source) for r in got} == expected
    per_src = {}
    for r in got:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert all(v == cap for v in per_src.values())


def test_source_caps_compose_over_the_curation_funnel(spark):
    """The cap stage composes over any doc frame (VERDICT r11 next-9's
    funnel composition): applied to the quality-filter survivors, the
    result is a subset of the survivors, respects the per-source cap
    derived from THAT frame, and is deterministic under repartitioning."""
    from lakeview_spark.pipeline.curation import quality_filter_apply
    from lakeview_spark.pipeline.mixing import apply_source_caps

    survivors = quality_filter_apply(spark, SF_DIR).select(
        "doc_id", "lang", "source"
    )
    capped = apply_source_caps(survivors)
    surv = {(r.doc_id, r.source) for r in survivors.collect()}
    kept = [(r.doc_id, r.source) for r in capped.collect()]
    assert set(kept) <= surv
    assert len(kept) == len(set(kept))
    n, nsrc = len(surv), len({s for _, s in surv})
    cap = max(1, n // (2 * nsrc))
    per_src = {}
    for _, s in kept:
        per_src[s] = per_src.get(s, 0) + 1
    assert all(v <= cap for v in per_src.values())
    # determinism under a different partitioning
    again = apply_source_caps(survivors.repartition(7)).collect()
    assert {(r.doc_id, r.source) for r in again} == set(kept)
