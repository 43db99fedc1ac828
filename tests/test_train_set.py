"""pipeline_train_set: the composed funnel equals running the
registered stages in order (the r9 VERDICT next-5 'Done' criterion),
plus the funnel-monotonicity law."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakeview_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from lakeview_spark.session import get_spark

    return get_spark()


def test_train_set_funnel_is_monotone(spark):
    """Each stage can only shrink: raw >= quality >= dedup >= decontam
    >= selected per language, and the packed mass is exactly the
    selected docs' token mass."""
    rows = QUERIES["pipeline_train_set"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r.docs_raw
            >= r.docs_quality
            >= r.docs_dedup
            >= r.docs_decontam
            >= r.docs_selected
            >= 0
        )
        if r.docs_selected == 0:
            assert r.chars_selected == r.tokens_packed == r.n_sequences == 0
        else:
            assert r.n_sequences >= 1
            assert r.tokens_packed > 0


def test_train_set_equals_stage_by_stage_composition(spark):
    """Running the REGISTERED stage queries one at a time and composing
    their outputs by doc_id — then replaying selection + packing in
    pure Python — reproduces the composed query's every number."""
    from lakeview_spark.pipeline.mixing import _BUDGET_DIV
    from lakeview_spark.pipeline.packing import SEQ_BUDGET
    from lakeview_spark.pipeline.text import _STOPWORDS

    q1 = {r.doc_id for r in QUERIES["quality_filter_apply"](spark, SF_DIR).collect()}
    kept2 = {r.doc_id for r in QUERIES["dedup_apply_quality"](spark, SF_DIR).collect()}
    q2 = q1 & kept2
    det = {
        r.doc_id: (r.matched_shingles, r.n_shingles)
        for r in QUERIES["contamination_ngram_overlap"](spark, SF_DIR).collect()
    }
    # detect only scores non-probe docs with shingles; a q2 doc absent
    # from the detect table is a probe doc or shingle-less and drops
    q3 = {
        d
        for d in q2
        if d in det and 10 * det[d][0] < det[d][1]
    }

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    docs = {
        d: (lang, n_chars, text)
        for d, lang, n_chars, text in zip(
            tbl["doc_id"], tbl["lang"], tbl["n_chars"], tbl["text"]
        )
    }
    stops = set(_STOPWORDS["en"])
    by_lang: dict[str, list[tuple[int, int, int, int]]] = {}
    for d in q3:
        lang, n_chars, text = docs[d]
        toks = text.split(" ")
        n_stop = sum(1 for w in text.lower().split(" ") if w in stops)
        by_lang.setdefault(lang, []).append((d, int(n_chars), n_stop, len(toks)))
    selected: dict[str, list[tuple[int, int, int]]] = {}
    for lang, items in by_lang.items():
        budget = sum(c for _d, c, _s, _t in items) // _BUDGET_DIV
        cum = 0
        for d, c, _s, ntok in sorted(items, key=lambda x: (-x[2], -x[3], x[0])):
            if cum < budget:  # cum_chars - own < budget
                selected.setdefault(lang, []).append((d, c, ntok))
            cum += c
    expected = {}
    for lang in {docs[d][0] for d in docs}:
        sel = selected.get(lang, [])
        cum = 0
        seqs = set()
        for _d, _c, ntok in sorted(sel):
            seqs.add(cum // SEQ_BUDGET)
            cum += ntok
        langs_docs = [d for d in docs if docs[d][0] == lang]
        expected[lang] = (
            len(langs_docs),
            len([d for d in langs_docs if d in q1]),
            len([d for d in langs_docs if d in q2]),
            len([d for d in langs_docs if d in q3]),
            len(sel),
            sum(c for _d, c, _t in sel),
            sum(t for _d, _c, t in sel),
            len(seqs),
        )
    got = QUERIES["pipeline_train_set"](spark, SF_DIR).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (
            r.docs_raw,
            r.docs_quality,
            r.docs_dedup,
            r.docs_decontam,
            r.docs_selected,
            r.chars_selected,
            r.tokens_packed,
            r.n_sequences,
        ) == expected[r.lang], r.lang


def test_train_set_paragraph_flag_invariants(spark):
    """paragraph_filter=True (r13): stages 1-3 are untouched; stages
    4-5 measure the kept-paragraph reassembly, so per-language selected
    char mass never exceeds the flag-off selection's raw-text budget
    base and the filtered token counts are <= the raw ones per doc."""
    from lakeview_spark.pipeline.train_set import pipeline_train_set

    off = {r["lang"]: r.asDict() for r in pipeline_train_set(spark, SF_DIR).collect()}
    on = {
        r["lang"]: r.asDict()
        for r in pipeline_train_set(spark, SF_DIR, paragraph_filter=True).collect()
    }
    assert set(on) == set(off)
    for lang, o in on.items():
        f = off[lang]
        # stages 1-3 identical: the paragraph stage sits after decontam
        for col in ("docs_raw", "docs_quality", "docs_dedup", "docs_decontam"):
            assert o[col] == f[col], (lang, col)
        # filtered text is a subset of raw text, so the 1/BUDGET_DIV
        # selected char mass can only shrink or hold
        assert o["chars_selected"] <= f["chars_selected"] + 1, lang
        assert o["docs_selected"] >= 0 and o["n_sequences"] >= 0


def test_paragraph_apply_reassembles_kept_windows(spark):
    """text_paragraph_apply: filtered_text is exactly the in-order
    concatenation of the doc's kept 16-token windows; tail-bucket
    windows are dropped; unscored (<2-token) windows are kept."""
    from lakeview_spark.pipeline.text import _PARA_TOKENS

    ppl = QUERIES["text_paragraph_ppl"](spark, SF_DIR).collect()
    tail = {(r.doc_id, r.para_idx) for r in ppl if r.bucket == "tail"}
    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    out = {r.doc_id: r for r in QUERIES["text_paragraph_apply"](spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for doc_id, toks in docs.items():
        paras = [
            toks[i : i + _PARA_TOKENS] for i in range(0, len(toks), _PARA_TOKENS)
        ]
        kept = [
            " ".join(p)
            for i, p in enumerate(paras)
            if (doc_id, i) not in tail
        ]
        r = out[doc_id]
        assert r.n_paras == len(paras)
        assert r.kept_paras == len(kept)
        assert r.filtered_text == " ".join(kept)


def test_paragraph_buckets_are_terciles_by_value_threshold(spark):
    """Buckets come from value thresholds over the score histogram:
    every paragraph with the same quantized score shares a bucket, the
    bucket boundaries are the minimal scores whose cumulative count
    crosses n/3 and 2n/3, and bucket order respects score order."""
    rows = QUERIES["text_paragraph_ppl"](spark, SF_DIR).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.s)
    assert set(by_bucket) <= {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    n = len(rows)
    # threshold rule: head holds at least a third (ties spill INTO head)
    assert 3 * len(by_bucket["head"]) >= n
    assert 3 * (len(by_bucket["head"]) + len(by_bucket["middle"])) >= 2 * n


def test_ppl_price_components_fit_the_stream_gate_packing(spark):
    """Pin the structural ranges of the trained per-token price table
    (q1 = 3*(bl(c+v)-1) <= 186, q2 = bl(n+v)-bl(c+1) <= 63) that
    stream_paragraph_gate's broadcast price joins rely on — a future
    LM-formula change that widens either component should fail here
    loudly instead of silently skewing the gate's scores."""
    from lakeview_spark.operators.materialize import materialized
    from lakeview_spark.pipeline.text import _ppl_prices_build

    prices = materialized(spark, "ppl_prices", SF_DIR, _ppl_prices_build)
    row = prices.agg(
        F.max("q1").alias("q1"), F.max("q2").alias("q2"),
        F.min("q1").alias("q1min"), F.min("q2").alias("q2min"),
    ).collect()[0]
    # structural: q1 = 3*(bl(c+v)-1) <= 3*62, q2 = bl(n+v)-bl(c+1) <= 63
    assert 0 <= row.q1min and row.q1 <= 186
    assert 0 <= row.q2min and row.q2 <= 63


def test_paragraph_retention_composes_with_apply_kept_counts(spark):
    """eval_paragraph_retention x text_paragraph_apply identity (the
    VERDICT r13 next-5 composed check): per language, the retained
    (head/middle) buckets' paragraph counts plus the unscored-kept
    remainder (paragraphs with < 2 tokens never enter the score table
    and apply always keeps them) must equal apply's kept_paras total —
    and the tail bucket is exactly the dropped count. Also pins the
    share columns as exact within-lang fractions."""
    ret = QUERIES["eval_paragraph_retention"](spark, SF_DIR).collect()
    apply_rows = QUERIES["text_paragraph_apply"](spark, SF_DIR).collect()

    scored = {}
    retained = {}
    for r in ret:
        scored[r.lang] = scored.get(r.lang, 0) + r.n_paras
        if r.retained:
            assert r.bucket in ("head", "middle")
            retained[r.lang] = retained.get(r.lang, 0) + r.n_paras
        else:
            assert r.bucket == "tail"
    total = {}
    kept = {}
    for r in apply_rows:
        total[r.lang] = total.get(r.lang, 0) + r.n_paras
        kept[r.lang] = kept.get(r.lang, 0) + r.kept_paras
    assert set(scored) <= set(total)
    for lang in scored:
        unscored_kept = total[lang] - scored[lang]
        assert kept[lang] == retained[lang] + unscored_kept, lang

    by_lang = {}
    for r in ret:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        n = sum(r.n_paras for r in rows)
        b = sum(r.n_bigrams for r in rows)
        for r in rows:
            assert r.para_share == r.n_paras / n, lang
            assert r.bigram_share == r.n_bigrams / b, lang
