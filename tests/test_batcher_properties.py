"""Property-based batcher tests: invariants that must hold for ANY
timeline (hypothesis-generated), complementing the table-driven cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from lakeview_spark.operators.batcher import (
    BLOCK,
    CONTINUE,
    create_batches,
    parse_instant,
)

ACTIONS = ["commit", "deltacommit", "clean", "compaction", "replacecommit"]


@st.composite
def timelines(draw):
    """Random mix of complete triples, savepoint/rollback pairs, lone
    rollbacks, incomplete groups, junk actions, and hoodie.properties."""
    n_groups = draw(st.integers(1, 12))
    names: list[str] = []
    used_ts = draw(
        st.lists(
            st.integers(100, 999), min_size=n_groups, max_size=n_groups, unique=True
        )
    )
    for ts in used_ts:
        kind = draw(
            st.sampled_from(
                ["triple", "commit_triple", "savepoint", "rollback2", "rollback3",
                 "rollback1", "incomplete", "junk"]
            )
        )
        if kind == "triple":
            action = draw(st.sampled_from(ACTIONS))
            names += [f"{ts}.{action}.requested", f"{ts}.{action}.inflight", f"{ts}.{action}"]
        elif kind == "commit_triple":
            names += [f"{ts}.commit.requested", f"{ts}.inflight", f"{ts}.commit"]
        elif kind == "savepoint":
            names += [f"{ts}.savepoint.inflight", f"{ts}.savepoint"]
        elif kind == "rollback2":
            names += [f"{ts}.rollback.inflight", f"{ts}.rollback"]
        elif kind == "rollback3":
            names += [f"{ts}.rollback.requested", f"{ts}.rollback.inflight", f"{ts}.rollback"]
        elif kind == "rollback1":
            names += [f"{ts}.rollback"]
        elif kind == "incomplete":
            action = draw(st.sampled_from(ACTIONS))
            names += [f"{ts}.{action}.requested", f"{ts}.{action}.inflight"]
        else:
            names += [f"{ts}.unknownaction", f"{ts}.unknownaction.inflight"]
    if draw(st.booleans()):
        names.append("hoodie.properties")
    return names


@given(timelines(), st.integers(3, 10), st.sampled_from([BLOCK, CONTINUE]))
@settings(max_examples=200, deadline=None)
def test_batcher_invariants(names, max_batch, strategy):
    first_inc, batches = create_batches(
        [(n, None) for n in names], max_batch, strategy
    )

    flat = [fn for b in batches for fn in b]
    # no invented files, no duplicates
    assert set(flat) <= set(names)
    assert len(flat) == len(set(flat))
    # batch size cap respected
    assert all(len(b) <= max_batch for b in batches)
    # no empty batches
    assert all(b for b in batches)
    # hoodie.properties, when emitted, is the first file of the first batch
    if any(fn == "hoodie.properties" for fn in flat):
        assert batches[0][0] == "hoodie.properties"
    # only whitelisted actions pass the filter
    for fn in flat:
        if fn != "hoodie.properties":
            assert parse_instant(fn).action != "unknownaction"
    # ordering: concatenated batches are sorted (props first, then lexicographic)
    body = [fn for fn in flat if fn != "hoodie.properties"]
    assert body == sorted(body)
    # BLOCK mode never reports a first-incomplete checkpoint
    if strategy == BLOCK:
        assert first_inc == ""
    # CONTINUE: reported checkpoint is min(incomplete ts observed) - 1,
    # hence numerically below every emitted non-props commit id... only
    # guaranteed below SKIPPED ids; check it's a valid decrement string
    if first_inc:
        assert first_inc.isdigit() or (first_inc.startswith("-") and first_inc[1:].isdigit())


@given(timelines(), st.sampled_from([BLOCK, CONTINUE]))
@settings(max_examples=100, deadline=None)
def test_groups_never_split(names, strategy):
    """Files sharing a commit ts are either all in one batch (complete
    group) or absent — never spread across batches."""
    _, batches = create_batches([(n, None) for n in names], 3, strategy)
    # max_batch=3 forces the tightest packing; a split group would show
    # the same ts in two different batches
    ts_to_batches: dict[str, set[int]] = {}
    for bi, batch in enumerate(batches):
        for fn in batch:
            if fn == "hoodie.properties":
                continue
            ts = parse_instant(fn).ts
            ts_to_batches.setdefault(ts, set()).add(bi)
    for ts, bs in ts_to_batches.items():
        assert len(bs) == 1, f"group {ts} split across batches {bs}"


# ---- CONTINUE-mode recency filter vs brute-force reference ----
#
# Brute force written straight from ActiveTimelineInstantBatcher.java
# :199-218: group by split("\\.",3)[0] (then "_" prefix), keep a group
# when any member is hoodie.properties or strictly newer than the
# checkpoint. Unknown mtimes count as new (the batch path only has
# mtimes in CONTINUE mode).

from datetime import datetime, timedelta

from lakeview_spark.operators.batcher import recency_filter

_CKPT = datetime(2026, 1, 15, 12, 0, 0)


def _reference_recency(files, ckpt):
    by_key = {}
    for fn, lm in files:
        raw = fn.split(".", 2)[0]
        key = raw.split("_")[0] if "_" in raw else raw
        by_key.setdefault(key, []).append((fn, lm))
    out = []
    for group in by_key.values():
        keep = False
        for fn, lm in group:
            if fn == "hoodie.properties" or lm is None or lm > ckpt:
                keep = True
        if keep:
            out.extend(group)
    return out


@st.composite
def mtimed_corpora(draw):
    """Random (filename, mtime) corpora: shared commit keys (some with
    underscore variants, exercising the split("_") key rule), mtimes
    straddling the checkpoint incl. the exact-equal boundary, None
    mtimes, and hoodie.properties."""
    n = draw(st.integers(1, 30))
    files = []
    for _ in range(n):
        ts = draw(st.integers(100, 120))  # small range -> frequent key collisions
        suffix = draw(st.sampled_from(["", "_001", "_20260101"]))
        state = draw(st.sampled_from(["requested", "inflight", ""]))
        action = draw(st.sampled_from(ACTIONS))
        name = f"{ts}{suffix}.{action}" + (f".{state}" if state else "")
        lm = draw(
            st.one_of(
                st.none(),
                st.datetimes(
                    min_value=_CKPT - timedelta(days=2),
                    max_value=_CKPT + timedelta(days=2),
                ),
                st.just(_CKPT),  # boundary: equal-to-checkpoint is NOT newer
            )
        )
        files.append((name, lm))
    if draw(st.booleans()):
        files.append(("hoodie.properties", draw(st.one_of(st.none(), st.just(_CKPT)))))
    return files


@given(mtimed_corpora())
@settings(max_examples=300, deadline=None)
def test_continue_recency_filter_matches_reference(files):
    got = sorted(recency_filter(files, _CKPT), key=repr)
    want = sorted(_reference_recency(files, _CKPT), key=repr)
    assert got == want


@given(mtimed_corpora())
@settings(max_examples=100, deadline=None)
def test_continue_batches_only_contain_recency_surviving_files(files):
    surviving = {fn for fn, _ in _reference_recency(files, _CKPT)}
    _, batches = create_batches(files, 20, strategy=CONTINUE, checkpoint_ts=_CKPT)
    for batch in batches:
        for fn in batch:
            assert fn in surviving
