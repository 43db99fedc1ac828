"""Property tests for the unigram-LM devices (pure Python — these pin
the MATH the Spark/DuckDB twins replay, complementing the replay tests
that pin engine equality).

The load-bearing claim of corpus_unigram_tokenize is that the 4-slot
window fold IS the Viterbi optimum: because no vocabulary piece exceeds
4 characters, best(i) only ever needs best(i-1..i-4), so the linear
fold with a 4-cost window equals the full DP over all O(2^n)
segmentations — including the packed tie rule (min cost, then fewest
pieces). The brute force below enumerates every segmentation and must
agree exactly.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lakeview_spark.pipeline.corpus import _UNI_BIGP, _UNI_HUGE, _UNI_PACK

_ALPHABET = "ab"


def _window_fold(word: str, pcost: dict[str, int]) -> int:
    """The exact fold the engines run (tests/test_pipeline.py replay)."""
    cs = [0, _UNI_HUGE, _UNI_HUGE, _UNI_HUGE]
    for i in range(1, len(word) + 1):
        cands = []
        for l in (1, 2, 3, 4):
            if i >= l:
                cands.append(cs[l - 1] + pcost.get(word[i - l : i], _UNI_BIGP))
            else:
                cands.append(_UNI_HUGE)
        cs = [min(cands), cs[0], cs[1], cs[2]]
    return cs[0]


def _brute_force(word: str, pcost: dict[str, int]) -> int:
    """Min packed cost over EVERY segmentation into pieces of 1..4
    chars (exponential — only for short property-test words)."""
    n = len(word)
    best = [None] * (n + 1)
    best[0] = 0

    def rec(i: int) -> int:
        if best[i] is not None:
            return best[i]
        b = None
        for l in (1, 2, 3, 4):
            if i >= l:
                c = rec(i - l) + pcost.get(word[i - l : i], _UNI_BIGP)
                b = c if b is None else min(b, c)
        best[i] = b
        return b

    return rec(n)


@st.composite
def _word_and_vocab(draw):
    word = draw(st.text(alphabet=_ALPHABET, min_size=1, max_size=12))
    # a random subset of the word's substrings (lengths 1-4) gets a
    # random positive count; every single char is always priced so the
    # word stays tokenizable (the engine invariant)
    pieces = {word[i : i + l] for l in (1, 2, 3, 4) for i in range(len(word) - l + 1)}
    chars = {p for p in pieces if len(p) == 1}
    multi = sorted(p for p in pieces if len(p) > 1)
    chosen = draw(st.sets(st.sampled_from(multi), max_size=len(multi))) if multi else set()
    counts = {}
    for p in sorted(chars | set(chosen)):
        counts[p] = draw(st.integers(min_value=1, max_value=1 << 30))
    blw = sum(counts.values()).bit_length()
    pcost = {
        p: (1 + blw - c.bit_length()) * _UNI_PACK + 1 for p, c in counts.items()
    }
    return word, pcost


@settings(max_examples=300, deadline=None)
@given(_word_and_vocab())
def test_window_fold_is_the_viterbi_optimum(wv):
    word, pcost = wv
    got = _window_fold(word, pcost)
    want = _brute_force(word, pcost)
    assert got == want
    # unpack sanity: the piece count is consistent with the word length
    pieces = got % _UNI_PACK
    assert 1 <= pieces <= len(word)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_ALPHABET, min_size=1, max_size=12))
def test_char_only_vocab_degenerates_to_per_char_cost(word):
    """With ONLY characters priced, the optimum is forced: one piece
    per character — the fallback law that guarantees every word
    tokenizes."""
    counts = {c: 7 for c in set(word)}
    blw = sum(counts.values()).bit_length()
    pcost = {p: (1 + blw - c.bit_length()) * _UNI_PACK + 1 for p, c in counts.items()}
    got = _window_fold(word, pcost)
    assert got % _UNI_PACK == len(word)
    assert got // _UNI_PACK == sum(pcost[c] // _UNI_PACK for c in word)
