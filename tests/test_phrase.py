"""PhraseQuery parity: engine (positional segments) vs brute-force oracle
(FIXTURES.md §6.2 extended to phrases); packed-ints codec round-trip."""

import numpy as np
import pytest

from lucene_solr_ray.analysis import tokenize_with_positions
from lucene_solr_ray.codec.packedints import decode_all, decode_range, encode_ints
from lucene_solr_ray.pipelines.search import IndexSearcher


def test_packedints_roundtrip():
    rng = np.random.default_rng(3)
    for n in [0, 1, 127, 128, 129, 5000]:
        vals = rng.integers(0, 4000, size=n)
        blob = encode_ints(vals)
        assert np.array_equal(decode_all(blob), vals)
        if n > 10:
            assert np.array_equal(decode_range(blob, 3, n - 2), vals[3 : n - 2])
        if n >= 135:
            assert np.array_equal(decode_range(blob, 120, 135), vals[120:135])


def test_positions_have_stopword_gaps():
    items = tokenize_with_positions("merge the big join")
    assert items == [("merge", 0), ("big", 2), ("join", 3)]


def _phrases_from_corpus(texts, rng, n=30):
    """Adjacent emitted-token pairs (position gap exactly 1) that occur in
    the corpus, plus a few non-occurring and stopword-gapped phrases."""
    phrases = set()
    for text in texts:
        items = tokenize_with_positions(text)
        for (t1, p1), (t2, p2) in zip(items, items[1:]):
            if p2 == p1 + 1 and t1 != t2:
                phrases.add((t1, t2))
        if len(phrases) > 200:
            break
    pool = sorted(phrases)
    idx = rng.choice(len(pool), size=min(n, len(pool)), replace=False)
    chosen = [list(pool[i]) for i in idx]
    chosen.append(["w0000", "zz-absent"])  # absent term
    chosen.append(["w0001", "the", "w0002"])  # explicit stopword gap
    return chosen


def test_phrase_parity_vs_oracle(t1_index, t1_oracle, t1_table):
    index_dir, manifest = t1_index
    assert manifest["positions"] is True
    s = IndexSearcher(index_dir)
    rng = np.random.default_rng(17)
    texts = t1_table.column("text").to_pylist()
    n_nonempty = 0
    for phrase in _phrases_from_corpus(texts, rng):
        got_d, got_s = s.search_phrase(phrase, k=10)
        exp_d, exp_s = t1_oracle.search_phrase(phrase, k=10)
        assert got_d.tolist() == exp_d.tolist(), phrase
        assert np.array_equal(got_s, exp_s), phrase
        n_nonempty += len(got_d) > 0
    assert n_nonempty >= 20


def test_phrase_requires_adjacency(t1_index, t1_oracle, t1_table):
    """A phrase with a stopword between its words must only match docs
    where the gap exists in the same shape."""
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    d1, _ = s.search_phrase(["w0000", "w0001"], k=1000)
    d2, _ = s.search_phrase(["w0000", "the", "w0001"], k=1000)
    e1, _ = t1_oracle.search_phrase(["w0000", "w0001"], k=1000)
    e2, _ = t1_oracle.search_phrase(["w0000", "the", "w0001"], k=1000)
    assert d1.tolist() == e1.tolist() and d2.tolist() == e2.tolist()
    # the two queries are genuinely different match sets (gap vs no gap)
    assert set(d1.tolist()) != set(d2.tolist()) or (len(d1) == 0 and len(d2) == 0)


def test_phrase_freq_matcher_semantics():
    from lucene_solr_ray.phrase import phrase_freq

    a = np.array([0, 10, 20])
    b = np.array([0, 10, 21])
    assert phrase_freq([a, b], slop=0) == 2  # 0 and 10 align exactly
    assert phrase_freq([a, b], slop=1) == 3  # 20/21 within slop 1
    assert phrase_freq([np.array([5])], slop=0) == 1
    assert phrase_freq([a, np.array([], dtype=np.int64)], slop=3) == 0


def test_sloppy_phrase_parity(t1_index, t1_oracle, t1_table):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    rng = np.random.default_rng(23)
    texts = t1_table.column("text").to_pylist()
    # near-adjacent pairs (gap 2) that exact phrase misses but slop=1 hits
    near = set()
    for text in texts:
        items = tokenize_with_positions(text)
        for (t1x, p1), (t2x, p2) in zip(items, items[2:]):
            if p2 == p1 + 2 and t1x != t2x:
                near.add((t1x, t2x))
        if len(near) > 80:
            break
    pool = sorted(near)
    idx = rng.choice(len(pool), size=min(20, len(pool)), replace=False)
    n_gained = 0
    for i in idx:
        phrase = list(pool[i])
        for slop in (0, 1, 2):
            got_d, got_s = s.search_phrase(phrase, k=20, slop=slop)
            exp_d, exp_s = t1_oracle.search_phrase(phrase, k=20, slop=slop)
            assert got_d.tolist() == exp_d.tolist(), (phrase, slop)
            assert np.array_equal(got_s, exp_s), (phrase, slop)
        d0, _ = s.search_phrase(phrase, k=1000, slop=0)
        d2, _ = s.search_phrase(phrase, k=1000, slop=2)
        n_gained += len(d2) > len(d0)
    assert n_gained >= 10  # slop genuinely widens matches


def test_multi_phrase_parity(t1_index, t1_oracle, t1_table):
    """MultiPhraseQuery: synonym slots built from corpus-adjacent pairs —
    engine vs oracle rank + bit-equal scores; multi-phrase must cover at
    least the union of its single-phrase expansions."""
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    rng = np.random.default_rng(29)
    texts = t1_table.column("text").to_pylist()
    pairs = set()
    for text in texts:
        items = tokenize_with_positions(text)
        for (t1x, p1), (t2x, p2) in zip(items, items[1:]):
            if p2 == p1 + 1 and t1x != t2x:
                pairs.add((t1x, t2x))
        if len(pairs) > 100:
            break
    pool = sorted(pairs)
    n_nonempty = 0
    for _ in range(15):
        (a1, b1), (a2, b2) = (pool[rng.integers(len(pool))] for _ in range(2))
        slots = [[a1, a2], [b1]]
        got_d, got_s = s.search_multi_phrase(slots, k=50)
        exp_d, exp_s = t1_oracle.search_multi_phrase(slots, k=50)
        assert got_d.tolist() == exp_d.tolist(), slots
        assert np.array_equal(got_s, exp_s), slots
        n_nonempty += len(got_d) > 0
        # containment: every single-expansion phrase match is a multi-phrase match
        all_k = max(1, s.n_docs)
        md, _ = s.search_multi_phrase(slots, k=all_k)
        for first in (a1, a2):
            pd_, _ = s.search_phrase([first, b1], k=all_k)
            assert set(pd_.tolist()) <= set(md.tolist()), (slots, first)
    assert n_nonempty >= 10
    # a slot with only absent terms matches nothing
    d, _ = s.search_multi_phrase([["zz-absent"], ["w0000"]], k=10)
    assert len(d) == 0
    # absent ALTERNATIVE within a slot is ignored, not fatal
    d1, s1 = s.search_multi_phrase([[pool[0][0], "zz-absent"], [pool[0][1]]], k=10)
    e1, es1 = t1_oracle.search_multi_phrase([[pool[0][0], "zz-absent"], [pool[0][1]]], k=10)
    assert d1.tolist() == e1.tolist() and np.array_equal(s1, es1)
