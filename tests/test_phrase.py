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
