"""BM25 invariants — the BaseSimilarityTestCase analogue (SURVEY.md §5.1):
scores finite, >= 0, monotonic in tf, decreasing in dl; upper bounds hold."""

import math

import numpy as np

from lucene_solr_ray import similarity as sim
from lucene_solr_ray.codec.norms import encode_dl


def test_idf_matches_formula():
    assert sim.idf(100, 10) == math.log(1 + (100 - 10 + 0.5) / (10 + 0.5))
    assert sim.idf(1, 1) > 0  # always positive in 8.x form


def test_score_monotonic_in_tf():
    cache = sim.denom_cache(avgdl=8.0)
    w = sim.term_weight(1000, 10)
    norm = encode_dl(np.array([8]))[0]
    tfs = np.arange(1, 100, dtype=np.int64)
    s = sim.score_term(w, tfs, np.full(99, norm), cache)
    assert np.all(np.diff(s.astype(np.float64)) >= 0)
    assert np.all(s >= 0) and np.all(np.isfinite(s))
    # saturates below idf
    assert s[-1] < np.float32(w)


def test_score_decreasing_in_dl():
    cache = sim.denom_cache(avgdl=8.0)
    w = sim.term_weight(1000, 10)
    norms = encode_dl(np.array([1, 4, 16, 64, 256]))
    s = sim.score_term(w, np.full(5, 3, dtype=np.int64), norms, cache)
    assert np.all(np.diff(s.astype(np.float64)) <= 0)


def test_upper_bound_dominates_block():
    rng = np.random.default_rng(3)
    cache = sim.denom_cache(avgdl=11.3)
    w = sim.term_weight(50_000, 1234)
    tfs = rng.integers(1, 500, size=128)
    norms = rng.integers(0, 256, size=128)
    s = sim.score_term(w, tfs, norms, cache)
    ub = sim.score_upper_bound(w, tfs.max(), norms.min(), cache)
    assert float(s.max()) <= float(ub)


def test_accumulate_order_sensitive_float32():
    a = np.array([0.1], dtype=np.float32)
    b = np.array([0.2], dtype=np.float32)
    c = np.array([0.30000004], dtype=np.float32)
    out = sim.accumulate([a, b, c])
    assert out.dtype == np.float32
    expect = np.float32(np.float32(a[0] + b[0]) + c[0])
    assert out[0] == expect


def test_similarity_registry_and_classic_invariants():
    from lucene_solr_ray.similarity import ClassicTFIDF, get_similarity

    assert get_similarity("bm25").name == "bm25"
    assert get_similarity("classic") is ClassicTFIDF
    import pytest

    with pytest.raises(ValueError):
        get_similarity("nope")
    cache = ClassicTFIDF.denom_cache(8.0)
    w = ClassicTFIDF.term_weight(1000, 10)
    s = ClassicTFIDF.score_term(w, np.arange(1, 50), np.full(49, 10), cache)
    assert np.all(np.diff(s.astype(np.float64)) >= 0)  # increasing in tf
    ub = ClassicTFIDF.score_upper_bound(w, 49, 10, cache)
    assert float(s.max()) <= float(ub)


def test_analyzer_registry():
    from lucene_solr_ray.analysis import get_analyzer

    assert get_analyzer("whitespace")("The  quick Fox") == ["The", "quick", "Fox"]
    assert get_analyzer("keyword")("a b c") == ["a b c"]
    assert get_analyzer("html_standard")("<p>Quick <b>fox</b></p>") == ["quick", "fox"]
    assert get_analyzer("standard")("The quick") == ["quick"]


def test_lm_similarities_invariants():
    """LM models (Lucene 8 LMDirichlet/LMJelinekMercer): scores finite,
    clamped >= 0, monotonic in tf, decreasing in dl; block bounds hold
    including on clamp-to-zero blocks."""
    from lucene_solr_ray.similarity import LMDirichlet, LMJelinekMercer, weight_for

    for cls in (LMDirichlet, LMJelinekMercer):
        cache = cls.denom_cache(8.0)
        # common term (high p) on a long doc -> clamp region; rare term -> positive
        for cf, sum_dl in ((50_000, 60_000), (3, 60_000)):
            p = weight_for(cls, 1000, 10, cf, sum_dl)
            tfs = np.arange(1, 60)
            norm = encode_dl(np.array([16]))[0]
            s = cls.score_term(p, tfs, np.full(59, norm), cache)
            assert np.all(np.isfinite(s)) and np.all(s >= 0)
            assert np.all(np.diff(s.astype(np.float64)) >= 0)  # increasing in tf
            # decreasing in dl at fixed tf
            norms = encode_dl(np.array([4, 16, 64, 255]))
            s_dl = cls.score_term(p, np.full(4, 5), norms, cache).astype(np.float64)
            assert np.all(np.diff(s_dl) <= 0)
            ub = cls.score_upper_bound(p, 59, norm, cache)
            assert float(s.max()) <= float(ub)
            bubs = cls.block_upper_bounds(p, np.array([5, 59]), np.array([norm, norm]), cache)
            assert float(s[4]) <= bubs[0] and float(s[58]) <= bubs[1]


def test_boolean_similarity_constant():
    from lucene_solr_ray.similarity import BooleanSim

    cache = BooleanSim.denom_cache(8.0)
    w = BooleanSim.term_weight(1000, 10)
    s = BooleanSim.score_term(w, np.array([1, 7, 100]), np.array([0, 5, 200]), cache)
    assert s.tolist() == [1.0, 1.0, 1.0]
    assert float(s.max()) <= float(BooleanSim.score_upper_bound(w, 100, 0, cache))
