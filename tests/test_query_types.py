"""General BooleanQuery (MUST/SHOULD/MUST_NOT/FILTER, boosts), constant
score, match-all, dismax, and sort-by-field collector — engine vs oracle
(SURVEY §2.5/§2.6 scoring modifiers)."""

import numpy as np
import pytest

from lucene_solr_ray.pipelines.search import IndexSearcher


@pytest.fixture(scope="module")
def searcher(t1_index):
    index_dir, _ = t1_index
    return IndexSearcher(index_dir)


def test_boolean_full_form_parity(searcher, t1_oracle):
    cases = [
        dict(should=["w0000", "w0005"], must=[], must_not=["w0002"], filter_terms=[]),
        dict(should=["w0010"], must=["w0000"], must_not=[], filter_terms=["w0001"]),
        dict(should=[], must=["w0000", "w0001"], must_not=["w0003"], filter_terms=[]),
        dict(should=["w0004", "w0007", "w0009"], must=[], must_not=[], filter_terms=[]),
        dict(should=["w0000"], must=[], must_not=["w0000"], filter_terms=[]),  # self-negation
        dict(should=["w0000"], must=["zz-absent"], must_not=[], filter_terms=[]),
    ]
    for case in cases:
        got_d, got_s = searcher.search_boolean(**case, k=10)
        exp_d, exp_s = t1_oracle.search_boolean(**case, k=10)
        assert got_d.tolist() == exp_d.tolist(), case
        assert np.array_equal(got_s, exp_s), case


def test_boost_query_parity(searcher, t1_oracle):
    boost = {"w0000": 2.5, "w0005": 0.5}
    got_d, got_s = searcher.search_boolean(should=["w0000", "w0005"], boost=boost, k=10)
    exp_d, exp_s = t1_oracle.search_boolean(should=["w0000", "w0005"], boost=boost, k=10)
    assert got_d.tolist() == exp_d.tolist()
    assert np.array_equal(got_s, exp_s)
    # boosting changes the ranking vs unboosted
    un_d, _ = searcher.search_boolean(should=["w0000", "w0005"], k=10)
    assert un_d.tolist() != got_d.tolist() or len(got_d) == 0


def test_constant_score_and_match_all(searcher):
    d, s = searcher.search_constant_score(["w0000"], k=5, boost=3.25)
    assert np.all(s == np.float32(3.25))
    assert d.tolist() == sorted(d.tolist())
    d, s = searcher.match_all(k=7)
    assert d.tolist() == list(range(7))
    assert np.all(s == np.float32(1.0))


def test_dismax_parity_and_tiebreaker(searcher, t1_oracle):
    for tie in (0.0, 0.3):
        got_d, got_s = searcher.search_dismax(["w0000", "w0005", "w0010"], k=10, tie_breaker=tie)
        exp_d, exp_s = t1_oracle.search_dismax(["w0000", "w0005", "w0010"], k=10, tie_breaker=tie)
        assert got_d.tolist() == exp_d.tolist(), tie
        assert np.array_equal(got_s, exp_s), tie
    # tie=1.0 degenerates to the plain OR sum over float32 parts
    d1, s1 = searcher.search_dismax(["w0003", "w0008"], k=10, tie_breaker=1.0)
    d2, s2 = searcher.search(["w0003", "w0008"], k=10, mode="or", algorithm="exhaustive")
    assert d1.tolist() == d2.tolist()


def test_sort_by_field_collector(searcher, t1_oracle, t1_table):
    d, vals = searcher.search_sorted_by_field(["w0000"], field="dl", k=10, descending=True)
    # matches = oracle boolean set; order by dl desc then docid asc
    exp_docs, _ = t1_oracle.search(["w0000"], k=10**9)
    exp = sorted(exp_docs.tolist(), key=lambda x: (-t1_oracle.dl[x], x))[:10]
    assert d.tolist() == exp
    assert np.all(np.diff(vals.astype(np.int64)) <= 0)
