"""Span queries ([U] lucene/core/.../search/spans/): SpanNearQuery
(ordered + unordered) and SpanFirstQuery vs a naive per-doc reference
over the same analyzed positions."""

import numpy as np
import pytest

from lucene_solr_ray.analysis import tokenize_with_positions
from lucene_solr_ray.phrase import span_near_ordered, span_near_unordered
from lucene_solr_ray.pipelines.search import IndexSearcher


def test_span_matchers_semantics():
    a = np.array([0, 10], dtype=np.int64)
    b = np.array([3, 13], dtype=np.int64)
    # closest pairs (0,3) and (10,13) both have gap 2 -> slop 2 matches,
    # slop 1 doesn't
    assert span_near_unordered([a, b], 2)
    assert not span_near_unordered([a, b], 1)
    # order-insensitive: (12, 10) pair has gap 1
    assert span_near_unordered([b, a], 2)
    assert span_near_unordered([np.array([5]), np.array([4])], 0)
    # ordered: requires a.pos < b.pos
    assert span_near_ordered([a, b], 2)
    assert not span_near_ordered([np.array([5]), np.array([4])], 5)
    assert span_near_ordered([np.array([5]), np.array([9])], 3)
    assert not span_near_ordered([np.array([5]), np.array([9])], 2)
    # three clauses, strictly increasing chain
    assert span_near_ordered(
        [np.array([0]), np.array([2]), np.array([4])], 2)
    assert not span_near_ordered(
        [np.array([0]), np.array([2]), np.array([4])], 1)
    assert span_near_unordered(
        [np.array([4]), np.array([0]), np.array([2])], 2)
    # empty list never matches
    assert not span_near_unordered([a, np.array([], dtype=np.int64)], 99)
    assert not span_near_ordered([np.array([], dtype=np.int64)], 99)


def _naive_spans(table, clauses, slop, in_order):
    """Reference: analyze every doc's text, apply the shared matchers."""
    texts = table.column("text").to_pylist()
    out = []
    for docid_like, text in enumerate(texts):
        pos_by_term = {}
        for tok, p in tokenize_with_positions(text):
            pos_by_term.setdefault(tok, []).append(p)
        lists = [np.array(pos_by_term.get(c, []), dtype=np.int64)
                 for c in clauses]
        m = span_near_ordered if in_order else span_near_unordered
        if m(lists, slop):
            out.append(docid_like)
    return out


@pytest.mark.parametrize("clauses,slop,in_order", [
    (["w0000", "w0001"], 0, False),
    (["w0000", "w0001"], 2, False),
    (["w0000", "w0001"], 2, True),
    (["w0001", "w0000"], 2, True),
    (["w0000", "w0002", "w0001"], 4, False),
])
def test_span_near_parity(t1_index, t1_table, clauses, slop, in_order):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    got = s.search_span_near(clauses, slop=slop, in_order=in_order)
    # docid == row rank under (conv_id, turn_idx) sort (FIXTURES §1)
    import pyarrow.compute as pc

    order = pc.sort_indices(t1_table, sort_keys=[("conv_id", "ascending"),
                                                 ("turn_idx", "ascending")])
    sorted_table = t1_table.take(order)
    exp = _naive_spans(sorted_table, clauses, slop, in_order)
    assert got.tolist() == exp, (clauses, slop, in_order)


def test_span_first_parity(t1_index, t1_table):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    import pyarrow.compute as pc

    order = pc.sort_indices(t1_table, sort_keys=[("conv_id", "ascending"),
                                                 ("turn_idx", "ascending")])
    texts = t1_table.take(order).column("text").to_pylist()
    for term, end in [("w0000", 3), ("w0001", 1), ("w0000", 1)]:
        got = s.search_span_first(term, end)
        exp = []
        for i, text in enumerate(texts):
            firsts = [p for tok, p in tokenize_with_positions(text) if tok == term]
            if firsts and min(firsts) <= end - 1:
                exp.append(i)
        assert got.tolist() == exp, (term, end)


def test_span_absent_term(t1_index):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    assert len(s.search_span_near(["w0000", "zzznope"], slop=9)) == 0
    assert len(s.search_span_first("zzznope", 100)) == 0
    # a SpanOr clause with one absent alternative still matches via the other
    got_or = s.search_span_near([["w0000", "zzznope"], "w0001"], slop=9)
    got_plain = s.search_span_near(["w0000", "w0001"], slop=9)
    assert got_or.tolist() == got_plain.tolist()
    # all alternatives absent -> empty
    assert len(s.search_span_near([["zzza", "zzzb"], "w0001"], slop=9)) == 0


def _sorted_texts(t1_table):
    import pyarrow.compute as pc

    order = pc.sort_indices(t1_table, sort_keys=[("conv_id", "ascending"),
                                                 ("turn_idx", "ascending")])
    return t1_table.take(order).column("text").to_pylist()


def test_span_or_near_parity(t1_index, t1_table):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    clauses = [["w0000", "w0003"], "w0001"]
    slop = 2
    got = s.search_span_near(clauses, slop=slop, in_order=False)
    exp = []
    for i, text in enumerate(_sorted_texts(t1_table)):
        pos_by_term = {}
        for tok, p in tokenize_with_positions(text):
            pos_by_term.setdefault(tok, []).append(p)
        lists = []
        ok = True
        for c in clauses:
            alts = [c] if isinstance(c, str) else c
            merged = sorted({p for a in alts for p in pos_by_term.get(a, [])})
            if not merged:
                ok = False
                break
            lists.append(np.array(merged, dtype=np.int64))
        if ok and span_near_unordered(lists, slop):
            exp.append(i)
    assert got.tolist() == exp


def test_span_not_parity(t1_index, t1_table):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    for include, exclude, pre, post in [("w0000", "w0001", 2, 2),
                                        ("w0000", "w0001", 0, 0),
                                        ("w0000", "zzznope", 3, 3)]:
        got = s.search_span_not(include, exclude, pre=pre, post=post)
        exp = []
        for i, text in enumerate(_sorted_texts(t1_table)):
            pos_by_term = {}
            for tok, p in tokenize_with_positions(text):
                pos_by_term.setdefault(tok, []).append(p)
            inc = pos_by_term.get(include, [])
            exc = pos_by_term.get(exclude, [])
            if any(all(not (p - pre <= q <= p + post) for q in exc) for p in inc):
                exp.append(i)
        assert got.tolist() == exp, (include, exclude, pre, post)


def test_intervals_containing_minimality(ray_session, tmp_path):
    """Minimal-interval semantics: doc 0 has a..c..b with no tighter
    pair -> match; doc 1 has a wide a..c..b stretch but a tighter (a,b)
    pair that EXCLUDES c -> no match (an all-pairs implementation would
    wrongly keep it); doc 2 exceeds max_width."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.fulltext import intervals_containing_retrieve

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "aa x cc x bb",                  # minimal (0,4) contains c at 2
            "aa x cc x aa bb",               # minimal is (4,5): excludes cc
            "aa x x x x x x x x x cc bb" ,   # (0,11) wide; minimal (11? no..)
        ], pa.string()),
        "lang": pa.array(["en"] * 3), "source": pa.array(["s"] * 3),
        "n_chars": pa.array([10, 10, 10], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    got = intervals_containing_retrieve(d, "aa", "bb", "cc", max_width=6)
    assert got.column("doc_id").to_pylist() == [0]

    # and the shared matcher directly: dominated candidates are removed
    import numpy as np

    from lucene_solr_ray.phrase import minimal_intervals_two
    assert minimal_intervals_two(np.array([0, 4]), np.array([5])) == [(4, 5)]
    assert minimal_intervals_two(np.array([0]), np.array([5])) == [(0, 5)]
    assert minimal_intervals_two(np.array([3]), np.array([1, 6])) == [(1, 3), (3, 6)]


def test_span_containing_and_within_semantics(ray_session, tmp_path):
    """Big = SpanNear(merge, vector, slop=2, unordered); little = join.
    Containment requires the little position INSIDE the big envelope —
    a big span without an enclosed little contributes nothing; multiple
    qualifying (a, b) pairs each yield their own envelope; the stopword
    'a' keeps its position gap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.fulltext import (
        span_containing_retrieve, span_within_retrieve)

    texts = [
        "merge join vector",                # big [0,2], join@1 inside
        "merge a vector join",              # big [0,2] (gap over stop pos 1), join@3 OUTSIDE
        "vector join merge join vector",    # bigs [0,2] and [2,4]; joins 1, 3
        "join merge stream vector",         # big [1,3]; join@0 outside
    ]
    tab = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    cont = span_containing_retrieve(str(tmp_path), "merge", "vector", 2, "join").to_pandas()
    assert list(map(tuple, cont[["doc_id", "lo", "hi"]].to_numpy())) == [
        (0, 0, 2), (2, 0, 2), (2, 2, 4)]
    within = span_within_retrieve(str(tmp_path), "merge", "vector", 2, "join").to_pandas()
    assert list(map(tuple, within[["doc_id", "pos"]].to_numpy())) == [
        (0, 1), (2, 1), (2, 3)]


def test_synonym_query_degenerates_to_single_term(ray_session):
    """SynonymQuery([t, absent]) == single-term BM25 ranking: the absent
    member contributes no df (blend = max over PRESENT members) and no
    tf — Lucene's SynonymQuery semantics."""
    from lucene_solr_ray.functions.fulltext import bm25_topk, synonym_topk

    sf = "/root/testdata/sf0.001"
    syn = synonym_topk(sf, ["merge", "zzz-absent"], k=10).to_pandas()
    single = bm25_topk(sf, [("q", ["merge"], "or")], k=10).to_pandas()
    assert syn["doc_id"].tolist() == single["doc_id"].tolist()


def test_phrase_wildcard_and_span_multiterm(tmp_path, ray_session):
    """PhraseWildcardQuery + SpanMultiTermQueryWrapper on a hand-built
    corpus: the wildcard slot expands over the stop-filtered vocabulary
    (stopwords can never fill it), adjacency/slop in position space."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.fulltext import (
        phrase_wildcard_retrieve, span_multiterm_near_retrieve)

    texts = [
        "merge value table",       # merge v* adjacent -> match
        "merge the vector",        # stopword gap at pos 1 -> NO match
        "merge stream sort",       # s*m 'stream'@1, sort@2: gap 0 -> match
        "value merge",             # v* before merge -> NO phrase match
        "stream key agg row sort", # gap 3 <= 4 -> multiterm match
        "stream key agg row scan sort",  # gap 4 <= 4 -> match
        "stream key agg row scan big sort",  # gap 5 > 4 -> NO match
    ]
    tab = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    pw = phrase_wildcard_retrieve(str(tmp_path), lead="merge", prefix="v")
    assert pw.column("doc_id").to_pylist() == [0]
    mt = span_multiterm_near_retrieve(str(tmp_path), pattern="s*m",
                                      other="sort", slop=4, in_order=False)
    assert mt.column("doc_id").to_pylist() == [2, 4, 5]


def test_span_nested_per_level_slop(tmp_path, ray_session):
    """Nested spanNear: each level's slop binds separately — a doc that
    satisfies the flat 3-term total gap but violates the inner pair's
    own slop must NOT match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.fulltext import span_nested_retrieve

    texts = [
        "merge join vector",                  # gaps 0,0 -> match
        "merge row join row vector",          # inner gap 1<=1, outer 1<=1 -> match
        "merge row row join vector",          # inner gap 2 > 1 -> NO (flat total gap 2 would pass a slop-3 flat query)
        "merge join row row vector",          # outer gap 2 > 1 -> NO
        "vector merge join",                  # c before pair -> NO
    ]
    tab = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = span_nested_retrieve(str(tmp_path), inner=("merge", "join"),
                               inner_slop=1, outer_term="vector",
                               outer_slop=1)
    assert got.column("doc_id").to_pylist() == [0, 1]
