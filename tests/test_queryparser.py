"""Classic query parser: parse structure, occur rules, and engine vs
oracle parity through search_clauses ([U] lucene/queryparser/.../classic/
QueryParser.java; SURVEY §2.5 query-parsers row)."""

import numpy as np
import pytest

from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.queryparser import parse_query


@pytest.fixture(scope="module")
def searcher(t1_index):
    index_dir, _ = t1_index
    return IndexSearcher(index_dir)


def test_parse_occur_rules():
    clauses, dv = parse_query("+a b -c")
    assert [c["occur"] for c in clauses] == ["must", "should", "must_not"]
    assert [c["terms"] for c in clauses] == [["a"], ["b"], ["c"]]
    assert dv == {}
    # classic AND promotes both neighbours
    clauses, _ = parse_query("a AND b c")
    assert [c["occur"] for c in clauses] == ["must", "must", "should"]
    clauses, _ = parse_query("a OR b")
    assert [c["occur"] for c in clauses] == ["should", "should"]
    clauses, _ = parse_query("a NOT b")
    assert [c["occur"] for c in clauses] == ["should", "must_not"]


def test_parse_phrase_boost_fields():
    clauses, dv = parse_query('"x y"~2 z^1.5 role:user lang:en lang:de')
    assert clauses[0] == {"kind": "phrase", "terms": ["x", "y"], "slop": 2,
                          "occur": "should"}
    assert clauses[1]["terms"] == ["z"] and clauses[1]["boost"] == 1.5
    assert dv == {"role": "user", "lang": ["en", "de"]}
    # point-served fields are rejected loudly
    with pytest.raises(ValueError, match="docvalues"):
        parse_query("ts:2026-01-01")
    # text: scopes to the default field
    clauses, _ = parse_query("text:hello")
    assert clauses[0]["terms"] == ["hello"]


def test_parse_expansions(searcher):
    clauses, _ = parse_query("w000*", searcher=searcher)
    assert clauses[0]["kind"] == "terms" and len(clauses[0]["terms"]) >= 2
    clauses, _ = parse_query("w0000~1", searcher=searcher)
    assert "w0000" in clauses[0]["terms"]
    clauses, _ = parse_query("[w0000 TO w0002]", searcher=searcher)
    assert "w0000" in clauses[0]["terms"] and "w0002" in clauses[0]["terms"]
    with pytest.raises(ValueError, match="needs a searcher"):
        parse_query("w0*")


QUERIES = [
    "+w0000 w0005 -w0002",
    "w0000 AND w0001",
    "w0000 OR w0003 OR w0007",
    '"w0000 w0001" w0003',
    '+"w0000 w0001"~1',
    "w000* -w0004",
    "w0001~1",
    "[w0000 TO w0004] -w0002",
    "w0000^2.5 w0005",
    "+w0000 +zz-absent",
    "zz-absent",
]


def test_parsed_query_parity(searcher, t1_oracle):
    n_nonempty = 0
    for q in QUERIES:
        clauses, dv = parse_query(q, searcher=searcher)
        assert dv == {}
        got_d, got_s = searcher.search_clauses(clauses, k=20)
        exp_d, exp_s = t1_oracle.search_clauses(clauses, k=20)
        assert got_d.tolist() == exp_d.tolist(), q
        assert np.array_equal(got_s, exp_s), q
        n_nonempty += len(got_d) > 0
    assert n_nonempty >= 8


def test_parsed_dv_filter(searcher, t1_index):
    import os

    import pyarrow.dataset as pads

    index_dir, _ = t1_index
    t = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "role"]
    )
    order = np.argsort(t.column("docid").to_numpy(), kind="stable")
    roles = t.column("role").to_numpy(zero_copy_only=False)[order]
    role = roles[0]
    got_d, _ = searcher.search_parsed(f"+w0000 role:{role}", k=searcher.n_docs)
    plain_d, _ = searcher.search_parsed("+w0000", k=searcher.n_docs)
    assert got_d.tolist() == [d for d in plain_d.tolist() if roles[d] == role]
    assert len(got_d) > 0


def test_multi_term_clause_semantics(searcher, t1_oracle):
    """A MUST multi-term clause matches docs matching ANY alternative
    (rewrite-as-one-clause), unlike listing the terms as separate MUSTs."""
    clauses, _ = parse_query("+w000*", searcher=searcher)
    d_any, _ = searcher.search_clauses(clauses, k=searcher.n_docs)
    alts = clauses[0]["terms"]
    all_and, _ = searcher.search(alts, k=searcher.n_docs, mode="and")
    all_or, _ = searcher.search(alts, k=searcher.n_docs, mode="or")
    assert set(d_any.tolist()) == set(all_or.tolist())
    assert set(all_and.tolist()) <= set(d_any.tolist())


# ---------------- Surround query language ----------------

def test_surround_parser_shapes():
    from lucene_solr_ray.queryparser import parse_surround

    assert parse_surround("3W(merge, join)") == (
        "dist", 3, True, [("alt1", "merge"), ("alt1", "join")])
    assert parse_surround("N(a, b)") == ("dist", 1, False, [("alt1", "a"), ("alt1", "b")])
    assert parse_surround("5N((merge OR join), vec*)") == (
        "dist", 5, False, [("alts", ["merge", "join"]), ("alt1", "vec*")])
    node = parse_surround("(merge OR join) NOT 2W(stream, window)")
    assert node[0] == "not" and node[1][0] == "or" and node[2][0] == "dist"
    with pytest.raises(ValueError):
        parse_surround("3W(merge, join")  # unclosed


def test_surround_eval_set_algebra(ray_session, tmp_path):
    """AND/OR/NOT over distance ops reduce to the same sets as composing
    the underlying span/boolean searches directly."""
    import numpy as np
    from lucene_solr_ray.functions import fulltext as ft
    from lucene_solr_ray.pipelines.search import IndexSearcher
    from lucene_solr_ray.queryparser import parse_surround

    sf = "/root/testdata/sf0.001"
    index_dir = ft.docs_index(sf)
    s = IndexSearcher(index_dir)
    got = ft._sur_eval(s, parse_surround("3W(merge, join) OR vector"))
    w = np.sort(s.search_span_near(["merge", "join"], slop=2, in_order=True))
    v = np.sort(np.concatenate(list(s.iter_matches(["vector"], mode="or"))))
    assert got.tolist() == np.union1d(w, v).tolist()
    gnot = ft._sur_eval(s, parse_surround("3W(merge, join) NOT vector"))
    assert gnot.tolist() == np.setdiff1d(w, v).tolist()
    gand = ft._sur_eval(s, parse_surround("3W(merge, join) AND vector"))
    assert gand.tolist() == np.intersect1d(w, v).tolist()
    # wildcard operand == explicit SpanOr of its dict expansion
    gw = ft._sur_eval(s, parse_surround("2N(s*, join)"))
    alts = s.expand_terms("prefix", "s")
    ref = np.sort(s.search_span_near([alts, "join"], slop=1, in_order=False))
    assert gw.tolist() == ref.tolist()


def test_simple_query_parser_ast_and_leniency():
    from lucene_solr_ray.queryparser import parse_simple

    assert parse_simple('"merge join" | vector + -stream*') == (
        "and",
        ("or", ("phrase", (["merge", "join"], 0)), ("term", "vector")),
        ("not", ("prefix", "stream")),
    )
    # left-assoc, no precedence between + and |
    assert parse_simple("a | b + c") == ("and", ("or", ("term", "a"), ("term", "b")), ("term", "c"))
    # lenient: bad fuzzy distance is a literal; stray parens don't raise
    assert parse_simple("bad~x") == ("term", "bad~x")
    assert parse_simple(") a (") == ("term", "a")
    assert parse_simple('"merge join"~2') == ("phrase", (["merge", "join"], 2))
    assert parse_simple("merg~1") == ("fuzzy", ("merg", 1))


def test_simple_query_docs_matches_set_algebra():
    from lucene_solr_ray.functions import fulltext as ft
    from lucene_solr_ray.pipelines.search import IndexSearcher

    sf = "/root/testdata/sf0.001"
    s = IndexSearcher(ft.docs_index(sf))
    got = ft.simple_query_docs(sf, '"merge join" | vector + -stream*')
    ph = np.sort(s.search_phrase(["merge", "join"], k=s.n_docs)[0])
    v = np.sort(np.concatenate(list(s.iter_matches(["vector"], mode="or"))))
    st = np.sort(np.concatenate(list(s.iter_matches(s.expand_terms("prefix", "stream"), mode="or"))))
    mapping = ft._docid_to_doc_id(ft.docs_index(sf))
    want = np.sort(mapping[np.setdiff1d(np.union1d(ph, v), st)])
    assert got.column("doc_id").to_numpy().tolist() == want.tolist()


def test_simple_query_or_with_not_is_boolean_must_not():
    """Lucene SimpleQueryParser: '-' becomes MUST_NOT on the enclosing
    BooleanQuery, so 'a | -b' is (a minus b), NOT union(a, complement(b))
    (ADVICE r3). An OR of only negated clauses matches nothing."""
    from lucene_solr_ray.functions import fulltext as ft
    from lucene_solr_ray.pipelines.search import IndexSearcher

    sf = "/root/testdata/sf0.001"
    s = IndexSearcher(ft.docs_index(sf))
    mapping = ft._docid_to_doc_id(ft.docs_index(sf))

    got = ft.simple_query_docs(sf, "merge | -join")
    m = np.sort(np.concatenate(list(s.iter_matches(["merge"], mode="or"))))
    j = np.sort(np.concatenate(list(s.iter_matches(["join"], mode="or"))))
    want = np.sort(mapping[np.setdiff1d(m, j)])
    assert got.column("doc_id").to_numpy().tolist() == want.tolist()
    # some doc matches 'merge' while also containing 'join' — the case
    # where MUST_NOT and union-of-complement disagree
    assert len(np.intersect1d(m, j)) > 0

    only_neg = ft.simple_query_docs(sf, "-merge | -join")
    assert only_neg.num_rows == 0


def test_leading_wildcard_scans_pruned_range():
    """ReversedWildcardFilter point: the reversed-dict scan touches only
    the suffix range, not the whole vocabulary."""
    from lucene_solr_ray.functions import fulltext as ft
    from lucene_solr_ray.pipelines.search import IndexSearcher

    sf = "/root/testdata/sf0.001"
    s = IndexSearcher(ft.docs_index(sf))
    terms = s.leading_wildcard_terms("*er")
    rev, _ = s._reversed_dict()
    assert terms == sorted(terms)
    assert all(t.endswith("er") for t in terms)
    assert len(terms) >= 2
    assert s.last_rev_scanned == len(terms) < len(rev)
    # parity with the brute wildcard walk
    assert terms == s.expand_terms("wildcard", "*er", max_terms=10_000)


def test_intervals_maxgaps_vs_bruteforce():
    from lucene_solr_ray.functions import fulltext as ft
    from lucene_solr_ray.pipelines.search import IndexSearcher
    from lucene_solr_ray.analysis import tokenize_with_positions
    import pyarrow.dataset as pads

    sf = "/root/testdata/sf0.001"
    s = IndexSearcher(ft.docs_index(sf))
    got = set(s.search_intervals_maxgaps("merge", "join", "sort", 4).tolist())
    # brute force over raw positions (index positions == whitespace
    # positions on this corpus)
    tab = pads.dataset(f"{sf}/documents.parquet", format="parquet").to_table(
        columns=["doc_id", "text"])
    want = set()
    for did, text in zip(tab.column("doc_id").to_pylist(), tab.column("text").to_pylist()):
        pos = {}
        for tok, p in tokenize_with_positions(text or ""):
            pos.setdefault(tok, []).append(p)
        ok = any(
            a < b < c and c - a - 2 <= 4
            for a in pos.get("merge", ())
            for b in pos.get("join", ())
            for c in pos.get("sort", ()))
        if ok:
            want.add(did)
    mapping = ft._docid_to_doc_id(ft.docs_index(sf))
    assert {int(mapping[d]) for d in got} == want
    assert len(want) > 0


def test_mm_spec_solr_examples():
    from lucene_solr_ray.queryparser import parse_mm_spec

    # the examples from the Solr Ref Guide's mm parameter table
    assert parse_mm_spec("3", 5) == 3
    assert parse_mm_spec("-2", 5) == 3
    assert parse_mm_spec("75%", 4) == 3          # truncates
    assert parse_mm_spec("-25%", 4) == 3
    assert parse_mm_spec("3<90%", 3) == 3        # n <= 3: all required
    assert parse_mm_spec("3<90%", 10) == 9
    assert parse_mm_spec("2<-25% 9<-3", 1) == 1
    assert parse_mm_spec("2<-25% 9<-3", 8) == 6
    assert parse_mm_spec("2<-25% 9<-3", 12) == 9
    assert parse_mm_spec("200%", 3) == 3         # clamped to n
