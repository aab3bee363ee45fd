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


def _docid_order_texts(t1_table):
    import pyarrow.compute as pc

    idx = pc.sort_indices(t1_table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t1_table.take(idx).column("text").to_pylist()


def test_blockmax_and_ab_parity(searcher, t1_queries):
    """BlockMaxConjunction skipping must not change results vs the plain
    leapfrog (block_max=False) at small k."""
    n_checked = 0
    for row in t1_queries.to_pylist():
        if row["type"] != "and" or len(row["terms"]) < 2:
            continue
        terms = row["terms"]
        from lucene_solr_ray.oracle import analyze_query_terms

        weighted = []
        missing = False
        for t in analyze_query_terms(terms):
            df, _, cur = searcher.term_stats_and_cursor(t)
            if cur is None:
                missing = True
                break
            weighted.append((t, searcher.simcls.term_weight(searcher.n_docs, df), cur))
        if missing or len(weighted) < 2:
            continue
        for k in (3, 10):
            d1, s1 = searcher._search_and(weighted, k, block_max=True)
            d2, s2 = searcher._search_and(weighted, k, block_max=False)
            assert d1.tolist() == d2.tolist(), (terms, k)
            assert np.array_equal(s1, s2), (terms, k)
        n_checked += 1
    assert n_checked >= 5  # the fixture query set must exercise this


def test_min_should_match(searcher, t1_table):
    from lucene_solr_ray.analysis import tokenize

    texts = _docid_order_texts(t1_table)
    terms = ["w0000", "w0003", "w0007"]
    for mm in (1, 2, 3):
        got_d, _ = searcher.search_boolean(should=terms, min_should_match=mm,
                                           k=searcher.n_docs)
        exp = [i for i, tx in enumerate(texts)
               if sum(t in set(tokenize(tx)) for t in terms) >= mm]
        assert sorted(got_d.tolist()) == exp, mm
    # mm larger than clause count -> empty
    got_d, _ = searcher.search_boolean(should=terms, min_should_match=4, k=10)
    assert len(got_d) == 0
    # mm with MUST present restricts SHOULD
    got_d, _ = searcher.search_boolean(must=["w0001"], should=terms,
                                       min_should_match=2, k=searcher.n_docs)
    exp = [i for i, tx in enumerate(texts)
           if "w0001" in set(tokenize(tx))
           and sum(t in set(tokenize(tx)) for t in terms) >= 2]
    assert sorted(got_d.tolist()) == exp


def test_probe_matches_decode(searcher):
    _, _, cur = searcher.term_stats_and_cursor("w0000")
    d_all = cur.decode_all()[0]
    probe_ids = np.unique(np.concatenate([d_all[::3], d_all[::3] + 1, [0, searcher.n_docs + 10]]))
    mask, tfs, norms = cur.probe(probe_ids)
    expected = np.isin(probe_ids, d_all)
    assert np.array_equal(mask, expected)
    # tf/norm values for members match the decoded list
    _, tf_all, m_all = cur.decode_all()
    pos = np.searchsorted(d_all, probe_ids[mask])
    assert np.array_equal(tfs[mask], tf_all[pos])
    assert np.array_equal(norms[mask], m_all[pos])


def test_fuzzy_expansion_and_search(searcher, t1_table):
    from lucene_solr_ray.analysis import tokenize

    texts = _docid_order_texts(t1_table)
    vocab = set()
    for tx in texts:
        vocab.update(tokenize(tx))
    from lucene_solr_ray.pipelines.search import _levenshtein_leq

    for base, maxd in (("w0000", 1), ("w0010", 2)):
        got = set(searcher.expand_terms("fuzzy", f"{base}~{maxd}"))
        exp = {t for t in vocab if _levenshtein_leq(base, t, maxd)}
        assert got == exp, (base, maxd)
        d, _ = searcher.search_multi_term("fuzzy", f"{base}~{maxd}", k=searcher.n_docs)
        exp_docs = [i for i, tx in enumerate(texts) if set(tokenize(tx)) & exp]
        assert sorted(d.tolist()) == exp_docs


def test_levenshtein_leq_basic():
    from lucene_solr_ray.pipelines.search import _levenshtein_leq

    assert _levenshtein_leq("merge", "merge", 0)
    assert _levenshtein_leq("merge", "marge", 1)
    assert not _levenshtein_leq("merge", "marge", 0)
    assert _levenshtein_leq("merge", "mergers", 2)
    assert not _levenshtein_leq("merge", "mergers", 1)
    assert _levenshtein_leq("", "ab", 2)
    assert not _levenshtein_leq("", "abc", 2)


def test_ts_range_query(searcher, t1_table):
    import pyarrow.compute as pc

    idx = pc.sort_indices(t1_table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    ordered = t1_table.take(idx)
    ts = ordered.column("ts").to_numpy()
    lo, hi = np.datetime64("2026-01-01T02:00:00", "us"), np.datetime64("2026-01-01T05:00:00", "us")
    exp = np.flatnonzero((ts >= lo) & (ts < hi))
    got = searcher.search_ts_range(str(lo), str(hi))
    assert got.tolist() == exp.tolist()
    # composed with a term FILTER clause
    from lucene_solr_ray.analysis import tokenize

    texts = ordered.column("text").to_pylist()
    exp_f = [i for i in exp if "w0000" in set(tokenize(texts[i]))]
    got_f = searcher.search_ts_range(str(lo), str(hi), filter_terms=["w0000"])
    assert got_f.tolist() == exp_f


def test_suggesters(searcher, t1_table):
    from lucene_solr_ray.analysis import tokenize
    from lucene_solr_ray.pipelines.search import _levenshtein_leq

    texts = _docid_order_texts(t1_table)
    df = {}
    cf = {}
    for tx in texts:
        toks = tokenize(tx)
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    # spellcheck: distance asc, df desc, term asc
    got = searcher.suggest_spelling("w0001x", max_suggestions=5, max_edits=2)
    cand = []
    for t in df:
        for d in (1, 2):
            if _levenshtein_leq("w0001x", t, d):
                cand.append((t, d, df[t]))
                break
    cand.sort(key=lambda x: (x[1], -x[2], x[0]))
    assert got == cand[:5]
    # prefix suggester: cf desc, term asc
    got_p = searcher.suggest_prefix("w00", k=5)
    exp_p = sorted(((t, cf[t]) for t in cf if t.startswith("w00")),
                   key=lambda x: (-x[1], x[0]))[:5]
    assert got_p == exp_p


def test_term_vector(searcher, t1_table):
    from lucene_solr_ray.analysis import tokenize

    texts = _docid_order_texts(t1_table)
    for docid in (0, 5, len(texts) - 1):
        tv = searcher.term_vector(docid)
        exp = {}
        for t in tokenize(texts[docid]):
            exp[t] = exp.get(t, 0) + 1
        assert tv == sorted(exp.items())
    assert searcher.term_vector(10**9) == []


def test_cjk_bigram_analyzer():
    from lucene_solr_ray.analysis import cjk_bigram_tokenize

    assert cjk_bigram_tokenize("日本語テスト") == ["日本", "本語", "語テ", "テス", "スト"]
    assert cjk_bigram_tokenize("the 中文 word") == ["中文", "word"]
    assert cjk_bigram_tokenize("中") == ["中"]
    assert cjk_bigram_tokenize("plain text only") == ["plain", "text", "only"]


def test_iter_matches_streaming(searcher):
    """Windowed streaming match iterator == full search match set, for
    OR and AND, with windows small enough to force multiple chunks."""
    for mode in ("or", "and"):
        full, _ = searcher.search(["w0000", "w0001"], k=max(1, searcher.n_docs), mode=mode)
        expect = np.sort(full)
        for window in (64, 1 << 17):
            chunks = list(searcher.iter_matches(["w0000", "w0001"], mode=mode, window=window))
            got = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
            assert got.tolist() == expect.tolist(), (mode, window)
            assert all(np.all(np.diff(c) > 0) for c in chunks)
        assert len(list(searcher.iter_matches(["w0000", "w0001"], mode=mode, window=64))) > 1
    # absent term: AND yields nothing, OR equals the present term's list
    assert list(searcher.iter_matches(["w0000", "zz-absent"], mode="and")) == []
    d_or = np.concatenate(list(searcher.iter_matches(["w0000", "zz-absent"], mode="or")))
    d_full, _ = searcher.search(["w0000"], k=max(1, searcher.n_docs))
    assert d_or.tolist() == np.sort(d_full).tolist()


def test_stored_term_vectors_and_highlight(ray_session, t1_corpus, t1_table, tmp_path_factory):
    """store_term_vectors=True persists per-doc (term, tf, positions,
    offsets); term_vector is then served from the tvs files (no
    re-analysis) and highlight_doc marks exact character spans."""
    import os
    import unicodedata

    from lucene_solr_ray.analysis import tokenize, tokenize_with_positions
    from lucene_solr_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("tvidx") / "idx")
    build_index(t1_corpus, index_dir, num_partitions=4, salt=1,
                store_positions=True, store_term_vectors=True)
    assert os.path.isdir(os.path.join(index_dir, "tvs"))
    s = IndexSearcher(index_dir)
    texts = _docid_order_texts(t1_table)
    for docid in (0, 7, len(texts) - 1):
        text = unicodedata.normalize("NFC", texts[docid])
        # (term, tf) matches the canonical chain
        exp = {}
        for t in tokenize(text):
            exp[t] = exp.get(t, 0) + 1
        assert s.term_vector(docid) == sorted(exp.items())
        detail = s.term_vector_detail(docid)
        assert detail, "stored vectors must exist"
        # positions match the positional chain; offsets slice to the term
        exp_pos = {}
        for t, p in tokenize_with_positions(text):
            exp_pos.setdefault(t, []).append(p)
        for r in detail:
            assert r["positions"] == exp_pos[r["term"]]
            for st, en in zip(r["starts"], r["ends"]):
                assert text[st:en].lower() == r["term"]
    # highlight: every marked span is exactly a query-term occurrence
    probe_term = detail[0]["term"]
    hl = s.highlight_doc(len(texts) - 1, [probe_term])
    assert hl is not None and f"<em>" in hl
    stripped = hl.replace("<em>", "").replace("</em>", "")
    assert stripped == unicodedata.normalize("NFC", texts[len(texts) - 1])
    # index without vectors -> None (callers fall back)
    plain_dir = str(tmp_path_factory.mktemp("tvplain") / "idx")
    build_index(t1_corpus, plain_dir, num_partitions=4, salt=1)
    assert IndexSearcher(plain_dir).highlight_doc(0, [probe_term]) is None


def test_tv_component_and_free_text_suggest(ray_session):
    """TermVectorComponent rows == the text-derived oracle at sf0.001
    (positions/offsets/df from storage, never re-analysis); FreeText
    bigram suggestions ranked (count desc, term asc)."""
    import duckdb
    from lucene_solr_ray.functions import ft_oracle
    from lucene_solr_ray.functions.fulltext import free_text_suggest, tv_component

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    got = tv_component(sf, "vector", max_docs=20).to_pandas().reset_index(drop=True)
    exp = con.execute(ft_oracle.tv_component_sql("vector", max_docs=20)).fetchdf()
    assert got.equals(exp.astype(got.dtypes.to_dict()))
    assert (got["first_end"] - got["first_start"] == got["term"].str.len()).all()

    sug = free_text_suggest(sf, "merge", k=10).to_pandas()
    assert len(sug) == 10
    n = sug["n"].to_numpy()
    assert (n[:-1] >= n[1:]).all()  # count-desc order
    exp_sug = con.execute(
        "WITH docs AS (SELECT regexp_split_to_array(text, '\\s+') AS a FROM documents), "
        "bg AS (SELECT list_extract(a, i) AS w1, list_extract(a, i+1) AS w2 "
        "FROM docs, UNNEST(range(1, len(a))) AS t(i) WHERE len(a) >= 2) "
        "SELECT w2 AS next_term, CAST(COUNT(*) AS BIGINT) AS n FROM bg "
        "WHERE w1 = 'merge' GROUP BY 1 ORDER BY n DESC, next_term LIMIT 10").fetchdf()
    assert sug.reset_index(drop=True).equals(exp_sug.astype(sug.dtypes.to_dict()))


def test_word_break_multi_split_ranking(ray_session, tmp_path):
    """Two valid splits of one run-together term, ranked by max(df) desc
    then split position asc (the NUM_CHANGES_THEN_MAX_FREQUENCY order for
    single-break suggestions); too-short halves are never offered."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.fulltext import word_break_suggest

    texts = ["bab aa", "bab aab", "bab ab", "aab"]  # df: bab=3, aab=2, aa=1, ab=1
    tab = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = word_break_suggest(str(tmp_path), "aabab").to_pandas()
    # i=2 -> (aa, bab) max df 3; i=3 -> (aab, ab) max df 2; i in {2,3} only
    assert out["split_pos"].tolist() == [2, 3]
    assert out["left_term"].tolist() == ["aa", "aab"]
    assert out["right_term"].tolist() == ["bab", "ab"]
    assert out["df_left"].tolist() == [1, 2]
    assert out["df_right"].tolist() == [3, 1]
    assert out["sugg_rank"].tolist() == [0, 1]


def test_query_elevation_semantics(ray_session):
    """Elevated ids are pinned first in config order (forceElevation),
    excluded ids vanish, the rest follow BM25 order at retrieval depth
    k' = k + |elevated| + |excluded|."""
    from lucene_solr_ray.functions.fulltext import bm25_topk, elevation_topk

    sf = "/root/testdata/sf0.001"
    base = bm25_topk(sf, [("q", ["merge", "join"], "or")], k=13).to_pandas()
    base_ids = [int(x) for x in base["doc_id"]]
    excluded = [base_ids[0]]
    elevated = [499, base_ids[2]]
    out = elevation_topk(sf, ["merge", "join"], elevated, excluded, k=10).to_pandas()
    assert out["doc_id"].tolist()[:2] == elevated
    assert out["elevated"].tolist() == [1, 1] + [0] * (len(out) - 2)
    drop = set(elevated) | set(excluded)
    expect_rest = [d for d in base_ids if d not in drop][:8]
    assert out["doc_id"].tolist()[2:] == expect_rest
    assert excluded[0] not in out["doc_id"].tolist()


def test_boosting_demote_reorders_and_matchset_fixed(ray_session):
    """FunctionScoreQuery.boostByQuery demotion: factor 1.0 == plain BM25
    order; factor 0.5 reorders (demote term present in the corpus) but
    never changes the match SET — only scores scale."""
    from lucene_solr_ray.functions.fulltext import boosting_demote_topk

    sf = "/root/testdata/sf0.001"
    full = boosting_demote_topk(sf, ["merge", "join"], demote_factor=1.0,
                                k=10**6).to_pandas()
    dem = boosting_demote_topk(sf, ["merge", "join"], demote_factor=0.5,
                               k=10**6).to_pandas()
    assert sorted(full["doc_id"]) == sorted(dem["doc_id"])
    assert full["doc_id"].tolist() != dem["doc_id"].tolist()
