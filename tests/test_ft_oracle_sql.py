"""Scored-entry SQL oracles (functions/ft_oracle.py): DuckDB replicates
the engine's pinned float32 BM25 narrowing, so rank-only outputs match
bit-for-bit — plus the measured rank-stability gap bound that justifies
trusting DuckDB's ln() (the one op not guaranteed identical to libm).
"""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

BM25_QUERIES = [
    ("q-or-1", ["merge", "join"], "or"),
    ("q-or-2", ["window", "vector", "stream"], "or"),
    ("q-and-1", ["merge", "join"], "and"),
    ("q-single", ["spark"], "or"),
]


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return c


def _eq(eng, ora):
    e = eng.to_pandas().reset_index(drop=True)
    o = ora.df().reset_index(drop=True)
    assert list(e.columns) == list(o.columns), (list(e.columns), list(o.columns))
    for c in e.columns:
        assert e[c].astype(str).tolist() == o[c].astype(str).tolist(), c


def test_bm25_topk_matches_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk

    _eq(bm25_topk(SF, BM25_QUERIES, k=10), con.sql(FO.bm25_topk_sql(BM25_QUERIES, k=10)))


def test_phrase_dismax_mlt_ltr_match_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions import ltr
    from lucene_solr_ray.functions.fulltext import (
        dismax_topk,
        more_like_this_topk,
        phrase_topk,
    )

    _eq(phrase_topk(SF, ["merge", "join"], k=10),
        con.sql(FO.phrase_topk_sql(["merge", "join"], k=10)))
    _eq(dismax_topk(SF, ["merge", "join", "window"], 0.3, k=10),
        con.sql(FO.dismax_topk_sql(["merge", "join", "window"], 0.3, k=10)))
    _eq(more_like_this_topk(SF, doc_id=0, k=10),
        con.sql(FO.more_like_this_sql(0, 8, 10)))
    _eq(ltr.bm25_rescore(SF), con.sql(FO.ltr_bm25_rescore_sql(["merge", "sort"], 100, 20)))


def test_rerank_topk_matches_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import rerank_topk

    _eq(rerank_topk(SF, ["merge", "join"], ["vector"], weight=2.0, top_n=60, k=10),
        con.sql(FO.rerank_topk_sql(["merge", "join"], ["vector"],
                                   weight=2.0, top_n=60, k=10)))
    # weight=0 degenerates to the main query's own ranking
    from lucene_solr_ray.functions.fulltext import bm25_topk

    base = bm25_topk(SF, [("q", ["merge", "join"], "or")], k=10).to_pandas()
    rr = rerank_topk(SF, ["merge", "join"], ["vector"], weight=0.0,
                     top_n=60, k=10).to_pandas()
    assert rr["doc_id"].tolist() == base["doc_id"].tolist()


def test_common_terms_topk_matches_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import common_terms_topk

    # a threshold that splits the probe terms AND one that makes all
    # terms common (plain-OR fallback) — the SQL classifies dynamically
    for frac in (0.55, 0.99, 0.01):
        _eq(common_terms_topk(SF, ["merge", "join", "vector"],
                              max_df_frac=frac, k=10),
            con.sql(FO.common_terms_topk_sql(["merge", "join", "vector"],
                                             max_df_frac=frac, k=10)))


def test_rank_stability_gap_bound():
    """Adjacent ranked float32 scores are either EXACTLY equal (both
    sides tie-break by docid) or separated by > 2 float32 ulps — so a
    last-ulp float64 ln() divergence between DuckDB and libm (relative
    2^-52, five orders below one float32 ulp) cannot reorder ranks."""
    from lucene_solr_ray.functions.fulltext import docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    s = IndexSearcher(docs_index(SF))
    checked = 0
    for _qid, terms, mode in BM25_QUERIES:
        _d, sc = s.search(terms, k=s.n_docs, mode=mode)
        sc = sc.astype(np.float32)
        for a, b in zip(sc[:-1], sc[1:]):
            if a == b:
                continue
            gap = float(a) - float(b)
            ulp = float(np.spacing(a))
            assert gap > 2 * ulp, (float(a), float(b), gap, ulp)
            checked += 1
    assert checked > 100  # the bound was actually exercised


def test_lmdirichlet_topk_matches_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk

    _eq(bm25_topk(SF, BM25_QUERIES, k=10, similarity="lmdirichlet"),
        con.sql(FO.lmdirichlet_topk_sql(BM25_QUERIES, k=10)))


def test_lmdirichlet_clamp_margin_and_gap_bound():
    """The LM score clamps at 0: a last-ulp ln() divergence could flip
    the clamp only if some unclamped float64 score sat within ~1e-16 of
    zero. Measure: every nonzero score keeps a wide margin from the
    clamp boundary, and adjacent ranked scores keep the >2-ulp gap."""
    from lucene_solr_ray.functions.fulltext import docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    s = IndexSearcher(docs_index(SF), similarity="lmdirichlet")
    checked = 0
    for _qid, terms, mode in BM25_QUERIES:
        _d, sc = s.search(terms, k=s.n_docs, mode=mode)
        nz = sc[sc > 0].astype(np.float64)
        if len(nz):
            assert nz.min() > 1e-6, nz.min()  # far from the clamp boundary
        for a, b in zip(sc[:-1], sc[1:]):
            if a == b:
                continue
            gap = float(a) - float(b)
            ulp = float(np.spacing(max(a, np.float32(1e-30))))
            assert gap > 2 * ulp, (float(a), float(b), gap, ulp)
            checked += 1
    assert checked > 50


def test_unified_highlight_matches_duckdb_and_offsets(con):
    """Passage ranking matches the SQL replica (including char offsets —
    proving the stored-TV offsets equal the whitespace prefix sums on
    this corpus), and offsets slice real term occurrences."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import unified_highlight_topk

    got = unified_highlight_topk(SF, ["merge", "join", "vector"], k_docs=10)
    _eq(got, con.sql(FO.unified_highlight_sql(["merge", "join", "vector"], k_docs=10)))

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(texts["doc_id"], texts["text"]))
    qset = {"merge", "join", "vector"}
    for r in got.to_pylist():
        span = texts[r["doc_id"]][r["first_start"]:r["last_end"]]
        assert any(t in span.split() for t in qset), r
        assert r["score_micro"] > 0 and r["n_hits"] > 0


def test_feature_boost_matches_duckdb_and_reorders(con):
    """FeatureField saturation clause matches the SQL replica, and the
    feature genuinely reorders vs plain BM25 (weight high enough that
    long docs jump)."""
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk, feature_boost_topk

    got = feature_boost_topk(SF, ["merge", "join"], k=10)
    _eq(got, con.sql(FO.feature_boost_sql(["merge", "join"], k=10)))
    plain = bm25_topk(SF, [("fb-1", ["merge", "join"], "or")], k=10).to_pandas()
    assert got.to_pandas()["doc_id"].tolist() != plain["doc_id"].tolist()


def test_axiomatic_topk_matches_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk

    _eq(bm25_topk(SF, BM25_QUERIES, k=10, similarity="ax_f2exp"),
        con.sql(FO.axiomatic_topk_sql(BM25_QUERIES, k=10)))


def test_axiomatic_gap_bound():
    """AxiomaticF2EXP's one non-IEEE-pinned op is pow() in the term
    weight (libm vs DuckDB may differ in the last float64 ulp, relative
    2^-52 — five orders below a float32 ulp). Measure: adjacent ranked
    scores are exactly equal or separated by > 2 float32 ulps."""
    from lucene_solr_ray.functions.fulltext import docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    s = IndexSearcher(docs_index(SF), similarity="ax_f2exp")
    checked = 0
    for _qid, terms, mode in BM25_QUERIES:
        _d, sc = s.search(terms, k=s.n_docs, mode=mode)
        sc = sc.astype(np.float32)
        for a, b in zip(sc[:-1], sc[1:]):
            if a == b:
                continue
            gap = float(a) - float(b)
            ulp = float(np.spacing(a))
            assert gap > 2 * ulp, (float(a), float(b), gap, ulp)
            checked += 1
    assert checked > 100


def test_edismax_pf2_matches_duckdb_and_boosts(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk, edismax_pf2_topk

    got = edismax_pf2_topk(SF, ["merge", "join", "vector"], k=10)
    _eq(got, con.sql(FO.edismax_pf2_sql(["merge", "join", "vector"], k=10)))
    # the pf2 boost must actually reorder vs the plain OR query
    plain = bm25_topk(SF, [("e-1", ["merge", "join", "vector"], "or")], k=10).to_pandas()
    assert got.to_pandas()["doc_id"].tolist() != plain["doc_id"].tolist()


def test_gl2_topk_matches_duckdb(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk

    _eq(bm25_topk(SF, BM25_QUERIES, k=10, similarity="dfr_gl2"),
        con.sql(FO.dfr_gl2_topk_sql(BM25_QUERIES, k=10)))


def test_gl2_gap_bound():
    """DFR GL2's non-IEEE-pinned op is log2 (libm vs DuckDB last-ulp,
    relative 2^-52). Measure: adjacent ranked scores are exactly equal
    or separated by > 2 float32 ulps."""
    from lucene_solr_ray.functions.fulltext import docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    s = IndexSearcher(docs_index(SF), similarity="dfr_gl2")
    checked = 0
    for _qid, terms, mode in BM25_QUERIES:
        _d, sc = s.search(terms, k=s.n_docs, mode=mode)
        sc = sc.astype(np.float32)
        for a, b in zip(sc[:-1], sc[1:]):
            if a == b:
                continue
            gap = float(a) - float(b)
            ulp = float(np.spacing(a))
            assert gap > 2 * ulp, (float(a), float(b), gap, ulp)
            checked += 1
    assert checked > 100


def test_spl_topk_matches_duckdb_and_gap(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk, docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    _eq(bm25_topk(SF, BM25_QUERIES, k=10, similarity="ib_spl"),
        con.sql(FO.ib_spl_topk_sql(BM25_QUERIES, k=10)))
    s = IndexSearcher(docs_index(SF), similarity="ib_spl")
    checked = 0
    for _qid, terms, mode in BM25_QUERIES:
        _d, sc = s.search(terms, k=s.n_docs, mode=mode)
        sc = sc.astype(np.float32)
        for a, b in zip(sc[:-1], sc[1:]):
            if a == b:
                continue
            assert float(a) - float(b) > 2 * float(np.spacing(a))
            checked += 1
    assert checked > 100


def test_ine_topk_matches_duckdb_and_gap(con):
    from lucene_solr_ray.functions import ft_oracle as FO
    from lucene_solr_ray.functions.fulltext import bm25_topk, docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    _eq(bm25_topk(SF, BM25_QUERIES, k=10, similarity="dfr_ine_l2"),
        con.sql(FO.dfr_ine_topk_sql(BM25_QUERIES, k=10)))
    s = IndexSearcher(docs_index(SF), similarity="dfr_ine_l2")
    checked = 0
    for _qid, terms, mode in BM25_QUERIES:
        _d, sc = s.search(terms, k=s.n_docs, mode=mode)
        sc = sc.astype(np.float32)
        for a, b in zip(sc[:-1], sc[1:]):
            if a == b:
                continue
            assert float(a) - float(b) > 2 * float(np.spacing(a))
            checked += 1
    assert checked > 100
