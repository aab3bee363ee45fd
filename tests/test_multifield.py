"""Multi-field indexing: per-field analyzers/postings/norms/stats +
fielded DisMax / Boolean-sum search, against a brute-force numpy oracle
built from the SAME similarity/norms code (parity-by-shared-code)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def mf_corpus(tmp_path_factory):
    """80 docs with a short stop-heavy Title (standard analyzer drops
    stopwords + lowercases) and a cased body (whitespace analyzer keeps
    BOTH case and stopwords) — the two chains disagree on dl, df and
    the term space, so any cross-field leakage breaks parity."""
    rng = np.random.default_rng(7)
    words = ["Merge", "vector", "INDEX", "shard", "query", "the", "a",
             "of", "token", "Stream", "replica", "codec"]
    rows = []
    for i in range(80):
        title = " ".join(rng.choice(words, size=4))
        body = " ".join(rng.choice(words, size=rng.integers(8, 30)))
        rows.append({"conv_id": f"c{i:04d}", "turn_idx": 0,
                     "title": title, "body": body})
    path = tmp_path_factory.mktemp("mf") / "docs.parquet"
    pq.write_table(pa.Table.from_pylist(rows), str(path))
    return str(path)


@pytest.fixture(scope="module")
def mf_index(ray_session, mf_corpus, tmp_path_factory):
    from lucene_solr_ray.pipelines.multifield import build_multifield_index

    index_dir = str(tmp_path_factory.mktemp("mfidx"))
    man = build_multifield_index(
        mf_corpus, index_dir,
        fields={"title": {"column": "title", "analyzer": "standard"},
                "body": {"column": "body", "analyzer": "whitespace"}},
        num_partitions=4, salt=2,
    )
    assert set(man["fields"]) == {"title", "body"}
    return index_dir


def _brute_field_scores(texts, raw_terms, analyzer_fn, query_analyzer_fn):
    """Per-field BM25 replication from the shared engine modules
    (analysis chain, byte4 norms, similarity float tree)."""
    from lucene_solr_ray.codec.norms import DECODED_TABLE, encode_dl
    from lucene_solr_ray import similarity as sim

    toks = [analyzer_fn(t or "") for t in texts]
    dl = np.array([len(x) for x in toks], np.int64)
    n = len(texts)
    sum_dl = int(dl.sum())
    avgdl = sum_dl / n
    cache = sim.BM25.denom_cache(avgdl)
    norm_bytes = encode_dl(dl)
    qterms = sorted({t for raw in raw_terms for t in query_analyzer_fn(raw)},
                    key=lambda t: t.encode("utf-8"))
    score = np.zeros(n, np.float32)
    matched = np.zeros(n, bool)
    for t in qterms:
        tf = np.array([x.count(t) for x in toks], np.int64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        w = sim.BM25.term_weight(n, df)
        s = np.where(tf > 0,
                     sim.BM25.score_term(w, tf, norm_bytes, cache),
                     np.float32(0.0)).astype(np.float32)
        score = (score.astype(np.float64) + s.astype(np.float64)).astype(np.float32)
        matched |= tf > 0
    return score, matched


def _brute(mf_corpus, field_terms, k, combine):
    from lucene_solr_ray.analysis import tokenize, whitespace_tokenize

    t = pq.read_table(mf_corpus)
    titles = t.column("title").to_pylist()
    bodies = t.column("body").to_pylist()
    n = t.num_rows
    s_title, m_title = _brute_field_scores(
        titles, field_terms.get("title", []), tokenize, tokenize)
    s_body, m_body = _brute_field_scores(
        bodies, field_terms.get("body", []), whitespace_tokenize,
        whitespace_tokenize)
    matched = m_title | m_body
    if combine == "dismax":
        score = np.maximum(s_title, s_body)
    else:
        score = (s_title.astype(np.float64)
                 + s_body.astype(np.float64)).astype(np.float32)
    docids = np.flatnonzero(matched).astype(np.int64)
    sc = score[docids]
    order = np.lexsort((docids, -sc.astype(np.float64)))[:k]
    return docids[order], sc[order]


QUERIES = [
    {"title": ["merge"], "body": ["Merge"]},          # case split across chains
    {"title": ["the", "vector"], "body": ["the"]},    # stopword: dropped in title, real term in body
    {"title": ["index", "codec"], "body": ["INDEX", "query"]},
    {"title": ["shard"], "body": []},
    {"title": [], "body": ["Stream", "replica"]},
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
@pytest.mark.parametrize("combine", ["dismax", "sum"])
def test_multifield_parity(ray_session, mf_corpus, mf_index, qi, combine):
    from lucene_solr_ray.pipelines.multifield import MultiFieldSearcher

    ft = QUERIES[qi]
    s = MultiFieldSearcher(mf_index)
    if combine == "dismax":
        d, sc = s.search_dismax(ft, k=15)
    else:
        d, sc = s.search_sum(ft, k=15)
    # conv-base docid == row order of the (conv_id-sorted) corpus; the
    # fixture writes conv_ids pre-sorted so docid == row index
    bd, bsc = _brute(mf_corpus, ft, 15, combine)
    assert d.tolist() == bd.tolist()
    assert np.array_equal(sc, bsc.astype(np.float32))


def test_multifield_fields_disagree(ray_session, mf_index):
    """The two chains really disagree: 'the' exists in body's term space
    (df>0) but not title's; 'Merge' only matches body (case)."""
    from lucene_solr_ray.pipelines.multifield import MultiFieldSearcher

    s = MultiFieldSearcher(mf_index)
    d_t, _ = s.searchers["title"].search(["the"], k=100)
    d_b, _ = s.searchers["body"].search(["the"], k=100)
    assert len(d_t) == 0 and len(d_b) > 0
    d_bm, _ = s.searchers["body"].search(["Merge"], k=100)
    d_bl, _ = s.searchers["body"].search(["merge"], k=100)
    assert set(d_bm.tolist()).isdisjoint(d_bl.tolist())
    # per-field stats really come from each sub-index
    assert s.searchers["title"].sum_dl != s.searchers["body"].sum_dl


def test_multifield_unknown_field_raises(ray_session, mf_index):
    from lucene_solr_ray.pipelines.multifield import MultiFieldSearcher

    with pytest.raises(ValueError, match="unknown field"):
        MultiFieldSearcher(mf_index).search_dismax({"nope": ["x"]})


def test_multifield_qf_boosts_parity_and_discrimination(ray_session, mf_corpus, mf_index):
    """edismax qf boosts: f32(boost64*score64) per field before the max
    — parity vs the brute oracle with the same op, and the boosts
    actually flip rankings vs unboosted DisMax."""
    from lucene_solr_ray.analysis import tokenize, whitespace_tokenize
    from lucene_solr_ray.pipelines.multifield import MultiFieldSearcher

    ft = {"title": ["merge", "vector"], "body": ["Merge", "token"]}
    boosts = {"title": 0.25, "body": 4.0}
    s = MultiFieldSearcher(mf_index)
    d, sc = s.search_dismax(ft, k=20, boosts=boosts)
    d0, _ = s.search_dismax(ft, k=20)

    t = pq.read_table(mf_corpus)
    s_t, m_t = _brute_field_scores(t.column("title").to_pylist(),
                                   ft["title"], tokenize, tokenize)
    s_b, m_b = _brute_field_scores(t.column("body").to_pylist(),
                                   ft["body"], whitespace_tokenize,
                                   whitespace_tokenize)
    s_t = (np.float64(boosts["title"]) * s_t.astype(np.float64)).astype(np.float32)
    s_b = (np.float64(boosts["body"]) * s_b.astype(np.float64)).astype(np.float32)
    score = np.maximum(s_t, s_b)
    docids = np.flatnonzero(m_t | m_b).astype(np.int64)
    order = np.lexsort((docids, -score[docids].astype(np.float64)))[:20]
    assert d.tolist() == docids[order].tolist()
    assert np.array_equal(sc, score[docids][order])
    assert d.tolist() != d0.tolist()  # the boosts change the ranking


def test_fielded_query_string_parse(ray_session, mf_index):
    """'title:foo OR body:bar' string syntax == the dict API; bare terms
    and unknown fields fail loudly."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, parse_fielded_query)

    s = MultiFieldSearcher(mf_index)
    d1, sc1 = s.search_parsed("title:merge OR body:Merge body:token", k=15)
    d2, sc2 = s.search_sum({"title": ["merge"], "body": ["Merge", "token"]}, k=15)
    assert d1.tolist() == d2.tolist()
    assert np.array_equal(sc1, sc2)
    with pytest.raises(ValueError, match="bare term"):
        parse_fielded_query("merge", ("title", "body"))
    with pytest.raises(ValueError, match="unknown field"):
        parse_fielded_query("subject:merge", ("title", "body"))


def test_multifield_delete_and_merge(ray_session, mf_corpus, tmp_path_factory):
    """Deletes tombstone the doc in EVERY field sub-index (it vanishes
    from fielded results even when only one field matched it), and a
    per-field merge round preserves parity."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, build_multifield_index, multifield_delete_docs,
        multifield_merge_round)

    index_dir = str(tmp_path_factory.mktemp("mfdel"))
    build_multifield_index(
        mf_corpus, index_dir,
        fields={"title": {"column": "title", "analyzer": "standard"},
                "body": {"column": "body", "analyzer": "whitespace"}},
        num_partitions=4, salt=2,
    )
    ft = {"title": ["merge", "index"], "body": ["token", "Stream"]}
    s0 = MultiFieldSearcher(index_dir)
    d0, sc0 = s0.search_dismax(ft, k=30)
    assert len(d0) >= 3
    victims = d0[:2].tolist()
    res = multifield_delete_docs(index_dir, victims)
    assert set(res) == {"title", "body"}
    s1 = MultiFieldSearcher(index_dir)
    d1, sc1 = s1.search_dismax(ft, k=30)
    assert set(victims).isdisjoint(d1.tolist())
    # survivors keep their exact scores (deletes don't change stats)
    # (the post-delete top-30 backfills docs from beyond the original
    # top-30, so only the surviving prefix is comparable)
    keep = [i for i, d in enumerate(d0.tolist()) if d not in victims]
    assert d1.tolist()[:len(keep)] == [d0[i] for i in keep]
    assert np.array_equal(sc1[:len(keep)], sc0[keep])
    # merge every field, re-check identical post-delete results
    multifield_merge_round(index_dir, segs_per_tier=1, max_merge_at_once=8)
    s2 = MultiFieldSearcher(index_dir)
    d2, sc2 = s2.search_dismax(ft, k=30)
    assert d2.tolist() == d1.tolist()
    assert np.array_equal(sc2, sc1)


def test_multifield_tlog_soft_commit(ray_session, mf_corpus, tmp_path_factory):
    """NRT micro-batch ingest into a multifield index: the shared log
    folds into EVERY field sub-index (per-field analyzers applied),
    docids stay aligned, a second soft commit is a no-op, and a
    partial-commit crash (one field's marker missing) heals on replay."""
    import json as _json
    import os as _os

    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, build_multifield_index, multifield_soft_commit,
        multifield_tlog_append)

    index_dir = str(tmp_path_factory.mktemp("mftlog"))
    build_multifield_index(
        mf_corpus, index_dir,
        fields={"title": {"column": "title", "analyzer": "standard"},
                "body": {"column": "body", "analyzer": "whitespace"}},
        num_partitions=4, salt=2,
    )
    batch = pa.Table.from_pylist([
        {"conv_id": "zz0001", "turn_idx": 0,
         "title": "zzztitle alpha", "body": "ZZZBODY beta the"},
        {"conv_id": "zz0002", "turn_idx": 0,
         "title": "zzztitle gamma", "body": "ZZZBODY delta"},
    ])
    multifield_tlog_append(index_dir, batch)
    out = multifield_soft_commit(index_dir)
    assert set(out) == {"title", "body"}
    assert len(set(out.values())) == 1 and list(out.values())[0] == 82
    s = MultiFieldSearcher(index_dir)
    d_t, _ = s.searchers["title"].search(["zzztitle"], k=10)
    d_b, _ = s.searchers["body"].search(["ZZZBODY"], k=10)
    # results are score-ordered; docid ALIGNMENT = same match sets
    assert len(d_t) == 2 and sorted(d_t.tolist()) == sorted(d_b.tolist())
    # fielded dismax sees the new docs
    d, _ = s.search_dismax({"title": ["zzztitle"], "body": ["ZZZBODY"]}, k=10)
    assert len(d) == 2
    # idempotent: nothing pending -> no-op
    out2 = multifield_soft_commit(index_dir)
    assert out2 == out
    # partial-commit crash: body's marker vanishes -> only body replays
    _os.unlink(_os.path.join(index_dir, "tlog", ".consumed-upto-body"))
    with pytest.raises(RuntimeError, match="disagree"):
        # body re-appends the batch -> 84 vs title 82: the guard trips
        multifield_soft_commit(index_dir)


def test_multifield_check_index(ray_session, mf_index):
    """CheckIndex over a fields.json root: every sub-index validates and
    the cross-field n_docs invariant holds; a secondary field's missing
    docs/ is by design and reports no problem."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/check_index.py", mf_index],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK: no problems found" in r.stdout
    assert "field 'title'" in r.stdout and "field 'body'" in r.stdout


def test_multifield_full_lifecycle(ray_session, mf_corpus, tmp_path_factory):
    """Capstone: the whole multi-field lifecycle composes — build ->
    fielded query-string search -> whole-doc delete -> NRT append ->
    per-field merge -> search again, with exact invariants at each step."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, build_multifield_index, multifield_delete_docs,
        multifield_merge_round, multifield_soft_commit, multifield_tlog_append)

    index_dir = str(tmp_path_factory.mktemp("mflife"))
    build_multifield_index(
        mf_corpus, index_dir,
        fields={"title": {"column": "title", "analyzer": "standard"},
                "body": {"column": "body", "analyzer": "whitespace"}},
        num_partitions=4, salt=2,
    )
    q = "title:merge OR body:token"
    s = MultiFieldSearcher(index_dir)
    d0, sc0 = s.search_parsed(q, k=50)
    assert len(d0) > 3

    # delete the top hit everywhere
    victim = int(d0[0])
    multifield_delete_docs(index_dir, [victim])
    s = MultiFieldSearcher(index_dir)
    d1, _ = s.search_parsed(q, k=50)
    assert victim not in d1.tolist()

    # NRT append a doc matching both fields
    batch = pa.Table.from_pylist([
        {"conv_id": "zz9001", "turn_idx": 0,
         "title": "merge merge merge", "body": "token token token token"}])
    multifield_tlog_append(index_dir, batch)
    multifield_soft_commit(index_dir)
    s = MultiFieldSearcher(index_dir)
    d2, sc2 = s.search_parsed(q, k=50)
    new_doc = 80  # appended after the 80-doc base
    assert new_doc in d2.tolist()
    # the tf-heavy new doc should rank first
    assert int(d2[0]) == new_doc

    # merge every field; results identical post-merge
    multifield_merge_round(index_dir, segs_per_tier=1, max_merge_at_once=8)
    s = MultiFieldSearcher(index_dir)
    d3, sc3 = s.search_parsed(q, k=50)
    assert d3.tolist() == d2.tolist()
    assert np.array_equal(sc3, sc2)
