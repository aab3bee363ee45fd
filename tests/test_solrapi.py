"""Solr request-handler pipeline (functions/solrapi.py, SURVEY §2.11):
QParserPlugin dispatch, fq parsing, pagination, facet/stats/highlight
components, and registry failure modes — all over the sf0.001 documents
index (cached under /tmp/lsr_cache by fulltext.docs_index)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def solr(ray_session):
    from lucene_solr_ray.functions import solrapi

    return solrapi


def test_match_all_with_fq(solr):
    out = solr.handle_request(SF, "/select", {
        "q": "*:*", "fq": "lang:en", "rows": "3", "fl": "doc_id,lang",
    })
    assert out["response"].num_rows == 3
    assert set(out["response"].column("lang").to_pylist()) == {"en"}
    # num_found == all en docs
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet') WHERE lang='en'"
    ).fetchone()[0]
    assert out["num_found"] == n


def test_fq_isin_and_intersection(solr):
    out = solr.handle_request(SF, "/select", {
        "q": "merge", "fq": ["lang:en", "source:(src1 src2)"],
        "rows": "1000", "fl": "doc_id,lang,source",
    })
    langs = set(out["response"].column("lang").to_pylist())
    sources = set(out["response"].column("source").to_pylist())
    assert langs <= {"en"} and sources <= {"src1", "src2"}


def test_pagination_bounds_and_global_rank(solr):
    full = solr.handle_request(SF, "/select", {"q": "merge join", "rows": "15"})
    page = solr.handle_request(SF, "/select", {"q": "merge join",
                                               "start": "5", "rows": "10"})
    assert page["response"].column("rank").to_pylist() == list(range(5, 15))
    assert (page["response"].column("doc_id").to_pylist()
            == full["response"].column("doc_id").to_pylist()[5:15])
    beyond = solr.handle_request(SF, "/select", {
        "q": "merge join", "start": str(full["num_found"] + 10), "rows": "10"})
    assert beyond["response"].num_rows == 0
    assert beyond["num_found"] == full["num_found"]


def test_field_sort_matches_score_sort_match_set(solr):
    by_field = solr.handle_request(SF, "/select", {
        "q": "spark", "sort": "n_chars desc", "rows": "10",
        "fl": "doc_id,n_chars"})
    # same request through the standalone TopFieldCollector entry
    from lucene_solr_ray.functions import fulltext as ft

    ref = ft.sorted_by_field_topk(SF, ["spark"], "n_chars", k=10)
    assert (by_field["response"].column("doc_id").to_pylist()
            == ref.column("doc_id").to_pylist())


def test_facet_range_includes_empty_buckets(solr):
    out = solr.handle_request(SF, "/select", {
        "q": "merge", "rows": "0", "facet": "true",
        "facet.range": "n_chars",
        "f.n_chars.facet.range.start": "0",
        "f.n_chars.facet.range.end": "1000",
        "f.n_chars.facet.range.gap": "250",
    })
    fc = out["facet_counts"]
    assert fc.column("value").to_pylist() == ["0", "250", "500", "750"]
    counts = fc.column("count").to_pylist()
    assert counts[-1] == 0  # no 750+ docs in this corpus
    assert sum(counts) <= out["num_found"]


def test_stats_component_sums(solr):
    out = solr.handle_request(SF, "/select", {
        "q": "*:*", "rows": "0", "stats": "true", "stats.field": "n_chars"})
    import duckdb

    n, s = duckdb.sql(
        f"SELECT COUNT(*), SUM(n_chars) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()
    row = out["stats"].to_pylist()[0]
    assert row["n"] == n and row["sum"] == s and row["n_missing"] == 0


def test_highlight_roundtrip_and_terms(solr):
    out = solr.handle_request(SF, "/select", {
        "q": "merge join", "rows": "3", "hl": "true"})
    hl = out["highlighting"].to_pylist()
    assert len(hl) == 3
    for row in hl:
        plain = row["snippet"].replace("<em>", "").replace("</em>", "")
        # every marked span is exactly a query term (offsets == token spans)
        import re

        marked = re.findall(r"<em>([^<]*)</em>", row["snippet"])
        assert marked and set(marked) <= {"merge", "join"}
        assert " " not in "".join(marked)
        assert plain  # strip-tags reproduces a real text


def test_dismax_rejects_fq_and_matches_entry(solr):
    with pytest.raises(ValueError, match="dismax"):
        solr.handle_request(SF, "/select", {
            "defType": "dismax", "q": "merge", "fq": "lang:en"})
    from lucene_solr_ray.functions import fulltext as ft

    out = solr.handle_request(SF, "/select", {
        "defType": "dismax", "q": "merge join window", "tie": "0.3", "rows": "10"})
    ref = ft.dismax_topk(SF, ["merge", "join", "window"], 0.3, k=10)
    assert (out["response"].column("doc_id").to_pylist()
            == ref.column("doc_id").to_pylist())


def test_registry_failures(solr):
    with pytest.raises(KeyError, match="RequestHandler"):
        solr.handle_request(SF, "/nope", {"q": "merge"})
    with pytest.raises(ValueError, match="defType"):
        solr.handle_request(SF, "/select", {"q": "merge", "defType": "edismax"})
    with pytest.raises(ValueError, match="SearchComponents"):
        solr.SearchHandler(components=("query", "mystery"))
    with pytest.raises(ValueError, match="facet.field"):
        solr.handle_request(SF, "/select", {
            "q": "merge", "facet": "true", "facet.field": "n_chars"})
