"""Streaming-expression text language (functions/streamexpr.py):
parser grammar, registry dispatch, and execution equivalence against
plain DuckDB over the sf0.001 documents table."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def se(ray_session):
    from lucene_solr_ray.functions import streamexpr

    return streamexpr


def test_parser_nested_named_positional(se):
    n = se.parse_expr(
        'rollup(search(documents, q="a b", fl="x,y"), over="x", count(*), sum(y))'
    )
    assert n.name == "rollup" and n.kwargs["over"] == "x"
    inner = n.args[0]
    assert inner.name == "search" and inner.args == ["documents"]
    assert inner.kwargs == {"q": "a b", "fl": "x,y"}
    metrics = n.args[1:]
    assert [m.name for m in metrics] == ["count", "sum"]
    assert metrics[0].args == ["*"] and metrics[1].args == ["y"]


def test_parser_whitespace_and_quotes(se):
    n = se.parse_expr('top( select( search(documents , q="lang:en (x)") ), n=5, sort="a desc" )')
    assert n.name == "top" and n.kwargs["n"] == "5"
    assert n.args[0].args[0].kwargs["q"] == "lang:en (x)"  # parens inside quotes


def test_parser_failures(se):
    with pytest.raises(ValueError, match="trailing"):
        se.parse_expr("search(documents)x")
    with pytest.raises(ValueError, match="unterminated"):
        se.parse_expr("search(documents")
    with pytest.raises(ValueError, match="unknown stream function"):
        se.run_stream(SF, "frobnicate(documents)")
    with pytest.raises(ValueError, match="unknown metric"):
        se.run_stream(SF, 'rollup(search(documents), over="lang", median(n_chars))')
    with pytest.raises(ValueError, match="collection"):
        se.run_stream(SF, 'search(lineitem, q="x")')


def test_search_rollup_matches_duckdb(se):
    got = se.run_stream(
        SF,
        'rollup(search(documents, q="vector", fl="lang,n_chars"), '
        'over="lang", count(*), sum(n_chars), min(n_chars), max(n_chars))',
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    exp = duckdb.sql(
        f"""SELECT lang, COUNT(*) AS count, SUM(n_chars) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
            FROM read_parquet('{SF}/documents.parquet')
            WHERE list_contains(regexp_split_to_array(text, '\\s+'), 'vector')
            GROUP BY lang ORDER BY lang"""
    ).df()
    assert got["lang"].tolist() == exp["lang"].tolist()
    for c in ("count", "sum_n_chars", "min_n_chars", "max_n_chars"):
        assert got[c].astype(int).tolist() == exp[c].astype(int).tolist()


def test_having_filters_and_sort_orders(se):
    got = se.run_stream(
        SF,
        'sort(having(rollup(search(documents, q="*:*", fl="source,n_chars"), '
        'over="source", count(*)), gt(count, 24)), by="count desc, source asc")',
    ).to_pandas()
    assert (got["count"] > 24).all()
    assert got["count"].is_monotonic_decreasing


def test_stream_facet_matches_rollup_of_search(ray_session):
    """facet() == rollup(search(...)) over the same buckets/metrics."""
    from lucene_solr_ray.functions.streamexpr import run_stream

    sf = "/root/testdata/sf0.001"
    f = run_stream(
        sf, 'facet(documents, q="merge", buckets="lang", '
            'bucketSorts="lang asc", count(*), sum(n_chars))').to_pandas()
    r = run_stream(
        sf, 'sort(rollup(search(documents, q="merge", fl="lang,n_chars"), '
            'over="lang", count(*), sum(n_chars)), by="lang asc")').to_pandas()
    assert f[["lang", "count", "sum_n_chars"]].values.tolist() == \
        r[["lang", "count", "sum_n_chars"]].values.tolist()


def test_stream_merge_keeps_duplicates_and_fetch_enriches(ray_session):
    from lucene_solr_ray.functions.streamexpr import run_stream

    sf = "/root/testdata/sf0.001"
    a = run_stream(sf, 'search(documents, q="merge", fl="doc_id")').to_pandas()
    b = run_stream(sf, 'search(documents, q="vector", fl="doc_id")').to_pandas()
    m = run_stream(
        sf, 'merge(search(documents, q="merge", fl="doc_id"), '
            'search(documents, q="vector", fl="doc_id"), on="doc_id asc")').to_pandas()
    assert len(m) == len(a) + len(b)  # MergeStream never dedupes
    fe = run_stream(
        sf, 'fetch(documents, top(search(documents, q="merge", fl="doc_id"), '
            'n=5, sort="doc_id asc"), on="doc_id", fl="lang")').to_pandas()
    assert list(fe.columns) == ["doc_id", "lang"] and len(fe) == 5
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    want = docs.set_index("doc_id").loc[fe["doc_id"]]["lang"].tolist()
    assert fe["lang"].tolist() == want


def test_select_evaluators(ray_session):
    """SelectStream computed outputs: evaluator tree with 'as' alias."""
    import numpy as np
    import pyarrow.dataset as pads

    from lucene_solr_ray.functions.streamexpr import parse_expr, run_stream

    node = parse_expr('select(search(documents, q="*:*", fl="doc_id,n_chars"), '
                      '"doc_id", if(gt(n_chars, 150), 1, 0) as big)')
    alias = node.args[2]
    assert alias.name == "__as" and alias.args[1] == "big"
    assert alias.args[0].name == "if" and alias.args[0].args[0].name == "gt"

    sf = "/root/testdata/sf0.001"
    got = run_stream(
        sf, 'sort(select(search(documents, q="*:*", fl="doc_id,n_chars"), '
        '"doc_id", sub(div(n_chars, 3), 4) as v), by="doc_id asc")').to_pandas()
    tab = pads.dataset(f"{sf}/documents.parquet", format="parquet").to_table(
        columns=["doc_id", "n_chars"]).to_pandas().sort_values("doc_id")
    want = (tab["n_chars"].to_numpy() // 3 - 4)
    assert np.array_equal(got["v"].to_numpy(), want)


def test_timeseries_and_random_streams(ray_session):
    import numpy as np
    import pyarrow.dataset as pads

    from lucene_solr_ray.functions.streamexpr import run_stream

    sf = "/root/testdata/sf0.001"
    ts = run_stream(
        sf, 'timeseries(documents, q="*:*", field="ts", gap="+1MINUTES", '
        "count(*))").to_pandas()
    # ts = 2026-01-01 + doc_id seconds, 500 docs -> buckets of 60 docs
    assert ts["count"].sum() == 500
    assert (np.diff(ts["bucket_us"].to_numpy()) == 60_000_000).all()
    assert set(ts["count"].tolist()[:-1]) == {60}

    rnd = run_stream(sf, 'random(documents, q="*:*", fl="doc_id", pct=10)').to_pandas()
    ids = pads.dataset(f"{sf}/documents.parquet", format="parquet").to_table(
        columns=["doc_id"]).column("doc_id").to_numpy()
    want = np.sort(ids[(ids * 2654435761) % 4294967296 < (4294967296 * 10) // 100])
    assert np.array_equal(rnd["doc_id"].to_numpy(), want)


def test_text_logit_train_separates_planted_corpus(ray_session, tmp_path):
    """train()/classify() (TextLogitStream mechanism): on a perfectly
    separable planted corpus ('join' <=> 'merge' label) the trained
    weight for the predictive term must dominate and classify() must
    predict every doc correctly after 3 iterations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.classify import (
        text_logit_classify, text_logit_train)

    texts, labels = [], []
    for i in range(200):
        pos = i % 2 == 0
        base = "batch scan row" if i % 3 else "hash sort table"
        texts.append(base + (" join merge" if pos else " window"))
        labels.append(1 if pos else 0)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    w = text_logit_train(str(tmp_path)).to_pandas().set_index("feature")[
        "weight_micro"]
    assert w["join"] > 0 and w["join"] >= w.drop("__bias__").abs().max()

    got = text_logit_classify(str(tmp_path)).to_pandas()
    assert (got["predicted"].to_numpy() == labels).all()
    # determinism: a second run reproduces every micro-int exactly
    again = text_logit_classify(str(tmp_path)).to_pandas()
    assert (got["prob_micro"].to_numpy() == again["prob_micro"].to_numpy()).all()


def test_let_col_tuple_math_program(se, ray_session):
    """let() binds in order; col() extracts; evaluators are exact ints."""
    out = se.stream_expr_let_math("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n"] >= 1 and r["sum_diff"] == r["sum_a"] - r["sum_b"]
    assert r["mean_a_micro"] == (r["sum_a"] * 1_000_000) // r["n"]


def test_reduce_group_topn(se, ray_session):
    """reduce()+group(): per-key top-n by the group sort, doc_id ties."""
    import duckdb

    got = se.stream_expr_reduce("/root/testdata/sf0.001").to_pandas()
    exp = duckdb.sql(
        "SELECT doc_id, lang, n_chars FROM ("
        "SELECT doc_id, lang, n_chars, ROW_NUMBER() OVER ("
        "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
        "FROM '/root/testdata/sf0.001/documents.parquet') WHERE rn <= 2"
    ).to_df()
    g = got.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    e = exp.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    assert (g["doc_id"].to_numpy() == e["doc_id"].to_numpy()).all()


def test_math_evaluators_cov_variance_percentile(ray_session):
    """cov/variance (sample, micro-units, truncating div), nearest-rank
    percentile, ebeMultiply — against hand-computed exact values."""
    from lucene_solr_ray.functions.streamexpr import Node, _eval_math

    ctx = {"vars": {"a": [1, 2, 3, 4], "b": [2, 4, 6, 9], "one": [7]}}

    def ev(name, *args):
        return _eval_math(Node(name, list(args), {}), ctx)

    # cov: n=4, sxy=2+8+18+36=64, sx=10, sy=21 -> (256-210)*1e6 // 12
    assert ev("cov", "a", "b") == (4 * 64 - 10 * 21) * 1_000_000 // 12
    # variance: sxx=30 -> (120-100)*1e6 // 12 = 1666666
    assert ev("variance", "a") == 1_666_666
    assert ev("cov", "one", "one") == 0 and ev("variance", "one") == 0
    # nearest-rank: p50 of [1,2,3,4] -> rank ceil(2.0)=2 -> 2; p90 -> 4
    assert ev("percentile", "a", 50) == 2
    assert ev("percentile", "a", 90) == 4
    assert ev("percentile", "one", 99) == 7
    assert ev("ebeMultiply", "a", "b") == [2, 8, 18, 36]
