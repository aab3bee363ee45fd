"""Round-5 scale guards: PMI min-df candidate prune (exact by
pigeonhole) and the exact-cosine anchor size guard."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_pmi_pruned_equals_unpruned(ray_session):
    """The df>=min_pairs candidate prune is exact: c(ab) <= min(df_a, df_b),
    so no pair with a pruned member can reach the output threshold."""
    from lucene_solr_ray.functions.textstats import pmi_term_pairs

    diag: dict = {}
    pruned = pmi_term_pairs(SF, min_pairs=5, k=20, prune=True, diag=diag)
    unpruned = pmi_term_pairs(SF, min_pairs=5, k=20, prune=False)
    assert pruned.equals(unpruned)
    # closed gate vocab: every term clears min_pairs, so nothing prunes
    # here (the open-vocab test below proves the prune itself)
    assert 0 < diag["n_candidates"] <= diag["n_vocab"]


def test_pmi_open_vocab_pair_domain_bounded(ray_session, tmp_path):
    """Synthetic open-vocab corpus: 600 singleton terms + 6 hot terms.
    The candidate vocabulary must collapse to the hot terms, bounding
    the pair domain at hot^2 instead of vocab^2."""
    from lucene_solr_ray.functions.textstats import pmi_term_pairs

    hot = [f"hot{i}" for i in range(6)]
    texts = []
    for d in range(60):
        # every doc carries all hot terms plus 10 unique singletons
        uniq = " ".join(f"rare{d}_{j}" for j in range(10))
        texts.append(" ".join(hot) + " " + uniq)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    diag: dict = {}
    out = pmi_term_pairs(str(tmp_path), min_pairs=20, k=50, prune=True, diag=diag)
    assert diag["n_vocab"] >= 600
    assert diag["n_candidates"] == len(hot)
    # all hot-pair combinations co-occur in all 60 docs
    assert out.num_rows == len(hot) * (len(hot) - 1) // 2
    assert set(out.column("n_docs_both").to_pylist()) == {60}


def test_cosine_anchor_size_guard(ray_session, tmp_path, monkeypatch):
    from lucene_solr_ray.functions import dedup

    # under the limit: runs (gate corpus is small)
    small = dedup.embedding_cosine_pairs(SF, threshold=0.42)
    n_small = small.count()
    # force the guard low: must raise, and must not have read any vectors
    with pytest.raises(ValueError, match="max_exact_rows"):
        dedup.embedding_cosine_pairs(SF, threshold=0.42, max_exact_rows=1)
    # auto-dispatch path returns the LSH shape instead
    lsh = dedup.embedding_cosine_pairs(
        SF, threshold=0.42, max_exact_rows=1, on_overflow="lsh"
    )
    df = lsh.to_pandas()
    exact = small.to_pandas()
    # LSH is a subset-with-high-recall of the exact anchor on this corpus
    exact_set = set(zip(exact["doc_a"], exact["doc_b"])) if n_small else set()
    lsh_set = set(zip(df["doc_a"], df["doc_b"])) if len(df) else set()
    assert lsh_set <= exact_set


def test_shape_polygon_relation_all_classes(ray_session):
    """Polygon-vs-shape relate: all three relation classes occur at the
    gate sf and the per-edge SAT agrees with DuckDB running the
    generated oracle (same vertex list)."""
    import duckdb

    from lucene_solr_ray.functions import geo

    mine = geo.shape_polygon_relation(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    want = con.sql(geo.shape_polygon_relation_sql()).df()
    assert set(mine["relation"]) == {"WITHIN", "INTERSECTS", "DISJOINT"}
    assert (mine["c_custkey"].to_numpy() == want["c_custkey"].to_numpy()).all()
    assert (mine["relation"].to_numpy() == want["relation"].to_numpy()).all()


def test_ws_token_counts_split_parity():
    """Vectorized whitespace token counter == len(str.split()) exactly,
    including every code point Python considers whitespace (unicode ws
    rows take the per-row fallback; ASCII stays pure numpy)."""
    import sys

    import pyarrow as pa

    from lucene_solr_ray.functions.curation import ws_token_counts

    py_ws = [chr(c) for c in range(sys.maxunicode + 1) if chr(c).isspace()]
    probes = ["a b  c", "", "   ", None, "a\tb\nc\x0bd\x0ce\rf",
              "héllo wörld", "a\xa0b", "　x y ", "solo",
              " lead", "trail ", "\x1c\x1d\x1e\x1f", "a b c",
              "日本語 テスト"] + [f"a{w}b{w}{w}c" for w in py_ws]
    got = ws_token_counts(pa.array(probes, pa.string())).tolist()
    want = [len((s or "").split()) for s in probes]
    assert got == want


def test_ws_token_counts_gate_corpus_parity(ray_session):
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.curation import ws_token_counts

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    got = ws_token_counts(t.column("text"))
    want = [len((s or "").split()) for s in t.column("text").to_pylist()]
    assert got.tolist() == want


def test_shape_triangle_relation_all_classes(ray_session):
    """Triangle-vs-polygon relate (the LatLonShape tessellation
    primitive): all three classes occur and the unrolled edge-pair SQL
    agrees with the engine."""
    import duckdb

    from lucene_solr_ray.functions import geo

    mine = geo.shape_triangle_relation(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    want = con.sql(geo.shape_triangle_relation_sql()).df()
    assert set(mine["relation"]) == {"WITHIN", "INTERSECTS", "DISJOINT"}
    assert (mine["c_custkey"].to_numpy() == want["c_custkey"].to_numpy()).all()
    assert (mine["relation"].to_numpy() == want["relation"].to_numpy()).all()
