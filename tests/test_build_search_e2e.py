"""End-to-end: build on Ray -> segments + manifest -> query engine parity
with the brute-force oracle (FIXTURES.md §6 invariants 1, 2, 4)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.segment import check_segment
from lucene_solr_ray.state.manifest import load_manifest


def test_manifest_counts(t1_index, t1_table):
    index_dir, manifest = t1_index
    assert manifest["n_docs"] == t1_table.num_rows
    assert manifest["generation"] == 0
    assert len(manifest["segments"]) > 1
    # sum_dl equals total emitted tokens (oracle recount)
    from lucene_solr_ray.analysis import tokenize

    total = sum(len(tokenize(t)) for t in t1_table.column("text").to_pylist())
    assert manifest["sum_dl"] == total


def test_row_invariant_docs_parquet(t1_index, t1_table):
    """FIXTURES.md §6.1: reconstruct corpus from docs.parquet in docID
    order == input under stable (conv_id, turn_idx) ordering."""
    index_dir, manifest = t1_index
    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table()
    docs = docs.take(pa.compute.sort_indices(docs, sort_keys=[("docid", "ascending")]))
    assert docs.num_rows == t1_table.num_rows
    expect = t1_table.take(
        pa.compute.sort_indices(
            t1_table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
    assert docs.column("docid").to_pylist() == list(range(t1_table.num_rows))
    for col in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        assert docs.column(col).equals(expect.column(col)), col


def test_check_index_all_segments(t1_index):
    index_dir, manifest = t1_index
    seg_dirs = glob.glob(os.path.join(index_dir, "segments", "p*", "g*"))
    assert len(seg_dirs) == len(manifest["segments"])
    for d in seg_dirs:
        assert check_segment(d) == [], d


def test_global_stats_match_oracle(t1_index, t1_oracle):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    assert s.n_docs == t1_oracle.n_docs
    assert s.sum_dl == t1_oracle.sum_dl
    for term in ["w0000", "w0001", "w1234", "café", "zz-absent"]:
        df, cf, _ = s.term_stats_and_cursor(term)
        assert df == t1_oracle.df(term), term


@pytest.mark.parametrize("algorithm", ["wand", "exhaustive"])
def test_full_query_set_parity(t1_index, t1_oracle, t1_queries, algorithm):
    """FIXTURES.md §6.2: engine top-k == oracle top-k, scores bit-equal
    float32, for all 200 reference queries — under both the WAND path and
    the exhaustive reference path."""
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    n_nonempty = 0
    for row in t1_queries.to_pylist():
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode, algorithm=algorithm)
        exp_d, exp_s = t1_oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), (row["query_id"], row["terms"])
        assert np.array_equal(got_s, exp_s), (row["query_id"], got_s, exp_s)
        n_nonempty += len(got_d) > 0
    assert n_nonempty > 100  # the query set is mostly non-trivial


def test_ray_query_path_matches(ray_session, t1_index, t1_oracle, t1_queries):
    from lucene_solr_ray.pipelines.search import run_queries

    index_dir, _ = t1_index
    got = run_queries(index_dir, t1_queries, concurrency=2).to_pandas()
    exp = t1_oracle.search_all(t1_queries).to_pandas()
    assert len(got) == len(exp)
    assert got["query_id"].tolist() == exp["query_id"].tolist()
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())


def test_explain_sums_to_score(t1_index, t1_oracle):
    index_dir, _ = t1_index
    s = IndexSearcher(index_dir)
    d, sc = s.search(["w0000", "w0005"], k=3)
    if len(d):
        ex = s.explain(["w0000", "w0005"], int(d[0]))
        acc = np.float32(0.0)
        for e in ex:  # ascending term order
            acc = np.float32(acc + np.float32(e["score"]))
        assert acc == sc[0]


@pytest.mark.parametrize(
    "similarity, n_q",
    [("classic", 60), ("bm25_tuned", 200), ("lmdirichlet", 200), ("lmjelinekmercer", 200),
     ("dfr_inl2", 200), ("dfr_gl2", 200), ("dfr_ine_l2", 200),
     ("dfi_chi2", 200), ("ib_ll", 200),
     ("ib_spl", 200),
     ("ax_f2exp", 200), ("sweetspot", 200), ("boolean", 60)],
)
def test_pluggable_similarity_parity(t1_index, t1_table, t1_queries, similarity, n_q):
    """Pluggable similarity (SURVEY §2.11): engine matches an oracle
    configured the same way (same index, different scorer) — Classic
    TF-IDF, both Lucene 8 LM models (cf-based collection probability,
    clamp-at-0 scores exercising WAND bounds near zero), and
    BooleanSimilarity (constant score, docid tie-breaks everywhere)."""
    from lucene_solr_ray.oracle import Oracle

    index_dir, _ = t1_index
    s = IndexSearcher(index_dir, similarity=similarity)
    oracle = Oracle(t1_table, similarity=similarity)
    for row in t1_queries.to_pylist()[:n_q]:
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), (similarity, row["query_id"])
        assert np.array_equal(got_s, exp_s), (similarity, row["query_id"])


def test_build_sparse_buckets(ray_session, tmp_path):
    """A corpus whose vocabulary hits only a few buckets leaves most
    hash-shuffle partitions with ZERO rows — the partition writer must
    tolerate the schema-less empty blocks Ray produces for them
    (regression: aggregator-side sort crashed on these during resume)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    corpus = str(tmp_path / "sparse")
    os.makedirs(corpus, exist_ok=True)
    n = 40
    pq.write_table(
        pa.table({
            "conv_id": pa.array([f"c{i:04d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(["solo" if i % 2 else "solo duo" for i in range(n)]),
            "tool": pa.array([""] * n),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }),
        os.path.join(corpus, "part-0.parquet"),
    )
    index_dir = str(tmp_path / "sparse-idx")
    m = build_index(corpus, index_dir, num_partitions=16, salt=2, resume=False)
    assert m["n_docs"] == n
    s = IndexSearcher(index_dir)
    d, _ = s.search(["solo"], k=n)
    assert len(d) == n
    d, _ = s.search(["duo"], k=n)
    assert len(d) == n // 2
