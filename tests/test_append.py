"""Incremental append (IndexWriter.addIndexes / NRT-growth analogue):
append a second corpus, verify global stats, docID arrival-order
semantics, oracle parity over the union, and merge across generations."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.fixtures import gen_query_set, gen_transcripts, write_transcripts
from lucene_solr_ray.oracle import Oracle
from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.merge import force_merge
from lucene_solr_ray.pipelines.search import IndexSearcher


@pytest.fixture(scope="module")
def appended(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("append")
    c1 = str(base / "c1")
    c2 = str(base / "c2")
    write_transcripts(c1, n_convs=40, seed=42)
    write_transcripts(c2, n_convs=30, seed=99)  # different convs (seeded ids collide? no: same pattern...)
    index_dir = str(base / "idx")
    m1 = build_index(c1, index_dir, num_partitions=4, salt=2)
    m2 = build_index(c2, index_dir, num_partitions=4, salt=2, append=True)
    return c1, c2, index_dir, m1, m2


def _union_oracle(c1, c2):
    import pyarrow.dataset as pads

    t1 = pads.dataset(c1, format="parquet").to_table()
    t2 = pads.dataset(c2, format="parquet").to_table()
    s1 = t1.take(pa.compute.sort_indices(t1, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    s2 = t2.take(pa.compute.sort_indices(t2, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    return Oracle(pa.concat_tables([s1, s2]), presorted=True), s1, s2


def test_append_stats_accumulate(appended):
    c1, c2, index_dir, m1, m2 = appended
    assert m2["n_docs"] > m1["n_docs"]
    assert m2["sum_dl"] > m1["sum_dl"]
    assert m2["generation"] == m1["generation"] + 1
    gens = {s["name"].split("-")[0] for s in m2["segments"]}
    assert len(gens) == 2  # two build generations coexist


def test_append_query_parity(appended):
    c1, c2, index_dir, m1, m2 = appended
    oracle, s1, _ = _union_oracle(c1, c2)
    assert oracle.n_docs == m2["n_docs"]
    s = IndexSearcher(index_dir)
    assert s.n_docs == oracle.n_docs and s.sum_dl == oracle.sum_dl
    qs = gen_query_set(s1.column("text").to_pylist(), seed=43, n_single=30, n_or=30, n_and=15)
    for row in qs.to_pylist():
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), row["query_id"]
        assert np.array_equal(got_s, exp_s), row["query_id"]


def test_append_then_merge_parity(appended, tmp_path):
    import shutil

    c1, c2, index_dir, _, _ = appended
    copy = str(tmp_path / "idx-copy")
    shutil.copytree(index_dir, copy)
    manifest = force_merge(copy, max_segments=1)
    per_part = {}
    for seg in manifest["segments"]:
        per_part[seg["partition"]] = per_part.get(seg["partition"], 0) + 1
    assert all(v == 1 for v in per_part.values())
    oracle, s1, _ = _union_oracle(c1, c2)
    s = IndexSearcher(copy)
    qs = gen_query_set(s1.column("text").to_pylist(), seed=44, n_single=20, n_or=20, n_and=10)
    for row in qs.to_pylist():
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), row["query_id"]
        assert np.array_equal(got_s, exp_s), row["query_id"]


def test_append_rejects_mismatched_partitioning(appended):
    c1, c2, index_dir, _, _ = appended
    with pytest.raises(ValueError):
        build_index(c2, index_dir, num_partitions=8, salt=2, append=True)


def test_check_index_tool_on_appended(appended):
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.check_index import check_index

    c1, c2, index_dir, _, _ = appended
    assert check_index(index_dir) == []
