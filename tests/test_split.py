"""SPLITSHARD (pipelines/split.py): doubling num_partitions in place
preserves every query answer, global stats, and CheckIndex health."""

import numpy as np
import pytest

from lucene_solr_ray.pipelines.search import IndexSearcher, run_queries
from lucene_solr_ray.pipelines.split import split_partitions
from lucene_solr_ray.state.manifest import load_manifest


@pytest.fixture(scope="module")
def split_index(ray_session, tmp_path_factory, t1_corpus):
    from lucene_solr_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("splitidx"))
    build_index(t1_corpus, index_dir, num_partitions=4, salt=2)
    return index_dir


def test_split_preserves_everything(split_index, t1_queries):
    before = load_manifest(split_index)
    got_before = run_queries(split_index, t1_queries, concurrency=2).to_pandas()

    m = split_partitions(split_index)
    assert m["num_partitions"] == 2 * before["num_partitions"]
    assert m["n_docs"] == before["n_docs"]
    assert m["sum_dl"] == before["sum_dl"]
    assert sum(s["sum_tf"] for s in m["segments"]) == sum(
        s["sum_tf"] for s in before["segments"])
    # every new segment's terms actually hash to its partition (spot:
    # partition ids in range, both halves populated somewhere)
    parts = {s["partition"] for s in m["segments"]}
    assert parts <= set(range(m["num_partitions"]))
    assert any(p >= before["num_partitions"] for p in parts)

    got_after = run_queries(split_index, t1_queries, concurrency=2).to_pandas()
    assert got_after["query_id"].tolist() == got_before["query_id"].tolist()
    assert got_after["docid"].tolist() == got_before["docid"].tolist()
    assert np.array_equal(got_after["score"].to_numpy(), got_before["score"].to_numpy())


def test_split_index_passes_checkindex(split_index):
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "tools/check_index.py", split_index],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr


def test_double_split(split_index, t1_queries):
    """Split twice: 4 -> 8 -> 16 partitions, still parity."""
    before = run_queries(split_index, t1_queries, concurrency=2).to_pandas()
    m = split_partitions(split_index)
    after = run_queries(split_index, t1_queries, concurrency=2).to_pandas()
    assert after["docid"].tolist() == before["docid"].tolist()
    assert m["num_partitions"] == 16
