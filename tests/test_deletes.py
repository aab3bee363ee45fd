"""Deletes / updates — tombstone filtering at query time, delete-by-query,
and expunge-on-merge (SURVEY §2.3 deletes row; BufferedUpdatesStream/.liv
analogue in pipelines/deletes.py)."""

import shutil

import numpy as np
import pytest

from lucene_solr_ray.pipelines.deletes import (
    delete_by_query,
    delete_docs,
    load_deletes,
    load_purged,
)
from lucene_solr_ray.pipelines.merge import force_merge
from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.state.manifest import load_manifest


@pytest.fixture()
def deletable_index(ray_session, t1_index, tmp_path):
    index_dir, _ = t1_index
    copy = str(tmp_path / "index-del")
    shutil.copytree(index_dir, copy)
    return copy


def _all_queries(t1_queries):
    return t1_queries.to_pylist()[:60]


def test_deleted_docs_stop_matching_scores_unchanged(deletable_index, t1_queries):
    before = IndexSearcher(deletable_index)
    # delete every 7th doc
    victims = set(range(0, before.n_docs, 7))
    m = delete_docs(deletable_index, sorted(victims))
    assert m["n_deleted"] == len(victims)
    after = IndexSearcher(deletable_index)
    assert after.deleted is not None and len(after.deleted) == len(victims)
    for row in _all_queries(t1_queries):
        mode = "and" if row["type"] == "and" else "or"
        # full result set pre/post: post == pre minus victims, same scores
        d0, s0 = before.search(row["terms"], k=before.n_docs, mode=mode)
        d1, s1 = after.search(row["terms"], k=after.n_docs, mode=mode)
        keep = ~np.isin(d0, list(victims))
        assert d1.tolist() == d0[keep].tolist(), row["query_id"]
        assert np.array_equal(s1, s0[keep]), row["query_id"]


def test_deleted_filtering_all_algorithms(deletable_index):
    s0 = IndexSearcher(deletable_index)
    delete_docs(deletable_index, list(range(0, s0.n_docs, 3)))
    s = IndexSearcher(deletable_index)
    victims = set(range(0, s0.n_docs, 3))
    for algo in ("wand", "dense", "exhaustive"):
        d, _ = s.search(["w0000", "w0001"], k=s.n_docs, mode="or", algorithm=algo)
        assert not (set(d.tolist()) & victims), algo
    for algo in ("wand", "dense"):
        d, _ = s.search(["w0000", "w0001"], k=s.n_docs, mode="and", algorithm=algo)
        assert not (set(d.tolist()) & victims), algo
    d, _ = s.search(["w0000"], k=s.n_docs)  # single-term impact path
    assert not (set(d.tolist()) & victims)
    d, _ = s.search_boolean(must=["w0000"], should=["w0001"], k=s.n_docs)
    assert not (set(d.tolist()) & victims)
    d, _ = s.search_phrase(["w0000", "w0001"], k=s.n_docs)
    assert not (set(d.tolist()) & victims)
    d, _ = s.search_dismax(["w0000", "w0001"], k=s.n_docs)
    assert not (set(d.tolist()) & victims)
    d = s.search_ts_range("2026-01-01T00:00:00", "2027-01-01T00:00:00")
    assert not (set(d.tolist()) & victims)
    d, _ = s.match_all(k=10)
    assert not (set(d.tolist()) & victims)


def test_delete_by_query_and_idempotent_union(deletable_index):
    s0 = IndexSearcher(deletable_index)
    target_docs, _ = s0.search(["w0005"], k=s0.n_docs)
    m1 = delete_by_query(deletable_index, ["w0005"])
    assert m1["n_deleted"] == len(target_docs)
    # deleting again adds nothing (union)
    m2 = delete_by_query(deletable_index, ["w0005"])
    assert m2["n_deleted"] == len(target_docs)
    s = IndexSearcher(deletable_index)
    d, _ = s.search(["w0005"], k=s.n_docs)
    assert len(d) == 0


def test_expunge_deletes_on_force_merge(deletable_index):
    s0 = IndexSearcher(deletable_index)
    victims = list(range(0, s0.n_docs, 5))
    delete_docs(deletable_index, victims)
    pre = IndexSearcher(deletable_index)
    pre_res = {}
    for terms in (["w0000"], ["w0001", "w0002"]):
        pre_res[tuple(terms)] = pre.search(terms, k=pre.n_docs)[0].tolist()
    manifest = force_merge(deletable_index, max_segments=1, expunge_deletes=True)
    manifest = load_manifest(deletable_index)
    # t1 index is salt=2 -> every partition had >=2 segments -> full rewrite
    assert manifest.get("deletes_file") is None
    assert manifest.get("n_docs_purged") == len(victims)
    assert load_deletes(deletable_index, manifest) is None
    # tombstones retired into the persisted purged set: postings are gone,
    # but docs.parquet rows remain so the searcher keeps filtering them
    purged = load_purged(deletable_index, manifest)
    assert purged is not None and purged.tolist() == victims
    post = IndexSearcher(deletable_index)
    assert post.deleted is not None and post.deleted.tolist() == victims
    assert post.n_scoring == post.n_docs - len(victims)
    d, _ = post.match_all(k=post.n_docs)
    assert not (set(d.tolist()) & set(victims))
    # purged postings: df/avgdl change so ranking may shift, but the
    # matching SET is identical to the tombstone-filtered pre-purge set
    for terms, exp in pre_res.items():
        d, _ = post.search(list(terms), k=post.n_docs)
        assert sorted(d.tolist()) == sorted(exp), terms
    # global stats: sum_dl now equals the live token total
    assert manifest["sum_dl"] == sum(s["sum_tf"] for s in manifest["segments"])


def test_partial_expunge_keeps_sum_dl_invariant(deletable_index):
    """A partial expunge round (only tombstone-intersecting segments
    rewritten, others kept) must leave sum(segment sum_tf) == sum_dl and
    a clean CheckIndex (ADVICE r2: partial rounds used to skip the
    recompute)."""
    from tools.check_index import check_index

    from lucene_solr_ray.pipelines.merge import run_merge_round

    manifest = load_manifest(deletable_index)
    seg = min(manifest["segments"], key=lambda s: int(s["docid_min"]))
    lo, hi = int(seg["docid_min"]), int(seg["docid_max"])
    victims = list(range(lo, min(lo + 9, hi + 1), 3))
    delete_docs(deletable_index, victims)
    m = run_merge_round(deletable_index, expunge_deletes=True)
    assert m is not None
    assert m["sum_dl"] == sum(s["sum_tf"] for s in m["segments"])
    assert m.get("deletes_file") is None and m["n_deleted"] == 0
    assert m["n_docs_purged"] == len(victims)
    assert check_index(deletable_index) == []


def test_delete_validation_and_purged_redelete(deletable_index):
    """Out-of-range docids are rejected; re-deleting already-purged
    docids is dropped so n_docs_purged never double-counts (ADVICE r2)."""
    from tools.check_index import check_index

    s0 = IndexSearcher(deletable_index)
    with pytest.raises(ValueError):
        delete_docs(deletable_index, [s0.n_docs])
    with pytest.raises(ValueError):
        delete_docs(deletable_index, [-1])
    victims = list(range(0, s0.n_docs, 11))
    delete_docs(deletable_index, victims)
    force_merge(deletable_index, max_segments=1, expunge_deletes=True)
    m1 = load_manifest(deletable_index)
    assert m1["n_docs_purged"] == len(victims)
    # second expunge on an already-merged index (max_segments satisfied)
    # must still rewrite tombstoned segments, and purged re-deletes drop
    m2 = delete_docs(deletable_index, victims[:5] + [1, 2])
    assert m2["n_deleted"] == 2
    force_merge(deletable_index, max_segments=1, expunge_deletes=True)
    m3 = load_manifest(deletable_index)
    assert m3["n_docs_purged"] == len(victims) + 2
    assert check_index(deletable_index) == []


def test_expunge_preserves_positions(deletable_index):
    s0 = IndexSearcher(deletable_index)
    delete_docs(deletable_index, list(range(0, s0.n_docs, 4)))
    pre = IndexSearcher(deletable_index)
    pre_d, _ = pre.search_phrase(["w0000", "w0001"], k=pre.n_docs)
    force_merge(deletable_index, max_segments=1, expunge_deletes=True)
    post = IndexSearcher(deletable_index)
    post_d, _ = post.search_phrase(["w0000", "w0001"], k=post.n_docs)
    assert post_d.tolist() == pre_d.tolist()
