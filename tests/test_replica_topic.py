"""Replicator (incremental pull replication) + Topic/Daemon streams."""

import glob
import os
import shutil

import numpy as np


def _query_parity(a_dir, b_dir, queries):
    from lucene_solr_ray.pipelines.search import run_queries

    ga = run_queries(a_dir, queries, concurrency=2).to_pandas()
    gb = run_queries(b_dir, queries, concurrency=2).to_pandas()
    assert ga["docid"].tolist() == gb["docid"].tolist()
    assert np.array_equal(ga["score"].to_numpy(), gb["score"].to_numpy())


def test_replicate_full_then_incremental(ray_session, t1_index, t1_corpus, t1_queries, tmp_path):
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.state.manifest import load_manifest
    from lucene_solr_ray.state.replica import replicate

    index_dir, manifest = t1_index
    # replicate a COPY of the primary so appends don't disturb other tests
    primary = str(tmp_path / "primary")
    shutil.copytree(index_dir, primary)
    replica = str(tmp_path / "replica")

    r1 = replicate(primary, replica)
    assert r1["n_segments_copied"] == len(manifest["segments"])
    _query_parity(primary, replica, t1_queries)

    # idempotent: nothing new to copy
    r2 = replicate(primary, replica)
    assert r2["n_segments_copied"] == 0 and r2["bytes_copied"] == 0

    # append -> incremental: only the new generation's segments move
    build_index(t1_corpus, primary, num_partitions=8, salt=2, store_positions=True, append=True)
    m2 = load_manifest(primary)
    new_segs = [s for s in m2["segments"] if s["name"].startswith("g001")]
    assert new_segs
    r3 = replicate(primary, replica)
    assert r3["n_segments_copied"] == len(new_segs)
    _query_parity(primary, replica, t1_queries)


def test_replicate_gc_after_merge(ray_session, t1_index, t1_queries, tmp_path):
    from lucene_solr_ray.pipelines.merge import force_merge
    from lucene_solr_ray.state.replica import replicate

    index_dir, _ = t1_index
    primary = str(tmp_path / "primary")
    shutil.copytree(index_dir, primary)
    replica = str(tmp_path / "replica")
    replicate(primary, replica)
    n_before = len(glob.glob(os.path.join(replica, "segments", "p*", "g*")))

    force_merge(primary, max_segments=1)
    r = replicate(primary, replica)
    assert r["gc_removed"], "old segment dirs should be gc'ed on the replica"
    n_after = len(glob.glob(os.path.join(replica, "segments", "p*", "g*")))
    assert n_after < n_before
    _query_parity(primary, replica, t1_queries)


def test_topic_poll_and_daemon(ray_session, t1_corpus, tmp_path):
    from lucene_solr_ray.functions.topic import Topic, run_daemon
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    index_dir = str(tmp_path / "idx")
    build_index(t1_corpus, index_dir, num_partitions=4, salt=1)
    topic = Topic(index_dir, "t-merge", str(tmp_path / "ckpt"))

    s = IndexSearcher(index_dir)
    all_ids, _ = s.search(["w0000"], k=s.n_docs, mode="or")
    first = topic.poll(["w0000"])
    assert sorted(first["docid"].to_pylist()) == sorted(int(x) for x in all_ids)
    # second poll: checkpoint advanced, nothing new
    assert topic.poll(["w0000"]).num_rows == 0

    # append -> only the NEW matching docs are delivered
    build_index(t1_corpus, index_dir, num_partitions=4, salt=1, append=True)
    second = topic.poll(["w0000"])
    assert second.num_rows == first.num_rows  # same corpus appended once more
    assert min(second["docid"].to_pylist()) > max(first["docid"].to_pylist())

    # daemon: repeated ticks drain then stay empty
    ticks = run_daemon(topic, ["w0000"], iterations=2)
    assert all(t.num_rows == 0 for t in ticks)

    # batch_size limits a tick and the checkpoint only advances past
    # what was delivered (at-least-once, no skips)
    topic2 = Topic(index_dir, "t2", str(tmp_path / "ckpt"))
    got, expected_total = [], None
    while True:
        t = topic2.poll(["w0000"], batch_size=3)
        if t.num_rows == 0:
            break
        assert t.num_rows <= 3
        got.extend(t["docid"].to_pylist())
    s2 = IndexSearcher(index_dir)
    full, _ = s2.search(["w0000"], k=s2.n_docs, mode="or")
    assert sorted(got) == sorted(int(x) for x in full)


def test_topic_read_ack_at_least_once(ray_session, t1_corpus, tmp_path):
    """read() without ack() re-delivers the same batch (a crashed poller
    never skips documents); ack() after consumption advances, and a
    stale ack never moves the checkpoint backward."""
    from lucene_solr_ray.functions.topic import Topic
    from lucene_solr_ray.pipelines.build import build_index

    index_dir = str(tmp_path / "idx")
    build_index(t1_corpus, index_dir, num_partitions=4, salt=1)
    topic = Topic(index_dir, "t-ack", str(tmp_path / "ckpt"))

    b1 = topic.read(["w0000"], batch_size=3)
    assert b1.num_rows == 3
    # no ack -> simulated crash: the SAME batch comes back
    b2 = topic.read(["w0000"], batch_size=3)
    assert b2["docid"].to_pylist() == b1["docid"].to_pylist()
    topic.ack(int(b1["docid"][2].as_py()))
    b3 = topic.read(["w0000"], batch_size=3)
    assert b3.num_rows == 0 or min(b3["docid"].to_pylist()) > max(b1["docid"].to_pylist())
    # stale ack (older docid) must not rewind the checkpoint
    ckpt_before = topic.checkpoint()
    topic.ack(int(b1["docid"][0].as_py()))
    assert topic.checkpoint() == ckpt_before


def test_snapshot_restore_point_in_time(ray_session):
    """The restore answers from the snapshot's commit point: docs holding
    both the deleted term and the query term are GONE from the mutated
    source but PRESENT in the restore (vacuity guard: at least one such
    doc must exist)."""
    import numpy as np

    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id, docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher
    from lucene_solr_ray.state.replica import snapshot_restore_retrieve

    sf = "/root/testdata/sf0.001"
    restored = snapshot_restore_retrieve(sf, terms=("vector",),
                                         delete_terms=("merge",)).to_pandas()
    primary = docs_index(sf)
    s = IndexSearcher(primary)
    d, _ = s.search(["vector"], k=max(1, s.n_docs), mode="or")
    pristine = np.sort(_docid_to_doc_id(primary)[d])
    assert restored["doc_id"].tolist() == pristine.tolist()
    # the mutated work copy must actually have lost some 'vector' docs
    work = IndexSearcher(primary + "-snapwork")
    dw, _ = work.search(["vector"], k=max(1, work.n_docs), mode="or")
    assert len(dw) < len(d), "no doc held both terms — mutation was vacuous"
