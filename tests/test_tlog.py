"""Transaction-log-lite: pending appends are RealTimeGet-visible before
any commit; soft_commit's in-process micro path folds them into a new
generation with FULL oracle parity over the union corpus; consumption
is at-least-once (replay skips consumed seqs)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.fixtures import gen_query_set, write_transcripts
from lucene_solr_ray.oracle import Oracle
from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.state import tlog


def _batch(ids, token):
    rows = []
    for i, did in enumerate(ids):
        rows.append({
            "conv_id": f"tlog-{did:012d}", "turn_idx": np.int32(0),
            "role": "user", "text": f"{token} payload w{did:04d} stream",
            "tool": "",
            "ts": np.datetime64("2026-02-01T00:00:00", "us")
            + np.timedelta64(int(did), "s"),
            "doc_id": np.int64(did),
        })
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
        ("ts", pa.timestamp("us")), ("doc_id", pa.int64()),
    ]))


@pytest.fixture(scope="module")
def tlogged(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("tlog")
    corpus = str(base / "c")
    write_transcripts(corpus, n_convs=40, seed=42)
    index_dir = str(base / "idx")
    m0 = build_index(corpus, index_dir, num_partitions=4, salt=2)
    return corpus, index_dir, m0


def test_pending_rtg_before_commit(tlogged):
    corpus, index_dir, m0 = tlogged
    seq = tlog.tlog_append(index_dir, _batch([900001, 900002], "zzztlog"))
    assert seq == 0
    # newest-wins overlay: re-append doc 900002 with updated text
    seq2 = tlog.tlog_append(index_dir, _batch([900002], "zzztlog2"))
    assert seq2 == 1
    got = tlog.realtime_get_overlay(index_dir, [900001, 900002]).to_pylist()
    assert [r["doc_id"] for r in got] == [900001, 900002]
    assert all(r["pending"] for r in got)
    assert got[0]["text"].startswith("zzztlog ")
    assert got[1]["text"].startswith("zzztlog2 ")  # newest log entry wins
    # not yet searchable: the committed generation has no zzztlog
    s = IndexSearcher(index_dir)
    d, _ = s.search(["zzztlog"], k=10, mode="or")
    assert len(d) == 0


def test_soft_commit_micro_path_visibility_and_parity(tlogged):
    import pyarrow.dataset as pads

    corpus, index_dir, m0 = tlogged
    pend = [t for _, p in tlog.pending_files(index_dir)
            for t in [__import__("pyarrow.parquet", fromlist=["read_table"]).read_table(p)]]
    assert pend, "run after test_pending_rtg_before_commit"
    m1 = tlog.soft_commit(index_dir)
    assert m1["generation"] == m0["generation"] + 1
    assert m1["n_docs"] == m0["n_docs"] + 3  # both log batches appended
    assert m1["metrics"]["tlog_visible_s"] < 2.0  # bounded, no Ray spin-up
    assert not tlog.pending_files(index_dir)  # consumed

    # searchable now, and arrival order assigns docids after old maxDoc
    s = IndexSearcher(index_dir)
    d, _ = s.search(["zzztlog"], k=10, mode="or")
    assert sorted(d.tolist()) == [m0["n_docs"], m0["n_docs"] + 1]
    d2, _ = s.search(["zzztlog2"], k=10, mode="or")
    assert d2.tolist() == [m0["n_docs"] + 2]
    # RTG falls through to committed stored fields (pending=False)
    got = tlog.realtime_get_overlay(index_dir, [900001]).to_pylist()
    assert got == [{"doc_id": 900001, "text": "zzztlog payload w900001 stream",
                    "pending": False}]

    # FULL bit-equal oracle parity over union corpus (micro-commit global
    # stats + postings must be indistinguishable from a one-shot build)
    t1 = pads.dataset(corpus, format="parquet").to_table()
    s1 = t1.take(pa.compute.sort_indices(
        t1, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    appended = pa.concat_tables(
        [_batch([900001, 900002], "zzztlog"), _batch([900002], "zzztlog2")]
    ).select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    oracle = Oracle(pa.concat_tables(
        [s1.select(appended.column_names), appended]), presorted=True)
    assert s.n_docs == oracle.n_docs and s.sum_dl == oracle.sum_dl
    qs = gen_query_set(s1.column("text").to_pylist(), seed=45,
                       n_single=20, n_or=20, n_and=10)
    for row in qs.to_pylist():
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), row["query_id"]
        assert np.array_equal(got_s, exp_s), row["query_id"]


def test_soft_commit_idempotent_and_replay_skips_consumed(tlogged):
    corpus, index_dir, _ = tlogged
    before = IndexSearcher(index_dir).n_docs
    m = tlog.soft_commit(index_dir)  # nothing pending -> no-op
    assert m["n_docs"] == before
    # a new append after consumption gets the next seq and only IT pends
    seq = tlog.tlog_append(index_dir, _batch([900003], "zzztlog3"))
    assert seq == 2
    assert [s for s, _ in tlog.pending_files(index_dir)] == [2]
    m2 = tlog.soft_commit(index_dir)
    assert m2["n_docs"] == before + 1
    d, _ = IndexSearcher(index_dir).search(["zzztlog3"], k=5, mode="or")
    assert len(d) == 1


def test_check_index_tool_after_micro_commits(tlogged):
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.check_index import check_index

    _, index_dir, _ = tlogged
    assert check_index(index_dir) == []


@pytest.fixture()
def dist_index(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("tlogdist")
    corpus = str(base / "c")
    write_transcripts(corpus, n_convs=40, seed=42)
    index_dir = str(base / "idx")
    build_index(corpus, index_dir, num_partitions=4, salt=2)
    return index_dir


def test_distributed_writers_commit(dist_index):
    """Partition-routed writer actors: soft_commit(distributed) makes
    the batch searchable with the same manifest/search semantics as the
    in-process micro path."""
    index_dir = dist_index
    tlog.tlog_append(index_dir, _batch([910001, 910002, 910003], "zzzdist"))
    out = tlog.soft_commit(index_dir, distributed_writers=True, pool_size=2)
    assert out["metrics"]["tlog_upto"] == 0
    d, _ = IndexSearcher(index_dir).search(["zzzdist"], k=10)
    assert len(d) == 3
    # nothing pending anymore
    assert tlog.pending_files(index_dir) == []


def test_distributed_writer_killed_mid_batch_replays(dist_index):
    """Kill a writer actor mid-batch: the commit fails BEFORE the
    manifest/consumed marker are written, the pool is dropped, and a
    replayed soft_commit succeeds with identical results."""
    import ray as _ray

    index_dir = dist_index
    from lucene_solr_ray.state.manifest import load_manifest

    # a first distributed commit creates the long-lived pool
    tlog.tlog_append(index_dir, _batch([920001], "zzzwarm"))
    tlog.soft_commit(index_dir, distributed_writers=True, pool_size=2)
    gen_before = load_manifest(index_dir)["generation"]
    pool = tlog.writer_pool(index_dir, 2)
    _ray.kill(pool[0])
    _ray.kill(pool[1])
    tlog.tlog_append(index_dir, _batch([920002, 920003], "zzzkill"))
    with pytest.raises(_ray.exceptions.RayActorError):
        tlog.soft_commit(index_dir, distributed_writers=True, pool_size=2)
    # no commit happened: generation unchanged, batch still pending,
    # nothing searchable
    assert load_manifest(index_dir)["generation"] == gen_before
    assert len(tlog.pending_files(index_dir)) == 1
    d, _ = IndexSearcher(index_dir).search(["zzzkill"], k=10)
    assert len(d) == 0
    # replay: the pool was dropped, a fresh one is built, commit succeeds
    out = tlog.soft_commit(index_dir, distributed_writers=True, pool_size=2)
    assert out["generation"] == gen_before + 1
    d, _ = IndexSearcher(index_dir).search(["zzzkill"], k=10)
    assert len(d) == 2
    assert tlog.pending_files(index_dir) == []
