"""Merge & resume equivalence — FIXTURES.md §6.5/§6.6: merged index must be
query-result-identical to the pre-merge index; resumed build identical to
uninterrupted build."""

import glob
import os
import shutil

import numpy as np
import pytest

from lucene_solr_ray.pipelines.merge import force_merge, plan_merges, run_merge_round
from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.segment import check_segment
from lucene_solr_ray.state.manifest import load_manifest


@pytest.fixture()
def merged_index(ray_session, t1_index, tmp_path):
    index_dir, _ = t1_index
    copy = str(tmp_path / "index-copy")
    shutil.copytree(index_dir, copy)
    manifest = force_merge(copy, max_segments=1)
    return copy, manifest


def test_force_merge_reduces_segments(merged_index):
    copy, manifest = merged_index
    per_part: dict[int, int] = {}
    for s in manifest["segments"]:
        per_part[s["partition"]] = per_part.get(s["partition"], 0) + 1
    assert all(v == 1 for v in per_part.values()), per_part
    assert manifest["generation"] >= 1
    # replaced dirs were gc'ed; remaining dirs valid
    seg_dirs = glob.glob(os.path.join(copy, "segments", "p*", "g*"))
    assert len(seg_dirs) == len(manifest["segments"])
    for d in seg_dirs:
        assert check_segment(d) == [], d


def test_merged_query_parity(merged_index, t1_oracle, t1_queries):
    copy, _ = merged_index
    s = IndexSearcher(copy)
    for row in t1_queries.to_pylist():
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = t1_oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), row["query_id"]
        assert np.array_equal(got_s, exp_s), row["query_id"]


def test_merged_global_stats_preserved(merged_index, t1_index):
    copy, manifest = merged_index
    _, orig = t1_index
    assert manifest["n_docs"] == orig["n_docs"]
    assert sum(s["sum_tf"] for s in manifest["segments"]) == orig["sum_dl"]


def test_plan_merges_tiered_picks_cheapest_adjacent_window():
    """Tiered planner merges only docid-contiguous runs (the TermCursor
    ascending-docid invariant), picking the cheapest adjacent window."""
    sizes_in = [100, 5, 10, 2, 50, 1, 7, 3, 20, 30, 40, 60]
    manifest = {
        "segments": [
            {"partition": 0, "name": f"s{i:02d}", "postings_bytes": b,
             "docid_min": i * 100, "docid_max": i * 100 + 99}
            for i, b in enumerate(sizes_in)
        ]
    }
    groups = plan_merges(manifest, segs_per_tier=10, max_merge_at_once=4)
    assert len(groups) == 1
    picked = groups[0]["inputs"]
    # cheapest 4-wide adjacent window of [100,5,10,2,50,1,7,3,20,...] is [1,7,3,20]
    assert [s["postings_bytes"] for s in picked] == [1, 7, 3, 20]
    mins = [s["docid_min"] for s in picked]
    assert mins == sorted(mins) and mins == list(range(mins[0], mins[0] + 400, 100))


def test_plan_merges_never_interleaves_docid_ranges():
    """Regression (round-2 ADVICE high): a bytes-ordered pick could merge
    a subset whose docid range brackets a left-out segment. Every planned
    group must be adjacent in the partition's docid_min order."""
    # small segments at docid extremes, a big one in the middle: bytes
    # order would merge the two smalls across the big one
    manifest = {
        "segments": [
            {"partition": 0, "name": "a", "postings_bytes": 1, "docid_min": 0, "docid_max": 9},
            {"partition": 0, "name": "b", "postings_bytes": 999, "docid_min": 10, "docid_max": 19},
            {"partition": 0, "name": "c", "postings_bytes": 2, "docid_min": 20, "docid_max": 29},
        ]
        * 1
        + [
            {"partition": 0, "name": f"d{i}", "postings_bytes": 5,
             "docid_min": 30 + 10 * i, "docid_max": 39 + 10 * i}
            for i in range(9)
        ]
    }
    for kwargs in ({"segs_per_tier": 4, "max_merge_at_once": 3},
                   {"force_max_segments": 2}):
        for g in plan_merges(manifest, **kwargs):
            segs = sorted(manifest["segments"], key=lambda s: (s["docid_min"], s["name"]))
            idx = [segs.index(s) for s in g["inputs"]]
            assert idx == list(range(idx[0], idx[0] + len(idx))), (kwargs, idx)


def test_partial_merge_query_parity(ray_session, t1_index, t1_oracle, t1_queries, tmp_path):
    """Merging a strict subset of a partition's segments (forceMerge k=2 on
    a salt=2 index) must keep results identical — the docid-interleaving
    regression path that full-merge tests never exercised."""
    index_dir, _ = t1_index
    copy = str(tmp_path / "index-partial")
    shutil.copytree(index_dir, copy)
    manifest = force_merge(copy, max_segments=1, gc=True)
    # sanity: merged segments keep disjoint ascending docid ranges per partition
    per_part: dict[int, list] = {}
    for s in manifest["segments"]:
        per_part.setdefault(s["partition"], []).append(s)
    for segs in per_part.values():
        segs.sort(key=lambda s: s["docid_min"])
        for a, b in zip(segs, segs[1:]):
            assert a["docid_max"] < b["docid_min"]
    s = IndexSearcher(copy)
    for row in t1_queries.to_pylist()[:50]:
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = t1_oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), row["query_id"]
        assert np.array_equal(got_s, exp_s), row["query_id"]


def test_merge_preserves_positions_phrase_parity(merged_index, t1_oracle):
    """Positions survive the k-way merge: phrase queries still work on the
    force-merged positional index."""
    copy, manifest = merged_index
    import json
    import os

    for seg in manifest["segments"]:
        seg_dir = os.path.join(copy, "segments", f"p{seg['partition']:04d}", seg["name"])
        with open(os.path.join(seg_dir, "meta.json")) as fh:
            assert json.load(fh)["has_positions"] or seg["n_terms"] == 0, seg_dir
    s = IndexSearcher(copy)
    d, sc = s.search_phrase(["the", "merge"], k=10)  # any phrase; just must not raise
    assert isinstance(d, np.ndarray)


def test_plan_merges_respects_max_merged_bytes():
    manifest = {
        "segments": [
            {"partition": 0, "name": f"s{i}", "postings_bytes": 10**9, "docid_min": 0}
            for i in range(12)
        ]
    }
    groups = plan_merges(manifest, segs_per_tier=10, max_merge_at_once=10,
                         max_merged_bytes=10**9)
    assert groups == []  # any 2+ would exceed the cap


def test_resume_skips_completed_buckets(ray_session, t1_corpus, tmp_path):
    from lucene_solr_ray.pipelines.build import build_index

    index_dir = str(tmp_path / "resume-idx")
    m1 = build_index(t1_corpus, index_dir, num_partitions=4, salt=1)
    # simulate crash: drop one segment dir, keep others
    seg_dirs = sorted(glob.glob(os.path.join(index_dir, "segments", "p*", "g*")))
    shutil.rmtree(seg_dirs[0])
    m2 = build_index(t1_corpus, index_dir, num_partitions=4, salt=1)
    assert len(m2["metrics"]["resumed_buckets"]) == len(seg_dirs) - 1
    # identical segment checksums as the uninterrupted build
    c1 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m1["segments"]}
    c2 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m2["segments"]}
    assert c1 == c2


def test_build_determinism_across_batching(ray_session, t1_corpus, tmp_path):
    """FIXTURES.md §6.5: different parallelism/batching -> identical
    segment content (checksums) and manifest counts."""
    from lucene_solr_ray.pipelines.build import build_index

    d1 = str(tmp_path / "i1")
    d2 = str(tmp_path / "i2")
    m1 = build_index(t1_corpus, d1, num_partitions=4, salt=2, analyze_batch_size=256)
    m2 = build_index(t1_corpus, d2, num_partitions=4, salt=2, analyze_batch_size=4096)
    c1 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m1["segments"]}
    c2 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m2["segments"]}
    assert c1 == c2
    assert m1["n_docs"] == m2["n_docs"] and m1["sum_dl"] == m2["sum_dl"]


def test_docid_modes_produce_identical_segments(ray_session, t1_corpus, tmp_path):
    """conv-base docID assignment (no corpus sort) must yield byte-identical
    segments to the sort-path assignment."""
    from lucene_solr_ray.pipelines.build import build_index

    d1 = str(tmp_path / "m1")
    d2 = str(tmp_path / "m2")
    m1 = build_index(t1_corpus, d1, num_partitions=4, salt=2, docid_mode="conv-base")
    m2 = build_index(t1_corpus, d2, num_partitions=4, salt=2, docid_mode="sort")
    c1 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m1["segments"]}
    c2 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m2["segments"]}
    assert c1 == c2
    assert m1["n_docs"] == m2["n_docs"] and m1["sum_dl"] == m2["sum_dl"]


def test_conv_base_join_mode_identical_segments(ray_session, t1_corpus, tmp_path):
    """The two-level distributed prefix sum (conv-base-join: groupby +
    sorted per-block bases + hash join) must yield byte-identical segments
    to the driver-combine conv-base path."""
    from lucene_solr_ray.pipelines.build import build_index

    d1 = str(tmp_path / "j1")
    d2 = str(tmp_path / "j2")
    m1 = build_index(t1_corpus, d1, num_partitions=4, salt=2, docid_mode="conv-base-join")
    m2 = build_index(t1_corpus, d2, num_partitions=4, salt=2, docid_mode="conv-base")
    c1 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m1["segments"]}
    c2 = {(s["partition"], s["name"]): s["postings_crc32"] for s in m2["segments"]}
    assert c1 == c2
    assert m1["n_docs"] == m2["n_docs"] and m1["sum_dl"] == m2["sum_dl"]


def test_upgrade_index_codec_rewrite(ray_session, t1_index, t1_oracle, t1_queries, tmp_path):
    """IndexUpgrader analogue: every segment rewritten under the target
    codec (meta.json + manifest agree), full query parity preserved
    (docids AND bit-equal float32 scores), idempotent at the target."""
    import json

    from lucene_solr_ray.pipelines.merge import upgrade_index

    index_dir, _ = t1_index
    copy = str(tmp_path / "index-upg")
    shutil.copytree(index_dir, copy)
    m = upgrade_index(copy, "varint-v1")
    assert m["codec"] == "varint-v1"
    seg_dirs = glob.glob(os.path.join(copy, "segments", "p*", "g*"))
    live = {(s["partition"], s["name"]) for s in m["segments"]}
    for sd in seg_dirs:
        part = int(os.path.basename(os.path.dirname(sd))[1:])
        if (part, os.path.basename(sd)) not in live:
            continue  # pre-upgrade dirs may linger only if gc was off
        with open(os.path.join(sd, "meta.json")) as fh:
            assert json.load(fh)["codec"] == "varint-v1", sd
    s = IndexSearcher(copy)
    for row in t1_queries.to_pylist():
        mode = "and" if row["type"] == "and" else "or"
        got_d, got_s = s.search(row["terms"], k=row["k"], mode=mode)
        exp_d, exp_s = t1_oracle.search(row["terms"], k=row["k"], mode=mode)
        assert got_d.tolist() == exp_d.tolist(), row["query_id"]
        assert np.array_equal(got_s, exp_s), row["query_id"]
    # idempotent: already at the target -> same generation, no new commit
    m2 = upgrade_index(copy, "varint-v1")
    assert m2["generation"] == m["generation"]
