"""Tiered segment merge — SURVEY.md §2.4.

- Planner mirrors TieredMergePolicy's shape
  ([U] lucene/core/.../index/TieredMergePolicy.java; defaults
  segsPerTier=10, maxMergeAtOnce=10, floorSegmentMB=2,
  maxMergedSegmentMB=5120): a pure driver-side function over manifest
  segment stats — per partition, while more than ``segs_per_tier``
  eligible segments exist, merge the ``max_merge_at_once`` smallest
  (size-skew-friendly: many small segments merge first).
- Executor is the SegmentMerger analogue
  ([U] lucene/core/.../index/SegmentMerger.java): one Ray task per merge
  group via ``map_batches`` over a tiny Dataset of group descriptors
  (the ConcurrentMergeScheduler role is played by Ray's streaming
  executor + backpressure, [U] .../index/ConcurrentMergeScheduler.java).
- docIDs are global (assigned at ingest), so no DocMap remapping: for
  every term, contributor segments hold docid-disjoint ranges (build
  salt ranges / disjoint append shards), concatenated in docid order.
- Each round commits a new manifest generation; replaced segment dirs
  are deleted only after the commit (keep-until-commit deletion policy).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa

from lucene_solr_ray.segment import SegmentReader, write_segment
from lucene_solr_ray.state.manifest import commit_manifest, load_manifest

FLOOR_BYTES = 2 * 1024 * 1024
MAX_MERGED_BYTES = 5 * 1024 * 1024 * 1024


def plan_merges(
    manifest: dict,
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    floor_bytes: int = FLOOR_BYTES,
    max_merged_bytes: int = MAX_MERGED_BYTES,
    force_max_segments: int | None = None,
) -> list[dict]:
    """Pure planner -> merge groups [{partition, inputs: [seg dicts]}].

    ``force_max_segments`` = forceMerge(k): ignore tiering and merge down
    to at most k segments per partition.
    """
    by_partition: dict[int, list[dict]] = {}
    for seg in manifest["segments"]:
        by_partition.setdefault(seg["partition"], []).append(seg)
    groups = []
    for partition, segs in sorted(by_partition.items()):
        segs = sorted(segs, key=lambda s: s["postings_bytes"])
        if force_max_segments is not None:
            while len(segs) > force_max_segments:
                take = segs[: max(2, min(max_merge_at_once, len(segs) - force_max_segments + 1))]
                groups.append({"partition": partition, "inputs": take})
                segs = segs[len(take):]  # planned inputs leave the pool this round
            continue
        # tiered: merge while too many small-tier segments
        eligible = [s for s in segs if s["postings_bytes"] < max_merged_bytes]
        # size with floor applied (tiny segments count as floor-sized)
        if len(eligible) > segs_per_tier:
            take = eligible[: min(max_merge_at_once, len(eligible))]
            if len(take) >= 2 and sum(s["postings_bytes"] for s in take) <= max_merged_bytes:
                groups.append({"partition": partition, "inputs": take})
    return groups


def merge_segment_group(index_dir: str, partition: int, inputs: list[dict], out_name: str,
                        codec_name: str) -> dict:
    """K-way merge of the input segments' sorted term streams into one
    new segment. Per term: concat contributor postings in docid order."""
    from lucene_solr_ray.pipelines.build import segment_dir

    readers = [SegmentReader(segment_dir(index_dir, partition, s["name"])) for s in inputs]
    # order readers by per-segment docid_min so per-term concat is docid-ordered
    readers.sort(key=lambda r: r.meta["docid_min"])
    all_terms = np.unique(np.concatenate([r.terms for r in readers if len(r.terms)]))\
        if any(len(r.terms) for r in readers) else np.empty(0, dtype=object)

    terms_out: list[np.ndarray] = []
    docids_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    norms_out: list[np.ndarray] = []
    for term in all_terms:
        t = str(term)
        for r in readers:
            i = r.lookup(t)
            if i is None:
                continue
            d, tf, m = r.postings(i)
            docids_out.append(d)
            tfs_out.append(tf)
            norms_out.append(m)
            terms_out.append(np.full(len(d), t, dtype=object))
    for r in readers:
        r.close()
    if terms_out:
        terms_c = np.concatenate(terms_out)
        docids_c = np.concatenate(docids_out)
        tfs_c = np.concatenate(tfs_out)
        norms_c = np.concatenate(norms_out)
    else:
        terms_c = np.empty(0, dtype=object)
        docids_c = tfs_c = norms_c = np.empty(0, dtype=np.int64)
    seg_dir = segment_dir(index_dir, partition, out_name)
    meta = write_segment(
        seg_dir, terms_c, docids_c, tfs_c, norms_c, codec_name=codec_name,
        lineage={"merged_from": [s["name"] for s in inputs]},
    )
    return meta


def run_merge_round(index_dir: str, generation: int | None = None,
                    force_max_segments: int | None = None, gc: bool = True,
                    **plan_kwargs) -> dict | None:
    """Plan + execute one merge round on Ray; commit a new generation.
    Returns the new manifest, or None if nothing to merge."""
    import ray.data

    manifest = load_manifest(index_dir, generation)
    groups = plan_merges(manifest, force_max_segments=force_max_segments, **plan_kwargs)
    if not groups:
        return None
    gen = manifest["generation"]
    codec_name = manifest["codec"]
    descriptors = [
        {
            "partition": g["partition"],
            "inputs": [s["name"] for s in g["inputs"]],
            "out_name": f"g{gen + 1:03d}-m{g['partition']:04d}-{i:03d}",
        }
        for i, g in enumerate(groups)
    ]
    seg_by_key = {(s["partition"], s["name"]): s for s in manifest["segments"]}

    def _do_merge(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            t0 = time.perf_counter()
            inputs = [seg_by_key[(row["partition"], n)] for n in row["inputs"]]
            meta = merge_segment_group(index_dir, row["partition"], inputs, row["out_name"], codec_name)
            rows.append(
                {
                    "partition": row["partition"],
                    "name": row["out_name"],
                    "n_terms": meta["n_terms"],
                    "n_postings": meta["n_postings"],
                    "sum_tf": meta["sum_tf"],
                    "postings_bytes": meta["postings_bytes"],
                    "postings_crc32": meta["postings_crc32"],
                    "docid_min": meta["docid_min"],
                    "docid_max": meta["docid_max"],
                    "wall_s": time.perf_counter() - t0,
                    "merged_from": ",".join(row["inputs"]),
                }
            )
        return pa.Table.from_pylist(rows)

    merged_rows = (
        ray.data.from_items(descriptors)
        .map_batches(_do_merge, batch_format="pyarrow", batch_size=1)
        .take_all()
    )

    replaced = {(d["partition"], n) for d in descriptors for n in d["inputs"]}
    kept = [s for s in manifest["segments"] if (s["partition"], s["name"]) not in replaced]
    new_segs = kept + [
        {k: row[k] for k in (
            "partition", "name", "n_terms", "n_postings", "sum_tf", "postings_bytes",
            "postings_crc32", "docid_min", "docid_max", "wall_s", "merged_from")}
        for row in merged_rows
    ]
    new_segs.sort(key=lambda s: (s["partition"], s["name"]))
    new_manifest = dict(
        manifest,
        segments=new_segs,
        metrics=dict(manifest.get("metrics", {}), merge_round_groups=len(groups)),
    )
    new_manifest.pop("generation", None)
    new_gen = commit_manifest(index_dir, new_manifest)
    new_manifest["generation"] = new_gen
    if gc:
        from lucene_solr_ray.pipelines.build import segment_dir

        for partition, name in sorted(replaced):
            shutil.rmtree(segment_dir(index_dir, partition, name), ignore_errors=True)
    return new_manifest


def force_merge(index_dir: str, max_segments: int = 1, gc: bool = True) -> dict:
    """forceMerge(k): repeated rounds until <= k segments per partition
    ([U] lucene/core/.../index/IndexWriter.java forceMerge)."""
    manifest = load_manifest(index_dir)
    while True:
        out = run_merge_round(index_dir, force_max_segments=max_segments, gc=gc)
        if out is None:
            return manifest
        manifest = out
