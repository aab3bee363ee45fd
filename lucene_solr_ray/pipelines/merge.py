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

from lucene_solr_ray.segment import SegmentReader
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
    tombstones: np.ndarray | None = None,
    rewrite_all: bool = False,
) -> list[dict]:
    """Pure planner -> merge groups [{partition, inputs: [seg dicts]}].

    ``force_max_segments`` = forceMerge(k): ignore tiering and merge down
    to at most k segments per partition.

    ``tombstones`` (sorted docids, expunge mode): EVERY segment whose
    docid range intersects the tombstone set must be rewritten this
    round (forceMergeDeletes rewrites any segment containing deletions,
    even when segment counts are already within bounds) — segments the
    tiering/force plan left out get singleton rewrite groups. This
    full-coverage guarantee is what lets the caller clear the tombstone
    table after one round.

    Correctness invariant: a partition's segments hold pairwise-disjoint
    docid ranges (build salt ranges / appends / prior merges), and the
    read path (TermCursor) assumes per-term docids ascend across segments
    ordered by docid_min. Merge groups are therefore chosen ONLY over
    docid-contiguous runs (adjacent in docid_min order) — merging a
    bytes-sorted arbitrary subset could produce a segment whose docid
    range interleaves with a left-out segment and silently corrupt
    query results.
    """
    by_partition: dict[int, list[dict]] = {}
    for seg in manifest["segments"]:
        by_partition.setdefault(seg["partition"], []).append(seg)
    groups = []
    for partition, segs in sorted(by_partition.items()):
        segs = sorted(segs, key=lambda s: (s["docid_min"], s["name"]))
        if rewrite_all:
            # IndexUpgrader mode: every segment is rewritten this round
            # (one full-partition group — the whole docid run, so the
            # contiguity invariant holds trivially), even singletons
            groups.append({"partition": partition, "inputs": segs})
            continue
        if force_max_segments is not None:
            while len(segs) > force_max_segments:
                take_n = max(2, min(max_merge_at_once, len(segs) - force_max_segments + 1))
                groups.append({"partition": partition, "inputs": segs[:take_n]})
                segs = segs[take_n:]  # planned inputs leave the pool this round
            continue
        # tiered: merge while too many small-tier segments. Candidate
        # windows are docid-adjacent runs of eligible segments; pick the
        # cheapest window (smallest total bytes -> small-tier-first,
        # TieredMergePolicy's skew-friendly economy) that fits the cap.
        eligible_mask = [s["postings_bytes"] < max_merged_bytes for s in segs]
        n_eligible = sum(eligible_mask)
        if n_eligible <= segs_per_tier:
            continue
        best = None  # (total_bytes, start, length)
        i = 0
        while i < len(segs):
            if not eligible_mask[i]:
                i += 1
                continue
            j = i
            while j < len(segs) and eligible_mask[j]:
                j += 1
            run_len = j - i
            win = min(max_merge_at_once, run_len)
            if win >= 2:
                sizes = [s["postings_bytes"] for s in segs[i:j]]
                prefix = [0]
                for b in sizes:
                    prefix.append(prefix[-1] + b)
                for s0 in range(run_len - win + 1):
                    total = prefix[s0 + win] - prefix[s0]
                    if total <= max_merged_bytes and (best is None or total < best[0]):
                        best = (total, i + s0, win)
            i = j
        if best is not None:
            _, start, length = best
            groups.append({"partition": partition, "inputs": segs[start : start + length]})
    if tombstones is not None and len(tombstones):
        planned = {(g["partition"], s["name"]) for g in groups for s in g["inputs"]}
        for partition, segs in sorted(by_partition.items()):
            for s in sorted(segs, key=lambda s: (s["docid_min"], s["name"])):
                if (partition, s["name"]) in planned:
                    continue
                lo = int(np.searchsorted(tombstones, s["docid_min"]))
                hi = int(np.searchsorted(tombstones, s["docid_max"], side="right"))
                if hi > lo:  # at least one tombstoned docid in range
                    groups.append({"partition": partition, "inputs": [s]})
    return groups


def merge_segment_group(index_dir: str, partition: int, inputs: list[dict], out_name: str,
                        codec_name: str, deleted: np.ndarray | None = None) -> dict:
    """Streaming k-way merge of the input segments' sorted term streams
    into one new segment ([U] lucene/core/.../index/SegmentMerger.java):
    a heap over the contributors' sorted term dicts yields terms in
    ascending UTF-8 order; per term, contributor postings (docid-disjoint
    ranges, readers ordered by docid_min) concatenate in docid order and
    stream straight into ``write_segment_grouped`` — memory is bounded by
    one term's postings, never the whole merge group. Positions (.pos
    analogue) are carried through when every contributor has them."""
    import heapq

    from lucene_solr_ray.codec.packedints import decode_all
    from lucene_solr_ray.pipelines.build import segment_dir
    from lucene_solr_ray.segment import write_segment_grouped

    readers = [SegmentReader(segment_dir(index_dir, partition, s["name"])) for s in inputs]
    # order readers by per-segment docid_min so per-term concat is docid-ordered
    readers.sort(key=lambda r: r.meta["docid_min"])
    with_pos = bool(readers) and all(r.has_positions for r in readers)

    def term_groups():
        # heap entries: (utf8 key, reader index, term ordinal); reader
        # index tie-break == docid_min order == correct concat order
        heap = [(r._term_keys[0], i, 0) for i, r in enumerate(readers) if len(r.terms)]
        heapq.heapify(heap)
        while heap:
            key = heap[0][0]
            ds, ts, ms, ps = [], [], [], []
            while heap and heap[0][0] == key:
                _, i, ordl = heapq.heappop(heap)
                r = readers[i]
                d, t, m = r.postings(ordl)
                ds.append(d)
                ts.append(t)
                ms.append(m)
                if with_pos:
                    ps.append(decode_all(r.read_pos_blob(ordl)))
                if ordl + 1 < len(r.terms):
                    heapq.heappush(heap, (r._term_keys[ordl + 1], i, ordl + 1))
            term = key.decode("utf-8")
            d = ds[0] if len(ds) == 1 else np.concatenate(ds)
            t = ts[0] if len(ts) == 1 else np.concatenate(ts)
            m = ms[0] if len(ms) == 1 else np.concatenate(ms)
            p = None
            if with_pos:
                p = ps[0] if len(ps) == 1 else np.concatenate(ps)
            if deleted is not None and len(deleted):
                # expunge: drop tombstoned postings (and their position
                # slices) while the segment is being rewritten anyway
                pos_idx = np.searchsorted(deleted, d)
                pos_idx = np.minimum(pos_idx, len(deleted) - 1)
                keep = deleted[pos_idx] != d
                if not keep.all():
                    if p is not None:
                        p = p[np.repeat(keep, t)]
                    d, t, m = d[keep], t[keep], m[keep]
                if len(d) == 0:
                    continue  # term fully expunged
            if p is not None:
                yield term, d, t, m, p
            else:
                yield term, d, t, m

    seg_dir = segment_dir(index_dir, partition, out_name)
    meta = write_segment_grouped(
        seg_dir, term_groups(), codec_name=codec_name,
        lineage={"merged_from": [s["name"] for s in inputs]},
    )
    for r in readers:
        r.close()
    return meta


def run_merge_round(index_dir: str, generation: int | None = None,
                    force_max_segments: int | None = None, gc: bool = True,
                    expunge_deletes: bool = False,
                    codec_override: str | None = None, **plan_kwargs) -> dict | None:
    """Plan + execute one merge round on Ray; commit a new generation.
    Returns the new manifest, or None if nothing to merge.

    ``expunge_deletes``: purge tombstoned postings while rewriting
    (IndexWriter.forceMergeDeletes analogue). The planner is given the
    tombstone set, so every segment whose docid range intersects it is
    rewritten this round (singleton groups if tiering wouldn't touch
    them); afterwards no stale postings remain anywhere, the tombstones
    move to the persisted ``purged`` set, and sum_dl is recomputed from
    ALL live segments (kept + new — kept segments are tombstone-free by
    construction, so the invariant sum(segment sum_tf) == sum_dl
    holds after partial-rewrite rounds too)."""
    import ray.data

    from lucene_solr_ray.pipelines.deletes import load_deletes, load_purged, _write_docid_table

    manifest = load_manifest(index_dir, generation)
    deleted = load_deletes(index_dir, manifest) if expunge_deletes else None
    if deleted is not None and not len(deleted):
        deleted = None
    groups = plan_merges(manifest, force_max_segments=force_max_segments,
                         tombstones=deleted, **plan_kwargs)

    def _retire_tombstones(m: dict) -> dict:
        """Move the (fully-applied) tombstones into the purged set."""
        prev_purged = load_purged(index_dir, manifest)
        purged = np.union1d(prev_purged, deleted) if prev_purged is not None else deleted
        m.pop("deletes_file", None)
        m["n_deleted"] = 0
        m["purged_file"] = _write_docid_table(index_dir, purged, "purged")
        m["n_docs_purged"] = int(len(purged))
        m["sum_dl"] = sum(s["sum_tf"] for s in m["segments"])
        return m

    if not groups:
        if deleted is None:
            return None
        # expunge requested but no segment's docid range intersects the
        # tombstones (e.g. empty docs, or postings already purged): no
        # postings to drop, but the tombstones are fully applied — commit
        # a bookkeeping generation retiring them into the purged set.
        new_manifest = _retire_tombstones(dict(manifest))
        new_manifest.pop("generation", None)
        new_gen = commit_manifest(index_dir, new_manifest)
        new_manifest["generation"] = new_gen
        return new_manifest
    gen = manifest["generation"]
    codec_name = codec_override or manifest["codec"]
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
            meta = merge_segment_group(index_dir, row["partition"], inputs, row["out_name"],
                                       codec_name, deleted=deleted)
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
    if codec_override is not None:
        # only valid when EVERY segment was rewritten this round (the
        # upgrade path plans rewrite_all) — readers take the codec from
        # the manifest, so a mixed-codec generation must never commit
        assert not kept, "codec_override requires a rewrite_all plan"
        new_manifest["codec"] = codec_override
    if deleted is not None and len(deleted):
        # the planner guaranteed every tombstone-intersecting segment was
        # rewritten this round -> no stale postings remain (kept segments
        # are tombstone-free by construction); retire the tombstones into
        # the purged set and recompute the live token total (n_docs stays
        # maxDoc: docids are never renumbered — the stable row identity)
        new_manifest = _retire_tombstones(new_manifest)
    new_manifest.pop("generation", None)
    new_gen = commit_manifest(index_dir, new_manifest)
    new_manifest["generation"] = new_gen
    if gc:
        from lucene_solr_ray.pipelines.build import segment_dir

        for partition, name in sorted(replaced):
            shutil.rmtree(segment_dir(index_dir, partition, name), ignore_errors=True)
    return new_manifest


def upgrade_index(index_dir: str, target_codec: str, gc: bool = True) -> dict:
    """IndexUpgrader analogue ([U] lucene/core/.../index/IndexUpgrader.java
    — upgrades all segments by forceMerge(1) under the current codec):
    rewrite EVERY segment with ``target_codec`` (one full-partition merge
    group each, so the docid-contiguity invariant holds trivially) and
    commit a generation whose manifest records the new codec. Readers
    take each segment's codec from its meta.json, so in-flight searchers
    on the old generation stay correct. No-op if already at the target."""
    from lucene_solr_ray.codec import get_postings_codec

    get_postings_codec(target_codec)  # fail loudly on unknown codec names
    manifest = load_manifest(index_dir)
    if manifest["codec"] == target_codec:
        return manifest
    out = run_merge_round(index_dir, gc=gc, codec_override=target_codec,
                          rewrite_all=True)
    if out is None:  # empty index: nothing to rewrite, flip the manifest codec
        new_manifest = dict(manifest, codec=target_codec)
        new_manifest.pop("generation", None)
        new_gen = commit_manifest(index_dir, new_manifest)
        new_manifest["generation"] = new_gen
        return new_manifest
    return out


def force_merge(index_dir: str, max_segments: int = 1, gc: bool = True,
                expunge_deletes: bool = False) -> dict:
    """forceMerge(k): repeated rounds until <= k segments per partition
    ([U] lucene/core/.../index/IndexWriter.java forceMerge;
    expunge_deletes -> forceMergeDeletes)."""
    manifest = load_manifest(index_dir)
    while True:
        out = run_merge_round(index_dir, force_max_segments=max_segments, gc=gc,
                              expunge_deletes=expunge_deletes)
        if out is None:
            return manifest
        manifest = out
