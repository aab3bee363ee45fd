"""Index replication — the Lucene replicator module re-expressed for a
shared-nothing Ray cluster ([U] lucene/replicator/.../IndexRevision.java,
ReplicationClient.java, IndexReplicationHandler.java).

A *revision* is a committed manifest generation; replication is
pull-based and incremental: the replica diffs the primary's latest
revision against its own files and fetches only what is missing.
Segments are immutable and content-addressed (name = (generation,
bucket); crc32 in the manifest), so a present-and-size-matching file is
never re-copied — re-replication after a small append moves only the
new segments, not the index.  Copies fan out as Ray tasks (one per
segment dir — file I/O, not batch transforms, so raw tasks are the
right tool).  The manifest is published LAST via the replica's own
two-phase commit, mirroring IndexReplicationHandler's
"copy files, then sync segments_N" order: a crash mid-copy leaves the
replica's previous revision authoritative.
"""

from __future__ import annotations

import os
import shutil

import ray

from lucene_solr_ray.state.manifest import (
    commit_manifest,
    latest_generation,
    load_manifest,
)


def _copy_file(src: str, dst: str) -> int:
    """Copy one file if absent or size-mismatched; returns bytes copied."""
    if os.path.exists(dst) and os.path.getsize(dst) == os.path.getsize(src):
        return 0
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + f".tmp-{os.getpid()}"
    shutil.copyfile(src, tmp)
    os.rename(tmp, dst)
    return os.path.getsize(dst)


@ray.remote
def _copy_tree(src_dir: str, dst_dir: str) -> int:
    n = 0
    for name in sorted(os.listdir(src_dir)):
        n += _copy_file(os.path.join(src_dir, name), os.path.join(dst_dir, name))
    return n


def _segment_relpath(seg: dict) -> str:
    return os.path.join("segments", f"p{seg['partition']:04d}", seg["name"])


def replicate(primary_dir: str, replica_dir: str, gc: bool = True) -> dict:
    """Pull the primary's latest revision into replica_dir.  Returns
    {generation, n_segments_copied, bytes_copied, gc_removed}."""
    manifest = load_manifest(primary_dir)
    os.makedirs(replica_dir, exist_ok=True)

    # 1. fetch missing segment dirs in parallel (immutable => skip-if-present)
    futs = []
    copied_names = []
    for seg in manifest["segments"]:
        rel = _segment_relpath(seg)
        src = os.path.join(primary_dir, rel)
        dst = os.path.join(replica_dir, rel)
        if not os.path.isdir(dst) or set(os.listdir(dst)) != set(os.listdir(src)):
            futs.append(_copy_tree.remote(src, dst))
            copied_names.append(seg["name"])
    # 2. stored fields + tombstones: flat file dirs, immutable files
    for sub in ("docs", "deletes"):
        src_sub = os.path.join(primary_dir, sub)
        if os.path.isdir(src_sub):
            futs.append(_copy_tree.remote(src_sub, os.path.join(replica_dir, sub)))
    nbytes = sum(ray.get(futs)) if futs else 0
    marker = os.path.join(primary_dir, "docs.complete")
    if os.path.exists(marker):
        _copy_file(marker, os.path.join(replica_dir, "docs.complete"))

    # 3. publish: replica keeps its own generation counter (a revision
    # sequence local to this client, like ReplicationClient's handler)
    src_gen = manifest["generation"]
    pub = {k: v for k, v in manifest.items() if k != "generation"}
    pub["replicated_from"] = {"path": primary_dir, "generation": src_gen}
    gen = commit_manifest(replica_dir, pub)

    # 4. gc: drop replica segment dirs no revision references any more
    removed = []
    if gc:
        live = {_segment_relpath(s) for s in manifest["segments"]}
        seg_root = os.path.join(replica_dir, "segments")
        if os.path.isdir(seg_root):
            for part in sorted(os.listdir(seg_root)):
                pdir = os.path.join(seg_root, part)
                for name in sorted(os.listdir(pdir)):
                    rel = os.path.join("segments", part, name)
                    if rel not in live:
                        shutil.rmtree(os.path.join(pdir, name))
                        removed.append(rel)

    return {
        "generation": gen,
        "n_segments_copied": len(copied_names),
        "bytes_copied": nbytes,
        "gc_removed": removed,
    }


def snapshot(index_dir: str, snap_dir: str, generation: int | None = None) -> dict:
    """Point-in-time backup — SnapShooter ([U] solr/core/.../handler/
    SnapShooter.java via ReplicationHandler's backup command): copy the
    named generation's segment dirs, stored fields, and tombstone tables
    into ``snap_dir``, publishing the manifest LAST (the same crash-safe
    order as replicate). Unlike a rolling replica the snapshot is PINNED:
    it stays restorable to exactly this commit point after the source
    index merges, deletes, gc's, or advances generations. The snapshot
    directory is itself a valid index layout."""
    manifest = load_manifest(index_dir, generation)
    os.makedirs(snap_dir, exist_ok=True)
    futs = []
    for seg in manifest["segments"]:
        rel = _segment_relpath(seg)
        src = os.path.join(index_dir, rel)
        dst = os.path.join(snap_dir, rel)
        if not os.path.isdir(dst) or set(os.listdir(dst)) != set(os.listdir(src)):
            futs.append(_copy_tree.remote(src, dst))
    for sub in ("docs", "deletes", "tvs"):
        src_sub = os.path.join(index_dir, sub)
        if os.path.isdir(src_sub):
            futs.append(_copy_tree.remote(src_sub, os.path.join(snap_dir, sub)))
    nbytes = sum(ray.get(futs)) if futs else 0
    marker = os.path.join(index_dir, "docs.complete")
    if os.path.exists(marker):
        _copy_file(marker, os.path.join(snap_dir, "docs.complete"))
    pub = {k: v for k, v in manifest.items() if k != "generation"}
    pub["snapshot_of"] = {"path": index_dir, "generation": manifest["generation"]}
    gen = commit_manifest(snap_dir, pub)
    return {"generation": gen, "bytes_copied": nbytes,
            "n_segments": len(manifest["segments"])}


def restore(snap_dir: str, dest_dir: str) -> dict:
    """RestoreCore ([U] solr/core/.../handler/RestoreCore.java):
    materialize a working index from a snapshot. A snapshot is a valid
    index layout, so restore is a pull-replication from it — incremental
    and crash-safe for the same reasons."""
    return replicate(snap_dir, dest_dir, gc=True)


def snapshot_restore_retrieve(sf_dir: str, terms=("vector",),
                              delete_terms=("merge",)):
    """Driver entry: snapshot the docs index, MUTATE the source copy
    (delete-by-query + expunge — segments rewritten, old ones gc'd),
    restore the snapshot into a third dir, and answer the query FROM THE
    RESTORE: results must equal the PRE-MUTATION corpus (the SQL
    oracle), proving point-in-time semantics."""
    import shutil as _sh

    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id, docs_index
    from lucene_solr_ray.pipelines.deletes import delete_by_query
    from lucene_solr_ray.pipelines.merge import force_merge
    from lucene_solr_ray.pipelines.search import IndexSearcher

    primary = docs_index(sf_dir)
    work = primary + "-snapwork"
    snap = primary + "-snap"
    dest = primary + "-restored"
    for d in (work, snap, dest):
        _sh.rmtree(d, ignore_errors=True)
    _sh.copytree(primary, work)
    snapshot(work, snap)
    delete_by_query(work, list(delete_terms), mode="or")
    force_merge(work, max_segments=1, expunge_deletes=True)  # source diverges
    restore(snap, dest)
    s = IndexSearcher(dest)
    d, _ = s.search(list(terms), k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(dest)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def replica_retrieve(sf_dir: str, terms=("vector",)):
    """Driver entry: replicate the documents index into a replica dir
    (incremental pull; a second call copies nothing) and answer a term
    query FROM THE REPLICA — result must equal the primary's."""
    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id, docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    primary = docs_index(sf_dir)
    replica_dir = primary + "-replica"
    replicate(primary, replica_dir)
    s = IndexSearcher(replica_dir)
    d, _ = s.search(list(terms), k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(replica_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})
