"""Deletes / updates — the BufferedUpdatesStream + .liv analogue
([U] lucene/core/.../index/BufferedUpdatesStream.java, the per-segment
liveDocs bitset of [U] .../codecs/lucene80/Lucene80LiveDocsFormat.java).

docIDs are global in this layout (term-hash partitions each cover the
whole docid space), so tombstones live in ONE sorted docid table per
manifest generation (``deletes-<crc>.parquet``) instead of per-segment
bitsets. Commit protocol matches Lucene: a delete writes a new deletes
file and commits a new manifest generation referencing it; segment data
is untouched. Readers filter candidates against the tombstone set at
collection time (the liveDocs test in every DISI), so deleted docs stop
matching immediately while df/cf/norm statistics keep counting them
until a merge purges the postings — Lucene semantics.

Purging: ``run_merge_round(expunge_deletes=True)`` (or
``force_merge(..., expunge_deletes=True)``) plans a rewrite of EVERY
segment whose docid range intersects the tombstone set (singleton
groups when tiering wouldn't touch them — forceMergeDeletes rewrites
any segment containing deletions) and drops tombstoned postings while
rewriting. After the round no stale postings remain anywhere, so the
tombstones move to the persisted ``purged`` set (a second sorted-docid
table): purged docs are excluded from scoring stats (n_scoring,
sum_dl recomputed from live segments) AND keep being filtered from
docs.parquet-backed paths (match_all / ts-range / docvalues), whose
rows are never rewritten. The purged set is a set-union across
expunges, so re-deleting an already-purged docid can never
double-count n_docs_purged. n_docs stays maxDoc (docids are never
renumbered — they are the stable row identity), so dense accumulators
stay correctly sized.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.state.manifest import commit_manifest, load_manifest

DELETES_DIRNAME = "deletes"


def _load_docid_table(index_dir: str, manifest: dict, key: str) -> np.ndarray | None:
    name = manifest.get(key)
    if not name:
        return None
    t = pq.read_table(os.path.join(index_dir, DELETES_DIRNAME, name), columns=["docid"])
    return t.column("docid").to_numpy().astype(np.int64)


def load_deletes(index_dir: str, manifest: dict) -> np.ndarray | None:
    """Sorted int64 tombstone docids for a manifest generation, or None."""
    return _load_docid_table(index_dir, manifest, "deletes_file")


def load_purged(index_dir: str, manifest: dict) -> np.ndarray | None:
    """Sorted int64 docids whose postings have been physically purged by
    an expunge merge; permanently non-live, or None."""
    return _load_docid_table(index_dir, manifest, "purged_file")


def _write_docid_table(index_dir: str, docids: np.ndarray, prefix: str) -> str:
    os.makedirs(os.path.join(index_dir, DELETES_DIRNAME), exist_ok=True)
    crc = zlib.crc32(docids.tobytes()) & 0xFFFFFFFF
    name = f"{prefix}-{len(docids):010d}-{crc:08x}.parquet"
    path = os.path.join(index_dir, DELETES_DIRNAME, name)
    if not os.path.exists(path):
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(pa.table({"docid": pa.array(docids, pa.int64())}), tmp)
        os.rename(tmp, path)
    return name


def _write_deletes(index_dir: str, docids: np.ndarray) -> str:
    return _write_docid_table(index_dir, docids, "deletes")


def delete_docs(index_dir: str, docids) -> dict:
    """Tombstone the given global docids (deleteDocuments(Term..) by id);
    idempotent union with existing tombstones; commits a new generation.
    Docids outside [0, n_docs) are rejected (no such doc can exist), and
    docids already purged by a prior expunge are dropped (their postings
    are gone and they are permanently non-live — re-deleting them must
    not inflate n_deleted or a later n_docs_purged)."""
    manifest = load_manifest(index_dir)
    n_docs = int(manifest["n_docs"])
    new = np.asarray(sorted(set(int(d) for d in docids)), dtype=np.int64)
    if len(new) and (new[0] < 0 or new[-1] >= n_docs):
        bad = new[(new < 0) | (new >= n_docs)]
        raise ValueError(f"delete_docs: docids outside [0, {n_docs}): {bad[:8].tolist()}")
    purged = load_purged(index_dir, manifest)
    if purged is not None and len(purged):
        new = np.setdiff1d(new, purged, assume_unique=True)
    prev = load_deletes(index_dir, manifest)
    merged = np.union1d(prev, new) if prev is not None else new
    new_manifest = dict(manifest, n_deleted=int(len(merged)))
    if len(merged):
        new_manifest["deletes_file"] = _write_deletes(index_dir, merged)
    new_manifest.pop("generation", None)
    gen = commit_manifest(index_dir, new_manifest)
    new_manifest["generation"] = gen
    return new_manifest


def delete_by_query(index_dir: str, terms, mode: str = "or") -> dict:
    """IndexWriter.deleteDocuments(Query): tombstone every doc matching
    the boolean term query."""
    from lucene_solr_ray.pipelines.search import IndexSearcher

    s = IndexSearcher(index_dir)
    d, _ = s.search(terms, k=max(1, s.n_docs), mode=mode)
    return delete_docs(index_dir, d.tolist())


def update_numeric_docvalues(index_dir: str, field: str, updates: dict) -> dict:
    """In-place numeric doc-values update ([U] lucene/core/.../index/
    IndexWriter.java updateNumericDocValue + the per-generation dvd/dvm
    sidecar files of [U] .../index/ReadersAndUpdates.java): segment data
    is untouched — a new generation commits an overlay table
    (docid -> value) that readers apply over the stored column. Repeated
    updates merge with newest-wins; docids outside [0, n_docs) are
    rejected. This is the reindex-free field mutation Lucene uses for
    e.g. popularity signals."""
    manifest = load_manifest(index_dir)
    n_docs = int(manifest["n_docs"])
    ids = np.asarray(sorted(int(d) for d in updates), dtype=np.int64)
    if len(ids) and (ids[0] < 0 or ids[-1] >= n_docs):
        bad = ids[(ids < 0) | (ids >= n_docs)]
        raise ValueError(f"update_numeric_docvalues: docids outside [0, {n_docs}): {bad[:8].tolist()}")
    vals = np.asarray([int(updates[int(d)]) for d in ids], dtype=np.int64)

    dv_map = dict(manifest.get("dv_updates") or {})
    prev_name = dv_map.get(field)
    if prev_name:
        prev = pq.read_table(os.path.join(index_dir, DELETES_DIRNAME, prev_name))
        pid = prev.column("docid").to_numpy().astype(np.int64)
        pval = prev.column("value").to_numpy().astype(np.int64)
        keep = ~np.isin(pid, ids)  # newest wins
        ids = np.concatenate([pid[keep], ids])
        vals = np.concatenate([pval[keep], vals])
        order = np.argsort(ids)
        ids, vals = ids[order], vals[order]

    tab = pa.table({"docid": pa.array(ids, pa.int64()),
                    "value": pa.array(vals, pa.int64())})
    os.makedirs(os.path.join(index_dir, DELETES_DIRNAME), exist_ok=True)
    crc = zlib.crc32(ids.tobytes() + vals.tobytes()) & 0xFFFFFFFF
    name = f"dvup-{field}-{crc:08x}.parquet"
    pq.write_table(tab, os.path.join(index_dir, DELETES_DIRNAME, name))
    dv_map[field] = name
    new_manifest = dict(manifest, dv_updates=dv_map)
    new_manifest.pop("generation", None)
    gen = commit_manifest(index_dir, new_manifest)
    new_manifest["generation"] = gen
    return new_manifest


def load_dv_updates(index_dir: str, manifest: dict, field: str):
    """(docids, values) overlay for a field, or None."""
    name = (manifest.get("dv_updates") or {}).get(field)
    if not name:
        return None
    t = pq.read_table(os.path.join(index_dir, DELETES_DIRNAME, name))
    return (t.column("docid").to_numpy().astype(np.int64),
            t.column("value").to_numpy().astype(np.int64))
