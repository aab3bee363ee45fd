"""Transaction-log-lite: bounded-latency micro-batch ingest.

Semantics from [U] solr/core/src/java/org/apache/solr/update/
TransactionLog.java + UpdateLog.java (not the binary format):
uncommitted adds land in an append-only log readable by RealTimeGet
immediately; a soft commit folds pending log entries into the index as
a new manifest generation, making them searchable. Durability unit
stays the committed manifest; the log closes the commit-to-visible gap.

Crash contract (documented, same at-least-once shape as Topic
read/ack): consumption is recorded in ``tlog/.consumed-upto`` by atomic
rename AFTER the manifest commit, so a crash between the two re-appends
the batch on replay. Solr dedups replays by document version; we keep
the window explicit instead.

Scale notes: one tlog file per append (small parquet, atomic rename);
soft_commit's micro path analyzes the pending rows in-process and
writes one segment per touched term partition directly — no Ray
pipeline spin-up — so commit-to-visible latency is tens of
milliseconds, independent of corpus size (the appended docid range is
disjoint above maxDoc, preserving every read/merge invariant). Indexes
with positions/term-vectors fall back to build_index(append=True).
"""

from __future__ import annotations

import glob
import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TLOG_DIRNAME = "tlog"
CONSUMED_MARKER = ".consumed-upto"
MICRO_MAX_ROWS = 10_000


def tlog_dir(index_dir: str) -> str:
    return os.path.join(index_dir, TLOG_DIRNAME)


def _consumed_upto(index_dir: str) -> int:
    path = os.path.join(tlog_dir(index_dir), CONSUMED_MARKER)
    if not os.path.exists(path):
        return -1
    with open(path) as fh:
        return int(json.load(fh)["upto"])


def tlog_append(index_dir: str, table: pa.Table) -> int:
    """Append one micro-batch to the log; returns its sequence number.
    Atomic (tmp + rename); visible to realtime_get_overlay immediately."""
    d = tlog_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    existing = [
        int(os.path.basename(p)[5:13])
        for p in glob.glob(os.path.join(d, "tlog-*.parquet"))
    ]
    seq = (max(existing) + 1) if existing else 0
    path = os.path.join(d, f"tlog-{seq:08d}.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(table.replace_schema_metadata(None), tmp)
    os.rename(tmp, path)
    return seq


def pending_files(index_dir: str) -> list[tuple[int, str]]:
    """(seq, path) of unconsumed log entries, ascending."""
    upto = _consumed_upto(index_dir)
    out = []
    for p in sorted(glob.glob(os.path.join(tlog_dir(index_dir), "tlog-*.parquet"))):
        seq = int(os.path.basename(p)[5:13])
        if seq > upto:
            out.append((seq, p))
    return out


def realtime_get_overlay(index_dir: str, doc_ids: list[int]) -> pa.Table:
    """RealTimeGet across the pending log + the committed index
    ([U] solr/core/.../handler/component/RealTimeGetComponent.java reads
    the ulog before the searcher): for each id the NEWEST pending log
    row wins; ids absent from the log fall back to committed stored
    fields. -> (doc_id, text, pending) sorted by doc_id."""
    import pyarrow.compute as pc

    want = sorted({int(x) for x in doc_ids})
    hits: dict[int, str] = {}
    for _, path in reversed(pending_files(index_dir)):  # newest first
        if not set(want) - set(hits):
            break
        t = pq.read_table(path, columns=["doc_id", "text"])
        t = t.filter(pc.is_in(t.column("doc_id"),
                              value_set=pa.array(want, pa.int64())))
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            hits.setdefault(int(did), text)
    missing = [d for d in want if d not in hits]
    committed = []
    if missing:
        from lucene_solr_ray.functions.fulltext import realtime_get

        committed = realtime_get(index_dir, missing).to_pylist()
    rows = sorted(
        [(d, text, True) for d, text in hits.items()]
        + [(row["doc_id"], row["text"], False) for row in committed]
    )
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "pending": pa.array([r[2] for r in rows], pa.bool_()),
    })


class TlogPartitionWriter:
    """Per-partition segment writer actor ([U] solr/core/.../update/
    TransactionLog.java keeps per-core logs; at cluster scale
    micro-batches route to partition-owned writers instead of the
    session process). One actor owns a stable subset of term partitions
    (partition % pool size); the driver analyzes the micro-batch, ships
    each partition's packed postings once, and commits the manifest only
    after every owner acks — an actor death before ack leaves the
    manifest and consumption marker untouched, so the batch replays
    (at-least-once, same contract as the in-process path)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    def ping(self) -> bool:
        # warm the writer's imports at pool spinup — the first write's
        # latency budget must not pay module loading
        from lucene_solr_ray.pipelines.build import segment_dir  # noqa: F401
        from lucene_solr_ray.segment import write_segment  # noqa: F401
        return True

    def write(self, partition: int, name: str, terms, docids, tfs, norms,
              codec_name: str, lineage: dict) -> tuple:
        from lucene_solr_ray.pipelines.build import segment_dir
        from lucene_solr_ray.segment import write_segment

        sd = segment_dir(self.index_dir, partition, name)
        meta = write_segment(sd, terms, docids, tfs, norms,
                             codec_name=codec_name, lineage=lineage)
        return partition, name, meta


#: long-lived writer pools keyed by (index_dir, size) — Solr-core-like
#: lifecycle; a dead actor drops the pool so the next commit rebuilds it
_WRITER_POOLS: dict = {}


def writer_pool(index_dir: str, size: int = 4) -> list:
    import ray

    key = (os.path.abspath(index_dir), size)
    pool = _WRITER_POOLS.get(key)
    if pool is None:
        actor = ray.remote(num_cpus=0.5)(TlogPartitionWriter)
        pool = [actor.remote(index_dir) for _ in range(size)]
        ray.get([a.ping.remote() for a in pool])  # warm: spinup off the commit path
        _WRITER_POOLS[key] = pool
    return pool


def _drop_writer_pool(index_dir: str) -> None:
    for key in [k for k in _WRITER_POOLS if k[0] == os.path.abspath(index_dir)]:
        del _WRITER_POOLS[key]


def _micro_commit(index_dir: str, manifest: dict, tables: list[pa.Table],
                  max_seq: int, distributed_writers: bool = False,
                  pool_size: int = 4) -> dict:
    """In-process micro-batch index append: analyze pending rows, write
    one segment per touched term partition, side-write stored fields,
    commit a new manifest generation. No Ray pipeline — bounded latency.
    ``distributed_writers=True`` routes each touched partition's segment
    write to its owning TlogPartitionWriter actor (cluster path); the
    manifest commit still happens only after every write acks."""
    from lucene_solr_ray.analysis import batch_term_counts
    from lucene_solr_ray.codec.norms import encode_dl
    from lucene_solr_ray.pipelines.build import (
        DOCS_DIRNAME, segment_dir, stable_term_hash)
    from lucene_solr_ray.segment import write_segment
    from lucene_solr_ray.state.manifest import commit_manifest

    t0 = time.perf_counter()
    batch = pa.concat_tables(tables, promote_options="permissive")
    n = batch.num_rows
    base = int(manifest["n_docs"])
    gen_next = int(manifest["generation"]) + 1
    texts = batch.column("text").to_pylist()
    rows, terms, tfs, dl = batch_term_counts(texts)
    norms_per_doc = encode_dl(dl)
    docids = base + rows
    norms = norms_per_doc[rows]

    new_segments = []
    if len(terms):
        parts = stable_term_hash(terms) % int(manifest["num_partitions"])
        name = f"g{gen_next:03d}-tlog{max_seq:06d}"
        lineage = {"tlog_upto": max_seq}
        touched = np.unique(parts)
        if distributed_writers:
            import ray

            pool = writer_pool(index_dir, pool_size)
            futs = []
            for p in touched:
                sel = parts == p
                owner = pool[int(p) % len(pool)]  # stable partition ownership
                futs.append(owner.write.remote(
                    int(p), name, terms[sel], docids[sel], tfs[sel],
                    norms[sel], manifest["codec"], lineage))
            try:
                results = ray.get(futs)
            except ray.exceptions.RayActorError:
                # a writer died mid-batch: nothing was committed (the
                # manifest + consumed marker are written only after all
                # acks), so drop the pool and let the caller replay —
                # surviving writers' segment dirs are overwritten by the
                # replay's identical (generation, tlog-seq) names
                _drop_writer_pool(index_dir)
                raise
            metas = [(p_, n_, m) for p_, n_, m in results]
        else:
            metas = []
            for p in touched:
                sel = parts == p
                sd = segment_dir(index_dir, int(p), name)
                meta = write_segment(
                    sd, terms[sel], docids[sel], tfs[sel], norms[sel],
                    codec_name=manifest["codec"], lineage=lineage,
                )
                metas.append((int(p), name, meta))
        for p_, n_, meta in metas:
            new_segments.append({
                "partition": int(p_), "name": n_,
                "n_terms": meta["n_terms"], "n_postings": meta["n_postings"],
                "sum_tf": meta["sum_tf"],
                "postings_bytes": meta["postings_bytes"],
                "postings_crc32": meta["postings_crc32"],
                "docid_min": meta["docid_min"], "docid_max": meta["docid_max"],
                "wall_s": 0.0,
            })

    # stored fields side-write, same naming/idempotence as the builder
    if n:
        docs_table = (
            batch.append_column(
                "docid", pa.array(np.arange(base, base + n, dtype=np.int64))
            ).append_column("dl", pa.array(dl.astype(np.int64)))
            .append_column("norm", pa.array(norms_per_doc))  # uint8, as the builder
        )
        lo, hi = base, base + n - 1
        crc = zlib.crc32("".join(batch.column("conv_id").to_pylist()).encode())
        path = os.path.join(
            index_dir, DOCS_DIRNAME, f"docs-{lo:012d}-{hi:012d}-{crc:08x}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(docs_table.replace_schema_metadata(None), tmp)
        os.rename(tmp, path)

    segments = list(manifest["segments"]) + new_segments
    segments.sort(key=lambda s: (s["partition"], s["name"]))
    carry = {k: manifest[k]
             for k in ("deletes_file", "purged_file", "n_deleted", "n_docs_purged")
             if k in manifest}
    new_manifest = {
        **carry,
        "n_docs": base + n,
        "sum_dl": sum(s["sum_tf"] for s in segments),
        "num_partitions": manifest["num_partitions"],
        "salt": manifest["salt"],
        "codec": manifest["codec"],
        "analysis": manifest["analysis"],
        "docid_mode": manifest["docid_mode"],
        "positions": manifest.get("positions", False),
        "term_vectors": manifest.get("term_vectors", False),
        "segments": segments,
        "metrics": {"tlog_commit_wall_s": time.perf_counter() - t0,
                    "tlog_upto": max_seq},
    }
    gen = commit_manifest(index_dir, new_manifest)
    new_manifest["generation"] = gen
    return new_manifest


def soft_commit(index_dir: str, distributed_writers: bool = False,
                pool_size: int = 4) -> dict:
    """Fold every pending log entry into the index as a new generation
    and mark them consumed. Plain text indexes take the in-process micro
    path; positional / term-vector indexes fall back to
    build_index(append=True). ``distributed_writers=True`` routes the
    micro path's per-partition segment writes to partition-owned writer
    actors (the cluster NRT shape — ingest is no longer a single-process
    hot spot; the at-least-once marker semantics are identical). Returns
    the new manifest (or the current one when nothing is pending) with
    metrics.tlog_visible_s set."""
    from lucene_solr_ray.state.manifest import load_manifest

    t0 = time.perf_counter()
    manifest = load_manifest(index_dir)
    pend = pending_files(index_dir)
    if not pend:
        return manifest
    max_seq = max(seq for seq, _ in pend)
    tables = [pq.read_table(p) for _, p in pend]
    n_rows = sum(t.num_rows for t in tables)
    if (
        n_rows <= MICRO_MAX_ROWS
        and not manifest.get("positions", False)
        and not manifest.get("term_vectors", False)
    ):
        out = _micro_commit(index_dir, manifest, tables, max_seq,
                            distributed_writers=distributed_writers,
                            pool_size=pool_size)
    else:
        import ray.data

        from lucene_solr_ray.pipelines.build import build_index

        out = build_index(
            ray.data.from_arrow(
                pa.concat_tables(tables, promote_options="permissive")),
            index_dir,
            num_partitions=manifest["num_partitions"], salt=manifest["salt"],
            codec_name=manifest["codec"],
            store_positions=manifest.get("positions", False),
            store_term_vectors=manifest.get("term_vectors", False),
            append=True,
        )
    # consumption marker LAST: a crash before this line replays the
    # batch (at-least-once, see module docstring)
    marker = os.path.join(tlog_dir(index_dir), CONSUMED_MARKER)
    tmp = marker + f".tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"upto": max_seq, "generation": out["generation"]}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, marker)
    out.setdefault("metrics", {})["tlog_visible_s"] = time.perf_counter() - t0
    return out
