"""TopicStream / DaemonStream ([U] solr/solrj/.../io/stream/
TopicStream.java, DaemonStream.java) — checkpointed pub-sub pull over
the index.

Solr's TopicStream returns documents matching a query whose version is
greater than the stored checkpoint, then advances the checkpoint; a
DaemonStream re-runs an inner stream on an interval.  Here the
monotonic version is the global docID (docIDs are assigned in stable
(conv_id, turn_idx) order and appends allocate past maxDoc, so docid is
exactly the `_version_` analogue).  Checkpoints are tiny JSON documents
committed with tmp+fsync+rename — the same two-phase pattern as the
manifest. Delivery contract: ``read()`` + ``ack()`` is at-least-once
(the checkpoint commits only after the caller confirms consumption, so
a crashed poller re-reads rather than skips); the one-shot ``poll()``
convenience commits before the caller sees the batch and is therefore
at-most-once — use read/ack when documents must not be lost.

At scale each topic partition can poll independently: the checkpoint
key is (topic_id, partition) and the underlying search already fans out
per-partition; here a single checkpoint covers the whole index.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from lucene_solr_ray.pipelines.search import IndexSearcher


class Topic:
    def __init__(self, index_dir: str, topic_id: str, checkpoint_dir: str):
        self.index_dir = index_dir
        self.topic_id = topic_id
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    @property
    def _ckpt_path(self) -> str:
        return os.path.join(self.checkpoint_dir, f"topic-{self.topic_id}.json")

    def checkpoint(self) -> int:
        """Last-delivered docid (exclusive lower bound), -1 if fresh."""
        if not os.path.exists(self._ckpt_path):
            return -1
        with open(self._ckpt_path) as fh:
            return int(json.load(fh)["checkpoint"])

    def _commit(self, ckpt: int) -> None:
        tmp = self._ckpt_path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"topic_id": self.topic_id, "checkpoint": int(ckpt)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._ckpt_path)

    def read(self, terms, mode: str = "or", batch_size: int = 10_000) -> pa.Table:
        """Read matching docs with docid > checkpoint, oldest first, at
        most batch_size — WITHOUT advancing the checkpoint. The caller
        persists/consumes the batch, then calls ``ack(max docid)``; a
        crash before the ack re-delivers the same batch on the next read
        (at-least-once, as in Solr's TopicStream)."""
        searcher = IndexSearcher(self.index_dir)  # fresh reader sees appends
        ckpt = self.checkpoint()
        docids, _ = searcher.search(terms, k=max(1, searcher.n_docs), mode=mode)
        docids = np.sort(docids.astype(np.int64))
        docids = docids[docids > ckpt][:batch_size]
        return pa.table({"docid": pa.array(docids, pa.int64())})

    def ack(self, max_docid: int) -> None:
        """Commit the checkpoint AFTER the caller has consumed the batch
        (the second phase of read/ack). Monotonic: never moves backward."""
        if int(max_docid) > self.checkpoint():
            self._commit(int(max_docid))

    def poll(self, terms, mode: str = "or", batch_size: int = 10_000) -> pa.Table:
        """read + immediate ack in one call. NOTE: because the checkpoint
        commits before the caller touches the batch, a crash between this
        return and downstream persistence loses the batch — AT-MOST-ONCE.
        Callers needing Solr's at-least-once contract use read()/ack()."""
        out = self.read(terms, mode=mode, batch_size=batch_size)
        if out.num_rows:
            self.ack(int(out.column("docid")[out.num_rows - 1].as_py()))
        return out


def topic_poll_batches(sf_dir: str, terms=("merge",), batch_size: int = 100,
                       n_polls: int = 2) -> pa.Table:
    """Driver entry: n_polls successive TopicStream reads from a fresh
    checkpoint over the documents index — poll p delivers the p-th
    batch_size slice of matching docs in docid (== doc_id) order, and
    the committed checkpoint guarantees no doc is delivered twice."""
    import shutil
    import tempfile

    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id, docs_index

    index_dir = docs_index(sf_dir)
    ckpt_dir = tempfile.mkdtemp(prefix="lsr-topic-")
    try:
        t = Topic(index_dir, "driver", ckpt_dir)
        mapping = _docid_to_doc_id(index_dir)
        polls, doc_ids = [], []
        for p in range(n_polls):
            tb = t.read(list(terms), batch_size=batch_size)
            for d in tb.column("docid").to_pylist():
                polls.append(p)
                doc_ids.append(int(mapping[d]))
            if tb.num_rows:  # ack AFTER consumption: at-least-once
                t.ack(int(tb.column("docid")[tb.num_rows - 1].as_py()))
        return pa.table(
            {"poll": pa.array(polls, pa.int64()), "doc_id": pa.array(doc_ids, pa.int64())}
        )
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def run_daemon(topic: Topic, terms, iterations: int, mode: str = "or") -> list[pa.Table]:
    """DaemonStream: repeatedly run the inner topic poll (the sandbox has
    no wall-clock scheduling in tasks; the interval loop is the caller's —
    each iteration is one daemon tick)."""
    return [topic.poll(terms, mode=mode) for _ in range(iterations)]
