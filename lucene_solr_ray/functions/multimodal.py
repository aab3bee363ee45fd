"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not in this container (re-verified
round 5: PIL/cv2/ffmpeg/soundfile/librosa/av/imageio all absent), so
the decode kernel is STUBBED (NotImplementedError) behind
``decoder="real"``; the Ray-side plumbing — binary schema, actor-pool
stage, batch sizing, output layout — is real and tested with a
deterministic fake decoder. Dropping a real library in means replacing
ONLY the ``decoder="real"`` branch body; every signature/entry stays.

At 100 TB scale the rules encoded here: binary columns stay in
``batch_format="pyarrow"`` (no pandas object round-trip), batch_size is
small because payload bytes dominate memory, and the decode stage is an
actor pool so codec/model setup happens once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from lucene_solr_ray.io_utils import read_parquet_clean


def payload_dataset(sf_dir: str) -> ray.data.Dataset:
    """documents.text re-typed as an opaque binary payload column — the
    stand-in for an image/audio bytes column with typed metadata."""

    def to_binary(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array([s.encode("utf-8") if s else b"" for s in texts],
                                    type=pa.binary()),
                "media_type": pa.array(["text/plain"] * t.num_rows, type=pa.string()),
            }
        )

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        to_binary, batch_format="pyarrow"
    )


class DecodeStage:
    """Actor-pool decode stage. decoder="fake" derives deterministic
    (width, height, channels) metadata from the payload hash; "real"
    raises NotImplementedError (no image libs in this container)."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
        digests = [hashlib.md5(p).hexdigest() for p in payloads]
        if self.decoder == "real":
            raise NotImplementedError(
                "image/audio decode requires codec libraries not present in this "
                "container; wire Pillow/torchaudio here — the actor/batch plumbing "
                "is already in place"
            )
        # fake decode: metadata derived deterministically from the digest
        width = np.fromiter((int(d[:4], 16) % 1920 + 1 for d in digests), dtype=np.int64)
        height = np.fromiter((int(d[4:8], 16) % 1080 + 1 for d in digests), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bytes": pa.array(n_bytes),
                "digest": pa.array(digests, type=pa.string()),
                "width": pa.array(width),
                "height": pa.array(height),
                "channels": pa.array(np.full(len(payloads), 3, dtype=np.int64)),
            }
        )


def payload_stats(sf_dir: str) -> ray.data.Dataset:
    """Byte-size + digest per payload (SQL-checkable plumbing probe)."""

    def stats(t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bytes": pa.array(
                    np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
                ),
                "digest": pa.array([hashlib.md5(p).hexdigest() for p in payloads], type=pa.string()),
            }
        )

    return payload_dataset(sf_dir).map_batches(stats, batch_format="pyarrow").sort("doc_id")


def fake_decode(sf_dir: str, concurrency: int | None = None,
                batch_size: int = 256) -> ray.data.Dataset:
    """The full decode pipeline with the deterministic fake decoder —
    exercises the actor-pool + small-batch layout end to end."""
    from lucene_solr_ray.io_utils import pool_size

    return payload_dataset(sf_dir).map_batches(
        DecodeStage,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else pool_size(),
    ).sort("doc_id")


class FrameSampleStage:
    """Actor-pool frame sampler for video-like payloads: the payload is
    treated as fixed-size frames (frame_bytes each); every ``stride``-th
    frame is sampled up to ``max_frames`` per doc, emitting (doc_id,
    frame_idx, frame_md5). The real codec (seek + decode keyframes) slots
    into __call__; the slicing/explode/batch plumbing is what 100 TB of
    video needs either way — small batches (payload bytes dominate), one
    output row per SAMPLED frame only."""

    def __init__(self, frame_bytes: int = 8, stride: int = 4, max_frames: int = 5):
        self.fb, self.stride, self.mx = frame_bytes, stride, max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, digs = [], [], []
        for d, p in zip(t.column("doc_id").to_pylist(), t.column("payload").to_pylist()):
            n_frames = len(p) // self.fb
            for k, fi in enumerate(range(0, n_frames, self.stride)):
                if k >= self.mx:
                    break
                ids.append(d)
                idxs.append(fi)
                digs.append(hashlib.md5(p[fi * self.fb:(fi + 1) * self.fb]).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_md5": pa.array(digs, pa.string()),
        })


def frame_sample(sf_dir: str, batch_size: int = 256) -> ray.data.Dataset:
    """Frame-sampling entry over the binary payload view."""
    from lucene_solr_ray.io_utils import pool_size

    return payload_dataset(sf_dir).map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
    ).sort(["doc_id", "frame_idx"])


class ResampleStage:
    """Resize/resample stage (the image-resize / audio-resample slot of
    the pipeline): the payload is treated as a 1-D sample stream and
    decimated by ``stride`` (nearest-neighbor — keep every stride-th
    byte). A real image resize (Pillow) or audio resample (torchaudio)
    drops into __call__ unchanged; the deterministic byte decimation
    keeps the stage SQL-checkable."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        out = [bytes(p[:: self.stride]) for p in payloads]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bytes_out": pa.array([len(o) for o in out], pa.int64()),
            "digest_out": pa.array([hashlib.md5(o).hexdigest() for o in out],
                                   pa.string()),
        })


def resample(sf_dir: str, stride: int = 2, batch_size: int = 256) -> ray.data.Dataset:
    from lucene_solr_ray.io_utils import pool_size

    return payload_dataset(sf_dir).map_batches(
        ResampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
    ).sort("doc_id")


class FeatureExtractStage:
    """Feature-extraction stage (the CLIP/wav2vec embedding slot): a
    deterministic fake embedding — dim md5-derived uint8 features per
    payload — in exactly the layout a real model would emit (fixed-dim
    int list column, actor pool, bounded batches). Swap the md5 for a
    model forward pass and nothing else changes."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        digests = [hashlib.md5(p).hexdigest() for p in t.column("payload").to_pylist()]
        cols = {"doc_id": t.column("doc_id")}
        for i in range(self.dim):
            cols[f"f{i}"] = pa.array(
                [int.from_bytes(hashlib.md5(f"{d}-{i}".encode()).digest()[:8],
                                "little") % 256 for d in digests],
                pa.int64())
        return pa.table(cols)


def feature_extract(sf_dir: str, dim: int = 8, batch_size: int = 256) -> ray.data.Dataset:
    from lucene_solr_ray.io_utils import pool_size

    return payload_dataset(sf_dir).map_batches(
        FeatureExtractStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
    ).sort("doc_id")


class _CrossModalStage:
    """Exact-int squared-L2 scoring vs the broadcast query feature
    matrix -> per-batch top-k partials (the ANN brute shape on integer
    embeddings — collision-free oracle comparison, no float ordering)."""

    def __init__(self, q_ref, k: int):
        self.qids, self.q = ray.get(q_ref)  # (nq,), (nq, dim) int64
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        x = np.stack([t.column(f"f{i}").to_numpy().astype(np.int64)
                      for i in range(self.q.shape[1])], axis=1)
        out_q, out_n, out_d = [], [], []
        for qi in range(len(self.qids)):
            diff = x - self.q[qi]
            dist = (diff * diff).sum(axis=1)
            mask = ids != self.qids[qi]
            cand_ids, cand_d = ids[mask], dist[mask]
            if len(cand_ids) > self.k:
                order = np.lexsort((cand_ids, cand_d))[: self.k]
                cand_ids, cand_d = cand_ids[order], cand_d[order]
            out_q.extend([int(self.qids[qi])] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_d.extend(cand_d.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "dist": pa.array(out_d, pa.int64())})


def crossmodal_topk(sf_dir: str, n_queries: int = 3, k: int = 5,
                    dim: int = 8) -> pa.Table:
    """Cross-modal retrieval composition (the CLIP-retrieval slot):
    query payloads' embeddings search the corpus of payload embeddings —
    the feature-extract actor stage PIPED into the brute ANN stage, two
    map_batches in one streaming plan. Distances are exact integer
    squared-L2 on the int feature grid (no float ordering to defend);
    broadcast query matrix via ray.put; per-batch top-k partials."""
    from lucene_solr_ray.io_utils import pool_size

    feats = payload_dataset(sf_dir).map_batches(
        FeatureExtractStage, fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", batch_size=256, concurrency=pool_size())
    head = feats.sort("doc_id").limit(n_queries).to_pandas()
    qids = head["doc_id"].to_numpy().astype(np.int64)
    q = head[[f"f{i}" for i in range(dim)]].to_numpy().astype(np.int64)
    q_ref = ray.put((qids, q))
    partials = feats.map_batches(
        _CrossModalStage, fn_constructor_kwargs={"q_ref": q_ref, "k": k},
        batch_format="pyarrow", batch_size=4096,
        concurrency=pool_size()).to_pandas()
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), g["dist"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx]),
                         "dist": int(g["dist"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("neighbor_id", pa.int64()), ("dist", pa.int64())]))
