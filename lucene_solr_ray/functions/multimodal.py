"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not in this container, so the decode
kernel is STUBBED (NotImplementedError) behind ``decoder="real"``; the
Ray-side plumbing — binary schema, actor-pool stage, batch sizing,
output layout — is real and tested with a deterministic fake decoder.

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
