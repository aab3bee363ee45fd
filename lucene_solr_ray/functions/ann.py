"""Similarity search over the ``embeddings`` table (list<float> column).

- Brute-force cosine top-k: the exactness baseline — broadcast query
  matrix (ray.put once), per-batch float64 matmul partial top-k inside
  map_batches, driver-side final merge. Scale path: per-batch partials
  keep the exchange at O(n_queries * k) rows per block.
- IVF: a PERSISTED cluster-partitioned index (spherical k-means on a
  deterministic sample -> map_batches assign -> one hive partition per
  cluster + centroids.npy + manifest, cached per corpus mtime); queries
  read only the probed partitions' parquet files. At 100 TB the build is
  one assign pass + partitioned write, and query I/O is n_probe/n_clusters
  of the corpus.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from lucene_solr_ray.io_utils import emb_matrix, pool_size, read_parquet_clean
import ray.data


def _read_emb(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    head = (
        _read_emb(sf_dir).sort("vec_id").limit(n_queries).to_pandas()
    )
    q = np.array(head["embedding"].tolist(), dtype=np.float64)
    return head["vec_id"].to_numpy().astype(np.int64), q


class _BruteStage:
    """Per-batch cosine vs the broadcast query matrix -> per-batch top-k
    candidates (the partial/combine side of the global top-k)."""

    def __init__(self, q_ref, qids, k):
        self.q = ray.get(q_ref)  # (nq, d) float64
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.qids = qids
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        x = emb_matrix(t.column("embedding"))
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = self.qn @ xn.T  # (nq, batch)
        out_q, out_n, out_c = [], [], []
        for qi in range(len(self.qids)):
            row = cos[qi]
            mask = ids != self.qids[qi]  # exclude self-match
            cand_ids = ids[mask]
            cand_cos = row[mask]
            if len(cand_ids) > self.k:
                # exact per-batch top-k under the FINAL order (cos desc,
                # neighbor_id asc): argpartition alone picks arbitrarily
                # among cosine ties and can drop a tied lower-id neighbor
                order = np.lexsort((cand_ids, -cand_cos))[: self.k]
                cand_ids, cand_cos = cand_ids[order], cand_cos[order]
            out_q.extend([int(self.qids[qi])] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_c.extend(cand_cos.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def ann_brute_topk(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Exact cosine top-k -> (query_id, rank, neighbor_id); ties broken by
    neighbor_id ascending (cos kept out of the output for hash stability)."""
    qids, q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put(q)
    partials = (
        _read_emb(sf_dir)
        .map_batches(
            _BruteStage,
            fn_constructor_kwargs={"q_ref": q_ref, "qids": qids, "k": k},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool_size(),
        )
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), -g["cos"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()), ("neighbor_id", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


class _SQ8Stage:
    """Per-batch scalar-quantized dot product vs the broadcast quantized
    query codes -> per-batch top-k partials (exact integer arithmetic
    end to end)."""

    def __init__(self, params_ref, qids, k):
        self.amax, self.qc = ray.get(params_ref)
        self.qids = qids
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        x = emb_matrix(t.column("embedding"))
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        xi = np.floor(x * 1e6 + 0.5).astype(np.int64)
        codes = (xi + self.amax) * 127 // self.amax - 127  # (batch, d) in -127..127
        score = self.qc @ codes.T  # (nq, batch) int64
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.qids)):
            row = score[qi]
            mask = ids != self.qids[qi]
            cand_ids, cand_s = ids[mask], row[mask]
            if len(cand_ids) > self.k:
                order = np.lexsort((cand_ids, -cand_s))[: self.k]
                cand_ids, cand_s = cand_ids[order], cand_s[order]
            out_q.extend([int(self.qids[qi])] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_s.extend(cand_s.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "score": pa.array(out_s, pa.int64()),
        })


def ann_sq_topk(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Scalar-quantized (SQ8) similarity search — the vector-compression
    scale path (the role of Lucene 9's org.apache.lucene.util.quantization
    ScalarQuantizer, upstream of the reference's 8.11 cut; standard in
    training-data pipelines: 4x smaller vectors, integer SIMD scoring).

    Exact-int construction so the DuckDB oracle is bit-identical:
    components quantize to micro-ints xi = FLOOR(x*1e6 + 0.5); ONE global
    scale amax = max(|xi|) comes from a max partial pass (scalar driver
    combine, broadcast once); codes = (xi+amax)*127 // amax - 127 in
    -127..127 — SYMMETRIC zero-centered quantization, so the integer
    code dot product is a uniformly-scaled dot product and preserves the
    cosine ranking of these unit-norm vectors (a per-dim affine offset
    would inject per-vector cross terms and scramble it; Lucene
    compensates those with stored per-vector corrections, the symmetric
    grid needs none). Top-k by (score desc, neighbor_id asc). Two
    streaming passes, exchange is O(nq * k) per block."""

    def mm_partial(t: pa.Table) -> pa.Table:
        x = emb_matrix(t.column("embedding"))
        xi = np.floor(x * 1e6 + 0.5).astype(np.int64)
        return pa.table({"amax": pa.array([int(np.abs(xi).max())], pa.int64())})

    mm = (_read_emb(sf_dir)
          .map_batches(mm_partial, batch_format="pyarrow")
          .to_pandas())
    amax = max(int(mm["amax"].max()), 1)

    qids, q = _query_matrix(sf_dir, n_queries)
    qxi = np.floor(q * 1e6 + 0.5).astype(np.int64)
    qc = (qxi + amax) * 127 // amax - 127
    params_ref = ray.put((amax, qc))
    partials = (
        _read_emb(sf_dir)
        .map_batches(
            _SQ8Stage,
            fn_constructor_kwargs={"params_ref": params_ref, "qids": qids, "k": k},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool_size(),
        )
        .to_pandas()
    )
    rows = []
    for qid, grp in partials.groupby("query_id"):
        order = np.lexsort((grp["neighbor_id"].to_numpy(),
                            -grp["score"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(grp["neighbor_id"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()),
                        ("neighbor_id", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


class _RangeStage:
    """Per-batch cosine-threshold filter vs the broadcast query matrix —
    emits only qualifying (query_id, neighbor_id) pairs, so the exchange
    is output-sized."""

    def __init__(self, q_ref, qids, threshold):
        q = ray.get(q_ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.qids = qids
        self.t = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        from lucene_solr_ray.io_utils import emb_matrix

        x = emb_matrix(t.column("embedding"))
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = self.qn @ xn.T
        qi, ni = np.nonzero(cos >= self.t)
        keep = ids[ni] != self.qids[qi]  # exclude self-match
        return pa.table({
            "query_id": pa.array(self.qids[qi[keep]], pa.int64()),
            "neighbor_id": pa.array(ids[ni[keep]], pa.int64()),
        })


def ann_range_search(sf_dir: str, threshold: float = 0.30,
                     n_queries: int = 5) -> pa.Table:
    """Cosine RANGE search (radius query — the vector analogue of
    PointRangeQuery): every neighbor with cos >= threshold per query,
    ids only. Exactness by the repo's measured-gap argument: 0.30 sits
    >= 4.5e-4 from every (first-5-query x corpus) cosine across all
    three testdata sfs (pinned by tests/test_functions.py::
    test_ann_range_threshold_gap), so float64 rounding cannot flip
    membership between numpy and DuckDB. One streaming pass; only
    qualifying pairs leave the tasks."""
    qids, q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put(q)
    out = (
        _read_emb(sf_dir)
        .map_batches(
            _RangeStage,
            fn_constructor_kwargs={"q_ref": q_ref, "qids": qids, "threshold": threshold},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool_size(),
        )
        .sort(["query_id", "neighbor_id"])
        .to_pandas()
    )
    if out.empty:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64())})
    return pa.table({
        "query_id": pa.array(out["query_id"].to_numpy(), pa.int64()),
        "neighbor_id": pa.array(out["neighbor_id"].to_numpy(), pa.int64()),
    })


def ann_filtered_topk(sf_dir: str, label: int = 1, k: int = 10,
                      n_queries: int = 5) -> pa.Table:
    """FILTERED vector search (metadata predicate + top-k — the
    pre-filtered flavor: the predicate prunes the candidate stream BEFORE
    scoring, exact by construction): brute cosine top-k restricted to
    vectors whose ``label`` matches. The filter is pushed into the
    columnar read, so non-matching vectors never reach the scoring
    stage."""
    qids, q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put(q)
    partials = (
        _read_emb_labeled(sf_dir)
        .filter(expr=f"label == {int(label)}")
        .map_batches(
            _BruteStage,
            fn_constructor_kwargs={"q_ref": q_ref, "qids": qids, "k": k},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool_size(),
        )
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), -g["cos"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()), ("neighbor_id", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


class _HardNegStage:
    """Per-batch cosine vs the broadcast anchor matrix, masked to
    DIFFERENT-label vectors per anchor -> per-batch top-k partials."""

    def __init__(self, q_ref, qids, qlabels, k, same_label: bool = False):
        self.q = ray.get(q_ref)
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.qids = qids
        self.qlabels = qlabels
        self.k = k
        self.same_label = same_label

    def __call__(self, t: pa.Table) -> pa.Table:
        x = emb_matrix(t.column("embedding"))
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        labels = t.column("label").to_numpy().astype(np.int64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = self.qn @ xn.T
        out_q, out_n, out_c = [], [], []
        for qi in range(len(self.qids)):
            # wrong-class only by default; same-class for positive mining
            mask = ((labels == self.qlabels[qi]) == self.same_label) \
                & (ids != self.qids[qi])
            cand_ids, cand_cos = ids[mask], cos[qi][mask]
            if len(cand_ids) > self.k:
                order = np.lexsort((cand_ids, -cand_cos))[: self.k]
                cand_ids, cand_cos = cand_ids[order], cand_cos[order]
            out_q.extend([int(self.qids[qi])] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_c.extend(cand_cos.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        })


def hard_negative_mining(sf_dir: str, k: int = 10, n_anchors: int = 5) -> pa.Table:
    """Hard-negative mining for contrastive training (the DPR/Contriever
    recipe): for each anchor vector, the top-k most-similar vectors with
    a DIFFERENT label — near neighbors from the wrong class are the
    hardest negatives. The per-anchor label mask is applied inside the
    brute stage (anchor matrix + labels broadcast once via ray.put);
    exchange stays O(n_anchors * k) rows per block, exact by
    construction. Scale path: swap the brute stage for the IVF probe
    the same way ann_ivf_topk does."""
    head = (_read_emb_labeled(sf_dir).sort("vec_id").limit(n_anchors).to_pandas())
    qids = head["vec_id"].to_numpy().astype(np.int64)
    qlabels = head["label"].to_numpy().astype(np.int64)
    q = np.array(head["embedding"].tolist(), dtype=np.float64)
    q_ref = ray.put(q)
    partials = (
        _read_emb_labeled(sf_dir)
        .map_batches(
            _HardNegStage,
            fn_constructor_kwargs={"q_ref": q_ref, "qids": qids,
                                   "qlabels": qlabels, "k": k},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool_size(),
        )
        .to_pandas()
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), -g["cos"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()),
                        ("neighbor_id", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def contrastive_triples(sf_dir: str, n_anchors: int = 5) -> pa.Table:
    """Contrastive training-triple construction — the (anchor, positive,
    hard negative) export a contrastive fine-tune consumes (the
    DPR/SimCSE data shape): positive = the anchor's nearest SAME-label
    vector, negative = its nearest DIFFERENT-label vector (the top hard
    negative). Both sides run the distributed _HardNegStage brute pass
    (broadcast anchors, per-batch top-1 partials) — at 100 TB they ride
    the IVF probe instead."""
    def top1(same_label: bool) -> dict:
        head = (_read_emb_labeled(sf_dir).sort("vec_id")
                .limit(n_anchors).to_pandas())
        qids = head["vec_id"].to_numpy().astype(np.int64)
        qlabels = head["label"].to_numpy().astype(np.int64)
        q_ref = ray.put(np.array(head["embedding"].tolist(), dtype=np.float64))
        partials = (
            _read_emb_labeled(sf_dir)
            .map_batches(
                _HardNegStage,
                fn_constructor_kwargs={"q_ref": q_ref, "qids": qids,
                                       "qlabels": qlabels, "k": 1,
                                       "same_label": same_label},
                batch_format="pyarrow", batch_size=4096,
                concurrency=pool_size(),
            )
            .to_pandas()
        )
        out = {}
        for qid, g in partials.groupby("query_id"):
            j = np.lexsort((g["neighbor_id"].to_numpy(),
                            -g["cos"].to_numpy()))[0]
            out[int(qid)] = int(g["neighbor_id"].iloc[j])
        return out

    pos = top1(True)
    neg = top1(False)
    anchors = sorted(pos)
    return pa.table({
        "anchor_id": pa.array(anchors, pa.int64()),
        "positive_id": pa.array([pos[a] for a in anchors], pa.int64()),
        "negative_id": pa.array([neg[a] for a in anchors], pa.int64()),
    })


def _read_emb_labeled(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding", "label"])


# ---------------- IVF (persisted cluster-partitioned index) ----------------

CACHE_ROOT = os.environ.get("LSR_CACHE", "/tmp/lsr_cache")


def _spherical_kmeans(xn: np.ndarray, n_clusters: int, iters: int = 10,
                      seed: int = 11) -> np.ndarray:
    """Seeded spherical k-means on NORMALIZED vectors (assignment by max
    cosine — the same metric the query path probes with, so probe order
    and cluster membership never disagree). Returns normalized centroids."""
    rng = np.random.default_rng(seed)
    cent = xn[rng.choice(len(xn), size=min(n_clusters, len(xn)), replace=False)].copy()
    for _ in range(iters):
        cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        assign = (xn @ cn.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = xn[m].mean(axis=0)
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


class _AssignStage:
    """Adds the IVF cluster id (argmax cosine vs broadcast centroids)."""

    def __init__(self, cent_ref):
        self.cn = ray.get(cent_ref)  # normalized (nc, d)

    def __call__(self, t: pa.Table) -> pa.Table:
        x = emb_matrix(t.column("embedding"))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        assign = (xn @ self.cn.T).argmax(axis=1).astype(np.int64)
        # `cluster` becomes the hive partition path; `cluster_id` stays a
        # data column so per-file reads keep it without hive inference
        return t.append_column("cluster", pa.array(assign, pa.int64())).append_column(
            "cluster_id", pa.array(assign, pa.int64())
        )


def build_ivf_index(sf_dir: str, n_clusters: int = 32, train_sample: int = 4096,
                    seed: int = 11, iters: int = 10) -> str:
    """One-time IVF index build (mirrors the segment/manifest pattern):
    deterministic train sample -> spherical k-means on the driver (small)
    -> broadcast centroids -> map_batches assign -> hive-partitioned
    parquet, ONE DIRECTORY PER CLUSTER, plus centroids.npy + a manifest.
    Cached per (embeddings mtime, params); queries then read only the
    probed partitions' files. Build is atomic (tmp dir + rename) so a
    concurrent/failed build never leaves a half index."""
    import json
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{n_clusters}|{train_sample}|{seed}|{iters}|ivf-v2".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"ivf-index-{key}")
    manifest = os.path.join(index_dir, "manifest.json")
    if os.path.exists(manifest):
        return index_dir
    # train sample: first-N by vec_id — deterministic regardless of block
    # layout (a crc32(vec_id)-hash sample is the unbiased choice at scale;
    # this corpus is itself i.i.d. so the prefix is already unbiased)
    head = _read_emb(sf_dir).sort("vec_id").limit(train_sample).to_pandas()
    x = np.array(head["embedding"].tolist(), dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cn = _spherical_kmeans(xn, n_clusters, iters=iters, seed=seed)
    cent_ref = ray.put(cn)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "clusters"), exist_ok=True)
    (
        _read_emb(sf_dir)
        .map_batches(_AssignStage, fn_constructor_kwargs={"cent_ref": cent_ref},
                     batch_format="pyarrow", concurrency=pool_size())
        .write_parquet(os.path.join(tmp, "clusters"), partition_cols=["cluster"])
    )
    np.save(os.path.join(tmp, "centroids.npy"), cn)
    present = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(os.path.join(tmp, "clusters"))
        if d.startswith("cluster=")
    )
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"n_clusters": n_clusters, "clusters_present": present,
                   "seed": seed, "train_sample": train_sample}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp, index_dir)
    return index_dir


def probed_partition_paths(index_dir: str, clusters) -> list[str]:
    """Parquet files of the probed clusters' partitions ONLY — the
    selective read is the point of the index (tested directly)."""
    out = []
    for c in sorted(set(int(c) for c in clusters)):
        p = os.path.join(index_dir, "clusters", f"cluster={c}")
        if os.path.isdir(p):
            out.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            ))
    return out


def ann_ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
                 n_clusters: int = 32, n_probe: int = 30,
                 train_sample: int = 4096, seed: int = 11) -> pa.Table:
    """IVF-flat top-k over the persisted cluster-partitioned index: load
    centroids, pick each query's ``n_probe`` nearest clusters, read ONLY
    those partitions' parquet files, score per batch against the probe
    mask, merge output-sized partials on the driver.

    n_probe default: the gate corpora are ISOTROPIC unit vectors (median
    pair cosine 0.0), so true top-10 neighbors scatter across nearly all
    clusters — measured recall-1.0 needs 28/32 probes at sf0.001 (25/32
    at sf0.01); 30 adds safety margin and the entry is then exactly the
    brute result (its SQL oracle). On real clustered corpora n_probe <<
    n_clusters is the operating point; the partition-selective read path
    is identical."""
    index_dir = build_ivf_index(sf_dir, n_clusters=n_clusters,
                                train_sample=train_sample, seed=seed)
    cn = np.load(os.path.join(index_dir, "centroids.npy"))
    qids, q = _query_matrix(sf_dir, n_queries)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = {int(qids[i]): set(np.argsort(-(qn[i] @ cn.T))[:n_probe].tolist())
              for i in range(len(qids))}
    union = sorted(set().union(*probes.values()))
    paths = probed_partition_paths(index_dir, union)
    q_ref = ray.put(q)
    probes_ref = ray.put(probes)

    class ProbeStage:
        def __init__(self):
            self.q = ray.get(q_ref)
            self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
            self.probes = ray.get(probes_ref)
            self.qids = qids
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            x = emb_matrix(t.column("embedding"))
            ids = t.column("vec_id").to_numpy().astype(np.int64)
            clu = t.column("cluster_id").to_numpy().astype(np.int64)
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(self.qids)):
                qid = int(self.qids[qi])
                m = np.isin(clu, list(self.probes[qid])) & (ids != qid)
                if not m.any():
                    continue
                cos = xn[m] @ self.qn[qi]
                cids = ids[m]
                if len(cids) > self.k:
                    # tie-stable per-batch top-k (cos desc, id asc) — see _BruteStage
                    order = np.lexsort((cids, -cos))[: self.k]
                    cids, cos = cids[order], cos[order]
                out_q.extend([qid] * len(cids))
                out_n.extend(cids.tolist())
                out_c.extend(cos.tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "cos": pa.array(out_c, pa.float64())})

    partials = read_parquet_clean(paths).map_batches(
        ProbeStage, batch_format="pyarrow", batch_size=4096, concurrency=pool_size()
    ).to_pandas()
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), -g["cos"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()), ("neighbor_id", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def ann_ivfpq_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
                   n_clusters: int = 32, n_probe: int = 30,
                   n_sub: int = 8, n_codes: int = 32, scale: int = 10_000,
                   train_sample: int = 4096, seed: int = 11) -> pa.Table:
    """IVF-PQ — the standard billion-scale ANN layout (Jegou et al. 2011
    §V's IVFADC; FAISS IndexIVFPQ): the coarse quantizer picks each
    query's ``n_probe`` partitions from the persisted IVF index
    (partition-SELECTIVE read), and the scan inside them ranks by the
    exact-integer ADC scheme of ann_pq_topk (sampled codebook, per-query
    LUTs) — only codes-worth of arithmetic per vector.

    Oracle: at gate scale the probed set provably contains every ADC
    top-k (pytest asserts ivfpq == the full-corpus PQ scan), so the
    entry shares ann_pq's SQL. At 100 TB n_probe << n_clusters and the
    codes persist beside the partitions (8 bytes/vector re-scans)."""
    index_dir = build_ivf_index(sf_dir, n_clusters=n_clusters,
                                train_sample=train_sample, seed=seed)
    cn = np.load(os.path.join(index_dir, "centroids.npy"))
    head = _read_emb(sf_dir).sort("vec_id").limit(max(n_codes, n_queries)).to_pandas()
    hx = np.array(head["embedding"].tolist(), dtype=np.float64)
    hq = np.floor(hx * scale + 0.5).astype(np.int64)
    d = hq.shape[1]
    assert d % n_sub == 0, (d, n_sub)
    dsub = d // n_sub
    cb = hq[:n_codes].reshape(n_codes, n_sub, dsub).transpose(1, 0, 2).copy()
    qids = head["vec_id"].to_numpy().astype(np.int64)[:n_queries]
    qsub = hq[:n_queries].reshape(n_queries, n_sub, dsub)
    diff = qsub[:, :, None, :] - cb[None, :, :, :]
    lut = (diff * diff).sum(axis=3)  # (nq, n_sub, n_codes)
    qx = hx[:n_queries]
    qn = qx / np.linalg.norm(qx, axis=1, keepdims=True)
    probes = {int(qids[i]): set(np.argsort(-(qn[i] @ cn.T))[:n_probe].tolist())
              for i in range(len(qids))}
    union = sorted(set().union(*probes.values()))
    paths = probed_partition_paths(index_dir, union)
    cb_ref, lut_ref, pr_ref = ray.put(cb), ray.put(lut), ray.put(probes)

    def scan(t: pa.Table, cb_r=cb_ref, lut_r=lut_ref, pr_r=pr_ref) -> pa.Table:
        cbv, lutv, pr = ray.get(cb_r), ray.get(lut_r), ray.get(pr_r)
        x = emb_matrix(t.column("embedding"))
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        clu = t.column("cluster_id").to_numpy().astype(np.int64)
        qz = np.floor(x * scale + 0.5).astype(np.int64).reshape(len(ids), n_sub, dsub)
        codes = np.empty((len(ids), n_sub), np.int64)
        for s in range(n_sub):
            dfm = qz[:, s, None, :] - cbv[None, s, :, :]
            codes[:, s] = (dfm * dfm).sum(axis=2).argmin(axis=1)
        out_q, out_n, out_d = [], [], []
        for qi in range(len(qids)):
            qid = int(qids[qi])
            m = np.isin(clu, list(pr[qid])) & (ids != qid)
            if not m.any():
                continue
            adist = lutv[qi][np.arange(n_sub)[None, :], codes[m]].sum(axis=1)
            cand_ids = ids[m]
            if len(cand_ids) > k:
                order = np.lexsort((cand_ids, adist))[:k]
                cand_ids, adist = cand_ids[order], adist[order]
            out_q.extend([qid] * len(cand_ids))
            out_n.extend(cand_ids.tolist())
            out_d.extend(adist.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "adist": pa.array(out_d, pa.int64())})

    partials = read_parquet_clean(paths).map_batches(
        scan, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), g["adist"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx]),
                         "adist": int(g["adist"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()),
                        ("neighbor_id", pa.int64()), ("adist", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def embedding_label_counts(sf_dir: str) -> ray.data.Dataset:
    """Label histogram + dimensionality check (vector-column groupby)."""
    from ray.data.aggregate import Count

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def dims(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"label": t.column("label"),
                         "n_dims": pc.cast(pc.list_value_length(t.column("embedding")), pa.int64())})

    return (
        ds.map_batches(dims, batch_format="pyarrow")
        .groupby(["label", "n_dims"])
        .aggregate(Count(alias_name="n"))
        .sort("label")
    )


# ---------------- Product Quantization (ADC scan) ----------------

def ann_pq_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
                n_sub: int = 8, n_codes: int = 32,
                scale: int = 10_000) -> pa.Table:
    """Product-quantization top-k (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") with asymmetric distance
    computation — the memory-scale path for similarity search: a D-dim
    float vector compresses to ``n_sub`` one-byte codes (64 floats ->
    8 bytes here, 32x), and the scan touches only codes + a tiny
    per-query lookup table.

    Everything is EXACT INTEGER so the DuckDB oracle hashes identically:
    floats quantize as floor(float64(x)*scale + 0.5); codebooks are the
    quantized subvectors of the ``n_codes`` lowest vec_ids (sampled
    codebook — deterministic, no k-means training state); encoding is
    argmin int64 squared distance, ties to the lowest code; ADC distance
    is the sum over subspaces of the query-subvector-to-codeword int
    distance. Output ranks by (adist asc, neighbor_id asc).

    Scale shape: the codebook (n_codes x D ints) and per-query LUTs
    (n_queries x n_sub x n_codes ints) broadcast once via ray.put;
    encode + scan is ONE map_batches pass emitting per-batch top-k
    partials; the driver merges output-sized rows only. At 100 TB the
    encode pass persists codes next to the IVF partitions and re-scans
    touch 8 bytes/vector instead of 256."""
    head = _read_emb(sf_dir).sort("vec_id").limit(max(n_codes, n_queries)).to_pandas()
    hx = np.array(head["embedding"].tolist(), dtype=np.float64)
    hq = np.floor(hx * scale + 0.5).astype(np.int64)
    d = hq.shape[1]
    assert d % n_sub == 0, (d, n_sub)
    dsub = d // n_sub
    # codebook[s]: (n_codes, dsub) int64
    cb = hq[:n_codes].reshape(n_codes, n_sub, dsub).transpose(1, 0, 2).copy()
    qids = head["vec_id"].to_numpy().astype(np.int64)[:n_queries]
    qsub = hq[:n_queries].reshape(n_queries, n_sub, dsub)
    # per-query LUT: lut[q, s, c] = ||qsub - codeword||^2 (int64)
    diff = qsub[:, :, None, :] - cb[None, :, :, :]
    lut = (diff * diff).sum(axis=3)  # (nq, n_sub, n_codes)
    cb_ref = ray.put(cb)
    lut_ref = ray.put(lut)

    class PqStage:
        def __init__(self):
            self.cb = ray.get(cb_ref)
            self.lut = ray.get(lut_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = emb_matrix(t.column("embedding"))
            ids = t.column("vec_id").to_numpy().astype(np.int64)
            q = np.floor(x * scale + 0.5).astype(np.int64).reshape(len(ids), n_sub, dsub)
            # encode: argmin squared dist per subspace (first occurrence
            # = lowest code on ties, matching the oracle's (dist, code))
            codes = np.empty((len(ids), n_sub), np.int64)
            for s in range(n_sub):
                df = q[:, s, None, :] - self.cb[None, s, :, :]
                codes[:, s] = (df * df).sum(axis=2).argmin(axis=1)
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids)):
                # ADC: gather per-subspace LUT entries for each code row
                adist = self.lut[qi][np.arange(n_sub)[None, :], codes].sum(axis=1)
                m = ids != qids[qi]
                cand_ids, cand_d = ids[m], adist[m]
                if len(cand_ids) > k:
                    order = np.lexsort((cand_ids, cand_d))[:k]
                    cand_ids, cand_d = cand_ids[order], cand_d[order]
                out_q.extend([int(qids[qi])] * len(cand_ids))
                out_n.extend(cand_ids.tolist())
                out_d.extend(cand_d.tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "adist": pa.array(out_d, pa.int64())})

    partials = _read_emb(sf_dir).map_batches(
        PqStage, batch_format="pyarrow", batch_size=4096, concurrency=pool_size()
    ).to_pandas()
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), g["adist"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append({"query_id": int(qid), "rank": rank,
                         "neighbor_id": int(g["neighbor_id"].iloc[idx]),
                         "adist": int(g["adist"].iloc[idx])})
    rows.sort(key=lambda r: (r["query_id"], r["rank"]))
    schema = pa.schema([("query_id", pa.int64()), ("rank", pa.int64()),
                        ("neighbor_id", pa.int64()), ("adist", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)
