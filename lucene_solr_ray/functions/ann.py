"""Similarity search over the ``embeddings`` table (list<float> column).

- Brute-force cosine top-k: the exactness baseline — broadcast query
  matrix (ray.put once), per-batch float64 matmul partial top-k inside
  map_batches, driver-side final merge. Scale path: per-batch partials
  keep the exchange at O(n_queries * k) rows per block.
- IVF variant: seeded k-means-lite centroids (driver, sampled), assign
  per batch, probe the nearest ``n_probe`` clusters only — the
  bucketed/approximate scale path; recall vs brute is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean
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
        x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
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


# ---------------- IVF (bucketed approximate scale path) ----------------

def _kmeans_lite(x: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def ann_ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
                 n_clusters: int = 16, n_probe: int = 4,
                 train_sample: int = 2048, seed: int = 11) -> pa.Table:
    """IVF-flat: cluster on a driver-side sample, probe nearest clusters
    only. Approximate — recall measured against ann_brute_topk in tests."""
    qids, q = _query_matrix(sf_dir, n_queries)
    sample = _read_emb(sf_dir).random_sample(1.0, seed=seed).limit(train_sample).to_pandas()
    x_train = np.array(sample["embedding"].tolist(), dtype=np.float64)
    cent = _kmeans_lite(x_train, n_clusters, seed=seed)
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cent_ref = ray.put(cent)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probes = {int(qids[i]): set(np.argsort(-(qn[i] @ cent_n.T))[:n_probe].tolist())
              for i in range(len(qids))}
    q_ref = ray.put(q)
    probes_ref = ray.put(probes)

    class IvfStage:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.q = ray.get(q_ref)
            self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
            self.probes = ray.get(probes_ref)
            self.qids = qids
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
            ids = t.column("vec_id").to_numpy().astype(np.int64)
            d = ((x[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(self.qids)):
                qid = int(self.qids[qi])
                m = np.isin(assign, list(self.probes[qid])) & (ids != qid)
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

    partials = _read_emb(sf_dir).map_batches(
        IvfStage, batch_format="pyarrow", batch_size=4096, concurrency=pool_size()
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
