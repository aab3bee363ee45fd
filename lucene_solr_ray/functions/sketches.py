"""Mergeable sketches — HyperLogLog distinct-count and a t-digest-style
quantile sketch (SURVEY §2.7: Solr ``hll`` agg, [U] solr/core/.../util/hll/,
and ``percentile`` agg, [U] solr/core/.../search/facet/PercentileAgg.java).

Shape at scale: one small sketch per input batch inside ``map_batches``
(the map-side partial), then an associative merge of the tiny sketch rows
— the exchange carries O(batches * sketch_size), never the raw values.
Accuracy bounds are asserted against exact answers in pytest; the driver
gate records rows-only (approximate results have no SQL equality)."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

from lucene_solr_ray.io_utils import read_parquet_clean

HLL_P = 12  # 4096 registers -> ~1.6% standard error
_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hll_registers(values: np.ndarray) -> np.ndarray:
    """Registers for a batch of int64 values (vectorized)."""
    # 64-bit mix (splitmix64-style) for register/rank bits
    x = values.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    idx = (z >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = z << np.uint64(HLL_P)
    # rank = leading zeros of rest + 1 (capped)
    rank = np.ones(len(z), dtype=np.int64)
    probe = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = probe < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += shift
        probe = np.where(mask, probe << np.uint64(shift), probe)
    rank = np.minimum(rank, 64 - HLL_P + 1)
    regs = np.zeros(_M, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)  # linear counting for small cardinalities
    return float(est)


def hll_distinct(sf_dir: str, table: str = "events", column: str = "user_id") -> pa.Table:
    """Approximate distinct count: per-batch registers, merged by max."""
    ds = read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=[column])

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(column).to_numpy().astype(np.int64)
        regs = _hll_registers(vals)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    merged = np.zeros(_M, dtype=np.int8)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        for blob in batch.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
    return pa.table({"approx_distinct": pa.array([int(round(_hll_estimate(merged)))], pa.int64())})


# ---------------- t-digest-lite (mergeable centroid quantile sketch) ----------------

def _compress(means: np.ndarray, weights: np.ndarray, max_centroids: int = 128):
    """Merge adjacent centroids, t-digest style: merge cost is scaled by
    1/sqrt(q(1-q)) so tails keep small centroids (tail quantile accuracy
    is the whole point of the digest)."""
    order = np.argsort(means)
    means, weights = means[order], weights[order]
    while len(means) > max_centroids:
        total = weights.sum()
        cum = np.cumsum(weights)
        q_mid = (cum[:-1]) / total  # boundary position of each adjacent pair
        scale = np.sqrt(q_mid * (1.0 - q_mid)) + 1e-3
        cost = (weights[:-1] + weights[1:]) / scale
        i = int(np.argmin(cost))
        w = weights[i] + weights[i + 1]
        new_mean = (means[i] * weights[i] + means[i + 1] * weights[i + 1]) / w
        means = np.concatenate([means[:i], [new_mean], means[i + 2 :]])
        weights = np.concatenate([weights[:i], [w], weights[i + 2 :]])
    return means, weights


def tdigest_quantiles(sf_dir: str, table: str = "events", column: str = "value",
                      qs=(0.5, 0.9, 0.99), max_centroids: int = 128) -> pa.Table:
    """Approximate quantiles via mergeable centroids (t-digest shape:
    per-batch centroid sets, pairwise-merged then compressed)."""
    ds = read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=[column])

    def partial(t: pa.Table) -> pa.Table:
        vals = np.sort(t.column(column).to_numpy().astype(np.float64))
        n = len(vals)
        if n == 0:
            return pa.table({"means": pa.array([], pa.list_(pa.float64())),
                             "weights": pa.array([], pa.list_(pa.float64()))})
        # arcsine-scale cut points: tiny centroids at the tails (t-digest
        # k1 scale function), so extreme quantiles stay sharp
        ks = np.linspace(-1.0, 1.0, min(max_centroids, n) + 1)
        q_cuts = 0.5 * (1.0 + np.sin(ks * np.pi / 2.0))
        idx = np.unique(np.round(q_cuts * n).astype(np.int64))
        means, weights = [], []
        for lo, hi in zip(idx[:-1], idx[1:]):
            if hi > lo:
                means.append(vals[lo:hi].mean())
                weights.append(float(hi - lo))
        return pa.table({"means": pa.array([means]), "weights": pa.array([weights])})

    all_means = np.empty(0, dtype=np.float64)
    all_weights = np.empty(0, dtype=np.float64)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        for m, w in zip(batch.column("means").to_pylist(), batch.column("weights").to_pylist()):
            all_means = np.concatenate([all_means, m])
            all_weights = np.concatenate([all_weights, w])
            if len(all_means) > 4 * max_centroids:
                all_means, all_weights = _compress(all_means, all_weights, max_centroids)
    means, weights = _compress(all_means, all_weights, max_centroids)
    cum = np.cumsum(weights) - weights / 2
    total = weights.sum()
    rows = []
    for q in qs:
        target = q * total
        rows.append({"q_milli": int(round(q * 1000)),
                     "value_est": float(np.interp(target, cum, means))})
    return pa.Table.from_pylist(rows)
