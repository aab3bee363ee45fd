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


# alpha = 0.7213/(1 + 1.079/M) == 7213*M / (10*(1000*M + 1079)) exactly
_ALPHA_NUM = 7213 * _M
_ALPHA_DEN = 10 * (1000 * _M + 1079)


def _hll_estimate(regs: np.ndarray) -> int:
    """Integer-exact HLL estimate (round-half-up): the register harmonic
    sum is computed as the exact integer S64 = sum(2^(64-reg)) and the
    bias constant as a rational, so the raw-range estimate is pure
    integer arithmetic that a DuckDB HUGEINT oracle reproduces bit for
    bit (data_oracle.hll_distinct_sql).  Only the linear-counting branch
    keeps one float ln(); its floor(x+0.5) boundary distance is measured
    in tests."""
    s64 = sum(1 << (64 - int(r)) for r in regs)  # M=4096 terms: exact, cheap
    est2 = (_ALPHA_NUM * _M * _M * (1 << 64) * 2) // (_ALPHA_DEN * s64)
    est = (est2 + 1) // 2
    zeros = int((regs == 0).sum())
    if est * 2 <= 5 * _M and zeros:
        est = int(np.floor(_M * np.log(_M / zeros) + 0.5))  # linear counting
    return est


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
    return pa.table({"approx_distinct": pa.array([_hll_estimate(merged)], pa.int64())})


def hll_union_distinct(sf_dir: str, table: str = "events",
                       column: str = "user_id",
                       split_field: str = "event_type",
                       a: str = "purchase", b: str = "signup") -> pa.Table:
    """HLL sketch UNION ([U] solr/core/.../util/hll/HLL.java union — the
    mergeability that makes the sketch distributed-correct): build one
    register set per subset (column restricted to split_field == a / b),
    union them by register-wise max, and estimate. The union estimate
    must EQUAL the estimate of the OR-filtered set — the sketch identity
    the SQL oracle checks by replicating the register pipeline over the
    combined subset. Output: per-subset estimates + the union."""
    out = {}
    regsets = []
    for label, val in (("a", a), ("b", b)):
        ds = read_parquet_clean(f"{sf_dir}/{table}.parquet",
                                columns=[column, split_field])
        ds = ds.filter(expr=f'{split_field} == "{val}"')

        def partial(t: pa.Table) -> pa.Table:
            vals = t.column(column).to_numpy().astype(np.int64)
            return pa.table({"regs": pa.array([_hll_registers(vals).tobytes()],
                                              type=pa.binary())})

        merged = np.zeros(_M, dtype=np.int8)
        for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=256, batch_format="pyarrow"
        ):
            for blob in batch.column("regs").to_pylist():
                merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
        regsets.append(merged)
        out[label] = _hll_estimate(merged)
    union = np.maximum(regsets[0], regsets[1])
    out["union"] = _hll_estimate(union)
    return pa.table({
        "subset": pa.array(["a", "b", "union"], pa.string()),
        "approx_distinct": pa.array([out["a"], out["b"], out["union"]], pa.int64()),
    })


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
        if n <= max_centroids:
            # centroid budget exceeds the batch: every value is its own
            # centroid (t-digest as delta -> inf), which makes the whole
            # sketch EXACT — the driver gate runs in this regime
            # (max_centroids=16384) so the SQL oracle can interpolate the
            # sorted raw values; bench/pytest use the real budget (128)
            return pa.table({"means": pa.array([vals.tolist()]),
                             "weights": pa.array([[1.0] * n])})
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
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights) - weights / 2
    total = weights.sum()
    rows = []
    for q in qs:
        target = q * total
        rows.append({"q_milli": int(round(q * 1000)),
                     "value_milli": _quantile_milli(target, cum, means)})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("q_milli", pa.int64()), ("value_milli", pa.int64())])
    )


def _quantile_milli(target: float, cum: np.ndarray, means: np.ndarray) -> int:
    """Centroid interpolation with a PINNED float op order (np.interp's
    semantics, written out so the DuckDB oracle can replicate it bit for
    bit when centroid spacing is 1.0), milli-floored per the driver float
    convention."""
    if target <= cum[0]:
        v = float(means[0])
    elif target >= cum[-1]:
        v = float(means[-1])
    else:
        i = int(np.searchsorted(cum, target, side="right"))
        i = min(i, len(cum) - 1)
        x1, x2 = float(cum[i - 1]), float(cum[i])
        y1, y2 = float(means[i - 1]), float(means[i])
        v = y1 + (y2 - y1) * ((target - x1) / (x2 - x1))
    return int(np.floor(v * 1000.0 + 0.5))


# ---------------- SpaceSaving heavy hitters (mergeable) ----------------

def _space_saving(items, capacity: int):
    """SpaceSaving (Metwally et al. 2005, "Efficient Computation of
    Frequent and Top-k Elements in Data Streams"): capacity-bounded
    counter table; an unseen item evicts the current minimum and
    inherits its count as overestimation error. Returns
    {item: (count, err)} with the guarantees count - err <= true <=
    count and err <= N/capacity."""
    counts: dict[str, int] = {}
    errs: dict[str, int] = {}
    for x in items:
        if x in counts:
            counts[x] += 1
        elif len(counts) < capacity:
            counts[x] = 1
            errs[x] = 0
        else:
            victim = min(counts, key=lambda k: (counts[k], k))
            base = counts.pop(victim)
            errs.pop(victim)
            counts[x] = base + 1
            errs[x] = base
    return {k: (counts[k], errs[k]) for k in counts}


def heavy_hitters_topk(sf_dir: str, k: int = 20, capacity: int = 256) -> pa.Table:
    """Top-k most frequent tokens via mergeable SpaceSaving partials:
    each batch builds a capacity-bounded sketch; partial (term, count,
    err) rows — O(batches x capacity), never corpus-sized — merge by
    term-sum, and the top-k by merged count is reported. On this corpus
    the closed vocabulary (~60 terms) is far below capacity, so no
    eviction ever fires, err == 0 everywhere, and the result is EXACT —
    which is what makes the SQL oracle a strict equality; the
    approximation guarantees on high-cardinality input are pinned by
    pytest instead."""
    import re as _re

    from ray.data.aggregate import Sum

    ws = _re.compile(r"\s+")
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = []
        for s in t.column("text").to_pylist():
            if s and s.strip():
                toks.extend(ws.split(s.strip()))
        sk = _space_saving(toks, capacity)
        terms = sorted(sk)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "cnt": pa.array([sk[t_][0] for t_ in terms], pa.int64()),
            "err": pa.array([sk[t_][1] for t_ in terms], pa.int64()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("err", alias_name="err"))
        .to_pandas()
    )
    order = np.lexsort((merged["term"].to_numpy().astype(str),
                        -merged["cnt"].to_numpy()))[:k]
    top = merged.iloc[order]
    return pa.table({
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "term": pa.array(top["term"].tolist(), pa.string()),
        "n": pa.array(top["cnt"].to_numpy(), pa.int64()),
        "err": pa.array(top["err"].to_numpy(), pa.int64()),
    })


_CM_PROBES = ("join", "merge", "stream", "the", "vector", "window", "zzz-absent")


def _cm_bucket(term: str, row: int, width: int) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(f"{term}:{row}".encode()).digest()[:8],
                          "little") % width


def count_min_estimate(sf_dir: str, probes=_CM_PROBES, depth: int = 4,
                       width: int = 16) -> pa.Table:
    """Count-Min sketch (Cormode & Muthukrishnan 2005; the §2.7 sketch
    family next to HLL / t-digest / SpaceSaving): frequency estimates for
    probe terms over the raw whitespace token stream. Scale shape: each
    batch emits ONE partial depth x width count matrix as (row, bucket,
    n) cells — an O(batches * d * w * 12B) exchange independent of corpus
    size — merged by associative Sum; estimate = min over rows of the
    probed cell. Deliberately narrow (width 16 < vocabulary) so
    collisions actually over-count; the SQL oracle replicates the sketch
    cell-for-cell via md5-derived row hashes, making the (over)estimates
    exact integers."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            if s and s.strip():
                c.update(s.split())
        mat = np.zeros((depth, width), dtype=np.int64)
        for term, n in c.items():
            for r in range(depth):
                mat[r, _cm_bucket(term, r, width)] += n
        rows, buckets = np.divmod(np.arange(depth * width), width)
        return pa.table({
            "row": pa.array(rows, pa.int64()),
            "bucket": pa.array(buckets, pa.int64()),
            "n": pa.array(mat.ravel(), pa.int64()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    mat = np.zeros((depth, width), dtype=np.int64)
    mat[merged["row"].to_numpy(), merged["bucket"].to_numpy()] = merged["n"].to_numpy()
    ests = [int(min(mat[r, _cm_bucket(p, r, width)] for r in range(depth)))
            for p in probes]
    return pa.table({
        "term": pa.array(list(probes), pa.string()),
        "est_n": pa.array(ests, pa.int64()),
    })
