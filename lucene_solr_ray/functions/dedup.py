"""Deduplication operators over ``documents`` — exact, profile, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine. Core training-data-pipeline
components (SURVEY.md §2.9; Solr SignatureUpdateProcessor /
TextProfileSignature are the reference anchors).

Scale shapes: signatures are computed per batch (vectorized / hashlib),
grouping is a hash shuffle on the signature (exact dedup), and near-dup
candidate generation goes through band-bucket groupbys (MinHash-LSH /
SimHash pigeonhole) so no stage ever holds the corpus in one task.
"""

from __future__ import annotations

import hashlib
import itertools
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

import ray.data

from lucene_solr_ray.io_utils import (
    emb_matrix, join_partitions, pool_size, read_parquet_clean,
    sized_join_partitions)

_WS = re.compile(r"\s+")

MERSENNE = (1 << 61) - 1


def _read_docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


def _tokens(s: str) -> list[str]:
    return _WS.split(s.strip()) if s and s.strip() else []


# ---------------- exact dedup (hash-partition + per-group first) ----------------

def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Keep the lowest doc_id per identical text (MD5 signature) —
    SignatureUpdateProcessor + MD5Signature. Shuffle key = signature."""

    def sig(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sigs = [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in texts]
        return pa.table({"sig": pa.array(sigs, type=pa.string()), "doc_id": t.column("doc_id")})

    from ray.data.aggregate import Min

    return (
        _read_docs(sf_dir)
        .map_batches(sig, batch_format="pyarrow")
        .groupby("sig")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
        .sort("doc_id")
    )


# ---------------- TextProfileSignature (quantized tf profile) ----------------

def textprofile_signature(sf_dir: str, quant_div: int = 16, min_token_len: int = 2) -> ray.data.Dataset:
    """Near-dup signature: quantized term-frequency profile, from Nutch
    via Solr TextProfileSignature — md5 over "term floor(tf/quant)" pairs
    (quant = max(1, floor(max_tf / quant_div))), term-sorted, tf >= quant."""

    def prof(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sigs = []
        for s in texts:
            toks = [w for w in _tokens(s) if len(w) >= min_token_len]
            if not toks:
                sigs.append(hashlib.md5(b"").hexdigest())
                continue
            tf: dict[str, int] = {}
            for w in toks:
                tf[w] = tf.get(w, 0) + 1
            quant = max(1, max(tf.values()) // quant_div)
            parts = [f"{w} {tf[w] // quant}" for w in sorted(tf) if tf[w] // quant > 0]
            sigs.append(hashlib.md5(" ".join(parts).encode("utf-8")).hexdigest())
        return pa.table({"doc_id": t.column("doc_id"), "sig": pa.array(sigs, type=pa.string())})

    return _read_docs(sf_dir).map_batches(prof, batch_format="pyarrow").sort("doc_id")


# ---------------- shingles + MinHash-LSH ----------------

def _shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct word-n-gram shingles as stable uint64-ish hashes."""
    if len(tokens) < n:
        text = " ".join(tokens)
        return np.array([zlib.crc32(text.encode())], dtype=np.int64) if tokens else np.empty(0, np.int64)
    out = {zlib.crc32(" ".join(tokens[i : i + n]).encode()) for i in range(len(tokens) - n + 1)}
    return np.fromiter(out, dtype=np.int64, count=len(out))


class _MinHasher:
    """64 universal-hash minhashes h_i(x) = (a_i x + b_i) mod p, p Mersenne
    prime — stateful per actor (coefficients built once)."""

    def __init__(self, num_hashes: int = 64, seed: int = 7, ngram: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.int64)
        self.b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.int64)
        self.ngram = ngram
        self.num_hashes = num_hashes

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_hashes, MERSENNE, dtype=np.int64)
        # (H, S) = (a[:,None] * x[None,:] + b) mod p, object->int64 safe via Python ints is slow;
        # use float-free modmul: numpy int64 overflow-safe via __int128? -> use np.mod on int64
        # products can overflow; do it in two 32-bit halves instead:
        x = shingles.astype(np.uint64)
        b = self.b.astype(np.uint64)[:, None]
        p = np.uint64(MERSENNE)
        # crc32 shingles < 2^32 and a < 2^61: a*x can overflow 2^64 — split a
        # into 31-bit halves so every product stays below 2^63, and fold the
        # *2^31 shift through the Mersenne prime (v*2^31 mod p with v < 2^61:
        # v = v1*2^30 + v0 -> (v1 + v0*2^31) mod p, both terms < 2^61)
        a_lo = (self.a & ((1 << 31) - 1)).astype(np.uint64)[:, None]
        a_hi = (self.a >> 31).astype(np.uint64)[:, None]
        lo = (a_lo * x[None, :]) % p
        v = (a_hi * x[None, :]) % p
        hi = ((v >> np.uint64(30)) + ((v & np.uint64((1 << 30) - 1)) << np.uint64(31))) % p
        prod = (lo + hi + b) % p
        return prod.min(axis=1).astype(np.int64)


class _MinHashStage:
    def __init__(self, num_hashes=64, bands=16, seed=7, ngram=3):
        self.mh = _MinHasher(num_hashes, seed, ngram)
        self.bands = bands
        self.rows_per_band = num_hashes // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        doc_ids = t.column("doc_id").to_numpy()
        band_ids, band_hashes, out_docs = [], [], []
        for i, s in enumerate(texts):
            sig = self.mh.signature(_shingle_hashes(_tokens(s), self.mh.ngram))
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                band_ids.append(bnd)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
                out_docs.append(int(doc_ids[i]))
        return pa.table(
            {
                "band": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
                "doc_id": pa.array(out_docs, type=pa.int64()),
            }
        )


class _ShingleStrSetStage:
    """Distinct STRING word-n-gram shingles (sorted) for docs in a
    broadcast candidate-id set — string form so exact verification
    matches the SQL oracle's trigrams with no hash-collision caveat."""

    def __init__(self, ids_ref, ngram: int):
        self.ids = ray.get(ids_ref)  # sorted int64 numpy array
        self.ngram = ngram

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        if len(self.ids) == 0:
            hit = np.zeros(len(ids), bool)
        else:
            pos = np.minimum(np.searchsorted(self.ids, ids), len(self.ids) - 1)
            hit = self.ids[pos] == ids
        out_ids, out_sh = [], []
        texts = t.column("text").to_pylist()
        for i in np.flatnonzero(hit):
            toks = _tokens(texts[i])
            grams = {" ".join(toks[j: j + self.ngram])
                     for j in range(len(toks) - self.ngram + 1)}
            out_ids.append(int(ids[i]))
            out_sh.append(sorted(grams))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "sh": pa.array(out_sh, pa.list_(pa.string()))})


class _PairJaccardStage:
    """Exact string-shingle Jaccard over candidate (doc_a, doc_b) rows,
    sets from a broadcast dict of candidate docs (ray.put once) — the
    verify work is distributed over the pairs dataset, output-sized."""

    def __init__(self, sets_ref, threshold_pct: int):
        self.sets = ray.get(sets_ref)
        self.thr = threshold_pct

    def __call__(self, t: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b in zip(t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist()):
            sa = self.sets.get(int(a))
            sb = self.sets.get(int(b))
            if sa is None or sb is None or not len(sa) or not len(sb):
                continue  # <ngram-token docs have no shingles (SQL excludes them)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union and inter * 100 >= self.thr * union:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(inter * 100 // union)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard_pct": pa.array(out_j, pa.int64())})


_PAIRS_EMPTY = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "jaccard_pct": pa.array([], pa.int64())})


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.5,
                      num_hashes: int = 64, bands: int = 16, ngram: int = 3) -> pa.Table:
    """MinHash-LSH near-dup pairs: shingle -> minhash -> band buckets
    (groupby) -> candidate doc set -> exact n-gram Jaccard verification.
    Returns verified (doc_a, doc_b) with integer jaccard_pct.

    Scale shape: candidates come from the banded groupby; verification
    is exact string-shingle Jaccard computed IN THE DATA PLANE — one
    corpus pass gathers the candidate docs' shingle sets (broadcast-id
    semi-join), then a map_batches over the candidate-pair dataset
    verifies against the broadcast sets. Nothing loops over pairs on the
    driver, and the string shingles match the SQL oracle's trigrams
    exactly (no hash-collision caveat)."""
    import ray

    mh_stage = _MinHashStage(num_hashes=num_hashes, bands=bands, ngram=ngram)
    banded = _read_docs(sf_dir).map_batches(
        lambda t: mh_stage(t), batch_format="pyarrow",
    )

    def band_pairs(g: pd.DataFrame) -> pa.Table:
        # ONE vectorized call per band (16 groups total — the old
        # per-(band, band_hash) map_groups paid a Python call per bucket,
        # ~16x n_docs of them): factorize band_hash, scan group
        # boundaries, emit combinations only for 2..200-doc buckets
        # (hot-bucket guard at scale). Arrow return keeps the schema
        # metadata-free.
        codes, _ = pd.factorize(g["band_hash"], sort=False)
        order = np.argsort(codes, kind="stable")
        docs_s = g["doc_id"].to_numpy()[order]
        codes_s = codes[order]
        bounds = np.flatnonzero(np.diff(codes_s)) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, len(codes_s)]
        out_a, out_b = [], []
        sel = (ends - starts >= 2) & (ends - starts <= 200)
        for s0, s1 in zip(starts[sel], ends[sel]):
            docs = np.unique(docs_s[s0:s1])
            for i, j in itertools.combinations(range(len(docs)), 2):
                out_a.append(int(docs[i]))
                out_b.append(int(docs[j]))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64())})

    cand = (
        banded.groupby("band")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()  # candidate pairs: output-sized, not corpus-sized
        .drop_duplicates()  # pairs found in multiple bands
    )
    if len(cand) == 0:
        return _PAIRS_EMPTY
    need = np.unique(np.concatenate(
        [cand["doc_a"].to_numpy().astype(np.int64), cand["doc_b"].to_numpy().astype(np.int64)]
    ))
    ids_ref = ray.put(need)
    # exact verify, in the data plane: ONE corpus pass gathers the
    # candidate docs' STRING shingle sets (string, not hashed — the SQL
    # oracle's trigrams exactly), then the pairs dataset verifies against
    # the broadcast sets. No join shuffles (the shingle-join variant paid
    # ~5 fixed shuffle costs per call), no driver pair loop.
    shing = (
        _read_docs(sf_dir)
        .map_batches(lambda t, r=ids_ref: _ShingleStrSetStage(r, ngram)(t),
                     batch_format="pyarrow")
        .to_pandas()  # candidate docs only
    )
    sets_ref = ray.put({int(d): np.asarray(sh, dtype=object)
                        for d, sh in zip(shing["doc_id"], shing["sh"])})
    thr_pct = int(jaccard_threshold * 100)
    out = (
        ray.data.from_arrow(pa.table({
            "doc_a": pa.array(cand["doc_a"].to_numpy().astype(np.int64), pa.int64()),
            "doc_b": pa.array(cand["doc_b"].to_numpy().astype(np.int64), pa.int64()),
        }))
        .map_batches(lambda t, r=sets_ref: _PairJaccardStage(r, thr_pct)(t),
                     batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
        .to_pandas()
    )
    if len(out) == 0:
        return _PAIRS_EMPTY
    return pa.table({
        "doc_a": pa.array(out["doc_a"].to_numpy().astype(np.int64)),
        "doc_b": pa.array(out["doc_b"].to_numpy().astype(np.int64)),
        "jaccard_pct": pa.array(out["jaccard_pct"].to_numpy().astype(np.int64)),
    })


# ---------------- SimHash ----------------

class _SimHashStage:
    """64-bit SimHash over term-frequency features (stable crc-based
    feature hashes; bit-majority accumulation vectorized per doc)."""

    def __init__(self):
        self.bit_masks = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, s in enumerate(texts):
            toks = _tokens(s)
            if not toks:
                continue
            tf: dict[str, int] = {}
            for w in toks:
                tf[w] = tf.get(w, 0) + 1
            feats = np.array(
                [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") for w in tf],
                dtype=np.uint64,
            )
            weights = np.fromiter(tf.values(), dtype=np.int64, count=len(tf))
            bits = ((feats[:, None] & self.bit_masks[None, :]) != 0).astype(np.int64)
            score = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
            out[i] = np.bitwise_or.reduce(self.bit_masks[score > 0]) if (score > 0).any() else 0
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "simhash": pa.array([f"{v:016x}" for v in out], type=pa.string()),
            }
        )


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    return _read_docs(sf_dir).map_batches(_SimHashStage, batch_format="pyarrow", concurrency=pool_size()).sort("doc_id")


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs with Hamming distance <= k via the pigeonhole trick:
    split 64 bits into k+1 bands; a distributed (band, chunk) groupby
    yields candidate buckets (same banded shape as MinHash-LSH); pairs
    are generated + Hamming-verified INSIDE each group (the full 64-bit
    signature rides along in the group rows), then deduped across bands
    by a (doc_a, doc_b) groupby — no driver-side signature table."""
    bands = max_hamming + 1
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    sig_ds = _read_docs(sf_dir).map_batches(_SimHashStage, batch_format="pyarrow", concurrency=pool_size())

    def band_rows(t: pa.Table) -> pa.Table:
        vals = np.array([int(s, 16) for s in t.column("simhash").to_pylist()], dtype=np.uint64)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        n = len(ids)
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        out_chunk = np.concatenate(
            [((vals >> np.uint64(b * width)) & mask).view(np.int64) for b in range(bands)]
        ) if n else np.empty(0, np.int64)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "chunk": pa.array(out_chunk, pa.int64()),
                "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
                "sig": pa.array(np.tile(vals.view(np.int64), bands), pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # Arrow return: keeps the downstream shuffle's schemas metadata-free
        if len(g) < 2 or len(g) > 200:  # hot-bucket guard at scale
            e = np.empty(0, dtype=np.int64)
            return pa.table({"doc_a": pa.array(e), "doc_b": pa.array(e),
                             "hamming": pa.array(e)})
        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order]
        sigs = g["sig"].to_numpy()[order].astype(np.int64).view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = np.array([bin(int(sigs[i]) ^ int(sigs[j])).count("1") for i, j in zip(ii, jj)],
                       dtype=np.int64)
        keep = ham <= max_hamming
        return pa.table({"doc_a": pa.array(ids[ii[keep]].astype(np.int64)),
                         "doc_b": pa.array(ids[jj[keep]].astype(np.int64)),
                         "hamming": pa.array(ham[keep])})

    from ray.data.aggregate import Min

    df = (
        sig_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])  # dedupe pairs found in multiple bands
        .aggregate(Min("hamming", alias_name="hamming"))
        .sort(["doc_a", "doc_b"])
        .to_pandas()  # final verified pairs: output-sized
    )
    return pa.table(
        {
            "doc_a": pa.array(df["doc_a"].astype(np.int64)),
            "doc_b": pa.array(df["doc_b"].astype(np.int64)),
            "hamming": pa.array(df["hamming"].astype(np.int64)),
        }
    )


# ---------------- n-gram Jaccard (exact, all pairs via LSH-free path) ----------------

def ngram_jaccard_pairs(sf_dir: str, threshold_pct: int = 50, ngram: int = 3,
                        max_group: int | None = None) -> pa.Table:
    """Exact n-gram Jaccard >= threshold pairs via shingle inverted index
    (explode -> groupby shingle -> pair counts) — string shingles and
    integer arithmetic only, so the DuckDB oracle matches exactly. Docs
    with fewer than ``ngram`` tokens produce no shingles (excluded).

    Shuffle shape (round-3 rework, 24 s -> ~6 s at sf0.1/32cpu): the old
    ``groupby("sh")`` paid one Python map_groups call PER DISTINCT
    SHINGLE (millions); now shingles hash into ``n_buckets`` crc32
    buckets (the build-shuffle convention — a few keys, bounded groups),
    each bucket resolved in ONE vectorized call (factorize -> boundary
    scan; Python touches only multi-doc shingle groups, which are
    pair-output-sized). Per-doc |set| sizes ride along on every exploded
    row and re-aggregate as Max, so the two data-plane hash joins and
    the sizes groupby are gone entirely. ``max_group`` (off by default,
    keeping the SQL-checked path exact) fails LOUDLY if a shingle group
    exceeds it rather than silently undercounting; real 100 TB corpora
    should use the LSH path instead of this exact one."""
    from lucene_solr_ray.pipelines.build import stable_term_hash

    ds = _read_docs(sf_dir)
    n_buckets = 64

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, sh, ns = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = _tokens(s)
            grams = {" ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)}
            doc_ids.extend([d] * len(grams))
            sh.extend(grams)
            ns.extend([len(grams)] * len(grams))
        bucket = (stable_term_hash(np.array(sh, dtype=object)) % n_buckets
                  if sh else np.empty(0, np.int64))
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            "sh": pa.array(sh, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    from ray.data.aggregate import Max

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # one call per bucket: group by shingle via factorize, then emit
        # co-occurrence rows only for multi-doc shingles
        codes, _ = pd.factorize(g["sh"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        docs_s = g["doc_id"].to_numpy()[order]
        ns_s = g["n"].to_numpy()[order]
        bounds = np.flatnonzero(np.diff(codes_s)) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, len(codes_s)]
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s0, s1 in zip(starts[(ends - starts) >= 2], ends[(ends - starts) >= 2]):
            if max_group is not None and s1 - s0 > max_group:
                raise ValueError(
                    f"shingle group has {s1 - s0} docs > max_group={max_group}; "
                    "use the MinHash-LSH path for corpora with shingles this hot"
                )
            sub = np.argsort(docs_s[s0:s1], kind="stable")
            d = docs_s[s0:s1][sub]
            n = ns_s[s0:s1][sub]
            for i, j in itertools.combinations(range(len(d)), 2):
                out_a.append(int(d[i]))
                out_b.append(int(d[j]))
                out_na.append(int(n[i]))
                out_nb.append(int(n[j]))
        # map-side combine: partial inter per pair WITHIN this bucket, so
        # the cross-bucket exchange carries aggregated pair rows only.
        # Explicit pa.table (NOT from_pandas): pandas schema metadata
        # breaks hash(pa.Schema) in downstream shuffles (CLAUDE.md).
        dfp = pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                            "n_a": out_na, "n_b": out_nb})
        agg = (dfp.groupby(["doc_a", "doc_b"], sort=False)
               .agg(inter=("n_a", "size"), n_a=("n_a", "first"),
                    n_b=("n_b", "first")).reset_index())
        return pa.table({c: pa.array(agg[c].to_numpy().astype(np.int64), pa.int64())
                         for c in ("doc_a", "doc_b", "inter", "n_a", "n_b")})

    co = (
        exploded.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()
    )
    if co.count() <= 20_000_000:
        # candidate-pair table fits one task: a single-reducer pandas
        # combine beats Ray's many-key groupby ~20x (the conv-stats
        # lesson, CLAUDE.md) while staying off the driver
        def combine(df: pd.DataFrame) -> pa.Table:
            g = (df.groupby(["doc_a", "doc_b"], sort=False)
                 .agg(inter=("inter", "sum"), n_a=("n_a", "first"),
                      n_b=("n_b", "first")).reset_index())
            return pa.table({c: pa.array(g[c].to_numpy().astype(np.int64), pa.int64())
                             for c in ("doc_a", "doc_b", "inter", "n_a", "n_b")})

        joined = co.repartition(1).map_batches(
            combine, batch_format="pandas", batch_size=None)
    else:  # huge candidate sets: fall back to the pair-keyed exchange
        from ray.data.aggregate import Sum

        joined = co.groupby(["doc_a", "doc_b"]).aggregate(
            Sum("inter", alias_name="inter"),
            Max("n_a", alias_name="n_a"),
            Max("n_b", alias_name="n_b"))

    def finish(t: pa.Table) -> pa.Table:
        inter = t.column("inter").to_numpy().astype(np.int64)
        union = (t.column("n_a").to_numpy() + t.column("n_b").to_numpy()).astype(np.int64) - inter
        keep = (union > 0) & (inter * 100 >= threshold_pct * union)
        return pa.table(
            {
                "doc_a": pa.array(t.column("doc_a").to_numpy()[keep], pa.int64()),
                "doc_b": pa.array(t.column("doc_b").to_numpy()[keep], pa.int64()),
                "jaccard_pct": pa.array(inter[keep] * 100 // union[keep], pa.int64()),
            }
        )

    df = joined.map_batches(finish, batch_format="pyarrow").sort(["doc_a", "doc_b"]).to_pandas()
    return pa.table(
        {
            "doc_a": pa.array(df["doc_a"].astype(np.int64)),
            "doc_b": pa.array(df["doc_b"].astype(np.int64)),
            "jaccard_pct": pa.array(df["jaccard_pct"].astype(np.int64)),
        }
    )


# ---------------- embedding-cosine near-dup ----------------

def _emb_chunks(sf_dir: str, chunk_rows: int):
    """Yield (ids, normalized float64 matrix) chunks of the embeddings
    table as object-store refs — the driver holds only one chunk at a
    time (bounded memory), workers fetch refs zero-copy."""
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    refs = []
    import ray as _ray
    for b in ds.iter_batches(batch_size=chunk_rows, batch_format="pyarrow"):
        ids = b.column("vec_id").to_numpy().astype(np.int64)
        x = np.array(b.column("embedding").to_pylist(), dtype=np.float64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        refs.append(_ray.put((ids, xn)))
    return refs


class _BlockPairStage:
    """Exact cosine over one (chunk_i, chunk_j) block pair: a float64
    matmul per pair, emitting only (doc_a < doc_b) rows above threshold.
    Workers hold exactly two chunks — O(n^2/P) compute, O(chunk^2)
    memory, nothing corpus-sized anywhere."""

    def __init__(self, refs, threshold: float):
        self.refs = refs  # list of ObjectRefs; ray.get is per-pair, cached by plasma
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray as _ray
        out_a, out_b = [], []
        for i, j in zip(t.column("i").to_pylist(), t.column("j").to_pylist()):
            ids_i, xi = _ray.get(self.refs[i])
            ids_j, xj = _ray.get(self.refs[j])
            cos = xi @ xj.T
            if i == j:
                iu = np.triu_indices(len(ids_i), k=1)
                keep = cos[iu] >= self.threshold
                a, b = ids_i[iu[0][keep]], ids_j[iu[1][keep]]
            else:
                ii, jj = np.nonzero(cos >= self.threshold)
                a, b = ids_i[ii], ids_j[jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.extend(lo.tolist())
            out_b.extend(hi.tolist())
        return pa.table(
            {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64())}
        )


#: embedding_cosine_pairs refuses above this many vectors: all-pairs is
#: O(n^2) block matmuls BY DESIGN (it is the exactness anchor the LSH
#: paths verify against), and at 250k rows that is already ~3e10 dot
#: products — far past where SRP-LSH/SemDeDup are the right tool. The
#: guard makes the anchor impossible to point at a 100 TB corpus by
#: accident.
MAX_EXACT_COSINE_ROWS = 250_000


def embedding_cosine_pairs(sf_dir: str, threshold: float = 0.42,
                           chunk_rows: int = 4096,
                           max_exact_rows: int = MAX_EXACT_COSINE_ROWS,
                           on_overflow: str = "raise") -> ray.data.Dataset:
    """EXACT embedding near-dup: all (a, b) with cosine >= threshold, via
    a distributed block-pair cartesian (each unordered chunk pair is
    scored by exactly one task, so no cross-band dedupe is needed).
    This is the exactness baseline; the 100 TB path is
    ``embedding_lsh_pairs`` (banding prunes the pair space). Size-guarded:
    above ``max_exact_rows`` vectors (parquet-metadata row count, nothing
    read) it raises, or auto-dispatches to the LSH path when
    ``on_overflow='lsh'``."""
    import pyarrow.parquet as _pq

    n_rows = _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_rows > max_exact_rows:
        if on_overflow == "lsh":
            return embedding_lsh_pairs(sf_dir, threshold=threshold)
        raise ValueError(
            f"embedding_cosine_pairs is the exact all-pairs ANCHOR: {n_rows} "
            f"vectors > max_exact_rows={max_exact_rows} would run O(n^2) "
            "block products. Use embedding_lsh_pairs / semdedup for scale, "
            "or pass on_overflow='lsh' to auto-dispatch."
        )
    refs = _emb_chunks(sf_dir, chunk_rows)
    n = len(refs)
    pair_rows = [{"i": i, "j": j} for i in range(n) for j in range(i, n)]
    pairs = ray.data.from_items(pair_rows)
    return (
        pairs.map_batches(
            _BlockPairStage,
            fn_constructor_kwargs={"refs": refs, "threshold": threshold},
            batch_format="pyarrow",
            batch_size=1,
            concurrency=pool_size(),
        )
        .sort(["doc_a", "doc_b"])
    )


class _HyperplaneStage:
    """Random-hyperplane (SRP) signatures: sign(X @ P) packed into band
    chunks. Planes are seeded and built once per actor. Band rows carry
    (band, chunk, vec_id) ONLY — at 64 bands, shipping the vector in
    every row would amplify the shuffle payload 64x (round-2 verdict);
    verification re-joins vectors per candidate instead."""

    def __init__(self, n_planes: int = 256, bands: int = 64, seed: int = 19):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((64, n_planes))  # (dim, n_planes)
        self.seed = seed
        self.n_planes = n_planes
        self.bands = bands
        self.r = n_planes // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        x = emb_matrix(t.column("embedding"))
        if self.planes.shape[0] != x.shape[1]:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((x.shape[1], self.n_planes))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        bits = (xn @ self.planes) >= 0  # (n, n_planes)
        n = len(ids)
        weights = 1 << np.arange(self.r, dtype=np.int64)
        # chunk per (band, vec): (n, bands) int matrix, flattened band-major
        chunks = np.stack(
            [bits[:, b * self.r:(b + 1) * self.r].astype(np.int64) @ weights
             for b in range(self.bands)], axis=0,
        ) if n else np.empty((self.bands, 0), np.int64)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n), pa.int32()),
                "chunk": pa.array(chunks.reshape(-1), pa.int64()),
                "vec_id": pa.array(np.tile(ids, self.bands), pa.int64()),
            }
        )


class _PairCosineStage:
    """Exact cosine verify over candidate (doc_a, doc_b) rows: vectors
    come from a broadcast (sorted ids, normalized matrix) of CANDIDATE
    docs only (ray.put once, zero-copy per task) — vectorized gather +
    row-wise dot per batch, nothing per-pair on the driver."""

    def __init__(self, vecs_ref, threshold: float):
        self.ids, self.xn = ray.get(vecs_ref)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.int64)
        b = t.column("doc_b").to_numpy().astype(np.int64)
        va = self.xn[np.searchsorted(self.ids, a)]
        vb = self.xn[np.searchsorted(self.ids, b)]
        cos = np.einsum("ij,ij->i", va, vb)
        keep = cos >= self.threshold
        return pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                         "doc_b": pa.array(b[keep], pa.int64())})


def embedding_lsh_pairs(sf_dir: str, threshold: float = 0.42,
                        n_planes: int = 256, bands: int = 64,
                        max_bucket: int = 1000) -> ray.data.Dataset:
    """Approximate embedding near-dup at scale: SRP-LSH banding
    ((band, chunk) groupby) prunes the pair space; candidate pairs carry
    ids only, are deduped across bands by a (doc_a, doc_b) groupby, and
    an exact cosine verify joins the candidate vectors back in the data
    plane (no false positives). Per-pair recall is 1 - (1 - p^r)^b with
    p = 1 - theta/pi: at the default 64 bands x 4 planes and the gate
    threshold 0.42 (p = 0.639) that is 1 - 8.6e-6 — measured recall 1.0
    on the gate corpora (pinned in tests), which is why the exact-cosine
    SQL serves as this entry's oracle.

    Honesty note for 100 TB: at cos >= 0.42 (theta = 65 deg) ANY sign-LSH
    prunes weakly — random pairs collide in some band with prob ~0.98 at
    these settings, so verify work approaches the exact path's. The
    machinery prunes hard at real near-dup thresholds (>= 0.8); raise
    r / lower bands accordingly there."""

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # Arrow return: keeps the downstream shuffle's schemas metadata-free
        if len(g) < 2 or len(g) > max_bucket:  # hot-bucket guard at scale
            e = np.empty(0, dtype=np.int64)
            return pa.table({"doc_a": pa.array(e), "doc_b": pa.array(e)})
        ids = np.sort(g["vec_id"].to_numpy().astype(np.int64))
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[ii], pa.int64()),
                         "doc_b": pa.array(ids[jj], pa.int64())})

    from ray.data.aggregate import Count

    sig = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        _HyperplaneStage,
        fn_constructor_kwargs={"n_planes": n_planes, "bands": bands},
        batch_format="pyarrow",
        concurrency=pool_size(),
    )
    cand = (
        sig.groupby(["band", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])  # dedupe pairs found in multiple bands
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["doc_a", "doc_b"])
        .materialize()  # candidate-pair sized; reused for id-collect + verify
    )
    need = cand.map_batches(
        lambda t: pa.table({"vec_id": pa.array(np.unique(np.concatenate(
            [t.column("doc_a").to_numpy(), t.column("doc_b").to_numpy()]
        ) if t.num_rows else np.empty(0, np.int64)), pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()  # candidate DOC ids: output-ish sized, not corpus sized
    ids = np.unique(need["vec_id"].to_numpy().astype(np.int64))
    if len(ids) == 0:
        return ray.data.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                             "doc_b": pa.array([], pa.int64())}))

    def gather_vecs(t: pa.Table) -> pa.Table:
        vid = t.column("vec_id").to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(ids, vid), len(ids) - 1)
        hit = ids[pos] == vid
        x = emb_matrix(t.column("embedding"))[hit]
        xn = x / np.linalg.norm(x, axis=1, keepdims=True) if len(x) else x
        return pa.table({"vec_id": pa.array(vid[hit], pa.int64()),
                         "emb": pa.array([r.tolist() for r in xn], pa.list_(pa.float64()))})

    vdf = (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(gather_vecs, batch_format="pyarrow")
        .to_pandas()  # candidate vectors only
        .sort_values("vec_id")
    )
    vecs_ref = ray.put((vdf["vec_id"].to_numpy().astype(np.int64),
                        np.array(vdf["emb"].tolist(), dtype=np.float64)))
    return (
        cand.map_batches(
            _PairCosineStage,
            fn_constructor_kwargs={"vecs_ref": vecs_ref, "threshold": threshold},
            batch_format="pyarrow",
            concurrency=pool_size(),
        )
        .sort(["doc_a", "doc_b"])
    )


# ---------------- near-dup connected components / canonical keep ----------------

def connected_components(edges: ray.data.Dataset, max_rounds: int = 64,
                         num_partitions: int | None = None) -> ray.data.Dataset:
    """Distributed connected components over an undirected edge Dataset
    (columns ``doc_a``/``doc_b``) by min-label propagation: every node
    starts labeled with itself; each round every node takes the minimum
    of its own and its neighbors' labels (hash-join on the edge list +
    per-node Min) until no label changes. Converges in <= graph-diameter
    rounds — near-dup clusters are low-diameter by construction (every
    member pairs with most others), so rounds stay single digits.

    Scale shape: the edge list is pair-output-sized (<< corpus); each
    round is one partitioned join + one groupby-Min over it, and only a
    scalar changed-count reaches the driver. The label table is
    materialized per round (node-sized) so the lazy lineage doesn't
    re-execute from round 0. Reference anchor: dedup canonicalization in
    SignatureUpdateProcessor keeps one doc per signature group ([U]
    solr/core/.../update/processor/SignatureUpdateProcessorFactory.java);
    this generalizes keep-one to transitive near-dup clusters.
    """
    from ray.data.aggregate import Min

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.int64)
        b = t.column("doc_b").to_numpy().astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges2 = edges.map_batches(sym, batch_format="pyarrow").materialize()
    n_edge_rows = edges2.count()
    # The edge list is pair-output-sized — at gate scales a few thousand
    # rows, for which each distributed round's fixed cost (2 joins + a
    # groupby) dwarfs the work (measured 11.5 s for a job a single task
    # does in milliseconds). Below the one-task threshold run union-find
    # in ONE Ray task (same "output-sized combine in one task" medicine
    # as ngram_jaccard/BENCH round-3); the label-propagation loop is the
    # >threshold scale path and stays the algorithm of record.
    if n_edge_rows <= 5_000_000:
        @ray.remote
        def _unionfind(*parts: pa.Table) -> pa.Table:
            t = pa.concat_tables(parts)
            src = t.column("src").to_numpy().astype(np.int64)
            dst = t.column("dst").to_numpy().astype(np.int64)
            nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
            parent = np.arange(len(nodes), dtype=np.int64)

            def find(i: int) -> int:
                while parent[i] != i:
                    parent[i] = parent[parent[i]]  # path halving
                    i = parent[i]
                return i

            a_ix, b_ix = inv[: len(src)], inv[len(src):]
            for i in range(len(src)):
                ra, rb = find(int(a_ix[i])), find(int(b_ix[i]))
                if ra != rb:
                    # union by MIN node id == min-label propagation's fixpoint
                    lo, hi = (ra, rb) if nodes[ra] < nodes[rb] else (rb, ra)
                    parent[hi] = lo
            roots = np.array([find(int(i)) for i in range(len(nodes))], np.int64)
            return pa.table({"node": pa.array(nodes), "lab": pa.array(nodes[roots])})

        blocks = list(edges2.to_arrow_refs())
        return ray.data.from_arrow_refs([_unionfind.remote(*blocks)])
    if num_partitions is None:
        # size the per-round exchanges to the materialized edge count
        # (iterative rounds pay per-partition fixed cost twice per round)
        num_partitions = sized_join_partitions(n_edge_rows)

    def init_label(t: pa.Table) -> pa.Table:
        n = t.column("src")
        return pa.table({"node": n, "lab": n})

    labels = (
        edges2.groupby("src").aggregate(Min("dst", alias_name="_m"))
        .map_batches(lambda t: pa.table({"node": t.column("src"),
                                         "lab": pa.compute.min_element_wise(
                                             t.column("src"), t.column("_m"))}),
                     batch_format="pyarrow")
        .materialize()
    )

    for _ in range(max_rounds):
        nbr = edges2.join(labels, "inner", num_partitions=num_partitions,
                          on=("src",), right_on=("node",))
        cand = (
            nbr.map_batches(lambda t: pa.table({"cnode": t.column("dst"),
                                                "clab": t.column("lab")}),
                            batch_format="pyarrow")
            .groupby("cnode").aggregate(Min("clab", alias_name="nmin"))
        )
        merged = labels.join(cand, "left_outer", num_partitions=num_partitions,
                             on=("node",), right_on=("cnode",))

        def step(t: pa.Table) -> pa.Table:
            old = t.column("lab").to_numpy().astype(np.int64)
            nm = t.column("nmin").to_numpy(zero_copy_only=False)
            nm = np.where(pd.isna(nm), old, nm).astype(np.int64)
            new = np.minimum(old, nm)
            return pa.table({"node": t.column("node"),
                             "lab": pa.array(new),
                             "chg": pa.array((new < old).astype(np.int64))})

        labels = merged.map_batches(step, batch_format="pyarrow").materialize()
        if labels.sum("chg") == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    return labels.select_columns(["node", "lab"])


def dedup_connected_components(sf_dir: str, threshold_pct: int = 30,
                               ngram: int = 3) -> pa.Table:
    """Near-dup clustering + canonical-keep over the exact n-gram Jaccard
    pair graph: pairs at jaccard >= threshold become edges, connected
    components get the component-minimum doc_id as canonical, and
    ``keep`` marks the one document per cluster a dedup pass retains.
    Output is cluster-member-sized (isolated docs are implicitly kept and
    not listed). At 100 TB the upstream pair Dataset (LSH-verified pairs)
    plugs straight into connected_components without materializing."""
    pairs = ngram_jaccard_pairs(sf_dir, threshold_pct=threshold_pct, ngram=ngram)
    edges = ray.data.from_arrow(pairs.select(["doc_a", "doc_b"]))
    labels = connected_components(edges)
    from ray.data.aggregate import Count

    sizes = labels.groupby("lab").aggregate(Count(alias_name="n_members")) \
        .map_batches(lambda t: t.rename_columns(["slab", "n_members"]),
                     batch_format="pyarrow")
    out = (
        labels.join(sizes, "inner", num_partitions=join_partitions(), on=("lab",), right_on=("slab",))
        .map_batches(lambda t: pa.table({
            "doc_id": t.column("node"),
            "canon_id": t.column("lab"),
            "n_members": t.column("n_members"),
            "keep": pa.compute.cast(pa.compute.equal(t.column("node"), t.column("lab")), pa.int64()),
        }), batch_format="pyarrow")
        .sort("doc_id")
    )
    df = out.to_pandas()
    return pa.table({
        "doc_id": pa.array(df["doc_id"].astype(np.int64)),
        "canon_id": pa.array(df["canon_id"].astype(np.int64)),
        "n_members": pa.array(df["n_members"].astype(np.int64)),
        "keep": pa.array(df["keep"].astype(np.int64)),
    })


def dedup_cluster_representatives(sf_dir: str, threshold_pct: int = 30,
                                  ngram: int = 3) -> pa.Table:
    """Near-dup cluster REPRESENTATIVE selection — the production policy
    of keeping each cluster's best-quality member rather than its
    minimum id (keep-first is an arbitrary survivor; quality-keep
    retains the longest/cleanest copy). Components come from the same
    pair graph as dedup_connected_components; the representative is the
    member with max n_chars (doc_id asc tiebreak). The quality join is a
    docid-pushdown read over only the clustered docs (cluster-member-
    sized, never the corpus), and the argmax is one component-keyed
    pass."""
    cc = dedup_connected_components(sf_dir, threshold_pct=threshold_pct,
                                    ngram=ngram).to_pandas()
    if cc.empty:
        return pa.table({c: pa.array([], pa.int64()) for c in
                         ("canon_id", "rep_doc_id", "n_members", "rep_n_chars")})
    ds = pads.dataset(f"{sf_dir}/documents.parquet", format="parquet")
    quality = ds.to_table(
        columns=["doc_id", "n_chars"],
        filter=pa.compute.field("doc_id").isin(
            pa.array(cc["doc_id"].to_numpy().astype(np.int64)))).to_pandas()
    m = cc.merge(quality, on="doc_id")
    m = m.sort_values(["canon_id", "n_chars", "doc_id"],
                      ascending=[True, False, True])
    rep = m.groupby("canon_id", sort=True).first().reset_index()
    return pa.table({
        "canon_id": pa.array(rep["canon_id"].astype(np.int64), pa.int64()),
        "rep_doc_id": pa.array(rep["doc_id"].astype(np.int64), pa.int64()),
        "n_members": pa.array(rep["n_members"].astype(np.int64), pa.int64()),
        "rep_n_chars": pa.array(rep["n_chars"].astype(np.int64), pa.int64()),
    })


# ---------------- SemDeDup (semantic dedup via cluster-then-pairwise) ----------------

def semdedup_keep(sf_dir: str, n_clusters: int = 16, threshold: float = 0.42,
                  scale: int = 10_000) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the embedding
    space, compare cosine similarity ONLY within clusters, and keep one
    representative per semantic-duplicate group — the published trade
    that turns O(n^2) pairwise into sum-of-cluster-sized blocks
    (cross-cluster dup pairs are unseen by design; the paper sizes k
    proportionally to n so clusters stay bounded).

    Determinism/oracle: centroids are the ``n_clusters`` lowest vec_ids
    quantized to int64 (the sampled-codebook convention of ann_pq_topk);
    assignment is argmin int64 squared distance, ties to the lowest
    cluster — both exactly replicable in SQL. The within-cluster dup
    graph uses float64 cosine >= threshold (0.42 sits >= 3e-5 from every
    pair's cosine on the gate corpora — the dedup_embedding_cosine
    margin); keep = min vec_id per connected component (union-find
    inside the per-cluster UDF; cluster-sized state only). Output: one
    row per vector that participates in ANY within-cluster dup pair.

    Scale shape: centroids broadcast once; ONE assign pass; one
    cluster-keyed shuffle (vectors must co-locate for the pairwise
    step); per-cluster work is cluster-sized."""
    head = (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .sort("vec_id").limit(n_clusters).to_pandas()
    )
    cq = np.floor(np.array(head["embedding"].tolist(), dtype=np.float64)
                  * scale + 0.5).astype(np.int64)
    c_ref = ray.put(cq)

    class Assign:
        def __init__(self):
            self.c = ray.get(c_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = emb_matrix(t.column("embedding"))
            q = np.floor(x * scale + 0.5).astype(np.int64)
            d2 = ((q[:, None, :] - self.c[None, :, :]) ** 2).sum(axis=2)
            cid = d2.argmin(axis=1)  # first occurrence = lowest cluster on ties
            return t.append_column("cluster_id", pa.array(cid.astype(np.int64)))

    def per_cluster(g):
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        x = np.array(g["embedding"].tolist(), dtype=np.float64)[order]
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sim = xn @ xn.T
        n = len(ids)
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        iu, ju = np.triu_indices(n, k=1)
        hits = sim[iu, ju] >= threshold  # vectorized pair extraction
        in_pair = np.zeros(n, bool)
        for i, j in zip(iu[hits], ju[hits]):
            in_pair[i] = in_pair[j] = True
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(n)])
        cid = int(g["cluster_id"].iloc[0])
        rows = [(int(ids[i]), cid, int(ids[roots[i]]), int(ids[i] == ids[roots[i]]))
                for i in range(n) if in_pair[i]]
        return pa.table({
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "cluster_id": pa.array([r[1] for r in rows], pa.int64()),
            "keep_id": pa.array([r[2] for r in rows], pa.int64()),
            "kept": pa.array([r[3] for r in rows], pa.int64()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(Assign, batch_format="pyarrow", concurrency=pool_size())
        .groupby("cluster_id")
        .map_groups(per_cluster, batch_format="pandas")
        .sort("vec_id")
    )


def semdedup_keep_set(sf_dir: str, threshold: float = 0.42,
                      chunk_rows: int = 4096) -> ray.data.Dataset:
    """SemDeDup-style semantic prune (Abbas et al. 2023, SemDeDup —
    public arXiv 2303.09540): drop every vector that has a
    more-similar-than-threshold neighbor with a SMALLER id; the kept set
    is the canonical representatives. Pair-based (not transitive-greedy:
    a dropped vector still shadows its own neighbors only through
    smaller-id pairs), so the keep rule is a pure NOT EXISTS — exact in
    SQL. Pairs come from the exact block-pair cosine (the LSH variant is
    the 100 TB path); the dropped-id set is output-sized and broadcasts
    into a stateless filter over the vec_id column read."""
    import pyarrow.compute as pc

    pairs = embedding_cosine_pairs(sf_dir, threshold, chunk_rows).to_pandas()
    dropped = (np.unique(pairs["doc_b"].to_numpy())
               if len(pairs) else np.empty(0, np.int64))
    drop_arr = pa.array(dropped, pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t.column("vec_id"), value_set=drop_arr))
        return t.filter(mask).select(["vec_id"])

    from lucene_solr_ray.io_utils import read_parquet_clean

    return (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .map_batches(keep, batch_format="pyarrow")
        .sort("vec_id")
    )


def dedup_incremental(sf_dir: str, prefix_tokens: int = 10) -> ray.data.Dataset:
    """Incremental (cross-corpus) dedup — the "dedup the NEW crawl
    against the already-ingested corpus" pass every production pipeline
    runs between crawls. Stand-in split: even doc_ids are the existing
    corpus, odd doc_ids the new batch (deterministic, so the SQL oracle
    selects the same sides). Signature = the first ``prefix_tokens``
    whitespace tokens (the content-prefix fingerprint; at web scale this
    is a 64-bit hash, spelled out here so the oracle is a plain string
    join).

    Scale shape: ONE signature-keyed hash shuffle co-locates both
    sides' (doc_id, side) rows per signature — no broadcast of the
    corpus-sized existing set, no Dataset.join against a
    groupby-aggregate lineage (the Ray 2.49 crash shape) — and an
    arrow-native grouped emit pairs each new doc with the MIN existing
    doc_id of its group. Output: (doc_id, dup_of) for flagged new docs,
    doc_id-sorted."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        prefixes = [" ".join((s or "").split()[:prefix_tokens])
                    for s in t.column("text").to_pylist()]
        return pa.table({"sig": pa.array(prefixes, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy().astype(np.int64)
        existing = ids[ids % 2 == 0]
        new = np.sort(ids[ids % 2 == 1])
        if len(existing) == 0 or len(new) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(new, pa.int64()),
            "dup_of": pa.array(np.full(len(new), int(existing.min())),
                               pa.int64()),
        })

    return (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby("sig")
        .map_groups(pairs, batch_format="pyarrow")
        .sort("doc_id")
    )
