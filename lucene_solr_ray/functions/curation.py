"""Training-data curation operators: benchmark decontamination,
repetition (Gopher-style) quality signals, PII detection/redaction.

These are the filter passes a 100-TB pretraining pipeline runs between
dedup and indexing. Reference anchors: the repetition thresholds follow
the published Gopher data-quality rules (Rae et al. 2021, table A1
shape: duplicate-line/top-ngram fractions); decontamination follows the
published n-gram-overlap protocol (GPT-3 appendix C: flag training docs
sharing any N-gram with the eval set). All outputs are exact integers so
the DuckDB oracles hash identically.

Scale shapes: the benchmark n-gram set is eval-sized (tiny vs corpus) —
broadcast once via ray.put as a sorted numpy array, membership tested
per batch with searchsorted (at real scale the broadcast becomes a
Bloom filter of hashes plus an exact audit of flagged docs); repetition
and PII are per-batch map_batches with no shuffle at all.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

# md5-bucket memo shared by the DSIR / hash-LM stages: the fixture vocab
# is closed (hundreds of distinct grams), so per-occurrence md5 calls are
# pure repeat work. Worker-process-local, bounded, exact (full-key dict).
_BUCKET_MEMO: dict[tuple[str, int], int] = {}


def ws_token_counts(col) -> np.ndarray:
    """Vectorized len(s.split()) over a string column — exact parity
    with Python str.split() (null/empty -> 0), pinned by
    tests/test_round5_guards.py.

    One numpy pass over the column's raw UTF-8 byte buffer: a token
    start is a non-whitespace byte preceded by whitespace (row starts
    are forced to "after whitespace"), counted per row by a cumsum
    differenced at the offsets — no per-row Python, no regex engine.
    ASCII whitespace is decided byte-wise; rows that contain a lead
    byte (0xC2/0xE1/0xE2/0xE3) that could open a multibyte unicode
    whitespace char fall back to str.split() for THOSE rows only, so
    unicode parity is kept while the corpus-typical ASCII path stays
    pure numpy (measured 2.3x the per-row loop on the sf0.1 corpus
    shape, 1.3x on 15KB docs — BENCH/README round-5 note)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.fill_null("") if col.null_count else col
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    bufs = arr.buffers()
    if bufs[2] is None or bufs[2].size == 0:
        return np.zeros(n, np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], off_dtype)[arr.offset: arr.offset + n + 1].astype(np.int64)
    buf = np.frombuffer(bufs[2], np.uint8)[offs[0]: offs[-1]]
    offs = offs - offs[0]
    # ASCII whitespace membership via SIMD-friendly range compares
    # (a 256-entry gather is ~2x slower than these byte comparisons)
    ws_b = ((buf == 0x20) | ((buf >= 0x09) & (buf <= 0x0D))
            | ((buf >= 0x1C) & (buf <= 0x1F)))
    nonws = ~ws_b
    starts = np.empty(len(buf), bool)
    if len(buf):
        starts[0] = nonws[0]
        np.logical_and(nonws[1:], ws_b[:-1], out=starts[1:])
        row_starts = offs[:-1][offs[:-1] < len(buf)]
        starts[row_starts] = nonws[row_starts]
    # per-row start counts: token-start positions are sparse (one per
    # token) — flatnonzero + searchsorted beats a buffer-sized cumsum
    counts = np.diff(np.searchsorted(np.flatnonzero(starts), offs))
    sus = (buf == 0xC2) | ((buf >= 0xE1) & (buf <= 0xE3))  # unicode-ws lead bytes
    if sus.any():
        bad_rows = np.flatnonzero(np.diff(np.searchsorted(np.flatnonzero(sus), offs)) > 0)
        for i in bad_rows:
            counts[i] = len(arr[int(i)].as_py().split())
    return counts.astype(np.int64)


def _md5_bucket(key: str, n_buckets: int) -> int:
    import hashlib

    k = (key, n_buckets)
    v = _BUCKET_MEMO.get(k)
    if v is None:
        v = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little") % n_buckets
        if len(_BUCKET_MEMO) < 2_000_000:
            _BUCKET_MEMO[k] = v
    return v

_WS = re.compile(r"\s+")


def _read_docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


def _tokens(s: str) -> list[str]:
    return _WS.split(s.strip()) if s and s.strip() else []


def _line_segments(toks: list[str], line_tokens: int) -> list[str]:
    """The corpus's deterministic line view shared by line_dedup_first
    and boilerplate_strip (their SQL oracles assume the IDENTICAL
    segmentation): non-overlapping ``line_tokens``-token segments."""
    return [" ".join(toks[j:j + line_tokens])
            for j in range(0, len(toks), line_tokens)]


def _line_hash(line: str) -> int:
    """Shifted md5-64 line hash (the simhash-oracle int64 convention) —
    one definition so the two line-view entries can never desync."""
    import hashlib

    return int.from_bytes(hashlib.md5(line.encode()).digest()[:8],
                          "little") - (1 << 63)


# ---------------- benchmark decontamination ----------------

def decontaminate_ngram(sf_dir: str, ngram: int = 5, bench_mod: int = 37) -> ray.data.Dataset:
    """Flag training documents sharing any word ``ngram``-gram with the
    held-out benchmark set (stand-in: docs with doc_id % bench_mod == 0,
    deterministic so the SQL oracle selects the same set). Output, per
    non-benchmark doc: the count of its DISTINCT n-grams that appear in
    the benchmark set and the contaminated flag.

    The benchmark gram set is collected to the driver (eval-set-sized by
    definition) and broadcast as ONE sorted numpy unicode array; each
    corpus batch tests membership with searchsorted — zero shuffle, one
    corpus pass."""
    bench = (
        _read_docs(sf_dir)
        .filter(lambda r: r["doc_id"] % bench_mod == 0)
        .map_batches(_gram_explode(ngram), batch_format="pyarrow")
    )
    grams = np.unique(np.asarray(bench.to_pandas()["g"], dtype=object).astype(str))
    grams_ref = ray.put(grams)

    class Flag:
        def __init__(self):
            self.grams = ray.get(grams_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            texts = t.column("text").to_pylist()
            n_hit = np.zeros(len(texts), np.int64)
            for i, s in enumerate(texts):
                toks = _tokens(s)
                gs = {" ".join(toks[j:j + ngram]) for j in range(len(toks) - ngram + 1)}
                if not gs or not len(self.grams):
                    continue
                # np.isin promotes to the common unicode width (no
                # truncation pitfall, unlike casting to grams.dtype)
                n_hit[i] = int(np.isin(np.array(sorted(gs), dtype=str), self.grams).sum())
            return pa.table({
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_contaminated": pa.array(n_hit),
                "contaminated": pa.array((n_hit > 0).astype(np.int64)),
            })

    return (
        _read_docs(sf_dir)
        .filter(lambda r: r["doc_id"] % bench_mod != 0)
        .map_batches(Flag, batch_format="pyarrow", concurrency=pool_size())
        .sort("doc_id")
    )


def _gram_explode(ngram: int):
    def fn(t: pa.Table) -> pa.Table:
        out = set()
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            out.update(" ".join(toks[j:j + ngram]) for j in range(len(toks) - ngram + 1))
        return pa.table({"g": pa.array(sorted(out), pa.string())})
    return fn


def _bloom_hashes(grams: list[str], m_bits: int, k_hashes: int) -> np.ndarray:
    """Kirsch-Mitzenmacher double hashing: md5-128 split into two 64-bit
    halves h1/h2; bit_i = (h1 + i*h2) mod m. Returns the flat array of
    bit positions for all grams x all k hash functions."""
    import hashlib

    if not grams:
        return np.empty(0, np.int64)
    h1 = np.empty(len(grams), np.uint64)
    h2 = np.empty(len(grams), np.uint64)
    for i, g in enumerate(grams):
        d = hashlib.md5(g.encode()).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    ks = np.arange(k_hashes, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64).ravel()


def decontaminate_bloom(sf_dir: str, ngram: int = 5, bench_mod: int = 37,
                        m_bits: int = 1 << 17, k_hashes: int = 7) -> ray.data.Dataset:
    """The 100-TB scale path `decontaminate_ngram`'s docstring promises:
    Bloom prefilter + exact audit of ONLY the flagged docs. Output is
    IDENTICAL to the exact pass (Bloom false positives are killed by the
    audit; false negatives are impossible), so it shares the same SQL
    oracle.

    Shape: (1) benchmark grams -> per-batch partial Bloom bitmaps
    (mergeable by OR; O(batches x m/8 bytes) exchange — at 10^12 grams
    only the 16 KB bitmaps move, never the gram strings); (2) one corpus
    pass tests every doc's grams against the broadcast bitmap — zero
    shuffle; (3) the exact benchmark gram set is applied ONLY to
    Bloom-positive docs (candidate-sized, here via the same broadcast
    sorted-array membership the exact pass uses; at 100 TB a hash-range
    semi-join of candidate grams vs the partitioned gram table)."""
    bench = (
        _read_docs(sf_dir)
        .filter(lambda r: r["doc_id"] % bench_mod == 0)
        .map_batches(_gram_explode(ngram), batch_format="pyarrow")
        .materialize()  # consumed twice (bloom partials + exact audit
                        # set) — never re-run the filter+explode lineage
    )

    def bloom_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 64, np.uint64)
        pos = _bloom_hashes(t.column("g").to_pylist(), m_bits, k_hashes)
        np.bitwise_or.at(bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 64, np.uint64)
    n_partials = 0
    for batch in bench.map_batches(bloom_partial, batch_format="pyarrow").iter_batches(
        batch_size=256, batch_format="pyarrow"
    ):
        for blob in batch.column("bits").to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint64)
            n_partials += 1
    assert n_partials > 0, "benchmark set produced no bloom partials"
    bloom_ref = ray.put(merged)

    # the exact gram set, used ONLY on bloom-positive docs (audit side)
    grams_exact = np.unique(np.asarray(bench.to_pandas()["g"], dtype=object).astype(str))
    exact_ref = ray.put(grams_exact)

    class FlagAudited:
        def __init__(self):
            self.bits = ray.get(bloom_ref)
            self.exact = ray.get(exact_ref)
            self.n_bloom_pos = 0
            self.n_audited_true = 0

        def _maybe(self, grams: list[str]) -> bool:
            pos = _bloom_hashes(grams, m_bits, k_hashes)
            hit = (self.bits[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
            return bool(hit.reshape(len(grams), k_hashes).all(axis=1).any())

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            texts = t.column("text").to_pylist()
            n_hit = np.zeros(len(texts), np.int64)
            for i, s in enumerate(texts):
                toks = _tokens(s)
                gs = sorted({" ".join(toks[j:j + ngram])
                             for j in range(len(toks) - ngram + 1)})
                if not gs:
                    continue
                if not self._maybe(gs):  # bloom says definitely clean
                    continue
                self.n_bloom_pos += 1
                n_hit[i] = int(np.isin(np.array(gs, dtype=str), self.exact).sum())
                self.n_audited_true += int(n_hit[i] > 0)
            return pa.table({
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_contaminated": pa.array(n_hit),
                "contaminated": pa.array((n_hit > 0).astype(np.int64)),
            })

    return (
        _read_docs(sf_dir)
        .filter(lambda r: r["doc_id"] % bench_mod != 0)
        .map_batches(FlagAudited, batch_format="pyarrow", concurrency=pool_size())
        .sort("doc_id")
    )


# ---------------- repetition signals (Gopher-style) ----------------

def repetition_signals(sf_dir: str) -> ray.data.Dataset:
    """Per-doc repetition counters (exact-integer numerators of the
    Gopher duplicate-fraction rules): token totals/distincts, the most
    frequent unigram's count, and bigram totals + the most frequent
    bigram's count. A filter rule like 'drop if top-bigram fraction >
    0.18' is then an integer comparison downstream."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, np.int64)
        n_distinct = np.zeros(n, np.int64)
        max_uni = np.zeros(n, np.int64)
        n_bi = np.zeros(n, np.int64)
        max_bi = np.zeros(n, np.int64)
        for i, s in enumerate(texts):
            toks = _tokens(s)
            if not toks:
                continue
            a = np.asarray(toks, dtype=object)
            _, cnt = np.unique(a.astype(str), return_counts=True)
            n_tok[i] = len(toks)
            n_distinct[i] = len(cnt)
            max_uni[i] = cnt.max()
            if len(toks) >= 2:
                bi = np.asarray([toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)], dtype=str)
                _, bcnt = np.unique(bi, return_counts=True)
                n_bi[i] = len(bi)
                max_bi[i] = bcnt.max()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok),
            "n_distinct_tokens": pa.array(n_distinct),
            "max_unigram_count": pa.array(max_uni),
            "n_bigrams": pa.array(n_bi),
            "max_bigram_count": pa.array(max_bi),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


# ---------------- PII detection / redaction ----------------

# RE2-compatible patterns (no lookaround/backrefs) so Python re and the
# DuckDB oracle's regexp functions agree byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
}


def pii_signals(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Count and redact PII spans (email / IPv4 / phone) per document.
    Patterns are compiled once per actor; redaction replaces each span
    with ``<TYPE>`` in pattern-dict order. Returns doc_id + per-type
    counts + the redacted text's length (the full redacted text is the
    write-path payload; the entry keeps the length so the gate hash
    stays compact)."""

    class Pii:
        def __init__(self):
            self.pats = [(name, re.compile(p)) for name, p in PII_PATTERNS.items()]

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pylist()
            n = len(texts)
            counts = {name: np.zeros(n, np.int64) for name, _ in self.pats}
            red_len = np.zeros(n, np.int64)
            for i, s in enumerate(texts):
                s = s or ""
                for name, pat in self.pats:
                    s, k = pat.subn(f"<{name.upper()}>", s)
                    counts[name][i] = k
                red_len[i] = len(s)
            cols = {"doc_id": t.column("doc_id")}
            for name, _ in self.pats:
                cols[f"n_{name}"] = pa.array(counts[name])
            cols["redacted_len"] = pa.array(red_len)
            return pa.table(cols)

    return ds.map_batches(Pii, batch_format="pyarrow", concurrency=pool_size())


def pii_scan(sf_dir: str) -> ray.data.Dataset:
    """PII entry over the synthetic corpus. The fixture corpus contains
    no PII by construction, so the entry scans a deterministically
    augmented view (text + one email/IP/phone derived from doc_id — the
    SQL oracle derives the identical view), exercising match + redaction
    with non-zero counts while staying exactly reproducible."""

    def augment(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        texts = t.column("text").to_pylist()
        aug = [
            f"{s} contact u{d}@example.org ip 10.0.{d % 256}.{d % 100} tel 555-{d % 900 + 100:03d}-{d % 9000 + 1000:04d}"
            for d, s in zip(ids, texts)
        ]
        return pa.table({"doc_id": t.column("doc_id"), "text": pa.array(aug, pa.string())})

    ds = _read_docs(sf_dir).map_batches(augment, batch_format="pyarrow")
    return pii_signals(ds).sort("doc_id")


# ---------------- domain mixing (weighted sampling per source) ----------------

def _md5_upper64(s: str) -> int:
    """int.from_bytes(md5[:8], 'little') — DuckDB's md5_number_upper
    (the convention pinned by the simhash oracle)."""
    import hashlib
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def mix_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic domain-mixing sample: each source gets a sampling
    rate in [20, 80]% derived from md5(source), and a doc is kept when
    md5(doc_id) lands under its source's rate — the hash-based Bernoulli
    both systems can compute exactly (no RNG state, no shuffle; one
    stateless map over the corpus, so re-runs and resumes select the
    same rows at any scale)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        srcs = t.column("source").to_pylist()
        keep = np.zeros(len(ids), bool)
        rates = np.zeros(len(ids), np.int64)
        for i, (d, s) in enumerate(zip(ids, srcs)):
            rate = 20 + _md5_upper64(s) % 61
            rates[i] = rate
            keep[i] = (_md5_upper64(str(int(d))) % 100) < rate
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "source": pa.array([s for s, k in zip(srcs, keep) if k], pa.string()),
            "rate_pct": pa.array(rates[keep]),
        })

    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow").sort("doc_id")


# ---------------- sequence packing (concat-and-chunk) ----------------

def chunk_documents(sf_dir: str, chunk_tokens: int = 64,
                    overlap: int = 16) -> ray.data.Dataset:
    """RAG/embedding-style sliding-window chunking (the complement of
    pack_concat_chunks' cross-doc packing): split each document into
    ``chunk_tokens``-token windows with ``overlap`` tokens of context
    carried between consecutive chunks (stride = chunk_tokens - overlap);
    the final window may be short but is never empty, and a doc shorter
    than one window yields exactly one chunk. Emits (doc_id, chunk_idx,
    start_tok, n_tok, chunk_text). Stateless per-doc pass — zero
    shuffle; chunk boundaries are deterministic functions of the token
    count, so the SQL oracle replicates them with integer arithmetic."""
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap

    def chunks(t: pa.Table) -> pa.Table:
        ids, cidx, starts, ntoks, texts = [], [], [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = _tokens(s)
            if not toks:
                continue
            j = 0
            i = 0
            while True:
                window = toks[j:j + chunk_tokens]
                ids.append(int(d))
                cidx.append(i)
                starts.append(j)
                ntoks.append(len(window))
                texts.append(" ".join(window))
                if j + chunk_tokens >= len(toks):
                    break
                j += stride
                i += 1
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_idx": pa.array(cidx, pa.int64()),
                         "start_tok": pa.array(starts, pa.int64()),
                         "n_tok": pa.array(ntoks, pa.int64()),
                         "chunk_text": pa.array(texts, pa.string())})

    return (
        _read_docs(sf_dir)
        .map_batches(chunks, batch_format="pyarrow")
        .sort(["doc_id", "chunk_idx"])
    )


def pack_concat_chunks(sf_dir: str, budget: int = 256, bucket_docs: int = 128) -> ray.data.Dataset:
    """GPT-style sequence packing: concatenate documents in doc_id order
    and cut fixed ``budget``-token chunks; emit each doc's (chunk_id,
    offset_in_chunk, n_chunks_spanned). The global token prefix sum runs
    as a TWO-LEVEL distributed prefix sum (the build pipeline's docID-
    assignment shape): a tiny per-bucket totals pass -> driver holds only
    per-bucket bases (n_docs/bucket_docs rows) -> broadcast bases +
    within-bucket cumsum in the data plane. Nothing corpus-sized ever
    sits on the driver."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        n = ws_token_counts(t.column("text"))
        return pa.table({"doc_id": pa.array(ids), "bucket": pa.array(ids // bucket_docs),
                         "n_tokens": pa.array(n)})

    tok = ds.map_batches(counts, batch_format="pyarrow").materialize()
    # level 1: per-bucket totals (driver holds #buckets rows only)
    totals = tok.groupby("bucket").aggregate(Sum("n_tokens", alias_name="tot")).to_pandas()
    totals = totals.sort_values("bucket")
    bases = np.concatenate([[0], totals["tot"].to_numpy().astype(np.int64).cumsum()])[:-1]
    bucket_ids = totals["bucket"].to_numpy().astype(np.int64)
    base_ref = ray.put((bucket_ids, bases))

    def within(g) -> pa.Table:
        # one bucket per group: docs sorted by doc_id, within-bucket cumsum
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy().astype(np.int64)
        n = g["n_tokens"].to_numpy().astype(np.int64)
        bks, bs = ray.get(base_ref)
        base = int(bs[np.searchsorted(bks, int(g["bucket"].iloc[0]))])
        start = base + np.concatenate([[0], n.cumsum()])[:-1]
        chunk = start // budget
        off = start % budget
        spanned = np.where(n > 0, (start + n - 1) // budget - chunk + 1, 1)
        return pa.table({"doc_id": pa.array(ids), "chunk_id": pa.array(chunk),
                         "offset_in_chunk": pa.array(off),
                         "n_chunks_spanned": pa.array(spanned.astype(np.int64))})

    return (
        tok.groupby("bucket")
        .map_groups(within, batch_format="pandas")
        .sort("doc_id")
    )


def token_budget_select(sf_dir: str, budget: int = 600,
                        bucket_docs: int = 128) -> ray.data.Dataset:
    """Token-budget domain mixing: keep each source's documents in
    doc_id order until the source's cumulative whitespace-token count
    (inclusive) exceeds ``budget`` — the "sample N tokens per domain"
    step of training-mix construction (the data-budget counterpart of
    the hash-Bernoulli domain mixer). Runs as the pack_concat_chunks
    two-level distributed prefix sum keyed by (source, doc_id-bucket):
    per-(source, bucket) totals -> driver holds only source x bucket
    base rows -> broadcast bases (numpy arrays + searchsorted, not a
    dict) + within-bucket inclusive cumsum in the data plane."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "source"])

    def counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        n = ws_token_counts(t.column("text"))
        return pa.table({"doc_id": pa.array(ids),
                         "source": t.column("source"),
                         "bucket": pa.array(ids // bucket_docs),
                         "n_tokens": pa.array(n)})

    tok = ds.map_batches(counts, batch_format="pyarrow").materialize()
    totals = (tok.groupby(["source", "bucket"])
              .aggregate(Sum("n_tokens", alias_name="tot")).to_pandas())
    totals = totals.sort_values(["source", "bucket"]).reset_index(drop=True)
    # per-source exclusive prefix over its bucket totals
    bases = (totals.groupby("source")["tot"].cumsum()
             - totals["tot"]).to_numpy().astype(np.int64)
    srcs_sorted = sorted(totals["source"].unique())
    src_idx = {s: i for i, s in enumerate(srcs_sorted)}
    keys = (totals["source"].map(src_idx).to_numpy().astype(np.int64) * (1 << 32)
            + totals["bucket"].to_numpy().astype(np.int64))
    order = np.argsort(keys)
    base_ref = ray.put((keys[order], bases[order], tuple(srcs_sorted)))

    def within(g) -> pa.Table:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy().astype(np.int64)
        n = g["n_tokens"].to_numpy().astype(np.int64)
        ks, bs, srcs = ray.get(base_ref)
        import bisect
        si = bisect.bisect_left(srcs, str(g["source"].iloc[0]))
        key = si * (1 << 32) + int(g["bucket"].iloc[0])
        base = int(bs[np.searchsorted(ks, key)])
        cum_inc = base + n.cumsum()
        keep = cum_inc <= budget
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "source": pa.array(g["source"].to_numpy()[keep].astype(str), pa.string()),
            "cum_tokens": pa.array(cum_inc[keep].astype(np.int64)),
        })

    return (
        tok.groupby(["source", "bucket"])
        .map_groups(within, batch_format="pandas")
        .sort("doc_id")
    )


# ---------------- exact substring-duplication exposure ----------------

def dup_gram_exposure(sf_dir: str, ngram: int = 8) -> ray.data.Dataset:
    """Exact substring-duplication signal (the published train-set dedup
    protocol of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": find substrings of >= N tokens repeated
    across documents). Per doc: the number of its DISTINCT word
    ``ngram``-grams, how many of those also occur in ANOTHER document,
    and the flag a removal pass would key on.

    Scale shape — JOIN-FREE (union + groupby only): docs emit
    (gram-hash, doc_id) rows DISTINCT per doc (the md5-upper64 hash,
    8 bytes, never the gram string). A gram with corpus df == 1 has
    exactly one owner = Min(doc_id) of its group, so per-doc
    n_dup_grams = n_grams - (count of df==1 grams it owns): two
    groupbys and a doc-level union replace the hash join back to the
    exploded rows (one fewer corpus-sized shuffle, and it sidesteps the
    Ray 2.49 hash-shuffle join crash when a join partition receives
    zero right-side rows). The oracle groups the gram STRINGS
    (collision-free reference) — a 64-bit collision at gate scale would
    fail the gate loudly."""
    from ray.data.aggregate import Count, Min, Sum

    class Explode:
        def __call__(self, t: pa.Table) -> pa.Table:
            import hashlib
            ids_out, hs = [], []
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                toks = _tokens(s)
                gs = {" ".join(toks[j:j + ngram]) for j in range(len(toks) - ngram + 1)}
                for g in gs:
                    hs.append(int.from_bytes(hashlib.md5(g.encode()).digest()[:8],
                                             "little") - (1 << 63))
                ids_out.extend([int(d)] * len(gs))
            return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                             "h": pa.array(hs, pa.int64())})

    ex = _read_docs(sf_dir).map_batches(Explode, batch_format="pyarrow",
                                        concurrency=pool_size())
    per_doc = ex.groupby("doc_id").aggregate(Count(alias_name="n_grams"))
    dfh = ex.groupby("h").aggregate(Count(alias_name="cnt"),
                                    Min("doc_id", alias_name="owner"))

    def uniq_owners(t: pa.Table) -> pa.Table:
        m = pa.compute.equal(t.column("cnt"), 1)
        return pa.table({"doc_id": t.filter(m).column("owner")})

    n_uniq = (
        dfh.map_batches(uniq_owners, batch_format="pyarrow")
        .groupby("doc_id").aggregate(Count(alias_name="n_uniq"))
    )

    def a_side(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_grams": t.column("n_grams"), "n_uniq": z})

    def b_side(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_grams": z, "n_uniq": t.column("n_uniq")})

    def finish(t: pa.Table) -> pa.Table:
        ng = t.column("n_grams").to_numpy()
        nd = ng - t.column("n_uniq").to_numpy()
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_grams": pa.array(ng.astype(np.int64)),
                         "n_dup_grams": pa.array(nd.astype(np.int64)),
                         "dup_flag": pa.array((nd > 0).astype(np.int64))})

    return (
        per_doc.map_batches(a_side, batch_format="pyarrow")
        .union(n_uniq.map_batches(b_side, batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(Sum("n_grams", alias_name="n_grams"),
                   Sum("n_uniq", alias_name="n_uniq"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("doc_id")
    )


def exact_substring_remove(sf_dir: str, ngram: int = 8) -> ray.data.Dataset:
    """Exact-substring span REMOVAL — the removal half of the Lee et al.
    2021 ExactSubstr protocol at word-ngram granularity (the suffix-array
    char threshold becomes a token ``ngram``; ``dup_gram_exposure`` is
    the matching FLAG pass). A token is removed when it is covered by
    any word ngram-gram that also occurs in at least one OTHER document;
    the output is the cleaned text plus removal counts.

    Scale shape: pass 1 = the dup_gram_exposure exchange (distinct
    (gram-hash, doc_id) rows, 8-byte hashes only) -> groupby count; the
    cross-doc-duplicated hash set is duplicate-sized, broadcast once via
    ray.put as a sorted numpy array. Pass 2 re-streams the corpus once,
    marks covered token ranges per doc with a vectorized diff/cumsum
    sweep, and rebuilds the text. At 100 TB the broadcast set becomes a
    partitioned hash-range sweep or a Bloom filter + exact audit of
    flagged docs (the decontaminate_ngram note applies verbatim)."""
    import hashlib

    from ray.data.aggregate import Count

    class Explode:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids_out, hs = [], []
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                toks = _tokens(s)
                gs = {" ".join(toks[j:j + ngram]) for j in range(len(toks) - ngram + 1)}
                for g in gs:
                    hs.append(int.from_bytes(hashlib.md5(g.encode()).digest()[:8],
                                             "little") - (1 << 63))
                ids_out.extend([int(d)] * len(gs))
            return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                             "h": pa.array(hs, pa.int64())})

    dup_rows = (
        _read_docs(sf_dir).map_batches(Explode, batch_format="pyarrow",
                                       concurrency=pool_size())
        .groupby("h").aggregate(Count(alias_name="n_docs"))
        .filter(expr="n_docs >= 2")
        .select_columns(["h"])
        .to_pandas()
    )
    dup_ref = ray.put(np.sort(dup_rows["h"].to_numpy().astype(np.int64)))

    class Remove:
        def __init__(self):
            self.dup = ray.get(dup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, n_tok, n_rm, texts = [], [], [], []
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                toks = _tokens(s)
                n = len(toks)
                covered = np.zeros(n + 1, np.int64)  # diff array
                for j in range(n - ngram + 1):
                    h = int.from_bytes(
                        hashlib.md5(" ".join(toks[j:j + ngram]).encode()).digest()[:8],
                        "little") - (1 << 63)
                    p = np.searchsorted(self.dup, h)
                    if p < len(self.dup) and self.dup[p] == h:
                        covered[j] += 1
                        covered[min(j + ngram, n)] -= 1
                cov = np.cumsum(covered[:n]) > 0
                kept = [tk for tk, c in zip(toks, cov) if not c]
                ids.append(int(d))
                n_tok.append(n)
                n_rm.append(int(cov.sum()))
                texts.append(" ".join(kept))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_tokens": pa.array(n_tok, pa.int64()),
                             "n_removed": pa.array(n_rm, pa.int64()),
                             "clean_text": pa.array(texts, pa.string())})

    return (
        _read_docs(sf_dir)
        .map_batches(Remove, batch_format="pyarrow", concurrency=pool_size())
        .sort("doc_id")
    )


# ---------------- Gopher document-quality rules ----------------

# the Gopher "must contain >= 2 of these" stopword list (Rae et al. 2021 §A1.1)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(sf_dir: str) -> ray.data.Dataset:
    """The Gopher document-quality rule family (Rae et al. 2021, table A1)
    that ``repetition_signals`` does not cover: word-count bounds, mean
    word length bounds, alphabetic-word fraction, and the required-
    stopword rule. All signals are exact integers; the pass flag uses
    integer cross-multiplication (``3*n <= sum_len <= 10*n`` instead of a
    float mean) so the DuckDB oracle hashes identically.

    One stateless map_batches pass, no shuffle — the 100-TB shape is
    embarrassingly parallel."""

    class Flags:
        def __init__(self):
            self.stops = set(GOPHER_STOPS)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, nw, sl, na, ns, ok = [], [], [], [], [], []
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                toks = _tokens(s)
                n = len(toks)
                slen = sum(len(tk) for tk in toks)
                alpha = sum(1 for tk in toks if any(c.isalpha() for c in tk))
                stop_hits = len(self.stops.intersection(toks))
                passed = int(
                    50 <= n <= 100_000
                    and 3 * n <= slen <= 10 * n
                    and 10 * alpha >= 8 * n
                    and stop_hits >= 2
                )
                ids.append(int(d)); nw.append(n); sl.append(slen)
                na.append(alpha); ns.append(stop_hits); ok.append(passed)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "sum_word_len": pa.array(sl, pa.int64()),
                "n_alpha_words": pa.array(na, pa.int64()),
                "n_req_stopwords": pa.array(ns, pa.int64()),
                "pass_flag": pa.array(ok, pa.int64()),
            })

    return (
        _read_docs(sf_dir)
        .map_batches(Flags, batch_format="pyarrow", concurrency=pool_size())
        .sort("doc_id")
    )


# ---------------- line-level exact dedup (keep first occurrence) ----------------

def boilerplate_strip(sf_dir: str, line_tokens: int = 8,
                      min_df: int = 2) -> ray.data.Dataset:
    """RefinedWeb/CCNet-style frequent-line (boilerplate) removal —
    distinct from ``line_dedup_first``'s keep-one-copy: a line whose
    DOCUMENT FREQUENCY reaches ``min_df`` is boilerplate and EVERY
    occurrence is dropped; the doc's text is rebuilt from surviving
    lines in order. Lines = the corpus's deterministic
    ``line_tokens``-token segments (same view as line_dedup_first).

    Scale shape: pass 1 emits per-doc DISTINCT line hashes (8 bytes
    each) -> groupby count -> the hot set is boilerplate-sized and
    broadcasts once; pass 2 is one stateless rebuild pass, zero shuffle.
    Output: (doc_id, n_lines, n_dropped, clean_text)."""
    from ray.data.aggregate import Count

    def explode(t: pa.Table) -> pa.Table:
        ids_out, hs = [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            lines = set(_line_segments(_tokens(s), line_tokens))
            hs.extend(_line_hash(ln) for ln in lines)
            ids_out.extend([int(d)] * len(lines))
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "h": pa.array(hs, pa.int64())})

    df = (
        _read_docs(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("h").aggregate(Count(alias_name="df"))
        .to_pandas()
    )
    hot = np.sort(df.loc[df["df"].to_numpy() >= min_df, "h"].to_numpy().astype(np.int64))
    hot_ref = ray.put(hot)

    def rebuild(t: pa.Table, r=hot_ref) -> pa.Table:
        hot_s = ray.get(r)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        n_lines = np.zeros(len(ids), np.int64)
        n_drop = np.zeros(len(ids), np.int64)
        cleans = []
        for i, s in enumerate(t.column("text").to_pylist()):
            segs = _line_segments(_tokens(s), line_tokens)
            n_lines[i] = len(segs)
            kept = []
            for ln in segs:
                h = _line_hash(ln)
                pos = np.searchsorted(hot_s, h)
                if pos < len(hot_s) and hot_s[pos] == h:
                    n_drop[i] += 1
                else:
                    kept.append(ln)
            cleans.append(" ".join(kept))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_lines": pa.array(n_lines, pa.int64()),
                         "n_dropped": pa.array(n_drop, pa.int64()),
                         "clean_text": pa.array(cleans, pa.string())})

    return (
        _read_docs(sf_dir)
        .map_batches(rebuild, batch_format="pyarrow")
        .sort("doc_id")
    )


def line_dedup_first(sf_dir: str, line_tokens: int = 8) -> ray.data.Dataset:
    """C4/RefinedWeb-style exact line-level dedup: every duplicated line
    keeps exactly ONE copy corpus-wide — the occurrence in the lowest
    doc_id (first writer wins). The fixture corpus has no newlines, so a
    "line" is a deterministic non-overlapping ``line_tokens``-token
    segment (both engine and oracle derive the identical view; with real
    newline-delimited text the splitter is the only line that changes).

    Per doc: DISTINCT lines, lines kept after dedup. Scale shape —
    JOIN-FREE: one corpus pass emits (line-hash, doc_id) rows distinct
    per doc; groupby Min(doc_id) elects each line's keeper; counting
    keepers per doc and unioning with per-doc line totals replaces the
    join back to the exploded rows (see dup_gram_exposure for why);
    only 8-byte hashes and doc-level ints shuffle."""
    from ray.data.aggregate import Count, Min, Sum

    class Explode:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids_out, hs = [], []
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                lines = set(_line_segments(_tokens(s), line_tokens))
                hs.extend(_line_hash(ln) for ln in lines)
                ids_out.extend([int(d)] * len(lines))
            return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                             "h": pa.array(hs, pa.int64())})

    ex = _read_docs(sf_dir).map_batches(Explode, batch_format="pyarrow",
                                        concurrency=pool_size())
    per_doc = ex.groupby("doc_id").aggregate(Count(alias_name="n_lines"))
    kept = (
        ex.groupby("h").aggregate(Min("doc_id", alias_name="keep_doc"))
        .map_batches(lambda t: pa.table({"doc_id": t.column("keep_doc")}),
                     batch_format="pyarrow")
        .groupby("doc_id").aggregate(Count(alias_name="n_kept"))
    )

    def a_side(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_lines": t.column("n_lines"), "n_kept": z})

    def b_side(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_lines": z, "n_kept": t.column("n_kept")})

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_lines": t.column("n_lines"),
                         "n_lines_kept": t.column("n_kept")})

    return (
        per_doc.map_batches(a_side, batch_format="pyarrow")
        .union(kept.map_batches(b_side, batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(Sum("n_lines", alias_name="n_lines"),
                   Sum("n_kept", alias_name="n_kept"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("doc_id")
    )


# ---------------- DSIR importance selection ----------------

def dsir_select_topk(sf_dir: str, target_source: str = "src0",
                     n_buckets: int = 2048, k: int = 200) -> pa.Table:
    """Data Selection via Importance Resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every non-target document by how target-like its hashed-bigram
    distribution is, and keep the top-k. The published estimator —
    log w(x) = sum over bigram occurrences of
    ln(p_target[bucket]) - ln(p_raw[bucket]), bag-of-hashed-ngrams with
    Laplace (+1) smoothing, raw = the whole corpus — with one change
    for the oracle gate: per-bucket log-ratios quantize to micro-nats
    (FLOOR(lr*1e6 + 0.5), the repo's exact-int convention) BEFORE the
    per-doc sum, so document weights are exact int64 (order-independent
    addition; float SUM ordering can never flip a rank).

    Scale shape: pass 1 streams the corpus once emitting per-batch
    nonzero (bucket, target_cnt, raw_cnt) partials -> bucket-sized
    groupby (≤ n_buckets x batches rows); the log-ratio table
    (n_buckets int64, ~16 KB) broadcasts via ray.put; pass 2 streams
    once more, each batch emitting its local top-k -> output-sized
    driver merge. Bucket hash = md5-upper64 % n_buckets (the
    md5_number_upper SQL convention)."""
    def _buckets(s: str) -> np.ndarray:
        toks = _tokens(s)
        return np.array([_md5_bucket(f"{a} {b}", n_buckets)
                         for a, b in zip(toks, toks[1:])], dtype=np.int64)

    def count_partials(t: pa.Table) -> pa.Table:
        tc = np.zeros(n_buckets, np.int64)
        rc = np.zeros(n_buckets, np.int64)
        for src, s in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
            bk = _buckets(s)
            if len(bk) == 0:
                continue
            np.add.at(rc, bk, 1)
            if src == target_source:
                np.add.at(tc, bk, 1)
        nz = np.flatnonzero(rc)
        return pa.table({"bkt": pa.array(nz, pa.int64()),
                         "t_cnt": pa.array(tc[nz], pa.int64()),
                         "r_cnt": pa.array(rc[nz], pa.int64())})

    # driver combine of the per-batch partials (<= n_buckets x batches
    # int rows, KBs) — a bucket groupby's shuffle costs more than the
    # data is worth (the conv-stats lesson); integer sums are exact in
    # any order
    parts = (
        _read_docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(count_partials, batch_format="pyarrow")
        .to_pandas()
    )
    tc = np.zeros(n_buckets, np.int64)
    rc = np.zeros(n_buckets, np.int64)
    np.add.at(tc, parts["bkt"].to_numpy(), parts["t_cnt"].to_numpy())
    np.add.at(rc, parts["bkt"].to_numpy(), parts["r_cnt"].to_numpy())
    t_tot, r_tot = int(tc.sum()), int(rc.sum())
    lr = (np.log((tc + 1.0) / (t_tot + float(n_buckets)))
          - np.log((rc + 1.0) / (r_tot + float(n_buckets))))
    lr_int = np.floor(lr * 1e6 + 0.5).astype(np.int64)
    lr_ref = ray.put(lr_int)

    def score_partials(t: pa.Table, lr_r=lr_ref) -> pa.Table:
        lr = ray.get(lr_r)  # plasma-shared: free after the first batch
        ids, ws = [], []
        for d, src, s in zip(t.column("doc_id").to_pylist(),
                             t.column("source").to_pylist(),
                             t.column("text").to_pylist()):
            if src == target_source:
                continue
            bk = _buckets(s)
            ids.append(int(d))
            ws.append(int(lr[bk].sum()) if len(bk) else 0)
        ids_a, ws_a = np.array(ids, np.int64), np.array(ws, np.int64)
        if len(ids_a) > k:
            top = np.lexsort((ids_a, -ws_a))[:k]
            ids_a, ws_a = ids_a[top], ws_a[top]
        return pa.table({"doc_id": pa.array(ids_a, pa.int64()),
                         "w_micro": pa.array(ws_a, pa.int64())})

    partials = (
        _read_docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(score_partials, batch_format="pyarrow")
        .to_pandas()
    )
    ids = partials["doc_id"].to_numpy()
    ws = partials["w_micro"].to_numpy()
    top = np.lexsort((ids, -ws))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(ids[top], pa.int64()),
        "w_micro": pa.array(ws[top], pa.int64()),
    })


# ---------------- CCNet-style LM quality scoring ----------------

def lm_quality_scores(sf_dir: str, lm_source: str = "src0",
                      n_buckets: int = 4096,
                      head_micro: int = 7_500_000,
                      tail_micro: int = 8_500_000) -> ray.data.Dataset:
    """CCNet-protocol quality scoring (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    score every document by its cross-entropy under a language model
    trained on a trusted subset, then band into head/middle/tail. The
    LM here is a hashed-unigram model over the ``lm_source`` documents
    (CCNet uses a KenLM 5-gram — no model artifacts exist in this
    container, and the banding/dataflow is identical): per-token
    logprob = ln((c[bucket]+1)/(total+B)), quantized to micro-nats
    (int64) BEFORE summation, so per-doc cross-entropies are exact
    integers. Band cuts are fixed micro-nat-per-token thresholds
    (deterministic; CCNet's corpus-quantile cuts would need one extra
    output-sized pass).

    Scale shape: pass 1 = per-batch bucket-count partials over the
    trusted subset only -> bucket-sized groupby; the 32 KB int table
    broadcasts once; pass 2 = one stateless corpus pass, no shuffle."""
    def _bk(toks: list[str]) -> np.ndarray:
        return np.array([_md5_bucket(w, n_buckets) for w in toks], dtype=np.int64)

    def count_partials(t: pa.Table) -> pa.Table:
        c = np.zeros(n_buckets, np.int64)
        for src, s in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
            if src != lm_source:
                continue
            bk = _bk(_tokens(s))
            if len(bk):
                np.add.at(c, bk, 1)
        nz = np.flatnonzero(c)
        return pa.table({"bkt": pa.array(nz, pa.int64()),
                         "c": pa.array(c[nz], pa.int64())})

    # driver combine of bucket-count partials (KBs) — see dsir_select_topk
    parts = (
        _read_docs(sf_dir, columns=("text", "source"))
        .map_batches(count_partials, batch_format="pyarrow")
        .to_pandas()
    )
    c = np.zeros(n_buckets, np.int64)
    np.add.at(c, parts["bkt"].to_numpy(), parts["c"].to_numpy())
    tot = int(c.sum())
    # negative log-prob per bucket, micro-nats (positive ints)
    nlp = np.floor(-np.log((c + 1.0) / (tot + float(n_buckets))) * 1e6 + 0.5).astype(np.int64)
    nlp_ref = ray.put(nlp)

    def score(t: pa.Table, nlp_r=nlp_ref) -> pa.Table:
        nlp = ray.get(nlp_r)
        ids = t.column("doc_id").to_numpy()
        ce = np.zeros(len(ids), np.int64)
        nt = np.zeros(len(ids), np.int64)
        for i, s in enumerate(t.column("text").to_pylist()):
            bk = _bk(_tokens(s))
            nt[i] = len(bk)
            ce[i] = int(nlp[bk].sum()) if len(bk) else 0
        per_tok = np.where(nt > 0, ce // np.maximum(nt, 1), 0)
        band = np.where(per_tok <= head_micro, 0,
                        np.where(per_tok <= tail_micro, 1, 2)).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tok": pa.array(nt, pa.int64()),
                         "ce_micro": pa.array(ce, pa.int64()),
                         "band": pa.array(band, pa.int64())})

    return (
        _read_docs(sf_dir, columns=("doc_id", "text"))
        .map_batches(score, batch_format="pyarrow")
        .sort("doc_id")
    )


# ---------------- cleaned-corpus export (resumable partitioned write) ----------------

def clean_corpus_export(sf_dir: str, n_buckets: int = 8, min_tokens: int = 20,
                        top_frac_pct: int = 30, out_dir: str | None = None) -> pa.Table:
    """The end-to-end curation pipeline a pretraining run would
    materialize: quality-filter (min length + Gopher top-unigram-
    fraction rule, exact-integer comparison), exact-dedup keep-first,
    and WRITE the surviving rows as hive-partitioned parquet
    (bucket = doc_id % n_buckets, one directory per bucket) — the
    resumable-output shape: each finished bucket gets a done marker,
    and a re-run after a partial failure rebuilds ONLY the buckets
    whose markers are missing (the rebuild pass pushes a bucket
    predicate into the scan). Returns per-bucket counts read back from
    the WRITTEN files, so the gate verifies the export itself.

    Scale shape: one corpus pass for signals (stateless), one
    signature-keyed shuffle for keep-first (full rows ride the shuffle
    — they must reach the writer anyway), partitioned write. Filter
    order is pinned: quality first, then dedup among survivors."""
    import glob as _glob
    import hashlib
    import os as _os

    import pyarrow.dataset as pads

    src = _os.path.join(sf_dir, "documents.parquet")
    if out_dir is None:
        key = hashlib.sha1(
            f"{_os.path.abspath(src)}|{_os.path.getmtime(src)}|{n_buckets}|"
            f"{min_tokens}|{top_frac_pct}|v1".encode()).hexdigest()[:16]
        out_dir = _os.path.join("/tmp/lsr_cache", f"clean-corpus-{key}")
    _os.makedirs(out_dir, exist_ok=True)

    missing = [b for b in range(n_buckets)
               if not _os.path.exists(_os.path.join(out_dir, f".done-{b}"))]
    if missing:
        def signals(t: pa.Table) -> pa.Table:
            keep, sigs, buckets = [], [], []
            from collections import Counter
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                toks = _tokens(s)
                n = len(toks)
                top = max(Counter(toks).values(), default=0)
                ok = n >= min_tokens and top * 100 <= n * top_frac_pct
                keep.append(ok)
                sigs.append(hashlib.md5((s or "").encode("utf-8")).hexdigest())
                buckets.append(int(d) % n_buckets)
            out = t.append_column("sig", pa.array(sigs, pa.string()))
            out = out.append_column("bucket", pa.array(buckets, pa.int64()))
            return out.filter(pa.array(keep))

        def keep_first(g: pa.Table) -> pa.Table:
            i = pa.compute.index(g.column("doc_id"),
                                 pa.compute.min(g.column("doc_id")))
            return g.take([i.as_py()]).drop_columns(["sig"])

        ds = (
            read_parquet_clean(src)
            .map_batches(signals, batch_format="pyarrow")
        )
        if len(missing) < n_buckets:  # partial resume: only missing buckets
            mset = set(missing)
            ds = ds.filter(lambda r: r["doc_id"] % n_buckets in mset)
        (
            ds.groupby("sig")
            .map_groups(keep_first, batch_format="pyarrow")
            .write_parquet(out_dir, partition_cols=["bucket"])
        )
        for b in missing:
            open(_os.path.join(out_dir, f".done-{b}"), "w").close()

    rows = []
    for b in range(n_buckets):
        part = _os.path.join(out_dir, f"bucket={b}")
        n = (pads.dataset(part, format="parquet").count_rows()
             if _glob.glob(_os.path.join(part, "*.parquet")) else 0)
        rows.append({"bucket": b, "n_docs": n})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("bucket", pa.int64()), ("n_docs", pa.int64())]))


def quality_logit_select(sf_dir: str, k: int = 100) -> pa.Table:
    """Classifier-based quality selection (the GPT-3 appendix-A /
    CCNet-style 'keep documents a linear quality model scores highly'
    pass), with a FIXED-weight linear model over exact-integer features
    so the score is deterministic and the SQL oracle hashes identically:

        logit_milli = 50*distinct_unigrams + 20*stopword_hits
                      - 30*top_unigram_count - n_chars // 10

    (rewards vocabulary diversity and natural-language function words,
    penalizes repetition and raw length — the standard signal directions.)
    One stateless pass emits per-batch top-k partials (O(batches*k)
    exchange); the driver merge is output-sized. Top-k by (logit desc,
    doc_id asc)."""

    class Score:
        def __init__(self):
            self.stops = set(GOPHER_STOPS)

        def __call__(self, t: pa.Table) -> pa.Table:
            from collections import Counter

            ids, logits = [], []
            for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
                toks = _tokens(s)
                c = Counter(toks)
                distinct = len(c)
                top = max(c.values()) if c else 0
                stop_hits = len(self.stops.intersection(toks))
                logit = (50 * distinct + 20 * stop_hits - 30 * top
                         - len(s or "") // 10)
                ids.append(int(d))
                logits.append(int(logit))
            ids_a = np.asarray(ids, np.int64)
            lg = np.asarray(logits, np.int64)
            order = np.lexsort((ids_a, -lg))[:k]  # per-batch partial top-k
            return pa.table({"doc_id": pa.array(ids_a[order]),
                             "logit_milli": pa.array(lg[order])})

    parts = (
        _read_docs(sf_dir)
        .map_batches(Score, batch_format="pyarrow", concurrency=pool_size())
        .to_pandas()
    )
    order = np.lexsort((parts["doc_id"].to_numpy(), -parts["logit_milli"].to_numpy()))[:k]
    out = parts.iloc[order].reset_index(drop=True)
    return pa.table({
        "rank": pa.array(np.arange(len(out), dtype=np.int64)),
        "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
        "logit_milli": pa.array(out["logit_milli"].to_numpy(), pa.int64()),
    })


def train_val_test_split(sf_dir: str, train_pct: int = 90,
                         val_pct: int = 5) -> pa.Table:
    """Deterministic hash split for training-data export: every doc is
    assigned train/val/test by md5(doc_id) % 100 (< train_pct -> train,
    < train_pct+val_pct -> val, else test) — stable across runs,
    machines and partitionings, so a re-export never leaks val/test docs
    into train. Output: per (source, split) doc counts, the stratified
    audit table a release pipeline publishes beside the split.

    Shape: stateless per-batch assignment + map-side Counter partials,
    one (source, split)-sized groupby — zero corpus-sized state. The
    md5 convention matches DuckDB's md5_number_upper (little-endian
    first 8 bytes, unsigned), so the oracle is the identical SQL."""
    import hashlib

    from collections import Counter

    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        srcs = t.column("source").to_pylist()
        c: Counter = Counter()
        for d, s in zip(ids, srcs):
            b = int.from_bytes(
                hashlib.md5(str(int(d)).encode()).digest()[:8], "little") % 100
            split = ("train" if b < train_pct
                     else "val" if b < train_pct + val_pct else "test")
            c[(s, split)] += 1
        ks = list(c)
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "split": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64()),
        })

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["source", "split"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
        .sort_values(["source", "split"])
        .reset_index(drop=True)
    )
    return pa.table({
        "source": pa.array(out["source"].astype(str), pa.string()),
        "split": pa.array(out["split"].astype(str), pa.string()),
        "n_docs": pa.array(out["n_docs"].astype(np.int64), pa.int64()),
    })


def split_leakage_audit(sf_dir: str, prefix_tokens: int = 10,
                        train_pct: int = 90, val_pct: int = 5) -> pa.Table:
    """Eval-hygiene audit: count near-dup pairs that STRADDLE the
    train/val/test boundary — hash-split assignment alone cannot prevent
    a near-duplicate of a test doc landing in train, so release
    pipelines publish exactly this table (pairs per split-pair class)
    and gate on the cross-split rows. Near-dup relation: shared
    content-prefix fingerprint (the dedup_incremental signature);
    splits: the train_val_test_split md5 assignment.

    Shape: one signature-keyed shuffle co-locates each signature's
    docs; the grouped emit counts unordered split-pair combinations
    in-plane (C(n,2) per group via per-split counts — no pair
    materialization), then a tiny (split_a, split_b) groupby."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        prefixes = [" ".join((s or "").split()[:prefix_tokens])
                    for s in t.column("text").to_pylist()]
        splits = []
        for d in ids:
            b = int.from_bytes(
                hashlib.md5(str(int(d)).encode()).digest()[:8], "little") % 100
            splits.append("train" if b < train_pct
                          else "val" if b < train_pct + val_pct else "test")
        return pa.table({"sig": pa.array(prefixes, pa.string()),
                         "split": pa.array(splits, pa.string())})

    def pair_counts(g: pa.Table) -> pa.Table:
        splits = g.column("split").to_pylist()
        from collections import Counter

        c = Counter(splits)
        names = sorted(c)
        out_a, out_b, out_n = [], [], []
        for i, a in enumerate(names):
            for b in names[i:]:
                n = (c[a] * (c[a] - 1) // 2) if a == b else c[a] * c[b]
                if n:
                    out_a.append(a)
                    out_b.append(b)
                    out_n.append(n)
        return pa.table({"split_a": pa.array(out_a, pa.string()),
                         "split_b": pa.array(out_b, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    out = (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby("sig")
        .map_groups(pair_counts, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .aggregate(Sum("n", alias_name="n_pairs"))
        .to_pandas()
        .sort_values(["split_a", "split_b"])
        .reset_index(drop=True)
    )
    return pa.table({
        "split_a": pa.array(out["split_a"].astype(str), pa.string()),
        "split_b": pa.array(out["split_b"].astype(str), pa.string()),
        "n_pairs": pa.array(out["n_pairs"].astype(np.int64), pa.int64()),
    })
