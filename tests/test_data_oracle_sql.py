"""Measured exactness bounds backing the data_oracle.py SQL oracles.

Each oracle's docstring claims a concrete argument for why float effects
cannot flip the hashed output; this file MEASURES those claims on the
real testdata so the claims can't silently rot:

- rolling_fingerprint / simhash / stemmed: corpus is pure ASCII, so
  DuckDB codepoint arithmetic == the engine's UTF-8 byte arithmetic.
- simhash: DuckDB md5_number_upper(t) == int.from_bytes(md5(t)[:8],
  'little') — the engine's feature hash.
- nb_classify: min argmax margin across all docs is >> the ~1e-12
  float-sum association gap between engine and SQL.
- hll_distinct: the linear-counting branch's floor(x+0.5) input is far
  from an integer boundary (the raw-range branch is integer-exact).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corpus_is_pure_ascii(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    for s in t.column("text").to_pylist():
        assert s is not None and s.isascii(), "oracle byte==codepoint assumption broken"


def test_md5_number_upper_matches_engine_feature_hash():
    con = duckdb.connect()
    terms = ["vector", "stream", "the", "a_b", "Hello", "0", ""]
    for term in terms:
        (got,) = con.sql("SELECT CAST(md5_number_upper(?) AS HUGEINT)", params=[term]).fetchone()
        want = int.from_bytes(hashlib.md5(term.encode()).digest()[:8], "little")
        assert int(got) == want, term
    con.close()


def test_nb_classify_argmax_margin(ray_session):
    """The SQL oracle re-sums float log-probs in a different order; both
    sides agree to ~1e-12 relative, so a margin floor of 1e-6 means the
    argmax label can never flip."""
    from lucene_solr_ray.functions.classify import train_naive_bayes
    from lucene_solr_ray.io_utils import read_parquet_clean

    sf_dir = SF_DIRS[1]
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    m = train_naive_bayes(ds)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    min_margin = math.inf
    vocab, log_cond, log_prior = m["vocab"], m["log_cond"], m["log_prior"]
    for s in t.column("text").to_pylist():
        toks = np.array([w for w in s.split() if w], dtype=str)
        scores = log_prior.copy()
        if len(toks):
            pos = np.searchsorted(vocab, toks)
            pos = np.clip(pos, 0, len(vocab) - 1)
            assert (vocab[pos] == toks).all(), "self-trained: every token known"
            scores = scores + log_cond[:, pos].sum(axis=1)
        top2 = np.sort(scores)[-2:]
        min_margin = min(min_margin, float(top2[1] - top2[0]))
    assert min_margin > 1e-6, f"measured NB argmax margin {min_margin}"


@pytest.mark.parametrize("sf_dir", SF_DIRS + ["/root/testdata/sf0.1"])
def test_hll_linear_counting_boundary_distance(sf_dir):
    from lucene_solr_ray.functions.sketches import _M, _hll_registers

    vals = (
        pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
        .column("user_id")
        .to_numpy()
        .astype(np.uint64)
    )
    regs = _hll_registers(vals)
    zeros = int((regs == 0).sum())
    if zeros == 0:
        return  # linear-counting branch unreachable: raw branch is integer-exact
    x = _M * math.log(_M / zeros) + 0.5
    dist = abs(x - round(x))
    assert dist > 1e-6, f"ln() output {x} too close to a floor boundary"


def test_rolling_fingerprint_matches_scalar_reference(ray_session):
    """The vectorized Mersenne-modmul path equals the direct big-int
    Horner evaluation (the pre-vectorization engine semantics)."""
    from lucene_solr_ray.functions.textstats import rolling_fingerprint

    sf_dir = SF_DIRS[0]
    got = rolling_fingerprint(sf_dir).to_pandas()
    mod, base, window = (1 << 61) - 1, 257, 8
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ref = {}
    for doc_id, s in zip(texts.column("doc_id").to_pylist(), texts.column("text").to_pylist()):
        b = s.encode()
        h = 0
        for ch in b:
            h = (h * base + ch) % mod
        if len(b) < window:
            ref[doc_id] = (h, h)
            continue
        best, wh, pw = mod, 0, pow(base, window - 1, mod)
        for j, ch in enumerate(b):
            if j >= window:
                wh = (wh - b[j - window] * pw) % mod
            wh = (wh * base + ch) % mod
            if j >= window - 1:
                best = min(best, wh)
        ref[doc_id] = (h, best)
    for row in got.itertuples():
        assert (row.fingerprint, row.min_window_hash) == ref[row.doc_id]
