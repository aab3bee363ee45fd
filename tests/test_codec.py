"""Codec conformance — the BasePostingsFormatTestCase analogue
(SURVEY.md §5.1): randomized posting sets must round-trip under full
decode, per-block decode, and skip-based advance; impacts must be true
upper bounds per block."""

import numpy as np
import pytest

from lucene_solr_ray.codec import POSTINGS_CODECS
from lucene_solr_ray.codec.norms import DECODED_TABLE, decode_dl, encode_dl
from lucene_solr_ray.codec.postings import BLOCK, For128Codec, PostingsCursor


def random_postings(rng, n, max_gap=1000, max_tf=1 << 12):
    gaps = rng.integers(1, max_gap, size=n)
    docids = np.cumsum(gaps) - 1
    tfs = rng.integers(1, max_tf, size=n)
    norms = rng.integers(0, 256, size=n)
    return docids.astype(np.int64), tfs.astype(np.int64), norms.astype(np.int64)


# ---------------- norms ----------------

def test_byte4_exact_small():
    dl = np.arange(16)
    assert np.array_equal(decode_dl(encode_dl(dl)), dl)


def test_byte4_representable_set():
    # FIXTURES.md §3: {0..15, 16,18,..,30, 32,36,..}
    rep = sorted(set(DECODED_TABLE.tolist()))
    assert rep[:16] == list(range(16))
    assert rep[16:20] == [16, 18, 20, 22]
    assert 33 not in rep and 36 in rep


def test_byte4_monotonic_and_lower_bound():
    dl = np.arange(0, 100000)
    enc = encode_dl(dl)
    assert np.all(np.diff(enc.astype(np.int64)) >= 0)  # order-preserving
    dec = decode_dl(enc)
    assert np.all(dec <= dl)  # truncation never rounds up
    # idempotent on representable values
    assert np.array_equal(decode_dl(encode_dl(dec)), dec)


# ---------------- postings round-trip ----------------

@pytest.mark.parametrize("codec_name", sorted(POSTINGS_CODECS))
@pytest.mark.parametrize("n", [0, 1, 5, BLOCK - 1, BLOCK, BLOCK + 1, 1000])
def test_roundtrip(codec_name, n):
    codec = POSTINGS_CODECS[codec_name]
    rng = np.random.default_rng(7 + n)
    docids, tfs, norms = random_postings(rng, n)
    blob = codec.encode(docids, tfs, norms)
    d, t, m = codec.decode(blob)
    assert np.array_equal(d, docids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(m, norms)


@pytest.mark.parametrize("codec_name", sorted(POSTINGS_CODECS))
def test_roundtrip_extreme_values(codec_name):
    codec = POSTINGS_CODECS[codec_name]
    docids = np.array([0, 1, 2, 2**31 - 2], dtype=np.int64)
    tfs = np.array([1, 2**20, 1, 3], dtype=np.int64)
    norms = np.array([0, 255, 7, 128], dtype=np.int64)
    d, t, m = codec.decode(codec.encode(docids, tfs, norms))
    assert np.array_equal(d, docids) and np.array_equal(t, tfs) and np.array_equal(m, norms)


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        For128Codec.encode([3, 3], [1, 1], [0, 0])
    with pytest.raises(ValueError):
        For128Codec.encode([1, 2], [0, 1], [0, 0])


# ---------------- cursor / skip / impacts ----------------

def test_cursor_blocks_and_advance():
    rng = np.random.default_rng(11)
    docids, tfs, norms = random_postings(rng, 5000, max_gap=50)
    cur = PostingsCursor(For128Codec.encode(docids, tfs, norms))
    assert cur.n_docs == 5000
    # block-wise reassembly
    parts = [cur.block(b) for b in range(cur.n_blocks)]
    assert np.array_equal(np.concatenate([p[0] for p in parts]), docids)
    # advance: first block containing docid >= target
    for target in [0, 1, int(docids[137]), int(docids[-1]), int(docids[-1]) + 1]:
        b = cur.first_block_at_or_after(target)
        if target > docids[-1]:
            assert b == cur.n_blocks
        else:
            bd = cur.block(b)[0]
            assert bd[-1] >= target
            if b > 0:
                assert cur.skip["last_docid"][b - 1] < target


def test_impacts_are_true_bounds():
    rng = np.random.default_rng(13)
    docids, tfs, norms = random_postings(rng, 3000)
    cur = PostingsCursor(For128Codec.encode(docids, tfs, norms))
    for b in range(cur.n_blocks):
        _, t, m = cur.block(b)
        assert t.max() == cur.skip["max_tf"][b]
        assert m.min() == cur.skip["min_norm"][b]


def test_compression_is_compact():
    # dense small-gap postings must beat 4 bytes/doc plus skip overhead
    n = 100_000
    docids = np.arange(n, dtype=np.int64) * 3
    tfs = np.ones(n, dtype=np.int64)
    norms = np.full(n, 17, dtype=np.int64)
    blob = For128Codec.encode(docids, tfs, norms)
    assert len(blob) < n * 1.0  # ~2 bits/doc deltas + 16B/128-doc skip
