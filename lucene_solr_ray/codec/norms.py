"""byte4 norm encoding — Lucene ``SmallFloat.intToByte4`` semantics.

Reference: [U] lucene/core/.../util/SmallFloat.java (used by
BM25Similarity for per-doc field length). Semantics pinned in
FIXTURES.md §3: exact for dl in 0..15, truncated to 4 significant bits
above (representable: 16,18,..,30, 32,36,..). Encoding is monotonic
(order-preserving), which the per-block ``min_norm`` impact upper bounds
rely on (codec/postings.py).
"""

from __future__ import annotations

import numpy as np

_POW2 = (1 << np.arange(32, dtype=np.int64))


def encode_dl(dl) -> np.ndarray:
    """Vectorized intToByte4: int64 array of doc lengths -> uint8 norms."""
    dl = np.asarray(dl, dtype=np.int64)
    if np.any(dl < 0):
        raise ValueError("doc length must be >= 0")
    # bit_length(x) = k  iff  2^(k-1) <= x < 2^k ; exact integer comparison.
    num_bits = np.searchsorted(_POW2, dl, side="right").astype(np.int64)
    small = num_bits < 4
    shift = num_bits - 4
    b = np.where(
        small,
        dl,
        ((dl >> np.maximum(shift, 0)) & 0x07) | ((shift + 1) << 3),
    )
    return b.astype(np.uint8)


def decode_dl(b) -> np.ndarray:
    """Vectorized byte4ToInt: uint8 norms -> int64 decoded lengths dl'."""
    b = np.asarray(b, dtype=np.int64)
    bits = b & 0x07
    shift = (b >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0)).astype(np.int64)


# 256-entry decoded-length table (BM25Similarity precomputes per-norm
# denominators from exactly this; similarity.py consumes it).
DECODED_TABLE = decode_dl(np.arange(256))
