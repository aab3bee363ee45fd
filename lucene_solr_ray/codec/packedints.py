"""Packed int sequences — the positions store (.pos analogue,
[U] lucene/core/.../codecs/lucene84/Lucene84PostingsWriter.java writes
positions in the same FOR-packed blocks-of-128 shape).

A term's positions are stored as one packed sequence: for posting j
(docid-ordered), its ``tf_j`` position values occupy the slice
``[cumsum(tf)[j-1], cumsum(tf)[j])`` — random access per posting needs
only the tf prefix sums the caller already has. Values are absolute
within-document token positions (small ints), packed in 128-value
blocks with a per-block bit width.

Layout (little-endian)::

    u32 n_values; u32 n_blocks
    per block: u32 end_off; u8 width; u8[3] pad
    data: packed blocks
"""

from __future__ import annotations

import numpy as np

from lucene_solr_ray.codec.postings import _pack, _unpack, _width

BLOCK = 128

_TBL = np.dtype([("end_off", "<u4"), ("width", "u1"), ("pad", "u1", 3)])
assert _TBL.itemsize == 8


def encode_ints(vals) -> bytes:
    vals = np.asarray(vals, dtype=np.int64)
    n = len(vals)
    if n == 0:
        return np.array([0, 0], dtype="<u4").tobytes()
    if vals.min() < 0:
        raise ValueError("packed ints must be >= 0")
    n_blocks = (n + BLOCK - 1) // BLOCK
    tbl = np.zeros(n_blocks, dtype=_TBL)
    chunks = []
    off = 0
    for b in range(n_blocks):
        part = vals[b * BLOCK : (b + 1) * BLOCK]
        w = _width(int(part.max()))
        pb = _pack(part, w)
        chunks.append(pb)
        off += len(pb)
        tbl[b]["end_off"] = off
        tbl[b]["width"] = w
    return (
        np.array([n, n_blocks], dtype="<u4").tobytes() + tbl.tobytes() + b"".join(chunks)
    )


def decode_range(blob, start: int, stop: int) -> np.ndarray:
    """Values [start, stop) — decodes only the covering blocks."""
    buf = memoryview(blob)
    n, n_blocks = np.frombuffer(buf[:8], dtype="<u4")
    n = int(n)
    if not (0 <= start <= stop <= n):
        raise IndexError(f"range [{start}, {stop}) outside [0, {n})")
    if start == stop:
        return np.empty(0, dtype=np.int64)
    tbl = np.frombuffer(buf[8 : 8 + 8 * int(n_blocks)], dtype=_TBL)
    data0 = 8 + 8 * int(n_blocks)
    b_lo, b_hi = start // BLOCK, (stop - 1) // BLOCK
    parts = []
    for b in range(b_lo, b_hi + 1):
        lo_off = int(tbl["end_off"][b - 1]) if b > 0 else 0
        count = min(BLOCK, n - b * BLOCK)
        w = int(tbl["width"][b])
        parts.append(_unpack(buf[data0 + lo_off : data0 + int(tbl["end_off"][b])], count, w))
    vals = np.concatenate(parts)
    return vals[start - b_lo * BLOCK : stop - b_lo * BLOCK]


def decode_all(blob) -> np.ndarray:
    buf = memoryview(blob)
    n = int(np.frombuffer(buf[:8], dtype="<u4")[0])
    return decode_range(blob, 0, n)
