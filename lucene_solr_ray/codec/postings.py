"""Compressed posting-list codecs with block skip tables + impacts.

Shape mirrors Lucene's Lucene84 postings format
([U] lucene/core/.../codecs/lucene84/Lucene84PostingsWriter.java:
doc-delta blocks of 128 with FOR bit-packing, vInt tail) and its
multi-level skip entries with impacts
([U] .../codecs/lucene84/Lucene84SkipWriter.java, MultiLevelSkipListWriter).

Differences (deliberate, Ray-first — see SURVEY.md §2.3):
- single-level skip table (one entry per 128-doc block); at our block
  counts multi-level adds nothing a ``np.searchsorted`` over the block
  last-docids doesn't already give in O(log B).
- a norm byte is stored per posting (bit-packed), so scoring never needs
  a global docID->norm lookup — load-bearing for the term-partitioned
  layout at 10^12-doc scale (norms array would not fit one node).
- impacts per block = (max_tf, min_norm): a true BM25 upper bound since
  score is increasing in tf and decreasing in decoded dl (byte4 encoding
  is monotonic, codec/norms.py).

Blob layout (little-endian)::

    u32 n_docs
    u32 n_blocks
    skip table, n_blocks x 16B:
        u32 last_docid; u32 end_off (into data area, exclusive)
        u32 max_tf; u8 min_norm; u8 wd; u8 wt; u8 wn
    data area, per block:
        packed doc deltas (wd bits each), packed tf-1 (wt), packed norm (wn)

Doc deltas: d[i] = doc[i] - doc[i-1] - 1 (prev of block 0's first = -1),
so decode is ``cumsum(d + 1) - 1`` — strictly-increasing guaranteed.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128

_SKIP_DTYPE = np.dtype(
    [
        ("last_docid", "<u4"),
        ("end_off", "<u4"),
        ("max_tf", "<u4"),
        ("min_norm", "u1"),
        ("wd", "u1"),
        ("wt", "u1"),
        ("wn", "u1"),
    ]
)
assert _SKIP_DTYPE.itemsize == 16

_POW2 = (1 << np.arange(33, dtype=np.int64))


def _width(max_val: int) -> int:
    """bits needed for max_val (0 -> 0 bits)."""
    return int(np.searchsorted(_POW2, int(max_val), side="right"))


def _pack(vals: np.ndarray, width: int) -> bytes:
    if width == 0:
        return b""
    v = vals.astype(">u4")
    bits = np.unpackbits(v.view(np.uint8).reshape(-1, 4), axis=1)[:, 32 - width :]
    return np.packbits(bits.ravel()).tobytes()


def _unpack(buf: memoryview, count: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(count, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=count * width)
    full = np.zeros((count, 32), dtype=np.uint8)
    full[:, 32 - width :] = bits.reshape(count, width)
    return np.packbits(full, axis=1).view(">u4").ravel().astype(np.int64)


class For128Codec:
    """FOR bit-packed blocks of 128 (the default / fast path)."""

    name = "for128-v1"

    @staticmethod
    def encode(docids, tfs, norms) -> bytes:
        docids = np.asarray(docids, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        norms = np.asarray(norms, dtype=np.int64)
        n = len(docids)
        if n == 0:
            return np.array([0, 0], dtype="<u4").tobytes()
        if np.any(tfs < 1):
            raise ValueError("tf must be >= 1")
        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = docids[0]
        deltas[1:] = docids[1:] - docids[:-1] - 1
        if n > 1 and np.any(deltas[1:] < 0):
            raise ValueError("docids must be strictly increasing")
        n_blocks = (n + BLOCK - 1) // BLOCK
        skip = np.zeros(n_blocks, dtype=_SKIP_DTYPE)
        chunks: list[bytes] = []
        off = 0
        for b in range(n_blocks):
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, n)
            min_norm = int(norms[lo:hi].min())
            # FOR: tf-1 (tf >= 1) and norm-min_norm (min_norm is in the skip
            # entry anyway, as the block impact) shrink to 0 bits when constant
            d, t, m = deltas[lo:hi], tfs[lo:hi] - 1, norms[lo:hi] - min_norm
            wd, wt, wn = _width(d.max()), _width(t.max()), _width(m.max())
            for part, w in ((d, wd), (t, wt), (m, wn)):
                pb = _pack(part, w)
                chunks.append(pb)
                off += len(pb)
            skip[b] = (docids[hi - 1], off, tfs[lo:hi].max(), min_norm, wd, wt, wn)
        header = np.array([n, n_blocks], dtype="<u4").tobytes()
        return header + skip.tobytes() + b"".join(chunks)

    @staticmethod
    def read_skip(blob) -> tuple[int, np.ndarray, int]:
        """-> (n_docs, skip structured array, data_start offset)."""
        buf = memoryview(blob)
        n, n_blocks = np.frombuffer(buf[:8], dtype="<u4")
        skip = np.frombuffer(buf[8 : 8 + 16 * int(n_blocks)], dtype=_SKIP_DTYPE)
        return int(n), skip, 8 + 16 * int(n_blocks)

    @staticmethod
    def decode_block(blob, skip: np.ndarray, data_start: int, n_docs: int, b: int):
        """-> (docids, tfs, norms) int64 arrays for block b."""
        lo_off = int(skip["end_off"][b - 1]) if b > 0 else 0
        count = min(BLOCK, n_docs - b * BLOCK)
        buf = memoryview(blob)[data_start + lo_off : data_start + int(skip["end_off"][b])]
        wd, wt, wn = int(skip["wd"][b]), int(skip["wt"][b]), int(skip["wn"][b])
        nd = (count * wd + 7) // 8
        nt = (count * wt + 7) // 8
        deltas = _unpack(buf[:nd], count, wd)
        tfs = _unpack(buf[nd : nd + nt], count, wt) + 1
        norms = _unpack(buf[nd + nt :], count, wn) + int(skip["min_norm"][b])
        prev_last = int(skip["last_docid"][b - 1]) if b > 0 else -1
        docids = np.cumsum(deltas + 1) + prev_last
        return docids, tfs, norms

    @classmethod
    def decode(cls, blob):
        """Full decode -> (docids, tfs, norms), vectorized across blocks:
        full 128-doc blocks are byte-aligned (16*w bytes per field), so
        blocks sharing a bit-width are gathered and unpacked in one numpy
        pass per (field, width) group; only the tail block is scalar."""
        n, skip, data_start = cls.read_skip(blob)
        if n == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        n_blocks = len(skip)
        n_full = n // BLOCK  # number of complete 128-doc blocks
        raw = np.frombuffer(blob, dtype=np.uint8)
        starts = np.empty(n_blocks, dtype=np.int64)
        starts[0] = data_start
        starts[1:] = data_start + skip["end_off"][:-1].astype(np.int64)
        wd = skip["wd"].astype(np.int64)
        wt = skip["wt"].astype(np.int64)
        wn = skip["wn"].astype(np.int64)

        deltas = np.empty(n, dtype=np.int64)
        tfs = np.empty(n, dtype=np.int64)
        norms = np.empty(n, dtype=np.int64)

        def fill(out: np.ndarray, field_starts: np.ndarray, widths: np.ndarray):
            for w in np.unique(widths[:n_full]):
                blks = np.flatnonzero(widths[:n_full] == w)
                if w == 0:
                    for b in blks:
                        out[b * BLOCK : (b + 1) * BLOCK] = 0
                    continue
                nb = 16 * int(w)  # 128 * w / 8 bytes, always whole
                gather = field_starts[blks][:, None] + np.arange(nb)[None, :]
                bits = np.unpackbits(raw[gather], axis=1).reshape(-1, int(w))
                vals = np.zeros(len(bits), dtype=np.int64)
                for j in range(int(w)):  # shift-or over width: w vectorized passes
                    vals = (vals << 1) | bits[:, j]
                out_idx = (blks[:, None] * BLOCK + np.arange(BLOCK)[None, :]).ravel()
                out[out_idx] = vals

        d_starts = starts
        t_starts = starts + ((np.minimum(BLOCK, n - np.arange(n_blocks) * BLOCK) * wd + 7) // 8)
        m_starts = t_starts + ((np.minimum(BLOCK, n - np.arange(n_blocks) * BLOCK) * wt + 7) // 8)
        fill(deltas, d_starts, wd)
        fill(tfs, t_starts, wt)
        fill(norms, m_starts, wn)
        if n_full < n_blocks:  # tail block
            d, t, m = cls.decode_block(blob, skip, data_start, n, n_blocks - 1)
            lo = (n_blocks - 1) * BLOCK
            # decode_block returns absolute docids; recover tail deltas
            prev_last = int(skip["last_docid"][n_blocks - 2]) if n_blocks > 1 else -1
            dd = np.empty(len(d), dtype=np.int64)
            dd[0] = d[0] - prev_last - 1
            dd[1:] = d[1:] - d[:-1] - 1
            deltas[lo:] = dd
            tfs[lo:] = t - 1
            norms[lo:] = m - int(skip["min_norm"][n_blocks - 1])
        docids = np.cumsum(deltas + 1) - 1
        min_norms = np.repeat(skip["min_norm"].astype(np.int64),
                              np.minimum(BLOCK, n - np.arange(n_blocks) * BLOCK))
        return docids, tfs + 1, norms + min_norms


class VarintCodec:
    """LEB128 varint blocks in the same container — the simple/portable
    codec (Lucene's vInt tail analogue); registry alternative, not the
    default hot path."""

    name = "varint-v1"

    @staticmethod
    def _venc(vals: np.ndarray) -> bytes:
        out = bytearray()
        for v in vals.tolist():
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)

    @staticmethod
    def _vdec(buf: memoryview, count: int) -> tuple[np.ndarray, int]:
        out = np.empty(count, dtype=np.int64)
        pos = 0
        for i in range(count):
            shift = 0
            val = 0
            while True:
                b = buf[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            out[i] = val
        return out, pos

    @classmethod
    def encode(cls, docids, tfs, norms) -> bytes:
        docids = np.asarray(docids, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        norms = np.asarray(norms, dtype=np.int64)
        n = len(docids)
        if n == 0:
            return np.array([0, 0], dtype="<u4").tobytes()
        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = docids[0]
        deltas[1:] = docids[1:] - docids[:-1] - 1
        n_blocks = (n + BLOCK - 1) // BLOCK
        skip = np.zeros(n_blocks, dtype=_SKIP_DTYPE)
        chunks: list[bytes] = []
        off = 0
        for b in range(n_blocks):
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, n)
            pb = cls._venc(deltas[lo:hi]) + cls._venc(tfs[lo:hi] - 1) + cls._venc(norms[lo:hi])
            chunks.append(pb)
            off += len(pb)
            skip[b] = (docids[hi - 1], off, tfs[lo:hi].max(), norms[lo:hi].min(), 0, 0, 0)
        header = np.array([n, n_blocks], dtype="<u4").tobytes()
        return header + skip.tobytes() + b"".join(chunks)

    read_skip = For128Codec.read_skip

    @classmethod
    def decode_block(cls, blob, skip, data_start, n_docs, b):
        lo_off = int(skip["end_off"][b - 1]) if b > 0 else 0
        count = min(BLOCK, n_docs - b * BLOCK)
        buf = memoryview(blob)[data_start + lo_off : data_start + int(skip["end_off"][b])]
        deltas, p1 = cls._vdec(buf, count)
        tfs, p2 = cls._vdec(buf[p1:], count)
        norms, _ = cls._vdec(buf[p1 + p2 :], count)
        prev_last = int(skip["last_docid"][b - 1]) if b > 0 else -1
        docids = np.cumsum(deltas + 1) + prev_last
        return docids, tfs + 1, norms

    @classmethod
    def decode(cls, blob):
        n, skip, data_start = cls.read_skip(blob)
        if n == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        parts = [cls.decode_block(blob, skip, data_start, n, b) for b in range(len(skip))]
        return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))


class PostingsCursor:
    """Block-granular cursor over one encoded posting list — the
    DocIdSetIterator/ImpactsDISI analogue ([U] lucene/core/.../search/)
    used by the WAND / leapfrog loops in pipelines/search.py."""

    __slots__ = ("blob", "codec", "n_docs", "skip", "data_start", "_cache")

    def __init__(self, blob: bytes, codec=For128Codec):
        self.blob = blob
        self.codec = codec
        self.n_docs, self.skip, self.data_start = codec.read_skip(blob)
        self._cache: dict[int, tuple] = {}

    @property
    def n_blocks(self) -> int:
        return len(self.skip)

    def block(self, b: int):
        hit = self._cache.get(b)
        if hit is None:
            hit = self.codec.decode_block(self.blob, self.skip, self.data_start, self.n_docs, b)
            self._cache[b] = hit  # cursor is query-scoped; windows revisit blocks
        return hit

    def first_block_at_or_after(self, target_docid: int) -> int:
        """Index of first block whose last_docid >= target (== n_blocks if
        exhausted) — the skip-list advance."""
        return int(np.searchsorted(self.skip["last_docid"], target_docid, side="left"))
