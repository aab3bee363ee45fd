"""Segment layer: write-once partition-local mini-indexes.

The Ray-side analogue of Lucene's segment files (SURVEY.md §1.2):

    <seg_dir>/terms.parquet   sorted term dict: term, df, cf, max_tf,
                              offset, nbytes   (~ .tim/.tip BlockTree dict,
                              [U] lucene/core/.../codecs/blocktree/)
    <seg_dir>/postings.bin    concatenated per-term blobs (delta + FOR128
                              bit-packed blocks, skip + impacts; ~ .doc,
                              [U] .../codecs/lucene84/Lucene84PostingsWriter.java)
    <seg_dir>/meta.json       codec name, counts, checksums (~ .si)

Segments are written atomically (tmp dir + rename) so a crashed build
leaves only complete segments — the resume unit (SURVEY.md §4).
Norm bytes live inside the postings (per posting), so a segment is fully
self-contained for scoring; the doc-ordered docs.parquet (stored fields +
doclen/norm doc-values columns) is written separately by the build pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.codec import DEFAULT_POSTINGS_CODEC, get_postings_codec

TERMS_FILE = "terms.parquet"
POSTINGS_FILE = "postings.bin"
POSITIONS_FILE = "positions.bin"
META_FILE = "meta.json"


def write_segment(
    seg_dir: str,
    terms: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    codec_name: str = DEFAULT_POSTINGS_CODEC,
    lineage: dict | None = None,
) -> dict:
    """Encode one segment from flat (term, docid, tf, norm) rows (any
    order; grouped + sorted here — the FreqProxTermsWriter replay step,
    [U] lucene/core/.../index/FreqProxTermsWriter.java)."""
    docids = np.asarray(docids)
    tfs = np.asarray(tfs)
    norms = np.asarray(norms)

    def groups():
        if len(terms) == 0:
            return
        keys = np.array([t.encode("utf-8") for t in terms], dtype=object)
        order = np.lexsort((docids, keys))
        keys_s = keys[order]
        uniq, starts = np.unique(keys_s, return_index=True)
        bounds = np.append(starts, len(keys_s))
        for i in range(len(uniq)):
            sl = order[bounds[i] : bounds[i + 1]]
            yield uniq[i].decode("utf-8"), docids[sl], tfs[sl], norms[sl]

    return write_segment_grouped(seg_dir, groups(), codec_name=codec_name, lineage=lineage)


def write_segment_grouped(
    seg_dir: str,
    term_groups,
    codec_name: str = DEFAULT_POSTINGS_CODEC,
    lineage: dict | None = None,
) -> dict:
    """Encode a segment from an iterator of (term, docids asc, tfs, norms
    [, positions_flat]) groups in ascending UTF-8 term order. The optional
    5th element stores per-posting positions (the .pos analogue; see
    codec/packedints.py). Returns the manifest stats record. Atomic:
    writes to <seg_dir>.tmp then renames."""
    from lucene_solr_ray.codec.packedints import encode_ints

    codec = get_postings_codec(codec_name)
    names: list[str] = []
    df_l: list[int] = []
    cf_l: list[int] = []
    max_tf_l: list[int] = []
    pos_offsets: list[int] = []
    pos_nbytes: list[int] = []
    docid_min = None
    docid_max = None
    n_postings = 0
    sum_tf = 0
    off = 0
    pos_off = 0
    has_positions = False
    offsets: list[int] = []
    nbytes: list[int] = []

    # Postings stream straight to disk term-at-a-time (crc accumulated
    # incrementally) so a whole-partition merge never holds more than one
    # term's encoded blob in memory — the SegmentMerger memory contract
    # ([U] lucene/core/.../index/SegmentMerger.java streams field-at-a-time).
    tmp = seg_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    crc = 0
    pos_crc = 0
    post_fh = open(os.path.join(tmp, POSTINGS_FILE), "wb")
    pos_fh = None
    try:
        for group in term_groups:
            term, d, t, m = group[0], group[1], group[2], group[3]
            blob = codec.encode(d, t, m)
            post_fh.write(blob)
            crc = zlib.crc32(blob, crc)
            names.append(term)
            df_l.append(len(d))
            cf_l.append(int(t.sum()))
            max_tf_l.append(int(t.max()))
            offsets.append(off)
            nbytes.append(len(blob))
            off += len(blob)
            n_postings += len(d)
            sum_tf += int(t.sum())
            lo, hi = int(d[0]), int(d[-1])
            docid_min = lo if docid_min is None else min(docid_min, lo)
            docid_max = hi if docid_max is None else max(docid_max, hi)
            if len(group) > 4:
                has_positions = True
                if pos_fh is None:
                    pos_fh = open(os.path.join(tmp, POSITIONS_FILE), "wb")
                pb = encode_ints(group[4])
                pos_fh.write(pb)
                pos_crc = zlib.crc32(pb, pos_crc)
                pos_offsets.append(pos_off)
                pos_nbytes.append(len(pb))
                pos_off += len(pb)
    finally:
        post_fh.close()
        if pos_fh is not None:
            pos_fh.close()

    cols = {
        # ascending UTF-8 byte order == Lucene BytesRef order
        "term": pa.array(names, type=pa.string()),
        "df": pa.array(df_l, type=pa.int64()),
        "cf": pa.array(cf_l, type=pa.int64()),
        "max_tf": pa.array(max_tf_l, type=pa.int64()),
        "offset": pa.array(offsets, type=pa.int64()),
        "nbytes": pa.array(nbytes, type=pa.int64()),
    }
    if has_positions:
        cols["pos_offset"] = pa.array(pos_offsets, type=pa.int64())
        cols["pos_nbytes"] = pa.array(pos_nbytes, type=pa.int64())
    terms_table = pa.table(cols)
    pq.write_table(terms_table, os.path.join(tmp, TERMS_FILE))
    meta = {
        "codec": codec_name,
        "has_positions": has_positions,
        "n_terms": len(names),
        "n_postings": n_postings,
        "sum_tf": sum_tf,
        "docid_min": docid_min if docid_min is not None else -1,
        "docid_max": docid_max if docid_max is not None else -1,
        "postings_bytes": off,
        "positions_bytes": pos_off,
        "positions_crc32": pos_crc & 0xFFFFFFFF,
        "postings_crc32": crc & 0xFFFFFFFF,
        "lineage": lineage or {},
    }
    with open(os.path.join(tmp, META_FILE), "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(seg_dir):
        shutil.rmtree(seg_dir)  # idempotent rebuild of the same segment
    os.rename(tmp, seg_dir)
    return meta


def segment_is_complete(seg_dir: str) -> bool:
    return all(
        os.path.exists(os.path.join(seg_dir, f)) for f in (TERMS_FILE, POSTINGS_FILE, META_FILE)
    )


class SegmentReader:
    """Read side: term dict in memory (sorted numpy arrays, binary
    search), postings fetched by (offset, nbytes) range reads — the
    BlockTree/FST dict replaced by Parquet + searchsorted (SURVEY §2.3)."""

    def __init__(self, seg_dir: str):
        self.seg_dir = seg_dir
        with open(os.path.join(seg_dir, META_FILE)) as fh:
            self.meta = json.load(fh)
        self.codec = get_postings_codec(self.meta["codec"])
        t = pq.read_table(os.path.join(seg_dir, TERMS_FILE))
        # vectorized utf-8 key load (no per-term Python encode loop):
        # the binary cast materializes bytes objects in C, and bytes
        # comparison IS utf-8 byte order, so searchsorted semantics match
        self._term_keys = (
            t.column("term").cast(pa.binary()).combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        self._terms = None
        self.df = t.column("df").to_numpy()
        self.cf = t.column("cf").to_numpy()
        self.max_tf = t.column("max_tf").to_numpy()
        self.offsets = t.column("offset").to_numpy()
        self.nbytes = t.column("nbytes").to_numpy()
        self.has_positions = "pos_offset" in t.column_names
        if self.has_positions:
            self.pos_offsets = t.column("pos_offset").to_numpy()
            self.pos_nbytes = t.column("pos_nbytes").to_numpy()
        self._fh = None
        self._pos_fh = None

    @property
    def terms(self) -> np.ndarray:
        """Decoded str terms — built lazily; hot query paths only need
        the utf-8 byte keys (multi-term expansion / merge / split decode
        on first touch)."""
        if self._terms is None:
            self._terms = np.array(
                [k.decode("utf-8") for k in self._term_keys], dtype=object
            )
        return self._terms

    def lookup(self, term: str) -> int | None:
        """-> term ordinal or None. Binary search in UTF-8 byte order."""
        key = term.encode("utf-8")
        # object array of bytes: searchsorted works with rich comparison
        i = int(np.searchsorted(self._term_keys, key))
        if i < len(self._term_keys) and self._term_keys[i] == key:
            return i
        return None

    def term_range(self, lo: str | None = None, hi: str | None = None) -> range:
        """Ordinals of terms in [lo, hi) — powers prefix/range queries."""
        i = 0 if lo is None else int(np.searchsorted(self._term_keys, lo.encode("utf-8")))
        j = len(self._term_keys) if hi is None else int(np.searchsorted(self._term_keys, hi.encode("utf-8")))
        return range(i, j)

    def read_blob(self, ordinal: int) -> bytes:
        if self._fh is None:
            self._fh = open(os.path.join(self.seg_dir, POSTINGS_FILE), "rb")
        self._fh.seek(int(self.offsets[ordinal]))
        return self._fh.read(int(self.nbytes[ordinal]))

    def postings(self, ordinal: int):
        """Full decode -> (docids, tfs, norms)."""
        return self.codec.decode(self.read_blob(ordinal))

    def read_pos_blob(self, ordinal: int) -> bytes:
        """Packed positions sequence for a term (codec/packedints.py);
        posting j's positions are values [cumsum(tf)[j-1], cumsum(tf)[j])."""
        if not self.has_positions:
            raise ValueError(f"segment {self.seg_dir} was built without positions")
        if self._pos_fh is None:
            self._pos_fh = open(os.path.join(self.seg_dir, POSITIONS_FILE), "rb")
        self._pos_fh.seek(int(self.pos_offsets[ordinal]))
        return self._pos_fh.read(int(self.pos_nbytes[ordinal]))

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._pos_fh is not None:
            self._pos_fh.close()
            self._pos_fh = None


def check_segment(seg_dir: str) -> list[str]:
    """CheckIndex-equivalent for one segment
    ([U] lucene/core/.../index/CheckIndex.java). Returns problem strings."""
    problems: list[str] = []
    r = SegmentReader(seg_dir)
    with open(os.path.join(seg_dir, POSTINGS_FILE), "rb") as fh:
        raw = fh.read()
    if (zlib.crc32(raw) & 0xFFFFFFFF) != r.meta["postings_crc32"]:
        problems.append("postings.bin crc32 mismatch")
    if len(raw) != r.meta["postings_bytes"]:
        problems.append("postings.bin length mismatch")
    if r.has_positions and "positions_crc32" in r.meta:
        with open(os.path.join(seg_dir, POSITIONS_FILE), "rb") as fh:
            praw = fh.read()
        if (zlib.crc32(praw) & 0xFFFFFFFF) != r.meta["positions_crc32"]:
            problems.append("positions.bin crc32 mismatch")
        if len(praw) != r.meta["positions_bytes"]:
            problems.append("positions.bin length mismatch")
    keys = r._term_keys
    if len(keys) > 1 and not all(keys[i] < keys[i + 1] for i in range(len(keys) - 1)):
        problems.append("terms not strictly sorted")
    n_postings = 0
    sum_tf = 0
    for i in range(len(r.terms)):
        d, t, m = r.postings(i)
        if len(d) != r.df[i]:
            problems.append(f"term {r.terms[i]!r}: df {r.df[i]} != postings len {len(d)}")
        if int(t.sum()) != int(r.cf[i]):
            problems.append(f"term {r.terms[i]!r}: cf mismatch")
        if len(d) > 1 and not np.all(np.diff(d) > 0):
            problems.append(f"term {r.terms[i]!r}: docids not strictly increasing")
        if np.any(m > 255) or np.any(m < 0):
            problems.append(f"term {r.terms[i]!r}: norm byte out of range")
        n_postings += len(d)
        sum_tf += int(t.sum())
    if n_postings != r.meta["n_postings"]:
        problems.append("meta n_postings mismatch")
    if sum_tf != r.meta["sum_tf"]:
        problems.append("meta sum_tf mismatch")
    r.close()
    return problems
