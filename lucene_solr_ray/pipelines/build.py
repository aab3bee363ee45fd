"""Index build pipeline — SURVEY.md §3 Trace A, Ray-Data-first.

    read_parquet(transcripts)                      # streaming blocks
      -> sort(["conv_id","turn_idx"])              # row invariant + docID order
      -> [driver] per-block counts -> prefix sums  # global dense docID bases
         (the zip_with_index workaround — the ONLY raw-ray-task step)
      -> map_batches(analyze)                      # tokenize/lower/stop; side-
         writes doc-ordered docs.parquet parts     # stored fields + dl/norm
      -> groupby("bucket")                         # THE term-hash shuffle
      -> map_groups(write bucket segment)          # sort, FOR128 encode, skip+
                                                   # impacts, terms dict; atomic
      -> [driver] commit manifest_N.json           # two-phase commit point

Reference analogues: DWPT inversion ([U] lucene/core/.../index/
DocumentsWriterPerThread.java, DefaultIndexingChain.java) = the per-batch
map-side combiner in analysis.batch_term_counts; flush/codec write
([U] .../codecs/lucene84/) = segment.write_segment; commit
([U] .../index/IndexWriter.java commit()) = state.manifest.

Skew handling (mandated, BASELINE.json:14): the shuffle key is
``bucket = (crc32(term) % P) * S + docid_salt`` with
``docid_salt = docid // ceil(n_docs / S)``. Every term's postings are
range-split across S docid ranges, so a Zipf-hot term's list is spread
over S bucket tasks instead of landing on one straggler; each partition
p = bucket // S owns complete posting lists for its term range (query
touches <= q partitions), reassembled in docid order at read/merge time
because salt ranges are docid-disjoint and ascending. Map-side combine
(distinct (doc,term) pairs per batch) shrinks shuffle rows before the
exchange.

Resume (mandated): completed bucket segments are detected on disk (or in
the previous manifest) and filtered out of the shuffle; a fresh manifest
generation is committed listing old + new segments with lineage.
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from lucene_solr_ray.analysis import batch_term_counts
from lucene_solr_ray.io_utils import read_parquet_clean
from lucene_solr_ray.codec import DEFAULT_POSTINGS_CODEC
from lucene_solr_ray.codec.norms import encode_dl
from lucene_solr_ray.segment import segment_is_complete, write_segment
from lucene_solr_ray.state.manifest import commit_manifest

DOCS_DIRNAME = "docs"
SEGMENTS_DIRNAME = "segments"


def stable_term_hash(uniq_terms: np.ndarray) -> np.ndarray:
    """crc32 over UTF-8 bytes — stable across processes (Python hash() is
    salted per process and would break determinism/resume)."""
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in uniq_terms), dtype=np.int64, count=len(uniq_terms)
    )


def segment_name(generation: int, bucket: int) -> str:
    return f"g{generation:03d}-b{bucket:06d}"


def segment_dir(index_dir: str, partition: int, name: str) -> str:
    return os.path.join(index_dir, SEGMENTS_DIRNAME, f"p{partition:04d}", name)


@ray.remote
def _num_rows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _add_docid(table: pa.Table, base: int) -> pa.Table:
    docid = pa.array(np.arange(base, base + table.num_rows, dtype=np.int64))
    return table.append_column("docid", docid)


@ray.remote
def _conv_block_stats(table: pa.Table) -> tuple[int, int]:
    """(sum of per-conv turn counts, #convs with sparse turn_idx) for one
    sorted conv-aggregate block — the only thing the driver pulls in the
    two-level prefix sum (per-block totals, not per-conv rows)."""
    n = table.column("n").to_numpy().astype(np.int64)
    mx = table.column("max_ti").to_numpy().astype(np.int64)
    return int(n.sum()), int((mx != n - 1).sum())


@ray.remote
def _conv_block_bases(table: pa.Table, block_offset: int) -> pa.Table:
    """Second level of the prefix sum: per-conv docID bases within one
    conv_id-sorted block, shifted by the block's global offset."""
    n = table.column("n").to_numpy().astype(np.int64)
    bases = block_offset + np.concatenate([[0], np.cumsum(n)])[:-1]
    return pa.table(
        {"conv_id": table.column("conv_id"), "base": pa.array(bases, type=pa.int64())}
    )


class _AnalyzeStage:
    """map_batches callable: canonical analysis + docs side-write +
    postings emission. Stateless per batch; a class only to carry config.
    When ``base_ref`` is set (conv-base docID mode) the docid column is
    computed here as base[conv_id] + turn_idx instead of arriving
    pre-assigned from the sort path."""

    def __init__(self, docs_dir: str, num_partitions: int, salt: int, salt_range: int,
                 write_docs: bool, skip_buckets: frozenset[int], base_ref=None,
                 store_positions: bool = False, store_term_vectors: bool = False,
                 tvs_dir: str | None = None, text_column: str = "text",
                 analyzer: str = "standard"):
        self.store_term_vectors = store_term_vectors
        self.tvs_dir = tvs_dir
        self.text_column = text_column
        self.analyzer = analyzer
        self.docs_dir = docs_dir
        self.num_partitions = num_partitions
        self.salt = salt
        self.salt_range = salt_range
        self.write_docs = write_docs
        self.skip_buckets = skip_buckets
        self.base_ref = base_ref
        self.store_positions = store_positions
        self._bases = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        if "base" in batch.column_names:
            # conv-base-join mode: per-conv base arrived via the hash join
            docids = (
                batch.column("base").to_numpy().astype(np.int64)
                + batch.column("turn_idx").to_numpy().astype(np.int64)
            )
            batch = batch.drop_columns(["base"]).append_column("docid", pa.array(docids))
        elif self.base_ref is not None:
            if self._bases is None:
                self._bases = ray.get(self.base_ref)
            conv_sorted, bases_arr = self._bases
            convs = np.asarray(batch.column("conv_id").to_pylist(), dtype=str)
            turn_idx = batch.column("turn_idx").to_numpy().astype(np.int64)
            idx = np.searchsorted(conv_sorted, convs)
            docids = bases_arr[idx] + turn_idx
            batch = batch.append_column("docid", pa.array(docids))
        else:
            docids = batch.column("docid").to_numpy()
        if self.store_positions:
            from lucene_solr_ray.analysis import batch_term_positions

            rows, terms, tfs, dl, pos_flat = batch_term_positions(texts)
        elif self.analyzer != "standard":
            from lucene_solr_ray.analysis import get_analyzer

            rows, terms, tfs, dl = batch_term_counts(
                texts, analyzer=get_analyzer(self.analyzer))
            pos_flat = None
        else:
            rows, terms, tfs, dl = batch_term_counts(texts)
            pos_flat = None
        norms_per_doc = encode_dl(dl)

        if self.write_docs and batch.num_rows:
            docs_table = batch.append_column("dl", pa.array(dl)).append_column(
                "norm", pa.array(norms_per_doc, type=pa.uint8())
            )
            lo, hi = int(docids.min()), int(docids.max())
            crc = zlib.crc32(docids.tobytes()) & 0xFFFFFFFF
            path = os.path.join(self.docs_dir, f"docs-{lo:012d}-{hi:012d}-{crc:08x}.parquet")
            if not os.path.exists(path):
                tmp = path + f".tmp-{os.getpid()}"
                pq.write_table(docs_table, tmp)
                os.rename(tmp, path)

        if self.store_term_vectors and self.write_docs and batch.num_rows:
            # stored term vectors ([U] lucene/core/.../codecs/lucene50/
            # Lucene50TermVectorsFormat): per-doc (term, tf, positions,
            # offsets), docid-range-named parquet so readers prune to the
            # one file/row-group holding a doc — same idempotent write
            # protocol as the stored-fields side-write above
            from lucene_solr_ray.analysis import batch_term_vectors

            tv_rows, tv_terms, tv_tfs, tv_pos, tv_st, tv_en = batch_term_vectors(texts)
            off = np.concatenate([[0], np.cumsum(tv_tfs)]).astype(np.int32)
            tv_table = pa.table(
                {
                    "docid": pa.array(docids[tv_rows], pa.int64()),
                    "term": pa.array(tv_terms.astype(str), pa.string()),
                    "tf": pa.array(tv_tfs, pa.int32()),
                    "positions": pa.ListArray.from_arrays(off, pa.array(tv_pos, pa.int32())),
                    "starts": pa.ListArray.from_arrays(off, pa.array(tv_st, pa.int32())),
                    "ends": pa.ListArray.from_arrays(off, pa.array(tv_en, pa.int32())),
                }
            )
            tv_order = np.argsort(docids[tv_rows], kind="stable")
            tv_table = tv_table.take(pa.array(tv_order))  # docid order -> row-group stats prune
            lo, hi = int(docids.min()), int(docids.max())
            crc = zlib.crc32(docids.tobytes()) & 0xFFFFFFFF
            path = os.path.join(self.tvs_dir, f"tvs-{lo:012d}-{hi:012d}-{crc:08x}.parquet")
            if not os.path.exists(path):
                tmp = path + f".tmp-{os.getpid()}"
                pq.write_table(tv_table, tmp)
                os.rename(tmp, path)

        empty = pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "docids": pa.array([], type=pa.binary()),
                "tfs": pa.array([], type=pa.binary()),
                "norms": pa.array([], type=pa.binary()),
                "positions": pa.array([], type=pa.binary()),
            }
        )
        if len(terms) == 0:
            return empty

        # postings, map-side combined AND packed: one shuffle row per
        # (term, salt-range) per batch, with the postings as little-endian
        # int32/uint16/uint8 buffers — ~10x fewer rows and ~3x fewer bytes
        # through the exchange than flat (term, docid, tf, norm) rows
        post_docids = docids[rows]
        post_norms = norms_per_doc[rows].astype(np.int64)
        uniq, inv = np.unique(terms, return_inverse=True)
        part = stable_term_hash(uniq) % self.num_partitions
        docid_salt = (post_docids // self.salt_range).clip(0, self.salt - 1)
        # group rows by (term, salt): docid-sorted within each group
        group_key = inv * self.salt + docid_salt
        order = np.lexsort((post_docids, group_key))
        gk_s = group_key[order]
        starts = np.flatnonzero(np.concatenate([[True], gk_s[1:] != gk_s[:-1]]))
        bounds = np.append(starts, len(gk_s))
        if len(tfs) and int(tfs.max()) > 65535:
            # fail loudly: silent clamping would corrupt cf/sum_dl and
            # break oracle parity for a pathological >65535-tf doc
            raise ValueError(
                f"term frequency {int(tfs.max())} overflows the uint16 shuffle "
                "packing; widen the packed tf field for this corpus"
            )
        d_s = post_docids[order].astype("<i4")
        t_s = tfs[order].astype("<u2")
        m_s = post_norms[order].astype(np.uint8)
        if pos_flat is not None:
            # gather per-posting position groups into `order` order
            offs = np.concatenate([[0], np.cumsum(tfs)])
            lens = tfs[order]
            grp_off = np.concatenate([[0], np.cumsum(lens)])
            idx = np.repeat(offs[:-1][order], lens) + (
                np.arange(int(lens.sum())) - np.repeat(grp_off[:-1], lens)
            )
            if len(pos_flat) and int(pos_flat.max()) > 65535:
                raise ValueError(
                    f"token position {int(pos_flat.max())} overflows the uint16 "
                    "shuffle packing (doc has > 65536 token slots); widen the "
                    "packed position field for this corpus"
                )
            pos_sorted = pos_flat[idx].astype("<u2")
        buckets_out, terms_out, d_out, t_out, m_out, p_out = [], [], [], [], [], []
        skip = self.skip_buckets
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            gk = int(gk_s[lo])
            term_i, salt_i = gk // self.salt, gk % self.salt
            bucket = int(part[term_i]) * self.salt + salt_i
            if skip and bucket in skip:
                continue
            buckets_out.append(bucket)
            terms_out.append(str(uniq[term_i]))
            d_out.append(d_s[lo:hi].tobytes())
            t_out.append(t_s[lo:hi].tobytes())
            m_out.append(m_s[lo:hi].tobytes())
            if pos_flat is not None:
                p_out.append(pos_sorted[grp_off[lo] : grp_off[hi]].tobytes())
            else:
                p_out.append(b"")
        if not buckets_out:
            return empty
        return pa.table(
            {
                "bucket": pa.array(buckets_out, type=pa.int64()),
                "term": pa.array(terms_out, type=pa.string()),
                "docids": pa.array(d_out, type=pa.binary()),
                "tfs": pa.array(t_out, type=pa.binary()),
                "norms": pa.array(m_out, type=pa.binary()),
                "positions": pa.array(p_out, type=pa.binary()),
            }
        )


def _make_segment_writer(index_dir: str, generation: int, salt: int, codec_name: str,
                         lineage: dict, store_positions: bool = False):
    def write_bucket_segment(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        bucket = int(group.column("bucket")[0].as_py())
        partition = bucket // salt
        name = segment_name(generation, bucket)
        seg_dir = segment_dir(index_dir, partition, name)

        terms_arr = np.asarray(group.column("term").to_pylist(), dtype=object)
        d_bufs = group.column("docids").to_pylist()
        t_bufs = group.column("tfs").to_pylist()
        m_bufs = group.column("norms").to_pylist()
        p_bufs = group.column("positions").to_pylist() if store_positions else None

        def term_groups():
            keys = np.array([t.encode("utf-8") for t in terms_arr], dtype=object)
            order = np.argsort(keys, kind="stable")
            keys_s = keys[order]
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and keys_s[j] == keys_s[i]:
                    j += 1
                rows_idx = order[i:j]
                d = np.concatenate([np.frombuffer(d_bufs[r], dtype="<i4") for r in rows_idx]).astype(np.int64)
                t = np.concatenate([np.frombuffer(t_bufs[r], dtype="<u2") for r in rows_idx]).astype(np.int64)
                m = np.concatenate([np.frombuffer(m_bufs[r], dtype=np.uint8) for r in rows_idx]).astype(np.int64)
                p = None
                if p_bufs is not None:
                    p = np.concatenate([np.frombuffer(p_bufs[r], dtype="<u2") for r in rows_idx]).astype(np.int64)
                if len(rows_idx) > 1:
                    ds_order = np.argsort(d, kind="stable")  # batches interleave docid ranges
                    if p is not None:
                        offs = np.concatenate([[0], np.cumsum(t)])
                        lens = t[ds_order]
                        grp_off = np.concatenate([[0], np.cumsum(lens)])
                        idx = np.repeat(offs[:-1][ds_order], lens) + (
                            np.arange(int(lens.sum())) - np.repeat(grp_off[:-1], lens)
                        )
                        p = p[idx]
                    d, t, m = d[ds_order], t[ds_order], m[ds_order]
                if p is not None:
                    yield keys_s[i].decode("utf-8"), d, t, m, p
                else:
                    yield keys_s[i].decode("utf-8"), d, t, m
                i = j

        from lucene_solr_ray.segment import write_segment_grouped

        meta = write_segment_grouped(
            seg_dir,
            term_groups(),
            codec_name=codec_name,
            lineage=dict(lineage, bucket=bucket),
        )
        return pa.table(
            {
                "partition": pa.array([partition], type=pa.int32()),
                "bucket": pa.array([bucket], type=pa.int64()),
                "name": pa.array([name]),
                "n_terms": pa.array([meta["n_terms"]], type=pa.int64()),
                "n_postings": pa.array([meta["n_postings"]], type=pa.int64()),
                "sum_tf": pa.array([meta["sum_tf"]], type=pa.int64()),
                "postings_bytes": pa.array([meta["postings_bytes"]], type=pa.int64()),
                "postings_crc32": pa.array([meta["postings_crc32"]], type=pa.int64()),
                "docid_min": pa.array([meta["docid_min"]], type=pa.int64()),
                "docid_max": pa.array([meta["docid_max"]], type=pa.int64()),
                "wall_s": pa.array([time.perf_counter() - t0], type=pa.float64()),
            }
        )

    return write_bucket_segment


_STATS_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("bucket", pa.int64()),
        ("name", pa.string()),
        ("n_terms", pa.int64()),
        ("n_postings", pa.int64()),
        ("sum_tf", pa.int64()),
        ("postings_bytes", pa.int64()),
        ("postings_crc32", pa.int64()),
        ("docid_min", pa.int64()),
        ("docid_max", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


def _make_partition_writer(index_dir: str, generation: int, salt: int, codec_name: str,
                           lineage: dict, store_positions: bool = False):
    """Partition-level writer for the hash shuffle: one map task per hash
    partition, grouping its block by bucket locally (replaces
    GroupedData.map_groups, whose aggregator-side sort crashes on hash
    partitions that received zero rows — their blocks have no schema)."""
    write_one = _make_segment_writer(index_dir, generation, salt, codec_name,
                                     lineage, store_positions)

    def write_partition(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:  # partition owned no live bucket
            return _STATS_SCHEMA.empty_table()
        buckets = block.column("bucket").to_numpy()
        order = np.argsort(buckets, kind="stable")
        b_s = buckets[order]
        starts = np.flatnonzero(np.concatenate([[True], b_s[1:] != b_s[:-1]]))
        bounds = np.append(starts, len(b_s))
        out = []
        for i in range(len(starts)):
            out.append(write_one(block.take(order[bounds[i] : bounds[i + 1]])))
        return pa.concat_tables(out)

    return write_partition


def build_index(
    input_path,
    index_dir: str,
    num_partitions: int = 16,
    salt: int = 1,
    codec_name: str = DEFAULT_POSTINGS_CODEC,
    resume: bool = True,
    analyze_batch_size: int | None = 8192,
    docid_mode: str = "conv-base",
    store_positions: bool = False,
    store_term_vectors: bool = False,
    append: bool = False,
    text_column: str = "text",
    analyzer: str = "standard",
    store_docs: bool = True,
) -> dict:
    """Full build -> committed manifest dict. Ray must be initialised by
    the caller (driver/bench/tests own the session).

    ``text_column``/``analyzer`` make this the per-field build primitive
    for build_multifield_index ([U] PerFieldAnalyzerWrapper): index any
    string column through any ANALYZERS chain. ``store_docs=False``
    skips the stored-fields/TV side-writes (a secondary field of a
    multi-field index shares the primary field's stored docs — storing
    text once, not once per field). Non-standard analyzers don't
    support store_positions (the positional inverter is the vectorized
    canonical chain).

    ``append=True`` is the IndexWriter.addIndexes / incremental-append
    path: new documents get docIDs after the existing index's maxDoc
    (Lucene arrival-order semantics), new segments join the manifest in a
    new generation, and global stats (n_docs, sum_dl) accumulate. The
    appended docid range is disjoint from every existing segment, so
    per-term posting lists still concatenate in docid order at read/merge
    time. Partitioning parameters must match the existing index."""
    from lucene_solr_ray.state.manifest import load_manifest

    os.makedirs(index_dir, exist_ok=True)
    docs_dir = os.path.join(index_dir, DOCS_DIRNAME)
    tvs_dir = os.path.join(index_dir, "tvs")
    base_offset = 0
    prev_manifest = None
    generation = 0  # fresh-build generation; merges bump via commit_manifest
    # index-time sorting ([U] lucene/core/.../index/IndexWriterConfig.java
    # setIndexSort): docid order == (field, conv_id, turn_idx) order, so a
    # query sorted by that field early-terminates after k matches in docid
    # order (EarlyTerminatingSortingCollector semantics). Spelled
    # docid_mode="sorted-by:<field>[:desc]"; recorded in the manifest so
    # the query side can prove the sort before early-terminating.
    index_sort = None
    if docid_mode.startswith("sorted-by:"):
        spec = docid_mode.split(":")
        index_sort = {"field": spec[1],
                      "descending": len(spec) > 2 and spec[2] == "desc"}
        if append:
            raise ValueError(
                "append would place new docids after maxDoc, breaking the "
                "global index sort — rebuild or use an unsorted index"
            )
    if append:
        prev_manifest = load_manifest(index_dir)
        if (
            prev_manifest["num_partitions"] != num_partitions
            or prev_manifest["salt"] != salt
            or prev_manifest["codec"] != codec_name
        ):
            raise ValueError(
                "append requires matching num_partitions/salt/codec with the existing index"
            )
        base_offset = prev_manifest["n_docs"]
        generation = prev_manifest["generation"] + 1

    t_start = time.perf_counter()
    ncpus = int(ray.cluster_resources().get("CPU", 8))
    if isinstance(input_path, (str, list)):
        # oversplit the read so the analyze stage load-balances (tail
        # tasks otherwise straggle when blocks == CPUs); a non-stored
        # (secondary-field) build prunes the read to the docid keys +
        # its own text column — the other fields' payloads never leave
        # storage
        cols = None if store_docs else ["conv_id", "turn_idx", text_column]
        ds = read_parquet_clean(input_path, columns=cols,
                                override_num_blocks=max(64, 4 * ncpus))
    else:
        ds = input_path
    base_ref = None
    if docid_mode in ("conv-base", "conv-base-join"):
        # docID = base[conv_id] + turn_idx without sorting the corpus:
        # a per-conversation combine + prefix sum replaces the
        # full-corpus range exchange, so analyze/shuffle stream end to end.
        # Valid iff turn_idx is dense 0..n-1 per conversation (checked);
        # falls back to the sort path otherwise.
        #
        # Two variants:
        # - "conv-base" (default at sandbox scale): driver combines the
        #   tiny per-block partials and broadcasts (conv_sorted, bases)
        #   numpy arrays. Right up to ~10^7 conversations.
        # - "conv-base-join": the two-level distributed prefix sum — a
        #   distributed groupby + conv_id sort builds per-conv counts,
        #   the driver pulls ONLY per-block totals (ints) for the first
        #   prefix level, each block computes its in-block bases, and
        #   the (conv_id, base) dataset hash-joins the corpus. No
        #   conversation-sized structure ever lands on the driver —
        #   the 10^12-turn path.
        def _conv_partial(t: pa.Table) -> pa.Table:
            # map-side combine on pruned columns: one row per (block, conv)
            t = t.select(["conv_id", "turn_idx"])
            g = pa.TableGroupBy(t, ["conv_id"]).aggregate(
                [("turn_idx", "count"), ("turn_idx", "max")]
            )
            return g.rename_columns(["conv_id", "n", "max_ti"])

        if isinstance(input_path, (str, list)):
            key_ds = read_parquet_clean(input_path, columns=["conv_id", "turn_idx"])
        else:
            key_ds = ds.select_columns(["conv_id", "turn_idx"])
    if docid_mode == "conv-base-join":
        from ray.data.aggregate import Max as _Max
        from ray.data.aggregate import Sum as _Sum

        agg = (
            key_ds.map_batches(
                _conv_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
            .groupby("conv_id")
            .aggregate(_Sum("n", alias_name="n"), _Max("max_ti", alias_name="max_ti"))
        )
        sorted_refs = agg.sort("conv_id").to_arrow_refs()
        stats = ray.get([_conv_block_stats.remote(r) for r in sorted_refs])
        if sum(bad for _, bad in stats) > 0:
            docid_mode = "sort"  # sparse turn_idx -> need the global sort
        else:
            totals = [t for t, _ in stats]
            n_docs = int(sum(totals))
            block_offsets = np.concatenate([[0], np.cumsum(totals)])[:-1] + base_offset
            conv_base_ds = ray.data.from_arrow_refs(
                [_conv_block_bases.remote(r, int(o)) for r, o in zip(sorted_refs, block_offsets)]
            )
            docs_ds = ds.join(
                conv_base_ds, "inner",
                num_partitions=max(8, ncpus // 2),
                on=("conv_id",),
            )
    if docid_mode == "conv-base":
        # final combine on the driver (partials are tiny); a distributed
        # groupby here costs more than the whole build at this cardinality
        partial_tables = [
            b
            for b in key_ds.map_batches(
                _conv_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ]
        # all-C combine: Arrow dictionary-encode factorizes the conv ids,
        # bincount/maximum.at aggregate over the codes
        _all = pa.concat_tables(partial_tables)
        _enc = _all.column("conv_id").combine_chunks().dictionary_encode()
        _codes = _enc.indices.to_numpy()
        _uniq = np.asarray(_enc.dictionary.to_pylist(), dtype=str)
        _n = np.bincount(_codes, weights=_all.column("n").to_numpy()).astype(np.int64)
        _mx = np.full(len(_uniq), -1, dtype=np.int64)
        np.maximum.at(_mx, _codes, _all.column("max_ti").to_numpy().astype(np.int64))
        if (_mx != _n - 1).any():
            docid_mode = "sort"  # sparse turn_idx -> need the global sort
        else:
            _order = np.argsort(_uniq, kind="stable")
            conv_sorted = _uniq[_order]
            counts_arr = _n[_order]
            n_docs = int(counts_arr.sum())
            bases_arr = np.concatenate([[0], np.cumsum(counts_arr)])[:-1] + base_offset
            # broadcast as numpy arrays (near-zero-copy per task) and look
            # up via searchsorted — a Python dict would cost an unpickle
            # per task and a per-row hash probe
            base_ref = ray.put((conv_sorted, bases_arr))
            docs_ds = ds
    if docid_mode == "sort" or index_sort is not None:
        if index_sort is not None:
            # global distributed sort by (field, conv_id, turn_idx): Ray's
            # range-partitioned sort keeps blocks ordered, so the same
            # per-block-count prefix sum assigns docids in sort order
            sorted_ds = ds.sort(
                [index_sort["field"], "conv_id", "turn_idx"],
                descending=[index_sort["descending"], False, False],
            )
        else:
            sorted_ds = ds.sort(["conv_id", "turn_idx"])
        refs = sorted_ds.to_arrow_refs()
        counts = ray.get([_num_rows.remote(r) for r in refs])
        n_docs = int(sum(counts))
        bases = np.concatenate([[0], np.cumsum(counts)])[:-1] + base_offset
        doc_refs = [_add_docid.remote(r, int(b)) for r, b in zip(refs, bases)]
        docs_ds = ray.data.from_arrow_refs(doc_refs)
    sort_wall_s = time.perf_counter() - t_start

    # resume: segments whose bucket dirs are already complete on disk
    total_buckets = num_partitions * salt
    done: dict[int, str] = {}
    if resume:
        for bucket in range(total_buckets):
            name = segment_name(generation, bucket)
            if segment_is_complete(segment_dir(index_dir, bucket // salt, name)):
                done[bucket] = name
    if analyzer != "standard" and (store_positions or store_term_vectors):
        raise ValueError(
            "store_positions/store_term_vectors require the standard "
            "analyzer (the positional inverter is the canonical chain)")
    docs_marker = os.path.join(index_dir, "docs.complete")
    write_docs = store_docs and (append or not os.path.exists(docs_marker)
                                 or not resume)
    if write_docs and not append:
        os.makedirs(docs_dir, exist_ok=True)
        for stale in os.listdir(docs_dir):  # boundaries may differ run-to-run
            os.unlink(os.path.join(docs_dir, stale))
        if os.path.exists(docs_marker):
            os.unlink(docs_marker)
    if store_term_vectors and write_docs:
        os.makedirs(tvs_dir, exist_ok=True)
        if not append:
            for stale in os.listdir(tvs_dir):
                os.unlink(os.path.join(tvs_dir, stale))

    # salt over the newly-assigned docid range [base_offset, base_offset+n_docs)
    salt_range = max(1, -(-(base_offset + n_docs) // salt))
    t0 = time.perf_counter()
    analyzed = docs_ds.map_batches(
        _AnalyzeStage(docs_dir, num_partitions, salt, salt_range, write_docs,
                      frozenset(done), base_ref, store_positions,
                      store_term_vectors, tvs_dir, text_column, analyzer),
        batch_format="pyarrow",
        batch_size=analyze_batch_size,
        zero_copy_batch=True,
    )
    lineage = {"input": str(input_path), "n_docs": n_docs, "num_partitions": num_partitions, "salt": salt}
    # hash shuffle streams analyze output into aggregator actors; the
    # default sort shuffle materializes the whole postings stream before
    # sampling boundaries (a hard barrier between the two stages).
    # GroupedData.map_groups dispatches on the DATASET's captured
    # DataContext (a creation-time snapshot — mutating the global
    # context here has no effect), so set the strategy on the
    # dataset's own context; explicit num_partitions bounds the
    # aggregator-actor count (the default parallelism requests more
    # aggregators than small-CPU sessions can schedule and stalls).
    from ray.data.context import ShuffleStrategy

    prev_strategy = analyzed.context.shuffle_strategy
    analyzed.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    shuffle_partitions = min(total_buckets, max(8, ncpus))
    try:
        # hash-repartition by bucket (sort=False: the aggregator-side
        # sort_by crashes on zero-row partitions) + a partition-level
        # writer that groups by bucket locally
        shuffled = analyzed.repartition(shuffle_partitions, keys=["bucket"], sort=False)
        out_ds = shuffled.map_batches(
            _make_partition_writer(index_dir, generation, salt, codec_name, lineage,
                                   store_positions),
            batch_size=None,
            batch_format="pyarrow",
        )
        stats_rows = out_ds.take_all()
        if os.environ.get("LSR_BUILD_STATS"):
            import sys as _sys

            print(out_ds.stats(), file=_sys.stderr)
    finally:
        analyzed.context.shuffle_strategy = prev_strategy
    build_wall_s = time.perf_counter() - t0

    if write_docs:
        with open(docs_marker, "w") as fh:
            fh.write("ok")

    # fail LOUDLY if any bucket produced more than one stats row: the
    # partition writer assumes each bucket's rows arrive in exactly one
    # block (true for Ray 2.49's hash-shuffle finalize, which emits one
    # block per partition — but there is an upstream TODO to split big
    # blocks). A straddled bucket means write_segment_grouped rmtree+
    # renamed the same seg_dir twice (each half overwriting the other):
    # remove the half-written segments and abort BEFORE the manifest
    # commit so no generation ever references them.
    seen_buckets: dict[int, int] = {}
    for row in stats_rows:
        seen_buckets[int(row["bucket"])] = seen_buckets.get(int(row["bucket"]), 0) + 1
    dup = sorted(b for b, c in seen_buckets.items() if c > 1) + sorted(
        b for b in seen_buckets if b in done
    )
    if dup:
        for row in stats_rows:
            if int(row["bucket"]) in dup:
                shutil.rmtree(
                    segment_dir(index_dir, int(row["partition"]), row["name"]),
                    ignore_errors=True,
                )
        raise RuntimeError(
            f"build shuffle emitted multiple blocks for bucket(s) {dup[:8]} "
            "(hash-shuffle one-block-per-partition assumption violated, or a "
            "resumed bucket was rewritten); half-written segments removed, "
            "manifest not committed — re-run the build"
        )

    segments = []
    for row in sorted(stats_rows, key=lambda r: r["bucket"]):
        segments.append(
            {
                "partition": int(row["partition"]),
                "name": row["name"],
                "n_terms": int(row["n_terms"]),
                "n_postings": int(row["n_postings"]),
                "sum_tf": int(row["sum_tf"]),
                "postings_bytes": int(row["postings_bytes"]),
                "postings_crc32": int(row["postings_crc32"]),
                "docid_min": int(row["docid_min"]),
                "docid_max": int(row["docid_max"]),
                "wall_s": float(row["wall_s"]),
            }
        )
    # resumed buckets: carry stats from their on-disk meta
    import json

    for bucket, name in sorted(done.items()):
        seg_dir = segment_dir(index_dir, bucket // salt, name)
        with open(os.path.join(seg_dir, "meta.json")) as fh:
            meta = json.load(fh)
        segments.append(
            {
                "partition": bucket // salt,
                "name": name,
                "n_terms": meta["n_terms"],
                "n_postings": meta["n_postings"],
                "sum_tf": meta["sum_tf"],
                "postings_bytes": meta["postings_bytes"],
                "postings_crc32": meta["postings_crc32"],
                "docid_min": meta["docid_min"],
                "docid_max": meta["docid_max"],
                "wall_s": 0.0,
                "resumed": True,
            }
        )
    carry: dict = {}
    if append and prev_manifest is not None:
        segments.extend(prev_manifest["segments"])
        # tombstones survive an append: carry the deletes/purged tables
        # forward (an atomic update = delete old version + append new —
        # dropping the tombstones here would resurrect the old version)
        for key in ("deletes_file", "purged_file", "n_deleted", "n_docs_purged"):
            if key in prev_manifest:
                carry[key] = prev_manifest[key]
    segments.sort(key=lambda s: (s["partition"], s["name"]))
    sum_dl = sum(s["sum_tf"] for s in segments)

    manifest = {
        **carry,
        "n_docs": base_offset + n_docs,
        "sum_dl": sum_dl,
        "num_partitions": num_partitions,
        "salt": salt,
        "codec": codec_name,
        "analysis": "standard-v1" if analyzer == "standard" else analyzer,
        **({"text_column": text_column} if text_column != "text" else {}),
        "docid_mode": docid_mode,
        **({"index_sort": index_sort} if index_sort is not None else {}),
        "positions": store_positions,
        "term_vectors": store_term_vectors,
        "segments": segments,
        "metrics": {
            "sort_wall_s": sort_wall_s,
            "build_wall_s": build_wall_s,
            "turns_per_s": n_docs / build_wall_s if build_wall_s > 0 else None,
            "resumed_buckets": sorted(done),
            "max_segment_wall_s": max((s["wall_s"] for s in segments), default=0.0),
        },
    }
    gen = commit_manifest(index_dir, manifest)
    manifest["generation"] = gen
    return manifest
