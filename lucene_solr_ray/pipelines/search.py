"""Query engine — SURVEY.md §3 Trace B.

Reference analogues:
- IndexSearcher + Weight/Scorer protocol: [U] lucene/core/.../search/IndexSearcher.java
- global term stats before scoring (idf is index-global):
  [U] lucene/core/.../index/TermStates.java — here df/cf sum over the
  term's partition segments; N/avgdl come from the manifest.
- block-max WAND (LUCENE-8135): [U] .../search/WANDScorer.java,
  ImpactsDISI.java, MaxScoreCache.java. Implemented here as a
  *block-granular window* variant: docid space advances window by window
  (window end = min over active terms of current block's last_docid);
  a window is decoded + scored only if the sum of the terms' per-block
  impact upper bounds exceeds the current k-th heap score, otherwise the
  whole window is skipped undecoded. Skipping is exact because windows
  advance in docid order: any later doc must strictly beat the k-th
  (score desc, docid asc) entry to enter the top-k.
- conjunction: [U] .../search/ConjunctionDISI.java — rarest-first block
  leapfrog via searchsorted on skip tables; only blocks containing
  candidates are decoded.
- collector: [U] .../search/TopScoreDocCollector.java — score desc,
  docID asc tie-break.

Scoring parity: per-doc score = float32 accumulation of per-term float32
contributions in ascending UTF-8 term order — bit-identical to
oracle.Oracle by shared similarity.py code (FIXTURES.md §3).

Ray query path: queries are data — ``map_batches(QueryExecutor,
concurrency=N)`` actor pool; each actor lazily opens/caches segment
readers (segments are immutable, so caching is trivially safe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_ray import similarity as sim
from lucene_solr_ray.oracle import analyze_query_terms, topk_order
from lucene_solr_ray.pipelines.build import SEGMENTS_DIRNAME, stable_term_hash
from lucene_solr_ray.segment import SegmentReader
from lucene_solr_ray.state.manifest import load_manifest

import os


def _levenshtein_leq(a: str, b: str, maxd: int) -> bool:
    """Classic Levenshtein distance <= maxd, banded DP with early exit
    (the automaton-free FuzzyQuery predicate; [U] lucene/core/.../util/
    automaton/LevenshteinAutomata.java is the reference shape)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > maxd:
        return False
    if la == 0 or lb == 0:
        return max(la, lb) <= maxd
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if cur.min() > maxd:
            return False
        prev, cur = cur, prev
    return int(prev[lb]) <= maxd


class TermCursor:
    """One logical posting list for a term: its segments within the
    term's partition, docid-disjoint and ascending (build salt ranges /
    merged generations), exposed as one concatenated block sequence."""

    __slots__ = ("cursors", "blk_cursor", "blk_local", "last_docid", "max_tf", "min_norm", "n_docs", "_decoded")

    def __init__(self, cursors):
        self.cursors = cursors
        self._decoded = None
        per = [(i, c.skip) for i, c in enumerate(cursors) if c.n_docs > 0]
        if per:
            self.blk_cursor = np.concatenate([np.full(len(s), i, dtype=np.int32) for i, s in per])
            self.blk_local = np.concatenate([np.arange(len(s), dtype=np.int32) for _, s in per])
            self.last_docid = np.concatenate([s["last_docid"].astype(np.int64) for _, s in per])
            self.max_tf = np.concatenate([s["max_tf"].astype(np.int64) for _, s in per])
            self.min_norm = np.concatenate([s["min_norm"].astype(np.int64) for _, s in per])
        else:
            self.blk_cursor = np.empty(0, dtype=np.int32)
            self.blk_local = np.empty(0, dtype=np.int32)
            self.last_docid = np.empty(0, dtype=np.int64)
            self.max_tf = np.empty(0, dtype=np.int64)
            self.min_norm = np.empty(0, dtype=np.int64)
        self.n_docs = sum(c.n_docs for c in cursors)

    @property
    def n_blocks(self) -> int:
        return len(self.last_docid)

    def block(self, g: int):
        return self.cursors[self.blk_cursor[g]].block(int(self.blk_local[g]))

    def block_ubs(self, w: np.float32, cache: np.ndarray, simcls=sim.BM25) -> np.ndarray:
        """float64 per-block score upper bounds from impacts."""
        return simcls.block_upper_bounds(w, self.max_tf, self.min_norm, cache)

    def decode_all(self):
        """Full decode, memoized — cursors are cached per searcher, so a
        hot term's list is decoded once per actor, not once per query."""
        if getattr(self, "_decoded", None) is None:
            parts = [c.codec.decode(c.blob) for c in self.cursors]
            if not parts:
                z = np.empty(0, dtype=np.int64)
                self._decoded = (z, z.copy(), z.copy())
            else:
                self._decoded = tuple(
                    np.concatenate([p[i] for p in parts]) for i in range(3)
                )
        return self._decoded

    def docids_in_blocks(self, blocks: np.ndarray):
        """Concatenated (docids, tfs, norms) of the given block indices
        (ascending)."""
        parts = [self.block(int(g)) for g in blocks]
        if not parts:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))

    def gather(self, docids: np.ndarray):
        """(tfs, norms) for docids ALL present in this list (intersection
        results). Decodes only the blocks containing them — unless the
        list is already fully decoded (warmed hot term), in which case
        one searchsorted into the memoized arrays suffices."""
        if self._decoded is not None:
            d, t, m = self._decoded
            pos = np.searchsorted(d, docids)
            return t[pos], m[pos]
        blocks = np.unique(np.searchsorted(self.last_docid, docids, side="left"))
        d, t, m = self.docids_in_blocks(blocks)
        pos = np.searchsorted(d, docids)
        return t[pos], m[pos]

    def probe(self, docids: np.ndarray):
        """Membership probe for an ascending candidate array that may
        contain non-members: -> (mask, tfs, norms) with tfs/norms zero
        where mask is False. Decodes only blocks containing candidates —
        the DISI advance(target) analogue for batch candidates."""
        n = len(docids)
        mask = np.zeros(n, dtype=bool)
        tfs = np.zeros(n, dtype=np.int64)
        norms = np.zeros(n, dtype=np.int64)
        if n == 0 or self.n_blocks == 0:
            return mask, tfs, norms
        if self._decoded is not None:  # warmed hot term: no block decode
            d, t, m = self._decoded
            pos = np.minimum(np.searchsorted(d, docids), len(d) - 1)
            hit = d[pos] == docids
            mask[hit] = True
            tfs[hit] = t[pos[hit]]
            norms[hit] = m[pos[hit]]
            return mask, tfs, norms
        blocks = np.searchsorted(self.last_docid, docids, side="left")
        ok = blocks < self.n_blocks
        if not ok.any():
            return mask, tfs, norms
        need = np.unique(blocks[ok])
        d, t, m = self.docids_in_blocks(need)
        pos = np.searchsorted(d, docids[ok])
        pos = np.minimum(pos, len(d) - 1)
        hit = d[pos] == docids[ok]
        idx = np.flatnonzero(ok)[hit]
        mask[idx] = True
        tfs[idx] = t[pos[hit]]
        norms[idx] = m[pos[hit]]
        return mask, tfs, norms


class _PositionalView:
    """Merged per-term view over a partition's segments for positional
    queries: global docid/norm arrays plus lazy per-segment position
    blobs (decoded per doc on demand)."""

    __slots__ = ("segs", "docids", "norms", "_pos_blobs")

    def __init__(self, entries):
        self.segs = []
        ds, ms = [], []
        self._pos_blobs = {}
        for r, i in entries:
            d, t, m = r.postings(i)
            prefix = np.concatenate([[0], np.cumsum(t)])
            self.segs.append((d, prefix, r, i))
            ds.append(d)
            ms.append(m)
        self.docids = np.concatenate(ds) if ds else np.empty(0, dtype=np.int64)
        self.norms = np.concatenate(ms) if ms else np.empty(0, dtype=np.int64)

    def positions(self, docid: int) -> np.ndarray:
        from lucene_solr_ray.codec.packedints import decode_range

        for si, (d, prefix, r, i) in enumerate(self.segs):
            j = int(np.searchsorted(d, docid))
            if j < len(d) and d[j] == docid:
                blob = self._pos_blobs.get(si)
                if blob is None:
                    blob = r.read_pos_blob(i)
                    self._pos_blobs[si] = blob
                return decode_range(blob, int(prefix[j]), int(prefix[j + 1]))
        return np.empty(0, dtype=np.int64)

    def norm_of(self, docid: int) -> int:
        j = int(np.searchsorted(self.docids, docid))
        return int(self.norms[j])


class IndexSearcher:
    def __init__(self, index_dir: str, generation: int | None = None,
                 similarity: str = "bm25", warm: bool = False):
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir, generation)
        self.n_docs = self.manifest["n_docs"]  # maxDoc: allocation bound, docids stable
        self.sum_dl = self.manifest["sum_dl"]
        self.num_partitions = self.manifest["num_partitions"]
        # scoring doc count = docCount: excludes docs purged at merge
        # (deleted-but-unpurged docs still count — Lucene stats semantics)
        self.n_scoring = self.n_docs - int(self.manifest.get("n_docs_purged", 0))
        self.avgdl = self.sum_dl / self.n_scoring if self.n_scoring else 1.0
        # per-field analyzer parity at query time ([U] PerFieldAnalyzer-
        # Wrapper: the query parser analyzes with the FIELD's chain): a
        # sub-index built with a non-standard analyzer analyzes its raw
        # query terms through the same chain; None = canonical path
        _analysis = self.manifest.get("analysis", "standard-v1")
        if _analysis in ("standard-v1", "standard"):
            self._qanalyzer = None
        else:
            from lucene_solr_ray.analysis import get_analyzer

            self._qanalyzer = get_analyzer(_analysis)
        # pluggable Similarity (SURVEY §2.11); BM25 is the parity-pinned default
        self.simcls = sim.get_similarity(similarity)
        self.cache = self.simcls.denom_cache(self.avgdl)
        self._by_partition: dict[int, list[dict]] = {}
        for seg in self.manifest["segments"]:
            self._by_partition.setdefault(seg["partition"], []).append(seg)
        for segs in self._by_partition.values():
            # per-term docid order across a partition's segments: salt ranges /
            # merged generations are docid-disjoint, so docid_min orders them
            segs.sort(key=lambda s: (s["docid_min"], s["name"]))
        # non-live docids = active tombstones UNION docs purged by a past
        # expunge: purged docs' postings are gone (term queries can't see
        # them) but their docs.parquet rows remain, so match_all/ts-range/
        # docvalues paths must keep filtering them via this same set.
        from lucene_solr_ray.pipelines.deletes import load_deletes, load_purged

        tomb = load_deletes(index_dir, self.manifest)
        purged = load_purged(index_dir, self.manifest)
        if tomb is not None and purged is not None:
            self.deleted = np.union1d(tomb, purged)
        else:
            self.deleted = purged if tomb is None else tomb
        self._readers: dict[str, SegmentReader] = {}
        # decoded-postings cache: term -> (df, cf, TermCursor). Bounded by
        # total cached postings; segments are immutable so reuse is safe
        # (the IndexSearcher/QueryExecutor actor's "hot lists" cache).
        self._term_cache: dict[str, tuple] = {}
        self._term_cache_postings = 0
        self.term_cache_budget = 20_000_000
        # dense-path scored vectors: term -> float32 scores aligned with
        # decode_all()[0]. Valid for the searcher's lifetime: w depends
        # only on global (df, cf, n_scoring, sum_dl) and segments are
        # immutable. Budgeted separately (4 bytes/posting).
        self._dense_scores: dict[str, np.ndarray] = {}
        self._dense_scores_postings = 0
        if warm:
            self.warm_readers()
            self.warm_hot_terms()

    def warm_readers(self) -> None:
        """Eagerly open every segment's reader (term dict into memory) —
        [U] lucene/core/.../index/DirectoryReader.java opens all
        SegmentReaders at reader-open time, so the first query never pays
        dictionary-load latency. Parallel threads: pq.read_table releases
        the GIL. Called from QueryExecutor.__init__ (once per actor) and
        from latency-sensitive drivers; one-shot searchers skip it."""
        from concurrent.futures import ThreadPoolExecutor

        todo = [
            (p, seg["name"])
            for p, segs in self._by_partition.items()
            for seg in segs
            if f"{p}/{seg['name']}" not in self._readers
        ]
        if not todo:
            return
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(todo)))) as ex:
            for (p, name), r in zip(
                todo,
                ex.map(
                    lambda pn: SegmentReader(
                        os.path.join(
                            self.index_dir, SEGMENTS_DIRNAME, f"p{pn[0]:04d}", pn[1]
                        )
                    ),
                    todo,
                ),
            ):
                self._readers[f"{p}/{name}"] = r

    def warm_hot_terms(self, min_frac: float = 1 / 32) -> None:
        """Pre-decode + pre-score the Zipf-hot posting lists (global
        df >= n_docs * min_frac — the dense-scan trigger band) so no
        query ever pays a hot list's first-touch decode. The cache
        budget still bounds memory; rare terms stay lazy. Lucene's
        analogue is index warming on reader open
        ([U] lucene/core/.../index/IndexWriter.java IndexReaderWarmer)."""
        thresh = max(2, int(self.n_docs * min_frac))
        for p, segs in self._by_partition.items():
            df_by_key: dict[bytes, int] = {}
            for seg in segs:
                r = self._reader(p, seg["name"])
                for i in np.flatnonzero(r.df >= max(1, thresh // len(segs))):
                    k = r._term_keys[i]
                    df_by_key[k] = df_by_key.get(k, 0) + int(r.df[i])
            for k, df in df_by_key.items():
                if df < thresh:
                    continue
                term = k.decode("utf-8")
                tdf, tcf, cur = self.term_stats_and_cursor(term)
                if cur is None:
                    continue
                d, tf, m = cur.decode_all()
                if (term not in self._dense_scores
                        and self._dense_scores_postings + len(d)
                        <= self.term_cache_budget):
                    self._dense_scores[term] = self.simcls.score_term(
                        self._term_w(tdf, tcf), tf, m, self.cache)
                    self._dense_scores_postings += len(d)

    def _reader(self, partition: int, name: str) -> SegmentReader:
        key = f"{partition}/{name}"
        r = self._readers.get(key)
        if r is None:
            r = SegmentReader(
                os.path.join(self.index_dir, SEGMENTS_DIRNAME, f"p{partition:04d}", name)
            )
            self._readers[key] = r
        return r

    def _term_w(self, df: int, cf: int):
        """Per-term weight under the configured similarity (LM models
        consume cf/sum_dl via the shared weight_for — SURVEY §2.11)."""
        return sim.weight_for(self.simcls, self.n_scoring, df, cf, self.sum_dl)

    def term_stats_and_cursor(self, term: str):
        """-> (global df, global cf, TermCursor) — TermStates.build."""
        hit = self._term_cache.get(term)
        if hit is not None:
            return hit
        part = int(stable_term_hash(np.array([term], dtype=object))[0]) % self.num_partitions
        cursors = []
        df = 0
        cf = 0
        from lucene_solr_ray.codec.postings import PostingsCursor

        for seg in self._by_partition.get(part, ()):
            r = self._reader(part, seg["name"])
            i = r.lookup(term)
            if i is not None:
                df += int(r.df[i])
                cf += int(r.cf[i])
                cursors.append(PostingsCursor(r.read_blob(i), r.codec))
        out = (df, cf, TermCursor(cursors) if cursors else None)
        if self._term_cache_postings + df <= self.term_cache_budget:
            self._term_cache[term] = out
            self._term_cache_postings += df
        return out

    def _live(self, d: np.ndarray) -> np.ndarray:
        """Drop tombstoned docids — the liveDocs filter every collector
        applies before a doc can enter the top-k."""
        if self.deleted is None or len(d) == 0 or len(self.deleted) == 0:
            return d
        pos = np.searchsorted(self.deleted, d)
        pos = np.minimum(pos, len(self.deleted) - 1)
        return d[self.deleted[pos] != d]

    def _live_mask(self, d: np.ndarray) -> np.ndarray:
        if self.deleted is None or len(self.deleted) == 0:
            return np.ones(len(d), dtype=bool)
        pos = np.searchsorted(self.deleted, d)
        pos = np.minimum(pos, len(self.deleted) - 1)
        return self.deleted[pos] != d

    # ---------------- public search ----------------

    def _analyze_query(self, raw_terms) -> list[str]:
        if self._qanalyzer is None:
            return analyze_query_terms(raw_terms)
        out: set[str] = set()
        for raw in raw_terms:
            out.update(self._qanalyzer(raw))
        return sorted(out, key=lambda t: t.encode("utf-8"))

    def search(self, raw_terms, k: int = 10, mode: str = "or", algorithm: str = "auto",
               docid_range: tuple | None = None):
        """-> (docids int64, scores float32) top-k, score desc / docid asc.

        ``docid_range=(lo, hi)``: score only docids in [lo, hi) — the
        per-query leaf-slice unit ([U] lucene/core/.../search/
        IndexSearcher.java slices a hot query across leaf ranges and
        merges k-heaps). Slicing forces the dense paths (it exists for
        the hot queries where dense fires anyway); per-doc scores are
        independent of the slicing, so a merge of slice top-ks is
        bit-equal to the unsliced top-k (run_queries slices=N)."""
        terms = self._analyze_query(raw_terms)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        weighted = []  # (term, w, cursor) in ascending UTF-8 term order
        for t in terms:
            df, cf, cur = self.term_stats_and_cursor(t)
            if cur is None:
                if mode == "and":
                    return empty
                continue
            weighted.append((t, self._term_w(df, cf), cur))
        if not weighted:
            return empty
        if docid_range is not None:
            if algorithm not in ("auto", "dense"):
                raise ValueError("docid_range slicing supports the dense paths only")
            if mode == "and":
                return self._search_and_dense(weighted, k, docid_range)
            return self._search_or_dense(weighted, k, docid_range)
        if algorithm == "auto":
            # dense O(N) scan beats skipping once the lists cover a large
            # fraction of the corpus (Zipf-hot terms): WAND windows would
            # decode nearly everything anyway, with per-window overhead.
            if mode == "and":
                # measured crossover at rarest coverage ~0.3% (800k docs:
                # wand ~0.55 us/rarest-posting vs dense ~1 ns/doc base);
                # 256x (0.39%) is safely past it at any N
                rarest = min(c.n_docs for _, _, c in weighted)
                algorithm = "dense" if rarest * 256 > self.n_docs else "wand"
            else:
                # crossover measured at ~1% coverage (dense is one
                # vectorized scatter-add/list vs per-window Python in
                # WAND; its N-term is ~2 ns/doc) — 32x (3.1%) is safely
                # past it at any N since both sides scale with total
                total = sum(c.n_docs for _, _, c in weighted)
                algorithm = "dense" if total * 32 > self.n_docs else "wand"
        if mode == "and":
            if algorithm == "dense":
                return self._search_and_dense(weighted, k)
            return self._search_and(weighted, k)
        if algorithm == "exhaustive":
            return self._search_or_exhaustive(weighted, k)
        if algorithm == "dense":
            return self._search_or_dense(weighted, k)
        if len(weighted) == 1:
            return self._search_single(weighted[0], k)
        return self._search_or_wand(weighted, k)

    # ---------------- dense scan (hot/stopword-grade term lists) ----------------

    def _search_or_dense(self, weighted, k: int, docid_range: tuple | None = None):
        """Full-corpus float32 accumulator: per term (ascending order)
        scatter its scores into a dense N-vector and accumulate — float
        ops identical to the oracle's zero-padded accumulation, so scores
        stay bit-equal. Matching docs are exactly those with score > 0
        (all contributions are strictly positive). With ``docid_range``
        the accumulator covers only [lo, hi): postings are sliced by
        searchsorted AFTER scoring (score vectors are elementwise, and
        slicing post-score keeps the per-term cache shared across
        slices), so slice scores are bitwise the unsliced scores."""
        lo, hi = docid_range if docid_range is not None else (0, self.n_docs)
        acc = np.zeros(hi - lo, dtype=np.float32)
        for t, w, c in weighted:
            d, tf, m = c.decode_all()
            s = self._dense_scores.get(t)
            if s is None:
                s = self.simcls.score_term(w, tf, m, self.cache)
                if self._dense_scores_postings + len(d) <= self.term_cache_budget:
                    self._dense_scores[t] = s
                    self._dense_scores_postings += len(d)
            # scatter-add == zero-padded add bit-for-bit: docids are
            # unique per list, scores are float32 and strictly positive,
            # and x + 0.0f is the identity for x >= +0.0f
            if docid_range is not None:
                i0, i1 = np.searchsorted(d, (lo, hi))
                acc[d[i0:i1] - lo] += s[i0:i1]
            else:
                acc[d] += s
        idx = np.flatnonzero(acc > 0)
        cand = self._live(idx + lo if lo else idx)
        local = cand - lo if lo else cand
        top = topk_order(cand, acc[local], k)
        return cand[top].astype(np.int64), acc[local][top]

    def _search_and_dense(self, weighted, k: int, docid_range: tuple | None = None):
        lo, hi = docid_range if docid_range is not None else (0, self.n_docs)
        cnt = np.zeros(hi - lo, dtype=np.int16)
        decoded = []
        for _, w, c in weighted:
            d, tf, m = c.decode_all()
            if docid_range is not None:
                i0, i1 = np.searchsorted(d, (lo, hi))
                d, tf, m = d[i0:i1], tf[i0:i1], m[i0:i1]
            cnt[d - lo] += 1
            decoded.append((w, d, tf, m))
        cand = self._live((np.flatnonzero(cnt == len(weighted)) + lo).astype(np.int64))
        if len(cand) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        parts = []
        for w, d, tf, m in decoded:  # ascending term order
            pos = np.searchsorted(d, cand)
            parts.append(self.simcls.score_term(w, tf[pos], m[pos], self.cache))
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    # ---------------- single term: max-score block ordering ----------------

    def _search_single(self, weighted_term, k: int):
        """Blocks visited in impact-upper-bound order; stop as soon as the
        next bound can't beat the k-th score (MaxScoreCache shape,
        [U] lucene/core/.../search/MaxScoreCache.java). Exact: bounds are
        strict (score_upper_bound margin), so ub <= theta implies no tie."""
        t, w, c = weighted_term
        ubs = c.block_ubs(w, self.cache, self.simcls)
        order = np.argsort(-ubs, kind="stable")
        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float32)
        theta = -np.inf
        for b in order:
            if len(top_d) >= k and ubs[b] <= theta:
                break
            d, tf, m = c.block(int(b))
            if self.deleted is not None:
                lm = self._live_mask(d)
                d, tf, m = d[lm], tf[lm], m[lm]
                if len(d) == 0:
                    continue
            s = self.simcls.score_term(w, tf, m, self.cache)
            top_d = np.concatenate([top_d, d])
            top_s = np.concatenate([top_s, s])
            if len(top_d) > k:
                keep = topk_order(top_d, top_s, k)
                top_d, top_s = top_d[keep], top_s[keep]
            if len(top_d) >= k:
                theta = float(top_s.min())
        final = topk_order(top_d, top_s, k)
        return top_d[final], top_s[final]

    # ---------------- OR: block-max WAND (window variant) ----------------

    def _search_or_wand(self, weighted, k: int, chunk_blocks: int = 8):
        """Units of ``chunk_blocks`` postings blocks amortize the Python
        loop (~1k docs per decode) while per-unit impact bounds (max over
        member blocks) keep the block-max skipping exact."""
        ubs = []
        unit_last = []
        unit_lo_blk = []
        for _, w, c in weighted:
            block_ubs = c.block_ubs(w, self.cache, self.simcls)
            n_units = -(-len(block_ubs) // chunk_blocks) if len(block_ubs) else 0
            pads = n_units * chunk_blocks
            padded = np.full(pads, -np.inf)
            padded[: len(block_ubs)] = block_ubs
            ubs.append(padded.reshape(n_units, chunk_blocks).max(axis=1) if n_units else padded)
            lasts = c.last_docid[min(chunk_blocks - 1, len(block_ubs) - 1) :: chunk_blocks] \
                if len(block_ubs) else np.empty(0, dtype=np.int64)
            if n_units and len(lasts) < n_units:
                lasts = np.append(lasts, c.last_docid[-1])
            unit_last.append(lasts)
            unit_lo_blk.append(np.arange(n_units) * chunk_blocks)
        bi = [0] * len(weighted)
        active = [i for i, (_, _, c) in enumerate(weighted) if c.n_blocks > 0]
        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float32)
        theta = -np.inf
        w_lo = 0
        while active:
            w_hi = min(int(unit_last[i][bi[i]]) for i in active)
            ub_sum = float(sum(ubs[i][bi[i]] for i in active))
            if ub_sum > theta:
                window_parts = []
                for i in active:
                    _, _, c = weighted[i]
                    lo_blk = int(unit_lo_blk[i][bi[i]])
                    hi_blk = min(lo_blk + chunk_blocks, c.n_blocks)
                    d, t, m = c.docids_in_blocks(np.arange(lo_blk, hi_blk))
                    mask = (d >= w_lo) & (d <= w_hi)
                    window_parts.append((i, d[mask], t[mask], m[mask]))
                union = self._live(np.unique(np.concatenate([p[1] for p in window_parts])))
                if len(union):
                    parts = []
                    for i, d, t, m in window_parts:  # already ascending term order
                        s = np.zeros(len(union), dtype=np.float32)
                        if len(d):
                            pos = np.searchsorted(union, d)
                            pos = np.minimum(pos, len(union) - 1)
                            hit = union[pos] == d
                            s[pos[hit]] = self.simcls.score_term(
                                weighted[i][1], t[hit], m[hit], self.cache
                            )
                        parts.append(s)
                    scores = sim.accumulate(parts)
                    top_d = np.concatenate([top_d, union])
                    top_s = np.concatenate([top_s, scores])
                    if len(top_d) > k:
                        keep = topk_order(top_d, top_s, k)
                        top_d, top_s = top_d[keep], top_s[keep]
                    if len(top_d) == k:
                        theta = float(top_s.min())
            nxt = []
            for i in active:
                if int(unit_last[i][bi[i]]) == w_hi:
                    bi[i] += 1
                if bi[i] < len(unit_last[i]):
                    nxt.append(i)
            active = nxt
            w_lo = w_hi + 1
        order = topk_order(top_d, top_s, k)
        return top_d[order], top_s[order]

    def _search_or_exhaustive(self, weighted, k: int):
        """Decode-everything reference path (oracle-shaped) for A/B tests."""
        decoded = [(t, w, c.decode_all()) for t, w, c in weighted]
        cand = self._live(np.unique(np.concatenate([d for _, _, (d, _, _) in decoded])))
        parts = []
        for _, w, (d, t, m) in decoded:
            s = np.zeros(len(cand), dtype=np.float32)
            pos = np.searchsorted(cand, d)
            pos = np.minimum(pos, len(cand) - 1) if len(cand) else pos
            hit = (cand[pos] == d) if len(cand) else np.zeros(len(d), bool)
            s[pos[hit]] = self.simcls.score_term(w, t[hit], m[hit], self.cache)
            parts.append(s)
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    # ---------------- AND: block leapfrog ----------------

    def _search_and(self, weighted, k: int, block_max: bool = True):
        """Rarest-first block leapfrog; with ``block_max`` the rarest
        term's blocks are also impact-skipped (BlockMaxConjunctionScorer,
        [U] lucene/core/.../search/BlockMaxConjunctionScorer.java): a
        rarest block is decoded only if its own impact upper bound plus
        each other term's max bound over the docid-overlapping block
        range can still beat the current k-th score. Exact: bounds are
        strict, so ub <= theta implies no top-k change."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        by_rarity = sorted(range(len(weighted)), key=lambda i: weighted[i][2].n_docs)
        rare = weighted[by_rarity[0]][2]
        rare_ubs = None
        other_ubs = None
        if block_max:
            rare_ubs = rare.block_ubs(weighted[by_rarity[0]][1], self.cache, self.simcls)
            other_ubs = [
                weighted[j][2].block_ubs(weighted[j][1], self.cache, self.simcls)
                for j in by_rarity[1:]
            ]
        top_d = np.empty(0, dtype=np.int64)
        top_s = np.empty(0, dtype=np.float32)
        theta = -np.inf
        prev_last = -1
        for b in range(rare.n_blocks):
            blk_last = int(rare.last_docid[b])
            blk_lo = prev_last + 1
            prev_last = blk_last
            if block_max and len(top_d) >= k:
                ub = float(rare_ubs[b])
                for j, jubs in zip(by_rarity[1:], other_ubs):
                    oc = weighted[j][2]
                    g0 = int(np.searchsorted(oc.last_docid, blk_lo, side="left"))
                    g1 = int(np.searchsorted(oc.last_docid, blk_last, side="left"))
                    if g0 >= oc.n_blocks:
                        ub = -np.inf
                        break
                    ub += float(jubs[g0 : min(g1 + 1, oc.n_blocks)].max())
                if ub <= theta:
                    continue  # whole rarest block skipped undecoded
            cand = self._live(rare.block(b)[0])
            for j in by_rarity[1:]:
                oc = weighted[j][2]
                if oc._decoded is not None:  # warmed: direct membership
                    od = oc._decoded[0]
                else:
                    blocks = np.searchsorted(oc.last_docid, cand, side="left")
                    ok = blocks < oc.n_blocks
                    cand = cand[ok]
                    if len(cand) == 0:
                        break
                    need = np.unique(blocks[ok])
                    od, _, _ = oc.docids_in_blocks(need)
                if len(od) == 0:
                    cand = cand[:0]
                    break
                sel = np.searchsorted(od, cand)
                sel = np.minimum(sel, len(od) - 1)
                cand = cand[od[sel] == cand]
                if len(cand) == 0:
                    break
            if len(cand) == 0:
                continue
            parts = []
            for _, w, c in weighted:  # ascending term order
                t, m = c.gather(cand)
                parts.append(self.simcls.score_term(w, t, m, self.cache))
            scores = sim.accumulate(parts)
            top_d = np.concatenate([top_d, cand])
            top_s = np.concatenate([top_s, scores])
            if len(top_d) > k:
                keep = topk_order(top_d, top_s, k)
                top_d, top_s = top_d[keep], top_s[keep]
            if len(top_d) >= k:
                theta = float(top_s.min())
        if len(top_d) == 0:
            return empty
        top = topk_order(top_d, top_s, k)
        return top_d[top], top_s[top]

    # ---------------- BooleanQuery general form + scoring modifiers (§2.5) ----------------

    def search_boolean(self, should=(), must=(), must_not=(), filter_terms=(),
                       k: int = 10, boost: dict | None = None,
                       min_should_match: int = 0,
                       dv_filters: dict | None = None, schema=None):
        """Full BooleanQuery ([U] lucene/core/.../search/BooleanQuery.java):
        MUST intersects and scores; SHOULD scores (and selects when no
        MUST); MUST_NOT subtracts; FILTER restricts without scoring;
        ``min_should_match`` = minimumNumberShouldMatch (with MUST
        present, SHOULD clauses are optional unless mm > 0).
        ``boost`` maps analyzed terms to BoostQuery multipliers
        (w = float32(boost * idf)).

        ``dv_filters`` adds schema-routed FILTER clauses over docvalues
        (string) fields — Solr's ``fq=field:value`` on a docValues
        StrField ([U] solr/core/.../schema/StrField.java): equality /
        isin predicates pushed down into docs.parquet (only matching
        row groups' docid column is read), never scored. ``schema``
        defaults to the transcript contract's IndexSchema.

        Scale shape: candidate narrowing uses block-granular cursor
        probes (TermCursor.probe — only blocks containing candidates
        are decoded), never full decode_all intersections; the rarest
        MUST clause seeds the candidates."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        boost = boost or {}
        dv_cand = None
        if dv_filters:
            from lucene_solr_ray.state.schema import TRANSCRIPTS_SCHEMA

            sch = schema if schema is not None else TRANSCRIPTS_SCHEMA
            dv_cand = self._docvalues_match(sch.dv_expr(dv_filters))
            if len(dv_cand) == 0:
                return empty

        def load(raw_list):
            out = []
            for t in analyze_query_terms(raw_list):
                df, _, cur = self.term_stats_and_cursor(t)
                out.append((t, df, cur))
            return out

        must_l, should_l = load(must), load(should)
        not_l, filt_l = load(must_not), load(filter_terms)
        if any(c is None for _, _, c in must_l + filt_l):
            return empty  # a required clause matches nothing
        present_should = [(t, df, c) for t, df, c in should_l if c is not None]
        # effective minimumNumberShouldMatch: with no MUST (and not a
        # pure-filter query), at least one SHOULD clause must match
        # (Lucene's implicit mm=1)
        pure_filter = not must_l and not should_l and dv_cand is not None
        mm = min_should_match if (must_l or pure_filter) else max(min_should_match, 1)
        if mm > 0 and len(present_should) < mm:
            return empty
        if must_l:
            # rarest MUST seeds candidates; the rest narrow by block probe
            must_sorted = sorted(must_l, key=lambda x: x[2].n_docs)
            cand = self._live(must_sorted[0][2].decode_all()[0])
            for _, _, c in must_sorted[1:]:
                mask, _, _ = c.probe(cand)
                cand = cand[mask]
                if len(cand) == 0:
                    return empty
        elif present_should:
            cand = self._live(
                np.unique(np.concatenate([c.decode_all()[0] for _, _, c in present_should]))
            )
        elif dv_cand is not None:
            # pure docvalues-filter query: constant-score filter match
            # (Lucene's MatchAll + FILTER shape)
            cand = self._live(dv_cand)
        else:
            return empty
        if dv_cand is not None and (must_l or present_should):
            cand = np.intersect1d(cand, dv_cand, assume_unique=True)
            if len(cand) == 0:
                return empty
        for _, _, c in sorted(filt_l, key=lambda x: x[2].n_docs):
            mask, _, _ = c.probe(cand)
            cand = cand[mask]
            if len(cand) == 0:
                return empty
        for _, _, c in not_l:
            if c is not None:
                mask, _, _ = c.probe(cand)
                cand = cand[~mask]
                if len(cand) == 0:
                    return empty
        if mm > 0 and present_should:
            should_cnt = np.zeros(len(cand), dtype=np.int32)
            for _, _, c in present_should:
                mask, _, _ = c.probe(cand)
                should_cnt += mask
            cand = cand[should_cnt >= mm]
            if len(cand) == 0:
                return empty
        scoring = sorted(
            [(t, df, c) for t, df, c in must_l + present_should],
            key=lambda x: x[0].encode("utf-8"),
        )
        if not scoring:  # pure-filter query: constant score 0.0, docid asc
            d = cand[: min(k, len(cand))]
            return d, np.zeros(len(d), dtype=np.float32)
        parts = []
        for t, df, c in scoring:
            b = float(boost.get(t, 1.0))
            w = np.float32(b * self.simcls.idf(self.n_scoring, df))
            mask, tf, m = c.probe(cand)
            s = np.zeros(len(cand), dtype=np.float32)
            if mask.any():
                s[mask] = self.simcls.score_term(w, tf[mask], m[mask], self.cache)
            parts.append(s)
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    def search_clauses(self, clauses, k: int = 10, min_should_match: int = 0,
                       dv_filters: dict | None = None, schema=None):
        """Generalized BooleanQuery over CLAUSE GROUPS — the execution
        target of the classic query parser ([U] lucene/queryparser/.../
        classic/QueryParser.java -> BooleanQuery of rewritten
        sub-queries). Each clause is a dict:

          {"occur": "must"|"should"|"must_not"|"filter",
           "kind": "terms"|"phrase",
           "terms": [...],   # alternatives (terms) / word sequence (phrase)
           "boost": 1.0, "slop": 0}

        A terms clause with multiple alternatives is a rewritten
        multi-term query (wildcard/fuzzy/range expansion): it MATCHES if
        any alternative matches and SCORES as the float32 sum over its
        matching alternatives (ScoringBooleanQueryRewrite), while
        counting once for occur/minimumNumberShouldMatch. Scoring
        accumulation order is pinned: clause input order, alternatives
        in analyzed (byte-sorted) order."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        dv_cand = None
        if dv_filters:
            from lucene_solr_ray.state.schema import TRANSCRIPTS_SCHEMA

            sch = schema if schema is not None else TRANSCRIPTS_SCHEMA
            dv_cand = self._docvalues_match(sch.dv_expr(dv_filters))
            if len(dv_cand) == 0:
                return empty

        loaded = []  # (occur, matcher-dict)
        for cl in clauses:
            occur = cl["occur"]
            boost = float(cl.get("boost", 1.0))
            if cl.get("kind", "terms") == "phrase":
                d, s = self.search_phrase(cl["terms"], k=max(1, self.n_docs),
                                          slop=int(cl.get("slop", 0)))
                o = np.argsort(d)
                m = {"kind": "phrase", "docs": d[o],
                     "scores": (np.float32(boost) * s[o]).astype(np.float32),
                     "n_docs": len(d)}
                if len(d) == 0 and occur in ("must", "filter"):
                    return empty
            else:
                alts = []
                for t in analyze_query_terms(cl["terms"]):
                    df, _, cur = self.term_stats_and_cursor(t)
                    if cur is not None:
                        alts.append((t, df, cur))
                if not alts and occur in ("must", "filter"):
                    return empty
                m = {"kind": "terms", "alts": alts, "boost": boost,
                     "n_docs": sum(c.n_docs for _, _, c in alts)}
            loaded.append((occur, m))

        def all_docs(m) -> np.ndarray:
            if m["kind"] == "phrase":
                return m["docs"]
            if not m["alts"]:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate([c.decode_all()[0] for _, _, c in m["alts"]]))

        def match_mask(m, cand) -> np.ndarray:
            if m["kind"] == "phrase":
                pos = np.searchsorted(m["docs"], cand)
                pos = np.minimum(pos, max(0, len(m["docs"]) - 1))
                return (m["docs"][pos] == cand) if len(m["docs"]) else np.zeros(len(cand), bool)
            mask = np.zeros(len(cand), dtype=bool)
            for _, _, c in m["alts"]:
                sub, _, _ = c.probe(cand)
                mask |= sub
            return mask

        musts = [m for oc, m in loaded if oc == "must"]
        shoulds = [m for oc, m in loaded if oc == "should"]
        present_should = [m for m in shoulds
                          if (m["kind"] == "phrase" and len(m["docs"])) or
                             (m["kind"] == "terms" and m["alts"])]
        pure_filter = not musts and not shoulds and (
            dv_cand is not None or any(oc == "filter" for oc, _ in loaded))
        mm = min_should_match if (musts or pure_filter) else max(min_should_match, 1)
        if mm > 0 and len(present_should) < mm:
            return empty
        if musts:
            seed = min(musts, key=lambda m: m["n_docs"])
            cand = self._live(all_docs(seed))
            for m in musts:
                if m is seed:
                    continue
                cand = cand[match_mask(m, cand)]
                if len(cand) == 0:
                    return empty
        elif present_should:
            cand = self._live(np.unique(np.concatenate([all_docs(m) for m in present_should])))
        elif pure_filter:
            filt_docs = [all_docs(m) for oc, m in loaded if oc == "filter"]
            if dv_cand is not None:
                filt_docs.append(dv_cand)
            cand = self._live(filt_docs[0])
            for d in filt_docs[1:]:
                cand = np.intersect1d(cand, d, assume_unique=True)
        else:
            return empty
        if dv_cand is not None and (musts or present_should):
            cand = np.intersect1d(cand, dv_cand, assume_unique=True)
        for oc, m in loaded:
            if len(cand) == 0:
                return empty
            if oc == "filter" and not pure_filter:
                cand = cand[match_mask(m, cand)]
            elif oc == "must_not":
                cand = cand[~match_mask(m, cand)]
        if len(cand) == 0:
            return empty
        if mm > 0 and present_should:
            cnt = np.zeros(len(cand), dtype=np.int32)
            for m in present_should:
                cnt += match_mask(m, cand)
            cand = cand[cnt >= mm]
            if len(cand) == 0:
                return empty

        parts = []
        for oc, m in loaded:
            if oc not in ("must", "should"):
                continue
            if m["kind"] == "phrase":
                s = np.zeros(len(cand), dtype=np.float32)
                if len(m["docs"]):
                    pos = np.searchsorted(m["docs"], cand)
                    pos = np.minimum(pos, len(m["docs"]) - 1)
                    hit = m["docs"][pos] == cand
                    s[hit] = m["scores"][pos[hit]]
                parts.append(s)
            else:
                for t, df, c in m["alts"]:  # analyzed order (byte-sorted)
                    w = np.float32(m["boost"] * self.simcls.idf(self.n_scoring, df))
                    mask, tf, nb = c.probe(cand)
                    s = np.zeros(len(cand), dtype=np.float32)
                    if mask.any():
                        s[mask] = self.simcls.score_term(w, tf[mask], nb[mask], self.cache)
                    parts.append(s)
        if not parts:  # pure-filter query: constant score 0, docid asc
            d = cand[: min(k, len(cand))]
            return d, np.zeros(len(d), dtype=np.float32)
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    def iter_matches(self, raw_terms, mode: str = "or", window: int = 1 << 17):
        """Stream the matching docids of a boolean term query in
        ascending order, one docid WINDOW at a time — the production
        retrieval shape for unscored match sets (/export, delete-by-
        query, downstream joins). Only the postings blocks overlapping
        the current window are decoded (skip-table bounded), so memory
        is O(window + blocks-in-window), never O(matches) — unlike
        ``search(k=n_docs)``, which materializes and scores every match.
        Yields int64 arrays; tombstoned docs are filtered."""
        terms = analyze_query_terms(raw_terms)
        curs = []
        for t in terms:
            _, _, c = self.term_stats_and_cursor(t)
            if c is None or c.n_blocks == 0:
                if mode == "and":
                    return
                continue
            curs.append(c)
        if not curs:
            return
        ends = [int(c.last_docid[-1]) for c in curs]
        hi_all = (min(ends) if mode == "and" else max(ends)) + 1
        lo = 0
        while lo < hi_all:
            hi = min(lo + window, hi_all)
            per_term = []
            for c in curs:
                g0 = int(np.searchsorted(c.last_docid, lo, side="left"))
                g1 = min(int(np.searchsorted(c.last_docid, hi - 1, side="left")) + 1,
                         c.n_blocks)
                if g0 >= g1:
                    per_term.append(np.empty(0, dtype=np.int64))
                    continue
                d, _, _ = c.docids_in_blocks(np.arange(g0, g1))
                per_term.append(d[(d >= lo) & (d < hi)])
            if mode == "and":
                out = per_term[0]
                for d in per_term[1:]:
                    out = np.intersect1d(out, d, assume_unique=True)
                    if len(out) == 0:
                        break
            else:
                out = np.unique(np.concatenate(per_term))
            out = self._live(out)
            if len(out):
                yield out
            lo = hi

    def search_parsed(self, query: str, k: int = 10, schema=None):
        """Parse a classic query string and execute it (QueryParser +
        BooleanQuery of rewritten sub-queries)."""
        from lucene_solr_ray.queryparser import parse_query

        clauses, dv_filters = parse_query(query, searcher=self, schema=schema)
        return self.search_clauses(clauses, k=k, dv_filters=dv_filters or None,
                                   schema=schema)

    def _docvalues_match(self, expr) -> np.ndarray:
        """Docids whose docs.parquet row matches a pyarrow dataset
        expression — parquet predicate pushdown (row-group stats +
        dictionary pruning) replaces Lucene's docValues fq iteration;
        only the docid column of surviving row groups is materialized.
        Returns ascending int64 docids."""
        import pyarrow.dataset as pads

        tbl = pads.dataset(os.path.join(self.index_dir, "docs"), format="parquet").to_table(
            columns=["docid"], filter=expr
        )
        return np.sort(tbl.column("docid").to_numpy().astype(np.int64))

    def search_constant_score(self, raw_terms, k: int = 10, mode: str = "or", boost: float = 1.0):
        """ConstantScoreQuery ([U] .../search/ConstantScoreQuery.java):
        every matching doc scores exactly float32(boost)."""
        d, _ = self.search(raw_terms, k=max(1, self.n_docs), mode=mode)
        d = np.sort(d)[: k if k < len(d) else len(d)]  # ties -> docid asc
        return d, np.full(len(d), np.float32(boost), dtype=np.float32)

    def match_all(self, k: int = 10, boost: float = 1.0):
        """MatchAllDocsQuery: every live doc, constant score."""
        d = self._live(np.arange(self.n_docs, dtype=np.int64))[:k]
        return d, np.full(len(d), np.float32(boost), dtype=np.float32)

    def search_dismax(self, raw_terms, k: int = 10, tie_breaker: float = 0.0):
        """DisjunctionMaxQuery: per-doc max over clause scores plus
        tie_breaker * (sum of the others)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        clauses = []
        for t in analyze_query_terms(raw_terms):
            df, cf, cur = self.term_stats_and_cursor(t)
            if cur is not None:
                clauses.append((t, self._term_w(df, cf), cur))
        if not clauses:
            return empty
        cand = self._live(np.unique(np.concatenate([c.decode_all()[0] for _, _, c in clauses])))
        if len(cand) == 0:
            return empty
        parts = []
        for _, w, c in clauses:  # ascending term order from analyze_query_terms
            d, tf, m = c.decode_all()
            s = np.zeros(len(cand), dtype=np.float32)
            pos = np.searchsorted(cand, d)
            pos = np.minimum(pos, len(cand) - 1)
            hit = cand[pos] == d
            s[pos[hit]] = self.simcls.score_term(w, tf[hit], m[hit], self.cache)
            parts.append(s)
        scores = sim.dismax_combine(parts, tie_breaker)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    # ---------------- TopFieldCollector: sort by doc values (§2.6) ----------------

    def doc_values(self, field: str) -> np.ndarray:
        """Doc-values column from docs.parquet in docID order (lazy,
        cached) — the columnar per-field store (SURVEY §1.1 doc values).
        Numeric doc-values UPDATES (deletes.update_numeric_docvalues, the
        Lucene dvd/dvm generation sidecar) are applied as an overlay —
        the committed generation's overlay wins over the stored column."""
        cache = getattr(self, "_doc_values", None)
        if cache is None:
            cache = self._doc_values = {}
        if field not in cache:
            import pyarrow.dataset as pads

            t = pads.dataset(os.path.join(self.index_dir, "docs"), format="parquet").to_table(
                columns=["docid", field]
            )
            order = np.argsort(t.column("docid").to_numpy(), kind="stable")
            vals = t.column(field).to_numpy()[order]
            if self.manifest.get("dv_updates", {}).get(field):
                from lucene_solr_ray.pipelines.deletes import load_dv_updates

                up_ids, up_vals = load_dv_updates(self.index_dir, self.manifest, field)
                vals = vals.copy()
                vals[up_ids] = up_vals
            cache[field] = vals
        return cache[field]

    def search_sorted_by_field(self, raw_terms, field: str, k: int = 10,
                               descending: bool = True, mode: str = "or",
                               window: int = 1 << 17):
        """TopFieldCollector ([U] .../search/TopFieldCollector.java): hits
        ordered by a doc-values field (ties -> docid asc) instead of score.

        When the index was built with docid_mode="sorted-by:<field>[:desc]"
        matching this query's sort, docid order IS sort order, so the
        first k matches streamed by iter_matches are the answer —
        EarlyTerminatingSortingCollector ([U] lucene/core/.../search/
        EarlyTerminatingSortingCollector.java, Lucene 8 index sorting):
        only the postings blocks of the first few docid windows decode,
        never the full match set. ``last_sorted_windows`` records how many
        windows were consumed (tests assert the early exit)."""
        isort = self.manifest.get("index_sort")
        self.last_sorted_windows = 0
        # a dv-updates overlay invalidates the index sort for that field
        # (docid order no longer == value order) -> generic path
        if self.manifest.get("dv_updates", {}).get(field):
            isort = None
        if (isort and isort["field"] == field
                and bool(isort["descending"]) == bool(descending)):
            chunks, n = [], 0
            for d in self.iter_matches(raw_terms, mode=mode, window=window):
                self.last_sorted_windows += 1
                chunks.append(d)
                n += len(d)
                if n >= k:
                    break  # docid order == sort order: done
            if not chunks:
                return (np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.int64))
            d = np.concatenate(chunks)[:k]
            # fetch values for ONLY the k winners (parquet filter pushdown;
            # the full doc-values column never materializes on this path)
            import pyarrow.dataset as pads

            t = pads.dataset(
                os.path.join(self.index_dir, "docs"), format="parquet"
            ).to_table(columns=["docid", field],
                       filter=pads.field("docid").isin(pa.array(d)))
            dv = t.column("docid").to_numpy()
            vals = t.column(field).to_numpy()[np.argsort(dv)][
                np.searchsorted(np.sort(dv), d)]
            return d, vals
        d, _ = self.search(raw_terms, k=max(1, self.n_docs), mode=mode)
        vals = self.doc_values(field)[d]
        key = -vals if descending else vals
        order = np.lexsort((d, key))[:k]
        return d[order], vals[order]

    # ---------------- PhraseQuery (SURVEY §2.5) ----------------

    def _pos_view(self, term: str):
        """(merged positional view, global df) for one analyzed term —
        df == 0 means the term is absent (view is None)."""
        part = int(stable_term_hash(np.array([term], dtype=object))[0]) % self.num_partitions
        entries = []
        df = 0
        for seg in self._by_partition.get(part, ()):
            r = self._reader(part, seg["name"])
            i = r.lookup(term)
            if i is not None:
                df += int(r.df[i])
                entries.append((r, i))
        return (_PositionalView(entries) if df else None), df

    def search_phrase(self, raw_terms, k: int = 10, slop: int = 0):
        """Exact phrase match ([U] lucene/core/.../search/PhraseQuery.java):
        candidates = conjunction of the phrase terms; verified by position
        adjacency (positions carry StopFilter gaps, so a stopword between
        phrase words breaks adjacency — Lucene semantics). Scored like a
        single pseudo-term: tf = phrase frequency, weight = float32 sum of
        the member idfs (BM25Similarity.idfExplain over the term array).
        Requires an index built with store_positions=True."""
        from lucene_solr_ray.analysis import tokenize_with_positions

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        qterms: list[tuple[str, int]] = []
        pos = 0
        for raw in raw_terms:
            items = tokenize_with_positions(raw)
            for tok, p in items:
                qterms.append((tok, pos + p))
            # advance by the raw term's tokenizer positions (>= 1 slot;
            # a dropped stopword still leaves its gap)
            pos += max((p for _, p in items), default=0) + 1
        if not qterms:
            return empty

        distinct = sorted({t for t, _ in qterms})
        views: dict[str, _PositionalView] = {}
        dfs: dict[str, int] = {}
        for t in distinct:
            view, df = self._pos_view(t)
            if df == 0:
                return empty
            dfs[t] = df
            views[t] = view

        cand = self._live(views[distinct[0]].docids)
        for t in distinct[1:]:
            cand = np.intersect1d(cand, views[t].docids, assume_unique=True)
        if len(cand) == 0:
            return empty

        from lucene_solr_ray.phrase import phrase_freq

        w = np.float32(sum(self.simcls.idf(self.n_scoring, dfs[t]) for t, _ in qterms))
        first = views[distinct[0]]
        doc_ids_out, freqs, norm_bytes = [], [], []
        for doc in cand:
            shifted = [views[t].positions(int(doc)) - qp for t, qp in qterms]
            freq = phrase_freq(shifted, slop)
            if freq:
                doc_ids_out.append(int(doc))
                freqs.append(freq)
                j = int(np.searchsorted(first.docids, doc))
                norm_bytes.append(int(first.norms[j]))
        if not doc_ids_out:
            return empty
        d_arr = np.asarray(doc_ids_out, dtype=np.int64)
        scores = self.simcls.score_term(
            w, np.asarray(freqs, dtype=np.int64), np.asarray(norm_bytes, dtype=np.int64), self.cache
        )
        top = topk_order(d_arr, scores, k)
        return d_arr[top], scores[top]

    def search_multi_phrase(self, slots, k: int = 10, slop: int = 0):
        """MultiPhraseQuery ([U] lucene/core/.../search/MultiPhraseQuery.java):
        ``slots`` is a list of term alternatives per phrase position —
        slot i matches if ANY of its terms occurs at position i (the
        synonym-phrase case). Candidates = conjunction over slots of the
        union of each slot's posting lists; per-candidate verification
        merges (np.union1d) the slot terms' shifted positions before the
        same phrase_freq adjacency check as PhraseQuery. Scored as one
        pseudo-term: tf = phrase frequency, weight = float32 sum of the
        idfs of every PRESENT term (absent terms contribute nothing, as
        MultiPhraseWeight only collects TermStates with docFreq > 0).
        Requires store_positions=True."""
        from lucene_solr_ray.phrase import phrase_freq

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        if not slots:
            return empty
        views: dict[str, _PositionalView] = {}
        dfs: dict[str, int] = {}
        slot_terms: list[list[str]] = []
        for raw_slot in slots:
            present = []
            for t in analyze_query_terms(list(raw_slot)):
                if t not in views:
                    view, df = self._pos_view(t)
                    if df == 0:
                        continue
                    views[t], dfs[t] = view, df
                if t in views:
                    present.append(t)
            if not present:
                return empty  # a slot with no present term matches nothing
            slot_terms.append(sorted(set(present)))

        slot_docs = [
            np.unique(np.concatenate([views[t].docids for t in terms]))
            for terms in slot_terms
        ]
        cand = self._live(slot_docs[0])
        for d in slot_docs[1:]:
            cand = np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return empty

        w = np.float32(
            sum(self.simcls.idf(self.n_scoring, dfs[t])
                for t in sorted(dfs))  # sorted: deterministic float32 sum order
        )
        doc_ids_out, freqs, norm_bytes = [], [], []
        for doc in cand:
            per_slot = []
            for qp, terms in enumerate(slot_terms):
                pos_arrays = [views[t].positions(int(doc)) for t in terms]
                merged = np.union1d(pos_arrays[0], pos_arrays[1]) if len(pos_arrays) == 2 \
                    else (pos_arrays[0] if len(pos_arrays) == 1
                          else np.unique(np.concatenate(pos_arrays)))
                per_slot.append(merged - qp)
            freq = phrase_freq(per_slot, slop)
            if freq:
                doc_ids_out.append(int(doc))
                freqs.append(freq)
                for t in slot_terms[0]:
                    v = views[t]
                    j = int(np.searchsorted(v.docids, doc))
                    if j < len(v.docids) and v.docids[j] == doc:
                        norm_bytes.append(int(v.norms[j]))
                        break
        if not doc_ids_out:
            return empty
        d_arr = np.asarray(doc_ids_out, dtype=np.int64)
        scores = self.simcls.score_term(
            w, np.asarray(freqs, dtype=np.int64), np.asarray(norm_bytes, dtype=np.int64), self.cache
        )
        top = topk_order(d_arr, scores, k)
        return d_arr[top], scores[top]

    # ---------------- span queries (SURVEY §2.5) ----------------

    def _span_clause_views(self, raw_clauses):
        """Analyze each span clause to its term alternatives (a str
        clause is one term; a list clause is a SpanOrQuery of terms —
        [U] .../spans/SpanOrQuery.java). Order preserved — spans are
        order-sensitive, unlike analyze_query_terms' sorted set. Returns
        (views, clause_terms); views is None if any clause has NO
        present alternative (a SpanOr clause survives if >=1 term
        exists; absent alternatives just contribute nothing)."""
        from lucene_solr_ray.analysis import tokenize

        clause_terms: list[list[str]] = []
        for raw in raw_clauses:
            alts = [raw] if isinstance(raw, str) else list(raw)
            terms = []
            for alt in alts:
                toks = tokenize(alt)
                if len(toks) != 1:
                    raise ValueError(
                        f"span clause must analyze to one term: {alt!r}")
                terms.append(toks[0])
            clause_terms.append(terms)
        views = {}
        for terms in clause_terms:
            present = []
            for t in terms:
                if t in views:
                    present.append(t)
                    continue
                view, df = self._pos_view(t)
                if df:
                    views[t] = view
                    present.append(t)
            if not present:
                return None, clause_terms
        return views, clause_terms

    def _span_clause_positions(self, views, terms: list[str], doc: int) -> np.ndarray:
        """Merged ascending positions of a (possibly SpanOr) clause in
        ``doc`` — union of each present alternative's position list."""
        lists = [p for t in terms if t in views
                 for p in (views[t].positions(doc),) if len(p)]
        if not lists:
            return np.empty(0, dtype=np.int64)
        if len(lists) == 1:
            return lists[0]
        return np.unique(np.concatenate(lists))

    def search_span_near(self, raw_clauses, slop: int = 0,
                         in_order: bool = False) -> np.ndarray:
        """SpanNearQuery ([U] lucene/core/.../search/spans/
        SpanNearQuery.java): unscored ascending-docid match set of docs
        where every clause matches within total gap <= slop, optionally
        in clause order. A clause is one term (str) or a SpanOrQuery of
        term alternatives (list of str — [U] .../spans/SpanOrQuery.java).
        Candidates = conjunction of per-clause docid unions; per-candidate
        verify via the shared span matchers in phrase.py (parity by
        construction with any oracle reusing them). Requires
        store_positions=True."""
        from lucene_solr_ray.phrase import span_near_ordered, span_near_unordered

        views, clause_terms = self._span_clause_views(raw_clauses)
        if views is None:
            return np.empty(0, dtype=np.int64)
        cand = None
        for terms in clause_terms:
            present = [t for t in terms if t in views]
            docs = (views[present[0]].docids if len(present) == 1 else
                    np.unique(np.concatenate([views[t].docids for t in present])))
            cand = docs if cand is None else np.intersect1d(cand, docs, assume_unique=True)
            if len(cand) == 0:
                return cand.astype(np.int64)
        cand = self._live(cand)
        match = span_near_ordered if in_order else span_near_unordered
        out = [int(doc) for doc in cand
               if match([self._span_clause_positions(views, terms, int(doc))
                         for terms in clause_terms], slop)]
        return np.asarray(out, dtype=np.int64)

    def search_span_nested(self, inner_a: str, inner_b: str, inner_slop: int,
                           outer_term: str, outer_slop: int) -> np.ndarray:
        """NESTED SpanNearQuery ([U] lucene/core/.../search/spans/
        SpanNearQuery.java — clauses are SpanQueries, so nears compose):
        spanNear([spanNear([a, b], inner_slop, inOrder=true), c],
        outer_slop, inOrder=true). An inner span is an ordered (a, b)
        pair with gap b-a-1 <= inner_slop (span start=a, end=b+1,
        end-exclusive); the outer ordered near requires c to start at or
        after the inner span's end with gap c-(b+1) <= outer_slop. Each
        level's slop binds separately — NOT the flat 3-clause total-gap
        semantic. Existence per doc via nearest-neighbor searchsorted
        around each b occurrence (nearest a before / nearest c after
        minimize both gaps, so the check is exact)."""
        views, clause_terms = self._span_clause_views(
            [inner_a, inner_b, outer_term])
        if views is None:
            return np.empty(0, dtype=np.int64)
        cand = None
        for terms in clause_terms:
            docs = views[terms[0]].docids
            cand = docs if cand is None else np.intersect1d(cand, docs, assume_unique=True)
            if len(cand) == 0:
                return cand.astype(np.int64)
        cand = self._live(cand)
        out = []
        for doc in cand:
            p_a = views[inner_a].positions(int(doc))
            p_b = views[inner_b].positions(int(doc))
            p_c = views[outer_term].positions(int(doc))
            # nearest a strictly before each b
            ia = np.searchsorted(p_a, p_b, side="left") - 1
            # nearest c strictly after each b
            ic = np.searchsorted(p_c, p_b, side="right")
            ok_b = (ia >= 0) & (ic < len(p_c))
            if not ok_b.any():
                continue
            b_ok = p_b[ok_b]
            a_near = p_a[ia[ok_b]]
            c_near = p_c[ic[ok_b]]
            hit = ((b_ok - a_near - 1 <= inner_slop)
                   & (c_near - b_ok - 1 <= outer_slop))
            if hit.any():
                out.append(int(doc))
        return np.asarray(out, dtype=np.int64)

    def search_intervals_containing(self, term_a: str, term_b: str,
                                    small: str, max_width: int) -> np.ndarray:
        """IntervalQuery `containing(maxwidth(w, unordered(a, b)), c)`
        ([U] lucene/queries/.../intervals/Intervals.java): unscored
        ascending-docid set of docs where some MINIMAL interval of the
        unordered pair {a, b} with width <= max_width (width = hi - lo,
        position delta) contains an occurrence of c. Minimality matters:
        a wide (a..b) stretch containing c does NOT match when a tighter
        minimal interval exists that excludes c — the shared
        phrase.minimal_intervals_two matcher pins that semantic."""
        from lucene_solr_ray.phrase import minimal_intervals_two

        views, clause_terms = self._span_clause_views([term_a, term_b, small])
        if views is None:
            return np.empty(0, dtype=np.int64)
        cand = None
        for terms in clause_terms:
            docs = views[terms[0]].docids
            cand = docs if cand is None else np.intersect1d(cand, docs, assume_unique=True)
            if len(cand) == 0:
                return cand.astype(np.int64)
        cand = self._live(cand)
        out = []
        for doc in cand:
            p_a = views[term_a].positions(int(doc))
            p_b = views[term_b].positions(int(doc))
            p_c = views[small].positions(int(doc))
            for lo, hi in minimal_intervals_two(p_a, p_b):
                if hi - lo <= max_width:
                    i = int(np.searchsorted(p_c, lo))
                    if i < len(p_c) and p_c[i] <= hi:
                        out.append(int(doc))
                        break
        return np.asarray(out, dtype=np.int64)

    def search_intervals_maxgaps(self, term_a: str, term_b: str, term_c: str,
                                 max_gaps: int) -> np.ndarray:
        """IntervalQuery `maxgaps(g, ordered(a, b, c))`
        ([U] lucene/queries/.../intervals/Intervals.java): unscored
        ascending-docid set of docs holding an ORDERED occurrence
        a < b < c whose total gap count (width - 3) is <= max_gaps.
        A minimal ordered interval around each b-position (largest a
        before it, smallest c after it) minimizes the width, so checking
        those intervals is exact. Vectorized per candidate doc:
        searchsorted of b's positions into a's and c's lists."""
        views, clause_terms = self._span_clause_views([term_a, term_b, term_c])
        if views is None:
            return np.empty(0, dtype=np.int64)
        cand = None
        for terms in clause_terms:
            docs = views[terms[0]].docids
            cand = docs if cand is None else np.intersect1d(cand, docs, assume_unique=True)
            if len(cand) == 0:
                return cand.astype(np.int64)
        cand = self._live(cand)
        out = []
        for doc in cand:
            p_a = views[term_a].positions(int(doc))
            p_b = views[term_b].positions(int(doc))
            p_c = views[term_c].positions(int(doc))
            ia = np.searchsorted(p_a, p_b, side="left") - 1  # largest a < b
            ic = np.searchsorted(p_c, p_b, side="right")     # smallest c > b
            ok = (ia >= 0) & (ic < len(p_c))
            if np.any(ok) and np.any(
                    p_c[ic[ok]] - p_a[ia[ok]] - 2 <= max_gaps):
                out.append(int(doc))
        return np.asarray(out, dtype=np.int64)

    def search_span_not(self, include, exclude, pre: int = 0,
                        post: int = 0) -> np.ndarray:
        """SpanNotQuery ([U] .../spans/SpanNotQuery.java), single-term
        spans: docs with an ``include`` occurrence whose expanded window
        [p - pre, p + post] contains NO ``exclude`` occurrence. With
        pre=post=0 distinct terms never collide (width-1 spans), so the
        useful form sets pre/post > 0 ('include not preceded/followed by
        exclude within N positions'). Vectorized per doc: searchsorted
        of each include position into the exclude list."""
        views, clause_terms = self._span_clause_views([include])
        if views is None:
            return np.empty(0, dtype=np.int64)
        inc = views[clause_terms[0][0]]
        evs, ets = self._span_clause_views([exclude])
        cand = self._live(inc.docids)
        if evs is None:
            return np.sort(cand).astype(np.int64)
        exc = evs[ets[0][0]]
        out = []
        exc_docs = set(exc.docids.tolist())
        for doc in cand:
            p = inc.positions(int(doc))
            if int(doc) not in exc_docs:
                out.append(int(doc))
                continue
            q = exc.positions(int(doc))
            # an exclude in [p-pre, p+post] kills that include position
            lo = np.searchsorted(q, p - pre, side="left")
            hi = np.searchsorted(q, p + post, side="right")
            if bool(np.any(lo == hi)):  # some include window is clean
                out.append(int(doc))
        return np.asarray(out, dtype=np.int64)

    def search_span_first(self, raw_clause, end: int) -> np.ndarray:
        """SpanFirstQuery ([U] .../spans/SpanFirstQuery.java): docs where
        the term occurs with span end <= ``end``, i.e. position <= end-1
        (single-term spans have width 1). Position lists are ascending,
        so only each doc's FIRST position is inspected."""
        views, clause_terms = self._span_clause_views([raw_clause])
        if views is None:
            return np.empty(0, dtype=np.int64)
        v = views[clause_terms[0][0]]
        cand = self._live(v.docids)
        out = [int(doc) for doc in cand if int(v.positions(int(doc))[0]) <= end - 1]
        return np.asarray(out, dtype=np.int64)

    def search_span_position_range(self, raw_clause, start: int, end: int) -> np.ndarray:
        """SpanPositionRangeQuery ([U] lucene/core/.../search/spans/
        SpanPositionRangeQuery.java): docs where the term occurs with
        span fully inside [start, end) — for single-term spans (width 1),
        any position p with start <= p <= end - 1. Position lists are
        ascending, so a searchsorted window test per doc suffices
        (SpanFirstQuery == the start=0 case)."""
        views, clause_terms = self._span_clause_views([raw_clause])
        if views is None:
            return np.empty(0, dtype=np.int64)
        v = views[clause_terms[0][0]]
        cand = self._live(v.docids)
        out = []
        for doc in cand:
            pos = v.positions(int(doc))
            lo = int(np.searchsorted(pos, start, side="left"))
            if lo < len(pos) and int(pos[lo]) <= end - 1:
                out.append(int(doc))
        return np.asarray(out, dtype=np.int64)

    def search_span_payload_check(self, raw_clause, payload_fn, required: int) -> np.ndarray:
        """SpanPayloadCheckQuery ([U] lucene/queries/.../payloads/
        SpanPayloadCheckQuery.java): docs where some span of the clause
        carries exactly the required payload. ``payload_fn`` maps an
        ascending position array -> payload array (payloads in this
        corpus are a deterministic function of term + position — the
        delimited-payload annotated view); positions come from the INDEX
        postings, never re-analysis. Per-candidate-doc vectorized check."""
        views, clause_terms = self._span_clause_views([raw_clause])
        if views is None:
            return np.empty(0, dtype=np.int64)
        v = views[clause_terms[0][0]]
        out = []
        for doc in self._live(v.docids):
            pos = v.positions(int(doc))
            if np.any(payload_fn(np.asarray(pos, dtype=np.int64)) == required):
                out.append(int(doc))
        return np.asarray(out, dtype=np.int64)

    def _span_near_pairs(self, term_a: str, term_b: str, slop: int):
        """All SpanNear(a, b, slop, unordered) span envelopes per doc:
        yields (doc, lo_array, hi_array) for docs holding at least one
        qualifying (pos_a, pos_b) pair (gap = |pa-pb|-1 <= slop). Spans
        enumerate every qualifying pair (Lucene spans are combinations,
        not minimal intervals)."""
        views, clause_terms = self._span_clause_views([term_a, term_b])
        if views is None:
            return
        ta, tb = clause_terms[0][0], clause_terms[1][0]
        cand = np.intersect1d(views[ta].docids, views[tb].docids,
                              assume_unique=True)
        for doc in self._live(cand):
            pa = views[ta].positions(int(doc))
            pb = views[tb].positions(int(doc))
            lo = np.minimum.outer(pa, pb).ravel()
            hi = np.maximum.outer(pa, pb).ravel()
            ok = (hi - lo - 1) <= slop
            if ok.any():
                yield int(doc), lo[ok], hi[ok]

    def search_span_containing(self, term_a: str, term_b: str, slop: int,
                               little: str):
        """SpanContainingQuery ([U] lucene/core/.../search/spans/
        SpanContainingQuery.java): big = SpanNear(a, b, slop, unordered),
        little = a term; returns the DISTINCT big spans that contain a
        little occurrence, as (docid, lo, hi) arrays (Lucene returns the
        big spans; doc-level sets of containing/within coincide, the span
        coordinates differentiate them)."""
        views, clause_terms = self._span_clause_views([little])
        if views is None:
            return (np.empty(0, np.int64),) * 3
        tc = clause_terms[0][0]
        v_c = views[tc]
        out_d, out_lo, out_hi = [], [], []
        for doc, lo, hi in self._span_near_pairs(term_a, term_b, slop):
            pos = np.searchsorted(v_c.docids, doc)
            if pos >= len(v_c.docids) or v_c.docids[pos] != doc:
                continue
            pc = v_c.positions(doc)
            has = (np.searchsorted(pc, hi, side="right")
                   - np.searchsorted(pc, lo, side="left")) > 0
            if has.any():
                pairs = np.unique(np.stack([lo[has], hi[has]], axis=1), axis=0)
                out_d.extend([doc] * len(pairs))
                out_lo.extend(pairs[:, 0].tolist())
                out_hi.extend(pairs[:, 1].tolist())
        return (np.asarray(out_d, np.int64), np.asarray(out_lo, np.int64),
                np.asarray(out_hi, np.int64))

    def search_span_within(self, term_a: str, term_b: str, slop: int,
                           little: str):
        """SpanWithinQuery ([U] .../spans/SpanWithinQuery.java): the
        DISTINCT little-term occurrences enclosed by some big
        SpanNear(a, b, slop, unordered) span, as (docid, pos) arrays."""
        views, clause_terms = self._span_clause_views([little])
        if views is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        v_c = views[clause_terms[0][0]]
        out_d, out_p = [], []
        for doc, lo, hi in self._span_near_pairs(term_a, term_b, slop):
            pos = np.searchsorted(v_c.docids, doc)
            if pos >= len(v_c.docids) or v_c.docids[pos] != doc:
                continue
            pc = v_c.positions(doc)
            inside = ((pc[:, None] >= lo[None, :]) & (pc[:, None] <= hi[None, :])).any(axis=1)
            for p in pc[inside]:
                out_d.append(doc)
                out_p.append(int(p))
        return np.asarray(out_d, np.int64), np.asarray(out_p, np.int64)

    def search_synonym(self, raw_terms, k: int = 10):
        """SynonymQuery ([U] lucene/core/.../search/SynonymQuery.java):
        all terms score as ONE pseudo-term — docFreq = max over members,
        totalTermFreq = sum, per-doc tf = sum of member tfs, one blended
        weight. A single score_term call per doc (no accumulation), so
        float32 parity with the SQL oracle is a single shared rounding."""
        terms = analyze_query_terms(raw_terms)
        stats = [self.term_stats_and_cursor(t) for t in terms]
        stats = [(df, cf, c) for df, cf, c in stats if c is not None]
        if not stats:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        w = self._term_w(max(df for df, _, _ in stats),
                         sum(cf for _, cf, _ in stats))
        d_all = np.concatenate([c.decode_all()[0] for _, _, c in stats])
        tf_all = np.concatenate([c.decode_all()[1] for _, _, c in stats])
        m_all = np.concatenate([c.decode_all()[2] for _, _, c in stats])
        uniq, inv = np.unique(d_all, return_inverse=True)
        tf_sum = np.zeros(len(uniq), dtype=tf_all.dtype)
        np.add.at(tf_sum, inv, tf_all)
        m_u = np.zeros(len(uniq), dtype=m_all.dtype)
        m_u[inv] = m_all  # norms are per-doc: any member's value is THE value
        live = self._live_mask(uniq)
        cand, tf_sum, m_u = uniq[live], tf_sum[live], m_u[live]
        scores = self.simcls.score_term(w, tf_sum, m_u, self.cache)
        top = topk_order(cand, scores, k)
        return cand[top].astype(np.int64), scores[top]

    # ---------------- multi-term queries (SURVEY §2.5) ----------------

    def expand_terms(self, kind: str, pattern: str, max_terms: int = 1024) -> list[str]:
        """Multi-term query rewrite: scan the sorted term dicts and expand
        to concrete terms, then run as a disjunction — the
        PrefixQuery/WildcardQuery/RegexpQuery/TermRangeQuery shape
        ([U] lucene/core/.../search/PrefixQuery.java, WildcardQuery.java,
        RegexpQuery.java, TermRangeQuery.java; automata replaced by a
        range-scan + regex filter over the dict, SURVEY §2.5).

        kind: 'prefix' (pattern = prefix), 'wildcard' (* and ? globs),
        'regexp' (full-match regex), 'range' (pattern = 'lo:hi', [lo,hi)),
        'fuzzy' (pattern = 'term' or 'term~d', max edit distance d<=2 —
        FuzzyQuery, [U] lucene/core/.../search/FuzzyQuery.java; the
        Levenshtein automaton intersection is replaced by a
        length-banded dict scan + bounded DP; classic Levenshtein, no
        transpositions, so the DuckDB levenshtein() oracle matches)."""
        import re as _re

        found: set[str] = set()
        stem = None  # common prefix that bounds the dict scan
        fuzzy = None
        if kind == "prefix":
            lo, hi, rx, stem = pattern, None, None, pattern
        elif kind == "range":
            lo, hi = pattern.split(":", 1)
            rx = None
        elif kind == "wildcard":
            stem = pattern.split("*", 1)[0].split("?", 1)[0]
            lo, hi = (stem or None), None
            rx = _re.compile(_re.escape(pattern).replace(r"\*", ".*").replace(r"\?", "."))
        elif kind == "regexp":
            lo, hi, rx = None, None, _re.compile(pattern)
        elif kind == "fuzzy":
            if "~" in pattern:
                base, d = pattern.rsplit("~", 1)
                fuzzy = (base, int(d))
            else:
                fuzzy = (pattern, 2)
            lo, hi, rx = None, None, None
        else:
            raise ValueError(f"unknown multi-term kind {kind!r}")
        for part in range(self.num_partitions):
            for seg in self._by_partition.get(part, ()):
                r = self._reader(part, seg["name"])
                if fuzzy is not None:
                    base, maxd = fuzzy
                    lens = np.fromiter((len(t) for t in r.terms), dtype=np.int64,
                                       count=len(r.terms))
                    for i in np.flatnonzero(np.abs(lens - len(base)) <= maxd):
                        t = str(r.terms[i])
                        if t not in found and _levenshtein_leq(base, t, maxd):
                            found.add(t)
                            if len(found) >= max_terms:
                                return sorted(found)
                    continue
                for i in r.term_range(lo, hi):
                    t = str(r.terms[i])
                    if stem and not t.startswith(stem):
                        break  # sorted dict: past the stem's range
                    if rx is None or rx.fullmatch(t):
                        found.add(t)
                        if len(found) >= max_terms:
                            return sorted(found)
        return sorted(found)

    # ---------------- PointRangeQuery on ts / numeric doc values (§2.5) ----------------

    def search_ts_range(self, lo, hi, filter_terms=(), field: str = "ts") -> np.ndarray:
        """PointRangeQuery-equivalent over a docs.parquet column
        ([U] lucene/core/.../search/PointRangeQuery.java; the BKD tree is
        replaced by Parquet row-group statistics pruning — pyarrow skips
        row groups whose [min, max] stats fall outside [lo, hi)).
        Composable with term FILTER clauses (block-probe narrowed).
        Returns the matching docids ascending (constant-score set)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        if isinstance(lo, str):
            lo = np.datetime64(lo, "us")
        if isinstance(hi, str):
            hi = np.datetime64(hi, "us")
        expr = (pc.field(field) >= lo) & (pc.field(field) < hi)
        tbl = pads.dataset(os.path.join(self.index_dir, "docs"), format="parquet").to_table(
            columns=["docid"], filter=expr
        )
        cand = self._live(np.sort(tbl.column("docid").to_numpy().astype(np.int64)))
        for t in analyze_query_terms(filter_terms):
            if len(cand) == 0:
                break
            _, _, cur = self.term_stats_and_cursor(t)
            if cur is None:
                return np.empty(0, dtype=np.int64)
            mask, _, _ = cur.probe(cand)
            cand = cand[mask]
        return cand

    def search_multi_term(self, kind: str, pattern: str, k: int = 10, max_terms: int = 1024):
        """Expanded disjunction, scored like a BooleanQuery of the matched
        terms (engine's analysis chain is NOT re-applied: dict terms are
        already analyzed)."""
        terms = self.expand_terms(kind, pattern, max_terms)
        return self.search(terms, k=k, mode="or")

    def _reversed_dict(self):
        """Reversed term dictionary (ReversedWildcardFilter analogue,
        [U] solr/core/.../analysis/ReversedWildcardFilter.java): Solr
        indexes each token reversed so a leading wildcard becomes a
        prefix scan. Here the reversal is a lazily-built, vocab-sized
        sorted array pair (reversed term -> original term) — same
        asymptotics as the indexed variant (one extra vocab-sized
        structure, prefix-pruned scans) without doubling the postings."""
        cache = getattr(self, "_rev_dict", None)
        if cache is None:
            allt: set[str] = set()
            for part in range(self.num_partitions):
                for seg in self._by_partition.get(part, ()):
                    r = self._reader(part, seg["name"])
                    allt.update(str(t) for t in r.terms)
            orig = np.array(sorted(allt), dtype=object)
            rev = np.array([t[::-1] for t in orig], dtype=object)
            o = np.argsort(rev)
            cache = self._rev_dict = (rev[o], orig[o])
        return cache

    def leading_wildcard_terms(self, pattern: str, max_terms: int = 1024) -> list[str]:
        """Expand a leading-wildcard pattern ``*suffix`` (suffix literal)
        against the reversed dict: reversed(suffix) is a PREFIX there, so
        the scan touches only the matching range instead of the whole
        vocabulary. ``last_rev_scanned`` records the pruned range width
        (tests assert it is far below the vocab size)."""
        if not (pattern.startswith("*") and "*" not in pattern[1:]
                and "?" not in pattern):
            raise ValueError("leading_wildcard_terms handles '*suffix' only")
        suffix = pattern[1:]
        rev, orig = self._reversed_dict()
        rq = suffix[::-1]
        lo = int(np.searchsorted(rev, rq, side="left"))
        hi = int(np.searchsorted(rev, rq + "￿", side="left"))
        self.last_rev_scanned = hi - lo
        return sorted(orig[lo:hi].tolist())[:max_terms]

    # ---------------- suggesters / spellcheck (SURVEY §2.6) ----------------

    def suggest_spelling(self, term: str, max_suggestions: int = 5, max_edits: int = 2):
        """DirectSpellChecker analogue ([U] lucene/suggest/.../spell/
        DirectSpellChecker.java): dictionary terms within ``max_edits``,
        ranked by (edit distance asc, df desc, term asc). Returns
        [(term, distance, df)]."""
        out = []
        for t in self.expand_terms("fuzzy", f"{term}~{max_edits}", max_terms=100_000):
            if t == term:
                continue
            dist = next(d for d in range(1, max_edits + 1) if _levenshtein_leq(term, t, d))
            df, _, _ = self.term_stats_and_cursor(t)
            out.append((t, dist, df))
        out.sort(key=lambda x: (x[1], -x[2], x[0]))
        return out[:max_suggestions]

    def suggest_prefix(self, prefix: str, k: int = 5):
        """Prefix suggester ([U] lucene/suggest/.../analyzing/
        AnalyzingSuggester.java shape): dictionary terms with the prefix,
        ranked by collection frequency desc (the suggester weight), term
        asc. Returns [(term, cf)]."""
        out = []
        for t in self.expand_terms("prefix", prefix, max_terms=100_000):
            _, cf, _ = self.term_stats_and_cursor(t)
            out.append((t, cf))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def suggest_fuzzy(self, term: str, k: int = 5, max_edits: int = 2):
        """FuzzySuggester analogue ([U] lucene/suggest/.../analyzing/
        FuzzySuggester.java): dictionary terms within ``max_edits`` of the
        input whose FIRST character matches (the suggester's default
        nonFuzzyPrefix=1), ranked like a suggester — by collection
        frequency (weight) desc, term asc — unlike DirectSpellChecker's
        distance-first order. Returns [(term, cf)]."""
        out = []
        for t in self.expand_terms("fuzzy", f"{term}~{max_edits}", max_terms=100_000):
            if not t or not term or t[0] != term[0]:
                continue
            _, cf, _ = self.term_stats_and_cursor(t)
            out.append((t, cf))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def suggest_infix(self, fragment: str, k: int = 5):
        """AnalyzingInfixSuggester analogue ([U] lucene/suggest/.../
        analyzing/AnalyzingInfixSuggester.java): dictionary terms
        CONTAINING the fragment anywhere (the infix twist vs prefix-only
        FSTs), ranked by collection frequency desc (suggester weight),
        term asc. The scan walks the sorted per-partition term dicts
        once — corpus text is never touched. Returns [(term, cf)]."""
        out = []
        for t in self.expand_terms("wildcard", f"*{fragment}*", max_terms=100_000):
            _, cf, _ = self.term_stats_and_cursor(t)
            out.append((t, cf))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def suggest_word_breaks(self, term: str, min_break_length: int = 2, k: int = 10):
        """WordBreakSpellChecker analogue ([U] lucene/suggest/.../spell/
        WordBreakSpellChecker.java suggestWordBreaks): split ``term`` at
        every position where BOTH halves are dictionary terms (each at
        least ``min_break_length`` chars, the checker's
        minBreakWordLength). All single-break suggestions have the same
        change count, so the NUM_CHANGES_THEN_MAX_FREQUENCY sort
        degenerates to (max(df_left, df_right) desc, split position asc).
        Returns [(split_pos, left, right, df_left, df_right)]. Cost:
        O(len(term)) dictionary df lookups — corpus text never touched."""
        out = []
        for i in range(min_break_length, len(term) - min_break_length + 1):
            left, right = term[:i], term[i:]
            df_l, _, _ = self.term_stats_and_cursor(left)
            if df_l == 0:
                continue
            df_r, _, _ = self.term_stats_and_cursor(right)
            if df_r == 0:
                continue
            out.append((i, left, right, df_l, df_r))
        out.sort(key=lambda x: (-max(x[3], x[4]), x[0]))
        return out[:k]

    def more_like_this(self, docid: int, max_terms: int = 8, k: int = 10):
        """MoreLikeThis ([U] lucene/queries/.../mlt/MoreLikeThis.java):
        top tf*idf terms of the doc -> OR query (the source doc itself
        ranks first; callers may drop it)."""
        import heapq

        docs_dir = os.path.join(self.index_dir, "docs")
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        # predicate pushdown: docs files are docid-range named and carry
        # row-group stats, so only the file/row-group holding this doc is
        # read — never the whole stored-fields table
        tbl = pads.dataset(docs_dir, format="parquet").to_table(
            columns=["docid", "text"], filter=pc.field("docid") == docid
        )
        if tbl.num_rows == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        text = tbl.column("text")[0].as_py()
        from lucene_solr_ray.analysis import tokenize

        tf: dict[str, int] = {}
        for t in tokenize(text):
            tf[t] = tf.get(t, 0) + 1
        scored = []
        for t, f in tf.items():
            df, _, _ = self.term_stats_and_cursor(t)
            if df > 0:
                scored.append((f * self.simcls.idf(self.n_scoring, df), t))
        top_terms = [t for _, t in heapq.nlargest(max_terms, scored)]
        return self.search(top_terms, k=k, mode="or")

    def term_vector_detail(self, docid: int) -> list[dict]:
        """STORED term vector ([U] lucene/core/.../codecs/lucene50/
        Lucene50TermVectorsFormat — per-doc (term, tf, positions,
        offsets) persisted at build time behind store_term_vectors):
        read via parquet predicate pushdown on the docid-range-named tvs
        files; no re-analysis, no stored-text read. Empty when the index
        was built without term vectors (callers fall back)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        tvs_dir = os.path.join(self.index_dir, "tvs")
        if not os.path.isdir(tvs_dir):
            return []
        tbl = pads.dataset(tvs_dir, format="parquet").to_table(
            filter=pc.field("docid") == docid
        )
        out = [
            {
                "term": str(tbl.column("term")[i].as_py()),
                "tf": int(tbl.column("tf")[i].as_py()),
                "positions": list(tbl.column("positions")[i].as_py()),
                "starts": list(tbl.column("starts")[i].as_py()),
                "ends": list(tbl.column("ends")[i].as_py()),
            }
            for i in range(tbl.num_rows)
        ]
        out.sort(key=lambda r: r["term"])
        return out

    def term_vector(self, docid: int) -> list[tuple[str, int]]:
        """Per-doc term vector ([U] lucene/core/.../index/TermVectors.java):
        served from STORED vectors when the index has them, else the
        'from stored fields by re-analysis' fallback Lucene's highlighter
        uses when vectors aren't stored. Sorted (term, tf) pairs."""
        stored = self.term_vector_detail(docid)
        if stored:
            return [(r["term"], r["tf"]) for r in stored]
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        from lucene_solr_ray.analysis import batch_term_counts

        tbl = pads.dataset(os.path.join(self.index_dir, "docs"), format="parquet").to_table(
            columns=["docid", "text"], filter=pc.field("docid") == docid
        )
        if tbl.num_rows == 0:
            return []
        _, terms, tfs, _ = batch_term_counts([tbl.column("text")[0].as_py()])
        return sorted((str(t), int(f)) for t, f in zip(terms, tfs))

    def highlight_doc(self, docid: int, raw_terms, pre: str = "<em>",
                      post: str = "</em>") -> str | None:
        """Highlight from STORED term-vector offsets: exact character
        spans, no re-tokenization of the text (the unified highlighter's
        offsets-from-vectors path, [U] lucene/highlighter/.../uhighlight/).
        Returns the marked-up text, or None if the doc doesn't exist or
        the index stores no vectors."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        stored = self.term_vector_detail(docid)
        if not stored:
            return None
        want = set(analyze_query_terms(raw_terms))
        spans = []
        for r in stored:
            if r["term"] in want:
                spans.extend(zip(r["starts"], r["ends"]))
        tbl = pads.dataset(os.path.join(self.index_dir, "docs"), format="parquet").to_table(
            columns=["docid", "text"], filter=pc.field("docid") == docid
        )
        if tbl.num_rows == 0:
            return None
        import unicodedata

        text = unicodedata.normalize("NFC", tbl.column("text")[0].as_py())
        out, last = [], 0
        for s, e in sorted(spans):
            out.append(text[last:s])
            out.append(pre)
            out.append(text[s:e])
            out.append(post)
            last = e
        out.append(text[last:])
        return "".join(out)

    def explain(self, raw_terms, docid: int) -> list[dict]:
        """Per-term score breakdown for one doc — the Explanation/CheckHits
        debug aid ([U] lucene/core/.../search/Explanation.java)."""
        out = []
        for t in analyze_query_terms(raw_terms):
            df, cf, cur = self.term_stats_and_cursor(t)
            entry = {"term": t, "df": df, "cf": cf, "score": 0.0}
            if cur is not None:
                d, tf, m = cur.decode_all()
                i = int(np.searchsorted(d, docid))
                if i < len(d) and d[i] == docid:
                    w = self._term_w(df, cf)
                    entry["tf"] = int(tf[i])
                    entry["norm"] = int(m[i])
                    entry["score"] = float(self.simcls.score_term(w, tf[i : i + 1], m[i : i + 1], self.cache)[0])
            out.append(entry)
        return out


class QueryExecutor:
    """Actor-pool stage: queries are data (SURVEY §3 Trace B). Segment
    readers/term dicts are cached per actor across query batches."""

    def __init__(self, index_dir: str, generation: int | None = None, algorithm: str = "auto",
                 similarity: str = "bm25"):
        # warm=True: dictionary loads happen once per actor at pool spinup,
        # never inside a query's latency budget
        self.searcher = IndexSearcher(index_dir, generation, similarity=similarity,
                                      warm=True)
        self.algorithm = algorithm

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docids, scores = [], [], [], []
        for row in batch.to_pylist():
            mode = "and" if row.get("type") == "and" else "or"
            rng = None
            if row.get("docid_hi") is not None:
                rng = (int(row["docid_lo"]), int(row["docid_hi"]))
            d, s = self.searcher.search(
                row["terms"], k=int(row.get("k", 10)), mode=mode,
                algorithm=self.algorithm, docid_range=rng
            )
            for r in range(len(d)):
                qids.append(row["query_id"])
                ranks.append(r)
                docids.append(int(d[r]))
                scores.append(float(s[r]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.string()),
                "rank": pa.array(ranks, type=pa.int32()),
                "docid": pa.array(docids, type=pa.int64()),
                "score": pa.array(np.array(scores, dtype=np.float32), type=pa.float32()),
            }
        )


def run_queries(index_dir: str, queries, concurrency=None, batch_size: int = 64,
                generation: int | None = None, algorithm: str = "auto",
                similarity: str = "bm25", slices: int = 1):
    """Dataset-of-queries -> Dataset of (query_id, rank, docid, score),
    deterministically ordered.

    ``slices=N`` is the per-query leaf-slice fan-out for FEW, HUGE
    queries ([U] lucene/core/.../search/IndexSearcher.java executor +
    leaf slices): every query is split into N docid-range subqueries
    (each its own single-row batch, so the pool can run a hot query's
    slices on N actors concurrently), and the slice top-ks merge by a
    second (query, rank<=k-bounded) selection — bit-equal to slices=1
    because per-doc dense scores are independent of the slicing. The
    default 1 keeps the throughput shape (parallelism across queries)."""
    import ray.data

    from lucene_solr_ray.io_utils import pool_size

    if concurrency is None:
        concurrency = pool_size()

    ds = queries if hasattr(queries, "map_batches") else ray.data.from_arrow(queries)
    if slices > 1:
        from lucene_solr_ray.state.manifest import load_manifest

        n_docs = load_manifest(index_dir, generation)["n_docs"]
        step = -(-n_docs // slices)

        def explode(t: pa.Table) -> pa.Table:
            outs = []
            for i in range(slices):
                lo, hi = i * step, min(n_docs, (i + 1) * step)
                if lo >= hi:
                    continue
                s = t.append_column("docid_lo", pa.array([lo] * t.num_rows, pa.int64()))
                s = s.append_column("docid_hi", pa.array([hi] * t.num_rows, pa.int64()))
                outs.append(s)
            return pa.concat_tables(outs)

        ds = ds.map_batches(explode, batch_format="pyarrow")
        batch_size = 1  # one slice per task -> slices spread across the pool
    out = ds.map_batches(
        QueryExecutor,
        fn_constructor_kwargs={"index_dir": index_dir, "generation": generation,
                               "algorithm": algorithm, "similarity": similarity},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if slices > 1:
        # merge slice top-ks: per query the union of slice candidates
        # contains the global top-k (each slice returned ITS best k), so
        # a (score desc, docid) re-selection capped at the query's k is
        # exact. k per query is captured from the query table into the
        # merge closure (pickled to the map_groups workers).
        if hasattr(queries, "map_batches"):
            qrows = queries.take_all()
        else:
            qrows = queries.to_pylist()
        k_by_qid = {q["query_id"]: int(q.get("k", 10)) for q in qrows}

        def merge(g: pa.Table, kq=k_by_qid) -> pa.Table:
            d = g.column("docid").to_numpy()
            s = g.column("score").to_numpy().astype(np.float32)
            qid = g.column("query_id")[0].as_py()
            top = topk_order(d, s, kq.get(qid, 10))
            return pa.table({
                "query_id": pa.array([qid] * len(top), pa.string()),
                "rank": pa.array(np.arange(len(top), dtype=np.int32), pa.int32()),
                "docid": pa.array(d[top], pa.int64()),
                "score": pa.array(s[top], pa.float32()),
            })

        out = out.groupby("query_id").map_groups(merge, batch_format="pyarrow")
    return out.sort(["query_id", "rank"])
