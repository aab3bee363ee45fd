"""Brute-force BM25 oracle — the "reference Lucene" stand-in (FIXTURES.md §5).

Pure Python/NumPy, no Ray: full-corpus in-memory inverted dict, exact
df/tf, Lucene-faithful scoring via the SAME shared modules the engine
uses (analysis.py, codec/norms.py, similarity.py), full-scan top-k with
the score-desc / docID-asc tie-break of TopScoreDocCollector
([U] lucene/core/.../search/TopScoreDocCollector.java).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_ray import similarity as sim
from lucene_solr_ray.analysis import batch_term_counts, tokenize
from lucene_solr_ray.codec.norms import encode_dl


def analyze_query_terms(raw_terms) -> list[str]:
    """Query analysis: each raw term string through the canonical chain;
    distinct results in ascending UTF-8 byte order (FIXTURES.md §3 —
    duplicate query terms count once; accumulation order is pinned)."""
    out: set[str] = set()
    for raw in raw_terms:
        out.update(tokenize(raw))
    return sorted(out, key=lambda t: t.encode("utf-8"))


def topk_order(docids: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k under (score desc, docid asc) — EXACT.

    O(n) selection instead of a full O(n log n) lexsort (a hot-term
    dense scan hands this ~corpus-sized candidate arrays): argpartition
    finds the k-th largest score, the pool keeps every element tied at
    or above it (so score ties can never be cut arbitrarily), and only
    the pool pays the lexsort. Identical output to the full-sort
    formulation; shared by engine and oracle."""
    n = len(scores)
    if n > max(k, 1) * 4 and k > 0:
        part = np.argpartition(-scores, k - 1)[:k]
        thresh = scores[part].min()
        pool = np.flatnonzero(scores >= thresh)
        order = pool[np.lexsort((docids[pool], -scores[pool].astype(np.float64)))]
        return order[:k]
    order = np.lexsort((docids, -scores.astype(np.float64)))
    return order[:k]


class Oracle:
    def __init__(self, table: pa.Table, presorted: bool = False, similarity: str = "bm25"):
        # stable (conv_id, turn_idx) order -> dense docIDs. ``presorted``
        # takes the given row order as the docID order instead (used to
        # model incremental-append arrival order, Lucene semantics).
        if not presorted:
            idx = pa.compute.sort_indices(
                table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            table = table.take(idx)
        texts = table.column("text").to_pylist()
        self.table = table
        rows, terms, tfs, dl = batch_term_counts(texts)
        self.n_docs = len(texts)
        self.dl = dl
        self.sum_dl = int(dl.sum())
        self.norms = encode_dl(dl)
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 1.0
        self.simcls = sim.get_similarity(similarity)
        self.cache = self.simcls.denom_cache(self.avgdl)
        # term -> (docids, tfs) sorted by docid
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        order = np.lexsort((rows, terms.astype(str)))
        terms_s, rows_s, tfs_s = terms[order], rows[order], tfs[order]
        if len(terms_s):
            uniq, starts = np.unique(terms_s, return_index=True)
            bounds = np.append(starts, len(terms_s))
            for i, t in enumerate(uniq):
                lo, hi = bounds[i], bounds[i + 1]
                self.postings[str(t)] = (rows_s[lo:hi], tfs_s[lo:hi])

    def df(self, term: str) -> int:
        p = self.postings.get(term)
        return 0 if p is None else len(p[0])

    def search(self, raw_terms, k: int = 10, mode: str = "or") -> tuple[np.ndarray, np.ndarray]:
        """-> (docids, float32 scores), top-k, score desc / docid asc."""
        terms = analyze_query_terms(raw_terms)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        plists = [(t, self.postings.get(t)) for t in terms]
        present = [(t, p) for t, p in plists if p is not None]
        if mode == "and":
            if len(present) != len(plists) or not present:
                return empty
            cand = present[0][1][0]
            for _, p in present[1:]:
                cand = np.intersect1d(cand, p[0], assume_unique=True)
        else:
            if not present:
                return empty
            cand = np.unique(np.concatenate([p[0] for _, p in present]))
        if len(cand) == 0:
            return empty
        parts = []
        for t, p in present:
            docids_t, tfs_t = p
            w = sim.weight_for(self.simcls, self.n_docs, len(docids_t),
                               int(tfs_t.sum()), self.sum_dl)
            s = np.zeros(len(cand), dtype=np.float32)
            pos = np.searchsorted(cand, docids_t)
            hit = (pos < len(cand)) & (cand[np.minimum(pos, len(cand) - 1)] == docids_t)
            s[pos[hit]] = self.simcls.score_term(w, tfs_t[hit], self.norms[docids_t[hit]], self.cache)
            parts.append(s)
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    def search_boolean(self, should=(), must=(), must_not=(), filter_terms=(),
                       k: int = 10, boost: dict | None = None):
        """Brute-force general BooleanQuery (engine mirror)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        boost = boost or {}

        def load(raw_list):
            return [(t, self.postings.get(t)) for t in analyze_query_terms(raw_list)]

        must_l, should_l = load(must), load(should)
        not_l, filt_l = load(must_not), load(filter_terms)
        if any(p is None for _, p in must_l + filt_l):
            return empty
        if must_l:
            cand = must_l[0][1][0]
            for _, p in must_l[1:]:
                cand = np.intersect1d(cand, p[0], assume_unique=True)
        else:
            present = [p for _, p in should_l if p is not None]
            if not present:
                return empty
            cand = np.unique(np.concatenate([p[0] for p in present]))
        for _, p in filt_l:
            cand = np.intersect1d(cand, p[0], assume_unique=True)
        for _, p in not_l:
            if p is not None:
                cand = np.setdiff1d(cand, p[0], assume_unique=True)
        if len(cand) == 0:
            return empty
        scoring = sorted(
            [(t, p) for t, p in must_l + should_l if p is not None],
            key=lambda x: x[0].encode("utf-8"),
        )
        parts = []
        for t, p in scoring:
            docids_t, tfs_t = p
            b = float(boost.get(t, 1.0))
            w = np.float32(b * self.simcls.idf(self.n_docs, len(docids_t)))
            s = np.zeros(len(cand), dtype=np.float32)
            pos = np.searchsorted(cand, docids_t)
            hit = (pos < len(cand)) & (cand[np.minimum(pos, len(cand) - 1)] == docids_t)
            s[pos[hit]] = self.simcls.score_term(w, tfs_t[hit], self.norms[docids_t[hit]], self.cache)
            parts.append(s)
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    def search_clauses(self, clauses, k: int = 10, min_should_match: int = 0):
        """Brute-force mirror of IndexSearcher.search_clauses (clause
        groups with multi-term alternatives + phrase clauses; no
        docvalues filters — those are engine-side parquet pushdown and
        are tested against the stored columns directly)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        loaded = []
        for cl in clauses:
            occur = cl["occur"]
            boost = float(cl.get("boost", 1.0))
            if cl.get("kind", "terms") == "phrase":
                d, s = self.search_phrase(cl["terms"], k=max(1, self.n_docs),
                                          slop=int(cl.get("slop", 0)))
                o = np.argsort(d)
                m = {"kind": "phrase", "docs": d[o],
                     "scores": (np.float32(boost) * s[o]).astype(np.float32)}
                if len(d) == 0 and occur in ("must", "filter"):
                    return empty
            else:
                alts = [(t, self.postings[t]) for t in analyze_query_terms(cl["terms"])
                        if t in self.postings]
                if not alts and occur in ("must", "filter"):
                    return empty
                m = {"kind": "terms", "alts": alts, "boost": boost}
            loaded.append((occur, m))

        def all_docs(m):
            if m["kind"] == "phrase":
                return m["docs"]
            if not m["alts"]:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate([p[0] for _, p in m["alts"]]))

        def match_set(m):
            return set(all_docs(m).tolist())

        musts = [m for oc, m in loaded if oc == "must"]
        shoulds = [m for oc, m in loaded if oc == "should"]
        present_should = [m for m in shoulds
                          if (m["kind"] == "phrase" and len(m["docs"])) or
                             (m["kind"] == "terms" and m["alts"])]
        pure_filter = not musts and not shoulds and any(oc == "filter" for oc, _ in loaded)
        mm = min_should_match if (musts or pure_filter) else max(min_should_match, 1)
        if mm > 0 and len(present_should) < mm:
            return empty
        if musts:
            cand = all_docs(musts[0])
            for m in musts[1:]:
                cand = np.intersect1d(cand, all_docs(m), assume_unique=True)
        elif present_should:
            cand = np.unique(np.concatenate([all_docs(m) for m in present_should]))
        elif pure_filter:
            filt = [all_docs(m) for oc, m in loaded if oc == "filter"]
            cand = filt[0]
            for d in filt[1:]:
                cand = np.intersect1d(cand, d, assume_unique=True)
        else:
            return empty
        for oc, m in loaded:
            if oc == "filter" and not pure_filter:
                cand = np.intersect1d(cand, all_docs(m), assume_unique=True)
            elif oc == "must_not":
                cand = np.setdiff1d(cand, all_docs(m), assume_unique=True)
        if len(cand) == 0:
            return empty
        if mm > 0 and present_should:
            cnt = np.zeros(len(cand), dtype=np.int32)
            for m in present_should:
                s = match_set(m)
                cnt += np.fromiter((int(d) in s for d in cand), dtype=np.int32, count=len(cand))
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
                for t, p in m["alts"]:
                    docids_t, tfs_t = p
                    w = np.float32(m["boost"] * self.simcls.idf(self.n_docs, len(docids_t)))
                    s = np.zeros(len(cand), dtype=np.float32)
                    pos = np.searchsorted(cand, docids_t)
                    hit = (pos < len(cand)) & (cand[np.minimum(pos, len(cand) - 1)] == docids_t)
                    s[pos[hit]] = self.simcls.score_term(
                        w, tfs_t[hit], self.norms[docids_t[hit]], self.cache
                    )
                    parts.append(s)
        if not parts:
            d = cand[: min(k, len(cand))]
            return d, np.zeros(len(d), dtype=np.float32)
        scores = sim.accumulate(parts)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    def search_dismax(self, raw_terms, k: int = 10, tie_breaker: float = 0.0):
        """Brute-force DisjunctionMaxQuery (engine mirror)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        clauses = [(t, self.postings.get(t)) for t in analyze_query_terms(raw_terms)]
        clauses = [(t, p) for t, p in clauses if p is not None]
        if not clauses:
            return empty
        cand = np.unique(np.concatenate([p[0] for _, p in clauses]))
        parts = []
        for t, p in clauses:
            docids_t, tfs_t = p
            w = sim.weight_for(self.simcls, self.n_docs, len(docids_t),
                               int(tfs_t.sum()), self.sum_dl)
            s = np.zeros(len(cand), dtype=np.float32)
            pos = np.searchsorted(cand, docids_t)
            s[pos] = self.simcls.score_term(w, tfs_t, self.norms[docids_t], self.cache)
            parts.append(s)
        scores = sim.dismax_combine(parts, tie_breaker)
        top = topk_order(cand, scores, k)
        return cand[top], scores[top]

    def _ensure_positions(self) -> None:
        from lucene_solr_ray.analysis import tokenize_with_positions

        if not hasattr(self, "_positions"):
            self._positions: dict[str, dict[int, np.ndarray]] = {}
            for docid, text in enumerate(self.table.column("text").to_pylist()):
                by_term: dict[str, list[int]] = {}
                for tok, p in tokenize_with_positions(text or ""):
                    by_term.setdefault(tok, []).append(p)
                for tok, ps in by_term.items():
                    self._positions.setdefault(tok, {})[docid] = np.asarray(ps, dtype=np.int64)

    def search_phrase(self, raw_terms, k: int = 10, slop: int = 0) -> tuple[np.ndarray, np.ndarray]:
        """Brute-force PhraseQuery reference: position adjacency with
        StopFilter gaps; tf = phrase freq, weight = float32 sum of idfs."""
        from lucene_solr_ray.analysis import tokenize_with_positions

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        qterms: list[tuple[str, int]] = []
        pos = 0
        for raw in raw_terms:
            items = tokenize_with_positions(raw)
            for tok, p in items:
                qterms.append((tok, pos + p))
            pos += max((p for _, p in items), default=0) + 1
        if not qterms:
            return empty
        self._ensure_positions()
        for t, _ in qterms:
            if t not in self._positions:
                return empty
        w = np.float32(sum(self.simcls.idf(self.n_docs, len(self._positions[t])) for t, _ in qterms))
        from lucene_solr_ray.phrase import phrase_freq

        doc_sets = [set(self._positions[t].keys()) for t, _ in qterms]
        cand = sorted(set.intersection(*doc_sets))
        doc_out, freqs, norm_b = [], [], []
        for doc in cand:
            shifted = [self._positions[t][doc] - qp for t, qp in qterms]
            freq = phrase_freq(shifted, slop)
            if freq:
                doc_out.append(doc)
                freqs.append(freq)
                norm_b.append(int(self.norms[doc]))
        if not doc_out:
            return empty
        d_arr = np.asarray(doc_out, dtype=np.int64)
        scores = self.simcls.score_term(
            w, np.asarray(freqs, dtype=np.int64), np.asarray(norm_b, dtype=np.int64), self.cache
        )
        top = topk_order(d_arr, scores, k)
        return d_arr[top], scores[top]

    def search_multi_phrase(self, slots, k: int = 10, slop: int = 0) -> tuple[np.ndarray, np.ndarray]:
        """Brute-force MultiPhraseQuery reference: slot i matches any of
        its terms at position i; per-slot positions are the union over
        the slot's present terms; weight = float32 sum of present-term
        idfs in sorted term order (engine mirrors this exactly)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
        if not slots:
            return empty
        self._ensure_positions()
        slot_terms = []
        present_all: set[str] = set()
        for raw_slot in slots:
            present = sorted(
                {t for t in analyze_query_terms(list(raw_slot)) if t in self._positions}
            )
            if not present:
                return empty
            slot_terms.append(present)
            present_all.update(present)
        w = np.float32(
            sum(self.simcls.idf(self.n_docs, len(self._positions[t]))
                for t in sorted(present_all))
        )
        from lucene_solr_ray.phrase import phrase_freq

        slot_docs = [
            set().union(*(self._positions[t].keys() for t in terms)) for terms in slot_terms
        ]
        cand = sorted(set.intersection(*slot_docs))
        doc_out, freqs, norm_b = [], [], []
        for doc in cand:
            per_slot = []
            for qp, terms in enumerate(slot_terms):
                arrs = [self._positions[t][doc] for t in terms if doc in self._positions[t]]
                merged = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
                per_slot.append(merged - qp)
            freq = phrase_freq(per_slot, slop)
            if freq:
                doc_out.append(doc)
                freqs.append(freq)
                norm_b.append(int(self.norms[doc]))
        if not doc_out:
            return empty
        d_arr = np.asarray(doc_out, dtype=np.int64)
        scores = self.simcls.score_term(
            w, np.asarray(freqs, dtype=np.int64), np.asarray(norm_b, dtype=np.int64), self.cache
        )
        top = topk_order(d_arr, scores, k)
        return d_arr[top], scores[top]

    def search_all(self, query_table: pa.Table) -> pa.Table:
        """Run the full query set -> (query_id, rank, docid, score)."""
        qids, ranks, docids, scores = [], [], [], []
        for row in query_table.to_pylist():
            d, s = self.search(row["terms"], k=row["k"], mode=row["type"] if row["type"] in ("and",) else "or")
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
