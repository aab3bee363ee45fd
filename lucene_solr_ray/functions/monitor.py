"""Percolator (reverse search) + highlighter — SURVEY §2.5/§2.6 aux ops.

- Percolator: Lucene ``monitor`` module shape ([U] lucene/monitor/):
  stored queries are compiled once per actor (the stateful part), then a
  document STREAM is matched against the whole query set per batch.
- Highlighter: UnifiedHighlighter-lite ([U] lucene/highlighter/):
  post-hoc snippet extraction for hits, joined to the stored fields.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray

from lucene_solr_ray.io_utils import read_parquet_clean
import ray.data

from lucene_solr_ray.analysis import tokenize


class PercolateStage:
    """Actor-pool stage holding the compiled query set: per batch, emit
    (doc_id, query_id) for every stored query the doc matches.

    Compilation builds a term -> queries inverted index over the stored
    set (the Lucene monitor "presearcher" idea, [U] lucene/monitor/.../
    TermFilteredPresearcher.java): a doc only probes queries sharing at
    least one of its tokens, so matching cost scales with overlap, not
    with the stored-query count. Happens once per actor."""

    def __init__(self, queries_ref):
        from lucene_solr_ray.oracle import analyze_query_terms as _aq
        from lucene_solr_ray.queryparser import parse_query

        raw = ray.get(queries_ref) if not isinstance(queries_ref, list) else queries_ref
        self.compiled = []
        self.by_term: dict[str, list[int]] = {}
        # queries whose terms all analyze away (stopwords/empty) can never
        # be routed by the term index; they match every document — the
        # ANYTOKEN fallback of TermFilteredPresearcher
        self.termless: list[int] = []
        for qi, q in enumerate(raw):
            qtype = q.get("type", "or")
            if qtype == "parsed":
                # classic query string: terms/phrases/occur prefixes.
                # Wildcard/fuzzy/range atoms need a term dict and dv
                # filters need stored fields — both raise here (monitor
                # matches against single documents, not an index).
                clauses, dv = parse_query(q["query"], searcher=None)
                if dv:
                    raise ValueError(
                        f"percolator query {q['query_id']!r}: docvalues "
                        "filters are not supported in the doc stream"
                    )
                for cl in clauses:
                    if cl["kind"] == "terms":
                        cl["_alts"] = frozenset(_aq(cl["terms"]))
                # routing terms: any positive clause vocabulary
                terms = set()
                for cl in clauses:
                    if cl["occur"] != "must_not":
                        if cl["kind"] == "terms":
                            terms.update(cl["_alts"])
                        else:
                            for w in cl["terms"]:
                                terms.update(tokenize(w))
                self.compiled.append((q["query_id"], "parsed", clauses))
            elif qtype == "range":
                # PointRangeQuery clause ([U] lucene/core/.../search/
                # PointRangeQuery.java as a monitor query): numeric
                # [lo, hi) on a stream field, optionally ANDed with
                # terms. A range-only query has no routing vocabulary —
                # it takes the termless (ANYTOKEN) probe path.
                terms = set()
                for t in q.get("terms", ()):
                    terms.update(tokenize(t))
                self.compiled.append(
                    (q["query_id"], "range",
                     (q["field"], int(q["lo"]), int(q["hi"]), frozenset(terms))))
            else:
                terms = set()
                for t in q["terms"]:
                    terms.update(tokenize(t))
                self.compiled.append((q["query_id"], qtype, frozenset(terms)))
            if terms:
                for t in terms:
                    self.by_term.setdefault(t, []).append(qi)
            else:
                self.termless.append(qi)

    @staticmethod
    def _matches_parsed(clauses, toks: frozenset, text: str) -> bool:
        from lucene_solr_ray.analysis import tokenize_with_positions
        from lucene_solr_ray.phrase import phrase_freq

        pos_of = None  # lazy per-doc positional map, phrase clauses only

        def clause_hit(cl) -> bool:
            nonlocal pos_of
            if cl["kind"] == "terms":
                return any(a in toks for a in cl["_alts"])
            if pos_of is None:
                pos_of = {}
                for tok, p in tokenize_with_positions(text or ""):
                    pos_of.setdefault(tok, []).append(p)
            arrs = []
            for qp, w in enumerate(cl["terms"]):
                emitted = tokenize(w)
                if not emitted:  # stopword slot: gap, not a constraint
                    continue
                ps = pos_of.get(emitted[0])
                if ps is None:
                    return False
                arrs.append(np.asarray(ps, dtype=np.int64) - qp)
            return bool(arrs) and phrase_freq(arrs, int(cl.get("slop", 0))) > 0

        n_should = matched_should = 0
        has_must = False
        for cl in clauses:
            occur = cl["occur"]
            if occur in ("must", "filter"):
                has_must = True
                if not clause_hit(cl):
                    return False
            elif occur == "must_not":
                if clause_hit(cl):
                    return False
            else:
                n_should += 1
                if clause_hit(cl):
                    matched_should += 1
        if n_should and not has_must:
            return matched_should >= 1  # implicit mm=1 without MUST
        # all MUST/FILTER clauses held (or none existed: zero-clause /
        # pure-must_not queries match nothing, Lucene semantics)
        return has_must

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, query_ids = [], []
        fields = {c: t.column(c).to_pylist() for c in t.column_names
                  if c not in ("doc_id", "text")}
        for row, (d, s) in enumerate(zip(t.column("doc_id").to_pylist(),
                                         t.column("text").to_pylist())):
            toks = frozenset(tokenize(s or ""))
            cand: set[int] = set(self.termless)
            for tok in toks:
                cand.update(self.by_term.get(tok, ()))
            hits = []
            for qi in cand:
                qid, qtype, qbody = self.compiled[qi]
                if qtype == "parsed":
                    if self._matches_parsed(qbody, toks, s or ""):
                        hits.append(qid)
                elif qtype == "range":
                    field, lo, hi, terms = qbody
                    v = fields[field][row]
                    if v is not None and lo <= int(v) < hi and terms <= toks:
                        hits.append(qid)
                elif qtype != "and" or qbody <= toks:  # candidates already share a term
                    hits.append(qid)
            for qid in sorted(hits):
                doc_ids.append(d)
                query_ids.append(qid)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "query_id": pa.array(query_ids, pa.string()),
            }
        )


def percolate(sf_dir: str, stored_queries: list[dict], concurrency=None) -> ray.data.Dataset:
    """Match the documents stream against stored queries."""
    from lucene_solr_ray.io_utils import pool_size

    if concurrency is None:
        concurrency = pool_size()
    cols = ["doc_id", "text"]
    cols += sorted({q["field"] for q in stored_queries if q.get("type") == "range"})
    ref = ray.put(stored_queries)
    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=cols)
        .map_batches(
            PercolateStage,
            fn_constructor_kwargs={"queries_ref": ref},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .sort(["doc_id", "query_id"])
    )


def highlight(sf_dir: str, terms: list[str], window_tokens: int = 5) -> ray.data.Dataset:
    """Snippet per matching doc: the first matched term with up to
    ``window_tokens`` whitespace tokens of context either side, matched
    term wrapped in <em>..</em>."""
    analyzed = set()
    for t in terms:
        analyzed.update(tokenize(t))
    pattern = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in sorted(analyzed)) + r")\b", re.IGNORECASE
    ) if analyzed else None

    def fn(t: pa.Table) -> pa.Table:
        doc_ids, snippets = [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            if not s or pattern is None:
                continue
            m = pattern.search(s)
            if not m:
                continue
            words = s.split(" ")
            # word index containing the match = spaces before the match
            # offset (O(prefix) slice-count instead of walking every word)
            idx = s.count(" ", 0, m.start())
            lo = max(0, idx - window_tokens)
            hi = min(len(words), idx + window_tokens + 1)
            snippet_words = words[lo:hi]
            snippet_words[idx - lo] = f"<em>{snippet_words[idx - lo]}</em>"
            doc_ids.append(d)
            snippets.append(" ".join(snippet_words))
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "snippet": pa.array(snippets, pa.string())}
        )

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )


ALERT_DOCS = (
    (91000001, "merge join alert fires here"),
    (91000002, "vector drift detected"),
    (91000003, "nothing interesting at all"),
    (91000004, "merge join vector spark noise"),
    (91000005, "vector merge join combo"),
)


def percolate_stream_alerts(sf_dir: str, stored_queries=None) -> pa.Table:
    """Streaming alerting — the monitor applied to an INGEST stream
    rather than the stored corpus (the Lucene monitor's deployment
    shape: a Topic/Daemon feeds newly arriving docs through the
    registered query set; [U] lucene/monitor/.../Monitor.java match()).
    The micro-batch of new docs streams through the same PercolateStage
    actor the corpus entry uses — the stored-query compile happens once
    per actor, each arriving batch probes via the term-routed
    presearcher, and the corpus is never rescanned. Alerts =
    (doc_id, query_id) for the new docs only."""
    if stored_queries is None:
        stored_queries = [
            {"query_id": "al-and", "type": "and", "terms": ["merge", "join"]},
            {"query_id": "al-or", "type": "or", "terms": ["vector"]},
            {"query_id": "al-parsed", "type": "parsed",
             "query": '+vector +"merge join" -spark'},
        ]
    batch = pa.table({
        "doc_id": pa.array([d for d, _ in ALERT_DOCS], pa.int64()),
        "text": pa.array([t for _, t in ALERT_DOCS], pa.string()),
    })
    ref = ray.put(stored_queries)
    return (
        ray.data.from_arrow(batch)
        .map_batches(PercolateStage,
                     fn_constructor_kwargs={"queries_ref": ref},
                     # one micro-batch in flight -> one actor; a real
                     # topic feed would size this like percolate() does
                     batch_format="pyarrow", concurrency=1)
        .sort(["doc_id", "query_id"])
        .to_pandas()
        .pipe(lambda df: pa.table({
            "doc_id": pa.array(df["doc_id"].astype("int64"), pa.int64()),
            "query_id": pa.array(df["query_id"].astype(str), pa.string()),
        }))
    )
