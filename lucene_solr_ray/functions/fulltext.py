"""Full-text operators over the driver's ``documents`` table.

Adapts documents (doc_id, text, ...) to the transcript contract schema
(one doc = one single-turn conversation), builds/caches an index per
sf_dir, and exposes retrieval operators as Ray Data pipelines. EVERY
entry is DuckDB-checkable: boolean/stats entries directly, scored
entries (BM25/LMDirichlet/dismax/rerank/feature-boost) rank-only
against the float32-replicating oracles in ft_oracle.py, with the
pytest oracle additionally pinning exact float parity (FIXTURES.md §5).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray.data

from lucene_solr_ray.io_utils import join_partitions, read_parquet_clean
from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.state.manifest import latest_generation

CACHE_ROOT = os.environ.get("LSR_CACHE", "/tmp/lsr_cache")


def transcripts_from_documents(sf_dir: str) -> ray.data.Dataset:
    """documents -> transcript-contract schema; zero-padded conv_id keeps
    (conv_id, turn_idx) order == doc_id order, so docid == rank(doc_id)."""
    path = os.path.join(sf_dir, "documents.parquet")

    def adapt(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy()
        n = len(doc_id)
        return pa.table(
            {
                "conv_id": pa.array([f"doc-{d:012d}" for d in doc_id], type=pa.string()),
                "turn_idx": pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
                "role": pa.array(["user"] * n, type=pa.string()),
                "text": batch.column("text"),
                "tool": pa.array([""] * n, type=pa.string()),
                "ts": pa.array(
                    np.datetime64("2026-01-01T00:00:00", "us")
                    + doc_id.astype("timedelta64[s]").astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "doc_id": batch.column("doc_id"),
                # extra doc-values columns pass straight through to
                # docs.parquet (sort-by-field collector + schema-routed
                # docvalues filters use them)
                "n_chars": batch.column("n_chars"),
                "lang": batch.column("lang"),
                "source": batch.column("source"),
            }
        )

    return read_parquet_clean(path).map_batches(adapt, batch_format="pyarrow")


def docs_index(sf_dir: str, num_partitions: int = 8, salt: int = 1) -> str:
    """Build (once, cached) the positional documents index for an sf_dir."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{num_partitions}|{salt}|v5-tv".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"docs-index-{key}")
    if latest_generation(index_dir) is None:
        build_index(
            transcripts_from_documents(sf_dir), index_dir,
            num_partitions=num_partitions, salt=salt, store_positions=True,
            store_term_vectors=True,
        )
    return index_dir


def span_near_retrieve(sf_dir: str, clauses: list[str], slop: int = 0,
                       in_order: bool = False) -> pa.Table:
    """SpanNearQuery match set ([U] lucene/core/.../search/spans/
    SpanNearQuery.java) -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_span_near(clauses, slop=slop, in_order=in_order)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def span_or_near_retrieve(sf_dir: str, clauses: list, slop: int = 0,
                          in_order: bool = False) -> pa.Table:
    """SpanNearQuery with SpanOrQuery clauses ([U] .../spans/
    SpanOrQuery.java): a list clause matches at the union of its
    alternatives' positions."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_span_near(clauses, slop=slop, in_order=in_order)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def phrase_wildcard_retrieve(sf_dir: str, lead: str = "merge",
                             prefix: str = "v") -> pa.Table:
    """PhraseWildcardQuery ([U] lucene/sandbox/.../search/
    PhraseWildcardQuery.java): a phrase where one slot is a multi-term
    expansion — here "<lead> <prefix>*". The sandbox query's
    segment-by-segment term expansion is replaced by the sorted-dict
    scan (expand_terms), then evaluated as SpanNear(ordered, slop=0)
    over [lead, SpanOr(expansion)] — identical match semantics
    (adjacency in position space, so a stopword gap between the slots
    correctly rejects). -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    exp = s.expand_terms("prefix", prefix)
    if not exp:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    d = s.search_span_near([lead, exp], slop=0, in_order=True)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def span_multiterm_near_retrieve(sf_dir: str, pattern: str = "s*m",
                                 other: str = "sort", slop: int = 4,
                                 in_order: bool = False) -> pa.Table:
    """SpanMultiTermQueryWrapper ([U] lucene/core/.../search/spans/
    SpanMultiTermQueryWrapper.java): a WildcardQuery rewritten to a
    SpanOr over its dictionary expansion (SpanRewriteMethod), composed
    inside a SpanNear with a literal clause. Expansion runs over the
    stop-filtered indexed vocabulary, so stopwords can never satisfy
    the wildcard slot. -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    exp = s.expand_terms("wildcard", pattern)
    if not exp:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    d = s.search_span_near([exp, other], slop=slop, in_order=in_order)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def span_nested_retrieve(sf_dir: str, inner=("merge", "join"),
                         inner_slop: int = 2, outer_term: str = "vector",
                         outer_slop: int = 3) -> pa.Table:
    """Nested SpanNearQuery (SpanNear composed of a SpanNear sub-span
    plus a term — see IndexSearcher.search_span_nested for the exact
    per-level slop semantic) -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_span_nested(inner[0], inner[1], inner_slop,
                             outer_term, outer_slop)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def span_position_range_retrieve(sf_dir: str, term: str, start: int, end: int) -> pa.Table:
    """SpanPositionRangeQuery match set ([U] .../spans/
    SpanPositionRangeQuery.java) -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_span_position_range(term, start, end)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def span_not_retrieve(sf_dir: str, include: str, exclude: str,
                      pre: int = 0, post: int = 0) -> pa.Table:
    """SpanNotQuery match set ([U] .../spans/SpanNotQuery.java) ->
    sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_span_not(include, exclude, pre=pre, post=post)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def span_containing_retrieve(sf_dir: str, term_a: str, term_b: str,
                             slop: int, little: str) -> pa.Table:
    """SpanContainingQuery: distinct big SpanNear(a,b,slop,unordered)
    spans that enclose a ``little`` occurrence -> (doc_id, lo, hi)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, lo, hi = s.search_span_containing(term_a, term_b, slop, little)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "doc_id": pa.array(mapping[d].astype(np.int64) if len(d) else
                           np.empty(0, np.int64), pa.int64()),
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(hi, pa.int64()),
    })


def span_within_retrieve(sf_dir: str, term_a: str, term_b: str,
                         slop: int, little: str) -> pa.Table:
    """SpanWithinQuery: distinct ``little`` occurrences enclosed by some
    big SpanNear(a,b,slop,unordered) span -> (doc_id, pos)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, pos = s.search_span_within(term_a, term_b, slop, little)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "doc_id": pa.array(mapping[d].astype(np.int64) if len(d) else
                           np.empty(0, np.int64), pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    })


def synonym_topk(sf_dir: str, terms: list[str], k: int = 10) -> pa.Table:
    """SynonymQuery top-k, RANK-ONLY output (oracle:
    ft_oracle.synonym_topk_sql — blended df, summed tf, one rounding)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _sc = s.search_synonym(terms, k=k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(d)), pa.int64()),
        "doc_id": pa.array(mapping[d].astype(np.int64) if len(d) else
                           np.empty(0, np.int64), pa.int64()),
    })


def span_first_retrieve(sf_dir: str, term: str, end: int) -> pa.Table:
    """SpanFirstQuery match set ([U] .../spans/SpanFirstQuery.java) ->
    sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_span_first(term, end)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def docs_index_sorted(sf_dir: str, field: str = "n_chars",
                      num_partitions: int = 8, salt: int = 1) -> str:
    """Build (once, cached) a documents index with an index-time sort
    ([U] IndexWriterConfig.setIndexSort): docids assigned in
    (field desc, conv_id) order, enabling early-terminating sorted
    queries."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{num_partitions}|{salt}"
        f"|sorted-{field}-desc|v1-isort".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"docs-index-{key}")
    if latest_generation(index_dir) is None:
        build_index(
            transcripts_from_documents(sf_dir), index_dir,
            num_partitions=num_partitions, salt=salt,
            docid_mode=f"sorted-by:{field}:desc",
        )
    return index_dir


def index_sorted_topk(sf_dir: str, terms: list[str], field: str = "n_chars",
                      k: int = 10) -> pa.Table:
    """EarlyTerminatingSortingCollector over an index-time-sorted index:
    docid order == (field desc, doc_id) order, so the first k streamed
    matches ARE the top-k — only the leading postings windows decode and
    only k doc-values rows are fetched (parquet filter pushdown). The
    un-sorted-index equivalent is ft_sorted_by_field's full
    match-set⋈docs sort."""
    index_dir = docs_index_sorted(sf_dir, field)
    s = IndexSearcher(index_dir)
    d, vals = s.search_sorted_by_field(terms, field, k=k, descending=True,
                                       window=1 << 12)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(d)), pa.int64()),
            "doc_id": pa.array(mapping[d].astype(np.int64) if len(d) else
                               np.empty(0, np.int64), pa.int64()),
            field: pa.array(np.asarray(vals).astype(np.int64), pa.int64()),
        }
    )


def _docid_to_doc_id(index_dir: str) -> np.ndarray:
    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "doc_id"]
    )
    order = pa.compute.sort_indices(docs.column("docid"))
    return docs.column("doc_id").take(order).to_numpy()


def boolean_retrieve(sf_dir: str, terms: list[str], mode: str = "or") -> pa.Table:
    """Boolean retrieval (TermQuery/BooleanQuery without scoring output,
    [U] lucene/core/.../search/BooleanQuery.java) -> sorted doc_id set.
    Uses the streaming iter_matches shape (windowed block decode, no
    scoring, no full-match materialization inside the engine)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    chunks = list(s.iter_matches(terms, mode=mode))
    d = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def _sur_expand(s: IndexSearcher, w: str) -> list[str]:
    if "*" in w or "?" in w:
        kind = "prefix" if (w.endswith("*") and "*" not in w[:-1] and "?" not in w) else "wildcard"
        return s.expand_terms(kind, w[:-1] if kind == "prefix" else w)
    return [w]


def _sur_eval(s: IndexSearcher, node) -> np.ndarray:
    """Evaluate a surround AST to a sorted docid set. Boolean nodes are
    set algebra over child match sets; distance nodes are SpanNear with
    slop = N-1 (DistanceQuery's rewrite), wildcard operands expanded to
    SpanOr alternative lists over the term dicts."""
    kind = node[0]
    if kind == "term":
        terms = _sur_expand(s, node[1])
        chunks = list(s.iter_matches(terms, mode="or")) if terms else []
        return np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    if kind == "dist":
        _, n, ordered, ops = node
        clauses = []
        for op in ops:
            alts = []
            for w in (op[1] if op[0] == "alts" else [op[1]]):
                alts.extend(_sur_expand(s, w))
            if not alts:
                return np.empty(0, np.int64)
            clauses.append(alts[0] if len(alts) == 1 else alts)
        return np.sort(s.search_span_near(clauses, slop=n - 1, in_order=ordered))
    if kind == "and":
        out = _sur_eval(s, node[1][0])
        for child in node[1][1:]:
            out = np.intersect1d(out, _sur_eval(s, child))
        return out
    if kind == "or":
        return np.union1d(*[_sur_eval(s, c) for c in node[1]]) if len(node[1]) == 2 else (
            np.unique(np.concatenate([_sur_eval(s, c) for c in node[1]])))
    if kind == "not":
        return np.setdiff1d(_sur_eval(s, node[1]), _sur_eval(s, node[2]))
    raise ValueError(f"surround: bad node {node!r}")


def surround_docs(sf_dir: str, query: str) -> pa.Table:
    """SurroundQueryParser ([U] lucene/queryparser/.../surround/): parse
    the proximity language (NW/NN distance ops, wildcards, AND/OR/NOT)
    and evaluate over the positional index -> sorted doc_id match set."""
    from lucene_solr_ray.queryparser import parse_surround

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = _sur_eval(s, parse_surround(query))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def term_stats(sf_dir: str, terms: list[str]) -> pa.Table:
    """Global df/cf per term (TermStates.build analogue)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = []
    for t in sorted(terms):
        df, cf, _ = s.term_stats_and_cursor(t)
        rows.append({"term": t, "df": df, "cf": cf})
    return pa.Table.from_pylist(rows).cast(
        pa.schema([("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64())])
    )


def bm25_topk(sf_dir: str, queries: list[tuple[str, list[str], str]], k: int = 10,
              similarity: str = "bm25") -> pa.Table:
    """Scored top-k via the Ray actor-pool query path -> (query_id, rank,
    doc_id), under any registered similarity (BM25 default; LMDirichlet
    for the ft_lmdirichlet_topk entry). RANK-ONLY output: the float32
    scores never enter the driver hash (the DuckDB oracles in ft_oracle
    replicate the pinned float32 narrowing and order identically —
    measured gap bound in tests/test_ft_oracle_sql.py; exact float
    parity is additionally covered by the pytest oracle suite)."""
    from lucene_solr_ray.pipelines.search import run_queries

    index_dir = docs_index(sf_dir)
    qt = pa.table(
        {
            "query_id": pa.array([q[0] for q in queries]),
            "type": pa.array([q[2] for q in queries]),
            "terms": pa.array([q[1] for q in queries], type=pa.list_(pa.string())),
            "k": pa.array([k] * len(queries), type=pa.int32()),
        }
    )
    res = run_queries(index_dir, qt, similarity=similarity).to_pandas()
    mapping = _docid_to_doc_id(index_dir)
    res["doc_id"] = mapping[res["docid"].to_numpy()]
    res["rank"] = res["rank"].astype(np.int64)
    return pa.Table.from_pandas(
        res[["query_id", "rank", "doc_id"]], preserve_index=False
    )


def rerank_topk(sf_dir: str, main_terms: list[str], rerank_terms: list[str],
                weight: float = 2.0, top_n: int = 60, k: int = 10) -> pa.Table:
    """ReRankQParser ([U] solr/core/.../search/ReRankQParserPlugin.java):
    take the main query's BM25 top-N, add ``weight`` x the rerank
    query's BM25 score for docs it matches (0 otherwise), re-sort the N
    by combined score (ties -> doc_id). RANK-ONLY output; combine op
    order pinned float32(float64(main) + weight*float64(sec)) and
    replicated literally by ft_oracle.rerank_topk_sql."""
    from lucene_solr_ray.oracle import topk_order

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d_main, s_main = s.search(main_terms, k=top_n, mode="or")
    d_sec, s_sec = s.search(rerank_terms, k=max(1, s.n_docs), mode="or")
    order = np.argsort(d_sec)
    d_sec_sorted, s_sec_sorted = d_sec[order], s_sec[order]
    pos = np.searchsorted(d_sec_sorted, d_main)
    pos = np.minimum(pos, max(0, len(d_sec_sorted) - 1))
    hit = (len(d_sec_sorted) > 0) & (d_sec_sorted[pos] == d_main) if len(d_sec_sorted) else np.zeros(len(d_main), bool)
    sec = np.where(hit, s_sec_sorted[pos] if len(d_sec_sorted) else 0.0,
                   np.float32(0.0)).astype(np.float32)
    combined = (s_main.astype(np.float64)
                + float(weight) * sec.astype(np.float64)).astype(np.float32)
    top = topk_order(d_main, combined, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d_main[top]].astype(np.int64) if len(top)
                           else np.empty(0, np.int64), pa.int64()),
    })


def common_terms_topk(sf_dir: str, terms: list[str], max_df_frac: float = 0.3,
                      k: int = 10) -> pa.Table:
    """CommonTermsQuery ([U] lucene/queries/.../CommonTermsQuery.java),
    default SHOULD/SHOULD occurs: terms with df > max_df_frac*N are
    'common' and only contribute score; a doc must match at least one
    'rare' term to be a hit (if every term is common, plain OR). Score =
    the ordinary BM25 OR fold over ALL terms, restricted to the rare
    match set. RANK-ONLY output; ft_oracle.common_terms_topk_sql
    replicates the df-threshold split dynamically in SQL."""
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    qterms = analyze_query_terms(terms)
    rare = [t for t in qterms
            if float(s.term_stats_and_cursor(t)[0]) <= max_df_frac * s.n_docs]
    d_all, s_all = s.search(terms, k=max(1, s.n_docs), mode="or")
    if rare and len(rare) < len(qterms):
        d_rare, _ = s.search(rare, k=max(1, s.n_docs), mode="or")
        keep = np.isin(d_all, d_rare, assume_unique=True)
        d_all, s_all = d_all[keep], s_all[keep]
    top = topk_order(d_all, s_all, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d_all[top]].astype(np.int64) if len(top)
                           else np.empty(0, np.int64), pa.int64()),
    })


def multi_term_retrieve(sf_dir: str, kind: str, pattern: str) -> pa.Table:
    """Multi-term queries (SURVEY §2.5): prefix / wildcard / regexp /
    range expansion over the sorted term dicts -> boolean disjunction ->
    sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    terms = s.expand_terms(kind, pattern)
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    d, _ = s.search(terms, k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def more_like_this_topk(sf_dir: str, doc_id: int = 0, k: int = 10) -> pa.Table:
    """MoreLikeThis: significant terms of one doc -> OR query -> top-k."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    mapping = _docid_to_doc_id(index_dir)
    docid = int(np.searchsorted(mapping, doc_id))  # mapping is doc_id sorted by docid == doc_id order
    d, _sc = s.more_like_this(docid, max_terms=8, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(d)), pa.int64()),
            "doc_id": pa.array(mapping[d], pa.int64()),
        }
    )


def phrase_retrieve(sf_dir: str, phrase: list[str]) -> pa.Table:
    """Boolean phrase containment (PhraseQuery, positions + adjacency with
    StopFilter gaps) -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_phrase(phrase, k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def phrase_topk(sf_dir: str, phrase: list[str], k: int = 10) -> pa.Table:
    """Scored phrase top-k, rank-only output (SQL oracle:
    ft_oracle.phrase_topk_sql; float parity is the pytest oracle's job)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _sc = s.search_phrase(phrase, k=k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(d)), pa.int64()),
            "doc_id": pa.array(mapping[d], pa.int64()),
        }
    )


def boolean_full_retrieve(sf_dir: str, must: list[str], must_not: list[str],
                          filter_terms: list[str]) -> pa.Table:
    """General BooleanQuery retrieval (MUST + MUST_NOT + FILTER) ->
    sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_boolean(must=must, must_not=must_not, filter_terms=filter_terms,
                            k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def query_parser_retrieve(sf_dir: str, query: str) -> pa.Table:
    """Classic query-string parsing + execution ([U] lucene/queryparser/
    .../classic/QueryParser.java): occur prefixes, phrases, multi-term
    expansion, boosts, docvalues field filters -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_parsed(query, k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def multi_phrase_retrieve(sf_dir: str, slots: list[list[str]]) -> pa.Table:
    """MultiPhraseQuery retrieval ([U] lucene/core/.../search/
    MultiPhraseQuery.java): slot i matches any of its terms at phrase
    position i -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_multi_phrase(slots, k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def mlt_interesting_terms(sf_dir: str, doc_id: int = 3, max_terms: int = 8) -> pa.Table:
    """MoreLikeThis.retrieveInterestingTerms ([U] lucene/queries/.../mlt/
    MoreLikeThis.java): the tf*idf-ranked terms MLT would build its query
    from. score_micro = tf_in_doc * FLOOR(idf * 1e6 + 0.5) — exact int64
    (the repo's micro-nat convention), ties term asc. Served from the
    STORED term vectors (docid predicate pushdown) + term-dict df; the
    corpus text is never read."""
    from lucene_solr_ray.similarity import idf as bm25_idf

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    mapping = _docid_to_doc_id(index_dir)
    docid = int(np.searchsorted(mapping, doc_id))
    rows = []
    for e in s.term_vector_detail(docid):
        df = s.term_stats_and_cursor(e["term"])[0]
        if df > 0:
            idf_micro = int(np.floor(bm25_idf(s.n_scoring, df) * 1000000.0 + 0.5))
            rows.append((e["term"], int(e["tf"]), int(df), int(e["tf"]) * idf_micro))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:max_terms]
    return pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "tf": pa.array([r[1] for r in rows], pa.int64()),
        "df": pa.array([r[2] for r in rows], pa.int64()),
        "score_micro": pa.array([r[3] for r in rows], pa.int64()),
    })


def complex_phrase_docs(sf_dir: str, query: str) -> pa.Table:
    """ComplexPhraseQueryParser ([U] lucene/queryparser/.../complexPhrase/
    ComplexPhraseQueryParser.java): a quoted phrase whose words may be
    wildcard / prefix / fuzzy terms. Each word expands over the sorted
    term dicts into one MultiPhraseQuery slot (the parser's span-query
    rewrite collapses to MultiPhrase for single-position slots), with
    optional ``~slop``."""
    import re as _re

    m = _re.match(r'^"([^"]*)"(?:~(\d+))?$', query.strip())
    if m is None:
        raise ValueError(f"complexphrase: expected a quoted phrase, got {query!r}")
    words, slop = m.group(1).split(), int(m.group(2) or 0)
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    slots = []
    for w in words:
        if "~" in w:
            alts = s.expand_terms("fuzzy", w)
        elif "*" in w or "?" in w:
            kind = "prefix" if (w.endswith("*") and "*" not in w[:-1] and "?" not in w) else "wildcard"
            alts = s.expand_terms(kind, w[:-1] if kind == "prefix" else w)
        else:
            alts = [w]
        if not alts:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        slots.append(alts)
    d, _ = s.search_multi_phrase(slots, k=max(1, s.n_docs), slop=slop)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def fielded_retrieve(sf_dir: str, must: list[str], dv_filters: dict) -> pa.Table:
    """Schema-routed fielded search (Solr q + fq over docValues
    StrFields, [U] solr/core/.../schema/IndexSchema.java /
    StrField.java): text MUST terms against the inverted index,
    ``dv_filters`` (field -> value or list) pushed down into
    docs.parquet as predicate filters -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_boolean(must=must, dv_filters=dv_filters, k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def delete_requery(sf_dir: str, delete_terms: list[str], query_terms: list[str]) -> pa.Table:
    """Deletes end-to-end: copy the cached index, tombstone every doc
    matching ``delete_terms`` (delete-by-query commit), expunge via
    forceMerge, and re-run a term query — surviving doc_ids only
    (IndexWriter.deleteDocuments(Query) + forceMergeDeletes)."""
    import shutil

    from lucene_solr_ray.pipelines.deletes import delete_by_query
    from lucene_solr_ray.pipelines.merge import force_merge

    src = docs_index(sf_dir)
    tmp = src + "-delcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    delete_by_query(tmp, delete_terms, mode="or")
    force_merge(tmp, max_segments=1, expunge_deletes=True)
    s = IndexSearcher(tmp)
    d, _ = s.search(query_terms, k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(tmp)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def doc_expiration_requery(sf_dir: str, ttl_seconds: int = 180,
                           query_terms: list[str] = ("merge",)) -> pa.Table:
    """DocExpirationUpdateProcessor ([U] solr/core/.../update/processor/
    DocExpirationUpdateProcessorFactory.java): the periodic reaper's
    deleteByQuery ``expire_at:[* TO NOW]``. The expired set comes from a
    docvalues ts range scan (parquet predicate pushdown on the stored
    fields — never a text read), is tombstoned + expunged, and a requery
    returns only live docs. The adapter contract pins ts = epoch +
    doc_id seconds, so the SQL oracle expresses expiry as a doc_id cut."""
    import shutil

    import pyarrow.compute as _pc
    import pyarrow.dataset as _pads

    from lucene_solr_ray.pipelines.deletes import delete_docs
    from lucene_solr_ray.pipelines.merge import force_merge

    src = docs_index(sf_dir)
    tmp = src + "-ttlcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    cutoff = np.datetime64("2026-01-01T00:00:00", "us") + np.timedelta64(ttl_seconds, "s")
    expired = _pads.dataset(os.path.join(tmp, "docs"), format="parquet").to_table(
        columns=["docid"], filter=_pc.field("ts") < pa.scalar(cutoff)
    )
    delete_docs(tmp, expired.column("docid").to_numpy().tolist())
    force_merge(tmp, max_segments=1, expunge_deletes=True)
    s = IndexSearcher(tmp)
    d, _ = s.search(list(query_terms), k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(tmp)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def upgrade_requery(sf_dir: str, terms: list[str]) -> pa.Table:
    """IndexUpgrader end-to-end ([U] lucene/core/.../index/
    IndexUpgrader.java): copy the cached index, rewrite EVERY segment
    under the alternate registered postings codec (varint-v1, the SPI
    registry's second entry), and re-run a boolean query on the upgraded
    generation — the match set must be identical, proving the rewrite
    round-trips postings across codecs."""
    import shutil

    from lucene_solr_ray.pipelines.merge import upgrade_index

    src = docs_index(sf_dir)
    tmp = src + "-upgcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    m = upgrade_index(tmp, "varint-v1")
    assert m["codec"] == "varint-v1", m["codec"]
    s = IndexSearcher(tmp)
    d, _ = s.search(terms, k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(tmp)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def ts_range_retrieve(sf_dir: str, lo: str, hi: str, filter_terms: list[str] = ()) -> pa.Table:
    """PointRangeQuery on the ts contract column (time-window filter,
    composable with term FILTER clauses) -> sorted doc_id set. The
    adapter assigns ts = 2026-01-01 + doc_id seconds, so the DuckDB
    oracle expresses the same window arithmetically."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_ts_range(lo, hi, filter_terms=filter_terms)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def fuzzy_retrieve(sf_dir: str, pattern: str) -> pa.Table:
    """FuzzyQuery retrieval (edit-distance term expansion) -> sorted
    doc_id set. ``pattern`` is 'term~d' (d = max edits)."""
    return multi_term_retrieve(sf_dir, "fuzzy", pattern)


def min_should_match_retrieve(sf_dir: str, should: list[str], mm: int,
                              must: tuple = ()) -> pa.Table:
    """BooleanQuery minimumNumberShouldMatch: docs matching at least
    ``mm`` of the SHOULD terms -> sorted doc_id set. With MUST clauses
    present, mm still binds the SHOULD set ONLY (the Lucene semantic:
    SHOULD clauses are otherwise optional beside a MUST)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_boolean(should=should, must=list(must),
                            min_should_match=mm, k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def sorted_by_field_topk(sf_dir: str, terms: list[str], field: str = "n_chars",
                         k: int = 10) -> pa.Table:
    """TopFieldCollector in the data plane: the hit docids become a
    Dataset, join the docs.parquet doc-values columns (pruned read), and
    a distributed sort + limit produces the top-k — neither the full
    doc-values column nor the whole match set is sorted in one process
    (the scale path for ranking a large match set by a field)."""
    import ray.data

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search(terms, k=max(1, s.n_docs), mode="or")
    if len(d) == 0:
        return pa.table({"rank": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                         field: pa.array([], pa.int64())})
    hits = ray.data.from_arrow(pa.table({"docid": pa.array(np.sort(d), pa.int64())}))
    docs = read_parquet_clean(
        os.path.join(index_dir, "docs"), columns=["docid", field, "doc_id"]
    )
    top = (
        hits.join(docs, "inner", num_partitions=join_partitions(), on=("docid",))
        .sort([field, "docid"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "rank": pa.array(np.arange(len(top)), pa.int64()),
            "doc_id": pa.array(top["doc_id"].to_numpy().astype(np.int64)),
            field: pa.array(top[field].to_numpy().astype(np.int64)),
        }
    )


def spell_suggest(sf_dir: str, term: str, max_suggestions: int = 5, max_edits: int = 2) -> pa.Table:
    """DirectSpellChecker suggestions (distance asc, df desc, term asc)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = [
        {"sugg_rank": i, "term": t, "distance": d, "df": df}
        for i, (t, d, df) in enumerate(s.suggest_spelling(term, max_suggestions, max_edits))
    ]
    schema = pa.schema([("sugg_rank", pa.int64()), ("term", pa.string()),
                        ("distance", pa.int64()), ("df", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def prefix_suggest(sf_dir: str, prefix: str, k: int = 5) -> pa.Table:
    """Prefix suggester ranked by collection frequency."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = [
        {"sugg_rank": i, "term": t, "cf": cf}
        for i, (t, cf) in enumerate(s.suggest_prefix(prefix, k))
    ]
    schema = pa.schema([("sugg_rank", pa.int64()), ("term", pa.string()), ("cf", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def classic_highlight_fragments(sf_dir: str, terms=("merge", "vector"),
                                fragsize: int = 80) -> ray.data.Dataset:
    """Classic Highlighter with SimpleFragmenter ([U] lucene/highlighter/
    .../highlight/Highlighter.java + SimpleFragmenter.java +
    QueryTermScorer): the document splits into fixed-char fragments —
    a token belongs to fragment floor(end_offset / fragsize)
    (SimpleFragmenter's isNewFragment contract) — and each fragment
    scores the count of query-term occurrences it holds. Emits every
    matching doc's best fragment (score desc, fragment asc). Char
    offsets are the whitespace prefix sums the stored-TV entry already
    proved equal to Lucene offsets on this corpus. One stateless
    vectorized pass, zero shuffle."""
    from lucene_solr_ray.analysis import tokenize as _tok

    qset = set()
    for t in terms:
        qset.update(_tok(t))

    def fn(t: pa.Table) -> pa.Table:
        out_d, out_f, out_h = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            if not s or not s.strip():
                continue
            toks = s.strip().split()
            lens = np.fromiter((len(w) for w in toks), np.int64, count=len(toks))
            ends = np.cumsum(lens + 1) - 2  # char index of each token's last char
            hit = np.fromiter((w in qset for w in toks), bool, count=len(toks))
            if not hit.any():
                continue
            counts = np.bincount(ends[hit] // fragsize)
            best = int(np.argmax(counts))  # first max == smallest frag id
            out_d.append(d)
            out_f.append(best)
            out_h.append(int(counts[best]))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "frag_id": pa.array(out_f, pa.int64()),
                         "n_hits": pa.array(out_h, pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )


def auto_correct_search(sf_dir: str, terms=("mergee", "vector"),
                        k: int = 10) -> pa.Table:
    """Spellcheck-collate auto-requery — the "did you mean" loop run to
    completion ([U] solr/core/.../handler/component/SpellCheckComponent
    collation + client re-query): terms absent from the dictionary are
    replaced by their top SUGGEST_WHEN_NOT_IN_INDEX correction
    (distance asc, df desc, term asc), then the corrected query runs as
    plain BM25. Output rows carry the corrected term list (the collation
    string the response would show) beside the ranking."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    corrected = []
    for qt in terms:
        df, _, _ = s.term_stats_and_cursor(qt)
        if df > 0:
            corrected.append(qt)
            continue
        sugg = s.suggest_spelling(qt, max_suggestions=1, max_edits=2)
        corrected.append(sugg[0][0] if sugg else qt)
    d, _sc = s.search(corrected, k=k, mode="or")
    mapping = _docid_to_doc_id(index_dir)
    collation = " ".join(corrected)
    return pa.table({
        "collation": pa.array([collation] * len(d), pa.string()),
        "rank": pa.array(np.arange(len(d)), pa.int64()),
        "doc_id": pa.array(mapping[d].astype(np.int64), pa.int64()),
    })


def spell_when_not_in_index(sf_dir: str, terms=("merge", "mergee"),
                            max_suggestions: int = 5,
                            max_edits: int = 2) -> pa.Table:
    """DirectSpellChecker suggestMode=SUGGEST_WHEN_NOT_IN_INDEX ([U]
    lucene/suggest/.../spell/SuggestMode.java — Solr's default
    spellcheck behavior): a query term that EXISTS in the dictionary
    gets no suggestions at all; only absent terms are corrected. One
    row per (query term, suggestion); the present term contributes
    zero rows."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = []
    for qt in terms:
        df, _, _ = s.term_stats_and_cursor(qt)
        if df > 0:
            continue  # in index -> no suggestions under this mode
        for rank, (t, dist, sdf) in enumerate(
                s.suggest_spelling(qt, max_suggestions=max_suggestions,
                                   max_edits=max_edits)):
            rows.append({"query_term": qt, "sugg_rank": rank, "term": t,
                         "distance": dist, "df": sdf})
    schema = pa.schema([("query_term", pa.string()), ("sugg_rank", pa.int64()),
                        ("term", pa.string()), ("distance", pa.int64()),
                        ("df", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def spell_suggest_more_popular(sf_dir: str, term: str = "part",
                               max_suggestions: int = 5,
                               max_edits: int = 2) -> pa.Table:
    """DirectSpellChecker suggestMode=SUGGEST_MORE_POPULAR ([U]
    lucene/suggest/.../spell/DirectSpellChecker.java; Solr
    spellcheck.onlyMorePopular): fuzzy candidates keep only dictionary
    terms whose df is STRICTLY higher than the query term's own — the
    "did you mean" mode for terms that exist in the index but are rarer
    than a near neighbor. Ranking stays (distance asc, df desc, term
    asc)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    base_df, _, _ = s.term_stats_and_cursor(term)
    rows = [
        {"sugg_rank": 0, "term": t, "distance": dist, "df": df}
        for t, dist, df in s.suggest_spelling(term, max_suggestions=100_000,
                                              max_edits=max_edits)
        if df > base_df
    ][:max_suggestions]
    for i, r in enumerate(rows):
        r["sugg_rank"] = i
    schema = pa.schema([("sugg_rank", pa.int64()), ("term", pa.string()),
                        ("distance", pa.int64()), ("df", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def context_suggest(sf_dir: str, prefix: str = "s", context_lang: str = "en",
                    k: int = 5) -> pa.Table:
    """Context-filtered suggester ([U] lucene/suggest/.../document/
    ContextQuery.java over ContextSuggestField): completions restricted
    to documents carrying the context (lang = context_lang), suggestion
    weight = collection frequency WITHIN the context — the same ranking
    contract as suggest_prefix, scoped. Per-context cf can't come from
    the global term dicts, so it runs as the term_facet_prefix shape:
    the context filter and the prefix cut both apply map-side, then one
    vocabulary groupby."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import tokenize

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            c.update(tok for tok in tokenize(s or "") if tok.startswith(prefix))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "cf": pa.array(list(c.values()), pa.int64())})

    vocab = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
        .filter(expr=f'lang == "{context_lang}"')
        .map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .to_pandas()
    )
    vocab = vocab.sort_values(["cf", "term"], ascending=[False, True]).head(k)
    return pa.table({
        "sugg_rank": pa.array(np.arange(len(vocab)), pa.int64()),
        "term": pa.array(vocab["term"].astype(str), pa.string()),
        "cf": pa.array(vocab["cf"].astype(np.int64), pa.int64()),
    })


def word_break_suggest(sf_dir: str, term: str, min_break_length: int = 2,
                       k: int = 10) -> pa.Table:
    """WordBreakSpellChecker suggestions for a run-together term ->
    (sugg_rank, split_pos, left_term, right_term, df_left, df_right)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = [
        {"sugg_rank": r, "split_pos": i, "left_term": l, "right_term": rt,
         "df_left": dl, "df_right": dr}
        for r, (i, l, rt, dl, dr) in enumerate(
            s.suggest_word_breaks(term, min_break_length, k))
    ]
    schema = pa.schema([("sugg_rank", pa.int64()), ("split_pos", pa.int64()),
                        ("left_term", pa.string()), ("right_term", pa.string()),
                        ("df_left", pa.int64()), ("df_right", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def elevation_topk(sf_dir: str, terms: list[str], elevated: list[int],
                   excluded: list[int], k: int = 10) -> pa.Table:
    """QueryElevationComponent ([U] solr/core/.../handler/component/
    QueryElevationComponent.java, forceElevation=true): the configured
    ``elevated`` doc_ids are pinned to the top in config order regardless
    of score, ``excluded`` ids are removed, and the rest follow in BM25
    order. RANK-ONLY output (the bm25_topk float32 rank-stability bound
    covers the score ordering). Scale shape: one top-k' WAND query with
    k' = k + |elevated| + |excluded| — the pin/exclude edit is
    output-sized, never corpus-sized."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    k_prime = k + len(elevated) + len(excluded)
    d, _sc = s.search(terms, k=k_prime, mode="or")
    mapping = _docid_to_doc_id(index_dir)
    ranked = mapping[d].astype(np.int64)  # already (score desc, docid) order
    drop = np.array(sorted(set(map(int, elevated)) | set(map(int, excluded))),
                    dtype=np.int64)
    rest = ranked[~np.isin(ranked, drop)]
    final = list(map(int, elevated)) + rest.tolist()
    final = final[:k]
    n_elev = min(len(elevated), len(final))
    return pa.table({
        "rank": pa.array(np.arange(len(final)), pa.int64()),
        "doc_id": pa.array(np.asarray(final, np.int64), pa.int64()),
        "elevated": pa.array(
            np.r_[np.ones(n_elev, np.int64), np.zeros(len(final) - n_elev, np.int64)],
            pa.int64()),
    })


def infix_suggest(sf_dir: str, fragment: str, k: int = 5) -> pa.Table:
    """AnalyzingInfixSuggester: contains-match suggestions ranked by cf."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = [
        {"sugg_rank": i, "term": t, "cf": cf}
        for i, (t, cf) in enumerate(s.suggest_infix(fragment, k))
    ]
    schema = pa.schema([("sugg_rank", pa.int64()), ("term", pa.string()), ("cf", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def term_vector(sf_dir: str, doc_id: int) -> pa.Table:
    """Per-doc term vector (re-analysis of stored fields)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    mapping = _docid_to_doc_id(index_dir)
    docid = int(np.searchsorted(mapping, doc_id))
    rows = [{"term": t, "tf": f} for t, f in s.term_vector(docid)]
    schema = pa.schema([("term", pa.string()), ("tf", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def dismax_topk(sf_dir: str, terms: list[str], tie_breaker: float = 0.3, k: int = 10) -> pa.Table:
    """DisMax top-k, rank-only output (SQL oracle:
    ft_oracle.dismax_topk_sql)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _sc = s.search_dismax(terms, k=k, tie_breaker=tie_breaker)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(d)), pa.int64()),
            "doc_id": pa.array(mapping[d], pa.int64()),
        }
    )


def numeric_range_retrieve(sf_dir: str, field: str, lo: int, hi: int,
                           filter_terms: list[str] = ()) -> pa.Table:
    """PointRangeQuery on an arbitrary NUMERIC doc-values column
    ([U] lucene/core/.../search/PointRangeQuery.java over an IntPoint
    field; the BKD tree's role is played by parquet row-group statistics
    pruning, as in the ts path) -> sorted doc_id set, composable with
    term FILTER clauses."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_ts_range(int(lo), int(hi), filter_terms=filter_terms, field=field)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def terms_qparser_docs(sf_dir: str, field: str = "lang",
                       values: tuple = ("en", "fr")) -> ray.data.Dataset:
    """TermsQParserPlugin {!terms f=field}v1,v2,... ([U] solr/core/.../
    search/TermsQParserPlugin.java): raw set-membership filter over a
    docvalues field — no analysis, no scoring, constant-score filter
    semantics. One pruned two-column read + vectorized Arrow is_in;
    zero shuffle."""
    import pyarrow.compute as pc

    from lucene_solr_ray.io_utils import read_parquet_clean

    vals = pa.array(list(values), pa.string())

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column(field), value_set=vals)
        return t.filter(keep).select(["doc_id"])

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", field])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )


def blended_infix_suggest(sf_dir: str, fragment: str, k: int = 5) -> pa.Table:
    """BlendedInfixSuggester ([U] lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java): infix matches whose weight is DISCOUNTED
    by the match position — earlier matches rank higher. Blend kept
    exact-integer: score = cf // (1 + first_match_position), ranked
    (score desc, term asc); position 0 (prefix match) keeps full weight,
    matching the POSITION_LINEAR blender's intent."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = []
    for t in s.expand_terms("wildcard", f"*{fragment}*", max_terms=100_000):
        _, cf, _ = s.term_stats_and_cursor(t)
        pos = t.find(fragment)
        rows.append((t, cf // (1 + pos), pos))
    rows.sort(key=lambda x: (-x[1], x[0]))
    rows = rows[:k]
    return pa.table({
        "sugg_rank": pa.array(np.arange(len(rows)), pa.int64()),
        "term": pa.array([r[0] for r in rows], pa.string()),
        "blended_weight": pa.array([r[1] for r in rows], pa.int64()),
        "match_pos": pa.array([r[2] for r in rows], pa.int64()),
    })


def luke_index_stats(sf_dir: str) -> pa.Table:
    """LukeRequestHandler /admin/luke overview ([U] solr/core/.../handler/
    admin/LukeRequestHandler.java): per-field summary — distinct value
    count, total occurrence count, and the top value. The ``text`` row
    comes from the segment term dictionaries ONLY (vocabulary-bound Ray
    read + groupby, corpus text never touched); docvalues fields read
    their pruned columns.

    Top-value ties break to the lexicographically smallest value."""
    from ray.data.aggregate import Count

    from lucene_solr_ray.io_utils import read_parquet_clean
    from lucene_solr_ray.pipelines.build import segment_dir
    from lucene_solr_ray.state.manifest import load_manifest

    index_dir = docs_index(sf_dir)
    manifest = load_manifest(index_dir)
    if manifest.get("deletes_file") or manifest.get("purged_file"):
        raise ValueError("luke stats ignore tombstones; expunge first")
    paths = [
        os.path.join(segment_dir(index_dir, s["partition"], s["name"]), "terms.parquet")
        for s in manifest["segments"]
    ]
    terms = (
        ray.data.read_parquet(paths, columns=["term", "cf"])
        .groupby("term").sum("cf")
        .materialize()  # vocabulary-sized
    )
    n_terms = terms.count()
    total_cf = int(terms.sum("sum(cf)"))
    top = terms.sort(["sum(cf)", "term"], descending=[True, False]).limit(1).to_pandas()
    rows = [{"field": "text", "n_distinct": int(n_terms), "total": total_cf,
             "top_value": str(top["term"].iloc[0])}]
    for field in ("lang", "source"):
        vc = (
            read_parquet_clean(f"{sf_dir}/documents.parquet", columns=[field])
            .groupby(field).aggregate(Count(alias_name="n"))
            .sort(["n", field], descending=[True, False])
            .to_pandas()
        )
        rows.append({"field": field, "n_distinct": int(len(vc)),
                     "total": int(vc["n"].sum()),
                     "top_value": str(vc[field].iloc[0])})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("field", pa.string()), ("n_distinct", pa.int64()),
        ("total", pa.int64()), ("top_value", pa.string())]))


def termfreq_topk(sf_dir: str, term: str = "merge", k: int = 20) -> pa.Table:
    """Function query ``termfreq(text, t)`` used as the sort
    ([U] lucene/queries/.../function/valuesource/TermFreqValueSource.java;
    Solr sort=termfreq(...) desc): top-k docs by within-doc term
    frequency, ties doc_id asc. Served straight from the decoded posting
    list (one term's postings only — never a corpus scan)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    df, _, cur = s.term_stats_and_cursor(term)
    if df == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "termfreq": pa.array([], pa.int64())})
    docids, tfs, _ = cur.decode_all()
    live = s._live(docids)
    mask = np.isin(docids, live) if len(live) != len(docids) else np.ones(len(docids), bool)
    mapping = _docid_to_doc_id(index_dir)
    doc_ids = mapping[docids[mask]]
    tfs = tfs[mask].astype(np.int64)
    order = np.lexsort((doc_ids, -tfs))[:k]
    return pa.table({
        "doc_id": pa.array(doc_ids[order], pa.int64()),
        "termfreq": pa.array(tfs[order], pa.int64()),
    })


def strdist_sort(sf_dir: str, target: str = "src1", field: str = "source",
                 k: int = 30) -> pa.Table:
    """Solr ``strdist()`` function query ([U] solr/core/.../search/
    function/distance/StringDistanceFunction.java, edit-distance
    flavor) used as the sort: order docs by the Levenshtein distance
    between a stored field's value and a constant (dist asc, doc_id
    asc). The distance computes once per DISTINCT field value (the
    value-source cache role) and broadcasts as a tiny map; the corpus
    pass is stateless."""
    from lucene_solr_ray.pipelines.search import _levenshtein_leq

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", field])
    distinct = set(ds.unique(field))
    dmap = {v: lev(str(v), target) for v in distinct}
    dmap_ref = ray.put(dmap)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(dmap_ref)
        vals = t.column(field).to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "dist": pa.array([m[v] for v in vals], pa.int64()),
        })

    out = (ds.map_batches(score, batch_format="pyarrow")
           .sort(["dist", "doc_id"]).limit(k).to_pandas())
    return pa.table({
        "doc_id": pa.array(out["doc_id"].astype(np.int64), pa.int64()),
        "dist": pa.array(out["dist"].astype(np.int64), pa.int64()),
    })


def luke_top_terms(sf_dir: str, k: int = 10) -> pa.Table:
    """LukeRequestHandler topTerms ([U] solr/core/.../handler/admin/
    LukeRequestHandler.java getTopTerms): the index's highest-docFreq
    terms. Served from the segment term DICTIONARIES only (vocabulary-
    bound Ray read + one vocab groupby — corpus text never touched);
    df sums across segments because a term's postings are disjoint per
    segment. Ties break term asc."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.pipelines.build import segment_dir
    from lucene_solr_ray.state.manifest import load_manifest

    index_dir = docs_index(sf_dir)
    manifest = load_manifest(index_dir)
    paths = [
        os.path.join(segment_dir(index_dir, s["partition"], s["name"]), "terms.parquet")
        for s in manifest["segments"]
    ]
    vocab = (
        read_parquet_clean(paths, columns=["term", "df"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    vocab = vocab.sort_values(["df", "term"], ascending=[False, True]).head(k)
    return pa.table({
        "term": pa.array(vocab["term"].astype(str), pa.string()),
        "df": pa.array(vocab["df"].astype(np.int64), pa.int64()),
    })


def function_values(sf_dir: str, term: str = "merge", k: int = 20) -> pa.Table:
    """The function-query value family in one row per matching doc ([U]
    lucene/queries/.../function/valuesource/: TermFreqValueSource,
    DocFreqValueSource, IDFValueSource, NormValueSource — Solr's
    termfreq()/docfreq()/idf()/norm()): tf from the posting list, global
    df, idf in exact micro-units (the BM25 idf form), and the byte4-
    decoded doc length the norm encodes. Everything served from ONE
    term's postings + norms — never a corpus scan; df/idf are
    per-query constants (TermStates), repeated per row as Solr's
    fl=docfreq(...),idf(...) does."""
    from lucene_solr_ray.codec.norms import DECODED_TABLE

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    df, _, cur = s.term_stats_and_cursor(term)
    if df == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in
                         ("doc_id", "tf", "df", "idf_micro", "norm_dl")})
    docids, tfs, norms = cur.decode_all()
    live = s._live(docids)
    mask = np.isin(docids, live) if len(live) != len(docids) else np.ones(len(docids), bool)
    n = float(s.n_docs)
    idf_micro = int(np.floor(np.log(1.0 + ((n - df) + 0.5) / (df + 0.5)) * 1e6 + 0.5))
    mapping = _docid_to_doc_id(index_dir)
    doc_ids = mapping[docids[mask]]
    order = np.argsort(doc_ids)[:k]
    dl = np.asarray(DECODED_TABLE, np.float64)[norms[mask][order]].astype(np.int64)
    m = len(order)
    return pa.table({
        "doc_id": pa.array(doc_ids[order], pa.int64()),
        "tf": pa.array(tfs[mask][order].astype(np.int64), pa.int64()),
        "df": pa.array(np.full(m, df, np.int64), pa.int64()),
        "idf_micro": pa.array(np.full(m, idf_micro, np.int64), pa.int64()),
        "norm_dl": pa.array(dl, pa.int64()),
    })


def wildcard_topterms_retrieve(sf_dir: str, prefix: str = "s", top_n: int = 2) -> pa.Table:
    """TopTermsRewrite ([U] lucene/core/.../search/TopTermsRewrite.java,
    MultiTermQuery.TOP_TERMS_SCORING_BOOLEAN_REWRITE): instead of
    rewriting a multi-term query to ALL dictionary expansions (the
    ScoringBooleanQueryRewrite the other multi-term entries use), keep
    only the top-N terms by docFreq (ties term asc — the priority-queue
    order) and run that bounded disjunction. Bounds rewrite cost on huge
    expansions. Output: the match set of the capped disjunction."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    terms = s.expand_terms("prefix", prefix)
    with_df = sorted(((s.term_stats_and_cursor(t)[0], t) for t in terms),
                     key=lambda x: (-x[0], x[1]))
    picked = [t for df, t in with_df[:top_n] if df > 0]
    if not picked:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    chunks = list(s.iter_matches(picked, mode="or"))
    d = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def document_dict_suggest(sf_dir: str, prefix: str = "s", k: int = 5) -> pa.Table:
    """AnalyzingSuggester fed by a DocumentDictionary ([U] lucene/
    suggest/.../document/DocumentDictionary.java): suggestion weight =
    the SUM of a stored weight field (n_chars docvalues) over the docs
    containing the term — not collection frequency. Candidates come from
    the prefix scan of the sorted term dicts; each candidate's posting
    list gives its doc set; the weight sum reads ONLY those docids'
    docvalues rows (one predicate-pushdown read for the union)."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as _pads

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    terms = s.expand_terms("prefix", prefix)
    per_term: dict[str, np.ndarray] = {}
    for t in terms:
        df, _, cur = s.term_stats_and_cursor(t)
        if df > 0:
            per_term[t] = s._live(cur.decode_all()[0])
    if not per_term:
        return pa.table({"term": pa.array([], pa.string()),
                         "weight": pa.array([], pa.int64())})
    union = np.unique(np.concatenate(list(per_term.values())))
    tbl = _pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "n_chars"],
        filter=_pc.field("docid").isin(pa.array(union)))
    did = tbl.column("docid").to_numpy()
    nch = tbl.column("n_chars").to_numpy().astype(np.int64)
    order = np.argsort(did, kind="stable")
    rows = []
    for t, docids in per_term.items():
        pos = order[np.searchsorted(did[order], docids)]
        rows.append((t, int(nch[pos].sum())))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "weight": pa.array([r[1] for r in rows], pa.int64()),
    })


def composite_id_routing(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """CompositeIdRouter shard assignment ([U] solr/solrj/.../common/
    cloud/CompositeIdRouter.java): a ``route!id`` shard key hashes as
    (hash(route) upper 16 bits | hash(id) lower 16 bits), so every doc
    sharing a route prefix lands in the contiguous ring slice the prefix
    claims — co-location with bounded spread. Here route = ``source``,
    id = doc_id; hash = md5-64 mod 2^32 (Solr uses murmur3; md5 keeps
    the DuckDB oracle bit-exact, ring semantics identical), shard =
    comp * n_shards // 2^32. Output: per-(source, shard) counts — the
    routing table a SolrCloud client would use. Stateless per-batch
    count partials; only the output-sized table shuffles."""
    import hashlib as _hl

    from ray.data.aggregate import Sum

    from lucene_solr_ray.io_utils import read_parquet_clean

    def h32(s: str) -> int:
        return int.from_bytes(_hl.md5(s.encode()).digest()[:8], "little") % (1 << 32)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for src, did in zip(t.column("source").to_pylist(), t.column("doc_id").to_pylist()):
            comp = (h32(src) // 65536) * 65536 + h32(str(did)) % 65536
            c[(src, comp * n_shards // (1 << 32))] += 1
        keys = sorted(c)
        return pa.table({
            "source": pa.array([k[0] for k in keys], pa.string()),
            "shard": pa.array([k[1] for k in keys], pa.int64()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
        })

    return pa.Table.from_pandas(
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "shard"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .sort(["source", "shard"])
        .to_pandas(),
        preserve_index=False,
    ).replace_schema_metadata(None)


def terms_enum(sf_dir: str, prefix: str, limit: int = 20,
               regex: str | None = None) -> pa.Table:
    """TermsComponent /terms ([U] solr/core/.../handler/component/
    TermsComponent.java): enumerate index terms matching a prefix (and
    optionally ``terms.regex`` — a FULL-match regex applied after the
    prefix range prune) with their document frequency, sorted by term.

    Scale shape: a Ray Data read over every segment's ``terms.parquet``
    (the dict is term-sorted, so parquet row-group statistics prune the
    prefix range at the read) -> per-term df sum across segments ->
    sort + limit. The corpus text is never touched; only term-dict
    files, whose total size is vocabulary-bound, move."""
    from lucene_solr_ray.pipelines.build import segment_dir
    from lucene_solr_ray.state.manifest import load_manifest

    index_dir = docs_index(sf_dir)
    manifest = load_manifest(index_dir)
    if manifest.get("deletes_file") or manifest.get("purged_file"):
        raise ValueError("terms_enum df counts ignore tombstones; expunge first")
    paths = [
        os.path.join(segment_dir(index_dir, s["partition"], s["name"]), "terms.parquet")
        for s in manifest["segments"]
    ]
    lo, hi = prefix, prefix + "￿"

    def pref(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.greater_equal(t.column("term"), pa.scalar(lo)),
                       pc.less(t.column("term"), pa.scalar(hi)))
        if regex is not None:
            keep = pc.and_(keep, pc.match_substring_regex(
                t.column("term"), f"^(?:{regex})$"))
        return t.select(["term", "df"]).filter(keep)

    agg = (
        ray.data.read_parquet(paths, columns=["term", "df"])
        .map_batches(pref, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .sum("df")
        .sort("term")
        .limit(limit)
        .to_arrow_refs()
    )
    import ray as _ray

    parts = [_ray.get(r) for r in agg]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    out = pa.concat_tables(parts).sort_by("term")  # output-sized (<= limit rows)
    return pa.table({"term": out.column("term"),
                     "df": out.column("sum(df)").cast(pa.int64())})


def _rtg_live(index_dir: str, manifest: dict) -> "np.ndarray":
    """Union of tombstoned + purged docids (non-live set) for RTG."""
    from lucene_solr_ray.pipelines.deletes import load_deletes, load_purged

    parts = [x for x in (load_deletes(index_dir, manifest), load_purged(index_dir, manifest))
             if x is not None and len(x)]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.union1d(*parts) if len(parts) == 2 else parts[0]


def realtime_get(index_dir: str, doc_ids: list[int],
                 fl: tuple = ("text",)) -> pa.Table:
    """RealTimeGet ([U] solr/core/.../handler/component/
    RealTimeGetComponent.java): latest live stored-fields row per doc_id,
    projected to ``fl``. Reads only the docs.parquet files whose docid
    range can hold the ids (row-group pruning via the filter); the latest
    version of a doc is its highest live docid (appends always assign
    docids after maxDoc)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as _pads

    from lucene_solr_ray.state.manifest import load_manifest

    manifest = load_manifest(index_dir)
    dead = _rtg_live(index_dir, manifest)
    # unify schemas across docs files: generations appended by the tlog
    # micro path may carry columns (doc_id) the base build lacks — rows
    # from key-less files read as null and can never match the id filter
    import glob as _glob

    import pyarrow.parquet as _pq

    files = sorted(_glob.glob(os.path.join(index_dir, "docs", "*.parquet")))
    schema = pa.unify_schemas([_pq.read_schema(f).remove_metadata() for f in files])
    if "doc_id" not in schema.names:
        raise ValueError(f"index {index_dir} has no doc_id key column for RTG")
    t = _pads.dataset(files, format="parquet", schema=schema).to_table(
        columns=["docid", "doc_id"] + [f for f in fl if f not in ("docid", "doc_id")],
        filter=_pads.field("doc_id").isin([int(d) for d in doc_ids]),
    )
    if len(dead):
        live = ~np.isin(t.column("docid").to_numpy(), dead)
        t = t.filter(pa.array(live))
    df = t.to_pandas().sort_values("docid").groupby("doc_id", as_index=False).last()
    df = df.sort_values("doc_id")
    out = {"doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64())}
    for f in fl:
        if f == "doc_id":
            continue
        col = pa.array(df[f].tolist())
        out[f] = (pa.array(df[f].to_numpy().astype(np.int64))
                  if pa.types.is_integer(col.type) else col)
    return pa.table(out)


_JSON_ADD_BASE = 10_000_000


def parse_json_update(payload: str) -> tuple[list[dict], list[int]]:
    """JsonLoader command parse ([U] solr/core/.../handler/loader/
    JsonLoader.java): accepts {"add": [{"doc": {...}}, ...],
    "delete": [{"id": n}, ...], "commit": {}} and returns
    (docs_to_add, ids_to_delete). Unknown commands fail loudly."""
    import json as _json

    cmds = _json.loads(payload)
    adds, dels = [], []
    for key, val in cmds.items():
        if key == "add":
            for item in (val if isinstance(val, list) else [val]):
                adds.append(item["doc"])
        elif key == "delete":
            for item in (val if isinstance(val, list) else [val]):
                dels.append(int(item["id"]))
        elif key == "commit":
            continue
        else:
            raise ValueError(f"json update: unknown command {key!r}")
    return adds, dels


def update_json_commands(sf_dir: str, query_term: str = "merge",
                         delete_mod: int = 100) -> pa.Table:
    """UpdateRequestHandler /update JSON command stream end-to-end
    ([U] solr/core/.../handler/UpdateRequestHandler.java + JsonLoader):
    build the payload (3 adds whose text contains the query term, with
    ids above the corpus id space; deletes for every corpus doc_id %
    delete_mod == 0 — both sides derive the same set), parse it with
    the JsonLoader shape, apply — deletes tombstone, adds append as a
    fresh generation — and requery. Output: the final live match set,
    proving adds are searchable and deletes are not."""
    import json as _json
    import shutil

    from lucene_solr_ray.pipelines.deletes import delete_docs
    from lucene_solr_ray.state.manifest import load_manifest

    src = docs_index(sf_dir)
    tmp = src + "-jsonupd"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    manifest = load_manifest(tmp)
    mapping = _docid_to_doc_id(tmp)
    del_ids = [int(d) for d in mapping[mapping % delete_mod == 0]]
    payload = _json.dumps({
        "add": [{"doc": {"id": _JSON_ADD_BASE + i,
                         "text": f"{query_term} added doc{i}"}} for i in range(3)],
        "delete": [{"id": d} for d in del_ids],
        "commit": {},
    })
    adds, dels = parse_json_update(payload)
    old_docids = np.searchsorted(mapping, np.asarray(sorted(dels), dtype=np.int64))
    delete_docs(tmp, old_docids.tolist())
    rows = []
    for doc in adds:
        did, text = int(doc["id"]), str(doc["text"])
        rows.append({
            "conv_id": f"json-{did:012d}", "turn_idx": np.int32(0), "role": "user",
            "text": text, "tool": "",
            "ts": np.datetime64("2026-01-01T00:00:00", "us") + np.timedelta64(did, "s"),
            "doc_id": np.int64(did), "n_chars": np.int64(len(text)),
            "lang": "en", "source": "json",
        })
    upd = pa.Table.from_pylist(rows, schema=pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
        ("text", pa.string()), ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ("doc_id", pa.int64()), ("n_chars", pa.int64()), ("lang", pa.string()),
        ("source", pa.string()),
    ]))
    build_index(
        ray.data.from_arrow(upd), tmp,
        num_partitions=manifest["num_partitions"], salt=manifest["salt"],
        store_positions=manifest.get("positions", False),
        store_term_vectors=manifest.get("term_vectors", False),
        append=True,
    )
    s = IndexSearcher(tmp)
    d, _ = s.search([query_term], k=max(1, s.n_docs), mode="or")
    mapping2 = _docid_to_doc_id(tmp)
    return pa.table({"doc_id": pa.array(np.sort(mapping2[d]), type=pa.int64())})


def atomic_update_rtg(sf_dir: str, update_ids: list[int], suffix: str = " zzzupdated") -> pa.Table:
    """Atomic update end-to-end ([U] solr DistributedUpdateProcessor
    atomic 'set' + RealTimeGetComponent): copy the cached index, apply a
    set-field update to ``update_ids`` (tombstone old version + append
    the new version as a fresh generation via build_index(append=True)),
    then answer a term query for a token present ONLY in updated text
    and RealTimeGet the stored fields. Output (doc_id, text) proves the
    update is both searchable and retrievable, and the old version is
    neither."""
    import shutil

    from lucene_solr_ray.pipelines.deletes import delete_docs
    from lucene_solr_ray.state.manifest import load_manifest

    update_ids = sorted(int(d) for d in update_ids)
    src = docs_index(sf_dir)
    tmp = src + "-updcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)

    manifest = load_manifest(tmp)
    mapping = _docid_to_doc_id(tmp)
    old_docids = np.searchsorted(mapping, np.asarray(update_ids, dtype=np.int64))
    # current stored fields -> updated rows (atomic 'set' on text)
    cur = realtime_get(tmp, update_ids).to_pandas().set_index("doc_id")
    rows = []
    for did in update_ids:
        new_text = str(cur.loc[did, "text"]) + suffix
        rows.append({
            "conv_id": f"upd-{did:012d}", "turn_idx": np.int32(0), "role": "user",
            "text": new_text, "tool": "",
            "ts": np.datetime64("2026-01-01T00:00:00", "us") + np.timedelta64(int(did), "s"),
            "doc_id": np.int64(did), "n_chars": np.int64(len(new_text)),
            "lang": "en", "source": "update",
        })
    upd = pa.Table.from_pylist(rows, schema=pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
        ("text", pa.string()), ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ("doc_id", pa.int64()), ("n_chars", pa.int64()), ("lang", pa.string()),
        ("source", pa.string()),
    ]))
    delete_docs(tmp, old_docids.tolist())
    build_index(
        ray.data.from_arrow(upd), tmp,
        num_partitions=manifest["num_partitions"], salt=manifest["salt"],
        store_positions=manifest.get("positions", False),
        store_term_vectors=manifest.get("term_vectors", False),
        append=True,
    )
    # the update token matches exactly the updated docs...
    s = IndexSearcher(tmp)
    d, _ = s.search([suffix.strip()], k=max(1, s.n_docs), mode="or")
    mapping2 = _docid_to_doc_id(tmp)
    hit_ids = np.sort(mapping2[d])
    assert hit_ids.tolist() == update_ids, (hit_ids, update_ids)
    # ...and RTG returns the new stored fields for them
    return realtime_get(tmp, update_ids)


def tlog_rtg(sf_dir: str, new_ids=(90000001, 90000002, 90000003),
             committed_ids=(1, 2)) -> pa.Table:
    """Transaction-log-lite end-to-end ([U] solr/core/.../update/
    UpdateLog.java semantics) on a copy of the cached index: append a
    micro-batch to the tlog; RealTimeGet sees the PENDING docs from the
    log (pending=true) and committed docs via fallback BEFORE any
    commit; soft_commit folds the log into a new generation; a term
    query then hits exactly the appended docs. Output phases:
    'rtg_pre' (overlay reads) and 'search_post' (post-commit hits)."""
    import shutil

    from lucene_solr_ray.state import tlog

    src = docs_index(sf_dir)
    tmp = src + "-tlogcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)

    new_ids = sorted(int(d) for d in new_ids)
    rows = []
    for did in new_ids:
        text = f"zzztlogrtg pending doc {did}"
        rows.append({
            "conv_id": f"tlog-{did:012d}", "turn_idx": np.int32(0),
            "role": "user", "text": text, "tool": "",
            "ts": np.datetime64("2026-02-01T00:00:00", "us")
            + np.timedelta64(int(did) % 86400, "s"),
            "doc_id": np.int64(did), "n_chars": np.int64(len(text)),
            "lang": "en", "source": "tlog",
        })
    batch = pa.Table.from_pylist(rows, schema=pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
        ("text", pa.string()), ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ("doc_id", pa.int64()), ("n_chars", pa.int64()), ("lang", pa.string()),
        ("source", pa.string()),
    ]))
    tlog.tlog_append(tmp, batch)
    pre = tlog.realtime_get_overlay(
        tmp, new_ids + [int(d) for d in committed_ids]).to_pylist()
    tlog.soft_commit(tmp)
    s = IndexSearcher(tmp)
    d, _ = s.search(["zzztlogrtg"], k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(tmp)
    hit_ids = np.sort(mapping[d])
    assert hit_ids.tolist() == new_ids, (hit_ids, new_ids)
    post = realtime_get(tmp, new_ids).to_pylist()
    out = (
        [("rtg_pre", r["doc_id"], r["pending"], r["text"]) for r in pre]
        + [("search_post", r["doc_id"], False, r["text"]) for r in post]
    )
    return pa.table({
        "phase": pa.array([r[0] for r in out], pa.string()),
        "doc_id": pa.array([r[1] for r in out], pa.int64()),
        "pending": pa.array([r[2] for r in out], pa.bool_()),
        "text": pa.array([r[3] for r in out], pa.string()),
    })


def tv_component(sf_dir: str, query_term: str = "vector", max_docs: int = 20) -> pa.Table:
    """Solr TermVectorComponent (/tvrh, [U] solr/core/.../handler/
    component/TermVectorComponent.java): for the first ``max_docs``
    documents matching the query, every stored term-vector entry —
    (term, tf, first position, first char offsets) plus the term's
    GLOBAL df (tv.df=true) — served entirely from the persisted tvs/
    parquet (docid predicate pushdown) and the term dictionaries; the
    stored text is never read or re-analyzed."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    mapping = _docid_to_doc_id(index_dir)
    chunks = list(s.iter_matches([query_term], mode="or"))
    d = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
    doc_ids = np.sort(mapping[d])[:max_docs]
    # doc_id -> docid (mapping is docid-indexed)
    inv = np.argsort(mapping)
    docids = inv[np.searchsorted(mapping[inv], doc_ids)]

    tbl = pads.dataset(os.path.join(index_dir, "tvs"), format="parquet").to_table(
        filter=pa.compute.field("docid").isin(pa.array(docids.astype(np.int64)))
    )
    did = tbl.column("docid").to_numpy().astype(np.int64)
    doc_of = mapping[did]
    terms = tbl.column("term").to_pylist()
    dfs = {t: s.term_stats_and_cursor(t)[0] for t in sorted(set(terms))}
    rows = []
    for i in range(tbl.num_rows):
        pos = tbl.column("positions")[i].as_py()
        st = tbl.column("starts")[i].as_py()
        en = tbl.column("ends")[i].as_py()
        rows.append({
            "doc_id": int(doc_of[i]), "term": terms[i],
            "tf": int(tbl.column("tf")[i].as_py()), "df": int(dfs[terms[i]]),
            "first_pos": int(pos[0]), "first_start": int(st[0]), "first_end": int(en[0]),
        })
    rows.sort(key=lambda r: (r["doc_id"], r["term"]))
    schema = pa.schema([("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
                        ("df", pa.int64()), ("first_pos", pa.int64()),
                        ("first_start", pa.int64()), ("first_end", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def free_text_suggest(sf_dir: str, context: str = "merge", k: int = 10) -> ray.data.Dataset:
    """FreeTextSuggester ([U] lucene/suggest/.../analyzing/
    FreeTextSuggester.java): n-gram language-model suggestion — given a
    context word, rank continuations by bigram frequency (count desc,
    term asc). One corpus pass; the context filter is pushed into the
    map side so only matching-bigram partials reach the groupby (the
    exchange is next-vocab-sized, not corpus-sized)."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.io_utils import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def bigrams(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for s in t.column("text").to_pylist():
            toks = (s or "").split()
            c.update(toks[i + 1] for i in range(len(toks) - 1) if toks[i] == context)
        return pa.table({"next_term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return (
        ds.map_batches(bigrams, batch_format="pyarrow")
        .groupby("next_term").aggregate(Sum("n", alias_name="n"))
        .sort(["n", "next_term"], descending=[True, False])
        .limit(k)
    )


def spell_collate(sf_dir: str, terms=("mergee", "sortt"), max_edits: int = 2) -> pa.Table:
    """SpellCheckComponent collation ([U] solr/core/.../spelling/
    SpellCheckCollator.java): take each misspelled term's TOP suggestion
    (DirectSpellChecker order: distance asc, df desc, term asc), combine
    them into one corrected conjunction, and verify it — collation_hits
    is the corrected query's true AND hit count, the 'would this
    collation return results' re-query the component performs."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    suggestions = {}
    for t in terms:
        cands = s.suggest_spelling(t, 1, max_edits)
        suggestions[t] = cands[0][0] if cands else None
    picked = [w for w in suggestions.values() if w]
    if picked:
        chunks = list(s.iter_matches(picked, mode="and"))
        hits = int(sum(len(c) for c in chunks))
    else:
        hits = 0
    rows = [{"term": t, "suggestion": suggestions[t] or "", "collation_hits": hits}
            for t in sorted(terms)]
    schema = pa.schema([("term", pa.string()), ("suggestion", pa.string()),
                        ("collation_hits", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def fuzzy_suggest(sf_dir: str, term: str = "stram", k: int = 5) -> pa.Table:
    """FuzzySuggester: edit-distance-tolerant suggestions ranked by
    collection frequency (weight), first character pinned."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    rows = [
        {"sugg_rank": i, "term": t, "cf": cf}
        for i, (t, cf) in enumerate(s.suggest_fuzzy(term, k))
    ]
    schema = pa.schema([("sugg_rank", pa.int64()), ("term", pa.string()), ("cf", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def unified_highlight_topk(sf_dir: str, terms: list[str], k_docs: int = 10,
                           window: int = 16, n_passages: int = 2) -> pa.Table:
    """UnifiedHighlighter passage ranking ([U] lucene/highlighter/.../
    uhighlight/UnifiedHighlighter.java + PassageScorer): for the query's
    BM25 top-k documents, segment each into fixed ``window``-position
    passages, score every passage, and return each doc's top
    ``n_passages``. PassageScorer weighs a passage by per-term
    idf-weighted frequency; here the BM25 idf weight quantizes to
    micro-nats (FLOOR(idf*1e6+0.5), exact int64 — the repo convention)
    so passage scores are exact integers:

        score(passage) = sum over query terms of tf_in_passage * idf_micro(t)

    Served ENTIRELY from the persisted term vectors (positions; char
    offsets back the snippet spans) — the stored text is never
    re-analyzed. Positions carry StopFilter gaps, so a position IS the
    whitespace ordinal of the token (the invariant the phrase oracles
    pin), which is what makes the passage grid SQL-replicable.
    Output: (doc_id, win, score_micro, n_hits, first_start, last_end),
    ranked (score desc, win asc) per doc."""
    from lucene_solr_ray.oracle import analyze_query_terms
    from lucene_solr_ray.similarity import idf as bm25_idf

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    qterms = analyze_query_terms(terms)
    mapping = _docid_to_doc_id(index_dir)
    d, _sc = s.search(qterms, k=k_docs, mode="or")
    if len(d) == 0:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("doc_id", pa.int64()), ("win", pa.int64()), ("score_micro", pa.int64()),
             ("n_hits", pa.int64()), ("first_start", pa.int64()), ("last_end", pa.int64())]))
    idf_micro = {t: int(np.floor(bm25_idf(s.n_scoring, s.term_stats_and_cursor(t)[0]) * 1e6 + 0.5))
                 for t in qterms}

    tbl = pads.dataset(os.path.join(index_dir, "tvs"), format="parquet").to_table(
        filter=pa.compute.field("docid").isin(pa.array(d.astype(np.int64)))
        & pa.compute.field("term").isin(pa.array(qterms))
    )
    # per (doc, window): weighted score + span bounds
    acc: dict[tuple[int, int], list[int]] = {}  # -> [score, n_hits, min_start, max_end]
    did = tbl.column("docid").to_numpy().astype(np.int64)
    for i in range(tbl.num_rows):
        t = tbl.column("term")[i].as_py()
        wmic = idf_micro[t]
        starts = tbl.column("starts")[i].as_py()
        ends = tbl.column("ends")[i].as_py()
        for p, st, en in zip(tbl.column("positions")[i].as_py(), starts, ends):
            key = (int(did[i]), int(p) // window)
            a = acc.setdefault(key, [0, 0, int(st), int(en)])
            a[0] += wmic
            a[1] += 1
            a[2] = min(a[2], int(st))
            a[3] = max(a[3], int(en))

    rows = []
    by_doc: dict[int, list] = {}
    for (docid, win), (sc, nh, st, en) in acc.items():
        by_doc.setdefault(docid, []).append((-sc, win, nh, st, en))
    for docid in sorted(by_doc):
        for negs, win, nh, st, en in sorted(by_doc[docid])[:n_passages]:
            rows.append({"doc_id": int(mapping[docid]), "win": win,
                         "score_micro": -negs, "n_hits": nh,
                         "first_start": st, "last_end": en})
    rows.sort(key=lambda r: (r["doc_id"], -r["score_micro"], r["win"]))
    schema = pa.schema([("doc_id", pa.int64()), ("win", pa.int64()),
                        ("score_micro", pa.int64()), ("n_hits", pa.int64()),
                        ("first_start", pa.int64()), ("last_end", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def feature_boost_topk(sf_dir: str, terms: list[str], field: str = "n_chars",
                       weight: float = 1.5, pivot: float = 300.0, k: int = 10,
                       func: str = "satu") -> pa.Table:
    """FeatureField boost ([U] lucene/core/.../document/FeatureField.java):
    static per-document signals (pagerank, length, freshness) contribute
    one more SHOULD clause on top of the BM25 text score. The three
    public scoring functions:

    - ``satu`` (newSaturationQuery):  weight * v/(v+pivot)
    - ``log``  (newLogQuery):         weight * log(scaling + v), pivot
      plays the scalingFactor role
    - ``sigm`` (newSigmoidQuery):     weight * v^a/(v^a + pivot^a),
      exponent a pinned at 2.0

    Pinned float order: clause = float32(f(v) in float64), then one more
    float32 fold step AFTER the ascending-term BM25 accumulation (the
    feature clause sorts last). Rank-only output.

    Scale shape: the feature value rides docs.parquet doc-values — the
    fetch is a docid-pushdown pruned read of (docid, field) for the
    match set only (at 10^12 docs, partition the match set by docid
    range and join per range)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms(terms)
    d, bm25 = s.search(qterms, k=max(1, s.n_docs), mode="or")
    if len(d) == 0:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("query_id", pa.string()), ("rank", pa.int64()), ("doc_id", pa.int64())]))
    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", field],
        filter=pa.compute.field("docid").isin(pa.array(d.astype(np.int64))))
    order = pa.compute.sort_indices(docs.column("docid"))
    did_sorted = docs.column("docid").take(order).to_numpy().astype(np.int64)
    v_sorted = docs.column(field).take(order).to_numpy().astype(np.float64)
    # align to d's (score-desc) order — search() does not return docid order
    v = v_sorted[np.searchsorted(did_sorted, d)]
    if func == "satu":
        clause = np.float64(weight) * (v / (v + np.float64(pivot)))
    elif func == "log":
        clause = np.float64(weight) * np.log(np.float64(pivot) + v)
    elif func == "sigm":
        v2, p2 = v * v, np.float64(pivot) * np.float64(pivot)
        clause = np.float64(weight) * (v2 / (v2 + p2))
    else:
        raise ValueError(f"unknown FeatureField function {func!r}")
    sat = clause.astype(np.float32)
    final = (bm25.astype(np.float64) + sat.astype(np.float64)).astype(np.float32)
    top = topk_order(d, final, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "query_id": pa.array(["fb-1"] * len(top), pa.string()),
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]].astype(np.int64), pa.int64()),
    })


def diversified_topk(sf_dir: str, terms: list[str], key: str = "source",
                     max_per_key: int = 2, k: int = 10) -> pa.Table:
    """DiversifiedTopDocsCollector ([U] lucene/misc/.../search/
    DiversifiedTopDocsCollector.java): BM25 top-k where at most
    ``max_per_key`` hits may share one key value (de-duplicated results
    a la "only 2 hits per site"). Deterministic definition: walk the
    (score desc, docid asc) order and keep a hit iff fewer than
    max_per_key better-ranked hits carry its key — vectorized here as a
    stable per-key occurrence index instead of the reference's
    row-at-a-time priority queues. Rank-only output.

    Scale shape: the key rides docs.parquet doc-values; the fetch is a
    docid-pushdown pruned read for the match set only."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms(terms)
    d, bm25 = s.search(qterms, k=max(1, s.n_docs), mode="or")
    if len(d) == 0:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("query_id", pa.string()), ("rank", pa.int64()), ("doc_id", pa.int64())]))
    order = topk_order(d, bm25, len(d))  # full (score desc, docid) order
    d_ord = d[order]
    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", key],
        filter=pa.compute.field("docid").isin(pa.array(d_ord.astype(np.int64))))
    so = pa.compute.sort_indices(docs.column("docid"))
    did_sorted = docs.column("docid").take(so).to_numpy().astype(np.int64)
    key_sorted = np.asarray(docs.column(key).take(so).to_pylist(), object)
    kv = key_sorted[np.searchsorted(did_sorted, d_ord)]
    # per-key occurrence index in score order: stable sort by key keeps
    # the score order within each key group
    codes = np.unique(kv, return_inverse=True)[1]
    grp = np.argsort(codes, kind="stable")
    occ = np.empty(len(kv), np.int64)
    starts = np.r_[0, np.flatnonzero(np.diff(codes[grp])) + 1]
    occ[grp] = np.arange(len(kv)) - np.repeat(starts, np.diff(np.r_[starts, len(kv)]))
    keep = np.flatnonzero(occ < max_per_key)[:k]
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "query_id": pa.array(["dv-1"] * len(keep), pa.string()),
        "rank": pa.array(np.arange(len(keep)), pa.int64()),
        "doc_id": pa.array(mapping[d_ord[keep]].astype(np.int64), pa.int64()),
    })


def boost_query_topk(sf_dir: str, terms: list[str], field: str = "n_chars",
                     pivot: float = 300.0, k: int = 10) -> pa.Table:
    """BoostQParserPlugin ``{!boost b=f(v)}q`` ([U] solr/core/.../search/
    BoostQParserPlugin.java; lucene FunctionScoreQuery.boostByValue):
    MULTIPLICATIVE function boost — final = float32(float64(bm25_f32) *
    float64(boost_f32)), boost = float32(v/(v+pivot)) saturation over a
    doc-values field. Same docid-pushdown feature fetch as the additive
    FeatureField path; rank-only output."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms(terms)
    d, bm25 = s.search(qterms, k=max(1, s.n_docs), mode="or")
    if len(d) == 0:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("query_id", pa.string()), ("rank", pa.int64()), ("doc_id", pa.int64())]))
    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", field],
        filter=pa.compute.field("docid").isin(pa.array(d.astype(np.int64))))
    order = pa.compute.sort_indices(docs.column("docid"))
    did_sorted = docs.column("docid").take(order).to_numpy().astype(np.int64)
    v_sorted = docs.column(field).take(order).to_numpy().astype(np.float64)
    v = v_sorted[np.searchsorted(did_sorted, d)]
    boost = (v / (v + np.float64(pivot))).astype(np.float32)
    final = (bm25.astype(np.float64) * boost.astype(np.float64)).astype(np.float32)
    top = topk_order(d, final, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "query_id": pa.array(["bq-1"] * len(top), pa.string()),
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]].astype(np.int64), pa.int64()),
    })


def hybrid_rrf_topk(sf_dir: str, terms=("merge", "vector"), anchor_vec: int = 0,
                    n_each: int = 50, rrf_k: int = 60, k: int = 10) -> pa.Table:
    """Hybrid sparse+dense retrieval with Reciprocal Rank Fusion
    (Cormack, Clarke, Büttcher 2009; the Solr 9 dense+lexical hybrid
    recipe): fuse the BM25 top-N ranking with the embedding-cosine top-N
    ranking (vec_id == doc_id on these tables) by
    score = sum over lists of 1/(rrf_k + rank_1based), kept exact as
    1_000_000 // (rrf_k + rank). Each side is its existing engine path —
    the WAND index search and the broadcast brute ANN stage — so the
    fusion step is a candidate-set-sized integer combine."""
    from lucene_solr_ray.functions.ann import ann_brute_topk
    from lucene_solr_ray.oracle import analyze_query_terms

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    qterms = analyze_query_terms(list(terms))
    d, _sc = s.search(qterms, k=n_each, mode="or")
    mapping = _docid_to_doc_id(index_dir)
    sparse_rank = {int(mapping[doc]): r for r, doc in enumerate(d)}
    dense = ann_brute_topk(sf_dir, k=n_each, n_queries=anchor_vec + 1).to_pandas()
    dense = dense[dense["query_id"] == anchor_vec]
    dense_rank = {int(n): int(r) for n, r in
                  zip(dense["neighbor_id"], dense["rank"])}
    fused = {}
    for doc, r in sparse_rank.items():
        fused[doc] = fused.get(doc, 0) + 1_000_000 // (rrf_k + r + 1)
    for doc, r in dense_rank.items():
        fused[doc] = fused.get(doc, 0) + 1_000_000 // (rrf_k + r + 1)
    rows = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(rows)), pa.int64()),
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "rrf_micro": pa.array([r[1] for r in rows], pa.int64()),
    })


def req_opt_topk(sf_dir: str, must: str = "merge", optional: str = "vector",
                 k: int = 10) -> pa.Table:
    """ReqOptSumScorer ([U] lucene/core/.../search/ReqOptSumScorer.java):
    BooleanQuery MUST + SHOULD — the match set is the required clause's
    alone, but an optional match ADDS its score. Evaluated as the full
    two-term float32 OR fold restricted to the required posting set (the
    fold is identical; the optional clause only ever contributes on top).
    Rank-only output."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms([must, optional])
    d, sc = s.search(qterms, k=max(1, s.n_docs), mode="or")
    _, _, cur = s.term_stats_and_cursor(qterms[0])
    req = s._live(cur.decode_all()[0]) if cur is not None else np.empty(0, np.int64)
    keep = np.isin(d, req)
    d, sc = d[keep], sc[keep]
    top = topk_order(d, sc, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "query_id": pa.array(["ro-1"] * len(top), pa.string()),
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]].astype(np.int64), pa.int64()),
    })


def req_excl_topk(sf_dir: str, must: str = "merge", excluded: str = "vector",
                  k: int = 10) -> pa.Table:
    """ReqExclScorer ([U] lucene/core/.../search/ReqExclScorer.java):
    BooleanQuery MUST + MUST_NOT where scoring comes from the required
    clause ONLY and the excluded clause's matches drop out. Single-term
    BM25 over the required postings minus the excluded posting set.
    Rank-only output."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms([must])
    d, sc = s.search(qterms, k=max(1, s.n_docs), mode="or")
    ex = analyze_query_terms([excluded])
    _, _, cur = s.term_stats_and_cursor(ex[0]) if ex else (0, 0, None)
    ex_docs = cur.decode_all()[0] if cur is not None else np.empty(0, np.int64)
    keep = ~np.isin(d, ex_docs)
    d, sc = d[keep], sc[keep]
    top = topk_order(d, sc, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "query_id": pa.array(["re-1"] * len(top), pa.string()),
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]].astype(np.int64), pa.int64()),
    })


def boosting_demote_topk(sf_dir: str, terms: list[str],
                         demote_term: str = "vector",
                         demote_factor: float = 0.5, k: int = 10) -> pa.Table:
    """FunctionScoreQuery.boostByQuery ([U] lucene/queries/.../function/
    FunctionScoreQuery.java boostByQuery — the BoostingQuery demotion
    idiom): docs matching the demote query keep their BM25 match set but
    their score is MULTIPLIED by a <1 factor, final = float32(
    float64(bm25_f32) * float64(factor_f32)). The demote query's match
    set comes from its posting list (one term cursor, no rescore pass);
    rank-only output."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms(terms)
    d, bm25 = s.search(qterms, k=max(1, s.n_docs), mode="or")
    if len(d) == 0:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("query_id", pa.string()), ("rank", pa.int64()), ("doc_id", pa.int64())]))
    dm = analyze_query_terms([demote_term])
    _, _, cur = s.term_stats_and_cursor(dm[0]) if dm else (0, 0, None)
    demote_docs = cur.decode_all()[0] if cur is not None else np.empty(0, np.int64)
    factor = np.where(np.isin(d, demote_docs),
                      np.float32(demote_factor), np.float32(1.0))
    final = (bm25.astype(np.float64) * factor.astype(np.float64)).astype(np.float32)
    top = topk_order(d, final, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "query_id": pa.array(["bd-1"] * len(top), pa.string()),
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]].astype(np.int64), pa.int64()),
    })


def intervals_containing_retrieve(sf_dir: str, term_a: str, term_b: str,
                                  small: str, max_width: int = 8) -> pa.Table:
    """IntervalQuery containing(maxwidth(w, unordered(a,b)), c) match set
    ([U] lucene/queries/.../intervals/Intervals.java) -> sorted doc_id
    set, minimal-interval semantics (see IndexSearcher)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_intervals_containing(term_a, term_b, small, max_width)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def payload_score_topk(sf_dir: str, term: str = "merge", k: int = 10,
                       mod: int = 5) -> pa.Table:
    """PayloadScoreQuery(SpanTermQuery, SumPayloadFunction) ([U]
    lucene/queries/.../payloads/PayloadScoreQuery.java +
    lucene/analysis/common/.../payloads/DelimitedPayloadTokenFilter.java):
    per-doc score = sum of the payloads attached to the matched term's
    positions, includeSpanScore=false (pure payload sum, exact ints).

    Payloads come from the token stream itself in Lucene (``tok|p``
    annotations parsed by DelimitedPayloadTokenFilter). The synthetic
    corpus carries no annotations, so the entry scans a deterministically
    annotated VIEW: token at 0-based position i carries payload
    ``(md5_64(token) % mod + i % mod) % mod + 1`` (md5_64 = little-endian
    first 8 md5 bytes, DuckDB's md5_number_upper) — the SQL oracle derives
    the identical payloads from the base text. The engine path genuinely
    round-trips the annotation: annotate -> delimited_payload_filter
    parse -> per-position payload sum. One pruned streaming pass;
    per-batch token->hash memo keeps md5 per vocabulary entry, not per
    occurrence; driver work is top-k-sized."""
    import hashlib as _hl

    from lucene_solr_ray.analysis import delimited_payload_filter
    from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

    class PayloadStage:
        def __init__(self):
            self.memo: dict[str, int] = {}

        def _h(self, tok: str) -> int:
            v = self.memo.get(tok)
            if v is None:
                v = int.from_bytes(_hl.md5(tok.encode()).digest()[:8], "little") % mod
                self.memo[tok] = v
            return v

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            texts = t.column("text").to_pylist()
            out_ids, out_sums = [], []
            for d, s in zip(ids, texts):
                raw = (s or "").split()
                annotated = [f"{w}|{(self._h(w) + i % mod) % mod + 1}"
                             for i, w in enumerate(raw)]
                toks, pays = delimited_payload_filter(annotated)
                score = sum(p for w, p in zip(toks, pays)
                            if w == term and p is not None)
                if score:
                    out_ids.append(int(d))
                    out_sums.append(int(score))
            return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                             "payload_sum": pa.array(out_sums, pa.int64())})

    parts = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(PayloadStage, batch_format="pyarrow", concurrency=pool_size())
        .to_arrow_refs()
    )
    import ray as _ray
    t = pa.concat_tables([x for x in _ray.get(parts) if x.num_rows])
    sums = t.column("payload_sum").to_numpy()
    ids = t.column("doc_id").to_numpy()
    order = np.lexsort((ids, -sums))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(order)), pa.int64()),
        "doc_id": pa.array(ids[order].astype(np.int64), pa.int64()),
        "payload_sum": pa.array(sums[order].astype(np.int64), pa.int64()),
    })


def drill_sideways(sf_dir: str, terms: tuple = ("merge",),
                   drill_field: str = "lang", drill_val: str = "en",
                   down_dim: str = "source") -> pa.Table:
    """DrillSideways ([U] lucene/facet/.../DrillSideways.java): for a
    drill-down query (base query + dimension filter), the drilled
    dimension's facet counts EXCLUDE its own filter (so the UI can show
    sibling buckets to pivot to) while every other dimension's counts
    include all filters. Here: base = indexed term match (broadcast
    doc_id set, numpy searchsorted membership), drill = lang=drill_val;
    output = lang counts over base only (sideways) + source counts over
    base AND the lang drill (down). ONE pruned three-column pass computes
    map-side partials for both accumulators; the driver combine is
    bucket-count-sized. Output (dim, val, n_docs), exact ints."""
    from lucene_solr_ray.io_utils import read_parquet_clean

    match = boolean_retrieve(sf_dir, list(terms), mode="and")
    match_ids = match.column("doc_id").to_numpy()  # sorted
    m_ref = ray.put(match_ids)

    def partials(t: pa.Table) -> pa.Table:
        m = ray.get(m_ref)
        ids = t.column("doc_id").to_numpy()
        if len(m):
            pos = np.minimum(np.searchsorted(m, ids), len(m) - 1)
            in_base = m[pos] == ids
        else:
            in_base = np.zeros(len(ids), bool)
        langs = np.asarray(t.column(drill_field).to_pylist(), dtype=object)[in_base]
        srcs = np.asarray(t.column(down_dim).to_pylist(), dtype=object)[in_base]
        lv, lc = np.unique(langs, return_counts=True)
        sv, sc = np.unique(srcs[langs == drill_val], return_counts=True)
        return pa.table({
            "dim": pa.array([drill_field] * len(lv) + [down_dim] * len(sv), pa.string()),
            "val": pa.array(list(lv) + list(sv), pa.string()),
            "n_docs": pa.array(np.concatenate([lc, sc]).astype(np.int64), pa.int64()),
        })

    parts = (
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", drill_field, down_dim])
        .map_batches(partials, batch_format="pyarrow")
        .to_arrow_refs()
    )
    t = pa.concat_tables([x for x in ray.get(parts) if x.num_rows])
    agg: dict[tuple[str, str], int] = {}
    for dim, val, n in zip(t.column("dim").to_pylist(),
                           t.column("val").to_pylist(),
                           t.column("n_docs").to_pylist()):
        agg[(dim, val)] = agg.get((dim, val), 0) + int(n)
    keys = sorted(agg)
    return pa.table({"dim": pa.array([k[0] for k in keys], pa.string()),
                     "val": pa.array([k[1] for k in keys], pa.string()),
                     "n_docs": pa.array([agg[k] for k in keys], pa.int64())})


def external_file_sort(sf_dir: str, k: int = 20) -> pa.Table:
    """ExternalFileField ([U] solr/core/.../schema/ExternalFileField.java):
    a per-doc value that lives in a SIDECAR file outside the index
    (reloadable per commit without reindexing), usable in sort/boost.
    The sidecar is written keyed by doc_id (value derived
    deterministically: eff_milli = (doc_id * 7919) % 100000 — the SQL
    oracle derives the same), then broadcast into a sort pass: top-k
    docs by (eff_milli desc, doc_id asc). The sidecar is vocabulary-like
    (doc_id -> int64) and ships once via ray.put, not per batch."""
    import pyarrow.parquet as _pq

    from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

    side_dir = os.path.join(CACHE_ROOT, "eff")
    os.makedirs(side_dir, exist_ok=True)
    side = os.path.join(side_dir, hashlib.sha1(sf_dir.encode()).hexdigest()[:12] + ".parquet")
    ids = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id"]).column("doc_id").to_numpy()
    eff = (ids.astype(np.int64) * 7919) % 100000
    _pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                              "eff_milli": pa.array(eff, pa.int64())}), side)

    side_keys = np.sort(ids.astype(np.int64))
    side_vals = (side_keys * 7919) % 100000
    keys_ref = ray.put(side_keys)
    vals_ref = ray.put(side_vals)

    class Attach:
        def __init__(self):
            self.keys = ray.get(keys_ref)
            self.vals = ray.get(vals_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            d = t.column("doc_id").to_numpy().astype(np.int64)
            v = self.vals[np.searchsorted(self.keys, d)]
            order = np.lexsort((d, -v))[:k]
            return pa.table({"doc_id": pa.array(d[order], pa.int64()),
                             "eff_milli": pa.array(v[order], pa.int64())})

    parts = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(Attach, batch_format="pyarrow", concurrency=pool_size())
        .to_pandas()
    )
    order = np.lexsort((parts["doc_id"].to_numpy(), -parts["eff_milli"].to_numpy()))[:k]
    out = parts.iloc[order].reset_index(drop=True)
    return pa.table({
        "rank": pa.array(np.arange(len(out), dtype=np.int64)),
        "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
        "eff_milli": pa.array(out["eff_milli"].to_numpy(), pa.int64()),
    })


def payload_function_stats(sf_dir: str, term: str = "merge", mod: int = 5) -> pa.Table:
    """PayloadScoreQuery with MaxPayloadFunction / AveragePayloadFunction
    ([U] lucene/queries/.../payloads/{Max,Average}PayloadFunction.java):
    per matching doc, the max payload over the term's positions and the
    exact-integer average (sum * 1000 // count milli). Same annotated
    view as payload_score_topk (token at position i carries
    (md5_64(token) % mod + i % mod) % mod + 1); the engine round-trips
    the annotation through delimited_payload_filter. One pruned pass."""
    import hashlib as _hl

    from lucene_solr_ray.analysis import delimited_payload_filter
    from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

    base = int.from_bytes(_hl.md5(term.encode()).digest()[:8], "little") % mod

    class Stage:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            texts = t.column("text").to_pylist()
            out = {"doc_id": [], "max_payload": [], "avg_payload_milli": []}
            for d, s in zip(ids, texts):
                raw = (s or "").split()
                annotated = [f"{w}|{(base + i % mod) % mod + 1}" if w == term else w
                             for i, w in enumerate(raw)]
                toks, payloads = delimited_payload_filter(annotated)
                vals = [p for w, p in zip(toks, payloads) if w == term and p is not None]
                if vals:
                    out["doc_id"].append(int(d))
                    out["max_payload"].append(max(vals))
                    out["avg_payload_milli"].append(sum(vals) * 1000 // len(vals))
            return pa.table({
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "max_payload": pa.array(out["max_payload"], pa.int64()),
                "avg_payload_milli": pa.array(out["avg_payload_milli"], pa.int64()),
            })

    return pa.Table.from_pandas(
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(Stage, batch_format="pyarrow", concurrency=pool_size())
        .sort("doc_id")
        .to_pandas(),
        preserve_index=False,
    ).replace_schema_metadata(None)


def covering_query_docs(sf_dir: str, terms=("merge", "join", "vector"),
                        pivot_chars: int = 300) -> pa.Table:
    """CoveringQuery ([U] lucene/queries/.../CoveringQuery.java): matches
    when at least minimumNumberMatch(doc) of the clauses match, where the
    minimum comes from a per-doc LongValuesSource — here
    min_req = 1 + (n_chars >= pivot_chars), i.e. long docs must match 2
    of the 3 terms, short docs any 1. Clause match sets come from the
    index; the per-doc minimum is a pruned docvalues read over the
    candidate union only."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as _pads

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    sets = []
    for t in list(terms):
        chunks = list(s.iter_matches([t], mode="or"))
        sets.append(np.concatenate(chunks) if chunks else np.empty(0, np.int64))
    union = np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
    if len(union) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    n_match = np.zeros(len(union), np.int64)
    for d in sets:
        n_match[np.isin(union, d)] += 1
    docs = _pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "n_chars"],
        filter=_pc.field("docid").isin(pa.array(union)))
    did = docs.column("docid").to_numpy()
    nch = docs.column("n_chars").to_numpy().astype(np.int64)
    order = np.argsort(did, kind="stable")
    nch_u = nch[order][np.searchsorted(did[order], union)]
    min_req = 1 + (nch_u >= pivot_chars).astype(np.int64)
    keep = union[n_match >= min_req]
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[keep]), pa.int64())})


def span_payload_check_docs(sf_dir: str, term: str = "merge",
                            payload: int = 3, mod: int = 5) -> pa.Table:
    """SpanPayloadCheckQuery ([U] lucene/queries/.../payloads/
    SpanPayloadCheckQuery.java): docs where some occurrence of ``term``
    carries exactly the required payload. Payloads come from the same
    deterministic annotated view as payload_score_topk (token at raw
    position i carries ``(md5_64(token) % mod + i % mod) % mod + 1``);
    span positions are served from the INDEX postings (the stop filter
    preserves position increments, so index positions == raw whitespace
    positions on this corpus — proven by the ft_span_position_range
    oracle)."""
    import hashlib as _hl

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    base = int.from_bytes(_hl.md5(term.encode()).digest()[:8], "little") % mod
    d = s.search_span_payload_check(
        term, lambda pos: (base + pos % mod) % mod + 1, payload)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def combined_field_topk(sf_dir: str, terms=("merge", "src3"), k: int = 10) -> pa.Table:
    """CombinedFieldQuery — BM25F over (text, source) as ONE field
    ([U] lucene/sandbox/.../search/CombinedFieldQuery.java, field
    weights 1): combined tf(t,d) = tf_text(t,d) + [source(d) = t],
    combined dl'(d) = decoded text norm + 1 (the keyword source field
    always contributes exactly one token), df(t) = |text matches ∪
    source matches|, avg combined dl = (sum_dl + N)/N. BM25 float tree
    pinned to similarity.py's order (w = float32(idf), denom float64 per
    doc, per-term float32 narrowing, ascending-term float32 fold),
    rank-only output. Text postings come from the index; source + norm
    are ONE pruned two-column docvalues read (norms are dense per-doc
    data in Lucene too)."""
    import pyarrow.dataset as _pads

    from lucene_solr_ray.codec.norms import DECODED_TABLE
    from lucene_solr_ray.similarity import B, K1, idf as _idf

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    docs = _pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "doc_id", "norm", "source"])
    all_docids = docs.column("docid").to_numpy()
    order = np.argsort(all_docids, kind="stable")
    all_docids = all_docids[order]
    ext_ids = docs.column("doc_id").to_numpy()[order]
    norm_bytes = docs.column("norm").to_numpy()[order].astype(np.int64)
    sources = np.asarray(docs.column("source").to_pylist(), dtype=object)[order]

    n = int(s.n_scoring)
    avg = (np.float64(s.sum_dl) + np.float64(n)) / np.float64(n)
    cdl = DECODED_TABLE.astype(np.float64)[norm_bytes] + 1.0
    denom = K1 * ((1.0 - B) + (B * cdl) / avg)

    per_term = []
    for t in sorted(set(terms)):  # distinct, ascending (the fold order)
        df_t, _cf, cur = s.term_stats_and_cursor(t)
        if df_t > 0:
            docids_t, tfs_t, _ = cur.decode_all()
        else:
            docids_t = np.empty(0, np.int64)
            tfs_t = np.empty(0, np.int64)
        src_rows = np.nonzero(sources == t)[0]
        ctf = np.zeros(len(all_docids), np.int64)
        if len(docids_t):
            ctf[np.searchsorted(all_docids, docids_t)] += tfs_t.astype(np.int64)
        ctf[src_rows] += 1
        df_c = int(np.count_nonzero(ctf))
        if df_c == 0:
            continue
        w = np.float32(_idf(n, df_c))
        per_term.append((w, ctf))
    if not per_term:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})

    acc = np.zeros(len(all_docids), np.float32)
    any_match = np.zeros(len(all_docids), bool)
    for w, ctf in per_term:
        hit = ctf > 0
        st = np.zeros(len(all_docids), np.float32)
        c64 = ctf[hit].astype(np.float64)
        st[hit] = (np.float64(w) * (c64 / (c64 + denom[hit]))).astype(np.float32)
        acc = (acc.astype(np.float64) + st.astype(np.float64)).astype(np.float32)
        any_match |= hit
    cand = np.nonzero(any_match)[0]
    sel = np.lexsort((ext_ids[cand], -acc[cand].astype(np.float64)))[:k]
    rows = cand[sel]
    return pa.table({
        "rank": pa.array(np.arange(len(rows)), pa.int64()),
        "doc_id": pa.array(ext_ids[rows], pa.int64()),
    })


def leading_wildcard_retrieve(sf_dir: str, pattern: str = "*er") -> pa.Table:
    """Leading-wildcard query served by the reversed term dict
    (ReversedWildcardFilter, [U] solr/core/.../analysis/
    ReversedWildcardFilter.java + SolrQueryParserBase's reversal
    rewrite): ``*suffix`` becomes a PREFIX scan over reversed terms
    instead of a full-vocabulary wildcard walk, then the expansion runs
    as a boolean disjunction -> sorted doc_id set."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    terms = s.leading_wildcard_terms(pattern)
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    d, _ = s.search(terms, k=max(1, s.n_docs), mode="or")
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def point_in_set_docs(sf_dir: str, field: str = "n_chars",
                      values: tuple = (54, 62, 78, 132)) -> pa.Table:
    """PointInSetQuery ([U] lucene/core/.../search/PointInSetQuery.java):
    exact-set membership on a numeric point field. The BKD tree's role
    is played by parquet predicate pushdown — only row groups whose
    [min, max] statistics intersect the value set are read, and only
    the docid column of survivors materializes."""
    import pyarrow.compute as pc

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    expr = pc.field(field).isin(pa.array(list(values), pa.int64()))
    tbl = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid"], filter=expr)
    d = s._live(np.sort(tbl.column("docid").to_numpy().astype(np.int64)))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def multi_range_docs(sf_dir: str, field: str = "n_chars",
                     ranges: tuple = ((60, 80), (150, 170), (240, 260))) -> pa.Table:
    """MultiRangeQuery ([U] lucene/sandbox/.../search/MultiRangeQuery.java):
    a disjunction of numeric ranges on one point dimension, rewritten as
    ONE pass over the tree instead of N separate range queries. The
    parquet analogue: a single dataset scan whose pushed filter is the OR
    of the range predicates — row groups whose [min, max] statistics miss
    every range never leave storage, and only the docid column of
    survivors materializes."""
    import pyarrow.compute as pc

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    expr = None
    for lo, hi in ranges:
        e = (pc.field(field) >= int(lo)) & (pc.field(field) <= int(hi))
        expr = e if expr is None else expr | e
    tbl = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid"], filter=expr)
    d = s._live(np.sort(tbl.column("docid").to_numpy().astype(np.int64)))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def index_or_docvalues_docs(sf_dir: str, term: str = "merge",
                            field: str = "n_chars", lo: int = 100,
                            hi: int = 300) -> pa.Table:
    """IndexOrDocValuesQuery ([U] lucene/core/.../search/
    IndexOrDocValuesQuery.java): a range filter wrapped so the execution
    strategy is chosen by lead cost — when the lead (term) iterator is
    much more selective than the range (leadCost * 8 < rangeCost, the
    reference's ScorerSupplier /8 rule), each candidate is verified
    against doc values; otherwise the point index drives and the sets
    intersect. Both plans produce the same doc set; the entry returns
    the set plus the chosen path, and the oracle replicates the cost
    rule in SQL so a mis-chosen plan fails the gate."""
    import pyarrow.compute as pc

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    chunks = list(s.iter_matches([term], mode="or"))
    lead = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    ds = pads.dataset(os.path.join(index_dir, "docs"), format="parquet")
    range_expr = (pc.field(field) >= int(lo)) & (pc.field(field) <= int(hi))
    range_count = ds.count_rows(filter=range_expr)  # BKD cost estimate role
    if len(lead) * 8 < range_count:
        path = "docvalues"
        t = ds.to_table(columns=["docid", field],
                        filter=pc.field("docid").isin(pa.array(lead)))
        did = t.column("docid").to_numpy().astype(np.int64)
        v = t.column(field).to_numpy()
        d = np.sort(did[(v >= lo) & (v <= hi)])
    else:
        path = "index"
        rt = ds.to_table(columns=["docid"], filter=range_expr)
        rd = np.sort(rt.column("docid").to_numpy().astype(np.int64))
        d = np.intersect1d(lead, rd, assume_unique=True)
    d = s._live(d)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "doc_id": pa.array(np.sort(mapping[d]), type=pa.int64()),
        "path": pa.array([path] * len(d), pa.string()),
    })


def edismax_pf2_topk(sf_dir: str, terms: list[str], k: int = 10) -> pa.Table:
    """ExtendedDisMax pf2 ([U] solr/core/.../search/ExtendedDismaxQParser.java):
    main BM25 OR query over the terms plus an ADDITIVE phrase boost for
    every adjacent query-term bigram (pf2, ps=0) — the edismax feature
    that rewards documents keeping query words together. Single-field
    reduction (qf=text): the per-term DisMax degenerates to the term
    score, so the score tree is

        final = f32( ... f32( f32(f64(main) + f64(bigram_1)) ... + f64(bigram_m) )

    with ``main`` the pinned ascending-term float32 BM25 fold and each
    bigram scored exactly like PhraseQuery (tf = adjacency count,
    w = f32(idf(t1) + idf(t2))); non-matching bigrams add float32 0.0
    (the identity). Rank-only output; oracle: ft_oracle.edismax_pf2_sql."""
    from lucene_solr_ray.analysis import tokenize
    from lucene_solr_ray.oracle import topk_order

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    # analyze once so engine and oracle agree on uppercase/stopword
    # terms (ADVICE r3): ORDER-PRESERVING per-term analysis — pf2
    # bigrams are built from the analyzed query SEQUENCE (Solr builds
    # them from the analyzed clause order), while the main fold's
    # sort/dedup happens inside IndexSearcher.search
    terms = [w for t in terms for w in tokenize(t)]
    d_main, sc_main = s.search(terms, k=max(1, s.n_docs), mode="or")
    if len(d_main) == 0:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    o = np.argsort(d_main)
    d = d_main[o]
    acc = sc_main[o].astype(np.float32)
    for t1, t2 in zip(terms[:-1], terms[1:]):  # pf2 bigrams, query order
        pd_, psc = s.search_phrase([t1, t2], k=max(1, s.n_docs))
        if len(pd_) == 0:
            continue
        po = np.argsort(pd_)
        pd_, psc = pd_[po], psc[po]
        idx = np.searchsorted(d, pd_)
        if not np.all(d[idx] == pd_):  # phrase matches ⊆ main OR set
            raise AssertionError("pf2 bigram matched outside the main query")
        acc[idx] = (acc[idx].astype(np.float64)
                    + psc.astype(np.float64)).astype(np.float32)
    top = topk_order(d, acc, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]], pa.int64()),
    })


def simple_query_docs(sf_dir: str, query: str) -> pa.Table:
    """SimpleQueryParser retrieval ([U] lucene/queryparser/.../simple/
    SimpleQueryParser.java): parse the +/|/-/"phrase"/prefix*/~fuzzy
    grammar (queryparser.parse_simple) and evaluate it as docid-set
    algebra over the index — terms/prefix/fuzzy from posting lists and
    the sorted term dicts, phrases from positional postings, NOT as a
    complement against the live-doc set. Unscored constant-score
    surface -> sorted doc_id set (the boolean oracle shape)."""
    from lucene_solr_ray.queryparser import parse_simple

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    all_live = s._live(np.arange(s.n_docs, dtype=np.int64))

    def union_terms(ts: list[str]) -> np.ndarray:
        parts = []
        for t in ts:
            _, _, cur = s.term_stats_and_cursor(t)
            if cur is not None:
                parts.append(cur.decode_all()[0])
        if not parts:
            return np.empty(0, np.int64)
        return s._live(np.unique(np.concatenate(parts)))

    def ev(node) -> np.ndarray:
        kind = node[0]
        if kind == "term":
            return union_terms([node[1]])
        if kind == "prefix":
            return union_terms(s.expand_terms("prefix", node[1]))
        if kind == "fuzzy":
            base, dist = node[1]
            return union_terms(s.expand_terms("fuzzy", f"{base}~{dist}"))
        if kind == "phrase":
            words, slop = node[1]
            d, _ = s.search_phrase(words, k=max(1, s.n_docs), slop=slop)
            return np.sort(d)
        if kind == "not":
            return np.setdiff1d(all_live, ev(node[1]), assume_unique=True)
        if kind == "and":
            return np.intersect1d(ev(node[1]), ev(node[2]), assume_unique=True)
        if kind == "or":
            # Lucene's SimpleQueryParser makes '-' a MUST_NOT clause on
            # the ENCLOSING BooleanQuery, so 'a | -b' is (a) minus (b),
            # not union(a, complement(b)): flatten the OR chain, union
            # the positive clauses, subtract each negated clause. A
            # BooleanQuery with only MUST_NOT clauses matches nothing.
            ops, stack = [], [node]
            while stack:
                n = stack.pop()
                (stack if n[0] == "or" else ops).extend(
                    [n[1], n[2]] if n[0] == "or" else [n])
            pos = [n for n in ops if n[0] != "not"]
            if not pos:
                return np.empty(0, np.int64)
            res = ev(pos[0])
            for p in pos[1:]:
                res = np.union1d(res, ev(p))
            for n in ops:
                if n[0] == "not":
                    res = np.setdiff1d(res, ev(n[1]))
            return res
        raise ValueError(f"simple query: unknown node {kind!r}")

    ast = parse_simple(query)
    d = ev(ast) if ast is not None else np.empty(0, np.int64)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def fuzzy_like_this_topk(sf_dir: str, words=("merg", "vectr"),
                         max_edits: int = 1, max_num_terms: int = 6,
                         k: int = 10) -> pa.Table:
    """FuzzyLikeThisQuery ([U] lucene/sandbox/.../queries/
    FuzzyLikeThisQuery.java): fuzzy-expand each query word over the term
    dicts, keep the best ``max_num_terms`` variants ACROSS all words
    (the reference's shared ScoreTerm queue; selection pinned
    deterministic as (edit distance asc, df desc, term asc) — the
    DirectSpellChecker order), then score the surviving variants as one
    BM25 OR query. Rank-only output; oracle: ft_oracle.fuzzy_like_this_sql
    replicates selection via DuckDB levenshtein over the vocabulary and
    the ascending-term float32 fold via list_reduce."""
    from lucene_solr_ray.pipelines.search import _levenshtein_leq

    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    cand: dict[str, tuple[int, int]] = {}  # variant -> (dist, df)
    for w in words:
        for v in s.expand_terms("fuzzy", f"{w}~{max_edits}", max_terms=100_000):
            dist = next(d for d in range(max_edits + 1) if _levenshtein_leq(w, v, d))
            if v not in cand or dist < cand[v][0]:
                df, _, _ = s.term_stats_and_cursor(v)
                cand[v] = (dist, df)
    sel = sorted(cand.items(), key=lambda x: (x[1][0], -x[1][1], x[0]))[:max_num_terms]
    terms = [t for t, _ in sel]
    if not terms:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    d, _sc = s.search(terms, k=k, mode="or")
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(d)), pa.int64()),
        "doc_id": pa.array(mapping[d], pa.int64()),
    })


def intervals_maxgaps_retrieve(sf_dir: str, term_a: str = "merge",
                               term_b: str = "join", term_c: str = "sort",
                               max_gaps: int = 4) -> pa.Table:
    """IntervalQuery maxgaps(g, ordered(a, b, c)) -> sorted doc_id set
    (SQL oracle: exists positions a < b < c with c - a - 2 <= g)."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d = s.search_intervals_maxgaps(term_a, term_b, term_c, max_gaps)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


def minhash_query_docs(sf_dir: str, query_text: str, sig_size: int = 32,
                       min_shared: int = 4) -> ray.data.Dataset:
    """MinHashQParser ([U] solr/core/.../search/MinHashQParserPlugin.java
    over lucene/analysis/minhash/MinHashFilter.java): Lucene's MinHash
    is a BOTTOM-K sketch — one hash function per token, keep the k
    smallest distinct hash values per field. The query text's sketch
    becomes a set-membership disjunction with a minimum-should-match;
    here: docs whose bottom-k token-hash sketch shares >= min_shared
    values with the query sketch, returned with the overlap count (the
    constant-score-per-band analogue). Token hash = md5/8-byte LE (the
    murmur3 stand-in used across this repo; SQL: md5_number_upper).
    Scale shape: the query sketch broadcasts into a stateless
    map_batches; per-doc sketches are computed inside the batch from a
    vocab-sized hash map — no shuffle at all."""
    from lucene_solr_ray.analysis import tokenize
    from lucene_solr_ray.io_utils import read_parquet_clean

    def _hash(tok: str) -> int:
        return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")

    q_sig = frozenset(sorted({_hash(t) for t in tokenize(query_text)})[:sig_size])

    def fn(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy()
        texts = [tokenize(s or "") for s in t.column("text").to_pylist()]
        # hash each DISTINCT token once per batch (vocab-sized work)
        hmap = {tok: _hash(tok) for toks in texts for tok in set(toks)}
        out_ids, out_n = [], []
        for i, toks in enumerate(texts):
            sketch = sorted({hmap[x] for x in toks})[:sig_size]
            n = len(q_sig.intersection(sketch))
            if n >= min_shared:
                out_ids.append(int(doc_ids[i]))
                out_n.append(n)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "n_shared": pa.array(out_n, pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )




def dv_update_sort(sf_dir: str, mod: int = 7, k: int = 15) -> pa.Table:
    """Numeric doc-values update end-to-end ([U] IndexWriter
    updateNumericDocValue — the reindex-free popularity-signal mutation):
    copy the cached index, overlay n_chars := (doc_id * 31) % 1000 for
    every doc_id % mod == 0, commit the generation, and re-run the
    sort-by-field query — the updated values must order the results.
    Output (rank, doc_id, val) with val the EFFECTIVE value (overlay or
    stored)."""
    import shutil

    from lucene_solr_ray.pipelines.deletes import update_numeric_docvalues

    src = docs_index(sf_dir)
    tmp = src + "-dvupcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    mapping = _docid_to_doc_id(tmp)
    ext = mapping[mapping % mod == 0]
    docids = np.searchsorted(mapping, ext)
    update_numeric_docvalues(
        tmp, "n_chars", {int(d): int(e * 31) % 1000 for d, e in zip(docids, ext)})
    s = IndexSearcher(tmp)
    d, vals = s.search_sorted_by_field(["merge"], "n_chars", k=k, descending=True)
    return pa.table({
        "rank": pa.array(np.arange(len(d)), pa.int64()),
        "doc_id": pa.array(mapping[d], pa.int64()),
        "val": pa.array(vals.astype(np.int64), pa.int64()),
    })


def tag_dictionary_matches(sf_dir: str,
                           tags=("merge join", "join vector", "sort window"),
                           ) -> ray.data.Dataset:
    """SolrTextTagger /tag handler ([U] solr/core/.../handler/tagger/
    TaggerRequestHandler.java): find every dictionary-phrase occurrence
    in each document — the entity-tagging surface (dictionary FST ->
    here a broadcast phrase table; none of the tags is a sub-phrase of
    another, so Solr's default NO_SUB overlap policy is vacuous and all
    matches are emitted). Output (doc_id, tag, pos) at every raw
    whitespace position where the phrase starts; one stateless pass."""
    from lucene_solr_ray.io_utils import read_parquet_clean

    tag_words = [(t, t.split()) for t in sorted(tags)]

    def fn(t: pa.Table) -> pa.Table:
        out_d, out_t, out_p = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            words = (s or "").split()
            for tag, ws in tag_words:
                n = len(ws)
                for p in range(len(words) - n + 1):
                    if words[p:p + n] == ws:
                        out_d.append(d)
                        out_t.append(tag)
                        out_p.append(p)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "tag": pa.array(out_t, pa.string()),
                         "pos": pa.array(out_p, pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort(["doc_id", "tag", "pos"])
    )


def optimistic_update(sf_dir: str,
                      ops=((1, 1, 500), (2, 5, 600), (1, 1, 700),
                           (1, 2, 800))) -> pa.Table:
    """Optimistic concurrency control ([U] solr/core/.../update/
    processor/DistributedUpdateProcessor.java ``_version_`` semantics):
    every update carries the version it expects; a mismatch is a 409
    conflict and writes NOTHING, a match applies and bumps the doc's
    version. Versions start at 1 (the index-time assignment); applied
    writes are dv-overlay generation commits (update_numeric_docvalues),
    so a conflict leaves the committed generation untouched. Ops here:
    (doc_id, expected_version, new n_chars) — op 3 retries doc 1 with
    the STALE version 1 and must conflict; op 4 retries with version 2
    and lands. Output = per-op outcome plus the final doc_values
    read-back for the touched docs."""
    import shutil

    from lucene_solr_ray.pipelines.deletes import update_numeric_docvalues

    src = docs_index(sf_dir)
    tmp = src + "-occcopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    mapping = _docid_to_doc_id(tmp)
    assert (mapping == np.arange(len(mapping))).all(), \
        "optimistic_update assumes docid == doc_id (contiguous corpus)"
    versions: dict[int, int] = {}
    out_rows = []
    for i, (doc, expected, newval) in enumerate(ops):
        cur_v = versions.get(int(doc), 1)
        if cur_v == int(expected):
            update_numeric_docvalues(tmp, "n_chars", {int(doc): int(newval)})
            versions[int(doc)] = cur_v + 1
            out_rows.append((i, int(doc), "applied", cur_v + 1))
        else:
            out_rows.append((i, int(doc), "conflict", cur_v))
    s = IndexSearcher(tmp)
    dv = s.doc_values("n_chars")
    touched = sorted({int(doc) for doc, _, _ in ops})
    for doc in touched:
        out_rows.append((len(ops), doc, "final", int(dv[doc])))
    return pa.table({
        "op_idx": pa.array([r[0] for r in out_rows], pa.int64()),
        "doc_id": pa.array([r[1] for r in out_rows], pa.int64()),
        "outcome": pa.array([r[2] for r in out_rows], pa.string()),
        "value": pa.array([r[3] for r in out_rows], pa.int64()),
    })


def atomic_inc_requery(sf_dir: str, mod: int = 11, delta: int = 5,
                       k: int = 15) -> pa.Table:
    """Atomic update ``{"field": {"inc": delta}}`` on a numeric
    doc-values field ([U] solr/core/.../update/processor/
    AtomicUpdateDocumentMerger.java 'inc' op): read-modify-write through
    the dv-overlay commit — no reindex, crash-safe via the manifest
    generation. Copy the cached index, inc n_chars by ``delta`` for
    every doc_id % mod == 0, requery sorted by the field."""
    import shutil

    from lucene_solr_ray.pipelines.deletes import update_numeric_docvalues

    src = docs_index(sf_dir)
    tmp = src + "-inccopy"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    s0 = IndexSearcher(tmp)
    mapping = _docid_to_doc_id(tmp)
    ext = mapping[mapping % mod == 0]
    docids = np.searchsorted(mapping, ext)
    cur = s0.doc_values("n_chars")[docids]  # read (stored or prior overlay)
    update_numeric_docvalues(
        tmp, "n_chars", {int(d): int(c) + delta for d, c in zip(docids, cur)})
    s = IndexSearcher(tmp)
    d, vals = s.search_sorted_by_field(["join"], "n_chars", k=k, descending=True)
    return pa.table({
        "rank": pa.array(np.arange(len(d)), pa.int64()),
        "doc_id": pa.array(mapping[d], pa.int64()),
        "val": pa.array(vals.astype(np.int64), pa.int64()),
    })


def mm_spec_retrieve(sf_dir: str, should: list[str], spec: str) -> pa.Table:
    """minimum-should-match SPEC form ([U] solr/core/.../util/
    SolrPluginUtils.java calculateMinShouldMatch — the dismax/edismax mm
    parameter grammar: absolute, negative, percentage, and conditional
    "c<v" clauses): resolve the spec against the clause count, then the
    ordinary mm boolean query."""
    from lucene_solr_ray.queryparser import parse_mm_spec

    mm = parse_mm_spec(spec, len(should))
    return min_should_match_retrieve(sf_dir, should, mm)


_FRESH_NOW_US = 1767312000000000  # 2026-01-02T00:00:00 UTC in epoch us


def freshness_boost_topk(sf_dir: str, terms: list[str], m: float = 1e-6,
                         a: float = 1.0, b: float = 1.0, k: int = 10) -> pa.Table:
    """The classic Solr freshness ranking ``{!boost b=recip(ms(NOW,ts),m,a,b)}q``
    ([U] solr/core/.../search/function — ReciprocalFloatFunction +
    BoostQParserPlugin; the Solr Ref Guide's canonical recency recipe):
    final = f32(f64(bm25) * f64(boost)), boost = f32(a/(m*x + b)) with
    x = whole milliseconds from the doc's ts to a PINNED NOW (2026-01-02
    00:00:00 — deterministic, just after every corpus ts). ts comes from
    one docid-pushdown docvalues fetch; rank-only output."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    from lucene_solr_ray.oracle import analyze_query_terms, topk_order

    qterms = analyze_query_terms(terms)
    d, bm25 = s.search(qterms, k=max(1, s.n_docs), mode="or")
    if len(d) == 0:
        return pa.Table.from_pylist([], schema=pa.schema(
            [("rank", pa.int64()), ("doc_id", pa.int64())]))
    docs = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "ts"],
        filter=pa.compute.field("docid").isin(pa.array(d.astype(np.int64))))
    order = pa.compute.sort_indices(docs.column("docid"))
    did_sorted = docs.column("docid").take(order).to_numpy().astype(np.int64)
    ts_us = docs.column("ts").take(order).cast(pa.int64()).to_numpy()
    x_ms = ((_FRESH_NOW_US - ts_us) // 1000)[np.searchsorted(did_sorted, d)].astype(np.float64)
    boost = (np.float64(a) / (np.float64(m) * x_ms + np.float64(b))).astype(np.float32)
    final = (bm25.astype(np.float64) * boost.astype(np.float64)).astype(np.float32)
    top = topk_order(d, final, k)
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(top)), pa.int64()),
        "doc_id": pa.array(mapping[d[top]].astype(np.int64), pa.int64()),
    })


def parser_numeric_range_docs(sf_dir: str, query: str = "merge n_chars:[100 TO 200]") -> pa.Table:
    """Classic parser with a fielded NUMERIC range atom
    ([U] solr {!lucene} field:[a TO b] over an IntPoint field — solr/core/
    .../parser/SolrQueryParserBase.java getRangeQuery): the range becomes
    a PointRangeQuery-style pushdown filter composed with the scored text
    clauses. Sorted doc_id set output."""
    index_dir = docs_index(sf_dir)
    s = IndexSearcher(index_dir)
    d, _ = s.search_parsed(query, k=max(1, s.n_docs))
    mapping = _docid_to_doc_id(index_dir)
    return pa.table({"doc_id": pa.array(np.sort(mapping[d]), type=pa.int64())})


# ---------------- multi-field indexing (round 5) ----------------

#: derived-field split: title = first N_TITLE_TOKENS whitespace tokens,
#: body = the rest — the SQL oracle slices the same token list
N_TITLE_TOKENS = 6

#: (query_id, title_terms, body_terms): per-field query sets exercising
#: the per-field analyzers — 'the'/'a' are STOPWORDS in the title's
#: standard chain (contribute nothing) but real terms in the body's
#: whitespace chain; 'dup' is the corpus's rare term
FT_MULTIFIELD_QUERIES = [
    ("mf1", ["merge"], ["merge"]),
    ("mf2", ["window", "vector"], ["stream"]),
    ("mf3", ["the"], ["the", "a"]),
    ("mf4", [], ["dup", "scan"]),
    ("mf5", ["join", "hash"], ["query"]),
]


def multifield_docs_index(sf_dir: str, num_partitions: int = 4,
                          salt: int = 1) -> str:
    """Build (once, cached) the two-field documents index: the text's
    first N_TITLE_TOKENS whitespace tokens become the ``title`` field
    (standard analyzer: lowercase+stop), the rest the ``body`` field
    (whitespace analyzer: no stop, case kept) — per-field postings/
    norms/avgdl/df under index_dir/fields/<name>/ ([U] lucene/core/.../
    index/IndexableField + PerFieldAnalyzerWrapper)."""
    from lucene_solr_ray.pipelines.multifield import build_multifield_index

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|{num_partitions}|"
        f"{salt}|mf-v2-pos".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"mf-index-{key}")
    if not os.path.exists(os.path.join(index_dir, "fields.json")):
        def add_fields(batch: pa.Table) -> pa.Table:
            titles, bodies = [], []
            for s in batch.column("text").to_pylist():
                toks = (s or "").split()
                titles.append(" ".join(toks[:N_TITLE_TOKENS]))
                bodies.append(" ".join(toks[N_TITLE_TOKENS:]))
            return batch.append_column(
                "title", pa.array(titles, pa.string())
            ).append_column("body", pa.array(bodies, pa.string()))

        ds = transcripts_from_documents(sf_dir).map_batches(
            add_fields, batch_format="pyarrow")
        build_multifield_index(
            ds, index_dir,
            fields={"title": {"column": "title", "analyzer": "standard",
                              "positions": True},
                    "body": {"column": "body", "analyzer": "whitespace"}},
            num_partitions=num_partitions, salt=salt,
        )
    return index_dir


def multifield_dismax_topk(sf_dir: str, queries=None, k: int = 10) -> pa.Table:
    """Fielded DisMax top-k over the two-field index: each field scores
    with ITS OWN BM25 stats (df/N/avgdl/norms from its sub-index), the
    per-doc score is the float32 max across fields
    ([U] lucene/core/.../search/DisjunctionMaxQuery.java, tie 0).
    RANK-ONLY output (query_id, rank, doc_id); the DuckDB oracle
    (ft_oracle.multifield_dismax_sql) replicates both field chains and
    the GREATEST combine from the same query list."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, multifield_docid_to_doc_id)

    queries = queries or FT_MULTIFIELD_QUERIES
    index_dir = multifield_docs_index(sf_dir)
    s = MultiFieldSearcher(index_dir)
    mapping = multifield_docid_to_doc_id(index_dir)
    qids, ranks, doc_ids = [], [], []
    for qid, t_terms, b_terms in queries:
        d, _sc = s.search_dismax({"title": t_terms, "body": b_terms}, k=k)
        qids.extend([qid] * len(d))
        ranks.extend(range(len(d)))
        doc_ids.extend(mapping[d].tolist())
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "rank": pa.array(ranks, pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


def multifield_sum_topk(sf_dir: str, queries=None, k: int = 10) -> pa.Table:
    """Fielded BooleanQuery-SHOULD top-k: per-doc score = left-to-right
    float32 fold of the per-field BM25 scores in schema order
    ([U] lucene/core/.../search/BooleanQuery.java SHOULD sum across
    fields). RANK-ONLY output; oracle = multifield_dismax_sql(
    combine='sum')."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, multifield_docid_to_doc_id)

    queries = queries or FT_MULTIFIELD_QUERIES
    index_dir = multifield_docs_index(sf_dir)
    s = MultiFieldSearcher(index_dir)
    mapping = multifield_docid_to_doc_id(index_dir)
    qids, ranks, doc_ids = [], [], []
    for qid, t_terms, b_terms in queries:
        d, _sc = s.search_sum({"title": t_terms, "body": b_terms}, k=k)
        qids.extend([qid] * len(d))
        ranks.extend(range(len(d)))
        doc_ids.extend(mapping[d].tolist())
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "rank": pa.array(ranks, pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


def multifield_qf_boost_topk(sf_dir: str, queries=None, k: int = 10,
                             boosts=None) -> pa.Table:
    """edismax qf with per-field boosts ([U] solr/core/.../search/
    ExtendedDismaxQParser.java, qf="title^0.3 body^3"): DisMax over the
    per-field BM25 scores with each field's score scaled
    float32(boost64 * score64) before the max. RANK-ONLY output; oracle
    = multifield_dismax_sql(boosts=...)."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, multifield_docid_to_doc_id)

    queries = queries or FT_MULTIFIELD_QUERIES
    boosts = boosts or {"title": 0.3, "body": 3.0}
    index_dir = multifield_docs_index(sf_dir)
    s = MultiFieldSearcher(index_dir)
    mapping = multifield_docid_to_doc_id(index_dir)
    qids, ranks, doc_ids = [], [], []
    for qid, t_terms, b_terms in queries:
        d, _sc = s.search_dismax({"title": t_terms, "body": b_terms}, k=k,
                                 boosts=boosts)
        qids.extend([qid] * len(d))
        ranks.extend(range(len(d)))
        doc_ids.extend(mapping[d].tolist())
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "rank": pa.array(ranks, pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


#: fielded query strings for the parse entry — mixed per-field clauses,
#: OR connectors, repeated fields
FT_FIELDED_QUERY_STRINGS = [
    ("fq1", "title:merge OR body:stream"),
    ("fq2", "body:dup title:window title:vector"),
    ("fq3", "title:the body:the body:a"),
    ("fq4", "body:scan OR body:row OR title:join"),
]


def fielded_queries_as_term_sets():
    """(qid, title_terms, body_terms) derived from the query STRINGS by
    the engine's own parser — the oracle generator consumes this, so
    parser and oracle cannot drift."""
    from lucene_solr_ray.pipelines.multifield import parse_fielded_query

    out = []
    for qid, q in FT_FIELDED_QUERY_STRINGS:
        ft = parse_fielded_query(q, ("title", "body"))
        out.append((qid, ft.get("title", []), ft.get("body", [])))
    return out


def multifield_fielded_parse_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """The Missing-#1 user scenario end-to-end: a query STRING with
    fielded syntax ("title:foo OR body:bar") parsed and executed over
    the two-field index, each field with its own analyzer/stats.
    RANK-ONLY output."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, multifield_docid_to_doc_id)

    index_dir = multifield_docs_index(sf_dir)
    s = MultiFieldSearcher(index_dir)
    mapping = multifield_docid_to_doc_id(index_dir)
    qids, ranks, doc_ids = [], [], []
    for qid, q in FT_FIELDED_QUERY_STRINGS:
        d, _sc = s.search_parsed(q, k=k)
        qids.extend([qid] * len(d))
        ranks.extend(range(len(d)))
        doc_ids.extend(mapping[d].tolist())
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "rank": pa.array(ranks, pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


def multifield_dismax_tie_topk(sf_dir: str, queries=None, k: int = 10,
                               tie_breaker: float = 0.3) -> pa.Table:
    """DisMax with a tie_breaker ([U] lucene/core/.../search/
    DisjunctionMaxQuery.java tieBreakerMultiplier): docs matching BOTH
    fields add tie * the losing field's score — f32(max64 +
    tie*(total64 - max64)). RANK-ONLY output."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, multifield_docid_to_doc_id)

    queries = queries or FT_MULTIFIELD_QUERIES
    index_dir = multifield_docs_index(sf_dir)
    s = MultiFieldSearcher(index_dir)
    mapping = multifield_docid_to_doc_id(index_dir)
    qids, ranks, doc_ids = [], [], []
    for qid, t_terms, b_terms in queries:
        d, _sc = s.search_dismax({"title": t_terms, "body": b_terms}, k=k,
                                 tie_breaker=tie_breaker)
        qids.extend([qid] * len(d))
        ranks.extend(range(len(d)))
        doc_ids.extend(mapping[d].tolist())
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "rank": pa.array(ranks, pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


def multifield_title_phrase_topk(sf_dir: str, phrase=("spark", "table"),
                                 k: int = 10) -> pa.Table:
    """PhraseQuery on ONE field of the multi-field index ([U] lucene/
    core/.../search/PhraseQuery.java is always fielded): the title
    sub-index stores positions (per-field store_positions), and the
    phrase scores with the TITLE's own stats. RANK-ONLY (rank, doc_id);
    oracle = ft_oracle.multifield_title_phrase_sql (adjacency within
    the derived title slice, title-field dl/df/denom CTEs)."""
    from lucene_solr_ray.pipelines.multifield import (
        MultiFieldSearcher, multifield_docid_to_doc_id)

    index_dir = multifield_docs_index(sf_dir)
    s = MultiFieldSearcher(index_dir)
    d, _sc = s.searchers["title"].search_phrase(list(phrase), k=k)
    mapping = multifield_docid_to_doc_id(index_dir)
    return pa.table({
        "rank": pa.array(np.arange(len(d)), pa.int64()),
        "doc_id": pa.array(mapping[d].astype(np.int64) if len(d)
                           else np.empty(0, np.int64), pa.int64()),
    })
