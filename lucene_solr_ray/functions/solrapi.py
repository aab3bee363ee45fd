"""Solr request-handler surface — the last SURVEY §2.11 row: named
QParserPlugins, an ordered SearchComponent pipeline, and a RequestHandler
registry dispatching Solr-style param maps, so a Solr user's /select
request (q / defType / fq / fl / sort / start / rows / facet / stats /
hl) runs against this engine with the same parameter vocabulary.

Reference shapes (upstream paths; the local checkout is a tombstone):
- [U] solr/core/src/java/org/apache/solr/handler/component/SearchHandler.java
  — a RequestHandler that runs an ordered list of SearchComponents:
  prepare() all, then process() all, each reading/writing a shared
  request/response object.
- [U] solr/core/src/java/org/apache/solr/search/QParserPlugin.java
  (+ LuceneQParserPlugin, DisMaxQParserPlugin) — named query parsers
  selected by defType.
- [U] solr/core/src/java/org/apache/solr/handler/component/
  {QueryComponent,FacetComponent,StatsComponent,HighlightComponent}.java

Ray-Data shapes: the page fetch is a parquet predicate-pushdown read of
docs.parquet (page-sized); facet/stats run over the FULL match set as
map_batches partial aggregations with the sorted match-docid array
broadcast once (ray.put -> zero-copy per actor) and only per-batch
partial tables returned to the driver (the CLAUDE.md driver-combine
pattern — Ray groupby on tiny key sets is slower than merging partials);
field sort reuses the distributed join+sort top-k shape of
fulltext.sorted_by_field_topk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data

from lucene_solr_ray.io_utils import join_partitions, pool_size, read_parquet_clean
from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.state.schema import TRANSCRIPTS_SCHEMA

# ---------------------------------------------------------------------------
# QParser plugins ([U] solr/core/.../search/QParserPlugin.java)
# ---------------------------------------------------------------------------


def _lucene_qparser(params: dict, searcher: IndexSearcher, schema):
    """defType=lucene: the classic parser (queryparser.parse_query)."""
    from lucene_solr_ray.queryparser import parse_query

    q = params.get("q", "").strip()
    if q in ("", "*:*"):
        return {"kind": "match_all"}
    clauses, dv = parse_query(q, searcher=searcher, schema=schema)
    return {"kind": "clauses", "clauses": clauses, "dv_filters": dv}


def _dismax_qparser(params: dict, searcher: IndexSearcher, schema):
    """defType=dismax ([U] solr/core/.../search/DisMaxQParserPlugin.java):
    user query as plain whitespace terms (no operators), disjunction-max
    scoring with the ``tie`` tiebreaker param."""
    terms = [w for w in params.get("q", "").split() if w]
    return {"kind": "dismax", "terms": terms, "tie": float(params.get("tie", 0.0))}


QPARSER_PLUGINS = {"lucene": _lucene_qparser, "dismax": _dismax_qparser}


# ---------------------------------------------------------------------------
# fq parsing (Solr filter-query param; [U] solr/core/.../search/QueryParsing)
# ---------------------------------------------------------------------------


def _parse_fq(fq_params: list[str], schema) -> tuple[dict, list[str]]:
    """Each fq is intersected (Solr semantics). ``field:value`` on a
    docvalues field -> equality; ``field:(v1 v2 ...)`` -> isin; a bare
    word -> unscored text FILTER term."""
    dv: dict = {}
    filter_terms: list[str] = []
    for fq in fq_params:
        fq = fq.strip()
        field, sep, value = fq.partition(":")
        if sep and field in schema.fields and schema.serve(field) == "docvalues":
            if value.startswith("(") and value.endswith(")"):
                vals = value[1:-1].split()
                existing = dv.get(field)
                dv[field] = vals if existing is None else list(existing) + vals
            else:
                dv[field] = value if field not in dv else list(
                    dv[field] if isinstance(dv[field], list) else [dv[field]]
                ) + [value]
        else:
            filter_terms.append(value if sep and field == "text" else fq)
    return dv, filter_terms


# ---------------------------------------------------------------------------
# Facet / stats partial stages (map-side combine, driver merge)
# ---------------------------------------------------------------------------


def _facet_partial(field: str):
    """Stateless per-batch value counts of one docvalues column (the
    match restriction composes upstream via restricted_docs)."""

    def fn(batch: pa.Table) -> pa.Table:
        vc = batch.column(field).value_counts()
        if len(vc) == 0:
            return pa.table({"value": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64())})
        return pa.table({
            "value": vc.field("values").cast(pa.string()),
            "count": vc.field("counts").cast(pa.int64()),
        })

    return fn


def _range_partial(field: str, start: int, end: int, gap: int):
    """Stateless per-batch histogram of one numeric column over
    [start, end) with fixed ``gap`` buckets."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(field).to_numpy(zero_copy_only=False)
        x = x[(x >= start) & (x < end)]
        n_buckets = (end - start + gap - 1) // gap
        b = ((x - start) // gap).astype(np.int64)
        counts = np.bincount(b, minlength=n_buckets).astype(np.int64)
        lo = start + gap * np.arange(n_buckets, dtype=np.int64)
        return pa.table({"bucket_lo": pa.array(lo), "count": pa.array(counts)})

    return fn


def _stats_partial(field: str):
    """Stateless per-batch (n, n_missing, sum, min, max) of one numeric
    column ([U] solr StatsComponent)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(field)
        valid = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(valid)], pa.int64()),
            "n_missing": pa.array([len(col) - len(valid)], pa.int64()),
            "sum": pa.array([int(valid.sum()) if len(valid) else 0], pa.int64()),
            "min": pa.array([int(valid.min()) if len(valid) else None], pa.int64()),
            "max": pa.array([int(valid.max()) if len(valid) else None], pa.int64()),
        })

    return fn


def _docs_ds(index_dir: str, columns: list[str]) -> ray.data.Dataset:
    return read_parquet_clean(os.path.join(index_dir, "docs"), columns=columns)


# one int64 id array per actor; above this the broadcast would dominate
# worker heaps, so the restriction becomes a hash join instead
BROADCAST_ID_LIMIT = 32_000_000  # ids = 256 MB


class _MembershipStage:
    """Filter a docs batch to the broadcast sorted match set (zero-copy
    ray.put array, one fetch per actor)."""

    def __init__(self, ids_ref):
        self.ids = ray.get(ids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docid = batch.column("docid").to_numpy()
        pos = np.searchsorted(self.ids, docid)
        pos[pos >= len(self.ids)] = 0
        mask = (self.ids[pos] == docid) if len(self.ids) else np.zeros(len(docid), bool)
        return batch.filter(pa.array(mask))


def restricted_docs(index_dir: str, match_docids: np.ndarray, columns: list[str],
                    match_all: bool = False) -> ray.data.Dataset:
    """docs.parquet columns restricted to the match set, scale-shaped:
    match-all -> plain pruned read (nothing shipped); small/medium match
    sets -> broadcast sorted-id membership filter (one object-store copy,
    zero-copy per actor); huge match sets (> BROADCAST_ID_LIMIT) -> hash
    join against the hits Dataset (the all-to-all is unavoidable once the
    id set itself is distributed-sized)."""
    ds = _docs_ds(index_dir, ["docid"] + [c for c in columns if c != "docid"])
    if match_all:
        return ds
    if len(match_docids) <= BROADCAST_ID_LIMIT:
        ids_ref = ray.put(np.asarray(match_docids, dtype=np.int64))
        return ds.map_batches(
            _MembershipStage, fn_constructor_kwargs={"ids_ref": ids_ref},
            batch_format="pyarrow", concurrency=pool_size(),
        )
    hits = ray.data.from_numpy(np.asarray(match_docids, dtype=np.int64)).map_batches(
        lambda b: pa.table({"docid": pa.array(b["data"], pa.int64())}),
        batch_format="numpy",
    )
    return ds.join(hits, "inner", num_partitions=join_partitions(), on=("docid",))


# ---------------------------------------------------------------------------
# SearchComponents ([U] solr/core/.../handler/component/SearchComponent.java)
# ---------------------------------------------------------------------------


class QueryComponent:
    """Parse q/fq via the defType QParserPlugin, execute, page, and fetch
    fl stored fields ([U] .../component/QueryComponent.java)."""

    name = "query"

    def prepare(self, req: dict) -> None:
        p, s = req["params"], req["searcher"]
        deftype = p.get("defType", "lucene")
        if deftype not in QPARSER_PLUGINS:
            raise ValueError(f"unknown defType {deftype!r} (have {sorted(QPARSER_PLUGINS)})")
        req["plan"] = QPARSER_PLUGINS[deftype](p, s, req["schema"])
        fq = p.get("fq", [])
        req["fq_dv"], req["fq_terms"] = _parse_fq(
            [fq] if isinstance(fq, str) else list(fq), req["schema"]
        )

    def process(self, req: dict) -> None:
        s: IndexSearcher = req["searcher"]
        p, plan = req["params"], req["plan"]
        start, rows = int(p.get("start", 0)), int(p.get("rows", 10))
        sort = p.get("sort", "score desc").strip()

        dv = dict(req["fq_dv"])
        if plan["kind"] == "clauses":
            for f, v in plan["dv_filters"].items():
                dv[f] = v if f not in dv else dv[f]
            clauses = list(plan["clauses"])
            for t in req["fq_terms"]:
                clauses.append({"occur": "filter", "kind": "terms", "terms": [t]})
            docids, scores = s.search_clauses(
                clauses, k=max(1, s.n_docs), dv_filters=dv or None, schema=req["schema"]
            )
        elif plan["kind"] == "dismax":
            if dv or req["fq_terms"]:
                raise ValueError("dismax defType supports no fq in this engine")
            docids, scores = s.search_dismax(
                plan["terms"], k=max(1, s.n_docs), tie_breaker=plan["tie"]
            )
        else:  # match_all ([U] lucene MatchAllDocsQuery + FILTER shape)
            clauses = [{"occur": "filter", "kind": "terms", "terms": [t]}
                       for t in req["fq_terms"]]
            if clauses or dv:
                docids, scores = s.search_clauses(
                    clauses, k=max(1, s.n_docs), dv_filters=dv or None,
                    schema=req["schema"],
                )
            else:
                docids, scores = s.match_all(k=max(1, s.n_docs))

        req["num_found"] = len(docids)
        req["match_docids"] = np.sort(np.asarray(docids, dtype=np.int64))
        # every live doc matched -> downstream components need no
        # restriction at all (nothing shipped for q=*:* facets/stats)
        req["match_is_all"] = len(docids) == s.n_docs

        fl = [f for f in p.get("fl", "doc_id").split(",") if f]
        if sort == "score desc":
            page = np.asarray(docids[start : start + rows], dtype=np.int64)
            req["response"] = self._fetch(req, page, fl, start)
        else:
            field, _, direction = sort.partition(" ")
            page = self._field_sort_page(req, field, direction.strip() or "asc",
                                         start, rows)
            req["response"] = self._fetch(req, page, fl, start)
        req["page_docids"] = page

    @staticmethod
    def _field_sort_page(req: dict, field: str, direction: str,
                         start: int, rows: int) -> np.ndarray:
        """sort=<field> asc|desc: restrict to the match set in the data
        plane, then distributed sort + limit (the TopFieldCollector
        shape of fulltext.sorted_by_field_topk), docid asc tiebreak."""
        index_dir = req["searcher"].index_dir
        ids = req["match_docids"]
        if len(ids) == 0:
            return np.empty(0, dtype=np.int64)
        top = (
            restricted_docs(index_dir, ids, [field], req["match_is_all"])
            .sort([field, "docid"], descending=[direction == "desc", False])
            .limit(start + rows)
            .to_pandas()
        )
        return top["docid"].to_numpy().astype(np.int64)[start : start + rows]

    @staticmethod
    def _fetch(req: dict, page_docids: np.ndarray, fl: list[str],
               start: int) -> pa.Table:
        """Stored-field fetch for the page: predicate-pushdown read of
        docs.parquet (page-sized), reordered to page order."""
        index_dir = req["searcher"].index_dir
        cols = {"rank": pa.array(start + np.arange(len(page_docids)), pa.int64())}
        if len(page_docids) == 0:
            for f in fl:
                cols[f] = pa.array([], pa.string() if f in ("lang", "source", "role", "tool", "conv_id") else pa.int64())
            return pa.table(cols)
        tbl = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
            columns=["docid"] + fl,
            filter=pc.field("docid").isin(page_docids.tolist()),
        )
        got = tbl.column("docid").to_numpy()
        order = np.argsort(got, kind="stable")
        idx = order[np.searchsorted(got[order], page_docids)]
        for f in fl:
            cols[f] = tbl.column(f).take(pa.array(idx))
        return pa.table(cols)


class FacetComponent:
    """facet=true: facet.field value counts and facet.range numeric
    histograms over the FULL match set, as broadcast-membership
    map_batches partials merged on the driver
    ([U] .../component/FacetComponent.java)."""

    name = "facet"

    def prepare(self, req: dict) -> None:
        pass

    def process(self, req: dict) -> None:
        p = req["params"]
        if str(p.get("facet", "")).lower() != "true":
            return
        index_dir = req["searcher"].index_dir
        ids, is_all = req["match_docids"], req["match_is_all"]
        out: list[pa.Table] = []

        ff = p.get("facet.field", [])
        for field in [ff] if isinstance(ff, str) else ff:
            if req["schema"].serve(field) != "docvalues":
                raise ValueError(f"facet.field {field!r} needs a docvalues (string) field")
            partials = restricted_docs(index_dir, ids, [field], is_all).map_batches(
                _facet_partial(field), batch_format="pyarrow",
            ).to_pandas()
            merged = partials.groupby("value", as_index=False)["count"].sum()
            merged = merged[merged["count"] > 0].sort_values("value")
            out.append(pa.table({
                "field": pa.array([field] * len(merged)),
                "value": pa.array(merged["value"].tolist(), pa.string()),
                "count": pa.array(merged["count"].to_numpy().astype(np.int64)),
            }))

        fr = p.get("facet.range", [])
        for field in [fr] if isinstance(fr, str) else fr:
            pref = f"f.{field}.facet.range."
            lo = int(p[pref + "start"]); hi = int(p[pref + "end"]); gap = int(p[pref + "gap"])
            partials = restricted_docs(index_dir, ids, [field], is_all).map_batches(
                _range_partial(field, lo, hi, gap), batch_format="pyarrow",
            ).to_pandas()
            merged = partials.groupby("bucket_lo", as_index=False)["count"].sum().sort_values("bucket_lo")
            out.append(pa.table({
                "field": pa.array([field] * len(merged)),
                "value": pa.array([str(v) for v in merged["bucket_lo"]], pa.string()),
                "count": pa.array(merged["count"].to_numpy().astype(np.int64)),
            }))

        req["facet_counts"] = (
            pa.concat_tables(out) if out
            else pa.table({"field": pa.array([], pa.string()),
                           "value": pa.array([], pa.string()),
                           "count": pa.array([], pa.int64())})
        )


class StatsComponent:
    """stats=true + stats.field: integer (n, n_missing, sum, min, max)
    per numeric field over the full match set
    ([U] .../component/StatsComponent.java)."""

    name = "stats"

    def prepare(self, req: dict) -> None:
        pass

    def process(self, req: dict) -> None:
        p = req["params"]
        if str(p.get("stats", "")).lower() != "true":
            return
        index_dir = req["searcher"].index_dir
        ids, is_all = req["match_docids"], req["match_is_all"]
        sf = p.get("stats.field", [])
        rows = []
        for field in [sf] if isinstance(sf, str) else sf:
            partials = restricted_docs(index_dir, ids, [field], is_all).map_batches(
                _stats_partial(field), batch_format="pyarrow",
            ).to_pandas()
            nn = partials["min"].dropna()
            xx = partials["max"].dropna()
            rows.append({
                "field": field,
                "n": int(partials["n"].sum()),
                "n_missing": int(partials["n_missing"].sum()),
                "sum": int(partials["sum"].sum()),
                "min": int(nn.min()) if len(nn) else None,
                "max": int(xx.max()) if len(xx) else None,
            })
        req["stats"] = pa.Table.from_pylist(rows, schema=pa.schema([
            ("field", pa.string()), ("n", pa.int64()), ("n_missing", pa.int64()),
            ("sum", pa.int64()), ("min", pa.int64()), ("max", pa.int64()),
        ]))


class HighlightComponent:
    """hl=true: mark query-term occurrences in the PAGE docs from stored
    term-vector offsets — exact character spans, no re-tokenization
    ([U] .../component/HighlightComponent.java + the unified
    highlighter's offsets-from-vectors path)."""

    name = "highlight"

    def prepare(self, req: dict) -> None:
        pass

    def process(self, req: dict) -> None:
        p = req["params"]
        if str(p.get("hl", "")).lower() != "true":
            return
        s: IndexSearcher = req["searcher"]
        terms = p.get("hl.q", "").split() or self._query_terms(req)
        rows = []
        for docid in req.get("page_docids", ()):
            snippet = s.highlight_doc(int(docid), terms)
            if snippet is not None:
                rows.append({"docid": int(docid), "snippet": snippet})
        req["highlighting"] = pa.Table.from_pylist(rows, schema=pa.schema([
            ("docid", pa.int64()), ("snippet", pa.string())
        ]))

    @staticmethod
    def _query_terms(req: dict) -> list[str]:
        plan = req["plan"]
        if plan["kind"] == "dismax":
            return list(plan["terms"])
        terms: list[str] = []
        for cl in plan.get("clauses", ()):
            if cl["occur"] != "must_not":
                terms.extend(cl["terms"])
        return terms


SEARCH_COMPONENTS = {
    "query": QueryComponent,
    "facet": FacetComponent,
    "stats": StatsComponent,
    "highlight": HighlightComponent,
}


# ---------------------------------------------------------------------------
# RequestHandler registry ([U] solr/core/.../handler/RequestHandlerBase.java)
# ---------------------------------------------------------------------------


class SearchHandler:
    """Ordered component pipeline: prepare() all, then process() all,
    over a shared request dict ([U] .../component/SearchHandler.java)."""

    def __init__(self, components=("query", "facet", "stats", "highlight")):
        unknown = [c for c in components if c not in SEARCH_COMPONENTS]
        if unknown:
            raise ValueError(f"unknown SearchComponents {unknown} (have {sorted(SEARCH_COMPONENTS)})")
        self.components = [SEARCH_COMPONENTS[c]() for c in components]

    def handle(self, index_dir: str, params: dict, schema=TRANSCRIPTS_SCHEMA) -> dict:
        req: dict = {
            "params": params,
            "searcher": IndexSearcher(index_dir),
            "schema": schema,
        }
        for c in self.components:
            c.prepare(req)
        for c in self.components:
            c.process(req)
        return {
            "num_found": req["num_found"],
            "response": req["response"],
            "facet_counts": req.get("facet_counts"),
            "stats": req.get("stats"),
            "highlighting": req.get("highlighting"),
        }


REQUEST_HANDLERS: dict[str, SearchHandler] = {
    "/select": SearchHandler(),
    # /query is Solr's JSON request API alias for the same pipeline
    "/query": SearchHandler(),
    # /export = full sorted result stream, no facet/hl extras
    "/export": SearchHandler(components=("query",)),
}


def handle_request(sf_dir: str, path: str, params: dict) -> dict:
    """Dispatch a Solr-style request against the (cached) documents
    index of ``sf_dir``. ``path`` selects the RequestHandler."""
    from lucene_solr_ray.functions.fulltext import docs_index

    if path not in REQUEST_HANDLERS:
        raise KeyError(f"no RequestHandler at {path!r} (have {sorted(REQUEST_HANDLERS)})")
    return REQUEST_HANDLERS[path].handle(docs_index(sf_dir), params)


# ---------------------------------------------------------------------------
# Driver-contract entry pipelines (queries() wrappers)
# ---------------------------------------------------------------------------


def _with_doc_ids(index_dir: str, tbl: pa.Table, docid_col: str) -> pa.Table:
    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id

    mapping = _docid_to_doc_id(index_dir)
    ids = mapping[tbl.column(docid_col).to_numpy()]
    return tbl.set_column(tbl.schema.get_field_index(docid_col), "doc_id",
                          pa.array(ids, pa.int64()))


def solr_select_docs(sf_dir: str) -> pa.Table:
    """/select with q + fq + field sort + pagination + fl — the fielded
    page-fetch request a Solr user migrates first."""
    out = handle_request(sf_dir, "/select", {
        "q": "merge join",
        "fq": ["lang:en"],
        "sort": "n_chars desc",
        "start": "5",
        "rows": "10",
        "fl": "doc_id,n_chars,lang",
    })
    return out["response"]


def solr_select_scored(sf_dir: str) -> pa.Table:
    """/select default sort (score desc): BM25-ranked page, rank-only
    output (same float32 convention as ft_bm25_topk)."""
    out = handle_request(sf_dir, "/select", {
        "q": "merge join", "rows": "10", "fl": "doc_id",
    })
    return out["response"]


def solr_select_dismax(sf_dir: str) -> pa.Table:
    """/select with defType=dismax + tie: disjunction-max page,
    rank-only output."""
    out = handle_request(sf_dir, "/select", {
        "defType": "dismax", "q": "merge join vector", "tie": "0.3",
        "rows": "10", "fl": "doc_id",
    })
    return out["response"]


def solr_select_facets(sf_dir: str) -> pa.Table:
    """/select with facet.field + facet.range over the full match set."""
    out = handle_request(sf_dir, "/select", {
        "q": "merge join",
        "rows": "0",
        "facet": "true",
        "facet.field": ["lang", "source"],
        "facet.range": "n_chars",
        "f.n_chars.facet.range.start": "0",
        "f.n_chars.facet.range.end": "600",
        "f.n_chars.facet.range.gap": "150",
    })
    return out["facet_counts"]


def solr_select_stats(sf_dir: str) -> pa.Table:
    """/select with stats.field over the full match set."""
    out = handle_request(sf_dir, "/select", {
        "q": "merge join", "rows": "0", "stats": "true", "stats.field": "n_chars",
    })
    return out["stats"]


def solr_select_highlight(sf_dir: str) -> pa.Table:
    """/select with hl=true: page snippets from stored term-vector
    offsets, keyed by doc_id."""
    index_dir_out = handle_request(sf_dir, "/select", {
        "q": "merge join", "rows": "5", "hl": "true",
    })
    from lucene_solr_ray.functions.fulltext import docs_index

    tbl = index_dir_out["highlighting"]
    return _with_doc_ids(docs_index(sf_dir), tbl, "docid").sort_by("doc_id")


def field_analysis(sf_dir: str, max_doc_id: int = 5) -> ray.data.Dataset:
    """FieldAnalysisRequestHandler (/analysis/field — [U] solr/core/.../
    handler/FieldAnalysisRequestHandler.java): the token stream emitted
    AFTER each stage of the canonical chain (tokenizer -> lowercase ->
    stopfilter), with Lucene position semantics — stop-filtered tokens
    leave position gaps, tokenizer-level drops emit no position. One
    stateless pass over a doc_id-pruned read (predicate pushdown); rows
    are (doc_id, stage, pos, token)."""
    from lucene_solr_ray.io_utils import read_parquet_clean
    from lucene_solr_ray.analysis import (MAX_TOKEN_LEN, STOPWORDS, TOKEN_RE)
    import unicodedata

    def stages(t: pa.Table) -> pa.Table:
        doc_ids, stages_, poss, toks = [], [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            text = unicodedata.normalize("NFC", text or "")
            pos = 0
            for tok in TOKEN_RE.findall(text):
                if len(tok) > MAX_TOKEN_LEN:
                    continue
                if not tok.strip("_"):
                    continue
                low = tok.lower()
                doc_ids += [doc_id, doc_id]
                stages_ += ["tokenizer", "lowercase"]
                poss += [pos, pos]
                toks += [tok, low]
                if low not in STOPWORDS:
                    doc_ids.append(doc_id)
                    stages_.append("stop")
                    poss.append(pos)
                    toks.append(low)
                pos += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "stage": pa.array(stages_, pa.string()),
            "pos": pa.array(poss, pa.int64()),
            "token": pa.array(toks, pa.string()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .filter(expr=f"doc_id < {max_doc_id}")
        .map_batches(stages, batch_format="pyarrow")
        .sort(["doc_id", "stage", "pos"])
    )
