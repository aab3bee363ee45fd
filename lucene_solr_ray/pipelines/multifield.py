"""Multi-field inverted indexing — the Lucene document model's last
structural piece here: N indexed text fields per document, each with its
OWN analyzer, postings, norms, df/idf and avgdl, queried with a field
dimension (``title:foo OR body:bar``) and combined per-doc (DisMax /
BooleanQuery sum).

Reference anchors: [U] lucene/core/.../index/IndexableField (a doc is a
set of named indexed fields), [U] lucene/analysis/common/.../
miscellaneous/PerFieldAnalyzerWrapper.java (field -> analyzer binding),
[U] solr/core/.../schema/IndexSchema.java (the schema that declares
them), [U] lucene/core/.../search/DisjunctionMaxQuery.java /
BooleanQuery.java (per-field score combination).

Ray-Data-first layout: each field is a full sub-index under
``<index_dir>/fields/<name>/`` built by the SAME build_index pipeline
(per-field analyzer + text column; identical deterministic conv-base
docID assignment, so docids align across fields with no join), plus a
top-level ``fields.json``. Per-field global stats (N, sum_dl -> avgdl,
df) come from each sub-index's own manifest — exactly Lucene's
per-field Terms/NumericDocValues statistics. Stored fields are written
ONCE (by the primary field's build); secondary-field builds prune their
parquet read to (conv_id, turn_idx, <their column>) so no other
payload leaves storage.

Build cost note: one streamed build pass per field (k passes over the
pruned input for k fields). Lucene's DWPT inverts all fields in one
pass; here each field's pass shuffles ONLY that field's postings, so
total exchange volume is identical and the passes pipeline
independently — the k-pass read is the trade for reusing the
single-field build/merge/resume machinery unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.search import IndexSearcher

FIELDS_FILENAME = "fields.json"


def build_multifield_index(input_path, index_dir: str, fields: dict,
                           num_partitions: int = 8, salt: int = 1,
                           docid_mode: str = "conv-base") -> dict:
    """Build one sub-index per field; ``fields`` is an ordered mapping
    name -> {"column": <input column>, "analyzer": <ANALYZERS name>}.
    The first field is primary (stores docs/doc_id mapping). Returns the
    written fields manifest."""
    if not fields:
        raise ValueError("fields must name at least one indexed field")
    os.makedirs(index_dir, exist_ok=True)
    manifest: dict = {"fields": {}, "primary": next(iter(fields))}
    for i, (name, spec) in enumerate(fields.items()):
        sub = os.path.join(index_dir, "fields", name)
        m = build_index(
            input_path, sub,
            num_partitions=num_partitions, salt=salt,
            docid_mode=docid_mode,
            text_column=spec.get("column", "text"),
            analyzer=spec.get("analyzer", "standard"),
            store_positions=spec.get("positions", False),
            store_docs=(i == 0),
        )
        manifest["fields"][name] = {
            "column": spec.get("column", "text"),
            "analyzer": spec.get("analyzer", "standard"),
            "positions": spec.get("positions", False),
            "n_docs": m["n_docs"],
            "sum_dl": m["sum_dl"],
        }
        ns = {f["n_docs"] for f in manifest["fields"].values()}
        if len(ns) > 1:
            raise RuntimeError(
                f"field sub-indexes disagree on n_docs {ns}: the input "
                "changed between field passes — rebuild from a stable input")
    tmp = os.path.join(index_dir, FIELDS_FILENAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.rename(tmp, os.path.join(index_dir, FIELDS_FILENAME))
    return manifest


class MultiFieldSearcher:
    """Fielded query execution over the per-field sub-searchers. Each
    field scores with ITS OWN BM25 statistics (df, N, avgdl, norms from
    its sub-index — [U] lucene/core/.../search/similarities/
    BM25Similarity computes all of these per field); per-doc combination
    is float32-pinned:

      dismax: score = max_f s_f  (+ tie * sum of the others, folded
              float32((max64 + tie*rest64)) — DisjunctionMaxQuery)
      sum:    score = left-to-right float32 fold over fields in schema
              order (BooleanQuery SHOULD sum, the FIXTURES §3 fold)
    """

    def __init__(self, index_dir: str, similarity: str = "bm25",
                 warm: bool = False):
        with open(os.path.join(index_dir, FIELDS_FILENAME)) as fh:
            self.manifest = json.load(fh)
        self.index_dir = index_dir
        self.searchers = {
            name: IndexSearcher(os.path.join(index_dir, "fields", name),
                                similarity=similarity, warm=warm)
            for name in self.manifest["fields"]
        }
        self.primary = self.searchers[self.manifest["primary"]]
        self.n_docs = self.primary.n_docs

    def _field_scores(self, field_terms: dict) -> tuple[np.ndarray, list[np.ndarray]]:
        """Exhaustive per-field OR scores -> (union docids asc, one
        aligned float32 vector per field in schema order; non-matching
        docs hold exact 0.0f)."""
        per_field: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for name, terms in field_terms.items():
            if name not in self.searchers:
                raise ValueError(f"unknown field {name!r}; have "
                                 f"{sorted(self.searchers)}")
            s = self.searchers[name]
            d, sc = s.search(terms, k=max(1, s.n_docs), mode="or")
            per_field[name] = (d, sc)
        if not per_field:
            return np.empty(0, np.int64), []
        union = np.unique(np.concatenate(
            [d for d, _ in per_field.values()] or [np.empty(0, np.int64)]))
        vecs = []
        for name in self.manifest["fields"]:
            if name not in per_field:
                continue
            d, sc = per_field[name]
            v = np.zeros(len(union), np.float32)
            v[np.searchsorted(union, d)] = sc
            vecs.append(v)
        return union, vecs

    def search_dismax(self, field_terms: dict, k: int = 10,
                      tie_breaker: float = 0.0,
                      boosts: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
        """DisMax across fields: per-doc max of the per-field scores
        (+ tie_breaker * the rest). ``boosts`` maps field -> qf boost
        ([U] solr/core/.../search/ExtendedDismaxQParser.java qf
        "title^2 body"): each field's score vector is scaled
        float32(boost64 * score64) BEFORE the max — Lucene folds query
        boosts into the term weight; scaling the fold is bit-identical
        here because each field's fold is a single f32 value per doc.
        -> (docids, float32 scores), rank order (score desc, docid asc)."""
        from lucene_solr_ray.oracle import topk_order

        union, vecs = self._field_scores(field_terms)
        if not len(union):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        if boosts:
            names = [n for n in self.manifest["fields"] if n in field_terms]
            vecs = [
                (np.float64(boosts.get(n, 1.0)) * v.astype(np.float64)
                 ).astype(np.float32) if boosts.get(n, 1.0) != 1.0 else v
                for n, v in zip(names, vecs)
            ]
        best = vecs[0]
        for v in vecs[1:]:
            best = np.maximum(best, v)  # f32 max: exact, no rounding
        if tie_breaker != 0.0:
            total = np.zeros(len(union), np.float64)
            for v in vecs:
                total += v.astype(np.float64)
            score = (best.astype(np.float64)
                     + tie_breaker * (total - best.astype(np.float64))
                     ).astype(np.float32)
        else:
            score = best
        top = topk_order(union, score, k)
        return union[top], score[top]

    def search_parsed(self, q: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """``title:merge OR body:stream`` -> per-field BM25 SHOULD sum
        (clauses grouped per field, fields folded in schema order — the
        pinned accumulation order for the fielded BooleanQuery)."""
        return self.search_sum(parse_fielded_query(q, self.searchers), k=k)

    def search_sum(self, field_terms: dict, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """BooleanQuery SHOULD across fields: left-to-right float32 fold
        of the per-field scores in schema order."""
        from lucene_solr_ray.oracle import topk_order

        union, vecs = self._field_scores(field_terms)
        if not len(union):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        acc = vecs[0]
        for v in vecs[1:]:
            acc = (acc.astype(np.float64) + v.astype(np.float64)).astype(np.float32)
        top = topk_order(union, acc, k)
        return union[top], acc[top]


def multifield_docid_to_doc_id(index_dir: str) -> np.ndarray:
    """docid -> doc_id mapping from the PRIMARY field's stored docs."""
    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id

    with open(os.path.join(index_dir, FIELDS_FILENAME)) as fh:
        manifest = json.load(fh)
    return _docid_to_doc_id(os.path.join(index_dir, "fields", manifest["primary"]))


def parse_fielded_query(q: str, known_fields) -> dict:
    """Fielded query-string syntax ([U] lucene/queryparser/.../classic/
    QueryParser.java field:term atoms): whitespace-separated
    ``field:term`` clauses, optional OR connectors (BooleanQuery SHOULD
    — the default operator), grouped per field. Unknown fields and
    bare terms fail loudly (no catalog guessing)."""
    out: dict = {}
    for tok in q.split():
        if tok.upper() == "OR":
            continue
        if ":" not in tok:
            raise ValueError(f"bare term {tok!r}: fielded syntax requires field:term")
        field, term = tok.split(":", 1)
        if field not in known_fields:
            raise ValueError(f"unknown field {field!r}; have {sorted(known_fields)}")
        out.setdefault(field, []).append(term)
    return out


def multifield_delete_docs(index_dir: str, docids) -> dict:
    """Delete docs from EVERY field sub-index ([U] lucene/core/.../index/
    IndexWriter.deleteDocuments applies to the whole document, not one
    field): docids are shared across fields by construction, so the same
    tombstone set commits to each sub-manifest. Returns {field: delete
    manifest}. A searcher opened after this sees the doc in NO field."""
    from lucene_solr_ray.pipelines.deletes import delete_docs

    with open(os.path.join(index_dir, FIELDS_FILENAME)) as fh:
        manifest = json.load(fh)
    return {
        name: delete_docs(os.path.join(index_dir, "fields", name), docids)
        for name in manifest["fields"]
    }


def multifield_merge_round(index_dir: str, **kwargs) -> dict:
    """One TieredMergePolicy round per field sub-index (each field's
    segment geometry is independent, exactly per-field Lucene codecs).
    Returns {field: merge result}."""
    from lucene_solr_ray.pipelines.merge import run_merge_round

    with open(os.path.join(index_dir, FIELDS_FILENAME)) as fh:
        manifest = json.load(fh)
    return {
        name: run_merge_round(os.path.join(index_dir, "fields", name), **kwargs)
        for name in manifest["fields"]
    }


def multifield_tlog_append(index_dir: str, table: pa.Table) -> int:
    """Append a micro-batch (rows carry every field's column) to the
    multifield index's SHARED log at the root — one durable log, N
    consumers ([U] solr/core/.../update/TransactionLog.java: the log is
    per core, fields fan out at apply time)."""
    from lucene_solr_ray.state.tlog import tlog_append

    return tlog_append(index_dir, table)


def multifield_soft_commit(index_dir: str) -> dict:
    """Fold pending log entries into EVERY field sub-index via
    build_index(append=True) with that field's column/analyzer/positions
    (docids align across fields: equal base offsets + the same
    deterministic conv-base assignment over the same batch).

    Consumption is marked PER FIELD (tlog/.consumed-upto-<field>) after
    that field's manifest commit, so a crash mid-way replays only the
    fields that had not committed — the same at-least-once window as the
    single-field tlog (a crash between one field's commit and its marker
    re-appends that field's batch; Solr dedups replays by doc version,
    we keep the window explicit). Returns {field: new n_docs}."""
    import json as _json

    import pyarrow.parquet as _pq
    import ray.data

    from lucene_solr_ray.state.tlog import tlog_dir

    with open(os.path.join(index_dir, FIELDS_FILENAME)) as fh:
        manifest = json.load(fh)
    td = tlog_dir(index_dir)
    out: dict = {}
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(td, "tlog-*.parquet")))
    primary = manifest["primary"]
    for name, spec in manifest["fields"].items():
        sub = os.path.join(index_dir, "fields", name)
        marker = os.path.join(td, f".consumed-upto-{name}")
        upto = -1
        if os.path.exists(marker):
            with open(marker) as fh:
                upto = int(_json.load(fh)["upto"])
        pend = [(int(os.path.basename(p)[5:13]), p) for p in files
                if int(os.path.basename(p)[5:13]) > upto]
        if not pend:
            from lucene_solr_ray.state.manifest import load_manifest

            out[name] = load_manifest(sub)["n_docs"]
            continue
        batch = pa.concat_tables([_pq.read_table(p) for _, p in pend],
                                 promote_options="permissive")
        from lucene_solr_ray.state.manifest import load_manifest

        sub_man = load_manifest(sub)
        m = build_index(
            ray.data.from_arrow(batch), sub,
            num_partitions=sub_man["num_partitions"], salt=sub_man["salt"],
            codec_name=sub_man["codec"],
            text_column=spec.get("column", "text"),
            analyzer=spec.get("analyzer", "standard"),
            store_positions=spec.get("positions", False),
            store_docs=(name == primary),
            append=True,
        )
        tmp = marker + f".tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            _json.dump({"upto": max(s for s, _ in pend),
                        "generation": m["generation"]}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, marker)
        out[name] = m["n_docs"]
    ns = set(out.values())
    if len(ns) > 1:
        raise RuntimeError(
            f"field sub-indexes disagree on n_docs after soft commit {out}: "
            "a previous partial commit left fields behind — re-run "
            "multifield_soft_commit to let the per-field markers catch up")
    return out
