"""Solr streaming-expression LANGUAGE: parse the text form
(``rollup(search(documents, q="..", fl=".."), over="..", count(*))``)
and build the equivalent Ray Data pipeline through a function registry.

Reference shapes (upstream paths; the local checkout is a tombstone):
- [U] solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
  StreamExpressionParser.java — the nested-call grammar: an expression
  is ``name(arg, key=value, nested(...))``; values are bare words or
  double-quoted strings.
- [U] solr/solrj/.../io/stream/StreamFactory.java — the name ->
  stream-class registry this module's STREAM_FUNCTIONS mirrors.
- [U] solr/solrj/.../io/stream/{CloudSolrStream,SelectStream,
  RollupStream,SortStream,RankStream,UniqueStream,HavingStream}.java
- [U] solr/solrj/.../io/stream/metrics/{CountMetric,SumMetric,
  MinMetric,MaxMetric}.java

The typed/fixed relational pipelines live in functions/relational.py;
this module is the TEXT surface over the same algebra, executing against
the documents index (search() = the lucene QParser via
IndexSearcher.search_parsed, match set filtered in the data plane with a
broadcast sorted-docid membership stage — never a driver row loop).

Metric output names are deterministic: ``count(*)`` -> ``count``,
``sum(f)`` -> ``sum_f``, ``min(f)`` -> ``min_f``, ``max(f)`` -> ``max_f``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

from lucene_solr_ray.io_utils import join_partitions

# ---------------------------------------------------------------------------
# Parser ([U] .../io/stream/expr/StreamExpressionParser.java)
# ---------------------------------------------------------------------------


@dataclass
class Node:
    name: str
    args: list = field(default_factory=list)      # positional: str | Node
    kwargs: dict = field(default_factory=dict)    # named: str | Node


def parse_expr(s: str) -> Node:
    """Parse one streaming expression; fails loudly on trailing junk."""
    node, i = _parse_call(s, _skip_ws(s, 0))
    i = _skip_ws(s, i)
    if i != len(s):
        raise ValueError(f"trailing characters at {i}: {s[i:]!r}")
    return node


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _parse_call(s: str, i: int) -> tuple[Node, int]:
    j = i
    while j < len(s) and (s[j].isalnum() or s[j] in "_."):
        j += 1
    name = s[i:j]
    if not name:
        raise ValueError(f"expected function name at {i}: {s[i:i+20]!r}")
    j = _skip_ws(s, j)
    if j >= len(s) or s[j] != "(":
        raise ValueError(f"expected '(' after {name!r} at {j}")
    node = Node(name)
    j = _skip_ws(s, j + 1)
    while j < len(s) and s[j] != ")":
        key, val, j = _parse_arg(s, j)
        if key is None:
            node.args.append(val)
        else:
            node.kwargs[key] = val
        j = _skip_ws(s, j)
        if j < len(s) and s[j] == ",":
            j = _skip_ws(s, j + 1)
    if j >= len(s):
        raise ValueError(f"unterminated call {name!r}")
    return node, j + 1


def _parse_arg(s: str, i: int) -> tuple[str | None, object, int]:
    # key=value? scan for '=' before any of , ( ) "
    j = i
    while j < len(s) and s[j] not in '=,()"':
        j += 1
    if j < len(s) and s[j] == "=":
        key = s[i:j].strip()
        val, j2 = _parse_value(s, _skip_ws(s, j + 1))
        return key, val, j2
    val, j2 = _parse_value(s, i)
    return None, val, j2


def _parse_value(s: str, i: int) -> tuple[object, int]:
    if s[i] == '"':
        j = s.index('"', i + 1)
        return s[i + 1 : j], j + 1
    # nested call iff an identifier is directly followed by '('
    j = i
    while j < len(s) and (s[j].isalnum() or s[j] in "_."):
        j += 1
    if j < len(s) and s[_skip_ws(s, j)] == "(" and j > i:
        return _parse_call_with_alias(s, i)
    # bare token (number, *, identifier)
    j = i
    while j < len(s) and s[j] not in ",()":
        j += 1
    tok = s[i:j].strip()
    if not tok:
        raise ValueError(f"empty value at {i}")
    return tok, j


def _parse_call_with_alias(s: str, i: int) -> tuple[Node, int]:
    """A nested call optionally followed by ``as name`` (the SelectStream
    evaluator-output syntax: ``select(..., add(a, b) as x)``)."""
    node, j = _parse_call(s, i)
    k = _skip_ws(s, j)
    if s[k : k + 3] == "as " or s[k : k + 3] == "as\t":
        k = _skip_ws(s, k + 2)
        m = k
        while m < len(s) and (s[m].isalnum() or s[m] == "_"):
            m += 1
        if m > k:
            return Node("__as", [node, s[k:m]]), m
    return node, j


# ---------------------------------------------------------------------------
# Stream builders ([U] .../io/stream/StreamFactory.java registry)
# ---------------------------------------------------------------------------


def _build_search(node: Node, ctx: dict) -> ray.data.Dataset:
    """search(collection, q="...", fl="a,b", sort="f asc")
    ([U] .../io/stream/CloudSolrStream.java): lucene QParser match set,
    fl projection restricted in the data plane (solrapi.restricted_docs:
    match-all ships nothing, medium sets broadcast, huge sets hash-join)."""
    from lucene_solr_ray.functions.fulltext import docs_index
    from lucene_solr_ray.functions.solrapi import restricted_docs
    from lucene_solr_ray.pipelines.search import IndexSearcher

    if not node.args or node.args[0] != "documents":
        raise ValueError("search(): first arg must be the collection 'documents'")
    q = node.kwargs.get("q", "*:*")
    fl = [f.strip() for f in node.kwargs.get("fl", "doc_id").split(",") if f.strip()]
    index_dir = docs_index(ctx["sf_dir"])
    s = IndexSearcher(index_dir)
    if q.strip() in ("", "*:*"):
        docids, _ = s.match_all(k=max(1, s.n_docs))
    else:
        docids, _ = s.search_parsed(q, k=max(1, s.n_docs))
    ids = np.sort(np.asarray(docids, dtype=np.int64))
    ds = restricted_docs(index_dir, ids, fl, match_all=len(ids) == s.n_docs)
    ds = ds.map_batches(lambda t: t.select(fl), batch_format="pyarrow",
                        zero_copy_batch=True)
    if "sort" in node.kwargs:
        cols, desc = _parse_sort(node.kwargs["sort"])
        ds = ds.sort(cols, descending=desc)
    return ds


_EVALUATORS = ("add", "sub", "mult", "div", "if", "gt", "gte", "lt",
               "lte", "eq", "and", "or", "not")


def _eval_evaluator(n, t: pa.Table) -> np.ndarray:
    """Solr stream evaluators ([U] solr/solrj/.../io/eval/
    {Add,Subtract,Multiply,Divide,If,GreaterThan,...}Evaluator.java) over
    one Arrow batch — exact int64 arithmetic (div truncates toward zero,
    DuckDB's // semantics), booleans as 1/0."""
    if isinstance(n, str):
        if n.lstrip("-").isdigit():
            return np.int64(int(n))
        col = t.column(n)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return np.asarray(col.to_pylist(), dtype=object)
        return col.to_numpy().astype(np.int64)
    args = [_eval_evaluator(a, t) for a in n.args]
    if n.name == "concat":
        # string evaluators ([U] io/eval/ConcatOperation.java /
        # UpperEvaluator): operate on stringified operands
        out = np.asarray([""] * len(t), dtype=object)
        for a in args:
            out = np.asarray([x + str(y) for x, y in
                              zip(out, np.broadcast_to(a, (len(t),)))],
                             dtype=object)
        return out
    if n.name == "upper":
        return np.asarray([str(x).upper() for x in
                           np.broadcast_to(args[0], (len(t),))], dtype=object)
    if n.name == "add":
        return args[0] + args[1]
    if n.name == "sub":
        return args[0] - args[1]
    if n.name == "mult":
        return args[0] * args[1]
    if n.name == "div":
        q = np.abs(args[0]) // np.abs(args[1])
        return np.where((args[0] < 0) != (args[1] < 0), -q, q)
    if n.name == "if":
        return np.where(args[0] != 0, args[1], args[2])
    if n.name == "gt":
        return (args[0] > args[1]).astype(np.int64)
    if n.name == "gte":
        return (args[0] >= args[1]).astype(np.int64)
    if n.name == "lt":
        return (args[0] < args[1]).astype(np.int64)
    if n.name == "lte":
        return (args[0] <= args[1]).astype(np.int64)
    if n.name == "eq":
        return (args[0] == args[1]).astype(np.int64)
    if n.name == "and":
        return ((args[0] != 0) & (args[1] != 0)).astype(np.int64)
    if n.name == "or":
        return ((args[0] != 0) | (args[1] != 0)).astype(np.int64)
    if n.name == "not":
        return (args[0] == 0).astype(np.int64)
    raise ValueError(f"unknown evaluator {n.name!r} (have {_EVALUATORS})")


def _build_select(node: Node, ctx: dict) -> ray.data.Dataset:
    """select(stream, "a as x", "b", add(a, 5) as y) ([U]
    SelectStream.java): projection + rename, plus computed outputs via
    the evaluator tree (add/sub/mult/div/if/gt/.../not over fields and
    integer literals)."""
    ds = _build(node.args[0], ctx)
    spec = []  # (kind, src, dst): kind 'col' | 'eval'
    for a in node.args[1:]:
        if isinstance(a, Node):
            if a.name != "__as":
                raise ValueError(
                    f"select(): evaluator {a.name!r} needs an 'as name' alias")
            spec.append(("eval", a.args[0], a.args[1]))
        else:
            parts = a.split()
            if len(parts) == 3 and parts[1] == "as":
                spec.append(("col", parts[0], parts[2]))
            elif len(parts) == 1:
                spec.append(("col", parts[0], parts[0]))
            else:
                raise ValueError(f"select(): bad field spec {a!r}")

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for kind, src, dst in spec:
            if kind == "col":
                cols[dst] = t.column(src)
            else:
                v = _eval_evaluator(src, t)
                if np.ndim(v) == 0:  # literal-only tree
                    v = np.full(t.num_rows, v, dtype=np.int64)
                if v.dtype == object:  # string evaluator output
                    cols[dst] = pa.array([str(x) for x in v], pa.string())
                else:
                    cols[dst] = pa.array(v, pa.int64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _metric_plan(metrics: list[Node]) -> list[tuple[str, str, str]]:
    """-> (kind, column, output_name) per metric node."""
    plan = []
    for m in metrics:
        if not isinstance(m, Node):
            raise ValueError(f"expected a metric call, got {m!r}")
        if m.name == "count":
            plan.append(("count", "*", "count"))
        elif m.name in ("sum", "min", "max"):
            (col,) = m.args
            plan.append((m.name, col, f"{m.name}_{col}"))
        else:
            raise ValueError(f"unknown metric {m.name!r} (have count/sum/min/max)")
    return plan


def _build_rollup(node: Node, ctx: dict) -> ray.data.Dataset:
    """rollup(stream, over="a,b", count(*), sum(f), ...)
    ([U] RollupStream.java + metrics/): map-side partial aggregation
    (per-batch Arrow groupby) before the small key shuffle — the
    relational.rollup_agg combine shape."""
    ds = _build(node.args[0], ctx)
    over = [f.strip() for f in node.kwargs["over"].split(",") if f.strip()]
    plan = _metric_plan(node.args[1:])

    aggs = [("__one", "sum")] + [(f"__{k}_{c}", k) for k, c, _ in plan if k != "count"]

    def partial(t: pa.Table) -> pa.Table:
        cols = {g: t.column(g) for g in over}
        cols["__one"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        for k, c, _ in plan:
            if k != "count":
                cols[f"__{k}_{c}"] = t.column(c)
        pt = pa.table(cols)
        out = pa.TableGroupBy(pt, over).aggregate([(c, k) for c, k in aggs])
        return out.rename_columns(over + [c for c, _ in aggs])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    ray_aggs = []
    for k, c, name in plan:
        if k == "count":
            ray_aggs.append(Sum("__one", alias_name=name))
        elif k == "sum":
            ray_aggs.append(Sum(f"__sum_{c}", alias_name=name))
        elif k == "min":
            ray_aggs.append(Min(f"__min_{c}", alias_name=name))
        elif k == "max":
            ray_aggs.append(Max(f"__max_{c}", alias_name=name))
    return partials.groupby(over).aggregate(*ray_aggs)


def _parse_sort(spec: str) -> tuple[list[str], list[bool]]:
    cols, desc = [], []
    for part in spec.split(","):
        toks = part.split()
        if not toks:
            continue
        cols.append(toks[0])
        d = toks[1].lower() if len(toks) > 1 else "asc"
        if d not in ("asc", "desc"):
            raise ValueError(f"bad sort direction {d!r}")
        desc.append(d == "desc")
    return cols, desc


def _build_sort(node: Node, ctx: dict) -> ray.data.Dataset:
    """sort(stream, by="f desc, g asc") ([U] SortStream.java)."""
    ds = _build(node.args[0], ctx)
    cols, desc = _parse_sort(node.kwargs["by"])
    return ds.sort(cols, descending=desc)


def _build_top(node: Node, ctx: dict) -> ray.data.Dataset:
    """top(stream, n=K, sort="...") ([U] RankStream.java): distributed
    sort + limit."""
    ds = _build(node.args[0], ctx)
    cols, desc = _parse_sort(node.kwargs["sort"])
    return ds.sort(cols, descending=desc).limit(int(node.kwargs["n"]))


def _build_unique(node: Node, ctx: dict) -> ray.data.Dataset:
    """unique(stream, over="f,g") ([U] UniqueStream.java): distinct key
    tuples — per-batch Arrow distinct (map-side combine) before the
    hash-partition dedup."""
    ds = _build(node.args[0], ctx)
    over = [f.strip() for f in node.kwargs["over"].split(",") if f.strip()]

    def keys_only(t: pa.Table) -> pa.Table:
        return t.select(over).group_by(over).aggregate([])

    partial = ds.map_batches(keys_only, batch_format="pyarrow")
    return partial.groupby(over).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


_HAVING_OPS = {
    "gt": lambda c, v: lambda t: pa.compute.greater(t.column(c), pa.scalar(v)),
    "lt": lambda c, v: lambda t: pa.compute.less(t.column(c), pa.scalar(v)),
    "eq": lambda c, v: lambda t: pa.compute.equal(t.column(c), pa.scalar(v)),
}


def _build_having(node: Node, ctx: dict) -> ray.data.Dataset:
    """having(stream, gt(field, value)) ([U] HavingStream.java)."""
    ds = _build(node.args[0], ctx)
    cond = node.args[1]
    if not isinstance(cond, Node) or cond.name not in _HAVING_OPS:
        raise ValueError(f"having(): unknown condition {cond!r} (have gt/lt/eq)")
    col, raw = cond.args
    try:
        val: object = int(raw)
    except ValueError:
        val = raw
    pred = _HAVING_OPS[cond.name](col, val)
    return ds.map_batches(lambda t: t.filter(pred(t)), batch_format="pyarrow",
                          zero_copy_batch=True)


def _on_keys(node: Node) -> list[str]:
    return [f.strip() for f in node.kwargs["on"].split(",") if f.strip()]


def _build_innerjoin(node: Node, ctx: dict) -> ray.data.Dataset:
    """innerJoin(left, right, on="key") ([U] InnerJoinStream.java;
    hashJoin is the same plan here — Dataset.join IS a partitioned hash
    join). Non-key columns must not clash (Solr's contract: the worker
    merges tuples; we fail loudly instead of silently overwriting)."""
    left = _build(node.args[0], ctx)
    right = _build(node.args[1], ctx)
    on = _on_keys(node)
    return left.join(right, "inner", num_partitions=join_partitions(), on=tuple(on))


def _build_leftouterjoin(node: Node, ctx: dict) -> ray.data.Dataset:
    """leftOuterJoin(left, right, on="key") ([U] LeftOuterJoinStream.java)."""
    left = _build(node.args[0], ctx)
    right = _build(node.args[1], ctx)
    on = _on_keys(node)
    return left.join(right, "left_outer", num_partitions=join_partitions(), on=tuple(on))


def _keys_with_marker(ds: ray.data.Dataset, on: list[str]) -> ray.data.Dataset:
    """Distinct key tuples of ``ds`` + a marker column (the probe side of
    intersect/complement semi-joins)."""
    def keys_only(t: pa.Table) -> pa.Table:
        k = t.select(on).group_by(on).aggregate([])
        return k.append_column("__m", pa.array(np.ones(k.num_rows, dtype=np.int64)))

    partial = ds.map_batches(keys_only, batch_format="pyarrow")
    return partial.groupby(on).map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")


def _build_intersect(node: Node, ctx: dict) -> ray.data.Dataset:
    """intersect(left, right, on="key") ([U] IntersectStream.java): left
    rows whose key appears in right (semi-join: right reduced to distinct
    keys before the exchange)."""
    left = _build(node.args[0], ctx)
    on = _on_keys(node)
    marked = _keys_with_marker(_build(node.args[1], ctx), on)

    def strip(t: pa.Table) -> pa.Table:
        keep = [c for c in t.column_names if c != "__m"]
        return t.select(keep)

    return left.join(marked, "inner", num_partitions=join_partitions(), on=tuple(on)).map_batches(
        strip, batch_format="pyarrow", zero_copy_batch=True)


def _build_complement(node: Node, ctx: dict) -> ray.data.Dataset:
    """complement(left, right, on="key") ([U] ComplementStream.java):
    left rows whose key does NOT appear in right (anti-join via
    left-outer + null-marker filter)."""
    left = _build(node.args[0], ctx)
    on = _on_keys(node)
    marked = _keys_with_marker(_build(node.args[1], ctx), on)

    def anti(t: pa.Table) -> pa.Table:
        m = pa.compute.is_null(t.column("__m"))
        keep = [c for c in t.column_names if c != "__m"]
        return t.filter(m).select(keep)

    return left.join(marked, "left_outer", num_partitions=join_partitions(), on=tuple(on)).map_batches(
        anti, batch_format="pyarrow")


def _rollup_agg(ds: ray.data.Dataset, over: list[str], plan) -> ray.data.Dataset:
    """Shared map-side-partial + small-key-shuffle aggregation core used
    by rollup() and facet() (the RollupStream combine shape)."""
    aggs = [("__one", "sum")] + [(f"__{k}_{c}", k) for k, c, _ in plan if k != "count"]

    def partial(t: pa.Table) -> pa.Table:
        cols = {g: t.column(g) for g in over}
        cols["__one"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        for k, c, _ in plan:
            if k != "count":
                cols[f"__{k}_{c}"] = t.column(c)
        pt = pa.table(cols)
        out = pa.TableGroupBy(pt, over).aggregate([(c, k) for c, k in aggs])
        return out.rename_columns(over + [c for c, _ in aggs])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    ray_aggs = []
    for k, c, name in plan:
        if k == "count":
            ray_aggs.append(Sum("__one", alias_name=name))
        elif k == "sum":
            ray_aggs.append(Sum(f"__sum_{c}", alias_name=name))
        elif k == "min":
            ray_aggs.append(Min(f"__min_{c}", alias_name=name))
        elif k == "max":
            ray_aggs.append(Max(f"__max_{c}", alias_name=name))
    return partials.groupby(over).aggregate(*ray_aggs)


def _build_facet(node: Node, ctx: dict) -> ray.data.Dataset:
    """facet(documents, q="...", buckets="lang", bucketSorts="count desc",
    bucketSizeLimit=N, count(*), sum(f), ...) ([U] FacetStream.java):
    JSON-facet pushdown — the match set restricts a docvalues-only read
    (corpus text untouched), then the shared map-side-partial rollup."""
    metrics = [a for a in node.args[1:] if isinstance(a, Node)]
    plan = _metric_plan(metrics)
    buckets = [f.strip() for f in node.kwargs["buckets"].split(",") if f.strip()]
    fl = sorted(set(buckets) | {c for _, c, _ in plan if c != "*"})
    search_node = Node("search", [node.args[0]],
                       {"q": node.kwargs.get("q", "*:*"), "fl": ",".join(fl)})
    ds = _rollup_agg(_build_search(search_node, ctx), buckets, plan)
    if "bucketSorts" in node.kwargs:
        cols, desc = _parse_sort(node.kwargs["bucketSorts"])
        ds = ds.sort(cols, descending=desc)
    if "bucketSizeLimit" in node.kwargs:
        ds = ds.limit(int(node.kwargs["bucketSizeLimit"]))
    return ds


def _build_stats(node: Node, ctx: dict) -> ray.data.Dataset:
    """stats(documents, q="...", count(*), sum(f), ...) ([U]
    StatsStream.java): global metrics — per-batch partials combined to a
    single output row (never a corpus materialization)."""
    metrics = [a for a in node.args[1:] if isinstance(a, Node)]
    plan = _metric_plan(metrics)
    fl = sorted({c for _, c, _ in plan if c != "*"} or {"doc_id"})
    search_node = Node("search", [node.args[0]],
                       {"q": node.kwargs.get("q", "*:*"), "fl": ",".join(fl)})
    ds = _build_search(search_node, ctx)
    ray_aggs = []
    for k, c, name in plan:
        if k == "count":
            ray_aggs.append(Sum("__one", alias_name=name))
        elif k == "sum":
            ray_aggs.append(Sum(c, alias_name=name))
        elif k == "min":
            ray_aggs.append(Min(c, alias_name=name))
        elif k == "max":
            ray_aggs.append(Max(c, alias_name=name))
    ds = ds.map_batches(
        lambda t: t.append_column("__one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    row = ds.aggregate(*ray_aggs)
    return ray.data.from_arrow(pa.table(
        {name: pa.array([row[name]], pa.int64()) for _, _, name in plan}))


def _build_fetch(node: Node, ctx: dict) -> ray.data.Dataset:
    """fetch(documents, stream, on="doc_id", fl="a,b") ([U]
    FetchStream.java): enrich each stream tuple with extra stored fields
    looked up by key. The stream side is output-sized (Solr fetches in
    batchSize pages); the lookup is a key-pruned docvalues read mapped in
    via searchsorted (the broadcast-enrich convention) — the corpus never
    ships."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from lucene_solr_ray.functions.fulltext import docs_index

    if node.args[0] != "documents":
        raise ValueError("fetch(): first arg must be the collection 'documents'")
    ds = _build(node.args[1], ctx)
    (on,) = _on_keys(node)
    fl = [f.strip() for f in node.kwargs["fl"].split(",") if f.strip()]
    stream_tbl = pa.concat_tables(
        [b for b in ds.map_batches(lambda t: t, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")])
    keys = stream_tbl.column(on).to_numpy()
    docs_dir = os.path.join(docs_index(ctx["sf_dir"]), "docs")
    lk = pads.dataset(docs_dir, format="parquet").to_table(
        columns=[on] + fl, filter=pc.field(on).isin(pa.array(np.unique(keys))))
    lkk = lk.column(on).to_numpy()
    order = np.argsort(lkk, kind="stable")
    pos = order[np.searchsorted(lkk[order], keys)]
    cols = {c: stream_tbl.column(c) for c in stream_tbl.column_names}
    for f in fl:
        cols[f] = lk.column(f).take(pa.array(pos, pa.int64()))
    return ray.data.from_arrow(pa.table(cols))


def _build_merge(node: Node, ctx: dict) -> ray.data.Dataset:
    """merge(streamA, streamB, on="f asc") ([U] MergeStream.java): union
    of sorted streams, re-established as one distributed sort (equal
    output; the k-way heap is a single-node detail the shuffle replaces)."""
    a = _build(node.args[0], ctx)
    b = _build(node.args[1], ctx)
    cols, desc = _parse_sort(node.kwargs["on"])
    return a.union(b).sort(cols, descending=desc)


def _build_timeseries(node: Node, ctx: dict) -> ray.data.Dataset:
    """timeseries(documents, q="...", field="ts", gap="+60SECONDS",
    count(*), sum(f)) ([U] solr/solrj/.../io/stream/TimeSeriesStream.java):
    fixed-gap time buckets with rollup metrics. Buckets are exact int64
    microseconds (ts floored to the gap); map-side per-bucket partials
    via the shared rollup combine, bucket-count-sized exchange."""
    import re as _re

    metrics = [a for a in node.args[1:] if isinstance(a, Node)]
    plan = _metric_plan(metrics)
    gap_str = node.kwargs.get("gap", "+60SECONDS")
    m = _re.fullmatch(r"\+(\d+)(SECOND|SECONDS|MINUTE|MINUTES|HOUR|HOURS|DAY|DAYS)",
                      gap_str.upper())
    if not m:
        raise ValueError(f"timeseries(): bad gap {gap_str!r}")
    mult = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}[
        m.group(2).rstrip("S")]
    gap_us = int(m.group(1)) * mult * 1_000_000
    field = node.kwargs.get("field", "ts")
    fl = sorted({c for _, c, _ in plan if c != "*"} | {field})
    search_node = Node("search", [node.args[0]],
                       {"q": node.kwargs.get("q", "*:*"), "fl": ",".join(fl)})
    ds = _build(search_node, ctx)

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t.column(field), pa.int64()).to_numpy()
        cols = {"bucket_us": pa.array(us // gap_us * gap_us, pa.int64())}
        for c in {c for _, c, _ in plan if c != "*"}:
            cols[c] = t.column(c)
        return pa.table(cols)

    return _rollup_agg(ds.map_batches(bucketize, batch_format="pyarrow"),
                       ["bucket_us"], plan).sort("bucket_us")


def _build_random(node: Node, ctx: dict) -> ray.data.Dataset:
    """random(documents, q="...", pct=10) ([U] solr/core/.../search/
    RandomStream.java) made reproducible: the multiplicative-hash
    doc_id sample (exact integer arithmetic, identical in SQL) the
    typed deterministic_sample entry uses — stateless, zero shuffle."""
    pct = int(node.kwargs.get("pct", 10))
    fl = node.kwargs.get("fl", "doc_id")
    search_node = Node("search", [node.args[0]],
                       {"q": node.kwargs.get("q", "*:*"), "fl": fl})
    ds = _build(search_node, ctx)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = (ids * 2654435761) % 4294967296 < (4294967296 * pct) // 100
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's BIGINT //
    semantics, so engine and oracle agree on negative numerators."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _int_sums(ds: ray.data.Dataset, cols: list[str]) -> dict:
    """One aggregate pass -> exact int64 partial sums/extrema the math
    streams below derive everything from (driver work is O(1))."""
    ds = ds.map_batches(
        lambda t: t.append_column("__one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    aggs = [Sum("__one", alias_name="n")]
    for c in cols:
        aggs += [Sum(c, alias_name=f"s_{c}"), Min(c, alias_name=f"min_{c}"),
                 Max(c, alias_name=f"max_{c}")]
    return ds.aggregate(*aggs)


def _build_describe(node: Node, ctx: dict) -> ray.data.Dataset:
    """describe(stream, col="f") ([U] solr/solrj/.../io/eval/
    DescribeEvaluator.java over col()): one-row summary of a numeric
    column — N, min, max, sum exact ints; mean/stddev as micro-ints from
    exact integer sums (mean = s*1e6 // n; sample variance numerator
    n*sxx - s^2 exact, one pinned float64 sqrt+division shared with the
    SQL oracle). Map-side partials only; nothing corpus-sized moves."""
    col = node.kwargs["col"]
    ds = _build(node.args[0], ctx)

    def sq(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy().astype(np.int64)
        return pa.table({col: x, "__sq": x * x})

    row = _int_sums(ds.map_batches(sq, batch_format="pyarrow"), [col, "__sq"])
    n = int(row["n"] or 0)
    if n == 0:  # empty match set: all-zero summary instead of int(None)
        zero = pa.array([0], pa.int64())
        return ray.data.from_arrow(pa.table({
            "n": zero, "min_v": zero, "max_v": zero, "sum_v": zero,
            "mean_micro": zero, "stddev_micro": zero,
        }))
    s, sxx = int(row[f"s_{col}"]), int(row["s___sq"])
    var_num = n * sxx - s * s  # exact
    # sample stddev divides by n*(n-1): undefined below two rows —
    # emit 0 instead of 0/0 -> NaN -> int(floor(nan)) crash (ADVICE r3)
    if n < 2:
        stddev_micro = 0
    else:
        stddev_micro = int(np.floor(1e6 * np.sqrt(np.float64(var_num) / np.float64(n * (n - 1))) + 0.5))
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "min_v": pa.array([int(row[f"min_{col}"])], pa.int64()),
        "max_v": pa.array([int(row[f"max_{col}"])], pa.int64()),
        "sum_v": pa.array([s], pa.int64()),
        "mean_micro": pa.array([(s * 10**6) // n], pa.int64()),
        "stddev_micro": pa.array([stddev_micro], pa.int64()),
    }))


def _build_hist(node: Node, ctx: dict) -> ray.data.Dataset:
    """hist(stream, col="f", bins=N) ([U] solr/solrj/.../io/eval/
    HistogramEvaluator.java): equal-width bins over [min, max] —
    bin(x) = (x - min) * bins // (max - min + 1), exact integer
    arithmetic end to end. Two passes: an O(1) min/max aggregate
    broadcast into a map-side per-bin partial count, then a bins-sized
    combine. Output: (bin, n, lo, hi) with lo/hi the observed extrema
    inside the bin."""
    from ray.data.aggregate import Count

    col = node.kwargs["col"]
    bins = int(node.kwargs.get("bins", 8))
    ds = _build(node.args[0], ctx)
    row = _int_sums(ds, [col])
    lo_v, hi_v = int(row[f"min_{col}"]), int(row[f"max_{col}"])
    span = hi_v - lo_v + 1

    def binify(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy().astype(np.int64)
        return pa.table({"bin": (x - lo_v) * bins // span, col: x})

    return (
        ds.map_batches(binify, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="n"), Min(col, alias_name="lo"),
                   Max(col, alias_name="hi"))
        .sort("bin")
    )


def _build_regress(node: Node, ctx: dict) -> ray.data.Dataset:
    """regress(stream, x="a", y="b") ([U] solr/solrj/.../io/eval/
    RegressionEvaluator.java, OLS): slope/intercept from EXACT integer
    sums — num = n*sxy - sx*sy, den = n*sxx - sx^2, slope_micro =
    trunc(num*1e6 / den) in arbitrary-precision ints (DuckDB HUGEINT on
    the oracle side), intercept_micro = trunc((sy*den - num*sx)*1e6 /
    (den*n)). No floats anywhere; one map-side partial pass."""
    xc, yc = node.kwargs["x"], node.kwargs["y"]
    ds = _build(node.args[0], ctx)

    def prods(t: pa.Table) -> pa.Table:
        x = t.column(xc).to_numpy().astype(np.int64)
        y = t.column(yc).to_numpy().astype(np.int64)
        return pa.table({xc: x, yc: y, "__xx": x * x, "__xy": x * y})

    row = _int_sums(ds.map_batches(prods, batch_format="pyarrow"),
                    [xc, yc, "__xx", "__xy"])
    n = int(row["n"])
    sx, sy = int(row[f"s_{xc}"]), int(row[f"s_{yc}"])
    sxx, sxy = int(row["s___xx"]), int(row["s___xy"])
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "slope_micro": pa.array([_tdiv(num * 10**6, den)], pa.int64()),
        "intercept_micro": pa.array([_tdiv((sy * den - num * sx) * 10**6, den * n)], pa.int64()),
    }))


def _build_corr(node: Node, ctx: dict) -> ray.data.Dataset:
    """corr(stream, x="a", y="b") ([U] solr/solrj/.../io/eval/
    CorrelationEvaluator.java, Pearson): all moments as EXACT int64
    map-side sums (n, sx, sy, sxx, syy, sxy), then ONE pinned float64
    formula shared verbatim with the SQL oracle —
    corr_micro = floor(num / sqrt(f64(d1)*f64(d2)) * 1e6 + 0.5) with
    num = n*sxy - sx*sy, d1 = n*sxx - sx^2, d2 = n*syy - sy^2."""
    import math

    xc, yc = node.kwargs["x"], node.kwargs["y"]
    ds = _build(node.args[0], ctx)

    def prods(t: pa.Table) -> pa.Table:
        x = t.column(xc).to_numpy().astype(np.int64)
        y = t.column(yc).to_numpy().astype(np.int64)
        return pa.table({xc: x, yc: y, "__xx": x * x, "__yy": y * y,
                         "__xy": x * y})

    row = _int_sums(ds.map_batches(prods, batch_format="pyarrow"),
                    [xc, yc, "__xx", "__yy", "__xy"])
    n = int(row["n"])
    sx, sy = int(row[f"s_{xc}"]), int(row[f"s_{yc}"])
    sxx, syy, sxy = int(row["s___xx"]), int(row["s___yy"]), int(row["s___xy"])
    num = n * sxy - sx * sy
    d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
    if n < 2 or d1 == 0 or d2 == 0:
        corr_micro = 0
    else:
        corr_micro = int(math.floor(
            float(num) / math.sqrt(float(d1) * float(d2)) * 1_000_000 + 0.5))
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "corr_micro": pa.array([corr_micro], pa.int64()),
    }))


def _series_pass(node: Node, ctx: dict):
    """Shared shape for the series evaluators (movingAvg/diff): the inner
    stream is bucket-count-sized by construction (a timeseries/rollup),
    so ONE ordered output-sized pass is the scale-right plan."""
    by = node.kwargs.get("by", "bucket_us")
    col = node.kwargs["col"]
    ds = _build(node.args[0], ctx)
    return ds, by, col


def _build_moving_avg(node: Node, ctx: dict) -> ray.data.Dataset:
    """movingAvg(series, col="count", window=w, by="bucket_us") ([U]
    solr/solrj/.../io/eval/MovingAverageEvaluator.java): trailing-window
    mean over the ordered series, emitted from the w-th point on.
    Exact ints: mean_micro = trunc(window_sum * 1e6 / w)."""
    ds, by, col = _series_pass(node, ctx)
    w = int(node.kwargs.get("window", 3))

    def roll(t: pa.Table) -> pa.Table:
        order = np.argsort(t.column(by).to_numpy(), kind="stable")
        keys = t.column(by).to_numpy()[order]
        v = t.column(col).to_numpy().astype(np.int64)[order]
        if len(v) < w:
            return pa.table({by: pa.array([], pa.int64()),
                             "moving_avg_micro": pa.array([], pa.int64())})
        csum = np.r_[0, np.cumsum(v)]
        wsum = csum[w:] - csum[:-w]
        micro = np.array([_tdiv(int(s) * 1_000_000, w) for s in wsum], np.int64)
        return pa.table({by: pa.array(keys[w - 1:], pa.int64()),
                         "moving_avg_micro": pa.array(micro, pa.int64())})

    return ds.repartition(1).map_batches(roll, batch_format="pyarrow")


def _build_diff(node: Node, ctx: dict) -> ray.data.Dataset:
    """diff(series, col=, by=) ([U] solr/solrj/.../io/eval/
    DifferenceEvaluator.java lag-1): first difference of the ordered
    series — exact int64 subtraction, emitted from the 2nd point on."""
    ds, by, col = _series_pass(node, ctx)

    def lag(t: pa.Table) -> pa.Table:
        order = np.argsort(t.column(by).to_numpy(), kind="stable")
        keys = t.column(by).to_numpy()[order]
        v = t.column(col).to_numpy().astype(np.int64)[order]
        return pa.table({by: pa.array(keys[1:], pa.int64()),
                         "delta": pa.array(np.diff(v), pa.int64())})

    return ds.repartition(1).map_batches(lag, batch_format="pyarrow")


def _logit_spec(node: Node):
    from lucene_solr_ray.functions.classify import LOGIT_TERMS

    feats = node.kwargs.get("features")
    terms = tuple(feats.split(",")) if feats else LOGIT_TERMS
    label = node.kwargs.get("q", "merge")
    iters = int(node.kwargs.get("iterations", 3))
    return terms, label, iters


def _build_train(node: Node, ctx: dict) -> ray.data.Dataset:
    """train(documents, q="label-term", features="a,b,...", iterations=k)
    ([U] solr/solrj/.../io/stream/TextLogitStream.java): distributed
    batch logistic regression; emits the final model as
    (feature, weight_micro) rows. Exact-int protocol in
    classify.text_logit_train."""
    from lucene_solr_ray.functions.classify import text_logit_train

    terms, label, iters = _logit_spec(node)
    return text_logit_train(ctx["sf_dir"], terms, label, iters)


def _build_classify(node: Node, ctx: dict) -> ray.data.Dataset:
    """classify(train(documents, ...)) ([U] solr/solrj/.../io/stream/
    ClassifyStream.java): scores every doc under the trained model in
    one streaming pass -> (doc_id, prob_micro, predicted)."""
    from lucene_solr_ray.functions.classify import text_logit_classify

    inner = node.args[0]
    spec_node = inner if isinstance(inner, Node) and inner.name == "train" else node
    terms, label, iters = _logit_spec(spec_node)
    return text_logit_classify(ctx["sf_dir"], terms, label, iters)


def _build_features(node: Node, ctx: dict) -> ray.data.Dataset:
    """features(documents, field="lang", label="en", k=N) ([U]
    solr/solrj/.../io/stream/FeaturesSelectionStream.java): top-k terms
    by information gain for the binary class — classify.features_select
    (exact-int scaled entropy)."""
    from lucene_solr_ray.functions.classify import features_select

    return ray.data.from_arrow(features_select(
        ctx["sf_dir"], label_lang=node.kwargs.get("label", "en"),
        k=int(node.kwargs.get("k", 12))))


def _build_knn(node: Node, ctx: dict) -> ray.data.Dataset:
    """knn(documents, id=N, k=K) ([U] solr/solrj/.../io/stream/
    KnnStream.java): text k-nearest-neighbors of one document — the
    MoreLikeThis mechanism (significant terms of the doc -> OR query ->
    top-k), reusing fulltext.more_like_this_topk."""
    from lucene_solr_ray.functions.fulltext import more_like_this_topk

    return ray.data.from_arrow(more_like_this_topk(
        ctx["sf_dir"], doc_id=int(node.kwargs.get("id", 0)),
        k=int(node.kwargs.get("k", 10))))


def _build_significant_terms(node: Node, ctx: dict) -> ray.data.Dataset:
    """significantTerms(documents) ([U] solr/solrj/.../io/stream/
    SignificantTermsStream.java) -> relational.significant_terms."""
    from lucene_solr_ray.functions.relational import significant_terms

    return significant_terms(ctx["sf_dir"])


def _build_nodes(node: Node, ctx: dict) -> ray.data.Dataset:
    """nodes(...) / gatherNodes(...) ([U] solr/solrj/.../io/graph/
    GatherNodesStream.java) TEXT-grammar form -> graph.gather_nodes."""
    from lucene_solr_ray.functions.graph import gather_nodes

    return gather_nodes(ctx["sf_dir"],
                        segment=node.kwargs.get("segment", "BUILDING"))


def _build_shortest_path(node: Node, ctx: dict) -> ray.data.Dataset:
    """shortestPath(collection, from=a, to=b) ([U] .../io/graph/
    ShortestPathStream.java) -> graph.shortest_path_pairs (multi-source
    distributed BFS)."""
    from lucene_solr_ray.functions.graph import shortest_path_pairs

    pairs = ((int(node.kwargs.get("from", 1)), int(node.kwargs.get("to", 7))),)
    tab = shortest_path_pairs(ctx["sf_dir"], pairs=pairs,
                              max_hops=int(node.kwargs.get("maxDepth", 4)))
    return tab if isinstance(tab, ray.data.Dataset) else ray.data.from_arrow(tab)


def _build_score_nodes(node: Node, ctx: dict) -> ray.data.Dataset:
    """scoreNodes(nodes(...)) ([U] .../io/graph/ScoreNodesStream.java)
    -> graph.score_nodes (tf-idf-style node relevance)."""
    from lucene_solr_ray.functions.graph import score_nodes

    inner = node.args[0] if node.args else None
    seg = (inner.kwargs.get("segment", "BUILDING")
           if isinstance(inner, Node) else
           node.kwargs.get("segment", "BUILDING"))
    out = score_nodes(ctx["sf_dir"], segment=seg)
    return out if isinstance(out, ray.data.Dataset) else ray.data.from_arrow(out)


def _flatten_fl(node) -> set:
    """Columns a stream subtree carries (best effort, for tie-breaks)."""
    cols = set()
    if isinstance(node, Node):
        fl = node.kwargs.get("fl")
        if fl:
            cols |= {c.strip() for c in fl.split(",")}
        for a in node.args:
            cols |= _flatten_fl(a)
    return cols


def _build_reduce(node: Node, ctx: dict) -> ray.data.Dataset:
    """reduce(stream, by="k", group(sort="f desc", n=N)) ([U]
    solr/solrj/.../io/stream/ReducerStream.java + GroupOperation): group
    the stream's tuples by key and keep the top-N of each group by the
    group sort — one map_groups over a hash-partitioned groupby (the
    reference's sorted-adjacency contract relaxed to the shuffle Ray
    Data already does; output is identical because groups are total)."""
    by = node.kwargs["by"].strip()
    gop = next(a for a in node.args[1:] if isinstance(a, Node) and a.name == "group")
    sort_spec = gop.kwargs.get("sort", "")
    n = int(gop.kwargs.get("n", 1))
    col, _, direction = sort_spec.strip().partition(" ")
    desc = direction.strip().lower() == "desc"
    ds = _build(node.args[0], ctx)

    tie_col = "doc_id" if "doc_id" in _flatten_fl(node.args[0]) else col

    def topn(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy()
        tie = t.column(tie_col).to_numpy()
        order = np.lexsort((tie, -v if desc else v))[:n]
        return t.take(np.sort(order))

    return ds.groupby(by).map_groups(topn, batch_format="pyarrow")


def _eval_math(v, ctx: dict):
    """Evaluate one math-program value ([U] solr/solrj/.../io/eval/*):
    a variable name, a literal, or an evaluator call over variables.
    Vectors are Python lists of exact ints (the streams feeding col()
    are bucket-count-sized by construction, so driver-side lists are the
    scale-right representation — the corpus pass already happened
    distributed inside the inner stream)."""
    if isinstance(v, str):
        return ctx.get("vars", {}).get(v, v)
    if not isinstance(v, Node):
        return v
    if v.name == "col":
        ds = _build(v.args[0], ctx)
        field = v.args[1] if len(v.args) > 1 else v.kwargs["field"]
        df = ds.to_pandas()
        return [int(x) for x in df[field]]
    args = [_eval_math(a, ctx) for a in v.args]
    if v.name == "sum":
        return sum(args[0])
    if v.name == "length":
        return len(args[0])
    if v.name == "mean":  # exact micro-units, truncating division
        return _tdiv(sum(args[0]) * 1_000_000, len(args[0]))
    if v.name == "dotProduct":
        return sum(x * y for x, y in zip(args[0], args[1], strict=True))
    if v.name == "ebeAdd":
        return [x + y for x, y in zip(args[0], args[1], strict=True)]
    if v.name == "ebeSubtract":
        return [x - y for x, y in zip(args[0], args[1], strict=True)]
    if v.name == "ebeMultiply":
        return [x * y for x, y in zip(args[0], args[1], strict=True)]
    if v.name == "cov":
        # sample covariance ([U] io/eval/CovarianceEvaluator — Commons
        # Math bias-corrected /(n-1)), exact micro-units, truncating div
        a, b = args[0], args[1]
        n = len(a)
        if n < 2:
            return 0
        num = n * sum(x * y for x, y in zip(a, b, strict=True)) - sum(a) * sum(b)
        return _tdiv(num * 1_000_000, n * (n - 1))
    if v.name == "variance":
        # sample variance ([U] io/eval/VarianceEvaluator), micro-units
        a = args[0]
        n = len(a)
        if n < 2:
            return 0
        return _tdiv((n * sum(x * x for x in a) - sum(a) ** 2) * 1_000_000,
                     n * (n - 1))
    if v.name == "percentile":
        # nearest-rank percentile over exact ints ([U] io/eval/
        # PercentileEvaluator; Commons Math R-6 interpolation pinned down
        # to the discrete nearest-rank form percentile_disc also uses)
        a = sorted(args[0])
        p = int(args[1])
        idx = max(1, (p * len(a) + 99) // 100)
        return a[idx - 1]
    raise ValueError(f"unknown math evaluator {v.name!r}")


def _build_let(node: Node, ctx: dict) -> ray.data.Dataset:
    """let(a=col(stream, "f"), ..., tuple(out=eval(...), ...)) ([U]
    solr/solrj/.../io/stream/LetStream.java + TupStream): bind variables
    in declaration order, then emit the tuple() as one row of exact-int
    scalars. col() zips positionally in the inner stream's sort order
    (TupleStream contract); the SQL oracle's key-join form is equal
    whenever both series cover the same key set (holds on the gate
    corpora — both probe terms occupy every time bucket)."""
    ctx = dict(ctx)
    ctx["vars"] = {}
    for k, v in node.kwargs.items():
        ctx["vars"][k] = _eval_math(v, ctx)
    tup = next(a for a in node.args if isinstance(a, Node) and a.name == "tuple")
    cols = {}
    for k, v in tup.kwargs.items():
        out = _eval_math(v, ctx)
        if isinstance(out, list):
            raise ValueError(f"tuple() field {k!r} is a vector; reduce it first")
        cols[k] = pa.array([int(out)], pa.int64())
    return ray.data.from_arrow(pa.table(cols))


def _tuples_to_docs(b: pa.Table) -> pa.Table:
    """Map stream tuples onto the documents collection schema, filling
    schema defaults for fields the tuple stream does not carry (the
    update handler's add-missing-fields role)."""
    n = b.num_rows
    cols = {c: b.column(c) for c in b.column_names}
    texts = cols["text"].to_pylist() if "text" in cols else [""] * n
    doc_ids = cols["doc_id"].to_numpy().astype(np.int64)
    out = {
        "conv_id": pa.array([f"upd-{d:012d}" for d in doc_ids], pa.string()),
        "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
        "role": pa.array(["user"] * n, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([""] * n, pa.string()),
        "ts": pa.array(
            np.full(n, np.datetime64("2026-02-01T00:00:00", "us")),
            pa.timestamp("us")),
        "doc_id": pa.array(doc_ids, pa.int64()),
        "n_chars": (pa.array(cols["n_chars"].to_numpy().astype(np.int64))
                    if "n_chars" in cols
                    else pa.array([len(t) for t in texts], pa.int64())),
        "lang": cols.get("lang", pa.array(["en"] * n, pa.string())),
        "source": cols.get("source", pa.array(["update"] * n, pa.string())),
    }
    return pa.table(out)


def _dest_dir(node: Node, ctx: dict) -> str:
    dest = node.args[0]
    dest_dir = ctx.get("collections", {}).get(dest)
    if dest_dir is None:
        raise ValueError(f"unknown destination collection {dest!r} "
                         "(pass collections= to run_stream)")
    return dest_dir


def _build_update(node: Node, ctx: dict) -> ray.data.Dataset:
    """update(destination, stream, batchSize=N) ([U] solr/solrj/.../io/
    stream/UpdateStream.java): pull tuples from the inner stream in
    batches and send each batch to the destination collection's update
    handler — here tlog_append on the destination index, the
    transaction-log ingest path — emitting one ack tuple
    {batchIndexed: n} per batch exactly like the reference. Writes are
    durable in the log immediately; visibility needs commit()."""
    from lucene_solr_ray.state import tlog

    dest_dir = _dest_dir(node, ctx)
    inner = _build(node.args[1], ctx)
    bs = int(node.kwargs.get("batchSize", 100))
    acks = []
    for b in inner.iter_batches(batch_size=bs, batch_format="pyarrow"):
        tlog.tlog_append(dest_dir, _tuples_to_docs(b))
        acks.append(b.num_rows)
    return ray.data.from_arrow(
        pa.table({"batchIndexed": pa.array(acks, pa.int64())}))


def _build_commit(node: Node, ctx: dict) -> ray.data.Dataset:
    """commit(destination, stream) ([U] solr/solrj/.../io/stream/
    CommitStream.java): pass the inner tuples through and issue a commit
    once the stream is exhausted — tlog.soft_commit folds every pending
    log entry into a new visible index generation."""
    from lucene_solr_ray.state import tlog

    dest_dir = _dest_dir(node, ctx)
    inner = _build(node.args[1], ctx).materialize()  # EOF: all batches acked
    tlog.soft_commit(dest_dir)
    return inner


def _build_cartesian(node: Node, ctx: dict) -> ray.data.Dataset:
    """cartesianProduct(stream, analyze(field) as term) ([U] solr/solrj/
    .../io/stream/CartesianProductStream.java + io/eval/
    AnalyzeEvaluator.java): explode each tuple into one tuple per
    analyzed token of ``field`` — the canonical Solr idiom for token
    streams as relations. Other columns are repeated; the analyzed
    field's source column is dropped from the output."""
    from lucene_solr_ray.analysis import get_analyzer

    inner = _build(node.args[0], ctx)
    spec = node.args[1]
    if not (isinstance(spec, Node) and spec.name == "__as"
            and isinstance(spec.args[0], Node)
            and spec.args[0].name == "analyze"):
        raise ValueError("cartesianProduct(): second arg must be "
                         "'analyze(field) as name'")
    an = spec.args[0]
    field = an.args[0]
    analyzer = get_analyzer(an.args[1] if len(an.args) > 1 else "standard")
    out_name = spec.args[1]

    def explode(t: pa.Table) -> pa.Table:
        toks = [analyzer(x) for x in t.column(field).to_pylist()]
        counts = np.array([len(x) for x in toks], np.int64)
        idx = np.repeat(np.arange(t.num_rows), counts)
        cols = {c: t.column(c).take(pa.array(idx))
                for c in t.column_names if c != field}
        cols[out_name] = pa.array(
            [w for row in toks for w in row], pa.string())
        return pa.table(cols)

    return inner.map_batches(explode, batch_format="pyarrow")


STREAM_FUNCTIONS = {
    "search": _build_search,
    "update": _build_update,
    "commit": _build_commit,
    "cartesianProduct": _build_cartesian,
    "select": _build_select,
    "rollup": _build_rollup,
    "sort": _build_sort,
    "top": _build_top,
    "unique": _build_unique,
    "having": _build_having,
    "innerJoin": _build_innerjoin,
    "hashJoin": _build_innerjoin,
    "leftOuterJoin": _build_leftouterjoin,
    "intersect": _build_intersect,
    "complement": _build_complement,
    "facet": _build_facet,
    "stats": _build_stats,
    "fetch": _build_fetch,
    "merge": _build_merge,
    "describe": _build_describe,
    "hist": _build_hist,
    "regress": _build_regress,
    "timeseries": _build_timeseries,
    "random": _build_random,
    "corr": _build_corr,
    "movingAvg": _build_moving_avg,
    "diff": _build_diff,
    "train": _build_train,
    "classify": _build_classify,
    "features": _build_features,
    "knn": _build_knn,
    "significantTerms": _build_significant_terms,
    "nodes": _build_nodes,
    "gatherNodes": _build_nodes,
    "shortestPath": _build_shortest_path,
    "scoreNodes": _build_score_nodes,
    "reduce": _build_reduce,
    "let": _build_let,
}


def _build(node, ctx: dict) -> ray.data.Dataset:
    if not isinstance(node, Node):
        raise ValueError(f"expected a stream expression, got {node!r}")
    if node.name not in STREAM_FUNCTIONS:
        raise ValueError(
            f"unknown stream function {node.name!r} (have {sorted(STREAM_FUNCTIONS)})"
        )
    return STREAM_FUNCTIONS[node.name](node, ctx)


def run_stream(sf_dir: str, expression: str,
               collections: dict | None = None) -> ray.data.Dataset:
    """Parse + execute one streaming expression against ``sf_dir``'s
    documents collection; returns the lazy Dataset. ``collections`` maps
    destination collection names (for update()/commit()) to index dirs."""
    ctx = {"sf_dir": sf_dir}
    if collections:
        ctx["collections"] = collections
    return _build(parse_expr(expression), ctx)


# ---------------------------------------------------------------------------
# Driver-contract entries
# ---------------------------------------------------------------------------


def stream_expr_rollup(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'rollup(search(documents, q="merge join", fl="source,n_chars"), '
        "over=\"source\", count(*), sum(n_chars))",
    )


def stream_expr_top(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'top(select(search(documents, q="lang:en", fl="doc_id,n_chars"), '
        'doc_id as id, n_chars as len), n=10, sort="len desc, id asc")',
    )


def stream_expr_having_unique(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'having(rollup(unique(search(documents, q="*:*", fl="lang,source"), '
        'over="lang,source"), over="lang", count(*)), gt(count, 2))',
    )


def stream_expr_join(sf_dir: str) -> ray.data.Dataset:
    """innerJoin of two match sets on doc_id (docs with BOTH terms,
    enriched from each side's fl)."""
    return run_stream(
        sf_dir,
        'sort(select(innerJoin(search(documents, q="merge", fl="doc_id,source"), '
        'search(documents, q="vector", fl="doc_id,n_chars"), on="doc_id"), '
        '"doc_id", "source", "n_chars"), by="doc_id asc")',
    )


def stream_expr_facet(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'facet(documents, q="merge", buckets="lang", '
        'bucketSorts="count desc, lang asc", count(*), sum(n_chars))',
    )


def stream_expr_stats(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'stats(documents, q="merge join", count(*), sum(n_chars), max(n_chars))',
    )


def stream_expr_fetch(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'sort(fetch(documents, top(search(documents, q="merge vector", fl="doc_id,n_chars"), '
        'n=25, sort="n_chars desc, doc_id asc"), on="doc_id", fl="lang,source"), '
        'by="doc_id asc")',
    )


def stream_expr_merge(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'merge(search(documents, q="spark", fl="doc_id,n_chars"), '
        'search(documents, q="window vector", fl="doc_id,n_chars"), '
        'on="n_chars desc, doc_id asc")',
    )


def stream_expr_complement(sf_dir: str) -> ray.data.Dataset:
    """complement: merge-docs whose doc_id is NOT in the vector set."""
    return run_stream(
        sf_dir,
        'sort(complement(search(documents, q="merge", fl="doc_id"), '
        'search(documents, q="vector", fl="doc_id"), on="doc_id"), by="doc_id asc")',
    )


def stream_expr_describe(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'describe(search(documents, q="merge", fl="doc_id,n_chars"), col="n_chars")',
    )


def stream_expr_hist(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'hist(search(documents, q="*:*", fl="doc_id,n_chars"), col="n_chars", bins=8)',
    )


def stream_expr_regress(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'regress(search(documents, q="*:*", fl="doc_id,n_chars"), x="doc_id", y="n_chars")',
    )


def stream_expr_select_eval(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'sort(select(search(documents, q="merge", fl="doc_id,n_chars"), '
        '"doc_id", if(gt(n_chars, 150), 1, 0) as big, '
        'add(mult(n_chars, 2), 7) as scaled), by="doc_id asc")',
    )


def stream_expr_cartesian_analyze(sf_dir: str) -> ray.data.Dataset:
    """cartesianProduct + analyze(): one row per analyzed token of each
    matching doc's text — the token-stream-as-relation idiom."""
    return run_stream(
        sf_dir,
        'sort(cartesianProduct(search(documents, q="dup", fl="doc_id,text"), '
        'analyze(text) as term), by="doc_id asc, term asc")',
    )


def stream_expr_update(sf_dir: str) -> "pa.Table":
    """UpdateStream + CommitStream end-to-end: stream the 'dup' match
    set (doc_ids remapped past maxDoc) into a COPY of the documents
    collection through the transaction log, commit, then prove
    visibility twice — RealTimeGet returns the appended stored fields,
    and a term query over the destination counts old + new 'dup' docs.
    Output: (doc_id, n_chars) of the appended docs via post-commit RTG."""
    import shutil

    from lucene_solr_ray.functions.fulltext import (
        _docid_to_doc_id, docs_index, realtime_get)
    from lucene_solr_ray.pipelines.search import IndexSearcher

    src = docs_index(sf_dir)
    dest = src + "-updstream"
    shutil.rmtree(dest, ignore_errors=True)
    shutil.copytree(src, dest)

    acks = run_stream(
        sf_dir,
        'commit(dest, update(dest, '
        'select(search(documents, q="dup", fl="doc_id,text,lang,source,n_chars"), '
        'add(doc_id, 90000000) as doc_id, "text", "lang", "source", "n_chars"), '
        "batchSize=10))",
        collections={"dest": dest},
    ).to_pandas()
    n_written = int(acks["batchIndexed"].sum())

    s_src = IndexSearcher(src)
    d_old, _ = s_src.search(["dup"], k=max(1, s_src.n_docs), mode="or")
    s = IndexSearcher(dest)
    d_new, _ = s.search(["dup"], k=max(1, s.n_docs), mode="or")
    assert len(d_new) == len(d_old) + n_written, (len(d_new), len(d_old), n_written)

    mapping = _docid_to_doc_id(src)
    new_ids = sorted(int(mapping[i]) + 90000000 for i in d_old)
    got = realtime_get(dest, new_ids, fl=("n_chars",))
    return got.sort_by("doc_id")


def stream_expr_timeseries(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'timeseries(documents, q="merge", field="ts", gap="+10MINUTES", '
        "count(*), sum(n_chars))",
    )


def stream_expr_random(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'random(documents, q="vector", fl="doc_id,lang", pct=10)',
    )


def stream_expr_moving_avg(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'movingAvg(timeseries(documents, q="merge", field="ts", '
        'gap="+60SECONDS", count(*)), col="count", window=3)',
    )


def stream_expr_diff(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'diff(timeseries(documents, q="merge", field="ts", '
        'gap="+60SECONDS", count(*)), col="count")',
    )


def stream_expr_corr(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir,
        'corr(search(documents, q="*:*", fl="doc_id,n_chars"), '
        'x="doc_id", y="n_chars")',
    )


def stream_expr_train(sf_dir: str) -> ray.data.Dataset:
    return run_stream(sf_dir, 'train(documents, q="merge", iterations=3)')


def stream_expr_select_strings(sf_dir: str) -> ray.data.Dataset:
    """select() with string evaluators (concat/upper) beside the
    arithmetic set."""
    return run_stream(
        sf_dir,
        'sort(select(search(documents, q="merge", fl="doc_id,lang,source"), '
        'doc_id, concat(lang, source) as lang_source, upper(lang) as lang_uc), '
        'by="doc_id asc")')


def stream_expr_timeseries_metrics(sf_dir: str) -> ray.data.Dataset:
    """timeseries() with the full metric set (count + sum/min/max over a
    field) — the multi-metric TimeSeriesStream form."""
    return run_stream(
        sf_dir,
        'timeseries(documents, q="merge", field="ts", gap="+120SECONDS", '
        'count(*), sum(n_chars), min(n_chars), max(n_chars))')


def stream_expr_features(sf_dir: str) -> ray.data.Dataset:
    return run_stream(sf_dir, 'features(documents, field="lang", label="en", k=12)')


def stream_expr_classify(sf_dir: str) -> ray.data.Dataset:
    return run_stream(
        sf_dir, 'classify(train(documents, q="merge", iterations=3))')


def stream_expr_knn(sf_dir: str) -> ray.data.Dataset:
    return run_stream(sf_dir, "knn(documents, id=0, k=10)")


def stream_expr_significant_terms(sf_dir: str) -> ray.data.Dataset:
    return run_stream(sf_dir, "significantTerms(documents)")


def stream_expr_reduce(sf_dir: str) -> ray.data.Dataset:
    """Top-2 longest docs per language via ReducerStream semantics."""
    return run_stream(
        sf_dir,
        'reduce(search(documents, q="*:*", fl="doc_id,lang,n_chars"), '
        'by="lang", group(sort="n_chars desc", n=2))')


def stream_expr_score_nodes(sf_dir: str) -> ray.data.Dataset:
    return run_stream(sf_dir, 'scoreNodes(nodes(orders, segment="BUILDING"))')


def stream_expr_shortest_path(sf_dir: str) -> ray.data.Dataset:
    return run_stream(sf_dir, 'shortestPath(supplier_graph, from=1, to=7)')


def stream_expr_cov_percentile(sf_dir: str) -> ray.data.Dataset:
    """Math program: sample covariance / variance (micro-units),
    nearest-rank percentile and element-wise product over two aligned
    time series — the cov()/variance()/percentile()/ebeMultiply()
    evaluators ([U] solr/solrj/.../io/eval/)."""
    return run_stream(
        sf_dir,
        'let(a=col(timeseries(documents, q="merge", field="ts", '
        'gap="+60SECONDS", count(*)), "count"), '
        'b=col(timeseries(documents, q="join", field="ts", '
        'gap="+60SECONDS", count(*)), "count"), '
        'tuple(cov_micro=cov(a, b), var_a_micro=variance(a), '
        'p90_a=percentile(a, 90), dot=sum(ebeMultiply(a, b))))')


def stream_expr_let_math(sf_dir: str) -> ray.data.Dataset:
    """Math program: two aligned time series -> dot product / sums /
    exact-micro mean via let()/col()/tuple() evaluators."""
    return run_stream(
        sf_dir,
        'let(a=col(timeseries(documents, q="merge", field="ts", '
        'gap="+60SECONDS", count(*)), "count"), '
        'b=col(timeseries(documents, q="join", field="ts", '
        'gap="+60SECONDS", count(*)), "count"), '
        'c=ebeSubtract(a, b), '
        'tuple(dot=dotProduct(a, b), sum_a=sum(a), sum_b=sum(b), '
        'n=length(a), mean_a_micro=mean(a), sum_diff=sum(c)))')
