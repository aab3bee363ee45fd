"""Graph traversal streams ([U] solr/solrj/.../io/graph/
GatherNodesStream.java, ShortestPathStream.java) re-expressed
Ray-Data-first.

A *hop* is a distributed semi-join: frontier ⋈ edges on the from-column,
then a distinct on the to-column — both hash-shuffled, never a driver
set, so a 10^9-node frontier walks the same code path as ten nodes.
Multi-hop walks compose hops; BFS shortest-path keeps the visited set AS
A DATASET and anti-joins it out of each new frontier (Solr's
ShortestPathStream does the same partition-level joins per level).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from lucene_solr_ray.io_utils import join_partitions, read_parquet_clean



def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    # read_parquet_clean hands the reader a metadata-free footer schema,
    # so pa.Schema stays hashable and Ray's join/shuffle schema dedup
    # works from the ReadParquet op onward (no "Failed to hash" spam)
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _with_schema(schema: dict):
    """Batch fn: rebuild each batch with exactly the declared schema."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(k not in t.column_names for k in schema):
            return pa.table({k: pa.array([], typ) for k, typ in schema.items()})
        return pa.table({k: pc.cast(t.column(k), typ) for k, typ in schema.items()})

    return fn


@ray.remote
def _fix_block(tbl: pa.Table, schema: dict) -> pa.Table:
    if tbl.num_rows == 0 or any(k not in tbl.column_names for k in schema):
        return pa.table({k: pa.array([], typ) for k, typ in schema.items()})
    return pa.table({k: pc.cast(tbl.column(k), typ) for k, typ in schema.items()})


@ray.remote
def _block_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


def _repair(ds: ray.data.Dataset, schema: dict) -> ray.data.Dataset:
    """Ray 2.49's hash-shuffle join chokes on EMPTY input blocks (a join
    partition whose builder receives no schema-carrying shard finalizes a
    schema-less table -> 'no match for key field').  map_batches never
    runs on empty blocks, so repair at the block level: rebuild each
    block with the declared schema and DROP empty blocks entirely.
    Blocks stay in the object store — the driver routes only refs and
    per-block row counts — so this is safe on corpus-sized datasets.
    Callers must handle a genuinely-empty dataset BEFORE joining it
    (guard with .count() == 0)."""
    refs = ds.to_arrow_refs()
    sizes = ray.get([_block_rows.remote(r) for r in refs])
    keep = [_fix_block.remote(r, schema) for r, n in zip(refs, sizes) if n > 0]
    if not keep:
        return ray.data.from_arrow(pa.table({k: pa.array([], t) for k, t in schema.items()}))
    return ray.data.from_arrow_refs(keep)


def hop(frontier: ray.data.Dataset, edges: ray.data.Dataset,
        from_col: str, to_col: str, num_partitions: int | None = None) -> ray.data.Dataset:
    """One gatherNodes traversal: distinct to-nodes reachable from the
    frontier. frontier has one column named `from_col`."""
    num_partitions = num_partitions or join_partitions()
    joined = edges.join(frontier, "inner", num_partitions=num_partitions, on=(from_col,))
    distinct = (
        _repair(joined, {to_col: pa.int64()})
        .groupby(to_col)
        .aggregate(Count(alias_name="_n"))
        .select_columns([to_col])
    )
    return _repair(distinct, {to_col: pa.int64()})


def gather_nodes(sf_dir: str, segment: str = "BUILDING") -> ray.data.Dataset:
    """Two-hop gather: customers in `segment` -> their orders -> the
    suppliers on those orders' line items; returns distinct supplier
    nodes with traversal counts (gatherNodes' count(*) aggregation)."""
    roots = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("c_mktsegment"), pa.scalar(segment))).select(
                ["c_custkey"]
            ).rename_columns(["o_custkey"]),
            batch_format="pyarrow",
        )
    )
    roots = _repair(roots, {"o_custkey": pa.int64()})
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    order_nodes = hop(roots, orders, "o_custkey", "o_orderkey").rename_columns(["l_orderkey"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    joined = lineitem.join(order_nodes, "inner", num_partitions=join_partitions(), on=("l_orderkey",))
    return (
        _repair(joined, {"l_suppkey": pa.int64()})
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="n_edges"))
        .sort("l_suppkey")
    )


def bfs_distance(edges: ray.data.Dataset, src: int, dst: int, max_hops: int = 6,
                 num_partitions: int | None = None) -> int:
    """ShortestPathStream: BFS distance in a bipartite graph given as an
    edges Dataset with columns (node:int64, via:int64) — two nodes are
    adjacent when they share a `via` value. Returns -1 if unreachable
    within max_hops.

    Each level is dataset joins + an anti-join against the visited
    dataset; frontiers are materialized per level (they are node-id
    sized, not corpus sized) so lineage doesn't recompute level N-1 for
    every level-N hop.  Only the tiny termination flag reaches the
    driver."""
    if src == dst:
        return 0
    num_partitions = num_partitions or join_partitions()
    frontier = ray.data.from_arrow(pa.table({"node": pa.array([src], pa.int64())}))
    visited = frontier
    for level in range(1, max_hops + 1):
        vias = hop(frontier, edges, "node", "via", num_partitions)
        if vias.count() == 0:
            return -1  # dead-end frontier: no outgoing edges
        rev = edges.join(vias, "inner", num_partitions=num_partitions, on=("via",))
        nxt = _repair(
            _repair(rev, {"node": pa.int64()})
            .groupby("node")
            .aggregate(Count(alias_name="_n"))
            .select_columns(["node"]),
            {"node": pa.int64()},
        )
        # anti-join visited: left outer join + null filter
        lj = nxt.join(
            visited.map_batches(
                lambda t: t.append_column("_seen", pa.array(np.ones(len(t), np.int8))),
                batch_format="pyarrow",
            ),
            "left_outer",
            num_partitions=num_partitions,
            on=("node",),
        )
        def unseen(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64())})
            return pa.table(
                {"node": pc.cast(t.filter(pc.is_null(t.column("_seen"))).column("node"), pa.int64())}
            )

        frontier = _repair(
            _repair(lj, {"node": pa.int64(), "_seen": pa.int8()}).map_batches(
                unseen, batch_format="pyarrow"
            ),
            {"node": pa.int64()},
        )
        hits = frontier.map_batches(
            lambda t: pa.table(
                {
                    "hit": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.cast(pc.equal(t.column("node"), pa.scalar(dst)), pa.int64())
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("hit")
        if hits:
            return level
        if frontier.count() == 0:
            return -1
        visited = _repair(visited.union(frontier), {"node": pa.int64()})
    return -1


def supplier_distance(sf_dir: str, src_supp: int, dst_supp: int, max_hops: int = 6) -> int:
    """BFS over the supplier—part bipartite graph from lineitem (edge
    when a supplier ships a part); distance in supplier steps."""
    edges = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t.column("l_suppkey"), pa.int64()),
                    "via": pc.cast(t.column("l_partkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["node", "via"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node", "via"])
    )
    return bfs_distance(edges, src_supp, dst_supp, max_hops)


def score_nodes(sf_dir: str, segment: str = "BUILDING") -> pa.Table:
    """ScoreNodesStream ([U] solr/solrj/.../io/stream/ScoreNodesStream.java):
    tf-idf scoring of gathered graph nodes so hub nodes (suppliers every
    traversal reaches) stop drowning out discriminative ones.

    tf   = traversal count from the gather (``n_edges`` per supplier
           reached from ``segment`` customers' orders).
    df   = global document frequency of the node = distinct orders that
           ship the supplier anywhere in the corpus.
    idf  = ln(numDocs / (df + 1)), numDocs = total orders — quantized to
           micro-nats (FLOOR(x*1e6 + 0.5), the repo's exact-int log
           convention) BEFORE the multiply, so
           ``score_micro = n_edges * idf_micro`` is exact int64.

    Scale shape: the gather is the distributed ``gather_nodes`` pass; df
    is one distinct-(supplier, order) groupby + per-supplier count; the
    two node-keyed tables combine via union + groupby-Sum (NOT a hash
    join — Ray 2.49's hash-shuffle join chokes on aggregate-output
    lineages, see CLAUDE.md), and idf/score are a stateless map over the
    node-sized result. Only the numDocs scalar touches the driver."""
    gathered = gather_nodes(sf_dir, segment).map_batches(
        lambda t: pa.table({
            "node": pc.cast(t.column("l_suppkey"), pa.int64()),
            "n_edges": pc.cast(t.column("n_edges"), pa.int64()),
            "df": pa.array(np.zeros(t.num_rows, np.int64)),
        }),
        batch_format="pyarrow",
    )
    df_side = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_orderkey"])
        .groupby(["l_suppkey", "l_orderkey"])
        .aggregate(Count(alias_name="_n"))
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="df"))
        .map_batches(
            lambda t: pa.table({
                "node": pc.cast(t.column("l_suppkey"), pa.int64()),
                "n_edges": pa.array(np.zeros(t.num_rows, np.int64)),
                "df": pc.cast(t.column("df"), pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
    n_docs = _read(sf_dir, "orders", ["o_orderkey"]).count()

    def finish(t: pa.Table) -> pa.Table:
        ne = t.column("n_edges").to_numpy().astype(np.int64)
        df = t.column("df").to_numpy().astype(np.int64)
        idf = np.floor(np.log(float(n_docs) / (df + 1.0)) * 1e6 + 0.5).astype(np.int64)
        out = pa.table({
            "node": t.column("node"),
            "n_edges": pa.array(ne, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "idf_micro": pa.array(idf, pa.int64()),
            "score_micro": pa.array(ne * idf, pa.int64()),
        })
        return out.filter(pc.greater(out.column("n_edges"), pa.scalar(0, pa.int64())))

    combined = (
        gathered.union(df_side)
        .groupby("node")
        .aggregate(Sum("n_edges", alias_name="n_edges"), Sum("df", alias_name="df"))
        .map_batches(finish, batch_format="pyarrow")
    )
    return combined.sort(["score_micro", "node"], descending=[True, False])


def _expand_ranges(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of index ranges [lo_i, hi_i) — the gather
    side of a broadcast semi-join (no Python loop over rows)."""
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.repeat(lo, cnt)
    offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    return starts + offs


def _broadcast_hop_fn(fr_ref, key_col: str, out_col: str):
    """One BFS hop as a broadcast semi-join: the (key -> srcs) frontier
    (sorted arrays, ray.put once per level) joins each edges batch in a
    single vectorized pass — searchsorted ranges + index expansion, then
    per-batch dedup. No shuffle touches the edge set; plain task fn (not
    an actor pool) because the broadcast changes every level anyway and
    ray.get of a plasma ref is zero-copy per node."""

    def fn(t: pa.Table) -> pa.Table:
        keys, srcs = ray.get(fr_ref)  # sorted by key; srcs aligned
        k = t.column(key_col).to_numpy().astype(np.int64)
        v = t.column(out_col).to_numpy().astype(np.int64)
        lo = np.searchsorted(keys, k, "left")
        hi = np.searchsorted(keys, k, "right")
        idx = _expand_ranges(lo, hi)
        out_src = srcs[idx]
        out_val = np.repeat(v, hi - lo)
        pairs = np.unique(np.stack([out_src, out_val], axis=1), axis=0) if len(idx) else \
            np.empty((0, 2), np.int64)
        return pa.table({"src": pa.array(pairs[:, 0], pa.int64()),
                         out_col: pa.array(pairs[:, 1], pa.int64())})

    return fn


def bfs_distances_multi(edges: ray.data.Dataset, pairs, max_hops: int = 6,
                        num_partitions: int | None = None) -> dict:
    """MULTI-SOURCE BFS: one (src, node)-keyed frontier serves every
    (src, dst) pair in a single pass over the levels — N pairs cost the
    same edge scans as one (round-2 verdict replaced the sequential
    per-pair walk with this). Each level is two broadcast semi-join hops
    (frontier nodes -> vias -> next nodes), each ONE map_batches pass
    over the edge set plus a small (src, key) distinct groupby; the
    visited anti-join runs on the driver over node-id-sized state.

    Partitioning assumption (documented per the custom-operator rule):
    frontier/via/visited sets are node-id sized and are broadcast via
    ray.put (zero-copy per node). When a frontier cannot fit the object
    store — billions of distinct reached nodes — use the dataset-join
    variant ``bfs_distance`` per source instead; the edge set itself is
    never collected here."""
    res = {(int(s), int(d)): (0 if s == d else -1) for s, d in pairs}
    pending = {p for p in res if res[p] == -1}
    if not pending:
        return res
    srcs = sorted({s for s, _ in pending})
    frontier = np.array([[s, s] for s in srcs], np.int64)  # (src, node) rows
    visited = {s: {s} for s in srcs}

    def distinct_pairs(ds, key_col):
        # per-batch dedup already ran inside the hop fn; the cross-block
        # residue is (blocks x frontier-distinct)-bounded — same class as
        # the broadcast state this variant already assumes fits the driver
        df = ds.to_pandas()
        pairs = np.stack([df["src"].to_numpy().astype(np.int64),
                          df[key_col].to_numpy().astype(np.int64)], axis=1) if len(df) else \
            np.empty((0, 2), np.int64)
        return np.unique(pairs, axis=0) if len(pairs) else pairs

    for level in range(1, max_hops + 1):
        if not pending or len(frontier) == 0:
            break
        order = np.argsort(frontier[:, 1], kind="stable")
        fr_ref = ray.put((frontier[order, 1], frontier[order, 0]))
        vias = distinct_pairs(
            edges.map_batches(_broadcast_hop_fn(fr_ref, "node", "via"),
                              batch_format="pyarrow"),
            "via",
        )
        if len(vias) == 0:
            break  # every remaining frontier is a dead end
        order = np.argsort(vias[:, 1], kind="stable")
        via_ref = ray.put((vias[order, 1], vias[order, 0]))
        nxt = distinct_pairs(
            edges.map_batches(_broadcast_hop_fn(via_ref, "via", "node"),
                              batch_format="pyarrow"),
            "node",
        )
        # visited anti-join + hit detection: node-id-sized driver state
        keep = []
        for s, n in nxt:
            s, n = int(s), int(n)
            if n in visited[s]:
                continue
            visited[s].add(n)
            keep.append((s, n))
            if (s, n) in pending:
                res[(s, n)] = level
                pending.discard((s, n))
        frontier = np.array(keep, np.int64) if keep else np.empty((0, 2), np.int64)
    return res


def _supplier_part_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct (supplier node, part via) edge list — suppliers are
    adjacent when they supply a common part. Shared by the shortest-path
    and graph-query walkers; materialized once per call so every BFS
    level reuses the same blocks."""
    return (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t.column("l_suppkey"), pa.int64()),
                    "via": pc.cast(t.column("l_partkey"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["node", "via"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node", "via"])
        .materialize()
    )


def graph_query_reachable(sf_dir: str, root: int = 1, max_depth: int = 2) -> pa.Table:
    """Solr GraphQueryParser analogue ({!graph from=.. to=.. maxDepth=N}
    — [U] solr/core/.../search/join/GraphQueryParserPlugin.java ->
    GraphQuery): the full REACHABLE node set from a seed within
    ``max_depth`` traversals — the parser yields a filter of every doc
    the walk touches (returnRoot=true: the seed itself at hops 0), not
    pairwise distances. Adjacency = shared-part supplier graph. Each
    level is the same two broadcast semi-join hops as
    bfs_distances_multi (one map_batches pass over the edge set each);
    visited state is node-id-sized driver state."""
    edges = _supplier_part_edges(sf_dir)
    visited = {int(root): 0}
    frontier = np.array([int(root)], np.int64)
    for level in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        fr = np.sort(frontier)
        fr_ref = ray.put((fr, fr))  # (keys, srcs) — srcs unused single-source
        vias = edges.map_batches(_broadcast_hop_fn(fr_ref, "node", "via"),
                                 batch_format="pyarrow").to_pandas()
        if not len(vias):
            break
        vv = np.unique(vias["via"].to_numpy().astype(np.int64))
        via_ref = ray.put((vv, vv))
        nxt = edges.map_batches(_broadcast_hop_fn(via_ref, "via", "node"),
                                batch_format="pyarrow").to_pandas()
        nodes = np.unique(nxt["node"].to_numpy().astype(np.int64)) if len(nxt) else \
            np.empty(0, np.int64)
        fresh = [int(n) for n in nodes if int(n) not in visited]
        for n in fresh:
            visited[n] = level
        frontier = np.array(fresh, np.int64)
    items = sorted(visited.items())
    return pa.table({
        "suppkey": pa.array([k for k, _ in items], pa.int64()),
        "hops": pa.array([v for _, v in items], pa.int64()),
    })


def shortest_path_pairs(sf_dir: str, pairs=((1, 7), (2, 50)), max_hops: int = 4) -> pa.Table:
    """Driver entry for ShortestPathStream: BFS distance for a fixed set
    of (src, dst) supplier pairs -> (src, dst, distance); -1 when
    unreachable within max_hops. Oracle: recursive CTE over the same
    shared-part adjacency. All pairs ride ONE multi-source BFS."""
    edges = _supplier_part_edges(sf_dir)
    dist = bfs_distances_multi(edges, pairs, max_hops)
    rows = [{"src": int(s), "dst": int(d), "distance": dist[(int(s), int(d))]} for s, d in pairs]
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("distance", pa.int64())]),
    )
