"""Graph streams: gatherNodes hops and BFS shortest path."""

import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def _chain_edges():
    """Bipartite chain: node i and i+1 share via=i  (0-1-2-3-4),
    plus isolated node 99 (via 500 shared with nobody)."""
    nodes, vias = [], []
    for i in range(4):
        nodes += [i, i + 1]
        vias += [100 + i, 100 + i]
    nodes.append(99)
    vias.append(500)
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()), "via": pa.array(vias, pa.int64())})
    )


def test_bfs_chain_distances(ray_session):
    from lucene_solr_ray.functions.graph import bfs_distance

    edges = _chain_edges()
    assert bfs_distance(edges, 0, 0, num_partitions=2) == 0
    assert bfs_distance(edges, 0, 1, num_partitions=2) == 1
    assert bfs_distance(edges, 0, 4, num_partitions=2) == 4
    assert bfs_distance(edges, 0, 99, num_partitions=2) == -1  # unreachable
    assert bfs_distance(edges, 0, 4, max_hops=3, num_partitions=2) == -1  # hop budget


def test_supplier_distance_fulltable(ray_session):
    from lucene_solr_ray.functions.graph import supplier_distance

    # sf0.001 supplier-part graph is fully connected at one step
    assert supplier_distance(SF, 1, 7) == 1
    assert supplier_distance(SF, 3, 3) == 0


def test_gather_nodes_matches_duckdb(ray_session):
    import duckdb

    from lucene_solr_ray.functions.graph import gather_nodes

    got = gather_nodes(SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    exp = con.sql(
        "SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_edges FROM lineitem "
        "WHERE l_orderkey IN (SELECT o_orderkey FROM orders JOIN customer "
        "ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING') "
        "GROUP BY l_suppkey ORDER BY l_suppkey"
    ).df()
    assert got["l_suppkey"].tolist() == exp["l_suppkey"].tolist()
    assert got["n_edges"].tolist() == exp["n_edges"].tolist()


def test_graph_query_reachable_min_hops(ray_session):
    """{!graph} reachable set == recursive-CTE min-depth walk over the
    same shared-part adjacency: seed at hops 0, BFS level = first-visit
    depth, nothing beyond maxDepth."""
    import duckdb

    from lucene_solr_ray.functions.graph import graph_query_reachable

    got = graph_query_reachable(SF, root=1, max_depth=2).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    exp = con.execute(
        "WITH RECURSIVE adj AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v "
        "FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey), "
        "walk(node, d) AS (SELECT CAST(1 AS BIGINT), 0 UNION "
        "SELECT adj.v, w.d + 1 FROM walk w JOIN adj ON adj.u = w.node WHERE w.d < 2) "
        "SELECT CAST(node AS BIGINT) AS suppkey, CAST(MIN(d) AS BIGINT) AS hops "
        "FROM walk GROUP BY node ORDER BY suppkey"
    ).fetchdf()
    assert got["suppkey"].tolist() == exp["suppkey"].tolist()
    assert got["hops"].tolist() == exp["hops"].tolist()
    assert got.loc[got["suppkey"] == 1, "hops"].iloc[0] == 0  # returnRoot
    # depth-1 run is a strict prefix set (BFS level monotonicity)
    d1 = graph_query_reachable(SF, root=1, max_depth=1).to_pandas()
    assert set(d1["suppkey"]) <= set(got["suppkey"])
    assert (d1["hops"] <= 1).all()
