"""Relational operators — Solr streaming-expressions algebra (SURVEY §2.8)
and JSON Facet / stats aggregations (SURVEY §2.7) as Ray Data pipelines.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names/types match the DuckDB oracle SQL in __ray_entry__.py.

Money/float outputs are converted to exact integers per-row BEFORE any
aggregation (``floor(x*100 + 0.5)`` cents) so engine-vs-oracle sums are
bit-exact regardless of accumulation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from lucene_solr_ray.io_utils import join_partitions, pool_size, read_parquet_clean


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    # read_parquet_clean hands the reader a metadata-free footer schema,
    # so pa.Schema stays hashable and Ray's join/shuffle schema dedup
    # works from the ReadParquet op onward (no "Failed to hash" spam)
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — deterministic round-half-up, same in
    DuckDB (FLOOR) and NumPy."""
    return pc.cast(pc.floor(pc.add(pc.multiply(arr, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())


# ---------------- SelectStream + HavingStream ----------------

def select_having(sf_dir: str) -> ray.data.Dataset:
    """Projection + computed column + predicate filter
    ([U] solr/solrj/.../io/stream/SelectStream.java, HavingStream.java)."""

    def fn(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        out = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "qty": _cents(t.column("l_quantity")),
                "revenue_cents": _cents(rev),
            }
        )
        return out.filter(pc.greater_equal(t.column("l_quantity"), pa.scalar(48.0)))

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
                 ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------- RollupStream (grouped aggregate with map-side combine) ----------------

def rollup_agg(sf_dir: str) -> ray.data.Dataset:
    """Grouped sum/count ([U] .../io/stream/RollupStream.java) with
    map-side partial aggregation before the shuffle (SURVEY §4 skew row:
    per-batch combine shrinks the exchange)."""

    def partial(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": _cents(t.column("l_quantity")),
                "base_cents": _cents(t.column("l_extendedprice")),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("one", "sum")]
        ).rename_columns(["l_returnflag", "l_linestatus", "qty", "base_cents", "one"])

    partials = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("base_cents", alias_name="sum_base_cents"),
        Sum("one", alias_name="n"),
    )


# ---------------- StatsStream ----------------

def stats_global(sf_dir: str) -> pa.Table:
    """Global aggregates ([U] .../io/stream/StatsStream.java)."""
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {"qty": _cents(t.column("l_quantity")), "price_cents": _cents(t.column("l_extendedprice"))}
        ),
        batch_format="pyarrow",
    )
    res = ds.aggregate(
        Count(alias_name="n"),
        Min("qty", alias_name="min_qty"),
        Max("qty", alias_name="max_qty"),
        Sum("price_cents", alias_name="sum_price_cents"),
    )
    return pa.Table.from_pylist([{k: int(v) for k, v in res.items()}])


def stats_extended(sf_dir: str) -> ray.data.Dataset:
    """Extended facet agg fns ([U] solr/core/.../search/facet/
    StddevAgg.java, VarianceAgg.java, SumsqAgg.java, MissingAgg.java,
    CountValsAgg.java) per group. Exact-integer distributed shape: the
    shuffle carries only (n, n_missing, sum_cents, sumsq_cents2) partials;
    variance/stddev derive from those moments downstream (kept as raw
    integer moments here so the DuckDB oracle hashes bit-exact)."""

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        missing = pc.is_null(t.column("value"))
        tt = pa.table(
            {
                "event_type": t.column("event_type"),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_missing": pc.cast(missing, pa.int64()),
                "sum_cents": cents,
                "sumsq_cents2": pc.multiply(cents, cents),
            }
        )
        return (
            pa.TableGroupBy(tt, ["event_type"])
            .aggregate([("one", "sum"), ("n_missing", "sum"), ("sum_cents", "sum"),
                        ("sumsq_cents2", "sum")])
            .rename_columns(["event_type", "one", "n_missing", "sum_cents", "sumsq_cents2"])
        )

    return (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("one", alias_name="n"),
            Sum("n_missing", alias_name="n_missing"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sumsq_cents2", alias_name="sumsq_cents2"),
        )
        .sort("event_type")
    )


# ---------------- RankStream (top-k by sort) ----------------

def rank_top(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Global top-k ([U] .../io/stream/RankStream.java): sort desc + limit."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t.column("o_orderkey"), "total_cents": _cents(t.column("o_totalprice"))}
        ),
        batch_format="pyarrow",
    )
    # deterministic ties: totalprice desc then orderkey asc
    return ds.sort(["total_cents", "o_orderkey"], descending=[True, False]).limit(k)


# ---------------- UniqueStream ----------------

def unique_stream(sf_dir: str) -> ray.data.Dataset:
    """Distinct values ([U] .../io/stream/UniqueStream.java)."""
    return (
        _read(sf_dir, "customer", ["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
        .sort("c_mktsegment")
    )


# ---------------- HashJoinStream ----------------

def hash_join(sf_dir: str) -> ray.data.Dataset:
    """Partitioned hash join ([U] .../io/stream/HashJoinStream.java) via
    Dataset.join, then grouped rollup per market segment."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": t.column("o_custkey"), "total_cents": _cents(t.column("o_totalprice"))}
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, "inner", num_partitions=join_partitions(), on=("o_custkey",), right_on=("c_custkey",))
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="sum_total_cents")
    ).sort("c_mktsegment")


# ---------------- FetchStream (broadcast lookup-join) ----------------

def fetch_enrich(sf_dir: str) -> ray.data.Dataset:
    """Small-side broadcast enrichment ([U] .../io/stream/FetchStream.java):
    nation dim is ray.put once, read per actor — no shuffle."""
    nation = _read(sf_dir, "nation").to_pandas()
    # broadcast as sorted numpy arrays + searchsorted (never a Python
    # dict: per-task unpickle and per-row hash probes are superlinear —
    # BENCH/README broadcast lesson)
    order = np.argsort(nation["n_nationkey"].to_numpy())
    ref = ray.put(
        (
            nation["n_nationkey"].to_numpy()[order].astype(np.int64),
            nation["n_name"].to_numpy()[order].astype(object),
        )
    )

    class Enrich:
        def __init__(self):
            self.keys, self.names = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t.column("s_nationkey").to_numpy().astype(np.int64)
            pos = np.searchsorted(self.keys, k)
            return pa.table(
                {
                    "s_suppkey": t.column("s_suppkey"),
                    "n_name": pa.array(self.names[pos], type=pa.string()),
                    "acctbal_cents": _cents(t.column("s_acctbal")),
                }
            )

    return _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
        Enrich, batch_format="pyarrow", concurrency=pool_size()
    )


# ---------------- Left outer join ----------------

def left_outer_join(sf_dir: str) -> ray.data.Dataset:
    """Per-nation customer count + order count with zero-order customers
    kept via null-coalescing ([U] .../io/stream/LeftOuterJoinStream.java).
    The right side is pre-filtered to 'P'-status orders so some customers
    genuinely have no match."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .filter(lambda r: r["o_orderstatus"] == "P")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    joined = cust.join(orders, "left_outer", num_partitions=join_partitions(), on=("c_custkey",), right_on=("o_custkey",))

    def coalesce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "n_orders": pc.coalesce(t.column("n_orders"), pa.scalar(0, pa.int64())),
                "has_none": pc.cast(pc.is_null(t.column("n_orders")), pa.int64()),
            }
        )

    return (
        joined.map_batches(coalesce, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("n_orders", alias_name="sum_orders"),
            Sum("has_none", alias_name="n_zero_order_customers"),
        )
        .sort("c_nationkey")
    )


# ---------------- IntersectStream / ComplementStream (semi / anti) ----------------

def _order_custkeys(sf_dir: str, status: str = "O") -> np.ndarray:
    """Distinct custkeys having an order with the given status — the
    broadcast side of the semi/anti joins. Dedup happens DISTRIBUTED
    (map-side per-batch unique -> groupby); only the final distinct key
    array reaches the driver, as one sorted numpy array (if it ever
    outgrows a broadcast, switch these joins to Dataset.join)."""
    distinct = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.unique(
                        t.filter(pc.equal(t.column("o_orderstatus"), pa.scalar(status))).column(
                            "o_custkey"
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return np.sort(distinct["o_custkey"].to_numpy().astype(np.int64))


def semi_join_customers(sf_dir: str) -> ray.data.Dataset:
    """Semi join via broadcast key set ([U] .../io/stream/IntersectStream.java)."""
    ref = ray.put(_order_custkeys(sf_dir))

    class Semi:
        def __init__(self, keep: bool):
            self.keys = ray.get(ref)
            self.keep = keep

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t.column("c_custkey").to_numpy()
            pos = np.searchsorted(self.keys, k)
            pos = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos] == k
            return t.filter(pa.array(hit if self.keep else ~hit))

    return (
        _read(sf_dir, "customer", ["c_custkey"])
        .map_batches(Semi, fn_constructor_kwargs={"keep": True},
                     batch_format="pyarrow", concurrency=pool_size())
        .sort("c_custkey")
    )


def anti_join_customers(sf_dir: str) -> ray.data.Dataset:
    """Anti join ([U] .../io/stream/ComplementStream.java)."""
    ref = ray.put(_order_custkeys(sf_dir))

    class Anti:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t.column("c_custkey").to_numpy()
            pos = np.searchsorted(self.keys, k)
            pos = np.minimum(pos, len(self.keys) - 1)
            return t.filter(pa.array(self.keys[pos] != k))

    return (
        _read(sf_dir, "customer", ["c_custkey"])
        .map_batches(Anti, batch_format="pyarrow", concurrency=pool_size())
        .sort("c_custkey")
    )


# ---------------- MergeStream ----------------

def merge_sorted_names(sf_dir: str) -> ray.data.Dataset:
    """Merge of sorted streams ([U] .../io/stream/MergeStream.java):
    union + re-sort (Ray Data's equivalent shape)."""
    r = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"name": t.column("r_name")}), batch_format="pyarrow"
    )
    n = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"name": t.column("n_name")}), batch_format="pyarrow"
    )
    return r.union(n).sort("name")


# ---------------- CartesianProductStream (explode) ----------------

def cartesian_explode(sf_dir: str) -> ray.data.Dataset:
    """Explode multi-valued field ([U] .../io/stream/CartesianProductStream.java):
    p_type words -> one row per word -> counts."""

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t.column("p_type"), " ")
        flat = pc.list_flatten(words)
        return pa.table({"word": flat})

    return (
        _read(sf_dir, "part", ["p_type"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Count(alias_name="n"))
        .sort("word")
    )


# ---------------- Facets (terms + range/timeseries) ----------------

def facet_terms(sf_dir: str) -> ray.data.Dataset:
    """JSON Facet terms facet ([U] solr/core/.../search/facet/FacetField.java):
    counts per event_type."""
    return (
        _read(sf_dir, "events", ["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .sort("event_type")
    )


def taxonomy_facets(sf_dir: str) -> ray.data.Dataset:
    """Hierarchical (taxonomy) facet counts ([U] lucene/facet/.../taxonomy/
    TaxonomyFacetCounts.java): each part's p_type words form a category
    path; every document contributes a count to each ancestor node, so
    the output has one row per level-1 node and per level-1/level-2 node
    — the drill-down tree Solr's facet.pivot / Lucene's taxonomy index
    return.  One vectorized explode + one groupby shuffle."""

    def explode(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(pc.cast(t.column("p_type"), pa.string()), " ")
        l1 = pc.list_element(parts, 0)
        # level-2 node only for docs whose path is >= 2 deep
        has2 = pc.greater_equal(pc.list_value_length(parts), 2)
        l2 = pc.binary_join(pc.list_slice(parts, 0, 2), "/").filter(has2)
        return pa.table({"path": pa.concat_arrays([
            pc.cast(l1, pa.string()).combine_chunks(),
            pc.cast(l2, pa.string()).combine_chunks(),
        ])})

    return (
        _read(sf_dir, "part", ["p_type"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Count(alias_name="n"))
        .sort("path")
    )


def user_ltv_topk(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Per-user lifetime value — summed purchase cents, top-k (the LTV
    leaderboard; Solr-side: terms facet on user with a sum agg, stat
    sort). Exact cents per row before aggregation, one user-domain
    groupby, distributed sort + limit."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "cents": _cents(t.column("value"))})

    return (
        _read(sf_dir, "events", ["user_id", "value", "event_type"])
        .filter(expr='event_type == "purchase"')
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="ltv_cents"))
        .sort(["ltv_cents", "user_id"], descending=[True, False])
        .limit(k)
    )


def daily_unique_users(sf_dir: str) -> pa.Table:
    """Daily active users — distinct users per day window (the DAU
    rollup; Solr-side: unique() inside a range facet). Same two-stage
    distinct recipe as facet_unique_users with the day bucket as the
    facet key: (day, user) pairs pre-dedup map-side, one hash groupby
    dedups globally, day-domain count."""
    from ray.data.aggregate import Count

    def pairs(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(86_400_000_000)),
                          pa.scalar(86_400_000_000))
        tt = pa.table({"day_us": day, "user_id": t.column("user_id")})
        return tt.group_by(["day_us", "user_id"]).aggregate([])

    out = (
        _read(sf_dir, "events", ["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["day_us", "user_id"])
        .count()
        .groupby("day_us")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas().sort_values("day_us")
    )
    return pa.table({
        "day_us": pa.array(out["day_us"].astype(np.int64), pa.int64()),
        "n_users": pa.array(out["n_users"].astype(np.int64), pa.int64()),
    })


def value_outliers(sf_dir: str, n_sigma: int = 3) -> ray.data.Dataset:
    """Per-group z-score outlier flagging (the anomaly-detection pass an
    event warehouse runs; Solr-side cousin: stats + frange over the
    stats) kept EXACT: (v - mean)^2 > s^2 * var cross-multiplies to
    (n*v - sum)^2 > s^2 * (n*sumsq - sum^2), all int64 on cents — no
    float mean/stddev ever computed, so no boundary can flip. Two
    passes: group-domain moment partials broadcast, then a stateless
    flag pass."""
    from ray.data.aggregate import Sum

    def moments(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        tt = pa.table({"event_type": t.column("event_type"),
                       "one": pa.array(np.ones(t.num_rows, np.int64)),
                       "s": cents, "ss": pc.multiply(cents, cents)})
        return (pa.TableGroupBy(tt, ["event_type"])
                .aggregate([("one", "sum"), ("s", "sum"), ("ss", "sum")])
                .rename_columns(["event_type", "n", "s", "ss"]))

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    m = (ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
         .groupby("event_type")
         .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                    Sum("ss", alias_name="ss"))
         .to_pandas())
    stats = {r["event_type"]: (int(r["n"]), int(r["s"]), int(r["ss"]))
             for _, r in m.iterrows()}
    stats_ref = ray.put(stats)
    s2 = int(n_sigma) * int(n_sigma)

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False).astype(np.int64)
        types = t.column("event_type").to_pylist()
        ids = t.column("event_id").to_numpy().astype(np.int64)
        keep = np.zeros(len(ids), bool)
        for i, ty in enumerate(types):
            n, s, ss = st[ty]
            lhs = (n * int(cents[i]) - s) ** 2
            rhs = s2 * (n * ss - s * s)
            keep[i] = lhs > rhs
        return pa.table({"event_id": pa.array(ids[keep], pa.int64()),
                         "event_type": pa.array(
                             [ty for i, ty in enumerate(types) if keep[i]],
                             pa.string()),
                         "cents": pa.array(cents[keep], pa.int64())})

    return ds.map_batches(flag, batch_format="pyarrow").sort("event_id")


def facet_unique_users(sf_dir: str) -> pa.Table:
    """json.facet ``unique(field)`` inside a terms facet ([U] solr/core/
    .../search/facet/UniqueAgg.java): per event_type, the DISTINCT
    user count. Same scale recipe as uniqueBlock/group.facet: (type,
    user) pairs pre-dedup map-side, ONE hash groupby dedups globally,
    then a type-domain-sized count."""
    from ray.data.aggregate import Count

    pairs = (
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(
            lambda t: pa.table({
                "event_type": t.column("event_type"),
                "user_id": t.column("user_id"),
            }).group_by(["event_type", "user_id"]).aggregate([]),
            batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .count()
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas().sort_values("event_type")
    )
    return pa.table({
        "event_type": pa.array(pairs["event_type"].astype(str), pa.string()),
        "n_users": pa.array(pairs["n_users"].astype(np.int64), pa.int64()),
    })


def value_range_facet(sf_dir: str, width_cents: int = 2500) -> ray.data.Dataset:
    """DoubleRangeFacetCounts ([U] lucene/facet/.../range/
    DoubleRangeFacetCounts.java) over the float ``value`` column: fixed
    ranges on the exact-cents grid (the FIXTURES money rule — floats
    become cents per row BEFORE any bucketing, so boundaries can't
    float-flip), count + sum per range, NULLs in their own bucket (-1).
    One stateless pass of bucket partials, one bucket-domain groupby."""

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        c = cents.to_numpy(zero_copy_only=False)
        bucket = np.where(pd.isna(c), -1, np.floor_divide(
            np.nan_to_num(c, nan=0.0), width_cents)).astype(np.int64)
        cz = np.nan_to_num(c, nan=0.0).astype(np.int64)
        tt = pa.table({"bucket": pa.array(bucket, pa.int64()),
                       "one": pa.array(np.ones(len(bucket), np.int64)),
                       "sum_cents": pa.array(cz, pa.int64())})
        return (pa.TableGroupBy(tt, ["bucket"])
                .aggregate([("one", "sum"), ("sum_cents", "sum")])
                .rename_columns(["bucket", "n", "sum_cents"]))

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", ["value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
        .sort("bucket")
    )


def windowed_topk_types(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Continuous top-k over streaming windows (the ICDE'18/'19
    continuous top-k-frequent-items shape; Solr-side: a facet inside
    every range bucket): per day window, the k most frequent event
    types (count desc, type asc). One (day, type) groupby of map-side
    partials, then a per-window top-k map_groups — both exchanges are
    bucket-domain-sized."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.multiply(pc.divide(us, pa.scalar(86_400_000_000)),
                          pa.scalar(86_400_000_000))
        tt = pa.table({"day_us": day, "event_type": t.column("event_type"),
                       "one": pa.array(np.ones(t.num_rows, np.int64))})
        return (pa.TableGroupBy(tt, ["day_us", "event_type"])
                .aggregate([("one", "sum")])
                .rename_columns(["day_us", "event_type", "n"]))

    def topk(g) -> pa.Table:
        # plain-arrow output (no from_pandas: its schema metadata breaks
        # Ray's schema-hash dedup — the io_utils lesson)
        g = g.sort_values(["n", "event_type"], ascending=[False, True]).head(k)
        return pa.table({
            "day_us": pa.array(g["day_us"].to_numpy().astype(np.int64), pa.int64()),
            "win_rank": pa.array(np.arange(len(g), dtype=np.int64), pa.int64()),
            "event_type": pa.array(g["event_type"].astype(str), pa.string()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day_us", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("day_us")
        .map_groups(topk, batch_format="pandas")
        .sort(["day_us", "win_rank"])
    )


def timeseries_tz_facet(sf_dir: str, tz_offset_min: int = 330) -> ray.data.Dataset:
    """Range facet over time with a TZ offset ([U] solr/core/.../util/
    DateMathParser.java TZ handling; facet.range TZ param): day buckets
    computed in a non-UTC zone (+05:30 here) — the bucket boundary is
    the LOCAL midnight, so counts shift relative to the UTC facet.
    Bucketing is exact int64 microsecond arithmetic: shift, floor to
    day, shift back."""
    off_us = int(tz_offset_min) * 60_000_000
    day_us_const = 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        local = pc.add(us, pa.scalar(off_us))
        day_local = pc.multiply(pc.divide(local, pa.scalar(day_us_const)),
                                pa.scalar(day_us_const))
        day = pc.subtract(day_local, pa.scalar(off_us))
        return pa.table({"day_start_us": pc.cast(day, pa.int64())})

    return (
        _read(sf_dir, "events", ["ts"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("day_start_us")
        .aggregate(Count(alias_name="n"))
        .sort("day_start_us")
    )


def timeseries_facet(sf_dir: str) -> ray.data.Dataset:
    """Range facet over time ([U] .../io/stream/TimeSeriesStream.java):
    per-day buckets with count + sum(value cents)."""

    def bucketize(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day_us = pc.multiply(pc.divide(us, pa.scalar(86_400_000_000)), pa.scalar(86_400_000_000))
        return pa.table(
            {
                "day": pc.cast(day_us, pa.timestamp("us")),
                "value_cents": _cents(t.column("value")),
            }
        )

    return (
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="sum_value_cents"))
        .sort("day")
    )


# ---------------- significantTerms ----------------

def significant_terms(sf_dir: str) -> ray.data.Dataset:
    """Foreground-vs-background term counts
    ([U] solr/solrj/.../io/stream/SignificantTermsStream.java): documents
    with lang='en' as foreground; scoring ratio left to the caller
    (integer counts keep oracle comparison exact)."""

    def explode(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern_regex(t.column("text"), r"\s+"))
        return pa.table({"term": words})

    fg = (
        _read(sf_dir, "documents", ["text", "lang"])
        .filter(expr="lang == 'en'")
        .map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="fg"))
    )
    bg = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="bg"))
    )
    return bg.join(fg, "left_outer", num_partitions=join_partitions(), on=("term",)).map_batches(
        lambda t: pa.table(
            {
                "term": t.column("term"),
                "fg": pc.coalesce(t.column("fg"), pa.scalar(0, pa.int64())),
                "bg": t.column("bg"),
            }
        ),
        batch_format="pyarrow",
    ).sort("term")


def relatedness_facets(sf_dir: str, term: str = "merge") -> pa.Table:
    """JSON Facet API ``relatedness(fg, bg)`` — the Semantic Knowledge
    Graph bucket score ([U] solr/core/.../search/facet/RelatednessAgg.java;
    Grainger et al. 2016). Foreground = docs whose text contains ``term``,
    background = the whole corpus, buckets = ``lang``.

    Distributed shape: ONE pruned pass over (text, lang); each batch emits
    bucket-cardinality partial (fg, bg) count rows; a tiny groupby-Sum
    combines them; the z-score + sigmoid blend runs on the output-sized
    bucket table. Exactness: the formula uses only IEEE exactly-rounded
    float64 ops (+ - * / sqrt abs) in the IDENTICAL expression-tree order
    as the SQL oracle, then quantizes to micro units — bit-equal by
    construction (popularities use the BACKGROUND size denominator, as in
    Solr's implementation)."""

    def partial(t: pa.Table) -> pa.Table:
        sp = pc.split_pattern_regex(t.column("text"), r"\s+")
        flat = pc.list_flatten(sp)
        par = pc.list_parent_indices(sp).to_numpy(zero_copy_only=False)
        is_fg = np.zeros(len(t), dtype=np.int64)
        hit = par[pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)]
        is_fg[np.unique(hit)] = 1
        langs = np.asarray(t.column("lang").to_pylist())
        uniq, inv = np.unique(langs, return_inverse=True)
        fg = np.bincount(inv, weights=is_fg, minlength=len(uniq)).astype(np.int64)
        bg = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"lang": pa.array(uniq.tolist()), "fg_p": fg, "bg_p": bg})

    buckets = (
        _read(sf_dir, "documents", ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("fg_p", alias_name="fg_count"), Sum("bg_p", alias_name="bg_count"))
        .to_pandas()
    )
    fgc = buckets["fg_count"].to_numpy().astype(np.float64)
    bgc = buckets["bg_count"].to_numpy().astype(np.float64)
    bg_size = float(bgc.sum())
    fg_pop = fgc / bg_size
    bg_pop = bgc / bg_size
    denom = np.sqrt(bg_pop * (1.0 - bg_pop))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(denom > 0.0, (fg_pop - bg_pop) / denom, 0.0)

    def sig(z, off, scale):
        return (z + off) / (scale + np.abs(z + off))

    r = (0.2 * sig(z, -80.0, 50.0) + 0.2 * sig(z, -30.0, 30.0)
         + 0.2 * sig(z, 0.0, 30.0) + 0.2 * sig(z, 30.0, 30.0)
         + 0.2 * sig(z, 80.0, 50.0))
    micro = np.where(denom > 0.0, np.floor(r * 1000000.0 + 0.5), 0.0).astype(np.int64)
    out = pa.table({
        "lang": pa.array(buckets["lang"].tolist()),
        "fg_count": pa.array(buckets["fg_count"].to_numpy(), pa.int64()),
        "bg_count": pa.array(buckets["bg_count"].to_numpy(), pa.int64()),
        "relatedness_micro": pa.array(micro, pa.int64()),
    })
    order = np.lexsort((np.asarray(buckets["lang"], dtype=object), -micro))
    return out.take(pa.array(order, pa.int64()))


# ---------------- Grouping / field collapse ----------------

def collapse_top_order(sf_dir: str) -> ray.data.Dataset:
    """Field collapse: top-1 order per customer by (totalprice desc,
    orderkey asc) ([U] solr/core/.../search/CollapsingQParserPlugin.java,
    lucene/grouping)."""

    def top1(g: pd.DataFrame) -> pa.Table:
        # Arrow return: avoids pandas schema metadata in the sort shuffle
        g = g.sort_values(["total_cents", "o_orderkey"], ascending=[False, True])
        return pa.Table.from_pandas(g.head(1), preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("o_custkey").map_groups(top1, batch_format="pandas").sort("o_custkey")


def collapse_min_field(sf_dir: str) -> ray.data.Dataset:
    """CollapsingQParser with the ``min=`` head selector ([U] solr/core/
    .../search/CollapsingQParserPlugin.java min/max numeric collapse —
    distinct from the sort-based head): per customer keep the order with
    the MINIMUM totalprice (cents, orderkey asc tiebreak). Same
    group-keyed shuffle as the sort collapse; only the selector
    changes."""

    def min1(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["total_cents", "o_orderkey"], ascending=[True, True])
        return pa.Table.from_pandas(g.head(1), preserve_index=False) \
            .replace_schema_metadata(None)

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("o_custkey").map_groups(min1, batch_format="pandas").sort("o_custkey")


def stats_dates(sf_dir: str) -> ray.data.Dataset:
    """StatsComponent over a DATE field ([U] solr/core/.../handler/
    component/StatsValuesFactory.java date stats): per event_type the
    min/max timestamp and count — exact int64 microsecond extrema, the
    one stats flavor the numeric entries don't cover. Bucket-domain
    partials only."""
    from ray.data.aggregate import Count, Max, Min

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(to_us, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"),
                   Min("ts_us", alias_name="min_ts_us"),
                   Max("ts_us", alias_name="max_ts_us"))
        .sort("event_type")
    )


def grouping_topk(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Result grouping ([U] lucene/grouping/, Solr group.field with
    group.limit=k): top-k orders per customer by (totalprice desc,
    orderkey asc) with an in-group rank column — the general form of
    collapse (k=1)."""

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["total_cents", "o_orderkey"], ascending=[False, True]).head(k)
        g = g.assign(group_rank=np.arange(len(g), dtype=np.int64))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": _cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        ds.groupby("o_custkey")
        .map_groups(topk, batch_format="pandas")
        .sort(["o_custkey", "group_rank"])
    )


def expand_collapsed(sf_dir: str, page_size: int = 20, expand_rows: int = 2) -> pa.Table:
    """ExpandComponent ([U] solr/core/.../handler/component/
    ExpandComponent.java): after collapsing orders to the top-1 per
    customer, the expand section returns — for each group HEAD on the
    current page — the top ``expand_rows`` OTHER members of that group.

    Scale shape: the collapse itself is the distributed grouping_topk
    pass; only the page (``page_size`` heads, output-sized) lands on the
    driver; expansion filters the corpus by a BROADCAST page-key set
    inside map_batches (no second shuffle keyed on the full corpus) and
    re-groups only the surviving page groups."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": _cents(t.column("o_totalprice")),
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        project, batch_format="pyarrow"
    )

    def top1(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["total_cents", "o_orderkey"], ascending=[False, True])
        return pa.Table.from_pandas(g.head(1), preserve_index=False).replace_schema_metadata(None)

    heads = (
        ds.groupby("o_custkey")
        .map_groups(top1, batch_format="pandas")
        .sort(["total_cents", "o_orderkey"], descending=[True, False])
        .limit(page_size)
        .to_pandas()
    )  # the page: output-sized
    page_keys = np.sort(heads["o_custkey"].to_numpy())
    if len(page_keys) == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in
                         ("o_custkey", "o_orderkey", "total_cents", "expand_rank")})
    keys_ref = ray.put(page_keys)

    class _PageFilter:
        def __init__(self):
            self._keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").to_numpy()
            pos = np.searchsorted(self._keys, ck)
            pos = np.minimum(pos, len(self._keys) - 1)
            return t.filter(pa.array(self._keys[pos] == ck))

    def topn_rest(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["total_cents", "o_orderkey"], ascending=[False, True])
        g = g.iloc[1 : 1 + expand_rows]  # drop the head, keep the next N
        g = g.assign(expand_rank=np.arange(len(g), dtype=np.int64))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(_PageFilter, batch_format="pyarrow",
                       concurrency=pool_size())
        .groupby("o_custkey")
        .map_groups(topn_rest, batch_format="pandas")
        .sort(["o_custkey", "expand_rank"])
        .to_pandas()
    )
    return pa.table(
        {
            "o_custkey": pa.array(out["o_custkey"].to_numpy().astype(np.int64)),
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy().astype(np.int64)),
            "total_cents": pa.array(out["total_cents"].to_numpy().astype(np.int64)),
            "expand_rank": pa.array(out["expand_rank"].to_numpy().astype(np.int64)),
        }
    )


def pivot_facets(sf_dir: str) -> pa.Table:
    """3-level pivot faceting ([U] solr/core/.../handler/component/
    PivotFacetProcessor.java, facet.pivot=f1,f2,f3): the full pivot tree
    over (l_returnflag -> l_linestatus -> l_linenumber) with count +
    sum(qty cents) per node and the Solr default count-desc rank at
    every level (ties -> value asc).

    Scale shape: ONE map-side partial groupby on the 3-key tuple (the
    only corpus pass); the pivot tree itself is output-sized
    (|flags| x |status| x |linenumbers| ~ 42 rows), so the hierarchical
    ranking runs on the driver like every other output-sized step."""

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "l_linenumber": pc.cast(t.column("l_linenumber"), pa.int64()),
            "qty_cents": _cents(t.column("l_quantity")),
        })

    leaves = (
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_linenumber", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus", "l_linenumber"])
        .aggregate(Count(alias_name="n"), Sum("qty_cents", alias_name="sum_qty_cents"))
        .to_pandas()
    )  # output-sized pivot tree
    l1 = leaves.groupby("l_returnflag", as_index=False)["n"].sum()
    l1 = l1.sort_values(["n", "l_returnflag"], ascending=[False, True]).reset_index(drop=True)
    l1["rank1"] = np.arange(len(l1), dtype=np.int64)
    l2 = leaves.groupby(["l_returnflag", "l_linestatus"], as_index=False)["n"].sum()
    l2 = l2.sort_values(["l_returnflag", "n", "l_linestatus"],
                        ascending=[True, False, True]).reset_index(drop=True)
    l2["rank2"] = l2.groupby("l_returnflag").cumcount().astype("int64")
    out = leaves.sort_values(
        ["l_returnflag", "l_linestatus", "n", "l_linenumber"],
        ascending=[True, True, False, True]).reset_index(drop=True)
    out["rank3"] = out.groupby(["l_returnflag", "l_linestatus"]).cumcount().astype("int64")
    out = out.merge(l1[["l_returnflag", "rank1"]], on="l_returnflag")
    out = out.merge(l2[["l_returnflag", "l_linestatus", "rank2"]],
                    on=["l_returnflag", "l_linestatus"])
    out = out.sort_values(["rank1", "rank2", "rank3"]).reset_index(drop=True)
    return pa.table({
        "rank1": pa.array(out["rank1"].to_numpy().astype(np.int64)),
        "rank2": pa.array(out["rank2"].to_numpy().astype(np.int64)),
        "rank3": pa.array(out["rank3"].to_numpy().astype(np.int64)),
        "l_returnflag": pa.array(out["l_returnflag"].astype(str)),
        "l_linestatus": pa.array(out["l_linestatus"].astype(str)),
        "l_linenumber": pa.array(out["l_linenumber"].to_numpy().astype(np.int64)),
        "n": pa.array(out["n"].to_numpy().astype(np.int64)),
        "sum_qty_cents": pa.array(out["sum_qty_cents"].to_numpy().astype(np.int64)),
    })


def scored_join_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """JoinUtil.createJoinQuery with ScoreMode.Max ([U] lucene/join/.../
    JoinUtil.java): join lineitem -> orders on orderkey where each
    order's joined score is the MAX per-line revenue
    (floor(extendedprice*(1-discount)*100+0.5) cents, IEEE-deterministic
    both sides); top-k orders by joined score, ties orderkey asc.

    Map-side partial max per (batch, orderkey) -> groupby Max -> per-batch
    partial top-k -> output-sized driver merge. The orders side needs no
    shuffle at all: orderkey is already the join identity."""

    def partial(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        key = t.column("l_orderkey").to_numpy().astype(np.int64)
        df = pd.DataFrame({"o_orderkey": key, "rev": rev})
        g = df.groupby("o_orderkey", sort=False)["rev"].max().reset_index()
        return pa.table({
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(), pa.int64()),
            "score_cents": pa.array(g["rev"].to_numpy().astype(np.int64), pa.int64()),
        })

    agg = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Max("score_cents", alias_name="score_cents"))
        .sort(["score_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    agg = agg.reset_index(drop=True)
    return pa.table({
        "rank": pa.array(np.arange(len(agg), dtype=np.int64)),
        "o_orderkey": pa.array(agg["o_orderkey"].to_numpy().astype(np.int64)),
        "score_cents": pa.array(agg["score_cents"].to_numpy().astype(np.int64)),
    })


def scored_join_modes(sf_dir: str, mode: str = "avg", k: int = 20) -> pa.Table:
    """JoinUtil ScoreMode.{Total, Avg, Min} ([U] lucene/join/.../
    ScoreMode.java — completes the family next to scored_join_topk's
    Max): per-order joined score over per-line revenue cents. Exact
    integers throughout — Avg is floor(total_cents * 1000 / n_lines)
    milli-cents (integer division, order-independent), so the SQL oracle
    hashes identically. Same scale shape as Max: map-side partial
    (sum, n, min) per orderkey -> groupby combine -> in-plane sort+limit;
    the orders table itself never ships."""
    if mode not in ("total", "avg", "min"):
        raise ValueError(f"scored_join_modes: unknown mode {mode!r}")

    def partial(t: pa.Table) -> pa.Table:
        ep = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.floor(ep * (1 - disc) * 100 + 0.5).astype(np.int64)
        key = t.column("l_orderkey").to_numpy().astype(np.int64)
        df = pd.DataFrame({"o_orderkey": key, "rev": rev})
        g = df.groupby("o_orderkey", sort=False)["rev"].agg(["sum", "count", "min"]).reset_index()
        return pa.table({
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(), pa.int64()),
            "s": pa.array(g["sum"].to_numpy().astype(np.int64), pa.int64()),
            "n": pa.array(g["count"].to_numpy().astype(np.int64), pa.int64()),
            "mn": pa.array(g["min"].to_numpy().astype(np.int64), pa.int64()),
        })

    def score(t: pa.Table) -> pa.Table:
        total = t.column("total_cents").to_numpy()
        n = t.column("n_lines").to_numpy()
        if mode == "total":
            sc = total
        elif mode == "min":
            sc = t.column("min_cents").to_numpy()
        else:
            sc = (total * 1000) // n
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "score": pa.array(sc.astype(np.int64), pa.int64()),
            "n_lines": pa.array(n.astype(np.int64), pa.int64()),
        })

    agg = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("s", alias_name="total_cents"), Sum("n", alias_name="n_lines"),
                   Min("mn", alias_name="min_cents"))
        .map_batches(score, batch_format="pyarrow")
        .sort(["score", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .reset_index(drop=True)
    )
    return pa.table({
        "rank": pa.array(np.arange(len(agg), dtype=np.int64)),
        "o_orderkey": pa.array(agg["o_orderkey"].to_numpy().astype(np.int64)),
        "score": pa.array(agg["score"].to_numpy().astype(np.int64)),
        "n_lines": pa.array(agg["n_lines"].to_numpy().astype(np.int64)),
    })


def grouping_by_query(sf_dir: str, k: int = 3) -> pa.Table:
    """Result grouping with ``group.query`` ([U] solr/core/.../search/
    Grouping.java, the query command): each group.query predicate forms
    one group; top-k docs per group by (n_chars desc, doc_id asc). ONE
    pruned corpus pass evaluates every group's predicate per batch and
    emits per-group top-k partials — O(batches * groups * k) exchange,
    output-sized driver combine."""
    import pyarrow.compute as _pc

    def has(t, term):
        sp = _pc.split_pattern_regex(t.column("text"), r"\s+")
        flat = _pc.list_flatten(sp)
        par = _pc.list_parent_indices(sp).to_numpy(zero_copy_only=False)
        m = np.zeros(t.num_rows, bool)
        m[np.unique(par[_pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)])] = True
        return m

    gdefs = [
        ("merge+join", lambda t: has(t, "merge") & has(t, "join")),
        ("vector", lambda t: has(t, "vector")),
    ]

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        nc = t.column("n_chars").to_numpy()
        gs, ds, ns = [], [], []
        for name, fn in gdefs:
            m = fn(t)
            gi, gn = ids[m], nc[m]
            order = np.lexsort((gi, -gn))[:k]
            gs.extend([name] * len(order))
            ds.extend(gi[order].tolist())
            ns.extend(gn[order].tolist())
        return pa.table({"grp": pa.array(gs, pa.string()),
                         "doc_id": pa.array(ds, pa.int64()),
                         "n_chars": pa.array(ns, pa.int64())})

    parts = (
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for name, _ in gdefs:
        g = parts[parts["grp"] == name]
        order = np.lexsort((g["doc_id"].to_numpy(), -g["n_chars"].to_numpy()))[:k]
        for rank, idx in enumerate(order):
            rows.append((name, rank, int(g["doc_id"].iloc[idx]), int(g["n_chars"].iloc[idx])))
    return pa.table({
        "grp": pa.array([r[0] for r in rows], pa.string()),
        "rank": pa.array([r[1] for r in rows], pa.int64()),
        "doc_id": pa.array([r[2] for r in rows], pa.int64()),
        "n_chars": pa.array([r[3] for r in rows], pa.int64()),
    })


def facet_queries(sf_dir: str) -> pa.Table:
    """Solr ``facet.query`` ([U] solr/core/.../handler/component/
    FacetComponent.java): counts for a fixed list of arbitrary predicate
    facets, all evaluated in ONE corpus pass — each map batch emits a
    partial count vector (one int per facet query), combined by a tiny
    output-sized aggregation. No shuffle of row data at all."""
    qdefs = [
        ("type_purchase", lambda t: pc.equal(t.column("event_type"), "purchase")),
        ("value_ge_100", lambda t: pc.greater_equal(_cents(t.column("value")), 10_000)),
        ("jan_2024", lambda t: pc.and_(
            pc.greater_equal(t.column("ts"), pa.scalar(np.datetime64("2024-01-01", "us"))),
            pc.less(t.column("ts"), pa.scalar(np.datetime64("2024-02-01", "us"))))),
        ("purchase_over_50", lambda t: pc.and_(
            pc.equal(t.column("event_type"), "purchase"),
            pc.greater_equal(_cents(t.column("value")), 5_000))),
    ]

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "facet": pa.array([name for name, _ in qdefs]),
            "n": pa.array([int(pc.sum(pc.cast(fn(t), pa.int64())).as_py() or 0)
                           for name, fn in qdefs], pa.int64()),
        })

    return pa.Table.from_pandas(
        _read(sf_dir, "events", ["event_type", "value", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("facet")
        .aggregate(Sum("n", alias_name="n_docs"))
        .sort("facet")
        .to_pandas(),
        preserve_index=False,
    ).replace_schema_metadata(None)


# ---------------- percentile (exact, via value-count compaction) ----------------

def percentile_disc(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95)) -> pa.Table:
    """Discrete percentiles of l_quantity ([U] solr/core/.../search/facet/
    PercentileAgg.java). Distributed shape: per-value counts (tiny domain)
    -> driver cumsum -> quantile_disc semantics (first value with cumulative
    fraction >= q)."""
    counts = (
        _read(sf_dir, "lineitem", ["l_quantity"])
        .map_batches(lambda t: pa.table({"qty": _cents(t.column("l_quantity"))}), batch_format="pyarrow")
        .groupby("qty")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("qty")
    )
    total = counts["n"].sum()
    cum = counts["n"].cumsum()
    rows = []
    for q in qs:
        target = q * total
        idx = int(np.searchsorted(cum.to_numpy(), target, side="left"))
        rows.append({"q_milli": int(round(q * 1000)), "qty": int(counts["qty"].iloc[idx])})
    return pa.Table.from_pylist(rows)


# ---------------- unique counts ----------------

def unique_counts(sf_dir: str) -> pa.Table:
    """Exact distinct counts ([U] solr/core/.../search/facet/UniqueAgg.java)."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    n_users = ev.groupby("user_id").aggregate(Count()).count()
    n_types = ev.groupby("event_type").aggregate(Count()).count()
    return pa.Table.from_pylist([{"n_users": int(n_users), "n_types": int(n_types)}])


# ---------------- scalar function queries (SURVEY §2.10) ----------------

def scalar_functions(sf_dir: str) -> ray.data.Dataset:
    """Solr function-query kernels ([U] solr/core/.../search/function/):
    abs/sqrt/ln/upper/concat as pyarrow.compute calls. Float results are
    rounded to milli-units with FLOOR(x*1000+0.5) on both sides; libm
    differences (<= 1 ulp) cannot cross a half-milli boundary here."""

    def fn(t: pa.Table) -> pa.Table:
        size = pc.cast(t.column("p_size"), pa.float64())
        price = pc.cast(t.column("p_retailprice"), pa.float64())
        milli = lambda arr: pc.cast(
            pc.floor(pc.add(pc.multiply(arr, pa.scalar(1000.0)), pa.scalar(0.5))), pa.int64()
        )
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "abs_size": pc.cast(pc.abs(pc.subtract(t.column("p_size"), pa.scalar(25, pa.int32()))), pa.int64()),
                "sqrt_milli": milli(pc.sqrt(size)),
                "ln_milli": milli(pc.ln(price)),
                "upper_brand": pc.utf8_upper(t.column("p_brand")),
                "brand_type": pc.binary_join_element_wise(
                    t.column("p_brand"), t.column("p_type"), ":"
                ),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice", "p_brand", "p_type"]).map_batches(
        fn, batch_format="pyarrow"
    ).sort("p_partkey")


def date_functions(sf_dir: str) -> ray.data.Dataset:
    """Date-math kernels (Solr date math NOW/DAY+7DAYS analogue):
    extract year/month + timestamp arithmetic."""

    def fn(t: pa.Table) -> pa.Table:
        ts = t.column("o_orderdate")
        plus7 = pc.add(pc.cast(ts, pa.int64()), pa.scalar(7 * 86_400_000_000))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "yr": pc.cast(pc.year(ts), pa.int64()),
                "mo": pc.cast(pc.month(ts), pa.int64()),
                "plus7": pc.cast(plus7, pa.timestamp("us")),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        fn, batch_format="pyarrow"
    ).sort("o_orderkey")


def export_sorted(sf_dir: str, out_dir: str | None = None) -> ray.data.Dataset:
    """/export-style sorted bulk export ([U] solr/core/.../handler/export/
    ExportWriter.java): project the needed columns at the read, globally
    sort, write partitioned Parquet (resumable multi-file output — never
    one giant file), and return the exported rows read back from disk."""
    import hashlib
    import shutil

    if out_dir is None:
        key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/tmp/lsr_export/{key}"
    shutil.rmtree(out_dir, ignore_errors=True)
    (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .write_parquet(out_dir)
    )
    return read_parquet_clean(out_dir).sort(["n_chars", "doc_id"], descending=[True, False])


def export_jsonl(sf_dir: str, out_dir: str | None = None) -> ray.data.Dataset:
    """/export wt=json — the ExportWriter's JSON output path ([U]
    solr/core/.../handler/export/ExportWriter.java writeDocs as JSON):
    pruned column read -> global sort -> newline-delimited JSON files
    (one per block — resumable multi-file output), returned as the rows
    READ BACK from the written JSONL so the gate verifies the sink
    round-trip, not just the in-memory frame."""
    import hashlib
    import shutil

    if out_dir is None:
        key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/tmp/lsr_export_jsonl/{key}"
    shutil.rmtree(out_dir, ignore_errors=True)
    (
        _read(sf_dir, "documents", ["doc_id", "lang", "source"])
        .sort("doc_id")
        .write_json(out_dir)
    )

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.compute.cast(t.column("doc_id"), pa.int64()),
            "lang": pa.compute.cast(t.column("lang"), pa.string()),
            "source": pa.compute.cast(t.column("source"), pa.string()),
        })

    return (
        ray.data.read_json(out_dir)
        .map_batches(norm, batch_format="pyarrow")
        .sort("doc_id")
    )


def export_csv(sf_dir: str, out_dir: str | None = None) -> ray.data.Dataset:
    """/export wt=csv — the CSVResponseWriter sink path ([U]
    solr/core/.../response/CSVResponseWriter.java over ExportWriter's
    sorted stream): pruned column read -> global sort -> multi-file CSV
    (resumable shape), returned as the rows READ BACK from the written
    files so the gate verifies the sink round-trip."""
    import hashlib
    import shutil

    if out_dir is None:
        key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
        out_dir = f"/tmp/lsr_export_csv/{key}"
    shutil.rmtree(out_dir, ignore_errors=True)
    (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .sort("doc_id")
        .write_csv(out_dir)
    )

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "lang": pc.cast(t.column("lang"), pa.string()),
            "n_chars": pc.cast(t.column("n_chars"), pa.int64()),
        })

    return (
        ray.data.read_csv(out_dir)
        .map_batches(norm, batch_format="pyarrow")
        .sort("doc_id")
    )


def deterministic_sample(sf_dir: str, pct: int = 10) -> ray.data.Dataset:
    """RandomStream analogue ([U] solr/core/.../search/RandomStream.java)
    made reproducible: multiplicative-hash sampling on doc_id (exact
    integer arithmetic, identical in SQL) instead of an RNG."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = (ids * 2654435761) % 4294967296 < (4294967296 * pct) // 100
        return t.filter(pa.array(keep))

    return _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        fn, batch_format="pyarrow"
    ).sort("doc_id")


def sample_fixed_k(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Fixed-size-k distributed sample — the bottom-k-by-hash-priority
    sketch (the mergeable equivalent of reservoir sampling; Cohen &
    Kaplan 2007 bottom-k). Priority = md5-64(doc_id); each batch keeps
    only its k smallest priorities (np.partition), so the final exchange
    is O(batches x k) rows, then one output-sized sort+limit. Unlike
    pct-sampling the result size is exactly min(k, n) at any corpus
    scale, and partials merge associatively (union -> bottom-k)."""
    import hashlib

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        pri = np.empty(len(ids), np.uint64)
        for i, d in enumerate(ids):
            pri[i] = int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:8], "little")
        if len(ids) > k:
            keep = np.argpartition(pri, k)[:k]
            ids, pri = ids[keep], pri[keep]
        # uint64 -> shifted int64 so Arrow/DuckDB compare identically
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "priority": pa.array((pri - np.uint64(1 << 63)).view(np.int64))})

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .sort("priority")
        .limit(k)
    )


def child_doc_transform(sf_dir: str, status: str = "P", min_qty: int = 30,
                        n_parents: int = 20, limit: int = 3) -> pa.Table:
    """[child] / [subquery] document transformers ([U] solr/core/.../
    response/transform/ChildDocTransformerFactory.java +
    SubQueryAugmenterFactory.java): each parent result row is augmented
    with its child documents, filtered by childFilter, ordered, and
    capped at ``limit`` per parent.

    Scale shape: the parent result is page-sized by construction (a
    result page), so its key set broadcasts into a PUSHED child-table
    filter — one pruned scan of the child columns, then an output-sized
    per-parent head-k; no shuffle at any corpus size."""
    import pyarrow.dataset as pads

    p = (_read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
         .map_batches(
             lambda t: t.filter(pc.equal(t.column("o_orderstatus"), status))
                        .select(["o_orderkey"]),
             batch_format="pyarrow")
         .sort("o_orderkey").limit(n_parents).to_pandas())
    pk = p["o_orderkey"].to_numpy().astype(np.int64)
    c = pads.dataset(f"{sf_dir}/lineitem.parquet", format="parquet").to_table(
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"],
        filter=(pc.field("l_orderkey").isin(pa.array(pk))
                & (pc.field("l_quantity") >= min_qty)))
    ok = c.column("l_orderkey").to_numpy().astype(np.int64)
    ln = c.column("l_linenumber").to_numpy().astype(np.int64)
    sk = c.column("l_suppkey").to_numpy().astype(np.int64)
    order = np.lexsort((ln, ok))  # (parent, child order)
    ok, ln, sk = ok[order], ln[order], sk[order]
    starts = np.r_[0, np.flatnonzero(np.diff(ok)) + 1]
    occ = np.arange(len(ok)) - np.repeat(starts, np.diff(np.r_[starts, len(ok)]))
    keep = occ < limit
    return pa.table({
        "o_orderkey": pa.array(ok[keep], pa.int64()),
        "child_rank": pa.array(occ[keep], pa.int64()),
        "l_linenumber": pa.array(ln[keep], pa.int64()),
        "l_suppkey": pa.array(sk[keep], pa.int64()),
    })


def stratified_sample(sf_dir: str, k: int = 20,
                      group: str = "lang") -> ray.data.Dataset:
    """Stratified fixed-k-per-group sample — the per-stratum bottom-k
    priority sketch (language-balanced subcorpus selection for training
    mixes). Each batch keeps only its k smallest md5 priorities PER
    GROUP, so the exchange is O(batches x groups x k) rows regardless of
    corpus size; the final per-group head-k runs on that output-sized
    table. Deterministic and resume-identical — re-running selects the
    same docs."""
    import hashlib

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        gv = np.asarray(t.column(group).to_pylist(), object)
        pri = np.empty(len(ids), np.uint64)
        for i, d in enumerate(ids):
            pri[i] = int.from_bytes(
                hashlib.md5(str(int(d)).encode()).digest()[:8], "little")
        keep_idx = []
        codes = np.unique(gv, return_inverse=True)[1]
        for c in np.unique(codes):
            rows = np.flatnonzero(codes == c)
            if len(rows) > k:
                rows = rows[np.argpartition(pri[rows], k)[:k]]
            keep_idx.append(rows)
        sel = np.concatenate(keep_idx) if keep_idx else np.empty(0, np.int64)
        return pa.table({
            group: pa.array(gv[sel], pa.string()),
            "doc_id": pa.array(ids[sel], pa.int64()),
            "priority": pa.array(
                (pri[sel] - np.uint64(1 << 63)).view(np.int64)),
        })

    def head_k(t: pa.Table) -> pa.Table:  # one group, priority-sorted rows
        order = pc.sort_indices(t, sort_keys=[("priority", "ascending")])
        return t.take(order[:k])

    return (
        _read(sf_dir, "documents", ["doc_id", group])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group)
        .map_groups(head_k, batch_format="pyarrow")
        .sort([group, "priority"])
    )


# ---------------- cursorMark deep paging ----------------

def cursor_mark_pages(sf_dir: str, page_size: int = 50, n_pages: int = 3) -> pa.Table:
    """cursorMark deep paging ([U] solr/solrj/.../params/CursorMarkParams,
    solr/core/.../search/CursorMark.java): stateless deep pagination over
    a total sort order (n_chars DESC, doc_id ASC — doc_id is the uniqueKey
    tie-break Solr requires). Each page is an INDEPENDENT distributed
    query: filter strictly-after-cursor (pushed into the scan) -> sort ->
    limit(page_size); the cursor is the last row's sort key. No page ever
    re-reads rows an earlier page returned, and unlike start=N paging no
    page sorts more than (page worth + candidates) rows on the driver."""
    cursor = None  # (n_chars, doc_id) of the last row served
    out_pages = []
    for page in range(n_pages):
        ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
        if cursor is not None:
            c_n, c_d = cursor

            def after(t: pa.Table, c_n=c_n, c_d=c_d) -> pa.Table:
                n = t.column("n_chars")
                d = t.column("doc_id")
                keep = pc.or_(
                    pc.less(n, pa.scalar(c_n)),
                    pc.and_(pc.equal(n, pa.scalar(c_n)), pc.greater(d, pa.scalar(c_d))),
                )
                return t.filter(keep)

            ds = ds.map_batches(after, batch_format="pyarrow", zero_copy_batch=True)
        rows = (
            ds.sort(["n_chars", "doc_id"], descending=[True, False])
            .limit(page_size)
            .to_pandas()
        )
        if len(rows) == 0:
            break
        cursor = (int(rows["n_chars"].iloc[-1]), int(rows["doc_id"].iloc[-1]))
        out_pages.append(pa.table({
            "page": pa.array(np.full(len(rows), page), pa.int64()),
            "page_rank": pa.array(np.arange(len(rows)), pa.int64()),
            "doc_id": pa.array(rows["doc_id"].to_numpy(), pa.int64()),
            "n_chars": pa.array(rows["n_chars"].to_numpy(), pa.int64()),
        }))
    return pa.concat_tables(out_pages)


# ---------------- JSON Facet nested subfacets ----------------

def facet_nested(sf_dir: str, top_langs: int = 3, top_sources: int = 2) -> pa.Table:
    """Nested JSON facets ([U] solr/core/.../search/facet/FacetField.java
    subfacets): terms facet on ``lang`` (top-N buckets by count desc,
    value asc) with a nested terms subfacet on ``source`` (top-M per lang
    bucket) carrying count + sum(n_chars) metrics.

    Scale shape: ONE map-side partial groupby (lang, source) inside
    map_batches shrinks the exchange to |langs|x|sources| rows per block
    before the distributed combine; bucket selection (top-N / top-M)
    happens on the combined facet table, which is cardinality-sized, not
    corpus-sized."""

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "lang": t.column("lang"), "source": t.column("source"),
            "n_chars": t.column("n_chars"),
        }).to_pandas()
        g = df.groupby(["lang", "source"], as_index=False).agg(
            cnt=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).cast(pa.schema([
            ("lang", pa.string()), ("source", pa.string()),
            ("cnt", pa.int64()), ("sum_chars", pa.int64()),
        ]))

    combined = (
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("sum_chars", alias_name="sum_chars"))
        .to_pandas()
    )
    # bucket selection on the facet table (cardinality-sized)
    lang_tot = combined.groupby("lang", as_index=False)["cnt"].sum()
    lang_tot = lang_tot.sort_values(["cnt", "lang"], ascending=[False, True]).head(top_langs)
    keep = combined[combined["lang"].isin(lang_tot["lang"])].copy()
    keep = keep.sort_values(["lang", "cnt", "source"], ascending=[True, False, True])
    keep["sub_rank"] = keep.groupby("lang").cumcount()
    keep = keep[keep["sub_rank"] < top_sources]
    keep = keep.merge(lang_tot.rename(columns={"cnt": "lang_count"}), on="lang")
    keep = keep.sort_values(["lang_count", "lang", "sub_rank"],
                            ascending=[False, True, True])
    return pa.table({
        "lang": pa.array(keep["lang"].tolist(), pa.string()),
        "lang_count": pa.array(keep["lang_count"].to_numpy(), pa.int64()),
        "source": pa.array(keep["source"].tolist(), pa.string()),
        "sub_rank": pa.array(keep["sub_rank"].to_numpy(), pa.int64()),
        "sub_count": pa.array(keep["cnt"].to_numpy(), pa.int64()),
        "sub_sum_chars": pa.array(keep["sum_chars"].to_numpy(), pa.int64()),
    })


# ---------------- interval facets (facet.interval) ----------------

def facet_intervals(sf_dir: str, field: str = "n_chars",
                    intervals=((0, 99), (100, 249), (250, 1_000_000_000))) -> pa.Table:
    """Interval faceting ([U] solr/core/.../request/IntervalFacets.java —
    facet.interval with arbitrary [lo,hi] sets, unlike facet.range's
    uniform gap): per-batch counts against the interval bounds via
    searchsorted, output-sized combine, zero row shuffle (the
    facet_queries one-pass shape)."""
    iv = [(int(lo), int(hi)) for lo, hi in intervals]

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy().astype(np.int64)
        counts = np.array([int(((v >= lo) & (v <= hi)).sum()) for lo, hi in iv],
                          dtype=np.int64)
        return pa.table({"ivl": pa.array(np.arange(len(iv), dtype=np.int64)),
                         "n": pa.array(counts)})

    from ray.data.aggregate import Sum

    out = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=[field])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ivl").aggregate(Sum("n", alias_name="n_docs"))
        .sort("ivl")
        .to_pandas()
    )
    labels = [f"[{lo},{hi}]" for lo, hi in iv]
    got = dict(zip(out["ivl"].astype(int), out["n_docs"].astype(int)))
    return pa.table({
        "interval": pa.array(labels, pa.string()),
        "n_docs": pa.array([got.get(i, 0) for i in range(len(iv))], pa.int64()),
    })


# ---------------- ToChildBlockJoin ----------------

def tochild_block_join(sf_dir: str, status: str = "F", min_qty: int = 45) -> ray.data.Dataset:
    """ToChildBlockJoinQuery ([U] lucene/join/.../ToChildBlockJoinQuery.java):
    parent filter -> matching CHILDREN (the inverse of the collapse-style
    ToParent join): lineitems with l_quantity >= min_qty whose parent
    order has the given status. Children are filtered BEFORE the join so
    the exchange carries only candidate child keys; parents ship only
    their join key."""
    parents = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).filter(
        lambda r: r["o_orderstatus"] == status
    ).map_batches(lambda t: t.select(["o_orderkey"]), batch_format="pyarrow")
    children = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]).filter(
        lambda r: r["l_quantity"] >= min_qty
    )
    joined = children.join(parents, "inner", num_partitions=join_partitions(),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    return joined.map_batches(
        lambda t: t.select(["l_orderkey", "l_linenumber"]), batch_format="pyarrow"
    ).sort(["l_orderkey", "l_linenumber"])


def range_facet_other(sf_dir: str, field: str = "n_chars", start: int = 100,
                      end: int = 400, gap: int = 100) -> ray.data.Dataset:
    """facet.range with the ``other`` buckets ([U] solr/core/.../request/
    SimpleFacets.java + RangeFacetProcessor FacetRangeOther.ALL): the gap
    buckets inside [start, end) plus BEFORE (< start), AFTER (>= end) and
    BETWEEN (the in-range total). One pruned single-column read,
    bucket-labelled map-side partials, bucket-count-sized combine;
    BETWEEN is derived from the bucket counts in the final output-sized
    stage (never a second pass)."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.io_utils import read_parquet_clean

    n_buckets = (end - start) // gap

    def label(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy().astype(np.int64)
        idx = (v - start) // gap
        lab = np.where(v < start, "before",
                       np.where(v >= end, "after",
                                np.char.add("r", idx.astype(str))))
        return pa.table({"bucket": pa.array(lab.astype(object), pa.string()),
                         "n": pa.array(np.ones(len(v), np.int64))})

    ds = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=[field])
        .map_batches(label, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        # output-sized: add the BETWEEN row and the bucket's range bounds
        buckets = t.column("bucket").to_pylist()
        counts = dict(zip(buckets, t.column("n").to_pylist()))
        rows = [("before", int(counts.get("before", 0)))]
        between = 0
        for i in range(n_buckets):
            c = int(counts.get(f"r{i}", 0))
            between += c
            rows.append((f"r{i}", c))
        rows.append(("after", int(counts.get("after", 0))))
        rows.append(("between", between))
        return pa.table({"bucket": pa.array([r[0] for r in rows], pa.string()),
                         "n": pa.array([r[1] for r in rows], pa.int64())})

    return ds.repartition(1).map_batches(finish, batch_format="pyarrow")


def facet_multiselect_ex(sf_dir: str, min_chars: int = 200,
                         tag_lang: str = "en") -> pa.Table:
    """Multi-select faceting with tagged-filter exclusion ([U]
    solr/core/.../search/facet/FacetProcessor.java `excludeTags` +
    QueryParsing localparams {!tag=}/ex=): fq1 = {!tag=L}lang:en,
    fq2 = n_chars>=min_chars; the `lang` facet EXCLUDES its own tagged
    filter (so every language bucket stays visible while one is
    selected — the e-commerce multi-select pattern) and the `source`
    facet applies the full filter set.

    Scale shape: ONE corpus pass — each batch evaluates both masks and
    emits tiny (facet_field, bucket, n) partials; combine is a
    bucket-domain-sized groupby. No row data is shuffled."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        base = pc.greater_equal(t.column("n_chars"), pa.scalar(min_chars))
        tagged = pc.equal(t.column("lang"), tag_lang)
        out = []
        # lang facet: ex=L drops the lang filter; domain = base only
        g = (t.filter(base).select(["lang"])
              .group_by("lang").aggregate([([], "count_all")]))
        out.append(pa.table({
            "facet_field": pa.array(["lang"] * g.num_rows, pa.string()),
            "bucket": g.column("lang").cast(pa.string()),
            "n": g.column("count_all").cast(pa.int64()),
        }))
        # source facet: full filter set (base AND tagged)
        g = (t.filter(pc.and_(base, tagged)).select(["source"])
              .group_by("source").aggregate([([], "count_all")]))
        out.append(pa.table({
            "facet_field": pa.array(["source"] * g.num_rows, pa.string()),
            "bucket": g.column("source").cast(pa.string()),
            "n": g.column("count_all").cast(pa.int64()),
        }))
        return pa.concat_tables(out)

    def finish(t: pa.Table) -> pa.Table:
        # single combined key so the tiny combine is ONE groupby
        df = t.to_pandas().groupby(["facet_field", "bucket"], as_index=False)["n"].sum()
        df = df.sort_values(["facet_field", "bucket"]).reset_index(drop=True)
        return pa.table({
            "facet_field": pa.array(df["facet_field"], pa.string()),
            "bucket": pa.array(df["bucket"], pa.string()),
            "n_docs": pa.array(df["n"].astype(np.int64), pa.int64()),
        })

    return (
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


ENUM_PRIORITY = ("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW", "4-NOT SPECIFIED")


def enum_field_sort(sf_dir: str) -> pa.Table:
    """EnumFieldType ordering ([U] solr/core/.../schema/EnumFieldType.java
    + enumsConfig.xml): a string field orders by its CONFIGURED ordinal,
    not lexicographically — this config pins 5-LOW BEFORE 4-NOT
    SPECIFIED, so the enum order provably diverges from the string
    order. Output = per-value counts in enum order with the ordinal a
    sort on this field would use. One bucket-domain groupby; the enum
    map is config-sized."""
    from ray.data.aggregate import Count

    ordinal = {v: i for i, v in enumerate(ENUM_PRIORITY)}
    counts = (
        _read(sf_dir, "orders", ["o_orderpriority"])
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .to_pandas()
    )
    counts["ordinal"] = counts["o_orderpriority"].map(ordinal).astype(np.int64)
    counts = counts.sort_values("ordinal")
    return pa.table({
        "ordinal": pa.array(counts["ordinal"].to_numpy(), pa.int64()),
        "o_orderpriority": pa.array(counts["o_orderpriority"].astype(str), pa.string()),
        "n_orders": pa.array(counts["n_orders"].astype(np.int64), pa.int64()),
    })


def props_json_facet(sf_dir: str, key: str = "k", bucket: int = 10) -> ray.data.Dataset:
    """Facet over a field extracted from an untyped JSON payload column
    (the semi-structured-ingest role Solr fills with schemaless/dynamic
    fields + the JSON update path): parse ``props`` per batch, bucket
    the integer value by ``bucket``, count per bucket. JSON decode is
    per-batch inside map_batches (stateless); the exchange is
    bucket-domain-sized partials."""
    import json

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for p in t.column("props").to_pylist():
            try:
                v = json.loads(p).get(key)
            except (TypeError, ValueError):
                v = None
            b = -1 if v is None else int(v) // bucket
            agg[b] = agg.get(b, 0) + 1
        return pa.table({"bucket": pa.array(list(agg), pa.int64()),
                         "n": pa.array(list(agg.values()), pa.int64())})

    return (
        _read(sf_dir, "events", ["props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .sort("bucket")
    )


def stats_moments(sf_dir: str) -> ray.data.Dataset:
    """Higher-moment stats per group — the skewness/kurtosis sufficient
    statistics (the Solr analytics component's moment aggregates beyond
    StatsComponent's stddev): the shuffle carries ONLY exact-int moment
    partials (n_vals, sum, sumsq, sumcube over floor-dollars); g1
    skewness derives from these downstream, so the oracle hashes raw
    integers and no float ever crosses the exchange."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vals = pc.cast(t.column("value"), pa.float64())
        d = pc.cast(pc.floor(vals), pa.int64())
        present = pc.cast(pc.is_valid(vals), pa.int64())
        tt = pa.table({
            "event_type": t.column("event_type"),
            "n_vals": present,
            "sum_d": d,
            "sumsq_d": pc.multiply(d, d),
            "sumcube_d": pc.multiply(pc.multiply(d, d), d),
        })
        return (
            pa.TableGroupBy(tt, ["event_type"])
            .aggregate([("n_vals", "sum"), ("sum_d", "sum"),
                        ("sumsq_d", "sum"), ("sumcube_d", "sum")])
            .rename_columns(["event_type", "n_vals", "sum_d", "sumsq_d", "sumcube_d"])
        )

    return (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n_vals", alias_name="n_vals"),
                   Sum("sum_d", alias_name="sum_d"),
                   Sum("sumsq_d", alias_name="sumsq_d"),
                   Sum("sumcube_d", alias_name="sumcube_d"))
        .sort("event_type")
    )


def taxonomy_assoc_facets(sf_dir: str) -> ray.data.Dataset:
    """Association facets ([U] lucene/facet/.../taxonomy/
    TaxonomyFacetSumIntAssociations.java): every document contributes an
    integer ASSOCIATION VALUE (p_retailprice cents) — not just a count —
    to each ancestor node of its category path. Same explode + one
    groupby shuffle as the counting taxonomy facet, with a Sum beside
    the Count."""
    from ray.data.aggregate import Count, Sum

    def explode(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(pc.cast(t.column("p_type"), pa.string()), " ")
        cents = _cents(pc.cast(t.column("p_retailprice"), pa.float64()))
        l1 = pc.cast(pc.list_element(parts, 0), pa.string()).combine_chunks()
        has2 = pc.greater_equal(pc.list_value_length(parts), 2)
        l2 = pc.cast(pc.binary_join(pc.list_slice(parts, 0, 2), "/"),
                     pa.string()).filter(has2).combine_chunks()
        return pa.table({
            "path": pa.concat_arrays([l1, l2]),
            "assoc": pa.concat_arrays([cents.combine_chunks(),
                                       cents.filter(has2).combine_chunks()]),
        })

    return (
        _read(sf_dir, "part", ["p_type", "p_retailprice"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Count(alias_name="n"), Sum("assoc", alias_name="assoc_cents"))
        .sort("path")
    )


def facet_allbuckets(sf_dir: str, top: int = 3) -> pa.Table:
    """JSON facet bucket refinements ([U] solr/core/.../search/facet/
    FacetField.java): terms facet on `source` with a stat sort
    (sort: "sum_n desc", tie -> bucket asc), `limit: top`, plus the
    `allBuckets` pseudo-bucket (stats over the WHOLE domain, not just
    returned buckets) and `numBuckets` (distinct bucket count).

    Scale shape: one groupby over the bucket domain, then everything —
    top-k, allBuckets totals, numBuckets — derives from the
    bucket-domain-sized result (exact integer sums commute)."""
    from ray.data.aggregate import Count, Sum

    buckets = (
        _read(sf_dir, "documents", ["source", "n_chars"])
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_n"))
        .to_pandas()
    )
    buckets["n_docs"] = buckets["n_docs"].astype(np.int64)
    buckets["sum_n"] = buckets["sum_n"].astype(np.int64)
    head = buckets.sort_values(["sum_n", "source"],
                               ascending=[False, True]).head(top)
    rows = [(str(b), int(n), int(s))
            for b, n, s in zip(head["source"], head["n_docs"], head["sum_n"])]
    rows.append(("__all__", int(buckets["n_docs"].sum()), int(buckets["sum_n"].sum())))
    rows.append(("__numBuckets__", int(len(buckets)), 0))
    rows.sort()
    return pa.table({
        "bucket": pa.array([r[0] for r in rows], pa.string()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "sum_n": pa.array([r[2] for r in rows], pa.int64()),
    })


def facet_filter_domain(sf_dir: str, term: str = "merge",
                        min_chars: int = 300) -> pa.Table:
    """JSON facet domain change via filter ([U] solr/core/.../search/
    facet/FacetRequest.java `domain: {filter: "..."}`): the facet's
    domain is REPLACED by the filter's match set, independent of the
    main query. Output shows both domains per bucket — the main-query
    count next to the filter-domain count — so the replacement is
    visible. One stateless pass of integer partials, one lang-domain
    groupby."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import tokenize

    def partials(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for lang, s, nc in zip(t.column("lang").to_pylist(),
                               t.column("text").to_pylist(),
                               t.column("n_chars").to_numpy()):
            q, f = agg.get(lang, (0, 0))
            agg[lang] = (q + (term in tokenize(s or "")),
                         f + (int(nc) >= min_chars))
        return pa.table({
            "lang": pa.array(list(agg), pa.string()),
            "n_query_domain": pa.array([v[0] for v in agg.values()], pa.int64()),
            "n_filter_domain": pa.array([v[1] for v in agg.values()], pa.int64()),
        })

    out = (
        _read(sf_dir, "documents", ["lang", "text", "n_chars"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_query_domain", alias_name="n_query_domain"),
                   Sum("n_filter_domain", alias_name="n_filter_domain"))
        .to_pandas().sort_values("lang")
    )
    return pa.table({
        "lang": pa.array(out["lang"].astype(str), pa.string()),
        "n_query_domain": pa.array(out["n_query_domain"].astype(np.int64), pa.int64()),
        "n_filter_domain": pa.array(out["n_filter_domain"].astype(np.int64), pa.int64()),
    })


def group_facet_counts(sf_dir: str, facet_field: str = "lang",
                       group_field: str = "source",
                       min_chars: int = 200) -> pa.Table:
    """Grouped faceting, ``group.facet=true`` ([U] solr/core/.../search/
    grouping/TermGroupFacetCollector.java via SimpleFacets): facet counts
    computed over GROUPS rather than documents — each facet value counts
    the distinct groups that contain at least one matching doc. Match set
    here = a docvalues filter (n_chars >= min_chars) pushed into the
    columnar read.

    Scale shape (the uniqueBlock recipe): (facet, group) pairs pre-dedup
    map-side per batch, ONE hash groupby dedups globally, per-facet
    counts are facet-domain-sized partials + one combine."""
    from ray.data.aggregate import Count

    pairs = (
        _read(sf_dir, "documents", [facet_field, group_field, "n_chars"])
        .filter(expr=f"n_chars >= {int(min_chars)}")
        .map_batches(
            lambda t: pa.table({
                facet_field: t.column(facet_field),
                group_field: t.column(group_field),
            }).group_by([facet_field, group_field]).aggregate([]),
            batch_format="pyarrow")
        .groupby([facet_field, group_field])
        .count()
        .groupby(facet_field)
        .aggregate(Count(alias_name="n_groups"))
        .to_pandas()
    )
    pairs = pairs.sort_values(facet_field).reset_index(drop=True)
    return pa.table({
        facet_field: pa.array(pairs[facet_field].astype(str), pa.string()),
        "n_groups": pa.array(pairs["n_groups"].astype(np.int64), pa.int64()),
    })


def facet_missing_bucket(sf_dir: str, min_chars: int = 200) -> pa.Table:
    """Terms facet with the ``missing`` bucket ([U] solr/core/.../search/
    facet/FacetField.java missing:true; classic facet.missing): facet
    over a NULLABLE derived field (source, defined only for docs with
    n_chars >= min_chars) — docs with no value land in one extra
    ``__missing__`` bucket instead of being dropped. One map-side
    partial count per batch, one bucket-domain groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pandas().astype(str)
        src[t.column("n_chars").to_numpy() < min_chars] = "__missing__"
        vc = src.value_counts()
        return pa.table({"bucket": pa.array(vc.index.astype(str), pa.string()),
                         "n_docs": pa.array(vc.to_numpy().astype(np.int64), pa.int64())})

    out = (
        _read(sf_dir, "documents", ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort("bucket")
        .to_pandas()
    )
    return pa.table({
        "bucket": pa.array(out["bucket"].astype(str), pa.string()),
        "n_docs": pa.array(out["n_docs"].astype(np.int64), pa.int64()),
    })


def uniqueblock_facet(sf_dir: str, min_qty: int = 25) -> pa.Table:
    """uniqueBlock(_root_) block-join facet ([U] solr/core/.../search/
    facet/UniqueBlockAgg.java): facet over CHILD docs (lineitem rows with
    l_quantity >= min_qty) bucketed by l_returnflag, counting unique
    PARENTS (orders) per bucket — "how many orders have a matching
    child in this bucket".

    Scale shape: (flag, parent) pairs pack into one int64 key
    (parent*4 + flag_code), each batch pre-dedups its keys, ONE hash
    groupby dedups globally, then per-flag counts are tiny map-side
    partials + a 3-row combine. No corpus-sized driver state."""
    from ray.data.aggregate import Sum

    flags = ["A", "N", "R"]
    code = {f: i for i, f in enumerate(flags)}

    def pack(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("l_quantity"), pa.scalar(float(min_qty))))
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        fl = np.array([code[f] for f in t.column("l_returnflag").to_pylist()],
                      dtype=np.int64)
        return pa.table({"k": pa.array(np.unique(ok * 4 + fl), pa.int64())})

    def per_flag(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy()
        cnt = np.bincount(k % 4, minlength=4)[: len(flags)]
        return pa.table({"l_returnflag": pa.array(flags, pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    out = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
        .map_batches(pack, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: per_flag(t), batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("n", alias_name="n_parents"))
        .sort("l_returnflag")
        .to_pandas()
    )
    out = out[out["n_parents"] > 0]
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
        "n_parents": pa.array(out["n_parents"].astype(np.int64), pa.int64()),
    })


def sampled_facets(sf_dir: str, pct: int = 20) -> pa.Table:
    """RandomSamplingFacetsCollector ([U] lucene/facet/.../sampling —
    RandomSamplingFacetsCollector.java): facet counts computed over a
    deterministic sample of the corpus, then amplified back to corpus
    scale (count * 100 // pct — exact integer amplification so the
    oracle agrees bit-for-bit). The sample is the same multiplicative
    hash on doc_id as deterministic_sample (reproducible, no RNG).

    Scale shape: the sample predicate is evaluated per batch (no
    materialized sample), facet combine is bucket-domain-sized."""
    from ray.data.aggregate import Sum

    thresh = (4294967296 * pct) // 100

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        keep = (ids * 2654435761) % 4294967296 < thresh
        g = (t.filter(pa.array(keep)).select(["lang"])
              .group_by("lang").aggregate([([], "count_all")]))
        return pa.table({"lang": g.column("lang").cast(pa.string()),
                         "n": g.column("count_all").cast(pa.int64())})

    out = (
        _read(sf_dir, "documents", ["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_sampled"))
        .sort("lang")
        .to_pandas()
    )
    n_sampled = out["n_sampled"].astype(np.int64)
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "n_sampled": pa.array(n_sampled, pa.int64()),
        "n_estimated": pa.array((n_sampled * 100 // pct).astype(np.int64), pa.int64()),
    })


def facet_join_domain(sf_dir: str, status: str = "F", top: int = 5) -> pa.Table:
    """JSON facet domain change via join ([U] solr/core/.../search/facet/
    FacetRequest.java `domain: {join: {from,to}}` + JoinQParserPlugin):
    the facet domain becomes the DISTINCT customer docs reachable from
    the filtered orders domain through o_custkey -> c_custkey, then a
    terms facet on c_mktsegment (count desc, index-order tiebreak).

    Scale shape: the from-side key set is deduped DISTRIBUTED and
    broadcast as one sorted numpy array (semi-join membership via
    searchsorted, never a dict); the facet itself is a low-cardinality
    groupby."""
    keys = _order_custkeys(sf_dir, status)

    def member(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, ck)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        ok = (pos < len(keys)) & (keys[pos_c] == ck) if len(keys) else np.zeros(len(ck), bool)
        return t.filter(pa.array(ok))

    counts = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(member, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="count"))
        .to_pandas()
    )
    counts = counts.sort_values(["count", "c_mktsegment"],
                                ascending=[False, True]).head(top)
    return pa.Table.from_pandas(counts.reset_index(drop=True),
                                preserve_index=False)
