"""Spatial search ([U] lucene/spatial-extras/.../GeoDistanceUtils.java,
solr/core/.../search/function/distance/HaversineFunction.java and Solr's
`geodist()` / bbox filter) — vectorized haversine over derived
coordinate columns.

The test tables carry no lat/lon, so coordinates are DERIVED
deterministically from the integer key with plain modular arithmetic —
the SQL oracle applies the IDENTICAL derivation, so the check exercises
the real spatial kernels (radians, haversine, bbox predicate) end to
end.  Distances are floored to 100 m units before any comparison (the
repo's exact-integer convention; FIXTURES.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

EARTH_RADIUS_KM = 6371.0087714  # WGS84 mean radius, as Lucene GeoUtils


def derive_coords(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """lat in [-89.5, 89.5], lon in [-179.5, 179.5] from an int key —
    mirrored literally in the oracle SQL."""
    lat = ((key * 37) % 180).astype(np.float64) - 90.0 + 0.5
    lon = ((key * 73) % 360).astype(np.float64) - 180.0 + 0.5
    return lat, lon


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km (float64, numpy)."""
    rlat1, rlat2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


class _GeoStage:
    """bbox filter + geodist to a fixed origin, fully vectorized; the
    origin is actor state (one broadcast per actor, not per batch)."""

    def __init__(self, origin_lat: float, origin_lon: float, bbox: tuple[float, float, float, float]):
        self.origin_lat = origin_lat
        self.origin_lon = origin_lon
        self.bbox = bbox  # (lat_min, lat_max, lon_min, lon_max)

    def __call__(self, t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        lat, lon = derive_coords(key)
        la0, la1, lo0, lo1 = self.bbox
        m = (lat >= la0) & (lat <= la1) & (lon >= lo0) & (lon <= lo1)
        key, lat, lon = key[m], lat[m], lon[m]
        d = haversine_km(lat, lon, self.origin_lat, self.origin_lon)
        return pa.table(
            {
                "c_custkey": pa.array(key, pa.int64()),
                "dist_100m": pa.array(np.floor(d * 10.0 + 0.5).astype(np.int64), pa.int64()),
            }
        )


def geo_bbox_dist(sf_dir: str, origin=(12.5, 42.5), bbox=(-60.0, 60.0, -120.0, 120.0)) -> ray.data.Dataset:
    """Driver entry: customers inside the bbox with geodist to origin."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return ds.map_batches(
        _GeoStage,
        fn_constructor_kwargs={"origin_lat": origin[0], "origin_lon": origin[1], "bbox": bbox},
        concurrency=pool_size(),
        batch_format="pyarrow",
    ).sort("c_custkey")


def geo_filt(sf_dir: str, origin=(12.5, 42.5), d_km: int = 3000) -> ray.data.Dataset:
    """{!geofilt pt=.. d=..} radius filter ([U] solr/core/.../search/
    SpatialFilterQParserPlugin.java): keep points within ``d_km`` of the
    origin. The threshold compares the QUANTIZED integer distance
    (dist_100m <= d_km*10) — the same 100m rounding the SQL oracle
    replicates bit-for-bit, so boundary points cannot flip between
    engine and oracle. One stateless pass, no bbox pre-cut (the
    oracle-checked exact path; the persisted point index serves the
    cell-pruned variant)."""
    full_bbox = (-90.0, 90.0, -180.0, 180.0)
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    cut = int(d_km) * 10

    def fn(t: pa.Table) -> pa.Table:
        out = _GeoStage(origin[0], origin[1], full_bbox)(t)
        keep = pa.compute.less_equal(out.column("dist_100m"), pa.scalar(cut))
        return out.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow").sort("c_custkey")


def geo_annulus_docs(sf_dir: str, origin=(12.5, 42.5), inner_km: int = 2000,
                     outer_km: int = 6000) -> ray.data.Dataset:
    """Annulus (ring) distance filter — the ``{!frange l=.. u=..}geodist()``
    composition ([U] solr/core/.../search/FunctionRangeQuery.java over
    GeoDistValueSource): keep points whose distance lies in
    [inner_km, outer_km]. Same quantized-integer-distance comparison as
    geo_filt (100 m rounding shared with the oracle), one stateless
    pass."""
    full_bbox = (-90.0, 90.0, -180.0, 180.0)
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    lo, hi = int(inner_km) * 10, int(outer_km) * 10

    def fn(t: pa.Table) -> pa.Table:
        out = _GeoStage(origin[0], origin[1], full_bbox)(t)
        d = out.column("dist_100m")
        keep = pa.compute.and_(pa.compute.greater_equal(d, pa.scalar(lo)),
                               pa.compute.less_equal(d, pa.scalar(hi)))
        return out.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow").sort("c_custkey")


def geo_heatmap(sf_dir: str, cell_deg: int = 10) -> pa.Table:
    """Heatmap faceting ([U] solr/core/.../handler/component/
    SpatialHeatmapFacets.java, facet.heatmap): counts over a lat/lon
    grid at ``cell_deg`` resolution. Grid-cell assignment is pure
    integer arithmetic on the derived coordinates (row = lat-index//cell,
    col = lon-index//cell), so engine and SQL oracle agree exactly.
    One corpus pass of per-batch partial (row, col) counts -> an
    output-sized (18 x 36 cells at 10 degrees) combine; no row shuffle.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        row = ((key * 37) % 180) // cell_deg
        col = ((key * 73) % 360) // cell_deg
        g = pd.DataFrame({"grid_row": row, "grid_col": col}).groupby(
            ["grid_row", "grid_col"], sort=False).size().reset_index(name="n")
        return pa.table({
            "grid_row": pa.array(g["grid_row"].to_numpy(), pa.int64()),
            "grid_col": pa.array(g["grid_col"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
        })

    out = (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["grid_row", "grid_col"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .sort(["grid_row", "grid_col"])
        .to_pandas()
    )
    return pa.table({
        "grid_row": pa.array(out["grid_row"].to_numpy().astype(np.int64)),
        "grid_col": pa.array(out["grid_col"].to_numpy().astype(np.int64)),
        "n_docs": pa.array(out["n_docs"].to_numpy().astype(np.int64)),
    })


# ---------------- persisted 2D point index (BKD analogue) ----------------
#
# [U] lucene/core/.../util/bkd/BKDWriter.java organizes points into
# leaf blocks with per-block bounding boxes so range queries visit only
# intersecting blocks. Re-expressed Ray-Data-first: points are
# hive-partitioned by integer grid cell (one directory per cell), the
# manifest records each cell's exact lat/lon bounds, and a bbox query
# reads ONLY the intersecting cells' parquet files (+ an exact per-batch
# filter for boundary cells). At 100 TB the build is one assign pass +
# partitioned write, and query I/O is proportional to the bbox area.

import hashlib as _hashlib
import json as _json
import os as _os

POINT_CACHE_ROOT = _os.environ.get("LSR_CACHE", "/tmp/lsr_cache")


def build_point_index(sf_dir: str, cell_deg: int = 15) -> str:
    """One-time 2D point index build over the derived customer
    coordinates: integer cell assignment (lat_idx//cell, lon_idx//cell)
    -> hive-partitioned parquet, one directory per cell, plus a manifest
    with every cell's exact integer-degree bounds. Atomic (tmp+rename),
    cached per (source mtime, cell_deg)."""
    import shutil

    src = _os.path.join(sf_dir, "customer.parquet")
    key = _hashlib.sha1(
        f"{_os.path.abspath(src)}|{_os.path.getmtime(src)}|{cell_deg}|points-v1".encode()
    ).hexdigest()[:16]
    index_dir = _os.path.join(POINT_CACHE_ROOT, f"point-index-{key}")
    manifest = _os.path.join(index_dir, "manifest.json")
    if _os.path.exists(manifest):
        return index_dir

    n_cols = 360 // cell_deg

    def assign(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy().astype(np.int64)
        lat_idx = (k * 37) % 180   # lat = lat_idx - 89.5
        lon_idx = (k * 73) % 360   # lon = lon_idx - 179.5
        cell = (lat_idx // cell_deg) * n_cols + (lon_idx // cell_deg)
        lat, lon = derive_coords(k)
        return pa.table({
            "c_custkey": pa.array(k),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
            "cell": pa.array(cell.astype(np.int64)),
            "cell_id": pa.array(cell.astype(np.int64)),
        })

    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    _os.makedirs(_os.path.join(tmp, "cells"), exist_ok=True)
    (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(assign, batch_format="pyarrow")
        .write_parquet(_os.path.join(tmp, "cells"), partition_cols=["cell"])
    )
    cells = {}
    for c in range(0, (180 // cell_deg) * n_cols):
        row, col = divmod(c, n_cols)
        cells[str(c)] = {
            # exact bounds of the quantized points a cell can hold
            "lat_min": row * cell_deg - 89.5, "lat_max": (row + 1) * cell_deg - 1 - 89.5,
            "lon_min": col * cell_deg - 179.5, "lon_max": (col + 1) * cell_deg - 1 - 179.5,
        }
    present = sorted(
        int(d.split("=", 1)[1]) for d in _os.listdir(_os.path.join(tmp, "cells"))
        if d.startswith("cell=")
    )
    with open(_os.path.join(tmp, "manifest.json"), "w") as f:
        _json.dump({"cell_deg": cell_deg, "n_cols": n_cols,
                    "cells_present": present, "bounds": cells}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    _os.rename(tmp, index_dir)
    return index_dir


def point_index_paths(index_dir: str, bbox) -> tuple[list[str], list[int]]:
    """Parquet files of the cells intersecting ``bbox`` ONLY (the
    selective read is the point — tested directly), plus the cell ids."""
    la0, la1, lo0, lo1 = bbox
    with open(_os.path.join(index_dir, "manifest.json")) as f:
        m = _json.load(f)
    hit = [
        c for c in m["cells_present"]
        if not (m["bounds"][str(c)]["lat_max"] < la0 or m["bounds"][str(c)]["lat_min"] > la1
                or m["bounds"][str(c)]["lon_max"] < lo0 or m["bounds"][str(c)]["lon_min"] > lo1)
    ]
    paths = []
    for c in hit:
        p = _os.path.join(index_dir, "cells", f"cell={c}")
        if _os.path.isdir(p):
            paths.extend(sorted(_os.path.join(p, f) for f in _os.listdir(p)
                                if f.endswith(".parquet")))
    return paths, hit


def point_bbox_query(sf_dir: str, bbox=(-30.0, 40.0, -100.0, 50.0),
                     cell_deg: int = 15) -> ray.data.Dataset:
    """BKD-style bbox query: intersect the manifest's cell bounds, read
    only those partitions, exact-filter boundary cells per batch."""
    index_dir = build_point_index(sf_dir, cell_deg=cell_deg)
    paths, _hit = point_index_paths(index_dir, bbox)
    la0, la1, lo0, lo1 = bbox
    if not paths:
        return ray.data.from_arrow(pa.table({"c_custkey": pa.array([], pa.int64())}))

    def exact(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy()
        lon = t.column("lon").to_numpy()
        m = (lat >= la0) & (lat <= la1) & (lon >= lo0) & (lon <= lo1)
        return pa.table({"c_custkey": pa.array(
            t.column("c_custkey").to_numpy()[m].astype(np.int64))})

    return read_parquet_clean(paths).map_batches(
        exact, batch_format="pyarrow").sort("c_custkey")


def geo_nearest_topk(sf_dir: str, origin=(12.5, 42.5), k: int = 25) -> pa.Table:
    """sort=geodist() asc — nearest-k points to the origin ([U]
    solr/core/.../search/function/distance/HaversineConstFunction.java
    used as the sort). Order on the QUANTIZED 100m integer distance
    (ties c_custkey asc) so the SQL oracle is exact. Per-batch partial
    top-k (O(batches * k) exchange), output-sized driver merge."""
    full_bbox = (-90.0, 90.0, -180.0, 180.0)
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def fn(t: pa.Table) -> pa.Table:
        out = _GeoStage(origin[0], origin[1], full_bbox)(t)
        key = out.column("c_custkey").to_numpy()
        d = out.column("dist_100m").to_numpy()
        order = np.lexsort((key, d))[:k]
        return pa.table({"c_custkey": pa.array(key[order], pa.int64()),
                         "dist_100m": pa.array(d[order], pa.int64())})

    parts = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    order = np.lexsort((parts["c_custkey"].to_numpy(), parts["dist_100m"].to_numpy()))[:k]
    out = parts.iloc[order].reset_index(drop=True)
    return pa.table({
        "rank": pa.array(np.arange(len(out), dtype=np.int64)),
        "c_custkey": pa.array(out["c_custkey"].to_numpy(), pa.int64()),
        "dist_100m": pa.array(out["dist_100m"].to_numpy(), pa.int64()),
    })


def geo_polygon_docs(sf_dir: str,
                     poly=((-40.5, -100.5), (60.5, 10.5), (-20.5, 120.5))) -> ray.data.Dataset:
    """Polygon containment filter ([U] lucene/core/.../document/
    LatLonPointInPolygonQuery.java; Solr's RPT ``Intersects(POLYGON(...))``)
    for a convex polygon: a point is inside iff every edge cross product
    has the same sign. Exactness: both the derived coordinates and the
    polygon vertices live on the 0.5-degree grid, so every difference is
    an INTEGER and every cross product an exact integer in float64 —
    the SQL oracle (same formula) agrees bit-for-bit even on boundary
    points. One stateless pass, zero shuffle."""
    verts = [(float(la), float(lo)) for la, lo in poly]

    def fn(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        lat, lon = derive_coords(key)
        signs = []
        n = len(verts)
        for i in range(n):
            (la1, lo1), (la2, lo2) = verts[i], verts[(i + 1) % n]
            cross = (lo2 - lo1) * (lat - la1) - (la2 - la1) * (lon - lo1)
            signs.append(cross)
        pos = np.logical_and.reduce([s >= 0.0 for s in signs])
        neg = np.logical_and.reduce([s <= 0.0 for s in signs])
        return pa.table({"c_custkey": pa.array(key[pos | neg], pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("c_custkey")
    )


# A concave simple polygon on the 0.5-degree grid: a wide rectangle with
# a triangular notch cut into its southern edge (apex at (10.5, 10.5)).
CONCAVE_POLY = (
    (-60.5, -120.5), (70.5, -120.5), (70.5, 140.5), (-60.5, 140.5),
    (-60.5, 20.5), (10.5, 10.5), (-60.5, -20.5),
)


def _poly_int_verts(poly) -> list[tuple[int, int]]:
    """Scale 0.5-grid (lat, lon) vertices to exact int (2*lat, 2*lon)."""
    verts = []
    for la, lo in poly:
        iy, ix = round(float(la) * 2), round(float(lo) * 2)
        if iy != float(la) * 2 or ix != float(lo) * 2:
            raise ValueError(f"vertex ({la}, {lo}) is off the 0.5-degree grid")
        verts.append((int(iy), int(ix)))
    return verts


def geo_polygon_concave_docs(sf_dir: str, poly=CONCAVE_POLY) -> ray.data.Dataset:
    """General simple-polygon containment (concave allowed) — even-odd
    ray crossing, the mechanism behind [U] lucene/core/.../geo/Polygon2D
    .java's component test (reduced: no holes, no multipolygons). All
    arithmetic is on the doubled integer grid (2*lat, 2*lon are int64),
    so straddle tests and the cross-multiplied intersection comparison
    are EXACT — no float division — and boundary points are explicitly
    included via an exact on-segment test, matching the generated SQL
    oracle bit-for-bit. One stateless vectorized pass, zero shuffle."""
    verts = _poly_int_verts(poly)

    def fn(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        py = ((key * 37) % 180) * 2 - 179  # == 2 * derived lat, exact int
        px = ((key * 73) % 360) * 2 - 359  # == 2 * derived lon
        inside = np.zeros(len(key), dtype=bool)
        on_edge = np.zeros(len(key), dtype=bool)
        n = len(verts)
        for i in range(n):
            (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            on_edge |= (
                (cross == 0)
                & (px >= min(x1, x2)) & (px <= max(x1, x2))
                & (py >= min(y1, y2)) & (py <= max(y1, y2))
            )
            if y1 == y2:
                continue  # horizontal edge never straddles the +lon ray
            # half-open straddle (y1 > py) != (y2 > py) counts a vertex
            # exactly on the ray once, not twice
            straddle = (y1 > py) != (y2 > py)
            # px < x-intersection, cross-multiplied by (y2 - y1)
            lhs = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
            inside ^= straddle & ((lhs > 0) if y2 > y1 else (lhs < 0))
        return pa.table({"c_custkey": pa.array(key[inside | on_edge], pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("c_custkey")
    )


HOLED_POLY = (
    # outer ring (box) ...
    ((-60.5, -120.5), (70.5, -120.5), (70.5, 140.5), (-60.5, 140.5)),
    # ... with one rectangular hole punched out of the middle-west
    ((-30.5, -80.5), (20.5, -80.5), (20.5, -20.5), (-30.5, -20.5)),
)


def geo_polygon_holes_docs(sf_dir: str, rings=HOLED_POLY) -> ray.data.Dataset:
    """Polygon-with-holes containment ([U] lucene/core/.../geo/
    Polygon2D.java — a Polygon carries hole rings; contains() is the
    component test minus the holes): even-odd ray crossing accumulated
    across ALL rings, so a point inside the outer ring AND inside a hole
    crosses an odd+odd = even total and lands outside. Boundary points
    of ANY ring (outer or hole) count as contained — the same
    boundary-inclusive pin as the hole-free variant, applied per ring.
    Doubled-integer-grid arithmetic, exact; one stateless pass."""
    ring_verts = [_poly_int_verts(r) for r in rings]

    def fn(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        py = ((key * 37) % 180) * 2 - 179
        px = ((key * 73) % 360) * 2 - 359
        inside = np.zeros(len(key), dtype=bool)
        on_edge = np.zeros(len(key), dtype=bool)
        for verts in ring_verts:
            n = len(verts)
            for i in range(n):
                (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                on_edge |= (
                    (cross == 0)
                    & (px >= min(x1, x2)) & (px <= max(x1, x2))
                    & (py >= min(y1, y2)) & (py <= max(y1, y2))
                )
                if y1 == y2:
                    continue
                straddle = (y1 > py) != (y2 > py)
                lhs = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
                inside ^= straddle & ((lhs > 0) if y2 > y1 else (lhs < 0))
        return pa.table({"c_custkey": pa.array(key[inside | on_edge], pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("c_custkey")
    )


def shape_bbox_relation(sf_dir: str,
                        qbox=(-20.5, 40.5, -60.5, 60.5)) -> ray.data.Dataset:
    """Shape-vs-shape relation query ([U] lucene/core/.../document/
    LatLonShapeBoundingBoxQuery.java semantics over indexed SHAPES, not
    points): every customer carries a derived box shape (its point
    buffered by 1 deg lat / 2 deg lon on the half-degree grid), the
    query is a box, and each doc classifies as WITHIN (shape fully
    inside the query), INTERSECTS (partial overlap), or DISJOINT.
    All comparisons are interval tests on the doubled integer grid —
    exact, boundary-inclusive (touching edges INTERSECT, as Lucene's
    relate treats shared boundaries). One stateless pass, zero shuffle."""
    qla0, qla1, qlo0, qlo1 = (int(round(v * 2)) for v in qbox)

    def fn(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        py = ((key * 37) % 180) * 2 - 179
        px = ((key * 73) % 360) * 2 - 359
        la0, la1 = py - 2, py + 2   # +-1 degree on the doubled grid
        lo0, lo1 = px - 4, px + 4   # +-2 degrees
        disjoint = (la1 < qla0) | (la0 > qla1) | (lo1 < qlo0) | (lo0 > qlo1)
        within = (la0 >= qla0) & (la1 <= qla1) & (lo0 >= qlo0) & (lo1 <= qlo1)
        rel = np.where(disjoint, "DISJOINT", np.where(within, "WITHIN", "INTERSECTS"))
        return pa.table({
            "c_custkey": pa.array(key),
            "relation": pa.array(rel.astype(object), pa.string()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("c_custkey")
    )


def shape_bbox_relation_sql(qbox=(-20.5, 40.5, -60.5, 60.5)) -> str:
    qla0, qla1, qlo0, qlo1 = (int(round(v * 2)) for v in qbox)
    return (
        "WITH g AS (SELECT c_custkey, "
        "CAST((c_custkey * 37) % 180 AS BIGINT) * 2 - 179 AS py, "
        "CAST((c_custkey * 73) % 360 AS BIGINT) * 2 - 359 AS px FROM customer) "
        "SELECT c_custkey, CASE "
        f"WHEN py + 2 < {qla0} OR py - 2 > {qla1} OR px + 4 < {qlo0} "
        f"OR px - 4 > {qlo1} THEN 'DISJOINT' "
        f"WHEN py - 2 >= {qla0} AND py + 2 <= {qla1} AND px - 4 >= {qlo0} "
        f"AND px + 4 <= {qlo1} THEN 'WITHIN' "
        "ELSE 'INTERSECTS' END AS relation FROM g ORDER BY c_custkey"
    )


def polygon_concave_sql(poly=CONCAVE_POLY) -> str:
    """Generate the DuckDB oracle for geo_polygon_concave_docs: the
    IDENTICAL even-odd + on-segment integer arithmetic, unrolled per
    edge from the same vertex list."""
    verts = _poly_int_verts(poly)
    n = len(verts)
    cross_terms, on_terms = [], []
    for i in range(n):
        (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
        on_terms.append(
            f"(({x2}-({x1}))*(py-({y1})) - ({y2}-({y1}))*(px-({x1})) = 0 "
            f"AND px BETWEEN {min(x1, x2)} AND {max(x1, x2)} "
            f"AND py BETWEEN {min(y1, y2)} AND {max(y1, y2)})"
        )
        if y1 == y2:
            continue
        op = ">" if y2 > y1 else "<"
        cross_terms.append(
            f"CASE WHEN (({y1} > py) <> ({y2} > py)) AND "
            f"((py-({y1}))*({x2}-({x1})) - (px-({x1}))*({y2}-({y1})) {op} 0) "
            f"THEN 1 ELSE 0 END"
        )
    return (
        "WITH g AS (SELECT c_custkey, "
        "CAST((c_custkey * 37) % 180 AS BIGINT) * 2 - 179 AS py, "
        "CAST((c_custkey * 73) % 360 AS BIGINT) * 2 - 359 AS px FROM customer) "
        "SELECT c_custkey FROM g WHERE ((" + " + ".join(cross_terms) + ") % 2 = 1) "
        "OR (" + " OR ".join(on_terms) + ") ORDER BY c_custkey"
    )


def polygon_holes_sql(rings=HOLED_POLY) -> str:
    """Generate the DuckDB oracle for geo_polygon_holes_docs: the same
    even-odd + on-segment integer arithmetic, unrolled per edge across
    ALL rings from the same vertex lists."""
    cross_terms, on_terms = [], []
    for ring in rings:
        verts = _poly_int_verts(ring)
        n = len(verts)
        for i in range(n):
            (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
            on_terms.append(
                f"(({x2}-({x1}))*(py-({y1})) - ({y2}-({y1}))*(px-({x1})) = 0 "
                f"AND px BETWEEN {min(x1, x2)} AND {max(x1, x2)} "
                f"AND py BETWEEN {min(y1, y2)} AND {max(y1, y2)})"
            )
            if y1 == y2:
                continue
            op = ">" if y2 > y1 else "<"
            cross_terms.append(
                f"CASE WHEN (({y1} > py) <> ({y2} > py)) AND "
                f"((py-({y1}))*({x2}-({x1})) - (px-({x1}))*({y2}-({y1})) {op} 0) "
                f"THEN 1 ELSE 0 END"
            )
    return (
        "WITH g AS (SELECT c_custkey, "
        "CAST((c_custkey * 37) % 180 AS BIGINT) * 2 - 179 AS py, "
        "CAST((c_custkey * 73) % 360 AS BIGINT) * 2 - 359 AS px FROM customer) "
        "SELECT c_custkey FROM g WHERE ((" + " + ".join(cross_terms) + ") % 2 = 1) "
        "OR (" + " OR ".join(on_terms) + ") ORDER BY c_custkey"
    )


def shape_polygon_relation(sf_dir: str, poly=CONCAVE_POLY) -> ray.data.Dataset:
    """Polygon-vs-shape relation query ([U] lucene/core/.../document/
    LatLonShape.java + geo/Component2D relate semantics: an indexed
    shape classifies against an arbitrary simple-polygon query as
    WITHIN / INTERSECTS / DISJOINT). Doc shapes are the same derived
    boxes as shape_bbox_relation; the query is a simple polygon
    (concave allowed).

    Exact decision on the doubled integer grid, per doc box B vs
    polygon P:
      INTERSECTS  iff any polygon edge meets the closed box — decided
                  by separating axes: the edge's bbox overlaps B (axes
                  x, y) and B's four corners are not all strictly on
                  one side of the edge's supporting line (axis = edge
                  normal; cross products are exact int64).
      otherwise   no edge meets B, so B is entirely inside or entirely
                  outside P (a polygon vertex inside B would make both
                  its edges meet B): WITHIN if B's center point is
                  inside P by even-odd ray crossing, else DISJOINT.
    Touching boundaries count as INTERSECTS (the boundary-inclusive
    convention shared with shape_bbox_relation). One stateless
    vectorized pass, zero shuffle; ~n_edges fused numpy ops per batch."""
    verts = _poly_int_verts(poly)

    def fn(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        py = ((key * 37) % 180) * 2 - 179
        px = ((key * 73) % 360) * 2 - 359
        la0, la1 = py - 2, py + 2
        lo0, lo1 = px - 4, px + 4
        intersects = np.zeros(len(key), dtype=bool)
        inside = np.zeros(len(key), dtype=bool)
        n = len(verts)
        for i in range(n):
            (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
            overlap = (
                (min(x1, x2) <= lo1) & (max(x1, x2) >= lo0)
                & (min(y1, y2) <= la1) & (max(y1, y2) >= la0)
            )
            dx, dy = x2 - x1, y2 - y1
            c1 = dx * (la0 - y1) - dy * (lo0 - x1)
            c2 = dx * (la0 - y1) - dy * (lo1 - x1)
            c3 = dx * (la1 - y1) - dy * (lo0 - x1)
            c4 = dx * (la1 - y1) - dy * (lo1 - x1)
            all_pos = (c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)
            all_neg = (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
            intersects |= overlap & ~(all_pos | all_neg)
            if y1 == y2:
                continue
            straddle = (y1 > py) != (y2 > py)
            lhs = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
            inside ^= straddle & ((lhs > 0) if y2 > y1 else (lhs < 0))
        rel = np.where(intersects, "INTERSECTS",
                       np.where(inside, "WITHIN", "DISJOINT"))
        return pa.table({
            "c_custkey": pa.array(key),
            "relation": pa.array(rel.astype(object), pa.string()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("c_custkey")
    )


def shape_polygon_relation_sql(poly=CONCAVE_POLY) -> str:
    """DuckDB oracle for shape_polygon_relation: the IDENTICAL per-edge
    SAT + even-odd integer arithmetic, unrolled from the same vertex
    list."""
    verts = _poly_int_verts(poly)
    n = len(verts)
    inter_terms, cross_terms = [], []
    for i in range(n):
        (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
        dx, dy = x2 - x1, y2 - y1
        cs = [
            f"({dx}*((py-2)-({y1})) - ({dy})*((px-4)-({x1})))",
            f"({dx}*((py-2)-({y1})) - ({dy})*((px+4)-({x1})))",
            f"({dx}*((py+2)-({y1})) - ({dy})*((px-4)-({x1})))",
            f"({dx}*((py+2)-({y1})) - ({dy})*((px+4)-({x1})))",
        ]
        all_pos = " AND ".join(f"{c} > 0" for c in cs)
        all_neg = " AND ".join(f"{c} < 0" for c in cs)
        inter_terms.append(
            f"({min(x1, x2)} <= px+4 AND {max(x1, x2)} >= px-4 "
            f"AND {min(y1, y2)} <= py+2 AND {max(y1, y2)} >= py-2 "
            f"AND NOT (({all_pos}) OR ({all_neg})))"
        )
        if y1 == y2:
            continue
        op = ">" if y2 > y1 else "<"
        cross_terms.append(
            f"CASE WHEN (({y1} > py) <> ({y2} > py)) AND "
            f"((py-({y1}))*({x2}-({x1})) - (px-({x1}))*({y2}-({y1})) {op} 0) "
            f"THEN 1 ELSE 0 END"
        )
    return (
        "WITH g AS (SELECT c_custkey, "
        "CAST((c_custkey * 37) % 180 AS BIGINT) * 2 - 179 AS py, "
        "CAST((c_custkey * 73) % 360 AS BIGINT) * 2 - 359 AS px FROM customer) "
        "SELECT c_custkey, CASE WHEN (" + " OR ".join(inter_terms) + ") "
        "THEN 'INTERSECTS' WHEN ((" + " + ".join(cross_terms) + ") % 2 = 1) "
        "THEN 'WITHIN' ELSE 'DISJOINT' END AS relation "
        "FROM g ORDER BY c_custkey"
    )


def shape_triangle_relation(sf_dir: str, poly=CONCAVE_POLY) -> ray.data.Dataset:
    """Triangle-vs-polygon relate — the ACTUAL LatLonShape primitive:
    [U] lucene/core/.../document/LatLonShape.java tessellates every
    indexed shape into TRIANGLES and the query relates each triangle
    (Component2D.relateTriangle). Each customer carries a derived
    triangle v0=(py,px), v1=(py+4,px+6), v2=(py-3,px+8) on the doubled
    integer grid; the query is a simple polygon (concave allowed).

    Exact decision, all int64:
      INTERSECTS iff any triangle edge meets any polygon edge —
                 boundary-inclusive segment-segment test: proper
                 crossing by the four orientation signs, plus the four
                 collinear-endpoint-on-segment touch cases — OR the
                 polygon's first vertex lies inside the triangle (the
                 doc-contains-query case: still INTERSECTS, the doc is
                 not WITHIN).
      otherwise  no boundary contact: WITHIN if v0 is inside the
                 polygon by even-odd ray crossing, else DISJOINT.
    One stateless vectorized pass: 3 x n_poly_edges fused edge-pair
    tests per batch, zero shuffle."""
    verts = _poly_int_verts(poly)
    n = len(verts)

    def fn(t: pa.Table) -> pa.Table:
        key = t.column("c_custkey").to_numpy().astype(np.int64)
        py = ((key * 37) % 180) * 2 - 179
        px = ((key * 73) % 360) * 2 - 359
        tri = [(py, px), (py + 4, px + 6), (py - 3, px + 8)]
        m = len(key)
        intersects = np.zeros(m, dtype=bool)

        def orient(ay, ax, by, bx, cy, cx):
            return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

        for e in range(3):
            (a_y, a_x), (b_y, b_x) = tri[e], tri[(e + 1) % 3]
            for j in range(n):
                (y3, x3), (y4, x4) = verts[j], verts[(j + 1) % n]
                d1 = orient(y3, x3, y4, x4, a_y, a_x)
                d2 = orient(y3, x3, y4, x4, b_y, b_x)
                d3 = orient(a_y, a_x, b_y, b_x,
                            np.full(m, y3), np.full(m, x3))
                d4 = orient(a_y, a_x, b_y, b_x,
                            np.full(m, y4), np.full(m, x4))
                proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
                         (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
                on34_a = (d1 == 0) & (a_x >= min(x3, x4)) & (a_x <= max(x3, x4)) \
                    & (a_y >= min(y3, y4)) & (a_y <= max(y3, y4))
                on34_b = (d2 == 0) & (b_x >= min(x3, x4)) & (b_x <= max(x3, x4)) \
                    & (b_y >= min(y3, y4)) & (b_y <= max(y3, y4))
                on12_3 = (d3 == 0) & (x3 >= np.minimum(a_x, b_x)) & (x3 <= np.maximum(a_x, b_x)) \
                    & (y3 >= np.minimum(a_y, b_y)) & (y3 <= np.maximum(a_y, b_y))
                on12_4 = (d4 == 0) & (x4 >= np.minimum(a_x, b_x)) & (x4 <= np.maximum(a_x, b_x)) \
                    & (y4 >= np.minimum(a_y, b_y)) & (y4 <= np.maximum(a_y, b_y))
                intersects |= proper | on34_a | on34_b | on12_3 | on12_4

        # doc-contains-query: polygon's first vertex strictly inside the
        # triangle (consistent strict orientation vs all three edges)
        qy, qx = verts[0]
        s1 = orient(tri[0][0], tri[0][1], tri[1][0], tri[1][1],
                    np.full(m, qy), np.full(m, qx))
        s2 = orient(tri[1][0], tri[1][1], tri[2][0], tri[2][1],
                    np.full(m, qy), np.full(m, qx))
        s3 = orient(tri[2][0], tri[2][1], tri[0][0], tri[0][1],
                    np.full(m, qy), np.full(m, qx))
        intersects |= ((s1 > 0) & (s2 > 0) & (s3 > 0)) | \
                      ((s1 < 0) & (s2 < 0) & (s3 < 0))

        inside = np.zeros(m, dtype=bool)
        for i in range(n):
            (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
            if y1 == y2:
                continue
            straddle = (y1 > py) != (y2 > py)
            lhs = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
            inside ^= straddle & ((lhs > 0) if y2 > y1 else (lhs < 0))
        rel = np.where(intersects, "INTERSECTS",
                       np.where(inside, "WITHIN", "DISJOINT"))
        return pa.table({
            "c_custkey": pa.array(key),
            "relation": pa.array(rel.astype(object), pa.string()),
        })

    return (
        read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("c_custkey")
    )


#: triangle vertex offsets on the doubled grid: v_i = (py+dy_i, px+dx_i)
TRI_OFFSETS = ((0, 0), (4, 6), (-3, 8))


def shape_triangle_relation_sql(poly=CONCAVE_POLY) -> str:
    """DuckDB oracle for shape_triangle_relation: the IDENTICAL
    edge-pair orientation tests, collinear-touch cases, vertex-in-
    triangle signs and even-odd crossing, unrolled per (triangle edge x
    polygon edge) from the same vertex/offset lists."""
    verts = _poly_int_verts(poly)
    n = len(verts)
    inter_terms = []
    for e in range(3):
        (ady, adx), (bdy, bdx) = TRI_OFFSETS[e], TRI_OFFSETS[(e + 1) % 3]
        ay, ax = f"(py+({ady}))", f"(px+({adx}))"
        by, bx = f"(py+({bdy}))", f"(px+({bdx}))"
        dxe, dye = bdx - adx, bdy - ady  # constant edge deltas
        for j in range(n):
            (y3, x3), (y4, x4) = verts[j], verts[(j + 1) % n]
            d1 = f"(({x4}-({x3}))*({ay}-({y3})) - ({y4}-({y3}))*({ax}-({x3})))"
            d2 = f"(({x4}-({x3}))*({by}-({y3})) - ({y4}-({y3}))*({bx}-({x3})))"
            d3 = f"(({dxe})*(({y3})-{ay}) - ({dye})*(({x3})-{ax}))"
            d4 = f"(({dxe})*(({y4})-{ay}) - ({dye})*(({x4})-{ax}))"
            proper = (f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0)) AND "
                      f"(({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))")
            on34_a = (f"({d1} = 0 AND {ax} BETWEEN {min(x3, x4)} AND {max(x3, x4)} "
                      f"AND {ay} BETWEEN {min(y3, y4)} AND {max(y3, y4)})")
            on34_b = (f"({d2} = 0 AND {bx} BETWEEN {min(x3, x4)} AND {max(x3, x4)} "
                      f"AND {by} BETWEEN {min(y3, y4)} AND {max(y3, y4)})")
            lo_x, hi_x = f"(px+({min(adx, bdx)}))", f"(px+({max(adx, bdx)}))"
            lo_y, hi_y = f"(py+({min(ady, bdy)}))", f"(py+({max(ady, bdy)}))"
            on12_3 = (f"({d3} = 0 AND {x3} BETWEEN {lo_x} AND {hi_x} "
                      f"AND {y3} BETWEEN {lo_y} AND {hi_y})")
            on12_4 = (f"({d4} = 0 AND {x4} BETWEEN {lo_x} AND {hi_x} "
                      f"AND {y4} BETWEEN {lo_y} AND {hi_y})")
            inter_terms.append(
                f"({proper} OR {on34_a} OR {on34_b} OR {on12_3} OR {on12_4})")
    qy, qx = verts[0]
    signs = []
    for e in range(3):
        (ady, adx), (bdy, bdx) = TRI_OFFSETS[e], TRI_OFFSETS[(e + 1) % 3]
        dxe, dye = bdx - adx, bdy - ady
        signs.append(f"(({dxe})*(({qy})-(py+({ady}))) - ({dye})*(({qx})-(px+({adx}))))")
    contains_q = ("((" + " AND ".join(f"{s} > 0" for s in signs) + ") OR ("
                  + " AND ".join(f"{s} < 0" for s in signs) + "))")
    inter_terms.append(contains_q)
    cross_terms = []
    for i in range(n):
        (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
        if y1 == y2:
            continue
        op = ">" if y2 > y1 else "<"
        cross_terms.append(
            f"CASE WHEN (({y1} > py) <> ({y2} > py)) AND "
            f"((py-({y1}))*({x2}-({x1})) - (px-({x1}))*({y2}-({y1})) {op} 0) "
            f"THEN 1 ELSE 0 END")
    return (
        "WITH g AS (SELECT c_custkey, "
        "CAST((c_custkey * 37) % 180 AS BIGINT) * 2 - 179 AS py, "
        "CAST((c_custkey * 73) % 360 AS BIGINT) * 2 - 359 AS px FROM customer) "
        "SELECT c_custkey, CASE WHEN (" + " OR ".join(inter_terms) + ") "
        "THEN 'INTERSECTS' WHEN ((" + " + ".join(cross_terms) + ") % 2 = 1) "
        "THEN 'WITHIN' ELSE 'DISJOINT' END AS relation "
        "FROM g ORDER BY c_custkey"
    )
