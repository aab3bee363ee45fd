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
