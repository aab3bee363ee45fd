"""Time-series operators (windows.py): engine vs DuckDB oracle at
sf0.001 plus hand-built edge semantics (gap boundaries, asof ties,
below-band drops)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    out = con.sql(e.oracle_sql()[name]).df()
    con.close()
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["asof_join", "session_window", "sliding_window_agg", "range_join_bands"]
)
def test_windows_entry_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    got = e.queries()[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = _oracle(name)
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    g, x = _canon(got), _canon(exp)
    for col in g.columns:
        assert (g[col].to_numpy() == x[col].to_numpy()).all(), col


def test_session_gap_boundary(ray_session, tmp_path):
    """Gap == gap_minutes stays in-session; gap just over starts a new
    one; per-user indices restart at 0."""
    from lucene_solr_ray.functions.windows import session_window

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = np.timedelta64(60_000_000, "us")  # 1 minute
    rows = [
        (1, base),                      # u1 s0
        (1, base + 30 * mins),          # exactly 30m gap -> SAME session
        (1, base + 61 * mins),          # 31m gap -> new session s1
        (2, base + 5 * mins),           # u2 s0
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "events.parquet")
    out = session_window(str(tmp_path), gap_minutes=30).to_pandas()
    key = out.set_index(["user_id", "session_idx"])["n_events"].to_dict()
    assert key == {(1, 0): 2, (1, 1): 1, (2, 0): 1}


def test_asof_tie_and_no_match(ray_session, tmp_path):
    """Exact-tie timestamps match (inclusive); lefts before any right
    drop (inner)."""
    from lucene_solr_ray.functions.windows import asof_join

    base = np.datetime64("2024-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    rows = [
        ("purchase", 1, base),            # before any signup -> drops
        ("signup", 1, base + 5 * sec),
        ("purchase", 1, base + 5 * sec),  # tie -> matches
        ("signup", 1, base + 9 * sec),
        ("purchase", 1, base + 10 * sec),  # matches the 9s signup
        ("purchase", 2, base + 10 * sec),  # user 2 has no signup -> drops
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[0] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "events.parquet")
    out = asof_join(str(tmp_path)).to_pandas()
    assert out["event_id"].tolist() == [2, 4]
    assert out["right_ts"].tolist() == [
        pd.Timestamp("2024-01-01 00:00:05"),
        pd.Timestamp("2024-01-01 00:00:09"),
    ]


def test_range_join_drops_below_first_band(ray_session, tmp_path):
    from lucene_solr_ray.functions.windows import range_join_bands

    t = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01", "us")] * 3, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([-1.0, 10.0, 160.0]),  # -100c drops; 1000c b0; 16000c b3
        "props": pa.array([""] * 3),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "events.parquet")
    out = range_join_bands(str(tmp_path)).to_pandas()
    assert out["band_id"].tolist() == [0, 3]
    assert out["n"].tolist() == [1, 1]
    assert out["sum_cents"].tolist() == [1000, 16000]


def test_cohort_retention_invariants(ray_session):
    """Cohort cells: week_offset 0 of each cohort counts every signup
    user of that week (the signup event itself is activity at offset 0),
    and cell counts never exceed the cohort size."""
    import duckdb

    from lucene_solr_ray.functions.windows import cohort_retention

    sf = "/root/testdata/sf0.01"
    got = cohort_retention(sf).to_pandas()
    con = duckdb.connect()
    sizes = con.sql(
        "SELECT CAST(epoch_us(MIN(ts)) // (CAST(7 AS BIGINT) * 86400000000) AS BIGINT) "
        f"AS cohort_week, user_id FROM read_parquet('{sf}/events.parquet') "
        "WHERE event_type = 'signup' GROUP BY user_id"
    ).df().groupby("cohort_week").size()
    for cw, grp in got.groupby("cohort_week"):
        base = int(sizes.loc[cw])
        w0 = grp[grp["week_offset"] == 0]
        assert len(w0) == 1 and int(w0["n_users"].iloc[0]) == base
        assert (grp["n_users"] <= base).all()
