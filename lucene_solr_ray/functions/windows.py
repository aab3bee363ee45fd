"""Time-series operators Ray Data lacks natively — as-of join, session
windows, sliding-window aggregates, range join (SURVEY §2.8 adjacents;
the reference's streaming algebra has no direct equivalents, but every
large-scale event/training-data pipeline needs them, per the brief).

Distributed shape shared by the keyed operators: hash-bucket the key
into ``n_buckets`` groups (NOT one group per key — Ray's groupby cost
scales with group count, CLAUDE.md), shuffle once, then solve each
bucket vectorized in pandas/NumPy (merge_asof / diff+cumsum). The
partitioning assumption is per-BUCKET history fits in a worker's heap;
buckets are count-controllable, unlike raw key cardinality. Money
floats become exact cents per-row before any aggregation (FIXTURES).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from lucene_solr_ray.functions.relational import _cents, _read


_N_BUCKETS = 64  # keyed-operator shuffle width (≈ blocks at 100×, not keys)


def _bucketed(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy().astype(np.uint64)
        # key is int64 here; multiplicative (Fibonacci) hash keeps
        # sequential user_ids from landing in one bucket
        b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)).astype(np.int64) % _N_BUCKETS
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "signup",
              tolerance_us: int | None = None) -> pa.Table:
    """As-of join: for each ``left_type`` event, the most recent
    ``right_type`` event of the same user at or before its timestamp
    (backward, inclusive — DuckDB ``ASOF JOIN`` semantics; rows with no
    earlier match drop, inner join). ``tolerance_us`` bounds the lookback
    (kdb aj / pandas merge_asof tolerance): matches older than the
    window drop too.

    One hash shuffle on user-bucket co-locates both sides; each bucket
    resolves with a single vectorized ``pd.merge_asof`` (sorted merge,
    no per-key loop). Output is exact-typed (ids + timestamps), so the
    oracle comparison is bit-stable."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    both = ev.filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("ts", kind="stable")
        left = g[g["event_type"] == left_type][["event_id", "ts", "user_id"]]
        right = g[g["event_type"] == right_type][["ts", "user_id"]].rename(
            columns={"ts": "right_ts"})
        if len(left) == 0 or len(right) == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "right_ts": pa.array([], pa.timestamp("us"))})
        m = pd.merge_asof(left, right, left_on="ts", right_on="right_ts",
                          by="user_id", direction="backward",
                          allow_exact_matches=True,
                          tolerance=(pd.Timedelta(tolerance_us, "us")
                                     if tolerance_us is not None else None))
        m = m.dropna(subset=["right_ts"])
        out = pa.table({
            "event_id": pa.array(m["event_id"].to_numpy().astype(np.int64)),
            "user_id": pa.array(m["user_id"].to_numpy().astype(np.int64)),
            "ts": pa.array(m["ts"].to_numpy().astype("datetime64[us]")),
            "right_ts": pa.array(m["right_ts"].to_numpy().astype("datetime64[us]")),
        })
        return out

    out = (
        _bucketed(both, "user_id")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort("event_id")
        .to_pandas()
    )  # output-sized (one row per matched left event)
    return pa.table({
        "event_id": pa.array(out["event_id"].to_numpy().astype(np.int64)),
        "user_id": pa.array(out["user_id"].to_numpy().astype(np.int64)),
        "ts": pa.array(out["ts"].to_numpy().astype("datetime64[us]")),
        "right_ts": pa.array(out["right_ts"].to_numpy().astype("datetime64[us]")),
    })


def session_window(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Sessionize events per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. Emits one row per
    session (user_id, session_idx, n_events, start/end ts).

    Same one-shuffle bucket shape as asof_join; inside a bucket the
    session boundaries are a vectorized diff + cumsum (no Python row
    loop). Tie timestamps are gap-0, so boundary assignment is
    order-independent and exactly matches the SQL LAG formulation."""
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        new_user = np.empty(len(g), dtype=bool)
        new_user[0:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[0:1] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_sess = new_user | (gap > gap_us)
        sess_id = np.cumsum(new_sess) - 1  # global session ordinal in bucket
        # per-user 0-based index: ordinal minus ordinal at the user's start
        first_of_user = np.zeros(len(g), dtype=np.int64)
        starts = np.flatnonzero(new_user)
        first_of_user[starts] = sess_id[starts]
        first_of_user = np.maximum.accumulate(first_of_user)
        df = pd.DataFrame({
            "user_id": uid, "sess": sess_id,
            "session_idx": sess_id - first_of_user, "ts_us": ts,
        })
        agg = df.groupby("sess", sort=True).agg(
            user_id=("user_id", "first"), session_idx=("session_idx", "first"),
            n_events=("ts_us", "size"), start_us=("ts_us", "min"),
            end_us=("ts_us", "max"))
        return pa.table({
            "user_id": pa.array(agg["user_id"].to_numpy().astype(np.int64)),
            "session_idx": pa.array(agg["session_idx"].to_numpy().astype(np.int64)),
            "n_events": pa.array(agg["n_events"].to_numpy().astype(np.int64)),
            "start_ts": pa.array(agg["start_us"].to_numpy().astype("datetime64[us]")),
            "end_ts": pa.array(agg["end_us"].to_numpy().astype("datetime64[us]")),
        })

    out = (
        _bucketed(ev, "user_id")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(["user_id", "session_idx"])
        .to_pandas()
    )
    return pa.table({
        "user_id": pa.array(out["user_id"].to_numpy().astype(np.int64)),
        "session_idx": pa.array(out["session_idx"].to_numpy().astype(np.int64)),
        "n_events": pa.array(out["n_events"].to_numpy().astype(np.int64)),
        "start_ts": pa.array(out["start_ts"].to_numpy().astype("datetime64[us]")),
        "end_ts": pa.array(out["end_ts"].to_numpy().astype("datetime64[us]")),
    })


def sliding_window_agg(sf_dir: str, preceding: int = 2) -> pa.Table:
    """Row-frame moving sum over hourly buckets per event_type
    (``ROWS BETWEEN preceding PRECEDING AND CURRENT ROW`` over the
    buckets that EXIST — gap hours are not zero-filled, matching the
    SQL ROWS frame exactly).

    Scale shape: the heavy pass is a map-side partial groupby to
    (event_type, hour) — output-sized (types × hours) — then the moving
    sum is a cumsum difference per type on the tiny bucket table."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        hour_us = pc.multiply(pc.divide(us, pa.scalar(3_600_000_000)),
                              pa.scalar(3_600_000_000))
        return pa.table({
            "event_type": t.column("event_type"),
            "hour": pc.cast(hour_us, pa.timestamp("us")),
            "cents": _cents(t.column("value")),
        })

    buckets = (
        ev.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
        .sort(["event_type", "hour"])
        .to_pandas()
    )  # output-sized: |types| × |hours|
    parts = []
    for _, g in buckets.groupby("event_type", sort=True):
        s = g["sum_cents"].to_numpy().astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(s)])
        lo = np.maximum(np.arange(len(s)) - preceding, 0)
        moving = cs[np.arange(1, len(s) + 1)] - cs[lo]
        parts.append(g.assign(moving_cents=moving))
    out = pd.concat(parts, ignore_index=True)
    return pa.table({
        "event_type": pa.array(out["event_type"].astype(str)),
        "hour": pa.array(out["hour"].to_numpy().astype("datetime64[us]")),
        "n": pa.array(out["n"].to_numpy().astype(np.int64)),
        "sum_cents": pa.array(out["sum_cents"].to_numpy().astype(np.int64)),
        "moving_cents": pa.array(out["moving_cents"].to_numpy().astype(np.int64)),
    })


_BAND_EDGES_CENTS = np.array([0, 5_000, 10_000, 15_000], dtype=np.int64)


def range_join_bands(sf_dir: str) -> pa.Table:
    """Range (band) join: events.value joined to a small interval table
    ``[lo, hi)`` — the canonical broadcast range join. The band table is
    driver-tiny, so the join is a per-batch ``searchsorted`` against the
    broadcast edge array inside map_batches: zero shuffle for the join
    itself; the only exchange is the final output-sized groupby."""
    edges = _BAND_EDGES_CENTS
    ev = _read(sf_dir, "events", ["value"])

    def assign(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value")).to_numpy()
        band = np.searchsorted(edges, c, side="right") - 1
        keep = band >= 0  # inner join: below the first band -> no match
        return pa.table({
            "band_id": pa.array(band[keep].astype(np.int64)),
            "cents": pa.array(c[keep].astype(np.int64)),
        })

    return pa.Table.from_pandas(
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby("band_id")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
        .sort("band_id")
        .to_pandas(),
        preserve_index=False,
    ).replace_schema_metadata(None)


def cohort_retention(sf_dir: str) -> pa.Table:
    """Cohort retention analysis — the canonical product-analytics
    rollup (signup-week cohorts x weeks-since-signup active users) a
    warehouse runs beside search: each user's events co-locate via the
    user-bucket hash shuffle, per-bucket pandas derives the cohort
    (first signup) and the distinct (cohort_week, week_offset, user)
    activity grid, and one bucket-domain groupby counts users per cell.
    Weeks are exact int64 microsecond arithmetic; events before the
    user's signup drop (no negative offsets)."""
    from ray.data.aggregate import Sum

    wk = 7 * 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        su = g[g["event_type"] == "signup"]
        if su.empty:
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        first = su.groupby("user_id")["ts"].min()
        m = g.merge(first.rename("s_ts"), on="user_id")
        m = m[m["ts"] >= m["s_ts"]]
        s_us = m["s_ts"].astype("int64")
        e_us = m["ts"].astype("int64")
        cohort = (s_us // wk).astype("int64")
        offset = ((e_us - s_us) // wk).astype("int64")
        tri = pd.DataFrame({"cohort_week": cohort, "week_offset": offset,
                            "user_id": m["user_id"]}).drop_duplicates()
        cells = (tri.groupby(["cohort_week", "week_offset"])
                 .size().reset_index(name="n_users"))
        return pa.table({
            "cohort_week": pa.array(cells["cohort_week"].to_numpy().astype(np.int64)),
            "week_offset": pa.array(cells["week_offset"].to_numpy().astype(np.int64)),
            "n_users": pa.array(cells["n_users"].to_numpy().astype(np.int64)),
        })

    out = (
        _bucketed(ev, "user_id")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort(["cohort_week", "week_offset"])
        .to_pandas()
    )
    return pa.table({
        "cohort_week": pa.array(out["cohort_week"].astype(np.int64), pa.int64()),
        "week_offset": pa.array(out["week_offset"].astype(np.int64), pa.int64()),
        "n_users": pa.array(out["n_users"].astype(np.int64), pa.int64()),
    })
