"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() on the same sf_dir, compare row-count, schema
(column names), and order-insensitive values (columns sorted by name,
rows sorted). Usage: python tools/check_correctness.py [sf_dir] [name...]"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"schema: ray={sorted(got.columns)} sql={sorted(exp.columns)}"]
    if len(got) != len(exp):
        issues.append(f"rows: ray={len(got)} sql={len(exp)}")
    g, e = canon(got), canon(exp)
    if len(g) == len(e):
        for col in g.columns:
            gv, ev = g[col].to_numpy(), e[col].to_numpy()
            if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                if not np.allclose(gv.astype(float), ev.astype(float), rtol=0, atol=0, equal_nan=True):
                    issues.append(f"col {col}: float mismatch (exact)")
            elif not (gv == ev).all():
                bad = int((gv != ev).sum())
                issues.append(f"col {col}: {bad} mismatched values e.g. ray={gv[gv != ev][:3]} sql={ev[gv != ev][:3]}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray raised {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        wall = time.perf_counter() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"  ok {name}: rows-only ({len(got)} rows, {wall:.1f}s) [no oracle]")
            n_ok += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: SQL raised {exc}")
            n_bad += 1
            continue
        issues = compare(name, got, exp)
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            n_bad += 1
        else:
            print(f"  ok {name}: {len(got)} rows match ({wall:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
