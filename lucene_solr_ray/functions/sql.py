"""SqlStream — the Solr SQL interface ([U] solr/core/.../handler/sql/
SQLHandler.java, which plans SQL onto streaming expressions via Calcite)
re-expressed Ray-Data-first: a deliberately small SELECT grammar parsed
by recursive descent onto `read_parquet(columns=...)` → vectorized
arrow filter → `groupby().aggregate(...)` → `sort` → `limit`.

Supported (mirroring what SQLHandler's push-down planner covers):
  SELECT col [AS a] | COUNT(*) | SUM/MIN/MAX/COUNT(col) [AS a], ...
  FROM <table>
  [WHERE col op literal [AND ...]]        op ∈ = != <> < <= > >=
  [GROUP BY col, ...]
  [ORDER BY col|alias [DESC], ...]
  [LIMIT n]

Everything else raises ValueError up front (Solr's behavior for SQL it
cannot plan).  The planner prunes the parquet read to exactly the
referenced columns, pushes WHERE into a zero-copy arrow compute filter
before any shuffle, and maps GROUP BY onto the hash-shuffle groupby —
the same physical shapes the hand-written streams use, so a 100 TB
query shuffles only the grouped aggregate, never raw rows.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from lucene_solr_ray.io_utils import read_parquet_clean
from ray.data.aggregate import Count, Max, Min, Sum

_AGG_FNS = {"count", "sum", "min", "max"}

_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<table>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$",
    re.I | re.S,
)
_AGG_RE = re.compile(r"^(?P<fn>\w+)\s*\(\s*(?P<arg>\*|[\w.]+)\s*\)$")
_PRED_RE = re.compile(
    r"^\s*(?P<col>\w+)\s*(?P<op>=|!=|<>|<=|>=|<|>)\s*(?P<lit>'[^']*'|-?\d+(?:\.\d+)?)\s*$"
)


def parse_select(sql: str) -> dict:
    m = _SELECT_RE.match(sql)
    if not m:
        raise ValueError(f"cannot plan SQL (unsupported shape): {sql!r}")
    plan: dict = {"table": m.group("table"), "items": [], "where": [], "group": [],
                  "order": [], "limit": None}

    for raw in _split_commas(m.group("items")):
        item, alias = _split_alias(raw)
        agg = _AGG_RE.match(item)
        if agg:
            fn = agg.group("fn").lower()
            if fn not in _AGG_FNS:
                raise ValueError(f"unsupported aggregate: {fn}")
            arg = agg.group("arg")
            plan["items"].append(("agg", fn, arg, alias or _default_agg_alias(fn, arg)))
        elif re.fullmatch(r"\w+", item):
            plan["items"].append(("col", item, None, alias or item))
        else:
            raise ValueError(f"unsupported select item: {raw!r}")

    if m.group("where"):
        for p in re.split(r"\s+AND\s+", m.group("where"), flags=re.I):
            pm = _PRED_RE.match(p)
            if not pm:
                raise ValueError(f"unsupported predicate: {p!r}")
            lit: object = pm.group("lit")
            if isinstance(lit, str) and lit.startswith("'"):
                lit = lit[1:-1]
            else:
                lit = float(lit) if "." in str(lit) else int(lit)
            plan["where"].append((pm.group("col"), pm.group("op"), lit))

    if m.group("group"):
        plan["group"] = [g.strip() for g in m.group("group").split(",")]
    if m.group("order"):
        for o in m.group("order").split(","):
            parts = o.split()
            desc = len(parts) > 1 and parts[1].upper() == "DESC"
            plan["order"].append((parts[0], desc))
    if m.group("limit"):
        plan["limit"] = int(m.group("limit"))
    _validate(plan)
    return plan


def _split_commas(s: str) -> list[str]:
    """Split on commas not inside parens."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return out


def _split_alias(item: str) -> tuple[str, str | None]:
    m = re.match(r"^(.*?)\s+AS\s+(\w+)\s*$", item, re.I)
    if m:
        return m.group(1).strip(), m.group(2)
    return item.strip(), None


def _default_agg_alias(fn: str, arg: str) -> str:
    return fn if arg == "*" else f"{fn}_{arg}"


def _validate(plan: dict) -> None:
    has_agg = any(it[0] == "agg" for it in plan["items"])
    if has_agg:
        non_group = [it for it in plan["items"] if it[0] == "col" and it[1] not in plan["group"]]
        if non_group:
            raise ValueError(f"non-grouped column(s) with aggregates: {non_group}")
    elif plan["group"]:
        raise ValueError("GROUP BY without aggregates is unsupported")


_OPS = {
    "=": pc.equal, "!=": pc.not_equal, "<>": pc.not_equal,
    "<": pc.less, "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def execute(sf_dir: str, sql: str) -> ray.data.Dataset:
    """Plan + execute against the sf_dir parquet tables."""
    plan = parse_select(sql)
    cols = sorted(
        {it[1] for it in plan["items"] if it[0] == "col"}
        | {it[2] for it in plan["items"] if it[0] == "agg" and it[2] != "*"}
        | {c for c, _, _ in plan["where"]}
        | set(plan["group"])
    )
    ds = read_parquet_clean(f"{sf_dir}/{plan['table']}.parquet", columns=cols or None)

    if plan["where"]:
        preds = list(plan["where"])

        def apply_where(t: pa.Table) -> pa.Table:
            mask = None
            for col, op, lit in preds:
                m = _OPS[op](t.column(col), pa.scalar(lit))
                mask = m if mask is None else pc.and_(mask, m)
            return t.filter(mask)

        ds = ds.map_batches(apply_where, batch_format="pyarrow")

    aggs = [it for it in plan["items"] if it[0] == "agg"]
    if aggs:
        # COUNT(*) counts rows: bind it to a concrete column with
        # ignore_nulls=False (Count with on=None returns 0 in the global
        # aggregate path of Ray 2.49)
        star_col = plan["group"][0] if plan["group"] else (cols[0] if cols else ds.schema().names[0])
        specs = []
        for _, fn, arg, alias in aggs:
            if fn == "count":
                specs.append(
                    Count(on=star_col, ignore_nulls=False, alias_name=alias)
                    if arg == "*"
                    else Count(on=arg, ignore_nulls=True, alias_name=alias)
                )
            elif fn == "sum":
                specs.append(Sum(arg, alias_name=alias))
            elif fn == "min":
                specs.append(Min(arg, alias_name=alias))
            elif fn == "max":
                specs.append(Max(arg, alias_name=alias))
        if plan["group"]:
            ds = ds.groupby(plan["group"]).aggregate(*specs)
        else:
            ds = ds.aggregate(*specs)
            # global aggregate returns a dict — lift back into a Dataset
            ds = ray.data.from_items([ds]) if isinstance(ds, dict) else ds
    else:
        renames = {it[1]: it[3] for it in plan["items"] if it[0] == "col" and it[1] != it[3]}
        keep = [it[1] for it in plan["items"]]
        ds = ds.select_columns(keep)
        if renames:
            ds = ds.rename_columns(renames)

    if plan["order"]:
        keys = [k for k, _ in plan["order"]]
        descending = [d for _, d in plan["order"]]
        ds = ds.sort(keys, descending=descending)
    if plan["limit"] is not None:
        ds = ds.limit(plan["limit"])
    return ds


SQL_DEMO = (
    "SELECT o_orderstatus, COUNT(*) AS n, MIN(o_custkey) AS min_ck, "
    "MAX(o_custkey) AS max_ck FROM orders WHERE o_totalprice >= 150000 "
    "GROUP BY o_orderstatus ORDER BY o_orderstatus"
)


def sql_stream_agg(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract entry: the oracle runs the IDENTICAL SQL string."""
    return execute(sf_dir, SQL_DEMO)
