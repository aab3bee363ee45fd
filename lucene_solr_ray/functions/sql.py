"""SqlStream — the Solr SQL interface ([U] solr/core/.../handler/sql/
SQLHandler.java, which plans SQL onto streaming expressions via Calcite)
re-expressed Ray-Data-first: a deliberately small SELECT grammar parsed
by recursive descent onto `read_parquet(columns=...)` → vectorized
arrow filter → partitioned `Dataset.join` → `groupby().aggregate(...)`
→ HAVING filter → `sort` → `limit`.

Supported (mirroring what SQLHandler's push-down planner covers):
  SELECT [DISTINCT] col [AS a] | COUNT(*) | SUM/MIN/MAX/COUNT(col)
         | COUNT(DISTINCT col) [AS a], ...
  FROM <table> [alias]
  [INNER|LEFT [OUTER] JOIN <table> [alias] ON a.col = b.col]
  [WHERE col op literal [AND ...]]        op ∈ = != <> < <= > >=
                                          | col IN ('a', 'b', ...)
                                          | col LIKE 'pat%'
  [GROUP BY col, ...]
  [HAVING agg op literal [AND ...]]       agg = alias or fn(arg) from SELECT
  [ORDER BY col|alias [DESC], ...]
  [LIMIT n]
  <select> UNION ALL <select> [...]       (trailing ORDER BY / LIMIT
                                           applies to the union, per SQL)

Everything else raises ValueError up front (Solr's behavior for SQL it
cannot plan).  The planner prunes each parquet read to exactly the
referenced columns, pushes WHERE into a zero-copy arrow compute filter
BEFORE the join/shuffle (left-join right-side predicates stay post-join
to preserve outer semantics — a WHERE on the nullable side filters
unmatched rows exactly like SQL), and maps GROUP BY onto the
hash-shuffle groupby — the same physical shapes the hand-written
streams use, so a 100 TB query shuffles only the join keys + pruned
payload columns, never unreferenced ones. Join width comes from
``io_utils.join_partitions()`` (cluster-sized, never a literal).

In a join query every column reference must be table-qualified
(``alias.col``) — the mini-planner has no catalog to disambiguate bare
names, and failing loudly beats guessing (DuckDB accepts the same
qualified SQL verbatim, which keeps the oracle identical).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from lucene_solr_ray.io_utils import join_partitions, read_parquet_clean
from ray.data.aggregate import Count, Max, Min, Sum

_AGG_FNS = {"count", "sum", "min", "max"}

_KEYWORDS = r"INNER|LEFT|OUTER|JOIN|WHERE|GROUP|ORDER|LIMIT|HAVING|ON|AS"

_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<items>.+?)\s+FROM\s+(?P<from_clause>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
    r"(?:\s+HAVING\s+(?P<having>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+)(?:\s+OFFSET\s+(?P<offset>\d+))?)?\s*;?\s*$",
    re.I | re.S,
)
# FROM clause pieces: base table then a left-deep chain of joins
_FROM_BASE_RE = re.compile(
    rf"^\s*(?P<table>\w+)(?:\s+(?:AS\s+)?(?P<alias>(?!(?:{_KEYWORDS})\b)\w+))?",
    re.I,
)
_JOIN_RE = re.compile(
    rf"\s+(?P<jtype>INNER|LEFT(?:\s+OUTER)?)\s+JOIN\s+(?P<jtable>\w+)"
    rf"(?:\s+(?:AS\s+)?(?P<j_alias>(?!(?:{_KEYWORDS})\b)\w+))?"
    r"\s+ON\s+(?P<l>\w+\.\w+)\s*=\s*(?P<r>\w+\.\w+)",
    re.I,
)
_AGG_RE = re.compile(
    r"^(?P<fn>\w+)\s*\(\s*(?P<distinct>DISTINCT\s+)?(?P<arg>\*|[\w.]+)\s*\)$",
    re.I)
_PRED_RE = re.compile(
    r"^\s*(?P<col>\w+(?:\.\w+)?)\s*(?P<op>=|!=|<>|<=|>=|<|>)\s*"
    r"(?P<lit>'[^']*'|-?\d+(?:\.\d+)?)\s*$"
)
_IN_RE = re.compile(
    r"^\s*(?P<col>\w+(?:\.\w+)?)\s+IN\s*\(\s*(?P<lits>'[^']*'(?:\s*,\s*'[^']*')*"
    r"|-?\d+(?:\.\d+)?(?:\s*,\s*-?\d+(?:\.\d+)?)*)\s*\)\s*$", re.I)
_LIKE_RE = re.compile(
    r"^\s*(?P<col>\w+(?:\.\w+)?)\s+LIKE\s+(?P<lit>'[^']*')\s*$", re.I)
_UNION_RE = re.compile(r"\s+UNION\s+ALL\s+", re.I)
_ON_RE = re.compile(r"^\s*(?P<l>\w+\.\w+)\s*=\s*(?P<r>\w+\.\w+)\s*$")
# HAVING operand: an aggregate expression or a bare alias
_HAVING_RE = re.compile(
    r"^\s*(?P<expr>\w+\s*\(\s*(?:\*|[\w.]+)\s*\)|\w+)\s*"
    r"(?P<op>=|!=|<>|<=|>=|<|>)\s*(?P<lit>-?\d+(?:\.\d+)?)\s*$"
)


def _lit(raw: str):
    if raw.startswith("'"):
        return raw[1:-1]
    return float(raw) if "." in raw else int(raw)


def parse_select(sql: str) -> dict:
    m = _SELECT_RE.match(sql)
    if not m:
        raise ValueError(f"cannot plan SQL (unsupported shape): {sql!r}")
    fm = _FROM_BASE_RE.match(m.group("from_clause"))
    if not fm:
        raise ValueError(f"cannot parse FROM clause: {m.group('from_clause')!r}")
    plan: dict = {"table": fm.group("table"), "items": [], "where": [], "group": [],
                  "order": [], "limit": None, "joins": [], "having": [],
                  "distinct": bool(m.group("distinct"))}
    aliases = {(fm.group("alias") or fm.group("table")): fm.group("table")}
    rest = m.group("from_clause")[fm.end():]
    pos = 0
    while pos < len(rest) and rest[pos:].strip():
        jm = _JOIN_RE.match(rest, pos)
        if not jm:
            raise ValueError(
                f"unsupported FROM-clause tail: {rest[pos:].strip()!r} "
                "(left-deep [INNER|LEFT] JOIN ... ON a.c = b.c chains only)")
        jt = "left_outer" if jm.group("jtype").upper().startswith("LEFT") else "inner"
        jalias = jm.group("j_alias") or jm.group("jtable")
        if jalias in aliases:
            raise ValueError(f"duplicate table alias {jalias!r}")
        aliases[jalias] = jm.group("jtable")
        plan["joins"].append({"table": jm.group("jtable"), "alias": jalias,
                              "type": jt, "on": (jm.group("l"), jm.group("r"))})
        pos = jm.end()
    plan["aliases"] = aliases

    for raw in _split_commas(m.group("items")):
        item, alias = _split_alias(raw)
        agg = _AGG_RE.match(item)
        if agg:
            fn = agg.group("fn").lower()
            arg = agg.group("arg")
            if agg.group("distinct"):
                if fn != "count" or arg == "*":
                    raise ValueError(f"only COUNT(DISTINCT col) is supported: {raw!r}")
                fn = "count_distinct"
            elif fn not in _AGG_FNS:
                raise ValueError(f"unsupported aggregate: {fn}")
            plan["items"].append(("agg", fn, arg, alias or _default_agg_alias(fn, arg)))
        elif re.fullmatch(r"\w+(?:\.\w+)?", item):
            plan["items"].append(("col", item, None, alias or item.split(".")[-1]))
        else:
            raise ValueError(f"unsupported select item: {raw!r}")

    if m.group("where"):
        for p in re.split(r"\s+AND\s+", m.group("where"), flags=re.I):
            pm = _PRED_RE.match(p)
            if pm:
                plan["where"].append(
                    (pm.group("col"), pm.group("op"), _lit(pm.group("lit"))))
                continue
            im = _IN_RE.match(p)
            if im:
                lits = tuple(_lit(x.strip())
                             for x in _split_commas(im.group("lits")))
                plan["where"].append((im.group("col"), "in", lits))
                continue
            lm = _LIKE_RE.match(p)
            if lm:
                plan["where"].append((lm.group("col"), "like", _lit(lm.group("lit"))))
                continue
            raise ValueError(f"unsupported predicate: {p!r}")

    if m.group("group"):
        plan["group"] = [g.strip() for g in m.group("group").split(",")]
    if m.group("having"):
        for p in re.split(r"\s+AND\s+", m.group("having"), flags=re.I):
            hm = _HAVING_RE.match(p)
            if not hm:
                raise ValueError(f"unsupported HAVING predicate: {p!r}")
            expr = hm.group("expr").strip()
            am = _AGG_RE.match(expr)
            if am:
                if am.group("distinct"):
                    raise ValueError("COUNT(DISTINCT) in HAVING is unsupported")
                fn = am.group("fn").lower()
                if fn not in _AGG_FNS:
                    raise ValueError(f"unsupported HAVING aggregate: {fn}")
                operand: tuple = ("agg", fn, am.group("arg"))
            else:
                operand = ("alias", expr)
            plan["having"].append((operand, hm.group("op"), _lit(hm.group("lit"))))
    if m.group("order"):
        for o in m.group("order").split(","):
            parts = o.split()
            desc = len(parts) > 1 and parts[1].upper() == "DESC"
            plan["order"].append((parts[0], desc))
    if m.group("limit"):
        plan["limit"] = int(m.group("limit"))
        plan["offset"] = int(m.group("offset") or 0)
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
    return fn if arg == "*" else f"{fn}_{arg.split('.')[-1]}"


def _validate(plan: dict) -> None:
    has_agg = any(it[0] == "agg" for it in plan["items"])
    group_bare = [g.split(".")[-1] for g in plan["group"]]
    if has_agg:
        non_group = [it for it in plan["items"]
                     if it[0] == "col" and it[1].split(".")[-1] not in group_bare]
        if non_group:
            raise ValueError(f"non-grouped column(s) with aggregates: {non_group}")
    elif plan["group"]:
        raise ValueError("GROUP BY without aggregates is unsupported")
    if plan["having"] and not has_agg:
        raise ValueError("HAVING requires aggregates")
    if plan["joins"]:
        # every real column reference must be alias-qualified
        refs = ([it[1] for it in plan["items"] if it[0] == "col"]
                + [it[2] for it in plan["items"] if it[0] == "agg" and it[2] != "*"]
                + [h[0][2] for h in plan["having"]
                   if h[0][0] == "agg" and h[0][2] != "*"]
                + [c for c, _, _ in plan["where"]] + plan["group"])
        bare = [r for r in refs if "." not in r]
        if bare:
            raise ValueError(f"join queries require qualified column refs: {bare}")
        # left-deep: each ON must link one already-joined alias to the
        # alias being joined
        joined = {a for a in plan["aliases"]
                  if plan["aliases"][a] == plan["table"]
                  and a not in {j["alias"] for j in plan["joins"]}}
        for j in plan["joins"]:
            sides = {j["on"][0].split(".")[0], j["on"][1].split(".")[0]}
            if j["alias"] not in sides or not (sides - {j["alias"]}) <= joined:
                raise ValueError(
                    f"join ON {j['on']} must link {j['alias']!r} to an "
                    f"already-joined table (have {sorted(joined)})")
            joined.add(j["alias"])


_OPS = {
    "=": pc.equal, "!=": pc.not_equal, "<>": pc.not_equal,
    "<": pc.less, "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
}


def _side_of(ref: str, plan: dict) -> str:
    """'alias.col' -> the underlying table name."""
    alias = ref.split(".")[0]
    if alias not in plan["aliases"]:
        raise ValueError(f"unknown table alias in {ref!r}")
    return plan["aliases"][alias]


def _filter_stage(preds: list[tuple[str, str, object]]):
    def apply_where(t: pa.Table) -> pa.Table:
        mask = None
        for col, op, lit in preds:
            if op == "in":
                m = pc.is_in(t.column(col), value_set=pa.array(list(lit)))
            elif op == "like":
                m = pc.match_like(t.column(col), lit)
            else:
                m = _OPS[op](t.column(col), pa.scalar(lit))
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return apply_where


def execute(sf_dir: str, sql: str) -> ray.data.Dataset:
    """Plan + execute against the sf_dir parquet tables. UNION ALL
    splits into branch plans executed independently and unioned (the
    trailing ORDER BY / LIMIT applies to the whole union, per SQL)."""
    parts = _UNION_RE.split(sql)
    if len(parts) == 1:
        return _execute_plan(sf_dir, parse_select(sql))
    plans = [parse_select(p) for p in parts]
    for p in plans[:-1]:
        if p["order"] or p["limit"] is not None:
            raise ValueError("ORDER BY / LIMIT inside a UNION ALL branch "
                             "is unsupported (put them after the union)")
    order, limit = plans[-1]["order"], plans[-1]["limit"]
    plans[-1]["order"], plans[-1]["limit"] = [], None
    names = [[it[3] for it in p["items"]] for p in plans]
    if any(n != names[0] for n in names[1:]):
        raise ValueError(
            f"UNION ALL branches must share output column names: {names}")
    outs = [_execute_plan(sf_dir, p) for p in plans]
    ds = outs[0].union(*outs[1:])
    if order:
        ds = ds.sort([k.split(".")[-1] for k, _ in order],
                     descending=[d for _, d in order])
    if limit is not None:
        ds = ds.limit(limit)
    return ds


def _execute_plan(sf_dir: str, plan: dict) -> ray.data.Dataset:
    bare = lambda r: r.split(".")[-1]  # noqa: E731

    col_refs = ({it[1] for it in plan["items"] if it[0] == "col"}
                | {it[2] for it in plan["items"] if it[0] == "agg" and it[2] != "*"}
                | {h[0][2] for h in plan["having"]
                   if h[0][0] == "agg" and h[0][2] != "*"}
                | {c for c, _, _ in plan["where"]}
                | set(plan["group"]))

    if plan["joins"]:
        base_alias = next(a for a, t in plan["aliases"].items()
                          if t == plan["table"]
                          and a not in {j["alias"] for j in plan["joins"]})
        # per-ALIAS pruned column sets: the alias's join keys + its refs
        side_cols: dict[str, set] = {base_alias: set()}
        for j in plan["joins"]:
            side_cols[j["alias"]] = set()
        for j in plan["joins"]:
            for ref in j["on"]:
                side_cols[ref.split(".")[0]].add(bare(ref))
        for r in col_refs:
            a = r.split(".")[0]
            if a not in side_cols:
                raise ValueError(f"unknown table alias in {r!r}")
            side_cols[a].add(bare(r))
        # bare output names must be globally unique: the join output is a
        # flat namespace (fail loudly instead of silently shadowing)
        seen: dict[str, str] = {}
        for a, cols in side_cols.items():
            for c in cols:
                if c in seen and seen[c] != a:
                    raise ValueError(
                        f"column name {c!r} appears in both {seen[c]!r} and "
                        f"{a!r}; bare names must be unique across the join")
                seen[c] = a
        # a table's predicates push below its exchange UNLESS it enters
        # via LEFT JOIN (outer semantics: the WHERE sees NULLs for
        # unmatched rows, so nullable-side predicates stay post-join)
        nullable = {j["alias"] for j in plan["joins"] if j["type"] == "left_outer"}
        pre: dict[str, list] = {a: [] for a in side_cols}
        post: list = []
        for c, op, v in plan["where"]:
            a = c.split(".")[0]
            if a not in side_cols:
                raise ValueError(f"unknown table alias in {c!r}")
            (post if a in nullable else pre[a]).append((bare(c), op, v))

        def _load(alias: str) -> ray.data.Dataset:
            d = read_parquet_clean(
                f"{sf_dir}/{plan['aliases'][alias]}.parquet",
                columns=sorted(side_cols[alias]))
            if pre[alias]:
                d = d.map_batches(_filter_stage(pre[alias]), batch_format="pyarrow")
            return d

        ds = _load(base_alias)
        joined_aliases = {base_alias}
        for j in plan["joins"]:
            lref, rref = j["on"]
            if rref.split(".")[0] != j["alias"]:  # ON written new-side-first
                lref, rref = rref, lref
            ds = ds.join(_load(j["alias"]), j["type"],
                         num_partitions=join_partitions(),
                         on=(bare(lref),), right_on=(bare(rref),))
            joined_aliases.add(j["alias"])
        if post:
            # arrow comparisons yield NULL for NULL; filter drops NULLs —
            # exactly SQL's unknown-is-false WHERE semantics
            ds = ds.map_batches(_filter_stage(post), batch_format="pyarrow")
    else:
        cols = sorted({bare(r) for r in col_refs})
        ds = read_parquet_clean(f"{sf_dir}/{plan['table']}.parquet",
                                columns=cols or None)
        if plan["where"]:
            ds = ds.map_batches(
                _filter_stage([(bare(c), op, v) for c, op, v in plan["where"]]),
                batch_format="pyarrow")

    group_bare = [bare(g) for g in plan["group"]]
    aggs = [it for it in plan["items"] if it[0] == "agg"]
    if aggs:
        # COUNT(*) counts rows: bind it to a concrete column with
        # ignore_nulls=False (Count with on=None returns 0 in the global
        # aggregate path of Ray 2.49). Under a left join the left key is
        # never null, so bind star to it.
        if group_bare:
            star_col = group_bare[0]
        elif plan["joins"]:
            # the non-new side of the first join is the base table's key:
            # never null under a left-deep chain (outer joins keep all
            # left rows; inner joins drop rows entirely)
            j0 = plan["joins"][0]
            star_col = bare(next(
                r for r in j0["on"] if r.split(".")[0] != j0["alias"]))
        else:
            star_col = sorted({bare(r) for r in col_refs})[0] if col_refs else ds.schema().names[0]
        def _spec(fn, arg, alias):
            if fn == "count":
                return (Count(on=star_col, ignore_nulls=False, alias_name=alias)
                        if arg == "*"
                        else Count(on=bare(arg), ignore_nulls=True, alias_name=alias))
            if fn == "sum":
                return Sum(bare(arg), alias_name=alias)
            if fn == "min":
                return Min(bare(arg), alias_name=alias)
            return Max(bare(arg), alias_name=alias)

        cd_aggs = [a for a in aggs if a[1] == "count_distinct"]
        specs = [_spec(fn, arg, alias) for _, fn, arg, alias in aggs
                 if fn != "count_distinct"]
        # resolve HAVING operands: a SELECT-agg alias, a matching SELECT
        # aggregate, or a HIDDEN aggregate computed alongside (SQL allows
        # HAVING on aggregates absent from the SELECT list) and dropped
        # after the filter
        hpreds, hidden = [], []
        by_expr = {(fn, "*" if arg == "*" else bare(arg)): alias
                   for _, fn, arg, alias in aggs}
        by_alias = {alias for _, fn, _, alias in aggs if fn != "count_distinct"}
        for operand, op, lit in plan["having"]:
            if operand[0] == "alias":
                if operand[1] not in by_alias:
                    raise ValueError(
                        f"HAVING alias {operand[1]!r} is not a SELECT aggregate alias")
                hpreds.append((operand[1], op, lit))
            else:
                _, fn, arg = operand
                key = (fn, "*" if arg == "*" else bare(arg))
                if key in by_expr:
                    hpreds.append((by_expr[key], op, lit))
                else:
                    halias = f"__h{len(hidden)}"
                    hidden.append(halias)
                    specs.append(_spec(fn, arg, halias))
                    hpreds.append((halias, op, lit))
        base = ds
        branches: list = []
        if specs:
            if group_bare:
                branches.append(base.groupby(group_bare).aggregate(*specs))
            else:
                r = base.aggregate(*specs)
                # global aggregate returns a dict — lift back into a Dataset
                branches.append(
                    ray.data.from_items([r]) if isinstance(r, dict) else r)
        # COUNT(DISTINCT col): distinct (group, col) pairs first (one
        # hash shuffle over the pair key), then a group-sized count of
        # non-null values
        for _, _, arg, alias in cd_aggs:
            keys = group_bare + [bare(arg)]
            dd = base.select_columns(keys).groupby(keys).aggregate(
                Count(on=keys[0], ignore_nulls=False, alias_name="__o"))
            if group_bare:
                dd = dd.drop_columns(["__o"]).groupby(group_bare).aggregate(
                    Count(on=bare(arg), ignore_nulls=True, alias_name=alias))
            else:
                r = dd.aggregate(
                    Count(on=bare(arg), ignore_nulls=True, alias_name=alias))
                dd = ray.data.from_items([r]) if isinstance(r, dict) else r
            branches.append(dd)
        if len(branches) == 1:
            ds = branches[0]
        elif not group_bare:  # single-row global results: driver merge
            row: dict = {}
            for b in branches:
                row.update(b.take_all()[0])
            ds = ray.data.from_items([row])
        else:
            # joining two groupby-aggregate lineages crashes Ray 2.49's
            # hash-shuffle join (zero-row partitions from unresolved
            # schemas) — merge as NULL-padded union + one groupby
            # instead: each group appears exactly once per branch, so a
            # null-skipping Max per value column is the exact merge
            all_cols: dict[str, pa.DataType] = {}
            for b in branches:
                sch = b.schema()
                for n_, t_ in zip(sch.names, sch.types):
                    all_cols.setdefault(n_, t_)
            value_cols = [c for c in all_cols if c not in group_bare]

            def _pad(cols_all):
                def pad(t: pa.Table) -> pa.Table:
                    return pa.table({
                        c: (t.column(c) if c in t.column_names
                            else pa.nulls(t.num_rows, ty))
                        for c, ty in cols_all.items()})
                return pad

            ds = branches[0].map_batches(_pad(all_cols), batch_format="pyarrow")
            for b in branches[1:]:
                ds = ds.union(
                    b.map_batches(_pad(all_cols), batch_format="pyarrow"))
            ds = ds.groupby(group_bare).aggregate(
                *[Max(c, alias_name=c) for c in value_cols])
        if hpreds:
            ds = ds.map_batches(_filter_stage(hpreds), batch_format="pyarrow")
        if hidden:
            ds = ds.drop_columns(hidden)
        # rename group columns to their SELECT aliases
        renames = {it[1].split(".")[-1]: it[3] for it in plan["items"]
                   if it[0] == "col" and it[1].split(".")[-1] != it[3]}
        if renames:
            ds = ds.map_batches(
                lambda t, rn=renames: t.rename_columns(
                    [rn.get(c, c) for c in t.column_names]),
                batch_format="pyarrow")
    else:
        renames = {bare(it[1]): it[3] for it in plan["items"]
                   if it[0] == "col" and bare(it[1]) != it[3]}
        keep = [bare(it[1]) for it in plan["items"]]
        ds = ds.select_columns(keep)
        if renames:
            ds = ds.rename_columns(renames)
        if plan["distinct"]:
            out_names = [it[3] for it in plan["items"]]
            # distinct == groupby all output columns, keep the key row
            # (Count then drop: one hash shuffle, no per-group UDF)
            ds = (ds.groupby(out_names)
                    .aggregate(Count(on=out_names[0], ignore_nulls=False,
                                     alias_name="__n"))
                    .select_columns(out_names))

    if plan["order"]:
        keys = [bare(k) for k, _ in plan["order"]]
        descending = [d for _, d in plan["order"]]
        ds = ds.sort(keys, descending=descending)
    if plan["limit"] is not None:
        offset = plan.get("offset") or 0
        if offset:
            # LIMIT n OFFSET m: pull the (bounded) n+m head once and
            # slice — a skip can't stream, but the head is output-sized
            # by construction
            import pyarrow as _pa

            head = ds.limit(plan["limit"] + offset).take_all()[offset:]
            ds = ray.data.from_arrow(_pa.Table.from_pylist(head))
        else:
            ds = ds.limit(plan["limit"])
    return ds


SQL_DEMO = (
    "SELECT o_orderstatus, COUNT(*) AS n, MIN(o_custkey) AS min_ck, "
    "MAX(o_custkey) AS max_ck FROM orders WHERE o_totalprice >= 150000 "
    "GROUP BY o_orderstatus ORDER BY o_orderstatus"
)

# inner join + HAVING: per-segment stats over high-value orders, only
# segments with enough of them ([U] SQLHandler plans the same shape via
# Calcite onto a hashJoin + rollup + having stream)
SQL_JOIN_DEMO = (
    "SELECT c.c_mktsegment AS seg, COUNT(*) AS n, MIN(o.o_orderkey) AS min_ok, "
    "MAX(o.o_orderkey) AS max_ok FROM orders o INNER JOIN customer c "
    "ON o.o_custkey = c.c_custkey WHERE o.o_totalprice >= 150000 "
    "GROUP BY c.c_mktsegment HAVING COUNT(*) > 10 ORDER BY seg"
)

# left outer join: every segment keeps its customer rows; COUNT(col) is
# null-skipping so customers without qualifying orders count 0 orders
SQL_LEFT_JOIN_DEMO = (
    "SELECT c.c_mktsegment AS seg, COUNT(*) AS n_rows, "
    "COUNT(o.o_orderkey) AS n_orders FROM customer c "
    "LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey "
    "GROUP BY c.c_mktsegment ORDER BY seg"
)

SQL_DISTINCT_DEMO = (
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders "
    "ORDER BY o_orderstatus, o_orderpriority"
)

# left-deep 3-way chain: orders -> customer -> nation, predicates pushed
# below each table's exchange
SQL_JOIN3_DEMO = (
    "SELECT n.n_name AS nation, COUNT(*) AS n, MAX(o.o_orderkey) AS max_ok "
    "FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey "
    "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "WHERE o.o_totalprice >= 150000 GROUP BY n.n_name ORDER BY nation"
)


# IN + LIKE predicate pushdown (both filter below any exchange)
SQL_IN_LIKE_DEMO = (
    "SELECT c_custkey, c_mktsegment FROM customer "
    "WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') "
    "AND c_name LIKE '%1' ORDER BY c_custkey"
)

# UNION ALL of two pruned scans; the trailing ORDER BY sorts the union
SQL_UNION_DEMO = (
    "SELECT o_orderkey AS id, o_custkey AS k FROM orders "
    "WHERE o_orderstatus = 'P' "
    "UNION ALL "
    "SELECT l_orderkey AS id, l_suppkey AS k FROM lineitem "
    "WHERE l_linenumber >= 6 ORDER BY id, k"
)

# COUNT(DISTINCT): distinct-pair shuffle + group-sized count, joined to
# the plain aggregates on the group key
SQL_COUNT_DISTINCT_DEMO = (
    "SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS n_prio, "
    "COUNT(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
)


# LIMIT/OFFSET paging (deterministic under the total ORDER BY)
SQL_OFFSET_DEMO = (
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 150000 "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 15"
)


def sql_stream_agg(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract entry: the oracle runs the IDENTICAL SQL string."""
    return execute(sf_dir, SQL_DEMO)


def sql_stream_offset(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_OFFSET_DEMO)


def sql_stream_join(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_JOIN_DEMO)


def sql_stream_left_join(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_LEFT_JOIN_DEMO)


def sql_stream_distinct(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_DISTINCT_DEMO)


def sql_stream_join3(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_JOIN3_DEMO)


def sql_stream_in_like(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_IN_LIKE_DEMO)


def sql_stream_union(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_UNION_DEMO)


def sql_stream_count_distinct(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_COUNT_DISTINCT_DEMO)
