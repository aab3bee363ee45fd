"""SqlStream — the Solr SQL interface ([U] solr/core/.../handler/sql/
SQLHandler.java, which plans SQL onto streaming expressions via Calcite)
re-expressed Ray-Data-first: a deliberately small SELECT grammar parsed
by recursive descent onto `read_parquet(columns=...)` → vectorized
arrow filter → partitioned `Dataset.join` → `groupby().aggregate(...)`
→ HAVING filter → `sort` → `limit`.

Supported (mirroring what SQLHandler's push-down planner covers):
  SELECT [DISTINCT] col [AS a] | <int arithmetic over cols: + - * % ()>
         | COUNT(*) | SUM/MIN/MAX/COUNT/AVG(col)
         | COUNT(DISTINCT col) [AS a], ...
  FROM <table> [alias]
  [INNER|LEFT [OUTER] JOIN <table> [alias] ON a.col = b.col]
  [WHERE <boolean tree of predicates: AND OR NOT ()>]
         atoms: col op literal            op ∈ = != <> < <= > >=
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

_AGG_FNS = {"count", "sum", "min", "max", "avg"}

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


# --- WHERE boolean trees (AND/OR/NOT with parens, SQL Kleene logic) ----------

_TOK_RE = re.compile(
    r"\s*(?:(?P<str>'[^']*')|(?P<num>-?\d+(?:\.\d+)?)|(?P<op><=|>=|<>|!=|=|<|>)"
    r"|(?P<lp>\()|(?P<rp>\))|(?P<comma>,)|(?P<word>\w+(?:\.\w+)?))"
)


def _pred_tokens(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOK_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"cannot tokenize predicate near {s[pos:pos+20]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _PredParser:
    """Recursive descent over the predicate token stream:
    expr := and_expr (OR and_expr)* ; and_expr := not_expr (AND not_expr)* ;
    not_expr := NOT not_expr | '(' expr ')' | atom. AST nodes:
    ('or', [..]) ('and', [..]) ('not', x) ('atom', (col, op, lit))."""

    def __init__(self, s: str):
        self.toks = _pred_tokens(s)
        self.i = 0

    def _peek_word(self):
        if self.i < len(self.toks) and self.toks[self.i][0] == "word":
            return self.toks[self.i][1].upper()
        return None

    def parse(self):
        node = self._or()
        if self.i != len(self.toks):
            raise ValueError(
                f"unsupported predicate tail: {self.toks[self.i:]!r}")
        return node

    def _or(self):
        subs = [self._and()]
        while self._peek_word() == "OR":
            self.i += 1
            subs.append(self._and())
        return subs[0] if len(subs) == 1 else ("or", subs)

    def _and(self):
        subs = [self._not()]
        while self._peek_word() == "AND":
            self.i += 1
            subs.append(self._not())
        return subs[0] if len(subs) == 1 else ("and", subs)

    def _not(self):
        if self._peek_word() == "NOT":
            self.i += 1
            return ("not", self._not())
        if self.i < len(self.toks) and self.toks[self.i][0] == "lp":
            # '(' could open a grouped boolean expr — atoms never start
            # with a paren, so this is unambiguous
            self.i += 1
            node = self._or()
            if self.i >= len(self.toks) or self.toks[self.i][0] != "rp":
                raise ValueError("unbalanced parens in predicate")
            self.i += 1
            return node
        return self._atom()

    def _atom(self):
        if self.i >= len(self.toks) or self.toks[self.i][0] != "word":
            raise ValueError(f"expected predicate at token {self.i}")
        col = self.toks[self.i][1]
        self.i += 1
        if self.i < len(self.toks) and self.toks[self.i][0] == "op":
            op = self.toks[self.i][1]
            self.i += 1
            kind, raw = self.toks[self.i]
            if kind not in ("str", "num"):
                raise ValueError(f"expected literal after {col} {op}")
            self.i += 1
            return ("atom", (col, op, _lit(raw)))
        kw = self._peek_word()
        if kw == "IN":
            self.i += 1
            if self.toks[self.i][0] != "lp":
                raise ValueError("expected ( after IN")
            self.i += 1
            lits = []
            while True:
                kind, raw = self.toks[self.i]
                if kind not in ("str", "num"):
                    raise ValueError("expected literal in IN list")
                lits.append(_lit(raw))
                self.i += 1
                if self.toks[self.i][0] == "comma":
                    self.i += 1
                    continue
                if self.toks[self.i][0] == "rp":
                    self.i += 1
                    break
                raise ValueError("malformed IN list")
            return ("atom", (col, "in", tuple(lits)))
        if kw == "LIKE":
            self.i += 1
            kind, raw = self.toks[self.i]
            if kind != "str":
                raise ValueError("expected string literal after LIKE")
            self.i += 1
            return ("atom", (col, "like", _lit(raw)))
        if kw == "BETWEEN":
            # sugar for col >= a AND col <= b; the atom consumes ITS
            # OWN "AND" before the boolean-AND loop resumes
            self.i += 1
            kind, raw_lo = self.toks[self.i]
            if kind not in ("str", "num"):
                raise ValueError("expected literal after BETWEEN")
            self.i += 1
            if self._peek_word() != "AND":
                raise ValueError("expected AND in BETWEEN")
            self.i += 1
            kind, raw_hi = self.toks[self.i]
            if kind not in ("str", "num"):
                raise ValueError("expected upper literal in BETWEEN")
            self.i += 1
            return ("and", [("atom", (col, ">=", _lit(raw_lo))),
                            ("atom", (col, "<=", _lit(raw_hi)))])
        if kw == "IS":
            self.i += 1
            neg = False
            if self._peek_word() == "NOT":
                neg = True
                self.i += 1
            if self._peek_word() != "NULL":
                raise ValueError("expected NULL after IS [NOT]")
            self.i += 1
            node = ("atom", (col, "is_null", None))
            return ("not", node) if neg else node
        raise ValueError(f"unsupported predicate on {col!r}")


def parse_where(s: str) -> list:
    """WHERE -> list of top-level conjunct trees (flattened AND), each
    pushed below the exchange independently when single-sided."""
    tree = _PredParser(s).parse()
    return list(tree[1]) if tree[0] == "and" else [tree]


def _pred_cols(tree) -> set:
    if tree[0] == "atom":
        return {tree[1][0]}
    if tree[0] == "not":
        return _pred_cols(tree[1])
    return set().union(*(_pred_cols(s) for s in tree[1]))


def _pred_bare(tree):
    """Rewrite qualified refs to bare names for post-prune evaluation."""
    if tree[0] == "atom":
        col, op, lit = tree[1]
        return ("atom", (col.split(".")[-1], op, lit))
    if tree[0] == "not":
        return ("not", _pred_bare(tree[1]))
    return (tree[0], [_pred_bare(s) for s in tree[1]])


# --- scalar SELECT expressions (int arithmetic over columns) -----------------


class _ScalarParser:
    """Precedence climbing over + - (low) * % (high) with parens; leaves
    are column refs or integer literals. AST: ('bin', op, l, r) |
    ('col', name) | ('int', v). Float literals / division are rejected —
    integer arithmetic is the exactness contract with the DuckDB oracle
    (DuckDB '/' returns DOUBLE and '%' is C-truncated; we match % via
    np.fmod and refuse '/')."""

    def __init__(self, s: str):
        self.toks = re.findall(r"\w+(?:\.\w+)?|\d+|[()+\-*%]", s)
        if "".join(self.toks).replace(" ", "") != s.replace(" ", ""):
            raise ValueError(f"unsupported scalar expression: {s!r}")
        self.i = 0

    def parse(self):
        node = self._add()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens in scalar expression: {self.toks[self.i:]}")
        return node

    def _add(self):
        node = self._mul()
        while self.i < len(self.toks) and self.toks[self.i] in "+-":
            op = self.toks[self.i]
            self.i += 1
            node = ("bin", op, node, self._mul())
        return node

    def _mul(self):
        node = self._leaf()
        while self.i < len(self.toks) and self.toks[self.i] in "*%":
            op = self.toks[self.i]
            self.i += 1
            node = ("bin", op, node, self._leaf())
        return node

    def _leaf(self):
        if self.i >= len(self.toks):
            raise ValueError("truncated scalar expression")
        t = self.toks[self.i]
        self.i += 1
        if t == "(":
            node = self._add()
            if self.i >= len(self.toks) or self.toks[self.i] != ")":
                raise ValueError("unbalanced parens in scalar expression")
            self.i += 1
            return node
        if re.fullmatch(r"\d+", t):
            return ("int", int(t))
        if re.fullmatch(r"\w+(?:\.\w+)?", t):
            # aggregate-call leaf: SUM(col)/COUNT(*)/MIN/MAX — evaluated
            # over hidden aggregate columns post-groupby (int-only; AVG
            # is DOUBLE and would break the int exactness contract)
            if self.i < len(self.toks) and self.toks[self.i] == "(":
                fn = t.lower()
                if fn not in ("count", "sum", "min", "max"):
                    raise ValueError(
                        f"unsupported function {t!r} in scalar expression")
                self.i += 1
                arg = self.toks[self.i]
                if arg == "*":
                    if fn != "count":
                        raise ValueError(f"{fn}(*) is not supported")
                    self.i += 1
                elif re.fullmatch(r"\w+(?:\.\w+)?", arg):
                    self.i += 1
                else:
                    raise ValueError(f"bad aggregate argument {arg!r}")
                if self.i >= len(self.toks) or self.toks[self.i] != ")":
                    raise ValueError("unbalanced parens in aggregate call")
                self.i += 1
                return ("agg", fn, arg)
            return ("col", t)
        raise ValueError(f"unexpected token {t!r} in scalar expression")


def _scalar_cols(node) -> set:
    if node[0] == "col":
        return {node[1]}
    if node[0] == "agg":
        return {node[2]} if node[2] != "*" else set()
    if node[0] == "bin":
        return _scalar_cols(node[2]) | _scalar_cols(node[3])
    return set()


def _scalar_agg_leaves(node) -> list:
    """Distinct (fn, arg) aggregate leaves of a scalar AST, in-order."""
    out: list = []
    if node[0] == "agg":
        out.append((node[1], node[2]))
    elif node[0] == "bin":
        for sub in (node[2], node[3]):
            for leaf in _scalar_agg_leaves(sub):
                if leaf not in out:
                    out.append(leaf)
    return out


def _scalar_col_leaves(node) -> set:
    if node[0] == "col":
        return {node[1]}
    if node[0] == "bin":
        return _scalar_col_leaves(node[2]) | _scalar_col_leaves(node[3])
    return set()


def _rewrite_agg_leaves(node, name_of: dict):
    """Replace agg leaves with ('col', hidden-column-name) for post-
    aggregation evaluation."""
    if node[0] == "agg":
        return ("col", name_of[(node[1], node[2])])
    if node[0] == "bin":
        return ("bin", node[1], _rewrite_agg_leaves(node[2], name_of),
                _rewrite_agg_leaves(node[3], name_of))
    return node


def _eval_scalar(node, t: pa.Table):
    """int64 numpy evaluation (exact; %% via np.fmod == DuckDB's
    C-truncated modulo, unlike numpy's floor-mod %%)."""
    import numpy as np

    if node[0] == "int":
        return np.int64(node[1])
    if node[0] == "col":
        arr = t.column(node[1].split(".")[-1]).to_numpy()
        if not np.issubdtype(arr.dtype, np.integer):
            raise ValueError(
                f"scalar expressions support integer columns only, got "
                f"{arr.dtype} for {node[1]!r}")
        return arr.astype(np.int64)
    _, op, l, r = node
    a, b = _eval_scalar(l, t), _eval_scalar(r, t)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    return np.fmod(a, b)


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
            try:
                node = _ScalarParser(item).parse()
            except ValueError:
                raise ValueError(f"unsupported select item: {raw!r}") from None
            if node[0] != "bin":
                raise ValueError(f"unsupported select item: {raw!r}")
            if alias is None:
                raise ValueError(
                    f"scalar select expressions require an AS alias: {raw!r}")
            agg_leaves = _scalar_agg_leaves(node)
            if agg_leaves and _scalar_col_leaves(node):
                raise ValueError(
                    f"cannot mix aggregate and bare-column leaves in one "
                    f"scalar expression: {raw!r}")
            plan["items"].append(("expr", node, "agg" if agg_leaves else None,
                                  alias))

    if m.group("where"):
        plan["where"] = parse_where(m.group("where"))

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
    has_agg = any(it[0] == "agg" or (it[0] == "expr" and it[2] == "agg")
                  for it in plan["items"])
    group_bare = [g.split(".")[-1] for g in plan["group"]]
    if has_agg:
        non_group = [it for it in plan["items"]
                     if it[0] == "col" and it[1].split(".")[-1] not in group_bare]
        if non_group:
            raise ValueError(f"non-grouped column(s) with aggregates: {non_group}")
        if any(it[0] == "expr" and it[2] is None for it in plan["items"]):
            raise ValueError(
                "bare-column scalar expressions alongside aggregates are unsupported")
    elif plan["group"]:
        raise ValueError("GROUP BY without aggregates is unsupported")
    if plan["having"] and not has_agg:
        raise ValueError("HAVING requires aggregates")
    if plan["joins"]:
        # every real column reference must be alias-qualified
        refs = ([it[1] for it in plan["items"] if it[0] == "col"]
                + [it[2] for it in plan["items"] if it[0] == "agg" and it[2] != "*"]
                + [c for it in plan["items"] if it[0] == "expr"
                   for c in _scalar_cols(it[1])]
                + [h[0][2] for h in plan["having"]
                   if h[0][0] == "agg" and h[0][2] != "*"]
                + [c for w in plan["where"] for c in _pred_cols(w)]
                + plan["group"])
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


def _eval_pred(tree, t: pa.Table):
    """Predicate-tree evaluation with SQL three-valued logic: Kleene
    AND/OR (NULL AND FALSE = FALSE, so NOT over it keeps the row —
    plain and_()'s NULL would wrongly drop it); arrow invert preserves
    NULL = SQL's NOT(UNKNOWN)."""
    kind = tree[0]
    if kind == "atom":
        col, op, lit = tree[1]
        if op == "in":
            return pc.is_in(t.column(col), value_set=pa.array(list(lit)))
        if op == "like":
            return pc.match_like(t.column(col), lit)
        if op == "is_null":
            return pc.is_null(t.column(col))
        return _OPS[op](t.column(col), pa.scalar(lit))
    if kind == "not":
        return pc.invert(_eval_pred(tree[1], t))
    fn = pc.and_kleene if kind == "and" else pc.or_kleene
    acc = _eval_pred(tree[1][0], t)
    for s in tree[1][1:]:
        acc = fn(acc, _eval_pred(s, t))
    return acc


def _filter_stage(preds: list):
    """preds: legacy (col, op, lit) triples (HAVING path) or predicate
    trees (WHERE path) — a final NULL mask value drops the row, SQL's
    unknown-is-false filter semantics."""
    def apply_where(t: pa.Table) -> pa.Table:
        mask = None
        for p in preds:
            tree = p if len(p) == 2 else ("atom", p)
            m = _eval_pred(tree, t)
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
                | {c for it in plan["items"] if it[0] == "expr"
                   for c in _scalar_cols(it[1])}
                | {h[0][2] for h in plan["having"]
                   if h[0][0] == "agg" and h[0][2] != "*"}
                | {c for w in plan["where"] for c in _pred_cols(w)}
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
        # a conjunct pushes below ITS table's exchange when all its
        # column refs come from one table, UNLESS that table enters via
        # LEFT JOIN (outer semantics: the WHERE sees NULLs for unmatched
        # rows, so nullable-side predicates stay post-join). Multi-table
        # conjuncts (OR across sides) evaluate post-join.
        nullable = {j["alias"] for j in plan["joins"] if j["type"] == "left_outer"}
        pre: dict[str, list] = {a: [] for a in side_cols}
        post: list = []
        for conj in plan["where"]:
            conj_aliases = {c.split(".")[0] for c in _pred_cols(conj)}
            unknown = conj_aliases - set(side_cols)
            if unknown:
                raise ValueError(f"unknown table alias in {sorted(unknown)!r}")
            if len(conj_aliases) == 1 and not (conj_aliases & nullable):
                pre[next(iter(conj_aliases))].append(_pred_bare(conj))
            else:
                post.append(_pred_bare(conj))

        def _load(alias: str) -> ray.data.Dataset:
            d = read_parquet_clean(
                f"{sf_dir}/{plan['aliases'][alias]}.parquet",
                columns=sorted(side_cols[alias]))
            if pre[alias]:
                d = d.map_batches(_filter_stage(pre[alias]), batch_format="pyarrow")
            return d

        ds = _load(base_alias)
        joined_aliases = {base_alias}
        coalesced: dict[str, tuple[str, str]] = {}  # right key -> (left key, jtype)
        for j in plan["joins"]:
            lref, rref = j["on"]
            if rref.split(".")[0] != j["alias"]:  # ON written new-side-first
                lref, rref = rref, lref
            ds = ds.join(_load(j["alias"]), j["type"],
                         num_partitions=join_partitions(),
                         on=(bare(lref),), right_on=(bare(rref),))
            joined_aliases.add(j["alias"])
            if bare(rref) != bare(lref):
                coalesced[bare(rref)] = (bare(lref), j["type"])
        # Ray's join coalesces the right key column out of the output;
        # references to it are restored as a copy of the left key (exact
        # for INNER joins — the values are equal by the ON predicate).
        # Under LEFT OUTER the SQL value would be NULL on unmatched rows
        # and the information is gone: fail loudly, point at the left key.
        needed = {bare(r) for r in col_refs} & set(coalesced)
        if needed:
            outer = [k for k in needed if coalesced[k][1] != "inner"]
            if outer:
                raise ValueError(
                    f"right-side join key(s) {sorted(outer)} of a LEFT JOIN "
                    "are coalesced into the left key; reference the left "
                    "key column instead")

            def restore_keys(t: pa.Table,
                             pairs=tuple((k, coalesced[k][0]) for k in sorted(needed))
                             ) -> pa.Table:
                for rk, lk in pairs:
                    if rk not in t.column_names:
                        t = t.append_column(rk, t.column(lk))
                return t

            ds = ds.map_batches(restore_keys, batch_format="pyarrow")
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
                _filter_stage([_pred_bare(w) for w in plan["where"]]),
                batch_format="pyarrow")

    group_bare = [bare(g) for g in plan["group"]]
    aggs = [it for it in plan["items"] if it[0] == "agg"]
    agg_exprs = [it for it in plan["items"] if it[0] == "expr" and it[2] == "agg"]
    if aggs or agg_exprs:
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
        # AVG(col) = float64(SUM)/float64(COUNT non-null): both partials
        # are exact integers through the shuffle, the single IEEE
        # division happens once output-side — bit-equal to DuckDB's AVG
        # on integer columns (verified in tests/test_sql.py); floating
        # input columns are refused (order-dependent sums can't be
        # SQL-checked)
        avg_aggs = [a for a in aggs if a[1] == "avg"]
        specs = [_spec(fn, arg, alias) for _, fn, arg, alias in aggs
                 if fn not in ("count_distinct", "avg")]
        for i, (_, _, arg, _alias) in enumerate(avg_aggs):
            specs.append(Sum(bare(arg), alias_name=f"__avs{i}"))
            specs.append(Count(on=bare(arg), ignore_nulls=True,
                               alias_name=f"__avc{i}"))
        # aggregate leaves of scalar-over-aggregate items: one hidden
        # spec per distinct (fn, arg), shared across expressions
        xleaf_name: dict = {}
        for _, node, _, _alias in agg_exprs:
            for fn, arg in _scalar_agg_leaves(node):
                key = (fn, "*" if arg == "*" else bare(arg))
                if key not in xleaf_name:
                    name_ = f"__xe{len(xleaf_name)}"
                    xleaf_name[key] = name_
                    specs.append(_spec(fn, arg, name_))
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
                    if fn == "avg":
                        i = len(avg_aggs)
                        avg_aggs.append(("agg", "avg", arg, halias))
                        specs.append(Sum(bare(arg), alias_name=f"__avs{i}"))
                        specs.append(Count(on=bare(arg), ignore_nulls=True,
                                           alias_name=f"__avc{i}"))
                    else:
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
        if avg_aggs:
            def compute_avgs(t: pa.Table, av=tuple(enumerate(avg_aggs))) -> pa.Table:
                import numpy as np

                for i, (_, _, _arg, alias) in av:
                    if pa.types.is_floating(t.column(f"__avs{i}").type):
                        raise ValueError(
                            "AVG over a floating column is order-dependent "
                            "and cannot be SQL-checked; quantize to ints first")
                    s = t.column(f"__avs{i}").to_numpy(zero_copy_only=False)
                    c = t.column(f"__avc{i}").to_numpy(zero_copy_only=False)
                    s = s.astype(np.float64)
                    c64 = c.astype(np.float64)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        v = np.where(c64 > 0, s / np.where(c64 > 0, c64, 1.0), np.nan)
                    arr = pc.if_else(pa.array(c64 > 0), pa.array(v, pa.float64()),
                                     pa.nulls(len(v), pa.float64()))
                    t = t.append_column(alias, arr)
                return t.drop_columns(
                    [f"__av{sc}{i}" for i, _ in av for sc in ("s", "c")])

            ds = ds.map_batches(compute_avgs, batch_format="pyarrow")
        if agg_exprs:
            def compute_agg_exprs(t: pa.Table, items=tuple(agg_exprs),
                                  names=dict(xleaf_name)) -> pa.Table:
                by_norm = {k: v for k, v in names.items()}
                for _, node, _, alias in items:
                    rw = _rewrite_agg_leaves(
                        node,
                        {(fn, arg): by_norm[(fn, "*" if arg == "*" else arg.split(".")[-1])]
                         for fn, arg in _scalar_agg_leaves(node)})
                    t = t.append_column(alias,
                                        pa.array(_eval_scalar(rw, t), pa.int64()))
                return t.drop_columns(list(names.values()))

            ds = ds.map_batches(compute_agg_exprs, batch_format="pyarrow")
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
        expr_items = [it for it in plan["items"] if it[0] == "expr"]
        if expr_items:
            def eval_exprs(t: pa.Table, items=tuple(expr_items)) -> pa.Table:
                for _, node, _, alias in items:
                    vals = _eval_scalar(node, t)  # col refs bare-ified inside
                    t = t.append_column(alias, pa.array(vals, pa.int64()))
                return t

            ds = ds.map_batches(eval_exprs, batch_format="pyarrow")
        renames = {bare(it[1]): it[3] for it in plan["items"]
                   if it[0] == "col" and bare(it[1]) != it[3]}
        keep = [bare(it[1]) if it[0] == "col" else it[3]
                for it in plan["items"]]
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


# AVG: exact int partials (SUM + COUNT) through the shuffle, one IEEE
# float64 division output-side — bit-equal to DuckDB AVG on int columns
SQL_AVG_DEMO = (
    "SELECT o_orderstatus, AVG(o_custkey) AS avg_ck, COUNT(*) AS n "
    "FROM orders GROUP BY o_orderstatus "
    "HAVING AVG(o_orderkey) >= 0 ORDER BY o_orderstatus"
)

# OR/NOT predicate tree with parens: single-sided conjuncts still push
# below the read; Kleene three-valued logic under NOT
SQL_OR_NOT_DEMO = (
    "SELECT o_orderkey, o_custkey FROM orders "
    "WHERE (o_orderstatus = 'P' OR o_totalprice >= 400000) "
    "AND NOT (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH') "
    "ORDER BY o_orderkey"
)

# scalar int arithmetic in SELECT (numpy-vectorized per batch; % is
# C-truncated to match DuckDB)
SQL_SCALAR_EXPR_DEMO = (
    "SELECT o_orderkey, o_orderkey % 7 AS bucket7, "
    "(o_custkey * 3 + 1) - o_orderkey % 5 AS ck3 FROM orders "
    "WHERE o_totalprice >= 490000 ORDER BY o_orderkey"
)


# BETWEEN (sugar for >= AND <=, consumed inside the atom) + NOT
SQL_BETWEEN_DEMO = (
    "SELECT o_orderkey, o_custkey FROM orders "
    "WHERE o_totalprice BETWEEN 200000 AND 250000 "
    "AND NOT o_orderstatus = 'O' ORDER BY o_orderkey"
)

# IS NULL against LEFT JOIN misses (the anti-join shape): orderkeys run
# past the custkey domain, so unmatched orders carry NULL c_mktsegment
SQL_IS_NULL_DEMO = (
    "SELECT o.o_orderkey AS ok FROM orders o "
    "LEFT OUTER JOIN customer c ON o.o_orderkey = c.c_custkey "
    "WHERE c.c_mktsegment IS NULL AND o.o_totalprice >= 300000 ORDER BY ok"
)


# scalar arithmetic OVER aggregates: each distinct agg leaf becomes one
# hidden spec through the shuffle, the int expression evaluates
# group-side after the combine
SQL_AGG_EXPR_DEMO = (
    "SELECT o_orderstatus, SUM(o_custkey) * 2 - COUNT(*) AS xval, "
    "(MAX(o_orderkey) - MIN(o_orderkey)) % 97 AS rng97 "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
)


# top-N groups: ORDER BY an aggregate alias DESC + LIMIT — the
# "heaviest keys" report (deterministic tie-break on the group key)
SQL_TOPN_GROUPS_DEMO = (
    "SELECT o_custkey, COUNT(*) AS n, SUM(o_orderkey) AS s FROM orders "
    "GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 10"
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


def sql_stream_avg(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_AVG_DEMO)


def sql_stream_or_not(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_OR_NOT_DEMO)


def sql_stream_scalar_expr(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_SCALAR_EXPR_DEMO)


def sql_stream_between(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_BETWEEN_DEMO)


def sql_stream_is_null(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_IS_NULL_DEMO)


def sql_stream_agg_expr(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_AGG_EXPR_DEMO)


def sql_stream_topn_groups(sf_dir: str) -> ray.data.Dataset:
    return execute(sf_dir, SQL_TOPN_GROUPS_DEMO)
