"""Expressions module ([U] lucene/expressions/.../js/JavascriptCompiler.java):
compile a small arithmetic expression over named numeric columns into a
vectorized numpy evaluator, used for expression-based sorting / computed
fields (the ValueSource role).

Grammar (JavascriptCompiler's arithmetic core):
  expr   := term (('+'|'-') term)*
  term   := unary (('*'|'/') unary)*
  unary  := '-' unary | atom
  atom   := NUMBER | IDENT | IDENT '(' expr (',' expr)* ')' | '(' expr ')'
Functions: sqrt ln log10 abs min max pow.

The compiler runs ONCE (AST build); evaluation is numpy-vectorized per
batch — no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

_TOKEN_RE = re.compile(r"\s*(?:(\d+\.\d+|\d+)|([A-Za-z_]\w*)|(.))")

_FUNCS = {
    "sqrt": np.sqrt,
    "ln": np.log,
    "log10": np.log10,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    for num, ident, sym in _TOKEN_RE.findall(src):
        if num:
            out.append(("num", num))
        elif ident:
            out.append(("ident", ident))
        elif sym.strip():
            out.append(("sym", sym))
    out.append(("end", ""))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, sym):
        k, v = self.next()
        if k != "sym" or v != sym:
            raise ValueError(f"expected {sym!r}, got {v!r}")

    def parse(self):
        node = self.expr()
        if self.peek()[0] != "end":
            raise ValueError(f"trailing input at {self.peek()[1]!r}")
        return node

    def expr(self):
        node = self.term()
        while self.peek() == ("sym", "+") or self.peek() == ("sym", "-"):
            op = self.next()[1]
            node = (op, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self.peek() == ("sym", "*") or self.peek() == ("sym", "/"):
            op = self.next()[1]
            node = (op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("sym", "-"):
            self.next()
            return ("neg", self.unary())
        return self.atom()

    def atom(self):
        kind, val = self.next()
        if kind == "num":
            return ("const", float(val))
        if kind == "ident":
            if self.peek() == ("sym", "("):
                self.next()
                args = [self.expr()]
                while self.peek() == ("sym", ","):
                    self.next()
                    args.append(self.expr())
                self.expect(")")
                if val not in _FUNCS:
                    raise ValueError(f"unknown function: {val}")
                return ("call", val, args)
            return ("var", val)
        if (kind, val) == ("sym", "("):
            node = self.expr()
            self.expect(")")
            return node
        raise ValueError(f"unexpected token {val!r}")


def compile_expression(src: str):
    """-> fn(columns: dict[str, np.ndarray]) -> np.ndarray (float64)."""
    ast = _Parser(_tokenize(src)).parse()

    def ev(node, cols):
        op = node[0]
        if op == "const":
            return node[1]
        if op == "var":
            if node[1] not in cols:
                raise KeyError(f"unknown variable: {node[1]}")
            return cols[node[1]]
        if op == "neg":
            return -ev(node[1], cols)
        if op == "call":
            return _FUNCS[node[1]](*[ev(a, cols) for a in node[2]])
        a, b = ev(node[1], cols), ev(node[2], cols)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        raise ValueError(op)

    def fn(cols: dict) -> np.ndarray:
        return np.asarray(ev(ast, cols), dtype=np.float64)

    return fn


PART_EXPR = "sqrt(p_size) * 2 + ln(p_retailprice) / 3 - abs(p_size - 25)"


class _ExprStage:
    """Expression compiled once per actor; evaluated per batch."""

    def __init__(self, expression: str, columns: list[str]):
        self.fn = compile_expression(expression)
        self.columns = columns

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_numpy().astype(np.float64) for c in self.columns}
        v = self.fn(cols)
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "expr_milli": pa.array(np.floor(v * 1000.0 + 0.5).astype(np.int64), pa.int64()),
            }
        )


def expression_sort(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Expression-computed sort key over part, top-k (TopFieldCollector
    over an expression ValueSource)."""
    ds = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )
    out = ds.map_batches(
        _ExprStage,
        fn_constructor_kwargs={"expression": PART_EXPR, "columns": ["p_size", "p_retailprice"]},
        concurrency=pool_size(),
        batch_format="pyarrow",
    )
    return out.sort(["expr_milli", "p_partkey"], descending=[True, False]).limit(k)


class _FrangeStage(_ExprStage):
    """Expression + range filter fused in one batch pass (the frange
    post-filter never materializes out-of-range rows)."""

    def __init__(self, expression: str, columns: list[str], lo_milli: int, hi_milli: int):
        super().__init__(expression, columns)
        self.lo, self.hi = int(lo_milli), int(hi_milli)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = super().__call__(t)
        v = out.column("expr_milli").to_numpy()
        return out.filter(pa.array((v >= self.lo) & (v <= self.hi)))


def frange_filter(sf_dir: str, lo_milli: int = -10000, hi_milli: int = 0) -> ray.data.Dataset:
    """FunctionRangeQParser ({!frange l=.. u=..}expr — [U] solr/core/.../
    search/FunctionRangeQuery.java via FunctionRangeQParserPlugin): keep
    rows whose expression VALUE (exact milli-quantized int, the
    expression_sort convention) lies in [l, u]. One stateless fused
    compute+filter pass over the pruned column read; zero shuffle."""
    ds = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )
    return ds.map_batches(
        _FrangeStage,
        fn_constructor_kwargs={"expression": PART_EXPR,
                               "columns": ["p_size", "p_retailprice"],
                               "lo_milli": lo_milli, "hi_milli": hi_milli},
        concurrency=pool_size(),
        batch_format="pyarrow",
    ).sort("p_partkey")


def scale_map_function(sf_dir: str) -> ray.data.Dataset:
    """``scale()`` and ``map()`` value sources ([U] lucene/queries/.../
    function/valuesource/ScaleFloatFunction.java, RangeMapFloatFunction.java)
    over the n_chars docvalues column, in exact integers:

        scaled_milli = (n_chars - min) * 100000 // (max - min)   (scale 0..100)
        mapped       = 0 when n_chars in [0, 199] else n_chars   (map(x,0,199,0))

    ScaleFloatFunction needs the GLOBAL min/max first — computed as one
    tiny aggregate pass (two ints cross the cluster), broadcast into the
    stateless transform pass. Both ops integer-exact, so the SQL oracle
    hashes identically."""
    from ray.data.aggregate import Max, Min

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    stats = ds.aggregate(Min("n_chars"), Max("n_chars"))
    mn, mx = int(stats["min(n_chars)"]), int(stats["max(n_chars)"])
    rng = max(1, mx - mn)

    def fn(t: pa.Table) -> pa.Table:
        v = t.column("n_chars").to_numpy().astype(np.int64)
        scaled = (v - mn) * 100000 // rng
        mapped = np.where((v >= 0) & (v <= 199), 0, v).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "scaled_milli": pa.array(scaled, pa.int64()),
            "mapped": pa.array(mapped, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")
