"""Property-based tests (hypothesis): codec round-trips, norms byte4
monotonicity, analysis invariants, and the engine-vs-SQL Soundex
cross-check on arbitrary words — fuzz coverage beyond the fixed
conformance corpora."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.codec.norms import DECODED_TABLE, decode_dl, encode_dl
from lucene_solr_ray.codec.postings import For128Codec, VarintCodec

posting_lists = st.integers(1, 400).flatmap(lambda n: st.tuples(
    st.lists(st.integers(0, 2**31 - 1), min_size=n, max_size=n, unique=True),
    st.lists(st.integers(1, 60_000), min_size=n, max_size=n),
    st.lists(st.integers(0, 255), min_size=n, max_size=n),
))


@settings(max_examples=40, deadline=None)
@given(posting_lists)
def test_postings_codecs_round_trip(data):
    docids, tfs, norms = data
    d = np.sort(np.array(docids, np.int64))
    t = np.array(tfs, np.int64)
    m = np.array(norms, np.int64)
    for codec in (For128Codec, VarintCodec):
        blob = codec.encode(d, t, m)
        d2, t2, m2 = codec.decode(blob)
        assert np.array_equal(d2, d) and np.array_equal(t2, t) and np.array_equal(m2, m), codec


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 10**7))
def test_norms_byte4_floor_and_monotonic(dl):
    b = int(encode_dl(np.array([dl]))[0])
    dec = int(decode_dl(np.array([b]))[0])
    assert dec <= dl  # greatest representable <= dl
    reps = np.unique(DECODED_TABLE)
    assert dec == int(reps[reps <= dl].max(initial=0))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=120))
def test_tokenize_positions_consistent(text):
    from lucene_solr_ray.analysis import tokenize, tokenize_with_positions
    toks = tokenize(text)
    with_pos = tokenize_with_positions(text)
    assert [t for t, _ in with_pos] == toks
    pos = [p for _, p in with_pos]
    assert all(b > a for a, b in zip(pos, pos[1:]))  # strictly increasing


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12),
                min_size=1, max_size=25, unique=True))
def test_soundex_engine_matches_sql(words):
    """The engine soundex and the DuckDB list-lambda implementation the
    phonetic oracle embeds must agree on ARBITRARY lowercase words, not
    just the corpus vocabulary."""
    import duckdb

    from lucene_solr_ray.analysis import soundex

    vals = ", ".join(f"('{w}')" for w in words)
    sql = (
        f"WITH words(w) AS (VALUES {vals}), "
        "cs AS (SELECT w, list_transform(regexp_split_to_array(w, ''), c -> CASE "
        "WHEN c IN ('b','f','p','v') THEN '1' "
        "WHEN c IN ('c','g','j','k','q','s','x','z') THEN '2' "
        "WHEN c IN ('d','t') THEN '3' WHEN c = 'l' THEN '4' "
        "WHEN c IN ('m','n') THEN '5' WHEN c = 'r' THEN '6' "
        "WHEN c IN ('h','w') THEN '' ELSE 'v' END) AS codes FROM words), "
        "s1 AS (SELECT w, codes, list_filter(codes, c -> c <> '') AS l1 FROM cs), "
        "s2 AS (SELECT w, codes, list_filter(l1, (c, i) -> i = 1 OR c <> l1[i-1]) AS l2 FROM s1), "
        "s2b AS (SELECT w, CASE WHEN codes[1] = '' THEN l2 ELSE l2[2:] END AS tl FROM s2), "
        "s3 AS (SELECT w, upper(w[1]) || substr(COALESCE("
        "array_to_string(list_filter(tl, c -> c <> 'v'), ''), '') || '000', 1, 3) AS sx FROM s2b) "
        "SELECT w, sx FROM s3 ORDER BY w"
    )
    exp = dict(duckdb.sql(sql).fetchall())
    for w in words:
        assert soundex(w) == exp[w], w


# ---------------- surround parser round-trip ----------------

_sur_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8).filter(
    lambda w: w not in ("and", "or", "not"))  # infix keywords match case-insensitively


def _render(node) -> str:
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "dist":
        _, n, ordered, ops = node
        op = "W" if ordered else "N"
        parts = []
        for o in ops:
            if o[0] == "alts":
                parts.append("(" + " OR ".join(o[1]) + ")")
            else:
                parts.append(o[1])
        return f"{n}{op}({', '.join(parts)})"
    if kind == "and":
        return " AND ".join(f"({_render(c)})" for c in node[1])
    if kind == "or":
        return " OR ".join(f"({_render(c)})" for c in node[1])
    if kind == "not":
        return f"({_render(node[1])}) NOT ({_render(node[2])})"
    raise AssertionError(node)


_operand = st.one_of(
    _sur_word.map(lambda w: ("alt1", w)),
    st.lists(_sur_word, min_size=2, max_size=3).map(lambda ws: ("alts", ws)),
)
_dist = st.tuples(st.integers(1, 9), st.booleans(),
                  st.lists(_operand, min_size=2, max_size=3)).map(
    lambda t: ("dist", t[0], t[1], t[2]))
_leaf = st.one_of(_sur_word.map(lambda w: ("term", w)), _dist)
_sur_ast = st.recursive(
    _leaf,
    lambda children: st.one_of(
        st.lists(children, min_size=2, max_size=3).map(lambda cs: ("and", cs)),
        st.lists(children, min_size=2, max_size=3).map(lambda cs: ("or", cs)),
        st.tuples(children, children).map(lambda t: ("not", t[0], t[1])),
    ),
    max_leaves=6,
)


def _normalize(node):
    """Parenthesized rendering may re-associate n-ary and/or chains and
    collapse singleton alt-lists; compare the flattened boolean algebra."""
    kind = node[0]
    if kind in ("and", "or"):
        flat = []
        for c in node[1]:
            cn = _normalize(c)
            if cn[0] == kind:
                flat.extend(cn[1])
            else:
                flat.append(cn)
        return (kind, flat) if len(flat) > 1 else flat[0]
    if kind == "not":
        return ("not", _normalize(node[1]), _normalize(node[2]))
    return node


@settings(max_examples=120, deadline=None)
@given(_sur_ast)
def test_surround_parser_round_trips(ast):
    """render(ast) re-parses to the same normalized AST — the grammar has
    no ambiguity that silently reshapes a query. Reserved words (AND/OR/
    NOT/W/N heads) never collide because rendered terms are lowercase."""
    from lucene_solr_ray.queryparser import parse_surround

    got = parse_surround(_render(ast))
    assert _normalize(got) == _normalize(ast)


# ---------------- SimpleQueryParser render/re-parse fuzz ----------------

_sqp_word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


def _sqp_leaf():
    return st.one_of(
        st.tuples(st.just("term"), _sqp_word),
        st.tuples(st.just("prefix"), _sqp_word),
        st.builds(lambda ws, sl: ("phrase", (ws, sl)),
                  st.lists(_sqp_word, min_size=1, max_size=3),
                  st.integers(0, 3)),
        st.builds(lambda w, d: ("fuzzy", (w, d)), _sqp_word, st.integers(1, 2)),
    )


_sqp_ast = st.recursive(
    _sqp_leaf(),
    lambda inner: st.one_of(
        st.builds(lambda n: ("not", n), inner),
        st.builds(lambda a, b: ("and", a, b), inner, inner),
        st.builds(lambda a, b: ("or", a, b), inner, inner),
    ),
    max_leaves=6,
)


def _sqp_render(n) -> str:
    kind = n[0]
    if kind == "term":
        return n[1]
    if kind == "prefix":
        return n[1] + "*"
    if kind == "phrase":
        ws, sl = n[1]
        return '"' + " ".join(ws) + '"' + (f"~{sl}" if sl else "")
    if kind == "fuzzy":
        w, d = n[1]
        return f"{w}~{d}"
    if kind == "not":
        return "-" + _sqp_wrap(n[1])
    if kind == "and":
        return _sqp_wrap(n[1]) + " + " + _sqp_wrap(n[2])
    if kind == "or":
        return _sqp_wrap(n[1]) + " | " + _sqp_wrap(n[2])
    raise AssertionError(kind)


def _sqp_wrap(n) -> str:
    # boolean children need parens to survive the left-assoc flat fold
    s = _sqp_render(n)
    return f"({s})" if n[0] in ("and", "or") else s


@settings(max_examples=120, deadline=None)
@given(_sqp_ast)
def test_simple_query_parser_round_trips(ast):
    """render(ast) re-parses to the identical AST — the lenient grammar
    still has an unambiguous core (parens around boolean children pin
    the left-assoc fold)."""
    from lucene_solr_ray.queryparser import parse_simple

    assert parse_simple(_sqp_render(ast)) == ast
