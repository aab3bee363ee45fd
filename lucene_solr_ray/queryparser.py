"""Classic query parser — query string -> clause groups for
``IndexSearcher.search_clauses`` ([U] lucene/queryparser/.../classic/
QueryParser.java, default-OR dialect; Solr's lucene QParser).

Supported grammar (one boolean level, like a classic top-level query):

  query    := token*
  token    := occur? atom boost?
  occur    := '+' | '-' | 'AND' | 'OR' | 'NOT'
  atom     := '"' word+ '"' ('~' slop)?          phrase (PhraseQuery)
            | '[' lo ' TO ' hi ']'               inclusive term range
            | field ':' value                    dv filter (string field)
            | word '~' edits?                    fuzzy (<=2, default 2)
            | word with '*' / '?'                wildcard / prefix
            | word                               term
  boost    := '^' float

Occur resolution follows the classic parser's quirky default-OR rules:
'+' -> MUST, '-'/NOT -> MUST_NOT for the next atom; the binary 'AND'
promotes BOTH its neighbours to MUST; 'OR' leaves SHOULD. Multi-term
atoms (wildcard/fuzzy/range) become ONE clause whose alternatives are
the dictionary expansion — they match if any alternative matches and
score as the sum of matching alternatives (ScoringBooleanQueryRewrite),
which is exactly how a rewritten multi-term sub-query scores inside a
BooleanQuery. Field-scoped atoms on docvalues (string) fields become
constant-score filters (Solr fq); ``text:`` scopes to the default
field and is otherwise a no-op. Parentheses and nested boolean groups
are not supported (single-level surface, documented limitation).
"""

from __future__ import annotations

import re

from lucene_solr_ray.state.schema import Range

_TOKEN = re.compile(
    r"""
    (?P<phrase>"[^"]*"(~(?P<slop>\d+))?)
  | (?P<range>(?P<rfield>[A-Za-z_][A-Za-z0-9_]*(?=:))?:?\[\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*\])
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<word>[^\s+\-^][^\s^]*)
  | (?P<boost>\^(?P<bval>\d+(\.\d+)?))
    """,
    re.VERBOSE,
)

_FIELD = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$")


def parse_query(query: str, searcher=None, schema=None,
                max_expansions: int = 1024):
    """Parse ``query`` -> (clauses, dv_filters) for ``search_clauses``.

    ``searcher`` is needed to expand multi-term atoms against the term
    dictionaries (absent -> wildcard/fuzzy/range atoms raise).
    ``schema`` routes ``field:value`` atoms (default: transcript
    contract schema)."""
    if schema is None:
        from lucene_solr_ray.state.schema import TRANSCRIPTS_SCHEMA

        schema = TRANSCRIPTS_SCHEMA

    def expand(kind: str, pattern: str) -> list[str]:
        if searcher is None:
            raise ValueError(f"{kind} atom {pattern!r} needs a searcher to expand")
        return searcher.expand_terms(kind, pattern, max_terms=max_expansions)

    clauses: list[dict] = []
    dv_filters: dict = {}
    pending_occur: str | None = None

    def push(clause: dict) -> None:
        clause["occur"] = pending_occur or "should"
        clauses.append(clause)

    for m in _TOKEN.finditer(query):
        if m.lastgroup is None:
            continue
        if m.group("boost"):
            if clauses:
                clauses[-1]["boost"] = float(m.group("bval"))
            continue
        if m.group("plus"):
            pending_occur = "must"
            continue
        if m.group("minus"):
            pending_occur = "must_not"
            continue
        if m.group("phrase"):
            body = m.group("phrase")
            quoted = body[1 : body.rindex('"')]
            words = quoted.split()
            if words:
                push({"kind": "phrase", "terms": words,
                      "slop": int(m.group("slop") or 0)})
            pending_occur = None
            continue
        if m.group("range"):
            lo, hi = m.group("lo"), m.group("hi")
            rfield = m.group("rfield")
            if rfield and rfield != "text":
                # fielded NUMERIC range -> PointRangeQuery-style docvalues
                # filter ([U] solr's {!lucene} field:[a TO b] on an
                # IntPoint field); inclusive both ends like classic
                dv_filters[rfield] = Range(int(lo), int(hi))
                pending_occur = None
                continue
            # classic [a TO b] is inclusive on both ends; the dict scan
            # is [lo, hi), so bump hi to its immediate successor
            push({"kind": "terms", "terms": expand("range", f"{lo}:{hi}\x00")})
            pending_occur = None
            continue
        word = m.group("word")
        if word == "AND":
            # promote the previous clause and require the next one
            if clauses and clauses[-1]["occur"] == "should":
                clauses[-1]["occur"] = "must"
            pending_occur = "must"
            continue
        if word == "OR":
            pending_occur = None
            continue
        if word == "NOT":
            pending_occur = "must_not"
            continue
        fm = _FIELD.match(word)
        if fm and fm.group(1) != "text" and fm.group(1) in schema.fields:
            field, value = fm.group(1), fm.group(2)
            if schema.serve(field) != "docvalues":
                raise ValueError(
                    f"field {field!r} is {schema.serve(field)}-served; only "
                    "docvalues (string) fields can be query filters"
                )
            existing = dv_filters.get(field)
            if existing is None:
                dv_filters[field] = value
            else:  # repeated field:value -> isin
                vals = existing if isinstance(existing, list) else [existing]
                dv_filters[field] = vals + [value]
            pending_occur = None
            continue
        if fm and fm.group(1) == "text":
            word = fm.group(2)
        if "~" in word:
            base, _, d = word.partition("~")
            edits = int(d) if d else 2
            push({"kind": "terms", "terms": expand("fuzzy", f"{base}~{edits}")})
        elif "*" in word or "?" in word:
            kind = "prefix" if (word.endswith("*") and "*" not in word[:-1]
                                and "?" not in word) else "wildcard"
            pattern = word[:-1] if kind == "prefix" else word
            push({"kind": "terms", "terms": expand(kind, pattern)})
        else:
            push({"kind": "terms", "terms": [word]})
        pending_occur = None

    return clauses, dv_filters


# ---------------- Surround query language ----------------
#
# [U] lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/
# (QueryParser.jj, DistanceQuery.java): span-aware proximity language.
# Supported subset: prefix distance ops `NW(...)` / `NN(...)` (N omitted
# -> 1), operands = terms, `foo*`/`fo?o` wildcards, or parenthesized OR
# alternatives; infix AND / OR / NOT over distance ops, terms and
# parenthesized sub-expressions. W maps to SpanNear(in_order=True,
# slop=N-1), N to in_order=False — exactly DistanceQuery's rewrite.

_SUR_TOKEN = re.compile(
    r"\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<comma>,)"
    r"|(?P<dist>\d*[WwNn](?=\s*\())"
    r"|(?P<word>[^\s(),]+))"
)


def _sur_tokens(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _SUR_TOKEN.match(q, i)
        if m is None or m.end() == i:
            break
        i = m.end()
        for name in ("lp", "rp", "comma", "dist", "word"):
            v = m.group(name)
            if v is not None:
                out.append((name, v))
                break
    return out


class _SurParser:
    def __init__(self, q: str):
        self.toks = _sur_tokens(q)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        t = self.take()
        if t[0] != kind:
            raise ValueError(f"surround: expected {kind}, got {t}")
        return t

    # expr := and_expr (OR and_expr)*
    def expr(self):
        node = self.and_expr()
        parts = [node]
        while self.peek() == ("word", "OR") or self.peek() == ("word", "or"):
            self.take()
            parts.append(self.and_expr())
        return ("or", parts) if len(parts) > 1 else node

    # and_expr := not_expr (AND not_expr)*
    def and_expr(self):
        node = self.not_expr()
        parts = [node]
        while self.peek()[0] == "word" and self.peek()[1].upper() == "AND":
            self.take()
            parts.append(self.not_expr())
        return ("and", parts) if len(parts) > 1 else node

    # not_expr := prim (NOT prim)*
    def not_expr(self):
        node = self.prim()
        while self.peek()[0] == "word" and self.peek()[1].upper() == "NOT":
            self.take()
            node = ("not", node, self.prim())
        return node

    # prim := DIST '(' operand (',' operand)* ')' | '(' expr ')' | term
    def prim(self):
        kind, val = self.peek()
        if kind == "dist":
            self.take()
            head = val.upper()
            n = int(head[:-1]) if len(head) > 1 else 1
            ordered = head.endswith("W")
            self.expect("lp")
            ops = [self.operand()]
            while self.peek()[0] == "comma":
                self.take()
                ops.append(self.operand())
            self.expect("rp")
            return ("dist", n, ordered, ops)
        if kind == "lp":
            self.take()
            node = self.expr()
            self.expect("rp")
            return node
        if kind == "word":
            self.take()
            return ("term", val)
        raise ValueError(f"surround: unexpected token {self.peek()}")

    # operand := term | '(' term (OR term)* ')'   (SpanOr alternatives)
    def operand(self):
        kind, val = self.peek()
        if kind == "lp":
            self.take()
            alts = [self.expect("word")[1]]
            while self.peek()[0] == "word" and self.peek()[1].upper() == "OR":
                self.take()
                alts.append(self.expect("word")[1])
            self.expect("rp")
            return ("alts", alts)
        return ("alt1", self.expect("word")[1])


def parse_surround(query: str):
    """Parse a surround query string into the AST evaluated by
    ``fulltext.surround_docs``: ('term', w) | ('dist', n, ordered,
    operands) | ('and'|'or', parts) | ('not', a, b); distance operands
    are ('alt1', w) or ('alts', [w...]) with * / ? wildcards allowed."""
    p = _SurParser(query)
    node = p.expr()
    if p.i != len(p.toks):
        raise ValueError(f"surround: trailing tokens {p.toks[p.i:]}")
    return node


# ---------------- SimpleQueryParser (§2.11) ----------------

_SQP_TOKEN = re.compile(
    r"""
    (?P<phrase>"[^"]*"(~(?P<slop>\d+))?)
  | (?P<lp>\()
  | (?P<rp>\))
  | (?P<or>\|)
  | (?P<and>\+)
  | (?P<not>-)
  | (?P<word>[^\s()|+\-"]+)
    """,
    re.VERBOSE,
)


def _sqp_tokens(q: str):
    out = []
    for m in _SQP_TOKEN.finditer(q):
        kind = m.lastgroup if m.lastgroup in ("lp", "rp", "or", "and", "not") else None
        if m.group("phrase") is not None:
            body = m.group("phrase")
            slop = int(m.group("slop") or 0)
            words = body.split('"')[1].split()
            out.append(("phrase", (words, slop)))
        elif kind:
            out.append((kind, m.group()))
        else:
            w = m.group("word")
            if w.endswith("*") and "*" not in w[:-1]:
                out.append(("prefix", w[:-1]))
            elif "~" in w:
                base, _, d = w.rpartition("~")
                try:
                    out.append(("fuzzy", (base, int(d) if d else 2)))
                except ValueError:
                    out.append(("term", w))  # lenient: bad ~N is literal
            else:
                out.append(("term", w))
    return out


class _SqpParser:
    """SimpleQueryParser ([U] lucene/queryparser/.../simple/
    SimpleQueryParser.java): operators +(AND) |(OR) -(NOT) "phrase"
    trailing-* prefix ~N fuzzy/slop, parentheses. No precedence between
    + and | — clauses fold LEFT-ASSOCIATIVELY in input order, exactly
    the reference's single-pass state machine; default operator is OR.
    Lenient: stray operators and unbalanced parens degrade to literals
    or are dropped rather than raising (the parser's design goal)."""

    def __init__(self, q: str):
        self.toks = _sqp_tokens(q)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", None)

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expr(self, depth: int = 0):
        node = None
        op = "or"
        while True:
            kind, _ = self.peek()
            if kind == "eof":
                return node
            if kind == "rp":
                if depth:
                    return node
                self.take()  # lenient: stray top-level ')' is dropped
                continue
            if kind == "or":
                self.take()
                op = "or"
                continue
            if kind == "and":
                self.take()
                op = "and"
                continue
            clause = self.clause()
            if clause is None:
                continue  # lenient: skip an unusable token
            node = clause if node is None else (op, node, clause)
            op = "or"  # operators bind ONE juncture; default resumes

    def clause(self):
        kind, val = self.take()
        if kind == "not":
            inner = self.clause()
            return None if inner is None else ("not", inner)
        if kind == "lp":
            inner = self.expr(depth=1)
            if self.peek()[0] == "rp":
                self.take()
            return inner
        if kind in ("term", "prefix", "phrase", "fuzzy"):
            return (kind, val)
        return None  # stray ')' or operator: lenient drop


def parse_simple(query: str):
    """Parse a SimpleQueryParser string into the AST evaluated by
    ``fulltext.simple_query_docs``: ('term', w) | ('prefix', p) |
    ('phrase', (words, slop)) | ('fuzzy', (w, d)) | ('not', n) |
    ('and'|'or', left, right)."""
    return _SqpParser(query).expr()


# ---------------- dismax mm spec parser (§2.11) ----------------

def parse_mm_spec(spec: str, n_clauses: int) -> int:
    """Solr's minimum-should-match SPEC grammar ([U] solr/core/.../util/
    SolrPluginUtils.java calculateMinShouldMatch):

      "3"       -> 3
      "-2"      -> n - 2
      "75%"     -> int(n * 0.75)   (truncates)
      "-25%"    -> n - int(n * 0.25)
      "2<-25% 9<-3"  conditional: each "c<v" applies v when n > c; the
                     HIGHEST matching c wins; n <= smallest c -> n (all
                     optional clauses required)

    Result clamped to [0, n_clauses]."""
    spec = spec.strip()

    def one(v: str) -> int:
        v = v.strip()
        neg = v.startswith("-")
        if neg:
            v = v[1:]
        if v.endswith("%"):
            val = (n_clauses * int(v[:-1])) // 100
        else:
            val = int(v)
        return n_clauses - val if neg else val

    if "<" in spec:
        best_c, mm = None, n_clauses  # n <= smallest c -> all required
        for part in spec.split():
            c_s, v_s = part.split("<", 1)
            c = int(c_s)
            if n_clauses > c and (best_c is None or c > best_c):
                best_c, mm = c, one(v_s)
        return max(0, min(mm, n_clauses))
    return max(0, min(one(spec), n_clauses))
