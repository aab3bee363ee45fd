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

_TOKEN = re.compile(
    r"""
    (?P<phrase>"[^"]*"(~(?P<slop>\d+))?)
  | (?P<range>\[\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*\])
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
