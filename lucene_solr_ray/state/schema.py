"""IndexSchema ([U] solr/core/.../schema/IndexSchema.java, schema.xml
fieldType surface): declarative field -> type mapping that routes each
field to its serving strategy in this engine:

- ``text_general``  -> the inverted index (analyzer chain from the
  ANALYZERS registry; [U] solr/core/.../schema/TextField.java)
- ``string``        -> docvalues equality/isin filters served by
  parquet predicate pushdown over docs.parquet
  ([U] solr/core/.../schema/StrField.java — docValues fq path)
- ``plong``/``pdate`` -> point range filters served by row-group
  statistics pruning ([U] .../schema/LongPointField.java,
  DatePointField.java; BKD replaced by parquet stats — search.py
  search_ts_range)

The schema is DATA (a dict / JSON file, like schema.xml); loading
validates every field type and analyzer name up front so a typo fails
at schema load, not mid-query.
"""

from __future__ import annotations

import json
from typing import NamedTuple


class Range(NamedTuple):
    """Unambiguous numeric-range filter marker for ``dv_expr`` — a
    dedicated type instead of the old ``("range", lo, hi)`` tuple
    sentinel, which collided with a legitimate isin membership filter
    whose first value happened to be the string 'range' (ADVICE r3).
    Inclusive on both ends, like the classic parser's ``[a TO b]``."""

    lo: object
    hi: object


FIELD_TYPES = {
    "text_general": {"serve": "inverted"},
    "string": {"serve": "docvalues"},
    "plong": {"serve": "point"},
    "pdate": {"serve": "point"},
}


class IndexSchema:
    def __init__(self, fields: dict[str, dict]):
        from lucene_solr_ray.analysis import ANALYZERS

        self.fields = {}
        for name, spec in fields.items():
            ftype = spec.get("type")
            if ftype not in FIELD_TYPES:
                raise ValueError(
                    f"field {name!r}: unknown type {ftype!r} (have {sorted(FIELD_TYPES)})"
                )
            analyzer = spec.get("analyzer", "standard")
            if FIELD_TYPES[ftype]["serve"] == "inverted" and analyzer not in ANALYZERS:
                raise ValueError(
                    f"field {name!r}: unknown analyzer {analyzer!r} "
                    f"(have {sorted(ANALYZERS)})"
                )
            self.fields[name] = {
                "type": ftype,
                "serve": FIELD_TYPES[ftype]["serve"],
                "analyzer": analyzer if FIELD_TYPES[ftype]["serve"] == "inverted" else None,
            }

    @classmethod
    def from_json(cls, src: str) -> "IndexSchema":
        """src: a JSON string or a path to a JSON file with
        {"fields": {name: {"type": ..., "analyzer": ...}}}."""
        if src.lstrip().startswith("{"):
            doc = json.loads(src)
        else:
            with open(src) as f:
                doc = json.load(f)
        return cls(doc["fields"])

    def serve(self, field: str) -> str:
        if field not in self.fields:
            raise KeyError(f"unknown field {field!r} (schema has {sorted(self.fields)})")
        return self.fields[field]["serve"]

    def inverted_fields(self) -> list[str]:
        return [f for f, s in self.fields.items() if s["serve"] == "inverted"]

    def docvalues_fields(self) -> list[str]:
        return [f for f, s in self.fields.items() if s["serve"] == "docvalues"]

    def point_fields(self) -> list[str]:
        return [f for f, s in self.fields.items() if s["serve"] == "point"]

    def analyzer(self, field: str):
        from lucene_solr_ray.analysis import ANALYZERS

        spec = self.fields[field]
        if spec["serve"] != "inverted":
            raise ValueError(f"field {field!r} is not an inverted (text) field")
        return ANALYZERS[spec["analyzer"]]

    def dv_expr(self, filters: dict):
        """Equality / isin filters over docvalues fields -> a pyarrow
        dataset expression (predicate pushdown into docs.parquet).
        Rejects filters on non-docvalues fields loudly."""
        import pyarrow.compute as pc

        expr = None
        for field, value in filters.items():
            if isinstance(value, Range):
                # numeric [lo TO hi] on a POINT field (PointRangeQuery —
                # parquet row-group stats play the BKD role), inclusive
                # both ends like the classic parser
                if self.serve(field) not in ("point", "docvalues"):
                    raise ValueError(
                        f"field {field!r} is {self.serve(field)}-served; range "
                        "filters need a point or docvalues field")
                e = (pc.field(field) >= value.lo) & (pc.field(field) <= value.hi)
                expr = e if expr is None else expr & e
                continue
            if self.serve(field) != "docvalues":
                raise ValueError(
                    f"field {field!r} is {self.serve(field)}-served; docvalues "
                    f"filters need a 'string' field"
                )
            if isinstance(value, (list, tuple, set)):
                e = pc.field(field).isin(list(value))
            else:
                e = pc.field(field) == value
            expr = e if expr is None else expr & e
        return expr


# The transcript contract's default schema (FIXTURES.md §1) — also used
# by the documents-table adapter (fulltext.transcripts_from_documents).
TRANSCRIPTS_SCHEMA = IndexSchema(
    {
        "text": {"type": "text_general", "analyzer": "standard"},
        "role": {"type": "string"},
        "tool": {"type": "string"},
        "lang": {"type": "string"},
        "source": {"type": "string"},
        "conv_id": {"type": "string"},
        "ts": {"type": "pdate"},
        "turn_idx": {"type": "plong"},
        "n_chars": {"type": "plong"},
    }
)
