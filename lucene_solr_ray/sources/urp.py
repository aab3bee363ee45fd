"""Solr UpdateRequestProcessor chain ([U] solr/core/.../update/processor/
UpdateRequestProcessorChain.java) re-expressed Ray-Data-first: a chain is
an ordered list of vectorized document processors fused into ONE
`map_batches` stage, so a 100 TB ingest pays a single pass regardless of
chain length.  Each processor is `pa.Table -> pa.Table` over the batch
(never per-row driver code); stateful processors compile their config
once in ``__init__`` (the chain object is the actor's state).

Built-in processors mirror the stock Solr ones:
- TrimFieldUpdateProcessorFactory         -> TrimFields
- RegexReplaceProcessorFactory            -> RegexReplace
- FieldMutating (lowercase)               -> LowerCaseFields
- SignatureUpdateProcessorFactory (MD5)   -> MD5Signature
- CountFieldValuesUpdateProcessorFactory  -> TokenCount
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


class TrimFields:
    """utf8_trim_whitespace over the named fields."""

    def __init__(self, fields: list[str]):
        self.fields = fields

    def __call__(self, t: pa.Table) -> pa.Table:
        for f in self.fields:
            col = pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t.column(f), pa.string()), ""))
            t = t.set_column(t.schema.get_field_index(f), f, col)
        return t


class RegexReplace:
    def __init__(self, field: str, pattern: str, replacement: str):
        self.field, self.pattern, self.replacement = field, pattern, replacement

    def __call__(self, t: pa.Table) -> pa.Table:
        col = pc.replace_substring_regex(
            pc.fill_null(pc.cast(t.column(self.field), pa.string()), ""),
            pattern=self.pattern,
            replacement=self.replacement,
        )
        return t.set_column(t.schema.get_field_index(self.field), self.field, col)


class LowerCaseFields:
    def __init__(self, fields: list[str], suffix: str = ""):
        self.fields, self.suffix = fields, suffix

    def __call__(self, t: pa.Table) -> pa.Table:
        for f in self.fields:
            col = pc.utf8_lower(pc.fill_null(pc.cast(t.column(f), pa.string()), ""))
            name = f + self.suffix
            if name in t.column_names:
                t = t.set_column(t.schema.get_field_index(name), name, col)
            else:
                t = t.append_column(name, col)
        return t


class MD5Signature:
    """SignatureUpdateProcessorFactory with MD5Signature over the
    concatenated source fields -> ``out`` column."""

    def __init__(self, fields: list[str], out: str = "sig"):
        self.fields, self.out = fields, out

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = [pc.fill_null(pc.cast(t.column(f), pa.string()), "").to_pylist() for f in self.fields]
        sigs = [
            hashlib.md5("|".join(vals).encode("utf-8")).hexdigest() for vals in zip(*cols)
        ] if cols else []
        return t.append_column(self.out, pa.array(sigs, type=pa.string()))


class TokenCount:
    """Whitespace token count of ``field`` -> ``out`` (int64)."""

    def __init__(self, field: str, out: str = "n_tokens"):
        self.field, self.out = field, out

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t.column(self.field), pa.string()), ""))
        toks = pc.split_pattern_regex(s, pattern=r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        empty = pc.equal(s, pa.scalar("")).to_numpy(zero_copy_only=False)
        n = np.where(empty, 0, n).astype(np.int64)
        return t.append_column(self.out, pa.array(n, type=pa.int64()))


class TruncateField:
    """TruncateFieldUpdateProcessor ([U] solr/core/.../update/processor/
    TruncateFieldUpdateProcessorFactory.java): cap a string field at
    ``max_len`` characters at ingest time."""

    def __init__(self, field: str, max_len: int):
        self.field = field
        self.max_len = int(max_len)

    def __call__(self, t: pa.Table) -> pa.Table:
        col = pc.utf8_slice_codeunits(
            pc.cast(t.column(self.field), pa.string()), 0, self.max_len)
        return t.set_column(t.schema.get_field_index(self.field),
                            self.field, col)


class URPChain:
    """The fused chain — ONE callable-class map_batches stage."""

    def __init__(self, processors):
        # processors arrive as (cls, kwargs) pairs so actor construction
        # happens on the worker, once, like Solr's factory.getInstance()
        self.processors = [cls(**kw) for cls, kw in processors]

    def __call__(self, t: pa.Table) -> pa.Table:
        for p in self.processors:
            t = p(t)
        return t


def run_chain(ds: ray.data.Dataset, processors, concurrency: int | None = None) -> ray.data.Dataset:
    from lucene_solr_ray.io_utils import pool_size

    return ds.map_batches(
        URPChain,
        fn_constructor_kwargs={"processors": processors},
        concurrency=concurrency if concurrency is not None else pool_size(),
        batch_format="pyarrow",
    )


def urp_chain_process(sf_dir: str) -> ray.data.Dataset:
    """The driver-contract entry: trim text -> collapse whitespace ->
    lowercase lang -> MD5 signature of the normalized text -> token
    count.  Column names match the DuckDB oracle."""
    from lucene_solr_ray.io_utils import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    out = run_chain(
        ds,
        [
            (TrimFields, {"fields": ["text"]}),
            (RegexReplace, {"field": "text", "pattern": r"\s+", "replacement": " "}),
            (LowerCaseFields, {"fields": ["lang"], "suffix": "_lc"}),
            (MD5Signature, {"fields": ["text"], "out": "sig"}),
            (TokenCount, {"field": "text", "out": "n_tokens"}),
        ],
    )
    return out.select_columns(["doc_id", "lang_lc", "sig", "n_tokens"]).sort("doc_id")


class TolerantGuard:
    """TolerantUpdateProcessor ([U] solr/core/.../update/processor/
    TolerantUpdateProcessorFactory.java): instead of aborting the whole
    update batch on one bad document, skip bad docs and report them.
    'Bad' here = a validation rule the downstream indexer would reject
    (empty text, or a doc_id outside the declared id space). Emits an
    ``err`` column: '' for accepted docs, the failure reason otherwise —
    callers filter err == '' for the indexable stream and aggregate the
    rest into the error report (maxErrors semantics are the caller's
    count on that report)."""

    def __init__(self, max_id: int = 1 << 62):
        self.max_id = max_id

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as _np
        import pyarrow.compute as _pc

        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        errs = []
        for i, s in enumerate(texts):
            if s is None or not s.strip():
                errs.append("empty_text")
            elif ids[i] < 0 or ids[i] >= self.max_id:
                errs.append("bad_id")
            else:
                errs.append("")
        return t.append_column("err", pa.array(errs, pa.string()))


def tolerant_update(sf_dir: str, bad_mod: int = 25) -> ray.data.Dataset:
    """Driver entry: a derived view where every ``doc_id % bad_mod == 0``
    row gets its text blanked (the malformed-document injection — both
    sides derive it identically), run through the tolerant chain. Output:
    per-doc (doc_id, err, accepted) — the update response's per-doc
    status list, proving the batch was NOT aborted by the bad rows."""
    from lucene_solr_ray.io_utils import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def inject(t: pa.Table) -> pa.Table:
        import numpy as _np

        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        texts = ["" if i % bad_mod == 0 else s for i, s in zip(ids, texts)]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    out = run_chain(ds.map_batches(inject, batch_format="pyarrow"),
                    [(TolerantGuard, {})])

    def status(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({
            "doc_id": t.column("doc_id"),
            "err": t.column("err"),
            "accepted": _pc.cast(_pc.equal(t.column("err"), pa.scalar("")), pa.int64()),
        })

    return out.map_batches(status, batch_format="pyarrow").sort("doc_id")


class CloneField:
    """CloneFieldUpdateProcessorFactory ([U] solr/core/.../update/
    processor/CloneFieldUpdateProcessorFactory.java): copy a source
    field into a new destination field (the URP-side copyField)."""

    def __init__(self, src: str, dest: str):
        self.src, self.dest = src, dest

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.append_column(self.dest, t.column(self.src))


class UUIDAssign:
    """UUIDUpdateProcessorFactory ([U] solr/core/.../update/processor/
    UUIDUpdateProcessorFactory.java), made deterministic: instead of a
    random v4 UUID the processor assigns an RFC-4122 VERSION-3
    (name-based, md5) UUID of the named field — reproducible across
    retries, which is what an idempotent distributed ingest actually
    wants. Version nibble forced to '3', variant nibble to (n & 3) | 8."""

    _VARIANT = {c: v for c, v in zip("0123456789abcdef",
                                     "89ab89ab89ab89ab")}

    def __init__(self, field: str = "text", out: str = "uuid"):
        self.field, self.out = field, out

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        vals = []
        for s in t.column(self.field).to_pylist():
            h = hashlib.md5((s or "").encode()).hexdigest()
            vals.append(f"{h[:8]}-{h[8:12]}-3{h[13:16]}-"
                        f"{self._VARIANT[h[16]]}{h[17:20]}-{h[20:32]}")
        return t.append_column(self.out, pa.array(vals, pa.string()))


def urp_uuid_clone(sf_dir: str) -> ray.data.Dataset:
    """UUID + CloneField chain entry: deterministic v3 UUID of the text
    plus a cloned lang field, one fused map_batches stage."""
    from lucene_solr_ray.io_utils import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    out = run_chain(
        ds,
        [
            (UUIDAssign, {"field": "text", "out": "uuid"}),
            (CloneField, {"src": "lang", "dest": "lang_copy"}),
        ],
    )
    return out.select_columns(["doc_id", "uuid", "lang_copy"]).sort("doc_id")


def urp_truncate(sf_dir: str, max_len: int = 120) -> ray.data.Dataset:
    """TruncateField entry: cap text at ``max_len`` chars, then sign and
    count the truncated stream — proves the truncation ran BEFORE the
    downstream processors (the chain-order contract)."""
    from lucene_solr_ray.io_utils import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = run_chain(
        ds,
        [
            (TruncateField, {"field": "text", "max_len": max_len}),
            (MD5Signature, {"fields": ["text"], "out": "sig"}),
            (TokenCount, {"field": "text", "out": "n_tokens"}),
        ],
    )
    return out.select_columns(["doc_id", "sig", "n_tokens"]).sort("doc_id")
