"""Ingest sources — Solr DataImportHandler / Tika-extraction analogues
re-expressed Ray-Data-first.

DIH ([U] solr/contrib/dataimporthandler/.../DataImportHandler.java,
JdbcDataSource / FileDataSource entities with RegexTransformer /
TemplateTransformer) becomes: `ray.data.read_csv` / `read_json` over the
external files + ONE vectorized `map_batches` applying the configured
transformer chain.  Tika extraction ([U] solr/contrib/extraction/.../
ExtractingRequestHandler.java) becomes a content-type-sniffing
`map_batches` stage: HTML and plain text are extracted for real; binary
formats (PDF/DOCX — no parser libs in this container) are a declared
deterministic stub, gated per content type, with the Ray-side plumbing
(schema, batching, typed metadata out) fully real.

At 100 TB the external files are the input — `read_csv`/`read_json`
shard by file and stream; nothing here materializes the corpus.  The
parquet→CSV/JSONL spill under /tmp exists only so the sandbox's parquet
test tables can stand in for DIH's external sources.
"""

from __future__ import annotations

import hashlib
import html as _html
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

import ray.data

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

CACHE_ROOT = os.environ.get("LSR_CACHE", "/tmp/lsr_cache")


# ---------------- DIH: external-source synthesis (test harness only) ----------------

def _spill_documents(sf_dir: str, fmt: str) -> str:
    """Materialize documents.parquet as the external CSV/JSONL 'entity'
    DIH would ingest.  Cached per (sf_dir, mtime); sandbox-only shim —
    real deployments point read_csv/read_json at the external files."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = f"{sf_dir.replace('/', '_')}_{int(os.path.getmtime(src))}"
    out_dir = os.path.join(CACHE_ROOT, "ingest", key)
    out = os.path.join(out_dir, f"documents.{fmt}")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    tbl = pq.read_table(src)
    tmp = out + ".tmp"
    if fmt == "csv":
        pacsv.write_csv(tbl, tmp)
    else:  # jsonl
        import json

        with open(tmp, "w", encoding="utf-8") as f:
            for row in tbl.to_pylist():
                f.write(json.dumps(row, default=str) + "\n")
    os.rename(tmp, out)
    return out


_FIRST_TOKEN_RE = r"^(?P<f>\S+)"


class _DIHTransformStage:
    """The DIH transformer chain as one vectorized stage: field mapping,
    RegexTransformer (first-token extract), TemplateTransformer
    (source:lang), type casts ([U] dataimporthandler/.../RegexTransformer
    .java, TemplateTransformer.java).  Regex is compiled per actor."""

    def __init__(self) -> None:
        self.first_tok = _FIRST_TOKEN_RE

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t.column("text"), pa.string()), "")
        ext = pc.extract_regex(text, self.first_tok)
        first = pc.fill_null(pc.struct_field(ext, "f"), "")
        template = pc.binary_join_element_wise(
            pc.cast(t.column("source"), pa.string()),
            pc.cast(t.column("lang"), pa.string()),
            ":",
        )
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "first_tok": first,
                "src_lang": template,
                "n_chars": pc.cast(t.column("n_chars"), pa.int64()),
            }
        )


def dih_ingest(sf_dir: str, fmt: str = "csv") -> ray.data.Dataset:
    """DataImportHandler full-import: read the external entity files and
    apply the transformer chain.  Column names match the DuckDB oracle."""
    path = _spill_documents(sf_dir, fmt)
    if fmt == "csv":
        # empty strings must stay strings (not null) and text must not be
        # type-inferred — give arrow the explicit entity schema, like a
        # DIH field column list
        ds = ray.data.read_csv(
            path,
            convert_options=pacsv.ConvertOptions(
                column_types={
                    "doc_id": pa.int64(),
                    "text": pa.string(),
                    "lang": pa.string(),
                    "source": pa.string(),
                    "n_chars": pa.int64(),
                },
                strings_can_be_null=False,
            ),
        )
    elif fmt == "jsonl":
        ds = ray.data.read_json(path)
    else:
        raise ValueError(f"unknown DIH source format: {fmt}")
    return ds.map_batches(_DIHTransformStage, concurrency=pool_size(), batch_format="pyarrow").sort("doc_id")


# ---------------- Tika-style content extraction ----------------

_TAG_RE = re.compile(r"<!--.*?-->|<[^>]*>", re.S)


def sniff_content_type(payload: bytes) -> str:
    """Magic-byte content-type detection (the AutoDetectParser step of
    [U] solr/contrib/extraction/.../ExtractingDocumentLoader.java)."""
    if payload.startswith(b"%PDF"):
        return "application/pdf"
    if payload.startswith(b"PK\x03\x04"):
        return "application/vnd.openxmlformats"  # docx/xlsx zip container
    head = payload[:256].lstrip()
    if head.startswith(b"<"):
        return "text/html"
    return "text/plain"


def extract_text_payload(payload: bytes, decoder: str = "stub") -> tuple[str, str]:
    """(content_type, extracted_text).  HTML/plain extraction is real;
    binary formats have no parser libs in this container — `stub` yields
    a deterministic empty extraction, `real` raises (declared stub)."""
    ctype = sniff_content_type(payload)
    if ctype == "text/html":
        raw = payload.decode("utf-8", errors="replace")
        return ctype, _html.unescape(_TAG_RE.sub("", raw))
    if ctype == "text/plain":
        return ctype, payload.decode("utf-8", errors="replace")
    if decoder == "real":
        raise NotImplementedError(
            f"no parser for {ctype} in this container — Tika-equivalent "
            "binary extraction is a declared stub"
        )
    return ctype, ""


class _TikaStage:
    """Actor-pool extraction stage: binary payload column in, typed
    (content_type, sig) metadata out.  At scale this is the pattern for
    any decode-heavy stage: small batches, one actor-held config."""

    def __init__(self, decoder: str = "stub") -> None:
        self.decoder = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        out_type, out_sig = [], []
        for payload in t.column("payload"):
            ctype, text = extract_text_payload(payload.as_py(), self.decoder)
            out_type.append(ctype)
            out_sig.append(hashlib.md5(text.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content_type": pa.array(out_type, type=pa.string()),
                "sig": pa.array(out_sig, type=pa.string()),
            }
        )


def tika_extract(sf_dir: str) -> ray.data.Dataset:
    """Wrap each document deterministically as an HTML payload (every 7th
    as a fake PDF to exercise the stub gate), run the extraction stage,
    return typed metadata.  Oracle mirrors the same wrapping rule."""

    def wrap(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = pc.fill_null(pc.cast(t.column("text"), pa.string()), "").to_pylist()
        payloads = []
        for d, s in zip(ids, texts):
            if d % 7 == 0:
                payloads.append(b"%PDF-1.4 " + s.encode("utf-8"))
            else:
                payloads.append(
                    (
                        '<html><head><title></title></head><body data-src="d">'
                        f"<p>{s}</p><!-- tail --></body></html>"
                    ).encode("utf-8")
                )
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "payload": pa.array(payloads, type=pa.binary())}
        )

    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return (
        ds.map_batches(wrap, batch_format="pyarrow")
        .map_batches(_TikaStage, fn_constructor_kwargs={"decoder": "stub"},
                     concurrency=pool_size(), batch_size=256, batch_format="pyarrow")
        .sort("doc_id")
    )
