"""DIH / Tika / URP-chain ingest operators (SURVEY §2.1/§2.2)."""

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_dih_jsonl_matches_csv(ray_session):
    from lucene_solr_ray.sources.ingest import dih_ingest

    csv_df = dih_ingest(SF, fmt="csv").to_pandas()
    jsonl_df = dih_ingest(SF, fmt="jsonl").to_pandas()
    assert len(csv_df) == 500
    pa.Table.from_pandas(csv_df).equals(pa.Table.from_pandas(jsonl_df))
    assert (csv_df["src_lang"].str.contains(":")).all()


def test_dih_unknown_format_raises(ray_session):
    from lucene_solr_ray.sources.ingest import dih_ingest

    with pytest.raises(ValueError):
        dih_ingest(SF, fmt="xml")


def test_tika_sniff_and_stub():
    from lucene_solr_ray.sources.ingest import extract_text_payload, sniff_content_type

    assert sniff_content_type(b"%PDF-1.4 x") == "application/pdf"
    assert sniff_content_type(b"PK\x03\x04zip") == "application/vnd.openxmlformats"
    assert sniff_content_type(b"  <html><p>x</p>") == "text/html"
    assert sniff_content_type(b"plain words") == "text/plain"

    ctype, text = extract_text_payload(b"<p>hello &amp; world</p><!-- c -->")
    assert (ctype, text) == ("text/html", "hello & world")
    ctype, text = extract_text_payload(b"plain words")
    assert (ctype, text) == ("text/plain", "plain words")
    # binary formats: stub extraction is deterministic-empty; real raises
    ctype, text = extract_text_payload(b"%PDF-1.4 x", decoder="stub")
    assert (ctype, text) == ("application/pdf", "")
    with pytest.raises(NotImplementedError):
        extract_text_payload(b"%PDF-1.4 x", decoder="real")


def test_urp_chain_composes(ray_session):
    import ray.data

    from lucene_solr_ray.sources.urp import (
        LowerCaseFields,
        MD5Signature,
        RegexReplace,
        TokenCount,
        TrimFields,
        run_chain,
    )

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["  A  b ", "", "x"], "lang": ["EN", "FR", "DE"]})
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
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["text"]) == ["A b", "", "x"]
    assert list(out["lang_lc"]) == ["en", "fr", "de"]
    assert list(out["n_tokens"]) == [2, 0, 1]
    import hashlib

    assert out["sig"][0] == hashlib.md5(b"A b").hexdigest()
