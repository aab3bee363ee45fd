"""IndexSchema field routing + docvalues-filtered BooleanQuery
(Solr q + fq over docValues StrFields — SURVEY §1.1 Solr schema row,
[U] solr/core/.../schema/IndexSchema.java / StrField.java)."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from lucene_solr_ray.pipelines.search import IndexSearcher
from lucene_solr_ray.state.schema import TRANSCRIPTS_SCHEMA, IndexSchema


@pytest.fixture(scope="module")
def searcher(t1_index):
    index_dir, _ = t1_index
    return IndexSearcher(index_dir)


@pytest.fixture(scope="module")
def docid_cols(t1_index):
    index_dir, _ = t1_index
    t = pads.dataset(os.path.join(index_dir, "docs"), format="parquet").to_table(
        columns=["docid", "role", "tool"]
    )
    order = np.argsort(t.column("docid").to_numpy(), kind="stable")
    return (
        t.column("role").to_numpy(zero_copy_only=False)[order],
        t.column("tool").to_numpy(zero_copy_only=False)[order],
    )


def test_schema_validation():
    with pytest.raises(ValueError, match="unknown type"):
        IndexSchema({"x": {"type": "nope"}})
    with pytest.raises(ValueError, match="unknown analyzer"):
        IndexSchema({"x": {"type": "text_general", "analyzer": "nope"}})
    with pytest.raises(KeyError):
        TRANSCRIPTS_SCHEMA.serve("no_such_field")
    # dv_expr rejects filters routed to non-docvalues fields
    with pytest.raises(ValueError, match="docvalues"):
        TRANSCRIPTS_SCHEMA.dv_expr({"ts": "2026-01-01"})
    assert TRANSCRIPTS_SCHEMA.serve("text") == "inverted"
    assert TRANSCRIPTS_SCHEMA.serve("role") == "docvalues"
    assert TRANSCRIPTS_SCHEMA.serve("ts") == "point"
    assert "text" in TRANSCRIPTS_SCHEMA.inverted_fields()
    assert TRANSCRIPTS_SCHEMA.analyzer("text") is not None


def test_dv_filtered_boolean_parity(searcher, t1_oracle, docid_cols):
    roles, _ = docid_cols
    role = roles[0]
    n = searcher.n_docs
    got_d, got_s = searcher.search_boolean(
        must=["w0000"], dv_filters={"role": role}, k=n
    )
    exp_d, exp_s = t1_oracle.search_boolean(must=["w0000"], k=n)
    keep = roles[exp_d] == role
    assert got_d.tolist() == exp_d[keep].tolist()
    assert np.array_equal(got_s, exp_s[keep])
    assert len(got_d) > 0  # probe actually matched something


def test_dv_isin_filter(searcher, docid_cols):
    roles, tools = docid_cols
    vals = sorted(set(roles.tolist()))[:2]
    got_d, _ = searcher.search_boolean(
        must=["w0000"], dv_filters={"role": vals}, k=searcher.n_docs
    )
    assert np.all(np.isin(roles[got_d], vals))
    # conjunction of two dv fields
    tool = tools[tools != ""][0] if (tools != "").any() else tools[0]
    got2, _ = searcher.search_boolean(
        must=["w0000"], dv_filters={"role": vals, "tool": tool}, k=searcher.n_docs
    )
    assert set(got2.tolist()) <= set(got_d.tolist())
    assert np.all(tools[got2] == tool)


def test_dv_pure_filter_match(searcher, docid_cols):
    """No scoring clauses: MatchAll + FILTER shape — constant score 0,
    docids ascending."""
    roles, _ = docid_cols
    role = roles[0]
    exp = np.flatnonzero(roles == role)
    got_d, got_s = searcher.search_boolean(dv_filters={"role": role}, k=len(exp))
    assert got_d.tolist() == exp.tolist()
    assert np.all(got_s == np.float32(0.0))
    # zero-clause, zero-filter query matches nothing (Lucene semantics)
    d, _ = searcher.search_boolean(k=10)
    assert len(d) == 0
