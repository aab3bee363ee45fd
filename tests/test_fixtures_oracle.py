import numpy as np
import pyarrow as pa

from lucene_solr_ray.fixtures import gen_query_set, gen_transcripts
from lucene_solr_ray.oracle import Oracle, analyze_query_terms


def test_transcripts_deterministic_and_schema():
    t1 = gen_transcripts(20, seed=42)
    t2 = gen_transcripts(20, seed=42)
    assert t1.equals(t2)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t1.schema.field("turn_idx").type == pa.int32()
    assert t1.schema.field("ts").type == pa.timestamp("us")
    # shuffled on disk: not already sorted
    conv = t1.column("conv_id").to_pylist()
    assert conv != sorted(conv)


def test_transcripts_unique_key_and_density():
    t = gen_transcripts(30, seed=42)
    keys = list(zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist()))
    assert len(keys) == len(set(keys))
    # turn_idx dense 0..n-1 per conv
    from collections import defaultdict
    by_conv = defaultdict(list)
    for c, i in keys:
        by_conv[c].append(i)
    for c, idxs in by_conv.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_query_set_shape():
    t = gen_transcripts(60, seed=42)
    qs = gen_query_set(t.column("text").to_pylist(), seed=43)
    assert qs.num_rows == 200
    types = qs.column("type").to_pylist()
    assert types.count("single") == 80 and types.count("or") == 80 and types.count("and") == 40
    # deterministic
    qs2 = gen_query_set(t.column("text").to_pylist(), seed=43)
    assert qs.equals(qs2)


def test_analyze_query_terms_chain_and_order():
    assert analyze_query_terms(["The"]) == []
    assert analyze_query_terms(["Café", "zz", "AA", "zz"]) == ["aa", "café", "zz"]


def test_oracle_basic_ranking():
    table = pa.table(
        {
            "conv_id": ["c1", "c1", "c0"],
            "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
            "role": ["user", "assistant", "user"],
            "text": ["apple apple banana", "apple", "banana cherry"],
            "tool": ["", "", ""],
            "ts": pa.array([0, 1, 2], type=pa.timestamp("us")),
        }
    )
    # docids after (conv_id, turn_idx) sort: 0="banana cherry"(c0), 1="apple apple banana", 2="apple"
    o = Oracle(table)
    assert o.n_docs == 3 and o.df("apple") == 2 and o.df("banana") == 2
    d, s = o.search(["apple"], k=10)
    assert d.tolist() == [1, 2] or (len(d) == 2 and s[0] >= s[1])
    d, s = o.search(["banana", "cherry"], k=10, mode="and")
    assert d.tolist() == [0]
    d, s = o.search(["zzz-absent"], k=10)
    assert len(d) == 0
    # AND with an absent term -> empty
    d, s = o.search(["apple", "zzz-absent"], k=10, mode="and")
    assert len(d) == 0


def test_oracle_tie_break_docid_asc():
    table = pa.table(
        {
            "conv_id": ["a", "b", "c"],
            "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
            "role": ["user"] * 3,
            "text": ["same same", "same same", "other"],
            "tool": [""] * 3,
            "ts": pa.array([0, 1, 2], type=pa.timestamp("us")),
        }
    )
    o = Oracle(table)
    d, s = o.search(["same"], k=10)
    assert d.tolist() == [0, 1]
    assert s[0] == s[1]
