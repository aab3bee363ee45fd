"""Index-time sorting ([U] lucene/core/.../index/IndexWriterConfig.java
setIndexSort + EarlyTerminatingSortingCollector): docid order == sort
order, so a matching sorted query stops after the first k matches."""

import numpy as np
import pyarrow.dataset as pads
import pytest

from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.search import IndexSearcher


@pytest.fixture(scope="module")
def sorted_index(ray_session, t1_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "sorted-ts")
    manifest = build_index(t1_corpus, idx, num_partitions=4, salt=1,
                           docid_mode="sorted-by:ts:desc")
    return idx, manifest


def test_manifest_records_index_sort(sorted_index):
    _, manifest = sorted_index
    assert manifest["index_sort"] == {"field": "ts", "descending": True}
    assert manifest["docid_mode"] == "sorted-by:ts:desc"


def test_docids_follow_sort_order(sorted_index):
    idx, manifest = sorted_index
    docs = pads.dataset(f"{idx}/docs", format="parquet").to_table(
        columns=["docid", "ts", "conv_id", "turn_idx"])
    order = np.argsort(docs.column("docid").to_numpy())
    ts = docs.column("ts").to_numpy()[order]
    conv = np.asarray(docs.column("conv_id").to_pylist(), dtype=object)[order]
    ti = docs.column("turn_idx").to_numpy()[order]
    # docid asc == (ts desc, conv_id asc, turn_idx asc)
    for i in range(1, len(ts)):
        key_prev = (-ts[i - 1].astype("int64"), conv[i - 1], int(ti[i - 1]))
        key_cur = (-ts[i].astype("int64"), conv[i], int(ti[i]))
        assert key_prev <= key_cur, i


def test_early_termination_matches_full_sort(sorted_index):
    idx, _ = sorted_index
    s = IndexSearcher(idx)
    docs = pads.dataset(f"{idx}/docs", format="parquet").to_table(
        columns=["docid", "ts"])
    order = np.argsort(docs.column("docid").to_numpy())
    all_ts = docs.column("ts").to_numpy()[order]
    for terms, mode in [(["w0000"], "or"), (["w0000", "w0001"], "or"),
                        (["w0000", "w0001"], "and"), (["zzznope"], "or")]:
        d, vals = s.search_sorted_by_field(terms, "ts", k=7, mode=mode,
                                           window=64)
        # expected: all matches, sorted by (ts desc == docid asc), first 7
        full = np.concatenate(list(s.iter_matches(terms, mode=mode)) or
                              [np.empty(0, dtype=np.int64)])
        exp = np.sort(full)[:7]
        assert np.array_equal(d, exp), (terms, mode)
        assert np.array_equal(vals, all_ts[d])


def test_early_termination_actually_early(sorted_index):
    idx, _ = sorted_index
    s = IndexSearcher(idx)
    d, _ = s.search_sorted_by_field(["w0000"], "ts", k=5, window=32)
    assert len(d) == 5
    # "w0000" matches most docs; k=5 with window=32 must stop after ~1 window,
    # far fewer than the ceil(n_docs/32) a full scan would consume
    assert s.last_sorted_windows <= 2
    assert s.last_sorted_windows * 32 < s.n_docs


def test_unsorted_field_falls_back(sorted_index):
    idx, _ = sorted_index
    s = IndexSearcher(idx)
    # ascending query on a descending index must NOT early-terminate
    d, vals = s.search_sorted_by_field(["w0000"], "ts", k=5, descending=False)
    assert s.last_sorted_windows == 0
    assert len(d) == 5
    assert np.all(vals[:-1] <= vals[1:])


def test_append_rejected_on_sorted_index(sorted_index, t1_corpus):
    idx, _ = sorted_index
    with pytest.raises(ValueError, match="index sort"):
        build_index(t1_corpus, idx, num_partitions=4, salt=1,
                    docid_mode="sorted-by:ts:desc", append=True)
