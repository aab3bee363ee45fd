"""Per-query doc-range slicing (leaf-slice parallelism for hot queries):
sliced execution must be BIT-EQUAL to unsliced on every query."""

import numpy as np
import pyarrow as pa


def _qtab(queries):
    return pa.table({
        "query_id": pa.array([q[0] for q in queries], pa.string()),
        "type": pa.array([q[2] for q in queries], pa.string()),
        "terms": pa.array([q[1] for q in queries], pa.list_(pa.string())),
        "k": pa.array([q[3] for q in queries], pa.int32()),
    })


def test_sliced_search_bit_equal_searcher(ray_session, t1_index, t1_table):
    """IndexSearcher.search with docid_range slices unions to the
    unsliced result, scores bitwise equal."""
    from lucene_solr_ray.oracle import Oracle, topk_order
    from lucene_solr_ray.pipelines.search import IndexSearcher

    index_dir, manifest = t1_index
    s = IndexSearcher(index_dir)
    orc = Oracle(t1_table)
    hot = sorted(orc.postings, key=lambda t: -len(orc.postings[t][0]))[:3]
    for mode in ("or", "and"):
        d_full, s_full = s.search(hot, k=25, mode=mode, algorithm="dense")
        n = s.n_docs
        for n_slices in (2, 5):
            step = -(-n // n_slices)
            ds_, ss_ = [], []
            for i in range(n_slices):
                lo, hi = i * step, min(n, (i + 1) * step)
                d_i, s_i = s.search(hot, k=25, mode=mode, docid_range=(lo, hi))
                ds_.append(d_i)
                ss_.append(s_i)
            d_all = np.concatenate(ds_)
            s_all = np.concatenate(ss_)
            top = topk_order(d_all, s_all, 25)
            assert d_all[top].tolist() == d_full.tolist()
            assert np.array_equal(s_all[top], s_full)


def test_sliced_run_queries_bit_equal(ray_session, t1_index, t1_table, t1_queries):
    """run_queries(slices=4) == run_queries(slices=1) on the full t1
    query set — docids identical, float32 scores bitwise equal."""
    from lucene_solr_ray.pipelines.search import run_queries

    index_dir, _ = t1_index
    base = run_queries(index_dir, t1_queries).to_pandas()
    sliced = run_queries(index_dir, t1_queries, slices=4).to_pandas()
    base = base.sort_values(["query_id", "rank"]).reset_index(drop=True)
    sliced = sliced.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(base) == len(sliced)
    assert (base["query_id"].to_numpy() == sliced["query_id"].to_numpy()).all()
    assert (base["docid"].to_numpy() == sliced["docid"].to_numpy()).all()
    assert np.array_equal(base["score"].to_numpy(np.float32),
                          sliced["score"].to_numpy(np.float32))
