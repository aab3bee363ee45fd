"""LTR model evaluation + Naive Bayes classifier semantics (planted
corpus — the sf tables' lang labels are not text-correlated, so accuracy
is asserted against a corpus whose classes ARE separable)."""

import numpy as np
import pyarrow as pa

import ray.data

SF = "/root/testdata/sf0.001"


def test_tree_eval_matches_scalar_walk():
    from lucene_solr_ray.functions.ltr import TREES_MODEL, eval_trees

    rng = np.random.default_rng(5)
    feats = {
        "tf_term": rng.integers(0, 5, 200),
        "n_tokens": rng.integers(5, 60, 200),
        "n_chars": rng.integers(50, 400, 200),
        "is_en": rng.integers(0, 2, 200),
    }

    def walk(node, i):
        if "value" in node:
            return node["value"]
        branch = "left" if feats[node["feature"]][i] < node["threshold"] else "right"
        return walk(node[branch], i)

    got = eval_trees(TREES_MODEL, feats)
    exp = np.array([sum(walk(t, i) for t in TREES_MODEL) for i in range(200)])
    assert np.array_equal(got, exp)


def test_ltr_bm25_rescore_is_deterministic_and_candidate_subset():
    from lucene_solr_ray.functions import ltr
    from lucene_solr_ray.functions.fulltext import bm25_topk

    a = ltr.bm25_rescore(SF, terms=["merge", "sort"], n_candidates=50, k=10)
    b = ltr.bm25_rescore(SF, terms=["merge", "sort"], n_candidates=50, k=10)
    assert a.equals(b)
    assert a.num_rows == 10
    # reranked ids must come from the first-pass candidate set
    first_pass = {r["doc_id"] for r in bm25_topk(SF, [("q", ["merge", "sort"], "or")], k=50).to_pylist()}
    assert set(a.column("doc_id").to_pylist()) <= first_pass
    # scores non-increasing
    s = a.column("ltr_score").to_numpy()
    assert (np.diff(s) <= 0).all()


def test_naive_bayes_planted_corpus_accuracy():
    from lucene_solr_ray.functions.classify import _NbPredictStage, train_naive_bayes
    import ray

    rng = np.random.default_rng(7)
    vocab = {
        "sports": ["goal", "match", "team", "score", "league"],
        "tech": ["kernel", "compile", "deploy", "server", "bug"],
        "food": ["bake", "roast", "spice", "flour", "simmer"],
    }
    shared = ["the", "and", "with", "of"]
    rows = []
    for i in range(300):
        cls = list(vocab)[i % 3]
        words = list(rng.choice(vocab[cls], 8)) + list(rng.choice(shared, 4))
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words), "lang": cls})
    ds = ray.data.from_items(rows)
    model = train_naive_bayes(ds)
    assert sorted(model["classes"]) == ["food", "sports", "tech"]
    stage = _NbPredictStage(ray.put(model))
    out = stage(pa.Table.from_pylist(rows))
    acc = np.mean(np.array(out.column("predicted").to_pylist())
                  == np.array([r["lang"] for r in rows]))
    assert acc >= 0.99, acc


def test_knn_classify_schema_and_determinism():
    from lucene_solr_ray.functions.classify import knn_classify

    a = knn_classify(SF, k=5, n_queries=8)
    b = knn_classify(SF, k=5, n_queries=8)
    assert a.equals(b)
    assert a.num_rows == 8
    assert a.column_names == ["query_id", "predicted"]


def test_cluster_kmeans_exact_oracle_and_vocab_closure(ray_session):
    """Exact-integer k-means == the unrolled SQL at sf0.001; the vocab
    the feature space assumes is closed over the corpus; rerun is
    deterministic."""
    import duckdb
    from lucene_solr_ray.functions import data_oracle
    from lucene_solr_ray.functions.classify import CLUSTER_VOCAB, cluster_kmeans_docs

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    vocab = {w for (w,) in con.execute(
        "SELECT DISTINCT unnest(regexp_split_to_array(text,'\\s+')) FROM documents").fetchall()}
    assert vocab <= set(CLUSTER_VOCAB)

    got = cluster_kmeans_docs(sf).to_pandas().reset_index(drop=True)
    exp = con.execute(data_oracle.cluster_kmeans_sql()).fetchdf()
    assert got.equals(exp.astype(got.dtypes.to_dict()))
    again = cluster_kmeans_docs(sf).to_pandas().reset_index(drop=True)
    assert got.equals(again)
    # every cluster is used at this scale (non-degenerate clustering)
    assert got["cluster_id"].nunique() == 8


def test_h_scaled_matches_float_entropy():
    """_h_scaled == n * binaryEntropy(a/n) in micro-nats up to the per-log
    quantization (error < #logs * 0.5 micro-nats * weights); degenerate
    a=0 / a=n / n=0 are exactly 0."""
    import numpy as np

    from lucene_solr_ray.functions.classify import _h_scaled

    rng = [(1, 7), (3, 10), (250, 500), (499, 500), (123456, 1000000)]
    for a, n in rng:
        got = int(_h_scaled(np.array([a]), np.array([n]))[0])
        p = a / n
        want = n * (-(p * np.log(p)) - (1 - p) * np.log(1 - p)) * 1e6
        assert abs(got - want) <= n  # each of the n weighted logs off by <= 0.5 ulp-of-micro
    for a, n in [(0, 9), (9, 9), (0, 0)]:
        assert int(_h_scaled(np.array([a]), np.array([n]))[0]) == 0


def test_features_select_ig_orders_separating_term(tmp_path, ray_session):
    """A term appearing in ALL positive docs and NO negative docs gets the
    maximal IG (== H(C) scaled) and ranks first."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.classify import features_select

    texts = ["zzsep common filler", "zzsep common words", "zzsep common row",
             "common other row", "common other words", "common filler row"]
    langs = ["en", "en", "en", "de", "de", "de"]
    tab = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 6, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = features_select(str(tmp_path), label_lang="en", k=3).to_pandas()
    assert out["term"].iloc[0] == "zzsep"
    # perfectly separating term: H(C|t) = H(C|!t) = 0 -> ig == Hs(np, n)
    import numpy as np
    from lucene_solr_ray.functions.classify import _h_scaled
    assert int(out["ig_n_micro"].iloc[0]) == int(
        _h_scaled(np.array([3]), np.array([6]))[0])
    # 'common' appears everywhere -> zero information gain
    row = out[out["term"] == "common"]
    assert row.empty or int(row["ig_n_micro"].iloc[0]) == 0
