"""Learning-to-rank ([U] solr/contrib/ltr — LTRScoringQuery,
LinearModel, MultipleAdditiveTreesModel, FieldValueFeature /
SolrFeature): rescore a first-pass candidate set with a feature-based
model.

The model is DATA (a dict), not code — mirroring Solr's JSON model
store — and evaluation is vectorized numpy over integer features so the
SQL-checked entries are hash-exact (integer weights x integer features;
FIXTURES.md float convention never applies).  The BM25 second-pass
(``bm25_rescore``) uses the real index's originalScore feature and is
pytest-validated (float scores have no SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

# ---------------- feature extraction (vectorized) ----------------


def _feature_batch(t: pa.Table, term: str) -> dict[str, np.ndarray]:
    """Integer features per document ([U] FieldValueFeature /
    TermFreqFeature analogues): whitespace-token tf of ``term``, token
    count, stored n_chars, lang indicator."""
    text = pc.cast(t.column("text"), pa.string())
    parts = pc.split_pattern_regex(text, r"\s+")
    n = len(t)
    flat = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(parts).to_numpy()
    hits = parent[flat == term]
    tf = np.bincount(hits, minlength=n).astype(np.int64)
    return {
        "tf_term": tf,
        "n_tokens": pc.list_value_length(parts).to_numpy().astype(np.int64),
        "n_chars": t.column("n_chars").to_numpy().astype(np.int64),
        "is_en": (t.column("lang").to_numpy(zero_copy_only=False) == "en").astype(np.int64),
    }


# ---------------- models (data, not code) ----------------

LINEAR_MODEL = {"tf_term": 100, "n_tokens": 3, "is_en": 40, "n_chars": -1}

# MultipleAdditiveTrees analogue: list of decision trees over the same
# features; nodes are {"feature","threshold","left","right"} (go left
# when f < threshold), leaves are {"value"} — all integers.
TREES_MODEL = [
    {
        "feature": "tf_term", "threshold": 2,
        "left": {"feature": "is_en", "threshold": 1,
                 "left": {"value": 3}, "right": {"value": 8}},
        "right": {"feature": "n_tokens", "threshold": 25,
                  "left": {"value": 20}, "right": {"value": 30}},
    },
    {
        "feature": "n_chars", "threshold": 150,
        "left": {"feature": "tf_term", "threshold": 1,
                 "left": {"value": 1}, "right": {"value": 6}},
        "right": {"value": 12},
    },
]


def eval_linear(model: dict, feats: dict[str, np.ndarray]) -> np.ndarray:
    n = len(next(iter(feats.values())))
    score = np.zeros(n, dtype=np.int64)
    for f, w in model.items():
        score += w * feats[f]
    return score


def eval_tree(node: dict, feats: dict[str, np.ndarray], mask=None) -> np.ndarray:
    """Vectorized tree walk: masks split the batch at every node."""
    n = len(next(iter(feats.values())))
    if mask is None:
        mask = np.ones(n, dtype=bool)
    out = np.zeros(n, dtype=np.int64)
    if "value" in node:
        out[mask] = node["value"]
        return out
    goes_left = feats[node["feature"]] < node["threshold"]
    out += eval_tree(node["left"], feats, mask & goes_left)
    out += eval_tree(node["right"], feats, mask & ~goes_left)
    return out


def eval_trees(model: list[dict], feats: dict[str, np.ndarray]) -> np.ndarray:
    n = len(next(iter(feats.values())))
    return sum((eval_tree(t, feats) for t in model), np.zeros(n, dtype=np.int64))


# ---------------- rescoring pipelines ----------------


class _LtrStage:
    """First-pass filter (tf >= 1, SolrFeature role) + model scoring in
    one vectorized pass; model compiled into the actor once."""

    def __init__(self, term: str, model, kind: str):
        self.term = term
        self.model = model
        self.kind = kind

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = _feature_batch(t, self.term)
        score = (eval_linear(self.model, feats) if self.kind == "linear"
                 else eval_trees(self.model, feats))
        keep = feats["tf_term"] >= 1
        return pa.table(
            {
                "doc_id": pa.array(t.column("doc_id").to_numpy()[keep], pa.int64()),
                "ltr_score": pa.array(score[keep], pa.int64()),
            }
        )


def _rescore(sf_dir: str, term: str, model, kind: str, k: int) -> ray.data.Dataset:
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    scored = ds.map_batches(
        _LtrStage,
        fn_constructor_kwargs={"term": term, "model": model, "kind": kind},
        batch_format="pyarrow",
        concurrency=pool_size(),
    )
    return scored.sort(["ltr_score", "doc_id"], descending=[True, False]).limit(k)


def ltr_linear_rescore(sf_dir: str, term: str = "merge", k: int = 50) -> ray.data.Dataset:
    """LinearModel rerank of the tf>=1 candidate set — top-k by
    (model score desc, doc_id asc)."""
    return _rescore(sf_dir, term, LINEAR_MODEL, "linear", k)


def ltr_trees_rescore(sf_dir: str, term: str = "merge", k: int = 50) -> ray.data.Dataset:
    """MultipleAdditiveTrees rerank of the same candidate set."""
    return _rescore(sf_dir, term, TREES_MODEL, "trees", k)


def ltr_ensemble_rescore(sf_dir: str, term: str = "merge", k: int = 50) -> ray.data.Dataset:
    """Model ensemble rerank — the linear model and the additive-trees
    model summed per doc (the stacked-reranker pattern Solr serves by
    chaining rq rescores; both models are integer-exact so the ensemble
    is too). One pass: features extract once, both models evaluate on
    the same feature batch."""
    from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

    class Ensemble:
        def __init__(self):
            self.term = term

        def __call__(self, t: pa.Table) -> pa.Table:
            feats = _feature_batch(t, self.term)
            score = (eval_linear(LINEAR_MODEL, feats)
                     + eval_trees(TREES_MODEL, feats))
            keep = feats["tf_term"] >= 1
            return pa.table({
                "doc_id": pa.array(t.column("doc_id").to_numpy()[keep], pa.int64()),
                "ltr_score": pa.array(score[keep], pa.int64()),
            })

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    scored = ds.map_batches(Ensemble, batch_format="pyarrow",
                            concurrency=pool_size())
    return scored.sort(["ltr_score", "doc_id"], descending=[True, False]).limit(k)


def ensemble_oracle_sql(term: str = "merge", k: int = 50) -> str:
    """Oracle for ltr_ensemble_rescore — the linear VALUES expression
    plus the unrolled tree CASE expressions, summed."""
    import re as _re

    lin = linear_oracle_sql(term, k)
    trees = trees_oracle_sql(term, k)
    lin_expr = _re.search(r"SELECT doc_id, CAST\((.+) AS BIGINT\) AS ltr_score",
                          lin).group(1)
    tree_expr = _re.search(r"SELECT doc_id, CAST\((.+) AS BIGINT\) AS ltr_score",
                           trees).group(1)
    prefix = lin[:lin.rindex("SELECT doc_id")]
    return (
        f"{prefix}SELECT doc_id, CAST(({lin_expr}) + ({tree_expr}) AS BIGINT) AS ltr_score "
        f"FROM f WHERE tf_term >= 1 ORDER BY ltr_score DESC, doc_id LIMIT {k}"
    )


_FEATS = ("tf_term", "n_tokens", "n_chars", "is_en")


class _MinMaxStage:
    """Scoring pass: min-max normalize each feature with the broadcast
    candidate-set extrema, then apply the linear model. Normalization is
    exact micro-int: (f - min) * 1e6 // max(1, max - min)."""

    def __init__(self, term: str, mm_ref):
        self.term = term
        self.mm = ray.get(mm_ref)  # {feat: (min, max)}

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = _feature_batch(t, self.term)
        keep = feats["tf_term"] >= 1
        score = np.zeros(int(keep.sum()), dtype=np.int64)
        for f, w in LINEAR_MODEL.items():
            mn, mx = self.mm[f]
            norm = (feats[f][keep] - mn) * 1_000_000 // max(1, mx - mn)
            score += w * norm
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy()[keep], pa.int64()),
            "ltr_score": pa.array(score, pa.int64()),
        })


def ltr_minmax_rescore(sf_dir: str, term: str = "merge", k: int = 50) -> ray.data.Dataset:
    """LinearModel with MinMaxNormalizers ([U] solr/contrib/ltr/.../norm/
    MinMaxNormalizer.java): every feature is min-max normalized before
    the dot product. The normalizer params derive from the candidate set
    (the offline fit that produces the min/max a deployed Solr model
    carries); normalization is exact micro-int so the SQL oracle matches
    bit-for-bit. Two passes: per-batch min/max partials over candidates
    (feature-count-sized exchange), broadcast extrema, one scoring pass."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )

    def mm_partial(t: pa.Table) -> pa.Table:
        feats = _feature_batch(t, term)
        keep = feats["tf_term"] >= 1
        if not keep.any():
            return pa.table({"feat": pa.array([], pa.string()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "feat": pa.array(list(_FEATS), pa.string()),
            "mn": pa.array([int(feats[f][keep].min()) for f in _FEATS], pa.int64()),
            "mx": pa.array([int(feats[f][keep].max()) for f in _FEATS], pa.int64()),
        })

    from ray.data.aggregate import Max, Min

    mm_df = (ds.map_batches(mm_partial, batch_format="pyarrow")
             .groupby("feat")
             .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
             .to_pandas())
    mm = {r["feat"]: (int(r["mn"]), int(r["mx"])) for _, r in mm_df.iterrows()}
    mm_ref = ray.put(mm)
    scored = ds.map_batches(
        _MinMaxStage,
        fn_constructor_kwargs={"term": term, "mm_ref": mm_ref},
        batch_format="pyarrow",
        concurrency=pool_size(),
    )
    return scored.sort(["ltr_score", "doc_id"], descending=[True, False]).limit(k)


def minmax_oracle_sql(term: str = "merge", k: int = 50) -> str:
    """Oracle for ltr_minmax_rescore — identical candidate-set min/max
    and micro-int normalization in SQL."""
    norm = {f: (f"(({f} - (SELECT MIN({f}) FROM c)) * 1000000 // "
                f"GREATEST(1, (SELECT MAX({f}) FROM c) - (SELECT MIN({f}) FROM c)))")
            for f in _FEATS}
    terms = " + ".join(f"({w}) * {norm[f]}" for f, w in LINEAR_MODEL.items())
    return (
        f"WITH f AS (SELECT doc_id, "
        f"len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x = '{term}')) AS tf_term, "
        f"len(regexp_split_to_array(text, '\\s+')) AS n_tokens, n_chars, "
        f"CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en FROM documents), "
        f"c AS (SELECT * FROM f WHERE tf_term >= 1) "
        f"SELECT doc_id, CAST({terms} AS BIGINT) AS ltr_score FROM c "
        f"ORDER BY ltr_score DESC, doc_id LIMIT {k}"
    )


def trees_oracle_sql(term: str = "merge", k: int = 50) -> str:
    """CASE-WHEN transcription of TREES_MODEL (kept next to the model so
    they can't drift apart)."""
    tree_sql = []
    def emit(node):
        if "value" in node:
            return str(node["value"])
        return (f"CASE WHEN {node['feature']} < {node['threshold']} "
                f"THEN {emit(node['left'])} ELSE {emit(node['right'])} END")
    for t in TREES_MODEL:
        tree_sql.append("(" + emit(t) + ")")
    return (
        f"WITH f AS (SELECT doc_id, "
        f"len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x = '{term}')) AS tf_term, "
        f"len(regexp_split_to_array(text, '\\s+')) AS n_tokens, n_chars, "
        f"CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en FROM documents) "
        f"SELECT doc_id, CAST({' + '.join(tree_sql)} AS BIGINT) AS ltr_score "
        f"FROM f WHERE tf_term >= 1 "
        f"ORDER BY ltr_score DESC, doc_id LIMIT {k}"
    )


def linear_oracle_sql(term: str = "merge", k: int = 50) -> str:
    terms = " + ".join(f"({w}) * {f}" for f, w in LINEAR_MODEL.items())
    return (
        f"WITH f AS (SELECT doc_id, "
        f"len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x = '{term}')) AS tf_term, "
        f"len(regexp_split_to_array(text, '\\s+')) AS n_tokens, n_chars, "
        f"CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en FROM documents) "
        f"SELECT doc_id, CAST({terms} AS BIGINT) AS ltr_score FROM f "
        f"WHERE tf_term >= 1 ORDER BY ltr_score DESC, doc_id LIMIT {k}"
    )


def bm25_rescore(sf_dir: str, terms: list[str] | None = None,
                 n_candidates: int = 100, k: int = 20) -> pa.Table:
    """Real LTR shape ([U] LTRScoringQuery second pass): BM25 top-N
    first pass over the docs index, then a linear blend of
    originalScore (milli-floored to int) with the integer features,
    reranked to top-k. No SQL oracle (BM25); pytest-validated."""
    from lucene_solr_ray.functions.fulltext import docs_index, _docid_to_doc_id
    from lucene_solr_ray.pipelines.search import IndexSearcher

    terms = list(terms) if terms else ["merge", "sort"]
    index_dir = docs_index(sf_dir)
    se = IndexSearcher(index_dir)
    docids, scores = se.search(terms, k=n_candidates, mode="or")
    doc_ids = _docid_to_doc_id(index_dir)[docids]

    import pyarrow.dataset as pads
    import os
    cand = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "text", "lang", "n_chars"],
        filter=pc.field("doc_id").isin(doc_ids.tolist()),
    )
    feats = _feature_batch(cand, terms[0])
    base = np.floor(np.asarray(scores, np.float64) * 1000 + 0.5).astype(np.int64)
    # align candidate rows (doc_id order from filter) to BM25 order
    order = {int(d): i for i, d in enumerate(cand.column("doc_id").to_pylist())}
    idx = np.array([order[int(d)] for d in doc_ids], dtype=np.int64)
    blend = base + 10 * feats["tf_term"][idx] + 5 * feats["is_en"][idx]
    rank = np.lexsort((doc_ids, -blend))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rank)), pa.int64()),
            "doc_id": pa.array(doc_ids[rank], pa.int64()),
            "ltr_score": pa.array(blend[rank], pa.int64()),
        }
    )


def feature_log(sf_dir: str, terms: list[str] | None = None,
                n_candidates: int = 20) -> pa.Table:
    """LTR feature logging ([U] solr/contrib/ltr/.../response/transform/
    LTRFeatureLoggerTransformerFactory.java, fl=[features]): the BM25
    top-N candidates with their extracted integer feature vector — the
    training-data export surface of the LTR contrib (what you feed the
    offline learner). Feature extraction is the same vectorized
    _feature_batch the scorers use; rank-only ordering (rank, doc_id,
    features); SQL oracle: ft_oracle.feature_log_sql."""
    import os

    import pyarrow.dataset as pads

    from lucene_solr_ray.functions.fulltext import _docid_to_doc_id, docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    from lucene_solr_ray.oracle import analyze_query_terms

    # analyze once so engine and oracle agree on uppercase/stopword
    # terms (ADVICE r3)
    terms = analyze_query_terms(list(terms) if terms else ["merge", "sort"])
    index_dir = docs_index(sf_dir)
    se = IndexSearcher(index_dir)
    docids, _scores = se.search(terms, k=n_candidates, mode="or")
    doc_ids = _docid_to_doc_id(index_dir)[docids]
    cand = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "text", "lang", "n_chars"],
        filter=pc.field("doc_id").isin(doc_ids.tolist()),
    )
    feats = _feature_batch(cand, terms[0])
    order = {int(d): i for i, d in enumerate(cand.column("doc_id").to_pylist())}
    idx = np.array([order[int(d)] for d in doc_ids], dtype=np.int64)
    return pa.table({
        "rank": pa.array(np.arange(len(doc_ids)), pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
        "tf_term": pa.array(feats["tf_term"][idx], pa.int64()),
        "n_tokens": pa.array(feats["n_tokens"][idx], pa.int64()),
        "n_chars": pa.array(feats["n_chars"][idx], pa.int64()),
        "is_en": pa.array(feats["is_en"][idx], pa.int64()),
    })
