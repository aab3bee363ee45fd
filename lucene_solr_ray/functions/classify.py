"""Classification ([U] lucene/classification/.../KNearestNeighborClassifier.java,
SimpleNaiveBayesClassifier.java) re-expressed on Ray Data.

- KNN: majority label of the k nearest neighbors by cosine over the
  ``embeddings`` table — per-batch partial top-k against a broadcast
  query matrix (the ann.py shape), output-sized driver merge, SQL-exact
  ((cos DESC, vec_id) neighbor order; (count DESC, label) vote order).
- Naive Bayes: model trained with map-side partial (class, term) counts
  combined on the driver (model is vocab x classes — sketch-sized, like
  sketches.py), broadcast back as sorted numpy arrays + searchsorted
  (never dicts; CLAUDE.md), vectorized log-prob scoring per batch.
  Float log-probs have no exact SQL oracle -> pytest-validated on a
  planted corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean
import ray.data


# ---------------- KNN classifier ----------------


class _KnnVoteStage:
    def __init__(self, q_ref, qids, k):
        self.q = ray.get(q_ref)
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.qids = qids
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        labels = t.column("label").to_numpy().astype(np.int64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cos = self.qn @ xn.T
        out_q, out_n, out_l, out_c = [], [], [], []
        for qi, qid in enumerate(self.qids):
            mask = ids != qid
            ci, li, coi = ids[mask], labels[mask], cos[qi][mask]
            if len(ci) > self.k:
                order = np.lexsort((ci, -coi))[: self.k]
                ci, li, coi = ci[order], li[order], coi[order]
            out_q.extend([int(qid)] * len(ci))
            out_n.extend(ci.tolist())
            out_l.extend(li.tolist())
            out_c.extend(coi.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "label": pa.array(out_l, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def knn_classify(sf_dir: str, k: int = 10, n_queries: int = 20) -> pa.Table:
    """Predict each of the first ``n_queries`` vectors' labels from the
    k-NN majority vote (ties: count desc, label asc) among all OTHER
    vectors -> (query_id, predicted)."""
    head = (
        read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .sort("vec_id").limit(n_queries).to_pandas()
    )
    qids = head["vec_id"].to_numpy().astype(np.int64)
    q_ref = ray.put(np.array(head["embedding"].tolist(), dtype=np.float64))
    partials = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
        )
        .map_batches(
            _KnnVoteStage,
            fn_constructor_kwargs={"q_ref": q_ref, "qids": qids, "k": k},
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool_size(),
        )
        .to_pandas()  # output-sized: n_queries * k per input block
    )
    rows = []
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(), -g["cos"].to_numpy()))[:k]
        votes = g["label"].to_numpy()[order]
        counts = np.bincount(votes)
        best = np.lexsort((np.arange(len(counts)), -counts))[0]
        rows.append({"query_id": int(qid), "predicted": int(best)})
    rows.sort(key=lambda r: r["query_id"])
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("query_id", pa.int64()), ("predicted", pa.int64())])
    )


KNN_ORACLE_SQL = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
    "ORDER BY vec_id LIMIT 20), "
    "nn AS (SELECT q.query_id, b.label, ROW_NUMBER() OVER (PARTITION BY q.query_id "
    "ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
    "FROM q JOIN embeddings b ON b.vec_id <> q.query_id), "
    "votes AS (SELECT query_id, label, COUNT(*) AS c FROM nn WHERE rn <= 10 GROUP BY 1, 2) "
    "SELECT query_id, CAST(label AS BIGINT) AS predicted FROM ("
    "SELECT query_id, label, ROW_NUMBER() OVER (PARTITION BY query_id "
    "ORDER BY c DESC, label) AS r FROM votes) WHERE r = 1 ORDER BY query_id"
)


# ---------------- Naive Bayes text classifier ----------------


def train_naive_bayes(ds: ray.data.Dataset, text_col: str = "text",
                      class_col: str = "lang", alpha: float = 1.0) -> dict:
    """Map-side partial (class, term) counts -> driver combine (model is
    vocab x classes), returning numpy model arrays."""

    def partial(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(pc.cast(t.column(text_col), pa.string()), r"\s+")
        flat = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(parts).to_numpy()
        nonempty = flat != ""  # empty tokens would collide with the prior marker
        flat, parent = flat[nonempty], parent[nonempty]
        cls = t.column(class_col).to_numpy(zero_copy_only=False)[parent]
        key = np.char.add(np.char.add(cls.astype(str), "\t"), flat.astype(str))
        uk, counts = np.unique(key, return_counts=True)
        cl, tm = np.char.partition(uk, "\t")[:, 0], np.char.partition(uk, "\t")[:, 2]
        # per-class doc counts for the prior
        ucls, dcounts = np.unique(t.column(class_col).to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "cls": pa.array(np.concatenate([cl, ucls]).tolist(), pa.string()),
                "term": pa.array(tm.tolist() + [""] * len(ucls), pa.string()),
                "count": pa.array(np.concatenate([counts, dcounts]), pa.int64()),
            }
        )

    import pandas as pd
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    combined = parts.groupby(["cls", "term"], as_index=False)["count"].sum()
    classes = np.sort(combined["cls"].unique())
    vocab = np.sort(combined.loc[combined["term"] != "", "term"].unique())
    c_idx = {c: i for i, c in enumerate(classes)}
    counts = np.zeros((len(classes), len(vocab)), dtype=np.float64)
    priors = np.zeros(len(classes), dtype=np.float64)
    tpos = np.searchsorted(vocab, combined["term"].to_numpy())
    for cls, term, cnt, tp in zip(combined["cls"], combined["term"],
                                  combined["count"], tpos):
        if term == "":
            priors[c_idx[cls]] += cnt
        else:
            counts[c_idx[cls], tp] += cnt
    totals = counts.sum(axis=1, keepdims=True)
    log_cond = np.log((counts + alpha) / (totals + alpha * len(vocab)))
    log_unseen = np.log(alpha / (totals[:, 0] + alpha * len(vocab)))
    log_prior = np.log(priors / priors.sum())
    return {
        "classes": classes, "vocab": vocab, "log_cond": log_cond,
        "log_unseen": log_unseen, "log_prior": log_prior,
    }


class _NbPredictStage:
    """Model broadcast once per actor (ray.put ref); vectorized scoring:
    token -> vocab index via searchsorted, per-doc class scores via
    np.add.at over (doc, class) partial matrices."""

    def __init__(self, model_ref, text_col: str = "text"):
        self.m = ray.get(model_ref)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = self.m
        parts = pc.split_pattern_regex(pc.cast(t.column(self.text_col), pa.string()), r"\s+")
        flat = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(parts).to_numpy()
        nonempty = flat != ""
        flat, parent = flat[nonempty], parent[nonempty]
        n = len(t)
        pos = np.searchsorted(m["vocab"], flat)
        pos_c = np.clip(pos, 0, len(m["vocab"]) - 1)
        known = m["vocab"][pos_c] == flat
        scores = np.tile(m["log_prior"], (n, 1))  # (n, C)
        for ci in range(len(m["classes"])):
            contrib = np.where(known, m["log_cond"][ci][pos_c], m["log_unseen"][ci])
            scores[:, ci] += np.bincount(parent, weights=contrib, minlength=n)
        best = np.argmax(scores, axis=1)  # argmax -> first (lowest class) on ties
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "predicted": pa.array(m["classes"][best].tolist(), pa.string()),
            }
        )


def nb_classify(sf_dir: str) -> ray.data.Dataset:
    """Train on the whole documents table (lang as class), predict every
    doc's lang -> (doc_id, predicted). Deterministic; accuracy semantics
    are pytest-validated on a planted corpus (synthetic test langs are
    not text-correlated)."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    model = train_naive_bayes(ds)
    model_ref = ray.put(model)
    return ds.map_batches(
        _NbPredictStage,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        concurrency=pool_size(),
    ).select_columns(["doc_id", "predicted"]).sort("doc_id")


# ---------------- document clustering (exact-integer k-means) ----------------

# the fixture corpus's closed vocabulary (identical across sf dirs —
# asserted in tests); the tf-profile feature space for clustering
CLUSTER_VOCAB: tuple[str, ...] = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
)


def _profiles(sf_dir: str) -> ray.data.Dataset:
    """Per-doc integer term-count profile over CLUSTER_VOCAB (words not
    in the vocabulary are ignored — the fixture vocab is closed, so
    nothing is)."""
    vocab = np.array(CLUSTER_VOCAB, dtype=str)

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        out = np.zeros((len(texts), len(vocab)), np.int64)
        for i, s in enumerate(texts):
            toks = (s or "").split()
            if not toks:
                continue
            w, c = np.unique(np.asarray(toks, dtype=str), return_counts=True)
            pos = np.searchsorted(vocab, w)
            ok = (pos < len(vocab)) & (vocab[np.minimum(pos, len(vocab) - 1)] == w)
            out[i, pos[ok]] = c[ok]
        return pa.table({"doc_id": t.column("doc_id"),
                         "f": pa.array(out.tolist(), pa.list_(pa.int64()))})

    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def _profile_matrix(t: pa.Table) -> np.ndarray:
    """Zero-copy-ish (n, d) int64 from the constant-width list column —
    flatten the ListArray values instead of to_pylist row conversion."""
    col = t.column("f").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return flat.reshape(len(t), -1)


def _assign_sum(t: pa.Table, cent: np.ndarray) -> pa.Table:
    """One k-means iteration's map side: assign each doc to the nearest
    centroid (exact integer squared euclidean, ties to the lowest cid)
    and emit the batch's per-cluster profile sums + counts — a k x (d+1)
    integer partial, so the driver combine is model-sized, never
    corpus-sized (the map-side-combine groupby shape). A plain task fn
    (not an actor pool): per-iteration pool spin-up cost exceeded the
    work; the centroid ref is plasma-shared, ray.get per batch is free."""
    f = _profile_matrix(t)
    d2 = ((f[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # first min == lowest cid
    k, d = cent.shape
    sums = np.zeros((k, d), np.int64)
    counts = np.zeros(k, np.int64)
    for c in range(k):
        m = assign == c
        if m.any():
            sums[c] = f[m].sum(axis=0)
            counts[c] = int(m.sum())
    return pa.table({"cid": pa.array(np.arange(k, dtype=np.int64)),
                     "s": pa.array(sums.tolist(), pa.list_(pa.int64())),
                     "n": pa.array(counts)})


def _kmeans_centroids(sf_dir: str, k: int, iters: int):
    """Shared k-means driver loop -> (materialized profiles Dataset,
    final (k, d) int64 centroid matrix). Exact integer arithmetic —
    see cluster_kmeans_docs."""
    prof = _profiles(sf_dir).materialize()
    head = prof.sort("doc_id").limit(k).to_pandas()
    cent = np.array(head["f"].tolist(), dtype=np.int64)
    for _ in range(iters):
        cent_ref = ray.put(cent)
        partials = prof.map_batches(
            lambda t, r=cent_ref: _assign_sum(t, ray.get(r)),
            batch_format="pyarrow",
        ).to_pandas()
        kk, d = cent.shape
        sums = np.zeros((kk, d), np.int64)
        counts = np.zeros(kk, np.int64)
        for cid, g in partials.groupby("cid"):
            sums[cid] = np.array(g["s"].tolist(), dtype=np.int64).sum(axis=0)
            counts[cid] = int(g["n"].sum())
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = (2 * sums[nz] + counts[nz, None]) // (2 * counts[nz, None])
    return prof, cent


def cluster_labels(sf_dir: str, k: int = 8, iters: int = 5,
                   top_n: int = 3) -> pa.Table:
    """Cluster LABELS for the ClusteringComponent analogue — Carrot2's
    human-readable cluster descriptions ([U] solr/contrib/clustering/
    .../CarrotClusteringEngine.java getClusters label extraction),
    re-expressed as the top-``top_n`` most DISTINCTIVE vocabulary terms
    per k-means cluster: lift_milli = (tf_in_cluster * 1_000_000) //
    tf_corpus — exact integer division, so ranking (lift desc, term asc)
    is hash-stable and the SQL oracle replicates it literally on top of
    the unrolled k-means CTE chain.

    Scale shape: reuses the trained centroids; ONE extra _assign_sum
    pass over the profiles yields per-cluster term sums as k x (d+1)
    partials (model-sized driver combine); the label ranking itself is
    model-sized."""
    prof, cent = _kmeans_centroids(sf_dir, k, iters)
    cent_ref = ray.put(cent)
    partials = prof.map_batches(
        lambda t, r=cent_ref: _assign_sum(t, ray.get(r)),
        batch_format="pyarrow",
    ).to_pandas()
    kk, d = cent.shape
    tf_c = np.zeros((kk, d), np.int64)
    for cid, g in partials.groupby("cid"):
        tf_c[cid] = np.array(g["s"].tolist(), dtype=np.int64).sum(axis=0)
    tf_all = tf_c.sum(axis=0)
    vocab = np.array(CLUSTER_VOCAB, dtype=object)
    rows = []
    for c in range(kk):
        ok = (tf_all > 0) & (tf_c[c] > 0)
        lift = np.zeros(d, np.int64)
        lift[ok] = (tf_c[c][ok] * 1_000_000) // tf_all[ok]
        order = sorted(np.flatnonzero(ok), key=lambda i: (-int(lift[i]), str(vocab[i])))
        for r, i in enumerate(order[:top_n]):
            rows.append({"cluster_id": c, "label_rank": r,
                         "term": str(vocab[i]), "lift_milli": int(lift[i])})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("cluster_id", pa.int64()), ("label_rank", pa.int64()),
        ("term", pa.string()), ("lift_milli", pa.int64())]))


def cluster_kmeans_docs(sf_dir: str, k: int = 8, iters: int = 5) -> ray.data.Dataset:
    """Document clustering over integer tf profiles — the Solr
    ClusteringComponent analogue ([U] solr/contrib/clustering/.../
    CarrotClusteringEngine.java; algorithm swapped for k-means, which is
    SQL-oracle-able). EXACT INTEGER arithmetic end to end: distances are
    int64 squared euclidean and each new centroid component is the
    round-half-up integer mean (2*S + n) // (2*n), so the DuckDB oracle
    replicates every iteration bit-for-bit (no float summation-order
    hazard). Empty clusters keep their previous centroid. Init: profiles
    of the k smallest doc_ids.

    Scale shape: profiles are computed once and reused; each iteration
    is one map_batches pass emitting k x (d+1) integer partials (driver
    combine is model-sized); centroids broadcast via ray.put."""
    prof, cent = _kmeans_centroids(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def final(t: pa.Table, r=cent_ref) -> pa.Table:
        c = ray.get(r)
        f = _profile_matrix(t)
        d2 = ((f[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "cluster_id": pa.array(assign),
                         "dist_sq": pa.array(d2[np.arange(len(f)), assign])})

    return prof.map_batches(final, batch_format="pyarrow").sort("doc_id")


# ---------------- TextLogitStream (distributed logistic regression) ---------


LOGIT_TERMS = ("batch", "scan", "hash", "join", "sort", "stream", "window",
               "vector")


def _logit_tdiv(a: int, b: int) -> int:
    """Truncating integer division toward zero — DuckDB BIGINT ``//``."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _logit_xy(t: pa.Table, terms: tuple, label_term: str):
    """Term-presence design matrix (n x m, {0,1} int64) + label vector
    (contains ``label_term``) from whitespace-split text — the identical
    predicate the SQL oracle writes as list_contains(split, term)."""
    texts = t.column("text").to_pylist()
    n, m = len(texts), len(terms)
    X = np.zeros((n, m), np.int64)
    y = np.zeros(n, np.int64)
    for i, s in enumerate(texts):
        toks = set(s.split())
        if label_term in toks:
            y[i] = 1
        for j, trm in enumerate(terms):
            if trm in toks:
                X[i, j] = 1
    return X, y


def _logit_weights(sf_dir: str, terms: tuple, label_term: str,
                   iters: int) -> np.ndarray:
    """Batch gradient descent for logistic regression with an EXACT
    integer protocol ([U] solr/solrj/.../io/stream/TextLogitStream.java
    trains the same model with per-shard partial gradients):

    - weights live as int64 micro-units, w0 = 0;
    - per doc: z_micro = X @ w + w_bias (exact int64),
      p = 1/(1+exp(-z_micro*1e-6)) (float64, the ONE pinned float op),
      r_micro = floor(p*1e6 + 0.5) - y*1e6 (order-independent exact int);
    - per-feature gradient g_j = sum(r_micro * x_j) — map-side partial
      int64 sums per batch, one model-sized Sum aggregate (the dsir
      micro-nat pattern);
    - update w_j -= tdiv(g_j, n) (learning rate 1, truncating division
      = DuckDB BIGINT //, so the unrolled SQL oracle replicates every
      iteration bit-for-bit).

    Scale shape: each iteration is ONE streaming pass emitting an
    (m+2)-column single-row partial per batch; the model (9 ints) is
    closure-captured, never a dict, never re-shipped per row."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
    m = len(terms)
    w = np.zeros(m + 1, np.int64)  # [0..m-1] term weights, [m] bias
    for _ in range(iters):
        wc = w.copy()

        def grad(t: pa.Table, wc=wc) -> pa.Table:
            X, y = _logit_xy(t, terms, label_term)
            z = X @ wc[:-1] + wc[-1]
            p = 1.0 / (1.0 + np.exp(-(z * 1e-6)))
            r = np.floor(p * 1e6 + 0.5).astype(np.int64) - y * 1_000_000
            g = X.T @ r
            cols = {f"g{j}": pa.array([int(g[j])], pa.int64())
                    for j in range(m)}
            cols["gb"] = pa.array([int(r.sum())], pa.int64())
            cols["nn"] = pa.array([t.num_rows], pa.int64())
            return pa.table(cols)

        aggs = [Sum(f"g{j}", alias_name=f"g{j}") for j in range(m)]
        aggs += [Sum("gb", alias_name="gb"), Sum("nn", alias_name="nn")]
        row = ds.map_batches(grad, batch_format="pyarrow").aggregate(*aggs)
        n = int(row["nn"])
        for j in range(m):
            w[j] -= _logit_tdiv(int(row[f"g{j}"]), n)
        w[m] -= _logit_tdiv(int(row["gb"]), n)
    return w


def text_logit_train(sf_dir: str, terms: tuple = LOGIT_TERMS,
                     label_term: str = "merge",
                     iters: int = 3) -> ray.data.Dataset:
    """train() stream: final-iteration model as (feature, weight_micro)
    rows (bias = '__bias__')."""
    w = _logit_weights(sf_dir, terms, label_term, iters)
    feats = list(terms) + ["__bias__"]
    return ray.data.from_arrow(pa.table({
        "feature": pa.array(feats, pa.string()),
        "weight_micro": pa.array(w.tolist(), pa.int64()),
    }))


def text_logit_classify(sf_dir: str, terms: tuple = LOGIT_TERMS,
                        label_term: str = "merge",
                        iters: int = 3) -> ray.data.Dataset:
    """classify() stream ([U] solr/solrj/.../io/stream/ClassifyStream.java):
    score every doc under the trained model — one streaming pass with
    the 9-int model closure-captured; prob_micro = floor(p*1e6+0.5),
    predicted = prob_micro >= 500000."""
    w = _logit_weights(sf_dir, terms, label_term, iters)

    def score(t: pa.Table) -> pa.Table:
        X, _ = _logit_xy(t, terms, label_term)
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-(z * 1e-6)))
        pm = np.floor(p * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "prob_micro": pa.array(pm, pa.int64()),
            "predicted": pa.array((pm >= 500_000).astype(np.int64)),
        })

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def classifier_pr_points(sf_dir: str, terms: tuple = LOGIT_TERMS,
                         label_term: str = "merge", iters: int = 3,
                         thresholds: tuple = (100_000, 300_000, 500_000,
                                              700_000, 900_000)
                         ) -> ray.data.Dataset:
    """Classifier calibration sweep — the eval operator a model-based
    curation stage needs before picking a keep threshold: for each
    probability cutoff, exact (tp, fp, fn) counts plus
    precision/recall in micro-units (tdiv, 0 when undefined).

    Scale shape: ONE streaming scoring pass; each batch emits a
    len(thresholds) x 3 integer partial, combined by one model-sized
    Sum aggregate — no per-doc rows leave the pass."""
    from ray.data.aggregate import Sum

    w = _logit_weights(sf_dir, terms, label_term, iters)
    ths = tuple(int(t) for t in thresholds)

    def counts(t: pa.Table) -> pa.Table:
        X, y = _logit_xy(t, terms, label_term)
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-(z * 1e-6)))
        pm = np.floor(p * 1e6 + 0.5).astype(np.int64)
        cols = {}
        for th in ths:
            pred = pm >= th
            cols[f"tp{th}"] = pa.array([int((pred & (y == 1)).sum())], pa.int64())
            cols[f"fp{th}"] = pa.array([int((pred & (y == 0)).sum())], pa.int64())
            cols[f"fn{th}"] = pa.array([int((~pred & (y == 1)).sum())], pa.int64())
        return pa.table(cols)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])
    aggs = [Sum(f"{m}{th}", alias_name=f"{m}{th}")
            for th in ths for m in ("tp", "fp", "fn")]
    row = ds.map_batches(counts, batch_format="pyarrow").aggregate(*aggs)
    out = {"threshold": [], "tp": [], "fp": [], "fn": [],
           "precision_micro": [], "recall_micro": []}
    for th in ths:
        tp, fp, fn = (int(row[f"tp{th}"]), int(row[f"fp{th}"]),
                      int(row[f"fn{th}"]))
        out["threshold"].append(th)
        out["tp"].append(tp)
        out["fp"].append(fp)
        out["fn"].append(fn)
        out["precision_micro"].append(
            _logit_tdiv(tp * 1_000_000, tp + fp) if tp + fp else 0)
        out["recall_micro"].append(
            _logit_tdiv(tp * 1_000_000, tp + fn) if tp + fn else 0)
    return ray.data.from_arrow(pa.table(
        {k: pa.array(v, pa.int64()) for k, v in out.items()}))


# ---------------- feature selection (information gain) ----------------

def _h_scaled(a: np.ndarray, n: np.ndarray) -> np.ndarray:
    """n * binaryEntropy(a/n) in micro-nats, EXACT int64: per-log
    micro-nat quantization L(x) = floor(ln(x)*1e6 + 0.5) makes every
    term an integer product, and 0*log0 terms drop. H_scaled(a, n) =
    a*(L(n)-L(a)) + (n-a)*(L(n)-L(n-a))."""
    a = np.asarray(a, np.int64)
    n = np.asarray(n, np.int64)

    def L(x):
        x = np.asarray(x, np.float64)
        out = np.zeros_like(x)
        pos = x > 0
        out[pos] = np.floor(np.log(x[pos]) * 1e6 + 0.5)
        return out.astype(np.int64)

    ln_, la, lr = L(n), L(a), L(n - a)
    t1 = np.where(a > 0, a * (ln_ - la), 0)
    t2 = np.where(n - a > 0, (n - a) * (ln_ - lr), 0)
    return (t1 + t2).astype(np.int64)


def features_select(sf_dir: str, label_lang: str = "en", k: int = 12) -> pa.Table:
    """FeaturesSelectionStream ([U] solr/solrj/.../io/stream/
    FeaturesSelectionStream.java + solr/core/.../search/
    IGainTermsQParserPlugin.java): the top-k terms by information gain
    for the binary class lang == label_lang —
    ig = H(C) - P(t)H(C|t) - P(!t)H(C|!t). Multiplying through by N
    turns it into ig_scaled = Hs(Np,N) - Hs(pdf,df) - Hs(Np-pdf,N-df)
    with Hs the exact-int scaled entropy above, so the score is an
    exact int64 the SQL oracle reproduces (same rank order as ig: the
    1/N factor is constant).

    Scale shape: per-batch Counter partials over DISTINCT stop-filtered
    doc terms -> one vocab groupby; the IG pass runs on the vocab-sized
    table."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import tokenize
    from lucene_solr_ray.io_utils import read_parquet_clean

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        df_c: Counter = Counter()
        pdf_c: Counter = Counter()
        n = np.int64(len(t))
        np_ = np.int64(0)
        for lang, s in zip(t.column("lang").to_pylist(),
                           t.column("text").to_pylist()):
            ts = set(tokenize(s or ""))
            df_c.update(ts)
            if lang == label_lang:
                np_ += 1
                pdf_c.update(ts)
        terms = list(df_c)
        return pa.table({
            "term": pa.array(terms + ["\x00N"], pa.string()),
            "df": pa.array([df_c[t_] for t_ in terms] + [int(n)], pa.int64()),
            "pdf": pa.array([pdf_c.get(t_, 0) for t_ in terms] + [int(np_)], pa.int64()),
        })

    vocab = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("pdf", alias_name="pdf"))
        .to_pandas()
    )
    tot = vocab[vocab["term"] == "\x00N"]
    n, np_ = int(tot["df"].iloc[0]), int(tot["pdf"].iloc[0])
    vocab = vocab[vocab["term"] != "\x00N"]
    df = vocab["df"].to_numpy().astype(np.int64)
    pdf = vocab["pdf"].to_numpy().astype(np.int64)
    hc = int(_h_scaled(np.array([np_]), np.array([n]))[0])
    ig = hc - _h_scaled(pdf, df) - _h_scaled(np_ - pdf, n - df)
    order = np.lexsort((vocab["term"].to_numpy(), -ig))[:k]
    return pa.table({
        "sel_rank": pa.array(np.arange(len(order)), pa.int64()),
        "term": pa.array(vocab["term"].to_numpy()[order].astype(str), pa.string()),
        "df": pa.array(df[order], pa.int64()),
        "positive_df": pa.array(pdf[order], pa.int64()),
        "ig_n_micro": pa.array(ig[order].astype(np.int64), pa.int64()),
    })


def features_select_sql(label_lang: str = "en", k: int = 12) -> str:
    """Oracle for features_select — identical per-log micro-nat
    quantization and scaled-entropy integer arithmetic in SQL."""
    from lucene_solr_ray.analysis import STOPWORDS

    def L(x):
        return f"CAST(FLOOR(ln(CAST({x} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"

    def hs(a, n):
        return (f"(CASE WHEN {a} > 0 THEN {a} * ({L(n)} - {L(a)}) ELSE 0 END "
                f"+ CASE WHEN {n} - {a} > 0 THEN ({n} - {a}) * ({L(n)} - {L(f'{n} - {a}')}) ELSE 0 END)")

    stop = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"
    split = ("list_filter(regexp_split_to_array(trim(text), '\\s+'), "
             f"x -> NOT list_contains({stop}, x))")
    return (
        "WITH d AS (SELECT doc_id, lang, CASE WHEN trim(text) = '' THEN [] ELSE "
        f"list_distinct({split}) END AS ts FROM documents), "
        f"tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CASE WHEN lang = '{label_lang}' THEN 1 ELSE 0 END) AS BIGINT) AS np FROM d), "
        "t AS (SELECT unnest(ts) AS term, lang FROM d), "
        "c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, "
        f"CAST(SUM(CASE WHEN lang = '{label_lang}' THEN 1 ELSE 0 END) AS BIGINT) AS pdf "
        "FROM t GROUP BY term), "
        "ig AS (SELECT term, df, pdf AS positive_df, "
        f"{hs('tot.np', 'tot.n')} - {hs('c.pdf', 'c.df')} - {hs('(tot.np - c.pdf)', '(tot.n - c.df)')} "
        "AS ig_n_micro FROM c, tot) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY ig_n_micro DESC, term) - 1 AS BIGINT) AS sel_rank, "
        f"term, df, positive_df, ig_n_micro FROM ig ORDER BY ig_n_micro DESC, term LIMIT {int(k)}"
    )
