"""Dedup / ANN / text / multimodal operator tests over the driver's
sf0.001 tables (read-only inputs; FIXTURES.md §1 secondary corpus)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_minhash_lsh_recall_vs_exact():
    """MinHash-LSH output must EQUAL the exact n-gram Jaccard pairs at the
    gate threshold: the verify step is the exact shingle join and every
    planted dup has jaccard >= 0.889, so per-pair LSH miss probability is
    <= (1-0.889^4)^16 ~ 2e-7. This equality is what licenses reusing the
    ngram SQL as dedup_minhash_lsh's driver oracle."""
    from lucene_solr_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(SF, threshold_pct=30).to_pylist()
    approx = minhash_lsh_pairs(SF, jaccard_threshold=0.3).to_pylist()
    assert len(exact) > 0, "fixture corpus should contain planted near-dups"
    assert approx == exact  # full rows incl. jaccard_pct, sorted


def test_simhash_pairs_are_near_dups():
    from lucene_solr_ray.functions.dedup import ngram_jaccard_pairs, simhash_near_pairs

    sim_pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_near_pairs(SF, max_hamming=3).to_pylist()}
    exact = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(SF, threshold_pct=70).to_pylist()}
    assert len(sim_pairs) > 0
    # very-near dups (jaccard >= 0.7) should nearly all be hamming-close
    assert len(exact & sim_pairs) >= 0.8 * len(exact)


def test_exact_dedup_keeps_min_doc_id():
    from lucene_solr_ray.functions.dedup import exact_dedup

    kept = exact_dedup(SF).to_pandas()["doc_id"].tolist()
    assert kept == sorted(kept)
    assert len(kept) <= 500


def test_ann_ivf_equals_brute_at_gate_nprobe():
    """The persisted IVF index at n_probe=30/32 must reproduce brute
    exactly on the gate corpus (licenses the brute SQL as its oracle)."""
    from lucene_solr_ray.functions.ann import ann_brute_topk, ann_ivf_topk

    brute = ann_brute_topk(SF, k=10, n_queries=5).to_pylist()
    ivf = ann_ivf_topk(SF, k=10, n_queries=5).to_pylist()
    assert ivf == brute


def test_ann_ivf_index_layout_and_selective_read():
    """The IVF index is a real persisted artifact: one hive partition per
    cluster + centroids + manifest, and the query path's file list covers
    ONLY the probed clusters' partitions."""
    import json
    import os

    from lucene_solr_ray.functions.ann import build_ivf_index, probed_partition_paths

    idx = build_ivf_index(SF)
    man = json.load(open(os.path.join(idx, "manifest.json")))
    assert man["n_clusters"] == 32
    dirs = {d for d in os.listdir(os.path.join(idx, "clusters")) if d.startswith("cluster=")}
    assert dirs == {f"cluster={c}" for c in man["clusters_present"]}
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    # probing clusters {0, 5} must select files under exactly those dirs
    paths = probed_partition_paths(idx, [5, 0])
    assert paths and all(("cluster=0" in p) or ("cluster=5" in p) for p in paths)
    probed_dirs = {p.split("/clusters/")[1].split("/")[0] for p in paths}
    assert probed_dirs <= {"cluster=0", "cluster=5"}
    # row counts across all partitions == corpus size (nothing dropped)
    import pyarrow.dataset as pads

    total = pads.dataset(os.path.join(idx, "clusters"), format="parquet",
                         partitioning="hive").count_rows()
    assert total == 500


def test_rolling_fingerprint_deterministic_and_discriminative():
    from lucene_solr_ray.functions.textstats import rolling_fingerprint

    a = rolling_fingerprint(SF).to_pandas()
    b = rolling_fingerprint(SF).to_pandas()
    assert a.equals(b)
    assert a["fingerprint"].nunique() > 400  # distinct docs -> distinct prints


def test_multimodal_stub_raises_and_fake_decodes():
    import pyarrow as pa

    from lucene_solr_ray.functions.multimodal import DecodeStage, fake_decode

    t = pa.table({"doc_id": [1], "payload": pa.array([b"xx"], pa.binary()),
                  "media_type": ["text/plain"]})
    with pytest.raises(NotImplementedError):
        DecodeStage(decoder="real")(t)
    out = fake_decode(SF).to_pandas()
    assert len(out) == 500
    assert (out["width"] >= 1).all() and (out["width"] <= 1920).all()
    assert set(out.columns) == {"doc_id", "n_bytes", "digest", "width", "height", "channels"}
    # deterministic
    out2 = fake_decode(SF).to_pandas()
    assert out.equals(out2)


def test_entry_contract_smoke():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    res = m.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id"}
    qs = m.queries()
    sqls = m.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 35


def test_hll_accuracy_vs_exact():
    import duckdb

    from lucene_solr_ray.functions.sketches import hll_distinct

    est = hll_distinct(SF).to_pylist()[0]["approx_distinct"]
    exact = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) <= max(3, 0.05 * exact), (est, exact)


def test_tdigest_accuracy_vs_exact():
    import duckdb

    from lucene_solr_ray.functions.sketches import tdigest_quantiles

    got = {r["q_milli"]: r["value_milli"] / 1000.0 for r in tdigest_quantiles(SF).to_pylist()}
    con = duckdb.connect()
    for q_milli, q in ((500, 0.5), (900, 0.9), (990, 0.99)):
        exact = con.execute(
            f"SELECT quantile_cont(value, {q}) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        span = con.execute(
            f"SELECT MAX(value) - MIN(value) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        assert abs(got[q_milli] - exact) <= 0.05 * span, (q, got[q_milli], exact)


def test_multi_term_expansion():
    from lucene_solr_ray.functions.fulltext import docs_index
    from lucene_solr_ray.pipelines.search import IndexSearcher

    s = IndexSearcher(docs_index(SF))
    pref = s.expand_terms("prefix", "s")
    assert all(t.startswith("s") for t in pref) and "spark" in pref
    rng = s.expand_terms("range", "key:part")
    assert all("key" <= t < "part" for t in rng)
    wc = s.expand_terms("wildcard", "s*m")
    assert wc == ["stream"]
    rx = s.expand_terms("regexp", "(stream|spark)")
    assert rx == ["spark", "stream"]


def test_percolate_and_highlight_shapes():
    from lucene_solr_ray.functions.monitor import highlight, percolate

    out = percolate(SF, [{"query_id": "q1", "type": "and", "terms": ["merge", "join"]}]).to_pandas()
    assert len(out) > 0 and set(out.columns) == {"doc_id", "query_id"}
    hl = highlight(SF, ["vector"]).to_pandas()
    assert len(hl) > 0
    assert hl["snippet"].str.contains("<em>").all()


def test_embedding_cosine_lsh_recall_vs_exact():
    """SRP-LSH output must EQUAL the exact block-pair path at the gate
    threshold: verify is exact cosine (no false positives) and 64 bands x
    4 planes give per-pair recall 1 - 8.6e-6 at cos 0.42. This equality
    licenses the exact-cosine SQL as dedup_embedding_lsh's oracle."""
    from lucene_solr_ray.functions.dedup import embedding_cosine_pairs, embedding_lsh_pairs

    exact = [(r["doc_a"], r["doc_b"])
             for r in embedding_cosine_pairs(SF, threshold=0.42).take_all()]
    approx = [(r["doc_a"], r["doc_b"])
              for r in embedding_lsh_pairs(SF, threshold=0.42).take_all()]
    assert len(exact) > 0
    assert approx == exact


def test_percolate_parsed_matcher():
    """Parsed-query percolation: occur semantics + phrase positions with
    stopword gaps evaluated per document (no index needed)."""
    from lucene_solr_ray.functions.monitor import PercolateStage

    stage = PercolateStage([
        {"query_id": "p1", "type": "parsed", "query": '+alpha +"beta gamma" -delta'},
        {"query_id": "p2", "type": "parsed", "query": "alpha epsilon"},
        {"query_id": "p3", "type": "parsed", "query": '+"beta the gamma"'},
    ])
    import pyarrow as pa

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta gamma words",        # p1 (phrase adjacent), p2
            "alpha beta gamma delta",        # -delta kills p1; p2 matches
            "beta the gamma alpha",          # p3 (stopword gap phrase); p2; p1 no (beta gamma not adjacent)
            "epsilon only here",             # p2 (should: any)
        ]),
    })
    out = stage(docs)
    pairs = sorted(zip(out.column("doc_id").to_pylist(), out.column("query_id").to_pylist()))
    assert pairs == [(0, "p1"), (0, "p2"), (1, "p2"), (2, "p2"), (2, "p3"), (3, "p2")]


def test_connected_components_matches_union_find():
    """Min-label propagation fixpoint == union-find closure on the real
    near-dup pair graph, including a synthetic long path (diameter 5) to
    force multi-round convergence."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from lucene_solr_ray.functions.dedup import (connected_components,
                                                 dedup_connected_components,
                                                 ngram_jaccard_pairs)

    # synthetic: path 100-101-102-103-104-105 plus a far singleton edge
    path = pa.table({"doc_a": pa.array([100, 101, 102, 103, 104, 7], pa.int64()),
                     "doc_b": pa.array([101, 102, 103, 104, 105, 9], pa.int64())})
    labs = connected_components(ray.data.from_arrow(path)).to_pandas()
    got = dict(zip(labs["node"], labs["lab"]))
    assert all(got[n] == 100 for n in range(100, 106))
    assert got[7] == 7 and got[9] == 7

    # real pairs at sf0.001 vs union-find
    pairs = ngram_jaccard_pairs("/root/testdata/sf0.001", threshold_pct=30).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in parent}
    import collections
    sizes = collections.Counter(comp.values())
    exp = sorted((n, c, sizes[c], int(n == c)) for n, c in comp.items())
    t = dedup_connected_components("/root/testdata/sf0.001")
    got_rows = sorted(zip(t["doc_id"].to_pylist(), t["canon_id"].to_pylist(),
                          t["n_members"].to_pylist(), t["keep"].to_pylist()))
    assert got_rows == exp


def test_point_index_selective_read_and_exactness():
    """BKD-analogue point index: bbox query == brute-force bbox filter;
    only intersecting cells' partitions are read; a bbox cutting through
    cell interiors still returns exact (per-batch filtered) results."""
    import json
    import os
    import numpy as np
    from lucene_solr_ray.functions import geo

    sf = "/root/testdata/sf0.001"
    bbox = (-12.0, 33.0, -77.0, 41.0)  # deliberately not cell-aligned
    got = geo.point_bbox_query(sf, bbox).to_pandas()["c_custkey"].to_numpy()

    import pyarrow.parquet as pq
    k = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])["c_custkey"].to_numpy()
    lat, lon = geo.derive_coords(k.astype(np.int64))
    m = (lat >= bbox[0]) & (lat <= bbox[1]) & (lon >= bbox[2]) & (lon <= bbox[3])
    assert np.array_equal(got, np.sort(k[m]))

    idx = geo.build_point_index(sf)
    paths, hit = geo.point_index_paths(idx, bbox)
    manifest = json.load(open(os.path.join(idx, "manifest.json")))
    assert 0 < len(hit) < len(manifest["cells_present"])  # genuinely selective
    # every returned point's cell is in the probed set
    n_cols = manifest["n_cols"]
    cd = manifest["cell_deg"]
    cells = (((got * 37) % 180) // cd) * n_cols + ((got * 73) % 360) // cd
    assert set(cells.tolist()) <= set(hit)


def test_ann_pq_oracle_equivalence_and_recall():
    """PQ ADC vs the DuckDB replica of the whole pipeline (exact int64),
    plus a sanity recall bound vs brute cosine: quantized top-10 should
    recover most of the true top-10 on the gate corpus."""
    import duckdb

    from lucene_solr_ray.functions.ann import ann_brute_topk, ann_pq_topk
    from lucene_solr_ray.functions.data_oracle import ann_pq_sql

    got = ann_pq_topk(SF, k=10, n_queries=5).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    exp = con.execute(ann_pq_sql()).fetchdf()
    assert list(got.columns) == list(exp.columns)
    assert got.equals(exp.astype(got.dtypes.to_dict()))

    brute = ann_brute_topk(SF, k=10, n_queries=5).to_pandas()
    recall = 0.0
    for qid in brute["query_id"].unique():
        b = set(brute[brute.query_id == qid]["neighbor_id"])
        p = set(got[got.query_id == qid]["neighbor_id"])
        recall += len(b & p) / len(b)
    recall /= brute["query_id"].nunique()
    # euclidean-on-quantized vs cosine ranking on isotropic unit vectors:
    # PQ with a 32-codeword sampled codebook is an approximation by
    # design; this guards against a silent total-garbage regression
    assert recall >= 0.2, recall


def test_ann_pq_codebook_vectors_encode_to_themselves():
    """A vector that IS codeword c in every subspace gets code c and
    ADC distance == the LUT's distance to itself (0 when the query is
    the codeword)."""
    from lucene_solr_ray.functions.ann import ann_pq_topk

    # query 0 is also codebook entry 0 -> its ADC self-distance is 0,
    # but self is excluded; just assert deterministic top-1 stability
    a = ann_pq_topk(SF, k=3, n_queries=2).to_pylist()
    b = ann_pq_topk(SF, k=3, n_queries=2).to_pylist()
    assert a == b and len(a) == 6


def test_semdedup_oracle_equivalence_and_subset():
    """SemDeDup matches its DuckDB replica; every within-cluster dup pair
    it finds is also an exact global cosine pair (no false positives —
    the cluster restriction can only LOSE cross-cluster pairs, the
    published trade-off); keepers are component minima."""
    import duckdb

    import __ray_entry__ as entrymod
    from lucene_solr_ray.functions.dedup import embedding_cosine_pairs, semdedup_keep

    got = semdedup_keep(SF, n_clusters=16, threshold=0.42).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    exp = con.execute(entrymod.oracle_sql()["semdedup_keep"]).fetchdf()
    assert list(got.columns) == list(exp.columns)
    assert got.equals(exp.astype(got.dtypes.to_dict()))

    exact = embedding_cosine_pairs(SF, threshold=0.42).to_pandas()
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    by_comp = got.groupby("keep_id")["vec_id"].apply(list)
    for keep, members in by_comp.items():
        assert keep == min(members)
        assert (got[got.vec_id == keep]["kept"] == 1).all()
    # each non-keeper joined its component through some exact pair
    for comp in by_comp:
        for m in comp:
            if m == min(comp):
                continue
            assert any((min(a, m), max(a, m)) in exact_pairs for a in comp if a != m), comp


def test_space_saving_bounds_and_merge():
    """SpaceSaving guarantees on a high-cardinality Zipf stream where
    evictions DO fire: count-err <= true <= count per surviving item,
    err <= N/capacity, and every item with true count > N/capacity
    survives (the heavy-hitter guarantee). Merged partials keep the
    additive bound."""
    from collections import Counter

    from lucene_solr_ray.functions.sketches import _space_saving

    rng = np.random.default_rng(11)
    zipf = np.minimum(rng.zipf(1.3, size=20000), 5000)
    stream = [f"w{v}" for v in zipf]
    cap = 64
    sk = _space_saving(stream, cap)
    assert len(sk) <= cap
    true = Counter(stream)
    n = len(stream)
    for item, (cnt, err) in sk.items():
        assert err <= n // cap + 1
        assert cnt - err <= true[item] <= cnt, item
    for item, c in true.items():
        if c > n / cap:
            assert item in sk, (item, c)

    # mergeable partials: term-summed (cnt, err) keeps count-err <= true <= count
    half = len(stream) // 2
    a, b = _space_saving(stream[:half], cap), _space_saving(stream[half:], cap)
    merged = {}
    for sk_part in (a, b):
        for t, (c, e) in sk_part.items():
            pc, pe = merged.get(t, (0, 0))
            merged[t] = (pc + c, pe + e)
    for item, (cnt, err) in merged.items():
        assert cnt - err <= true[item] <= cnt + err, item


def test_sample_fixed_k_bottom_k_and_merge_associativity():
    """sample_fixed_k == global bottom-k by md5-64 priority regardless of
    batching (per-batch partials merge associatively), and k > n returns
    every row."""
    import hashlib

    import duckdb
    from lucene_solr_ray.functions.relational import sample_fixed_k

    got = sample_fixed_k(SF, k=40).to_pandas()
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')").fetchone()[0]
    ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet')"
    ).fetchdf()["doc_id"].to_numpy()
    pri = np.array([
        int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:8], "little") - (1 << 63)
        for d in ids
    ], dtype=np.int64)
    order = np.argsort(pri, kind="stable")
    assert got["doc_id"].tolist() == ids[order[:40]].tolist()
    assert got["priority"].tolist() == pri[order[:40]].tolist()
    assert len(sample_fixed_k(SF, k=10 * int(n)).to_pandas()) == n


def test_ann_ivfpq_equals_full_pq_scan():
    """IVFPQ at gate n_probe returns EXACTLY the full-corpus PQ ADC
    ranking (probe containment), and a low n_probe strictly narrows the
    candidate set (the selective path is real, not a re-scan)."""
    from lucene_solr_ray.functions.ann import ann_ivfpq_topk, ann_pq_topk

    full = ann_pq_topk(SF).to_pandas()
    ivfpq = ann_ivfpq_topk(SF).to_pandas()
    assert ivfpq.equals(full)
    narrow = ann_ivfpq_topk(SF, n_probe=2).to_pandas()
    # with 2/32 partitions probed the candidate pool shrinks: every
    # returned neighbor must come from the probed clusters, so the
    # result generally DIFFERS from the full scan (sanity: same schema,
    # <= k rows per query)
    assert list(narrow.columns) == list(full.columns)
    assert narrow.groupby("query_id").size().le(10).all()
    assert not narrow.equals(full)


def test_count_min_overestimates_only():
    """CM guarantees est >= true count; with width 16 << vocab some probe
    must actually over-count (collisions), and the absent probe's
    estimate is pure collision mass."""
    import duckdb

    from lucene_solr_ray.functions.sketches import count_min_estimate

    got = {r["term"]: r["est_n"] for r in count_min_estimate(SF).to_pylist()}
    exact = dict(duckdb.connect().execute(
        "SELECT term, COUNT(*) FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
        f"FROM read_parquet('{SF}/documents.parquet') WHERE trim(text) <> '') GROUP BY term"
    ).fetchall())
    for term, est in got.items():
        assert est >= exact.get(term, 0), (term, est)
    assert any(got[t] > exact.get(t, 0) for t in got), "width 16 must collide"
    assert got["zzz-absent"] >= 0


def test_ann_range_threshold_gap():
    """Measures the claim in ann.ann_range_search: the 0.30 threshold is
    >= 4e-4 away from every (first-5-query x corpus) cosine at every
    testdata sf, so numpy-vs-DuckDB float64 rounding cannot flip
    membership."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        arr = con.sql(
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id LIMIT 5) "
            "SELECT list_cosine_similarity(q.qe, b.embedding) AS c "
            f"FROM q, read_parquet('{sf}/embeddings.parquet') b "
            "WHERE b.vec_id != q.query_id"
        ).fetchnumpy()["c"]
        import numpy as _np

        assert _np.abs(arr - 0.30).min() >= 4e-4, sf
        assert (arr >= 0.30).sum() > 0, f"{sf}: threshold produces no matches"


def test_bpe_train_merges_vs_naive_reference():
    """The vocab-table merge loop == a naive reference that re-tokenizes
    the raw corpus word list every round (the literal Sennrich algo)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.textstats import bpe_train_merges

    got = bpe_train_merges(SF, n_merges=8)

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist()
    words = []
    for s in texts:
        if s and s.strip():
            words.extend(s.split())
    seqs = [list(w) for w in words]
    ref = []
    for _ in range(8):
        pairs = Counter()
        for sym in seqs:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += 1
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ref.append(best)
        joined = best[0] + best[1]
        for sym in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == best[0] and sym[i + 1] == best[1]:
                    sym[i:i + 2] = [joined]
                else:
                    i += 1
    assert got == ref
    assert len(got) == 8 and all(isinstance(a, str) and isinstance(b, str) for a, b in got)


def test_uuid_assign_rfc4122_v3():
    import uuid as _uuid

    import pyarrow as pa

    from lucene_solr_ray.sources.urp import UUIDAssign

    out = UUIDAssign()(pa.table({"text": ["hello world", "", "merge join"]}))
    for g in out.column("uuid").to_pylist():
        u = _uuid.UUID(g)
        assert u.version == 3 and u.variant == _uuid.RFC_4122
    # deterministic: same content -> same uuid
    again = UUIDAssign()(pa.table({"text": ["hello world"]}))
    assert again.column("uuid").to_pylist()[0] == out.column("uuid").to_pylist()[0]


def test_geo_polygon_concave_even_odd_and_boundary():
    """Concave polygon containment: engine == scalar even-odd reference
    on every customer point; a point inside the southern notch is OUT,
    a point above the notch apex is IN, and edge points are included."""
    import numpy as np
    import pyarrow.parquet as pq
    from lucene_solr_ray.functions import geo

    sf = "/root/testdata/sf0.001"
    verts = geo._poly_int_verts(geo.CONCAVE_POLY)

    def ref_inside(py: int, px: int) -> bool:
        inside, on_edge, n = False, False, len(verts)
        for i in range(n):
            (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            if (cross == 0 and min(x1, x2) <= px <= max(x1, x2)
                    and min(y1, y2) <= py <= max(y1, y2)):
                on_edge = True
            if y1 == y2:
                continue
            if (y1 > py) != (y2 > py):
                lhs = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
                if (lhs > 0) if y2 > y1 else (lhs < 0):
                    inside = not inside
        return inside or on_edge

    got = set(geo.geo_polygon_concave_docs(sf).to_pandas()["c_custkey"])
    keys = pq.read_table(f"{sf}/customer.parquet",
                         columns=["c_custkey"])["c_custkey"].to_numpy()
    exp = {int(k) for k in keys
           if ref_inside(int((k * 37) % 180) * 2 - 179,
                         int((k * 73) % 360) * 2 - 359)}
    assert got == exp and len(exp) > 0

    # semantic probes on the doubled grid (py, px)
    assert not ref_inside(-100, 1)      # (-50.0, 0.5): inside the notch -> OUT
    assert ref_inside(41, 21)           # (20.5, 10.5): above the apex -> IN
    assert ref_inside(-121, -41)        # on the notch edge vertex row -> boundary
    assert ref_inside(141, 0)           # (70.5, 0.0): on the north edge
    assert not ref_inside(143, 0)       # just north of it


def test_ann_ivf_recall_on_clustered_corpus():
    """The isotropic gate corpus forces n_probe ~ n_clusters; this pins
    the REAL operating regime: a mixture-of-Gaussians corpus where IVF
    at n_probe=8/32 must reach recall@10 >= 0.95 vs brute cosine, while
    reading only the probed partitions."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    from lucene_solr_ray.functions.ann import ann_brute_topk, ann_ivf_topk

    sf = "/tmp/lsr_mog_fixture"
    path = os.path.join(sf, "embeddings.parquet")
    if not os.path.exists(path):
        shutil.rmtree(sf, ignore_errors=True)
        os.makedirs(sf)
        rng = np.random.default_rng(7)
        n_centers, per, d = 16, 250, 32
        centers = rng.normal(size=(n_centers, d)) * 4.0
        pts = (centers[:, None, :] + rng.normal(size=(n_centers, per, d))
               ).reshape(-1, d).astype(np.float32)
        labels = np.repeat(np.arange(n_centers, dtype=np.int32), per)
        pd.DataFrame({
            "vec_id": np.arange(len(pts), dtype=np.int64),
            "embedding": [row for row in pts],
            "label": labels,
        }).to_parquet(path, index=False)

    k, nq = 10, 8
    brute = ann_brute_topk(sf, k=k, n_queries=nq).to_pandas()
    ivf = ann_ivf_topk(sf, k=k, n_queries=nq, n_clusters=32, n_probe=8).to_pandas()
    hits = total = 0
    for qid, grp in brute.groupby("query_id"):
        want = set(grp["neighbor_id"])
        got = set(ivf[ivf["query_id"] == qid]["neighbor_id"])
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.95, f"recall@10 {recall:.3f} < 0.95 at n_probe=8/32"


def test_ann_sq_recall_vs_brute(ray_session):
    """SQ8 quantized top-k must closely track the exact cosine top-k
    (recall@10 >= 0.8 on the gate corpus) — quantization compresses, it
    must not scramble neighborhoods."""
    from lucene_solr_ray.functions.ann import ann_brute_topk, ann_sq_topk

    exact = ann_brute_topk(SF, k=10, n_queries=5).to_pandas()
    sq = ann_sq_topk(SF, k=10, n_queries=5).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        s = set(sq[sq.query_id == qid]["neighbor_id"])
        recalls.append(len(e & s) / len(e))
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_stratified_sample_per_group_k(ray_session):
    """Exactly min(k, group size) rows per group, deterministic."""
    import duckdb

    from lucene_solr_ray.functions.relational import stratified_sample

    got = stratified_sample(SF, k=7).to_pandas()
    sizes = duckdb.sql(
        f"SELECT lang, count(*) AS n FROM read_parquet('{SF}/documents.parquet') "
        "GROUP BY lang").df().set_index("lang")["n"]
    per = got.groupby("lang").size()
    for lang, n in per.items():
        assert n == min(7, int(sizes[lang])), (lang, n)
    again = stratified_sample(SF, k=7).to_pandas()
    assert got["doc_id"].tolist() == again["doc_id"].tolist()


def test_hard_negative_rank_gap():
    """Measured float-safety for hard_negative_mining's cosine ordering:
    within each anchor's DIFFERENT-label candidate list, adjacent sorted
    cosines are far enough apart that numpy-vs-DuckDB float64 rounding
    (~1e-15 relative) cannot swap ranks."""
    import duckdb
    import numpy as _np

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        df = con.sql(
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql "
            f"FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id LIMIT 5) "
            "SELECT q.query_id AS qid, list_cosine_similarity(q.qe, b.embedding) AS c "
            f"FROM q, read_parquet('{sf}/embeddings.parquet') b WHERE b.label != q.ql"
        ).df()
        for qid, g in df.groupby("qid"):
            c = _np.sort(g["c"].to_numpy())
            gaps = _np.diff(c)
            assert gaps.min() >= 1e-7, (sf, qid, gaps.min())


def test_geo_polygon_holes_even_odd_multi_ring():
    """Polygon-with-holes: engine == scalar multi-ring even-odd reference
    on every customer point; a hole-interior point is OUT, a
    hole-boundary point is IN (boundary-inclusive per ring), and at
    least one gate point is genuinely excluded by the hole."""
    import pyarrow.parquet as pq
    from lucene_solr_ray.functions import geo

    sf = "/root/testdata/sf0.001"
    rings = [geo._poly_int_verts(r) for r in geo.HOLED_POLY]

    def ref_inside(py: int, px: int) -> bool:
        inside, on_edge = False, False
        for verts in rings:
            n = len(verts)
            for i in range(n):
                (y1, x1), (y2, x2) = verts[i], verts[(i + 1) % n]
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                if (cross == 0 and min(x1, x2) <= px <= max(x1, x2)
                        and min(y1, y2) <= py <= max(y1, y2)):
                    on_edge = True
                if y1 == y2:
                    continue
                if (y1 > py) != (y2 > py):
                    lhs = (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1)
                    if (lhs > 0) if y2 > y1 else (lhs < 0):
                        inside = not inside
        return inside or on_edge

    got = set(geo.geo_polygon_holes_docs(sf).to_pandas()["c_custkey"])
    keys = pq.read_table(f"{sf}/customer.parquet",
                         columns=["c_custkey"])["c_custkey"].to_numpy()
    exp = {int(k) for k in keys
           if ref_inside(int((k * 37) % 180) * 2 - 179,
                         int((k * 73) % 360) * 2 - 359)}
    assert got == exp and len(exp) > 0
    # hole interior (-10.0, -50.0) -> OUT; hole boundary west edge -> IN;
    # outer interior west of the hole -> IN
    assert not ref_inside(-20, -100)
    assert ref_inside(-20, -161)        # (-10.0, -80.5) on hole edge
    assert ref_inside(-20, -200)        # (-10.0, -100.0) between rings
    # some sf0.001 customer must actually fall in the hole
    in_hole = [int(k) for k in keys if int(k) not in exp
               and -61 <= ((int(k) * 37) % 180) * 2 - 179 <= 41
               and -161 <= ((int(k) * 73) % 360) * 2 - 359 <= -41]
    assert len(in_hole) > 0


def test_hybrid_rrf_fuses_both_lists(ray_session):
    """RRF output must contain docs reachable only through each side
    (pure-sparse and pure-dense members both surface when their single
    list rank is strong), and doc present in both lists outranks its
    single-list position."""
    from lucene_solr_ray.functions.ann import ann_brute_topk
    from lucene_solr_ray.functions.fulltext import hybrid_rrf_topk

    sf = "/root/testdata/sf0.01"
    fused = hybrid_rrf_topk(sf, terms=("merge", "vector"), anchor_vec=0,
                            n_each=50, k=50).to_pandas()
    dense = ann_brute_topk(sf, k=50, n_queries=1).to_pandas()
    dense_ids = set(dense["neighbor_id"])
    fused_ids = set(fused["doc_id"])
    # every dense top-50 member lands in the fused candidate set
    assert dense_ids <= fused_ids or len(fused_ids) == 50
    # scores: 1e6//(60+r) for both lists caps at 2*16393
    assert fused["rrf_micro"].max() <= 2 * (1_000_000 // 61)
    assert (fused["rrf_micro"] > 0).all()


def test_group_facet_counts_bounds(ray_session):
    """group.facet counts are DISTINCT groups: every lang bucket count
    is <= the number of distinct sources (20) and <= its plain doc
    count."""
    import duckdb

    from lucene_solr_ray.functions.relational import group_facet_counts

    sf = "/root/testdata/sf0.01"
    got = group_facet_counts(sf).to_pandas().set_index("lang")
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, COUNT(*) AS n FROM read_parquet('{sf}/documents.parquet') "
        "WHERE n_chars >= 200 GROUP BY lang").df().set_index("lang")
    for lang, row in got.iterrows():
        assert 1 <= row["n_groups"] <= 20
        assert row["n_groups"] <= int(docs.loc[lang, "n"])


def test_contrastive_positive_rank_gap():
    """Float-safety for the SAME-label (positive) side of
    contrastive_triples, mirroring the hard-negative gap test."""
    import duckdb
    import numpy as _np

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        df = con.sql(
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql "
            f"FROM read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id LIMIT 5) "
            "SELECT q.query_id AS qid, list_cosine_similarity(q.qe, b.embedding) AS c "
            f"FROM q, read_parquet('{sf}/embeddings.parquet') b "
            "WHERE b.label = q.ql AND b.vec_id != q.query_id"
        ).df()
        for qid, g in df.groupby("qid"):
            gaps = _np.diff(_np.sort(g["c"].to_numpy()))
            assert gaps.min() >= 1e-7, (sf, qid, gaps.min())
