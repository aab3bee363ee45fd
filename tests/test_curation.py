"""Curation operators: decontamination, repetition signals, PII scan.
Oracle equivalence at sf0.001 (the sf0.01 run is the driver gate's job)
plus unit probes the corpus can't exercise."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return con


def test_curation_oracle_equivalence(ray_session):
    from lucene_solr_ray.functions import curation, data_oracle
    con = _con()
    for fn, sql in [
        (curation.decontaminate_ngram, data_oracle.decontaminate_sql()),
        (curation.repetition_signals, data_oracle.repetition_sql()),
        (curation.pii_scan, data_oracle.pii_scan_sql()),
    ]:
        got = fn(SF).to_pandas().reset_index(drop=True)
        exp = con.execute(sql).fetchdf()
        assert list(got.columns) == list(exp.columns)
        assert got.equals(exp.astype(got.dtypes.to_dict())), fn.__name__


def test_pii_signals_units(ray_session):
    """Redaction counts + sequential semantics on crafted strings the
    synthetic corpus can't produce: multiple matches, boundary cases,
    no matches."""
    import ray.data
    from lucene_solr_ray.functions.curation import pii_signals

    rows = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a@b.co and c.d+x@e-f.org twice",
            "ip 1.2.3.4 then 255.255.255.255 call 123-456-7890",
            "no pii here 1234-567-8901 is not a phone (4-digit prefix)",
            "",
        ], pa.string()),
    })
    out = pii_signals(ray.data.from_arrow(rows)).to_pandas().sort_values("doc_id")
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0, 0]
    # 1234-567-8901: \b before the 3-digit group fails inside digits -> no match
    assert out["n_phone"].tolist() == [0, 1, 0, 0]
    assert out["redacted_len"].tolist()[3] == 0


def test_decontaminate_excludes_benchmark_and_short_docs(ray_session):
    """Benchmark docs (doc_id % 37 == 0) never appear in the output; a
    doc shorter than the gram width counts zero."""
    from lucene_solr_ray.functions.curation import decontaminate_ngram
    out = decontaminate_ngram(SF).to_pandas()
    assert (out["doc_id"] % 37 != 0).all()
    assert ((out["contaminated"] == 1) == (out["n_contaminated"] > 0)).all()
    # self-consistency with the oracle covers the rest


def test_pack_concat_chunks_distributed_prefix_sum(ray_session):
    """The two-level distributed prefix sum equals a single-process
    cumsum in doc_id order (bucket boundaries included), and the chunk
    bookkeeping is self-consistent."""
    import numpy as np
    import pyarrow.parquet as pq
    from lucene_solr_ray.functions.curation import pack_concat_chunks

    sf = "/root/testdata/sf0.001"
    budget = 64  # small budget + small buckets -> many boundary crossings
    got = pack_concat_chunks(sf, budget=budget, bucket_docs=17).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id")
    n = docs["text"].str.split().str.len().to_numpy(dtype=np.int64)
    start = np.concatenate([[0], n.cumsum()])[:-1]
    assert np.array_equal(got["chunk_id"].to_numpy(), start // budget)
    assert np.array_equal(got["offset_in_chunk"].to_numpy(), start % budget)
    exp_span = np.where(n > 0, (start + n - 1) // budget - start // budget + 1, 1)
    assert np.array_equal(got["n_chunks_spanned"].to_numpy(), exp_span)


def test_mix_weighted_sample_rates(ray_session):
    """Every source's realized keep-rate is within 25 points of its
    hash-derived rate at sf0.001 (Bernoulli over ~25 docs/source), and
    the selection is deterministic across runs."""
    from lucene_solr_ray.functions.curation import mix_weighted_sample, _md5_upper64
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = mix_weighted_sample(sf).to_pandas()
    again = mix_weighted_sample(sf).to_pandas()
    assert got.equals(again)
    all_docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    for src, g in all_docs.groupby("source"):
        rate = 20 + _md5_upper64(src) % 61
        kept = (got["source"] == src).sum()
        assert abs(kept / len(g) * 100 - rate) < 25, (src, rate, kept, len(g))


def test_dup_gram_and_line_dedup_oracle_equivalence(ray_session):
    from lucene_solr_ray.functions import curation, data_oracle
    con = _con()
    for fn, sql in [
        (curation.dup_gram_exposure, data_oracle.dup_gram_exposure_sql()),
        (curation.line_dedup_first, data_oracle.line_dedup_sql()),
    ]:
        got = fn(SF).to_pandas().reset_index(drop=True)
        exp = con.execute(sql).fetchdf()
        assert list(got.columns) == list(exp.columns)
        assert got.equals(exp.astype(got.dtypes.to_dict())), fn.__name__


def test_line_dedup_keep_first_semantics(ray_session):
    """Keeper election on a crafted corpus: the lowest doc_id holding a
    duplicated line keeps it; unique lines always survive; within-doc
    repeats of a line count once (distinct per doc)."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions import curation

    line_a = "a b c d e f g h"          # in docs 0, 2 -> doc 0 keeps
    line_b = "p q r s t u v w"          # only doc 1
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([line_a, line_b + " " + line_a, line_a + " " + line_a],
                         pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        got = curation.line_dedup_first(d).to_pandas()
    # doc 0: 1 distinct line (a), keeper -> kept 1/1
    # doc 1: lines (b, a) -> b kept (unique, doc1 is min), a lost to doc 0
    # doc 2: line a twice -> 1 distinct, lost to doc 0
    assert got["n_lines"].tolist() == [1, 2, 1]
    assert got["n_lines_kept"].tolist() == [1, 1, 0]


def test_dup_gram_exposure_flags_cross_doc_only(ray_session):
    """A gram repeated only WITHIN one doc is not cross-doc duplication;
    a gram shared across docs flags both."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions import curation

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            shared + " x1",                 # shares `shared` with doc 1
            "y0 " + shared,                 # shares `shared` with doc 0
            "z1 z2 z3 z4 z5 z6 z7 z8 " * 2,  # self-repeat only
        ], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        got = curation.dup_gram_exposure(d).to_pandas().set_index("doc_id")
    assert got.loc[0, "dup_flag"] == 1 and got.loc[0, "n_dup_grams"] == 1
    assert got.loc[1, "dup_flag"] == 1 and got.loc[1, "n_dup_grams"] == 1
    assert got.loc[2, "dup_flag"] == 0


def test_dsir_oracle_equivalence(ray_session):
    from lucene_solr_ray.functions import curation, data_oracle
    got = curation.dsir_select_topk(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute(data_oracle.dsir_select_sql()).fetchdf()
    assert list(got.columns) == list(exp.columns)
    assert got.equals(exp.astype(got.dtypes.to_dict()))


def test_dsir_prefers_target_like_docs(ray_session):
    """Importance semantics on a crafted corpus: a non-target doc that
    shares the target's bigrams outranks one with disjoint vocabulary."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions import curation

    tgt = "alpha beta gamma delta alpha beta gamma delta"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([tgt, tgt, "alpha beta gamma delta epsilon",
                          "zz yy xx ww vv uu tt ss"], pa.string()),
        "source": pa.array(["src0", "src0", "srcA", "srcB"], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        got = curation.dsir_select_topk(d, target_source="src0", k=2).to_pandas()
    assert got["doc_id"].tolist() == [2, 3]          # target-like first
    w = dict(zip(got["doc_id"], got["w_micro"]))
    assert w[2] > w[3]                                # and strictly heavier


def test_lm_quality_oracle_equivalence_and_bands(ray_session):
    """Hash-LM cross-entropy matches the DuckDB replica exactly; a doc
    made of common (trusted-subset) tokens lands in a better band than
    one made of tokens the LM never saw."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions import curation, data_oracle

    got = curation.lm_quality_scores(SF).to_pandas().reset_index(drop=True)
    exp = _con().execute(data_oracle.lm_quality_sql()).fetchdf()
    assert list(got.columns) == list(exp.columns)
    assert got.equals(exp.astype(got.dtypes.to_dict()))

    common = "the merge join sort " * 10
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([common, common,
                          "qqq www eee rrr ttt yyy uuu " * 6], pa.string()),
        "source": pa.array(["src0", "srcA", "srcA"], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        # cuts sized to the tiny LM: max possible nlp is ln(tot+B) ~ 8.3 nats
        bands = curation.lm_quality_scores(
            d, head_micro=2_000_000, tail_micro=6_000_000).to_pandas().set_index("doc_id")
    assert bands.loc[1, "ce_micro"] < bands.loc[2, "ce_micro"]
    assert bands.loc[1, "band"] < bands.loc[2, "band"]
    assert bands.loc[2, "band"] == 2  # unseen vocab -> tail


def test_clean_corpus_export_oracle_and_partition_resume(ray_session):
    """Export counts match the SQL replica, and the write is resumable
    at BUCKET granularity: after deleting one bucket's dir + marker, a
    re-run rebuilds only that bucket (other buckets' files untouched)."""
    import glob
    import os
    import shutil
    import tempfile

    from lucene_solr_ray.functions import curation, data_oracle

    with tempfile.TemporaryDirectory() as out:
        got = curation.clean_corpus_export(SF, out_dir=out).to_pandas()
        exp = _con().execute(data_oracle.clean_corpus_sql()).fetchdf()
        assert got.equals(exp.astype(got.dtypes.to_dict()))
        assert got["n_docs"].sum() > 0

        files_before = {f: os.path.getmtime(f)
                        for f in glob.glob(os.path.join(out, "bucket=*", "*.parquet"))}
        victim = os.path.join(out, "bucket=3")
        shutil.rmtree(victim)
        os.remove(os.path.join(out, ".done-3"))
        got2 = curation.clean_corpus_export(SF, out_dir=out).to_pandas()
        assert got2.equals(got)
        for f, mt in files_before.items():
            if "bucket=3" not in f:
                assert os.path.getmtime(f) == mt, f  # untouched
        assert glob.glob(os.path.join(victim, "*.parquet"))  # rebuilt


def test_exact_substring_remove_coverage_semantics(ray_session):
    """Crafted corpus: a shared 8-gram removes exactly its covered span
    (overlapping duplicated windows merge); unique text survives; docs
    shorter than the gram width are untouched; a within-doc-only repeat
    does NOT count as cross-doc duplication."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions.curation import exact_substring_remove

    shared = "a b c d e f g h"            # one 8-gram, docs 0 and 1
    with tempfile.TemporaryDirectory() as d:
        tab = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                f"u0 {shared} t0",                  # covered span inside
                f"{shared} i {shared}",             # two occurrences, 9-gram overlap region unique
                "short doc",                        # < ngram tokens
                "w1 w2 w3 w4 w5 w6 w7 w8 w9",       # unique 8-grams only
                "r r r r r r r r r r",              # within-doc repeat only... shared with nobody
            ], pa.string()),
        })
        pq.write_table(tab, os.path.join(d, "documents.parquet"))
        out = exact_substring_remove(d).to_pandas().set_index("doc_id")

        assert out.loc[0, "clean_text"] == "u0 t0"
        assert out.loc[0, "n_removed"] == 8
        # doc 1: both shared occurrences covered; the lone 'i' survives
        # only if no duplicated gram covers it (grams containing 'i' are
        # unique to doc 1) -> kept.
        assert out.loc[1, "clean_text"] == "i"
        assert out.loc[1, "n_removed"] == 16
        assert out.loc[2, "clean_text"] == "short doc"
        assert out.loc[2, "n_removed"] == 0
        assert out.loc[3, "n_removed"] == 0
        # within-doc repetition is not cross-doc duplication
        assert out.loc[4, "n_removed"] == 0


def test_gopher_quality_flag_boundaries(ray_session):
    """Rule boundaries: exactly 50 words passes the count rule; 49 fails;
    alpha fraction exactly 0.8 passes; one required stopword fails, two
    pass; mean word length bounds are inclusive."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions.curation import gopher_quality_flags

    # 50 words, all alpha, mean len in [3,10], stopwords 'the'+'of'
    good = "the of " + " ".join(f"word{i:02d}" for i in range(48))
    short = "the of " + " ".join(f"word{i:02d}" for i in range(47))       # 49 words
    one_stop = "the aa " + " ".join(f"word{i:02d}" for i in range(48))    # 1 req stopword
    # 50 words, exactly 40 alpha (10*40 >= 8*50 holds), two stopwords
    frac_ok = "the of " + " ".join(f"word{i:02d}" for i in range(38)) + " " + " ".join("123456" for _ in range(10))
    # 39 alpha of 50 -> 390 < 400 fails
    frac_bad = "the of " + " ".join(f"word{i:02d}" for i in range(37)) + " " + " ".join("123456" for _ in range(11))

    with tempfile.TemporaryDirectory() as d:
        tab = pa.table({
            "doc_id": pa.array(list(range(5)), pa.int64()),
            "text": pa.array([good, short, one_stop, frac_ok, frac_bad], pa.string()),
        })
        pq.write_table(tab, os.path.join(d, "documents.parquet"))
        out = gopher_quality_flags(d).to_pandas().set_index("doc_id")
        assert out["pass_flag"].tolist() == [1, 0, 0, 1, 0]
        assert out.loc[0, "n_words"] == 50
        assert out.loc[3, "n_alpha_words"] == 40
        assert out.loc[2, "n_req_stopwords"] == 1


def test_decontaminate_bloom_equals_exact_even_with_tiny_bloom(ray_session):
    """The audit pass must kill every Bloom false positive: with a
    deliberately saturated 256-bit filter (FP rate near 1) the output
    still equals the exact pass bit-for-bit; at default sizing too."""
    from lucene_solr_ray.functions.curation import decontaminate_bloom, decontaminate_ngram

    exact = decontaminate_ngram(SF).to_pandas().reset_index(drop=True)
    for m_bits, k in [(256, 2), (1 << 17, 7)]:
        got = decontaminate_bloom(SF, m_bits=m_bits, k_hashes=k).to_pandas().reset_index(drop=True)
        assert got.equals(exact.astype(got.dtypes.to_dict())), f"m_bits={m_bits}"


def test_boilerplate_strip_semantics(ray_session):
    """Hot lines (df >= min_df) vanish from EVERY doc (unlike
    line_dedup_first's keep-one); unique lines survive in order; crafted
    corpus pins the boundary df == min_df."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions.curation import boilerplate_strip

    hot = "a b c d"          # in 2 docs -> boilerplate at min_df=2
    uniq1, uniq2 = "e f g h", "i j k l"
    texts = [f"{hot} {uniq1}", f"{hot} {uniq2}", uniq2 + " m n o p", ""]
    # NOTE doc2 shares uniq2 with doc1 -> uniq2 df=2 -> also hot
    with tempfile.TemporaryDirectory() as d:
        tab = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tab, os.path.join(d, "documents.parquet"))
        out = boilerplate_strip(d, line_tokens=4, min_df=2).to_pandas().set_index("doc_id")
        assert out.loc[0, "clean_text"] == uniq1
        assert out.loc[0, "n_dropped"] == 1
        assert out.loc[1, "clean_text"] == ""          # both its lines hot
        assert out.loc[1, "n_dropped"] == 2
        assert out.loc[2, "clean_text"] == "m n o p"   # uniq2 occurrence dropped here too
        assert out.loc[2, "n_lines"] == 2 and out.loc[2, "n_dropped"] == 1
        assert out.loc[3, "n_lines"] == 0 and out.loc[3, "clean_text"] == ""


def test_chunk_documents_overlap_continuity(ray_session):
    """Consecutive chunks share exactly `overlap` tokens; a short doc
    yields one full-copy chunk; an empty doc yields none; every token
    is covered."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    from lucene_solr_ray.functions.curation import chunk_documents

    long = " ".join(f"w{i}" for i in range(23))  # 23 toks, chunk 8, stride 5
    short = "x y z"
    with tempfile.TemporaryDirectory() as d:
        tab = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                        "text": pa.array([long, short, ""], pa.string())})
        pq.write_table(tab, os.path.join(d, "documents.parquet"))
        out = chunk_documents(d, chunk_tokens=8, overlap=3).to_pandas()
        g0 = out[out["doc_id"] == 0].reset_index(drop=True)
        # starts 0,5,10,15: 15+8 >= 23 stops there; last chunk len 8
        assert g0["start_tok"].tolist() == [0, 5, 10, 15]
        assert g0["n_tok"].tolist() == [8, 8, 8, 8]
        for i in range(len(g0) - 1):
            a = g0.loc[i, "chunk_text"].split()
            b = g0.loc[i + 1, "chunk_text"].split()
            assert a[-3:] == b[:3]  # overlap continuity
        covered = set()
        for _, r in g0.iterrows():
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
        assert covered == set(range(23))
        g1 = out[out["doc_id"] == 1]
        assert len(g1) == 1 and g1["chunk_text"].iloc[0] == short
        assert (out["doc_id"] != 2).all()


def test_token_budget_select_prefix_and_bucket_invariance(ray_session):
    """token_budget_select keeps, per source, exactly the doc_id-order
    prefix whose inclusive running token count fits the budget — and the
    distributed two-level prefix sum is invariant to the bucket size."""
    import numpy as np

    from lucene_solr_ray.functions.curation import token_budget_select

    sf = "/root/testdata/sf0.001"
    a = token_budget_select(sf, budget=600, bucket_docs=128).to_pandas()
    b = token_budget_select(sf, budget=600, bucket_docs=7).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    assert (a["cum_tokens"] <= 600).all() and len(a) > 0
    for _, g in a.groupby("source"):
        cum = g.sort_values("doc_id")["cum_tokens"].to_numpy()
        assert (np.diff(cum) > 0).all()  # strictly increasing prefix


def test_winnowing_guarantee_property(ray_session):
    """Winnowing's core guarantee (Schleimer et al. §2): two documents
    sharing a substring of length >= window + guarantee - 1 share at
    least one selected fingerprint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.functions.textstats import winnowing_fingerprints

    shared = "the quick brown fox jumps"   # 25 chars >= 8 + 4 - 1
    texts = [
        f"aaa {shared} zzz",
        f"completely different prefix {shared}",
        "nothing in common here at all",
    ]
    import tempfile, os
    d = tempfile.mkdtemp()
    tab = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
    })
    pq.write_table(tab, os.path.join(d, "documents.parquet"))
    fps = winnowing_fingerprints(d, window=8, guarantee=4).to_pandas()
    sets = {i: set(g["fp"]) for i, g in fps.groupby("doc_id")}
    assert sets[0] & sets[1], "shared substring must share a fingerprint"
    # selection actually prunes: far fewer fingerprints than k-grams
    assert len(sets[0]) < len(texts[0]) - 8 + 1


def test_unigram_viterbi_gold():
    """Exact-int Viterbi segmentation gold cases: maximize summed
    micro-nat log-probs; ties prefer the smallest split point."""
    from lucene_solr_ray.functions.textstats import unigram_viterbi

    # 'ab' as one piece beats 'a'+'b' when its log-prob exceeds the sum
    assert unigram_viterbi("ab", {"a": -10, "b": -10, "ab": -15}) == ["ab"]
    assert unigram_viterbi("ab", {"a": -5, "b": -5, "ab": -15}) == ["a", "b"]
    # coverage fallback: single chars segment anything
    assert unigram_viterbi("abc", {"a": -1, "b": -1, "c": -1}) == ["a", "b", "c"]
    # tie (equal scores): smallest split point -> longest FINAL piece
    lp = {"a": -10, "ab": -20, "b": -10}
    assert unigram_viterbi("ab", lp) == ["ab"]
    # equal-score decomposition ties to the single longer piece (j=0)
    lp = {"merge": -30, "mer": -10, "ge": -20, "m": -50, "e": -50, "r": -50, "g": -50}
    assert unigram_viterbi("merge", lp, max_piece_len=5) == ["merge"]
    # strictly better decomposition wins
    lp["mer"] = -5
    assert unigram_viterbi("merge", lp, max_piece_len=5) == ["mer", "ge"]
