"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (full-text index build + BM25
query batch) on /root/testdata/sf0.001. ``queries()`` exposes one entry
per implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the
DuckDB-equivalent SQL where the op is SQL-expressible (BM25 scoring and
sketch ops are validated by the pytest oracle suite instead and carry a
rows-only check here).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().

Numeric convention shared with the SQL: floats become exact integers
per-row BEFORE aggregation (cents via FLOOR(x*100+0.5)) so value hashes
match regardless of accumulation order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"

# fixed probe sets (documents vocabulary is a closed 31-word set)
FT_TERM = "merge"
FT_AND_TERMS = ["merge", "join", "vector"]
FT_OR_TERMS = ["window", "vector"]
FT_STATS_TERMS = ["merge", "join", "window", "zzz-absent"]
FT_BM25_QUERIES = [
    ("q-or-1", ["merge", "join"], "or"),
    ("q-or-2", ["window", "vector", "stream"], "or"),
    ("q-and-1", ["merge", "join"], "and"),
    ("q-single", ["spark"], "or"),
]
PERCOLATE_QUERIES = [
    {"query_id": "sq-and", "type": "and", "terms": ["merge", "join"]},
    {"query_id": "sq-or", "type": "or", "terms": ["vector"]},
    {"query_id": "sq-or2", "type": "or", "terms": ["spark", "window"]},
    {"query_id": "sq-parsed", "type": "parsed", "query": '+vector +"merge join" -spark'},
]

# PointRangeQuery monitor clauses: a range-only query (termless/ANYTOKEN
# routing) and a term-AND-range query (term-routed)
PERCOLATE_RANGE_QUERIES = [
    {"query_id": "rq-short", "type": "range", "field": "n_chars",
     "lo": 0, "hi": 150},
    {"query_id": "rq-merge-mid", "type": "range", "field": "n_chars",
     "lo": 150, "hi": 400, "terms": ["merge"]},
    {"query_id": "rq-or", "type": "or", "terms": ["vector"]},
]


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (sort ->
    docID assign -> analyze -> term-hash shuffle -> segment writers ->
    manifest) and answer a BM25 top-k query batch over it."""
    from lucene_solr_ray.functions import fulltext as ft

    return ft.bm25_topk(SF0001, FT_BM25_QUERIES, k=10)


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_solr_ray.functions import ann
    from lucene_solr_ray.functions import dedup
    from lucene_solr_ray.functions import fulltext as ft
    from lucene_solr_ray.functions import monitor
    from lucene_solr_ray.functions import multimodal
    from lucene_solr_ray.functions import relational as rel
    from lucene_solr_ray.functions import sketches
    from lucene_solr_ray.functions import windows as win
    from lucene_solr_ray.functions import textstats as ts
    from lucene_solr_ray.functions import classify, curation, expr, geo, graph, ltr
    from lucene_solr_ray.functions import solrapi, streamexpr
    from lucene_solr_ray.functions import sql as sqlmod
    from lucene_solr_ray.sources import ingest, urp

    return {
        # --- dedup & sampling (SURVEY §2.9 + training-data ops) ---
        "dedup_exact": dedup.exact_dedup,
        "dedup_textprofile": dedup.textprofile_signature,
        "dedup_minhash_lsh": lambda sf: dedup.minhash_lsh_pairs(sf, jaccard_threshold=0.3),
        "dedup_simhash_pairs": lambda sf: dedup.simhash_near_pairs(sf, max_hamming=3),
        "dedup_ngram_jaccard": lambda sf: dedup.ngram_jaccard_pairs(sf, threshold_pct=30),
        "dedup_embedding_cosine": lambda sf: dedup.embedding_cosine_pairs(sf, threshold=0.42),
        "semdedup_keep_set": lambda sf: dedup.semdedup_keep_set(sf, threshold=0.42),
        "dedup_embedding_lsh": lambda sf: dedup.embedding_lsh_pairs(sf, threshold=0.42),
        "dedup_connected_components": dedup.dedup_connected_components,
        "dedup_cluster_representatives": dedup.dedup_cluster_representatives,
        "semdedup_keep": lambda sf: dedup.semdedup_keep(sf, n_clusters=16, threshold=0.42),
        # --- similarity search ---
        "ann_brute_topk": lambda sf: ann.ann_brute_topk(sf, k=10, n_queries=5),
        "ann_sq_topk": lambda sf: ann.ann_sq_topk(sf, k=10, n_queries=5),
        "ann_range_search": lambda sf: ann.ann_range_search(sf, threshold=0.30, n_queries=5),
        "ann_filtered_topk": lambda sf: ann.ann_filtered_topk(sf, label=1, k=10, n_queries=5),
        "hard_negative_mining": lambda sf: ann.hard_negative_mining(sf, k=10, n_anchors=5),
        "contrastive_triples": lambda sf: ann.contrastive_triples(sf, n_anchors=5),
        "ann_ivf_topk": lambda sf: ann.ann_ivf_topk(sf, k=10, n_queries=5),
        "ann_pq_topk": lambda sf: ann.ann_pq_topk(sf, k=10, n_queries=5),
        "ann_ivfpq_topk": lambda sf: ann.ann_ivfpq_topk(sf, k=10, n_queries=5),
        "embedding_label_counts": ann.embedding_label_counts,
        # --- text analysis ---
        "token_count": ts.token_count,
        "bpe_ish_count": ts.bpe_ish_count,
        "ngram_diversity": lambda sf: ts.ngram_diversity(sf, n=3),
        "winnowing_fingerprints": lambda sf: ts.winnowing_fingerprints(
            sf, window=8, guarantee=4),
        "unigram_segment_counts": lambda sf: ts.unigram_segment_counts(
            sf, max_piece_len=4, top_k=64, k_out=30),
        "bpe_encode_counts": lambda sf: ts.bpe_encode_counts(
            sf, n_merges=10, k_out=30),
        "token_fertility": ts.token_fertility,
        "pmi_term_pairs": lambda sf: ts.pmi_term_pairs(sf, min_pairs=20, k=20),
        "quality_signals": ts.quality_signals,
        "lang_id": ts.lang_id,
        "md5_fingerprint": ts.md5_fingerprint,
        "rolling_fingerprint": ts.rolling_fingerprint,
        "stemmed_term_counts": ts.stemmed_term_counts,
        "phonetic_term_groups": ts.phonetic_term_groups,
        "refined_phonetic_groups": lambda sf: ts.phonetic_term_groups(
            sf, k=50, encoder="refined"),
        "fingerprint_dedup_groups": lambda sf: ts.fingerprint_dedup_groups(sf, k=20),
        "stemmer_override_counts": lambda sf: ts.stemmer_override_counts(sf),
        "limit_token_counts": lambda sf: ts.limit_token_counts(sf, limit=10, k=20),
        "path_hierarchy_counts": ts.path_hierarchy_counts,
        "lang_dispatch_token_counts": ts.lang_dispatch_token_counts,
        "ja_morphology_tokens": ts.ja_morphology_tokens,
        "ko_morphology_tokens": ts.ko_morphology_tokens,
        "icu_folding_tokens": ts.icu_folding_tokens,
        "charfilter_token_counts": ts.charfilter_token_counts,
        "synonym_graph_counts": ts.synonym_graph_counts,
        "common_grams_counts": ts.common_grams_counts,
        "edge_ngram_counts": ts.edge_ngram_counts,
        "term_facet_prefix": lambda sf: ts.term_facet_prefix(sf, prefix="s", k=10),
        "urlemail_token_counts": ts.urlemail_token_counts,
        "elision_token_counts": ts.elision_token_counts,
        "german_stem_counts": lambda sf: ts.german_stem_counts(sf, k=20),
        "keyword_repeat_docs": lambda sf: ts.keyword_repeat_docs(
            sf, surface_q="value", stem_q="valu"),
        "bpe_pair_counts": lambda sf: ts.bpe_pair_counts(sf, k=20),
        "heavy_hitters_topk": sketches.heavy_hitters_topk,
        "count_min_estimate": sketches.count_min_estimate,
        # --- training-data curation (decontam / repetition / PII) ---
        "decontaminate_ngram": curation.decontaminate_ngram,
        "decontaminate_bloom": curation.decontaminate_bloom,
        "boilerplate_strip": curation.boilerplate_strip,
        "chunk_documents": curation.chunk_documents,
        "repetition_signals": curation.repetition_signals,
        "pii_scan": curation.pii_scan,
        "quality_logit_select": lambda sf: curation.quality_logit_select(sf, k=100),
        # --- document clustering (ClusteringComponent analogue) ---
        "cluster_kmeans_docs": classify.cluster_kmeans_docs,
        "cluster_labels": classify.cluster_labels,
        # --- data mixing + sequence packing ---
        "mix_weighted_sample": curation.mix_weighted_sample,
        "token_budget_select": lambda sf: curation.token_budget_select(sf, budget=600),
        "pack_concat_chunks": lambda sf: curation.pack_concat_chunks(sf, budget=256),
        # --- substring/line-level exact dedup (Lee et al. / C4 passes) ---
        "dup_gram_exposure": curation.dup_gram_exposure,
        "exact_substring_remove": curation.exact_substring_remove,
        "line_dedup_first": curation.line_dedup_first,
        # --- Gopher document-quality rules (Rae et al. 2021) ---
        "gopher_quality_flags": curation.gopher_quality_flags,
        # --- DSIR importance selection (Xie et al. 2023) ---
        "dsir_select_topk": curation.dsir_select_topk,
        # --- CCNet LM quality banding (Wenzek et al. 2020) ---
        "lm_quality_scores": curation.lm_quality_scores,
        # --- cleaned-corpus export: quality + dedup -> partitioned parquet ---
        "clean_corpus_export": curation.clean_corpus_export,
        # --- multimodal plumbing ---
        "multimodal_payload_stats": multimodal.payload_stats,
        "multimodal_fake_decode": multimodal.fake_decode,
        "multimodal_frame_sample": multimodal.frame_sample,
        "multimodal_resample": lambda sf: multimodal.resample(sf, stride=2),
        "multimodal_feature_extract": lambda sf: multimodal.feature_extract(sf, dim=8),
        "multimodal_crossmodal_topk": lambda sf: multimodal.crossmodal_topk(
            sf, n_queries=3, k=5, dim=8),
        # --- SqlStream / graph streams (SURVEY §2.8) ---
        "sql_stream_agg": sqlmod.sql_stream_agg,
        "sql_stream_offset": sqlmod.sql_stream_offset,
        "sql_stream_join": sqlmod.sql_stream_join,
        "sql_stream_left_join": sqlmod.sql_stream_left_join,
        "sql_stream_distinct": sqlmod.sql_stream_distinct,
        "sql_stream_join3": sqlmod.sql_stream_join3,
        "sql_stream_in_like": sqlmod.sql_stream_in_like,
        "sql_stream_union": sqlmod.sql_stream_union,
        "sql_stream_count_distinct": sqlmod.sql_stream_count_distinct,
        "sql_stream_avg": sqlmod.sql_stream_avg,
        "sql_stream_or_not": sqlmod.sql_stream_or_not,
        "sql_stream_scalar_expr": sqlmod.sql_stream_scalar_expr,
        "sql_stream_between": sqlmod.sql_stream_between,
        "sql_stream_is_null": sqlmod.sql_stream_is_null,
        "sql_stream_agg_expr": sqlmod.sql_stream_agg_expr,
        "sql_stream_topn_groups": sqlmod.sql_stream_topn_groups,
        "split_leakage_audit": lambda sf: __import__(
            "lucene_solr_ray.functions.curation",
            fromlist=["split_leakage_audit"]).split_leakage_audit(sf),
        "split_train_val_test": lambda sf: __import__(
            "lucene_solr_ray.functions.curation",
            fromlist=["train_val_test_split"]).train_val_test_split(sf),
        "dedup_incremental": lambda sf: __import__(
            "lucene_solr_ray.functions.dedup",
            fromlist=["dedup_incremental"]).dedup_incremental(sf),
        "domain_doc_counts": lambda sf: __import__(
            "lucene_solr_ray.functions.textstats",
            fromlist=["domain_doc_counts"]).domain_doc_counts(sf),
        "gather_nodes": graph.gather_nodes,
        "score_nodes": graph.score_nodes,
        "shortest_path": graph.shortest_path_pairs,
        "graph_query_reachable": graph.graph_query_reachable,
        # --- ingest: DIH / Tika / URP chain (SURVEY §2.1/§2.2) ---
        "dih_csv_ingest": ingest.dih_ingest,
        "tika_extract": ingest.tika_extract,
        "urp_chain_process": urp.urp_chain_process,
        "urp_truncate": lambda sf: urp.urp_truncate(sf, max_len=120),
        "urp_uuid_clone": urp.urp_uuid_clone,
        "urp_tolerant_update": lambda sf: urp.tolerant_update(sf, bad_mod=25),
        # --- percolator / highlighter (SURVEY §2.5/§2.6 aux) ---
        "percolate": lambda sf: monitor.percolate(sf, PERCOLATE_QUERIES),
        "percolate_range": lambda sf: monitor.percolate(sf, PERCOLATE_RANGE_QUERIES),
        "percolate_stream_alerts": lambda sf: monitor.percolate_stream_alerts(sf),
        "highlight_snippets": lambda sf: monitor.highlight(sf, ["vector", "stream"]),
        "ft_classic_highlight": lambda sf: ft.classic_highlight_fragments(
            sf, terms=("merge", "vector"), fragsize=80),
        # --- sketches (SURVEY §2.7 hll / percentile aggs) ---
        "hll_distinct": sketches.hll_distinct,
        "hll_union_distinct": lambda sf: sketches.hll_union_distinct(
            sf, a="purchase", b="signup"),
        # max_centroids=16384 >= every batch -> singleton centroids, the
        # sketch's exact regime (SQL-checkable); bench/pytest use the real
        # compression budget
        "tdigest_quantiles": lambda sf: sketches.tdigest_quantiles(sf, max_centroids=16384),
        # --- scalar / date functions, sampling (SURVEY §2.10, §2.9) ---
        "scalar_functions": rel.scalar_functions,
        "date_functions": rel.date_functions,
        "deterministic_sample": rel.deterministic_sample,
        "sample_fixed_k": rel.sample_fixed_k,
        "stratified_sample": lambda sf: rel.stratified_sample(sf, k=20),
        "child_doc_transform": lambda sf: rel.child_doc_transform(sf),
        # --- full-text core (SURVEY §2.3/§2.5/§2.6) ---
        "ft_payload_score": lambda sf: ft.payload_score_topk(sf, "merge", k=10),
        "ft_payload_function": lambda sf: ft.payload_function_stats(sf, "merge"),
        "ft_covering_query": lambda sf: ft.covering_query_docs(
            sf, ("merge", "join", "vector"), pivot_chars=300),
        "drill_sideways": lambda sf: ft.drill_sideways(sf),
        "ft_term_docs": lambda sf: ft.boolean_retrieve(sf, [FT_TERM], mode="or"),
        "ft_and_docs": lambda sf: ft.boolean_retrieve(sf, FT_AND_TERMS, mode="and"),
        "ft_or_docs": lambda sf: ft.boolean_retrieve(sf, FT_OR_TERMS, mode="or"),
        "ft_upgrade_requery": lambda sf: ft.upgrade_requery(sf, FT_OR_TERMS),
        "ft_term_stats": lambda sf: ft.term_stats(sf, FT_STATS_TERMS),
        "ft_bm25_topk": lambda sf: ft.bm25_topk(sf, FT_BM25_QUERIES, k=10),
        "ft_lmdirichlet_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="lmdirichlet"),
        "ft_gl2_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="dfr_gl2"),
        "ft_spl_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="ib_spl"),
        "ft_bm25_tuned_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="bm25_tuned"),
        "ft_ine_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="dfr_ine_l2"),
        "ft_dfi_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="dfi_chi2"),
        "ft_axiomatic_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="ax_f2exp"),
        "ft_sweetspot_topk": lambda sf: ft.bm25_topk(
            sf, FT_BM25_QUERIES, k=10, similarity="sweetspot"),
        "ft_combined_field_topk": lambda sf: ft.combined_field_topk(
            sf, ("merge", "src3"), k=10),
        "ft_multifield_dismax": lambda sf: ft.multifield_dismax_topk(sf, k=10),
        "ft_multifield_sum": lambda sf: ft.multifield_sum_topk(sf, k=10),
        "ft_multifield_qf_boost": lambda sf: ft.multifield_qf_boost_topk(sf, k=10),
        "ft_multifield_fielded_parse": lambda sf: ft.multifield_fielded_parse_topk(sf, k=10),
        "ft_multifield_dismax_tie": lambda sf: ft.multifield_dismax_tie_topk(sf, k=10),
        "ft_multifield_title_phrase": lambda sf: ft.multifield_title_phrase_topk(sf, k=10),
        "ft_unified_highlight": lambda sf: ft.unified_highlight_topk(
            sf, ["merge", "join", "vector"], k_docs=10),
        "ft_feature_boost_topk": lambda sf: ft.feature_boost_topk(
            sf, ["merge", "join"], k=10),
        "ft_diversified_topk": lambda sf: ft.diversified_topk(
            sf, ["merge", "join"], key="source", max_per_key=2, k=10),
        "ft_feature_log_topk": lambda sf: ft.feature_boost_topk(
            sf, ["merge", "join"], k=10, func="log", weight=0.4, pivot=1.0),
        "ft_feature_sigmoid_topk": lambda sf: ft.feature_boost_topk(
            sf, ["merge", "join"], k=10, func="sigm"),
        "ft_boost_query_topk": lambda sf: ft.boost_query_topk(
            sf, ["merge", "join"], k=10),
        "ft_boosting_demote": lambda sf: ft.boosting_demote_topk(
            sf, ["merge", "join"], demote_term="vector", demote_factor=0.5, k=10),
        "ft_req_opt_topk": lambda sf: ft.req_opt_topk(
            sf, must="merge", optional="vector", k=10),
        "hybrid_rrf_topk": lambda sf: ft.hybrid_rrf_topk(
            sf, terms=("merge", "vector"), anchor_vec=0, n_each=50, k=10),
        "ft_req_excl_topk": lambda sf: ft.req_excl_topk(
            sf, must="merge", excluded="vector", k=10),
        "ft_intervals_maxgaps": lambda sf: ft.intervals_maxgaps_retrieve(
            sf, "merge", "join", "sort", max_gaps=4),
        "ft_fuzzy_like_this": lambda sf: ft.fuzzy_like_this_topk(
            sf, ("merg", "vectr"), max_edits=1, max_num_terms=6, k=10),
        "ft_minhash_query": lambda sf: ft.minhash_query_docs(
            sf, "merge join vector sort stream window group filter",
            sig_size=16, min_shared=3),
        "ft_intervals_containing": lambda sf: ft.intervals_containing_retrieve(
            sf, "merge", "join", "sort", max_width=8),
        "ft_prefix_docs": lambda sf: ft.multi_term_retrieve(sf, "prefix", "s"),
        "ft_wildcard_docs": lambda sf: ft.multi_term_retrieve(sf, "wildcard", "s*m"),
        "ft_regexp_docs": lambda sf: ft.multi_term_retrieve(sf, "regexp", "(stream|spark)"),
        "ft_range_docs": lambda sf: ft.multi_term_retrieve(sf, "range", "key:part"),
        "ft_leading_wildcard": lambda sf: ft.leading_wildcard_retrieve(sf, "*er"),
        "ft_dv_update_sort": lambda sf: ft.dv_update_sort(sf, mod=7, k=15),
        "ft_optimistic_update": lambda sf: ft.optimistic_update(sf),
        "ft_atomic_inc": lambda sf: ft.atomic_inc_requery(sf, mod=11, delta=5, k=15),
        "ft_tag_dictionary": lambda sf: ft.tag_dictionary_matches(
            sf, ("merge join", "join vector", "sort window")),
        "ft_point_in_set": lambda sf: ft.point_in_set_docs(
            sf, "n_chars", (54, 62, 78, 132)),
        "ft_multi_range": lambda sf: ft.multi_range_docs(
            sf, "n_chars", ((60, 80), (150, 170), (240, 260))),
        "ft_index_or_dv_lead": lambda sf: ft.index_or_docvalues_docs(
            sf, term="dup", lo=100, hi=300),
        "ft_index_or_dv_range": lambda sf: ft.index_or_docvalues_docs(
            sf, term="merge", lo=100, hi=300),
        "ft_simple_query_docs": lambda sf: ft.simple_query_docs(
            sf, '"merge join" | vector + -stream*'),
        "ft_more_like_this": lambda sf: ft.more_like_this_topk(sf, doc_id=0, k=10),
        "ft_phrase_docs": lambda sf: ft.phrase_retrieve(sf, ["merge", "join"]),
        "ft_multi_phrase_docs": lambda sf: ft.multi_phrase_retrieve(
            sf, [["merge", "join"], ["vector"]]),
        "ft_complex_phrase": lambda sf: ft.complex_phrase_docs(sf, '"s* join"'),
        "ft_mlt_interesting_terms": lambda sf: ft.mlt_interesting_terms(sf, doc_id=3, max_terms=8),
        "ft_doc_expiration": lambda sf: ft.doc_expiration_requery(
            sf, ttl_seconds=180, query_terms=["merge"]),
        "ft_update_json": lambda sf: ft.update_json_commands(sf, "merge", delete_mod=100),
        "ft_external_file_sort": lambda sf: ft.external_file_sort(sf, k=20),
        "ft_query_parser": lambda sf: ft.query_parser_retrieve(
            sf, '+"merge join" -vector lang:en'),
        "ft_phrase_topk": lambda sf: ft.phrase_topk(sf, ["merge", "join"], k=10),
        "ft_boolean_notfilter": lambda sf: ft.boolean_full_retrieve(
            sf, must=["merge"], must_not=["vector"], filter_terms=["join"]),
        "ft_numeric_range_docs": lambda sf: ft.numeric_range_retrieve(
            sf, "n_chars", 100, 300, filter_terms=["merge"]),
        "ft_ts_range_docs": lambda sf: ft.ts_range_retrieve(
            sf, "2026-01-01T00:02:00", "2026-01-01T00:05:00", filter_terms=["merge"]),
        "ft_fuzzy_docs": lambda sf: ft.fuzzy_retrieve(sf, "merge~1"),
        "ft_delete_requery": lambda sf: ft.delete_requery(
            sf, delete_terms=["vector"], query_terms=["merge"]),
        "ft_parser_numeric_range": lambda sf: ft.parser_numeric_range_docs(
            sf, "merge n_chars:[100 TO 200]"),
        "ft_mm_spec_docs": lambda sf: ft.mm_spec_retrieve(
            sf, ["merge", "join", "vector", "sort"], "2<-25%"),
        "ft_min_should_match": lambda sf: ft.min_should_match_retrieve(
            sf, ["merge", "join", "vector"], mm=2),
        "ft_mm_with_must": lambda sf: ft.min_should_match_retrieve(
            sf, ["vector", "join", "sort"], mm=2, must=("merge",)),
        "ft_sorted_by_field": lambda sf: ft.sorted_by_field_topk(sf, ["spark"], "n_chars", k=10),
        "ft_index_sorted_topk": lambda sf: ft.index_sorted_topk(
            sf, ["merge", "vector"], "n_chars", k=10),
        "ft_span_near_docs": lambda sf: ft.span_near_retrieve(
            sf, ["merge", "vector"], slop=3, in_order=False),
        "ft_span_near_ordered": lambda sf: ft.span_near_retrieve(
            sf, ["merge", "vector"], slop=5, in_order=True),
        "ft_span_first_docs": lambda sf: ft.span_first_retrieve(sf, "merge", end=8),
        "ft_span_position_range": lambda sf: ft.span_position_range_retrieve(
            sf, "merge", start=3, end=9),
        "ft_span_payload_check": lambda sf: ft.span_payload_check_docs(
            sf, "merge", payload=3, mod=5),
        "ft_span_or_near": lambda sf: ft.span_or_near_retrieve(
            sf, [["merge", "join"], "vector"], slop=4, in_order=False),
        "ft_phrase_wildcard": lambda sf: ft.phrase_wildcard_retrieve(
            sf, lead="merge", prefix="v"),
        "ft_span_nested": lambda sf: ft.span_nested_retrieve(
            sf, inner=("merge", "join"), inner_slop=2,
            outer_term="vector", outer_slop=3),
        "ft_span_multiterm": lambda sf: ft.span_multiterm_near_retrieve(
            sf, pattern="s*m", other="sort", slop=4, in_order=False),
        "ft_span_not_docs": lambda sf: ft.span_not_retrieve(
            sf, "vector", "merge", pre=2, post=2),
        "ft_surround_query": lambda sf: ft.surround_docs(
            sf, "3W(s*, join) OR (4N(vector, stream) NOT big)"),
        "ft_span_containing": lambda sf: ft.span_containing_retrieve(
            sf, "merge", "vector", 5, "join"),
        "ft_span_within": lambda sf: ft.span_within_retrieve(
            sf, "merge", "vector", 5, "join"),
        "ft_synonym_topk": lambda sf: ft.synonym_topk(sf, ["merge", "sort"], k=10),
        "ft_dismax_topk": lambda sf: ft.dismax_topk(sf, ["merge", "join", "window"], 0.3, k=10),
        "ft_edismax_pf2": lambda sf: ft.edismax_pf2_topk(sf, ["merge", "join", "vector"], k=10),
        "ft_freshness_boost": lambda sf: ft.freshness_boost_topk(
            sf, ["merge", "join"], m=1e-6, k=10),
        "ft_rerank_topk": lambda sf: ft.rerank_topk(
            sf, ["merge", "join"], ["vector"], weight=2.0, top_n=60, k=10),
        "ft_common_terms_topk": lambda sf: ft.common_terms_topk(
            sf, ["merge", "join", "vector"], max_df_frac=0.55, k=10),
        "ft_spell_suggest": lambda sf: ft.spell_suggest(sf, "mergee", max_suggestions=5),
        "ft_spell_more_popular": lambda sf: ft.spell_suggest_more_popular(
            sf, "part", max_suggestions=5, max_edits=2),
        "ft_spell_not_in_index": lambda sf: ft.spell_when_not_in_index(
            sf, terms=("merge", "mergee"), max_suggestions=5, max_edits=2),
        "ft_auto_correct_search": lambda sf: ft.auto_correct_search(
            sf, terms=("mergee", "vector"), k=10),
        "ft_word_break": lambda sf: ft.word_break_suggest(sf, "streamline"),
        "ft_query_elevation": lambda sf: ft.elevation_topk(
            sf, ["merge", "join"], elevated=[17, 4], excluded=[2], k=10),
        "ft_prefix_suggest": lambda sf: ft.prefix_suggest(sf, "s", k=5),
        "ft_context_suggest": lambda sf: ft.context_suggest(
            sf, prefix="s", context_lang="en", k=5),
        "ft_infix_suggest": lambda sf: ft.infix_suggest(sf, "or", k=5),
        "ft_blended_infix": lambda sf: ft.blended_infix_suggest(sf, "or", k=5),
        "ft_docdict_suggest": lambda sf: ft.document_dict_suggest(sf, prefix="s", k=5),
        "ft_wildcard_topterms": lambda sf: ft.wildcard_topterms_retrieve(sf, prefix="s", top_n=2),
        "ft_terms_qparser": lambda sf: ft.terms_qparser_docs(sf, "lang", ("en", "fr")),
        "luke_index_stats": ft.luke_index_stats,
        "luke_top_terms": lambda sf: ft.luke_top_terms(sf, k=10),
        "ft_fuzzy_suggest": lambda sf: ft.fuzzy_suggest(sf, "stram", k=5),
        "ft_free_text_suggest": lambda sf: ft.free_text_suggest(sf, "merge", k=10),
        "ft_spell_collate": lambda sf: ft.spell_collate(sf, ("mergee", "sortt")),
        "facet_intervals": rel.facet_intervals,
        "ft_term_vector": lambda sf: ft.term_vector(sf, doc_id=3),
        "ft_tv_component": lambda sf: ft.tv_component(sf, "vector", max_docs=20),
        "ft_fielded_search": lambda sf: ft.fielded_retrieve(
            sf, must=["merge"], dv_filters={"lang": "en", "source": ["src1", "src2", "src3"]}),
        "ft_terms_enum": lambda sf: ft.terms_enum(sf, "s", limit=20),
        "ft_terms_regex": lambda sf: ft.terms_enum(sf, "s", limit=20, regex="s.*a.*"),
        "composite_id_routing": lambda sf: ft.composite_id_routing(sf, n_shards=8),
        "ft_termfreq_topk": lambda sf: ft.termfreq_topk(sf, "merge", k=20),
        "ft_function_values": lambda sf: ft.function_values(sf, "merge", k=20),
        "ft_strdist_sort": lambda sf: ft.strdist_sort(
            sf, target="src1", field="source", k=30),
        "ft_atomic_update_rtg": lambda sf: ft.atomic_update_rtg(sf, [7, 123, 400]),
        "ft_tlog_rtg": ft.tlog_rtg,
        # --- Solr request-handler surface (SURVEY §2.11) ---
        "solr_select_docs": solrapi.solr_select_docs,
        "solr_field_analysis": lambda sf: solrapi.field_analysis(sf, max_doc_id=5),
        "solr_select_scored": solrapi.solr_select_scored,
        "solr_select_dismax": solrapi.solr_select_dismax,
        "solr_select_facets": solrapi.solr_select_facets,
        "solr_select_stats": solrapi.solr_select_stats,
        "solr_select_highlight": solrapi.solr_select_highlight,
        # --- streaming-expression TEXT language (SURVEY §2.11/§2.8) ---
        "stream_expr_rollup": streamexpr.stream_expr_rollup,
        "stream_expr_top": streamexpr.stream_expr_top,
        "stream_expr_having_unique": streamexpr.stream_expr_having_unique,
        "stream_expr_join": streamexpr.stream_expr_join,
        "stream_expr_complement": streamexpr.stream_expr_complement,
        "stream_expr_facet": streamexpr.stream_expr_facet,
        "stream_expr_stats": streamexpr.stream_expr_stats,
        "stream_expr_describe": streamexpr.stream_expr_describe,
        "stream_expr_select_eval": streamexpr.stream_expr_select_eval,
        "stream_expr_timeseries": streamexpr.stream_expr_timeseries,
        "stream_expr_moving_avg": streamexpr.stream_expr_moving_avg,
        "stream_expr_diff": streamexpr.stream_expr_diff,
        "stream_expr_corr": streamexpr.stream_expr_corr,
        "stream_expr_train": streamexpr.stream_expr_train,
        "stream_expr_features": streamexpr.stream_expr_features,
        "stream_expr_timeseries_metrics": streamexpr.stream_expr_timeseries_metrics,
        "stream_expr_select_strings": streamexpr.stream_expr_select_strings,
        "stream_expr_classify": streamexpr.stream_expr_classify,
        "stream_expr_knn": streamexpr.stream_expr_knn,
        "stream_expr_significant_terms": streamexpr.stream_expr_significant_terms,
        "stream_expr_reduce": streamexpr.stream_expr_reduce,
        "stream_expr_score_nodes": streamexpr.stream_expr_score_nodes,
        "stream_expr_shortest_path": streamexpr.stream_expr_shortest_path,
        "stream_expr_let_math": streamexpr.stream_expr_let_math,
        "stream_expr_cov_percentile": streamexpr.stream_expr_cov_percentile,
        "stream_expr_cartesian_analyze": streamexpr.stream_expr_cartesian_analyze,
        "stream_expr_update": streamexpr.stream_expr_update,
        "stream_expr_random": streamexpr.stream_expr_random,
        "stream_expr_hist": streamexpr.stream_expr_hist,
        "stream_expr_regress": streamexpr.stream_expr_regress,
        "stream_expr_fetch": streamexpr.stream_expr_fetch,
        "stream_expr_merge": streamexpr.stream_expr_merge,
        # --- TopicStream / Replicator (SURVEY §2.8 / §2.1) ---
        "topic_stream_poll": lambda sf: __import__(
            "lucene_solr_ray.functions.topic", fromlist=["topic_poll_batches"]
        ).topic_poll_batches(sf, terms=("merge",), batch_size=100, n_polls=2),
        "replica_search": lambda sf: __import__(
            "lucene_solr_ray.state.replica", fromlist=["replica_retrieve"]
        ).replica_retrieve(sf, terms=("vector",)),
        "ft_snapshot_restore": lambda sf: __import__(
            "lucene_solr_ray.state.replica", fromlist=["snapshot_restore_retrieve"]
        ).snapshot_restore_retrieve(sf, terms=("vector",), delete_terms=("merge",)),
        # --- streaming-expression algebra (SURVEY §2.8) ---
        "select_having": rel.select_having,
        "rollup_agg": rel.rollup_agg,
        "stats_global": rel.stats_global,
        "rank_top": rel.rank_top,
        "unique_stream": rel.unique_stream,
        "hash_join": rel.hash_join,
        "fetch_enrich": rel.fetch_enrich,
        "left_outer_join": rel.left_outer_join,
        "tochild_block_join": rel.tochild_block_join,
        "semi_join": rel.semi_join_customers,
        "anti_join": rel.anti_join_customers,
        "merge_sorted": rel.merge_sorted_names,
        "cartesian_explode": rel.cartesian_explode,
        "export_sorted": rel.export_sorted,
        "export_jsonl": rel.export_jsonl,
        "export_csv": rel.export_csv,
        # --- spatial / expressions (SURVEY §2.6 aux) ---
        "geo_bbox_dist": geo.geo_bbox_dist,
        "geo_filt": geo.geo_filt,
        "geo_annulus_docs": lambda sf: geo.geo_annulus_docs(
            sf, inner_km=2000, outer_km=6000),
        "geo_nearest_topk": lambda sf: geo.geo_nearest_topk(sf, k=25),
        "geo_polygon_docs": geo.geo_polygon_docs,
        "geo_polygon_concave_docs": geo.geo_polygon_concave_docs,
        "geo_polygon_holes_docs": geo.geo_polygon_holes_docs,
        "shape_bbox_relation": geo.shape_bbox_relation,
        "shape_polygon_relation": geo.shape_polygon_relation,
        "shape_triangle_relation": geo.shape_triangle_relation,
        "geo_heatmap": geo.geo_heatmap,
        "point_bbox_docs": lambda sf: geo.point_bbox_query(sf, (-30.0, 40.0, -100.0, 50.0)),
        "expression_sort": expr.expression_sort,
        "frange_filter": expr.frange_filter,
        "scale_map_function": expr.scale_map_function,
        # --- LTR / classification (SURVEY §2.6/§2.7 aux) ---
        "ltr_linear_rescore": ltr.ltr_linear_rescore,
        "ltr_minmax_rescore": ltr.ltr_minmax_rescore,
        "ltr_ensemble_rescore": ltr.ltr_ensemble_rescore,
        "ltr_feature_log": lambda sf: ltr.feature_log(sf, ["merge", "sort"], 20),
        "ltr_trees_rescore": ltr.ltr_trees_rescore,
        "ltr_bm25_rescore": ltr.bm25_rescore,
        "knn_classify": classify.knn_classify,
        "nb_classify": classify.nb_classify,
        # --- facets / aggs (SURVEY §2.7) ---
        "taxonomy_facets": rel.taxonomy_facets,
        "taxonomy_assoc_facets": rel.taxonomy_assoc_facets,
        "facet_terms": rel.facet_terms,
        "facet_stats_ext": rel.stats_extended,
        "stats_moments": rel.stats_moments,
        "props_json_facet": lambda sf: rel.props_json_facet(sf, key="k", bucket=10),
        "enum_field_sort": rel.enum_field_sort,
        "range_facet_other": lambda sf: rel.range_facet_other(
            sf, "n_chars", start=100, end=400, gap=100),
        "facet_multiselect_ex": lambda sf: rel.facet_multiselect_ex(sf),
        "facet_allbuckets": lambda sf: rel.facet_allbuckets(sf, top=3),
        "group_facet_counts": lambda sf: rel.group_facet_counts(
            sf, facet_field="lang", group_field="source", min_chars=200),
        "facet_missing_bucket": lambda sf: rel.facet_missing_bucket(sf, min_chars=200),
        "uniqueblock_facet": lambda sf: rel.uniqueblock_facet(sf, min_qty=25),
        "sampled_facets": lambda sf: rel.sampled_facets(sf, pct=20),
        "timeseries_facet": rel.timeseries_facet,
        "timeseries_tz_facet": lambda sf: rel.timeseries_tz_facet(sf, tz_offset_min=330),
        "windowed_topk_types": lambda sf: rel.windowed_topk_types(sf, k=3),
        "value_range_facet": lambda sf: rel.value_range_facet(sf, width_cents=2500),
        "facet_unique_users": rel.facet_unique_users,
        "value_outliers": lambda sf: rel.value_outliers(sf, n_sigma=3),
        "daily_unique_users": rel.daily_unique_users,
        "user_ltv_topk": lambda sf: rel.user_ltv_topk(sf, k=20),
        "asof_join": win.asof_join,
        "cohort_retention": win.cohort_retention,
        "asof_join_tolerance": lambda sf: win.asof_join(
            sf, tolerance_us=3_600_000_000),
        "session_window": lambda sf: win.session_window(sf, gap_minutes=30),
        "sliding_window_agg": lambda sf: win.sliding_window_agg(sf, preceding=2),
        "range_join_bands": win.range_join_bands,
        "facet_queries": rel.facet_queries,
        "pivot_facets": rel.pivot_facets,
        "scored_join_topk": lambda sf: rel.scored_join_topk(sf, k=20),
        "scored_join_avg": lambda sf: rel.scored_join_modes(sf, mode="avg", k=20),
        "scored_join_total": lambda sf: rel.scored_join_modes(sf, mode="total", k=20),
        "significant_terms": rel.significant_terms,
        "facet_join_domain": rel.facet_join_domain,
        "facet_filter_domain": lambda sf: rel.facet_filter_domain(
            sf, term="merge", min_chars=300),
        "classifier_pr_points": classify.classifier_pr_points,
        "relatedness_facets": rel.relatedness_facets,
        "collapse_top_order": rel.collapse_top_order,
        "collapse_min_field": rel.collapse_min_field,
        "stats_dates": rel.stats_dates,
        "grouping_topk": lambda sf: rel.grouping_topk(sf, k=2),
        "grouping_by_query": lambda sf: rel.grouping_by_query(sf, k=3),
        "expand_collapsed": lambda sf: rel.expand_collapsed(sf, page_size=20, expand_rows=2),
        "percentile_disc": rel.percentile_disc,
        "unique_counts": rel.unique_counts,
        "facet_nested": rel.facet_nested,
        "cursor_mark_pages": rel.cursor_mark_pages,
    }


_CENTS = "CAST(FLOOR({x}*100+0.5) AS BIGINT)"


def _ft_oracle():
    from lucene_solr_ray.functions import ft_oracle

    return ft_oracle


def _data_oracle():
    from lucene_solr_ray.functions import data_oracle

    return data_oracle

# the 33-word English stopword list as a SQL list literal (analysis.py)
from lucene_solr_ray.analysis import STOPWORDS as _STOPWORDS

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(_STOPWORDS)) + "]"


def _logit_sql(mode: str, label: str = "merge", iters: int = 3) -> str:
    """Unrolled exact-int SQL replica of classify.text_logit_train /
    text_logit_classify: one CTE layer per GD iteration; DuckDB BIGINT
    // truncates toward zero == the engine's _logit_tdiv; the single
    float op per doc (sigmoid -> floor(p*1e6+0.5)) is written with the
    identical formula."""
    from lucene_solr_ray.functions.classify import LOGIT_TERMS

    terms = LOGIT_TERMS
    m = len(terms)
    split = "regexp_split_to_array(text, '\\s+')"
    xs = ", ".join(
        f"CASE WHEN list_contains(sp, '{t}') THEN 1 ELSE 0 END AS x{j}"
        for j, t in enumerate(terms))
    ctes = [
        f"d AS (SELECT doc_id, CASE WHEN list_contains(sp, '{label}') "
        f"THEN 1 ELSE 0 END AS y, {xs} "
        f"FROM (SELECT doc_id, {split} AS sp FROM documents))",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(m))
        + ", CAST(0 AS BIGINT) AS wb)",
    ]
    z = " + ".join(f"x{j}*w{j}" for j in range(m)) + " + wb"
    for k in range(1, iters + 1):
        wcols = ", ".join(f"w{j}" for j in range(m))
        xcols = ", ".join(f"x{j}" for j in range(m))
        ctes.append(
            f"r{k} AS (SELECT {wcols}, wb, {xcols}, "
            f"CAST(FLOOR(1.0/(1.0 + EXP(-(({z}) * 1e-6)))*1000000 + 0.5) "
            f"AS BIGINT) - y*1000000 AS r FROM d CROSS JOIN w{k-1})")
        ups = ", ".join(
            f"CAST(MIN(w{j}) - SUM(r*x{j}) // COUNT(*) AS BIGINT) AS w{j}"
            for j in range(m))
        ctes.append(
            f"w{k} AS (SELECT {ups}, "
            f"CAST(MIN(wb) - SUM(r) // COUNT(*) AS BIGINT) AS wb FROM r{k})")
    with_sql = "WITH " + ", ".join(ctes)
    if mode == "train":
        rows = " UNION ALL ".join(
            f"SELECT '{t}' AS feature, w{j} AS weight_micro FROM w{iters}"
            for j, t in enumerate(terms))
        rows += f" UNION ALL SELECT '__bias__' AS feature, wb AS weight_micro FROM w{iters}"
        return f"{with_sql} {rows}"
    if mode == "pr":
        ths = (100000, 300000, 500000, 700000, 900000)
        scored = (f"{with_sql}, s AS (SELECT y, CAST(FLOOR(1.0/(1.0 + "
                  f"EXP(-(({z}) * 1e-6)))*1000000 + 0.5) AS BIGINT) AS pm "
                  f"FROM d CROSS JOIN w{iters})")
        rows = " UNION ALL ".join(
            f"SELECT CAST({t} AS BIGINT) AS threshold, tp, fp, fn, "
            f"CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 // (tp + fp) END AS precision_micro, "
            f"CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000000 // (tp + fn) END AS recall_micro "
            f"FROM (SELECT CAST(SUM(CASE WHEN pm >= {t} AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
            f"CAST(SUM(CASE WHEN pm >= {t} AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
            f"CAST(SUM(CASE WHEN pm < {t} AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn FROM s)"
            for t in ths)
        return f"{scored} {rows}"
    return (
        f"{with_sql} SELECT doc_id, prob_micro, "
        f"CASE WHEN prob_micro >= 500000 THEN 1 ELSE 0 END AS predicted "
        f"FROM (SELECT doc_id, CAST(FLOOR(1.0/(1.0 + EXP(-(({z}) * 1e-6)))"
        f"*1000000 + 0.5) AS BIGINT) AS prob_micro "
        f"FROM d CROSS JOIN w{iters}) ORDER BY doc_id")


def _auto_correct_oracle(terms=("mergee", "vector"), k: int = 10) -> str:
    """Oracle for ft_auto_correct_search: the correction is re-derived in
    DuckDB over the closed corpus vocabulary (distance asc, df desc,
    term asc — the DirectSpellChecker order), asserted sf-invariant like
    the other generated maps, then the corrected query's BM25 fold runs
    through the standard float32 oracle with the collation constant
    alongside."""
    import duckdb

    corrections = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        fixed = []
        for qt in terms:
            row = con.sql(
                "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
                "trim(text), '\\s+')) AS x FROM "
                f"read_parquet('/root/testdata/{sf}/documents.parquet') "
                "WHERE trim(text) <> ''), "
                "vocab AS (SELECT x AS term, COUNT(DISTINCT doc_id) AS df "
                f"FROM toks WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x) "
                "SELECT term FROM ("
                f"SELECT term, 0 AS d, df FROM vocab WHERE term = '{qt}' "
                "UNION ALL "
                f"SELECT term, levenshtein(term, '{qt}') AS d, df FROM vocab "
                f"WHERE levenshtein(term, '{qt}') BETWEEN 1 AND 2 "
                f"AND NOT EXISTS (SELECT 1 FROM vocab v2 WHERE v2.term = '{qt}')"
                ") ORDER BY d, df DESC, term LIMIT 1"
            ).fetchall()
            fixed.append(row[0][0] if row else qt)
        con.close()
        corrections[sf] = tuple(fixed)
    assert len(set(corrections.values())) == 1, corrections
    corrected = list(corrections["sf0.01"])
    collation = " ".join(corrected).replace("'", "''")
    inner = _ft_oracle().bm25_topk_sql([("ac-1", corrected, "or")], k=k)
    return (f"SELECT '{collation}' AS collation, rank, doc_id "
            f"FROM ({inner}) ORDER BY rank")


def oracle_sql() -> dict[str, str]:
    c = _CENTS.format
    split = "regexp_split_to_array(text, '\\s+')"
    ft_stats_parts = []
    for t in FT_STATS_TERMS:
        ft_stats_parts.append(
            f"SELECT '{t}' AS term, "
            f"CAST(COUNT(CASE WHEN list_contains(sp, '{t}') THEN 1 END) AS BIGINT) AS df, "
            f"CAST(COALESCE(SUM(len(list_filter(sp, x -> x = '{t}'))), 0) AS BIGINT) AS cf "
            f"FROM (SELECT {split} AS sp FROM documents)"
        )
    return {
        "ft_term_docs": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, '{FT_TERM}') ORDER BY doc_id"
        ),
        # PayloadScoreQuery(sum): payload of token at 0-based pos i is
        # (md5_64(tok) % 5 + i % 5) % 5 + 1 — same annotated view the
        # engine builds and parses back via DelimitedPayloadTokenFilter
        "ft_payload_score": (
            "WITH toks AS (SELECT doc_id, "
            f"unnest({split}) AS tok, "
            f"CAST(generate_subscripts({split}, 1) - 1 AS BIGINT) AS pos "
            "FROM documents) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY payload_sum DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, payload_sum FROM ("
            "SELECT doc_id, CAST(SUM((md5_number_upper(tok) % 5 + pos % 5) % 5 + 1) AS BIGINT) AS payload_sum "
            "FROM toks WHERE tok = 'merge' GROUP BY doc_id) "
            "ORDER BY rank LIMIT 10"
        ),
        "ft_payload_function": (
            "WITH toks AS (SELECT doc_id, "
            f"unnest({split}) AS tok, "
            f"CAST(generate_subscripts({split}, 1) - 1 AS BIGINT) AS pos "
            "FROM documents) "
            "SELECT doc_id, CAST(MAX((md5_number_upper(tok) % 5 + pos % 5) % 5 + 1) AS BIGINT) AS max_payload, "
            "CAST(SUM((md5_number_upper(tok) % 5 + pos % 5) % 5 + 1) * 1000 // COUNT(*) AS BIGINT) AS avg_payload_milli "
            "FROM toks WHERE tok = 'merge' GROUP BY doc_id ORDER BY doc_id"
        ),
        # CoveringQuery: long docs (n_chars >= 300) need 2 of 3 terms
        "ft_covering_query": (
            "WITH m AS (SELECT doc_id, n_chars, "
            f"CAST(list_contains({split}, 'merge') AS BIGINT) "
            f"+ CAST(list_contains({split}, 'join') AS BIGINT) "
            f"+ CAST(list_contains({split}, 'vector') AS BIGINT) AS n_match FROM documents) "
            "SELECT doc_id FROM m WHERE n_match >= 1 + CAST(n_chars >= 300 AS BIGINT) "
            "ORDER BY doc_id"
        ),
        # DrillSideways: lang counts exclude the lang drill (sideways),
        # source counts include all drills (down)
        "drill_sideways": (
            "SELECT dim, val, n_docs FROM ("
            "SELECT 'lang' AS dim, lang AS val, CAST(COUNT(*) AS BIGINT) AS n_docs "
            f"FROM documents WHERE list_contains({split}, 'merge') GROUP BY lang "
            "UNION ALL "
            "SELECT 'source', source, CAST(COUNT(*) AS BIGINT) "
            f"FROM documents WHERE list_contains({split}, 'merge') AND lang = 'en' "
            "GROUP BY source) ORDER BY dim, val"
        ),
        "ft_and_docs": (
            "SELECT doc_id FROM documents WHERE "
            + " AND ".join(f"list_contains({split}, '{t}')" for t in FT_AND_TERMS)
            + " ORDER BY doc_id"
        ),
        "ft_or_docs": (
            "SELECT doc_id FROM documents WHERE "
            + " OR ".join(f"list_contains({split}, '{t}')" for t in FT_OR_TERMS)
            + " ORDER BY doc_id"
        ),
        # codec upgrade must round-trip postings exactly -> same match set
        "ft_upgrade_requery": (
            "SELECT doc_id FROM documents WHERE "
            + " OR ".join(f"list_contains({split}, '{t}')" for t in FT_OR_TERMS)
            + " ORDER BY doc_id"
        ),
        "ft_term_stats": " UNION ALL ".join(ft_stats_parts),
        # BM25-scored entries: rank-only outputs; the SQL replicates the
        # pinned float32 narrowing order (DuckDB FLOAT is IEEE float32),
        # generated from the same constants the engine scores with
        # (functions/ft_oracle.py; gap bound in tests/test_ft_oracle_sql.py).
        "ft_bm25_topk": _ft_oracle().bm25_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_lmdirichlet_topk": _ft_oracle().lmdirichlet_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_gl2_topk": _ft_oracle().dfr_gl2_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_spl_topk": _ft_oracle().ib_spl_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_ine_topk": _ft_oracle().dfr_ine_topk_sql(FT_BM25_QUERIES, k=10),
        # tuned BM25Similarity(k1, b): constants from the engine class
        "ft_bm25_tuned_topk": _ft_oracle().bm25_topk_sql(
            FT_BM25_QUERIES, k=10,
            k1=__import__("lucene_solr_ray.similarity",
                          fromlist=["BM25Tuned"]).BM25Tuned.K1,
            b=__import__("lucene_solr_ray.similarity",
                         fromlist=["BM25Tuned"]).BM25Tuned.B),
        "ft_dfi_topk": _ft_oracle().dfi_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_axiomatic_topk": _ft_oracle().axiomatic_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_sweetspot_topk": _ft_oracle().sweetspot_topk_sql(FT_BM25_QUERIES, k=10),
        "ft_combined_field_topk": _ft_oracle().combined_field_sql(("merge", "src3"), k=10),
        "ft_multifield_dismax": _ft_oracle().multifield_dismax_sql(k=10),
        "ft_multifield_sum": _ft_oracle().multifield_dismax_sql(k=10, combine="sum"),
        "ft_multifield_qf_boost": _ft_oracle().multifield_dismax_sql(
            k=10, boosts={"title": 0.3, "body": 3.0}),
        "ft_multifield_fielded_parse": _ft_oracle().multifield_dismax_sql(
            queries=__import__("lucene_solr_ray.functions.fulltext",
                               fromlist=["fielded_queries_as_term_sets"]
                               ).fielded_queries_as_term_sets(),
            k=10, combine="sum"),
        "ft_multifield_dismax_tie": _ft_oracle().multifield_dismax_sql(
            k=10, tie_breaker=0.3),
        "ft_multifield_title_phrase": _ft_oracle().multifield_title_phrase_sql(
            ("spark", "table"), k=10),
        "ft_unified_highlight": _ft_oracle().unified_highlight_sql(
            ["merge", "join", "vector"], k_docs=10),
        "ft_feature_boost_topk": _ft_oracle().feature_boost_sql(
            ["merge", "join"], k=10),
        # DiversifiedTopDocsCollector: per-key ROW_NUMBER cap in score
        # order, then global rank
        "ft_diversified_topk": _ft_oracle().diversified_sql(
            ["merge", "join"], key="source", max_per_key=2, k=10),
        # FeatureField newLogQuery / newSigmoidQuery (exponent 2): same
        # BM25 fold, different trailing float32 feature clause
        "ft_feature_log_topk": _ft_oracle().feature_boost_sql(
            ["merge", "join"], k=10, func="log", weight=0.4, pivot=1.0),
        "ft_feature_sigmoid_topk": _ft_oracle().feature_boost_sql(
            ["merge", "join"], k=10, func="sigm"),
        "ft_boost_query_topk": _ft_oracle().boost_query_sql(
            ["merge", "join"], k=10),
        "ft_boosting_demote": _ft_oracle().boosting_demote_sql(
            ["merge", "join"], demote_term="vector", demote_factor=0.5, k=10),
        # termfreq()/docfreq()/idf()/norm() value sources in one row
        "ft_function_values": _ft_oracle().function_values_sql("merge", k=20),
        # strdist(source, 'src1', edit) as the sort
        "ft_strdist_sort": (
            "SELECT doc_id, CAST(levenshtein(source, 'src1') AS BIGINT) AS dist "
            "FROM documents ORDER BY dist, doc_id LIMIT 30"
        ),
        # hybrid sparse+dense RRF: exact-int reciprocal-rank combine
        "hybrid_rrf_topk": _ft_oracle().hybrid_rrf_sql(
            ("merge", "vector"), anchor_vec=0, n_each=50, k=10),
        # ReqOptSumScorer / ReqExclScorer boolean scoring shapes
        "ft_req_opt_topk": _ft_oracle().req_opt_excl_sql(
            "merge", "vector", mode="opt", qid="ro-1", k=10),
        "ft_req_excl_topk": _ft_oracle().req_opt_excl_sql(
            "merge", "vector", mode="excl", qid="re-1", k=10),
        "ft_fuzzy_like_this": _ft_oracle().fuzzy_like_this_sql(
            ("merg", "vectr"), max_edits=1, max_num_terms=6, k=10),
        "ft_intervals_containing": _ft_oracle().intervals_containing_sql(
            "merge", "join", "sort", max_width=8),
        "ft_phrase_topk": _ft_oracle().phrase_topk_sql(["merge", "join"], k=10),
        "ft_dismax_topk": _ft_oracle().dismax_topk_sql(["merge", "join", "window"], 0.3, k=10),
        "ft_edismax_pf2": _ft_oracle().edismax_pf2_sql(["merge", "join", "vector"], k=10),
        "ft_freshness_boost": _ft_oracle().freshness_boost_sql(["merge", "join"], m=1e-6, k=10),
        "ft_rerank_topk": _ft_oracle().rerank_topk_sql(
            ["merge", "join"], ["vector"], weight=2.0, top_n=60, k=10),
        "ft_common_terms_topk": _ft_oracle().common_terms_topk_sql(
            ["merge", "join", "vector"], max_df_frac=0.55, k=10),
        "ft_more_like_this": _ft_oracle().more_like_this_sql(0, 8, 10),
        "ft_word_break": _ft_oracle().word_break_sql("streamline"),
        "ft_synonym_topk": _ft_oracle().synonym_topk_sql(["merge", "sort"], k=10),
        "ft_query_elevation": _ft_oracle().elevation_topk_sql(
            ["merge", "join"], elevated=[17, 4], excluded=[2], k=10),
        "ltr_bm25_rescore": _ft_oracle().ltr_bm25_rescore_sql(["merge", "sort"], 100, 20),
        "ltr_feature_log": _ft_oracle().feature_log_sql(["merge", "sort"], 20),
        "ft_prefix_docs": (
            f"SELECT doc_id FROM documents WHERE len(list_filter({split}, "
            f"x -> x LIKE 's%' AND NOT list_contains({_STOP_SQL}, x))) > 0 ORDER BY doc_id"
        ),
        "ft_wildcard_docs": (
            f"SELECT doc_id FROM documents WHERE len(list_filter({split}, "
            f"x -> regexp_full_match(x, 's.*m') AND NOT list_contains({_STOP_SQL}, x))) > 0 ORDER BY doc_id"
        ),
        "ft_regexp_docs": (
            f"SELECT doc_id FROM documents WHERE len(list_filter({split}, "
            f"x -> regexp_full_match(x, '(stream|spark)') AND NOT list_contains({_STOP_SQL}, x))) > 0 "
            "ORDER BY doc_id"
        ),
        "ft_range_docs": (
            f"SELECT doc_id FROM documents WHERE len(list_filter({split}, "
            f"x -> x >= 'key' AND x < 'part' AND NOT list_contains({_STOP_SQL}, x))) > 0 ORDER BY doc_id"
        ),
        "ft_phrase_docs": (
            "SELECT doc_id FROM documents WHERE "
            "regexp_matches(text, '\\bmerge\\s+join\\b') ORDER BY doc_id"
        ),
        "ft_multi_phrase_docs": (
            "SELECT doc_id FROM documents WHERE "
            "regexp_matches(text, '\\b(merge|join)\\s+vector\\b') ORDER BY doc_id"
        ),
        "ft_external_file_sort": (
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY (doc_id * 7919) % 100000 DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, CAST((doc_id * 7919) % 100000 AS BIGINT) AS eff_milli FROM documents "
            "ORDER BY eff_milli DESC, doc_id LIMIT 20"
        ),
        # JSON update: deletes = doc_id % 100 == 0, adds = 3 ids above the
        # corpus space whose text contains the query term
        "ft_update_json": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'merge') "
            "AND doc_id % 100 != 0 "
            "UNION ALL SELECT UNNEST([10000000, 10000001, 10000002]) "
            "ORDER BY doc_id"
        ),
        # TTL reap: adapter pins ts = epoch + doc_id sec, so expiry at
        # ttl=180s == doc_id < 180; survivors matching the query remain
        "ft_doc_expiration": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'merge') "
            "AND doc_id >= 180 ORDER BY doc_id"
        ),
        # MLT interestingTerms: tf * micro-nat idf, exact ints
        "ft_mlt_interesting_terms": (
            f"WITH toks AS (SELECT doc_id, unnest({split}) AS term FROM documents), "
            f"f AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks "
            f"WHERE doc_id = 3 AND NOT list_contains({_STOP_SQL}, term) GROUP BY term), "
            f"dfs AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, term) GROUP BY term), "
            "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents) "
            "SELECT f.term AS term, f.tf AS tf, dfs.df AS df, "
            "f.tf * CAST(FLOOR(ln(1.0 + ((n.n - dfs.df) + 0.5) / (dfs.df + 0.5)) * 1000000.0 + 0.5) AS BIGINT) AS score_micro "
            "FROM f JOIN dfs USING (term), n "
            "ORDER BY score_micro DESC, term LIMIT 8"
        ),
        # "s* join": the prefix slot expands over the same STOP-FILTERED
        # split vocabulary the engine indexes (a raw-text regex would
        # wrongly match stopword bigrams like 'such join' and wrongly
        # reject digit-bearing tokens like 's3 join' — ADVICE r3);
        # adjacency is pos+1 in whitespace positions (FIXTURES)
        "ft_complex_phrase": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            f"a AS (SELECT doc_id, pos FROM toks WHERE term LIKE 's%' "
            f"AND NOT list_contains({_STOP_SQL}, term)), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'join') "
            "SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b "
            "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 ORDER BY doc_id"
        ),
        "ft_query_parser": (
            "SELECT doc_id FROM documents WHERE "
            "regexp_matches(text, '\\bmerge\\s+join\\b') "
            f"AND NOT list_contains({split}, 'vector') AND lang = 'en' ORDER BY doc_id"
        ),
        "ft_boolean_notfilter": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'merge') "
            f"AND list_contains({split}, 'join') AND NOT list_contains({split}, 'vector') "
            "ORDER BY doc_id"
        ),
        "ft_numeric_range_docs": (
            "SELECT doc_id FROM documents WHERE n_chars >= 100 AND n_chars < 300 "
            f"AND list_contains({split}, 'merge') ORDER BY doc_id"
        ),
        "ft_ts_range_docs": (
            "SELECT doc_id FROM documents WHERE "
            "(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id)) >= TIMESTAMP '2026-01-01 00:02:00' "
            "AND (TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id)) < TIMESTAMP '2026-01-01 00:05:00' "
            f"AND list_contains({split}, 'merge') ORDER BY doc_id"
        ),
        "ft_fuzzy_docs": (
            f"SELECT doc_id FROM documents WHERE len(list_filter({split}, "
            f"x -> levenshtein(x, 'merge') <= 1 AND NOT list_contains({_STOP_SQL}, x))) > 0 "
            "ORDER BY doc_id"
        ),
        "ft_delete_requery": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'merge') "
            f"AND NOT list_contains({split}, 'vector') ORDER BY doc_id"
        ),
        "ft_parser_numeric_range": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'merge') "
            "AND n_chars BETWEEN 100 AND 200 ORDER BY doc_id"
        ),
        # "2<-25%" with 4 clauses: n > 2 -> mm = 4 - (4*25)//100 = 3
        "ft_mm_spec_docs": (
            "SELECT doc_id FROM documents WHERE "
            f"(CAST(list_contains({split}, 'merge') AS INT) + "
            f"CAST(list_contains({split}, 'join') AS INT) + "
            f"CAST(list_contains({split}, 'vector') AS INT) + "
            f"CAST(list_contains({split}, 'sort') AS INT)) >= 3 ORDER BY doc_id"
        ),
        "ft_min_should_match": (
            "SELECT doc_id FROM documents WHERE "
            f"(CAST(list_contains({split}, 'merge') AS INT) + "
            f"CAST(list_contains({split}, 'join') AS INT) + "
            f"CAST(list_contains({split}, 'vector') AS INT)) >= 2 ORDER BY doc_id"
        ),
        # mm binds the SHOULD set only; the MUST clause intersects
        "ft_mm_with_must": (
            "SELECT doc_id FROM documents WHERE "
            f"list_contains({split}, 'merge') AND "
            f"(CAST(list_contains({split}, 'vector') AS INT) + "
            f"CAST(list_contains({split}, 'join') AS INT) + "
            f"CAST(list_contains({split}, 'sort') AS INT)) >= 2 ORDER BY doc_id"
        ),
        "export_sorted": (
            "SELECT doc_id, lang, n_chars FROM documents ORDER BY n_chars DESC, doc_id"
        ),
        "export_jsonl": (
            "SELECT doc_id, lang, source FROM documents ORDER BY doc_id"
        ),
        "export_csv": (
            "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"
        ),
        "ft_sorted_by_field": (
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, n_chars FROM documents WHERE "
            f"list_contains({split}, 'spark') ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "ft_index_sorted_topk": (
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, n_chars FROM documents WHERE "
            f"list_contains({split}, 'merge') OR list_contains({split}, 'vector') "
            "ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        # span positions == whitespace ordinality - 1 (FIXTURES: each
        # whitespace token analyzes to exactly one position slot)
        "ft_span_near_docs": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term = 'merge'), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'vector') "
            "SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE abs(a.pos - b.pos) - 1 <= 3 ORDER BY doc_id"
        ),
        "ft_span_near_ordered": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term = 'merge'), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'vector') "
            "SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 5 ORDER BY doc_id"
        ),
        "ft_span_position_range": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)) "
            "SELECT DISTINCT doc_id FROM toks WHERE term = 'merge' "
            "AND pos BETWEEN 3 AND 8 ORDER BY doc_id"
        ),
        # SpanPayloadCheck: payload of position i == (md5_64(tok)%5 + i%5)%5 + 1
        "ft_span_payload_check": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)) "
            "SELECT DISTINCT doc_id FROM toks WHERE term = 'merge' "
            "AND (md5_number_upper(term) % 5 + pos % 5) % 5 + 1 = 3 ORDER BY doc_id"
        ),
        "ft_span_first_docs": (
            f"SELECT doc_id FROM documents WHERE "
            f"list_position({split}, 'merge') BETWEEN 1 AND 8 ORDER BY doc_id"
        ),
        # maxgaps(4, ordered(merge, join, sort)): exists a < b < c, c-a-2 <= 4
        "ft_intervals_maxgaps": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)) "
            "SELECT DISTINCT a.doc_id FROM toks a "
            "JOIN toks b ON a.doc_id = b.doc_id AND b.term = 'join' AND b.pos > a.pos "
            "JOIN toks c ON a.doc_id = c.doc_id AND c.term = 'sort' AND c.pos > b.pos "
            "WHERE a.term = 'merge' AND c.pos - a.pos - 2 <= 4 ORDER BY a.doc_id"
        ),
        # Lucene MinHash = bottom-k sketch of per-token hashes; overlap count
        "ft_minhash_query": (
            f"WITH toks AS (SELECT doc_id, unnest(list_filter({split}, "
            f"x -> x != '' AND NOT list_contains({_STOP_SQL}, x))) AS tok FROM documents), "
            "th AS (SELECT DISTINCT doc_id, md5_number_upper(tok) AS h FROM toks), "
            "sig AS (SELECT doc_id, h FROM (SELECT doc_id, h, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM th) WHERE rn <= 16), "
            "qt AS (SELECT DISTINCT md5_number_upper(x) AS h FROM unnest("
            "list_filter(regexp_split_to_array("
            "'merge join vector sort stream window group filter', '\\s+'), "
            f"x -> x != '' AND NOT list_contains({_STOP_SQL}, x))) AS u(x)), "
            "qsig AS (SELECT h FROM qt ORDER BY h LIMIT 16) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared "
            "FROM sig JOIN qsig USING (h) GROUP BY doc_id "
            "HAVING COUNT(*) >= 3 ORDER BY doc_id"
        ),
        # surround query 3W(s*, join) OR (4N(vector, stream) NOT big):
        # W -> ordered slop n-1, N -> unordered slop n-1 (DistanceQuery
        # rewrite); s* expands over the closed vocab via LIKE
        "ft_surround_query": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term LIKE 's%'), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'join'), "
            "w1 AS (SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE b.pos > a.pos AND b.pos - a.pos - 1 <= 2), "
            "c AS (SELECT doc_id, pos FROM toks WHERE term = 'vector'), "
            "d AS (SELECT doc_id, pos FROM toks WHERE term = 'stream'), "
            "n1 AS (SELECT DISTINCT c.doc_id AS doc_id FROM c JOIN d ON c.doc_id = d.doc_id "
            "WHERE abs(c.pos - d.pos) - 1 <= 3), "
            "nb AS (SELECT doc_id FROM n1 WHERE doc_id NOT IN "
            f"(SELECT doc_id FROM documents WHERE list_contains({split}, 'big'))) "
            "SELECT DISTINCT doc_id FROM (SELECT doc_id FROM w1 UNION ALL SELECT doc_id FROM nb) "
            "ORDER BY doc_id"
        ),
        # big = SpanNear(merge, vector, slop=5, unordered); spans are ALL
        # qualifying (pa, pb) pairs. containing -> distinct big envelopes
        # holding a 'join'; within -> distinct enclosed 'join' positions.
        "ft_span_containing": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term = 'merge'), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'vector'), "
            "c AS (SELECT doc_id, pos FROM toks WHERE term = 'join'), "
            "pairs AS (SELECT a.doc_id, least(a.pos, b.pos) AS lo, "
            "greatest(a.pos, b.pos) AS hi FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE greatest(a.pos, b.pos) - least(a.pos, b.pos) - 1 <= 5) "
            "SELECT DISTINCT p.doc_id AS doc_id, p.lo AS lo, p.hi AS hi FROM pairs p "
            "JOIN c ON c.doc_id = p.doc_id AND c.pos BETWEEN p.lo AND p.hi "
            "ORDER BY 1, 2, 3"
        ),
        "ft_span_within": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term = 'merge'), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'vector'), "
            "c AS (SELECT doc_id, pos FROM toks WHERE term = 'join'), "
            "pairs AS (SELECT a.doc_id, least(a.pos, b.pos) AS lo, "
            "greatest(a.pos, b.pos) AS hi FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE greatest(a.pos, b.pos) - least(a.pos, b.pos) - 1 <= 5) "
            "SELECT DISTINCT c.doc_id AS doc_id, c.pos AS pos FROM pairs p "
            "JOIN c ON c.doc_id = p.doc_id AND c.pos BETWEEN p.lo AND p.hi "
            "ORDER BY 1, 2"
        ),
        "ft_span_or_near": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term IN ('merge', 'join')), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'vector') "
            "SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE abs(a.pos - b.pos) - 1 <= 4 ORDER BY doc_id"
        ),
        # PhraseWildcardQuery "merge v*": the wildcard slot expands over
        # the STOP-FILTERED indexed vocabulary (same rule as
        # ft_complex_phrase); adjacency = pos+1 in whitespace positions
        "ft_phrase_wildcard": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "a AS (SELECT doc_id, pos FROM toks WHERE term = 'merge'), "
            f"b AS (SELECT doc_id, pos FROM toks WHERE term LIKE 'v%' "
            f"AND NOT list_contains({_STOP_SQL}, term)) "
            "SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b "
            "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 ORDER BY doc_id"
        ),
        # NESTED spanNear: ordered (merge, join) pair with its OWN slop,
        # then vector after the pair's end with the outer slop — each
        # level's gap binds separately (not a flat 3-term total gap)
        "ft_span_nested": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)) "
            "SELECT DISTINCT a.doc_id AS doc_id FROM toks a "
            "JOIN toks b ON a.doc_id = b.doc_id AND b.term = 'join' "
            "AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2 "
            "JOIN toks c ON a.doc_id = c.doc_id AND c.term = 'vector' "
            "AND c.pos > b.pos AND c.pos - b.pos - 1 <= 3 "
            "WHERE a.term = 'merge' ORDER BY a.doc_id"
        ),
        # SpanMultiTermQueryWrapper(wildcard s*m) near 'sort', unordered
        # slop 4: gap = |pos_a - pos_b| - 1; the wildcard slot expands
        # over the stop-filtered vocabulary (LIKE 's%m' == glob s*m)
        "ft_span_multiterm": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            f"a AS (SELECT doc_id, pos FROM toks WHERE term LIKE 's%m' "
            f"AND NOT list_contains({_STOP_SQL}, term)), "
            "b AS (SELECT doc_id, pos FROM toks WHERE term = 'sort') "
            "SELECT DISTINCT a.doc_id AS doc_id FROM a JOIN b ON a.doc_id = b.doc_id "
            "WHERE abs(a.pos - b.pos) - 1 <= 4 ORDER BY doc_id"
        ),
        "ft_span_not_docs": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS term, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "v AS (SELECT doc_id, pos FROM toks WHERE term = 'vector'), "
            "m AS (SELECT doc_id, pos FROM toks WHERE term = 'merge') "
            "SELECT DISTINCT v.doc_id AS doc_id FROM v WHERE NOT EXISTS ("
            "SELECT 1 FROM m WHERE m.doc_id = v.doc_id "
            "AND m.pos BETWEEN v.pos - 2 AND v.pos + 2) ORDER BY doc_id"
        ),
        "ft_spell_suggest": (
            f"WITH toks AS (SELECT doc_id, unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x), "
            "cand AS (SELECT term, CAST(levenshtein(term, 'mergee') AS BIGINT) AS distance, df "
            "FROM vocab WHERE levenshtein(term, 'mergee') BETWEEN 1 AND 2) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY distance, df DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, distance, df FROM cand ORDER BY distance, df DESC, term LIMIT 5"
        ),
        # did-you-mean auto-requery: correction re-derived in SQL,
        # corrected BM25 fold + collation column
        "ft_auto_correct_search": _auto_correct_oracle(("mergee", "vector"), k=10),
        # SUGGEST_WHEN_NOT_IN_INDEX: present terms get zero rows
        "ft_spell_not_in_index": (
            f"WITH toks AS (SELECT doc_id, unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x), "
            "q(query_term) AS (VALUES ('merge'), ('mergee')), "
            "cand AS (SELECT q.query_term, v.term, "
            "CAST(levenshtein(v.term, q.query_term) AS BIGINT) AS distance, v.df "
            "FROM q, vocab v WHERE levenshtein(v.term, q.query_term) BETWEEN 1 AND 2 "
            "AND NOT EXISTS (SELECT 1 FROM vocab x WHERE x.term = q.query_term)) "
            "SELECT query_term, CAST(ROW_NUMBER() OVER (PARTITION BY query_term "
            "ORDER BY distance, df DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, distance, df FROM cand "
            "QUALIFY sugg_rank < 5 ORDER BY query_term, sugg_rank"
        ),
        # onlyMorePopular: keep candidates with df strictly above the
        # query term's own df
        "ft_spell_more_popular": (
            f"WITH toks AS (SELECT doc_id, unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x), "
            "base AS (SELECT df AS bdf FROM vocab WHERE term = 'part'), "
            "cand AS (SELECT term, CAST(levenshtein(term, 'part') AS BIGINT) AS distance, df "
            "FROM vocab, base WHERE levenshtein(term, 'part') BETWEEN 1 AND 2 AND df > base.bdf) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY distance, df DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, distance, df FROM cand ORDER BY distance, df DESC, term LIMIT 5"
        ),
        "ft_prefix_suggest": (
            f"WITH toks AS (SELECT unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(*) AS BIGINT) AS cf FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) AND x LIKE 's%' GROUP BY x) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, cf FROM vocab ORDER BY cf DESC, term LIMIT 5"
        ),
        # ContextQuery: same ranking, cf scoped to the lang='en' context
        "ft_context_suggest": (
            f"WITH toks AS (SELECT unnest({split}) AS x FROM documents WHERE lang = 'en'), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(*) AS BIGINT) AS cf FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) AND x LIKE 's%' GROUP BY x) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, cf FROM vocab ORDER BY cf DESC, term LIMIT 5"
        ),
        "ft_infix_suggest": (
            f"WITH toks AS (SELECT unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(*) AS BIGINT) AS cf FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) AND x LIKE '%or%' GROUP BY x) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, cf FROM vocab ORDER BY cf DESC, term LIMIT 5"
        ),
        "ft_terms_qparser": (
            "SELECT doc_id FROM documents WHERE lang IN ('en', 'fr') ORDER BY doc_id"
        ),
        "ft_leading_wildcard": (
            f"SELECT doc_id FROM documents WHERE len(list_filter({split}, "
            f"x -> x LIKE '%er' AND NOT list_contains({_STOP_SQL}, x))) > 0 ORDER BY doc_id"
        ),
        "ft_tag_dictionary": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS w, "
            f"CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
            f"FROM (SELECT doc_id, {split} AS l FROM documents)), "
            "pairs AS (SELECT a.doc_id, a.w AS w1, b.w AS w2, a.pos "
            "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1) "
            "SELECT doc_id, tag, pos FROM ("
            "SELECT doc_id, 'merge join' AS tag, pos FROM pairs WHERE w1 = 'merge' AND w2 = 'join' "
            "UNION ALL SELECT doc_id, 'join vector', pos FROM pairs WHERE w1 = 'join' AND w2 = 'vector' "
            "UNION ALL SELECT doc_id, 'sort window', pos FROM pairs WHERE w1 = 'sort' AND w2 = 'window') "
            "ORDER BY doc_id, tag, pos"
        ),
        # optimistic concurrency: op 1 applies (v1->2), op 2 conflicts
        # (expected 5, actual 1), op 3 retries doc 1 with STALE v1 ->
        # conflict, op 4 with v2 -> applies; finals read the overlay
        "ft_optimistic_update": (
            "SELECT * FROM (VALUES "
            "(CAST(0 AS BIGINT), CAST(1 AS BIGINT), 'applied', CAST(2 AS BIGINT)), "
            "(1, 2, 'conflict', 1), "
            "(2, 1, 'conflict', 2), "
            "(3, 1, 'applied', 3), "
            "(4, 1, 'final', 800), "
            "(4, 2, 'final', (SELECT CAST(n_chars AS BIGINT) FROM documents WHERE doc_id = 2))"
            ") t(op_idx, doc_id, outcome, value) ORDER BY op_idx, doc_id"
        ),
        "ft_atomic_inc": (
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY val DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, val FROM ("
            "SELECT doc_id, CAST(n_chars + CASE WHEN doc_id % 11 = 0 THEN 5 ELSE 0 END AS BIGINT) AS val "
            f"FROM documents WHERE list_contains({split}, 'join')) "
            "ORDER BY val DESC, doc_id LIMIT 15"
        ),
        # dv-update overlay: doc_id % 7 == 0 -> (doc_id*31) % 1000, else stored
        "ft_dv_update_sort": (
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY val DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, val FROM ("
            "SELECT doc_id, CAST(CASE WHEN doc_id % 7 = 0 THEN (doc_id * 31) % 1000 "
            "ELSE n_chars END AS BIGINT) AS val FROM documents "
            f"WHERE list_contains({split}, 'merge')) "
            "ORDER BY val DESC, doc_id LIMIT 15"
        ),
        "ft_point_in_set": (
            "SELECT doc_id FROM documents WHERE n_chars IN (54, 62, 78, 132) "
            "ORDER BY doc_id"
        ),
        # IndexOrDocValuesQuery: result set is lead AND range; the chosen
        # path replicates the reference's leadCost*8 < rangeCost rule
        "ft_index_or_dv_lead": (
            "WITH lead AS (SELECT doc_id FROM documents WHERE "
            f"list_contains({split}, 'dup')), "
            "rng AS (SELECT doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300) "
            "SELECT l.doc_id AS doc_id, CASE WHEN (SELECT count(*) FROM lead)*8 "
            "< (SELECT count(*) FROM rng) THEN 'docvalues' ELSE 'index' END AS path "
            "FROM lead l JOIN rng r ON l.doc_id = r.doc_id ORDER BY doc_id"
        ),
        "ft_index_or_dv_range": (
            "WITH lead AS (SELECT doc_id FROM documents WHERE "
            f"list_contains({split}, 'merge')), "
            "rng AS (SELECT doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300) "
            "SELECT l.doc_id AS doc_id, CASE WHEN (SELECT count(*) FROM lead)*8 "
            "< (SELECT count(*) FROM rng) THEN 'docvalues' ELSE 'index' END AS path "
            "FROM lead l JOIN rng r ON l.doc_id = r.doc_id ORDER BY doc_id"
        ),
        # MultiRangeQuery: one scan, OR of pushed range predicates
        "ft_multi_range": (
            "SELECT doc_id FROM documents WHERE (n_chars BETWEEN 60 AND 80) "
            "OR (n_chars BETWEEN 150 AND 170) OR (n_chars BETWEEN 240 AND 260) "
            "ORDER BY doc_id"
        ),
        # ('"merge join" | vector) AND NOT prefix(stream) — SQP left-assoc fold
        "ft_simple_query_docs": (
            "SELECT doc_id FROM documents WHERE "
            f"(regexp_matches(text, '\\bmerge\\s+join\\b') OR list_contains({split}, 'vector')) "
            f"AND len(list_filter({split}, x -> x LIKE 'stream%' "
            f"AND NOT list_contains({_STOP_SQL}, x))) = 0 ORDER BY doc_id"
        ),
        # BlendedInfix: weight = cf // (1 + first match position)
        "ft_blended_infix": (
            f"WITH toks AS (SELECT unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(*) AS BIGINT) AS cf FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) AND x LIKE '%or%' GROUP BY x), "
            "m AS (SELECT term, CAST(cf // strpos(term, 'or') AS BIGINT) AS blended_weight, "
            "CAST(strpos(term, 'or') - 1 AS BIGINT) AS match_pos FROM vocab) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY blended_weight DESC, term) - 1 AS BIGINT) "
            "AS sugg_rank, term, blended_weight, match_pos FROM m "
            "ORDER BY sugg_rank LIMIT 5"
        ),
        # Luke /admin/luke per-field overview; text == the index term dict
        "luke_index_stats": (
            f"WITH flat AS (SELECT unnest({split}) AS x FROM documents), "
            f"tok AS (SELECT x FROM flat WHERE NOT list_contains({_STOP_SQL}, x)), "
            "txt AS (SELECT 'text' AS field, CAST(COUNT(DISTINCT x) AS BIGINT) AS n_distinct, "
            "CAST(COUNT(*) AS BIGINT) AS total, "
            "(SELECT x FROM tok GROUP BY x ORDER BY COUNT(*) DESC, x LIMIT 1) AS top_value FROM tok), "
            "lg AS (SELECT 'lang' AS field, CAST(COUNT(DISTINCT lang) AS BIGINT), "
            "CAST(COUNT(*) AS BIGINT), "
            "(SELECT lang FROM documents GROUP BY lang ORDER BY COUNT(*) DESC, lang LIMIT 1) FROM documents), "
            "src AS (SELECT 'source' AS field, CAST(COUNT(DISTINCT source) AS BIGINT), "
            "CAST(COUNT(*) AS BIGINT), "
            "(SELECT source FROM documents GROUP BY source ORDER BY COUNT(*) DESC, source LIMIT 1) FROM documents) "
            "SELECT * FROM txt UNION ALL SELECT * FROM lg UNION ALL SELECT * FROM src"
        ),
        # /admin/luke topTerms: highest-df dictionary terms, term-asc ties
        "luke_top_terms": (
            f"WITH toks AS (SELECT doc_id, unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df "
            f"FROM toks WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x) "
            "SELECT term, df FROM vocab ORDER BY df DESC, term LIMIT 10"
        ),
        "ft_term_vector": (
            f"SELECT x AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM "
            f"(SELECT unnest({split}) AS x FROM documents WHERE doc_id = 3) "
            f"WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x ORDER BY term"
        ),
        "ft_fuzzy_suggest": (
            f"WITH toks AS (SELECT unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(*) AS BIGINT) AS cf FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, term) - 1 AS BIGINT) AS sugg_rank, "
            "term, cf FROM vocab WHERE levenshtein(term, 'stram') <= 2 "
            "AND substr(term, 1, 1) = 's' "
            "ORDER BY cf DESC, term LIMIT 5"
        ),
        "ft_free_text_suggest": (
            f"WITH docs AS (SELECT {split} AS a FROM documents), "
            "bg AS (SELECT list_extract(a, i) AS w1, list_extract(a, i+1) AS w2 "
            "FROM docs, UNNEST(range(1, len(a))) AS t(i) WHERE len(a) >= 2) "
            "SELECT w2 AS next_term, CAST(COUNT(*) AS BIGINT) AS n FROM bg "
            "WHERE w1 = 'merge' GROUP BY 1 ORDER BY n DESC, next_term LIMIT 10"
        ),
        "ft_tv_component": _ft_oracle().tv_component_sql("vector", max_docs=20),
        "ft_spell_collate": (
            f"WITH toks AS (SELECT doc_id, unnest({split}) AS x FROM documents), "
            f"vocab AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks "
            f"WHERE NOT list_contains({_STOP_SQL}, x) GROUP BY x), "
            "s1 AS (SELECT term FROM vocab WHERE levenshtein(term,'mergee') BETWEEN 1 AND 2 "
            "ORDER BY levenshtein(term,'mergee'), df DESC, term LIMIT 1), "
            "s2 AS (SELECT term FROM vocab WHERE levenshtein(term,'sortt') BETWEEN 1 AND 2 "
            "ORDER BY levenshtein(term,'sortt'), df DESC, term LIMIT 1), "
            f"hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS h FROM documents, s1, s2 "
            f"WHERE list_contains({split}, s1.term) AND list_contains({split}, s2.term)) "
            "SELECT 'mergee' AS term, s1.term AS suggestion, hits.h AS collation_hits FROM s1, hits "
            "UNION ALL SELECT 'sortt', s2.term, hits.h FROM s2, hits ORDER BY term"
        ),
        "facet_intervals": (
            "SELECT interval, n_docs FROM ("
            "SELECT '[0,99]' AS interval, CAST(COUNT(CASE WHEN n_chars BETWEEN 0 AND 99 "
            "THEN 1 END) AS BIGINT) AS n_docs, 0 AS o FROM documents "
            "UNION ALL SELECT '[100,249]', CAST(COUNT(CASE WHEN n_chars BETWEEN 100 AND 249 "
            "THEN 1 END) AS BIGINT), 1 FROM documents "
            "UNION ALL SELECT '[250,1000000000]', CAST(COUNT(CASE WHEN n_chars BETWEEN 250 "
            "AND 1000000000 THEN 1 END) AS BIGINT), 2 FROM documents) ORDER BY o"
        ),
        "ft_fielded_search": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'merge') "
            "AND lang = 'en' AND source IN ('src1', 'src2', 'src3') ORDER BY doc_id"
        ),
        # --- Solr /select request pipeline (solrapi; q='merge join' is
        # default-OR over two SHOULD clauses; fold order = clause order) ---
        # /analysis/field: token stream after each chain stage; corpus
        # tokens never exceed maxTokenLength or go all-underscore, so the
        # tokenizer stage == the raw regex extraction
        "solr_field_analysis": (
            "WITH d AS (SELECT doc_id, regexp_extract_all(text, '\\w+(?:[.'']\\w+)*') AS toks "
            "FROM documents WHERE doc_id < 5), "
            "tk AS (SELECT doc_id, unnest(toks) AS token, "
            "CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos FROM d) "
            "SELECT doc_id, stage, pos, token FROM ("
            "SELECT doc_id, 'tokenizer' AS stage, pos, token FROM tk "
            "UNION ALL SELECT doc_id, 'lowercase', pos, lower(token) FROM tk "
            "UNION ALL SELECT doc_id, 'stop', pos, lower(token) FROM tk "
            f"WHERE NOT list_contains({_STOP_SQL}, lower(token))) "
            "ORDER BY doc_id, stage, pos"
        ),
        "solr_select_docs": (
            f"WITH m AS (SELECT doc_id, n_chars, lang FROM documents WHERE "
            f"(list_contains({split}, 'merge') OR list_contains({split}, 'join')) "
            "AND lang = 'en') "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, n_chars, lang FROM m ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 5"
        ),
        "solr_select_scored": _ft_oracle().clause_order_topk_sql(["merge", "join"], k=10),
        "solr_select_dismax": _ft_oracle().dismax_topk_sql(["merge", "join", "vector"], 0.3, k=10),
        "solr_select_facets": (
            f"WITH m AS (SELECT doc_id, lang, source, n_chars FROM documents WHERE "
            f"list_contains({split}, 'merge') OR list_contains({split}, 'join')) "
            "SELECT 'lang' AS field, lang AS value, CAST(COUNT(*) AS BIGINT) AS count "
            "FROM m GROUP BY lang "
            "UNION ALL "
            "SELECT 'source' AS field, source AS value, CAST(COUNT(*) AS BIGINT) AS count "
            "FROM m GROUP BY source "
            "UNION ALL "
            "SELECT 'n_chars' AS field, CAST(150 * g AS VARCHAR) AS value, "
            "CAST(COALESCE(c, 0) AS BIGINT) AS count FROM generate_series(0, 3) s(g) "
            "LEFT JOIN (SELECT n_chars // 150 AS b, COUNT(*) AS c FROM m "
            "WHERE n_chars >= 0 AND n_chars < 600 GROUP BY b) h ON h.b = s.g "
            "ORDER BY field, value"
        ),
        "solr_select_stats": (
            f"WITH m AS (SELECT n_chars FROM documents WHERE "
            f"list_contains({split}, 'merge') OR list_contains({split}, 'join')) "
            "SELECT 'n_chars' AS field, CAST(COUNT(n_chars) AS BIGINT) AS n, "
            "CAST(COUNT(*) - COUNT(n_chars) AS BIGINT) AS n_missing, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum, "
            "CAST(MIN(n_chars) AS BIGINT) AS min, CAST(MAX(n_chars) AS BIGINT) AS max FROM m"
        ),
        "solr_select_highlight": (
            # page = scored top-5; snippet = every 'merge'/'join' token
            # wrapped (stored-TV offsets == \\b word spans on this pure
            # [a-z ] corpus — asserted in tests/test_solrapi.py)
            "WITH ranked AS ("
            + _ft_oracle().clause_order_topk_sql(["merge", "join"], k=5)
            + ") SELECT d.doc_id, regexp_replace(d.text, '\\b(merge|join)\\b', "
            "'<em>\\1</em>', 'g') AS snippet "
            "FROM documents d JOIN ranked r ON r.doc_id = d.doc_id ORDER BY d.doc_id"
        ),
        # --- streaming-expression text language (streamexpr) ---
        "stream_expr_rollup": (
            f"SELECT source, CAST(COUNT(*) AS BIGINT) AS count, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars FROM documents "
            f"WHERE list_contains({split}, 'merge') OR list_contains({split}, 'join') "
            "GROUP BY source ORDER BY source"
        ),
        "stream_expr_top": (
            "SELECT doc_id AS id, n_chars AS len FROM documents WHERE lang = 'en' "
            "ORDER BY n_chars DESC, doc_id LIMIT 10"
        ),
        "stream_expr_having_unique": (
            "SELECT lang, CAST(COUNT(DISTINCT source) AS BIGINT) AS count "
            "FROM documents GROUP BY lang HAVING COUNT(DISTINCT source) > 2 ORDER BY lang"
        ),
        "stream_expr_join": (
            f"SELECT doc_id, source, n_chars FROM documents "
            f"WHERE list_contains({split}, 'merge') AND list_contains({split}, 'vector') "
            "ORDER BY doc_id"
        ),
        "stream_expr_complement": (
            f"SELECT doc_id FROM documents "
            f"WHERE list_contains({split}, 'merge') AND NOT list_contains({split}, 'vector') "
            "ORDER BY doc_id"
        ),
        "stream_expr_facet": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS count, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars FROM documents "
            f"WHERE list_contains({split}, 'merge') "
            "GROUP BY lang ORDER BY count DESC, lang"
        ),
        "stream_expr_stats": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS count, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
            "CAST(MAX(n_chars) AS BIGINT) AS max_n_chars FROM documents "
            f"WHERE list_contains({split}, 'merge') OR list_contains({split}, 'join')"
        ),
        "stream_expr_select_eval": (
            "SELECT doc_id, CASE WHEN n_chars > 150 THEN 1 ELSE 0 END AS big, "
            "CAST(n_chars*2 + 7 AS BIGINT) AS scaled FROM documents "
            f"WHERE list_contains({split}, 'merge') ORDER BY doc_id"
        ),
        # ts docvalue == TIMESTAMP '2026-01-01' + doc_id seconds (the
        # transcript adapter); bucket = int64 us floored to the gap
        "stream_expr_timeseries": (
            "SELECT bucket_us, CAST(COUNT(*) AS BIGINT) AS count, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars FROM ("
            "SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id)) "
            "// 600000000 * 600000000 AS BIGINT) AS bucket_us, n_chars "
            f"FROM documents WHERE list_contains({split}, 'merge')) "
            "GROUP BY bucket_us ORDER BY bucket_us"
        ),
        "stream_expr_random": (
            "SELECT doc_id, lang FROM documents "
            f"WHERE list_contains({split}, 'vector') "
            "AND (doc_id * 2654435761) % 4294967296 < 429496729 ORDER BY doc_id"
        ),
        # cartesianProduct + analyze(): one row per analyzed token; the
        # standard chain == stopword-filtered whitespace split on this
        # corpus (the pinned oracle invariant)
        "stream_expr_cartesian_analyze": (
            "SELECT doc_id, term FROM ("
            f"SELECT doc_id, unnest(list_filter({split}, "
            f"x -> NOT list_contains({_STOP_SQL}, x))) AS term FROM documents "
            f"WHERE list_contains({split}, 'dup')) ORDER BY doc_id, term"
        ),
        # update()+commit() through the tlog: the appended copies carry
        # doc_id+90000000 and the source rows' n_chars
        "stream_expr_update": (
            "SELECT doc_id + 90000000 AS doc_id, n_chars FROM documents "
            f"WHERE list_contains({split}, 'dup') ORDER BY doc_id"
        ),
        # math streams: exact-integer sums; the one float op (sqrt) is a
        # single pinned IEEE float64 tree shared with the engine
        "stream_expr_describe": (
            "WITH m AS (SELECT n_chars FROM documents "
            f"WHERE list_contains({split}, 'merge')), "
            "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(MIN(n_chars) AS BIGINT) AS min_v, CAST(MAX(n_chars) AS BIGINT) AS max_v, "
            "CAST(SUM(n_chars) AS BIGINT) AS sv, "
            "CAST(SUM(n_chars*n_chars) AS BIGINT) AS sxx FROM m) "
            "SELECT n, min_v, max_v, sv AS sum_v, (sv*1000000)//n AS mean_micro, "
            "CAST(FLOOR(1000000*sqrt(CAST(n*sxx - sv*sv AS DOUBLE)/CAST(n*(n-1) AS DOUBLE)) + 0.5) AS BIGINT) "
            "AS stddev_micro FROM s"
        ),
        "stream_expr_hist": (
            "WITH s AS (SELECT MIN(n_chars) AS glo, MAX(n_chars) AS ghi FROM documents), "
            "b AS (SELECT (n_chars - s.glo)*8 // (s.ghi - s.glo + 1) AS bin, n_chars "
            "FROM documents, s) "
            "SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(MIN(n_chars) AS BIGINT) AS lo, CAST(MAX(n_chars) AS BIGINT) AS hi "
            "FROM b GROUP BY bin ORDER BY bin"
        ),
        # trailing window-3 mean over the 10-min 'merge' series, from the
        # 3rd bucket on; mean_micro = trunc(window_sum*1e6/3)
        "stream_expr_moving_avg": (
            "WITH s AS (SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 60000000 * 60000000 AS BIGINT) AS bucket_us, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM documents "
            f"WHERE list_contains({split}, 'merge') GROUP BY bucket_us), "
            "w AS (SELECT bucket_us, SUM(c) OVER (ORDER BY bucket_us "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ws, "
            "ROW_NUMBER() OVER (ORDER BY bucket_us) AS rn FROM s) "
            "SELECT bucket_us, CAST(ws * 1000000 // 3 AS BIGINT) AS moving_avg_micro "
            "FROM w WHERE rn >= 3 ORDER BY bucket_us"
        ),
        # lag-1 first difference of the same series, from the 2nd bucket on
        "stream_expr_diff": (
            "WITH s AS (SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 60000000 * 60000000 AS BIGINT) AS bucket_us, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM documents "
            f"WHERE list_contains({split}, 'merge') GROUP BY bucket_us), "
            "w AS (SELECT bucket_us, c - LAG(c) OVER (ORDER BY bucket_us) AS delta, "
            "ROW_NUMBER() OVER (ORDER BY bucket_us) AS rn FROM s) "
            "SELECT bucket_us, CAST(delta AS BIGINT) AS delta "
            "FROM w WHERE rn >= 2 ORDER BY bucket_us"
        ),
        # Pearson r from exact HUGEINT moments; ONE pinned float64
        # division/sqrt, quantized to micro (same formula as the engine)
        "stream_expr_corr": (
            "WITH s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(doc_id) AS HUGEINT) AS sx, CAST(SUM(n_chars) AS HUGEINT) AS sy, "
            "CAST(SUM(doc_id*doc_id) AS HUGEINT) AS sxx, "
            "CAST(SUM(n_chars*n_chars) AS HUGEINT) AS syy, "
            "CAST(SUM(doc_id*n_chars) AS HUGEINT) AS sxy FROM documents) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "CAST(FLOOR(CAST(n*sxy - sx*sy AS DOUBLE) "
            "/ SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) "
            "* 1000000 + 0.5) AS BIGINT) AS corr_micro FROM s"
        ),
        # col() zips the two 60s-bucket count series positionally; the
        # bucket-key join below is equal because both terms occupy every
        # bucket on the gate corpora (verified); mean/tdiv per _tdiv
        "stream_expr_let_math": (
            "WITH a AS (SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 60000000 * 60000000 AS BIGINT) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM documents "
            f"WHERE list_contains({split}, 'merge') GROUP BY b), "
            "bb AS (SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 60000000 * 60000000 AS BIGINT) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM documents "
            f"WHERE list_contains({split}, 'join') GROUP BY b) "
            "SELECT CAST(SUM(a.c * bb.c) AS BIGINT) AS dot, "
            "CAST(SUM(a.c) AS BIGINT) AS sum_a, CAST(SUM(bb.c) AS BIGINT) AS sum_b, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(a.c) * 1000000 // COUNT(*) AS BIGINT) AS mean_a_micro, "
            "CAST(SUM(a.c) - SUM(bb.c) AS BIGINT) AS sum_diff "
            "FROM a JOIN bb ON a.b = bb.b"
        ),
        # cov()/variance(): sample (n-1) denominators, micro-units,
        # truncating division; percentile(): nearest-rank on exact ints.
        # Series align positionally == join on bucket (full coverage)
        "stream_expr_cov_percentile": (
            "WITH a AS (SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 60000000 * 60000000 AS BIGINT) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM documents "
            f"WHERE list_contains({split}, 'merge') GROUP BY b), "
            "bb AS (SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 60000000 * 60000000 AS BIGINT) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM documents "
            f"WHERE list_contains({split}, 'join') GROUP BY b), "
            "j AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(a.c * bb.c) AS HUGEINT) AS sxy, "
            "CAST(SUM(a.c) AS HUGEINT) AS sx, CAST(SUM(bb.c) AS HUGEINT) AS sy, "
            "CAST(SUM(a.c * a.c) AS HUGEINT) AS sxx, "
            "CAST(SUM(a.c * bb.c) AS BIGINT) AS dot "
            "FROM a JOIN bb ON a.b = bb.b), "
            "p AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM a), "
            "pn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM a) "
            "SELECT CAST(((j.n*j.sxy - j.sx*j.sy) * 1000000) // (j.n*(j.n-1)) AS BIGINT) AS cov_micro, "
            "CAST(((j.n*j.sxx - j.sx*j.sx) * 1000000) // (j.n*(j.n-1)) AS BIGINT) AS var_a_micro, "
            "(SELECT c FROM p, pn WHERE rn = GREATEST(1, (90*pn.n + 99) // 100)) AS p90_a, "
            "j.dot AS dot FROM j"
        ),
        "stream_expr_train": _logit_sql("train"),
        "stream_expr_classify": _logit_sql("classify"),
        "stream_expr_select_strings": (
            "SELECT doc_id, lang || source AS lang_source, upper(lang) AS lang_uc "
            f"FROM documents WHERE list_contains({split}, 'merge') ORDER BY doc_id"
        ),
        "stream_expr_timeseries_metrics": (
            "SELECT CAST(epoch_us(TIMESTAMP '2026-01-01 00:00:00' "
            "+ to_seconds(doc_id)) // 120000000 * 120000000 AS BIGINT) AS bucket_us, "
            "CAST(COUNT(*) AS BIGINT) AS count, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars, "
            "CAST(MIN(n_chars) AS BIGINT) AS min_n_chars, "
            "CAST(MAX(n_chars) AS BIGINT) AS max_n_chars "
            f"FROM documents WHERE list_contains({split}, 'merge') "
            "GROUP BY bucket_us ORDER BY bucket_us"
        ),
        # FeaturesSelectionStream: IG * N as exact scaled-entropy ints
        "stream_expr_features": __import__(
            "lucene_solr_ray.functions.classify", fromlist=["features_select_sql"]
        ).features_select_sql(label_lang="en", k=12),
        "stream_expr_knn": _ft_oracle().more_like_this_sql(0, 8, 10),
        "classifier_pr_points": _logit_sql("pr"),
        "stream_expr_regress": (
            "WITH s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(doc_id) AS HUGEINT) AS sx, CAST(SUM(n_chars) AS HUGEINT) AS sy, "
            "CAST(SUM(doc_id*doc_id) AS HUGEINT) AS sxx, "
            "CAST(SUM(doc_id*n_chars) AS HUGEINT) AS sxy FROM documents), "
            "d AS (SELECT n, sx, sy, n*sxy - sx*sy AS num, n*sxx - sx*sx AS den FROM s) "
            "SELECT CAST(n AS BIGINT) AS n, CAST((num*1000000)//den AS BIGINT) AS slope_micro, "
            "CAST(((sy*den - num*sx)*1000000)//(den*n) AS BIGINT) AS intercept_micro FROM d"
        ),
        "stream_expr_fetch": (
            "SELECT doc_id, n_chars, lang, source FROM ("
            "SELECT doc_id, n_chars, lang, source FROM documents "
            f"WHERE list_contains({split}, 'merge') OR list_contains({split}, 'vector') "
            "ORDER BY n_chars DESC, doc_id LIMIT 25) ORDER BY doc_id"
        ),
        # MergeStream keeps duplicates (a doc matching both sides appears
        # twice) -> UNION ALL
        "stream_expr_merge": (
            "SELECT doc_id, n_chars FROM ("
            f"SELECT doc_id, n_chars FROM documents WHERE list_contains({split}, 'spark') "
            "UNION ALL SELECT doc_id, n_chars FROM documents "
            f"WHERE list_contains({split}, 'window') OR list_contains({split}, 'vector')) "
            "ORDER BY n_chars DESC, doc_id"
        ),
        "topic_stream_poll": (
            # two successive checkpointed polls of 100 == the first two
            # 100-row slices of matching docs in doc_id order
            f"WITH m AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn "
            f"FROM documents WHERE list_contains({split}, 'merge')) "
            "SELECT CAST(rn // 100 AS BIGINT) AS poll, doc_id FROM m "
            "WHERE rn < 200 ORDER BY poll, doc_id"
        ),
        "replica_search": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'vector') ORDER BY doc_id"
        ),
        # restore answers from the PRE-MUTATION commit point: the source
        # deleted every 'merge' doc after the snapshot, the restore must not
        "ft_snapshot_restore": (
            f"SELECT doc_id FROM documents WHERE list_contains({split}, 'vector') ORDER BY doc_id"
        ),
        "range_facet_other": (
            "WITH lab AS (SELECT CASE WHEN n_chars < 100 THEN 'before' "
            "WHEN n_chars >= 400 THEN 'after' "
            "ELSE 'r' || CAST((n_chars - 100) // 100 AS VARCHAR) END AS bucket FROM documents), "
            "cnt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY bucket), "
            "names(bucket) AS (VALUES ('before'), ('r0'), ('r1'), ('r2'), ('after')) "
            "SELECT nm.bucket, CAST(COALESCE(c.n, 0) AS BIGINT) AS n "
            "FROM names nm LEFT JOIN cnt c USING (bucket) "
            "UNION ALL SELECT 'between', CAST(COALESCE(SUM(n), 0) AS BIGINT) "
            "FROM cnt WHERE bucket LIKE 'r%'"
        ),
        # multi-select faceting: the lang facet EXCLUDES its own tagged
        # lang filter ({!tag=L}/ex=L), the source facet applies all fq's
        "facet_multiselect_ex": (
            "SELECT 'lang' AS facet_field, lang AS bucket, COUNT(*) AS n_docs "
            "FROM documents WHERE n_chars >= 200 GROUP BY lang "
            "UNION ALL "
            "SELECT 'source', source, COUNT(*) FROM documents "
            "WHERE n_chars >= 200 AND lang = 'en' GROUP BY source "
            "ORDER BY facet_field, bucket"
        ),
        # terms facet sorted by stat (sum_n desc, bucket asc), limit 3,
        # plus allBuckets whole-domain stats and numBuckets
        "facet_allbuckets": (
            "WITH b AS (SELECT source AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n FROM documents GROUP BY source) "
            "SELECT * FROM ("
            "SELECT bucket, n_docs, sum_n FROM "
            "(SELECT * FROM b ORDER BY sum_n DESC, bucket LIMIT 3) "
            "UNION ALL SELECT '__all__', (SELECT CAST(COUNT(*) AS BIGINT) FROM documents), "
            "(SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents) "
            "UNION ALL SELECT '__numBuckets__', (SELECT CAST(COUNT(*) AS BIGINT) FROM b), 0"
            ") ORDER BY bucket"
        ),
        # group.facet=true: each lang bucket counts DISTINCT source
        # groups holding >= 1 matching doc (match = n_chars >= 200)
        "group_facet_counts": (
            "SELECT lang, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups "
            "FROM documents WHERE n_chars >= 200 GROUP BY lang ORDER BY lang"
        ),
        # facet.missing: docs whose derived nullable field is NULL land
        # in one extra __missing__ bucket
        "facet_missing_bucket": (
            "SELECT COALESCE(CASE WHEN n_chars >= 200 THEN source END, '__missing__') "
            "AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1 ORDER BY bucket"
        ),
        # uniqueBlock(_root_): unique parent orders per child bucket
        "uniqueblock_facet": (
            "SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_parents "
            "FROM lineitem WHERE l_quantity >= 25 "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        # sampling facets: deterministic multiplicative-hash 20% sample,
        # exact integer amplification n*100//pct
        "sampled_facets": (
            "WITH s AS (SELECT lang FROM documents "
            "WHERE (doc_id * 2654435761) % 4294967296 < 4294967296 * 20 // 100) "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled, "
            "CAST(COUNT(*) * 100 // 20 AS BIGINT) AS n_estimated "
            "FROM s GROUP BY lang ORDER BY lang"
        ),
        # enum ordinal order: 5-LOW pinned BEFORE 4-NOT SPECIFIED
        "enum_field_sort": (
            "WITH m(v, ordinal) AS (VALUES ('1-URGENT', 0), ('2-HIGH', 1), "
            "('3-MEDIUM', 2), ('5-LOW', 3), ('4-NOT SPECIFIED', 4)) "
            "SELECT CAST(m.ordinal AS BIGINT) AS ordinal, "
            "o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN m ON o_orderpriority = m.v "
            "GROUP BY 1, 2 ORDER BY ordinal"
        ),
        # facet on a JSON-extracted int, decade buckets; missing -> -1
        "props_json_facet": (
            "SELECT COALESCE(CAST(json_extract(props, '$.k') AS BIGINT) // 10, -1) "
            "AS bucket, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY bucket ORDER BY bucket"
        ),
        # higher moments on floor-dollars: exact-int skewness inputs
        "stats_moments": (
            "WITH e AS (SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS d, "
            "CASE WHEN value IS NULL THEN 0 ELSE 1 END AS present FROM events) "
            "SELECT event_type, CAST(SUM(present) AS BIGINT) AS n_vals, "
            "CAST(SUM(d) AS BIGINT) AS sum_d, CAST(SUM(d*d) AS BIGINT) AS sumsq_d, "
            "CAST(SUM(d*d*d) AS BIGINT) AS sumcube_d "
            "FROM e GROUP BY event_type ORDER BY event_type"
        ),
        "facet_stats_ext": (
            f"WITH e AS (SELECT event_type, {c(x='value')} AS cents, value FROM events) "
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents, "
            "CAST(SUM(cents * cents) AS BIGINT) AS sumsq_cents2 "
            "FROM e GROUP BY event_type ORDER BY event_type"
        ),
        "percolate": (
            f"WITH d AS (SELECT doc_id, {split} AS sp FROM documents) "
            "SELECT doc_id, query_id FROM ("
            "SELECT doc_id, 'sq-and' AS query_id FROM d WHERE list_contains(sp, 'merge') AND list_contains(sp, 'join') "
            "UNION ALL SELECT doc_id, 'sq-or' FROM d WHERE list_contains(sp, 'vector') "
            "UNION ALL SELECT doc_id, 'sq-or2' FROM d WHERE list_contains(sp, 'spark') OR list_contains(sp, 'window') "
            "UNION ALL SELECT d.doc_id, 'sq-parsed' FROM d JOIN documents doc ON d.doc_id = doc.doc_id "
            "WHERE list_contains(sp, 'vector') AND regexp_matches(doc.text, '\\bmerge\\s+join\\b') "
            "AND NOT list_contains(sp, 'spark')"
            ") ORDER BY doc_id, query_id"
        ),
        # streaming alerts: the monitor over the ingest batch (constants
        # shared with monitor.ALERT_DOCS), same boolean/phrase semantics
        "percolate_stream_alerts": (
            "WITH nd(doc_id, text) AS (VALUES "
            "(91000001, 'merge join alert fires here'), "
            "(91000002, 'vector drift detected'), "
            "(91000003, 'nothing interesting at all'), "
            "(91000004, 'merge join vector spark noise'), "
            "(91000005, 'vector merge join combo')), "
            "d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "regexp_split_to_array(text, '\\s+') AS sp, text FROM nd) "
            "SELECT doc_id, query_id FROM ("
            "SELECT doc_id, 'al-and' AS query_id FROM d "
            "WHERE list_contains(sp, 'merge') AND list_contains(sp, 'join') "
            "UNION ALL SELECT doc_id, 'al-or' FROM d WHERE list_contains(sp, 'vector') "
            "UNION ALL SELECT doc_id, 'al-parsed' FROM d "
            "WHERE list_contains(sp, 'vector') AND regexp_matches(text, '\\bmerge\\s+join\\b') "
            "AND NOT list_contains(sp, 'spark')"
            ") ORDER BY doc_id, query_id"
        ),
        # monitor queries with PointRangeQuery clauses: range-only
        # (ANYTOKEN-routed) and term-AND-range, beside a plain term query
        "percolate_range": (
            f"WITH d AS (SELECT doc_id, n_chars, {split} AS sp FROM documents) "
            "SELECT doc_id, query_id FROM ("
            "SELECT doc_id, 'rq-short' AS query_id FROM d WHERE n_chars >= 0 AND n_chars < 150 "
            "UNION ALL SELECT doc_id, 'rq-merge-mid' FROM d "
            "WHERE n_chars >= 150 AND n_chars < 400 AND list_contains(sp, 'merge') "
            "UNION ALL SELECT doc_id, 'rq-or' FROM d WHERE list_contains(sp, 'vector')"
            ") ORDER BY doc_id, query_id"
        ),
        "scalar_functions": (
            "SELECT p_partkey, CAST(ABS(p_size - 25) AS BIGINT) AS abs_size, "
            "CAST(FLOOR(SQRT(CAST(p_size AS DOUBLE))*1000+0.5) AS BIGINT) AS sqrt_milli, "
            "CAST(FLOOR(LN(p_retailprice)*1000+0.5) AS BIGINT) AS ln_milli, "
            "UPPER(p_brand) AS upper_brand, p_brand || ':' || p_type AS brand_type "
            "FROM part ORDER BY p_partkey"
        ),
        "date_functions": (
            "SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr, "
            "CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo, "
            "CAST(o_orderdate + INTERVAL 7 DAY AS TIMESTAMP) AS plus7 FROM orders ORDER BY o_orderkey"
        ),
        "deterministic_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE (doc_id * 2654435761) % 4294967296 < 429496729 ORDER BY doc_id"
        ),
        # bottom-k by md5-64 priority; engine shifts the unsigned hash by
        # 2^63 into int64 (the simhash-oracle convention)
        "sample_fixed_k": (
            "SELECT doc_id, CAST(CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) "
            "- 9223372036854775808 AS BIGINT) AS priority "
            "FROM documents ORDER BY priority LIMIT 100"
        ),
        # [child]/[subquery] transformers: page-sized parent set, pushed
        # child filter, per-parent ordered head-k
        "child_doc_transform": (
            "WITH p AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P' "
            "ORDER BY o_orderkey LIMIT 20), "
            "c AS (SELECT l_orderkey, l_linenumber, l_suppkey, "
            "ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn "
            "FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM p) "
            "AND l_quantity >= 30) "
            "SELECT l_orderkey AS o_orderkey, CAST(rn - 1 AS BIGINT) AS child_rank, "
            "l_linenumber, l_suppkey FROM c WHERE rn <= 3 "
            "ORDER BY o_orderkey, child_rank"
        ),
        # stratified bottom-k: k smallest priorities PER lang
        "stratified_sample": (
            "SELECT lang, doc_id, priority FROM ("
            "SELECT lang, doc_id, CAST(CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) "
            "- 9223372036854775808 AS BIGINT) AS priority, "
            "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY "
            "CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT)) AS rn "
            "FROM documents) WHERE rn <= 20 ORDER BY lang, priority"
        ),
        "select_having": (
            "SELECT l_orderkey, l_linenumber, "
            f"{c(x='l_quantity')} AS qty, "
            f"{c(x='(l_extendedprice*(1-l_discount))')} AS revenue_cents "
            "FROM lineitem WHERE l_quantity >= 48"
        ),
        "rollup_agg": (
            "SELECT l_returnflag, l_linestatus, "
            f"CAST(SUM({c(x='l_quantity')}) AS BIGINT) AS sum_qty, "
            f"CAST(SUM({c(x='l_extendedprice')}) AS BIGINT) AS sum_base_cents, "
            "COUNT(*) AS n FROM lineitem GROUP BY 1, 2"
        ),
        "stats_global": (
            "SELECT COUNT(*) AS n, "
            f"MIN({c(x='l_quantity')}) AS min_qty, "
            f"MAX({c(x='l_quantity')}) AS max_qty, "
            f"CAST(SUM({c(x='l_extendedprice')}) AS BIGINT) AS sum_price_cents "
            "FROM lineitem"
        ),
        "rank_top": (
            f"SELECT o_orderkey, {c(x='o_totalprice')} AS total_cents FROM orders "
            "ORDER BY total_cents DESC, o_orderkey LIMIT 10"
        ),
        "unique_stream": (
            "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1"
        ),
        "hash_join": (
            "SELECT c_mktsegment, COUNT(*) AS n_orders, "
            f"CAST(SUM({c(x='o_totalprice')}) AS BIGINT) AS sum_total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"
        ),
        "fetch_enrich": (
            f"SELECT s_suppkey, n_name, {c(x='s_acctbal')} AS acctbal_cents "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey"
        ),
        "left_outer_join": (
            "SELECT c_nationkey, COUNT(*) AS n_customers, "
            "CAST(SUM(COALESCE(o.n, 0)) AS BIGINT) AS sum_orders, "
            "CAST(SUM(CASE WHEN o.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_order_customers "
            "FROM customer c LEFT JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders "
            "WHERE o_orderstatus = 'P' GROUP BY 1) o ON c.c_custkey = o.o_custkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "semi_join": (
            "SELECT c_custkey FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') ORDER BY 1"
        ),
        "tochild_block_join": (
            "SELECT l_orderkey, l_linenumber FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderstatus = 'F' AND l_quantity >= 45 "
            "ORDER BY l_orderkey, l_linenumber"
        ),
        "anti_join": (
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') ORDER BY 1"
        ),
        "merge_sorted": (
            "SELECT name FROM (SELECT r_name AS name FROM region "
            "UNION ALL SELECT n_name AS name FROM nation) ORDER BY name"
        ),
        "cartesian_explode": (
            "SELECT word, COUNT(*) AS n FROM "
            "(SELECT unnest(regexp_split_to_array(p_type, ' ')) AS word FROM part) "
            "GROUP BY 1 ORDER BY 1"
        ),
        "facet_terms": (
            "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1"
        ),
        # LTV: summed purchase cents per user, top-k
        "user_ltv_topk": (
            f"WITH p AS (SELECT user_id, {c(x='value')} AS cents FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT user_id, CAST(SUM(cents) AS BIGINT) AS ltv_cents "
            "FROM p GROUP BY user_id ORDER BY ltv_cents DESC, user_id LIMIT 20"
        ),
        # DAU: distinct users per day bucket
        "daily_unique_users": (
            "SELECT CAST(epoch_us(ts) // 86400000000 * 86400000000 AS BIGINT) AS day_us, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        # 3-sigma outliers, cross-multiplied exact ints (no float mean)
        "value_outliers": (
            f"WITH e AS (SELECT event_id, event_type, CAST({c(x='value')} AS HUGEINT) AS cc FROM events), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(cc) AS HUGEINT) AS s, CAST(SUM(cc*cc) AS HUGEINT) AS ss "
            "FROM e GROUP BY 1) "
            "SELECT e.event_id, e.event_type, CAST(e.cc AS BIGINT) AS cents "
            "FROM e JOIN m USING (event_type) "
            "WHERE (m.n*e.cc - m.s)*(m.n*e.cc - m.s) > 9*(m.n*m.ss - m.s*m.s) "
            "ORDER BY e.event_id"
        ),
        # unique(user_id) per event_type bucket
        "facet_unique_users": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        # DoubleRange facet on the exact-cents grid, 25.00-wide ranges
        "value_range_facet": (
            f"WITH e AS (SELECT {c(x='value')} AS cents FROM events) "
            "SELECT COALESCE(cents // 2500, -1) AS bucket, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(COALESCE(cents, 0)) AS BIGINT) AS sum_cents "
            "FROM e GROUP BY 1 ORDER BY bucket"
        ),
        # per-day continuous top-k event types (count desc, type asc)
        "windowed_topk_types": (
            "WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 * 86400000000 AS BIGINT) "
            "AS day_us, event_type, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT day_us, event_type, n, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY day_us ORDER BY n DESC, event_type) - 1 AS BIGINT) AS win_rank FROM c) "
            "SELECT day_us, win_rank, event_type, n FROM r WHERE win_rank < 3 "
            "ORDER BY day_us, win_rank"
        ),
        # TZ-shifted day buckets (+05:30): local midnight boundaries
        "timeseries_tz_facet": (
            "SELECT CAST(epoch_us(ts + INTERVAL 330 MINUTES) // 86400000000 "
            "* 86400000000 - CAST(330 AS BIGINT) * 60000000 AS BIGINT) AS day_start_us, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1 ORDER BY 1"
        ),
        "timeseries_facet": (
            "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n, "
            f"CAST(SUM({c(x='value')}) AS BIGINT) AS sum_value_cents "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "asof_join": (
            "SELECT l.event_id, l.user_id, l.ts, r.ts AS right_ts "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') l "
            "ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts ORDER BY l.event_id"
        ),
        # signup-week cohorts x weeks-since-signup distinct active users
        "cohort_retention": (
            "WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events "
            "WHERE event_type = 'signup' GROUP BY user_id), "
            "a AS (SELECT DISTINCT e.user_id, "
            "CAST(epoch_us(s.s_ts) // (CAST(7 AS BIGINT) * 86400000000) AS BIGINT) AS cohort_week, "
            "CAST((epoch_us(e.ts) - epoch_us(s.s_ts)) // (CAST(7 AS BIGINT) * 86400000000) AS BIGINT) AS week_offset "
            "FROM events e JOIN s USING (user_id) WHERE e.ts >= s.s_ts) "
            "SELECT cohort_week, week_offset, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM a GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # bounded-lookback as-of: matches older than 1h drop
        "asof_join_tolerance": (
            "SELECT l.event_id, l.user_id, l.ts, r.ts AS right_ts "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') l "
            "ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts "
            "WHERE l.ts - r.ts <= INTERVAL 1 HOUR ORDER BY l.event_id"
        ),
        "session_window": (
            "WITH m AS (SELECT user_id, ts, CASE WHEN "
            "LAG(ts) OVER w IS NULL OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, CAST(SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) "
            "AS session_idx FROM m) "
            "SELECT user_id, session_idx, COUNT(*) AS n_events, "
            "MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM s "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "sliding_window_agg": (
            "WITH b AS (SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, "
            f"COUNT(*) AS n, CAST(SUM({c(x='value')}) AS BIGINT) AS sum_cents "
            "FROM events GROUP BY 1, 2) "
            "SELECT event_type, hour, n, sum_cents, "
            "CAST(SUM(sum_cents) OVER (PARTITION BY event_type ORDER BY hour "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents "
            "FROM b ORDER BY event_type, hour"
        ),
        "pivot_facets": (
            "WITH leaves AS (SELECT l_returnflag, l_linestatus, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            f"COUNT(*) AS n, CAST(SUM({c(x='l_quantity')}) AS BIGINT) AS sum_qty_cents "
            "FROM lineitem GROUP BY 1, 2, 3), "
            "l1 AS (SELECT l_returnflag, CAST(ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, l_returnflag) - 1 AS BIGINT) AS rank1 "
            "FROM leaves GROUP BY l_returnflag), "
            "l2 AS (SELECT l_returnflag, l_linestatus, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY SUM(n) DESC, l_linestatus) - 1 AS BIGINT) AS rank2 "
            "FROM leaves GROUP BY l_returnflag, l_linestatus) "
            "SELECT l1.rank1, l2.rank2, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY leaves.l_returnflag, leaves.l_linestatus "
            "ORDER BY leaves.n DESC, leaves.l_linenumber) - 1 AS BIGINT) AS rank3, "
            "leaves.l_returnflag, leaves.l_linestatus, leaves.l_linenumber, "
            "CAST(leaves.n AS BIGINT) AS n, leaves.sum_qty_cents "
            "FROM leaves JOIN l1 ON leaves.l_returnflag = l1.l_returnflag "
            "JOIN l2 ON leaves.l_returnflag = l2.l_returnflag AND leaves.l_linestatus = l2.l_linestatus "
            "ORDER BY rank1, rank2, rank3"
        ),
        "scored_join_topk": (
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_cents DESC, o_orderkey) - 1 AS BIGINT) AS rank, "
            "o_orderkey, score_cents FROM ("
            "SELECT l_orderkey AS o_orderkey, "
            "CAST(MAX(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)) AS BIGINT) AS score_cents "
            "FROM lineitem GROUP BY 1) "
            "ORDER BY score_cents DESC, o_orderkey LIMIT 20"
        ),
        # ScoreMode.Avg / Total: exact ints (avg = floor-division milli-cents)
        "scored_join_avg": (
            "WITH a AS (SELECT l_orderkey AS o_orderkey, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem GROUP BY 1) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY (total * 1000) // n_lines DESC, o_orderkey) - 1 AS BIGINT) AS rank, "
            "o_orderkey, (total * 1000) // n_lines AS score, n_lines FROM a "
            "ORDER BY score DESC, o_orderkey LIMIT 20"
        ),
        "scored_join_total": (
            "WITH a AS (SELECT l_orderkey AS o_orderkey, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total, "
            "CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem GROUP BY 1) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY total DESC, o_orderkey) - 1 AS BIGINT) AS rank, "
            "o_orderkey, total AS score, n_lines FROM a "
            "ORDER BY score DESC, o_orderkey LIMIT 20"
        ),
        "facet_queries": (
            "SELECT facet, n_docs FROM ("
            "SELECT 'type_purchase' AS facet, CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_docs FROM events "
            f"UNION ALL SELECT 'value_ge_100', CAST(COUNT(CASE WHEN {c(x='value')} >= 10000 THEN 1 END) AS BIGINT) FROM events "
            "UNION ALL SELECT 'jan_2024', CAST(COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01' THEN 1 END) AS BIGINT) FROM events "
            f"UNION ALL SELECT 'purchase_over_50', CAST(COUNT(CASE WHEN event_type = 'purchase' AND {c(x='value')} >= 5000 THEN 1 END) AS BIGINT) FROM events"
            ") ORDER BY facet"
        ),
        "range_join_bands": (
            "WITH bands(band_id, lo, hi) AS (VALUES "
            "(CAST(0 AS BIGINT), 0, 5000), (1, 5000, 10000), (2, 10000, 15000), "
            "(3, 15000, 9223372036854775807)), "
            f"e AS (SELECT {c(x='value')} AS cents FROM events) "
            "SELECT band_id, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents "
            "FROM e JOIN bands ON e.cents >= bands.lo AND e.cents < bands.hi "
            "GROUP BY 1 ORDER BY 1"
        ),
        "significant_terms": (
            "SELECT term, CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS fg, "
            "COUNT(*) AS bg FROM "
            f"(SELECT unnest({split}) AS term, lang FROM documents) "
            "GROUP BY term ORDER BY term"
        ),
        "stream_expr_significant_terms": (
            "SELECT term, CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS fg, "
            "COUNT(*) AS bg FROM "
            f"(SELECT unnest({split}) AS term, lang FROM documents) "
            "GROUP BY term ORDER BY term"
        ),
        # domain: {filter}: facet domain REPLACED by the filter's match
        # set; the main-query column sits beside it for contrast
        "facet_filter_domain": (
            "SELECT lang, "
            f"CAST(COUNT(CASE WHEN list_contains({split}, 'merge') THEN 1 END) AS BIGINT) AS n_query_domain, "
            "CAST(COUNT(CASE WHEN n_chars >= 300 THEN 1 END) AS BIGINT) AS n_filter_domain "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        "facet_join_domain": (
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS count FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') "
            "GROUP BY c_mktsegment ORDER BY count DESC, c_mktsegment LIMIT 5"
        ),
        "grouping_by_query": (
            "SELECT grp, CAST(rn - 1 AS BIGINT) AS rank, doc_id, n_chars FROM ("
            "SELECT 'merge+join' AS grp, doc_id, n_chars, "
            "ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rn FROM documents "
            f"WHERE list_contains({split}, 'merge') AND list_contains({split}, 'join') "
            "UNION ALL "
            "SELECT 'vector', doc_id, n_chars, "
            "ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) FROM documents "
            f"WHERE list_contains({split}, 'vector')) t "
            "WHERE rn <= 3 ORDER BY grp, rank"
        ),
        "relatedness_facets": (
            # Semantic Knowledge Graph relatedness(): identical float64
            # expression tree as the engine (all ops IEEE exactly rounded)
            "WITH d AS (SELECT lang, list_contains("
            f"regexp_split_to_array(text, '\\s+'), 'merge') AS fg FROM documents), "
            "b AS (SELECT lang, CAST(SUM(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_count, "
            "CAST(COUNT(*) AS BIGINT) AS bg_count FROM d GROUP BY lang), "
            "tot AS (SELECT CAST(SUM(bg_count) AS DOUBLE) AS bg_size FROM b), "
            "p AS (SELECT lang, fg_count, bg_count, "
            "CAST(fg_count AS DOUBLE) / bg_size AS fg_pop, "
            "CAST(bg_count AS DOUBLE) / bg_size AS bg_pop FROM b, tot), "
            "zt AS (SELECT lang, fg_count, bg_count, sqrt(bg_pop * (1.0 - bg_pop)) AS denom, "
            "fg_pop - bg_pop AS num FROM p), "
            "zz AS (SELECT lang, fg_count, bg_count, denom, "
            "CASE WHEN denom > 0.0 THEN num / denom ELSE 0.0 END AS z FROM zt) "
            "SELECT lang, fg_count, bg_count, CASE WHEN denom > 0.0 THEN "
            "CAST(FLOOR((0.2 * ((z + -80.0) / (50.0 + abs(z + -80.0))) "
            "+ 0.2 * ((z + -30.0) / (30.0 + abs(z + -30.0))) "
            "+ 0.2 * ((z + 0.0) / (30.0 + abs(z + 0.0))) "
            "+ 0.2 * ((z + 30.0) / (30.0 + abs(z + 30.0))) "
            "+ 0.2 * ((z + 80.0) / (50.0 + abs(z + 80.0)))) * 1000000.0 + 0.5) AS BIGINT) "
            "ELSE 0 END AS relatedness_micro "
            "FROM zz ORDER BY relatedness_micro DESC, lang"
        ),
        "collapse_top_order": (
            "SELECT o_custkey, o_orderkey, total_cents FROM ("
            f"SELECT o_custkey, o_orderkey, {c(x='o_totalprice')} AS total_cents, "
            f"ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY {c(x='o_totalprice')} DESC, o_orderkey) AS rn "
            "FROM orders) WHERE rn = 1 ORDER BY o_custkey"
        ),
        # min= head selector: smallest totalprice per customer
        "collapse_min_field": (
            "SELECT o_custkey, o_orderkey, total_cents FROM ("
            f"SELECT o_custkey, o_orderkey, {c(x='o_totalprice')} AS total_cents, "
            f"ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY {c(x='o_totalprice')} ASC, o_orderkey) AS rn "
            "FROM orders) WHERE rn = 1 ORDER BY o_custkey"
        ),
        # date-field stats: exact int64 microsecond extrema per bucket
        "stats_dates": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us, "
            "CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "grouping_topk": (
            "SELECT o_custkey, o_orderkey, total_cents, CAST(rn - 1 AS BIGINT) AS group_rank FROM ("
            f"SELECT o_custkey, o_orderkey, {c(x='o_totalprice')} AS total_cents, "
            f"ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY {c(x='o_totalprice')} DESC, o_orderkey) AS rn "
            "FROM orders) WHERE rn <= 2 ORDER BY o_custkey, group_rank"
        ),
        "expand_collapsed": (
            f"WITH ranked AS (SELECT o_custkey, o_orderkey, {c(x='o_totalprice')} AS total_cents, "
            f"ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY {c(x='o_totalprice')} DESC, o_orderkey) AS rn "
            "FROM orders), "
            "heads AS (SELECT o_custkey FROM ranked WHERE rn = 1 "
            "ORDER BY total_cents DESC, o_orderkey LIMIT 20) "
            "SELECT r.o_custkey, r.o_orderkey, r.total_cents, CAST(r.rn - 2 AS BIGINT) AS expand_rank "
            "FROM ranked r JOIN heads h ON r.o_custkey = h.o_custkey "
            "WHERE r.rn BETWEEN 2 AND 3 ORDER BY r.o_custkey, expand_rank"
        ),
        "percentile_disc": (
            "WITH c AS (SELECT " + c(x="l_quantity") + " AS qty, COUNT(*) AS n FROM lineitem GROUP BY 1), "
            "cc AS (SELECT qty, SUM(n) OVER (ORDER BY qty) AS cum FROM c), "
            "t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c) "
            "SELECT CAST(q_milli AS BIGINT) AS q_milli, "
            "(SELECT MIN(qty) FROM cc, t WHERE cum >= (q_milli/1000.0)*total) AS qty "
            "FROM (VALUES (250), (500), (750), (950)) AS qs(q_milli)"
        ),
        "unique_counts": (
            "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
            "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types FROM events"
        ),
        # --- dedup ---
        "dedup_exact": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text) ORDER BY doc_id"
        ),
        "dedup_textprofile": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS f FROM toks WHERE len(term) >= 2 GROUP BY 1, 2), "
            "q AS (SELECT doc_id, GREATEST(1, CAST(FLOOR(MAX(f)/16.0) AS BIGINT)) AS quant FROM tf GROUP BY 1), "
            "prof AS (SELECT tf.doc_id, tf.term, CAST(FLOOR(tf.f/q.quant) AS BIGINT) AS qf "
            "FROM tf JOIN q ON tf.doc_id = q.doc_id WHERE FLOOR(tf.f/q.quant) > 0) "
            "SELECT d.doc_id, md5(COALESCE(p.s, '')) AS sig FROM documents d LEFT JOIN "
            "(SELECT doc_id, string_agg(term || ' ' || qf, ' ' ORDER BY term) AS s FROM prof GROUP BY 1) p "
            "ON d.doc_id = p.doc_id ORDER BY d.doc_id"
        ),
        # dedup_simhash_pairs: pigeonhole banding is COMPLETE for
        # hamming <= k, so the exact all-pairs SQL is a true oracle
        # (simhash replicated bit-for-bit via md5_number_upper).
        "dedup_simhash_pairs": _data_oracle().simhash_pairs_sql(3),
        "dedup_embedding_cosine": (
            # threshold 0.42 sits >=3e-5 away from every pair's cosine at
            # sf0.001/0.01/0.1 (measured), so float64 rounding can't flip
            # membership between numpy and DuckDB.
            "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42 "
            "ORDER BY doc_a, doc_b"
        ),
        # SemDeDup keep rule is pair-based -> a pure NOT EXISTS (same
        # measured 0.42 threshold gap as dedup_embedding_cosine)
        "semdedup_keep_set": (
            "SELECT a.vec_id FROM embeddings a WHERE NOT EXISTS ("
            "SELECT 1 FROM embeddings b WHERE b.vec_id < a.vec_id "
            "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.42) "
            "ORDER BY vec_id"
        ),
        # dedup_embedding_lsh: exact-cosine SQL is a true oracle because the
        # verify step is exact (no false positives) and per-pair LSH recall at
        # 64 bands x 4 planes is 1 - 8.6e-6 (measured 1.0 on the gate corpora;
        # pinned by tests/test_functions.py::test_embedding_cosine_lsh_recall_vs_exact).
        "dedup_embedding_lsh": (
            "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.42 "
            "ORDER BY doc_a, doc_b"
        ),
        # dedup_minhash_lsh: the verify step IS the exact shingle-join (same
        # machinery as dedup_ngram_jaccard restricted to LSH-candidate docs),
        # and every gate dup pair has jaccard >= 0.889 -> per-pair LSH miss
        # probability <= (1 - 0.889^4)^16 ~ 2e-7 (measured recall 1.0, pinned
        # by tests/test_functions.py::test_minhash_lsh_recall_vs_exact).
        "dedup_minhash_lsh": (
            "WITH docs AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS a FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, list_extract(a, i) || ' ' || list_extract(a, i+1) || ' ' || "
            "list_extract(a, i+2) AS g FROM docs, UNNEST(range(1, len(a)-1)) AS t(i) WHERE len(a) >= 3), "
            "sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i FROM tri a "
            "JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(i*100 // (sa.n + sb.n - i) AS BIGINT) AS jaccard_pct "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE i*100 >= 30*(sa.n + sb.n - i) ORDER BY doc_a, doc_b"
        ),
        "dedup_ngram_jaccard": (
            "WITH docs AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS a FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, list_extract(a, i) || ' ' || list_extract(a, i+1) || ' ' || "
            "list_extract(a, i+2) AS g FROM docs, UNNEST(range(1, len(a)-1)) AS t(i) WHERE len(a) >= 3), "
            "sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i FROM tri a "
            "JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(i*100 // (sa.n + sb.n - i) AS BIGINT) AS jaccard_pct "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE i*100 >= 30*(sa.n + sb.n - i) ORDER BY doc_a, doc_b"
        ),
        # transitive closure of the same pair graph: recursive min-label
        # reachability == the engine's min-label propagation fixpoint
        "dedup_connected_components": (
            "WITH RECURSIVE docs AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS a FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, list_extract(a, i) || ' ' || list_extract(a, i+1) || ' ' || "
            "list_extract(a, i+2) AS g FROM docs, UNNEST(range(1, len(a)-1)) AS t(i) WHERE len(a) >= 3), "
            "sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i FROM tri a "
            "JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "pairs AS (SELECT doc_a, doc_b FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
            "JOIN sizes sb ON sb.doc_id = doc_b WHERE i*100 >= 30*(sa.n + sb.n - i)), "
            "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs), "
            "reach(node, lab) AS (SELECT s, s FROM edges UNION "
            "SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node), "
            "cc AS (SELECT node, MIN(lab) AS canon_id FROM reach GROUP BY node), "
            "sz AS (SELECT canon_id, COUNT(*) AS n_members FROM cc GROUP BY canon_id) "
            "SELECT node AS doc_id, cc.canon_id, sz.n_members, CAST(node = cc.canon_id AS BIGINT) AS keep "
            "FROM cc JOIN sz USING (canon_id) ORDER BY doc_id"
        ),
        # representative selection: same components, keep the max-n_chars
        # member (doc_id asc tiebreak) instead of the min id
        "dedup_cluster_representatives": (
            "WITH RECURSIVE docs AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS a FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, list_extract(a, i) || ' ' || list_extract(a, i+1) || ' ' || "
            "list_extract(a, i+2) AS g FROM docs, UNNEST(range(1, len(a)-1)) AS t(i) WHERE len(a) >= 3), "
            "sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY 1), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i FROM tri a "
            "JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "pairs AS (SELECT doc_a, doc_b FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
            "JOIN sizes sb ON sb.doc_id = doc_b WHERE i*100 >= 30*(sa.n + sb.n - i)), "
            "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs), "
            "reach(node, lab) AS (SELECT s, s FROM edges UNION "
            "SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node), "
            "cc AS (SELECT node, MIN(lab) AS canon_id FROM reach GROUP BY node), "
            "sz AS (SELECT canon_id, COUNT(*) AS n_members FROM cc GROUP BY canon_id), "
            "q AS (SELECT cc.node, cc.canon_id, sz.n_members, d.n_chars, "
            "ROW_NUMBER() OVER (PARTITION BY cc.canon_id "
            "ORDER BY d.n_chars DESC, cc.node) AS rn "
            "FROM cc JOIN sz USING (canon_id) JOIN documents d ON d.doc_id = cc.node) "
            "SELECT canon_id, node AS rep_doc_id, n_members, "
            "CAST(n_chars AS BIGINT) AS rep_n_chars FROM q WHERE rn = 1 ORDER BY canon_id"
        ),
        # semdedup: centroid sampling/assignment exact int64 (ann_pq
        # convention); within-cluster cosine uses the 0.42 margin bound
        # above; components via the recursive min-label CTE
        "semdedup_keep": (
            "WITH RECURSIVE ev AS (SELECT vec_id, i, "
            "CAST(FLOOR(CAST(list_extract(embedding, i) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS v "
            "FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)), "
            "cbidx AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid "
            "FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)), "
            "cb AS (SELECT c.cid, e.i, e.v FROM cbidx c JOIN ev e USING (vec_id)), "
            "dist AS (SELECT a.vec_id, b.cid, SUM((a.v - b.v) * (a.v - b.v)) AS d "
            "FROM ev a JOIN cb b ON a.i = b.i GROUP BY 1, 2), "
            "asg AS (SELECT vec_id, cid FROM dist "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1), "
            "pairs AS (SELECT x.vec_id AS a, y.vec_id AS b, ax.cid FROM embeddings x "
            "JOIN asg ax ON ax.vec_id = x.vec_id "
            "JOIN asg ay ON ay.cid = ax.cid "
            "JOIN embeddings y ON y.vec_id = ay.vec_id AND x.vec_id < y.vec_id "
            "WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.42), "
            "edges AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs), "
            "reach(node, lab) AS (SELECT s, s FROM edges UNION "
            "SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node), "
            "cc AS (SELECT node, MIN(lab) AS keep_id FROM reach GROUP BY node) "
            "SELECT node AS vec_id, CAST(asg.cid AS BIGINT) AS cluster_id, cc.keep_id, "
            "CAST(node = cc.keep_id AS BIGINT) AS kept "
            "FROM cc JOIN asg ON asg.vec_id = cc.node ORDER BY vec_id"
        ),
        # --- similarity search ---
        "ann_brute_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5) "
            "SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, neighbor_id FROM ("
            "SELECT q.query_id, b.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
            "FROM q, embeddings b WHERE b.vec_id != q.query_id) t WHERE rn <= 10 ORDER BY query_id, rank"
        ),
        # SQ8 scalar quantization: exact integer pipeline — micro-int
        # components, ONE global symmetric scale amax, codes
        # (xi+amax)*127//amax - 127 (zero-centered: preserves the dot
        # ranking), integer dot-product scores
        "ann_sq_topk": (
            "WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
            "CAST(FLOOR(unnest(embedding)*1000000 + 0.5) AS BIGINT) AS xi FROM embeddings), "
            "mm AS (SELECT GREATEST(MAX(ABS(xi)), 1) AS amax FROM e), "
            "c AS (SELECT vec_id, dim, ((xi + amax)*127)//amax - 127 AS code "
            "FROM e, mm), "
            "qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5), "
            "q AS (SELECT * FROM c WHERE vec_id IN (SELECT vec_id FROM qids)), "
            "s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            "SUM(q.code*c.code) AS score FROM q JOIN c ON q.dim = c.dim "
            "AND c.vec_id != q.vec_id GROUP BY 1, 2) "
            "SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, neighbor_id FROM ("
            "SELECT query_id, neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn FROM s) t "
            "WHERE rn <= 10 ORDER BY query_id, rank"
        ),
        # 0.30 sits >= 4.5e-4 from every query-x-corpus cosine (measured
        # at all 3 sfs, pinned by pytest) — membership can't flip
        "ann_range_search": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5) "
            "SELECT q.query_id, b.vec_id AS neighbor_id FROM q, embeddings b "
            "WHERE b.vec_id != q.query_id "
            "AND list_cosine_similarity(q.qe, b.embedding) >= 0.30 "
            "ORDER BY query_id, neighbor_id"
        ),
        "ann_filtered_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5) "
            "SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, neighbor_id FROM ("
            "SELECT q.query_id, b.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
            "FROM q, embeddings b WHERE b.vec_id != q.query_id AND b.label = 1) t "
            "WHERE rn <= 10 ORDER BY query_id, rank"
        ),
        # (anchor, positive, hard-negative) triples: top-1 same-label
        # and top-1 different-label neighbor per anchor
        "contrastive_triples": (
            "WITH q AS (SELECT vec_id AS anchor_id, embedding AS qe, label AS ql "
            "FROM embeddings ORDER BY vec_id LIMIT 5), "
            "p AS (SELECT q.anchor_id, b.vec_id AS positive_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.anchor_id ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
            "FROM q, embeddings b WHERE b.label = q.ql AND b.vec_id != q.anchor_id), "
            "n AS (SELECT q.anchor_id, b.vec_id AS negative_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.anchor_id ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
            "FROM q, embeddings b WHERE b.label != q.ql) "
            "SELECT p.anchor_id, p.positive_id, n.negative_id "
            "FROM p JOIN n ON p.anchor_id = n.anchor_id AND p.rn = 1 AND n.rn = 1 "
            "ORDER BY p.anchor_id"
        ),
        # hard negatives: per-anchor top-k among DIFFERENT-label vectors
        "hard_negative_mining": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql "
            "FROM embeddings ORDER BY vec_id LIMIT 5) "
            "SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, neighbor_id FROM ("
            "SELECT q.query_id, b.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
            "FROM q, embeddings b WHERE b.label != q.ql) t "
            "WHERE rn <= 10 ORDER BY query_id, rank"
        ),
        # ann_ivf_topk: served from the persisted cluster-partitioned IVF
        # index (ann.py:build_ivf_index); n_probe=30/32 gives measured
        # recall 1.0 on the gate corpora (isotropic vectors scatter true
        # neighbors across clusters — see ann.py docstring), so the brute
        # top-k SQL is a true oracle here.
        "ann_ivf_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 5) "
            "SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, neighbor_id FROM ("
            "SELECT q.query_id, b.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
            "PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
            "FROM q, embeddings b WHERE b.vec_id != q.query_id) t WHERE rn <= 10 ORDER BY query_id, rank"
        ),
        # ann_pq_topk: the WHOLE PQ pipeline (quantize -> sampled codebook
        # -> argmin encode -> ADC) in exact int64 on both sides.
        "ann_pq_topk": _data_oracle().ann_pq_sql(),
        # IVF-PQ == the full PQ scan at gate n_probe (probe containment
        # pytest-asserted), so it shares the exact-integer ADC oracle
        "ann_ivfpq_topk": _data_oracle().ann_pq_sql(),
        "embedding_label_counts": (
            "SELECT label, CAST(len(embedding) AS BIGINT) AS n_dims, COUNT(*) AS n "
            "FROM embeddings GROUP BY 1, 2 ORDER BY label"
        ),
        # --- text analysis ---
        "token_count": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END AS n_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "bpe_ish_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) "
            "AS n_bpe_tokens FROM documents ORDER BY doc_id"
        ),
        # unigram-LM segmentation: Viterbi piece map generated from the
        # engine over the sf-invariant word set; counts corpus-weighted
        "unigram_segment_counts": _data_oracle().unigram_segment_sql(
            max_piece_len=4, top_k=64, k_out=30),
        # BPE encode: rules from the sf-invariant word set, counts
        # corpus-weighted
        "bpe_encode_counts": _data_oracle().bpe_encode_sql(
            n_merges=10, k_out=30),
        # winnowing (MOSS): min k-gram hash per guarantee window
        "winnowing_fingerprints": _data_oracle().winnowing_sql(
            window=8, guarantee=4),
        # per-source trigram diversity: distinct/total grams, micro-units
        "ngram_diversity": (
            "WITH toks AS (SELECT source, doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS l FROM documents "
            "WHERE trim(text) <> ''), "
            "g AS (SELECT source, list_extract(l, i) || ' ' || list_extract(l, i+1) "
            "|| ' ' || list_extract(l, i+2) AS gram "
            "FROM toks, UNNEST(range(1, len(l) - 1)) AS t(i)) "
            "SELECT source, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct, "
            "CAST(COUNT(*) AS BIGINT) AS n_total, "
            "CAST(COUNT(DISTINCT gram) * 1000000 // COUNT(*) AS BIGINT) AS diversity_micro "
            "FROM g GROUP BY source ORDER BY source"
        ),
        # PMI collocations: L(N*cab) - L(ca*cb) micro-nats, doc-level
        # co-occurrence of the stop-filtered distinct term sets
        "pmi_term_pairs": (
            "WITH d AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
            f"x -> NOT list_contains({_STOP_SQL}, x))) END AS ts FROM documents), "
            "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents), "
            "t AS (SELECT doc_id, unnest(ts) AS term FROM d), "
            "c1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY term), "
            "cp AS (SELECT a.term AS ta, b.term AS tb, CAST(COUNT(*) AS BIGINT) AS cab "
            "FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1, 2) "
            "SELECT ta AS term_a, tb AS term_b, cab AS n_docs_both, "
            "CAST(FLOOR(ln(CAST(n.nd * cab AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) "
            "- CAST(FLOOR(ln(CAST(ca.df * cb.df AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS pmi_micro "
            "FROM cp JOIN c1 ca ON ca.term = cp.ta JOIN c1 cb ON cb.term = cp.tb, n "
            "WHERE cab >= 20 ORDER BY pmi_micro DESC, term_a, term_b LIMIT 20"
        ),
        # per-lang subword fertility: BPE-ish tokens per whitespace word
        "token_fertility": (
            "SELECT lang, CAST(SUM(w) AS BIGINT) AS n_words, "
            "CAST(SUM(bpe) AS BIGINT) AS n_subwords, "
            "CAST(SUM(bpe) * 1000000 // GREATEST(SUM(w), 1) AS BIGINT) AS fertility_micro "
            "FROM (SELECT lang, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS w, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS bpe "
            "FROM documents) GROUP BY lang ORDER BY lang"
        ),
        "quality_signals": (
            "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS toks, length(text) AS n_chars FROM documents) "
            "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            f"CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS BIGINT) AS n_stopwords, "
            "CAST(n_chars AS BIGINT) AS n_chars FROM t ORDER BY doc_id"
        ),
        "lang_id": (
            "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents) "
            "SELECT doc_id, CASE WHEN len(toks) = 0 THEN 'und' "
            f"WHEN len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 100 >= 20 * len(toks) "
            "THEN 'en' ELSE 'other' END AS pred_lang FROM t ORDER BY doc_id"
        ),
        "md5_fingerprint": (
            "SELECT doc_id, md5(lower(text)) AS sig FROM documents ORDER BY doc_id"
        ),
        "rolling_fingerprint": _data_oracle().rolling_fingerprint_sql(),
        "stemmed_term_counts": _data_oracle().stemmed_term_counts_sql(),
        # KeywordRepeat: surface query hits exact forms, stem query hits
        # every inflection through either emitted token
        "keyword_repeat_docs": _data_oracle().keyword_repeat_sql("value", "valu"),
        # GermanLightStemmer over the umlaut/ending-augmented de view
        "german_stem_counts": _data_oracle().german_stem_counts_sql(k=20),
        "stemmer_override_counts": _data_oracle().stemmed_term_counts_sql(
            overrides={"merge": "merge", "filter": "filt3r"}),
        "phonetic_term_groups": _data_oracle().phonetic_term_groups_sql(k=50),
        "refined_phonetic_groups": _data_oracle().refined_phonetic_groups_sql(k=50),
        "fingerprint_dedup_groups": (
            "WITH fps AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
            f"list_filter({split}, x -> x != '' AND NOT list_contains({_STOP_SQL}, x)))), ' ')) AS fp "
            "FROM documents) "
            "SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc "
            "FROM fps GROUP BY fp ORDER BY n_docs DESC, fp LIMIT 20"
        ),
        "limit_token_counts": (
            f"WITH toks AS (SELECT unnest(list_filter({split}, "
            f"x -> x != '' AND NOT list_contains({_STOP_SQL}, x))[1:10]) AS term FROM documents) "
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS tf_sum FROM toks "
            "GROUP BY term ORDER BY tf_sum DESC, term LIMIT 20"
        ),
        "path_hierarchy_counts": (
            "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_docs FROM ("
            "SELECT lang AS path FROM documents "
            "UNION ALL SELECT lang || '/' || source FROM documents) "
            "GROUP BY path ORDER BY path"
        ),
        "decontaminate_ngram": _data_oracle().decontaminate_sql(),
        # bloom prefilter + exact audit == the exact pass by construction
        "decontaminate_bloom": _data_oracle().decontaminate_sql(),
        "boilerplate_strip": _data_oracle().boilerplate_strip_sql(),
        "chunk_documents": _data_oracle().chunk_documents_sql(),
        "repetition_signals": _data_oracle().repetition_sql(),
        "pii_scan": _data_oracle().pii_scan_sql(),
        # fixed-weight linear quality model, exact ints both sides
        "quality_logit_select": (
            "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS a, length(text) AS nc FROM documents), "
            "tok AS (SELECT doc_id, t FROM docs, UNNEST(a) AS u(t)), "
            "uc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2), "
            "uni AS (SELECT doc_id, COUNT(*) AS n_distinct, MAX(c) AS mx FROM uc GROUP BY 1), "
            "sp AS (SELECT doc_id, len(list_distinct(list_filter(a, "
            "x -> list_contains(['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'], x)))) AS stop_hits FROM docs), "
            "s AS (SELECT d.doc_id, CAST(50 * COALESCE(n_distinct, 0) + 20 * stop_hits "
            "- 30 * COALESCE(mx, 0) - nc // 10 AS BIGINT) AS logit_milli "
            "FROM docs d LEFT JOIN uni USING (doc_id) JOIN sp USING (doc_id)) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY logit_milli DESC, doc_id) - 1 AS BIGINT) AS rank, "
            "doc_id, logit_milli FROM s ORDER BY logit_milli DESC, doc_id LIMIT 100"
        ),
        "cluster_kmeans_docs": _data_oracle().cluster_kmeans_sql(),
        "cluster_labels": _data_oracle().cluster_labels_sql(),
        # substring/line-level exact dedup: engine shuffles md5-64 hashes,
        # oracle groups the strings themselves (collision-free reference)
        "dup_gram_exposure": _data_oracle().dup_gram_exposure_sql(),
        "exact_substring_remove": _data_oracle().exact_substring_remove_sql(),
        "gopher_quality_flags": _data_oracle().gopher_quality_sql(),
        "line_dedup_first": _data_oracle().line_dedup_sql(),
        # DSIR: micro-nat-quantized log-ratios -> exact int64 doc weights
        "dsir_select_topk": _data_oracle().dsir_select_sql(),
        "lm_quality_scores": _data_oracle().lm_quality_sql(),
        "clean_corpus_export": _data_oracle().clean_corpus_sql(),
        # hash-Bernoulli domain mixing: md5_number_upper == the engine's
        # int.from_bytes(md5[:8], 'little') (simhash-oracle convention)
        # token-budget domain mixing: inclusive per-source running token
        # count in doc_id order, keep while <= budget
        "token_budget_select": (
            "WITH t AS (SELECT doc_id, source, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n FROM documents), "
            "c AS (SELECT doc_id, source, CAST(SUM(n) OVER ("
            "PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_tokens FROM t) "
            "SELECT doc_id, source, cum_tokens FROM c WHERE cum_tokens <= 600 "
            "ORDER BY doc_id"
        ),
        "mix_weighted_sample": (
            "SELECT doc_id, source, CAST(20 + md5_number_upper(source) % 61 AS BIGINT) AS rate_pct "
            "FROM documents "
            "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 20 + md5_number_upper(source) % 61 "
            "ORDER BY doc_id"
        ),
        # concat-and-chunk packing: window prefix sum == the engine's
        # two-level distributed prefix sum
        "pack_concat_chunks": (
            "WITH tok AS (SELECT doc_id, len(regexp_split_to_array(text,'\\s+')) AS n FROM documents), "
            "pre AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS s FROM tok) "
            "SELECT doc_id, CAST(s // 256 AS BIGINT) AS chunk_id, "
            "CAST(s % 256 AS BIGINT) AS offset_in_chunk, "
            "CAST(CASE WHEN n > 0 THEN (s + n - 1) // 256 - s // 256 + 1 ELSE 1 END AS BIGINT) "
            "AS n_chunks_spanned FROM pre ORDER BY doc_id"
        ),
        # lang_dispatch: ja/zh/ko rows route through their dictionary
        # lattice chains; all degenerate to the standard chain on this
        # CJK-free corpus (the routing itself shows in the analyzer
        # column; real-CJK gold segmentations are pinned in
        # tests/test_analysis.py)
        "lang_dispatch_token_counts": (
            "WITH t AS (SELECT doc_id, lang, CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents) "
            "SELECT doc_id, CASE WHEN lang = 'ja' THEN 'ja_morph' "
            "WHEN lang = 'zh' THEN 'zh_dict' "
            "WHEN lang = 'ko' THEN 'ko_morph' ELSE 'standard' END "
            "AS analyzer, "
            f"CAST(len(list_filter(toks, x -> NOT list_contains({_STOP_SQL}, x))) AS BIGINT) "
            "AS n_tokens FROM t ORDER BY doc_id"
        ),
        # the oracle side is the HAND-written gold segmentation table —
        # the engine side runs the real Viterbi lattice at query time
        "ja_morphology_tokens": __import__(
            "lucene_solr_ray.functions.textstats", fromlist=["ja_morphology_sql"]
        ).ja_morphology_sql(),
        "ko_morphology_tokens": __import__(
            "lucene_solr_ray.functions.textstats", fromlist=["ko_morphology_sql"]
        ).ko_morphology_sql(),
        # ICUFoldingFilter: oracle carries hand-written NFKC+casefold+strip
        # golds; the engine folds the raw forms at runtime
        "icu_folding_tokens": __import__(
            "lucene_solr_ray.functions.textstats", fromlist=["icu_folding_sql"]
        ).icu_folding_sql(),
        # charfilter chain rewrites whole-word merge->combine and the char
        # sequence window->pane BEFORE tokenizing; neither target token
        # exists in the corpus, so rewritten counts == original counts
        # TopTermsRewrite: cap the s* expansion at the 2 highest-df terms
        "ft_wildcard_topterms": (
            f"WITH t AS (SELECT doc_id, unnest(list_distinct(list_filter({split}, "
            f"x -> x LIKE 's%' AND NOT list_contains({_STOP_SQL}, x)))) AS term FROM documents), "
            "top2 AS (SELECT term FROM (SELECT term, COUNT(*) AS df FROM t GROUP BY term) "
            "ORDER BY df DESC, term LIMIT 2) "
            "SELECT DISTINCT doc_id FROM t WHERE term IN (SELECT term FROM top2) ORDER BY doc_id"
        ),
        # BPE round-1 statistic: adjacent char pairs weighted by word freq
        "bpe_pair_counts": (
            "WITH wc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM "
            "(SELECT unnest(CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END) AS term FROM documents) GROUP BY term), "
            "p AS (SELECT substring(term, CAST(i AS INT), 2) AS pair, n FROM wc, "
            "unnest(range(1, length(term))) AS t(i)) "
            "SELECT pair, CAST(SUM(n) AS BIGINT) AS n FROM p "
            "GROUP BY pair ORDER BY n DESC, pair LIMIT 20"
        ),
        # UAX29URLEmail: emails = one token; totals = emails + standard
        # tokens of the email-stripped remainder (same two regexes)
        # ElisionFilter over the French-augmented view: every (doc_id +
        # pos) % 4 == 0 token gains an elidable-article prefix the chain
        # must strip back; token count is invariant, elided count exact
        "elision_token_counts": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT) ELSE "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END AS n_tokens, "
            "CASE WHEN trim(text) = '' THEN CAST(0 AS BIGINT) ELSE "
            "CAST(len(list_filter(range(len(regexp_split_to_array(trim(text), '\\s+'))), "
            "i -> (doc_id + i) % 4 = 0)) AS BIGINT) END AS n_elided "
            "FROM documents WHERE lang = 'fr' ORDER BY doc_id"
        ),
        "urlemail_token_counts": (
            "WITH aug AS (SELECT doc_id, text || ' contact u' || doc_id || '@example.org ip 10.0.' "
            "|| (doc_id % 256) || '.' || (doc_id % 100) || ' tel 555-' "
            "|| CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS s "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email, "
            "CAST(len(regexp_extract_all(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) "
            "+ len(regexp_extract_all(regexp_replace(s, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', ' ', 'g'), "
            "'\\w+(?:[.'']\\w+)*')) AS BIGINT) AS n_tokens "
            "FROM aug ORDER BY doc_id"
        ),
        # DocumentDictionary weight = sum of n_chars over docs holding term
        "ft_docdict_suggest": (
            "WITH t AS (SELECT doc_id, n_chars, unnest(list_distinct(list_filter("
            f"{split}, x -> x LIKE 's%' AND NOT list_contains({_STOP_SQL}, x)))) AS term "
            "FROM documents) "
            "SELECT term, CAST(SUM(n_chars) AS BIGINT) AS weight FROM t "
            "GROUP BY term ORDER BY weight DESC, term LIMIT 5"
        ),
        "term_facet_prefix": (
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM "
            f"(SELECT unnest({split}) AS term FROM documents) "
            f"WHERE term LIKE 's%' AND NOT list_contains({_STOP_SQL}, term) "
            "GROUP BY term ORDER BY n DESC, term LIMIT 10"
        ),
        # edge n-grams over the canonical chain (= whitespace tokens minus
        # stopwords on this corpus); grams are prefixes of length 2..4
        "edge_ngram_counts": (
            "WITH tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM "
            f"(SELECT unnest({split}) AS term FROM documents) "
            f"WHERE NOT list_contains({_STOP_SQL}, term) GROUP BY term), "
            "g AS (SELECT substr(term, 1, CAST(gs.g AS INT)) AS gram, n FROM tc, "
            "generate_series(2, 4) AS gs(g) WHERE length(term) >= gs.g) "
            "SELECT gram, CAST(SUM(n) AS BIGINT) AS n FROM g GROUP BY gram "
            "ORDER BY n DESC, gram LIMIT 20"
        ),
        "charfilter_token_counts": (
            "WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents) "
            "SELECT doc_id, CAST(len(list_filter(toks, x -> x = 'merge')) AS BIGINT) AS n_combine, "
            "CAST(len(list_filter(toks, x -> x = 'window')) AS BIGINT) AS n_pane "
            "FROM t ORDER BY doc_id"
        ),
        # synonym graph contraction: rule token sets are overlap-free, so
        # independent position marking == the engine's greedy scan; each
        # n:1 match removes exactly one net token
        "synonym_graph_counts": (
            "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
            "tok AS (SELECT doc_id, i, list_extract(a, i) AS w FROM docs, "
            "UNNEST(range(1, len(a) + 1)) AS t(i)), "
            "m1 AS (SELECT a.doc_id, COUNT(*) AS c FROM tok a JOIN tok b "
            "ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
            "WHERE a.w = 'merge' AND b.w = 'join' GROUP BY 1), "
            "m2 AS (SELECT a.doc_id, COUNT(*) AS c FROM tok a JOIN tok b "
            "ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
            "WHERE a.w = 'window' AND b.w = 'vector' GROUP BY 1) "
            "SELECT d.doc_id, CAST(COALESCE(m1.c, 0) AS BIGINT) AS n_hashjoin, "
            "CAST(COALESCE(m2.c, 0) AS BIGINT) AS n_winvec, "
            "CAST(len(d.a) - COALESCE(m1.c, 0) - COALESCE(m2.c, 0) AS BIGINT) AS n_tokens "
            "FROM docs d LEFT JOIN m1 ON m1.doc_id = d.doc_id "
            "LEFT JOIN m2 ON m2.doc_id = d.doc_id ORDER BY d.doc_id"
        ),
        # common grams: a gram is emitted at i when token i or i+1 is in
        # the common set; the filter ADDS tokens (stream = len + grams)
        "common_grams_counts": (
            "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
            "tok AS (SELECT doc_id, i, list_extract(a, i) AS w FROM docs, "
            "UNNEST(range(1, len(a) + 1)) AS t(i)), "
            "g AS (SELECT a.doc_id, COUNT(*) AS c FROM tok a JOIN tok b "
            "ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
            "WHERE a.w IN ('the', 'a') OR b.w IN ('the', 'a') GROUP BY 1) "
            "SELECT d.doc_id, CAST(COALESCE(g.c, 0) AS BIGINT) AS n_grams, "
            "CAST(len(d.a) + COALESCE(g.c, 0) AS BIGINT) AS n_stream "
            "FROM docs d LEFT JOIN g ON g.doc_id = d.doc_id ORDER BY d.doc_id"
        ),
        # --- multimodal ---
        "multimodal_payload_stats": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "md5(text) AS digest FROM documents ORDER BY doc_id"
        ),
        "multimodal_fake_decode": _data_oracle().multimodal_fake_decode_sql(),
        # stride-2 byte decimation == keep 1st char of each pair ((?s):
        # '.' must cross newlines); corpus is pure ASCII so chars == bytes
        "multimodal_resample": (
            "WITH r AS (SELECT doc_id, "
            "regexp_replace(text, '(?s)(.)(.)', '\\1', 'g') AS dec FROM documents) "
            "SELECT doc_id, CAST(octet_length(encode(dec)) AS BIGINT) AS n_bytes_out, "
            "md5(dec) AS digest_out FROM r ORDER BY doc_id"
        ),
        "multimodal_feature_extract": (
            "WITH d AS (SELECT doc_id, md5(text) AS dg FROM documents) SELECT doc_id, "
            + ", ".join(
                f"CAST(md5_number_upper(dg || '-{i}') % 256 AS BIGINT) AS f{i}"
                for i in range(8))
            + " FROM d ORDER BY doc_id"
        ),
        # cross-modal retrieval: exact-int squared-L2 on the fake
        # feature grid, first-3 payloads as queries, self excluded
        "multimodal_crossmodal_topk": (
            "WITH f AS (SELECT doc_id, "
            + ", ".join(
                f"CAST(md5_number_upper(md5(text) || '-{i}') % 256 AS BIGINT) AS f{i}"
                for i in range(8))
            + " FROM documents), "
            "q AS (SELECT * FROM f ORDER BY doc_id LIMIT 3) "
            "SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, neighbor_id, dist FROM ("
            "SELECT q.doc_id AS query_id, b.doc_id AS neighbor_id, "
            + " + ".join(f"(q.f{i} - b.f{i}) * (q.f{i} - b.f{i})" for i in range(8))
            + " AS dist, ROW_NUMBER() OVER (PARTITION BY q.doc_id ORDER BY "
            + " + ".join(f"(q.f{i} - b.f{i}) * (q.f{i} - b.f{i})" for i in range(8))
            + ", b.doc_id) AS rn FROM q, f b WHERE b.doc_id != q.doc_id) t "
            "WHERE rn <= 5 ORDER BY query_id, rank"
        ),
        # payload == utf-8 text bytes (pure-ASCII corpus), so SQL string
        # slices == the engine's byte slices; stride 4, max 5 frames
        "multimodal_frame_sample": (
            "WITH f AS (SELECT doc_id, text, length(text) // 8 AS n_frames FROM documents), "
            "idx AS (SELECT doc_id, text, unnest(range(0, n_frames, 4)) AS frame_idx FROM f), "
            "lim AS (SELECT doc_id, text, CAST(frame_idx AS BIGINT) AS frame_idx, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS rn FROM idx) "
            "SELECT doc_id, frame_idx, md5(substring(text, frame_idx * 8 + 1, 8)) AS frame_md5 "
            "FROM lim WHERE rn <= 5 ORDER BY doc_id, frame_idx"
        ),
        "highlight_snippets": _data_oracle().highlight_sql(["vector", "stream"]),
        # classic Highlighter / SimpleFragmenter: token -> fragment
        # floor(end_offset/80), end offset = whitespace prefix sums;
        # best fragment per doc = (hit count desc, frag asc)
        "ft_classic_highlight": (
            f"WITH toks AS (SELECT doc_id, unnest(l) AS tok, "
            f"CAST(generate_subscripts(l, 1) AS BIGINT) AS i "
            f"FROM (SELECT doc_id, {split} AS l FROM documents WHERE trim(text) <> '')), "
            "off AS (SELECT doc_id, tok, "
            "SUM(len(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i) - 2 AS end_off FROM toks), "
            "sc AS (SELECT doc_id, CAST(end_off // 80 AS BIGINT) AS frag_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_hits FROM off "
            "WHERE tok IN ('merge', 'vector') GROUP BY 1, 2), "
            "best AS (SELECT doc_id, frag_id, n_hits, ROW_NUMBER() OVER ("
            "PARTITION BY doc_id ORDER BY n_hits DESC, frag_id) AS rn FROM sc) "
            "SELECT doc_id, frag_id, n_hits FROM best WHERE rn = 1 ORDER BY doc_id"
        ),
        "hll_distinct": _data_oracle().hll_distinct_sql(),
        # sketch-union identity: union registers == registers of the
        # OR-filtered set, so each side is the replicated HLL pipeline
        "hll_union_distinct": (
            "SELECT * FROM ("
            "SELECT 'a' AS subset, ("
            + _data_oracle().hll_distinct_sql(
                table="(SELECT user_id FROM events WHERE event_type = 'purchase')")
            + ") AS approx_distinct "
            "UNION ALL SELECT 'b', ("
            + _data_oracle().hll_distinct_sql(
                table="(SELECT user_id FROM events WHERE event_type = 'signup')")
            + ") UNION ALL SELECT 'union', ("
            + _data_oracle().hll_distinct_sql(
                table="(SELECT user_id FROM events WHERE event_type IN ('purchase', 'signup'))")
            + ")) ORDER BY subset"
        ),
        # heavy hitters: the closed vocab sits far below sketch capacity,
        # so SpaceSaving never evicts -> exact counts, err identically 0
        "heavy_hitters_topk": (
            "WITH docs AS (SELECT CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
            "cnt AS (SELECT w AS term, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM docs, UNNEST(a) AS t(w) GROUP BY 1) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) - 1 AS BIGINT) AS rank, "
            "term, n, CAST(0 AS BIGINT) AS err FROM cnt "
            "ORDER BY rank LIMIT 20"
        ),
        # Count-Min: the oracle rebuilds the sketch cell-for-cell
        # (md5_number_upper == the engine's little-endian md5-64)
        "count_min_estimate": (
            "WITH toks AS (SELECT unnest(CASE WHEN trim(text) = '' THEN [] ELSE "
            "regexp_split_to_array(trim(text), '\\s+') END) AS term FROM documents), "
            "tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY term), "
            "cells AS (SELECT r.r AS row, "
            "CAST(md5_number_upper(term || ':' || r.r) % 16 AS BIGINT) AS bucket, "
            "CAST(SUM(n) AS BIGINT) AS n FROM tc, generate_series(0, 3) AS r(r) GROUP BY 1, 2), "
            "probes(term) AS (VALUES ('join'), ('merge'), ('stream'), ('the'), "
            "('vector'), ('window'), ('zzz-absent')) "
            "SELECT p.term AS term, CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est_n "
            "FROM probes p CROSS JOIN generate_series(0, 3) AS r(r) "
            "LEFT JOIN cells c ON c.row = r.r AND "
            "c.bucket = CAST(md5_number_upper(p.term || ':' || r.r) % 16 AS BIGINT) "
            "GROUP BY p.term ORDER BY term"
        ),
        "tdigest_quantiles": _data_oracle().tdigest_quantiles_sql(),
        # --- SqlStream: the oracle runs the IDENTICAL SQL our planner ran ---
        "sql_stream_agg": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_DEMO"]).SQL_DEMO,
        "sql_stream_offset": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_OFFSET_DEMO"]).SQL_OFFSET_DEMO,
        "sql_stream_join": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_JOIN_DEMO"]).SQL_JOIN_DEMO,
        "sql_stream_left_join": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_LEFT_JOIN_DEMO"]).SQL_LEFT_JOIN_DEMO,
        "sql_stream_distinct": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_DISTINCT_DEMO"]).SQL_DISTINCT_DEMO,
        "sql_stream_join3": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_JOIN3_DEMO"]).SQL_JOIN3_DEMO,
        "sql_stream_in_like": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_IN_LIKE_DEMO"]).SQL_IN_LIKE_DEMO,
        "sql_stream_union": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_UNION_DEMO"]).SQL_UNION_DEMO,
        "sql_stream_count_distinct": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_COUNT_DISTINCT_DEMO"]).SQL_COUNT_DISTINCT_DEMO,
        "sql_stream_avg": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_AVG_DEMO"]).SQL_AVG_DEMO,
        "sql_stream_or_not": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_OR_NOT_DEMO"]).SQL_OR_NOT_DEMO,
        "sql_stream_scalar_expr": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_SCALAR_EXPR_DEMO"]).SQL_SCALAR_EXPR_DEMO,
        "sql_stream_between": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_BETWEEN_DEMO"]).SQL_BETWEEN_DEMO,
        "sql_stream_is_null": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_IS_NULL_DEMO"]).SQL_IS_NULL_DEMO,
        "sql_stream_agg_expr": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_AGG_EXPR_DEMO"]).SQL_AGG_EXPR_DEMO,
        "sql_stream_topn_groups": __import__("lucene_solr_ray.functions.sql", fromlist=["SQL_TOPN_GROUPS_DEMO"]).SQL_TOPN_GROUPS_DEMO,
        "split_leakage_audit": "WITH p AS (SELECT doc_id, array_to_string((regexp_split_to_array(trim(text), '\\s+'))[1:10], ' ') AS sig, CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'train' WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 95 THEN 'val' ELSE 'test' END AS split FROM documents) SELECT LEAST(a.split, b.split) AS split_a, GREATEST(a.split, b.split) AS split_b, COUNT(*) AS n_pairs FROM p a JOIN p b ON a.sig = b.sig AND a.doc_id < b.doc_id GROUP BY split_a, split_b ORDER BY split_a, split_b",
        "split_train_val_test": "SELECT source, CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'train' WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 95 THEN 'val' ELSE 'test' END AS split, COUNT(*) AS n_docs FROM documents GROUP BY source, split ORDER BY source, split",
        "dedup_incremental": "WITH p AS (SELECT doc_id, array_to_string((regexp_split_to_array(trim(text), '\\s+'))[1:10], ' ') AS sig FROM documents) SELECT n.doc_id, MIN(e.doc_id) AS dup_of FROM p n JOIN p e ON n.sig = e.sig AND n.doc_id % 2 = 1 AND e.doc_id % 2 = 0 GROUP BY n.doc_id ORDER BY n.doc_id",
        "domain_doc_counts": "WITH aug AS (SELECT doc_id, text || ' see https://sub' || (doc_id % 13) || '.example-' || (doc_id % 7) || '.com/p/' || doc_id AS a FROM documents) SELECT domain, COUNT(*) AS n_docs, CASE WHEN domain IN ('example-2.com', 'example-5.com') THEN 1 ELSE 0 END AS blocked FROM (SELECT regexp_extract(a, 'https://(?:[\\w-]+\\.)*([\\w-]+\\.com)', 1) AS domain FROM aug) GROUP BY domain ORDER BY domain",
        "geo_bbox_dist": (
            # identical coordinate derivation + haversine as geo.py
            "WITH g AS (SELECT c_custkey, "
            "CAST(((c_custkey * 37) % 180) AS DOUBLE) - 90 + 0.5 AS lat, "
            "CAST(((c_custkey * 73) % 360) AS DOUBLE) - 180 + 0.5 AS lon FROM customer) "
            "SELECT c_custkey, CAST(FLOOR(2 * 6371.0087714 * asin(sqrt("
            "pow(sin(radians(12.5 - lat)/2), 2) + "
            "cos(radians(lat)) * cos(radians(12.5)) * pow(sin(radians(42.5 - lon)/2), 2)"
            ")) * 10 + 0.5) AS BIGINT) AS dist_100m FROM g "
            "WHERE lat BETWEEN -60 AND 60 AND lon BETWEEN -120 AND 120 ORDER BY c_custkey"
        ),
        # {!geofilt}: radius cut on the shared 100m-quantized distance
        "geo_filt": (
            "WITH g AS (SELECT c_custkey, "
            "CAST(((c_custkey * 37) % 180) AS DOUBLE) - 90 + 0.5 AS lat, "
            "CAST(((c_custkey * 73) % 360) AS DOUBLE) - 180 + 0.5 AS lon FROM customer), "
            "d AS (SELECT c_custkey, CAST(FLOOR(2 * 6371.0087714 * asin(sqrt("
            "pow(sin(radians(12.5 - lat)/2), 2) + "
            "cos(radians(lat)) * cos(radians(12.5)) * pow(sin(radians(42.5 - lon)/2), 2)"
            ")) * 10 + 0.5) AS BIGINT) AS dist_100m FROM g) "
            "SELECT c_custkey, dist_100m FROM d WHERE dist_100m <= 30000 ORDER BY c_custkey"
        ),
        # annulus: {!frange}geodist() ring on the quantized distance
        "geo_annulus_docs": (
            "WITH g AS (SELECT c_custkey, "
            "CAST(((c_custkey * 37) % 180) AS DOUBLE) - 90 + 0.5 AS lat, "
            "CAST(((c_custkey * 73) % 360) AS DOUBLE) - 180 + 0.5 AS lon FROM customer), "
            "d AS (SELECT c_custkey, CAST(FLOOR(2 * 6371.0087714 * asin(sqrt("
            "pow(sin(radians(12.5 - lat)/2), 2) + "
            "cos(radians(lat)) * cos(radians(12.5)) * pow(sin(radians(42.5 - lon)/2), 2)"
            ")) * 10 + 0.5) AS BIGINT) AS dist_100m FROM g) "
            "SELECT c_custkey, dist_100m FROM d "
            "WHERE dist_100m BETWEEN 20000 AND 60000 ORDER BY c_custkey"
        ),
        # 0.5-grid coords + 0.5-grid vertices -> integer cross products,
        # bit-exact both sides including boundary points
        "geo_polygon_docs": (
            "WITH g AS (SELECT c_custkey, "
            "CAST(((c_custkey * 37) % 180) AS DOUBLE) - 90 + 0.5 AS lat, "
            "CAST(((c_custkey * 73) % 360) AS DOUBLE) - 180 + 0.5 AS lon FROM customer), "
            "x AS (SELECT c_custkey, "
            "(10.5 - (-100.5)) * (lat - (-40.5)) - (60.5 - (-40.5)) * (lon - (-100.5)) AS c1, "
            "(120.5 - 10.5) * (lat - 60.5) - ((-20.5) - 60.5) * (lon - 10.5) AS c2, "
            "((-100.5) - 120.5) * (lat - (-20.5)) - ((-40.5) - (-20.5)) * (lon - 120.5) AS c3 "
            "FROM g) "
            "SELECT c_custkey FROM x WHERE (c1 >= 0 AND c2 >= 0 AND c3 >= 0) "
            "OR (c1 <= 0 AND c2 <= 0 AND c3 <= 0) ORDER BY c_custkey"
        ),
        # even-odd ray crossing for a concave polygon, generated from the
        # same vertex list + doubled-integer-grid arithmetic as the engine
        "geo_polygon_concave_docs": __import__(
            "lucene_solr_ray.functions.geo", fromlist=["polygon_concave_sql"]
        ).polygon_concave_sql(),
        # polygon WITH HOLES: even-odd accumulated across all rings, so
        # hole interiors land outside; ring boundaries stay contained
        "geo_polygon_holes_docs": __import__(
            "lucene_solr_ray.functions.geo", fromlist=["polygon_holes_sql"]
        ).polygon_holes_sql(),
        # LatLonShape-style box-vs-box relate: WITHIN/INTERSECTS/DISJOINT
        # on the doubled integer grid, identical interval tests both sides
        "shape_bbox_relation": __import__(
            "lucene_solr_ray.functions.geo", fromlist=["shape_bbox_relation_sql"]
        ).shape_bbox_relation_sql(),
        "shape_polygon_relation": __import__(
            "lucene_solr_ray.functions.geo", fromlist=["shape_polygon_relation_sql"]
        ).shape_polygon_relation_sql(),
        "shape_triangle_relation": __import__(
            "lucene_solr_ray.functions.geo", fromlist=["shape_triangle_relation_sql"]
        ).shape_triangle_relation_sql(),
        "geo_nearest_topk": (
            "WITH g AS (SELECT c_custkey, "
            "CAST(((c_custkey * 37) % 180) AS DOUBLE) - 90 + 0.5 AS lat, "
            "CAST(((c_custkey * 73) % 360) AS DOUBLE) - 180 + 0.5 AS lon FROM customer), "
            "d AS (SELECT c_custkey, CAST(FLOOR(2 * 6371.0087714 * asin(sqrt("
            "pow(sin(radians(12.5 - lat)/2), 2) + "
            "cos(radians(lat)) * cos(radians(12.5)) * pow(sin(radians(42.5 - lon)/2), 2)"
            ")) * 10 + 0.5) AS BIGINT) AS dist_100m FROM g) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist_100m, c_custkey) - 1 AS BIGINT) AS rank, "
            "c_custkey, dist_100m FROM d ORDER BY dist_100m, c_custkey LIMIT 25"
        ),
        "geo_heatmap": (
            "SELECT ((c_custkey * 37) % 180) // 10 AS grid_row, "
            "((c_custkey * 73) % 360) // 10 AS grid_col, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs FROM customer "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # BKD-analogue point index: same derivation, plain bbox predicate
        # (the engine reads only intersecting cells; result is identical)
        "point_bbox_docs": (
            "SELECT c_custkey FROM (SELECT c_custkey, "
            "CAST(((c_custkey * 37) % 180) AS DOUBLE) - 89.5 AS lat, "
            "CAST(((c_custkey * 73) % 360) AS DOUBLE) - 179.5 AS lon FROM customer) "
            "WHERE lat >= -30.0 AND lat <= 40.0 AND lon >= -100.0 AND lon <= 50.0 "
            "ORDER BY c_custkey"
        ),
        "expression_sort": (
            "WITH e AS (SELECT p_partkey, CAST(FLOOR((sqrt(CAST(p_size AS DOUBLE)) * 2 + "
            "ln(p_retailprice) / 3 - abs(CAST(p_size AS DOUBLE) - 25)) * 1000 + 0.5) AS BIGINT) "
            "AS expr_milli FROM part) "
            "SELECT p_partkey, expr_milli FROM e ORDER BY expr_milli DESC, p_partkey LIMIT 100"
        ),
        # scale()/map() value sources — integer-exact both sides
        "scale_map_function": (
            "WITH s AS (SELECT MIN(n_chars) AS mn, "
            "GREATEST(1, MAX(n_chars) - MIN(n_chars)) AS rng FROM documents) "
            "SELECT doc_id, CAST((n_chars - s.mn) * 100000 // s.rng AS BIGINT) AS scaled_milli, "
            "CAST(CASE WHEN n_chars BETWEEN 0 AND 199 THEN 0 ELSE n_chars END AS BIGINT) AS mapped "
            "FROM documents, s ORDER BY doc_id"
        ),
        "frange_filter": (
            "WITH e AS (SELECT p_partkey, CAST(FLOOR((sqrt(CAST(p_size AS DOUBLE)) * 2 + "
            "ln(p_retailprice) / 3 - abs(CAST(p_size AS DOUBLE) - 25)) * 1000 + 0.5) AS BIGINT) "
            "AS expr_milli FROM part) "
            "SELECT p_partkey, expr_milli FROM e "
            "WHERE expr_milli BETWEEN -10000 AND 0 ORDER BY p_partkey"
        ),
        # LTR: integer weights x integer features -> hash-exact; the SQL
        # is generated FROM the model dicts so model and oracle can't drift.
        "ltr_linear_rescore": __import__(
            "lucene_solr_ray.functions.ltr", fromlist=["linear_oracle_sql"]
        ).linear_oracle_sql(),
        "ltr_trees_rescore": __import__(
            "lucene_solr_ray.functions.ltr", fromlist=["trees_oracle_sql"]
        ).trees_oracle_sql(),
        # MinMaxNormalizer: candidate-set extrema + micro-int normalize
        "ltr_minmax_rescore": __import__(
            "lucene_solr_ray.functions.ltr", fromlist=["minmax_oracle_sql"]
        ).minmax_oracle_sql(),
        # linear + trees summed (stacked rescore)
        "ltr_ensemble_rescore": __import__(
            "lucene_solr_ray.functions.ltr", fromlist=["ensemble_oracle_sql"]
        ).ensemble_oracle_sql(),
        "knn_classify": __import__(
            "lucene_solr_ray.functions.classify", fromlist=["KNN_ORACLE_SQL"]
        ).KNN_ORACLE_SQL,
        "nb_classify": _data_oracle().nb_classify_sql(),
        "taxonomy_facets": (
            "WITH w AS (SELECT regexp_split_to_array(p_type, ' ') AS a FROM part) "
            "SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM ("
            "SELECT list_extract(a, 1) AS path FROM w "
            "UNION ALL SELECT list_extract(a, 1) || '/' || list_extract(a, 2) FROM w WHERE len(a) >= 2"
            ") GROUP BY path ORDER BY path"
        ),
        # association facets: each doc's retailprice CENTS roll up to
        # every ancestor node beside the count
        "taxonomy_assoc_facets": (
            "WITH w AS (SELECT regexp_split_to_array(p_type, ' ') AS a, "
            + _CENTS.format(x="p_retailprice") + " AS cents FROM part) "
            "SELECT path, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS assoc_cents FROM ("
            "SELECT list_extract(a, 1) AS path, cents FROM w "
            "UNION ALL SELECT list_extract(a, 1) || '/' || list_extract(a, 2), cents "
            "FROM w WHERE len(a) >= 2"
            ") GROUP BY path ORDER BY path"
        ),
        "shortest_path": (
            # BFS distance == MIN(d) over the level-bounded recursive walk;
            # UNION dedupes (src, node, d) so the walk terminates.
            "WITH RECURSIVE adj AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v "
            "FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey), "
            "pairs(src, dst) AS (VALUES (1, 7), (2, 50)), "
            "walk(src, node, d) AS ("
            "SELECT src, src, 0 FROM pairs UNION "
            "SELECT w.src, adj.v, w.d + 1 FROM walk w JOIN adj ON adj.u = w.node WHERE w.d < 4) "
            "SELECT CAST(p.src AS BIGINT) AS src, CAST(p.dst AS BIGINT) AS dst, "
            "CAST(COALESCE(MIN(w.d), -1) AS BIGINT) AS distance "
            "FROM pairs p LEFT JOIN walk w ON w.src = p.src AND w.node = p.dst "
            "GROUP BY p.src, p.dst ORDER BY src, dst"
        ),
        # {!graph maxDepth=2}: reachable set with min hop count; UNION
        # dedupes (node, d) rows so the recursion terminates
        "graph_query_reachable": (
            "WITH RECURSIVE adj AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v "
            "FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey), "
            "walk(node, d) AS ("
            "SELECT CAST(1 AS BIGINT), 0 UNION "
            "SELECT adj.v, w.d + 1 FROM walk w JOIN adj ON adj.u = w.node WHERE w.d < 2) "
            "SELECT CAST(node AS BIGINT) AS suppkey, CAST(MIN(d) AS BIGINT) AS hops "
            "FROM walk GROUP BY node ORDER BY suppkey"
        ),
        "gather_nodes": (
            "SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_edges FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders JOIN customer "
            "ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING') "
            "GROUP BY l_suppkey ORDER BY l_suppkey"
        ),
        "score_nodes": _data_oracle().score_nodes_sql(),
        "stream_expr_score_nodes": _data_oracle().score_nodes_sql(),
        "stream_expr_reduce": (
            "SELECT doc_id, lang, n_chars FROM ("
            "SELECT doc_id, lang, n_chars, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 2 ORDER BY lang, doc_id"
        ),
        "stream_expr_shortest_path": (
            "WITH RECURSIVE adj AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v "
            "FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey), "
            "pairs(src, dst) AS (VALUES (1, 7)), "
            "walk(src, node, d) AS ("
            "SELECT src, src, 0 FROM pairs UNION "
            "SELECT w.src, adj.v, w.d + 1 FROM walk w JOIN adj ON adj.u = w.node WHERE w.d < 4) "
            "SELECT CAST(p.src AS BIGINT) AS src, CAST(p.dst AS BIGINT) AS dst, "
            "CAST(COALESCE(MIN(w.d), -1) AS BIGINT) AS distance "
            "FROM pairs p LEFT JOIN walk w ON w.src = p.src AND w.node = p.dst "
            "GROUP BY p.src, p.dst ORDER BY src, dst"
        ),
        # --- ingest ---
        # bad docs = doc_id % 25 == 0 (text blanked) -> skipped, not fatal
        # RFC-4122 v3: version nibble forced '3', variant = (n & 3) | 8
        # TruncateField runs FIRST, so sig/count see the capped text
        "urp_truncate": (
            "WITH t AS (SELECT doc_id, substring(text, 1, 120) AS tx FROM documents) "
            "SELECT doc_id, md5(tx) AS sig, "
            "CASE WHEN trim(tx) = '' THEN CAST(0 AS BIGINT) ELSE "
            "CAST(len(regexp_split_to_array(trim(tx), '\\s+')) AS BIGINT) END AS n_tokens "
            "FROM t ORDER BY doc_id"
        ),
        "urp_uuid_clone": (
            "WITH h AS (SELECT doc_id, md5(text) AS x, lang FROM documents) "
            "SELECT doc_id, substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-3' || "
            "substr(x, 14, 3) || '-' || "
            "CASE WHEN substr(x, 17, 1) IN ('0', '4', '8', 'c') THEN '8' "
            "WHEN substr(x, 17, 1) IN ('1', '5', '9', 'd') THEN '9' "
            "WHEN substr(x, 17, 1) IN ('2', '6', 'a', 'e') THEN 'a' ELSE 'b' END || "
            "substr(x, 18, 3) || '-' || substr(x, 21, 12) AS uuid, "
            "lang AS lang_copy FROM h ORDER BY doc_id"
        ),
        "urp_tolerant_update": (
            "SELECT doc_id, CASE WHEN doc_id % 25 = 0 OR trim(text) = '' THEN 'empty_text' ELSE '' END AS err, "
            "CAST(CASE WHEN doc_id % 25 = 0 OR trim(text) = '' THEN 0 ELSE 1 END AS BIGINT) AS accepted "
            "FROM documents ORDER BY doc_id"
        ),
        "dih_csv_ingest": (
            "SELECT doc_id, COALESCE(regexp_extract(text, '^(\\S+)'), '') AS first_tok, "
            "source || ':' || lang AS src_lang, n_chars FROM documents ORDER BY doc_id"
        ),
        "tika_extract": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 7 = 0 THEN 'application/pdf' ELSE 'text/html' END AS content_type, "
            "CASE WHEN doc_id % 7 = 0 THEN md5('') ELSE md5(text) END AS sig "
            "FROM documents ORDER BY doc_id"
        ),
        "urp_chain_process": (
            "SELECT doc_id, lower(lang) AS lang_lc, "
            "md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS sig, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END AS n_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        # --- TermsComponent / cursorMark / nested facets / atomic update ---
        "ft_terms_enum": (
            f"WITH t AS (SELECT doc_id, unnest(list_distinct(list_filter({split}, "
            f"x -> x LIKE 's%' AND NOT list_contains({_STOP_SQL}, x)))) AS term FROM documents) "
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t "
            "GROUP BY term ORDER BY term LIMIT 20"
        ),
        # compositeId ring: 16/16 bit split, md5-64 ring hash both sides
        "composite_id_routing": (
            "WITH h AS (SELECT source, "
            "CAST(md5_number_upper(source) % 4294967296 AS BIGINT) AS hr, "
            "CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 4294967296 AS BIGINT) AS hi "
            "FROM documents), "
            "s AS (SELECT source, "
            "CAST(((hr // 65536) * 65536 + hi % 65536) * 8 // 4294967296 AS BIGINT) AS shard FROM h) "
            "SELECT source, shard, CAST(COUNT(*) AS BIGINT) AS n_docs FROM s "
            "GROUP BY source, shard ORDER BY source, shard"
        ),
        "ft_terms_regex": (
            f"WITH t AS (SELECT doc_id, unnest(list_distinct(list_filter({split}, "
            f"x -> x LIKE 's%' AND NOT list_contains({_STOP_SQL}, x)))) AS term FROM documents) "
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t "
            "WHERE regexp_matches(term, '^(?:s.*a.*)$') "
            "GROUP BY term ORDER BY term LIMIT 20"
        ),
        "ft_termfreq_topk": (
            f"SELECT doc_id, CAST(len(list_filter({split}, x -> x = 'merge')) AS BIGINT) AS termfreq "
            "FROM documents "
            f"WHERE list_contains({split}, 'merge') "
            "ORDER BY termfreq DESC, doc_id LIMIT 20"
        ),
        "ft_atomic_update_rtg": (
            "SELECT doc_id, text || ' zzzupdated' AS text FROM documents "
            "WHERE doc_id IN (7, 123, 400) ORDER BY doc_id"
        ),
        # tlog-lite: pending docs are RTG-visible pre-commit (pending=true),
        # committed docs via fallback; after soft_commit the term search
        # hits exactly the appended docs (asserted in-engine)
        "ft_tlog_rtg": (
            "WITH newdocs AS (SELECT UNNEST([90000001, 90000002, 90000003]) AS doc_id) "
            "SELECT 'rtg_pre' AS phase, CAST(doc_id AS BIGINT) AS doc_id, TRUE AS pending, "
            "'zzztlogrtg pending doc ' || CAST(doc_id AS VARCHAR) AS text FROM newdocs "
            "UNION ALL SELECT 'rtg_pre', CAST(doc_id AS BIGINT), FALSE, text "
            "FROM documents WHERE doc_id IN (1, 2) "
            "UNION ALL SELECT 'search_post', CAST(doc_id AS BIGINT), FALSE, "
            "'zzztlogrtg pending doc ' || CAST(doc_id AS VARCHAR) FROM newdocs "
            "ORDER BY phase, doc_id"
        ),
        "cursor_mark_pages": (
            "WITH o AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
            "row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1 AS rn FROM documents) "
            "SELECT CAST(rn // 50 AS BIGINT) AS page, CAST(rn % 50 AS BIGINT) AS page_rank, "
            "doc_id, n_chars FROM o WHERE rn < 150 ORDER BY rn"
        ),
        "facet_nested": (
            "WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY 1, 2), "
            "ltop AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS lang_count FROM c "
            "GROUP BY 1 ORDER BY lang_count DESC, lang LIMIT 3), "
            "sub AS (SELECT c.lang, c.source, c.cnt, c.sum_chars, "
            "row_number() OVER (PARTITION BY c.lang ORDER BY c.cnt DESC, c.source ASC) - 1 AS sub_rank "
            "FROM c JOIN ltop ON c.lang = ltop.lang) "
            "SELECT sub.lang, ltop.lang_count, sub.source, sub.sub_rank, "
            "sub.cnt AS sub_count, sub.sum_chars AS sub_sum_chars "
            "FROM sub JOIN ltop ON sub.lang = ltop.lang WHERE sub.sub_rank < 2 "
            "ORDER BY ltop.lang_count DESC, sub.lang, sub.sub_rank"
        ),
    }
