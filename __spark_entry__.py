"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``opendosm_parquet_to_sqlite_spark`` (see
SURVEY.md §2 for the operator inventory each query covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opendosm_parquet_to_sqlite_spark.plans.queries import ORACLES, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic latest-per-(user_id, event_type) dedup over
    events — the reference's raison-d'être query (src/main.rs:252-278),
    re-expressed as a window plan."""
    return QUERIES["latest_per_group"](spark, SF0001)


# Rows-only (no-oracle) queries, ordered. NOTE: with ORACLES holding
# exactly 50 entries — the driver's full check window — NONE of these get
# a driver-side check today; their correctness coverage is pytest-only
# (recall floors, error bounds, in-repo DuckDB hash parity for
# unigram_logprob). The ordering only matters if the driver's cap ever
# grows or the oracle-backed list shrinks; keep it in rough
# flagship-first order against that day.
_ROWS_ONLY_PRIORITY = [
    # demoted in the round-13 TENTH rotation (multi-round driver-green —
    # 3 to 6 consecutive green rounds each; shadow oracles keep their
    # hash proof in-repo). Their driver slots went to the ten
    # longest-shadowed never-driver-proven names: the four remaining
    # round-6 shadows (period_over_period, user_event_profile,
    # attribution_first_touch, dedup_time_window) and six round-6
    # extensions (shipping_priority, quality_audit, top_terms_per_group,
    # tokenize_to_ids, funnel_steps, cohort_retention) — each getting
    # its first driver-visible hash proof:
    "heavy_hitters",
    "golden_record",
    "dedup_urls",
    "hybrid_search",
    "skew_report",
    "large_volume_customers",
    "dedup_keep_best",
    "bootstrap_ci",
    "weighted_median",
    "temporal_split",
    # demoted in the round-12 NINTH rotation (multi-round driver-green —
    # 5 to 9 consecutive green rounds each; shadow oracles keep their
    # hash proof in-repo). Their driver slots went to the round-11
    # registrations (remove_repeated_spans_within, dsir_select,
    # contamination_semantic) plus the seven longest-shadowed
    # never-driver-proven round-6 extensions (bigram_logprob,
    # remove_boilerplate, url_features, url_host_stats, outlier_mad,
    # value_histogram, dedup_ngram_containment) — each getting its first
    # driver-visible hash proof:
    "prepare_training_data",
    "span_dedup",
    "cm_frequency",
    "data_quality_report",
    "feature_drift",
    "k_anonymity",
    "split_leakage_free",
    "text_canonical",
    "winnow_pairs",
    "attribution_last_touch",
    # demoted in the round-11 EIGHTH rotation (driver-green in
    # CORRECTNESS_r08/r09/r10; shadow oracles keep their hash proof
    # in-repo). Their driver slots went to the never-driver-proven
    # shadows record_linkage_scaled/remove_repeated_spans/dsir_weights/
    # search_bm25/tfidf_per_doc/chunk_documents/sample_per_group/
    # robust_scale/dedup_levenshtein/scd2_intervals:
    "span_dedup_exact",
    "order_priority_check",
    "waiting_suppliers",
    "min_cost_supplier",
    "group_ols",
    "mann_whitney",
    "record_linkage",
    "wasserstein_drift",
    "cusum_changepoints",
    "target_encoding",
    # demoted in the round-10 SEVENTH rotation (multi-round driver-green;
    # shadow oracles keep their hash proof in-repo). Their driver slots
    # went to readability/length_buckets/t_closeness/label_noise/
    # temperature_mix/matryoshka/ranking_metrics/vocab_coverage/
    # feature_hashing/temporal_split — first driver-visible hash proof:
    "agg_metrics_by_brand",
    "dedup_ngram_jaccard",
    "join_star_denorm",
    "latest_per_group_maxby",
    "pricing_summary",
    "corpus_clean",
    "corpus_clean_clustered",
    "corpus_report",
    "dup_clusters",
    "text_profile",
    # round-10 registrations (shadow-oracle hash-checked in-repo): the
    # data-scaled band-width linkage fix and the Lee-style repeated-span
    # removal transform:
    "remove_repeated_spans_iterated",
    # round-12 registrations (rows-only: iterative Group-DRO loop;
    # NumPy-parity + two-step composition equality pinned in
    # tests/test_mixing.py):
    "doremi_weights",
    "doremi_mix",
    # round-13 registrations (rows-only: iterative EM tokenizer trainer
    # + its Viterbi segmenter; exact parity vs a pure-Python reference
    # of the identical algorithm + determinism/rebuild pins in
    # tests/test_unigram.py):
    "unigram_lm_vocab",
    "unigram_segment",
    # round-13 wave 2 (rows-only): D4-style cluster-balanced selection
    # (k-means cells are centroid-dependent; size/water-fill/flattening
    # pinned in tests/test_similarity_curation.py) and binned-PAV
    # isotonic calibration (PAV not SQL-expressible; exact pure-Python
    # parity + monotonicity pinned in tests/test_ml_eval.py):
    "cluster_balanced_sample",
    "calibrate_isotonic",
    # round-13 wave 2 (rows-only): PELT multiple-changepoint
    # segmentation over bounded hourly series (exactness vs the
    # unpruned O(n^2) DP pinned in tests/test_pelt.py):
    "changepoints_pelt",
    # round-13 wave 2 (shadow oracles, hash-checked in-repo): per-source
    # percentile quality gate (order-statistic threshold, ties survive)
    # and the deterministic md5 training shuffle (arithmetic shards +
    # per-shard position windows):
    "quality_percentile_gate",
    "shuffle_for_training",
    # round-13 wave 3 (rows-only): WordPiece likelihood-gain trainer +
    # greedy longest-match segmenter completing the tokenizer trio
    # (exact rule-sequence parity vs a pure-Python reference +
    # BPE-divergence/UNK/round-trip pins in tests/test_wordpiece.py):
    "wordpiece_vocab",
    "wordpiece_segment",
    # round-13 wave 3 (shadow oracle, hash-checked in-repo): CCNet-style
    # head/middle/tail bucketing by integer-exact mean token frequency
    # (order-statistic bucket math over the quantized score table):
    "commonness_buckets",
    # demoted in the round-9 SIXTH rotation (multi-round driver-green;
    # shadow oracles keep their hash proof in-repo):
    "ewma_smooth",
    "orphan_check",
    "local_supplier_volume",
    "feature_corr",
    "sample_weighted",
    "snapshot_diff",
    "quantile_normalize",
    "interval_overlap",
    "merge_upsert",
    "incremental_agg",

    # demoted in the round-8 FIFTH rotation (multi-round driver-green in
    # CORRECTNESS_r06+r07; shadow oracles keep their hash proof in-repo)
    # -- ten round-7 shadows that never had driver-visible hash proof
    # (span_dedup_exact, order_priority_check/Q4, waiting_suppliers/Q21,
    # min_cost_supplier/Q2, group_ols, mann_whitney, record_linkage,
    # wasserstein_drift, cusum_changepoints, target_encoding) took their
    # driver slots:
    # round-9 registrations of the six round-8 snapshot operators — all
    # shadow-oracle hash-checked in-repo (tests/oracle_check.py) plus
    # pytest pins (tests/test_round9_ops.py):
    "mutual_information",
    "cube_metrics",
    "seasonal_profile",
    # shadow-oracle queries: hash-checked in-repo (tests/oracle_check.py
    # runs their DuckDB SQL from SHADOW_ORACLES); driver-side rows-only
    # because the 50-entry window is already full of oracle-backed rows.
    # Round 6 rotated the window TWICE: first the round-5 shadows
    # (search_bm25, tfidf_per_doc, chunk_documents, sample_per_group,
    # robust_scale) moved in and five long-stable single-op slots
    # (set_ops, cast_strict_roundtrip, sort_date_desc, agg_distinct,
    # pivot_metrics) moved out; then the fourteen round-6 wave-2 queries
    # (levenshtein/EWMA/SCD2/MI/cube/orphan/Q5/corr/seasonal/weighted-
    # sample/diff/quality-rules/qnorm/interval-overlap) moved in and
    # fourteen multi-round-green slots moved out here (union_months,
    # json_extract, profile_nulls, window_hourly, cumulative_window,
    # rollup_metrics, text_top_terms, text_fingerprint, text_pii_redact,
    # dedup_keep_first, range_join, text_lang_id, multimodal_metadata,
    # pack_sequences) — in-repo hash coverage stays total either way.
    "union_months",
    "json_extract",
    "profile_nulls",
    "window_hourly",
    "cumulative_window",
    "rollup_metrics",
    "text_top_terms",
    "text_fingerprint",
    "text_pii_redact",
    "dedup_keep_first",
    "range_join",
    "text_lang_id",
    "multimodal_metadata",
    "pack_sequences",
    "set_ops",
    "cast_strict_roundtrip",
    "sort_date_desc",
    "agg_distinct",
    "pivot_metrics",
    # round-6 extensions (shadow oracles, hash-checked in-repo):
    "transition_matrix",
    "group_percentiles",
    # demoted in the round-7 FOURTH rotation (multi-round driver-green;
    # shadow oracles keep their hash proof in-repo) — the ten wave-3
    # round-6 shadows (heavy_hitters, golden_record, dedup_urls,
    # hybrid_search, skew_report, attribution_last_touch,
    # large_volume_customers, dedup_keep_best, bootstrap_ci,
    # weighted_median) took their driver slots:
    "agg_count_by_nation",
    "join_prices_items",
    "time_resample",
    "unique_key_enforce",
    "ann_bruteforce",
    "contamination_check",
    "text_repetition",
    "domain_mix",
    "rolling_features",
    "running_profile",
    # remaining round-6 shadows (hash-checked in-repo; candidates for the
    # next window rotation):
    # demoted in the round-6 THIRD rotation (multi-round-green singles;
    # shadow oracles keep their hash proof in-repo) — the eight
    # continuation queries (split_leakage_free, merge_upsert,
    # incremental_agg, cm_frequency, k_anonymity, feature_drift,
    # text_canonical, winnow_pairs) took their driver slots:
    "returned_item_revenue",
    "dedup_exact_canonical",
    "embedding_drift",
    "fold_assign",
    "release_gate",
    "triangle_count",
    "join_size_report",
    "count_anomaly",
    "contamination_fuzzy",
    "vocab_drift",
    "neyman_allocation",
    "equidepth_histogram",
    "shipmode_priority",
    "join_salted",
    "topk_per_group",
    "session_window",
    "asof_join",
    "dedup_exact",
    "dedup_embedding_cosine",
    "sample_stratified",
    "pack_sequences_split",
    "scan_parquet",
    "date_trunc10",
    "round_f64_to_i64",
    "filter_parse_ok",
    "null_default_unknown",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_lsh",
    "ann_ivf",
    "ann_lsh",
    "ann_quantized",
    "ann_ivf_persisted",
    "dedup_semantic",
    "embed_pca",
    "quality_classifier",
    "contamination_bloom",
    "dedup_incremental",
    "dedup_simhash",
    "sketch_profile",
    "rolling_distinct",
    "unigram_logprob",
    "quality_classifier_2iter",
    "text_lang_id_ngram",
    "multimodal_decode",
    # round-7 media near-dup family (decode + perceptual hash: not
    # SQL-expressible; collision structure pinned in
    # tests/test_mediadedup.py):
    "dedup_image_phash",
    "dedup_audio_fp",
    "dedup_media_clusters",
    # round-7 exact-substring rung (shadow oracle: winnow candidates +
    # diagonal-runs LCS, both restated verbatim in DuckDB):
    # round-7 TPC-H shape completions (shadow oracles): Q4 semi-join
    # priority check, Q7 nation-pair volume, Q14 promo share, Q16
    # anti-joined distinct supplier counts
    "volume_shipping",
    "promo_revenue",
    "parts_supplier_count",
    # round-7 exact two-sample KS drift (shadow oracle)
    "ks_drift",
    # round-7 wave 3 (shadow oracles, hash-checked in-repo): TPC-H
    # closure (Q6/Q13/Q15/Q17/Q19/Q2/Q8/Q9/Q11/Q20/Q21/Q22), inferential
    # stats, phrase mining, ntile binning, embedding pooling
    "forecast_revenue",
    "customer_distribution",
    "top_supplier",
    "small_qty_revenue",
    "discounted_revenue",
    "market_share",
    "product_profit",
    "important_stock",
    "promotion_suppliers",
    "sales_opportunity",
    "chi_square",
    "feature_binning",
    "embedding_pool",
    "extract_links",
    "fd_violations",
    "benford_check",
    "column_entropy",
    "topn_other",
    "preference_pairs",
    "negative_samples",
    "next_event_examples",
    "calibration_report",
    "vector_health",
    "seasonal_decompose",
    "rolling_corr",
    "inactivity_labels",
    "link_prediction",
    # round-7 wave 8: ML evaluation & feature engineering (shadow
    # oracles, hash-checked in-repo)
    # round-7 wave 9 (vocab_coverage + bh_correction shadow-oracle;
    # compression_ratio rows-only — no SQL zlib)
    "compression_ratio",
    "bh_correction",
    # round-7 wave 10 (score-evaluation suite; shadow oracles)
    "classification_report",
    "lift_table",
    # round-7 wave 11 (Kaplan-Meier + simplified silhouette; shadow)
    # round-7 wave 12 (Rocchio confusion matrix; shadow)
    "centroid_classify",
    # round-7 wave 13 (entropy l-diversity + DP noisy counts; shadow)
    "l_diversity",
    "dp_noisy_counts",
    # round-7 wave 14 (PR-AUC, kappa, Cramér's V, one-way ANOVA; shadow)
    "pr_auc",
    "cramers_v",
    # round-7 wave 15 (earth-mover drift, CUSUM shifts, linear resample)
    "interpolate_linear",
    # round-7 wave 16 (blocked entity resolution; shadow)
    # round-7 filtered ANN (approximate by design at partial probe;
    # exactness-over-filtered-corpus pinned in tests/test_similarity.py)
    "ann_filtered",
    "ann_filtered_pq",
    # round-7 kNN graph family (LSH hash-dependent; exhaustive-regime
    # exact parity + cluster pins in tests/test_similarity.py)
    "knn_graph",
    "knn_clusters",
    "hard_negatives",
    # round-7 wave 17: LOF anomaly scores on the kNN edge list (math
    # parity + structural pins in tests/test_similarity.py)
    "lof_outliers",
    # PQ family (approximate by design; recall + exact-regime pins in
    # tests/test_pq.py):
    "ann_pq",
    "ann_ivfpq",
    "ann_ivfpq_persisted",
    # iterative fixpoints (no SQL oracle; pytest-pinned against NumPy /
    # pure-Python references):
    "event_pagerank",
    "dup_communities",
    "dup_core",
    "bpe_merges",
    # demoted round 4: exact operator twin of the hash-checked
    # join_prices_items (same join_fact_dim broadcast shape)
    "join_prices_premises",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + M5 extensions.

    Oracle-backed queries are listed first (hash-checked entries must never
    fall off the end of the driver's fixed-size check window behind
    rows-only ones), then rows-only queries in explicit priority order.
    """
    ordered = {n: f for n, f in QUERIES.items() if n in ORACLES}
    rows_only = [n for n in QUERIES if n not in ORACLES]
    prio = {n: i for i, n in enumerate(_ROWS_ONLY_PRIORITY)}
    for n in sorted(rows_only, key=lambda n: prio.get(n, len(prio))):
        ordered[n] = QUERIES[n]
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; hash-dependent ops (MinHash/SimHash/
    LSH) are intentionally absent → driver records rows-only checks."""
    return dict(ORACLES)
