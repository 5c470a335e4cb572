"""Degenerate-input robustness: every representative operator must run on
0-row tables without raising — the partition-boundary edge that only ever
shows up in production (empty date partitions, freshly created tables)."""

from __future__ import annotations

import pytest

from mapreduceproject_spark.plans import QUERIES
from mapreduceproject_spark.sources.catalog import TABLES

REPRESENTATIVE = [
    "word_count",
    "q1_pricing_summary",
    "q10_returned_item_revenue",
    "join_anti",
    "window_rank_top3",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_token_stats",
    "text_fingerprints",
    "mm_decode_stats",
    "sample_hash_split",
    "pivot_status_by_priority",
    "funnel_conversion",
    # round-3 second wave
    "pii_scan_redact",
    "cdc_chunk_dedup",
    "bigram_lm_top",
    "ann_hyperplane_topk",
    "heavy_hitters",
    "data_profile",
    "event_anomaly_zscore",
    "pagerank_knn",
    "dedup_keep_best",
    "scd2_intervals",
    # round-3 third wave
    "market_basket_lift",
    "ewma_user_values",
    "mad_robust_stats",
    "quality_calibration_deciles",
    "knn_triangle_census",
    "customer_rfm",
    "token_zipf_fit",
    "cross_source_shingle_overlap",
    "equidepth_histogram",
    "attribution_last_touch",
    "skyline_price_size",
    "event_transition_matrix",
    # round-3 fourth wave
    "dedup_semantic",
    "dedup_incremental_minhash",
    "chunk_sliding_windows",
    # round-4 waves
    "gopher_quality_filter",
    "dsir_importance_weights",
    "doc_shingle_novelty",
    "ann_sq8_rerank_topk",
    "zorder_layout_extents",
    "repeated_ngram_mask",
    "split_leakage_check",
    "embedding_outlier_scores",
    "join_key_skew_report",
    "dedup_minhash_recall",
    "hll_sketch_rollup",
    "weighted_sample_wor",
    "label_centroid_similarity",
    "cdc_merge_apply",
    "chi2_lang_source",
    "ab_test_welch",
    "bootstrap_ci_poisson",
    "stream_upsert_latest",
    # round-4 retrieval/mining wave
    "ann_hard_negatives",
    "hybrid_rrf_retrieval",
    "seasonal_residual_outliers",
    "budget_top_p_selection",
    "bigram_surprisal_filter",
    "knn_bfs_reach",
    # round-5 waves
    "ngram_jaccard_est_recall",
    "ngram_jaccard_capped_recall",
    "equidepth_histogram_approx",
    "quality_calibration_approx",
    "psi_distribution_drift",
    "stratified_fixed_k_sample",
    "batch_sessionize",
    "embedding_dim_stats",
    "dedup_source_report",
    # round-8 wave
    "dedup_ngram_containment",
    "interval_overlap_join",
    # round-9 wave
    "customer_rfm_approx",
    "ngram_jaccard_triage_recall",
    "vocab_stats",
    # round-9 second wave
    "embedding_redundant_dims",
    "session_path_topk",
    "events_ohlc_downsample",
    "stream_ohlc_downsample",
    "ann_pq_topk",
    "ann_pq_recall",
    # the PQ gauge's empty-input crash (ANSI double/0) was latent in the
    # two older recall gauges too — covered now
    "ann_ivf_recall",
    "ann_lsh_recall",
    "knn_label_communities",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """A fixture dir with every table present but 0 rows (schemas intact)."""
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("empty_sf")
    for name in TABLES:
        # zero-row slice of the REAL file: preserves the raw on-disk
        # schema exactly (incl. events' nanos-long layout) and stays a
        # single parquet file, readable by Spark AND the DuckDB oracle
        t = pq.read_table(f"{sf_dir}/{name}.parquet")
        pq.write_table(t.slice(0, 0), str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    rows = QUERIES[name](spark, empty_sf_dir).collect()
    assert isinstance(rows, list)  # no exception; row count is free to be 0


@pytest.mark.parametrize(
    "name",
    [
        "equidepth_histogram_approx",
        "quality_calibration_approx",
        # the Gram kernel yields its zero matrix even from empty
        # partitions; the n > 0 gate must turn that into an empty result
        # (not 0/0 NaN correlations) exactly like the oracle's grouped
        # CTEs vanishing on empty input
        "embedding_redundant_dims",
    ],
)
def test_approx_twins_oracle_parity_on_empty(spark, empty_sf_dir, name):
    """Full oracle PARITY (not just no-crash) on 0-row tables: the Spark
    builders emit no boundary rows when the value source is empty, and the
    oracles' EXISTS gate must agree — the latent mismatch was an oracle
    that unconditionally unnested its boundary range."""
    from mapreduceproject_spark.oracle import check_query

    rep = check_query(spark, name, empty_sf_dir)
    assert rep.ok, f"{name}: {rep.mismatches}"
