"""Double-run determinism: the driver's correctness gate hashes VALUES, so
an operator whose floats depend on block-arrival order would pass pytest
once and still burn a driver round intermittently. Every float-carrying
plan family runs twice here and must produce bit-identical frames —
this is the regression net over _stable_order / round_away / fixed-order
driver folds (BASELINE.md measurement notes; round-2 ADVICE on
arrival-order float sums)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

# one representative per float-summing plan shape:
#   bucketed-combine means/moments, two-exchange rollups, token-keyed
#   joins with local top-k, driver-folded co-moments, windowed sums,
#   decayed aggregates, tiled matmul, PCA projection
DETERMINISM_QUERIES = [
    "orders_daily_pacf",
    "doc_stopword_coverage",
    "crawl_politeness_gaps",
    "domain_lang_entropy",
    "image_ahash_dedup_mirrored",
    "events_purchase_did",
    "corpus_stratified_mean",
    "doc_vocab_partial_corr",
    "events_value_psi",
    "doc_length_ad_ksample",
    "events_purchase_value_stump",
    "lang_length_shrinkage",
    "source_burrows_delta",
    "corpus_yule_k",
    "crawl_capture_recapture",
    "orders_daily_records",
    "orders_priority_jonckheere",
    "source_unigram_kl",
    "events_daily_bootstrap_ci",
    "orders_weekly_periodogram",
    "doc_length_ks_pairs_bh",
    "events_gap_exponential_gof",
    "source_tfidf_cosine",
    "customer_revenue_theil",
    "orders_fisher_exact",
    "events_daily_hodges_lehmann",
    "orders_daily_pettitt",
    "events_friedman_by_type",
    "token_burstiness",
    "dedup_blocking_quality",
    "events_type_burstiness",
    "corpus_token_gini",
    "quality_classifier_ks",
    "orders_priority_trend_test",
    "source_lang_diversity",
    "events_daily_permutation_entropy",
    "events_daily_grubbs",
    "doc_length_jarque_bera_by_lang",
    "orders_daily_ljung_box",
    "source_lang_mutual_info",
    "doc_length_trimmed_mean_by_lang",
    "events_weekly_decomposition",
    "events_error_pchart",
    "lang_token_llr_topk",
    "orders_monthly_holt",
    "lang_unigram_cross_entropy",
    "events_transition_entropy",
    "doc_length_levene_by_lang",
    "source_lang_cramers_v",
    "dup_graph_assortativity",
    "doc_length_cohens_d",
    "doc_length_moments",
    "doc_unigram_logprob",
    "token_pmi_topk",
    "doc_char_entropy",
    "corpus_token_entropy",
    "doc_zipf_fit",
    "lineitem_corr",
    "events_decayed_value",
    "events_user_anomalies",
    "orders_rolling_revenue",
    "embedding_covariance",
    "embedding_pca_project",
    "embedding_cosine_pairs_exact",
    "corpus_gram_novelty",
    "tf_idf_top_terms",
    "q1_pricing_summary",
    # round-4 continuation shapes: 4-chain case-ratio join, chained
    # combine+join revenue rollup, correlated per-part scalar, global
    # prefix-scan, full-outer diff, cosine-edge CC labels
    "q8_market_share",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "events_late_arrivals",
    "crawl_snapshot_diff",
    "embedding_dup_clusters",
    # session-11 shapes: driver-folded ECDF matrix (KS), crosstab chi2,
    # CUBE rollup of finest partials, CUSUM running sum, per-bucket
    # moment folds (dispersion), grouped-median lexsort
    "doc_length_ks_by_lang",
    "part_type_size_chi2",
    "lineitem_cube_pricing",
    "events_rate_changepoint",
    "events_overdispersion_by_type",
    "orders_median_gap_per_customer",
    # session-11 later blocks: ANOVA moment fold, centroid-matrix
    # silhouette, count-matrix U statistic, top-k Hill fold, survival
    # shares, Benford frequencies
    "doc_length_anova_by_lang",
    "embedding_silhouette",
    "doc_length_mannwhitney_by_lang",
    "events_value_tail_index",
    "events_user_survival_curve",
    "orders_benford_digit_audit",
    "quality_classifier_calibration",
    "orders_daily_runs_test",
    "orders_priority_late_share_ci",
    "events_hourly_uniformity_chi2",
    "source_lang_js_divergence",
    "orders_monthly_mann_kendall",
    "events_kruskal_by_type",
    "events_hour_value_spearman",
    "doc_heaps_law_fit",
    "embedding_intrinsic_dim",
    "embedding_anisotropy",
    "doc_token_char_regression",
    "events_circular_hour_stats",
    # session-12 shapes: pairwise-slope median fold, contingency-grid
    # concordance cumsums
    "orders_monthly_theil_sen",
    "lineitem_qty_discount_kendall",
    "events_type_cross_correlation",
    "orders_weekly_extreme_fit",
    "quality_classifier_roc_auc",
    "quality_rater_agreement_kappa",
    # round-5 sink-audited entries (image_ahash_dedup_mirrored is already
    # listed above): the second run must rebuild its /tmp
    # signature/candidate sink from scratch (rmtree-before-write) and
    # land bit-identical — catches stale-sink contamination
    "image_phash_dedup_mirrored",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "video_scene_cuts",
    "bpe_word_counts",
    # integer-cent accumulation rebuild (round-5 sf0.1 sweep finding;
    # events_user_anomalies, the other rebuild, is already listed above):
    # order-stability is the very property these were fixed for
    "part_type_supplier_hhi",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.mark.parametrize("name", DETERMINISM_QUERIES)
def test_double_run_bit_identical(entry_mod, name):
    from test_queries_oracle import to_df

    fn = entry_mod.queries()[name]
    a = to_df(fn(SF)).reset_index(drop=True)
    b = to_df(fn(SF)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
