"""Named query catalog — importing this package registers every query."""

from .base import REGISTRY, QuerySpec, register  # noqa: F401

# Registration order is rotated round-over-round so the correctness
# driver's first-50 sample accumulates hash coverage across the whole
# catalog (names never change, only order).
from . import text_queries  # noqa: F401,E402
from . import vector_queries  # noqa: F401,E402
from . import window_queries  # noqa: F401,E402
from . import source_queries  # noqa: F401,E402
from . import scalar_queries  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import agg_queries  # noqa: F401,E402
from . import distribution_queries  # noqa: F401,E402
from . import evaluator_queries  # noqa: F401,E402
from . import flagship  # noqa: F401,E402
from . import generator_queries  # noqa: F401,E402
from . import multimodal_queries  # noqa: F401,E402
from . import regime_queries  # noqa: F401,E402
from . import event_queries  # noqa: F401,E402

# Round 11 window (72 names, asserted below; the driver samples the
# first ~50, so the
# ordering below is a priority list — every changed-code query outranks
# stale-rotation backfill): changed-code queries first (the
# newly value-oracled ANN trio, the embedding family after the
# guard-engaged-flag/memo-key-sharing fix, the text dedup family after
# the bulk-Jaccard guard landed in the shared _lsh_candidates path,
# the media family after the scale-guarded pigeonhole swap), then the
# five queries newly value-pinned this round, then the ENTIRE r6-stale
# backlog (after this round no sample is older than r8).
_ROUND11_WINDOW = [
    # -- code changed / newly value-oracled this round
    "knn_ivf",
    "knn_pq",
    "knn_ivfpq",
    "embedding_near_dup_pairs",
    "embedding_dedup_clusters",
    "embedding_dedup_clusters_strict",
    "embedding_dedup_clusters_scaled",
    "dedup_minhash_lsh",
    "multimodal_audio_fingerprint_v2",  # NEW query this round
    "multimodal_phash_neardup",
    "multimodal_audio_fingerprint_neardup",
    "multimodal_cross_dedup_clusters",
    "knn_lsh_bucketed",
    # -- newly value-pinned this round (r11 late: 146 -> 151 oracled)
    "multimodal_decode_features",
    "multimodal_frame_stats",
    "multimodal_audio_spectrogram",
    "m7_pelt_ward_regimes",
    # -- r11 final sweep: the 17 pins that closed the rows-only set to
    # ZERO (parquet-captured generator panels; the decimal-deterministic
    # ridge/kmeans fixes behind m10/m11/d8/m7_m8; the corrected stale
    # phash pin) — changed code, so the driver board must sample them
    "approx_distinct_scale_path",
    "ratio_sweep_panel",
    "multimodal_jpeg_roundtrip",
    "multimodal_video_frames",
    "g1_g3_latent_decode_generate",
    "g2_conditional_train_generate",
    "m1_vae_train_generate",
    "g11_timegan_train_generate",
    "g4_block_bootstrap",
    "g5_grasynda",
    "g7_regime_garch_generate",
    "g8_regime_hybrid_generate",
    "m9_regime_gan_generate",
    "g9_stitch_variants",
    "m11_predictive_utility",
    "d8_composite_score",
    "m7_m8_segment_clusters",
    "m10_lstm_predictive_utility",
    "dedup_repeated_ngram_spans",  # NEW query (r11 late): span-level dedup
    "stream_repeated_span_parity",  # NEW query (r11 late): its streaming twin
    "corpus_span_scrub",  # NEW query (r11 late): apply the span dedup
    "token_budget_pack",  # NEW query (r11 late): budgeted mix assembly
    # -- full r6-stale backlog (text panels, w-family, sources)
    "boilerplate_ngram_coverage",
    "dedup_simhash_pairs",
    "dedup_word_ngram_jaccard",
    "doc_lm_perplexity",
    "doc_rolling_fingerprint",
    "hash_split_train_val_test",
    "hourly_rollup",
    "knn_brute_force",
    "ranking_functions_panel",
    "repetition_stats_panel",
    "resample_4h_gapfill",
    "s2_csv_union_dedup",
    "s8_sql_view_summary",
    "s9_external_process_pipe",
    "stratified_hash_downsample",
    "stream_batch_parity_rollup",
    "tfidf_top_terms",
    "token_count_panel",
    "udf_token_count_parity",
    "vocab_top_tokens",
    "w10_supervised_xy",
    "w11_window_zero_mean",
    "w12_block_smoothing",
    "w15_chrono_split_counts",
    "w1_log_returns",
    "w2_price_reconstruction",
    "w3_sliding_window_stats",
    "w4_rolling_volatility",
    "w5_volatility_ratio",
    "w6_autocorrelation_panel",
    "w7_volatility_clustering",
    "w8_leverage_effect",
    "w9_max_drawdown",
]

# Round 10 window (kept for the record; superseded by _ROUND11_WINDOW):
# new/changed-code queries first (the
# reshaped-and-newly-oracled approx quantiles, the three new pinned
# summary twins, the scale-guarded embedding family, the CC kernels
# after the type-generic fix, the d9 panels after the zero-mean guard,
# the generator fits after the two-job indexing pin), then the ENTIRE
# r5-stale backlog (31 queries — after this round no sample is older
# than r6), topped up with the stalest r6 text-family slots.
_ROUND10_WINDOW = [
    # -- code changed / newly value-oracled this round
    "approx_quantiles_scale_path",
    "g4_bootstrap_summary",
    "g5_grasynda_summary",
    "g9_stitch_summary",
    "g9_stitch_variants",
    "g4_block_bootstrap",
    "g5_grasynda",
    "embedding_near_dup_pairs",
    "embedding_dedup_clusters",
    "embedding_dedup_clusters_strict",
    "dedup_connected_components",
    "dedup_cc_large_star",
    "d9_tolerance_v3_panel",
    # -- full r5-stale backlog (multimodal metadata/resize,
    #    skew/rollup, optimizer/ML families)
    "q1_pricing_summary",
    "rollup_region_status_revenue",
    "skew_salted_agg",
    "cube_type_dow_stats",
    "approx_distinct_scale_path",
    "pivot_type_dow_avg",
    "d8_composite_score",
    "m11_predictive_utility",
    "ratio_sweep_panel",
    "d5_spectral_distance",
    "d9_tolerance_panel",
    "m10_lstm_predictive_utility",
    "m13_external_predictor_eval",
    "g1_g3_latent_decode_generate",
    "g2_conditional_train_generate",
    "m1_vae_train_generate",
    "g11_timegan_train_generate",
    "multimodal_metadata_panel",
    "multimodal_decode_features",
    "multimodal_frame_stats",
    "multimodal_resize_roundtrip",
    "multimodal_audio_spectrogram",
    "multimodal_codec_roundtrip",
    "g7_regime_garch_generate",
    "g8_regime_hybrid_generate",
    "m14_ga_block_search",
    "m7_m8_segment_clusters",
    "m7_pelt_ward_regimes",
    "m16_random_sweep",
    "m9_regime_gan_generate",
    "m15_staged_optimizer",
    # -- stalest r6 slots (text family head)
    "text_quality_stats",
    "lang_id_accuracy",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "dedup_shingle_jaccard",
    "dedup_simhash",
]


# Round 12 window (65 names, asserted below; the driver samples the
# first ~50 by position). Priority: the 13 changed-code queries first
# (token_budget_pack after the engine-neutral ordering-key fix, the 6
# NEW pii/audio-gate queries, the refactored audio-v2 builder, the
# vectorized+re-harnessed span stream, and the minhash-family heads
# after the scaled-banding + bind_once fixes touched their shared
# path), then the ENTIRE r6-stale batch (22 queries that sat in r11's
# window TAIL, positions 51-72, so the ~50-sample never reached them),
# then r8-stale backfill to 65.
_ROUND12_WINDOW = [
    # -- code changed / new this round
    "token_budget_pack",
    "pii_extract_panel",
    "pii_luhn_cc_panel",
    "corpus_pii_scrub",
    "corpus_curation_pii_v2",
    "stream_pii_scrub_parity",
    "multimodal_audio_fingerprint_v2_gated",
    "multimodal_audio_fingerprint_v2",
    "stream_repeated_span_parity",
    # -- the r12-late text-LSH scale guard + bind_once touched the
    # whole minhash family's shared code path; sample its heads
    "dedup_minhash_lsh",
    "dedup_shingle_jaccard",
    "dedup_word_ngram_jaccard",
    "boilerplate_ngram_coverage",
    # -- full r6-stale batch (never actually sampled from r11's tail)
    "s2_csv_union_dedup",
    "s8_sql_view_summary",
    "s9_external_process_pipe",
    "stratified_hash_downsample",
    "stream_batch_parity_rollup",
    "tfidf_top_terms",
    "token_count_panel",
    "udf_token_count_parity",
    "vocab_top_tokens",
    "w10_supervised_xy",
    "w11_window_zero_mean",
    "w12_block_smoothing",
    "w15_chrono_split_counts",
    "w1_log_returns",
    "w2_price_reconstruction",
    "w3_sliding_window_stats",
    "w4_rolling_volatility",
    "w5_volatility_ratio",
    "w6_autocorrelation_panel",
    "w7_volatility_clustering",
    "w8_leverage_effect",
    "w9_max_drawdown",
    # -- r8-stale backfill
    "cohort_retention_weekly",
    "corpus_snapshot_diff",
    "cyclical_time_features",
    "d4_adf_stationarity",
    "d6_hurst_exponent",
    "decontamination_ngram_overlap",
    "decontamination_retention_by_lang",
    "doc_chunking_windows",
    "doc_embedding_join_panel",
    "embedding_int8_quantization_error",
    "embedding_truncation_fidelity",
    "event_sessionization",
    "global_shuffle_shards",
    "gopher_quality_rules",
    "incremental_ingest_dedup",
    "intersect_except_users",
    "interval_join_lineitem_orderdate",
    "json_props_extract",
    "label_balanced_resample",
    "minmax_scaling",
    "multimodal_audio_codec_roundtrip",
    "ntile_rank_panel",
    "p_filters_panel",
    "q14_promo_revenue_share",
    "q15_top_supplier_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_brand_filter",
    "q22_idle_customer_balance",
    "q4_priority_late_ship",
]

# The stated size is part of the priority-ordering contract (the driver
# samples the first ~50 by POSITION, so believing a query is inside the
# sampled prefix requires the count to be right) — assert it so the
# comment can't silently drift from the list (r11 advisor finding).
assert len(_ROUND11_WINDOW) == 72, len(_ROUND11_WINDOW)
assert len(set(_ROUND11_WINDOW)) == len(_ROUND11_WINDOW)
assert len(_ROUND12_WINDOW) == 65, len(_ROUND12_WINDOW)
assert len(set(_ROUND12_WINDOW)) == len(_ROUND12_WINDOW)

# Round 13 window (73 names, asserted below; the driver samples the
# first ~50 by position). Priority (r12 VERDICT item 1): the 7 queries
# whose value oracles landed in r11's pinning sweep but have NEVER
# been hash-checked by the driver (last sampled while still no_oracle,
# r10 or earlier) — the driver's hash check is the contract's ground
# truth and it has never seen these oracles; then the 3 NEW r13
# queries (quality classifier pair, SemDeDup), the 4 whose code or
# oracle changed this round (PII-scrub residual oracle, audio-v2
# octet gate ×2, the corpus-size memo-key change on the minhash
# family's shared path), then the ENTIRE r8-stale batch (31 queries
# that sat in r12's window tail, positions 51-65, plus earlier
# rotation leftovers) and r9-stale backfill to 65.
_ROUND13_WINDOW = [
    # -- never driver-hash-checked with their current oracles
    "stream_regime_generate_parity",
    "d5_spectral_distance",
    "d9_tolerance_panel",
    "m13_external_predictor_eval",
    "m14_ga_block_search",
    "m15_staged_optimizer",
    "m16_random_sweep",
    # -- new this round
    "quality_classifier_score",
    "quality_classifier_funnel",
    "embedding_semdedup_clusters",
    "embedding_semdedup_keep",
    "corpus_curation_quality_v3",
    "stream_quality_score_parity",
    "incremental_ingest_bloom",
    "event_pattern_match",
    "stream_event_pattern_parity",
    "cms_heavy_hitters",
    "stream_stream_interval_join_parity",
    # -- code/oracle changed this round
    "corpus_pii_scrub",
    "multimodal_audio_fingerprint_v2_gated",
    "multimodal_audio_fingerprint_v2",
    "dedup_minhash_lsh",
    # -- full r8-stale batch
    "intersect_except_users",
    "interval_join_lineitem_orderdate",
    "json_props_extract",
    "label_balanced_resample",
    "minmax_scaling",
    "multimodal_audio_codec_roundtrip",
    "ntile_rank_panel",
    "p_filters_panel",
    "q14_promo_revenue_share",
    "q15_top_supplier_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_brand_filter",
    "q22_idle_customer_balance",
    "q4_priority_late_ship",
    "q7_nation_volume_shipping",
    "range_window_trailing_1h",
    "s11_orc_roundtrip_summary",
    "s12_small_file_compaction",
    "s13_jsonl_roundtrip_summary",
    "sequence_packing_bins",
    "sql_udtf_chunk_stats",
    "stream_corpus_curation_parity",
    "stream_decontamination_parity",
    "stream_dedup_parity",
    "stream_session_parity",
    "string_functions_panel",
    "training_mix_resample",
    "variant_json_props_panel",
    "zipf_rank_frequency_panel",
    "zscore_normalization",
    # -- r9-stale backfill
    "a12_generator_summary",
    "a13_metric_map_mean",
    "a14_distinct_states",
    "a1_moment_panel",
    "a3_histogram_100",
    "a4_quantile_edges",
    "a5_state_frequency",
    "a7_transition_matrix",
    "a8_per_regime_stats",
    "a9_price_quantity_correlation",
    "anti_join_customers_without_orders",
    "asof_join_purchase_click",
    "bpe_tokenize_stats",
    "bpe_train_merges",
    "corpus_curation_pipeline",
    "d1_js_divergence",
    "d2_wasserstein",
    "d3_ks_statistic",
    "d7_moment_ratio_panel",
    "dedup_first_event_per_user",
]
assert len(_ROUND13_WINDOW) == 73, len(_ROUND13_WINDOW)
assert len(set(_ROUND13_WINDOW)) == len(_ROUND13_WINDOW)


# Round 14 window (73 names, asserted below; the driver samples the
# first ~50 by position). Priority (r13 VERDICT item 1): the SEVEN
# float-pinned oracles that were re-captured twice in r13 under host
# BLAS-dispatch drift and quantized+re-pinned in r14 — the driver's
# hash check is the ground truth that converts these self-certified
# pins back into verified ones; then every query whose code or oracle
# changed in r14 (regime-chain driver-twin + overlaps, walk memos,
# boilerplate window rewrite, text plan shapes, staged feeds, codec
# spread width), then the r8/r9-stale backfill (queries last
# driver-green in r8/r9 — the r13 window tail positions 51-73 that the
# ~50-sample never reached, plus the outside-window leftovers),
# topped up with the oldest r10-green rows.
_ROUND14_WINDOW = [
    # -- the 7 re-pinned (r13) + quantized (r14) float oracles
    "g11_timegan_train_generate",
    "g1_g3_latent_decode_generate",
    "g2_conditional_train_generate",
    "m1_vae_train_generate",
    "m9_regime_gan_generate",
    "m10_lstm_predictive_utility",
    "multimodal_phash_neardup",
    # -- code/oracle changed in r14
    "multimodal_cross_dedup_clusters",
    "g7_regime_garch_generate",
    "g8_regime_hybrid_generate",
    "stream_regime_generate_parity",
    "stream_funnel_parity",
    "g9_stitch_variants",
    "g9_stitch_summary",
    "g4_block_bootstrap",
    "g4_bootstrap_summary",
    "g5_grasynda",
    "g5_grasynda_summary",
    "boilerplate_ngram_coverage",
    "sequence_packing_bins",
    "sql_udtf_chunk_stats",
    # -- r8-stale (last driver-green r8)
    "variant_json_props_panel",
    "zipf_rank_frequency_panel",
    "zscore_normalization",
    # -- r9-stale backfill
    "a12_generator_summary",
    "a13_metric_map_mean",
    "a14_distinct_states",
    "a1_moment_panel",
    "a3_histogram_100",
    "a4_quantile_edges",
    "a5_state_frequency",
    "a7_transition_matrix",
    "a8_per_regime_stats",
    "a9_price_quantity_correlation",
    "anti_join_customers_without_orders",
    "asof_join_purchase_click",
    "bpe_tokenize_stats",
    "bpe_train_merges",
    "corpus_curation_pipeline",
    "d1_js_divergence",
    "d2_wasserstein",
    "d3_ks_statistic",
    "d7_moment_ratio_panel",
    "dedup_first_event_per_user",
    "flagship_series_panel",
    "funnel_view_click_purchase",
    "knn_recall_eval",
    "multimodal_jpeg_roundtrip_summary",
    "multimodal_video_frames_summary",
    "orders_customer_nation_enrich",
    "q10_returned_items",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q6_forecast_revenue",
    "s14_python_datasource_ticks",
    "semi_join_customers_with_orders",
    "stream_pq_encode_parity",
    "top_orders_by_totalprice",
    "union_dedup_events",
    # -- oldest r10-green top-up
    "approx_quantiles_scale_path",
    "cube_type_dow_stats",
    "d9_tolerance_v3_panel",
    "dedup_cc_large_star",
    "dedup_connected_components",
    "dedup_exact_fingerprint",
    "dedup_simhash",
    "lang_id_accuracy",
    "multimodal_codec_roundtrip",
    "multimodal_metadata_panel",
    "multimodal_resize_roundtrip",
    "pivot_type_dow_avg",
    "q1_pricing_summary",
    "rollup_region_status_revenue",
]
assert len(_ROUND14_WINDOW) == 73, len(_ROUND14_WINDOW)
assert len(set(_ROUND14_WINDOW)) == len(_ROUND14_WINDOW)


def _rotate(window: list[str]) -> None:
    """Reorder REGISTRY in place: ``window`` first, the rest unchanged."""
    missing = [n for n in window if n not in REGISTRY]
    if missing:  # names are stable; a typo here must fail loudly
        raise KeyError(f"rotation window names not in REGISTRY: {missing}")
    tail = [n for n in REGISTRY if n not in set(window)]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for n in window + tail:
        REGISTRY[n] = snapshot[n]


_rotate(_ROUND14_WINDOW)

__all__ = ["REGISTRY", "QuerySpec", "register"]
