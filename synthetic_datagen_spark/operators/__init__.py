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

# Round 7 window (first 50): the 11 SQL-oracled queries never driver-
# sampled in rounds 1-6, the re-check of cyclical_time_features (the
# -0.0 fix), then every query REGISTERED this round (the late-r7
# wave displaced the stale r1-r5 re-check slots it had originally —
# new oracled queries outrank green re-checks): TPC-H q4/q7/q14/q15/
# q17/q18/q19/q22, the training-pipeline ops (gopher rules, shards,
# snapshot diff, label balance, int8 quant, doc-vec join, truncation
# fidelity, zipf), event analytics (sessionization/funnel/cohort),
# RANGE + NTILE windows, source formats (ORC/compaction/JSONL), and
# the rows-only pHash near-dup + ANN recall panel. Round-8 rotation:
# re-check any red rows first, then cycle queries last sampled r1-r5
# (q1/q3/q5/q6/q10, a-family, d1/d7, flagship, union/top-k, asof,
# multimodal metadata/resize, skew/rollup).
_ROUND7_WINDOW = [
    "intersect_except_users",
    "interval_join_lineitem_orderdate",
    "json_props_extract",
    "minmax_scaling",
    "multimodal_audio_codec_roundtrip",
    "p_filters_panel",
    "stream_corpus_curation_parity",
    "stream_dedup_parity",
    "stream_session_parity",
    "string_functions_panel",
    "zscore_normalization",
    "cyclical_time_features",
    "q7_nation_volume_shipping",
    "knn_recall_eval",
    "embedding_truncation_fidelity",
    "s11_orc_roundtrip_summary",
    "s12_small_file_compaction",
    "zipf_rank_frequency_panel",
    "range_window_trailing_1h",
    "ntile_rank_panel",
    "q15_top_supplier_revenue",
    "q17_small_quantity_revenue",
    "q22_idle_customer_balance",
    "incremental_ingest_dedup",
    "q4_priority_late_ship",
    "training_mix_resample",
    "q14_promo_revenue_share",
    "q18_large_volume_orders",
    "q19_disjunctive_brand_filter",
    "doc_chunking_windows",
    "gopher_quality_rules",
    "global_shuffle_shards",
    "corpus_snapshot_diff",
    "sequence_packing_bins",
    "label_balanced_resample",
    "sql_udtf_chunk_stats",
    "variant_json_props_panel",
    "d4_adf_stationarity",
    "d6_hurst_exponent",
    "embedding_int8_quantization_error",
    "doc_embedding_join_panel",
    "stream_funnel_parity",
    "s13_jsonl_roundtrip_summary",
    "multimodal_phash_neardup",
    "stream_decontamination_parity",
    "event_sessionization",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "decontamination_ngram_overlap",
    "decontamination_retention_by_lang",
]


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


_rotate(_ROUND7_WINDOW)

__all__ = ["REGISTRY", "QuerySpec", "register"]
