"""Unified query registry: name -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL for every SQL-expressible entry.

Import order matters only for registration side effects; relational
defines the registry, the other modules append to it. After all
registrations the registry is REORDERED: the driver's correctness
gate checks the first 50 entries in insertion order. Everything else
keeps its local oracle coverage via tools/check_oracle.py, which
replays the driver's pandas canonicalization and dtype behavior over
the full catalog (185 queries: 178 strict oracles + 7 bounded-error).
"""

from __future__ import annotations

from . import breadth as _breadth  # noqa: F401  (registers)
from . import extensions as _extensions  # noqa: F401  (registers)
from . import pipeline as _pipeline  # noqa: F401  (registers)
from . import relational as _relational  # noqa: F401
from . import retrieval as _retrieval  # noqa: F401  (registers)
from . import timeseries as _timeseries  # noqa: F401  (registers)
from . import tpch_extra as _tpch_extra  # noqa: F401  (registers)

# First 50 slots = the driver's correctness window. INVARIANT, held
# every round: (1) any query with no driver row yet, (2) any query
# whose plan or oracle changed this round, (3) the rest of the window
# back-fills with the queries whose newest driver evidence is oldest,
# so the union of CORRECTNESS_r* rows stays fresh for the whole
# catalog. Per-round rationale lives in the commit message, not here.
# Bounded-error sketch queries DO take a window slot once each: their
# `no_oracle` driver row is the documented proof they execute under
# the gate (check_oracle.py holds their values to measured floors).
PRIORITY = [
    # never driver-windowed: new this round (r11, second batch —
    # also re-verifies approach_pipeline_real_airports below, whose
    # gridded argmin gained a winners checkpoint this round)
    "streaming_dsir_weights_docs",
    "personalized_pagerank_events",
    "frequent_part_pairs",
    "cms_token_counts_docs",
    "equi_depth_value_events",
    "streaming_cms_tokens_docs",
    "skyline_orders",
    "calibration_lr_docs",
    "kcore_users_events",
    "ktruss_users_events",
    "dsir_select_docs",
    "centroid_classify_embeddings",
    "gopher_rules_docs",
    "zorder_layout_events",
    "allpairs_jaccard_prefix_docs",
    "snm_blocking_pairs_customers",
    # never driver-windowed: new this round (r11)
    "approach_pipeline_real_airports",
    "streaming_approach_work_queue_real",
    "incremental_cc_events",
    "streaming_incremental_cc_events",
    "debias_top_direction_embeddings",
    # plan changed this round (r11 moved _assign_quantized /
    # _coarse_residuals to string-built literal codebooks and the
    # ANN training twins to one shared checkpointed frame — the
    # strict members of the kmeans-assignment family re-verify under
    # the gate; values must be bit-identical by construction)
    "kmeans_clusters_embeddings",
    "semantic_dedup_embeddings",
    "ann_ivf_topk",
    # oldest driver evidence — the COMPLETE r07 cohort (25), so the
    # CORRECTNESS_r11 histogram carries nothing older than r08
    "listagg_customers_per_nation",
    "pq_codes_embeddings",
    "pq_topk_trained_embeddings",
    "profile_columns_events",
    "q18_big_orders",
    "q8_market_share",
    "quantile_events",
    "range_window_auto_events",
    "recursive_chain_suppliers",
    "scan_filter_project",
    "session_event_ids",
    "streaming_dedup_events",
    "streaming_dedup_windowed_events",
    "streaming_interval_join_left_events",
    "streaming_upsert_windowed_events",
    "text_quality",
    "text_stats",
    "tfidf_topk_terms",
    "token_count_bpe",
    "topk_customers_per_nation",
    "unstable_subintervals",
    "validity_probe_users",
    "variant_json_events",
    "vocab_topk",
    "xml_roundtrip_events",
    # r08 back-fill, oldest-next (ann_ivfpq_topk first — its plan
    # also changed this round; then alphabetical)
    "ann_ivfpq_topk",
]


def _reorder(d: dict) -> dict:
    out = {n: d[n] for n in PRIORITY if n in d}
    out.update((n, v) for n, v in d.items() if n not in out)
    return out


# A stale PRIORITY name must not take down the whole registry (every
# query, entry() and the driver smoke import through this module): warn
# loudly and let the window fill from the remaining catalog order.
_missing = [n for n in PRIORITY if n not in _relational.QUERIES]
if _missing:
    import warnings

    warnings.warn(
        f"PRIORITY names not registered (window fills from catalog order): {_missing}",
        stacklevel=1,
    )

QUERIES = _reorder(_relational.QUERIES)
ORACLES = _reorder(_relational.ORACLES)
# bounded-error oracles for sketch queries — check_oracle.py only,
# never exposed through the driver contract (oracle_sql)
TOLERANCE_ORACLES = _relational.TOLERANCE_ORACLES
assert set(QUERIES) == set(_relational.QUERIES)

__all__ = ["QUERIES", "ORACLES", "PRIORITY", "TOLERANCE_ORACLES"]
