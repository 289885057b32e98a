"""Unified query registry: name -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL for every SQL-expressible entry.

Import order matters only for registration side effects; relational
defines the registry, the other modules append to it. After all
registrations the registry is REORDERED: the driver's correctness
gate checks the first 50 entries in insertion order. Everything else
keeps its local oracle coverage via tools/check_oracle.py, which
replays the driver's pandas canonicalization and dtype behavior over
the full catalog (164 queries: 157 strict oracles + 7 bounded-error).
"""

from __future__ import annotations

from . import breadth as _breadth  # noqa: F401  (registers)
from . import extensions as _extensions  # noqa: F401  (registers)
from . import pipeline as _pipeline  # noqa: F401  (registers)
from . import relational as _relational  # noqa: F401
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
    # never driver-windowed: new this round (r10)
    "dedup_keep_best_scored",
    "pagerank_events",
    "semantic_dedup_embeddings",
    "pca_power_iteration_embeddings",
    "quality_weighted_sample_docs",
    # plan changed this round (driver/numpy quantizers moved to exact
    # half-away-from-zero rounding — ADVICE r09 medium; the strict-
    # oracle members of the touched cosine/LSH/kmeans/GD family
    # re-verify under the gate)
    "ann_cosine_topk",
    "ann_topk_batch",
    "ann_ivf_topk",
    "knn_graph_embeddings",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "embedding_incremental_neardup",
    "lr_quality_train_docs",
    "kmeans_clusters_embeddings",
    "pq_topk_embeddings",
    # oldest driver evidence (r06) — the complete r06 cohort, so the
    # CORRECTNESS_r10 histogram carries nothing older than r07
    "interval_join_click_counts",
    "islands_chunked_events",
    "join_anti_customers",
    "latest_snapshot_events",
    "min_acctbal_customer_per_nation",
    "nn_join_acctbal",
    "ntile_distribution_orders",
    "pack_sequences_docs",
    "pivot_event_counts",
    "q10_returned_revenue",
    "q12_priority_by_flag",
    "q14_promo_share",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "range_window_events",
    "rollup_hourly_daily",
    "sessionize_auto_events",
    "sessionize_events",
    "streaming_interval_join_events",
    "streaming_sessions_events",
    "stride_sample_events",
    "string_functions_customers",
    "unpivot_lineitem_measures",
    # r07 back-fill (alphabetical; the remaining r07 rotate in r11)
    "asof_nearest_click_purchase",
    "asof_next_click_purchase",
    "contamination_bloom_docs",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_keep_best",
    "heavy_hitters_rollup_docs",
    "heavy_hitters_tokens_docs",
    "islands_auto_events",
    "lang_id_docs",
    "lateral_topk_orders",
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
