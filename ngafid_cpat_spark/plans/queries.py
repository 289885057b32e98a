"""Unified query registry: name -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL for every SQL-expressible entry.

Import order matters only for registration side effects; relational
defines the registry, the other modules append to it. After all
registrations the registry is REORDERED: the driver's correctness
gate checks the first 50 entries in insertion order, so PRIORITY is
re-curated each round — flagship sentinels, everything whose plan or
oracle changed this round, and whatever has not yet earned a driver
oracle row. Everything else keeps its local oracle coverage via
tools/check_oracle.py, which since r05 also replays the driver's
pandas canonicalization and dtype behavior (124 ok / 0 fail /
0 rows-only at sf0.001 as of r05 start).
"""

from __future__ import annotations

from . import breadth as _breadth  # noqa: F401  (registers)
from . import extensions as _extensions  # noqa: F401  (registers)
from . import pipeline as _pipeline  # noqa: F401  (registers)
from . import relational as _relational  # noqa: F401
from . import timeseries as _timeseries  # noqa: F401  (registers)
from . import tpch_extra as _tpch_extra  # noqa: F401  (registers)

# First 50 slots = the driver's correctness window, re-curated each
# round. Round-5 rotation (VERDICT r04 #4): (a) the 4 queries whose
# r04 rows failed on oracle canonicalization, re-entering with fixed
# oracles/output schemas; (b) global_ids_docs, the one strict-oracle
# query that had never had a driver row; (c) everything new or whose
# plan/oracle changed in r05 (auto window dispatch, the streaming
# interval join, the fixture-fed approach pipeline, the kmeans seed
# rounding, incremental-dedup signature); (d) 7 family sentinels;
# (e) the full 26-query set whose most recent driver evidence is r02
# (3 rounds stale) plus 6 of the oldest r03 rows, re-verified against
# the moving codebase. Driver-evidence state going in (from
# CORRECTNESS_r01-r04): every strict-oracle query EXCEPT
# global_ids_docs has at least one green driver row across r01-r04;
# approx_quantile_events and approx_distinct_parts are sketches with
# bounded-error oracles in tools/check_oracle.py (approx_distinct had
# a green r02 row; approx_quantile is rows-only by design and has
# never been in a window).
PRIORITY = [
    # --- (a) the 4 r04 canonicalization failures, oracles fixed ---
    "islands_chunked_events",     # CAST island_id AS BIGINT
    "pack_sequences_docs",        # CAST 3 windowed-SUM offsets
    "rollup_hourly_daily",        # CAST SUM(n) AS BIGINT
    "embedding_quantize_int8",    # q serialized as q_csv on both sides
    # --- (b) first-ever driver row ---
    "global_ids_docs",            # + r05 localCheckpoint pin
    # --- (c) new or plan-changed this round ---
    "sessionize_auto_events",     # NEW: skew=auto dispatch in-gate
    "streaming_interval_join_events",  # NEW: stream-stream join in-gate
    "approach_pipeline_demo",     # telemetry fixture + dim null-code contract
    "kmeans_clusters_embeddings", # half-away seed rounding
    "dedup_incremental_docs",     # history_fp signature
    # --- (d) family sentinels ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "streaming_sessions_events",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fuzzy_name_pairs_customers",
    "ann_topk_batch",
    # --- (e) stale-evidence re-verification: all 26 whose latest
    # driver row is r02 ---
    "above_avg_customers",
    "agg_cube_lineitem",
    "argmax_order_per_customer",
    "broadcast_star_revenue",
    "date_arith_events",
    "date_functions_orders",
    "distinct_parts_per_flag",
    "events_sliding_window",
    "from_json_events",
    "grouping_sets_orders",
    "interval_join_click_counts",  # batch twin of the new streaming join
    "join_anti_customers",
    "latest_snapshot_events",
    "min_acctbal_customer_per_nation",
    "ntile_distribution_orders",
    "pivot_event_counts",
    "q10_returned_revenue",
    "q12_priority_by_flag",
    "q14_promo_share",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "stride_sample_events",
    "string_functions_customers",
    "unpivot_lineitem_measures",
    "approx_distinct_parts",       # sketch: rows-only + bounded-error
    # --- plus 7 of the oldest r03 rows in modules touched this round ---
    "asof_click_before_purchase",  # as-of family, pairs w/ streaming join
    "nn_join_acctbal",             # joins.py fan_partitions change
    "sessionize_events",           # windows.py module
    "range_window_events",
    "ann_cosine_topk",             # similarity.py module
    "dedup_clusters",
    "episode_detect_events",
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
