"""Unified query registry: name -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL for every SQL-expressible entry.

Import order matters only for registration side effects; relational
defines the registry, the other modules append to it. After all
registrations the registry is REORDERED: the driver's correctness
gate checks the first 50 entries in insertion order. Everything else
keeps its local oracle coverage via tools/check_oracle.py, which
replays the driver's pandas canonicalization and dtype behavior over
the full catalog (210 queries: 210 strict oracles, 0 bounded-error, 0 rows-only).
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
    # ---- r14 window ----
    # (1) the r13 verdict's ask #1: the 4 r13 queries the driver gate
    # has never hashed (they landed after the r13 window cut), plus
    # the 2 new r14 operators
    "sssp_weighted_users_events",
    "pmi_collocations_docs",
    "weighted_sample_wor_docs",
    "streaming_weighted_sample_wor_docs",
    "kneser_ney_docs",
    "streaming_incremental_bfs_users_events",
    # (2) the two r09-age stragglers — rows-only at every previous
    # gate (bounded recall family), STRICT since r14 (_ivfpq_oracle):
    # their first-ever hashable driver rows
    "ann_ivfpq_indexed",
    "streaming_ivfpq_ingest_embeddings",
    # (3) value/oracle changed this round: approx_distinct_parts
    # moved to m=256 registers (values change), approx_quantile_events
    # swapped GK for the deterministic sampled rank-exact quantile
    # (STRICT, closing the catalog's last bounded row), and the other
    # two trained-quantizer queries gained the strict CTE-replay
    # oracles
    "approx_distinct_parts",
    "approx_quantile_events",
    "pq_topk_trained_embeddings",
    "ann_ivfpq_topk",
    # (4) back-fill with the oldest-evidence strict cohort: 38 of the
    # 47 r10-age queries (alphabetical prefix). The remaining 9
    # (range_window_events, rollup_hourly_daily, sessionize_auto_events,
    # sessionize_events, streaming_interval_join_events,
    # streaming_sessions_events, stride_sample_events,
    # string_functions_customers, unpivot_lineitem_measures) carry to
    # the r15 window — 12 must-in slots left no room, the same
    # overflow rule as r13. streaming_kneser_ney_docs (added after
    # the rotation filled all 50 slots) also waits for r15 with full
    # check_oracle evidence at sf0.001/0.01/0.1 this round. The
    # whole window is STRICT (the bounded set is EMPTY as of r14).
    # The SEVEN late-r14 session additions (salsa_users_events,
    # link_prediction_ra_events, harmonic_centrality_users_events,
    # local_clustering_events, winnow_match_pairs_docs,
    # streaming_winnow_match_docs, cdc_chunks_docs) likewise carry to
    # the r15 window with full check_oracle evidence at
    # sf0.001/0.01/0.1 + focused two-config determinism pairs this
    # round.
    "ann_cosine_topk",
    "ann_topk_batch",
    "asof_nearest_click_purchase",
    "asof_next_click_purchase",
    "contamination_bloom_docs",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_keep_best",
    "dedup_keep_best_scored",
    "embedding_incremental_neardup",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
    "heavy_hitters_rollup_docs",
    "heavy_hitters_tokens_docs",
    "interval_join_click_counts",
    "islands_auto_events",
    "islands_chunked_events",
    "join_anti_customers",
    "knn_graph_embeddings",
    "lang_id_docs",
    "lateral_topk_orders",
    "latest_snapshot_events",
    "lr_quality_train_docs",
    "min_acctbal_customer_per_nation",
    "nn_join_acctbal",
    "ntile_distribution_orders",
    "pack_sequences_docs",
    "pagerank_events",
    "pca_power_iteration_embeddings",
    "pivot_event_counts",
    "pq_topk_embeddings",
    "q10_returned_revenue",
    "q12_priority_by_flag",
    "q14_promo_share",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "quality_weighted_sample_docs",
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
# identical-result faster oracle forms for sf > 0.01 evidence sweeps
# — check_oracle.py only (the driver gate at sf0.01 keeps the
# brute-force witnesses)
SCALED_ORACLES = _relational.SCALED_ORACLES
assert set(QUERIES) == set(_relational.QUERIES)

__all__ = [
    "QUERIES",
    "ORACLES",
    "PRIORITY",
    "SCALED_ORACLES",
    "TOLERANCE_ORACLES",
]
