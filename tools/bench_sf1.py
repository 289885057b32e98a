"""sf1 scale bench (r12 verdict ask #4): time the heaviest catalog
queries at sf1 (tools/gen_sf1.py output) against the SAME session's
sf0.1 timings and report 10x ratios with linear_ok flags — the
real-data replacement for tools/scale_smoke.py's synthetic scale-ups.

Writes BENCH_SF1_r{N}.json at the repo root (N from
SPARK_GRAFT_ROUND, default 14) and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = os.environ.get("SF1_DIR", "/root/repo/testdata_sf1")
SF01 = "/root/testdata/sf0.1"

# the 30 heaviest catalog queries by the r13 self-record (r12
# verdict asked the 10 heaviest; the r13 verdict asked the next 20),
# plus the two r14 additions so new operators get real-data scale
# evidence from birth
HEAVY = [
    "approach_pipeline_real_airports",
    "suffix_lcp_dup_spans_docs",
    "approach_pipeline_demo",
    "ann_ivfpq_topk",
    "incremental_cc_events",
    "dedup_keep_best_scored",
    "pq_topk_trained_embeddings",
    "ktruss_users_events",
    "streaming_interval_join_left_events",
    "streaming_interval_join_events",
    "fuzzy_name_pairs_customers",
    "streaming_approach_work_queue_real",
    "streaming_approach_work_queue",
    "profile_columns_events",
    "dsir_select_docs",
    "dedup_cluster_keep_best",
    "pca_power_iteration_embeddings",
    "allpairs_jaccard_prefix_docs",
    "dedup_incremental_minhash_docs",
    "embedding_neardup_lsh",
    "dedup_simhash",
    "streaming_dedup_windowed_events",
    "dedup_minhash_lsh",
    "quality_weighted_sample_docs",
    "frequent_part_pairs",
    "semantic_dedup_embeddings",
    "fs_entity_consolidation_customers",
    "kcore_users_events",
    "personalized_pagerank_events",
    "substring_dup_spans",
    "kneser_ney_docs",
    "streaming_incremental_bfs_users_events",
    # the seven late-r14 session additions — real-data scale
    # evidence from birth, same as the r14 pair above
    "salsa_users_events",
    "link_prediction_ra_events",
    "harmonic_centrality_users_events",
    "local_clustering_events",
    "winnow_match_pairs_docs",
    "streaming_winnow_match_docs",
    "cdc_chunks_docs",
]


def main() -> None:
    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import TABLES, load

    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for d in (SF01, SF1):
        for t in TABLES:
            mat(load(spark, d, t))
    for n in HEAVY:  # codegen warm-up at the small sf
        try:
            mat(QUERIES[n](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    try:
        spark._jvm.System.gc()
        time.sleep(1.0)
    except Exception:
        pass

    def run(sf_dir: str) -> tuple[dict, dict]:
        out, errs = {}, {}
        for n in HEAVY:
            try:
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    mat(QUERIES[n](spark, sf_dir))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                out[n] = round(best, 3)
                print(f"done {sf_dir} {n}: {out[n]}s", file=sys.stderr, flush=True)
            except Exception as e:
                errs[n] = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"ERR  {sf_dir} {n}: {errs[n]}", file=sys.stderr, flush=True)
        return out, errs

    t01, e01 = run(SF01)
    t1, e1 = run(SF1)
    ratios = {
        n: round(t1[n] / t01[n], 2)
        for n in HEAVY
        if n in t1 and n in t01 and t01[n] > 0
    }
    # 10x data; "linear_ok" mirrors scale_smoke's contract: ratio
    # comfortably under the 10x data growth plus scheduling slack
    result = {
        "sf01_sec": t01,
        "sf1_sec": t1,
        "ratio_10x": ratios,
        "linear_ok": {n: r <= 12.0 for n, r in ratios.items()},
        "errors": {**e01, **e1},
    }
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "14")
    with open(f"/root/repo/BENCH_SF1_r{rnd}.json", "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(result, sort_keys=True))


if __name__ == "__main__":
    main()
