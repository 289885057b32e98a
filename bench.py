"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints the result as JSON:

  line 1 (compact): {"metric": ..., "value": total_sec, "unit":
    "sec", "queries": {headline name: sec, ...}, "sf": ...}
  line 2 (full):    the same plus "extra_queries" with a per-name
    timing for EVERY registered catalog query, and any "errors"

The compact line exists because the full line (150 per-query
timings) exceeds the round driver's output capture, which left every
BENCH_r*.json since r02 with a truncated tail and "parsed": null —
the headline totals must survive truncation. Parsers that want the
whole catalog read the last line; parsers that want the headline
read the first.

Each query is fully materialized through the noop sink so lazy plans
can't fake speed. A warm-up pass pays session/JIT/codegen costs
outside the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "broadcast_star_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q21_sole_failing_supplier",
    "nn_join_acctbal",
    "asof_click_before_purchase",
    "argmax_order_per_customer",
    "topk_customers_per_nation",
    "window_running_orders",
    "range_window_events",
    "sessionize_events",
    "episode_detect_events",
    "unstable_subintervals",
    "rolling5_events",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup_lsh",
    "ann_cosine_topk",
    "text_stats",
    "text_quality",
    "json_extract_events",
    "events_tumbling_window",
    # r10: the engine's flagship surfaces, so the driver artifact
    # tracks them round-over-round (the r09 judge's ask — the
    # ann_ivfpq_topk drift was invisible to the headline set)
    "ann_ivfpq_indexed",
    "corpus_prep_pipeline_docs",
    "streaming_approach_work_queue",
    # r11: the engine's reason-for-being at the REAL national dim —
    # the gridded nearest-airport dispatch the r10 verdict asked to
    # make a gate query; headline-tracked like the other flagships
    "approach_pipeline_real_airports",
]

# Self-recorded full results from the previous bench run (committed).
# The driver's BENCH_r*.json artifacts truncate the full line, so
# round-over-round extra-query comparison uses this file instead.
SELF_RECORD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark

    spark = get_spark("ngafid-cpat-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        # noop sink computes every column of every row (count() would
        # let Catalyst prune the aggregates away)
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM/codegen/parquet-footer costs out of the measurement;
    # touch every table once so no query pays the first-scan cost
    from ngafid_cpat_spark.sources import TABLES, load

    for t in TABLES:
        # noop write decodes every column; a bare count() hits the
        # parquet count pushdown and leaves column pages cold
        materialize(load(spark, sf_dir, t))
    materialize(QUERIES["q1_pricing_summary"](spark, sf_dir))

    # warm the Python worker pool: the first Arrow/pandas stage pays
    # a numpy+pandas import in every one of the N reused workers
    # (~seconds of CPU-contended startup) — pay it here, with the JVM
    # warm-up, not inside a measured query
    def _touch(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    materialize(
        spark.range(0, n_workers, 1, n_workers).mapInPandas(_touch, "id long")
    )

    # warm codegen: run every headline query once at the smallest SF.
    # Whole-stage-codegen classes are cached by generated source —
    # which depends on schema and expressions, not data paths — so
    # this pre-pays Janino compilation (~1-2 s per distinct plan
    # shape) exactly like a JIT warm-up, while touching ~1% of the
    # benchmark data volume.
    # every registered query gets a per-name timing so regressions are
    # visible query-by-query; HEADLINE first (its sum is the headline
    # metric, comparable across rounds), then the rest of the registry
    extra = sorted(set(QUERIES) - set(HEADLINE))
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001"
    )
    for name in HEADLINE + extra:
        try:
            materialize(QUERIES[name](spark, warm_dir))
        except Exception:
            pass  # warm-up is best-effort; the measured run reports

    # quiesce before measuring: the 100+-query warm loop leaves the
    # JVM with a full young gen and pending cleanup that otherwise
    # lands as a multi-second pause inside the FIRST measured query
    try:
        spark._jvm.System.gc()
        time.sleep(1.0)
    except Exception:
        pass

    def run_set(names: list[str], runs: int = 1) -> tuple[dict[str, float], dict[str, str]]:
        # per-query isolation: one broken query must never void the
        # whole benchmark run — it reports under "errors" instead.
        # runs=2 reports the min of back-to-back runs (steady-state
        # throughput, insulated from stray GC/compilation pauses).
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name in names:
            best = None
            try:
                for _ in range(runs):
                    t0 = time.perf_counter()
                    materialize(QUERIES[name](spark, sf_dir))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                timings[name] = round(best, 3)
            except Exception as e:
                msg = str(e).splitlines()[0] if str(e) else ""
                errors[name] = f"{type(e).__name__}: {msg[:200]}"
        return timings, errors

    timings, errors = run_set(HEADLINE, runs=2)
    headline_errors = dict(errors)
    # extras get min-of-2 as well: single-shot extras made BENCH_r05
    # report seven phantom >1.4x per-query "regressions" that were
    # pure box-load noise (see SCALE.md's noise note)
    extra_timings, extra_errors = run_set(extra, runs=2)
    errors.update(extra_errors)

    # the slowest decile gets a THIRD trial (min-of-3): these are the
    # queries whose drift matters most and whose long runtimes make a
    # stray GC pause look like a real regression (the r09 judge's
    # de-noising ask)
    merged = {**timings, **extra_timings}
    slowest = sorted(merged, key=merged.get, reverse=True)[:15]
    third, third_err = run_set(slowest, runs=1)
    for name, dt in third.items():
        tgt = timings if name in timings else extra_timings
        tgt[name] = min(tgt[name], dt)
    # a third-trial failure keeps the query's min-of-2 timing (it
    # never deflates), but it must be VISIBLE: an intermittent
    # regression-into-exception on exactly the slow queries the
    # extra trial watches would otherwise vanish
    # a failing headline query must INFLATE the metric, never deflate
    # it (a regression-into-exception would otherwise read as a
    # speedup): each error adds a 1000 s penalty to the total
    total = round(sum(timings.values()) + 1000.0 * len(headline_errors), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if headline_errors:
        compact["errors"] = headline_errors
    out = dict(compact)
    out["extra_queries"] = extra_timings
    if errors:
        out["errors"] = errors
    if third_err:
        compact["third_run_errors"] = third_err
        out["third_run_errors"] = third_err

    # round-over-round drift detection against the committed previous
    # self-record: a query is flagged when it is >1.3x its prior
    # min-of-N time AND the absolute delta exceeds 0.75 s. The delta
    # floor is measured, not arbitrary: back-to-back full runs on
    # this box (ambient load 2-4) flag DISJOINT sets of ~10 sub-1.5 s
    # queries at 1.3-2.0x with deltas <= 0.55 s — pure noise — while
    # the one real historical drift (ann_ivfpq_topk 6.4 -> 10.7 s)
    # carries a 4.3 s delta. Sub-0.75 s drifts stay visible in the
    # per-query dicts; this key is the alarm, not the record.
    regressions: dict[str, list[float]] = {}
    try:
        with open(SELF_RECORD) as f:
            prev = json.load(f)
        prev_all = {**prev.get("queries", {}), **prev.get("extra_queries", {})}
        cur_all = {**timings, **extra_timings}
        for name, t in sorted(cur_all.items()):
            p = prev_all.get(name)
            if p is not None and p > 0 and t / p > 1.3 and t - p > 0.75:
                regressions[name] = [p, t]
    except (OSError, ValueError):
        pass
    compact["regressions"] = regressions
    out["regressions"] = regressions
    record = {
        "sf": compact["sf"],
        "value": total,
        "queries": timings,
        "extra_queries": extra_timings,
    }
    try:
        with open(SELF_RECORD, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass
    # every run ALSO appends to the history log, so a later run (the
    # round driver's) can no longer silently erase a builder
    # self-record — in r12 the committed 28.352 s self-run was
    # overwritten by the driver's 35.082 s numbers, destroying the
    # very discrepancy that needed investigating. A tagged run
    # additionally snapshots to its own file (builders pass
    # SPARK_GRAFT_BENCH_TAG=self_r13; the driver passes nothing).
    hist = dict(record)
    hist["unix_time"] = round(time.time(), 1)
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
    if tag:
        hist["tag"] = tag
    base = os.path.dirname(os.path.abspath(__file__))
    hist_path = os.path.join(base, "BENCH_HISTORY.jsonl")
    try:
        with open(hist_path, "a") as f:
            f.write(json.dumps(hist, sort_keys=True) + "\n")
        # bound the committed log (r13 ADVICE: unbounded append grows
        # the repo file forever) — keep the newest 300 runs, which is
        # years of round history at the current cadence.
        with open(hist_path) as f:
            lines = f.readlines()
        if len(lines) > 300:
            with open(hist_path, "w") as f:
                f.writelines(lines[-300:])
    except OSError:
        pass
    if tag:
        try:
            with open(
                os.path.join(base, f"BENCH_SELF_{tag}.json"), "w"
            ) as f:
                json.dump(hist, f, indent=1, sort_keys=True)
                f.write("\n")
        except OSError:
            pass
    # The driver captures only the output TAIL, so the compact
    # headline line (~1 KB) must be LAST to survive truncation of the
    # 150+-entry full line. Print the full catalog line first, the
    # compact line last (r08 printed them in the opposite order and
    # the driver artifact stayed unparseable).
    print(json.dumps(out), flush=True)
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
