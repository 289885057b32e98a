"""Per-stage timing breakdown for the dedup family and the approach
pipeline.

The end-to-end bench times whole queries; before a 100x scale-up you
want to know WHICH stage of a multi-stage operator dominates (shingle
explode? signature aggregate? band self-join? verify join?). Each
stage is materialized to the noop sink from a localCheckpoint of the
previous stage, so a stage's number is its own cost, not its
lineage's.

Usage: python tools/stage_profile.py [--sf-dir /root/testdata/sf0.1]
                                     [--approach]
Appends nothing; prints a markdown table (paste into PLANS.md).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def profile_approach(sf_dir: str) -> None:
    """Stage breakdown of the approach pipeline over the demo's
    synthetic telemetry (plans/extensions.approach_pipeline_demo):
    synthesis window, nearest-airport argmin, takeoff filter,
    islands + predicates, episode aggregate, landing join — plus the
    end-to-end plan both with and without intermediate persists (the
    round-4 finding: AQE ReusedExchange beats caching for the
    run-once shape)."""
    import time

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.plans import approach as AP
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import load

    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load(spark, sf_dir, "events")
    ev.write.format("noop").mode("overwrite").save()  # warm scan
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    tel = ev.select(
        F.col("user_id").alias("flight"),
        rn.cast("long").alias("time"),
        (F.lit(800.0) + F.col("value") * 10).alias("msl_altitude"),
        (F.col("value") / 2).alias("indicated_airspeed"),
        (-F.col("value")).alias("vertical_airspeed"),
        F.lit(90.0).alias("heading"),
        (F.lit(40.0) + F.col("value") / 5000).alias("latitude"),
        (F.lit(-85.0) + F.col("value") / 5000).alias("longitude"),
    )
    airports = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "latitude": 40.0, "longitude": -85.0,
             "elevation_ft": 800.0},
            {"airport_code": "KBBB", "latitude": 40.02, "longitude": -84.98,
             "elevation_ft": 820.0},
        ]
    )
    runways = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "runway_code": "09",
             "magnetic_rwy_hdg": 90.0, "true_rwy_hdg": 90.0,
             "center_lat": 40.0, "center_long": -85.0},
            {"airport_code": "KBBB", "runway_code": "08",
             "magnetic_rwy_hdg": 85.0, "true_rwy_hdg": 85.0,
             "center_lat": 40.02, "center_long": -84.98},
        ]
    )
    rows: list[tuple] = []

    def timed(name, df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        rows.append((name, round(time.perf_counter() - t0, 2), out.count()))
        return out

    print(f"## approach stage profile @ {sf_dir}\n")
    t = timed("synthesize telemetry (row_number window)", tel)
    d = t.na.drop(subset=list(AP.TELEMETRY_COLS)).repartition(
        spark.sparkContext.defaultParallelism, "flight"
    )
    near = timed("nearest-airport argmin (least-fold path, 2 dims)", AP.with_nearest_airport(d, airports))
    wf = W.partitionBy("flight").orderBy("time")
    wfl = W.partitionBy("flight")
    near = near.withColumn("agl", F.col("msl_altitude") - F.col("airport_elev"))
    first_elev = F.first("airport_elev").over(wf)
    post = timed(
        "takeoff detection + filter",
        near.withColumn(
            "takeoff_time",
            F.min(
                F.when((F.col("msl_altitude") - first_elev) >= 500.0, F.col("time"))
            ).over(wfl),
        ).filter(F.col("time") >= F.col("takeoff_time")),
    )
    # end-to-end under FULL materialization (noop sink — a count()
    # lets Catalyst prune the aggregate columns and understates the
    # persist modes' real cost by 2x), all three fan-out
    # materialization modes (see analyze()'s persist docstring)
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(AP.analyze(tel, airports, runways))  # warm
    for label, p in (
        ("analyze end-to-end persist='checkpoint' (default)", "checkpoint"),
        ("analyze end-to-end persist=True", True),
        ("analyze end-to-end persist=False", False),
    ):
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(AP.analyze(tel, airports, runways, persist=p))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append((label, round(best, 2), "-"))
    print("| stage | sec | rows out |")
    print("|---|---|---|")
    for name, dt, n in rows:
        print(f"| {name} | {dt} | {n} |")


def profile_nearest_real_airports(sf_dir: str) -> None:
    """The reference's dominant cost at its REAL dim size: the
    15,165-airport nearest-neighbor scan (FlightAnalysis.py:347-367,
    data/Airports.csv). Times with_nearest_airport's two large-dim
    physical strategies — broadcast cross-fan two-phase argmin vs
    gridded 3x3-cell equi-join — over the sf telemetry fixture,
    interleaved runs to the noop sink (best of 2; the playbook's
    box-load rule), plus the full analyze() end-to-end on the real
    airports + real 164-runway detail table."""
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.plans import approach as AP
    from ngafid_cpat_spark.plans.extensions import _telemetry_fixture
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources.tables import (
        load_reference_airports,
        load_reference_runways,
    )

    spark = get_spark("stage-profile-airports")
    spark.sparkContext.setLogLevel("ERROR")
    airports = load_reference_airports(
        spark, "/root/reference/data/Airports.csv"
    )
    runways = load_reference_runways(
        spark, "/root/reference/data/AirportsDetailed.csv"
    )
    tel = _telemetry_fixture(spark, sf_dir).na.drop(
        subset=list(AP.TELEMETRY_COLS)
    )
    n_ticks = tel.count()
    n_ap = airports.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(tel)  # warm the fixture scan

    variants = {
        "broadcast cross-fan two-phase argmin": dict(
            fold_max_dims=0, grid_min_dims=0, fan_partitions=None
        ),
        "gridded 3x3-cell equi-join argmin": dict(
            fold_max_dims=0, grid_min_dims=2048
        ),
    }
    best: dict[str, float] = {}
    for _ in range(2):  # interleaved A/B (ambient load drifts)
        for name, kw in variants.items():
            t0 = time.perf_counter()
            noop(AP.with_nearest_airport(tel, airports, **kw))
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), dt)
    t0 = time.perf_counter()
    noop(AP.analyze(tel, airports, runways))
    e2e = time.perf_counter() - t0

    print(f"## nearest-airport @ real dim ({n_ap} airports, "
          f"{n_ticks} ticks, {sf_dir})\n")
    print("| path | sec |")
    print("|---|---|")
    for name, dt in best.items():
        print(f"| {name} | {round(dt, 2)} |")
    print(f"| analyze() end-to-end, real airports+runways | {round(e2e, 2)} |")


def profile_corpus_prep(sf_dir: str) -> None:
    """Stage breakdown of corpus_prep_pipeline_docs: quality gate,
    fingerprint keeper aggregate, dedup semi-join, temperature-mix
    rank window, packing tape window, final rollup. Each stage
    checkpointed so its number is its own cost."""
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.functions import text as T
    from ngafid_cpat_spark.operators import corpus as C
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import load

    spark = get_spark("stage-profile-prep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()

    rows: list[tuple] = []

    def timed(name, df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        dt = time.perf_counter() - t0
        rows.append((name, round(dt, 2), out.count()))
        return out

    q = timed(
        "quality gate (token count >= 10)",
        docs.withColumn(
            "n_tok", T.token_count("text").cast("long")
        ).filter(F.col("n_tok") >= 10),
    )
    keep = timed(
        "fingerprint keeper aggregate",
        q.select("doc_id", T.fingerprint_md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id")),
    )
    d = timed(
        "dedup semi-join",
        q.join(keep.select("doc_id"), "doc_id", "left_semi"),
    )
    mix = timed(
        "temperature mix (budgets + rank window)",
        C.temperature_mix(d, group_col="lang"),
    )
    packed = timed(
        "packing tape window",
        C.pack_sequences(mix, budget=512, group_col="lang"),
    )
    timed(
        "per-lang rollup",
        packed.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            (F.max("chunk_last") + 1).cast("bigint").alias("n_chunks"),
        ),
    )
    print("| stage | sec | rows out |")
    print("|---|---|---|")
    for name, dt, n in rows:
        print(f"| {name} | {dt} | {n} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--approach", action="store_true",
                    help="profile the approach pipeline instead of dedup")
    ap.add_argument("--corpus-prep", action="store_true",
                    help="profile corpus_prep_pipeline_docs stages")
    ap.add_argument("--airports-real", action="store_true",
                    help="nearest-airport paths at the real 15,165-dim")
    args = ap.parse_args()

    if args.airports_real:
        profile_nearest_real_airports(args.sf_dir)
        return
    if args.approach:
        profile_approach(args.sf_dir)
        return
    if args.corpus_prep:
        profile_corpus_prep(args.sf_dir)
        return

    from pyspark.sql import functions as F

    from ngafid_cpat_spark.operators import dedup as D
    from ngafid_cpat_spark.operators.dedup import _shingle_sets
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import load

    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name, df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        dt = time.perf_counter() - t0
        rows.append((name, round(dt, 2), out.count()))
        return out

    docs = load(spark, args.sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()  # warm scan

    rows: list[tuple] = []
    print(f"## dedup stage profile @ {args.sf_dir}\n")

    # --- simhash_pairs stages (mirrors the production exploded path) ---
    sh0 = timed(
        "simhash: shingle sets (explode+lead+hash)",
        _shingle_sets(docs, "doc_id", "text", 3),
    )
    hashed = sh0.select("id", F.xxhash64("sh").alias("h"))
    votes = timed(
        "simhash: 64-bit majority votes (groupBy + 64 sums)",
        hashed.groupBy("id").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.expr(f"sum(cast(shiftrightunsigned(h, {b}) & 1L as int)) AS b{b}")
                for b in range(64)
            ],
        ),
    )
    sh64_sql = " | ".join(
        f"(CASE WHEN b{b} * 2 >= n THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(64)
    )
    sig = timed(
        "simhash: signature assembly", votes.select("id", F.expr(f"({sh64_sql}) AS sh64"))
    )
    blocks = sig.select(
        "id", "sh64",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("block"),
                    F.shiftrightunsigned("sh64", 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("key"),
                )
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("id", "sh64", "bk.block", "bk.key")
    timed(
        "simhash: block self-join + hamming verify",
        blocks.alias("a")
        .join(blocks.alias("b"), on=["block", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            D.hamming64(F.col("a.sh64"), F.col("b.sh64")).alias("hamming"),
        )
        .filter(F.col("hamming") <= 16)
        .distinct(),
    )

    # --- jaccard stages ---
    sh = timed("jaccard: shingle sets (explode+lead+hash)", _shingle_sets(docs, "doc_id", "text", 3))
    timed(
        "jaccard: inverted-index self-join + count",
        sh.alias("a")
        .join(sh.alias("b"), on="sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("c")),
    )

    print("| stage | sec | rows out |")
    print("|---|---|---|")
    for name, dt, n in rows:
        print(f"| {name} | {dt} | {n} |")


if __name__ == "__main__":
    main()
