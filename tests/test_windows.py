"""Unit tests for the ordered-series window operators (SURVEY §2.5)."""

from datetime import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import windows as OW


def test_islands_basic(spark):
    rows = [
        # flight 1: flags F F T T F T F -> islands 1 (t3,t4), 2 (t6)
        {"f": 1, "t": 1, "v": 10.0},
        {"f": 1, "t": 2, "v": 10.0},
        {"f": 1, "t": 3, "v": 1.0},
        {"f": 1, "t": 4, "v": 2.0},
        {"f": 1, "t": 5, "v": 10.0},
        {"f": 1, "t": 6, "v": 1.0},
        {"f": 1, "t": 7, "v": 10.0},
        # flight 2: all in one island
        {"f": 2, "t": 1, "v": 0.0},
        {"f": 2, "t": 2, "v": 0.0},
    ]
    df = spark.createDataFrame(rows)
    out = OW.islands(df, "f", ["t"], flag=F.col("v") < 5, island_col="isl")
    got = {(r["f"], r["t"]): r["isl"] for r in out.collect()}
    assert got == {(1, 3): 1, (1, 4): 1, (1, 6): 2, (2, 1): 1, (2, 2): 1}


def test_islands_keep_all_rows(spark):
    df = spark.createDataFrame([{"f": 1, "t": i, "v": float(i % 2)} for i in range(4)])
    out = OW.islands(df, "f", ["t"], flag=F.col("v") > 0, in_island_only=False)
    assert out.count() == 4


def test_sessionize_gap(spark):
    ts = [0, 100, 200, 5000, 5100, 20000]
    df = spark.createDataFrame(
        [{"u": 1, "ts": datetime.fromtimestamp(t)} for t in ts]
    )
    out = OW.sessionize(df, "u", "ts", gap_seconds=1000.0)
    sessions = [r["session_id"] for r in out.orderBy("ts").collect()]
    assert sessions == [1, 1, 1, 2, 2, 3]


def test_rolling_warmup_guard(spark):
    df = spark.createDataFrame([{"g": 1, "t": i, "v": float(i)} for i in range(1, 8)])
    out = OW.rolling(
        df, "g", ["t"], F.col("v"), agg="avg", window_rows=5,
        out_col="r", require_full=True,
    ).orderBy("t")
    vals = [r["r"] for r in out.collect()]
    assert vals[:4] == [None, None, None, None]  # warm-up (FlightAnalysis.py:301-307)
    assert vals[4] == 3.0  # mean(1..5)
    assert vals[5] == 4.0


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [{"g": g, "k": k, "v": float(10 * g + k)} for g in (1, 2) for k in range(5)]
    )
    out = OW.topk_per_group(df, "g", [F.col("v").desc()], k=2)
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [(1, 13.0), (1, 14.0), (2, 23.0), (2, 24.0)]


def test_boundaries(spark):
    df = spark.createDataFrame(
        [{"g": 1, "t": t, "v": 1.0} for t in (3, 4, 5)]
        + [{"g": 2, "t": t, "v": 2.0} for t in (10, 11)]
    )
    out = OW.boundaries(df, ["g"], "t", aggs=[F.sum("v").alias("s")])
    got = {r["g"]: (r["t_start"], r["t_end"], r["n_rows"], r["s"]) for r in out.collect()}
    assert got == {1: (3, 5, 3, 3.0), 2: (10, 11, 2, 4.0)}


def test_sessionize_chunked_equals_sessionize(spark):
    """Two-phase skew-robust sessionization must be result-identical
    to the single-window form on real data — including sessions that
    span chunk boundaries."""
    from ngafid_cpat_spark.operators import windows as OW
    from ngafid_cpat_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    plain = {
        (r["event_id"]): r["session_id"]
        for r in OW.sessionize(ev, "user_id", "ts", 3600.0).collect()
    }
    # tiny chunks (2h vs 1h gap) force MANY cross-chunk merges
    chunked = {
        (r["event_id"]): r["session_id"]
        for r in OW.sessionize_chunked(
            ev, "user_id", "ts", 3600.0, chunk_seconds=7200.0
        ).collect()
    }
    assert chunked == plain


def test_range_window_chunked_equals_plain(spark):
    # ties, exact chunk-boundary gaps (3599/3600/3601 s), negative
    # values, and a hot key — the chunked two-phase form must be
    # result-identical to the plain range frame
    import random

    from ngafid_cpat_spark.functions.timeutil import epoch_seconds
    from ngafid_cpat_spark.operators.windows import range_window_chunked

    random.seed(7)
    rows, rid = [], 0
    for u in range(3):
        t = 0
        for _ in range(60 if u else 300):  # u=0 hot
            t += random.choice([0, 1, 7, 3600, 3599, 3601, 100])
            rows.append(
                {"event_id": rid, "user_id": u, "ts_s": t,
                 "value": round(random.uniform(-5, 10), 1)}
            )
            rid += 1
    df = (
        spark.createDataFrame(rows)
        .withColumn("ts", F.timestamp_seconds("ts_s"))
        .drop("ts_s")
    )
    plain_w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_seconds(F.col("ts")))
        .rangeBetween(-3600, 0)
    )
    plain = df.select(
        "event_id",
        F.sum("value").over(plain_w).alias("s"),
        F.count(F.lit(1)).over(plain_w).alias("n"),
    )
    chunked = range_window_chunked(
        df, "user_id", "ts", "value", 3600.0, "s", "n"
    ).select("event_id", "s", "n")
    a = {r["event_id"]: (round(r["s"], 6), r["n"]) for r in plain.collect()}
    b = {r["event_id"]: (round(r["s"], 6), r["n"]) for r in chunked.collect()}
    assert a == b


def test_islands_chunked_matches_plain(spark):
    """Two-phase islands == single-window islands, both modes,
    with chunks small enough that runs cross chunk boundaries and
    with all-unflagged chunks separating runs."""
    import datetime

    from ngafid_cpat_spark.operators import windows as OW

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: long alternating runs crossing 1h chunk boundaries
    pattern = [1]*90 + [0]*30 + [1]*200 + [0]*1 + [1]*50
    for i, f in enumerate(pattern):
        rows.append({"user_id": 1, "event_id": i,
                     "ts": base + datetime.timedelta(minutes=2*i),
                     "value": 100.0 if f else 0.0})
    # user 2: flagged only at the very last row of the data
    for i in range(10):
        rows.append({"user_id": 2, "event_id": i,
                     "ts": base + datetime.timedelta(hours=i),
                     "value": 100.0 if i == 9 else 0.0})
    df = spark.createDataFrame(rows)
    flag = F.col("value") > 50
    for mode in (True, False):
        plain = {
            (r["user_id"], r["event_id"]): r["island_id"]
            for r in OW.islands(
                df, "user_id", [OW.epoch_seconds("ts"), "event_id"],
                flag=flag, in_island_only=mode,
            ).collect()
        }
        chunked = {
            (r["user_id"], r["event_id"]): r["island_id"]
            for r in OW.islands_chunked(
                df, "user_id", "ts", ["event_id"], flag=flag,
                in_island_only=mode, chunk_seconds=3600.0,
            ).collect()
        }
        assert plain == chunked, mode
    # sanity on the run structure itself
    only = OW.islands(
        df, "user_id", [OW.epoch_seconds("ts"), "event_id"], flag=flag
    )
    n = only.filter("user_id = 1").select("island_id").distinct().count()
    assert n == 3


def test_global_row_number_matches_naive_and_avoids_single_task(spark):
    from pyspark.sql import Window as W

    from ngafid_cpat_spark.operators import windows as OW

    df = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    got = OW.global_row_number(df, ["k", "v"], out_col="rid")
    naive = df.withColumn(
        "rid", F.row_number().over(W.orderBy("k", "v"))
    )
    assert sorted(map(tuple, got.select("k", "v", "rid").collect())) == sorted(
        map(tuple, naive.select("k", "v", "rid").collect())
    )
    # the scalable form must not plan a global single-partition sort:
    # no SinglePartition exchange anywhere
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # ids are contiguous from 1
    n = df.count()
    stats = got.agg(
        F.min("rid").alias("lo"), F.max("rid").alias("hi"),
        F.countDistinct("rid").alias("d"),
    ).first()
    assert (stats["lo"], stats["hi"], stats["d"]) == (1, n, n)


def test_skew_auto_dispatch_equivalence(spark):
    """The *_auto dispatchers must return identical results whichever
    branch the hottest-key probe picks: threshold_rows=0 forces the
    chunked form, a huge threshold forces the plain form."""
    from ngafid_cpat_spark.operators import windows as OW
    from ngafid_cpat_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    big = 1 << 60

    plain_s = OW.sessionize_auto(ev, "user_id", "ts", 3600.0,
                                 threshold_rows=big)
    chunk_s = OW.sessionize_auto(ev, "user_id", "ts", 3600.0,
                                 chunk_seconds=7200.0, threshold_rows=0)
    assert {r["event_id"]: r["session_id"] for r in plain_s.collect()} == {
        r["event_id"]: r["session_id"] for r in chunk_s.collect()
    }

    flag = F.col("value") > 50
    plain_i = OW.islands_auto(ev, "user_id", "ts", ["event_id"], flag,
                              threshold_rows=big)
    chunk_i = OW.islands_auto(ev, "user_id", "ts", ["event_id"], flag,
                              chunk_seconds=3600.0, threshold_rows=0)
    assert {r["event_id"]: r["island_id"] for r in plain_i.collect()} == {
        r["event_id"]: r["island_id"] for r in chunk_i.collect()
    }

    plain_r = OW.range_window_auto(ev, "user_id", "ts", "value", 3600.0,
                                   threshold_rows=big)
    chunk_r = OW.range_window_auto(ev, "user_id", "ts", "value", 3600.0,
                                   threshold_rows=0)
    a = {r["event_id"]: (round(r["range_sum"], 6), r["range_n"])
         for r in plain_r.collect()}
    b = {r["event_id"]: (round(r["range_sum"], 6), r["range_n"])
         for r in chunk_r.collect()}
    assert a == b
    # non-integral window width must always take the chunked path
    # (rangeBetween bounds are longs) - just assert it runs + schema
    frac = OW.range_window_auto(ev.limit(100), "user_id", "ts", "value",
                                1800.5, threshold_rows=big)
    assert {"range_sum", "range_n"} <= set(frac.columns)


def test_hottest_key_rows(spark):
    from ngafid_cpat_spark.operators import windows as OW

    df = spark.createDataFrame(
        [{"k": 1, "v": i} for i in range(7)]
        + [{"k": 2, "v": i} for i in range(3)]
    )
    assert OW.hottest_key_rows(df, "k") == 7
    assert OW.hottest_key_rows(df.limit(0), "k") == 0


def test_pareto_frontier_matches_brute_force(spark):
    """pareto_frontier_2d == the quadratic NOT-EXISTS dominance
    semantics on a python reference, including frontier-point ties
    and dominated same-key rows."""
    from ngafid_cpat_spark.operators.windows import pareto_frontier_2d

    rows = [
        (1, 1, 10.0), (2, 1, 7.0),        # key 1: max 10 on frontier
        (3, 2, 10.0),                     # tied price, later key: dominated
        (4, 2, 12.0), (5, 2, 12.0),       # new record, TWO tied rows: both kept
        (6, 3, 11.0),                     # later and lower: dominated
        (7, 4, 15.0),                     # new record
    ]

    def brute(rows):
        out = set()
        for i, d, p in rows:
            if not any(
                (d2 <= d and p2 >= p and (d2 < d or p2 > p))
                for _, d2, p2 in rows
            ):
                out.add(i)
        return out

    df = spark.createDataFrame(rows, ["id", "d", "p"])
    got = {
        r["id"]
        for r in pareto_frontier_2d(df, "d", "p").collect()
    }
    assert got == brute(rows) == {1, 4, 5, 7}


def test_pareto_frontier_no_single_partition_window(spark):
    from ngafid_cpat_spark.operators.windows import pareto_frontier_2d

    df = spark.range(1000).select(
        (F.col("id") % 50).alias("d"), (F.col("id") % 77).cast("double").alias("p")
    )
    out = pareto_frontier_2d(df, "d", "p")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # strictly increasing frontier in both dims
    pts = sorted({(r["d"], r["p"]) for r in out.collect()})
    for (d1, p1), (d2, p2) in zip(pts, pts[1:]):
        assert d1 < d2 and p1 < p2


def test_equi_depth_histogram_properties(spark):
    """Bucket counts differ by <= 1 row... no: the floor-division
    split gives each bucket floor/ceil(n/10) rows; boundaries are
    non-decreasing across buckets; no single-partition window."""
    from ngafid_cpat_spark.plans import QUERIES

    df = QUERIES["equi_depth_value_events"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the one-row scalar TOTAL aggregate legitimately exchanges to a
    # single partition; what must NOT appear is a single-partition
    # WINDOW (ranking the corpus through one task)
    import re

    for line in plan.splitlines():
        if re.match(r"\s*(\+-|:-)?\s*Window ", line):
            assert "__pid" in line, line
    rows = sorted(df.collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == list(range(10))
    n = sum(r["n_rows"] for r in rows)
    assert all(abs(r["n_rows"] - n / 10) < 1 + n / 1000 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]
