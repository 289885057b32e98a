"""Unit tests for the time-series batch: gap fill + LOCF, rollup
reuse, higher-order functions, regexp_extract_all."""

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _locf(df, order="day", part="user_id", col="v"):
    w = (
        Window.partitionBy(part)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("locf", F.last(col, ignorenulls=True).over(w))


def test_locf_carries_forward_and_stays_null_before_first(spark):
    df = spark.createDataFrame(
        [
            (1, 1, None),
            (1, 2, 10.0),
            (1, 3, None),
            (1, 4, None),
            (1, 5, 20.0),
            (2, 1, None),
        ],
        ["user_id", "day", "v"],
    )
    got = {
        (r["user_id"], r["day"]): r["locf"] for r in _locf(df).collect()
    }
    assert got[(1, 1)] is None  # nothing to carry yet
    assert got[(1, 2)] == 10.0
    assert got[(1, 3)] == 10.0  # carried across the gap
    assert got[(1, 4)] == 10.0
    assert got[(1, 5)] == 20.0  # refreshed by a new observation
    assert got[(2, 1)] is None  # partitions don't leak


def test_gapfill_grid_is_dense(spark):
    ev = spark.createDataFrame(
        [(7, "2024-01-05"), (7, "2024-01-05"), (9, "2024-01-20")],
        ["user_id", "day"],
    ).withColumn("day", F.col("day").cast("date"))
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-01-30").cast("date"),
                )
            ).alias("day"),
        )
    )
    joined = grid.join(
        ev.groupBy("user_id", "day").count(), ["user_id", "day"], "left"
    )
    assert joined.count() == 2 * 30  # every (user, day) cell exists
    zero_days = joined.filter(F.col("count").isNull()).count()
    assert zero_days == 2 * 30 - 2


def test_rollup_reuse_matches_direct_daily(spark):
    """Daily-from-hourly must equal daily-from-raw exactly (integer
    partials recompose; this is the continuous-aggregate contract)."""
    import datetime

    rows = [
        (datetime.datetime(2024, 1, d, h, m), float(d * h + m) / 7.0)
        for d in (1, 2)
        for h in (0, 5, 23)
        for m in (0, 31)
    ]
    ev = spark.createDataFrame(rows, ["ts", "value"])
    cents = F.sum(F.round(F.col("value") * 100, 0).cast("long"))
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"), cents.alias("c")
    )
    via_hourly = (
        hourly.groupBy(F.to_date("hour").alias("day"))
        .agg(F.sum("n").alias("n"), F.sum("c").alias("c"))
    )
    direct = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n"), cents.alias("c")
    )
    assert sorted(map(tuple, via_hourly.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hof_six_facts_small(spark):
    df = spark.createDataFrame(
        [(1, [3, -1, 10, 7]), (2, [5])], ["uid", "arr"]
    )
    zero = F.lit(0).cast("long")
    out = {
        r["uid"]: r
        for r in df.select(
            "uid",
            F.size(F.filter("arr", lambda v: v > 4)).alias("n_above"),
            F.exists("arr", lambda v: v > 9).alias("any_big"),
            F.forall("arr", lambda v: v >= 0).alias("all_nonneg"),
            F.aggregate("arr", zero, lambda a, v: a + v).alias("total"),
            F.aggregate(
                F.slice(F.reverse(F.sort_array("arr")), 1, 3),
                zero,
                lambda a, v: a + v,
            ).alias("top3"),
        ).collect()
    }
    assert out[1]["n_above"] == 2 and out[1]["any_big"] is True
    assert out[1]["all_nonneg"] is False
    assert out[1]["total"] == 19 and out[1]["top3"] == 20  # 10+7+3
    # fewer than 3 elements: slice takes what exists
    assert out[2]["top3"] == 5 and out[2]["all_nonneg"] is True


@pytest.mark.parametrize(
    "s", ["a1b22c333", "", "no digits", "007", '{"k": 69, "j": 7}']
)
def test_regexp_extract_all_matches_duckdb(spark, s):
    nums = F.regexp_extract_all("x", F.lit("[0-9]+"), 0)
    zero = F.lit(0).cast("long")
    row = (
        spark.createDataFrame([(s,)], ["x"])
        .select(
            F.size(nums).alias("n"),
            F.aggregate(
                F.transform(nums, lambda x: x.cast("long")),
                zero,
                lambda a, v: a + v,
            ).alias("total"),
            F.get(nums, 0).cast("long").alias("first"),
        )
        .first()
    )
    want = duckdb.sql(
        "SELECT len(regexp_extract_all(?, '[0-9]+')),"
        " COALESCE(list_aggregate(list_transform("
        "   regexp_extract_all(?, '[0-9]+'), x -> CAST(x AS BIGINT)), 'sum'), 0),"
        " CAST(regexp_extract_all(?, '[0-9]+')[1] AS BIGINT)",
        params=[s, s, s],
    ).fetchone()
    assert (row["n"], row["total"], row["first"]) == want
