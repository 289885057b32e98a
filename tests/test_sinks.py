"""Idempotent upsert sink tests (S6/S7 semantics)."""

import pytest

from ngafid_cpat_spark import sinks


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "approaches")
    base = spark.createDataFrame(
        [
            {"flight_id": 1, "approach_id": 1, "landing_type": "go-around"},
            {"flight_id": 1, "approach_id": 2, "landing_type": "stop-and-go"},
            {"flight_id": 2, "approach_id": 1, "landing_type": "touch-and-go"},
        ]
    )
    sinks.create_table(base, path, keys=["flight_id", "approach_id"], n_buckets=4)
    return path


def read_map(spark, path):
    return {
        (r["flight_id"], r["approach_id"]): r["landing_type"]
        for r in sinks.read_table(spark, path).collect()
    }


def test_upsert_updates_and_inserts(spark, table):
    updates = spark.createDataFrame(
        [
            {"flight_id": 1, "approach_id": 2, "landing_type": "go-around"},  # update
            {"flight_id": 3, "approach_id": 1, "landing_type": "stop-and-go"},  # insert
        ]
    )
    sinks.upsert(spark, updates, table, keys=["flight_id", "approach_id"], n_buckets=4)
    got = read_map(spark, table)
    assert got[(1, 2)] == "go-around"
    assert got[(3, 1)] == "stop-and-go"
    assert got[(1, 1)] == "go-around"        # untouched row survives
    assert got[(2, 1)] == "touch-and-go"
    assert len(got) == 4


def test_upsert_idempotent(spark, table):
    updates = spark.createDataFrame(
        [{"flight_id": 2, "approach_id": 1, "landing_type": "stop-and-go"}]
    )
    sinks.upsert(spark, updates, table, keys=["flight_id", "approach_id"], n_buckets=4)
    first = read_map(spark, table)
    sinks.upsert(spark, updates, table, keys=["flight_id", "approach_id"], n_buckets=4)
    assert read_map(spark, table) == first  # re-run is a no-op


def test_mark_analyzed_status_flip(spark, tmp_path):
    path = str(tmp_path / "flight_analyses")
    status = spark.createDataFrame(
        [
            {"flight_id": 1, "approach_analysis": 0},
            {"flight_id": 2, "approach_analysis": 0},
        ]
    )
    sinks.create_table(status, path, keys=["flight_id"], n_buckets=4)
    done = spark.createDataFrame([{"flight_id": 1}])
    sinks.mark_analyzed(spark, path, done, n_buckets=4)
    got = {
        r["flight_id"]: r["approach_analysis"]
        for r in sinks.read_table(spark, path).collect()
    }
    assert got == {1: 1, 2: 0}
