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


def test_commit_analysis_crash_recovery(spark, tmp_path):
    """Coupled S6+S7 commit: a crash between the results upsert and
    the status flip must replay to exactly the committed state, and a
    committed batch must be skipped on re-run."""
    results = str(tmp_path / "approaches")
    status = str(tmp_path / "flight_analyses")
    txn = str(tmp_path / "txn")
    sinks.create_table(
        spark.createDataFrame(
            [{"flight_id": 0, "approach_id": 0, "landing_type": "seed"}]
        ),
        results, keys=["flight_id", "approach_id"], n_buckets=4,
    )
    sinks.create_table(
        spark.createDataFrame(
            [{"flight_id": f, "approach_analysis": 0} for f in (0, 1, 2)]
        ),
        status, keys=["flight_id"], n_buckets=4,
    )
    batch = spark.createDataFrame(
        [
            {"flight_id": 1, "approach_id": 1, "landing_type": "go-around"},
            {"flight_id": 2, "approach_id": 1, "landing_type": "stop-and-go"},
        ]
    )
    # simulate a crash AFTER S6 but BEFORE S7: only the upsert ran
    sinks.upsert(spark, batch, results, keys=["flight_id", "approach_id"], n_buckets=4)
    st = {r["flight_id"]: r["approach_analysis"]
          for r in sinks.read_table(spark, status).collect()}
    assert st == {0: 0, 1: 0, 2: 0}  # status not flipped yet -> re-queued

    # the work queue re-emits flights 1,2; the replayed batch commits
    txn_id = sinks.commit_analysis(spark, batch, results, status, txn)
    assert sinks.is_committed(txn, txn_id)
    # multiset compare: a mis-bucketed upsert DUPLICATES rows, which a
    # dict comprehension would silently collapse
    rows = sorted((r["flight_id"], r["approach_id"], r["landing_type"])
                  for r in sinks.read_table(spark, results).collect())
    assert rows == [(0, 0, "seed"), (1, 1, "go-around"), (2, 1, "stop-and-go")]
    st = sorted((r["flight_id"], r["approach_analysis"])
                for r in sinks.read_table(spark, status).collect())
    assert st == [(0, 0), (1, 1), (2, 1)]

    # committed batch: re-run is a pure no-op (manifest short-circuit)
    assert sinks.commit_analysis(spark, batch, results, status, txn) == txn_id
    assert sorted((r["flight_id"], r["approach_id"], r["landing_type"])
                  for r in sinks.read_table(spark, results).collect()) == rows


def test_write_layout_prunes_partitions_and_pushes_sort_col(spark, tmp_path):
    """write_layout: the partition column prunes at planning time
    (PartitionFilters) and the sorted fine column reaches the scan as
    a pushed filter over clustered row groups."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from ngafid_cpat_spark import sinks
    from ngafid_cpat_spark.sources import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "layout")
    sinks.write_layout(ev, path, ["event_type"], ["ts"])

    back = spark.read.parquet(path)
    probe = back.filter(
        (F.col("event_type") == "click")
        & (F.col("value") > 50)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan and "event_type" in plan
    assert "PushedFilters: [" in plan and "value" in plan

    # content-preserving: same rows per type as the source
    want = dict(
        ev.groupBy("event_type").count().collect()
    )
    got = dict(back.groupBy("event_type").count().collect())
    assert {r[0]: r[1] for r in want.items()} == {r[0]: r[1] for r in got.items()}

    # one file per partition directory at this size (the repartition
    # keeps file count O(partitions))
    import glob

    for d in glob.glob(f"{path}/event_type=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_z_key_matches_python_interleave(spark):
    """z_key == reference bit interleave for random bucket pairs, and
    ordering by it groups quadrants (the row-group-pruning property)."""
    import random

    from ngafid_cpat_spark.sinks import z_key

    rnd = random.Random(7)
    rows = [
        {"a": rnd.randrange(0, 1 << 16), "b": rnd.randrange(0, 1 << 16)}
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows)
    got = {(r["a"], r["b"]): r["z"] for r in df.withColumn("z", z_key("a", "b")).collect()}

    def interleave(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(r["a"], r["b"]): interleave(r["a"], r["b"]) for r in rows}
    # quadrant property: the top interleaved bit pair = the two
    # coordinates' top bits, so sorting by z never mixes quadrants
    for (a, b), z in got.items():
        assert (z >> 31) & 1 == (b >> 15) & 1
        assert (z >> 30) & 1 == (a >> 15) & 1
