"""Storage-layout scale tests: date-partitioned writes prune at the
scan; streaming foreachBatch drives the idempotent upsert sink
(SURVEY §7 step 6/8)."""

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ngafid_cpat_spark import sinks
from ngafid_cpat_spark.sources import load
from ngafid_cpat_spark.streaming import sessions as ST

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    """Writing events partitioned by event date makes a date filter a
    directory prune (PartitionFilters), not a data filter — the 100 TB
    layout where a day's query touches a day's files."""
    path = str(tmp_path / "events_by_day")
    ev = load(spark, SF_DIR, "events")
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-05")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[(?!\])", plan)
    assert m, plan
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert back.count() == want > 0


def test_streaming_foreach_batch_upsert(spark, tmp_path, tmp_path_factory):
    """Stream -> foreachBatch -> sinks.upsert: per-user running event
    counts land in the upsert table; re-running the stream from
    scratch converges to the same table (idempotent restart)."""
    import shutil

    src = tmp_path_factory.mktemp("ev_stream_fb")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    table = str(tmp_path / "user_counts")

    base = spark.createDataFrame([], "user_id long, n_events long")
    sinks.create_table(base, table, keys=["user_id"], n_buckets=4)

    def run_once():
        stream = ST.read_events_stream(spark, str(src))
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))

        def write_batch(batch_df, batch_id):
            sinks.upsert(
                batch_df.sparkSession, batch_df, table,
                keys=["user_id"], n_buckets=4,
            )

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(write_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = {
        r["user_id"]: r["n_events"]
        for r in sinks.read_table(spark, table).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

    run_once()  # restart from scratch -> same table (idempotent)
    again = {
        r["user_id"]: r["n_events"]
        for r in sinks.read_table(spark, table).collect()
    }
    assert again == want
