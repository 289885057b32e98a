"""Structured Streaming tests: the streaming plans must agree with
their batch twins on the same (complete) data."""

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.sources import load
from ngafid_cpat_spark.streaming import sessions as ST
from ngafid_cpat_spark.streaming import stateful as SS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    # the streaming file source needs a directory, not a single file
    d = tmp_path_factory.mktemp("events_stream")
    import shutil

    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return ST.read_events_stream(spark, str(d))


def test_windowed_counts_matches_batch(spark, stream):
    ST.run_to_memory(ST.windowed_counts(stream), "wc_test", mode="append")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM wc_test").collect()
    }
    batch = load(spark, SF_DIR, "events")
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
        .collect()
    }
    # append mode withholds windows past the final watermark; everything
    # emitted must match the batch result exactly, and coverage must be
    # substantial
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= 0.8 * len(want)


def test_sliding_window_counts(spark, stream):
    """Sliding windows: every event lands in window_size/slide
    windows; totals across windows = 2x event count for 1h/30m."""
    ST.run_to_memory(
        ST.windowed_counts(stream, window="1 hour", slide="30 minutes"),
        "slide_test",
    )
    rows = spark.sql("SELECT * FROM slide_test").collect()
    assert rows
    total_batch = load(spark, SF_DIR, "events").count()
    emitted = sum(r["n"] for r in rows)
    # append mode may withhold the trailing watermark windows
    assert 1.5 * total_batch <= emitted <= 2 * total_batch


def test_session_aggregates_runs_and_is_sane(spark, stream):
    ST.run_to_memory(ST.session_aggregates(stream, gap="1 hour"), "sess_test")
    rows = spark.sql("SELECT * FROM sess_test").collect()
    assert rows
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_dedup_stream_drops_duplicates(spark, stream):
    ST.run_to_memory(ST.dedup_stream(stream), "dedup_test")
    n = spark.sql("SELECT count(*) AS n FROM dedup_test").first()["n"]
    distinct_ids = (
        load(spark, SF_DIR, "events").select("event_id").distinct().count()
    )
    assert n == distinct_ids


def test_stateful_closed_sessions_matches_batch(spark, stream):
    """applyInPandasWithState sessionizer: every emitted CLOSED
    session must exactly match a batch-sessionize session (the open
    tail sessions stay in state and are not emitted)."""
    from ngafid_cpat_spark.operators import windows as OW
    from ngafid_cpat_spark.streaming import stateful as SS

    ST.run_to_memory(
        SS.closed_sessions(stream, gap_seconds=3600.0, use_timeout=False),
        "closed_test",
    )
    got = {
        (r["user_id"], round(r["session_start_s"], 3)): (
            r["n_events"],
            round(r["sum_value"], 2),
        )
        for r in spark.sql("SELECT * FROM closed_test").collect()
    }
    assert got  # at least some sessions closed over 30 days of data

    ev = load(spark, SF_DIR, "events")
    batch = (
        OW.sessionize(ev, "user_id", "ts", 3600.0)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("double")).alias("start_s"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sv"),
        )
    )
    want = {
        (r["user_id"], round(r["start_s"], 3)): (r["n"], r["sv"])
        for r in batch.collect()
    }
    for k, v in got.items():
        assert want[k] == v


def test_stream_stream_join_matches_batch(spark, stream):
    """Stream-stream interval join == the same join run in batch."""
    ST.run_to_memory(
        ST.stream_stream_click_purchase(stream), "ssj_test", mode="append"
    )
    got = {
        (r["event_id"], r["click_ts"]) for r in spark.sql("SELECT * FROM ssj_test").collect()
    }
    ev = load(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    want = {
        (r["event_id"], r["click_ts"])
        for r in purchases.join(
            clicks,
            (purchases.user_id == clicks.c_user_id)
            & (clicks.click_ts >= purchases.ts - F.expr("INTERVAL 1 hour"))
            & (clicks.click_ts < purchases.ts),
        ).collect()
    }
    assert got, "stream-stream join emitted nothing"
    assert got.issubset(want)
    # append mode withholds rows near the final watermark only
    assert len(got) >= 0.8 * len(want)


def test_stream_static_join_matches_batch(spark, stream):
    """Stream-static broadcast enrichment returns exactly the batch
    join: the static dim is joined per micro-batch, statelessly."""
    dim = load(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ST.run_to_memory(agg, "ss_join_test", mode="complete")
    got = {
        r["segment"]: r["n"]
        for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }
    ev = load(spark, SF_DIR, "events")
    want = {
        r["segment"]: r["n"]
        for r in ev.join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(want) > 1


def test_stream_stream_left_outer_eviction(spark, stream):
    """Left-outer stream-stream join: inner rows match the batch join
    exactly; null-augmented rows appear ONLY for matchless purchases,
    and every matchless purchase older than the eviction frontier
    (final watermark minus the join window) has been emitted — the
    watermark-eviction contract, asserted, not assumed."""
    import datetime

    ST.run_to_memory(
        ST.stream_stream_click_purchase(stream, how="left_outer"),
        "ssj_outer_test",
        mode="append",
    )
    rows = spark.sql("SELECT * FROM ssj_outer_test").collect()
    got_inner = {(r["event_id"], r["click_ts"]) for r in rows if r["click_ts"] is not None}
    got_null = {r["event_id"] for r in rows if r["click_ts"] is None}

    ev = load(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user_id)
        & (clicks.click_ts >= purchases.ts - F.expr("INTERVAL 1 hour"))
        & (clicks.click_ts < purchases.ts),
        "left_outer",
    )
    want_inner = {
        (r["event_id"], r["click_ts"])
        for r in joined.filter(F.col("click_ts").isNotNull()).collect()
    }
    want_null = {
        r["event_id"]: r["ts"]
        for r in joined.filter(F.col("click_ts").isNull()).collect()
    }
    # inner rows: emitted eagerly, identical to inner mode vs batch
    assert got_inner and got_inner.issubset(want_inner)
    assert len(got_inner) >= 0.8 * len(want_inner)
    # precision: every null-augmented row is a genuinely matchless purchase
    assert got_null and got_null.issubset(set(want_null))
    # eviction: matchless purchases whose whole join window sits below
    # the final watermark MUST have been emitted with NULL. The
    # watermark that evicts purchase state is the CLICK side's (a
    # purchase can null-emit only once no qualifying click can still
    # arrive): final click watermark = max click ts - 2h delay; minus
    # a 1h slack for the join-window arithmetic
    max_click_ts = (
        ev.filter(F.col("event_type") == "click").agg(F.max("ts")).first()[0]
    )
    frontier = max_click_ts - datetime.timedelta(hours=3)
    overdue = {eid for eid, ts in want_null.items() if ts < frontier}
    assert overdue, "fixture too small to exercise eviction"
    assert overdue.issubset(got_null)


def test_rocksdb_state_store_runs_and_matches(spark, stream):
    """use_rocksdb_state: the same sessionization query runs on the
    RocksDB state store provider and produces the same result as the
    default heap provider (config-only switch, per-query)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    ST.use_rocksdb_state(spark)
    try:
        assert "RocksDB" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        ST.run_to_memory(
            ST.session_aggregates(stream), "rocks_sess_test", mode="append"
        )
        got = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM rocks_sess_test").collect()
        }
        assert got  # the provider actually ran a stateful query
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    # parity with the default provider on the same data
    ST.run_to_memory(
        ST.session_aggregates(stream), "heap_sess_test", mode="append"
    )
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM heap_sess_test").collect()
    }
    assert got == want


def test_running_user_totals_matches_batch(spark, stream):
    """transformWithStateInPandas per-user running totals. Where the
    transformWithState Python runtime (protobuf) is installed: the
    final update-mode emission per user in a bounded availableNow
    replay equals the batch aggregate. Where it is NOT (this
    container): the operator is a documented capability-gated extra
    (COVERAGE.md §2.9) and the test's contract is the GATE itself —
    the processor logic must still build (its unit behavior is
    exercised below without the streaming runner), and the operator
    must raise the named error instead of crashing the stream at
    worker init. Both branches are full assertions, not skips."""
    if not SS.has_transform_with_state_runtime():
        with pytest.raises(RuntimeError, match="protobuf"):
            SS.running_user_totals(stream)
        # the processor class itself is runtime-independent: its
        # handleInputRows math (cumulative cents/count merge) is the
        # part this environment CAN verify, against a fake state
        import pandas as pd

        proc = SS._make_running_totals()

        class _FakeValueState:
            def __init__(self):
                self._v = None

            def exists(self):
                return self._v is not None

            def get(self):
                return self._v

            def update(self, v):
                self._v = tuple(v)

        class _FakeHandle:
            def getValueState(self, name, schema):
                return _FakeValueState()

        proc.init(_FakeHandle())
        out1 = list(
            proc.handleInputRows(
                (7,),
                iter([pd.DataFrame({"user_id": [7, 7], "cents": [100, 250]})]),
                None,
            )
        )
        out2 = list(
            proc.handleInputRows(
                (7,),
                iter([pd.DataFrame({"user_id": [7], "cents": [50]})]),
                None,
            )
        )
        assert out1[0].iloc[0].tolist() == [7, 2, 350]
        assert out2[0].iloc[0].tolist() == [7, 3, 400]
        return
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ST.run_to_memory(
            SS.running_user_totals(stream), "tws_totals_test", mode="update"
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = {
        r["user_id"]: (r["n_events"], r["sum_cents"])
        for r in spark.sql(
            "SELECT * FROM tws_totals_test"
        ).collect()
    }
    exact = {
        r["user_id"]: (r["n"], r["cents"])
        for r in (
            load(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                    "cents"
                ),
            )
            .collect()
        )
    }
    assert got == exact


def test_stream_ivfpq_ingest_converges_to_batch_index(spark, tmp_path):
    """The stream-ingested codes store must yield EXACTLY the search
    results of the batch-written index built with the same trained
    quantizers — the convergence contract of stream_ivfpq_ingest —
    and a checkpoint replay must be a no-op (idempotent epochs)."""
    from ngafid_cpat_spark.operators import similarity as S
    from ngafid_cpat_spark.streaming.foreach_batch import stream_ivfpq_ingest

    emb = load(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    batch_idx = str(tmp_path / "batch_idx")
    meta = S.write_ivfpq_index(
        emb, batch_idx, k_coarse=4, m=4, k_sub=8, n_iter=1
    )
    src = str(tmp_path / "stream_src")
    emb.coalesce(1).write.mode("overwrite").parquet(src)
    codes = str(tmp_path / "stream_codes")
    ckpt = str(tmp_path / "stream_ckpt")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stream_ivfpq_ingest(stream, meta, codes, ckpt, query_name="sii_test")

    def probe(path):
        return S.ivfpq_topk_indexed(
            spark, path, q_vec, k=10, n_probe=2, rerank=50,
            emb=emb, meta=meta, exclude_id=0,
        ).collect()

    got, want = probe(codes), probe(batch_idx)
    assert got == want and len(got) == 10
    # stored codes identical row-for-row (not just search-equivalent)
    stream_rows = sorted(
        (r["vec_id"], tuple(r["codes"]), round(r["norm"], 9),
         int(r["centroid_id"]))
        for r in spark.read.parquet(codes).collect()
    )
    batch_rows = sorted(
        (r["vec_id"], tuple(r["codes"]), round(r["norm"], 9),
         int(r["centroid_id"]))
        for r in spark.read.parquet(batch_idx).collect()
    )
    assert stream_rows == batch_rows
    # replay over the existing checkpoint: no new batch dirs, same rows
    import os

    before = sorted(d for d in os.listdir(codes) if d.startswith("batch="))
    stream2 = spark.readStream.schema(schema).parquet(src)
    stream_ivfpq_ingest(stream2, meta, codes, ckpt, query_name="sii_test2")
    after = sorted(d for d in os.listdir(codes) if d.startswith("batch="))
    assert before == after
    assert probe(codes) == want


def test_compact_ivfpq_index_folds_stream_into_new_generation(spark, tmp_path):
    """Compaction: base index + stream batches -> one fresh
    generation where stream rows supersede base rows per vec_id,
    exactly one row per id survives, the cell-partitioned layout and
    quantizer sidecar carry over, and a probe against the compacted
    generation reflects the updated vectors."""
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.operators import similarity as S
    from ngafid_cpat_spark.streaming.foreach_batch import stream_ivfpq_ingest

    emb = load(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    base_idx = str(tmp_path / "base_idx")
    meta = S.write_ivfpq_index(emb, base_idx, k_coarse=4, m=4, k_sub=8,
                               n_iter=1)
    # "updated" vectors: ids 1..20 re-ingested with vec 0's embedding
    q0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    upd = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= 20)
    ).select("vec_id", F.lit([float(x) for x in q0]).alias("embedding"))
    src = str(tmp_path / "upd_src")
    upd.coalesce(1).write.mode("overwrite").parquet(src)
    stream_codes = str(tmp_path / "stream_codes")
    schema = spark.read.parquet(src).schema
    stream_ivfpq_ingest(
        spark.readStream.schema(schema).parquet(src),
        meta, stream_codes, str(tmp_path / "ck"), query_name="civ_test",
    )
    dest = str(tmp_path / "gen2")
    S.compact_ivfpq_index(spark, base_idx, stream_codes, dest)

    compacted = spark.read.parquet(dest)
    n_base = spark.read.parquet(base_idx).count()
    assert compacted.count() == n_base  # updates replace, never add
    assert compacted.groupBy("vec_id").count().filter(
        F.col("count") > 1
    ).count() == 0
    # the 20 updated ids now carry vec 0's codes
    c0 = compacted.filter(F.col("vec_id") == 0).collect()[0]["codes"]
    for r in compacted.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= 20)
    ).collect():
        assert list(r["codes"]) == list(c0)
    # probe works against the new generation with the carried meta
    got = S.ivfpq_topk_indexed(
        spark, dest, [float(x) for x in q0], k=10, n_probe=2,
        rerank=None, exclude_id=0,
    ).collect()
    assert len(got) == 10
    # the updated ids dominate the ADC ranking for q0's direction
    top_ids = {r["vec_id"] for r in got}
    assert len(top_ids & set(range(1, 21))) >= 8


def test_compact_ivfpq_index_with_empty_stream_copies_base(spark, tmp_path):
    """A fresh (batch-less) stream store must compact to a copy of
    the base generation, not crash on schema inference."""
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.operators import similarity as S

    emb = load(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    base = str(tmp_path / "b")
    S.write_ivfpq_index(emb, base, k_coarse=4, m=4, k_sub=4, n_iter=1)
    empty_stream = str(tmp_path / "s")  # never created
    dest = str(tmp_path / "g2")
    S.compact_ivfpq_index(spark, base, empty_stream, dest)
    a = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(base).collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(dest).collect()
    )
    assert a == b


def test_stream_incremental_dedup_matches_batch_twin_and_replays(
    spark, tmp_path
):
    """stream_incremental_dedup over id-monotonic micro-batches must
    converge to the ONE-SHOT batch dedup of all arrivals against the
    same fingerprint history (incremental_dedup), with the
    cross-batch duplicate dropped only because the fingerprint
    history GREW as batch 1 committed; a checkpoint replay emits
    nothing and leaves the identical keepers store."""
    import os

    from ngafid_cpat_spark.operators import corpus as C
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_incremental_dedup,
    )

    hist = spark.createDataFrame(
        [(100, "old corpus doc"), (101, "another history doc")],
        "doc_id long, text string",
    )
    # batch 1: one fresh doc, one re-crawl of history (must drop)
    b1 = spark.createDataFrame(
        [(1, "fresh one"), (2, "old corpus doc")],
        "doc_id long, text string",
    )
    # batch 2: one fresh doc, a re-crawl of batch 1's keeper (must
    # drop via the GROWN history), and a within-batch dup pair
    b2 = spark.createDataFrame(
        [(10, "fresh two"), (11, "fresh one"), (12, "twin"), (13, "twin")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    for name, df, mtime in (
        ("a0.parquet", b1, 1_000_000_000),
        ("a1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        import shutil

        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))
    hist_fp = str(tmp_path / "hist_fp")
    C.incremental_dedup(hist, hist.limit(0)).select("fp").write.parquet(
        hist_fp
    )
    keepers = str(tmp_path / "keepers")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(os.path.join(src, "a0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_incremental_dedup(stream, hist_fp, keepers, ckpt,
                             query_name="sid_test")

    got = {
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(keepers).select("doc_id", "fp").collect()
    }
    want = {
        (r["doc_id"], r["fp"])
        for r in C.incremental_dedup(
            b1.unionByName(b2), history_fp=spark.read.parquet(hist_fp)
        ).collect()
    }
    assert got == want
    assert {d for d, _ in got} == {1, 10, 12}  # 2,11,13 all dropped
    # two micro-batches actually ran (maxFilesPerTrigger honored)
    dirs = sorted(
        d for d in os.listdir(keepers) if d.startswith("batch=")
    )
    assert len(dirs) == 2
    # replay: no new batch dirs, identical contents
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_incremental_dedup(stream2, hist_fp, keepers, ckpt,
                             query_name="sid_test2")
    assert sorted(
        d for d in os.listdir(keepers) if d.startswith("batch=")
    ) == dirs
    got2 = {
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(keepers).select("doc_id", "fp").collect()
    }
    assert got2 == got


def test_streaming_approach_work_queue_equals_batch_pipeline(spark):
    """The streaming work-queue twin (whole-flight micro-batches ->
    analyze -> MERGE) must converge to approach_pipeline_demo's batch
    output EXACTLY — every column, every float bit (analyze()
    partitions all stages by flight, so per-flight results are
    membership-independent)."""
    from ngafid_cpat_spark.plans.queries import QUERIES

    got = QUERIES["streaming_approach_work_queue"](spark, SF_DIR)
    want = QUERIES["approach_pipeline_demo"](spark, SF_DIR)
    assert got.columns == want.columns
    key = lambda r: (r["flight_id"], r["approach_id"])
    grows = sorted(got.collect(), key=key)
    wrows = sorted(want.collect(), key=key)
    assert grows == wrows and len(grows) > 0


def test_stream_incremental_minhash_dedup_growth_and_replay(spark, tmp_path):
    """The MinHash streaming dedup drops a batch-2 NEAR-dup of a
    batch-1 keeper ONLY because the signature history grew when
    batch 1 committed (the corpus signature table alone would not
    match it); replaying the checkpoint adds no batch dirs and leaves
    identical keepers."""
    import os
    import shutil

    from ngafid_cpat_spark.operators import dedup as D
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_incremental_minhash_dedup,
    )

    base_text = ("the quick brown fox jumps over the lazy dog near the "
                 "old barn by the river bank at dawn")
    hist = spark.createDataFrame(
        [(100, "an entirely different corpus document about query "
               "engines and distributed execution plans")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(1, base_text), (2, "short")], "doc_id long, text string"
    )
    # 11 is a NEAR-dup of batch-1 keeper 1 (one appended token);
    # 12 matches history; 13 is novel
    b2 = spark.createDataFrame(
        [(11, base_text + " tonight"),
         (12, "an entirely different corpus document about query "
              "engines and distributed execution plans indeed"),
         (13, "completely novel content with no overlap whatsoever "
              "to anything seen before")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    for name, df, mtime in (
        ("a0.parquet", b1, 1_000_000_000),
        ("a1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))
    hist_sig = str(tmp_path / "hist_sig")
    D.minhash_sig_table(hist).write.parquet(hist_sig)
    keepers = str(tmp_path / "keepers")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(os.path.join(src, "a0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_incremental_minhash_dedup(
        stream, hist_sig, keepers, ckpt,
        query_name="simh_test", verify_threshold=0.3,
    )
    kept = {
        r["doc_id"] for r in spark.read.parquet(keepers).collect()
    }
    # 1 kept (novel vs hist); 2 kept (sub-shingle); 11 DROPPED via the
    # grown history (near-dup of keeper 1); 12 dropped via hist;
    # 13 kept
    assert kept == {1, 2, 13}
    # the drop of 11 is genuinely growth: vs the corpus table alone
    # it would have been kept
    alone = {
        r["doc_id"]
        for r in D.incremental_minhash_dedup(
            b2, history=hist, verify_threshold=0.3
        ).collect()
    }
    assert 11 in alone
    dirs = sorted(d for d in os.listdir(keepers) if d.startswith("batch="))
    assert len(dirs) == 2
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_incremental_minhash_dedup(
        stream2, hist_sig, keepers, ckpt,
        query_name="simh_test2", verify_threshold=0.3,
    )
    assert sorted(
        d for d in os.listdir(keepers) if d.startswith("batch=")
    ) == dirs
    assert {
        r["doc_id"] for r in spark.read.parquet(keepers).collect()
    } == kept


def test_stream_incremental_cc_converges_and_replays(spark, tmp_path):
    """stream_incremental_cc over two micro-batches must converge to
    the one-shot batch fold of all arrival edges into the seeded
    labeling (min-label merging is confluent), and a checkpoint
    replay over a fresh checkpoint dir re-reads pre-epoch generations
    and leaves identical labels."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.graphs import (
        incremental_connected_components,
    )
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_incremental_cc,
    )

    seed = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4)], "user_id long, cluster_id long"
    )
    b1 = spark.createDataFrame([(2, 3), (7, 7)], "u long, v long")
    b2 = spark.createDataFrame([(3, 4), (7, 8)], "u long, v long")

    src = str(tmp_path / "edges")
    os.makedirs(src)
    for name, df, mtime in (
        ("e0.parquet", b1, 1_000_000_000),
        ("e1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    labels_root = str(tmp_path / "labels")
    seed.write.parquet(os.path.join(labels_root, "gen-0"))
    schema = spark.read.parquet(os.path.join(src, "e0.parquet")).schema

    def _run(ckpt_name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_incremental_cc(
            stream, labels_root, str(tmp_path / ckpt_name),
            query_name=f"cc_{ckpt_name}", id_col="user_id",
        )

    _run("ckpt1")
    gens = sorted(
        int(d.split("-")[1]) for d in os.listdir(labels_root)
        if d.startswith("gen-")
    )
    assert gens == [0, 1, 2]
    got = {
        (r.user_id, r.cluster_id)
        for r in spark.read.parquet(f"{labels_root}/gen-2").collect()
    }
    want = {
        (r.user_id, r.cluster_id)
        for r in incremental_connected_components(
            seed, b1.unionByName(b2), id_col="user_id", src_col="u",
            dst_col="v",
        ).collect()
    }
    assert got == want
    # 1-2-3-4 merged via the two batches; 7-8 is a new component
    assert want == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (8, 7)}

    # fresh-checkpoint replay: both epochs re-run against their
    # pre-epoch generations and rewrite identical labels
    _run("ckpt2")
    again = {
        (r.user_id, r.cluster_id)
        for r in spark.read.parquet(f"{labels_root}/gen-2").collect()
    }
    assert again == got


def test_stream_incremental_dsir_epoch_counts_and_replay(spark, tmp_path):
    """stream_incremental_dsir: each epoch's scores must reflect the
    count table THROUGH that epoch (epoch 1 = batch-1 distribution,
    epoch 2 = both batches), the drained count store must equal the
    all-at-once counts, and a fresh-checkpoint replay rewrites
    byte-identical generations and scores."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.corpus import dsir_gram_buckets
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_incremental_dsir,
    )

    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma", True), (2, "alpha beta", False)],
        "doc_id long, text string, _t boolean",
    )
    b2 = spark.createDataFrame(
        [(3, "alpha beta gamma", True), (4, "delta epsilon", False)],
        "doc_id long, text string, _t boolean",
    )

    src = str(tmp_path / "docs")
    os.makedirs(src)
    for name, df, mtime in (
        ("d0.parquet", b1, 1_000_000_000),
        ("d1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    counts_root = str(tmp_path / "counts")
    scores_root = str(tmp_path / "scores")
    spark.createDataFrame([], "b bigint, r bigint, t bigint").write.parquet(
        os.path.join(counts_root, "gen-0")
    )
    schema = spark.read.parquet(os.path.join(src, "d0.parquet")).schema

    def _run(ckpt_name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_incremental_dsir(
            stream, counts_root, scores_root,
            str(tmp_path / ckpt_name),
            query_name=f"dsir_{ckpt_name}", n_buckets=64,
        )

    def _py_expected():
        # pure-python replay of the contract
        from pyspark.sql import functions as F  # noqa: F401

        def feats(df):
            return {
                (r["doc_id"], r["b"])
                for r in dsir_gram_buckets(
                    df, extra_cols=("_t",), n_buckets=64
                ).collect()
            }

        # counts via collected gram rows (with multiplicity)
        def gram_rows(df):
            return [
                (r["doc_id"], r["b"], r["_t"])
                for r in dsir_gram_buckets(
                    df, extra_cols=("_t",), n_buckets=64
                ).collect()
            ]

        rows1 = gram_rows(b1)
        rows12 = gram_rows(b1.unionByName(b2))

        def weights(rows):
            from collections import Counter

            r = Counter(b for _, b, _ in rows)
            t = Counter(b for _, b, tt in rows if tt)
            return {b: ((t[b] + 1) * 1_000_000) // (r[b] + 64) for b in r}

        def scores(rows, w, ids):
            from collections import defaultdict

            acc, cnt = defaultdict(int), defaultdict(int)
            for did, b, _ in rows:
                if did in ids:
                    acc[did] += w[b]
                    cnt[did] += 1
            return {d: acc[d] // cnt[d] for d in acc}

        out = scores(rows1, weights(rows1), {1, 2})
        out.update(scores(rows12, weights(rows12), {3, 4}))
        return out

    _run("ckpt1")
    got = {}
    for ep in ("epoch-1", "epoch-2"):
        for r in spark.read.parquet(f"{scores_root}/{ep}").collect():
            got[r["doc_id"]] = r["w_avg"]
    assert got == _py_expected()

    # the drained count store equals all-at-once counts
    final = {
        (r["b"]): (r["r"], r["t"])
        for r in spark.read.parquet(f"{counts_root}/gen-2").collect()
    }
    allc = {}
    for r in dsir_gram_buckets(
        b1.unionByName(b2), extra_cols=("_t",), n_buckets=64
    ).collect():
        rr, tt = allc.get(r["b"], (0, 0))
        allc[r["b"]] = (rr + 1, tt + (1 if r["_t"] else 0))
    assert final == allc

    _run("ckpt2")  # fresh-checkpoint replay: identical outputs
    again = {}
    for ep in ("epoch-1", "epoch-2"):
        for r in spark.read.parquet(f"{scores_root}/{ep}").collect():
            again[r["doc_id"]] = r["w_avg"]
    assert again == got


def test_stream_cms_merge_equals_batch_and_replays(spark, tmp_path):
    """stream_cms: the drained counter store is bit-identical to the
    all-at-once sketch (CMS mergeability), and a fresh-checkpoint
    replay rewrites identical generations."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.mining import cms_build
    from ngafid_cpat_spark.streaming.foreach_batch import stream_cms

    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "beta beta delta")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "alpha epsilon"), (4, "gamma gamma gamma zeta")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    for name, df, mtime in (
        ("d0.parquet", b1, 1_000_000_000),
        ("d1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    root = str(tmp_path / "sketch")
    spark.createDataFrame([], "j int, c bigint, cnt bigint").write.parquet(
        os.path.join(root, "gen-0")
    )
    schema = spark.read.parquet(os.path.join(src, "d0.parquet")).schema

    def _run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_cms(stream, root, str(tmp_path / ck),
                   query_name=f"cms_{ck}", depth=4, width=32)

    _run("ck1")
    drained = {
        (r["j"], r["c"]): r["cnt"]
        for r in spark.read.parquet(f"{root}/gen-2").collect()
    }
    toks = b1.unionByName(b2).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    batch = {
        (r["j"], r["c"]): r["cnt"]
        for r in cms_build(toks, "token", depth=4, width=32).collect()
    }
    assert drained == batch
    _run("ck2")
    again = {
        (r["j"], r["c"]): r["cnt"]
        for r in spark.read.parquet(f"{root}/gen-2").collect()
    }
    assert again == drained


def test_stream_hll_merge_equals_batch_and_replays(spark, tmp_path):
    """stream_hll: the drained register store is bit-identical to
    the one-pass register build (HLL mergeability: union = register
    max), and a fresh-checkpoint replay rewrites identical
    generations."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.mining import hll_registers
    from ngafid_cpat_spark.streaming.foreach_batch import stream_hll

    b1 = spark.createDataFrame(
        [("a", i) for i in range(40)] + [("b", i) for i in range(10)],
        "g string, k long",
    )
    b2 = spark.createDataFrame(
        [("a", i) for i in range(20, 60)] + [("b", i) for i in range(5)],
        "g string, k long",
    )
    src = str(tmp_path / "rows")
    os.makedirs(src)
    for name, df, mtime in (
        ("r0.parquet", b1, 1_000_000_000),
        ("r1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    root = str(tmp_path / "store")
    spark.createDataFrame([], "g string, j int, rho int").write.parquet(
        os.path.join(root, "gen-0")
    )
    schema = spark.read.parquet(os.path.join(src, "r0.parquet")).schema

    def _run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_hll(
            stream, root, str(tmp_path / ck),
            group_cols=["g"], item_col="k", query_name=f"hll_{ck}",
        )

    _run("ck1")
    drained = sorted(
        map(tuple, spark.read.parquet(os.path.join(root, "gen-2")).collect())
    )
    batch = sorted(
        map(
            tuple,
            hll_registers(b1.unionByName(b2), ["g"], "k").collect(),
        )
    )
    assert drained == batch
    # fresh-checkpoint replay folds the same files onto the same
    # seed: generations must come out identical
    _run("ck2")
    again = sorted(
        map(tuple, spark.read.parquet(os.path.join(root, "gen-2")).collect())
    )
    assert again == drained


def test_stream_bm25_store_equals_batch_and_replays(spark, tmp_path):
    """stream_bm25: the drained postings/doclen store is
    row-identical to the one-pass statistics (disjoint doc batches
    union-merge), and a fresh-checkpoint replay rewrites identical
    generations."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ngafid_cpat_spark.functions import text as T
    from ngafid_cpat_spark.streaming.foreach_batch import stream_bm25

    terms = ["alpha", "beta"]
    b1 = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "delta alpha")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "beta beta beta"), (4, "gamma delta")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    for name, df, mtime in (
        ("d0.parquet", b1, 1_000_000_000),
        ("d1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    root = str(tmp_path / "store")
    spark.createDataFrame(
        [], "doc_id bigint, term string, tf bigint"
    ).write.parquet(os.path.join(root, "gen-0", "postings"))
    spark.createDataFrame(
        [], "doc_id bigint, dl bigint"
    ).write.parquet(os.path.join(root, "gen-0", "doclen"))
    schema = spark.read.parquet(os.path.join(src, "d0.parquet")).schema

    def _run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_bm25(
            stream, root, str(tmp_path / ck),
            query_terms=terms, query_name=f"bm25_{ck}",
        )

    _run("ck1")
    both = b1.unionByName(b2)
    toks = both.select(
        "doc_id", F.explode(T.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    want_tf = sorted(
        map(
            tuple,
            toks.filter(F.col("term").isin(terms))
            .groupBy("doc_id", "term")
            .count()
            .collect(),
        )
    )
    want_dl = sorted(
        map(tuple, toks.groupBy("doc_id").count().collect())
    )
    got_tf = sorted(
        map(
            tuple,
            spark.read.parquet(
                os.path.join(root, "gen-2", "postings")
            ).collect(),
        )
    )
    got_dl = sorted(
        map(
            tuple,
            spark.read.parquet(
                os.path.join(root, "gen-2", "doclen")
            ).collect(),
        )
    )
    assert got_tf == want_tf and got_dl == want_dl
    _run("ck2")
    again = sorted(
        map(
            tuple,
            spark.read.parquet(
                os.path.join(root, "gen-2", "postings")
            ).collect(),
        )
    )
    assert again == got_tf


def test_stream_weighted_sample_overlapping_batches_dedup(
    spark, tmp_path
):
    """r13 ADVICE closure: the merge law assumes disjoint batches —
    now ENFORCED. A doc_id replayed across two micro-batches must
    occupy at most one of the k store slots, and the drained store
    must still equal the one-pass batch sample over the DISTINCT
    rows."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.corpus import weighted_sample_wor
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_weighted_sample,
    )

    rows = [(i, 1 + i % 5) for i in range(1, 61)]
    full = spark.createDataFrame(rows, "doc_id long, w long")
    b1 = full.filter(F.col("doc_id") <= 40)
    b2 = full.filter(F.col("doc_id") >= 21)  # 21..40 arrive TWICE
    src = str(tmp_path / "rows")
    os.makedirs(src)
    for name, df, mtime in (
        ("r0.parquet", b1, 1_000_000_000),
        ("r1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    root = str(tmp_path / "store")
    spark.createDataFrame(
        [], "doc_id bigint, w bigint, es_key bigint"
    ).write.parquet(os.path.join(root, "gen-0"))
    schema = spark.read.parquet(os.path.join(src, "r0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_weighted_sample(
        stream, root, str(tmp_path / "ck"), k=10,
        query_name="es_overlap",
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(root, "gen-2")).collect(),
        )
    )
    ids = [g[0] for g in got]
    assert len(ids) == len(set(ids)) == 10
    want = sorted(
        (r["doc_id"], r["w"], r["es_key"])
        for r in weighted_sample_wor(full, k=10).collect()
    )
    assert got == want


def test_stream_weighted_sample_equals_batch_and_replays(spark, tmp_path):
    """stream_weighted_sample: the drained running top-k store is
    EXACTLY the one-pass E-S sample (top-k is union-mergeable over
    disjoint batches; keys are pure functions of (salt, id, w)),
    and a fresh-checkpoint replay rewrites identical generations."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.corpus import weighted_sample_wor
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_weighted_sample,
    )

    rows = [(i, 1 + i % 5) for i in range(1, 61)]
    full = spark.createDataFrame(rows, "doc_id long, w long")
    b1 = full.filter(F.col("doc_id") % 2 == 0)
    b2 = full.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "rows")
    os.makedirs(src)
    for name, df, mtime in (
        ("r0.parquet", b1, 1_000_000_000),
        ("r1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    root = str(tmp_path / "store")
    spark.createDataFrame(
        [], "doc_id bigint, w bigint, es_key bigint"
    ).write.parquet(os.path.join(root, "gen-0"))
    schema = spark.read.parquet(os.path.join(src, "r0.parquet")).schema

    def _run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_weighted_sample(
            stream, root, str(tmp_path / ck), k=10,
            query_name=f"es_{ck}",
        )

    _run("ck1")
    want = sorted(
        (r["doc_id"], r["w"], r["es_key"])
        for r in weighted_sample_wor(full, k=10).collect()
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(root, "gen-2")).collect(),
        )
    )
    assert got == want
    # intermediate generation holds batch-1's own top-10
    g1 = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(root, "gen-1")).collect(),
        )
    )
    want1 = sorted(
        (r["doc_id"], r["w"], r["es_key"])
        for r in weighted_sample_wor(b1, k=10).collect()
    )
    assert g1 == want1
    # fresh-checkpoint replay is a byte-identical no-op
    _run("ck2")
    got2 = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(root, "gen-2")).collect(),
        )
    )
    assert got2 == got


def test_stream_incremental_bfs_shortens_and_matches_batch(
    spark, tmp_path
):
    """stream_incremental_bfs (r14): a later batch that adds a
    shortcut edge must SHORTEN previously-settled distances (the
    insert-only relaxation lemma), late-arriving seeds must join the
    seed set, the drained store must equal from-scratch fixpoint BFS
    over the union of all edges, and a fresh-checkpoint replay must
    be a byte-identical no-op."""
    import os
    import shutil

    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_incremental_bfs,
    )

    b1 = [(0, 1), (1, 2), (2, 3), (3, 4)]        # chain from seed 0
    b2 = [(0, 4), (11, 12)]                      # shortcut + new seed
    src = str(tmp_path / "edges")
    os.makedirs(src)
    for name, rows, mtime in (
        ("e0.parquet", b1, 1_000_000_000),
        ("e1.parquet", b2, 1_000_000_100),
    ):
        df = spark.createDataFrame(rows, "u long, v long")
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    store = str(tmp_path / "dist")
    edges_root = str(tmp_path / "estore")
    spark.createDataFrame([], "node bigint, hop int").write.parquet(
        os.path.join(store, "gen-0")
    )
    schema = spark.read.parquet(os.path.join(src, "e0.parquet")).schema

    def _run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_incremental_bfs(
            stream, edges_root, store, str(tmp_path / ck),
            query_name=f"ibfs_{ck}",
        )

    _run("ck1")
    g1 = dict(
        (r["node"], r["hop"])
        for r in spark.read.parquet(os.path.join(store, "gen-1")).collect()
    )
    # after batch 1: plain chain distances from seed 0
    assert g1 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    g2 = dict(
        (r["node"], r["hop"])
        for r in spark.read.parquet(os.path.join(store, "gen-2")).collect()
    )
    # shortcut 0-4 pulls 4 to hop 1 and 3 to hop 2 (via 4); the
    # late component seeds at 11
    assert g2 == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 11: 0, 12: 1}

    # python from-scratch fixpoint replay over the union
    edges = b1 + b2
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {n: 0 for n in adj if n % 11 == 0}
    frontier = set(dist)
    while frontier:
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in dist or dist[m] > dist[n] + 1:
                    dist[m] = dist[n] + 1
                    nxt.add(m)
        frontier = nxt
    assert g2 == dist

    # replay with a fresh checkpoint: byte-identical no-op
    _run("ck2")
    g2b = dict(
        (r["node"], r["hop"])
        for r in spark.read.parquet(os.path.join(store, "gen-2")).collect()
    )
    assert g2b == g2


def test_stream_kn_bigrams_overlap_safe_equals_batch(spark, tmp_path):
    """stream_kn_bigrams (r14): the drained store's scorer equals
    the batch kneser_ney_score row-for-row, a document arriving in
    BOTH batches counts once (full-key dedup — the r13 E-S ADVICE
    lesson built in), and a fresh-checkpoint replay is a no-op."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.corpus import (
        kneser_ney_score,
        kneser_ney_score_from_counts,
    )
    from ngafid_cpat_spark.streaming.foreach_batch import stream_kn_bigrams

    rows = [
        (1, "san francisco is big and san francisco is old"),
        (2, "san jose is near san francisco"),
        (3, "the big city is old"),
        (4, "one two three one two"),
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    b1 = full.filter(F.col("doc_id") <= 3)
    b2 = full.filter(F.col("doc_id") >= 3)  # doc 3 arrives TWICE
    src = str(tmp_path / "docs")
    os.makedirs(src)
    for name, df, mtime in (
        ("d0.parquet", b1, 1_000_000_000),
        ("d1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [], "doc_id bigint, prev string, cur string, n bigint"
    ).write.parquet(os.path.join(store, "gen-0"))
    schema = spark.read.parquet(os.path.join(src, "d0.parquet")).schema

    def _run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_kn_bigrams(
            stream, store, str(tmp_path / ck), query_name=f"kn_{ck}"
        )

    _run("ck1")
    drained = spark.read.parquet(os.path.join(store, "gen-2"))
    # doc 3's rows appear exactly once despite arriving twice
    d3 = drained.filter(F.col("doc_id") == 3)
    assert (
        d3.count()
        == d3.dropDuplicates(["doc_id", "prev", "cur"]).count()
    )
    got = sorted(
        map(tuple, kneser_ney_score_from_counts(drained).collect())
    )
    want = sorted(map(tuple, kneser_ney_score(full).collect()))
    assert got == want and len(want) == 4
    _run("ck2")
    again = sorted(
        map(
            tuple,
            kneser_ney_score_from_counts(
                spark.read.parquet(os.path.join(store, "gen-2"))
            ).collect(),
        )
    )
    assert again == got


def test_stream_winnow_fingerprints_equals_batch(spark, tmp_path):
    """stream_winnow_fingerprints (r14): the drained per-batch
    fingerprint stores, fed through the shared match tail, equal the
    batch winnow_match_pairs row-for-row; a document arriving in
    BOTH batches counts once (the match tail's (id, fp) distinct
    makes per-document fingerprints overlap-safe by construction);
    and a fresh-checkpoint replay is a no-op."""
    import os
    import shutil

    from ngafid_cpat_spark.operators.dedup import (
        winnow_match_pairs,
        winnow_pairs_from_fps,
    )
    from ngafid_cpat_spark.streaming.foreach_batch import (
        stream_winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "xyzzy plugh " + shared + " quux"),
        (3, "totally unrelated filler content lives in here"),
        (4, "more " + shared + " padding text"),
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    b1 = full.filter(F.col("doc_id") <= 3)
    b2 = full.filter(F.col("doc_id") >= 3)  # doc 3 arrives TWICE
    src = str(tmp_path / "docs")
    os.makedirs(src)
    for name, df, mtime in (
        ("d0.parquet", b1, 1_000_000_000),
        ("d1.parquet", b2, 1_000_000_100),
    ):
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    store = str(tmp_path / "store")

    def _run(ck):
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_winnow_fingerprints(
            stream, store, str(tmp_path / ck), k=8, w=4,
            query_name=f"winnow_twin_{ck}",
        )

    _run("ck1")
    drained = spark.read.parquet(store).select("id", "fp")
    got = sorted(
        map(
            tuple,
            winnow_pairs_from_fps(drained, min_shared=1, topk=100)
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            winnow_match_pairs(full, k=8, w=4, min_shared=1, topk=100)
            .collect(),
        )
    )
    assert got == want and len(got) >= 3  # 1-2, 1-4, 2-4 share
    # fresh-checkpoint replay: byte-identical no-op
    _run("ck2")
    drained2 = spark.read.parquet(store).select("id", "fp")
    got2 = sorted(
        map(
            tuple,
            winnow_pairs_from_fps(drained2, min_shared=1, topk=100)
            .collect(),
        )
    )
    assert got2 == got
