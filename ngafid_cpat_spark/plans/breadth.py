"""Breadth catalog: reshaping, temporal-join, snapshot, map-type and
corpus-layout queries rounding out the SURVEY §2 inventory.

  * unpivot/melt (wide->long reshaping — the inverse of pivot_event_counts)
  * interval (range) join on event time — the batch twin of the
    stream-stream interval join in streaming/sessions.py
  * SCD-style latest-value snapshot (the reference's work-queue
    "current state" read, generalized: flight_analyses holds one
    current row per flight, main.py:27)
  * MapType construction + lookup (map_from_entries/element_at)
  * sliding event-time windows (F.window with slide < duration)
  * deterministic shard assignment + integer-factor corpus mixing +
    PII scrubbing (operators/corpus.py, functions/text.py)

Every query is oracle-paired; scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.corpus import (
    SAMPLE_HASH_SQL,
    SHARD_ASSIGN_SQL,
    SHARD_ORD_SQL,
    corpus_mix,
    sample_hash,
    shard_assign,
)
from ..sources import load
from .relational import CENTS_SUM_SQL, cents_sum, register


@register(
    "unpivot_lineitem_measures",
    f"""
    WITH long AS (
        SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           {CENTS_SUM_SQL('val')} AS sum_val,
           COUNT(*) AS n
    FROM long
    GROUP BY l_returnflag, measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (DataFrame.unpivot) + re-aggregation — the
    inverse reshaping of pivot_event_counts. Unpivot is a zero-shuffle
    generator (each input row emits 3 long rows map-side); the only
    exchange is the final small hash aggregate, so at 100 TB this
    costs one scan."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        cents_sum("val").alias("sum_val"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "interval_join_click_counts",
    """
    SELECT p.event_id, p.user_id, COUNT(c.ts) AS n_clicks
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 3 DAY
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def interval_join_click_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval (range) join: per purchase, clicks by the same
    user in the trailing 3 days. Equi key (user_id) carries the
    shuffle; the time range is a post-join filter inside the sort-
    merge join, so state is bounded per user — the same bound the
    streaming twin (stream_stream_click_purchase) enforces with
    watermarks. No cross product: candidate pairs exist only within
    a user's partition."""
    ev = load(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    joined = purch.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 3 DAYS"))
        & (F.col("click_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("click_ts").alias("n_clicks")
    )


@register(
    "latest_snapshot_events",
    """
    SELECT user_id, event_type,
           event_id AS last_event_id, ts AS last_ts, value AS last_value
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE ts < TIMESTAMP '2024-01-20'
    ) t
    WHERE rn = 1
    """,
)
def latest_snapshot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-style as-of snapshot: latest value per (user, type) at a
    cutoff — the generalized form of the reference's one-current-row-
    per-flight status table (main.py:27). Deterministic tie-break on
    event_id. One shuffle on the snapshot key; at scale the cutoff
    filter pushes to the scan so state never exceeds the retained
    window."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-20").cast("timestamp")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "map_functions_events",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)    AS n_click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: per-user event_type->count map built with
    map_from_entries(collect_list(struct)), probed with element_at,
    sized with size(). The map is built from an ALREADY-aggregated
    (user, type) count — 5 entries per user — never from raw rows, so
    collect_list is bounded by the type cardinality, not the event
    count."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    zero = F.lit(0).cast("long")
    return m.select(
        "user_id",
        F.coalesce(F.element_at("m", F.lit("click")), zero).alias("n_click"),
        F.coalesce(F.element_at("m", F.lit("purchase")), zero).alias("n_purchase"),
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
    )


@register(
    "events_sliding_window",
    f"""
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - g.k * (INTERVAL '30 minutes')   AS window_start,
           COUNT(*)                            AS n,
           {CENTS_SUM_SQL('value')}            AS sum_value
    FROM events, (SELECT unnest([0, 1]) AS k) g
    GROUP BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h duration, 30 min slide): every
    event lands in exactly duration/slide = 2 windows. Spark's window
    generator emits both assignments map-side; the oracle reproduces
    the same set arithmetically (epoch-aligned buckets minus k
    slides). Partial aggregation keeps the shuffle at one row per
    (window, partition)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "shard_assign_docs",
    f"""
    SELECT {SHARD_ASSIGN_SQL('doc_id')} AS shard_id,
           COUNT(*)                     AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(DISTINCT source)       AS n_sources,
           CAST(SUM({SHARD_ORD_SQL('doc_id')}) AS BIGINT) AS sum_ord
    FROM documents
    GROUP BY shard_id
    """,
)
def shard_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-way shard layout for training data: the
    balance audit (docs/chars/source-spread per shard) over
    operators/corpus.shard_assign. Shard id and in-shard order are
    pure integer hashes of doc_id — reproducible across runs AND
    engines, no RNG, no partition-layout dependence. The write path
    is partitionBy(shard_id); nothing here sorts globally."""
    docs = load(spark, sf_dir, "documents")
    return (
        shard_assign(docs, n_shards=16)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("shard_ord").alias("sum_ord"),
        )
    )


_MIX_CASE = (
    "CASE WHEN source = 'src0' THEN 3 WHEN source = 'src1' THEN 2 ELSE 1 END"
)


@register(
    "corpus_mix_docs",
    f"""
    SELECT doc_id, source,
           unnest(generate_series(1, {_MIX_CASE})) AS copy
    FROM documents
    WHERE {SAMPLE_HASH_SQL('doc_id')} < 300
    """,
)
def corpus_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-factor domain upsampling (src0 x3, src1 x2) over a
    deterministic 30% sample — corpus mixing's upweight half
    (stratified_sample is the downweight half). sequence+explode is
    map-side and streamed; copies carry an ordinal so a later shard
    hash can spread them."""
    docs = load(spark, sf_dir, "documents").filter(
        sample_hash("doc_id") < 300
    )
    mixed = corpus_mix(docs, {"src0": 3, "src1": 2})
    return mixed.select(
        "doc_id", "source", F.col("copy").cast("long").alias("copy")
    )


@register(
    "pii_scrub_events",
    """
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '#', 'g')            AS props_scrubbed,
           CAST(len(string_split_regex(props, '[0-9]+')) - 1 AS BIGINT) AS n_masked
    FROM events
    """,
)
def pii_scrub_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: mask every digit run in the raw props
    payload, report how many runs were masked. Pure codegen
    expressions (regexp_replace + split), zero shuffle — at 100 TB
    this is a straight map over the scan with full pushdown of any
    upstream filters. Pattern kept inside the RE2 ∩ java.util.regex
    common dialect so both engines agree byte-for-byte."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        T.scrub("props").alias("props_scrubbed"),
        T.scrub_count("props").cast("long").alias("n_masked"),
    )


@register(
    "listagg_customers_per_nation",
    """
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_name) AS top_names,
           COUNT(*) AS n
    FROM (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_name) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn <= 3
    GROUP BY n_name
    """,
)
def listagg_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 LISTAGG ... WITHIN GROUP (Spark 4 `listagg`): the
    top-3 customer names per nation folded into one ordered string.
    Ordered aggregation is only deterministic because the WITHIN
    GROUP order (acctbal desc, name) is total — the same discipline
    every hash-gated query here follows. DuckDB's twin is
    string_agg(expr, sep ORDER BY ...). Scale: the rank prefilter
    caps per-group state at 3 rows before the aggregation, so the
    listagg shuffle carries top-k rows, never whole groups."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), "c_name"
    )
    top = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    return top.groupBy("n_name").agg(
        F.expr(
            "listagg(c_name, ',') WITHIN GROUP "
            "(ORDER BY c_acctbal DESC, c_name)"
        ).alias("top_names"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "lateral_topk_orders",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    BYTE-IDENTICAL SQL on both engines (Spark 4 lateral join /
    DuckDB LATERAL). Catalyst decorrelates it into the same
    rank-filter window plan topk_customers_per_nation hand-writes,
    so the per-customer top-2 never materializes whole order groups;
    the lateral FORM is what a reference user migrating correlated
    SQL gets to keep."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM __lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM __lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
    """)


@register(
    "try_arithmetic_events",
    """
    SELECT event_id,
           CASE WHEN CAST(FLOOR(value) AS BIGINT) - 50 = 0 THEN NULL
                ELSE ROUND(100.0 / (CAST(FLOOR(value) AS BIGINT) - 50), 4)
           END AS inv_dist,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           TRY_CAST(event_type AS BIGINT) AS not_a_number
    FROM events
    """,
)
def try_arithmetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: try_divide / try_cast yield
    NULL instead of raising under ANSI mode — the semantics a 100 TB
    pipeline needs, where one malformed row must not kill a 6-hour
    job. DuckDB twin: TRY_CAST plus an explicit zero-denominator
    CASE (its division errors like ANSI Spark would)."""
    from ..operators.skew import widen_narrow_source

    # per-row JSON parse + TRY_CASTs on the scan side of a one-file
    # table run single-task — spread the scan first (no-op at
    # production file counts; guide "input skew")
    ev = widen_narrow_source(load(spark, sf_dir, "events"))
    # FLOOR before the integer cast: DuckDB rounds double->bigint
    # casts half-even while Spark truncates — floor() agrees everywhere
    denom = F.floor("value").cast("bigint") - 50
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.lit(100.0), denom), 4).alias("inv_dist"),
        # TRY_CAST, not try_to_number('999999'): the format string caps
        # the parse at 6 unsigned digits, so negatives or 7-digit values
        # would go NULL here while the oracle's TRY_CAST succeeds
        F.expr(
            "TRY_CAST(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("k"),
        F.expr("TRY_CAST(event_type AS BIGINT)").alias("not_a_number"),
    )


@register(
    "xml_roundtrip_events",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def xml_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (from_xml, Spark 4): render each event's props as
    an XML attribute payload, then parse it back with a typed schema
    (attributes read via the `_` prefix convention) and aggregate.
    The oracle extracts the same value from the original JSON — a
    cross-representation check that the XML encode/decode is
    lossless, not an echo of the same parser."""
    from ..operators.skew import widen_narrow_source

    # JSON->XML render + from_xml re-parse per row: single-task on a
    # one-file scan — spread first (no-op on a wide source)
    ev = widen_narrow_source(load(spark, sf_dir, "events"))
    parsed = ev.select(
        "event_type",
        F.expr(
            "from_xml(concat('<p k=\"', get_json_object(props, '$.k'), "
            "'\"/>'), '_k BIGINT')._k"
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
    )
