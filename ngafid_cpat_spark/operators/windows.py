"""Ordered-series window operators — the heart of the engine.

The reference's single-pass per-flight state machine
(FlightAnalysis.py:134-330) decomposes into four reusable windowed
operators, each a classic Spark pattern (SURVEY.md §2.5):

  * islands()          gaps-and-islands episode detection (W2): a
                       boolean per row -> contiguous-run ids via
                       lag + cumulative sum.
  * sessionize()       gap-based sessionization (the streaming-ready
                       generalization; same cumsum trick keyed on
                       time gaps instead of a predicate edge).
  * rolling()          rowsBetween rolling aggregate with warm-up
                       guard (W8/A5: the reference's rolling-5 AGL
                       mean, FlightAnalysis.py:301-307).
  * topk_per_group()   row_number()<=k (O2 argmin/top-1 generalized).

All are pure DataFrame transformations: one shuffle on the partition
key, then sorted within partitions — at cluster scale the shuffle is
the only data movement, and AQE handles skewed keys (one chatty
user/flight) via skew-join/partition splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds


def _cols(cs) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in (cs if isinstance(cs, (list, tuple)) else [cs])]


def ordered_window(partition_by, order_by) -> WindowSpec:
    return Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))


def islands(
    df: DataFrame,
    partition_by,
    order_by,
    flag: Column,
    island_col: str = "island_id",
    in_island_only: bool = True,
) -> DataFrame:
    """Gaps-and-islands: number the contiguous runs where ``flag`` holds.

    Matches reference episode entry (FlightAnalysis.py:142-170): a new
    island starts on a False->True edge of ``flag``. Island ids are
    1-based in first-appearance order per partition (W7's monotonic
    approach id, FlightAnalysis.py:102-111).
    """
    w = ordered_window(partition_by, order_by)
    f = flag.cast("int")
    edge = F.when(
        f.eqNullSafe(1) & (~F.lag(f, 1, 0).over(w).eqNullSafe(1)), 1
    ).otherwise(0)
    out = df.withColumn("__flag", f).withColumn(
        island_col,
        F.sum(edge).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    if in_island_only:
        out = out.filter(F.col("__flag") == 1)
    return out.drop("__flag")


def sessionize(
    df: DataFrame,
    partition_by,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous row exceeds ``gap_seconds``. The batch analog
    of Structured Streaming's session_window (streaming/sessions.py
    reuses the same semantics)."""
    w = ordered_window(partition_by, [ts_col])
    ts = epoch_seconds(ts_col)
    prev = F.lag(ts).over(w)
    new_session = F.when(prev.isNull() | ((ts - prev) > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize_chunked(
    df: DataFrame,
    partition_by: str | list[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
    chunk_seconds: float = 86400.0,
) -> DataFrame:
    """Skew-robust two-phase sessionization, result-identical to
    ``sessionize`` (same 1-based ids in first-appearance order).

    AQE's skew handling covers joins, NOT window functions: plain
    sessionize puts a hot key's entire history in one task. Phase 1
    here sessionizes within (key, fixed time chunk) so no task sees
    more than one chunk of one key; phase 2 sessionizes the per-chunk
    session SUMMARIES (one row per local session — cardinality
    reduced by the mean session size) to merge sessions that span
    chunk boundaries, then the global id joins back on the
    co-partitioned (key, chunk, local id). Pick ``chunk_seconds``
    well above ``gap_seconds`` (default: 1 day).

    ``partition_by`` must be column NAMES here (they key the
    join-back)."""
    part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    ts = epoch_seconds(ts_col)
    local = sessionize(
        df.withColumn("__chunk", F.floor(ts / F.lit(float(chunk_seconds)))),
        [*part, "__chunk"],
        ts_col,
        gap_seconds,
        "__local_sid",
    )
    summ = local.groupBy(*part, "__chunk", "__local_sid").agg(
        F.min(ts).alias("__smin"), F.max(ts).alias("__smax")
    )
    w = ordered_window(part, ["__smin", "__smax"])
    prev_max = F.lag("__smax").over(w)
    new_s = F.when(
        prev_max.isNull() | ((F.col("__smin") - prev_max) > gap_seconds), 1
    ).otherwise(0)
    summ = summ.withColumn(
        session_col,
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return local.join(
        summ.select(*part, "__chunk", "__local_sid", session_col),
        [*part, "__chunk", "__local_sid"],
    ).drop("__chunk", "__local_sid")


def islands_chunked(
    df: DataFrame,
    partition_by,
    ts_col: str,
    tiebreak_by,
    flag: Column,
    island_col: str = "island_id",
    in_island_only: bool = True,
    chunk_seconds: float = 86400.0,
) -> DataFrame:
    """Skew-robust two-phase gaps-and-islands, result-identical to
    ``islands`` ordered by (ts, *tiebreak_by) — including the
    unflagged-row ids of ``in_island_only=False``.

    The 20x scale smoke put plain islands at ratio 26 (just under
    the flag): like every window function it gets no AQE skew
    splitting, so a hot key's whole history sorts in one task. Here
    phase 1 numbers islands within (key, fixed time chunk); phase 2
    runs over per-chunk SUMMARIES (one row per chunk): two islands
    merge across a boundary iff the earlier chunk's last row and the
    later chunk's first row are both flagged (the rows are adjacent
    — empty chunk indices between non-empty ones don't matter, the
    summary window's lag is the previous NON-EMPTY chunk). The
    global id is base(chunk) + local_id - merged, where base is the
    summary-window running total of (islands - merges). No task sees
    more than one chunk of one key; the summary window per key holds
    #chunks rows, not #rows.

    Cost contract, measured honestly: while the hot key still FITS a
    task (2M rows on local[32]) the plain single window wins on wall
    clock (8.2 s vs 15.8 s at 20M rows — the chunked form pays an
    extra shuffle for the summary join-back). Reach for this variant
    when one key's history is too large for a single task's sort
    (spill/OOM territory) — the same trade sessionize_chunked makes,
    with the per-task bound as the product, not local speed."""
    part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    tbs = (
        [tiebreak_by]
        if isinstance(tiebreak_by, str)
        else list(tiebreak_by or [])
    )
    ts = epoch_seconds(ts_col)
    local = islands(
        df.withColumn("__e", ts).withColumn(
            "__chunk", F.floor(F.col("__e") / F.lit(float(chunk_seconds))).cast("long")
        ),
        [*part, "__chunk"],
        ["__e", *tbs],
        flag,
        "__lid",
        in_island_only=False,
    ).withColumn("__f", flag.cast("int"))
    # first/last ROW of the chunk (flagged or not) via struct min/max
    # over the total order (__e, *tiebreaks)
    okey = F.struct(F.col("__e"), *[F.col(c) for c in tbs], F.col("__f").alias("__f"))
    summ = local.groupBy(*part, "__chunk").agg(
        F.min(okey)["__f"].alias("__first_f"),
        F.max(okey)["__f"].alias("__last_f"),
        F.max("__lid").alias("__n_isl"),
    )
    w = ordered_window(part, ["__chunk"])
    merged = (
        (F.lag("__last_f").over(w) == 1) & (F.col("__first_f") == 1)
    ).cast("long")
    summ = summ.withColumn("__merged", F.coalesce(merged, F.lit(0))).withColumn(
        "__base",
        F.coalesce(
            F.sum(F.col("__n_isl") - F.col("__merged")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    out = (
        local.join(
            summ.select(*part, "__chunk", "__base", "__merged"),
            [*part, "__chunk"],
        )
        .withColumn(
            island_col,
            F.col("__base") - F.col("__merged") + F.col("__lid"),
        )
    )
    if in_island_only:
        out = out.filter(F.col("__f") == 1)
    return out.drop("__e", "__chunk", "__lid", "__f", "__base", "__merged")


def range_window_chunked(
    df: DataFrame,
    partition_by: str | list[str],
    ts_col: str,
    value,
    window_seconds: float,
    sum_col: str = "range_sum",
    count_col: str = "range_n",
) -> DataFrame:
    """Skew-robust two-phase trailing range-frame aggregate,
    result-identical to
    ``sum(value) / count(*) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN window_seconds PRECEDING AND CURRENT ROW)``.

    AQE's skew handling covers joins, NOT window functions: the plain
    range frame puts a hot key's entire history in one task
    (sessionize_chunked's rationale, applied to sliding aggregates).
    Here the chunk width EQUALS the frame width W, which yields the
    invariant that every row's frame [t-W, t] splits into exactly
    two pieces: [chunk_start, t] (the intra-chunk running sum — one
    window over (key, chunk)) and a TAIL of the previous chunk
    [t-W, chunk_start), computed as the previous chunk's total minus
    its running prefix just below t-W. The prefix lookup is an
    as-of: each row is also projected as a PROBE row into the
    previous chunk at time t-W, and one union + ordered window
    (probes sort before tying base rows, so the subtracted prefix is
    strictly < t-W — frame boundaries are inclusive) resolves every
    probe in the same pass that window-totals the chunk. No task
    ever sees more than TWO chunks' rows of one key; both shuffles
    hash on (key, chunk).
    """
    part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    val = F.col(value) if isinstance(value, str) else value
    w = float(window_seconds)
    base0 = df.withColumn("__e", epoch_seconds(F.col(ts_col))).withColumn(
        "__chunk", F.floor(F.col("__e") / F.lit(w)).cast("long")
    )
    wrun = (
        Window.partitionBy(*part, "__chunk")
        .orderBy("__e")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    # running aggregates within the chunk, ts-peers included (range
    # frame semantics) — for base rows this IS the <=t prefix
    cur = base0.withColumn("__cs", F.sum(val).over(wrun)).withColumn(
        "__cn", F.count(F.lit(1)).over(wrun)
    )
    orig_cols = df.columns
    leq_t = F.struct(F.col("__cs").alias("s"), F.col("__cn").alias("n"))
    base = cur.select(
        *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in orig_cols
          if c not in part],
        *part,
        "__chunk",
        F.col("__e").alias("__t"),
        F.lit(0).alias("__side"),
        leq_t.alias("__leq"),
        val.cast("double").alias("__v"),
        F.lit(None).cast("double").alias("__cs2"),
        F.lit(None).cast("long").alias("__cn2"),
    )
    probe = cur.select(
        *[c for c in orig_cols if c not in part],
        *part,
        (F.col("__chunk") - 1).alias("__chunk"),
        (F.col("__e") - w).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(base.schema["__leq"].dataType).alias("__leq"),
        F.lit(None).cast("double").alias("__v"),
        F.col("__cs").cast("double").alias("__cs2"),
        F.col("__cn").alias("__cn2"),
    )
    unioned = base.unionByName(probe.select(*base.columns))
    # probes (__side=1) sort BEFORE base rows tying at __t: the frame
    # boundary t-W is inclusive, so the subtracted prefix must be
    # strictly below it
    wasof = (
        Window.partitionBy(*part, "__chunk")
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*part, "__chunk")
    res = (
        unioned.withColumn(
            "__p",
            F.last(
                F.when(F.col("__side") == 0, F.col("__leq")), ignorenulls=True
            ).over(wasof),
        )
        .withColumn("__tot_s", F.sum("__v").over(wtot))
        .withColumn(
            "__tot_n",
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).over(wtot),
        )
        .filter(F.col("__side") == 1)
    )
    prev_s = F.coalesce(
        F.col("__tot_s") - F.coalesce(F.col("__p.s"), F.lit(0.0)), F.lit(0.0)
    )
    prev_n = F.coalesce(
        F.col("__tot_n") - F.coalesce(F.col("__p.n"), F.lit(0)), F.lit(0)
    )
    return res.select(
        *orig_cols,
        (F.col("__cs2") + prev_s).alias(sum_col),
        (F.col("__cn2") + prev_n).alias(count_col),
    )


# SCALE.md's plain-vs-chunked switch rule, made executable: below
# this many rows in the HOTTEST key the plain single-window form wins
# on wall clock (the chunked forms pay an extra shuffle: measured
# 8.2 s plain vs 15.8 s chunked at 20M rows while the hot key still
# fits a task); above it one key's history outgrows a single task's
# sort — spill/OOM territory where only the chunked form survives.
SKEW_AUTO_THRESHOLD_ROWS = 1_000_000


def hottest_key_rows(df: DataFrame, partition_by) -> int:
    """Max row count under any single partition key — ONE
    map-side-combining aggregation pass whose shuffle carries one row
    per key. This is the cheap probe the ``*_auto`` dispatchers pay
    at plan-build time (an eager action, like fan_partitions='auto'
    in joins.nearest — opt-in by choosing auto dispatch)."""
    row = (
        df.groupBy(*_cols(partition_by))
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__m"))
        .first()
    )
    return int(row["__m"]) if row and row["__m"] is not None else 0


def sessionize_auto(
    df: DataFrame,
    partition_by: str | list[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
    chunk_seconds: float = 86400.0,
    threshold_rows: int = SKEW_AUTO_THRESHOLD_ROWS,
) -> DataFrame:
    """``sessionize`` or ``sessionize_chunked``, picked by measuring
    the hottest key (one cheap agg) against the SCALE.md switch rule
    — 100 TB callers don't need to know the rule. Both outcomes are
    result-identical (equivalence-tested)."""
    if hottest_key_rows(df, partition_by) > threshold_rows:
        return sessionize_chunked(
            df, partition_by, ts_col, gap_seconds, session_col, chunk_seconds
        )
    return sessionize(df, partition_by, ts_col, gap_seconds, session_col)


def islands_auto(
    df: DataFrame,
    partition_by,
    ts_col: str,
    tiebreak_by,
    flag: Column,
    island_col: str = "island_id",
    in_island_only: bool = True,
    chunk_seconds: float = 86400.0,
    threshold_rows: int = SKEW_AUTO_THRESHOLD_ROWS,
) -> DataFrame:
    """``islands`` or ``islands_chunked`` by the hottest-key probe;
    the plain path orders by the same (epoch seconds, *tiebreaks)
    total order the chunked form uses, so both outcomes are
    result-identical."""
    if hottest_key_rows(df, partition_by) > threshold_rows:
        return islands_chunked(
            df, partition_by, ts_col, tiebreak_by, flag,
            island_col, in_island_only, chunk_seconds,
        )
    tbs = (
        [tiebreak_by]
        if isinstance(tiebreak_by, str)
        else list(tiebreak_by or [])
    )
    return islands(
        df, partition_by,
        [epoch_seconds(F.col(ts_col)), *_cols(tbs)],
        flag, island_col, in_island_only,
    )


def range_window_auto(
    df: DataFrame,
    partition_by: str | list[str],
    ts_col: str,
    value,
    window_seconds: float,
    sum_col: str = "range_sum",
    count_col: str = "range_n",
    threshold_rows: int = SKEW_AUTO_THRESHOLD_ROWS,
) -> DataFrame:
    """Plain trailing range frame or ``range_window_chunked`` by the
    hottest-key probe. A non-integral ``window_seconds`` always takes
    the chunked path (Spark's rangeBetween frame bounds are longs);
    the plain sum is cast to double to match the chunked schema."""
    w = float(window_seconds)
    if not w.is_integer() or hottest_key_rows(df, partition_by) > threshold_rows:
        return range_window_chunked(
            df, partition_by, ts_col, value, w, sum_col, count_col
        )
    part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    val = F.col(value) if isinstance(value, str) else value
    plain_w = (
        Window.partitionBy(*_cols(part))
        .orderBy(epoch_seconds(F.col(ts_col)))
        .rangeBetween(-int(w), 0)
    )
    return df.select(
        *df.columns,
        F.sum(val).over(plain_w).cast("double").alias(sum_col),
        F.count(F.lit(1)).over(plain_w).alias(count_col),
    )


def rolling(
    df: DataFrame,
    partition_by,
    order_by,
    value: Column,
    agg: str = "avg",
    window_rows: int = 5,
    out_col: str = "rolling",
    require_full: bool = False,
) -> DataFrame:
    """Trailing ``window_rows``-row aggregate (current row inclusive).

    ``require_full=True`` reproduces the reference's warm-up guard —
    the rolling-5 AGL mean only counts once 5 samples are seen
    (FlightAnalysis.py:301-307) — by NULLing the value until the frame
    is full.
    """
    frame = (
        ordered_window(partition_by, order_by)
        .rowsBetween(-(window_rows - 1), 0)
    )
    expr = getattr(F, agg)(value).over(frame)
    if require_full:
        expr = F.when(F.count(value).over(frame) >= window_rows, expr)
    return df.withColumn(out_col, expr)


def topk_per_group(
    df: DataFrame,
    partition_by,
    order_by,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number. Give ``order_by`` a
    deterministic tiebreak column; the reference's argmin airport
    search (FlightAnalysis.py:356-366) is k=1 of this."""
    w = ordered_window(partition_by, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def boundaries(
    df: DataFrame,
    group_by: Sequence[str],
    order_col: str,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-island boundary extraction (W3): min/max of the ordering
    column plus caller aggregates, one row per island."""
    return df.groupBy(*group_by).agg(
        F.min(order_col).alias(f"{order_col}_start"),
        F.max(order_col).alias(f"{order_col}_end"),
        F.count(F.lit(1)).alias("n_rows"),
        *aggs,
    )


def global_row_number(
    df: DataFrame,
    order_by,
    out_col: str = "row_id",
    start: int = 1,
) -> DataFrame:
    """Contiguous global row ids in ``order_by`` order — equal to
    ``row_number() OVER (ORDER BY ...)`` but scalable.

    The naive global window is the classic trap: with no PARTITION BY
    every row lands in ONE task (Spark even warns
    "No Partition Defined for Window operation"), so a 100 TB sort
    serializes through a single executor. Here:

      1. repartitionByRange(order_by): a sampled range exchange puts
         each key range in its own partition, cluster-wide;
      2. sortWithinPartitions + per-partition row_number: local work;
      3. partition COUNTS (one tiny agg, #partitions rows) collected
         and turned into cumulative offsets, joined back broadcast.

    Range partition boundaries are sampling-dependent, but the final
    id of a row is offset+local_rank which always equals its global
    rank — ids are DETERMINISTIC whenever ``order_by`` is a total
    order (unique key); with duplicate keys, ties order arbitrarily
    exactly as the naive form's ties do.

    The same two-phase shape as zipWithIndex, expressed in DataFrame
    ops (no RDD round-trip, stays in Tungsten rows)."""
    cols = _cols(order_by)
    ranged = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    pid = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    # Pin the ranked frame BEFORE the sizes collect: both actions (the
    # count-per-partition collect and the final offset join) must see
    # the SAME range boundaries and partition ids. Without the pin the
    # second action re-executes the sampled range exchange from
    # scratch — nondeterministic lineage could re-sample different
    # boundaries (duplicate/gapped ids), and even deterministic input
    # pays the heavy sort pipeline twice. Lazy: materialized by the
    # sizes collect, reused by the join.
    local = pid.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    # bounded collect: one row per partition
    sizes = (
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    offsets = {}
    acc = start - 1
    for r in sorted(sizes, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["__n"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    return (
        local.join(off_df, "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__rn"))
        .drop("__pid", "__rn", "__off")
    )


def pareto_frontier_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier, Börzsönyi et al. 2001 "The
    Skyline Operator"): the rows not DOMINATED by any other row,
    where a dominates b iff a.min_col <= b.min_col AND a.max_col >=
    b.max_col with at least one strict ("earlier AND at least as
    valuable, or as early AND strictly more valuable"). The classic
    multi-criteria shortlist operator ("best price/date tradeoffs").

    NOT the naive quadratic NOT-EXISTS self-join (the oracle's form —
    at 100 TB that is a cross product). The 2-D skyline has a
    sort-based linear identity: a row is on the frontier iff its
    max_col equals its min_col-group's maximum AND that maximum
    strictly exceeds every strictly-smaller min_col group's maximum.
    So:

      1. one map-side-combining groupBy(min_col) -> per-key max —
         the only pass over the corpus;
      2. an EXCLUSIVE prefix max over the per-key aggregate in
         min_col order, computed with the global_row_number two-phase
         shape (range partition + per-partition running max + a
         bounded per-partition-max collect folded into offsets) —
         never an empty-PARTITION-BY window;
      3. frontier keys (prefix-max filter) join back to the corpus
         on (min_col, max_col) equality — broadcast: the frontier is
         at most one row per distinct min_col value that sets a new
         record, bounded by the key domain (calendar-sized for time
         keys).

    Ties: rows sharing the frontier (min_col, max_col) point are all
    non-dominated (no strict inequality) and all returned — exactly
    the NOT-EXISTS semantics.
    """
    d, mp = "__sky_d", "__sky_mp"
    agg = df.groupBy(F.col(min_col).alias(d)).agg(
        F.max(max_col).alias(mp)
    )
    ranged = agg.repartitionByRange(d).sortWithinPartitions(d)
    pid = ranged.withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(d)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = pid.withColumn("__prev", F.max(mp).over(w)).localCheckpoint(
        eager=False
    )
    # bounded collect: one (pid, max) row per partition -> exclusive
    # cross-partition prefix maxima (same determinism argument as
    # global_row_number: the pin makes both consumers see one set of
    # range boundaries)
    part_max = (
        local.groupBy("__pid").agg(F.max(mp).alias("__m")).collect()
    )
    run = None
    offs = []
    for r in sorted(part_max, key=lambda r: r["__pid"]):
        offs.append((r["__pid"], run))
        run = r["__m"] if run is None else max(run, r["__m"])
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offs, f"__pid int, __poff {agg.schema[mp].dataType.simpleString()}"
        )
    )
    prev = F.greatest(F.col("__prev"), F.col("__poff"))
    frontier = (
        local.join(off_df, "__pid")
        .filter(prev.isNull() | (F.col(mp) > prev))
        .select(d, mp)
    )
    return df.join(
        F.broadcast(frontier),
        (df[min_col] == F.col(d)) & (df[max_col] == F.col(mp)),
    ).drop(d, mp)
