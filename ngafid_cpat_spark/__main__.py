"""CLI entry points — the reference's operational surface
(main.py:211-229: `python main.py [flight_ids...] [-m] [--no-write]`)
re-expressed over the Spark engine:

    python -m ngafid_cpat_spark analyze --telemetry PATH
        [flight_ids...] [--airports PATH] [--runways PATH]
        [--output DIR] [--no-write]
    python -m ngafid_cpat_spark query NAME [--sf-dir DIR] [--limit N]
    python -m ngafid_cpat_spark list

Parity notes: positional flight_ids = reference entry point 2 (the
filter is pushed into the scan, not looped); `--no-write` skips the
sink like the reference's flag (but still returns results — the
reference's skipOutput path lost them, SURVEY.md §3 entry point 3);
the reference's `-m/--multi-process` consumer pool has no analog
because Spark's scheduler owns parallelism (SURVEY.md §3 step 5).
Dimension CSVs are read with explicit named schemas, never by
position (main.py:171-181).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

AIRPORTS_CSV_SCHEMA = StructType(
    [
        StructField("airport_code", StringType()),
        StructField("airport_name", StringType()),
        StructField("city", StringType()),
        StructField("state_code", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("elevation_ft", DoubleType()),
    ]
)

RUNWAYS_CSV_SCHEMA = StructType(
    [
        StructField("airport_code", StringType()),
        StructField("runway_code", StringType()),
        StructField("magnetic_rwy_hdg", DoubleType()),
        StructField("true_rwy_hdg", DoubleType()),
        StructField("center_lat", DoubleType()),
        StructField("center_long", DoubleType()),
        StructField("elevation_ft", DoubleType()),
    ]
)


def _read(spark, path: str, csv_schema: StructType | None = None):
    if path.endswith(".csv") and csv_schema is not None:
        from .sources.tables import read_csv

        return read_csv(spark, path, csv_schema)
    return spark.read.parquet(path)


def cmd_analyze(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from .plans import approach
    from .session import get_spark

    spark = get_spark("ngafid-cpat-analyze")
    telemetry = _read(spark, args.telemetry)
    if args.flight_ids:
        # entry point 2: explicit work set, pushed into the scan
        telemetry = telemetry.filter(F.col("flight").isin(args.flight_ids))
    airports = _read(spark, args.airports, AIRPORTS_CSV_SCHEMA)
    runways = _read(spark, args.runways, RUNWAYS_CSV_SCHEMA)

    if args.status:
        # entry point 1 — the reference's work-queue loop (main.py:27,
        # 128-132): analyze only flights with approach_analysis=0,
        # then upsert results + flip status under one manifest commit
        # (FlightAnalysis.py:428-433's transaction)
        from . import sinks

        status_df = sinks.read_table(spark, args.status)
        pending = approach.pending_flights(status_df)
        if pending.limit(1).count() == 0:
            print("work queue empty; nothing to commit")
            return 0
        telemetry = telemetry.join(
            F.broadcast(pending.withColumnRenamed("flight_id", "flight")),
            "flight",
            "left_semi",
        )
        result = approach.analyze(telemetry, airports, runways)
        if args.no_write:
            result.show(50, truncate=False)
            return 0
        # one materialization feeds the count, the fingerprint and the
        # upsert — analyze() is a many-stage plan and would otherwise
        # recompute per action
        result = result.localCheckpoint(eager=True)
        n = result.count()
        txn_dir = args.txn_dir or f"{args.output}_txn"
        # status flips for every flight that was ACTUALLY analyzed this
        # run — pending AND present in the (possibly flight-id-filtered
        # or partial) telemetry — episodes or not (reference
        # FlightAnalysis.py:432: per analyzed flight). Pending flights
        # excluded from this run's input must stay queued.
        analyzed = telemetry.select(
            F.col("flight").alias("flight_id")
        ).distinct()
        txn = sinks.commit_analysis(
            spark,
            result,
            args.output,
            args.status,
            txn_dir,
            analyzed_flights=analyzed,
        )
        print(f"committed {n} approach rows (txn {txn}) -> {args.output}")
        return 0

    result = approach.analyze(telemetry, airports, runways)
    if args.no_write:
        result.show(50, truncate=False)
    else:
        result.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from .plans import QUERIES
    from .session import get_spark

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    spark = get_spark("ngafid-cpat-query")
    df = QUERIES[args.name](spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_list(args: argparse.Namespace) -> int:
    from .plans import ORACLES, QUERIES

    for name in sorted(QUERIES):
        kind = "oracle" if name in ORACLES else "rows-only"
        print(f"{name}\t{kind}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ngafid_cpat_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("analyze", help="approach/landing analysis pipeline")
    a.add_argument("flight_ids", nargs="*", type=int)
    a.add_argument("--telemetry", required=True, help="telemetry parquet path")
    a.add_argument("--airports", required=True, help="airports parquet/CSV")
    a.add_argument("--runways", required=True, help="runways parquet/CSV")
    a.add_argument("--output", default="approaches_out", help="result parquet dir")
    a.add_argument("--no-write", action="store_true", help="print instead of sink")
    a.add_argument(
        "--status",
        help="flight_analyses status table: work-queue mode — analyze only "
        "pending flights, upsert + flip status in one manifest commit",
    )
    a.add_argument("--txn-dir", help="commit-manifest dir (default <output>_txn)")
    a.set_defaults(fn=cmd_analyze)

    q = sub.add_parser("query", help="run one catalog query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    ls = sub.add_parser("list", help="list catalog queries")
    ls.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
