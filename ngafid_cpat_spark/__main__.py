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


def _load_embeddings(spark, path: str):
    from pyspark.sql import functions as F

    return spark.read.parquet(path).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def cmd_index(args: argparse.Namespace) -> int:
    """Persisted-ANN-index lifecycle (operators/similarity +
    streaming/foreach_batch): build once, probe many, fold stream
    batches into fresh generations, retract ids."""
    from pyspark.sql import functions as F

    from .operators import similarity as S
    from .session import get_spark

    spark = get_spark("ngafid-cpat-index")
    if args.index_cmd == "build":
        emb = _load_embeddings(spark, args.embeddings)
        if args.root and args.path:
            raise SystemExit("pass --path or --root, not both")
        if args.root and (
            S.current_generation(args.root, spark) is not None
            or S._fs_glob(args.root, "gen-*", spark)
        ):
            # rebuilding gen-000001 and flipping back to it would
            # silently undo every compaction/retraction the root has
            # accumulated (deleted ids become probe-able again)
            raise SystemExit(
                f"root {args.root} already carries generations; "
                "build into a fresh root, or use 'index compact/"
                "delete --root' to advance this one"
            )
        path = args.path or (
            f"{args.root.rstrip('/')}/gen-000001" if args.root else None
        )
        if path is None:
            raise SystemExit("--path or --root is required")
        meta = S.write_ivfpq_index(
            emb, path,
            k_coarse=args.k_coarse, m=args.m, k_sub=args.k_sub,
            n_iter=args.n_iter, cluster_files=args.cluster_files,
        )
        n_cells = len(meta["coarse"])
        extra = ""
        if args.root:
            ptr = S.set_current_generation(args.root, "gen-000001", spark)
            extra = f"; root pointer set ({ptr})"
        print(f"built index at {path}: {n_cells} cells, "
              f"m={meta['m']} x k={meta['k_sub']} residual PQ{extra}")
        return 0
    if args.index_cmd == "probe":
        emb = _load_embeddings(spark, args.embeddings)
        row = emb.filter(F.col("vec_id") == args.query_id).select(
            "embedding"
        ).collect()
        if not row:
            print(f"query id {args.query_id} not in {args.embeddings}",
                  file=sys.stderr)
            return 2
        q = [float(x) for x in row[0]["embedding"]]
        out = S.ivfpq_topk_indexed(
            spark, args.path, q, k=args.k, n_probe=args.n_probe,
            rerank=args.rerank, emb=emb, exclude_id=args.query_id,
        )
        out.show(args.k, truncate=False)
        return 0
    if args.index_cmd == "compact":
        base, dest = _gen_base_dest(spark, args, S)
        S.compact_ivfpq_index(spark, base, args.stream, dest)
        if args.root:
            ptr = S.set_current_generation(
                args.root, dest.rstrip("/").rsplit("/", 1)[-1], spark
            )
            print(f"compacted {base} + {args.stream} -> {dest}; "
                  f"pointer flipped ({ptr})")
        else:
            print(f"compacted {base} + {args.stream} -> {dest}")
        return 0
    if args.index_cmd == "delete":
        base, dest = _gen_base_dest(spark, args, S)
        S.delete_from_ivfpq_index(spark, base, args.ids, dest)
        if args.root:
            ptr = S.set_current_generation(
                args.root, dest.rstrip("/").rsplit("/", 1)[-1], spark
            )
            print(f"deleted {len(args.ids)} ids: {base} -> {dest}; "
                  f"pointer flipped ({ptr})")
        else:
            print(f"deleted {len(args.ids)} ids: {base} -> {dest}")
        return 0
    if args.index_cmd == "current":
        print(S.resolve_index_dir(args.root, spark))
        return 0
    return 2


def _gen_base_dest(spark, args, S):
    """Resolve (base, dest) for compact/delete. With ``--root`` the
    base defaults to the root's current generation and dest to the
    next ``gen-<n>`` dir under the root, so the caller never names a
    generation by hand; the pointer flip after the write is the
    atomic commit. Without ``--root`` both must be explicit (the
    pre-generational calling convention, still supported)."""
    if args.root:
        base = args.base or S.resolve_index_dir(args.root, spark)
        if args.dest:
            # the pointer stores a generation NAME under the root; a
            # dest elsewhere would flip the pointer to a dangling dir
            # and brick every probe through the root. Qualified-URI
            # compare (not os.path.realpath) so file://-prefixed and
            # remote roots are guarded identically.
            qdest = S._fs_qualified(args.dest.rstrip("/"), spark)
            qroot = S._fs_qualified(args.root.rstrip("/"), spark)
            rel = (
                qdest[len(qroot) + 1:]
                if qdest.startswith(qroot + "/")
                else None
            )
            if not rel or "/" in rel:
                raise SystemExit(
                    f"--dest must be directly under --root ({args.root}); "
                    f"got {args.dest}"
                )
            dest = args.dest
        else:
            gens = S._fs_glob(args.root, "gen-*", spark)
            nums = [
                int(g[4:]) for g in gens if g[4:].isdigit()
            ]
            dest = f"{args.root.rstrip('/')}/gen-{(max(nums) + 1) if nums else 1:06d}"
        return base, dest
    if not args.base or not args.dest:
        raise SystemExit("--base and --dest are required without --root")
    return args.base, args.dest


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

    ix = sub.add_parser("index", help="persisted ANN index lifecycle")
    ixsub = ix.add_subparsers(dest="index_cmd", required=True)
    b = ixsub.add_parser("build", help="train quantizers + write codes")
    b.add_argument("--embeddings", required=True, help="vectors parquet")
    b.add_argument("--path", help="plain index dir")
    b.add_argument("--root", help="generational root: writes gen-000001 "
                                  "and sets the current-generation pointer")
    b.add_argument(
        "--k-coarse",
        type=lambda v: v if v == "auto" else int(v),
        default=8,
        help="coarse cell count, or 'auto' for max(8, round(sqrt(N)))",
    )
    b.add_argument("--m", type=int, default=8)
    b.add_argument("--k-sub", type=int, default=16)
    b.add_argument("--n-iter", type=int, default=2)
    b.add_argument("--cluster-files", action="store_true",
                   help="hash-cluster by cell (O(1) files/cell at scale)")
    pr = ixsub.add_parser("probe", help="probe-only top-k search")
    pr.add_argument("--path", required=True)
    pr.add_argument("--embeddings", required=True,
                    help="vectors parquet (query source + exact re-rank)")
    pr.add_argument("--query-id", type=int, required=True)
    pr.add_argument("--k", type=int, default=10)
    pr.add_argument("--n-probe", type=int, default=4)
    pr.add_argument("--rerank", type=int, default=100)
    co = ixsub.add_parser("compact", help="fold stream batches into a new generation")
    co.add_argument("--base", help="base index dir (default: --root's current gen)")
    co.add_argument("--stream", required=True)
    co.add_argument("--dest", help="new generation dir (default: --root/gen-<n+1>)")
    co.add_argument("--root", help="generational index root: auto-dest + "
                                   "atomic current-generation pointer flip")
    de = ixsub.add_parser("delete", help="retract ids into a new generation")
    de.add_argument("--base", help="base index dir (default: --root's current gen)")
    de.add_argument("--dest", help="new generation dir (default: --root/gen-<n+1>)")
    de.add_argument("--root", help="generational index root: auto-dest + "
                                   "atomic current-generation pointer flip")
    de.add_argument("--ids", type=int, nargs="+", required=True)
    cu = ixsub.add_parser("current", help="print a root's current generation dir")
    cu.add_argument("--root", required=True)
    ix.set_defaults(fn=cmd_index)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
