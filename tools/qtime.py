"""Time specific catalog queries in isolation (bench.py protocol:
noop-sink materialization, warm-up pass at the warm SF first,
min-of-N at the target SF). For paired before/after measurement of
one optimization — run it, apply the edit, run it again back to back.

Usage: python tools/qtime.py [--runs 3] [--sf-dir DIR] query [query ...]
Prints one JSON line: {"sf": ..., "runs": N, "queries": {name: sec}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import TABLES, load

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for t in TABLES:
        materialize(load(spark, args.sf_dir, t))

    # Python-worker warm pool (mirrors bench.py)
    def _touch(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    materialize(
        spark.range(0, n_workers, 1, n_workers).mapInPandas(_touch, "id long")
    )

    for name in args.queries:
        try:
            materialize(QUERIES[name](spark, args.warm_dir))
        except Exception:
            pass
    try:
        spark._jvm.System.gc()
        time.sleep(1.0)
    except Exception:
        pass

    out: dict[str, float] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, args.sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "runs": args.runs, "queries": out}))


if __name__ == "__main__":
    main()
