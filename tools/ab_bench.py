"""Quiesced interleaved A/B runner for the headline bench set.

One invocation = one PASS over the given repo root's headline
queries at sf0.1 (warm-up first: all tables + every query once at
sf0.001, mirroring bench.py's protocol). The driver loop alternates
roots pass by pass (A1 B1 A2 B2 A3 B3) and takes per-query mins, so
slow box phases hit both sides equally — the protocol that
attributed the r11 ann_cosine drift.

Usage: python tools/ab_bench.py <repo_root> <out_json>
Query names ride in $AB_HEADLINE (JSON list).
"""

import json
import os
import sys
import time


def main():
    root, out = sys.argv[1], sys.argv[2]
    names = json.loads(os.environ["AB_HEADLINE"])
    sys.path.insert(0, root)
    os.chdir(root)
    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    from ngafid_cpat_spark.sources import TABLES, load

    sf_dir = "/root/testdata/sf0.1"
    for t in TABLES:
        mat(load(spark, sf_dir, t))
    for n in names:
        try:
            mat(QUERIES[n](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    try:
        spark._jvm.System.gc()
        time.sleep(1.0)
    except Exception:
        pass
    timings = {}
    for n in names:
        t0 = time.perf_counter()
        mat(QUERIES[n](spark, sf_dir))
        timings[n] = round(time.perf_counter() - t0, 3)
    with open(out, "w") as f:
        json.dump(timings, f, sort_keys=True)


if __name__ == "__main__":
    main()
