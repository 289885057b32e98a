"""Per-stage timing breakdown for the dedup family.

The end-to-end bench times whole queries; before a 100x scale-up you
want to know WHICH stage of a multi-stage operator dominates (shingle
explode? signature aggregate? band self-join? verify join?). Each
stage is materialized to the noop sink from a localCheckpoint of the
previous stage, so a stage's number is its own cost, not its
lineage's.

Usage: python tools/stage_profile.py [--sf-dir /root/testdata/sf0.1]
Appends nothing; prints a markdown table (paste into PLANS.md).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ngafid_cpat_spark.operators import dedup as D
    from ngafid_cpat_spark.operators.dedup import _shingle_sets
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import load

    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name, df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        dt = time.perf_counter() - t0
        rows.append((name, round(dt, 2), out.count()))
        return out

    docs = load(spark, args.sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()  # warm scan

    rows: list[tuple] = []
    print(f"## dedup stage profile @ {args.sf_dir}\n")

    # --- simhash_pairs stages (mirrors the production exploded path) ---
    sh0 = timed(
        "simhash: shingle sets (explode+lead+hash)",
        _shingle_sets(docs, "doc_id", "text", 3),
    )
    hashed = sh0.select("id", F.xxhash64("sh").alias("h"))
    votes = timed(
        "simhash: 64-bit majority votes (groupBy + 64 sums)",
        hashed.groupBy("id").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.expr(f"sum(cast(shiftrightunsigned(h, {b}) & 1L as int)) AS b{b}")
                for b in range(64)
            ],
        ),
    )
    sh64_sql = " | ".join(
        f"(CASE WHEN b{b} * 2 >= n THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(64)
    )
    sig = timed(
        "simhash: signature assembly", votes.select("id", F.expr(f"({sh64_sql}) AS sh64"))
    )
    blocks = sig.select(
        "id", "sh64",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("block"),
                    F.shiftrightunsigned("sh64", 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("key"),
                )
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("id", "sh64", "bk.block", "bk.key")
    timed(
        "simhash: block self-join + hamming verify",
        blocks.alias("a")
        .join(blocks.alias("b"), on=["block", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            D.hamming64(F.col("a.sh64"), F.col("b.sh64")).alias("hamming"),
        )
        .filter(F.col("hamming") <= 16)
        .distinct(),
    )

    # --- jaccard stages ---
    sh = timed("jaccard: shingle sets (explode+lead+hash)", _shingle_sets(docs, "doc_id", "text", 3))
    timed(
        "jaccard: inverted-index self-join + count",
        sh.alias("a")
        .join(sh.alias("b"), on="sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("c")),
    )

    print("| stage | sec | rows out |")
    print("|---|---|---|")
    for name, dt, n in rows:
        print(f"| {name} | {dt} | {n} |")


if __name__ == "__main__":
    main()
