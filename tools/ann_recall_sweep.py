"""Recall operating curve for the persisted IVFADC index.

The driver-gate recall oracles (plans/extensions.TOLERANCE_ORACLES)
assert a single floor (recall@10 >= 0.6) at one operating point
(n_probe=4, rerank=100). This sweep measures the WHOLE curve —
recall@10 vs n_probe in {1,2,4,8} x rerank in {0,50,100} over a
20-query panel — so the floor is justified by a measured surface,
not one sample (the r08 verdict's ask). Results are committed to
SCALE.md ("ANN recall operating curve").

Usage: python tools/ann_recall_sweep.py [--sf-dirs sf0.01,sf0.1]
                                        [--n-queries 20]
Prints one markdown table per sf dir.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def sweep(sf_dir: str, n_queries: int, k_coarse: int = 8, n_probes=(1, 2, 4, 8)) -> None:
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.operators import similarity as S
    from ngafid_cpat_spark.plans.extensions import (
        _ensure_ivfpq_index,
        _ivfpq_index_path,
        _ivfpq_tag,
    )
    from ngafid_cpat_spark.session import get_spark
    from ngafid_cpat_spark.sources import load

    spark = get_spark("ann-recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    # the same content-keyed persisted index the catalog queries probe
    # (k_coarse=8 = _ivfpq_tag()'s default, shared constant so the
    # sweep can't drift onto a parallel store again); other cell
    # counts get their own keyed store
    path = _ivfpq_index_path(sf_dir, _ivfpq_tag(k_coarse=k_coarse))
    _ensure_ivfpq_index(emb, path, k_coarse=k_coarse, m=8, k_sub=16, n_iter=2)

    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows
    ]

    # exact baseline: brute-force cosine top-10 per query, one batch
    # plan (the same rounding/tie rules the probes re-rank with)
    k = 10
    exact: dict[int, set[int]] = {}
    for qid, qv in queries:
        exact[qid] = {
            r["vec_id"]
            for r in S.cosine_topk(emb, qv, k, exclude_id=qid).collect()
        }

    print(f"\n### recall@{k} @ {sf_dir} ({len(queries)}-query panel, "
          f"k_coarse={k_coarse}, m=8, k_sub=16)\n")
    print("| n_probe | rerank=0 (ADC only) | rerank=50 | rerank=100 |")
    print("|---|---|---|---|")
    for n_probe in n_probes:
        cells = []
        for rerank in (None, 50, 100):
            got = S.ivfpq_topk_indexed_batch(
                spark, path, queries, k=k, n_probe=n_probe,
                rerank=rerank, emb=emb,
            ).collect()
            by_q: dict[int, set[int]] = {}
            for r in got:
                by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
            rec = sum(
                len(by_q.get(q, set()) & exact[q]) / k for q, _ in queries
            ) / len(queries)
            cells.append(f"{rec:.3f}")
        print(f"| {n_probe} | {cells[0]} | {cells[1]} | {cells[2]} |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default="/root/testdata/sf0.01,/root/testdata/sf0.1")
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--k-coarse", type=int, default=8)
    ap.add_argument("--n-probes", default="1,2,4,8")
    args = ap.parse_args()
    probes = tuple(int(x) for x in args.n_probes.split(","))
    for sf_dir in args.sf_dirs.split(","):
        sweep(sf_dir.strip(), args.n_queries, args.k_coarse, probes)


if __name__ == "__main__":
    main()
