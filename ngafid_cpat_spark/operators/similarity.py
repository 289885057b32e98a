"""Similarity search over embedding columns.

ANN building blocks (SURVEY.md §2.11): brute-force cosine top-k as
the exact baseline, plus two scale paths — random-hyperplane LSH
bucketing and an IVF-style coarse quantizer — that turn the scan into
a bucket-pruned search. Both scale paths keep the same argmin/top-k
tail so results are directly comparable to the exact baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine vs a constant query vector. The dot
    product folds to a codegen'd expression (no UDF, no broadcast
    needed for a single vector); global top-k via orderBy+limit is a
    TakeOrdered — no full sort at scale."""
    scored = emb.select(
        F.col(id_col),
        F.round(V.cosine_literal(vec_col, query), 6).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def lsh_bucket_assignments(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of dot(v, plane_i) packed into
    a bucket id. Vectors in the same bucket are near in angle with
    high probability; near-dup search joins within buckets only."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = (V.dot_literal(vec_col, p) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (map-side argmin over a literal codebook), search only the
    ``n_probe`` centroids nearest the query. Approximate: recall
    depends on codebook quality; tests measure it against
    cosine_topk. At scale the assignment is a write-time partition
    key, making a probe a partition-pruned scan."""
    # nearest centroid per vector: fold argmin over literal centroids
    best_cid, best_sim = None, None
    for cid, cvec in centroids:
        sim = V.cosine_literal(vec_col, cvec)
        if best_cid is None:
            best_cid, best_sim = F.lit(cid), sim
        else:
            cond = sim > best_sim
            best_cid = F.when(cond, F.lit(cid)).otherwise(best_cid)
            best_sim = F.when(cond, sim).otherwise(best_sim)
    assigned = emb.withColumn("centroid_id", best_cid)

    # pick the n_probe centroids closest to the query (driver-side,
    # codebook is tiny by construction)
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    probes = [cid for cid, cvec in sorted(centroids, key=lambda c: -cos(query, c[1]))[:n_probe]]
    pruned = assigned.filter(F.col("centroid_id").isin(probes))
    return cosine_topk(pruned, query, k, id_col=id_col, vec_col=vec_col)
