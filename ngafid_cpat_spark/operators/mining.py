"""Mining / sketching primitives: frequent-pair mining (apriori) and
a count-min sketch with an exactly-replayable construction.

Part of the SURVEY §2.11 extension surface (the reference has no
mining operators). Both are built on the repo's portable-determinism
doctrine: integer counters and md5-derived hash rows that any engine
reproduces bit-for-bit, so even the SKETCH is strict-oracle-pairable
— the oracle replays the construction, not just a tolerance band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """Market-basket frequent-PAIR mining (the 2-itemset core of
    Agrawal & Srikant 1994's Apriori): item pairs co-occurring in at
    least ``min_support`` distinct baskets.

    Apriori pruning (lossless — a frequent pair's items are
    frequent): items below min_support leave the basket table via a
    semi-join BEFORE the pair fan, so a long tail of one-off items
    never enters the self-join. The pair fan itself is bounded by
    BASKET SIZE, not corpus size (per basket: |items|^2 / 2 rows —
    retail/order baskets are tens of items), and lands directly in a
    map-side-combining count, never a materialized pair list.

    Returns (item1, item2, support) with item1 < item2.
    """
    baskets = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    l1 = (
        baskets.groupBy("i")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") >= min_support)
        .select("i")
    )
    pruned = baskets.join(l1, "i", "left_semi")
    a = pruned.select(F.col("b"), F.col("i").alias("item1"))
    bb = pruned.select(F.col("b"), F.col("i").alias("item2"))
    return (
        a.join(bb, "b")
        .filter(F.col("item1") < F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_col(token_expr: str, j: int, width: int) -> str:
    """Engine-portable column index of ``token_expr`` in hash row j:
    8 md5 hex digits of the salted token as a BIGINT, mod width (the
    md5km twin the minhash/DSIR families use). Valid Spark AND DuckDB
    SQL given each engine's hex-parse idiom — this helper emits the
    SPARK form; cms_col_duck_sql the DuckDB form."""
    return (
        f"cast(conv(substr(md5(concat('cms{j}:', {token_expr})), 1, 8), "
        f"16, 10) as bigint) % {width}"
    )


def cms_col_duck_sql(token_expr: str, j: int, width: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('cms{j}:', {token_expr})), "
        f"1, 8)) AS BIGINT) % {width}"
    )


def cms_build(
    items: DataFrame,
    item_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over an item
    STREAM (rows with multiplicity): a depth x width integer counter
    matrix as a (j, c, cnt) frame — depth*width rows total, the
    fixed-size mergeable summary. Construction is one explode to
    depth rows per item + one map-side-combining groupBy on the
    (j, c) cell key (cardinality depth*width — partial aggregation
    collapses each partition to the matrix size before the shuffle,
    the approx_top_k shape). Hash rows are md5-salted and therefore
    DETERMINISTIC: unlike library sketches, this one's every counter
    is exactly replayable by an oracle."""
    cells = items.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.expr(_cms_col(item_col, j, width)).alias("c"),
                )
                for j in range(depth)
            ])
        ).alias("jc")
    )
    return (
        cells.select("jc.j", "jc.c")
        .groupBy("j", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``probes`` against a cms_build
    sketch: min over the depth rows of the probed cell counters —
    the CMS guarantee estimate >= true (never under), within
    2N/width of true with prob 1 - 2^-depth. The sketch is
    matrix-sized, so it broadcasts; probing is a map-side join.
    Returns the probe rows + ``cms_estimate``."""
    p = probes
    for j in range(depth):
        sj = sketch.filter(F.col("j") == j).select(
            F.col("c").alias(f"__c{j}"), F.col("cnt").alias(f"__cnt{j}")
        )
        p = p.withColumn(
            f"__c{j}", F.expr(_cms_col(item_col, j, width))
        ).join(F.broadcast(sj), f"__c{j}", "left")
    est = F.least(*[
        F.coalesce(F.col(f"__cnt{j}"), F.lit(0)) for j in range(depth)
    ])
    return p.withColumn("cms_estimate", est).drop(
        *[f"__c{j}" for j in range(depth)],
        *[f"__cnt{j}" for j in range(depth)],
    )
