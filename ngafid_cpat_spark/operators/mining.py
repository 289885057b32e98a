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


# ---------------------------------------------------------------------------
# Portable HyperLogLog (md5-register, strict-oracle-replayable)
# ---------------------------------------------------------------------------

HLL_P = 6                     # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_RMAX = 31                 # 5-bit register saturation (Flajolet 2007)
# alpha_64 = 0.7213 / (1 + 1.079/64) as the exact rational
# 7213/10000 * 64000/65079 = 461632000/650790000 = 230816/325395
HLL_ALPHA_NUM = 230816
HLL_ALPHA_DEN = 325395
assert 0.70 < HLL_ALPHA_NUM / HLL_ALPHA_DEN < 0.71
# linear-counting table: round(m * ln(m / V)) for V = 1..m — ln is
# transcendental, so it enters as 64 precomputed INTEGER literals
# instead of a libm call that may differ across engines in the last
# ulp right at a rounding boundary.
import math as _math  # noqa: E402

HLL_LC = [round(HLL_M * _math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def _hll_hash_sql(item_expr: str, duck: bool) -> str:
    """60-bit md5-derived hash of the salted item — the register
    index is hash % m and the rho argument is hash DIV m (54 bits).
    Same md5km idiom as the CMS / minhash families."""
    if duck:
        return (
            f"CAST(concat('0x', substr(md5(concat('hll:', "
            f"CAST({item_expr} AS VARCHAR))), 1, 15)) AS BIGINT)"
        )
    return (
        f"cast(conv(substr(md5(concat('hll:', cast({item_expr} as string)"
        f")), 1, 15), 16, 10) as bigint)"
    )


def hll_rho_sql(item_expr: str, duck: bool = False) -> tuple[str, str]:
    """(register_index_sql, rho_sql) for one item expression, valid
    on Spark (duck=False) or DuckDB (duck=True). rho = 1 + number of
    leading zero bits of the 54-bit remainder, saturated at
    HLL_RMAX — computed by a generated integer comparison ladder
    (no log2: libm log2 of 2^k - 1 can round up to k)."""
    h = _hll_hash_sql(item_expr, duck)
    j = f"(({h}) % {HLL_M})"
    w = f"(({h}) // {HLL_M})" if duck else f"(({h}) div {HLL_M})"
    # w has 54 usable bits; rho = 55 - bit_length(w), capped at RMAX.
    # Ladder only needs thresholds down to rho = RMAX - 1: anything
    # smaller saturates.
    branches = " ".join(
        f"WHEN {w} >= {1 << (54 - r)} THEN {r}"
        for r in range(1, HLL_RMAX)
    )
    rho = f"(CASE {branches} ELSE {HLL_RMAX} END)"
    return j, rho


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Per-group HLL register frame: (group_cols..., j, rho) with
    rho = MAX over the group's items — m rows per group at most, the
    fixed-size MERGEABLE distinct-count summary (union of sketches =
    elementwise register max, so any rollup level derives from this
    layer by re-aggregating max(rho), never rescanning the keys).
    Construction is one map-side-combining groupBy on
    (group, j): partial aggregation collapses every partition to at
    most groups x m rows before the shuffle."""
    j_sql, rho_sql = hll_rho_sql(item_col, duck=False)
    return (
        df.select(
            *group_cols,
            F.expr(j_sql).cast("int").alias("j"),
            F.expr(rho_sql).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimate per group from a register frame
    (merging register frames first is just max(rho) over (group, j)).

    Pure integer arithmetic, identical on every engine: the harmonic
    sum S = sum_j 2^(RMAX - rho_j) (+ 2^RMAX per zero register) is
    exact in BIGINT (<= m * 2^RMAX = 2^37), and the raw estimate
    alpha * m^2 / 2^-RMAX-normalized-S is one decimal floor
    division whose exactness is argued at the cast sites below —
    asserted bit-for-bit by the DuckDB twin's HUGEINT //.
    Small-range (E <= 2.5m, V > 0) switches to linear counting via
    the HLL_LC integer table. Returns (group_cols..., approx_users
    BIGINT) — raw-HLL bias beyond the 5-bit saturation point
    (n >> m * 2^RMAX ~ 1.4e11 per group) is out of test range and
    documented."""
    zero = F.lit(1 << HLL_RMAX).cast("long")
    per = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_RMAX} - rho)")
        ).alias("__s_hit"),
        F.count(F.lit(1)).alias("__m_hit"),
    )
    v = F.lit(HLL_M) - F.col("__m_hit")
    s = (F.col("__s_hit") + v * zero).cast("long")
    # decimal(19,0) / decimal(17,0) -> decimal(37,18): precision 37
    # <= 38 so Spark applies NO precision-loss adjustment and the
    # HALF_UP rounding sits at 1e-18, below the 1/den >= 2.2e-17
    # gap (den = 325395 * S <= 325395 * 2^37 ~ 4.5e16) — floor is
    # the true integer quotient. (decimal(38,0) on both sides would
    # adjust to scale 6 and could round a x.9999997 quotient UP
    # past the floor.)
    num = F.lit(HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RMAX)).cast(
        "decimal(19,0)"
    )
    den = (F.lit(HLL_ALPHA_DEN) * s).cast("decimal(17,0)")
    raw = F.floor(num / den).cast("long")
    lc = F.try_element_at(
        F.array(*[F.lit(x).cast("long") for x in HLL_LC]), v.cast("int")
    )
    est = F.when(
        (raw <= F.lit(int(2.5 * HLL_M))) & (v > 0), lc
    ).otherwise(raw)
    return per.select(*group_cols, est.alias("approx_users"))


def hll_estimate_duck_sql(reg_rel: str, group_cols: list[str]) -> str:
    """DuckDB twin of hll_estimate over a register relation
    (group..., j, rho): HUGEINT // replays the same integers."""
    g = ", ".join(group_cols)
    lc_list = ", ".join(str(x) for x in HLL_LC)
    num = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RMAX)
    return f"""
    SELECT {g},
           CAST(CASE WHEN raw <= {int(2.5 * HLL_M)} AND v > 0
                THEN [{lc_list}][CAST(v AS INT)]
                ELSE raw END AS BIGINT) AS approx_users
    FROM (
      SELECT {g}, v,
             CAST({num}::HUGEINT //
                  ({HLL_ALPHA_DEN}::HUGEINT * s) AS BIGINT) AS raw
      FROM (
        SELECT {g},
               {HLL_M} - COUNT(*) AS v,
               SUM(CAST(1 AS BIGINT) << ({HLL_RMAX} - rho))
                 + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {HLL_RMAX})
                 AS s
        FROM {reg_rel} GROUP BY {g}
      )
    )
    """
