"""Data-layout keys: Z-order (Morton) interleaving.

The multi-dimensional clustering technique lakehouse table formats
expose as OPTIMIZE ... ZORDER BY: sorting files by the bit-interleave
of two (or more) columns makes every contiguous key range a bounded
RECTANGLE in the original dimensions, so parquet row-group min/max
stats prune scans filtered on EITHER column — a plain lexicographic
sort only prunes its leading column. Public technique (Morton 1966;
standard in Delta Lake / Iceberg / ClickHouse docs).

Pure integer bit arithmetic (shifts, masks, or) built as ONE parsed
SQL expression (the dot_literal doctrine: a string expr folds into
whole-stage codegen; a Column-API fold of 2*bits ops costs py4j
round-trips per call site) — and the same formula is valid DuckDB
SQL, so layout keys are strict-oracle-pairable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The Morton interleave of two non-negative integer expressions
    as an engine-portable SQL string: bit i of x lands at position
    2*i, bit i of y at 2*i+1 (y-major within a pair, the common
    convention). ``bits`` per dimension (result uses 2*bits bits;
    keep bits <= 31 so the BIGINT stays positive). Callers must
    pre-reduce the inputs to [0, 2^bits) — pmod or range scaling."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    # every term fully parenthesized: SQL gives `+` HIGHER precedence
    # than `<<`, so an unparenthesized `a << 0 + b << 2` parses as
    # a << (0 + b) << 2 — runaway shifts (DuckDB raised an overflow;
    # Spark would silently wrap, worse)
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(x_expr: str, y_expr: str, bits: int = 16) -> Column:
    """zorder_key_sql as a Spark Column (one parsed expression —
    codegen-foldable, zero py4j fan-out)."""
    return F.expr(zorder_key_sql(x_expr, y_expr, bits))


def zorder_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-python reference interleave (tests pin the SQL against
    it bit-for-bit)."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


# ---------------------------------------------------------------------------
# Hilbert curve keys
# ---------------------------------------------------------------------------

def _hilbert_level_exprs(s: int) -> dict[str, str]:
    """One xy2d level (side ``s``) as engine-neutral SQL over the
    previous level's __hx/__hy/__hd columns. The quadrant index
    (3*rx) XOR ry enters as a CASE lookup — no engine-specific xor
    operator — and the rotation is the standard flip+swap:

      rx, ry = bit s of x / y
      d += s*s * quad(rx, ry)            quad: 00->0 01->1 11->2 10->3
      if ry == 0: (flip both if rx) then swap x/y
    """
    rx = f"(CASE WHEN (__hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (__hy & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
    )
    nx = (
        f"(CASE WHEN {ry} = 1 THEN __hx "
        f"WHEN {rx} = 1 THEN {s} - 1 - __hy ELSE __hy END)"
    )
    ny = (
        f"(CASE WHEN {ry} = 1 THEN __hy "
        f"WHEN {rx} = 1 THEN {s} - 1 - __hx ELSE __hx END)"
    )
    return {
        "__hd": f"(__hd + CAST({s} AS BIGINT) * {s} * {quad})",
        "__hx": nx,
        "__hy": ny,
    }


def hilbert_cols(df, x_expr: str, y_expr: str, bits: int = 16, out: str = "hkey"):
    """Hilbert-curve distance of (x, y) on the 2^bits grid as column
    ``out`` (Hilbert 1891; the xy2d bit recipe is standard public
    material). Unlike the Morton key this can't be ONE expression —
    each level's rotation consumes the previous level's state — so
    it unrolls as a withColumn chain (still pure integer CASE/shift
    arithmetic, fully codegen-foldable, zero UDFs). Same
    bounded-square bucket property as Z-order (the top 2k key bits
    name a level-k subsquare), plus the Hilbert extra: CONSECUTIVE
    key ranges are spatially adjacent (no Morton quadrant jumps), so
    range scans touch contiguous regions. Callers pre-reduce inputs
    to [0, 2^bits)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    d = (
        df.withColumn("__hx", F.expr(f"CAST({x_expr} AS BIGINT)"))
        .withColumn("__hy", F.expr(f"CAST({y_expr} AS BIGINT)"))
        .withColumn("__hd", F.expr("CAST(0 AS BIGINT)"))
    )
    for lvl in range(bits - 1, -1, -1):
        ex = _hilbert_level_exprs(1 << lvl)
        # one select per level: the three state columns update
        # SIMULTANEOUSLY from the previous level (sequential
        # withColumn would feed nx the already-updated ny)
        d = d.select(
            *[c for c in d.columns if c not in ("__hx", "__hy", "__hd")],
            F.expr(ex["__hx"]).alias("__hx"),
            F.expr(ex["__hy"]).alias("__hy"),
            F.expr(ex["__hd"]).alias("__hd"),
        )
    return d.withColumn(out, F.col("__hd")).drop("__hx", "__hy", "__hd")


def hilbert_cte_sql(
    relation: str, x_expr: str, y_expr: str, keep: str, bits: int = 16,
) -> str:
    """The same unrolled xy2d chain as DuckDB CTE levels over
    ``relation``; final CTE is ``hilb`` with ``keep`` columns plus
    ``hkey`` — byte-for-byte the arithmetic hilbert_cols runs, so
    layout queries stay strict-oracle-paired.

    ``keep`` is REQUIRED and must name explicit columns: every level
    re-emits ``keep`` alongside fresh __hx/__hy/__hd state columns,
    so ``*`` would duplicate the state columns at level 1 and make
    every later reference ambiguous."""
    if "*" in keep:
        raise ValueError(
            "hilbert_cte_sql keep must list explicit columns, not '*': "
            "each CTE level re-emits keep plus the __hx/__hy/__hd state "
            "columns, and '*' would duplicate them"
        )
    parts = [
        f"h0 AS (SELECT {keep}, CAST({x_expr} AS BIGINT) AS __hx, "
        f"CAST({y_expr} AS BIGINT) AS __hy, CAST(0 AS BIGINT) AS __hd "
        f"FROM {relation})"
    ]
    n = 0
    for lvl in range(bits - 1, -1, -1):
        ex = _hilbert_level_exprs(1 << lvl)
        n += 1
        parts.append(
            f"h{n} AS (SELECT {keep}, {ex['__hx']} AS __hx, "
            f"{ex['__hy']} AS __hy, {ex['__hd']} AS __hd FROM h{n - 1})"
        )
    parts.append(f"hilb AS (SELECT {keep}, __hd AS hkey FROM h{n})")
    return ", ".join(parts)


def hilbert_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-python xy2d reference (tests pin the SQL against it)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d
