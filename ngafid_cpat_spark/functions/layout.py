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
