"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   smoke: flagship query at sf0.001, rows > 0.
queries()      every implemented operator from SURVEY.md §2 as
               (spark, sf_dir) -> DataFrame.
oracle_sql()   DuckDB-equivalent ANSI SQL per query (same column
               aliases; computed doubles rounded identically on both
               sides). As of r14, ALL 210 queries carry a strict
               oracle (minhash/simhash/CMS/HLL use cross-engine md5
               hash families; the trained-PQ / IVFADC quartet
               replays both Lloyd trainings + ADC as unrolled
               DuckDB CTEs; approximate quantiles are a
               deterministic bottom-k sample + rank-exact
               selection). Approximation-quality contracts (recall
               floors, rank-error and rsd bounds) live in pytest.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from ngafid_cpat_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q3-shaped filter + 3-way join + agg + top-k at
    sf0.001 (scan, filter, broadcast equi-join, hash agg, sort/limit
    in one plan — SURVEY.md §7 step 1)."""
    return QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
