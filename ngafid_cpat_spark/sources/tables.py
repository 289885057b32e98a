"""Table registry + readers for the driver testdata star schema.

Mirrors the reference's sources (SURVEY.md §2.1): the reference issues
per-flight JDBC point queries (reference main.py:27-37) and positional
CSV parses (main.py:163-183); here every table is a single columnar
parquet scan — predicate pushdown, column pruning and partition
pruning come free from the DataSource V2 parquet reader, so callers
just ``load(...)`` and ``.filter(...)/.select(...)`` declaratively.

CSV dimension loading (the reference's Airports.csv/AirportsDetailed.csv
positional parse, main.py:168-182) is generalized by ``read_csv`` with
an explicit schema — never inferred, never positional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that are always safe to broadcast in joins.
# (customer/part grow with SF but stay dimension-sized relative to
# lineitem; on a 100 TB cluster re-evaluate against the 64 MB
# autoBroadcastJoinThreshold — Spark will fall back to shuffle joins
# automatically if they outgrow it.)
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy: filters/projections compose into
    the scan (PushedFilters / ReadSchema in .explain()).

    events.parquet stores TIMESTAMP(NANOS) which the Spark parquet
    reader rejects; read it as raw nanos and floor-truncate to a
    microsecond timestamp (bit-identical to DuckDB's ns->us read)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Explicit-schema CSV reader (vs reference's split(',')+float()
    positional parse, main.py:171-181)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Explicit-schema JSON-lines reader. Schema is mandatory: an
    inferred schema costs an extra full scan and can drift between
    files at scale."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same DataSource V2 pushdown/pruning surface as
    parquet (PushedFilters / ReadSchema in .explain())."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
