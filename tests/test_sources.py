"""Source-layer tests: table registry, CSV with explicit schema
(the reference's Airports.csv positional parse, S4/S5), nanos
timestamp handling."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ngafid_cpat_spark import sources

SF_DIR = "/root/testdata/sf0.001"


def test_load_registry_rejects_unknown(spark):
    with pytest.raises(KeyError):
        sources.load(spark, SF_DIR, "bogus")


def test_events_ts_normalized_to_timestamp(spark):
    """Whatever the parquet logical type of events.ts, load() yields
    one UTC TIMESTAMP column (normalize_event_time choke point)."""
    ev = sources.load(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0


def test_normalize_event_time_all_encodings(spark, tmp_path):
    """The same instant written as TIMESTAMP(NANOS), TIMESTAMP_NTZ
    and TIMESTAMP must normalize to identical UTC timestamps."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ngafid_cpat_spark.sources.tables import normalize_event_time

    instants = [
        datetime.datetime(2024, 3, 1, 12, 30, 15, 250000),
        datetime.datetime(2024, 3, 2, 0, 0, 0, 0),
    ]
    micros = [int(d.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for d in instants]

    encodings = {
        "nanos": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
        "ntz": pa.array(micros, pa.timestamp("us")),
        "ltz": pa.array(micros, pa.timestamp("us", tz="UTC")),
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = {}
    for name, arr in encodings.items():
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.table({"ts": arr}), p)
        df = normalize_event_time(spark.read.parquet(p))
        assert dict(df.dtypes)["ts"] == "timestamp", name
        got[name] = sorted(r["ts"] for r in df.collect())
    assert got["nanos"] == got["ntz"] == got["ltz"] == sorted(instants)


def test_read_csv_explicit_schema(spark, tmp_path):
    # an Airports.csv-shaped dim (reference main.py:168-174), read
    # with a declared schema instead of positional split+float
    p = tmp_path / "airports.csv"
    p.write_text(
        "airport_code,airport_name,city,state_code,latitude,longitude,elevation_ft\n"
        'KAAA,"Alpha Field","Springfield",IL,40.0,-85.0,800\n'
        "KBBB,Bravo,Metropolis,NY,41.0,-86.0,900\n"
    )
    schema = StructType([
        StructField("airport_code", StringType()),
        StructField("airport_name", StringType()),
        StructField("city", StringType()),
        StructField("state_code", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("elevation_ft", DoubleType()),
    ])
    df = sources.read_csv(spark, str(p), schema)
    rows = {r["airport_code"]: r for r in df.collect()}
    assert rows["KAAA"]["airport_name"] == "Alpha Field"  # quoted field
    assert rows["KAAA"]["latitude"] == 40.0               # typed, not str
    assert rows["KBBB"]["elevation_ft"] == 900.0
    assert df.schema == schema


def test_all_tables_load(spark):
    for t in sources.TABLES:
        df = sources.load(spark, SF_DIR, t)
        assert len(df.columns) > 0


def test_jsonl_roundtrip(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ngafid_cpat_spark.sources.tables import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    )
    p = str(tmp_path / "j")
    write_jsonl(df, p)
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    back = read_jsonl(spark, p, schema)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    from ngafid_cpat_spark.sources.tables import read_orc, write_orc

    df = spark.createDataFrame([{"id": i, "v": float(i)} for i in range(100)])
    p = str(tmp_path / "o")
    write_orc(df, p)
    back = read_orc(spark, p).filter("id > 90")
    assert back.count() == 9
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)]" in buf.getvalue()
