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


# ---------------------------------------------------------------------------
# JDBC adapter (sources.jdbc_table) against the Derby driver that
# ships in Spark's jars — a REAL in-process database, no network.
# ---------------------------------------------------------------------------

import pytest as _pytest


@_pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create a Derby database with a flights table via the JVM's
    JDBC API (the same classloader Spark's JDBC source uses)."""
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    except Exception:
        _pytest.skip("no embedded JDBC driver available")
    db = str(tmp_path_factory.mktemp("derby") / "flightsdb")
    url = f"jdbc:derby:{db};create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE flights (flight INT, t INT, alt DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO flights VALUES (?, ?, ?)")
    for f in range(1, 5):
        for t in range(10):
            ps.setInt(1, f)
            ps.setInt(2, t)
            ps.setDouble(3, 100.0 * f + t)
            ps.executeUpdate()
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


def test_jdbc_plain_scan(spark, derby_url):
    from ngafid_cpat_spark.sources import jdbc_table

    df = jdbc_table(spark, derby_url, "flights")
    assert df.count() == 40
    assert sorted(c.lower() for c in df.columns) == ["alt", "flight", "t"]


def test_jdbc_filter_pushdown_reaches_scan(spark, derby_url):
    """The reference's S1 'WHERE flight = ?' point query (main.py:29)
    must arrive at the database, not be filtered in Spark: the scan
    node's pushed-filter list carries the predicate."""
    from pyspark.sql import functions as F

    from ngafid_cpat_spark.sources import jdbc_table

    df = jdbc_table(spark, derby_url, "flights").filter(F.col("FLIGHT") == 2)
    assert df.count() == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "FLIGHT" in plan.split("PushedFilters")[1][:200]


def test_jdbc_partitioned_read(spark, derby_url):
    """Stride partitioning on a numeric column: one cursor per
    partition, union of stripes = whole table (rows outside the
    bounds still arrive through the unbounded edge stripes)."""
    from ngafid_cpat_spark.sources import jdbc_table

    df = jdbc_table(
        spark, derby_url, "flights",
        partition_column="FLIGHT", lower_bound=1, upper_bound=5,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40


def test_jdbc_predicate_slices(spark, derby_url):
    """Explicit disjoint predicate slices — the reference's per-batch
    work queue mapped to one partition per slice."""
    from ngafid_cpat_spark.sources import jdbc_table

    df = jdbc_table(
        spark, derby_url, "flights",
        predicates=["FLIGHT <= 2", "FLIGHT > 2"],
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 40


def test_jdbc_param_validation(spark):
    from ngafid_cpat_spark.sources import jdbc_table

    with _pytest.raises(ValueError, match="not both"):
        jdbc_table(spark, "jdbc:derby:x", "t",
                   predicates=["a=1"], partition_column="a")
    with _pytest.raises(ValueError, match="requires"):
        jdbc_table(spark, "jdbc:derby:x", "t", partition_column="a")
