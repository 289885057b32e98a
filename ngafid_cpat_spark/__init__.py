"""ngafid_cpat_spark — a from-scratch PySpark-native analytics engine.

Provides the query and data-processing capabilities of the reference
NGAFID "cpat" flight-approach analyzer (KeltonKarboviak/ngafid_cpat),
re-expressed Spark-first: DataFrame/Spark SQL plans optimized by
Catalyst, window-function segmentation instead of per-row state
machines, broadcast dimension joins instead of point lookups, and
column expressions instead of Python UDFs for all scalar math.

Layout
------
session     SparkSession builder tuned for local[N] testing and
            cluster-scale defaults (AQE, shuffle partitions, Arrow).
sources     Parquet/CSV readers with explicit schemas + table registry.
functions   Scalar column-expression libraries: geodesy (geo), text,
            vector (embedding similarity), json helpers.
operators   Reusable dataflow operators: windows (sessionization /
            gaps-and-islands / rolling), joins (nearest-neighbor,
            as-of, range), dedup (exact / minhash-LSH / simhash /
            shingle-jaccard), similarity (ANN top-k), textops,
            multimodal (binary column plumbing).
plans       End-to-end query plans: the relational/TPC-H-ish catalog
            (queries.py) and the flight approach/landing pipeline
            (approach.py) mirroring reference FlightAnalysis.py.
streaming   Structured Streaming variants (sessionization, windowed
            aggregation) over the events table.
sinks       Idempotent upsert sink (partition overwrite MERGE analog).
"""

__version__ = "0.1.0"
