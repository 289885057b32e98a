"""Event-time normalization helpers.

The reference keeps exactly one ordered ``time`` column (reference
main.py:36) and therefore exactly one place where time semantics
live. The driver testdata's ``events.ts`` parquet encoding has
shipped as TIMESTAMP(NANOS), TIMESTAMP_NTZ (timestamp[us], no tz)
and plain TIMESTAMP across generations, so event-time -> epoch
extraction must not assume a physical dtype. ``epoch_seconds`` is
that single abstraction; every rangeBetween frame / gap computation
goes through it instead of hand-casting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Event-time -> epoch seconds as DOUBLE (matches DuckDB
    ``epoch(ts)``), regardless of the column's physical type:

      * TIMESTAMP (ltz)     casts directly;
      * TIMESTAMP_NTZ       first reinterprets the wall clock as a
                            UTC instant (sessions are pinned to UTC:
                            session.py and sources.tables.load both
                            set ``spark.sql.session.timeZone``);
      * numeric epoch secs  round-trips unchanged (long/double ->
                            timestamp is seconds-since-epoch).

    A single ``cast`` chain keeps this inside whole-stage codegen —
    no UDF, no per-row Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")
