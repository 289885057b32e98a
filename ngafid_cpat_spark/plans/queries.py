"""Unified query registry: name -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL for every SQL-expressible entry.

Import order matters only for registration side effects; relational
defines the registry, extensions appends to it.
"""

from __future__ import annotations

from . import breadth as _breadth  # noqa: F401  (registers)
from . import extensions as _extensions  # noqa: F401  (registers)
from . import pipeline as _pipeline  # noqa: F401  (registers)
from . import relational as _relational  # noqa: F401
from . import timeseries as _timeseries  # noqa: F401  (registers)  (registers)
from . import tpch_extra as _tpch_extra  # noqa: F401  (registers)
from .relational import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
