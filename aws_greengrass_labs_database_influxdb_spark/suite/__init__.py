"""Declared query suite: every operator claimed done registers here.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. The driver hash-compares both at sf=0.01 (order-insensitive,
columns sorted by name) — so every computed column is aliased
identically on both sides, float outputs are either bit-parity
(identical IEEE expression trees / exact decimal arithmetic) or
explicitly rounded on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    """Register a suite query (and its DuckDB oracle, if expressible)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all suite modules (they self-register)."""
    from . import timeseries  # noqa: F401
    from . import relational  # noqa: F401
    from . import ext  # noqa: F401
    from . import frontend  # noqa: F401
    from . import bench_ops  # noqa: F401
    from . import aux  # noqa: F401
