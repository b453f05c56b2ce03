"""Registry wiring operator implementations to their DuckDB oracles.

Contract (driver, __spark_entry__.py): every query name maps to a
callable ``(spark, sf_dir) -> DataFrame``; oracle SQL — when the
semantics are ANSI-SQL-expressible — runs on DuckDB views named after
the parquet tables. Column names AND types should match: every
computed column is aliased identically on both sides, doubles are
rounded to 4 decimals on both sides (cross-engine float aggregation
differs in the last ULPs; identical rounding makes the value-hash
robust), and DuckDB's wider default types (BIGINT counts from len(),
HUGEINT sums) are cast down to match Spark's.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` means rows-only driver check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
