"""Format readers/writers with scale-safe defaults.

- parquet is the primary format: columnar, predicate pushdown,
  column pruning, per-file stats for partition pruning.
- csv/json readers take an explicit schema — schema inference is a
  full extra pass over 100 TB and nondeterministic under sampling.
- writes partition by a low-cardinality column when given, and never
  coalesce(1) (a single-writer sink is the classic anti-pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: StructType, header: bool = True) -> DataFrame:
    return spark.read.csv(path, schema=schema, header=header)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.json(path, schema=schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the second columnar format Spark ships natively;
    same pushdown/pruning properties as parquet (tested in
    tests/test_sources.py)."""
    df.write.mode(mode).orc(path)
