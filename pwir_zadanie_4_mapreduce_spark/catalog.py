"""Catalog: load the driver-supplied parquet tables for a scale factor.

Tables (TESTDATA.md / FIXTURES.md §1): region nation customer supplier
part orders lineitem events documents embeddings.

Scale notes (100 TB design):
- parquet scans get predicate pushdown + column pruning from Catalyst;
  queries must `select` only needed columns so ReadSchema stays narrow.
- the small dimension tables (region/nation/supplier/part/customer at
  low SF) are broadcast-join candidates; `dims()` exposes which, so
  operators can wrap them in `F.broadcast` explicitly rather than
  trusting autoBroadcastJoinThreshold at tiny SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

# Tables small enough (bounded cardinality independent of fact growth)
# to broadcast even at 100 TB fact scale.
BROADCAST_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS) —
        # which Spark 4 refuses to read natively — or TIMESTAMP(MICROS).
        # Sniff the footer (driver-side, cheap) and only flip the
        # session-global nanosAsLong conf when the NANOS variant is
        # actually present; with it the nanos column surfaces as int64,
        # truncated here to µs (the same truncation DuckDB applies
        # casting ns → TIMESTAMP).
        path = table_path(sf_dir, name)
        if _parquet_ts_unit(path) in ("ns", None):
            # None = footer unreadable from the driver (e.g. dir-style
            # dataset); keep the historically-safe conf in that case.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # session runs UTC, so NTZ → TIMESTAMP is value-preserving;
            # keeps unix_millis/unix_timestamp-based queries working and
            # matches the type the nanos path has always produced.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type != "timestamp":
            raise ValueError(
                f"events.ts has unsupported type {ts_type!r}; expected "
                "parquet TIMESTAMP(NANOS) (bigint via nanosAsLong), "
                "TIMESTAMP(MICROS), or TIMESTAMP_NTZ"
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def _parquet_ts_unit(path: str) -> str | None:
    """Return the parquet `ts` column's timestamp unit ('ns'/'us'/'ms')
    from the file footer, or None if it cannot be determined."""
    try:
        import pyarrow.parquet as pq

        return getattr(pq.read_schema(path).field("ts").type, "unit", None)
    except Exception:
        return None


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, key: str = None) -> DataFrame:
    """Repartition a small-but-CPU-heavy frame across the cluster.

    The fixture parquet files are single row groups — one scan split no
    matter how low maxPartitionBytes goes — so any per-row-expensive
    stage directly above a scan (shingling, signature hashing, Arrow
    decode) runs on ONE core unless the rows are spread first. ~MBs of
    shuffle buys full parallelism (measured 2× on the sf0.1 shingle
    pass). At 100 TB inputs arrive in thousands of splits and this is
    a no-op-sized rebalance."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, key) if key else df.repartition(par)
