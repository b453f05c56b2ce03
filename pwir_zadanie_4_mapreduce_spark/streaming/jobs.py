"""Structured Streaming jobs over the events table.

Each job reads the same parquet fixture through ``readStream`` (a
file source: each file is a micro-batch) and runs the streaming
counterpart of a batch query from operators/relational.py. Watermarks
bound state: at 100 TB/day of events the windowed-aggregation state
store would otherwise grow without limit.

``run_*`` helpers drive the query to completion against the static
fixture with a memory sink (processAllAvailable) and return the
result as a DataFrame — used by tests to diff streaming vs batch.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table, table_path
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = load_table(spark, sf_dir, "events").schema
    return spark.readStream.schema(schema).parquet(table_path(sf_dir, "events"))


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling 1h window ≡ events_tumbling_hourly (batch)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dround(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    return _run_to_memory(agg, "complete")


def run_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding window (1h / 30m) ≡ events_sliding_1h_30m."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    return _run_to_memory(agg, "complete")


def run_sessionization_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30 min gap) per user.

    Uses the native session_window state operator — the streaming
    equivalent of the batch lag/cumsum sessionization. Emits one row
    per (user, session) with the event count.
    """
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    return _run_to_memory(agg, "complete")
