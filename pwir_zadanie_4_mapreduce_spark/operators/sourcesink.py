"""Connector round-trips: CSV and JSON-lines source/sink.

The reference's only sink is formatted text on stdout
(`laplace-seq.c:99-111` printPoints); these operators generalize that
into real columnar/text connectors: write a typed frame out, read it
back with an EXPLICIT schema (never inferSchema — a second scan and
type drift at scale), and aggregate the round-tripped data. The
DuckDB oracle computes the same aggregate from the original parquet,
so the check proves the sink+source pair is lossless for the carried
types (long, double, string, timestamp).

Sinks write under /tmp (driver-writable scratch), mode=overwrite so
re-runs are idempotent.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register

_SCRATCH = os.path.join(tempfile.gettempdir(), "spark_graft_roundtrips")


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_order
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source: orders written as headered CSV, read back
    with an explicit schema (timestamps included), aggregated. Proves
    the text round-trip is value-exact: Spark writes doubles in
    shortest-round-trip form and ISO timestamps, so the re-parsed
    aggregate hash-matches the oracle computed on the parquet
    original. 100 TB: CSV is the interchange format, not the storage
    format — no pushdown, no pruning, ~3-5x parquet scan cost; the
    explicit schema at least avoids the inferSchema double scan."""
    path = os.path.join(_SCRATCH, "orders_csv")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    orders.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
        ]
    )
    back = spark.read.schema(schema).option("header", True).csv(path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            # cents sum (r10 sf1 sweep: ~7.5e10 per priority flips the
            # 4th decimal on fold order) — value-exactness of the text
            # round-trip is still fully proven: FLOOR of the re-parsed
            # double only matches the oracle if every value survived.
            # No final ROUND — raw int64/1e2 quotient (r10 sf10 class)
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
                .cast("double")
                / 100.0
            ).alias("sum_price"),
            F.min("o_orderdate").alias("first_order"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source: events written as one JSON object per
    line, read back with an explicit schema. JSONL is the lingua
    franca of LLM-corpus interchange (one doc per line); the explicit
    schema keeps the read single-pass and type-stable. Doubles
    round-trip exactly (shortest-form printing both ways)."""
    path = os.path.join(_SCRATCH, "events_jsonl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dround(F.sum("value"), 4).alias("sum_value"),
            F.max("user_id").alias("max_user"),
        )
        .orderBy("event_type")
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source: lineitem columns written as ORC and read
    back (ORC is self-describing — no schema pass, unlike CSV/JSONL),
    aggregated to prove the round-trip is value-exact vs the parquet
    original. ORC is the second columnar interchange format a complete
    engine must speak; Spark's reader gives it the same pushdown +
    pruning + vectorization as parquet.

    100 TB note: columnar→columnar round-trips preserve types exactly
    (no text parsing); the write partitions like any other — never
    coalesce(1)."""
    path = os.path.join(_SCRATCH, "lineitem_orc")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_quantity"
    )
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            # cents sum (r10 sf1 sweep: ~1e11 per flag — fold-order class);
            # no final ROUND — raw int64/1e2 quotient (r10 sf10 class)
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)))
                .cast("double")
                / 100.0
            ).alias("sum_price"),
            dround(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "source_xml_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal), 4) AS sum_acctbal,
           CAST(MAX(c_custkey) AS BIGINT) AS max_custkey
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source via Spark 4's NATIVE xml data source (the
    spark-xml package folded into core): customer rows written as
    <row> elements, read back with an explicit schema and rowTag, and
    aggregated — value-exact vs the parquet original (shortest-form
    double printing both ways, same as JSON). XML is the remaining
    text interchange format an engine meets in enterprise feeds
    (the others here: CSV, JSONL).

    100 TB: like CSV/JSONL a row-text format — no pushdown, no
    pruning; the explicit schema avoids the inference scan, and the
    write stays partitioned (one .xml part per task, never
    coalesce(1))."""
    path = os.path.join(_SCRATCH, "customer_xml")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    (
        cust.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "row")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).format("xml").option("rowTag", "row").load(path)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            dround(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "source_text_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(len(text)) AS BIGINT) AS total_chars,
           CAST(COUNT(*) FILTER (text LIKE 'the %') AS BIGINT) AS n_the_prefix
    FROM documents
    """,
)
def source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text sink + source: the corpus written one document per
    line (`text` format — the single-string-column contract) and read
    back; the aggregate (line count, char volume, prefix screen) is
    computable from the text alone and hash-matches the parquet
    original. This is the rawest LLM-corpus interchange shape (a .txt
    shard per task); safe here because the fixture documents carry no
    embedded newlines — a real pipeline escapes or length-prefixes
    first (the JSONL roundtrip above is that safer spelling).

    100 TB: like CSV a schema-less text scan — no pushdown, no
    pruning, no types; one shard per task on write, never
    coalesce(1)."""
    path = os.path.join(_SCRATCH, "documents_text")
    docs = load_table(spark, sf_dir, "documents").select("text")
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path)  # single `value` column by contract
    return back.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.count(F.when(F.col("value").startswith("the "), 1)).alias("n_the_prefix"),
    )


@register(
    "source_schema_evolution",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (o_orderkey % 2 = 0) AS BIGINT) AS n_missing_priority,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written with
    DIFFERENT schemas — v1 (even keys) lacks the priority column, v2
    (odd keys) carries it — read back as ONE table via mergeSchema;
    v1's missing column surfaces as NULLs. This is the
    columns-added-over-time reality of any long-lived lake table, and
    explicit mergeSchema is the contract (schema-on-read, no rewrite
    of old files).

    The audit counts rows whose priority is absent — exactly the v1
    rows, which the oracle states as the key-parity predicate over the
    original table. 100 TB note: mergeSchema unions footer schemas at
    planning time; old files are never touched."""
    path = os.path.join(_SCRATCH, "orders_evolving")
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "batch=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "batch=v2"))
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(path, "batch=v1"), os.path.join(path, "batch=v2")
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias(
            "n_missing_priority"
        ),
        # fixed-point cents sum (round-9): see join_range_binned note;
        # no final ROUND — raw int64/1e2 quotient (r10 sf10 class)
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))) / 100.0
        ).alias("sum_price"),
    )
