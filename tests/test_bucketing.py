"""Bucketed (co-located) joins — the 100 TB shuffle-elimination story.

Writing both join sides bucketed by the join key lets Spark join them
with ZERO exchanges: each task reads matching buckets from both
tables. At 100 TB this converts the nightly fact-fact join from a
full-corpus shuffle into a local merge per bucket — the Spark
equivalent of the reference pre-partitioning its rows per rank
(laplace-par.c:245-251) so the sweep never reshuffles the grid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.plans import explain_str
from tests.conftest import SMOKE_SF

N_BUCKETS = 8


def _bucketed_tables(spark):
    if "li_bucketed" not in [t.name for t in spark.catalog.listTables()]:
        li = load_table(spark, SMOKE_SF, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = load_table(spark, SMOKE_SF, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        (
            li.write.mode("overwrite")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("li_bucketed")
        )
        (
            orders.write.mode("overwrite")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("orders_bucketed")
        )
    return spark.table("li_bucketed"), spark.table("orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        li, orders = _bucketed_tables(spark)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = explain_str(joined)
        # the join itself must not shuffle either side: the only
        # exchange allowed is the post-join aggregation's.
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, orders = _bucketed_tables(spark)
        bucketed = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        li0 = load_table(spark, SMOKE_SF, "lineitem")
        o0 = load_table(spark, SMOKE_SF, "orders")
        plain = (
            li0.join(o0, li0.l_orderkey == o0.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
