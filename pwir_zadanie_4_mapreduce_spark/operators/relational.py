"""Relational operator surface (SURVEY.md §2.2).

Generalizes the reference's capability surface — partitioned map
(laplace-seq.c:193-198), filter (loop bounds :191-193), global
max-reduce (:200-203 / laplace-par.c:504), ordered sink (:99-111) —
into the full relational operator set, expressed declaratively so
Catalyst provides pushdown / pruning / broadcast / AQE for free.

Scale notes (100 TB):
- every query selects only needed columns → parquet ReadSchema stays
  narrow, and filters sit directly above the scan → PushedFilters.
- dimension joins (region/nation/supplier/customer) broadcast: the
  dims stay bounded while facts grow, so the join is shuffle-free on
  the fact side.
- aggregations are expressed as groupBy().agg() → Spark plans
  partial (map-side) + final hash aggregation, the distributed
  equivalent of the reference's local-max + MPI_Allreduce(MAX)
  (laplace-par.c:469-505).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register


def _r4(c: Column) -> Column:
    """Round doubles to 4 decimals — the cross-engine hash contract
    (dround reproduces DuckDB's double rounding exactly)."""
    return dround(c, 4)


# ---------------------------------------------------------------------------
# scan → filter → project → hash-agg → sort: the flagship (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                      AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0                                        AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                               * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000.0                                      AS sum_disc_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               * 10000 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000.0                                      AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                      AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                 AS avg_price,
           ROUND(AVG(l_discount), 4)                                      AS avg_disc,
           COUNT(*)                                                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter → project → partial+final hash agg → sort.

    Exercises the reference lifecycle (SURVEY.md §3.4): O3 filter,
    O6 arithmetic map, O8 reduce, O14 ordered sink. The three price
    sums reach ~2.8e10 per group at sf1 — past the double-sum
    fold-order threshold (r10 sf1 sweep catch) — so both engines sum
    fixed-point (cents for the raw price, 1e-4 grid for the discount/
    tax products); quantities are integral and the avgs divide by
    group size, so those stay plain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    base_c = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
    disc_c = F.floor(disc_price * 10000 + F.lit(0.5))
    charge_c = F.floor(charge * 10000 + F.lit(0.5))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            # NO final ROUND on the fixed-point quotients (r10 sf10
            # catch, migrated r11): past ~1e11 totals x*1e4 nears 2^53
            # and the engines' 4-decimal rounds diverge; the raw
            # int64/1e4 quotient is bit-identical at ANY scale.
            (F.sum(base_c).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(disc_c).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_c).cast("double") / 10000.0).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k (TPC-H Q3 shape).

    customer (filtered) broadcasts into orders, the join result
    broadcasts/shuffles into lineitem; at 100 TB the customer-filter
    side stays the broadcast candidate.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join across all dims (TPC-H Q5 shape); dims broadcast."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), (F.col("o_custkey") == dim.c_custkey)
              & (F.col("s_nationkey") == dim.c_nationkey))
        .groupBy("n_name")
        .agg(_r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "join_inner_orders_customer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, broadcast hash join on the bounded dim side."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_left_customer_order_counts",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 4) AS total_spend
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spend"),
        )
    )


@register(
    "join_full_outer_nation_activity",
    oracle="""
    SELECT COALESCE(c.n, s.n) AS n_nationkey, c.n_customers, s.n_suppliers
    FROM (SELECT c_nationkey AS n, COUNT(*) AS n_customers
          FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS n, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) s
    ON c.n = s.n
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nullable both sides)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("cn"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sn"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cust.join(supp, cust.cn == supp.sn, "full").select(
        F.coalesce("cn", "sn").alias("n_nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no duplication of the left side."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    f_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi")


@register(
    "join_anti_customers_without_p_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_anti_customers_without_p_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    p_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(p_orders, cust.c_custkey == p_orders.o_custkey, "left_anti")


@register(
    "join_range_ship_delay",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) AS n_late_lines,
           ROUND(SUM(l_extendedprice), 4) AS late_value
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    """,
)
def join_range_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: ship date > order date + 90 days.

    The range predicate rides on the equi-join hash key, so this stays
    a hash join (no cartesian) at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_late_lines"),
            _r4(F.sum("l_extendedprice")).alias("late_value"),
        )
    )


@register(
    "join_self_consecutive_orders",
    oracle="""
    SELECT a.o_custkey AS c_custkey,
           COUNT(*) AS n_same_status_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.o_orderstatus = b.o_orderstatus
    GROUP BY a.o_custkey
    """,
)
def join_self_consecutive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join — the relational form of the reference's stencil
    neighbor access (laplace-seq.c:196 reads the same array it writes)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderstatus")
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.o_orderstatus") == F.col("b.o_orderstatus")),
        )
        .groupBy(F.col("a.o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n_same_status_pairs"))
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@register(
    "agg_global_lineitem",
    oracle="""
    SELECT COUNT(*)                         AS n_rows,
           ROUND(SUM(l_quantity), 4)        AS sum_qty,
           ROUND(MIN(l_extendedprice), 4)   AS min_price,
           ROUND(MAX(l_extendedprice), 4)   AS max_price,
           ROUND(AVG(l_discount), 4)        AS avg_disc,
           COUNT(DISTINCT l_partkey)        AS n_parts
    FROM lineitem
    """,
)
def agg_global_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregation — generalizes the reference's
    global max-reduce O8 (laplace-par.c:504 MPI_Allreduce MAX)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        _r4(F.sum("l_quantity")).alias("sum_qty"),
        _r4(F.min("l_extendedprice")).alias("min_price"),
        _r4(F.max("l_extendedprice")).alias("max_price"),
        _r4(F.avg("l_discount")).alias("avg_disc"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "agg_distinct_per_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           ROUND(SUM(c_acctbal), 4) AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg with exact count-distinct (expand + two-phase agg)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            _r4(F.sum("c_acctbal")).alias("total_balance"),
        )
    )


@register(
    "agg_rollup_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _r4(F.sum("l_quantity")).alias("sum_qty"))
    )


@register(
    "agg_cube_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations. The grand-total cell sums
    ~3.75e11 at sf1 — past the magnitude where a double sum's fold
    order flips the 4th decimal (caught by the r10 sf1 sweep) — so
    both engines sum fixed-point cents."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            # no final ROUND: raw int64/1e2 quotient (see q1 note)
            (F.sum(cents).cast("double") / 100.0).alias("total"),
        )
    )


@register(
    "agg_approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
             <= COUNT(DISTINCT user_id) * 0.10 AS approx_in_band
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where an
    exact distinct's shuffle would dominate. rsd pinned for
    determinism.

    rsd=0.02, not tighter: Spark's HLL++ aggregation buffer is one
    LongType attribute per 64-bit register word, so the buffer row
    width grows 4× per rsd halving (rsd=0.01 → p=14 → 1536 buffer
    columns, ~12 KB per group in the partial-agg hash map — measured
    7× slower than rsd=0.02 on this query with identical results at
    this cardinality).

    Two-level aggregate, not a mixed distinct/non-distinct agg: mixing
    count_distinct with other aggregates makes Catalyst insert an
    Expand (row duplication per grouping-id) and runs the HLL update
    once per RAW row. Level 1 groups by (event_type, user_id) with
    map-side combine; level 2 then gets exact_users as a plain
    count(*) and feeds the HLL only DISTINCT pairs — identical
    estimate (HLL depends only on the distinct set), no Expand,
    ~25 % faster here and the canonical 100 TB shape.

    Bracket oracle (round-4 verdict #8, the agg_approx_percentile
    technique): the HLL++ estimate itself has no DuckDB twin, so the
    query emits the EXACT per-group distinct (hash-compared
    cross-engine) plus a boolean asserting the estimate lands within
    5× the configured rsd (2 % → ±10 % band, ≈5σ: deterministic for a
    fixed dataset, generous enough to never flap). The oracle attests
    DuckDB's own approx_count_distinct with the SAME ±10 % band —
    DuckDB's HLL error isn't calibrated to a tighter bound, and an
    asymmetric band could flip the oracle boolean alone at a new
    scale factor (round-9 ADVICE)."""
    ev = load_table(spark, sf_dir, "events")
    lvl1 = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count("*")
    return (
        lvl1.groupBy("event_type")
        .agg(
            F.sum("c").alias("n_events"),
            exact.alias("exact_users"),
            (
                (approx >= (exact * F.lit(0.90)).cast("long"))
                & (approx <= (exact * F.lit(1.10)).cast("long"))
            ).alias("approx_in_band"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        FROM orders)
    WHERE rk <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (deterministic tie-break)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "window_rank_dense_rank_price",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS price_dense_rank
    FROM part
    """,
)
def window_rank_dense_rank_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (gap vs no-gap semantics on ties)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
        .withColumn("price_rank", F.rank().over(w))
        .withColumn("price_dense_rank", F.dense_rank().over(w))
    )


@register(
    "window_lag_event_gap",
    oracle="""
    SELECT event_id, user_id,
           epoch_ms(CAST(ts AS TIMESTAMP))
             - epoch_ms(CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
             AS gap_ms
    FROM events
    """,
)
def window_lag_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic — the left/right neighbor of the reference's
    stencil (laplace-seq.c:196 points[i][j-1]) as an ordered window."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).alias("gap_ms"),
    )


@register(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum frame."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .select(
            "o_custkey",
            "o_orderkey",
            _r4(F.sum("o_totalprice").over(w)).alias("running_spend"),
        )
    )


@register(
    "window_sliding_avg_3",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS sliding_avg_3
    FROM events
    """,
)
def window_sliding_avg_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row-frame average (3-row trailing window)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .select("user_id", "event_id", _r4(F.avg("value").over(w)).alias("sliding_avg_3"))
    )


# ---------------------------------------------------------------------------
# sort / limit / distinct / set ops
# ---------------------------------------------------------------------------


@register(
    "topk_global_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge, no full sort at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", _r4(F.col("o_totalprice")).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "distinct_flag_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flag_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT → partial+final hash aggregate on the pair."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "setop_union_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 8000
    """,
)
def setop_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .union(c.filter(F.col("c_acctbal") > 8000).select("c_custkey"))
        .distinct()
    )


@register(
    "setop_intersect_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 2000
    """,
)
def setop_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(c.filter(F.col("c_acctbal") > 2000).select("c_custkey"))
    )


@register(
    "setop_except_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 2000
    """,
)
def setop_except_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .exceptAll(c.filter(F.col("c_acctbal") > 2000).select("c_custkey"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------


@register(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                          AS name_upper,
           SUBSTR(p_name, 1, 4)                   AS name_prefix,
           CAST(LENGTH(p_name) AS INTEGER)        AS name_len,
           p_brand || ':' || p_type               AS brand_type,
           (p_name LIKE '%widget%')               AS is_widget,
           regexp_extract(p_name, '^(\\w+)', 1)    AS first_word,
           CAST(array_length(string_split(p_name, ' ')) AS INTEGER) AS n_words
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: upper/substr/length/concat/like/regexp/split."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@register(
    "scalar_date_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS order_year,
           CAST(month(o_orderdate) AS INTEGER)   AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k
    FROM orders
    """,
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/quarter/date_trunc/datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
    )


@register(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 4)       AS abs_disc_delta,
           ROUND(SQRT(l_extendedprice), 4)        AS sqrt_price,
           ROUND(POW(l_quantity, 2), 4)           AS qty_sq,
           CAST(CEIL(l_extendedprice) AS BIGINT)  AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           ROUND(l_extendedprice, 1)              AS price_round1
    FROM lineitem
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/sqrt/pow/ceil/floor/round (IEEE-exact ops only,
    so cross-engine parity holds without tolerance)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _r4(F.abs(F.col("l_discount") - 0.05)).alias("abs_disc_delta"),
        _r4(F.sqrt("l_extendedprice")).alias("sqrt_price"),
        _r4(F.pow("l_quantity", 2)).alias("qty_sq"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        dround(F.col("l_extendedprice"), 1).alias("price_round1"),
    )


@register(
    "scalar_conditional_orders",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_display,
           (o_orderpriority = '1-URGENT') AS is_urgent
    FROM orders
    """,
)
def scalar_conditional_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN / NULLIF / COALESCE — generalizes
    the reference's boundary-value dispatch (laplace-common-impl.h:11-33)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_display"
        ),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    )


@register(
    "scalar_json_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) % 10) AS k_bucket
    FROM events
    """,
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on the string props column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("prop_k"), (k % 10).alias("k_bucket"))


@register(
    "scalar_array_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(array_length(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_component,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           list_contains(list_transform(embedding, x -> x > 0.2), true) AS has_large_component
    FROM embeddings
    """,
)
def scalar_array_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order family: size / element_at / aggregate / exists."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        _r4(F.element_at("embedding", 1).cast("double")).alias("first_component"),
        _r4(F.sqrt(sq_sum)).alias("l2_norm"),
        F.exists("embedding", lambda x: x > F.lit(0.2)).alias("has_large_component"),
    )


# ---------------------------------------------------------------------------
# event-time (streaming-shaped, batch semantics)
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch semantics identical to the
    streaming version in streaming/jobs.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _r4(F.sum("value")).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


@register(
    "events_sliding_1h_30m",
    oracle="""
    SELECT ws AS window_start, COUNT(*) AS n_events FROM (
        SELECT time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP))
               - k * INTERVAL 30 MINUTES AS ws
        FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(k))
    GROUP BY ws
    """,
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h size, 30m slide): each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "events_sessionization",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                         - epoch_ms(CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
                         > 1800000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events),
    sessions AS (
        SELECT user_id,
               SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps)
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a new session; cumsum
    assigns session ids (batch form of session_window)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    gaps = ev.withColumn(
        "is_new_session",
        F.when(
            (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > 1800000)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn("session_id", F.sum("is_new_session").over(wcum))
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS "view"
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) with a pinned category list
    — at scale an unpinned pivot needs an extra pass to discover keys."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    # pivot-count yields nulls for absent combos; the oracle's FILTER
    # yields 0 — align on 0.
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "error", "purchase", "signup", "view"]],
    )


# ---------------------------------------------------------------------------
# UDF surface (the deliberate slow path, kept off the hot queries)
# ---------------------------------------------------------------------------


@register(
    "udf_pandas_charge",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS charge
    FROM lineitem WHERE l_quantity > 40
    """,
)
def udf_pandas_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF — demonstrates the UDF surface on
    an expression the oracle can also state in SQL. Real engines keep
    this JVM-side; this query exists to verify the Python boundary."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    def _charge(price: "pd.Series", disc: "pd.Series", tax: "pd.Series") -> "pd.Series":
        return price * (1 - disc) * (1 + tax)

    # annotations passed explicitly: `from __future__ import annotations`
    # stringifies hints, which pyspark's hint inference can't resolve
    # against a locally-imported pandas.
    _charge.__annotations__ = {
        "price": pd.Series, "disc": pd.Series, "tax": pd.Series, "return": pd.Series
    }
    charge = pandas_udf(_charge, "double")

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _r4(charge("l_extendedprice", "l_discount", "l_tax")).alias("charge"),
    )


@register(
    "udf_grouped_zscore",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           CASE WHEN stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey) IS NULL
                  OR stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey) = 0
                THEN NULL
                ELSE ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                     / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 4)
           END AS balance_zscore
    FROM customer
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-nation z-score of account balance.

    Demonstrates the per-group pandas boundary (shuffle on the group
    key, Arrow both ways). NaN/inf normalized to NULL to match SQL."""
    import numpy as np
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["c_acctbal"].std(ddof=1)
        if std is None or not np.isfinite(std) or std == 0:
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = ((pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / std).round(4)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "balance_zscore": z,
            }
        )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return cust.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey bigint, c_nationkey int, balance_zscore double"
    )


# ---------------------------------------------------------------------------
# time-series resampling + funnel analytics over events
# ---------------------------------------------------------------------------


@register(
    "events_ohlc_15min",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
           ROUND((list(value ORDER BY ts, event_id))[1], 4)   AS open,
           ROUND(MAX(value), 4)                               AS high,
           ROUND(MIN(value), 4)                               AS low,
           ROUND((list(value ORDER BY ts DESC, event_id DESC))[1], 4) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY bucket_start ORDER BY bucket_start
    """,
)
def events_ohlc_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: 15-minute resample of the event value series
    — the canonical time-series rollup (metrics, tick data). open and
    close are min_by/max_by over (ts, event_id) — ties broken by
    event_id so the result is data-determined, not partition-
    determined. One groupBy; all five measures partial-aggregate
    map-side, so the shuffle carries one row per bucket per task
    regardless of corpus size. (Spark window(15 min) start aligns with
    DuckDB time_bucket: both snap to 900 s boundaries.)"""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    order = F.struct("ts", "event_id")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            dround(F.min_by("value", order), 4).alias("open"),
            dround(F.max("value"), 4).alias("high"),
            dround(F.min("value"), 4).alias("low"),
            dround(F.max_by("value", order), 4).alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("bucket_start"), "open", "high", "low", "close", "n_events")
        .orderBy("bucket_start")
    )


@register(
    "events_funnel_click_purchase",
    oracle="""
    WITH c AS (
        SELECT user_id, MIN(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY user_id),
    p AS (
        SELECT c.user_id, MIN(e.ts) AS first_purchase
        FROM c JOIN events e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
         AND e.ts >= c.first_click
        GROUP BY c.user_id)
    SELECT CAST(date_trunc('day', c.first_click) AS TIMESTAMP) AS cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_clickers,
           CAST(COUNT(p.first_purchase) AS BIGINT) AS n_purchasers,
           CAST(SUM(CASE WHEN p.first_purchase <= c.first_click + INTERVAL 1 HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_1h
    FROM c LEFT JOIN p ON p.user_id = c.user_id
    GROUP BY cohort_day ORDER BY cohort_day
    """,
)
def events_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per first-click cohort day, how many
    clickers ever purchased (after the click) and how many within an
    hour. Two per-user aggregations + one left join — the sequence
    predicate (purchase AFTER click) rides the join condition, so no
    per-user event list ever materializes (the naive collect_list-
    then-scan plan would ship every event; this ships one row per
    user)."""
    from pwir_zadanie_4_mapreduce_spark.functions.lineage import cut_lineage

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # r12 optimization round (guide §7.2): clicks feeds BOTH the
    # sequenced purchase join and the funnel left join — without a
    # checkpoint the events scan + per-user min agg planned twice.
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
        .transform(cut_lineage)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .join(clicks, (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") >= F.col("first_click")))
        .groupBy("p_user")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    funnel = clicks.join(purchases, clicks.user_id == purchases.p_user, "left")
    converted = (
        F.col("first_purchase") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR")
    ).cast("int")
    return (
        funnel.groupBy(F.date_trunc("day", "first_click").alias("cohort_day"))
        .agg(
            F.count("*").alias("n_clickers"),
            F.count("first_purchase").alias("n_purchasers"),
            F.coalesce(F.sum(converted), F.lit(0)).alias("n_converted_1h"),
        )
        .orderBy("cohort_day")
    )


@register(
    "events_session_paths",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                         - epoch_ms(CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
                         > 1800000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events),
    sessions AS (
        SELECT user_id, event_id, ts, event_type,
               SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps),
    paths AS (
        SELECT user_id, session_id,
               array_to_string(list(event_type ORDER BY ts, event_id), '>') AS path
        FROM sessions GROUP BY user_id, session_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the 20 most common within-session
    event-type sequences (same 30-min-gap sessionization as
    events_sessionization, totally ordered by (ts, event_id)).

    The per-session collect is bounded by session length (watermarked
    sessions are short by construction), so this is NOT the unbounded
    collect_list anti-pattern; the path histogram then aggregates to
    at most distinct-paths rows with map-side partials."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    sessions = ev.withColumn(
        "is_new_session",
        F.when(
            (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > 1800000)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("is_new_session").over(wcum))
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s.event_type,
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@register(
    "supplier_leadtime_scorecard",
    oracle="""
    WITH d AS (
      SELECT l.l_suppkey,
             (epoch_us(l.l_shipdate) / 1000000.0
              - epoch_us(o.o_orderdate) / 1000000.0) / 86400.0 AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           ROUND(AVG(delay_days), 4) AS avg_delay_days,
           ROUND(quantile_cont(delay_days, 0.9), 4) AS p90_delay_days
    FROM d GROUP BY l_suppkey
    HAVING COUNT(*) >= 20
    ORDER BY p90_delay_days DESC, l_suppkey
    """,
)
def supplier_leadtime_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier fulfilment scorecard: order-to-ship delay per supplier
    (count, mean, p90), suppliers below a minimum shipment count
    suppressed — the vendor-performance ranking procurement reviews
    run, and the p90 (not the mean) is what SLAs are written against.

    Plan: the order-date rides the fact-fact equi join (orders
    pre-projected to two columns), then ONE per-supplier aggregation —
    exact percentile buffers per supplier, and suppliers are plentiful
    so the buffers are small and the partitions wide (the favorable
    exact-percentile regime; contrast the 3-group IQR fences where
    approx is the scale swap)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # fixture dates are TIMESTAMP_NTZ, which casts to double only via
    # TIMESTAMP (session is UTC, so the hop is value-preserving)
    ship_s = F.col("l_shipdate").cast("timestamp").cast("double")
    order_s = F.col("o_orderdate").cast("timestamp").cast("double")
    delay = (ship_s - order_s) / 86400.0
    d = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_suppkey", delay.alias("delay_days")
    )
    return (
        d.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_shipments"),
            dround(F.avg("delay_days"), 4).alias("avg_delay_days"),
            dround(F.percentile("delay_days", F.lit(0.9)), 4).alias("p90_delay_days"),
        )
        .filter(F.col("n_shipments") >= 20)
        .orderBy(F.desc("p90_delay_days"), "l_suppkey")
    )
