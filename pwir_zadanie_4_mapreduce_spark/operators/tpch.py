"""Remaining TPC-H query shapes (SURVEY.md §2.2 "TPC-H shapes" row).

Completes the TPC-H-derived coverage: Q1/Q3/Q4/Q5/Q6/Q10/Q12/Q14/Q19
live in relational.py / advanced.py; this module adds the shapes of
Q2, Q7, Q8, Q9, Q11, Q13, Q15, Q16, Q17, Q18, Q20, Q21 and Q22 —
completing all 22 — each adapted to
the fixture star schema (TESTDATA.md — no partsupp table, no
commit/receipt dates, no phone numbers; the adaptation per query is
documented in its docstring).

Like the reference's capability surface (SURVEY.md §2.1: partitioned
map laplace-seq.c:193-198, global reduce :200-203, ordered sink
:99-111), every query here is a declarative DataFrame plan — Catalyst
supplies pushdown, broadcast selection, semi/anti-join planning and
AQE; nothing is hand-scheduled.

Scale notes (100 TB) recur per query; the common ones:
- dims (region/nation/supplier/customer/part at TPC-H proportions)
  broadcast — fact tables never shuffle for a dim join.
- scalar "global threshold" subqueries (Q11, Q15, Q22) become one
  tiny agg + broadcast, NOT a recompute-per-row correlated loop.
- EXISTS / NOT EXISTS become leftsemi / leftanti joins — no fan-out,
  no DISTINCT cleanup, state bounded by the probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register


def _r4(c: Column) -> Column:
    return dround(c, 4)


def _revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q2 shape — correlated MIN subquery + join-back (argmin per group)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_part",
    oracle="""
    WITH m AS (
        SELECT p_size, MIN(p_retailprice) AS min_price
        FROM part WHERE p_type = 'PROMO' GROUP BY p_size)
    SELECT p.p_size,
           ROUND(m.min_price, 4) AS min_price,
           MIN(p.p_partkey)      AS best_partkey
    FROM part p JOIN m ON p.p_size = m.p_size
    WHERE p.p_type = 'PROMO' AND p.p_retailprice = m.min_price
    GROUP BY p.p_size, m.min_price
    ORDER BY p.p_size
    """,
)
def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery de-correlated into a
    per-group aggregate + equi-join-back (argmin). Adapted: cheapest
    PROMO part per size replaces min-supplycost supplier per part
    (the fixture has no partsupp table).

    Scale: the de-correlated form is ONE extra agg over the same scan
    — the correlated spelling would re-evaluate the MIN per outer row.
    Ties resolve deterministically via MIN(p_partkey)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    mins = part.groupBy(F.col("p_size").alias("m_size")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_size == mins.m_size) & (part.p_retailprice == mins.min_price),
        )
        .groupBy("p_size", "min_price")
        .agg(F.min("p_partkey").alias("best_partkey"))
        .select(
            "p_size", _r4(F.col("min_price")).alias("min_price"), "best_partkey"
        )
        .orderBy("p_size")
    )


# ---------------------------------------------------------------------------
# Q7 shape — bidirectional nation-pair volume shipping
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, both directions,
    by year. The only shuffle join is lineitem↔orders (fact-fact);
    supplier, customer and both nation copies broadcast.

    Scale: the nation-pair disjunction is applied as soon as both
    nationkeys are in scope — at 100 TB the selective pair filter
    belongs BEFORE the fact-fact shuffle, and Catalyst pushes the
    per-side halves (s_nationkey IN (1,2), c_nationkey IN (1,2)) into
    the broadcast hash joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_r4(F.sum(_revenue())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share (conditional share of a grouped sum)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(CASE WHEN sn.n_name = 'NATION_2'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part revenue sold into
    ASIA, by order year. The share is a conditional-sum / total-sum in
    ONE aggregation — never two scans.

    Scale: five dimension joins, all broadcast; the single shuffle is
    the lineitem↔orders key exchange. Region filter prunes the
    customer-nation broadcast before it reaches the fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _revenue()
    nation2_rev = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(_r4(F.sum(nation2_rev) / F.sum(rev)).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape — product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on parts matching a name pattern, by supplier
    nation and order year. Adapted: cost = 0.1 × p_retailprice ×
    quantity replaces ps_supplycost (no partsupp in the fixture).

    Scale: the LIKE filter lands on the part scan (ReadSchema two
    columns) and shrinks the broadcast; profit arithmetic happens in
    the projection BEFORE the aggregation so only (nation, year,
    profit) flow through the shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.sn_key)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_r4(F.sum(profit)).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11 shape — global-threshold HAVING (scalar subquery over the same agg)
# ---------------------------------------------------------------------------


@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               SUM(l_extendedprice * (1 - l_discount)) AS value
        FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, ROUND(value, 4) AS value
    FROM v
    WHERE value > (SELECT SUM(value) * 0.0005 FROM v)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value with a HAVING threshold that is
    a fraction of the GLOBAL sum (scalar subquery over the same
    aggregate). Adapted to lineitem revenue per part (no partsupp).

    Scale: the per-part agg is computed ONCE; the global total is a
    second tiny agg over that result (not over the raw fact), and
    joins back as a broadcast single row — the correlated spelling
    would rescan the fact per row. Threshold compare happens after
    one shuffle total."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(_revenue()).alias("value"))
    total = per_part.agg((F.sum("value") * 0.0005).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", _r4(F.col("value")).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q13 shape — outer-join count distribution (histogram of per-key counts)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of non-urgent order counts per customer
    — the left outer join keeps zero-order customers (their count is
    0, COUNT over the null key), then a second agg histograms the
    counts. Adapted: priority filter replaces the comment LIKE.

    Scale: the join-side filter sits in the JOIN CONDITION, not a
    WHERE (a WHERE would turn the outer join inner and drop the
    zero bucket). First agg shuffles by custkey; the histogram agg
    moves only (c_count) pairs — cardinality ≤ max orders/customer."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier (max-equality scalar subquery)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                        AS BIGINT)) AS rev_fp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.rev_fp AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.rev_fp = (SELECT MAX(rev_fp) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    the view + scalar MAX subquery becomes agg → tiny max agg →
    broadcast equality filter.

    Scale: revenue is aggregated once (one shuffle by suppkey, at
    most |suppliers| rows out); the MAX is over that small result.
    Revenue is a fixed-point (1e-4-grid int64) sum: equality-to-max
    over a DOUBLE sum is knife-edge — at sf1 the scaled fixtures
    contain genuinely tied suppliers, and each engine's fold order
    broke the ties differently (Spark kept 8 rows, DuckDB 6 — r10 sf1
    sweep); integer sums make the tie set identical by construction."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev_fp = F.floor(_revenue() * 10000 + F.lit(0.5)).cast("long")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev_fp).alias("rev_fp")
    )
    max_rev = revenue.agg(F.max("rev_fp").alias("max_fp"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("rev_fp") == F.col("max_fp"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            # no final ROUND: raw int64/1e4 quotient (r10 sf10 class)
            (F.col("rev_fp").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape — distinct-supplier count per part attrs, with NOT-IN exclusion
# ---------------------------------------------------------------------------


@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 10, 20, 30, 40, 50)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, size) combination, excluding a supplier denylist.
    Adapted: supplier link comes from lineitem (no partsupp);
    negative account balance replaces the complaints LIKE.

    Scale: the NOT IN becomes a leftanti against the (tiny, filtered)
    denylist — broadcast, null-safe by construction since s_suppkey
    is a key. COUNT(DISTINCT) plans as two-phase partial distinct;
    the heavy dedup happens map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 10, 20, 30, 40, 50)
    ).select("p_partkey", "p_brand", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "leftanti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape — threshold semi-join chain (who ships enough of these parts)
# ---------------------------------------------------------------------------


@register(
    "q20_promo_volume_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 400)
    ORDER BY s.s_suppkey
    """,
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold
    quantity of PROMO parts in 1997 — the nested IN chain becomes
    filter → agg → HAVING → leftsemi. Adapted: shipped quantity from
    lineitem replaces the partsupp availability rule.

    Scale: the qualifying-supplier set is at most |suppliers| rows
    after its agg, so the final semi join broadcasts the SMALL side;
    part filter broadcasts into the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(F.broadcast(qualifying), supp.s_suppkey == qualifying.l_suppkey, "leftsemi")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 shape — sole-blame supplier (EXISTS + NOT EXISTS over order groups)
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_order AS (
        SELECT l.l_orderkey,
               COUNT(DISTINCT l.l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                                   THEN l.l_suppkey END) AS n_late,
               MIN(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN l.l_suppkey END) AS late_supp
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order po JOIN supplier s ON po.late_supp = s.s_suppkey
    WHERE po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely to blame for a late
    multi-supplier order. The classic EXISTS(other supplier) + NOT
    EXISTS(other LATE supplier) pair collapses into ONE per-order
    aggregate — n_supp ≥ 2 encodes the EXISTS, n_late = 1 the NOT
    EXISTS, and the conditional MIN identifies the culprit (unique
    when n_late = 1). Adapted: late = shipped > 60 days after the
    order date (no commit/receipt dates in the fixture).

    Scale: one shuffle by orderkey replaces TWO correlated
    re-joins of lineitem against itself — the dominant cost in the
    naive plan. State per group is three counters, not a row list."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    late_supp = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.min(late_supp).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(supp), per_order.late_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 shape — above-average balances with no orders (anti join + global avg)
# ---------------------------------------------------------------------------


@register(
    "q22_dormant_customer_balance",
    oracle="""
    WITH eligible AS (
        SELECT substr(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE substr(c_name, 17, 2) IN ('01', '13', '25', '31', '42')
          AND c_acctbal > 0)
    SELECT e.cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(e.c_acctbal), 4) AS totacctbal
    FROM eligible e
    WHERE e.c_acctbal > (SELECT AVG(c_acctbal) FROM eligible)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = e.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY e.cntrycode
    ORDER BY e.cntrycode
    """,
)
def q22_dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy-but-dormant customers by country code —
    global AVG scalar subquery + NOT EXISTS anti join. Adapted: the
    code is digits 17-18 of c_name (no phone column), and dormant
    means no orders since 2000 (the fixture gives every customer at
    least one lifetime order, which would make the literal Q22 form
    vacuously empty).

    Scale: eligible customers are computed once and reused for both
    the average and the probe side (self-referential subquery —
    Spark dedups the scan); the AVG broadcasts as one row; the NOT
    EXISTS is a leftanti keyed on custkey. orders is projected to the
    single join column before the anti join so the shuffle carries
    8 bytes/row."""
    cc = F.substring("c_name", 17, 2)
    eligible = load_table(spark, sf_dir, "customer").filter(
        cc.isin("01", "13", "25", "31", "42") & (F.col("c_acctbal") > 0)
    ).select(cc.alias("cntrycode"), "c_custkey", "c_acctbal")
    avg_bal = eligible.agg(F.avg("c_acctbal").alias("avg_bal"))
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, eligible.c_custkey == orders.o_custkey, "leftanti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            _r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity-order revenue (correlated AVG de-correlated)
# ---------------------------------------------------------------------------


@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH pp AS (
        SELECT p_partkey, p_brand FROM part
        WHERE p_brand IN ('Brand#21','Brand#22','Brand#23','Brand#24','Brand#25')),
    lf AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice, pp.p_brand
        FROM lineitem l JOIN pp ON l.l_partkey = pp.p_partkey),
    av AS (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
        FROM lf GROUP BY l_partkey)
    SELECT lf.p_brand,
           CAST(SUM(CAST(FLOOR(lf.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
    FROM lf JOIN av ON lf.l_partkey = av.l_partkey
    WHERE lf.l_quantity < av.qty_cut
    GROUP BY lf.p_brand
    ORDER BY lf.p_brand
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not taken. The
    correlated `l_quantity < (SELECT 0.2*AVG ... WHERE l_partkey =
    p_partkey)` de-correlates into one per-partkey AVG + equi-join
    back. Adapted: a 5-brand group-by replaces the single
    brand+container scalar (no p_container column; per-brand rows make
    the oracle hash check non-trivial).

    Scale: the brand subset of part is filtered FIRST and broadcast,
    so lineitem is pruned to matching partkeys in the scan-side join —
    the textbook plan computes AVG over ALL of lineitem; this one only
    over the ~20% that can match. The per-part AVG is a window over
    l_partkey on that pruned subset, so the whole query is ONE
    lineitem scan + ONE shuffle of the pruned rows (the de-correlated
    agg-then-join-back spelling scans lineitem twice and broadcasts a
    per-part frame that grows with sf; measured 1.04 s vs 0.80 s at
    sf0.1). The cut threshold is bit-identical cross-engine:
    integral-valued quantities sum exactly in doubles, so AVG and
    0.2*AVG are exact same-input same-op on both sides."""
    pp = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(
            "Brand#21", "Brand#22", "Brand#23", "Brand#24", "Brand#25"
        )
    ).select("p_partkey", "p_brand")
    lf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        lf.withColumn("qty_cut", F.lit(0.2) * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .groupBy("p_brand")
        .agg(
            # fixed-point cents sum, no final ROUND (r11 sf10 catch:
            # the ~1.6e9 per-brand double sum flipped the 4th decimal
            # on fold order); /7.0 of the raw int64/1e2 quotient is
            # the same IEEE ops on both engines at any scale
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)))
                .cast("double")
                / 100.0
                / 7.0
            ).alias("avg_yearly")
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Q18 shape — large-volume customers (HAVING subquery + join-back top-k)
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 200)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 4) AS o_totalprice,
           ROUND(big.total_qty, 4)  AS total_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose orders exceed a total-quantity
    threshold — the HAVING-subquery-IN-join shape, threshold adapted
    to the fixture's quantity distribution (>200 keeps ~1.5% of
    orders). Top-100 by price with o_orderkey as the deterministic
    tie-break (the spec's o_orderdate tie-break is not total).

    Scale: sum-per-order is a map-side-combinable agg over lineitem
    (the only fact shuffle, carrying (orderkey, qty) pairs); the
    surviving ~1.5% joins orders on the orderkey — AQE picks
    broadcast when the filtered side fits, else it is an equi-shuffle
    on the same key the agg just produced. customer is a broadcast
    dim. The LIMIT is a TakeOrderedAndProject: per-partition top-100,
    never a global sort."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            _r4(F.col("o_totalprice")).alias("o_totalprice"),
            _r4(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
