"""Binned scale-path siblings of the global-window queries (round 4).

Six queries in the registry are exact-by-contract but carry a global
(or near-global) Window in their plan — a single-task sort once the
windowed table stops being "bounded": equi-depth histogram, Gini,
Pareto share, RFM quartiles, weighted median, KS test. Each gets a
``*_binned`` sibling here implementing the documented 100 TB plan:

1. quantize the value into ``FINE_BINS`` fixed-width bins — a pure
   per-row projection after a 1-row (lo, hi) scalar attach;
2. aggregate per bin (ordinary groupBy: partial-agg, scale-safe);
3. compute cumulative counts over the **bounded** bin table with a
   broadcast triangular self-join (``f.bin <= a.bin``) — bins² ≤ 65k
   rows, and crucially *zero Window operators anywhere in the plan*
   (tests/test_plans.py asserts this);
4. derive the statistic from the binned distribution with closed-form
   arithmetic (bucket-of-first-member, grouped-Gini mean absolute
   difference, pro-rata Pareto interpolation, bracketed median).

Why fixed-width bins and not approx_percentile: the driver's
correctness gate runs the same query in DuckDB, and approximate
sketches are not cross-engine reproducible. Fixed-width binning is —
``floor((v - lo) * B / (hi - lo))`` is the same IEEE-754 double
arithmetic in both engines — so every query here carries a full
value-hash oracle while still exercising the no-global-sort plan.

The binned statistics are *bin-resolution approximations* of their
exact siblings by declared contract (that is the scale trade-off the
exact variants document); determinism, not agreement with the exact
variant, is the correctness bar.

Reference parity note: the reference solver has no analog of these —
this is the generalized-engine layer (SURVEY.md §2.2); the plan shape
(bounded reduce over quantized cells) is the same family as the
reference's per-sweep max-delta reduction (laplace-par.c:504).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register
from pwir_zadanie_4_mapreduce_spark.functions.lineage import cut_lineage

FINE_BINS = 256


def _r4(c: Column) -> Column:
    return dround(c, 4)


def _bin_col(v: Column, lo: Column, hi: Column) -> Column:
    """Fixed-width bin id in [0, FINE_BINS) — Spark spelling."""
    return F.when(hi == lo, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.lit(FINE_BINS - 1).cast("bigint"),
            F.floor((v - lo) * FINE_BINS / (hi - lo)),
        )
    )


def _bin_sql(v: str, lo: str, hi: str) -> str:
    """The same bin arithmetic as ``_bin_col``, as DuckDB SQL. The
    expression text is kept operation-for-operation identical so both
    engines run the same double ops in the same order."""
    return (
        f"CASE WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) "
        f"ELSE LEAST(CAST({FINE_BINS - 1} AS BIGINT), "
        f"CAST(floor(({v} - {lo}) * {FINE_BINS} / ({hi} - {lo})) AS BIGINT)) END"
    )


# ---------------------------------------------------------------------------
# 1. equi-depth histogram, binned
# ---------------------------------------------------------------------------


@register(
    "agg_equidepth_histogram_binned",
    oracle=f"""
    WITH ext AS (SELECT MIN(o_totalprice) AS lo_v, MAX(o_totalprice) AS hi_v
                 FROM orders),
    b AS (SELECT {_bin_sql('o_totalprice', 'lo_v', 'hi_v')} AS bin, o_totalprice
          FROM orders CROSS JOIN ext),
    fine AS (SELECT bin, COUNT(*) AS n_b, MIN(o_totalprice) AS lo_b,
                    MAX(o_totalprice) AS hi_b
             FROM b GROUP BY bin),
    tot AS (SELECT SUM(n_b) AS t FROM fine),
    cum AS (SELECT a.bin, a.n_b, a.lo_b, a.hi_b, SUM(f.n_b) AS cum_cnt
            FROM fine a JOIN fine f ON f.bin <= a.bin
            GROUP BY a.bin, a.n_b, a.lo_b, a.hi_b)
    SELECT CAST(LEAST(10, CAST(floor((cum_cnt - n_b) * 10.0 / t) AS BIGINT) + 1)
                AS INTEGER) AS bucket,
           CAST(SUM(n_b) AS BIGINT) AS n,
           ROUND(MIN(lo_b), 4) AS lo,
           ROUND(MAX(hi_b), 4) AS hi
    FROM cum CROSS JOIN tot
    GROUP BY 1 ORDER BY 1
    """,
)
def agg_equidepth_histogram_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram without the global sort: decile of a fine
    bin = decile of its first member by cumulative count. Same output
    shape as agg_equidepth_histogram (bucket, n, lo, hi) at bin
    resolution; plan is scan → groupBy(bin) → bounded broadcast
    triangle — no Window, no single-task stage."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    ext = orders.agg(
        F.min("o_totalprice").alias("lo_v"), F.max("o_totalprice").alias("hi_v")
    )
    b = orders.crossJoin(F.broadcast(ext)).select(
        _bin_col(F.col("o_totalprice"), F.col("lo_v"), F.col("hi_v")).alias("bin"),
        "o_totalprice",
    )
    fine = b.groupBy("bin").agg(
        F.count("*").alias("n_b"),
        F.min("o_totalprice").alias("lo_b"),
        F.max("o_totalprice").alias("hi_b"),
    )
    fine = fine.transform(cut_lineage)  # reused: both triangle sides + total
    tot = fine.agg(F.sum("n_b").alias("t"))
    cum = (
        fine.alias("a")
        .join(F.broadcast(fine.alias("f")), F.col("f.bin") <= F.col("a.bin"))
        .groupBy(F.col("a.bin"), F.col("a.n_b"), F.col("a.lo_b"), F.col("a.hi_b"))
        .agg(F.sum(F.col("f.n_b")).alias("cum_cnt"))
    )
    bucket = F.least(
        F.lit(10).cast("bigint"),
        F.floor((F.col("cum_cnt") - F.col("n_b")) * 10.0 / F.col("t")) + 1,
    ).cast("int")
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum("n_b").alias("n"),
            _r4(F.min("lo_b")).alias("lo"),
            _r4(F.max("hi_b")).alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# 2. Gini, binned Lorenz (grouped mean-absolute-difference form)
# ---------------------------------------------------------------------------


@register(
    "stats_gini_revenue_binned",
    oracle=f"""
    WITH spend AS (SELECT o_custkey, SUM(o_totalprice) AS s,
                          CAST(FLOOR(SUM(o_totalprice) * 100 + 0.5) AS BIGINT) AS sc
                   FROM orders GROUP BY o_custkey),
    ext AS (SELECT MIN(s) AS lo_v, MAX(s) AS hi_v FROM spend),
    b AS (SELECT {_bin_sql('s', 'lo_v', 'hi_v')} AS bin, s, sc
          FROM spend CROSS JOIN ext),
    fine AS (SELECT bin, COUNT(*) AS n_b, SUM(s) AS s_b, SUM(sc) AS sc_b
             FROM b GROUP BY bin),
    tot AS (SELECT SUM(n_b) AS n, SUM(s_b) AS ts, SUM(sc_b) AS tsc FROM fine),
    sad AS (SELECT SUM(a.n_b * f.n_b * abs(a.s_b / a.n_b - f.s_b / f.n_b))
                AS sad
            FROM fine a CROSS JOIN fine f)
    SELECT CAST(tot.n AS BIGINT) AS n_customers,
           CAST(tot.tsc AS DOUBLE) / 100.0 AS total_revenue,
           ROUND(sad.sad / (2.0 * tot.n * tot.ts), 4) AS gini
    FROM sad CROSS JOIN tot
    """,
)
def stats_gini_revenue_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini from the binned spend distribution via the grouped
    mean-absolute-difference identity G = ΣΣ nₐn_f·|μₐ−μ_f| / (2n·Σs)
    (members of a bin share the bin mean). The all-pairs term is over
    bins (≤ FINE_BINS² = 65k rows, broadcast) — no rank window, no
    global sort; the customer table only ever flows through groupBys.
    The REPORTED total is an order-independent cents sum of per-
    customer spends (~3.75e11 at sf1 — the 4th-decimal fold-order
    class, r10 sf1 sweep); the gini's internal sums stay double (its
    relative error ~1e-15 is invisible at 4 decimals)."""
    cents = F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"), cents.alias("sc"))
    )
    ext = spend.agg(F.min("s").alias("lo_v"), F.max("s").alias("hi_v"))
    b = spend.crossJoin(F.broadcast(ext)).select(
        _bin_col(F.col("s"), F.col("lo_v"), F.col("hi_v")).alias("bin"), "s", "sc"
    )
    fine = b.groupBy("bin").agg(
        F.count("*").alias("n_b"), F.sum("s").alias("s_b"), F.sum("sc").alias("sc_b")
    )
    fine = fine.transform(cut_lineage)
    tot = fine.agg(
        F.sum("n_b").alias("n"), F.sum("s_b").alias("ts"), F.sum("sc_b").alias("tsc")
    )
    sad = (
        fine.alias("a")
        .crossJoin(F.broadcast(fine.alias("f")))
        .agg(
            F.sum(
                F.col("a.n_b")
                * F.col("f.n_b")
                * F.abs(
                    F.col("a.s_b") / F.col("a.n_b") - F.col("f.s_b") / F.col("f.n_b")
                )
            ).alias("sad")
        )
    )
    return sad.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_customers"),
        # no final ROUND: raw int64/1e2 quotient (r10 sf10 class)
        (F.col("tsc").cast("double") / 100.0).alias("total_revenue"),
        _r4(F.col("sad") / (2.0 * F.col("n") * F.col("ts"))).alias("gini"),
    )


# ---------------------------------------------------------------------------
# 3. Pareto top-p% revenue share, binned with pro-rata interpolation
# ---------------------------------------------------------------------------


@register(
    "stats_pareto_revenue_share_binned",
    oracle=f"""
    WITH spend AS (SELECT o_custkey, SUM(o_totalprice) AS s FROM orders
                   GROUP BY o_custkey),
    ext AS (SELECT MIN(s) AS lo_v, MAX(s) AS hi_v FROM spend),
    b AS (SELECT {_bin_sql('s', 'lo_v', 'hi_v')} AS bin, s
          FROM spend CROSS JOIN ext),
    fine AS (SELECT bin, COUNT(*) AS n_b, SUM(s) AS r_b FROM b GROUP BY bin),
    tot AS (SELECT SUM(n_b) AS n, SUM(r_b) AS ts FROM fine),
    cum AS (SELECT a.bin, a.n_b, a.r_b, SUM(f.n_b) AS cum_cnt,
                   SUM(f.r_b) AS cum_rev
            FROM fine a JOIN fine f ON f.bin >= a.bin
            GROUP BY a.bin, a.n_b, a.r_b)
    SELECT CAST(pct.p AS INTEGER) AS top_pct,
           CAST(floor(pct.p * tot.n / 100.0) AS BIGINT) AS n_top_customers,
           ROUND((cum_rev - r_b
                  + (floor(pct.p * tot.n / 100.0) - (cum_cnt - n_b))
                    * (r_b / n_b)) / tot.ts, 4) AS revenue_share
    FROM cum CROSS JOIN tot CROSS JOIN (VALUES (1), (5), (10), (20)) pct(p)
    WHERE floor(pct.p * tot.n / 100.0) >= 1
      AND cum_cnt - n_b < floor(pct.p * tot.n / 100.0)
      AND floor(pct.p * tot.n / 100.0) <= cum_cnt
    ORDER BY top_pct
    """,
)
def stats_pareto_revenue_share_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p% revenue share from the binned spend distribution: bins
    sorted descending, fully-covered bins contribute whole revenue and
    the straddling bin contributes pro-rata at its mean — the binned
    Lorenz evaluation. Cumulatives come from the bounded descending
    triangle (f.bin >= a.bin); no rank window anywhere."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    ext = spend.agg(F.min("s").alias("lo_v"), F.max("s").alias("hi_v"))
    b = spend.crossJoin(F.broadcast(ext)).select(
        _bin_col(F.col("s"), F.col("lo_v"), F.col("hi_v")).alias("bin"), "s"
    )
    fine = b.groupBy("bin").agg(F.count("*").alias("n_b"), F.sum("s").alias("r_b"))
    fine = fine.transform(cut_lineage)
    tot = fine.agg(F.sum("n_b").alias("n"), F.sum("r_b").alias("ts"))
    cum = (
        fine.alias("a")
        .join(F.broadcast(fine.alias("f")), F.col("f.bin") >= F.col("a.bin"))
        .groupBy(F.col("a.bin"), F.col("a.n_b"), F.col("a.r_b"))
        .agg(F.sum(F.col("f.n_b")).alias("cum_cnt"), F.sum(F.col("f.r_b")).alias("cum_rev"))
    )
    pcts = F.explode(F.array(*[F.lit(p) for p in (1, 5, 10, 20)])).alias("top_pct")
    k = F.floor(F.col("top_pct") * F.col("n") / 100.0)
    share = (
        F.col("cum_rev")
        - F.col("r_b")
        + (k - (F.col("cum_cnt") - F.col("n_b"))) * (F.col("r_b") / F.col("n_b"))
    ) / F.col("ts")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(pcts, "n_b", "r_b", "cum_cnt", "cum_rev", "n", "ts")
        .filter((k >= 1) & (F.col("cum_cnt") - F.col("n_b") < k) & (k <= F.col("cum_cnt")))
        .select(
            F.col("top_pct").cast("int").alias("top_pct"),
            k.cast("long").alias("n_top_customers"),
            _r4(share).alias("revenue_share"),
        )
        .orderBy("top_pct")
    )


# ---------------------------------------------------------------------------
# 4. RFM quartiles, binned
# ---------------------------------------------------------------------------


def _quartile_sql(bin_tbl: str, bin_col: str, cmp: str) -> str:
    """Per-bin quartile CTE body: quartile of the bin's first member by
    cumulative count walking ``cmp`` ('<=' ascending, '>=' descending)."""
    return f"""
      SELECT a.{bin_col},
             CAST(LEAST(4, CAST(floor((SUM(f.n_b) - a.n_b) * 4.0
                                       / (SELECT n FROM ext)) AS BIGINT) + 1)
                  AS INTEGER) AS q
      FROM {bin_tbl} a JOIN {bin_tbl} f ON f.{bin_col} {cmp} a.{bin_col}
      GROUP BY a.{bin_col}, a.n_b
    """


@register(
    "events_rfm_segments_binned",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               datediff('day', CAST(MAX(ts) AS DATE),
                        (SELECT CAST(MAX(ts) AS DATE) FROM events))
                   AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(value), 4) AS monetary
        FROM events GROUP BY user_id),
    ext AS (SELECT MIN(recency_days) AS r_lo, MAX(recency_days) AS r_hi,
                   MIN(frequency) AS f_lo, MAX(frequency) AS f_hi,
                   MIN(monetary) AS m_lo, MAX(monetary) AS m_hi,
                   COUNT(*) AS n
            FROM per_user),
    pu AS (SELECT user_id, recency_days, frequency, monetary,
                  {_bin_sql('recency_days', 'r_lo', 'r_hi')} AS r_bin,
                  {_bin_sql('frequency', 'f_lo', 'f_hi')} AS f_bin,
                  {_bin_sql('monetary', 'm_lo', 'm_hi')} AS m_bin
           FROM per_user CROSS JOIN ext),
    rb AS (SELECT r_bin, COUNT(*) AS n_b FROM pu GROUP BY r_bin),
    fb AS (SELECT f_bin, COUNT(*) AS n_b FROM pu GROUP BY f_bin),
    mb AS (SELECT m_bin, COUNT(*) AS n_b FROM pu GROUP BY m_bin),
    rq AS ({_quartile_sql('rb', 'r_bin', '<=')}),
    fq AS ({_quartile_sql('fb', 'f_bin', '>=')}),
    mq AS ({_quartile_sql('mb', 'm_bin', '>=')})
    SELECT pu.user_id, pu.recency_days, pu.frequency, pu.monetary,
           rq.q AS r_q, fq.q AS f_q, mq.q AS m_q
    FROM pu JOIN rq USING (r_bin) JOIN fq USING (f_bin) JOIN mq USING (m_bin)
    ORDER BY pu.user_id
    """,
)
def events_rfm_segments_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartiles without the three global NTILE sorts: each metric
    is fine-binned, the quartile of a bin is the quartile of its first
    member by cumulative count (ascending for recency — fresher is
    better; descending for frequency/monetary — bigger is better), and
    users pick up (r_q, f_q, m_q) through three broadcast joins on
    their bin ids. Quartile boundaries land on bin edges — the binned
    contract — and membership is deterministic cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.to_date(F.max("ts")).alias("ref_d"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.to_date(F.max("ts")).alias("last_d"),
            F.count("*").alias("frequency"),
            dround(F.sum("value"), 4).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.datediff("ref_d", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    ext = per_user.agg(
        F.min("recency_days").alias("r_lo"),
        F.max("recency_days").alias("r_hi"),
        F.min("frequency").alias("f_lo"),
        F.max("frequency").alias("f_hi"),
        F.min("monetary").alias("m_lo"),
        F.max("monetary").alias("m_hi"),
        F.count("*").alias("n"),
    )
    pu = per_user.crossJoin(F.broadcast(ext)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        _bin_col(F.col("recency_days"), F.col("r_lo"), F.col("r_hi")).alias("r_bin"),
        _bin_col(F.col("frequency"), F.col("f_lo"), F.col("f_hi")).alias("f_bin"),
        _bin_col(F.col("monetary"), F.col("m_lo"), F.col("m_hi")).alias("m_bin"),
    )
    pu = pu.transform(cut_lineage)  # reused by 3 bin rollups + final join
    # r12 optimization round (guide §7.2 "duplicated subtrees"): the
    # quartile denominator used to re-aggregate `ext` — whose plan
    # contains the FULL events→per_user pipeline — once per metric
    # (3 extra events scans + user aggs; 26 scans / 56 exchanges in the
    # before-plan). The denominator is just COUNT(*) of the
    # checkpointed pu, so derive it there: plan drops to one events
    # scan + 4 reads of the materialized pu blocks.
    nrow = pu.agg(F.count("*").alias("n"))

    def quartiles(bin_name: str, ascending: bool) -> DataFrame:
        # cumulative count via the bounded triangle join over the BIN
        # ROLLUP (≤ n_bins+1 rows) — NOT a window: the binned family's
        # contract (test_binned_scale_paths_have_no_window) is zero
        # Window operators, and an interleaved A/B showed the window
        # spelling saves nothing beyond noise here (~0.1-0.2 s).
        rb = pu.groupBy(bin_name).agg(F.count("*").alias("n_b"))
        cond = (
            F.col(f"f.{bin_name}") <= F.col(f"a.{bin_name}")
            if ascending
            else F.col(f"f.{bin_name}") >= F.col(f"a.{bin_name}")
        )
        q = F.least(
            F.lit(4).cast("bigint"),
            F.floor((F.col("cum") - F.col("n_b")) * 4.0 / F.col("n")) + 1,
        ).cast("int")
        return (
            rb.alias("a")
            .join(F.broadcast(rb.alias("f")), cond)
            .groupBy(F.col(f"a.{bin_name}").alias(bin_name), F.col("a.n_b").alias("n_b"))
            .agg(F.sum(F.col("f.n_b")).alias("cum"))
            .crossJoin(F.broadcast(nrow))
            .select(bin_name, q.alias(f"{bin_name[0]}_q"))
        )

    return (
        pu.join(F.broadcast(quartiles("r_bin", ascending=True)), "r_bin")
        .join(F.broadcast(quartiles("f_bin", ascending=False)), "f_bin")
        .join(F.broadcast(quartiles("m_bin", ascending=False)), "m_bin")
        .select(
            "user_id", "recency_days", "frequency", "monetary", "r_q", "f_q", "m_q"
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# 5. weighted median, binned bracket
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median_binned",
    oracle=f"""
    WITH ext AS (SELECT MIN(l_extendedprice) AS lo_v, MAX(l_extendedprice) AS hi_v
                 FROM lineitem),
    b AS (SELECT l_returnflag,
                 {_bin_sql('l_extendedprice', 'lo_v', 'hi_v')} AS bin,
                 l_extendedprice, l_quantity
          FROM lineitem CROSS JOIN ext),
    fine AS (SELECT l_returnflag, bin, SUM(l_quantity) AS w_b,
                    MIN(l_extendedprice) AS lo_b, MAX(l_extendedprice) AS hi_b
             FROM b GROUP BY l_returnflag, bin),
    tot AS (SELECT l_returnflag, SUM(w_b) AS tot_w FROM fine GROUP BY l_returnflag),
    cum AS (SELECT a.l_returnflag, a.bin, a.w_b, a.lo_b, a.hi_b,
                   SUM(f.w_b) AS cum_w
            FROM fine a JOIN fine f
              ON f.l_returnflag = a.l_returnflag AND f.bin <= a.bin
            GROUP BY a.l_returnflag, a.bin, a.w_b, a.lo_b, a.hi_b)
    SELECT cum.l_returnflag,
           ROUND(lo_b, 4) AS weighted_median_lo,
           ROUND(hi_b, 4) AS weighted_median_hi
    FROM cum JOIN tot ON tot.l_returnflag = cum.l_returnflag
    WHERE cum_w >= tot_w / 2.0 AND cum_w - w_b < tot_w / 2.0
    ORDER BY cum.l_returnflag
    """,
)
def agg_weighted_median_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per return flag at bin resolution: the bracket
    [min, max price] of the fine bin where cumulative quantity crosses
    half the group total. No in-group sort of lineitem — the fact table
    only flows through one groupBy; the cumulative walk happens on the
    ≤ groups×FINE_BINS bin table via the bounded triangle join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    ext = li.agg(
        F.min("l_extendedprice").alias("lo_v"), F.max("l_extendedprice").alias("hi_v")
    )
    b = li.crossJoin(F.broadcast(ext)).select(
        "l_returnflag",
        _bin_col(F.col("l_extendedprice"), F.col("lo_v"), F.col("hi_v")).alias("bin"),
        "l_extendedprice",
        "l_quantity",
    )
    fine = b.groupBy("l_returnflag", "bin").agg(
        F.sum("l_quantity").alias("w_b"),
        F.min("l_extendedprice").alias("lo_b"),
        F.max("l_extendedprice").alias("hi_b"),
    )
    fine = fine.transform(cut_lineage)
    tot = fine.groupBy("l_returnflag").agg(F.sum("w_b").alias("tot_w"))
    cum = (
        fine.alias("a")
        .join(
            F.broadcast(fine.alias("f")),
            (F.col("f.l_returnflag") == F.col("a.l_returnflag"))
            & (F.col("f.bin") <= F.col("a.bin")),
        )
        .groupBy(
            F.col("a.l_returnflag").alias("l_returnflag"),
            F.col("a.bin"),
            F.col("a.w_b").alias("w_b"),
            F.col("a.lo_b").alias("lo_b"),
            F.col("a.hi_b").alias("hi_b"),
        )
        .agg(F.sum(F.col("f.w_b")).alias("cum_w"))
    )
    half = F.col("tot_w") / 2.0
    return (
        cum.join(F.broadcast(tot), "l_returnflag")
        .filter((F.col("cum_w") >= half) & (F.col("cum_w") - F.col("w_b") < half))
        .select(
            "l_returnflag",
            _r4(F.col("lo_b")).alias("weighted_median_lo"),
            _r4(F.col("hi_b")).alias("weighted_median_hi"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# 6. KS test, binned ECDF
# ---------------------------------------------------------------------------


@register(
    "stats_ks_test_binned",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    ext AS (SELECT MIN(value) AS lo_v, MAX(value) AS hi_v FROM assigned),
    b AS (SELECT arm, {_bin_sql('value', 'lo_v', 'hi_v')} AS bin
          FROM assigned CROSS JOIN ext),
    fine AS (SELECT bin,
                    COUNT(*) FILTER (arm = 'A') AS ca,
                    COUNT(*) FILTER (arm = 'B') AS cb
             FROM b GROUP BY bin),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM fine),
    cum AS (SELECT a.bin, SUM(f.ca) AS cum_a, SUM(f.cb) AS cum_b
            FROM fine a JOIN fine f ON f.bin <= a.bin
            GROUP BY a.bin)
    SELECT CAST(MAX(tot.na) AS BIGINT) AS n_a,
           CAST(MAX(tot.nb) AS BIGINT) AS n_b,
           ROUND(MAX(abs(cum_a::DOUBLE / tot.na - cum_b::DOUBLE / tot.nb)), 4)
               AS ks_d
    FROM cum CROSS JOIN tot
    """,
)
def stats_ks_test_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic on the BINNED ECDF: D evaluated at the
    FINE_BINS bin edges instead of every distinct value — D to
    bin-width accuracy (classic streaming/scale spelling). The value
    column never sees a global sort or distinct: one groupBy(bin), a
    bounded triangle for the two cumulative counts, one final max."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm_a = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8"
    ext = ev.agg(F.min("value").alias("lo_v"), F.max("value").alias("hi_v"))
    b = ev.crossJoin(F.broadcast(ext)).select(
        arm_a.alias("is_a"),
        _bin_col(F.col("value"), F.col("lo_v"), F.col("hi_v")).alias("bin"),
    )
    fine = b.groupBy("bin").agg(
        F.count(F.when(F.col("is_a"), F.lit(1))).alias("ca"),
        F.count(F.when(~F.col("is_a"), F.lit(1))).alias("cb"),
    )
    fine = fine.transform(cut_lineage)
    tot = fine.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    cum = (
        fine.alias("a")
        .join(F.broadcast(fine.alias("f")), F.col("f.bin") <= F.col("a.bin"))
        .groupBy(F.col("a.bin"))
        .agg(F.sum(F.col("f.ca")).alias("cum_a"), F.sum(F.col("f.cb")).alias("cum_b"))
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("na")
        - F.col("cum_b").cast("double") / F.col("nb")
    )
    return cum.crossJoin(F.broadcast(tot)).agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        _r4(F.max(gap)).alias("ks_d"),
    )
