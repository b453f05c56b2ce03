"""Time-series operators: date-spine gap fill (the hypertable
`time_bucket_gapfill` shape), a binned range join (the scalable plan
for equi-key-less interval matching), and greedy sequence packing
(the LLM-training batch-assembly primitive).

None of these exist in the reference (storaged/PWiR-zadanie-4-MapReduce
is a Laplace SOR solver — SURVEY.md §0); they generalize its
iterate/stencil surface (SURVEY.md §2.1 O5/O9) to the time dimension:
gap fill is a 1-D stencil over a generated axis, the binned range join
is the O11 block-partition trick applied to time, and packing is a
prefix-scan partition (O8 reduce as a running sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register

GAPFILL_MAX_USER = 100


@register(
    "timeseries_gap_fill",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, ROUND(SUM(value), 4) AS day_value
        FROM events WHERE user_id < {GAPFILL_MAX_USER}
        GROUP BY user_id, CAST(ts AS DATE)),
    b AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id),
    spine AS (
        SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        FROM b),
    j AS (
        SELECT s.user_id, s.d, daily.day_value
        FROM spine s LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d)
    SELECT user_id, CAST(d AS TIMESTAMP) AS d, day_value,
           last_value(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           day_value IS NULL AS is_gap
    FROM j ORDER BY user_id, d
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill with forward fill (locf): per user, every
    day between their first and last active day exists in the output;
    missing days carry the last observed daily total. The hypertable
    `time_bucket_gapfill` / `locf` pattern as a batch plan.

    Plan: per-user daily agg (one shuffle), per-user bounds from the
    SAME aggregate (partial agg on the already-partitioned frame),
    spine rows generated JVM-side with sequence()+explode (never
    materialized on the driver), forward fill as one window pass.
    100 TB: the spine is O(users × days) rows of 12 bytes — dwarfed by
    the event input; everything after the first shuffle is co-
    partitioned by user_id, so gap fill costs ONE shuffle total.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < GAPFILL_MAX_USER)
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(dround(F.sum("value"), 4).alias("day_value"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    j = spine.join(daily, ["user_id", "d"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        j.select(
            "user_id",
            F.col("d").cast("timestamp").alias("d"),
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "d")
    )


RANGE_BIN_DAYS = 4  # bin width; order window spans 2 days -> <= 2 bins
RANGE_SPAN_DAYS = 2
RANGE_MONTH = "1995-03"


@register(
    "join_range_binned",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_value
    FROM orders o JOIN lineitem l
      ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
     AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + {RANGE_SPAN_DAYS}
    WHERE strftime(o.o_orderdate, '%Y-%m') = '{RANGE_MONTH}'
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key: every order vs every shipped
    lineitem — any order's, not just its own — kept when the ship
    date falls in the order's 2-day window: 'shipping volume booked
    while this order was placed') executed with the BINNED plan: both
    sides bucket time into fixed 4-day bins, the interval side
    explodes into the <=2 bins it touches, and the join becomes an
    equi hash join on the bin plus a residual date filter. Each
    matching pair meets in exactly one bin (the point side's), so no
    dedup pass is needed.

    (Round-5 realignment: through round 4 the point side was the
    events table, whose timestamps — Jan 2024 — never intersect the
    1995-2001 order dates, so the join matched ZERO pairs and the
    oracle compare was vacuously green. Same plan, lineitem ship
    dates now: tens of matched pairs per order.)

    Without this rewrite Spark plans a broadcast-nested-loop join —
    O(|orders| x |events|) comparisons; the binned plan is
    O(pairs-per-bin), the same trick Databricks' range-join hint and
    KDB's window joins use. 100 TB: bin width tunes the
    selectivity/fan-out trade; partition pruning on the bin column
    turns it into a co-located join.
    """
    epoch = F.lit("1970-01-01").cast("date")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.date_format("o_orderdate", "yyyy-MM") == RANGE_MONTH)
        .withColumn("od", F.to_date("o_orderdate"))
        .withColumn("dd", F.datediff("od", epoch))
    )
    o_binned = orders.withColumn(
        "bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("dd") / RANGE_BIN_DAYS),
                    F.floor((F.col("dd") + RANGE_SPAN_DAYS) / RANGE_BIN_DAYS),
                )
            )
        ),
    )
    points = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.to_date("l_shipdate").alias("ed"), F.col("l_extendedprice").alias("value"))
        .withColumn("bin", F.floor(F.datediff("ed", epoch) / RANGE_BIN_DAYS))
    )
    # the interval side is a one-month slice of orders — broadcast it so
    # the (unbounded) point side never shuffles; at 100 TB with an
    # unselective interval side, drop the hint: the bin equi-key still
    # gives a shuffled hash join instead of a nested loop.
    matched = F.broadcast(o_binned).join(points, "bin").filter(
        (F.col("ed") >= F.col("od"))
        & (F.col("ed") <= F.date_add("od", RANGE_SPAN_DAYS))
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_pairs"),
            # fixed-point cents sum (round-9): order-independent int64
            # arithmetic — the double sum flipped the 4th decimal at
            # sf0.1 (~1.4e10 totals) on summation order alone.
            # No final ROUND — raw int64/1e2 quotient (r10 sf10 class)
            (
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 100.0
            ).alias("total_value"),
        )
        .orderBy("o_orderpriority")
    )


PACK_SEQ_TOKENS = 256


@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
    c AS (
        SELECT source, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_tok
        FROM toks),
    binned AS (
        SELECT source, doc_id, n_tok,
               (cum_tok - n_tok) // {PACK_SEQ_TOKENS} AS seq_id
        FROM c)
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM binned GROUP BY source, seq_id ORDER BY source, seq_id
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing — the training-batch assembly step:
    docs are concatenated in doc_id order within a shard (`source`)
    and cut into ~PACK_SEQ_TOKENS-token training sequences; a doc
    belongs to the sequence its first token lands in (documents may
    straddle the cut — the packer's standard greedy rule). Emits one
    row per packed sequence with doc span and token totals.

    Plan: token counts are a projection, the running total is one
    window pass partitioned BY SHARD — no global sort, no driver
    loop. 100 TB: the shard column is what makes this scale (a
    corpus-global cumsum would serialize); shards pack independently
    and in parallel, exactly how production packers shard by file.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = toks.withColumn(
        "seq_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / PACK_SEQ_TOKENS),
    )
    return (
        binned.groupBy("source", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "seq_id")
    )


@register(
    "events_multires_rollup",
    oracle="""
    WITH b AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts)  AS h,
               CAST(ts AS DATE)                    AS d,
               date_trunc('month', CAST(ts AS DATE)) AS m,
               value
        FROM events)
    SELECT event_type,
           CASE WHEN GROUPING(h) = 0 THEN 'hour'
                WHEN GROUPING(d) = 0 THEN 'day'
                ELSE 'month' END AS resolution,
           CAST(COALESCE(h, CAST(d AS TIMESTAMP), CAST(m AS TIMESTAMP)) AS TIMESTAMP)
               AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM b
    GROUP BY GROUPING SETS ((event_type, h), (event_type, d), (event_type, m))
    ORDER BY event_type, resolution, bucket_start
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup — the hypertable continuous-aggregate
    ladder (hour/day/month) computed in ONE pass with GROUPING SETS:
    the scan and the partial aggregates are shared across resolutions
    (Expand multiplies rows 3x AFTER projection to 4 skinny columns),
    instead of three separate scans-and-shuffles.

    100 TB: this is the batch backfill companion of
    run_hourly_rollup_sink (streaming/jobs.py); coarser resolutions
    could also fold from the hour rollup (hierarchical re-aggregation)
    — that variant trades the Expand for a second tiny shuffle and
    wins once the hour rollup is already materialized."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.window("ts", "1 hour").start.alias("h"),
        F.to_date("ts").alias("d"),
        F.trunc(F.to_date("ts"), "month").alias("m"),
        "value",
    )
    g = ev.groupingSets(
        [["event_type", "h"], ["event_type", "d"], ["event_type", "m"]],
        "event_type", "h", "d", "m",
    ).agg(
        F.count("*").alias("n"),
        dround(F.sum("value"), 4).alias("total_value"),
        # grouping() is only resolvable inside the grouping-sets aggregate
        F.grouping("h").alias("gh"),
        F.grouping("d").alias("gd"),
    )
    resolution = (
        F.when(F.col("gh") == 0, "hour")
        .when(F.col("gd") == 0, "day")
        .otherwise("month")
    )
    return g.select(
        "event_type",
        resolution.alias("resolution"),
        F.coalesce(
            F.col("h"), F.col("d").cast("timestamp"), F.col("m").cast("timestamp")
        ).alias("bucket_start"),
        "n",
        "total_value",
    ).orderBy("event_type", "resolution", "bucket_start")


EWMA_ALPHA = 0.3
EWMA_WINDOW = 20

ROLLMED_WINDOW = 21  # odd trailing frame -> unique middle order statistic


@register(
    "timeseries_rolling_median",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
             list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN {ROLLMED_WINDOW - 1} PRECEDING AND CURRENT ROW) AS arr
      FROM events
    )
    SELECT event_type, CAST(rn AS BIGINT) AS rn,
           ROUND(list_sort(arr)[{ROLLMED_WINDOW // 4 + 1}], 4) AS rolling_p25,
           ROUND(list_sort(arr)[{ROLLMED_WINDOW // 2 + 1}], 4) AS rolling_median,
           ROUND(list_sort(arr)[{(3 * ROLLMED_WINDOW) // 4 + 1}], 4) AS rolling_p75
    FROM seq
    WHERE rn % 100 = 0 AND rn >= {ROLLMED_WINDOW}
    ORDER BY event_type, rn
    """,
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-21-row rolling median (+p25/p75 band) per event type —
    the ROBUST sibling of timeseries_ewma: a mean-based smoother drags
    on every spike, an order statistic ignores them, which is why
    monitoring baselines and data-quality bands prefer it. No engine
    exposes percentile as a frame-bounded window aggregate; the
    spelling that is exact AND engine-portable is collect the frame →
    array_sort → pick the (6, 11, 16)-th order statistics of 21 — the
    picked values are INPUT doubles, not arithmetic results, so the
    hash-match is bit-exact by construction (no fold-order anywhere).

    Same trap-avoidance as EWMA: the frame array is materialized as a
    window projection before array_sort touches it (HOF lambdas
    re-evaluate inlined inputs per element). Full-history guard
    (rn >= 21) keeps the warmup rows out, where even-length frames
    would need a two-element average — an arithmetic result — and the
    exactness argument would be lost for no analytical gain. 100 TB:
    partitioned window, per-row state bounded at 21 doubles, sampled
    output keeps the result driver-safe; sorting 21 elements per row
    is O(n·21·log 21) JVM-side — cheaper than one extra shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wf = w.rowsBetween(-(ROLLMED_WINDOW - 1), 0)
    seq = ev.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.collect_list("value").over(wf).alias("arr"),
    ).filter((F.col("rn") % 100 == 0) & (F.col("rn") >= ROLLMED_WINDOW))
    sorted_arr = F.array_sort("arr")
    return seq.select(
        "event_type",
        F.col("rn").cast("long").alias("rn"),
        dround(F.element_at(sorted_arr, ROLLMED_WINDOW // 4 + 1), 4).alias("rolling_p25"),
        dround(F.element_at(sorted_arr, ROLLMED_WINDOW // 2 + 1), 4).alias("rolling_median"),
        dround(F.element_at(sorted_arr, (3 * ROLLMED_WINDOW) // 4 + 1), 4).alias("rolling_p75"),
    ).orderBy("event_type", "rn")


@register(
    "timeseries_ewma",
    oracle=f"""
    WITH seq AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
             list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW) AS arr
      FROM events
    )
    SELECT event_type, CAST(rn AS BIGINT) AS rn,
           ROUND(list_sum(list_transform(arr, (v, i) -> v * pow({1 - EWMA_ALPHA}, len(arr) - i)))
                 / list_sum(list_transform(arr, (v, i) -> pow({1 - EWMA_ALPHA}, len(arr) - i))),
                 4) AS ewma
    FROM seq
    WHERE rn % 100 = 0
    ORDER BY event_type, rn
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3) over the trailing
    20 rows per event type — the smoothing primitive behind monitoring
    dashboards. True EWMA is a recursion no window aggregate expresses;
    the bounded-window form (weights decay to 0.7^19 ≈ 0.1%) collects
    the frame into an array and reduces it with Catalyst higher-order
    lambdas — all JVM-side, no UDF.

    The window array is materialized as its own projection BEFORE the
    lambda touches it (the documented Spark trap: lambdas re-evaluate
    inlined input expressions per element — a collect_list bound
    column evaluates once). 100 TB note: partitioned window, frame
    state bounded at 20 doubles per row; sampled output keeps the
    result driver-safe."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wf = w.rowsBetween(-(EWMA_WINDOW - 1), 0)
    seq = ev.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.collect_list("value").over(wf).alias("arr"),
    ).filter(F.col("rn") % 100 == 0)
    decay = 1 - EWMA_ALPHA
    num = F.expr(
        f"aggregate(zip_with(arr, sequence(1, size(arr)),"
        f" (v, i) -> v * pow({decay}, size(arr) - i)), 0D, (acc, x) -> acc + x)"
    )
    den = F.expr(
        f"aggregate(transform(sequence(1, size(arr)),"
        f" i -> pow({decay}, size(arr) - i)), 0D, (acc, x) -> acc + x)"
    )
    return seq.select(
        "event_type",
        F.col("rn").cast("long").alias("rn"),
        dround(num / den, 4).alias("ewma"),
    ).orderBy("event_type", "rn")


ANOMALY_MIN_HISTORY = 30
ANOMALY_Z = 3.0
# (r11 sf10 history: two epsilon guards were tried against the double
# cumsum spelling's sigma noise before the fixed-point rewrite below
# made sigma bit-equal cross-engine; with exact int64 cents moments a
# plain sigma > 0 is deterministic and no epsilon exists anymore)


@register(
    "timeseries_anomaly_zscore",
    oracle=f"""
    -- fixed-point second moments (r11 sf10): cents and cents^2 window
    -- sums are EXACT int64, so mu/sigma/z below are the same IEEE
    -- double ops on the same integers in both engines — bit-equal,
    -- no epsilon, no fold-order or segment-tree noise anywhere
    WITH seq0 AS (
      SELECT event_type, event_id, value,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER cum AS cumc,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                 * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER cum AS cumsq
      FROM events
      WINDOW cum AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    seq AS (
      SELECT event_type, event_id, value, c, rn,
             LEAST(rn - 1, 100) AS n,
             LAG(cumc, 1) OVER w - COALESCE(LAG(cumc, 101) OVER w, 0) AS s1,
             LAG(cumsq, 1) OVER w - COALESCE(LAG(cumsq, 101) OVER w, 0) AS s2
      FROM seq0
      WINDOW w AS (PARTITION BY event_type ORDER BY rn)
    ),
    zz AS (
      SELECT event_type, event_id, value, rn,
             CAST(s1 AS DOUBLE) / n AS muc,
             SQRT(GREATEST((CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                           / (n - 1), 0.0)) AS sigmac,
             c
      FROM seq
    )
    SELECT event_type, event_id, ROUND(value, 4) AS value,
           ROUND((c - muc) / sigmac, 4) AS zscore
    FROM zz
    WHERE rn > {ANOMALY_MIN_HISTORY} AND sigmac > 0
      AND abs((c - muc) / sigmac) > {ANOMALY_Z}
    ORDER BY event_type, event_id
    """,
)
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: flag events whose value
    deviates more than 3σ from the PRECEDING 100 rows' mean (current
    row excluded — the detector never sees the point it judges). The
    data-quality tripwire for ingest pipelines.

    One window pass, second-moment state, O(1) frame slide; the
    minimum-history guard stops early-partition noise. 100 TB note:
    per-key ordered windows, no global sort; emitted rows are
    anomalies only — output is alert-sized, not data-sized."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # Running-moments rewrite: Spark recomputes bounded sliding frames
    # from scratch on every row (avg/stddev have no inverse/retract
    # path), so the naive 100-row frame costs 100× per row. Cumulative
    # sums over an UNBOUNDED-preceding frame ARE incremental; the
    # trailing-window moments fall out of two lagged differences:
    #   Σ[rn-101, rn-1] = cum(rn-1) - cum(rn-101)
    # with n = min(rn-1, 100). Same numbers as the frame spelling
    # (the oracle keeps stddev_samp over the explicit frame).
    # FIXED-POINT second moments (r11 sf10 rewrite): the double
    # cumsum spelling accumulated ~1e-5 cancellation noise in the
    # lagged differences at sf10 magnitudes — enough to make sqrt()
    # of a constant window's variance go NaN (and Spark's NaN-is-
    # greater-than-everything comparisons then passed BOTH filters:
    # 10k phantom rows), and to flip borderline-sigma windows against
    # ANY epsilon. Cents (c) and c*c window sums are EXACT int64 on
    # both engines (c <= 5e4, c^2 * 1.5e7 rows << 2^63), the lag
    # differences cancel exactly, and mu/sigma/z are then the same
    # IEEE ops on the same integers — bit-equal cross-engine, no
    # epsilon needed.
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    seq0 = ev.select(
        "event_type",
        "event_id",
        "value",
        c.alias("c"),
        F.row_number().over(w).alias("rn"),
        F.sum(c).over(run).alias("cumc"),
        F.sum(c * c).over(run).alias("cumsq"),
    )
    w2 = Window.partitionBy("event_type").orderBy("rn")  # ts projected away
    n = F.least(F.col("rn") - 1, F.lit(101 - 1))
    s1 = F.lag("cumc", 1).over(w2) - F.coalesce(
        F.lag("cumc", 101).over(w2), F.lit(0).cast("long")
    )
    s2 = F.lag("cumsq", 1).over(w2) - F.coalesce(
        F.lag("cumsq", 101).over(w2), F.lit(0).cast("long")
    )
    seq = seq0.select(
        "event_type",
        "event_id",
        "value",
        "c",
        "rn",
        (s1.cast("double") / n).alias("muc"),
        F.sqrt(
            F.greatest(
                (s2.cast("double") - s1.cast("double") * s1.cast("double") / n)
                / (n - 1),
                F.lit(0.0),
            )
        ).alias("sigmac"),
    )
    z = (F.col("c") - F.col("muc")) / F.col("sigmac")
    return (
        seq.filter(
            (F.col("rn") > ANOMALY_MIN_HISTORY)
            & (F.col("sigmac") > 0)
            & (F.abs(z) > ANOMALY_Z)
        )
        .select(
            "event_type",
            "event_id",
            dround(F.col("value"), 4).alias("value"),
            dround(z, 4).alias("zscore"),
        )
        .orderBy("event_type", "event_id")
    )


@register(
    "timeseries_downsample_triangle",
    oracle="""
    -- fixed-point LTTB (r11 sf10): per-bucket sums of int64 MICROS
    -- (bucket-relative, so 15k-point buckets stay exact) and int64
    -- CENTS are exact on both engines; the neighbor-average anchors
    -- and triangle areas below are then the same IEEE ops on the same
    -- integers — bit-equal areas, deterministic argmax, no rounding
    -- guard needed. Areas are in micros*cents units (1e8 x the old
    -- seconds*value scale).
    WITH pts AS (
      SELECT event_id, event_type, value,
             epoch_us(ts) AS xm,
             epoch_us(ts) // 86400000000 AS b,
             CAST(epoch_us(ts) - (epoch_us(ts) // 86400000000) * 86400000000
                  AS BIGINT) AS xr,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    bkt AS (
      SELECT event_type, b,
             SUM(xr) AS sxr, SUM(c) AS sc, COUNT(*) AS n
      FROM pts GROUP BY event_type, b
    ),
    ctx AS (
      SELECT event_type, b,
             CAST(LAG(sxr) OVER w AS DOUBLE) / LAG(n) OVER w
               + (LAG(b) OVER w - b) * 86400000000.0 AS px,
             CAST(LAG(sc)  OVER w AS DOUBLE) / LAG(n) OVER w AS py,
             CAST(LEAD(sxr) OVER w AS DOUBLE) / LEAD(n) OVER w
               + (LEAD(b) OVER w - b) * 86400000000.0 AS nx,
             CAST(LEAD(sc)  OVER w AS DOUBLE) / LEAD(n) OVER w AS ny
      FROM bkt WINDOW w AS (PARTITION BY event_type ORDER BY b)
    ),
    scored AS (
      SELECT p.event_type, p.b, p.event_id, p.value,
             abs((c.px - c.nx) * (p.c - c.py)
                 - (c.px - p.xr) * (c.ny - c.py)) AS area
      FROM pts p JOIN ctx c USING (event_type, b)
      WHERE c.px IS NOT NULL AND c.nx IS NOT NULL
    )
    SELECT event_type, b AS bucket, event_id,
           ROUND(CAST(value AS DOUBLE), 4) AS y,
           CAST(FLOOR(area) AS BIGINT) AS area
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, b
                               ORDER BY area DESC, event_id) = 1
    ORDER BY event_type, bucket
    """,
)
def timeseries_downsample_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style visual downsampling (Steinarsson's
    largest-triangle-three-buckets, in its parallel bucket-average
    variant): per event type and day bucket, keep the single point
    forming the largest triangle with the NEIGHBOR BUCKET AVERAGES —
    the dashboard decimation that preserves spikes where plain
    averaging flattens them. The sequential LTTB anchors on the
    previously *selected* point (an inherently serial chain); the
    bucket-average anchor is the standard parallelization and is what
    makes this one shuffle instead of a per-series scan.

    Determinism note: triangle areas are rounded to integers before
    the argmax (cross-engine float-noise guard, ties then broken by
    event_id) — the same engine-stability trick as the perplexity
    threshold. Edge buckets (no neighbor on one side) are excluded;
    production keeps raw endpoints. Plan: one bucket aggregation, a
    days-bounded lag/lead per type, broadcast back onto the points,
    and a per-(type, bucket) top-1 window — all partitions plentiful."""
    # FIXED-POINT spelling (r11 sf10 rewrite): the double bucket AVGs
    # carried ~1e-2 fold-order noise in the anchors at sf10 bucket
    # sizes — enough to flip integer-rounded areas across .5 and pick
    # different points per engine. Bucket-relative int64 micros and
    # int64 cents sum EXACTLY (15k-point buckets: 1.3e15 << 2^63), so
    # the anchors and areas are the same IEEE ops on the same integers
    # on both engines — bit-equal, argmax deterministic with no
    # rounding guard. Area is in micros*cents units.
    day_us = 86_400_000_000
    xm = F.unix_micros(F.col("ts"))
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            "value",
            xm.alias("xm"),
        )
        .withColumn("b", F.expr(f"xm div {day_us}"))
        .withColumn("xr", (F.col("xm") - F.col("b") * day_us).cast("long"))
        .withColumn("c", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .drop("xm")
    )
    bkt = pts.groupBy("event_type", "b").agg(
        F.sum("xr").alias("sxr"), F.sum("c").alias("sc"), F.count("*").alias("n")
    )
    wb = Window.partitionBy("event_type").orderBy("b")
    ctx = bkt.select(
        "event_type",
        "b",
        (
            F.lag("sxr").over(wb).cast("double") / F.lag("n").over(wb)
            + (F.lag("b").over(wb) - F.col("b")) * float(day_us)
        ).alias("px"),
        (F.lag("sc").over(wb).cast("double") / F.lag("n").over(wb)).alias("py"),
        (
            F.lead("sxr").over(wb).cast("double") / F.lead("n").over(wb)
            + (F.lead("b").over(wb) - F.col("b")) * float(day_us)
        ).alias("nx"),
        (F.lead("sc").over(wb).cast("double") / F.lead("n").over(wb)).alias("ny"),
    ).filter(F.col("px").isNotNull() & F.col("nx").isNotNull())
    area = F.abs(
        (F.col("px") - F.col("nx")) * (F.col("c") - F.col("py"))
        - (F.col("px") - F.col("xr")) * (F.col("ny") - F.col("py"))
    )
    scored = pts.join(F.broadcast(ctx), ["event_type", "b"]).select(
        "event_type", "b", "event_id", "value", area.alias("area")
    )
    # r12 optimization round: the per-(type, bucket) top-1 used to be a
    # row_number window. max_by with the lexicographic (area, -event_id)
    # key is the same pick (max area, ties to the LOWEST event_id) as
    # ORDER BY area DESC, event_id. Honest plan accounting (r12 verdict
    # item 2): the window form ALREADY did map-side top-1 via
    # WindowGroupLimit before its exchange, and the struct-keyed max_by
    # falls back to SortAggregate (struct isn't a mutable hash-agg
    # buffer type), so the after-plan still sorts and the exchange
    # count is unchanged — the win is the smaller sort input
    # (SortAggregate sorts grouping keys only vs the window's full
    # (area, event_id) rank sort) and one less operator pass. Measured:
    # wash at 32 cores, −15% at 8 cores (interleaved A/B, r12).
    pick = F.max_by(
        F.struct("event_id", "value", "area"),
        F.struct(F.col("area"), (-F.col("event_id")).alias("nid")),
    )
    return (
        scored.groupBy("event_type", "b")
        .agg(pick.alias("p"))
        .select(
            "event_type",
            F.col("b").alias("bucket"),
            F.col("p.event_id").alias("event_id"),
            dround(F.col("p.value").cast("double"), 4).alias("y"),
            # explicit FLOOR: DuckDB's double->BIGINT cast rounds,
            # Spark's truncates — FLOOR makes both sides identical
            F.floor(F.col("p.area")).cast("long").alias("area"),
        )
        .orderBy("event_type", "bucket")
    )


XCORR_MAX_LAG = 7


@register(
    "timeseries_lagged_crosscorr",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buys
        FROM events GROUP BY CAST(ts AS DATE)),
    lags AS (SELECT CAST(l AS INTEGER) AS lag
             FROM range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1) t(l))
    SELECT g.lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(corr(a.clicks, b.buys), 4) AS xcorr
    FROM lags g
    JOIN daily a ON TRUE
    JOIN daily b ON b.day = a.day + g.lag
    GROUP BY g.lag ORDER BY g.lag
    """,
)
def timeseries_lagged_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two event-type daily series:
    corr(clicks[t], purchases[t+lag]) for lag ∈ [-7, +7] — the
    lead/lag discovery scan (does click volume PREDICT purchase
    volume, and by how many days?). The lag with max |xcorr| is the
    candidate causal offset; window_rolling_corr is the
    contemporaneous sibling.

    Plan: ONE events pass to the day grain (conditional sums — no
    pivot, no second scan), then the day×lag alignment joins the
    day-grain table against itself with the (2·MAXLAG+1)-row lag
    table broadcast — every post-rollup frame is calendar-bounded, so
    the whole lag sweep costs days × lags rows regardless of corpus
    size. 100 TB: identical shape; corr partial-aggregates (sums of
    x, y, xy, x², y²), so each lag group reduces map-side."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count_if(F.col("event_type") == "click").alias("clicks"),
            F.count_if(F.col("event_type") == "purchase").alias("buys"),
        )
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("day").alias("a_day"), "clicks")
    b = daily.select(F.col("day").alias("b_day"), "buys")
    aligned = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("b_day = date_add(a_day, lag)"))
    )
    return (
        aligned.groupBy("lag")
        .agg(
            F.count("*").alias("n_days"),
            # Spark's corr yields NaN for a single-pair or
            # zero-variance lag group where DuckDB's corr yields NULL;
            # nullify NaN so the oracle compare stays scale-invariant
            # (round-5 ADVICE — green today only because no fixture
            # produces a constant daily series at any lag).
            dround(
                F.when(F.isnan(F.corr("clicks", "buys")), F.lit(None))
                .otherwise(F.corr("clicks", "buys")),
                4,
            ).alias("xcorr"),
        )
        .orderBy("lag")
    )


@register(
    "timeseries_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY CAST(ts AS DATE)),
    centered AS (
        SELECT day, n, n - AVG(n) OVER () AS dev
        FROM daily),
    summed AS (
        SELECT day, n,
               SUM(dev) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        FROM centered)
    SELECT day,
           CAST(n AS BIGINT) AS n_events,
           ROUND(cusum, 4) AS cusum,
           ROUND(abs(cusum), 4) = ROUND(MAX(abs(cusum)) OVER (), 4)
               AS is_changepoint
    FROM summed ORDER BY day
    """,
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen over the daily event-count series:
    the running sum of deviations from the global mean; the day where
    |CUSUM| peaks is the classic single-change-point estimate (a level
    shift flips the slope of the cumulative deviation there). The
    batch sibling of a monitoring alert — complements the
    pointwise z-score screen (timeseries_anomaly_zscore), which
    misses gradual level shifts CUSUM is built for.

    Plan: day-grain rollup (the only data-sized stage), then every
    window — global mean, running sum, global max — runs over the
    calendar-bounded daily table (hundreds of rows; the eventmix
    cells-table argument). 100 TB: unchanged — day count is
    data-independent."""
    from pyspark.sql.window import Window

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    all_w = Window.partitionBy()
    run_w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    centered = daily.select(
        "day", "n", (F.col("n") - F.avg("n").over(all_w)).alias("dev")
    )
    scored = centered.select(
        "day",
        F.col("n").alias("n_events"),
        dround(F.sum("dev").over(run_w), 4).alias("cusum"),
    )
    peak = F.max(F.abs(F.col("cusum"))).over(Window.partitionBy())
    return (
        scored.select(
            "day",
            "n_events",
            "cusum",
            (F.abs(F.col("cusum")) == peak).alias("is_changepoint"),
        )
        .orderBy("day")
    )
