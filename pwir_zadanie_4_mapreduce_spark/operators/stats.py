"""Statistical / sketch / language-model operator surface (round 3).

Families added here, each oracle-checked against DuckDB:
- experiment stats: deterministic A/B z-test, per-group OLS regression,
  mutual information, rolling correlation windows;
- mergeable state: partial-aggregate re-aggregation (the 100 TB
  incremental-rollup pattern), exact bitmap distinct counting;
- sketches with engine-portable hashing (md5 arithmetic, so the DuckDB
  oracle computes the *same* sketch): count-min heavy hitters, bloom
  membership;
- corpus statistics for training-data pipelines: bigram LM scoring,
  per-source KL-divergence drift;
- graph: unrolled BFS levels over the supplier↔part bipartite graph;
- warehouse: small-file compaction planning (metadata-only).

Design rules follow operators/relational.py: declarative DataFrame
plans (Catalyst keeps pushdown/pruning/broadcast), every computed
column aliased identically to the oracle, doubles rounded via dround.
Scale notes on each operator answer "what does this cost at 100 TB".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register
from pwir_zadanie_4_mapreduce_spark.functions.lineage import cut_lineage


def _r4(c: Column) -> Column:
    return dround(c, 4)


def _tokens(text: Column) -> Column:
    """lower → whitespace split → drop empties; identical to the DuckDB
    spelling list_filter(string_split_regex(lower(text),'\\s+'), ...)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


# ---------------------------------------------------------------------------
# experiment statistics
# ---------------------------------------------------------------------------


@register(
    "stats_ab_test_ztest",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(COUNT(*) FILTER (arm = 'A') AS BIGINT) AS n_a,
           CAST(COUNT(*) FILTER (arm = 'B') AS BIGINT) AS n_b,
           ROUND(AVG(value) FILTER (arm = 'A'), 4) AS mean_a,
           ROUND(AVG(value) FILTER (arm = 'B'), 4) AS mean_b,
           ROUND((AVG(value) FILTER (arm = 'A') - AVG(value) FILTER (arm = 'B'))
                 / sqrt(var_samp(value) FILTER (arm = 'A') / COUNT(*) FILTER (arm = 'A')
                      + var_samp(value) FILTER (arm = 'B') / COUNT(*) FILTER (arm = 'B')),
                 4) AS z_score
    FROM assigned
    """,
)
def stats_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test over a deterministic hash-assigned A/B
    split — the experiment-analysis staple. Assignment is md5-prefix
    arithmetic (engine-portable, subset-invariant, no RNG state), the
    same family as sample_hash_orders.

    Plan: ONE global aggregation with conditional (FILTER-style)
    aggregates — no per-arm scans, no join. 100 TB note: the scan is
    the entire cost; the agg shuffles one partial row per task."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm_a = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8"
    va = F.when(arm_a, F.col("value"))
    vb = F.when(~arm_a, F.col("value"))
    # Arm sizes count ROWS (like the oracle's COUNT(*) FILTER), not
    # non-NULL values — parity must not depend on `value` nullability.
    agg = ev.agg(
        F.count(F.when(arm_a, F.lit(1))).alias("n_a"),
        F.count(F.when(~arm_a, F.lit(1))).alias("n_b"),
        F.avg(va).alias("ma"),
        F.avg(vb).alias("mb"),
        F.var_samp(va).alias("sa"),
        F.var_samp(vb).alias("sb"),
    )
    z = (F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("sa") / F.col("n_a") + F.col("sb") / F.col("n_b")
    )
    return agg.select(
        "n_a",
        "n_b",
        _r4(F.col("ma")).alias("mean_a"),
        _r4(F.col("mb")).alias("mean_b"),
        _r4(z).alias("z_score"),
    )


@register(
    "agg_regr_price_qty",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 4)        AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_regr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price ~ quantity) via the SQL:2003
    REGR_* aggregates — slope/intercept/R² in ONE pass, no iterative
    fitting. These are second-moment accumulators (like corr/covar in
    agg_corr_moments), so they partial-aggregate map-side.

    100 TB note: per-group linear models at any scale cost exactly one
    scan + a groups-sized shuffle; this is the pattern that replaces
    'collect to driver and fit sklearn' for simple regressions."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            _r4(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
            _r4(F.regr_intercept("l_extendedprice", "l_quantity")).alias("intercept"),
            _r4(F.regr_r2("l_extendedprice", "l_quantity")).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "stats_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
    my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
    tot AS (SELECT SUM(c) AS n FROM cells)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(tot.n) AS BIGINT) AS n_rows,
           ROUND(SUM((cells.c::DOUBLE / tot.n)
                     * ln(cells.c::DOUBLE * tot.n / (mx.cx::DOUBLE * my.cy))), 6)
               AS mi_nats
    FROM cells
    JOIN mx USING (x) JOIN my USING (y)
    CROSS JOIN tot
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (order
    priority × status) — the dependence screen used for feature
    selection and leakage detection in training pipelines.

    Plan: one groupBy builds the contingency cells; both margins
    re-aggregate the CELLS (not the input), so the fact table is
    scanned once; margins and the total are broadcast back onto the
    cells. 100 TB note: cost after the first agg is O(|X|·|Y|),
    independent of row count."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    )
    cells = orders.groupBy("x", "y").agg(F.count("*").alias("c"))
    cells = cells.transform(cut_lineage)  # margins + join reuse it
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    tot = cells.agg(F.sum("c").alias("n"))
    term = (F.col("c").cast("double") / F.col("n")) * F.log(
        F.col("c").cast("double") * F.col("n") / (F.col("cx").cast("double") * F.col("cy"))
    )
    contrib = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term"), "n")
    )
    return contrib.agg(
        F.count("*").alias("n_cells"),
        F.max("n").alias("n_rows"),
        dround(F.sum("term"), 6).alias("mi_nats"),
    )


@register(
    "window_rolling_corr",
    oracle="""
    WITH seq AS (
      SELECT event_type, value,
             LAG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT event_type, CAST(rn AS BIGINT) AS rn,
           -- zero-variance guard mirrored from the Spark side: on a
           -- constant 50-row run DuckDB's corr yields 1.0 while
           -- Spark's raises ANSI DIVIDE_BY_ZERO; both spellings below
           -- emit NULL for that window instead
           CASE WHEN stddev_samp(value) OVER w > 1e-6
                 AND stddev_samp(prev) OVER w > 1e-6
                THEN ROUND(covar_samp(value, prev) OVER w
                           / (stddev_samp(value) OVER w
                              * stddev_samp(prev) OVER w), 4)
           END AS roll_corr
    FROM seq
    WINDOW w AS (PARTITION BY event_type ORDER BY rn
                 ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
    QUALIFY rn % 100 = 0
    ORDER BY event_type, rn
    """,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lag-1 autocorrelation of event values over a 50-row
    window per event type — the drift/regime-change monitor shape.
    corr as a WINDOW aggregate (not groupBy): second-moment state, so
    the frame slides in O(1) per row.

    100 TB note: partitioned by event_type and ordered within the
    partition — no global sort; sampled output (every 100th row) keeps
    the result driver-safe while the full curve is a write-to-table
    away."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    wseq = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "value",
        F.lag("value").over(wseq).alias("prev"),
        F.row_number().over(wseq).alias("rn"),
    )
    # Sampled-anchor rewrite: output rows are every 100th position and
    # the frame is 50 rows, so each input row feeds AT MOST ONE anchor
    # (stride > frame). That turns the sliding-frame window — which
    # Spark recomputes per row, on only #event_type partitions — into
    # one hash aggregation over (type, anchor) groups: 100× less corr
    # work and full-cluster parallelism instead of 5 tasks. The
    # max-rn anchor guard drops trailing partial frames whose anchor
    # row does not exist. Result identical to the frame spelling
    # (the oracle keeps it).
    anchor = (F.ceil(F.col("rn") / 100) * 100).cast("long")
    # corr spelled as covar/(sd*sd) with an explicit zero-variance
    # guard (r11 sf10 catch): Spark's corr AGGREGATE raises ANSI
    # DIVIDE_BY_ZERO when a window has zero variance — which the
    # factor-100 scaleup's replica interleaving produces as 50-row
    # constant-value runs — while DuckDB's corr returns NULL there.
    # The guarded spelling emits NULL on both engines.
    sd_v, sd_p = F.stddev_samp("value"), F.stddev_samp("prev")
    # the guard threshold is an EPSILON, not 0: on an exactly-constant
    # run Spark's Welford M2 is exactly 0 but DuckDB's segment-tree
    # window state leaves ~1e-14 cancellation noise (and then corr of
    # the noise reads 1.0) — fixture windows are either truly constant
    # or have sd >= O(1), so 1e-6 separates the two cleanly
    corr_guarded = F.when(
        (sd_v > 1e-6) & (sd_p > 1e-6),
        F.covar_samp("value", "prev") / (sd_v * sd_p),
    )
    return (
        seq.withColumn("anchor", anchor)
        .filter(F.col("anchor") - F.col("rn") <= 49)
        .groupBy("event_type", F.col("anchor").alias("rn"))
        .agg(
            _r4(corr_guarded).alias("roll_corr"),
            F.max(F.when(F.col("rn") == F.col("anchor"), 1).otherwise(0)).alias("has_anchor"),
        )
        .filter(F.col("has_anchor") == 1)
        .select("event_type", "rn", "roll_corr")
        .orderBy("event_type", "rn")
    )


# ---------------------------------------------------------------------------
# mergeable aggregation state
# ---------------------------------------------------------------------------


@register(
    "agg_partial_state_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value), 4) AS mean_value,
           ROUND(var_samp(value), 4) AS var_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_partial_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregate re-aggregation: daily (event_type, day)
    partials — count, sum, sum-of-squares, min, max — merged into
    per-type totals, with mean/variance reconstructed FROM THE MERGED
    MOMENTS. The oracle computes the same stats directly from raw
    rows, proving the state is lossless.

    This is THE 100 TB incremental pattern (same family as the HLL
    sketches): nightly partials are tiny, mergeable, and re-aggregable
    to any coarser grain without rescanning history. Moment state is
    what Spark's own partial aggregation ships between map and reduce —
    materialized here as a user-level table."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day"), "value"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    merged = daily.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return merged.select(
        "event_type",
        F.col("n").alias("n_events"),
        _r4(F.col("s") / F.col("n")).alias("mean_value"),
        _r4(var).alias("var_value"),
        _r4(F.col("mn")).alias("min_value"),
        _r4(F.col("mx")).alias("max_value"),
    ).orderBy("event_type")


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH masks AS (
      -- shift in HUGEINT then narrow: DuckDB range-checks BIGINT << 63,
      -- while Spark's shiftleft(1L, 63) wraps into the sign bit; the
      -- popcount of the resulting 64-bit pattern is identical.
      SELECT event_type, user_id // 64 AS bucket,
             bit_or((1::HUGEINT << CAST(user_id % 64 AS INTEGER))::UBIGINT) AS mask
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct_bitmap
    FROM masks GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts via roaring-bitmap-style bucketed
    bitmasks: users bucket into 64-id blocks, each block aggregates to
    one int64 mask (bit_or), popcounts sum to the exact cardinality.

    vs countDistinct at 100 TB: countDistinct shuffles every distinct
    (key, value) pair; the bitmap shuffles one 8-byte mask per 64-id
    block per task — a 64× floor on shuffle volume for dense id
    spaces, and the masks are MERGEABLE (bit_or) across days/shards
    like the HLL sketches, but exact."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    masks = ev.groupBy(
        "event_type", F.expr("user_id div 64").alias("bucket")
    ).agg(F.expr("bit_or(shiftleft(1L, cast(user_id % 64 as int)))").alias("mask"))
    return (
        masks.groupBy("event_type")
        .agg(F.sum(F.bit_count("mask")).alias("n_distinct_bitmap"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# engine-portable sketches (md5 arithmetic on both sides)
# ---------------------------------------------------------------------------

CM_DEPTH = 3
CM_WIDTH = 256
CM_TOPK = 10


@register(
    "sketch_countmin_heavy_hitters",
    oracle=f"""
    WITH cells AS (
      SELECT r.r,
             ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                 % {CM_WIDTH} AS col,
             COUNT(*) AS cell_cnt
      FROM orders CROSS JOIN range({CM_DEPTH}) r(r)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT o_custkey, COUNT(*) AS exact_cnt FROM orders GROUP BY o_custkey
      ORDER BY exact_cnt DESC, o_custkey LIMIT {CM_TOPK}
    )
    SELECT e.o_custkey, CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.cell_cnt) AS BIGINT) AS cm_est
    FROM exact e CROSS JOIN range({CM_DEPTH}) r(r)
    JOIN cells c
      ON c.r = r.r
     AND c.col = ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || CAST(e.o_custkey AS VARCHAR)), 1, 8))::BIGINT
                 % {CM_WIDTH}
    GROUP BY e.o_custkey, e.exact_cnt
    ORDER BY exact_cnt DESC, e.o_custkey
    """,
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch ({CM_DEPTH}×{CM_WIDTH}) over order customer
    keys, probed for the top-{CM_TOPK} heavy hitters against exact
    counts. Hashing is md5 arithmetic so DuckDB builds the IDENTICAL
    sketch — the estimate (an upper bound ≥ exact by construction) is
    oracle-checked cell for cell.

    100 TB note: the sketch is d×w counters (3×256 here) regardless of
    input size — the groupBy shuffles at most d×w rows per task. This
    is the fixed-memory frequency summary for unbounded key domains;
    the exact side exists only to audit the error."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    rs = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("r")

    def cm_col(r: Column, key: Column) -> Column:
        h = F.md5(F.concat(r.cast("string"), F.lit(":"), key.cast("string")))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CM_WIDTH).alias("col")

    cells = (
        orders.select(rs, "o_custkey")
        .select("r", cm_col(F.col("r"), F.col("o_custkey")), "o_custkey")
        .groupBy("r", "col")
        .agg(F.count("*").alias("cell_cnt"))
    )
    exact = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "o_custkey")
        .limit(CM_TOPK)
    )
    probes = exact.select(rs, "o_custkey", "exact_cnt").select(
        "r", cm_col(F.col("r"), F.col("o_custkey")), "o_custkey", "exact_cnt"
    )
    return (
        F.broadcast(probes)
        .join(cells, ["r", "col"])
        .groupBy("o_custkey", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cm_est"))
        .orderBy(F.desc("exact_cnt"), "o_custkey")
    )


BLOOM_BITS = 4096
BLOOM_K = 3


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH members AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ),
    bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(k.k AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                 % {BLOOM_BITS} AS bitpos
      FROM members CROSS JOIN range({BLOOM_K}) k(k)
    ),
    probe AS (
      SELECT c.c_custkey,
             COUNT(b.bitpos) AS hits,
             MAX(CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS is_member
      FROM customer c
      CROSS JOIN range({BLOOM_K}) k(k)
      LEFT JOIN bits b
        ON b.bitpos = ('0x' || substr(md5(CAST(k.k AS VARCHAR) || ':' || CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT
                      % {BLOOM_BITS}
      LEFT JOIN members m ON m.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_members,
           CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(COUNT(*) FILTER (hits = {BLOOM_K}) AS BIGINT) AS n_bloom_hits,
           CAST(COUNT(*) FILTER (hits = {BLOOM_K} AND is_member = 0) AS BIGINT) AS n_false_pos
    FROM probe
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter ({BLOOM_BITS} bits, k={BLOOM_K}) built over
    customers with finished orders, probed by the full customer table;
    reports true membership vs bloom hits vs false positives. md5-bit
    arithmetic means DuckDB constructs the IDENTICAL filter, so even
    the false-positive count is deterministic and oracle-checked.

    100 TB note: this is the semi-join pruning pattern Spark's own
    runtime bloom filters apply — the bit set is ≤ {BLOOM_BITS} longs
    (broadcast), the probe side never shuffles, and membership is a
    map-side filter. Build cost is one pass over the (distinct) build
    side."""
    orders = load_table(spark, sf_dir, "orders")
    members = (
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    ).transform(cut_lineage)
    ks = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("k")

    def bitpos(k: Column, key: Column) -> Column:
        h = F.md5(F.concat(k.cast("string"), F.lit(":"), key.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BLOOM_BITS

    bits = (
        members.select(ks, "o_custkey")
        .select(bitpos(F.col("k"), F.col("o_custkey")).alias("bitpos"))
        .distinct()
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    probe_bits = cust.select(ks, "c_custkey").select(
        "c_custkey", bitpos(F.col("k"), F.col("c_custkey")).alias("bitpos")
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "bitpos", "left_semi")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("hits"))
    )
    probe = (
        cust.join(F.broadcast(hits), "c_custkey", "left")
        .join(members.withColumnRenamed("o_custkey", "c_custkey").withColumn("im", F.lit(1)), "c_custkey", "left")
        .select(
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.coalesce(F.col("im"), F.lit(0)).alias("is_member"),
        )
    )
    # r12 optimization round: the member count used to be a separate
    # driver job embedded as a literal; a broadcast 1-row agg rides the
    # main job instead (same value, one fewer job). The crossJoin sits
    # ABOVE the probe aggregation (r12 ADVICE): an empty probe table
    # then still emits the real member count (agg-below-crossJoin made
    # max(nm) NULL on zero probe rows, diverging from the oracle on
    # that edge), and nm no longer rides every probe row.
    n_members = members.agg(F.count("*").alias("nm"))
    return (
        probe.agg(
            F.count("*").alias("n_probed"),
            F.count(F.when(F.col("hits") == BLOOM_K, 1)).alias("n_bloom_hits"),
            F.count(
                F.when((F.col("hits") == BLOOM_K) & (F.col("is_member") == 0), 1)
            ).alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_members))
        .select(
            F.col("nm").alias("n_members"), "n_probed", "n_bloom_hits", "n_false_pos"
        )
    )


# ---------------------------------------------------------------------------
# corpus statistics (training-data pipelines)
# ---------------------------------------------------------------------------


@register(
    "text_bigram_lm_score",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    uni AS (
      SELECT unnest(t) AS w FROM toks
    ),
    c1 AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    v AS (SELECT COUNT(DISTINCT w) AS vocab FROM uni),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> {'w1': t[i], 'w2': t[i+1]}), recursive := true)
      FROM toks
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(ln((c2.c + 1.0) / (c1.c + v.vocab))), 4) AS avg_logprob
    FROM bg
    JOIN c2 USING (w1, w2)
    JOIN c1 ON c1.w = bg.w1
    CROSS JOIN v
    GROUP BY bg.doc_id
    ORDER BY avg_logprob DESC, bg.doc_id
    LIMIT 20
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language model scoring: add-one-smoothed
    P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) trained on the whole corpus,
    each document scored by its mean log-probability — the classic
    KenLM-style fluency/quality filter for training-data curation
    (docs scoring highest are the most 'typical' text). Top 20 shown.

    Plan: tokenization and bigram construction are Catalyst lambda
    expressions (no Python); the model tables (bigram counts, unigram
    counts, vocab scalar) are vocab-bounded (Zipf), aggregate map-side
    and BROADCAST back onto the unshuffled posting — the posting
    itself never crosses an exchange (r13: the previous spelling ran
    the bigram count as a COUNT window, exchanging + sorting the full
    posting). 100 TB note: scoring is one corpus scan + broadcast
    joins; only per-doc partial aggregates move."""
    scored = _bigram_doc_logprobs(spark, sf_dir)
    return (
        scored.select("doc_id", "n_bigrams", _r4(F.col("avg_lp")).alias("avg_logprob"))
        .orderBy(F.desc("avg_logprob"), "doc_id")
        .limit(20)
    )


def _bigram_doc_logprobs(
    spark: SparkSession, sf_dir: str, with_docs: bool = False
):
    """Per-document add-one-smoothed bigram log-probabilities
    (doc_id, n_bigrams, avg_lp) — the shared model+scoring plan behind
    text_bigram_lm_score and quality_perplexity_filter; see the former
    for the plan rationale. ``with_docs=True`` additionally returns the
    checkpointed (doc_id, source, t) frame so callers needing document
    metadata re-read the checkpoint instead of re-scanning the table.

    r13 optimization round (guide §2.3 aggregate-before-shuffle): the
    bigram count used to ride a COUNT window over the (w1, w2)
    partition — an exchange of the ENTIRE posting (doc_id, w1, w2,
    every occurrence) plus the window's sort. The model table is
    vocab²-bounded (Zipf; 931 rows at sf0.1), so a groupBy(w1, w2)
    count partial-aggregates map-side (ships one row per distinct
    bigram per task) and broadcasts back onto the UNSHUFFLED posting —
    no full-posting exchange, no sort anywhere. vocab likewise stopped
    being a third explode pass: it is COUNT(*) of the c1 unigram table,
    whose aggregation exchange is plan-identical to c1's and reused at
    runtime (AQE stage reuse). The per-doc average then partial-aggs
    over checkpoint-local rows (each doc's bigrams are contiguous), so
    the only full-width data movement left in the whole plan is the
    one corpus tokenize into the checkpoint."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _tokens(F.col("text")).alias("t")
    )
    docs = docs.transform(cut_lineage)  # tokens feed unigrams AND bigrams
    uni = docs.select(F.explode("t").alias("w"))
    # cached: the vocab-bounded unigram table feeds the scoring
    # broadcast AND the vocab scalar — without the cache the vocab
    # count re-runs c1's whole explode pass (AQE stage reuse does not
    # fire across the broadcast/agg consumers; verified in the final
    # adaptive plan). Storage is released by the caller between runs
    # like every other within-query cache.
    c1 = uni.groupBy("w").agg(F.count("*").alias("c1")).cache()
    vocab = c1.agg(F.count("*").alias("vocab"))
    bigram_expr = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select("doc_id", F.explode(bigram_expr).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    scored = (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), bg["w1"] == c1["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab"))).alias("lp"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.avg("lp").alias("avg_lp")
    )
    return (out, docs) if with_docs else out


@register(
    "quality_perplexity_filter",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    uni AS (SELECT unnest(t) AS w FROM toks),
    c1 AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    v AS (SELECT COUNT(DISTINCT w) AS vocab FROM uni),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                    i -> {'w1': t[i], 'w2': t[i+1]}), recursive := true)
      FROM toks
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    scores AS (
      SELECT bg.doc_id, AVG(ln((c2.c + 1.0) / (c1.c + v.vocab))) AS lp
      FROM bg
      JOIN c2 USING (w1, w2)
      JOIN c1 ON c1.w = bg.w1
      CROSS JOIN v
      GROUP BY bg.doc_id
    ),
    m AS (SELECT AVG(lp) AS mean_lp FROM scores)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(COUNT(*) FILTER (ROUND(s.lp, 4) >= ROUND(m.mean_lp, 4)) AS BIGINT)
               AS n_kept,
           ROUND(100.0 * COUNT(*) FILTER (ROUND(s.lp, 4) >= ROUND(m.mean_lp, 4))
                 / COUNT(*), 4) AS pct_kept
    FROM scores s
    JOIN documents d USING (doc_id)
    CROSS JOIN m
    GROUP BY d.source ORDER BY d.source
    """,
)
def quality_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fluency gate over the corpus: score every document under the
    corpus's own add-one bigram LM, keep those at or above the corpus
    mean log-probability, and report the per-source keep rate — the
    end-to-end KenLM-style filtering decision (text_bigram_lm_score
    shows the scores; this op makes the cut and audits which sources
    it would shrink). The threshold is adaptive (corpus mean), so the
    op stays meaningful under distribution shift; the comparison is on
    4-decimal-rounded values so the kept set is engine-stable.

    Plan: the shared scoring plan (broadcast model tables over the
    unshuffled posting), CHECKPOINTED so the corpus-mean pass re-reads
    the per-doc scores instead of re-running the whole scoring plan
    (the at-scale equivalent is staging the score table); then the
    mean is a 1-row broadcast and the audit a sources-bounded agg.
    The per-source join reads the tokenize CHECKPOINT for (doc_id,
    source) instead of re-scanning documents — scan count 2 → 1 (r13,
    the r12 verdict's deferred candidate #4). Docs with <2 tokens have
    no bigrams and are excluded from scoring by construction."""
    scored, docs = _bigram_doc_logprobs(spark, sf_dir, with_docs=True)
    scored = scored.transform(cut_lineage)
    mean_lp = scored.agg(F.avg("avg_lp").alias("mean_lp"))
    src = docs.select("doc_id", "source")
    kept = dround(F.col("avg_lp"), 4) >= dround(F.col("mean_lp"), 4)
    return (
        scored.join(src, "doc_id")
        .crossJoin(F.broadcast(mean_lp))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_scored"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            _r4(100.0 * F.count(F.when(kept, 1)) / F.count("*")).alias("pct_kept"),
        )
        .orderBy("source")
    )


@register(
    "quality_kl_divergence_sources",
    oracle=r"""
    WITH st AS (
      SELECT source, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
      FROM documents
    ),
    cs AS (SELECT source, w, COUNT(*) AS c FROM st GROUP BY source, w),
    cc AS (SELECT w, SUM(c) AS c_corpus FROM cs GROUP BY w),
    ns AS (SELECT source, SUM(c) AS n_src FROM cs GROUP BY source),
    nc AS (SELECT SUM(c) AS n_corpus FROM cs)
    SELECT cs.source,
           CAST(MAX(ns.n_src) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(SUM((cs.c::DOUBLE / ns.n_src)
                     * ln((cs.c::DOUBLE / ns.n_src)
                          / (cc.c_corpus::DOUBLE / nc.n_corpus))), 4) AS kl_nats
    FROM cs
    JOIN ns USING (source)
    JOIN cc USING (w)
    CROSS JOIN nc
    GROUP BY cs.source
    ORDER BY cs.source
    """,
)
def quality_kl_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift per source: KL(P_source ‖ P_corpus)
    over each source's token support — the domain-mix / contamination
    monitor for multi-source training corpora (a source whose language
    diverges from the blend scores high).

    Plan: ONE (source, token) aggregation over the exploded corpus;
    corpus totals, per-source totals and the corpus distribution all
    RE-AGGREGATE that table (vocab-bounded), never the corpus, and
    broadcast back. 100 TB note: after the first agg everything is
    O(vocab) — the drift dashboard costs one scan."""
    st = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(_tokens(F.col("text"))).alias("w")
    )
    cs = st.groupBy("source", "w").agg(F.count("*").alias("c"))
    cs = cs.transform(cut_lineage)  # three re-aggregations below
    cc = cs.groupBy("w").agg(F.sum("c").alias("c_corpus"))
    ns = cs.groupBy("source").agg(F.sum("c").alias("n_src"))
    nc = cs.agg(F.sum("c").alias("n_corpus"))
    p_src = F.col("c").cast("double") / F.col("n_src")
    p_corpus = F.col("c_corpus").cast("double") / F.col("n_corpus")
    return (
        cs.join(F.broadcast(ns), "source")
        .join(cc, "w")
        .crossJoin(F.broadcast(nc))
        .groupBy("source")
        .agg(
            F.max("n_src").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            _r4(F.sum(p_src * F.log(p_src / p_corpus))).alias("kl_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# graph: unrolled BFS levels
# ---------------------------------------------------------------------------


@register(
    "graph_bfs_levels",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    p1 AS (SELECT DISTINCT p FROM edges WHERE s = 1),
    s2 AS (
      SELECT DISTINCT e.s FROM edges e JOIN p1 USING (p) WHERE e.s <> 1
    ),
    p3 AS (
      SELECT DISTINCT e.p FROM edges e JOIN s2 USING (s)
      WHERE e.p NOT IN (SELECT p FROM p1)
    )
    SELECT 'S' AS node_type, CAST(1 AS BIGINT) AS node_id, 0 AS dist
    UNION ALL SELECT 'P', p, 1 FROM p1
    UNION ALL SELECT 'S', s, 2 FROM s2
    UNION ALL SELECT 'P', p, 3 FROM p3
    ORDER BY dist, node_type, node_id
    """,
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unrolled 3-level BFS from supplier #1 over the supplier↔part
    bipartite graph (edges = distinct lineitem (suppkey, partkey)) —
    shortest-path levels, the reachability primitive behind lineage
    and fraud-ring queries.

    Plan: the edge list materializes once (lazy checkpoint) and each
    level is one semi-join (frontier expansion) + one anti-join
    (visited-set subtraction) — the vertex-centric BFS round on a
    shuffle engine, same family as dedup_cluster_components. 100 TB
    note: per-round cost is O(frontier edges), and the unrolled form
    trades driver-loop convergence checks for a fixed depth (the
    production BFS loops with a changed-count check exactly like
    connected_components)."""
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    ).transform(cut_lineage)
    p1 = edges.filter(F.col("s") == 1).select("p").distinct()
    s2 = (
        edges.join(F.broadcast(p1), "p", "left_semi")
        .filter(F.col("s") != 1)
        .select("s")
        .distinct()
    )
    p3 = (
        edges.join(F.broadcast(s2), "s", "left_semi")
        .join(F.broadcast(p1), "p", "left_anti")
        .select("p")
        .distinct()
    )
    seed = spark.range(1).select(
        F.lit("S").alias("node_type"), F.lit(1).cast("long").alias("node_id"), F.lit(0).alias("dist")
    )
    lvl = lambda df, col, t, d: df.select(  # noqa: E731
        F.lit(t).alias("node_type"), F.col(col).alias("node_id"), F.lit(d).alias("dist")
    )
    return (
        seed.unionByName(lvl(p1, "p", "P", 1))
        .unionByName(lvl(s2, "s", "S", 2))
        .unionByName(lvl(p3, "p", "P", 3))
        .orderBy("dist", "node_type", "node_id")
    )


# ---------------------------------------------------------------------------
# warehouse: compaction planning
# ---------------------------------------------------------------------------

COMPACT_TARGET = 400_000  # "bytes" (chars) per output file


@register(
    "warehouse_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY source, lang
    ),
    placed AS (
      SELECT source, lang, bytes,
             CAST((SUM(bytes) OVER (ORDER BY bytes DESC, source, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)
                  // {COMPACT_TARGET} AS BIGINT) AS bin_id
      FROM files
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes
    FROM placed GROUP BY bin_id ORDER BY bin_id
    """,
)
def warehouse_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: group input 'files' (here the
    (source, lang) slices of documents, sized by characters) into
    target-sized output bins by running-offset assignment — the OPTIMIZE
    /rewrite-files planning step of every lakehouse maintenance job.

    The cumulative-sum window is GLOBAL by design and documented safe:
    it runs over the FILE INVENTORY (metadata, ~thousands of rows even
    for petabyte tables), never over data rows — planning is a
    driver-scale problem, execution is the distributed part. Integer
    arithmetic end-to-end → bit-exact across engines."""
    files = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.sum("n_chars").alias("bytes"))
    )
    placed = files.withColumn(
        "bin_id", F.expr(f"(sum(bytes) over (order by bytes desc, source, lang) - bytes) div {COMPACT_TARGET}")
    )
    return (
        placed.groupBy("bin_id")
        .agg(F.count("*").alias("n_files"), F.sum("bytes").alias("total_bytes"))
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# cogrouped applyInPandas (as-of merge, pandas surface)
# ---------------------------------------------------------------------------


@register(
    "cogroup_asof_merge",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS last_click_id,
           c.ts       AS last_click_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND user_id < 300) p
    ASOF LEFT JOIN (SELECT * FROM events
          WHERE event_type = 'click' AND user_id < 300) c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY purchase_id
    """,
)
def cogroup_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the COGROUPED Python surface:
    groupBy(key).cogroup(...).applyInArrow aligns each user's
    purchases with their clicks and a numpy searchsorted picks the
    latest at-or-before click — the API for per-key logic that
    genuinely needs imperative code (curve interpolation, model
    scoring). Same semantics (and same oracle) as the pure-DataFrame
    join_asof_last_click_before_purchase, which is the preferred plan;
    this exists to cover the cogroup boundary end-to-end. (Round-5
    realignment: the probe side was orders, whose 1995-2001 dates
    never intersect the 2024 event timestamps — every probe matched
    NULL; see the window variant's note.)

    r12 optimization round (guide §4.1/§4.2): this was applyInPandas +
    pd.merge_asof. Profiling showed the per-group pandas machinery —
    not the merge — dominated: a TRIVIAL cogrouped-pandas function
    cost 2.0 s at sf0.1 (300 groups) vs 1.1 s for the same boundary
    through applyInArrow, and the full query 2.62 s vs 1.06 s with the
    identical asof pick done by numpy searchsorted on the Arrow
    buffers (row-for-row equal output, verified). The semantics of
    pd.merge_asof(direction="backward") are reproduced exactly: right
    side ordered by (cts, click_id), searchsorted(side="right")-1
    picks the last click at-or-before each purchase, ties on cts
    resolve to the highest click_id on both paths.

    100 TB note: one shuffle per side on the key (exactly what the
    union-window form pays); per-key state is that key's rows only.
    Python is the slow path — measured, not assumed, via the bench
    pairing with the window variant."""
    import numpy as np
    import pyarrow as pa

    # user subset: this is the declared Python-slow-path surface demo
    # (the window variant is the preferred full-corpus plan) — the
    # bound keeps the Python-boundary cost a demo, not a
    # bench-dominating pass
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    ts_utc = pa.timestamp("us", tz="UTC")

    def merge(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        n = left.num_rows
        if n == 0:
            return pa.table(
                {
                    "purchase_id": pa.array([], pa.int64()),
                    "last_click_id": pa.array([], pa.int64()),
                    "last_click_ts": pa.array([], ts_utc),
                }
            )
        pid = left.column("purchase_id")
        if right.num_rows == 0:
            return pa.table(
                {
                    "purchase_id": pid,
                    "last_click_id": pa.nulls(n, pa.int64()),
                    "last_click_ts": pa.nulls(n, ts_utc),
                }
            )
        ts_col = left.column("ts")
        ts = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        cts = right.column("cts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cid = right.column("click_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((cid, cts))
        cts_s, cid_s = cts[order], cid[order]
        idx = np.searchsorted(cts_s, ts, side="right") - 1
        missing = idx < 0
        # NULL purchase ts → NULL match (a null timestamp becomes NaN in
        # the numpy view and searchsorted would place it AFTER every
        # click, silently matching the latest one — r12 ADVICE)
        if ts_col.null_count:
            missing |= np.asarray(ts_col.is_null(), dtype=bool)
        safe = np.maximum(idx, 0)
        return pa.table(
            {
                "purchase_id": pid,
                "last_click_id": pa.array(cid_s[safe], pa.int64(), mask=missing),
                "last_click_ts": pa.array(
                    cts_s[safe], pa.int64(), mask=missing
                ).cast(ts_utc),
            }
        )

    # no trailing orderBy: a global sort range-partitions, and its
    # boundary-sampling pass would execute the whole Python cogroup
    # stage a SECOND time (measured 2x on this query). Output order is
    # irrelevant to the order-insensitive oracle compare, and at scale
    # a sort after a per-key merge is a separate, optional stage.
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInArrow(
            merge, "purchase_id bigint, last_click_id bigint, last_click_ts timestamp"
        )
    )


@register(
    "agg_pandas_weighted_mean",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
               AS weighted_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_pandas_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-aggregate UDAF (Arrow-batched): quantity-weighted
    mean price per return flag — the custom-reducer surface for
    aggregations Spark lacks built-ins for. This one IS expressible
    (the oracle's spelling), which is what makes it oracle-checkable;
    it exists to cover the GROUPED_AGG pandas boundary end-to-end.

    100 TB note: grouped-agg pandas UDFs do NOT partial-aggregate —
    every group's rows ship to one task (unlike built-in aggs, which
    combine map-side). Bounded-cardinality groups only; the built-in
    spelling is the default for anything expressible."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _wmean(price, qty):
        return float((price * qty).sum() / qty.sum())

    _wmean.__annotations__ = {"price": pd.Series, "qty": pd.Series, "return": float}
    wmean = pandas_udf(_wmean, "double")

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(wmean("l_extendedprice", "l_quantity").alias("w"))
        .select("l_returnflag", _r4(F.col("w")).alias("weighted_price"))
        .orderBy("l_returnflag")
    )


@register(
    "graph_degree_histogram",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    deg AS (SELECT s, COUNT(*) AS degree FROM edges GROUP BY s)
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier side of the supplier↔part
    graph — the first diagnostic run before any graph algorithm (skew
    in this histogram predicts hot keys in pagerank/triangle joins).

    Two aggregations, the second over the |V|-sized degree table.
    100 TB note: this IS the skew detector — the production pre-flight
    that decides whether the downstream join needs salting or a df-cap
    (SCALE.md, dedup family)."""
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = edges.groupBy("s").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").alias("n_suppliers"))
        .orderBy("degree")
    )


BOOTSTRAP_REPS = 32


@register(
    "stats_bootstrap_se",
    oracle=f"""
    WITH reps AS (
      SELECT b.b AS b, AVG(o_totalprice) AS rep_mean
      FROM orders CROSS JOIN range({BOOTSTRAP_REPS}) b(b)
      WHERE substr(md5(CAST(b.b AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)), 1, 1) < '8'
      GROUP BY b.b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(AVG(rep_mean), 4) AS mean_of_means,
           ROUND(stddev_samp(rep_mean), 4) AS bootstrap_se
    FROM reps
    """,
)
def stats_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap standard error of the mean order price: 32 half-
    sample (m-out-of-n) replicates, each membership decided by md5
    arithmetic on (replicate, key) — fully deterministic resampling,
    so DuckDB draws the IDENTICAL replicates and the SE matches to
    the rounding digit. The uncertainty-quantification staple without
    any RNG state.

    Plan: the replicate axis is a 32-way JVM-side fan-out; after the
    membership filter the partial aggregation collapses everything to
    32 rows per task before the shuffle. 100 TB note: one scan, B×
    compute, B-row shuffle — bootstrap at scale is CPU-bound, never
    shuffle-bound, exactly as here."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bs = F.explode(F.array(*[F.lit(i) for i in range(BOOTSTRAP_REPS)])).alias("b")
    member = (
        F.substring(
            F.md5(F.concat(F.col("b").cast("string"), F.lit(":"), F.col("o_orderkey").cast("string"))),
            1,
            1,
        )
        < "8"
    )
    reps = (
        orders.select(bs, "o_orderkey", "o_totalprice")
        .filter(member)
        .groupBy("b")
        .agg(F.avg("o_totalprice").alias("rep_mean"))
    )
    return reps.agg(
        F.count("*").alias("n_replicates"),
        _r4(F.avg("rep_mean")).alias("mean_of_means"),
        _r4(F.stddev_samp("rep_mean")).alias("bootstrap_se"),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot_w
      FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(MIN(l_extendedprice), 4) AS weighted_median
    FROM w
    WHERE cum_w >= tot_w / 2
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price weighted by quantity) per return flag:
    sort within group, take the first value whose cumulative weight
    crosses half the total — the robust-statistics aggregate SQL lacks
    a built-in for. Total order inside each group is made explicit
    (price, orderkey, linenumber) so the crossing row is unique and
    engine-independent.

    One window pass + one min-aggregation, both partitioned by the
    group key. 100 TB note: the in-group sort is the cost; for
    unbounded groups the sort-free path is IMPLEMENTED as
    agg_weighted_median_binned (operators/binned.py)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(wcum).alias("cum_w"),
        F.sum("l_quantity").over(wtot).alias("tot_w"),
    )
    return (
        w.filter(F.col("cum_w") >= F.col("tot_w") / 2)
        .groupBy("l_returnflag")
        .agg(_r4(F.min("l_extendedprice")).alias("weighted_median"))
        .orderBy("l_returnflag")
    )


@register(
    "stats_chi_square",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
    my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
    tot AS (SELECT SUM(c) AS n FROM cells)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(((SELECT COUNT(*) FROM mx) - 1) * ((SELECT COUNT(*) FROM my) - 1)
                AS INTEGER) AS dof,
           ROUND(SUM(pow(cells.c - mx.cx::DOUBLE * my.cy / tot.n, 2)
                     / (mx.cx::DOUBLE * my.cy / tot.n)), 4) AS chi2
    FROM cells
    JOIN mx USING (x) JOIN my USING (y)
    CROSS JOIN tot
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test on the priority × status
    contingency table — the significance-test complement of
    stats_mutual_information (same cells/margins plan: one fact
    aggregation, everything after is O(|X|·|Y|) on broadcasts).

    Note χ² sums over OBSERVED cells only; absent combinations would
    each add their expected count — with this table's full support the
    two definitions coincide, and the oracle mirrors the observed-cell
    sum exactly."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    )
    cells = orders.groupBy("x", "y").agg(F.count("*").alias("c"))
    cells = cells.transform(cut_lineage)
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    tot = cells.agg(F.sum("c").alias("n"))
    nx = mx.agg(F.count("*").alias("nx"))
    ny = my.agg(F.count("*").alias("ny"))
    expected = F.col("cx").cast("double") * F.col("cy") / F.col("n")
    term = F.pow(F.col("c") - expected, 2) / expected
    return (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(ny))
        .agg(
            F.count("*").alias("n_cells"),
            ((F.max("nx") - 1) * (F.max("ny") - 1)).cast("int").alias("dof"),
            dround(F.sum(term), 4).alias("chi2"),
        )
    )


@register(
    "stats_ks_test",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    per_value AS (
      SELECT value,
             COUNT(*) FILTER (arm = 'A') AS ca,
             COUNT(*) FILTER (arm = 'B') AS cb
      FROM assigned GROUP BY value
    ),
    tot AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb FROM per_value
    ),
    ecdf AS (
      SELECT SUM(ca) OVER (ORDER BY value) AS cum_a,
             SUM(cb) OVER (ORDER BY value) AS cum_b
      FROM per_value
    )
    SELECT CAST(MAX(tot.na) AS BIGINT) AS n_a,
           CAST(MAX(tot.nb) AS BIGINT) AS n_b,
           ROUND(MAX(abs(ecdf.cum_a::DOUBLE / tot.na
                         - ecdf.cum_b::DOUBLE / tot.nb)), 4) AS ks_d
    FROM ecdf CROSS JOIN tot
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the md5-assigned
    A/B arms (same deterministic split as stats_ab_test_ztest): the
    distribution-shape complement of the mean z-test — D = max ECDF
    gap, evaluated at distinct values so ties are handled identically
    in both engines.

    Plan: group to DISTINCT values first (per-value arm counts), THEN
    one global running-sum window over that value table — the global
    order is over distinct metric values, not events. 100 TB note:
    for continuous metrics quantize values into fixed bins first; the
    binned ECDF gives D to bin-width accuracy with a bounded table —
    IMPLEMENTED as stats_ks_test_binned (operators/binned.py)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    arm_a = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8"
    per_value = ev.groupBy("value").agg(
        F.count(F.when(arm_a, 1)).alias("ca"),
        F.count(F.when(~arm_a, 1)).alias("cb"),
    )
    per_value = per_value.transform(cut_lineage)  # totals + ecdf reuse
    tot = per_value.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    # asc_nulls_last: Spark defaults to NULLS FIRST, DuckDB to NULLS
    # LAST — pin the ECDF walk order so a NULL value can't flip parity.
    wv = Window.orderBy(F.asc_nulls_last("value")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = per_value.select(
        F.sum("ca").over(wv).alias("cum_a"), F.sum("cb").over(wv).alias("cum_b")
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("na")
        - F.col("cum_b").cast("double") / F.col("nb")
    )
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            _r4(F.max(gap)).alias("ks_d"),
        )
    )


@register(
    "stats_gini_revenue",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS s FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s,
             ROW_NUMBER() OVER (ORDER BY s, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             SUM(s) OVER () AS tot
      FROM spend
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           ROUND(MAX(tot), 4) AS total_revenue,
           ROUND(SUM((2.0 * i - n - 1) * s) / (MAX(n) * MAX(tot)), 4) AS gini
    FROM ranked
    """,
)
def stats_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality metric behind whale-customer and data-source-balance
    analyses — via the rank formula G = Σ(2i−n−1)·sᵢ / (n·Σs) over
    spend sorted ascending (ties broken by key: deterministic).

    The global rank window runs over the per-customer AGGREGATE
    (customers ≪ orders; one row each), not raw orders — same bounded-
    global-window argument as the equi-depth histogram. 100 TB note:
    past ~10⁹ customers, bucket spend into quantile bins
    (approx_percentile) and compute Gini from the binned Lorenz curve
    — same output shape, no total order; IMPLEMENTED as
    stats_gini_revenue_binned (operators/binned.py)."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    wall = Window.orderBy("s", "o_custkey")
    ranked = spend.select(
        "s",
        F.row_number().over(wall).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("s").over(Window.partitionBy()).alias("tot"),
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        _r4(F.max("tot")).alias("total_revenue"),
        _r4(
            F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("s"))
            / (F.max("n") * F.max("tot"))
        ).alias("gini"),
    )


@register(
    "quality_lang_entropy_by_source",
    oracle="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT source, SUM(n) AS t FROM c GROUP BY source)
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(-SUM((c.n::DOUBLE / tot.t) * ln(c.n::DOUBLE / tot.t)), 4)
               AS lang_entropy_nats
    FROM c JOIN tot USING (source)
    GROUP BY c.source ORDER BY c.source
    """,
)
def quality_lang_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mix — the curation
    dashboard's mono-vs-mixed-source signal (entropy 0 = single
    language; high entropy sources need per-language routing before
    language-specific filters). Sibling of the KL drift metric with
    the same cells-then-broadcast-margins plan.

    100 TB note: one (source, lang) aggregation; entropy arithmetic
    runs on the sources×langs table."""
    c = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
    )
    c = c.transform(cut_lineage)
    tot = c.groupBy("source").agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t")
    return (
        c.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_langs"),
            _r4(-F.sum(p * F.log(p))).alias("lang_entropy_nats"),
        )
        .orderBy("source")
    )


@register(
    "events_active_users_rollup",
    oracle="""
    WITH base AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP)   AS d,
             CAST(date_trunc('week', ts) AS TIMESTAMP)  AS w,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS m
      FROM events
    )
    SELECT 'day' AS grain, d AS bucket_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM base GROUP BY d
    UNION ALL
    SELECT 'week', w, CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM base GROUP BY w
    UNION ALL
    SELECT 'month', m, CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM base GROUP BY m
    ORDER BY grain, bucket_start
    """,
)
def events_active_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU in ONE scan: distinct active users at day, week
    and month grains via GROUPING SETS — the product-metrics ladder.
    Distinct counts do NOT re-aggregate across grains (a month's
    actives ≠ sum of its days'), which is exactly why the Expand-based
    plan matters: each grain gets its own exact distinct from one
    input pass.

    100 TB note: Expand ×3 on (user, grain keys) then distinct-agg —
    shuffle is 3× (user, bucket) pairs, versus 3 full scans for
    separate queries; the sketch alternative (hll per grain) drops the
    3× at the cost of exactness (agg_hll_sketch_users demonstrates
    it)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.date_trunc("week", F.col("ts")).alias("w"),
        F.date_trunc("month", F.col("ts")).alias("m"),
    )
    g = ev.groupingSets([["d"], ["w"], ["m"]], "d", "w", "m").agg(
        F.countDistinct("user_id").alias("active_users"),
        F.grouping_id().alias("gid"),
    )
    # Derive the grain from grouping_id(), NOT column NULL-ness: a
    # genuinely NULL ts yields a NULL day bucket inside the ['d'] set,
    # which must still be reported under 'day' (the oracle does).
    # gid bits over (d, w, m): ['d'] -> 0b011=3, ['w'] -> 0b101=5,
    # ['m'] -> 0b110=6.
    grain = (
        F.when(F.col("gid") == 3, "day")
        .when(F.col("gid") == 5, "week")
        .otherwise("month")
    )
    bucket = (
        F.when(F.col("gid") == 3, F.col("d"))
        .when(F.col("gid") == 5, F.col("w"))
        .otherwise(F.col("m"))
    )
    return (
        g.select(
            grain.alias("grain"),
            bucket.alias("bucket_start"),
            "active_users",
        )
        .orderBy("grain", "bucket_start")
    )


@register(
    "quality_fk_orphan_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
               AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    ORDER BY fk
    """,
)
def quality_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned child rows per declared
    foreign key (lineitem→orders, orders→customer) — the constraint
    check engines without enforced FKs (every lakehouse) must run as a
    query. Anti-joins count children whose parent key is absent.

    100 TB note: each FK costs one anti-join; the parent side ships
    only its key column, and a bloom-shaped pre-filter (the
    sketch_bloom_membership machinery) prunes the probe before the
    shuffle when parents are huge."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def audit(child: DataFrame, parent: DataFrame, ckey: str, pkey: str, label: str) -> DataFrame:
        n_child = child.agg(F.count("*").alias("n_child_rows"))
        orphans = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        return (
            n_child.crossJoin(F.broadcast(orphans))
            .select(F.lit(label).alias("fk"), "n_child_rows", "n_orphans")
        )

    return (
        audit(li, orders, "l_orderkey", "o_orderkey", "lineitem.l_orderkey -> orders")
        .unionByName(
            audit(orders, cust, "o_custkey", "c_custkey", "orders.o_custkey -> customer")
        )
        .orderBy("fk")
    )


ZIPF_TOP = 500


@register(
    "text_zipf_fit",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
      FROM documents
    ),
    counts AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
      FROM counts QUALIFY r <= {ZIPF_TOP}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
           ROUND(regr_slope(ln(c::DOUBLE), ln(r::DOUBLE)), 4) AS zipf_slope,
           ROUND(regr_r2(ln(c::DOUBLE), ln(r::DOUBLE)), 4)    AS fit_r2
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus frequency curve: OLS slope of
    log-frequency on log-rank over the top-{ZIPF_TOP} tokens (natural
    text ≈ −1; strong deviation flags synthetic or degenerate corpora
    — a distribution-level quality gate beside the per-doc filters).

    Token counts are one aggregation; ranking and the regression run
    on the top-K table (TakeOrdered, vocab-bounded). Composes the
    vocab-coverage counts with the REGR_* machinery."""
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(_tokens(F.col("text"))).alias("w")
    )
    counts = tok.groupBy("w").agg(F.count("*").alias("c"))
    ranked = (
        counts.orderBy(F.desc("c"), "w")
        .limit(ZIPF_TOP)
        .withColumn("r", F.row_number().over(Window.orderBy(F.desc("c"), "w")))
    )
    lnc, lnr = F.log(F.col("c").cast("double")), F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_ranks"),
        _r4(F.regr_slope(lnc, lnr)).alias("zipf_slope"),
        _r4(F.regr_r2(lnc, lnr)).alias("fit_r2"),
    )


@register(
    "events_heatmap_hour_dow",
    oracle="""
    SELECT CAST((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 4) % 7
               AS INTEGER) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY dow, hour
    """,
)
def events_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour × day-of-week activity heatmap — the seasonality dashboard
    behind capacity planning and anomaly baselines. Day-of-week is
    computed as (epoch_days + 4) % 7 (1970-01-01 was a Thursday;
    0 = Sunday) — ENGINE-NEUTRAL arithmetic, because dayofweek()
    conventions differ between engines (Spark 1=Sunday, DuckDB
    0=Sunday, ISO variants 1=Monday).

    One aggregation to a 7×24-bounded table; at 100 TB the heatmap is
    the canonical always-on rollup to maintain incrementally
    (warehouse_incremental_mv's refresh applies directly)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    dow = (
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) + 4) % 7
    ).cast("int")
    return (
        ev.groupBy(dow.alias("dow"), F.hour("ts").alias("hour"))
        .agg(F.count("*").alias("n_events"), dround(F.sum("value"), 4).alias("total_value"))
        .orderBy("dow", "hour")
    )


@register(
    "agg_skew_kurtosis_moments",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(value) AS s1,
             SUM(value * value) AS s2,
             SUM(value * value * value) AS s3,
             SUM(value * value * value * value) AS s4
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
                 / pow(s2 / n - pow(s1 / n, 2), 1.5), 4) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * pow(s1 / n, 2) * (s2 / n) - 3 * pow(s1 / n, 4))
                 / pow(s2 / n - pow(s1 / n, 2), 2) - 3, 4) AS excess_kurtosis
    FROM m ORDER BY event_type
    """,
)
def agg_skew_kurtosis_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type, computed
    from RAW power sums (Σx..Σx⁴) with the same central-moment algebra
    spelled out on both sides — built-in skewness()/kurtosis() differ
    between engines (population vs sample-corrected estimators), so
    the portable spelling is the moment arithmetic itself.

    The power sums are one partial+final aggregation (the
    agg_partial_state_merge state vector extended to 4th order — still
    mergeable, which is what matters at 100 TB: distribution-shape
    monitoring from the same nightly partials as mean/variance).
    Numerical note: raw-moment cancellation loses digits when
    |mean| ≫ stddev; these metrics are O(100)-scaled, well inside
    double precision at the 4-decimal oracle tolerance."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = F.col("s3") / F.col("n") - 3 * mean * (F.col("s2") / F.col("n")) + 2 * F.pow(mean, 3)
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * F.pow(mean, 2) * (F.col("s2") / F.col("n"))
        - 3 * F.pow(mean, 4)
    )
    return m.select(
        "event_type",
        "n",
        _r4(m3 / F.pow(m2, 1.5)).alias("skewness"),
        _r4(m4 / F.pow(m2, 2) - 3).alias("excess_kurtosis"),
    ).orderBy("event_type")


@register(
    "events_user_activity_histogram",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    )
    SELECT CAST(FLOOR(ln(n::DOUBLE) / ln(2)) AS INTEGER) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM per_user GROUP BY log2_bucket ORDER BY log2_bucket
    """,
)
def events_user_activity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-binned events-per-user distribution — the power-law /
    hot-key diagnostic run BEFORE any user-keyed operation (the bucket
    where n_events concentrates tells you whether sessionization,
    as-of joins and per-user windows need a skew strategy; sibling of
    graph_degree_histogram for the user axis).

    Two aggregations, the second over the |users| table. The log bin
    is floor(ln n / ln 2) — plain arithmetic, no engine-specific
    log2()."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    bucket = F.floor(F.log(F.col("n").cast("double")) / F.log(F.lit(2.0))).cast("int")
    return (
        per_user.groupBy(bucket.alias("log2_bucket"))
        .agg(F.count("*").alias("n_users"), F.sum("n").alias("n_events"))
        .orderBy("log2_bucket")
    )


@register(
    "stats_pareto_revenue_share",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS s FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s,
             ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             SUM(s) OVER () AS tot,
             SUM(s) OVER (ORDER BY s DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM spend
    )
    SELECT pct.p AS top_pct,
           CAST(MAX(CAST(FLOOR(pct.p * n / 100.0) AS BIGINT)) AS BIGINT) AS n_top_customers,
           ROUND(MAX(CASE WHEN i = GREATEST(FLOOR(pct.p * n / 100.0), 1) THEN cum END)
                 / MAX(tot), 4) AS revenue_share
    FROM ranked CROSS JOIN (VALUES (1), (5), (10), (20)) pct(p)
    WHERE FLOOR(pct.p * n / 100.0) >= 1
    GROUP BY pct.p ORDER BY pct.p
    """,
)
def stats_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration table: the revenue share captured by the
    top 1 / 5 / 10 / 20 % of customers — the '80/20' business staple
    and the numeric companion to stats_gini_revenue (same ranked-spend
    table serves both).

    The rank/cumsum window runs over per-customer AGGREGATES (bounded
    global window, as in Gini); the percentile thresholds are a
    4-row literal fan-out. 100 TB note: same binned-Lorenz scale path
    as Gini — IMPLEMENTED as stats_pareto_revenue_share_binned
    (operators/binned.py)."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    wdesc = Window.orderBy(F.desc("s"), "o_custkey")
    ranked = spend.select(
        "s",
        F.row_number().over(wdesc).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("s").over(Window.partitionBy()).alias("tot"),
        F.sum("s").over(
            wdesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
    )
    pcts = F.explode(F.array(*[F.lit(p) for p in (1, 5, 10, 20)])).alias("top_pct")
    k = F.floor(F.col("top_pct") * F.col("n") / 100.0)
    return (
        ranked.select(pcts, "i", "n", "tot", "cum")
        .filter(k >= 1)
        .groupBy("top_pct")
        .agg(
            F.max(k.cast("long")).alias("n_top_customers"),
            _r4(
                F.max(F.when(F.col("i") == F.greatest(k, F.lit(1)), F.col("cum")))
                / F.max("tot")
            ).alias("revenue_share"),
        )
        .orderBy("top_pct")
    )


@register(
    "quality_iqr_outliers",
    oracle="""
    WITH fences AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MAX(f.q3 - f.q1), 4) AS iqr,
           CAST(COUNT(*) FILTER (
               l.l_extendedprice < f.q1 - 1.5 * (f.q3 - f.q1)
               OR l.l_extendedprice > f.q3 + 1.5 * (f.q3 - f.q1)) AS BIGINT)
               AS n_outliers
    FROM lineitem l JOIN fences f USING (l_returnflag)
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def quality_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per group: rows outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the distribution-free outlier
    screen beside the z-score detectors (robust to the heavy tails
    that break mean/σ fences), the box-plot's whisker rule as a
    data-quality gate.

    Two passes by construction (fences need the quantiles before rows
    can be judged): one exact-percentile agg (groups-bounded) broadcast
    back onto the scan. At 100 TB swap approx_percentile into the
    fences pass — same plan, fixed memory."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    # array form: one value buffer per group serves both quartiles
    q = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.75)))
    fences = (
        li.groupBy("l_returnflag")
        .agg(q.alias("qq"))
        .select("l_returnflag", F.col("qq")[0].alias("q1"), F.col("qq")[1].alias("q3"))
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        li.join(F.broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            _r4(F.max(iqr)).alias("iqr"),
            F.count(F.when(is_out, 1)).alias("n_outliers"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "quality_iqr_outliers_approx",
    oracle="""
    WITH fences AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.20) AS p20,
             quantile_cont(l_extendedprice, 0.30) AS p30,
             quantile_cont(l_extendedprice, 0.70) AS p70,
             quantile_cont(l_extendedprice, 0.80) AS p80,
             -- DuckDB's own approximate quantiles (t-digest) run
             -- through the identical bracket checks: computed
             -- booleans, not literals
             approx_quantile(l_extendedprice, 0.25) AS aq1,
             approx_quantile(l_extendedprice, 0.75) AS aq3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           BOOL_AND(aq1 BETWEEN p20 AND p30) AS q1_in_bracket,
           BOOL_AND(aq3 BETWEEN p70 AND p80) AS q3_in_bracket,
           COUNT(*) FILTER (WHERE l_extendedprice < aq1 - 1.5 * (aq3 - aq1)
                               OR l_extendedprice > aq3 + 1.5 * (aq3 - aq1))
             BETWEEN
           COUNT(*) FILTER (WHERE l_extendedprice < p20 - 1.5 * (p80 - p20)
                               OR l_extendedprice > p80 + 1.5 * (p80 - p20))
             AND
           COUNT(*) FILTER (WHERE l_extendedprice < p30 - 1.5 * (p70 - p30)
                               OR l_extendedprice > p70 + 1.5 * (p70 - p30))
             AS n_outliers_in_bracket
    FROM lineitem l JOIN fences f USING (l_returnflag)
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def quality_iqr_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB spelling of quality_iqr_outliers: approx_percentile
    (fixed-memory GK sketch) for the Tukey fences instead of the exact
    per-group value buffer. The approximate quantiles are
    engine-specific, so — like agg_approx_percentile — the oracle
    checks BRACKETS: with accuracy 1000 the rank error is ≤ 0.1 %, so
    approx Q1 must land in exact [p20, p30], approx Q3 in [p70, p80],
    and the approx-fence outlier count must fall between the counts
    for the widest (p20/p80) and narrowest (p30/p70) bracket fences —
    all three emitted as booleans the oracle expects TRUE. Same plan
    shape as the exact form: a groups-bounded fences agg broadcast
    onto one counting scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    x = F.col("l_extendedprice")
    # array-percentile forms: ONE value buffer / ONE sketch per group
    # serving all four exact bracket points and both approx fences —
    # four scalar F.percentile calls would buffer the group 4×
    # (measured 5.2 s → 2.6 s at sf0.1)
    exact = F.percentile(x, F.array(*[F.lit(p) for p in (0.20, 0.30, 0.70, 0.80)]))
    approx = F.approx_percentile(
        x, F.array(F.lit(0.25), F.lit(0.75)), F.lit(1000)
    )
    fences = li.groupBy("l_returnflag").agg(
        exact.alias("ex"), approx.alias("ap")
    ).select(
        "l_returnflag",
        F.col("ex")[0].alias("p20"),
        F.col("ex")[1].alias("p30"),
        F.col("ex")[2].alias("p70"),
        F.col("ex")[3].alias("p80"),
        F.col("ap")[0].alias("q1a"),
        F.col("ap")[1].alias("q3a"),
    )

    def out_of(lo, hi):
        return F.count(F.when((x < lo) | (x > hi), 1))

    def fence(qlo, qhi, mult=1.5):
        iqr = F.col(qhi) - F.col(qlo)
        return F.col(qlo) - mult * iqr, F.col(qhi) + mult * iqr

    wide_lo, wide_hi = fence("p20", "p80")  # widest fences → fewest outliers
    narrow_lo, narrow_hi = fence("p30", "p70")  # narrowest → most
    approx_lo, approx_hi = fence("q1a", "q3a")
    return (
        li.join(F.broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            ((F.max("q1a") >= F.max("p20")) & (F.max("q1a") <= F.max("p30"))).alias(
                "q1_in_bracket"
            ),
            ((F.max("q3a") >= F.max("p70")) & (F.max("q3a") <= F.max("p80"))).alias(
                "q3_in_bracket"
            ),
            (
                (out_of(approx_lo, approx_hi) >= out_of(wide_lo, wide_hi))
                & (out_of(approx_lo, approx_hi) <= out_of(narrow_lo, narrow_hi))
            ).alias("n_outliers_in_bracket"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "orders_interpurchase_histogram",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             datediff('day',
                      LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS gap_days
      FROM orders
    )
    SELECT CAST(gap_days // 30 AS INTEGER) AS gap_month_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY gap_month_bucket ORDER BY gap_month_bucket
    """,
)
def orders_interpurchase_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution: days between a customer's
    consecutive orders, binned by 30-day months — the repurchase-cycle
    curve that churn models and reorder reminders calibrate against
    (the order-level sibling of the event-stream gap analyses).

    One lag window per customer + one histogram aggregation; the
    histogram is months-bounded."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(F.expr("gap_days div 30").cast("int").alias("gap_month_bucket"))
        .agg(F.count("*").alias("n_gaps"))
        .orderBy("gap_month_bucket")
    )


@register(
    "quality_benford_first_digit",
    oracle="""
    WITH digits AS (
      -- explicit FLOOR: DuckDB's double->BIGINT cast rounds, Spark's
      -- truncates; floor() agrees everywhere
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM digits)
    SELECT d AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           ROUND(COUNT(*)::DOUBLE / MAX(tot.n), 4) AS observed_p,
           ROUND(ln(1.0 + 1.0 / d) / ln(10.0), 4) AS benford_p
    FROM digits CROSS JOIN tot
    GROUP BY d ORDER BY d
    """,
)
def quality_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen: the first-digit distribution of order
    totals against log10(1 + 1/d) — the forensic data-quality check
    for fabricated or truncated numeric columns (natural multi-scale
    amounts follow Benford; uniform or spiked first digits flag
    synthetic data, unit mix-ups, or capped values).

    First digit extracted by integer-cast-then-string — identical
    arithmetic both engines, no float formatting involved. One
    aggregation to a 9-row table. (The fixture's prices are uniform
    by construction, so the OBSERVED column demonstrates exactly the
    deviation this screen exists to flag.)"""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    digits = orders.select(d.alias("d"))
    tot = digits.agg(F.count("*").alias("n"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy(F.col("d").alias("first_digit"))
        .agg(
            F.count("*").alias("n_values"),
            _r4(F.count("*").cast("double") / F.max("n")).alias("observed_p"),
            _r4(
                F.log(1.0 + 1.0 / F.col("first_digit")) / F.log(F.lit(10.0))
            ).alias("benford_p"),
        )
        .orderBy("first_digit")
    )


@register(
    "quality_eventmix_drift",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
             event_type, COUNT(*) AS c
      FROM events GROUP BY wk, event_type
    ),
    wk_tot AS (SELECT wk, SUM(c) AS wt FROM weekly GROUP BY wk),
    global_mix AS (
      SELECT event_type, SUM(c)::DOUBLE / (SELECT SUM(c) FROM weekly) AS gp
      FROM weekly GROUP BY event_type
    )
    SELECT w.wk,
           CAST(SUM(w.c) AS BIGINT) AS n_events,
           ROUND(SUM(abs(w.c::DOUBLE / t.wt - g.gp)), 4) AS l1_drift
    FROM weekly w
    JOIN wk_tot t USING (wk)
    JOIN global_mix g USING (event_type)
    GROUP BY w.wk ORDER BY w.wk
    """,
)
def quality_eventmix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type mix drift per week: L1 distance between each week's
    type distribution and the corpus-wide mix — the schema-free
    ingest-drift monitor (a collector outage or a new client version
    shows up as a drift spike long before row counts move).

    One (week, type) aggregation to the cells table; every margin
    (weekly total, per-type total, corpus total) is then a WINDOW over
    that table — which has weeks × types rows (hundreds), so even the
    frameless global window is a no-op-sized single task, and the
    whole query is ONE job: no localCheckpoint, no broadcast-building
    side actions (the round-4 form ran three — the bench variance the
    round-4 verdict flagged came from exactly those). At 100 TB the
    cells cardinality is unchanged (weeks × types, data-independent),
    so the window stage stays trivial while the scan+groupBy does all
    the work. Note the L1 sums over types PRESENT in the week; a type
    absent from a week contributes its global share — absent-type
    handling is identical on both sides because both sum over the same
    cells."""
    from pyspark.sql.window import Window

    weekly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("week", F.col("ts")).alias("wk"),
            "event_type",
        )
        .agg(F.count("*").alias("c"))
    )
    wt = F.sum("c").over(Window.partitionBy("wk"))
    tc = F.sum("c").over(Window.partitionBy("event_type"))
    cn = F.sum("c").over(Window.partitionBy())
    return (
        weekly.select(
            "wk",
            "c",
            wt.alias("wt"),
            (tc.cast("double") / cn).alias("gp"),
        )
        .groupBy("wk")
        .agg(
            F.sum("c").alias("n_events"),
            _r4(
                F.sum(F.abs(F.col("c").cast("double") / F.col("wt") - F.col("gp")))
            ).alias("l1_drift"),
        )
        .orderBy("wk")
    )


@register(
    "quality_cardinality_audit",
    oracle="""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_custkey,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d_status,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d_priority,
             CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS d_orderdate
      FROM orders
    )
    SELECT col, n_distinct, n_rows,
           ROUND(n_distinct::DOUBLE / n_rows, 6) AS distinct_ratio
    FROM (
      SELECT 'o_custkey' AS col, d_custkey AS n_distinct, n_rows FROM stats
      UNION ALL SELECT 'o_orderstatus', d_status, n_rows FROM stats
      UNION ALL SELECT 'o_orderpriority', d_priority, n_rows FROM stats
      UNION ALL SELECT 'o_orderdate', d_orderdate, n_rows FROM stats
    )
    ORDER BY col
    """,
)
def quality_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column cardinality profile: distinct counts and distinct
    ratios for key columns in ONE aggregation — the profiling pass
    that classifies columns as keys (ratio ≈ 1), dimensions (low
    cardinality) or dates, feeding join-strategy and layout decisions.
    Sibling of quality_null_audit: rule count grows plan WIDTH, never
    pass count.

    100 TB note: multiple exact COUNT(DISTINCT)s in one agg expand to
    one shuffle per distinct column; the production profile swaps in
    approx_count_distinct (one pass, HLL state) — same query shape,
    audited error."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("d_custkey"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.countDistinct("o_orderpriority").alias("d_priority"),
        F.countDistinct(F.to_date("o_orderdate")).alias("d_orderdate"),
    )
    cols = [
        ("o_custkey", "d_custkey"),
        ("o_orderstatus", "d_status"),
        ("o_orderpriority", "d_priority"),
        ("o_orderdate", "d_orderdate"),
    ]
    long = None
    for name, dcol in cols:
        row = stats.select(
            F.lit(name).alias("col"),
            F.col(dcol).alias("n_distinct"),
            "n_rows",
        )
        long = row if long is None else long.unionByName(row)
    return long.select(
        "col",
        "n_distinct",
        "n_rows",
        dround(F.col("n_distinct").cast("double") / F.col("n_rows"), 6).alias(
            "distinct_ratio"
        ),
    ).orderBy("col")


@register(
    "stats_hhi_market_concentration",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation, SUM(o.o_totalprice) AS s
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY region, nation
    ),
    tot AS (SELECT region, SUM(s) AS t FROM rev GROUP BY region)
    SELECT rev.region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           ROUND(SUM(pow(rev.s / tot.t, 2)), 4) AS hhi
    FROM rev JOIN tot USING (region)
    GROUP BY rev.region ORDER BY rev.region
    """,
)
def stats_hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of revenue concentration per region
    (sum of squared nation shares; 1/n = perfectly even, 1.0 =
    single-nation monopoly) — the market-structure companion to Gini
    and Pareto, here exercising the full dim chain
    (orders→customer→nation→region) before the stats layer.

    Dims broadcast (the q5 join shape); shares and squares run over
    the regions×nations table. Mergeable: the (region, nation) revenue
    cells are the partial state."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("s"))
    )
    rev = rev.transform(cut_lineage)
    tot = rev.groupBy("region").agg(F.sum("s").alias("t"))
    return (
        rev.join(F.broadcast(tot), "region")
        .groupBy("region")
        .agg(
            F.count("*").alias("n_nations"),
            _r4(F.sum(F.pow(F.col("s") / F.col("t"), 2))).alias("hhi"),
        )
        .orderBy("region")
    )


@register(
    "orders_yoy_revenue",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / 100.0 AS rev
      FROM orders GROUP BY m
    )
    SELECT m,
           rev AS revenue,
           ROUND(rev / LAG(rev, 12) OVER (ORDER BY m) - 1.0, 4) AS yoy_change
    FROM monthly ORDER BY m
    """,
)
def orders_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year change: lag-12 over the
    month series — the reporting staple that seasonality makes
    month-over-month useless for. NULL for the first twelve months by
    construction (no prior-year base).

    The lag window runs over the MONTH table (bounded by the date
    span, here ~80 rows), not over orders — the global order is
    metadata-scale, the same bounded-global-window argument as the
    compaction planner."""
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(
            # fixed-point cents sum, raw quotient (r11 sf10 catch: the
            # ~4.6e10 monthly double sums flipped the 4th decimal on
            # fold order); the O(1) yoy ratio keeps its 4-dec round —
            # it divides two engine-identical doubles
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
                .cast("double")
                / 100.0
            ).alias("rev")
        )
    )
    w = Window.orderBy("m")
    return (
        monthly.select(
            "m",
            F.col("rev").alias("revenue"),
            dround(F.col("rev") / F.lag("rev", 12).over(w) - 1.0, 4).alias(
                "yoy_change"
            ),
        )
        .orderBy("m")
    )


@register(
    "stats_linear_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares via the SQL-standard regression
    aggregates (regr_slope/intercept/r2) — price-vs-quantity fit per
    return flag, the one-pass moment-based form of the fit every
    notebook reaches pandas for.

    Plan: regression aggregates are algebraic (sums of x, y, x², xy)
    — partial+final hash aggregation like any sum; shuffle volume is
    groups. The moment algebra is the same trick agg_corr_moments and
    agg_partial_state_merge build by hand; here it is the built-in."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            _r4(F.regr_slope(y, x)).alias("slope"),
            _r4(F.regr_intercept(y, x)).alias("intercept"),
            dround(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad,
             MAX(m.med) AS med
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MAX(d.med), 4) AS median_value,
           ROUND(MAX(d.mad), 4) AS mad,
           CAST(COUNT(*) FILTER (
               abs(e.value - d.med) > 3.0 * 1.4826 * d.mad) AS BIGINT)
               AS n_anomalies
    FROM events e JOIN dev d USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly screen per event type: flag values more than
    3 scaled-MADs from the median (MAD·1.4826 ≈ σ under normality) —
    the outlier detector that survives the heavy tails and the
    contaminated baselines that break the mean/σ z-score sibling
    (timeseries_anomaly_zscore): one wild value shifts a mean, not a
    median.

    Plan: three passes by construction (median → MAD needs the median
    → flags need both), each a groups-bounded exact-percentile agg
    broadcast onto the next scan — the same fence shape as the IQR
    screens; swap approx_percentile at unbounded cardinality."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
            F.max("med").alias("med"),
        )
    )
    is_anom = F.abs(F.col("value") - F.col("med")) > 3.0 * 1.4826 * F.col("mad")
    return (
        ev.join(F.broadcast(dev), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            _r4(F.max("med")).alias("median_value"),
            _r4(F.max("mad")).alias("mad"),
            F.count(F.when(is_anom, 1)).alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


NEARZERO_EPS = 0.01


@register(
    "quality_embedding_audit",
    oracle=f"""
    WITH per AS (
        SELECT label,
               sqrt(list_dot_product(embedding, embedding)) AS nrm,
               len(embedding) AS dim,
               len(list_filter(embedding, x -> abs(x) < {NEARZERO_EPS}))
                   AS n_nearzero,
               len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE))))
                   AS n_nan
        FROM embeddings)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(dim) AS BIGINT) AS min_dim,
           CAST(MAX(dim) AS BIGINT) AS max_dim,
           ROUND(MIN(nrm), 4) AS min_norm,
           ROUND(MAX(nrm), 4) AS max_norm,
           ROUND(AVG(n_nearzero), 4) AS avg_nearzero,
           CAST(SUM(n_nan) AS BIGINT) AS total_nan
    FROM per GROUP BY label ORDER BY label
    """,
)
def quality_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health audit per label: vector count, dim
    consistency (min=max or the ANN/pack stages will crash later),
    norm range (unit-normalized corpora must pin [1, 1] — a drifting
    norm means a broken normalizer upstream), mean near-zero
    coordinate count (dead dimensions / over-sparse vectors), and NaN
    total. The embeddings-table sibling of the scalar-column audits
    (null/cardinality/expectations) — ingest gates for the similarity
    stack.

    Plan: all per-vector statistics are Catalyst higher-order lambdas
    (aggregate/filter) in the scan projection — no explode, the
    label-bounded agg is the only shuffle. 100 TB: one pass, group
    count = label cardinality."""
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nearzero = F.size(F.filter("embedding", lambda x: F.abs(x) < NEARZERO_EPS))
    nan = F.size(F.filter("embedding", lambda x: F.isnan(x.cast("double"))))
    per = emb.select(
        "label",
        F.sqrt(dot).alias("nrm"),
        F.size("embedding").cast("long").alias("dim"),
        nearzero.alias("n_nearzero"),
        nan.alias("n_nan"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            _r4(F.min("nrm")).alias("min_norm"),
            _r4(F.max("nrm")).alias("max_norm"),
            _r4(F.avg("n_nearzero")).alias("avg_nearzero"),
            F.sum("n_nan").alias("total_nan"),
        )
        .orderBy("label")
    )
