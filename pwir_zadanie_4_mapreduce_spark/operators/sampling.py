"""Deterministic sampling & dataset splitting — the reproducibility
primitives of a training-data pipeline (eval splits, ablation
subsets, cheap pre-aggregation scans).

Why not ``df.sample``/TABLESAMPLE: RNG-based sampling is seed- and
partitioning-dependent, unreproducible across engines, and re-rolls
membership when the corpus is re-read. Hash-prefix membership
(``substr(md5(key), 1, 2)`` compared lexicographically) is the
standard fix: a row's split follows it forever, any engine computes
the same answer (md5 hex is engine-neutral — DuckDB and Spark agree
byte-for-byte), adding data never moves existing rows between splits,
and the predicate is a pure projection — no shuffle, no state, fully
pushdown-friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register

# 256 hex-prefix buckets: '0d' = 13/256 ≈ 5.1% test, next 13 valid
TEST_UPPER = "0d"
VALID_UPPER = "1a"
SAMPLE_UPPER = "1a"  # ≈10.2% sample


def hash_bucket(key) -> F.Column:
    """Two-hex-char md5 prefix of the key's decimal string — a stable
    256-way bucketing any engine reproduces exactly."""
    return F.substring(F.md5(F.col(key).cast("string")), 1, 2)


@register(
    "sample_split_documents",
    oracle=f"""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TEST_UPPER}' THEN 'test'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VALID_UPPER}' THEN 'valid'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def sample_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test assignment for every document: ~90/5/5 by md5
    prefix of doc_id. Pure projection — Catalyst keeps it inside the
    scan stage; at 100 TB the split column is typically written back
    as a partition column so each split prunes at the source."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    b = hash_bucket("doc_id")
    split = (
        F.when(b < TEST_UPPER, F.lit("test"))
        .when(b < VALID_UPPER, F.lit("valid"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", b.alias("bucket"), split.alias("split"))


@register(
    "sample_hash_orders",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '{SAMPLE_UPPER}'
    GROUP BY o_orderpriority
    """,
)
def sample_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a deterministic ~10% hash sample of orders — the
    cheap-estimate scan pattern. The membership predicate is a scan
    filter (row-group statistics can't prune md5, but the filter runs
    pre-shuffle, so the agg shuffles 10% of the data)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    sampled = orders.filter(hash_bucket("o_orderkey") < SAMPLE_UPPER)
    return sampled.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dround(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


STRATUM_K = 3


@register(
    "sample_stratified_orders",
    oracle=f"""
    SELECT o_orderpriority, o_orderkey,
           substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS rank_hash
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority
        ORDER BY substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8), o_orderkey) <= {STRATUM_K}
    ORDER BY o_orderpriority, rank_hash
    """,
)
def sample_stratified_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly K=3 orders per
    priority stratum, chosen by md5-hash order — reproducible across
    engines and runs, no RNG, balanced across strata by construction
    (the eval-set recipe when classes are imbalanced). One window
    shuffle on the stratum key; at 100 TB strata are coarse, so
    pre-aggregate per-partition top-K first if a stratum is hot."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    rank_hash = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8)
    w = Window.partitionBy("o_orderpriority").orderBy(rank_hash.asc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rank_hash", rank_hash)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_K)
        .select("o_orderpriority", "o_orderkey", "rank_hash")
        .orderBy("o_orderpriority", "rank_hash")
    )


KNUTH_MULT = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hash
HASH_MOD = 4294967296  # 2^32


@register(
    "sample_weighted_quality",
    oracle=f"""
    WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents)
    SELECT doc_id, n_chars,
           ROUND(((doc_id * {KNUTH_MULT}) % {HASH_MOD}) / {HASH_MOD}.0, 6) AS u
    FROM documents, mx
    WHERE ((doc_id * {KNUTH_MULT}) % {HASH_MOD}) / {HASH_MOD}.0
          < n_chars / CAST(max_chars AS DOUBLE)
    ORDER BY doc_id
    """,
)
def sample_weighted_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance-weighted sampling: keep each document
    with probability proportional to its quality proxy (n_chars /
    corpus max) — the quality-upsampling step of a training-data mix,
    made reproducible. The acceptance variate u is a Knuth
    multiplicative hash of doc_id mapped to [0,1): exact integer
    arithmetic both engines reproduce bit-for-bit (md5-hex compares
    cover the unweighted splits; a continuous threshold needs a
    numeric variate). Membership is subset-invariant — re-ingesting
    the corpus never flips a kept row.

    Pure projection + broadcast scalar (corpus max): no shuffle on
    the kept path; at 100 TB the weight column comes from the quality
    scorer and the same predicate runs inside the scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mx = docs.agg(F.max("n_chars").alias("max_chars"))
    u = F.pmod(F.col("doc_id") * F.lit(KNUTH_MULT), F.lit(HASH_MOD)) / F.lit(
        float(HASH_MOD)
    )
    return (
        docs.crossJoin(F.broadcast(mx))
        .filter(u < F.col("n_chars") / F.col("max_chars").cast("double"))
        .select("doc_id", "n_chars", dround(u, 6).alias("u"))
        .orderBy("doc_id")
    )


GROUP_KFOLD_K = 5


@register(
    "sample_group_kfold",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::INTEGER
                    % {GROUP_KFOLD_K} AS INTEGER) AS fold,
               value
        FROM events)
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 4) AS sum_value
    FROM assigned GROUP BY fold ORDER BY fold
    """,
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware k-fold assignment: the fold is a function of the
    GROUP key (user_id), never the row — all of a user's events land
    in one fold, which is what prevents train/test leakage through
    correlated rows (the GroupKFold of scikit-learn, as a pure
    projection). md5-prefix arithmetic makes the assignment
    engine-portable, subset-invariant, and reshuffle-free: adding
    data never moves an existing user between folds.

    100 TB: zero extra shuffles — the fold column is computed in the
    scan projection; fold-filtered training scans prune nothing at
    the row-group level (hash is uniform by design) but cost only the
    predicate. A leakage test (no user in two folds) is structural:
    fold is functionally dependent on user_id."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % GROUP_KFOLD_K
    ).cast("int")
    return (
        ev.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dround(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("fold")
    )


@register(
    "pipeline_training_mix",
    oracle=f"""
    WITH rated AS (
      SELECT source,
             CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 1.0
                  WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 0.5
                  ELSE 0.25 END AS rate,
             ((doc_id * {KNUTH_MULT}) % {HASH_MOD}) / {HASH_MOD}.0 AS u
      FROM documents
    )
    SELECT source,
           CAST(ROUND(MAX(rate), 2) AS DOUBLE) AS rate,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (u < rate) AS BIGINT) AS n_kept
    FROM rated GROUP BY source ORDER BY source
    """,
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-source training mix: each source gets a
    target sampling rate (high-trust sources 1.0, mid 0.5, tail 0.25)
    and rows are kept by comparing a Knuth-hash variate against it —
    the dataset-mixing step that turns raw corpora into a training
    blend. Reported per source: rate, population, kept count.

    Subset-invariant and engine-portable like every sampler here (no
    RNG state); the keep predicate is a pure projection evaluated
    inside the scan, so at 100 TB the mix costs zero shuffle — the
    audit aggregation shuffles one row per (task, source)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src_num = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(src_num < 5, 1.0).when(src_num < 10, 0.5).otherwise(0.25)
    )
    u = F.pmod(F.col("doc_id") * F.lit(KNUTH_MULT), F.lit(HASH_MOD)) / F.lit(
        float(HASH_MOD)
    )
    return (
        docs.select("source", rate.alias("rate"), u.alias("u"))
        .groupBy("source")
        .agg(
            dround(F.max("rate"), 2).alias("rate"),
            F.count("*").alias("n_total"),
            F.count(F.when(F.col("u") < F.col("rate"), 1)).alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ),
    target AS (SELECT MIN(n) AS k FROM sized),
    ranked AS (
      SELECT e.label, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.label
               ORDER BY substr(md5(CAST(e.vec_id AS VARCHAR)), 1, 8), e.vec_id
             ) AS rk
      FROM embeddings e
    )
    SELECT r.label,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(t.k) AS BIGINT) AS target_per_class
    FROM ranked r CROSS JOIN target t
    WHERE r.rk <= t.k
    GROUP BY r.label
    ORDER BY r.label
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-size rows, selected by md5 order — the imbalance fix
    before training a classifier, deterministic and subset-stable
    (adding majority-class rows never changes which minority rows
    survive; it can only re-rank majority candidates).

    One count agg (broadcast scalar) + one per-label window — the
    stratified-sample plan with a data-derived K. 100 TB note:
    per-label windows parallelize across labels; a hot label bounds a
    task at its own row count, the same profile as
    sample_stratified_orders."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    sized = e.groupBy("label").agg(F.count("*").alias("n"))
    target = sized.agg(F.min("n").alias("k"))
    rank_hash = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8)
    w = Window.partitionBy("label").orderBy(rank_hash.asc(), F.col("vec_id").asc())
    return (
        e.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(target))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("k").alias("target_per_class"),
        )
        .orderBy("label")
    )


TIME_SPLIT_CUTOFF = "2001-01-01"


@register(
    "sample_time_split",
    oracle=f"""
    SELECT CASE WHEN o_orderdate < TIMESTAMP '{TIME_SPLIT_CUTOFF}'
                THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_date,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_date,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_price
    FROM orders GROUP BY split ORDER BY split
    """,
)
def sample_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout split: everything before the cutoff trains,
    everything after tests — the leakage-safe evaluation design for
    any time-dependent model (random splits let the model peek at the
    future; the hash splits are for exchangeable rows only). The audit
    reports per-split counts and date ranges, making the boundary
    inspectable.

    Pure scan predicate — and unlike the md5 splits, this one IS
    served by parquet min/max row-group statistics and date
    partitioning, so each side prunes at the source at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    split = F.when(
        F.col("o_orderdate") < F.lit(TIME_SPLIT_CUTOFF).cast("timestamp"), "train"
    ).otherwise("test")
    return (
        orders.groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
            # cents sum: the train side reaches ~3.4e11 at sf1, where a
            # double sum's fold order flips the 4th decimal (r10 sweep);
            # no final ROUND — raw int64/1e2 quotient (r10 sf10 class)
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
                .cast("double")
                / 100.0
            ).alias("sum_price"),
        )
        .orderBy("split")
    )


RESERVOIR_K = 5
RESERVOIR_SALT = 16


@register(
    "sample_reservoir_group",
    oracle=f"""
    SELECT source, CAST(rn AS INTEGER) AS sample_rank, doc_id
    FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= {RESERVOIR_K}
    ORDER BY source, sample_rank
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-per-group uniform sample (deterministic reservoir): the
    k documents with the smallest md5 rank within each source — the
    fixed-size-per-stratum counterpart of the hash-prefix splits
    (inspection panels, eval probes, per-source spot checks re-draw
    the SAME rows on every engine and every run).

    Plan note (why no window): row_number per group runs one task per
    group — with a handful of sources that is a handful of tasks over
    the whole corpus, the same single-partition trap as the global
    windows SCALE.md calls out. This is the two-phase salted exact
    top-k instead: phase 1 collect_lists each (group, salt) cell and
    keeps its k smallest ranks — per-cell memory is O(|group|/SALT)
    (the salt bounds the cell to ~1/SALT of the group, NOT to k; the
    OUTPUT of phase 1 is ≤ k per cell); phase 2 merges the ≤ salt·k
    survivors per group. Identical answer, no single-group sort, one
    shuffle + one groups-bounded agg. At 100 TB, size SALT so a cell
    fits an executor (SALT ∝ |largest group| / budget), or escalate to
    two-level salting (salt→merge→salt again) for pathological groups."""
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    entry = F.struct(
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
        F.col("doc_id").alias("doc_id"),
    )
    cells = (
        docs.select(
            "source",
            F.pmod(F.xxhash64("doc_id"), F.lit(RESERVOIR_SALT)).alias("salt"),
            entry.alias("e"),
        )
        .groupBy("source", "salt")
        .agg(F.slice(F.array_sort(F.collect_list("e")), 1, RESERVOIR_K).alias("tops"))
    )
    merged = cells.groupBy("source").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("tops"))), 1, RESERVOIR_K
        ).alias("tops")
    )
    return (
        merged.select("source", F.posexplode("tops").alias("pos", "e"))
        .select(
            "source",
            (F.col("pos") + 1).cast("int").alias("sample_rank"),
            F.col("e.doc_id").alias("doc_id"),
        )
        .orderBy("source", "sample_rank")
    )


KFOLD_K = 5


@register(
    "sample_kfold_assignment",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, source,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
               % {KFOLD_K} AS fold
        FROM documents)
    SELECT CAST(fold AS INTEGER) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM b GROUP BY fold ORDER BY fold
    """,
)
def sample_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment + fold-balance
    audit over DOCUMENTS: fold = (256-way md5 bucket) mod k — the
    plain CV split, complementing sample_group_kfold (which folds by
    GROUP key so correlated rows can't straddle train/test). Same
    engine-neutral-hash contract as the split family — a row's fold
    follows it forever, any engine recomputes it, and adding
    documents never moves existing rows between folds (the property
    RNG-based folds lack).

    The hex→int step is spelled with strpos/instr arithmetic because
    BOTH engines evaluate it identically (no conv() in DuckDB); it is
    a pure projection, so at 100 TB fold membership costs nothing and
    pushes into the scan. The audit aggregation is k-bounded."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    alphabet = F.lit("0123456789abcdef")
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (F.instr(alphabet, F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(alphabet, F.substring(h, 2, 1)) - 1
    )
    return (
        docs.withColumn("fold", (bucket % KFOLD_K).cast("int"))
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("fold")
    )


MIX_TEMPERATURE = 2.0  # 1/T = 0.5: the alpha-sampling exponent


@register(
    "pipeline_temperature_mix",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source),
    shares AS (
        SELECT source, n_docs,
               n_docs::DOUBLE / SUM(n_docs) OVER () AS p,
               POWER(n_docs::DOUBLE / SUM(n_docs) OVER (),
                     1.0 / {MIX_TEMPERATURE}) AS w
        FROM counts)
    SELECT source, n_docs,
           ROUND(p, 6) AS natural_share,
           ROUND(w / SUM(w) OVER (), 6) AS target_share,
           ROUND((w / SUM(w) OVER ()) / p, 4) AS upsample_factor
    FROM shares ORDER BY source
    """,
)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source balancing — the α-sampling rule of
    multilingual/multi-source LM training: target share q_i ∝ p_i^(1/T)
    (T=2 here), which upsamples tail sources and downsamples the head
    without inverting the order. Complements pipeline_training_mix
    (fixed hand-set rates): here the rates are COMPUTED from the
    corpus histogram, the way mixture weights are actually derived;
    feed target_share into the Knuth-hash keep-predicate to execute
    the mix.

    Plan: one source-bounded count, then every share/normalizer is a
    window over the sources-cardinality cells table (the eventmix
    cells-and-margins pattern) — a no-op-sized single stage at any
    corpus size."""
    from pyspark.sql.window import Window

    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = Window.partitionBy()
    p = F.col("n_docs").cast("double") / F.sum("n_docs").over(tot)
    shares = counts.select(
        "source",
        "n_docs",
        p.alias("p"),
        F.pow(p, 1.0 / MIX_TEMPERATURE).alias("w"),
    )
    q = F.col("w") / F.sum("w").over(tot)
    return (
        shares.select(
            "source",
            "n_docs",
            dround(F.col("p"), 6).alias("natural_share"),
            dround(q, 6).alias("target_share"),
            dround(q / F.col("p"), 4).alias("upsample_factor"),
        )
        .orderBy("source")
    )
