"""Similarity search over the embeddings table.

Two tiers (SURVEY.md §2.2 / driver brief):
- brute-force cosine top-k — the exactness baseline; a broadcast of
  the query vector + one pass over the corpus, so it's actually the
  *right* plan at any scale when k is small and there's one query
  (a full scan is unavoidable without an index).
- IVF-style ANN: a coarse quantizer (deterministic centroids) routes
  each vector to a bucket; queries probe the nearest few buckets.
  Cuts the scanned fraction to nprobe/ncentroids at the cost of
  recall. Both the assignment and the probe are plain joins — at
  100 TB the bucketed corpus would be written partitioned by
  centroid_id so a probe prunes partitions at the source.

Cosine is computed as dot(raw)/(norm·norm) in a fixed association
order, matching the DuckDB oracle bit-for-bit (see dedup.py note).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.functions.vectors import dot, l2_norm
from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
from pwir_zadanie_4_mapreduce_spark.operators.registry import register
from pwir_zadanie_4_mapreduce_spark.functions.lineage import cut_lineage

QUERY_VEC_ID = 0
TOP_K = 10
N_CENTROIDS = 16
N_PROBE = 4
EMB_DIM = 64  # fixture embedding width (PQ_M × PQ_SUBDIM must equal it)

_COS_SQL = """list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))
              / (sqrt(list_sum(list_transform({a}, x -> x * x)))
                 * sqrt(list_sum(list_transform({b}, x -> x * x))))"""

# Shared oracle prologue: the prepped embeddings CTE, the DuckDB twin
# of _prepped (list_sum is a left-to-right fold like F.aggregate, so
# every downstream cosine is bit-identical across engines — the
# property sim_topk_bruteforce's green oracle established).
_E_SQL = """e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings)"""


def _cos_pre(va: str, na: str, vb: str, nb: str) -> str:
    """Cosine SQL over vectors with PREcomputed norms (mirrors _cosine)."""
    return (
        f"list_sum(list_transform(list_zip({va}, {vb}), z -> z[1] * z[2]))"
        f" / ({na} * {nb})"
    )


def _prepped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )


def _cosine(va: Column, na: Column, vb: Column, nb: Column) -> Column:
    return dot(va, vb) / (na * nb)


_BRUTE_SQL = f"""
    WITH {_E_SQL},
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id,
           ROUND(list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                 / (e.nrm * q.qn), 4) AS cosine{{extra_cols}}
    FROM e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
             / (e.nrm * q.qn) DESC, e.vec_id
    LIMIT {TOP_K}
    """


@register("sim_topk_bruteforce", oracle=_BRUTE_SQL.format(extra_cols=""))
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector (vec_id=0).

    The single-row query side broadcasts; the corpus is scanned once;
    TakeOrderedAndProject gives a per-partition heap + driver merge —
    no global sort even at 100 TB.
    """
    e = _prepped(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("cosine", 4).alias("cosine"))
    )


def assign_centroids(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """Route each vector to its max-cosine centroid (coarse quantizer)."""
    from pyspark.sql.window import Window

    scored = e.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "label",
        "v",
        "nrm",
        "centroid_id",
        _cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn")).alias("c_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1).drop("rk", "c_cos")
    )


def _seed_centroids(e: DataFrame, k: int = N_CENTROIDS) -> DataFrame:
    """Deterministic coarse codebook: the k lowest vec_ids."""
    return (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )


def _ivf_topk(assigned: DataFrame, centroids: DataFrame) -> DataFrame:
    """Probe the query's N_PROBE nearest centroids; exact cosine top-k
    within the probed buckets only."""
    q = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    probe_buckets = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            _cosine(F.col("cv"), F.col("cn"), F.col("qv"), F.col("qn")).alias("c_cos"),
        )
        .orderBy(F.desc("c_cos"), "centroid_id")
        .limit(N_PROBE)
        .select("centroid_id")
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    return (
        assigned.join(F.broadcast(probe_buckets), "centroid_id")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("cosine", 4).alias("cosine"))
    )


_IVF_SEED_ORACLE = f"""
    WITH {_E_SQL},
    cent AS (
        SELECT vec_id AS centroid_id, v AS cv, nrm AS cn
        FROM e ORDER BY vec_id LIMIT {N_CENTROIDS}),
    assigned AS (
        SELECT e.vec_id, e.v, e.nrm, c.centroid_id
        FROM e CROSS JOIN cent c
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY e.vec_id
            ORDER BY {_cos_pre('e.v', 'e.nrm', 'c.cv', 'c.cn')} DESC,
                     c.centroid_id) = 1),
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID}),
    probe AS (
        SELECT c.centroid_id FROM cent c CROSS JOIN q
        ORDER BY {_cos_pre('c.cv', 'c.cn', 'q.qv', 'q.qn')} DESC,
                 c.centroid_id
        LIMIT {N_PROBE})
    SELECT a.vec_id,
           ROUND({_cos_pre('a.v', 'a.nrm', 'q.qv', 'q.qn')}, 4) AS cosine
    FROM assigned a JOIN probe USING (centroid_id) CROSS JOIN q
    WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_cos_pre('a.v', 'a.nrm', 'q.qv', 'q.qn')} DESC, a.vec_id
    LIMIT {TOP_K}
    """


@register("sim_topk_ivf", oracle=_IVF_SEED_ORACLE)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: probe the query's nearest 4 of 16
    coarse centroids, exact cosine within the probed buckets only.

    Centroids are deterministic (the 16 lowest vec_ids) — the seed-free
    baseline codebook; sim_topk_ivf_kmeans trains a real one.
    Scanned fraction ≈ nprobe/ncentroids = 25%; at 100 TB the corpus
    is written partitioned by centroid_id so probes prune at the scan.

    Full-mirror oracle: the whole algorithm — seed codebook, argmax
    assignment, probe selection, in-bucket top-k — is deterministic
    arithmetic over fold-ordered float sums, so DuckDB re-runs it
    verbatim and the ANN OUTPUT ITSELF hash-matches (stronger than a
    recall bracket; every tie is broken by centroid_id/vec_id on the
    bit-identical cosine both engines compute).
    """
    e = _prepped(spark, sf_dir)
    # bounded collect (k×dim): the seed codebook becomes plan literals
    # so corpus assignment is a narrow argmax projection — the Window
    # spelling shuffled the ENTIRE corpus on vec_id, which is exactly
    # the exchange a 100 TB ANN index build cannot afford (round-8
    # A/B + plan-pinned in test_plans).
    book = {r["centroid_id"]: list(r["cv"]) for r in _seed_centroids(e).collect()}
    return _ivf_topk(_assign_book_lit(e, book), _codebook_df(spark, book))


@register("sim_topk_ivf_partitioned", oracle=_IVF_SEED_ORACLE)
def sim_topk_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_topk_ivf with the 100 TB STORAGE layout actually executed,
    not just described: the assigned corpus is WRITTEN
    partitionBy(centroid_id) (the index-build step), and the probe
    reads it back with an isin filter that Spark turns into PARTITION
    PRUNING — the executed plan's scan carries PartitionFilters and
    touches only nprobe of ncentroids directories
    (test_plans::test_ivf_partitioned_scan_prunes pins both). Same
    output, and therefore the same full-mirror oracle, as sim_topk_ivf
    — what changes is WHERE the 75% scan reduction happens: at the
    source, not in a post-scan filter.

    The write is the one-time index build (here per-run scratch, keyed
    by sf so concurrent sessions don't collide); the query side is the
    repeatable part a serving system runs per lookup."""
    import atexit as _ax
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    e = _prepped(spark, sf_dir)
    book = {r["centroid_id"]: list(r["cv"]) for r in _seed_centroids(e).collect()}
    # pid-keyed like the stream scratch dirs: concurrent sessions at
    # the same sf must not overwrite each other's index mid-read
    path = _os.path.join(
        _tf.gettempdir(),
        "spark_graft_ivf_index",
        f"{_hl.sha256(sf_dir.encode()).hexdigest()[:12]}_{_os.getpid()}",
    )
    # scratch, not an artifact: reap at interpreter exit so repeated
    # test/bench processes don't accumulate copies under /tmp
    _ax.register(_sh.rmtree, path, ignore_errors=True)
    (
        _assign_book_lit(e, book)
        .select("vec_id", "v", "nrm", "centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v", "nrm").first()
    qv, qn = list(qrow["v"]), qrow["nrm"]
    scored = []
    for cid in sorted(book):
        cv = book[cid]
        cn = math.sqrt(_fold_dot(cv, cv))
        scored.append((-(_fold_dot(cv, qv) / (cn * qn)), cid))
    probes = [cid for _, cid in sorted(scored)[:N_PROBE]]
    back = spark.read.parquet(path)
    cos = F.expr(f"{_sql_fold_dot('v', qv)} / (nrm * {_sql_double(qn)})")
    return (
        back.filter(F.col("centroid_id").isin(probes))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("cosine", 4).alias("cosine"))
    )


KMEANS_ITERS = 5


def kmeans_book(
    e: DataFrame, k: int = N_CENTROIDS, iters: int = KMEANS_ITERS
) -> dict[int, list[float]]:
    """Spherical k-means codebook via Lloyd iterations, fully
    deterministic: init = the k lowest vec_ids; each update sums unit
    vectors per (centroid, dimension) in DECIMAL — exact, so the
    result is independent of partitioning/summation order (double sums
    are not) — then renormalizes driver-side.

    The codebook is k×dim (tiny); collecting it per round is the
    standard topology — at 100 TB k-means trains on a sample and only
    the final assignment pass touches the full corpus. Empty clusters
    keep their previous centroid.
    Returns the driver-side dict (centroid_id → components);
    kmeans_codebook wraps it as a DataFrame.
    """
    spark = e.sparkSession
    centroids = _seed_centroids(e)
    book = {
        r["centroid_id"]: list(r["cv"]) for r in centroids.collect()
    }  # id → components; unit-normalized below for a uniform contract
    book = {cid: _unit(v) for cid, v in book.items()}
    train = e.filter(F.col("nrm") > 0).transform(cut_lineage)
    for _ in range(iters):
        # literal-codebook argmax (round-8): bit-identical to the old
        # crossJoin+Window assign_centroids (same fold dots, same
        # (-cos, cid) tie-break, no zero-norm rows in `train`) but a
        # narrow projection — drops one corpus shuffle per Lloyd round.
        assigned = _assign_book_lit(train, book)
        sums = (
            assigned.select(
                "centroid_id",
                F.posexplode(F.transform("v", lambda x: (x / F.col("nrm")))).alias("d", "u"),
            )
            .groupBy("centroid_id", "d")
            .agg(F.sum(F.col("u").cast("decimal(27,12)")).alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_book = {}
        for r in sums:
            new_book.setdefault(r["centroid_id"], {})[r["d"]] = float(r["s"]) / r["n"]
        for cid, comps in new_book.items():
            book[cid] = _unit([comps[d] for d in range(len(comps))])
        # centroids absent from new_book (empty clusters) keep old value
    return book


def kmeans_codebook(
    e: DataFrame, k: int = N_CENTROIDS, iters: int = KMEANS_ITERS
) -> DataFrame:
    """DataFrame form of kmeans_book — (centroid_id, cv, cn) like
    _seed_centroids, for callers that join/broadcast the codebook."""
    return _codebook_df(e.sparkSession, kmeans_book(e, k, iters))


def _unit(v: list) -> list:
    nrm = sum(x * x for x in v) ** 0.5
    return [x / nrm for x in v] if nrm > 0 else v


def _codebook_df(spark: SparkSession, book: dict) -> DataFrame:
    rows = [(cid, book[cid]) for cid in sorted(book)]
    df = spark.createDataFrame(rows, "centroid_id long, cv array<double>")
    return df.select("centroid_id", "cv", l2_norm(F.col("cv")).alias("cn"))


IVF_KMEANS_RECALL_MIN = 0.8  # measured 0.9–1.0 at sf0.001/0.01/0.1 (deterministic);
# pytest floor for the trained-codebook ANN recall vs brute force.


IVF_SAMPLE_MOD = 10  # md5(vec_id) % 10 == 0 → deterministic ~10% training sample
IVF_QUANT_SCALE = 1000000000.0  # unit-vector components quantized to 1e-9 grid
# Sample-trained centroids are noisier than full-corpus ones, so the sampled
# variant probes 6 of 16 buckets (vs 4): measured over 50 query vectors at
# sf0.1, avg recall@10 is 0.554@nprobe4 / 0.684@nprobe6 sampled vs
# 0.686@nprobe4 full-trained — +2 probes buy the sampling loss back
# (scanned fraction 38% vs 25%). nprobe is the standard IVF recall knob.
IVF_SAMPLED_NPROBE = 6
# Lloyd converges on this data by round 2 (50-query avg recall@10 at
# nprobe=6: 0.686 / 0.684 / 0.684 for 2 / 3 / 5 rounds) — 3 rounds
# keep a convergence margin at 40% of the training cost.
IVF_SAMPLED_ITERS = 3


def _fold_dot(a: list, b: list) -> float:
    """Driver-side twin of functions.vectors.dot / DuckDB list_sum:
    left-fold from 0.0 — Python float ops are the same IEEE binary64
    as both engines, so on identical inputs this is bit-identical."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _sql_double(x: float) -> str:
    """A Spark-SQL literal that reproduces the Python double exactly:
    repr() is the shortest round-tripping decimal and a string→double
    CAST parses it with correct rounding (a bare decimal literal would
    be DecimalType)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _sql_arr(v: list[float]) -> str:
    return "array(" + ", ".join(_sql_double(x) for x in v) + ")"


def _sql_fold_dot(col: str, v: list[float]) -> str:
    """Spark-SQL twin of functions.vectors.dot against a literal
    vector — same zip_with/aggregate left fold, same doubles."""
    return (
        f"aggregate(zip_with({col}, {_sql_arr(v)}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )


def _assign_book_lit(df: DataFrame, book: dict[int, list[float]]) -> DataFrame:
    """Max-cosine centroid assignment against a DRIVER-SIDE codebook,
    as a narrow projection: the k cosines are literal-vector dot
    products inside codegen and the argmax is array_min over
    (-cosine, centroid_id) structs — no crossJoin, no Window, ZERO
    exchange. This is the 100 TB assignment shape: the model rides the
    plan as a constant, the corpus is touched by one narrow scan.

    The expression is generated as ONE SQL string (a k×dim column-API
    build is thousands of py4j lit() round-trips — measured ~1.1 s per
    call; one expr() parse is ~50 ms). Tie-break (lowest centroid_id
    on equal cosine) and every double match the QUALIFY ROW_NUMBER
    mirror the other IVF oracles use.
    """
    structs = []
    for cid in sorted(book):
        cv = book[cid]
        cn = math.sqrt(_fold_dot(cv, cv))
        cos = f"({_sql_fold_dot('v', cv)} / (nrm * {_sql_double(cn)}))"
        structs.append(
            f"named_struct('nc', -{cos}, 'cid', CAST({cid} AS BIGINT))"
        )
    return df.withColumn(
        "centroid_id", F.expr(f"array_min(array({', '.join(structs)})).cid")
    )


def _quantized_kmeans_book(
    e: DataFrame,
    k: int = N_CENTROIDS,
    iters: int = IVF_SAMPLED_ITERS,
    sample_mod: int | None = None,
    with_query: bool = False,
):
    """Spherical k-means with ENGINE-PORTABLE arithmetic, optionally on
    a deterministic md5 sample (sample_mod=m keeps vec_ids whose md5
    lands in bucket 0 of m — the 100 TB spelling where Lloyd never
    touches the full corpus; sample_mod=None trains on every non-zero
    vector). Returns the driver-side codebook dict (k×dim — the
    bounded-collect contract).

    Every arithmetic step is engine-portable so DuckDB can re-run the
    training verbatim (full hash oracle — no recall bracket needed):
    - unit-vector components are quantized to int64 on a 1e-9 grid
      (FLOOR((x/nrm) * 1e9) — floor of the same double is the same
      int in every engine), so per-centroid sums are EXACT integer
      sums, independent of partitioning and fold order;
    - centroid components are CAST(s AS DOUBLE)/n — one IEEE division
      on identical (s, n), bit-identical everywhere;
    - norms/cosines are the fold-ordered list_sum/F.aggregate device
      every green cosine oracle already relies on.
    Empty clusters keep their previous centroid (mirrored by the
    oracle's LEFT JOIN + COALESCE per round).
    """
    samp = e.filter(F.col("nrm") > 0)
    if sample_mod is not None:
        md5_bucket = (
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % sample_mod
        )
        samp = samp.filter(md5_bucket == 0)
    samp = (
        samp.select("vec_id", "v", "nrm")
        .transform(cut_lineage)  # Lloyd jobs re-read the bounded set
    )
    # r12 optimization round: when the caller also needs the query row
    # (the probe step), ride it on the seed-collect job as a flagged
    # union branch instead of paying a separate filter job later.
    seed_src = samp.orderBy("vec_id").limit(k).select(
        "vec_id", "v", "nrm", F.lit(True).alias("is_seed")
    )
    if with_query:
        seed_src = seed_src.unionByName(
            e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
                "vec_id", "v", "nrm", F.lit(False).alias("is_seed")
            )
        )
    rows = seed_src.collect()
    book = {r["vec_id"]: list(r["v"]) for r in rows if r["is_seed"]}
    qrow = next((r for r in rows if not r["is_seed"]), None)
    for _ in range(iters):
        sums = (
            _assign_book_lit(samp, book)
            .select("centroid_id", "nrm", F.posexplode("v").alias("d", "x"))
            .groupBy("centroid_id", "d")
            .agg(
                F.sum(
                    F.floor((F.col("x") / F.col("nrm")) * F.lit(IVF_QUANT_SCALE))
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_book: dict[int, dict[int, float]] = {}
        for r in sums:
            # float(s)/n == CAST(s AS DOUBLE)/n: one IEEE round + one
            # IEEE division on identical integers in both engines
            new_book.setdefault(r["centroid_id"], {})[r["d"]] = float(r["s"]) / r["n"]
        for cid, comps in new_book.items():
            book[cid] = [comps[d] for d in range(len(comps))]
        # centroids absent from new_book (empty clusters) keep old value
    return (book, qrow) if with_query else book


def _ivf_kmeans_mirror_oracle(
    sample_mod: int | None = None,
    nprobe: int = N_PROBE,
    iters: int = IVF_SAMPLED_ITERS,
) -> str:
    """Generate the DuckDB mirror of the FULL quantized-training
    pipeline: seed → iters× (assign train set, integer-quantized sums,
    means, renorm) → assign corpus → probe → in-bucket top-k. The
    train set is the md5 sample when sample_mod is given, else every
    non-zero vector (mirrors _quantized_kmeans_book)."""
    samp_pred = "nrm > 0"
    if sample_mod is not None:
        samp_pred = (
            f"('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT"
            f" % {sample_mod} = 0 AND nrm > 0"
        )
    ctes = [
        _E_SQL,
        f"""samp AS (
        SELECT vec_id, v, nrm FROM e
        WHERE {samp_pred})""",
        f"""cent0 AS (
        SELECT vec_id AS centroid_id, v AS cv, nrm AS cn
        FROM samp ORDER BY vec_id LIMIT {N_CENTROIDS})""",
    ]
    for r in range(1, iters + 1):
        prev = f"cent{r - 1}"
        ctes.append(f"""a{r} AS (
        SELECT s.vec_id, s.v, s.nrm, c.centroid_id
        FROM samp s CROSS JOIN {prev} c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
            ORDER BY {_cos_pre('s.v', 's.nrm', 'c.cv', 'c.cn')} DESC,
                     c.centroid_id) = 1)""")
        ctes.append(f"""m{r} AS (
        SELECT centroid_id, g.d,
               SUM(CAST(FLOOR((v[g.d] / nrm) * {IVF_QUANT_SCALE}) AS BIGINT)) AS s,
               COUNT(*) AS n
        FROM a{r}, generate_series(1, {EMB_DIM}) AS g(d)
        GROUP BY centroid_id, g.d)""")
        ctes.append(f"""nc{r} AS (
        SELECT centroid_id, list(CAST(s AS DOUBLE) / n ORDER BY d) AS cv
        FROM m{r} GROUP BY centroid_id)""")
        ctes.append(f"""cent{r} AS (
        SELECT p.centroid_id, COALESCE(n.cv, p.cv) AS cv,
               sqrt(list_sum(list_transform(COALESCE(n.cv, p.cv),
                                            x -> x * x))) AS cn
        FROM {prev} p LEFT JOIN nc{r} n USING (centroid_id))""")
    final = f"cent{iters}"
    ctes.append(f"""assigned AS (
        SELECT e.vec_id, e.v, e.nrm, c.centroid_id
        FROM e CROSS JOIN {final} c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY {_cos_pre('e.v', 'e.nrm', 'c.cv', 'c.cn')} DESC,
                     c.centroid_id) = 1)""")
    ctes.append(f"q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID})")
    ctes.append(f"""probe AS (
        SELECT c.centroid_id FROM {final} c CROSS JOIN q
        ORDER BY {_cos_pre('c.cv', 'c.cn', 'q.qv', 'q.qn')} DESC, c.centroid_id
        LIMIT {nprobe})""")
    return "WITH " + ",\n    ".join(ctes) + f"""
    SELECT a.vec_id,
           ROUND({_cos_pre('a.v', 'a.nrm', 'q.qv', 'q.qn')}, 4) AS cosine
    FROM assigned a JOIN probe USING (centroid_id) CROSS JOIN q
    WHERE a.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_cos_pre('a.v', 'a.nrm', 'q.qv', 'q.qn')} DESC, a.vec_id
    LIMIT {TOP_K}
    """


def _ivf_probe_topk(
    e: DataFrame, book: dict[int, list[float]], nprobe: int, qrow=None
) -> DataFrame:
    """Probe-and-rank against a DRIVER-SIDE codebook: probe selection
    is driver arithmetic (k cosines against the 1×dim query), then ONE
    narrow corpus scan (literal-codebook argmax + isin(probes) +
    literal-query cosine) into TakeOrderedAndProject — ZERO exchanges;
    at 100 TB with the corpus written partitioned by centroid_id the
    isin becomes partition pruning at the scan
    (sim_topk_ivf_partitioned executes that layout).

    qrow: optionally the pre-fetched query Row (fields v, nrm) — the
    r12 optimization lets callers fuse the query fetch into a driver
    job they already run (e.g. the Lloyd seed collect) instead of
    paying a separate filter job here."""
    if qrow is None:
        qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v", "nrm").first()
    qv, qn = list(qrow["v"]), qrow["nrm"]
    scored = []
    for cid in sorted(book):
        cv = book[cid]
        cn = math.sqrt(_fold_dot(cv, cv))
        scored.append((-(_fold_dot(cv, qv) / (cn * qn)), cid))
    probes = [cid for _, cid in sorted(scored)[:nprobe]]
    cos = F.expr(f"{_sql_fold_dot('v', qv)} / (nrm * {_sql_double(qn)})")
    return (
        _assign_book_lit(e, book)
        .filter(F.col("centroid_id").isin(probes))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("cosine", 4).alias("cosine"))
    )


@register("sim_topk_ivf_kmeans", oracle=_ivf_kmeans_mirror_oracle())
def sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over a trained spherical k-means codebook: Lloyd
    iterations on the full corpus (every non-zero vector) replace the
    seed centroids, so buckets follow the data distribution — tighter
    clusters mean the same nprobe=4/16 probes capture more true
    neighbors than the untrained sim_topk_ivf.

    FULL algorithm mirror (round 9 — this retired the last bracket
    oracle in the registry): training uses the integer-quantized Lloyd
    updates proven by the sampled sibling (FLOOR((x/nrm)*1e9) int64
    sums → CAST(s AS DOUBLE)/n means — every step bit-identical in
    both engines), so the DuckDB oracle re-runs seed → 3 Lloyd rounds
    → assignment → probe → top-k verbatim and the ANN OUTPUT ITSELF
    hash-matches. Recall vs brute force stays pytested
    (IVF_KMEANS_RECALL_MIN). The previous spelling emitted the exact
    top-k plus a recall-attestation boolean whose oracle column was a
    literal TRUE; its bench cost was brute force + ANN. Now the op
    computes (and certifies) the ANN result alone.

    sim_topk_ivf_kmeans_sampled is the 100 TB production spelling
    (training never scans the full corpus); this one is the
    training-quality ceiling at the same probe budget."""
    e = _prepped(spark, sf_dir)
    book, qrow = _quantized_kmeans_book(e, with_query=True)
    return _ivf_probe_topk(e, book, N_PROBE, qrow=qrow)


@register(
    "sim_topk_ivf_kmeans_sampled",
    oracle=_ivf_kmeans_mirror_oracle(
        sample_mod=IVF_SAMPLE_MOD, nprobe=IVF_SAMPLED_NPROBE
    ),
)
def sim_topk_ivf_kmeans_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over a SAMPLE-trained spherical k-means codebook —
    the production spelling of sim_topk_ivf_kmeans: Lloyd runs on a
    deterministic md5 ~10% sample (3 tiny jobs over a checkpointed
    sample — see IVF_SAMPLED_ITERS; at 100 TB the sample is bounded and the full corpus is
    touched exactly once, by the final assignment pass), then the
    query probes nprobe=6 of 16 buckets (see IVF_SAMPLED_NPROBE: +2
    probes buy back the sample-training recall loss — 50-query avg
    recall@10 0.684 vs 0.686 for full-corpus training at nprobe=4)
    and ranks exact cosine inside them.

    FULL algorithm mirror: integer-quantized Lloyd updates make
    training arithmetic engine-portable, so the DuckDB oracle re-runs
    seed → Lloyd rounds → assignment → probe → top-k verbatim and
    the ANN output itself hash-matches. Plan shape: see
    _ivf_probe_topk (one narrow corpus scan, zero exchanges).
    """
    e = _prepped(spark, sf_dir)
    book, qrow = _quantized_kmeans_book(e, sample_mod=IVF_SAMPLE_MOD, with_query=True)
    return _ivf_probe_topk(e, book, IVF_SAMPLED_NPROBE, qrow=qrow)


INT8_QMAX = 127  # symmetric signed-int8 quantization grid


@register(
    "sim_topk_int8_quantized",
    oracle=f"""
    WITH {_E_SQL},
    px AS (SELECT vec_id, g.d, v[g.d] AS x
           FROM e, generate_series(1, {EMB_DIM}) AS g(d)),
    sc AS (SELECT MAX(ABS(x)) / {INT8_QMAX}.0 AS s FROM px),
    q AS (SELECT vec_id, px.d,
                 CAST(FLOOR(x / s + 0.5) AS BIGINT) AS qv
          FROM px CROSS JOIN sc),
    qq AS (SELECT d, qv AS qqv FROM q WHERE vec_id = {QUERY_VEC_ID})
    SELECT q.vec_id, CAST(SUM(q.qv * qq.qqv) AS BIGINT) AS qdot
    FROM q JOIN qq USING (d)
    WHERE q.vec_id <> {QUERY_VEC_ID}
    GROUP BY q.vec_id
    ORDER BY SUM(q.qv * qq.qqv) DESC, q.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_topk_int8_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by SYMMETRIC int8-quantized dot product: q(x) =
    round(x/s) with the global scale s = max|x|/127 — the
    zero-preserving signed quantization every vector index uses for
    dot/cosine metrics (an affine min-max grid would add a per-dim
    OFFSET that destroys dot ordering — measured recall 0.0; the
    symmetric grid measures recall 1.0 on the fixtures). 4× less scan
    I/O than float32, and ranking becomes EXACT integer arithmetic:
    no float ties, no fold-order concerns, bit-identical in every
    engine by construction.

    Plan shape: the scale is one bounded agg; quantization is a
    narrow expr; the query's quantized vector is a literal; the
    integer dot folds inside codegen — one corpus scan into
    TakeOrderedAndProject, zero wide exchanges. At 100 TB the int8
    column is what you STORE (quantized once at ingest); scans read a
    quarter of the bytes and the float corpus is touched only for
    optional exact re-ranking of the short candidate list.

    Recall vs exact cosine is pytested; the oracle mirrors the full
    quantize → integer-dot → top-k pipeline exactly (FLOOR(x/s + 0.5)
    is the same double op in both engines; everything after is
    integer)."""
    e = _prepped(spark, sf_dir)
    # r12 optimization round: the scale agg and the query-row fetch
    # used to be two separate driver jobs; one fused agg computes both
    # (vec_ids are unique, so max over the when() picks exactly the
    # query's vector). The query's quantized literals are then derived
    # in Python with the SAME IEEE ops the Spark expr ran
    # (x / scale + 0.5, floor) — bit-identical doubles either way.
    pre = e.agg(
        F.max(
            F.expr("aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))")
        ).alias("amax"),
        F.max(F.when(F.col("vec_id") == QUERY_VEC_ID, F.col("v"))).alias("qv"),
    ).first()
    scale = pre["amax"] / float(INT8_QMAX)
    quant = f"transform(v, x -> CAST(FLOOR(x / {_sql_double(scale)} + 0.5) AS BIGINT))"
    eq = e.withColumn("q", F.expr(quant))
    qq = [int(math.floor(x / scale + 0.5)) for x in pre["qv"]]
    qq_sql = "array(" + ", ".join(f"{x}L" for x in qq) + ")"
    qdot = F.expr(
        f"aggregate(zip_with(q, {qq_sql}, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"
    )
    return (
        eq.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), "vec_id")
        .limit(TOP_K)
    )


RERANK_CANDIDATES = 50  # stage-1 int8 shortlist width


@register(
    "sim_topk_int8_rerank",
    oracle=f"""
    WITH {_E_SQL},
    px AS (SELECT vec_id, g.d, v[g.d] AS x
           FROM e, generate_series(1, {EMB_DIM}) AS g(d)),
    sc AS (SELECT MAX(ABS(x)) / {INT8_QMAX}.0 AS s FROM px),
    q AS (SELECT vec_id, px.d,
                 CAST(FLOOR(x / s + 0.5) AS BIGINT) AS qv
          FROM px CROSS JOIN sc),
    qq AS (SELECT d, qv AS qqv FROM q WHERE vec_id = {QUERY_VEC_ID}),
    shortlist AS (
        SELECT q.vec_id
        FROM q JOIN qq USING (d)
        WHERE q.vec_id <> {QUERY_VEC_ID}
        GROUP BY q.vec_id
        ORDER BY SUM(q.qv * qq.qqv) DESC, q.vec_id
        LIMIT {RERANK_CANDIDATES}),
    qv AS (SELECT v AS qvec, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id,
           ROUND({_cos_pre('e.v', 'e.nrm', 'qv.qvec', 'qv.qn')}, 4) AS cosine
    FROM e JOIN shortlist USING (vec_id) CROSS JOIN qv
    ORDER BY {_cos_pre('e.v', 'e.nrm', 'qv.qvec', 'qv.qn')} DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_topk_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE retrieval — the production serving shape: stage 1
    scans the int8-quantized corpus (4× less I/O, exact integer
    ranking) for a 50-candidate shortlist; stage 2 re-ranks ONLY the
    shortlist with exact float cosine. Recall is effectively exact
    (the shortlist is 5× the answer size and int8 recall is already
    ~1.0) at a quarter of the scan bytes — at 100 TB stage 1 reads the
    stored int8 column and stage 2 fetches 50 float vectors by id.

    Both stages are engine-portable (integer dot; fold-ordered float
    cosine), so the oracle re-runs the full cascade and the output
    hash-matches."""
    e = _prepped(spark, sf_dir)
    # stage 1: the int8 ranking of sim_topk_int8_quantized, widened to
    # RERANK_CANDIDATES. r12 optimization round: scale agg + query-row
    # fetch fused into one driver job (see sim_topk_int8_quantized);
    # the query's quantized literals are derived in Python with the
    # SAME IEEE ops the Spark expr ran.
    pre = e.agg(
        F.max(
            F.expr("aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))")
        ).alias("amax"),
        F.max(F.when(F.col("vec_id") == QUERY_VEC_ID, F.col("v"))).alias("qv"),
        F.max(F.when(F.col("vec_id") == QUERY_VEC_ID, F.col("nrm"))).alias("qn"),
    ).first()
    scale = pre["amax"] / float(INT8_QMAX)
    quant = f"transform(v, x -> CAST(FLOOR(x / {_sql_double(scale)} + 0.5) AS BIGINT))"
    eq = e.withColumn("q", F.expr(quant))
    qq = [int(math.floor(x / scale + 0.5)) for x in pre["qv"]]
    qq_sql = "array(" + ", ".join(f"{x}L" for x in qq) + ")"
    qdot = F.expr(
        f"aggregate(zip_with(q, {qq_sql}, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"
    )
    cand = (
        eq.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), "vec_id")
        .limit(RERANK_CANDIDATES)
        .select("vec_id")
    )
    # stage 2: exact cosine on the candidate ids only (broadcast the
    # 50-row shortlist; at scale this is an id-lookup, not a scan)
    qv, qn = list(pre["qv"]), pre["qn"]
    cos = F.expr(f"{_sql_fold_dot('v', qv)} / (nrm * {_sql_double(qn)})")
    return (
        e.join(F.broadcast(cand), "vec_id")
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("cosine", 4).alias("cosine"))
    )


N_HYPERPLANES = 8
N_PROBE_BITS = 3  # probe all buckets within this Hamming distance


def _hyperplane(p: int) -> list[float]:
    """Hyperplane p: EMB_DIM deterministic pseudo-random components in
    [-1, 1], derived from md5(p:d) — a fixed model parameter both
    engines can share verbatim (the text_fingerprint md5-parity
    precedent, but hoisted to literals: zero per-row hashing cost)."""
    return [
        (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
        / 1000.0
        for d in range(EMB_DIM)
    ]


_PLANES = [_hyperplane(p) for p in range(N_HYPERPLANES)]

_LSH_MASKS = [0] + [
    m for m in range(1, 1 << N_HYPERPLANES) if bin(m).count("1") <= N_PROBE_BITS
]


def rp_lsh_signatures(e: DataFrame) -> DataFrame:
    """(vec_id, label, v, nrm, sig): random-hyperplane LSH signature.

    Bit p of sig is the sign of v·plane_p. The hyperplane matrix is
    8×64 md5-derived CONSTANTS (see _hyperplane) baked into the plan
    as array literals — at 100 TB that's a broadcast-sized model
    parameter and the signature pass is 8 fused fold-dot-products per
    row, no hashing, no shuffle. The fold order matches DuckDB's
    list_sum exactly, so signatures are bit-reproducible cross-engine
    (a sign only flips on a |dot| below float noise, ~1e-12 odds)."""
    sig = F.lit(0)
    for p, plane in enumerate(_PLANES):
        sp = dot(F.col("v"), F.array(*[F.lit(h) for h in plane]))
        sig = sig + F.when(sp >= 0, F.lit(1 << p)).otherwise(0)
    return e.withColumn("sig", sig)


def _lsh_sig_sql() -> str:
    """DuckDB twin of rp_lsh_signatures over the e CTE."""
    terms = []
    for p, plane in enumerate(_PLANES):
        lits = ", ".join(repr(h) for h in plane)
        terms.append(
            f"CASE WHEN list_sum(list_transform(list_zip(v, [{lits}]),"
            f" z -> z[1] * z[2])) >= 0 THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "sim_topk_rp_lsh",
    oracle=f"""
    WITH {_E_SQL},
    sig AS (SELECT vec_id, v, nrm, {_lsh_sig_sql()} AS sig FROM e),
    q AS (SELECT v AS qv, nrm AS qn, sig AS qsig FROM sig
          WHERE vec_id = {QUERY_VEC_ID}),
    probes AS (
        SELECT xor(q.qsig, t.mask) AS sig, q.qv, q.qn
        FROM q, (SELECT unnest([{', '.join(str(m) for m in _LSH_MASKS)}]) AS mask) t)
    SELECT s.vec_id,
           ROUND({_cos_pre('s.v', 's.nrm', 'pr.qv', 'pr.qn')}, 4) AS cosine
    FROM sig s JOIN probes pr USING (sig)
    WHERE s.vec_id <> {QUERY_VEC_ID}
    ORDER BY {_cos_pre('s.v', 's.nrm', 'pr.qv', 'pr.qn')} DESC, s.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_topk_rp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH top-k: the corpus is
    bucketed by an 8-bit sign signature; the query multi-probes every
    bucket within Hamming distance 3 (93 of 256 buckets ≈ 36% of the
    corpus; measured recall 0.6–0.7 at sf0.001–0.1), then exact cosine
    ranks the probed subset.

    100 TB: corpus written partitioned by sig → probing is partition
    pruning at the scan; signature computation is one fused projection
    pass over constant hyperplanes. Recall comes from multi-probe
    (cosine-close vectors agree on most signs, so neighbors concentrate
    at low Hamming distance).

    Full-mirror oracle: signatures, probe set, and in-bucket ranking
    are all deterministic fold-ordered arithmetic, so DuckDB re-runs
    the whole algorithm and the ANN output itself hash-matches."""
    e = rp_lsh_signatures(_prepped(spark, sf_dir))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn"), F.col("sig").alias("qsig")
    )
    # all signatures within Hamming distance N_PROBE_BITS of the query
    probes = (
        q.select(
            "qv", "qn", "qsig",
            F.explode(F.array(*[F.lit(m) for m in _LSH_MASKS])).alias("mask"),
        )
        .select("qv", "qn", F.col("qsig").bitwiseXOR(F.col("mask")).alias("sig"))
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    return (
        e.join(F.broadcast(probes), "sig")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("cosine", 4).alias("cosine"))
    )


QUERY_BATCH = 8


@register(
    "sim_topk_batch",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
          WHERE vec_id < {QUERY_BATCH})
    SELECT q.query_id, e.vec_id,
           ROUND(list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                 / (e.nrm * q.qn), 4) AS cosine
    FROM e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q.query_id
        ORDER BY list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                 / (e.nrm * q.qn) DESC, e.vec_id) <= {TOP_K}
    """,
)
def sim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-k: one corpus scan answers a whole batch of
    query vectors (ids < 8) at once — the realistic retrieval workload
    (single-query top-k is a special case; production batches are
    thousands).

    Plan: broadcast the query batch, score corpus×queries in one
    projection, per-query top-k via a window partitioned by query_id.
    At scale query_id is a GOOD partition key precisely because
    batches are large; with a tiny batch you'd add a salt + two-phase
    top-k. Shuffle volume is rows that survive nothing — all scored
    rows — so the 100 TB refinement is a per-partition pre-top-k
    (local heap) before the exchange; Spark's window already sorts
    within partitions, and AQE coalesces the small result.
    """
    from pyspark.sql.window import Window

    e = _prepped(spark, sf_dir)
    q = e.filter(F.col("vec_id") < QUERY_BATCH).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", dround("cosine", 4).alias("cosine"))
    )


@register(
    "sim_label_centroid_distance",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(v[1]), 4) AS avg_first,
           ROUND(AVG(list_sum(list_transform(v, x -> x * x))), 4) AS avg_sq_norm
    FROM e GROUP BY label
    """,
)
def sim_label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics (grouped agg over array column)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    sq_norm = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return (
        e.select("label", v[0].alias("first"), sq_norm.alias("sq"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            dround(F.avg("first"), 4).alias("avg_first"),
            dround(F.avg("sq"), 4).alias("avg_sq_norm"),
        )
    )


@register(
    "sim_knn_label_vote",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS true_label, v AS qv, nrm AS qn
          FROM e WHERE vec_id < {QUERY_BATCH}),
    nbrs AS (
        SELECT q.query_id, q.true_label, e.label
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY q.query_id
            ORDER BY list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                     / (e.nrm * q.qn) DESC, e.vec_id) <= {TOP_K}),
    votes AS (
        SELECT query_id, true_label, label AS predicted_label,
               CAST(COUNT(*) AS BIGINT) AS n_votes
        FROM nbrs GROUP BY query_id, true_label, label)
    SELECT query_id, true_label, predicted_label, n_votes
    FROM votes
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY n_votes DESC, predicted_label) = 1
    ORDER BY query_id
    """,
)
def sim_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification by neighbor vote: each query vector (ids <
    8) takes the majority label of its 10 nearest-by-cosine neighbors
    (tie → smaller label) — the eval loop of an embedding-space
    classifier, built from the batched-top-k plan plus one vote
    aggregation. Everything after the scored scan shuffles rows ∝
    queries×k, independent of corpus size."""
    from pyspark.sql.window import Window

    e = _prepped(spark, sf_dir)
    q = e.filter(F.col("vec_id") < QUERY_BATCH).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "true_label", "vec_id", "label", cos.alias("cosine"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    nbrs = scored.withColumn("rk", F.row_number().over(wk)).filter(F.col("rk") <= TOP_K)
    votes = nbrs.groupBy("query_id", "true_label", F.col("label").alias("predicted_label")).agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("predicted_label"))
    return (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("query_id", "true_label", "predicted_label", "n_votes")
        .orderBy("query_id")
    )


COV_DIMS = 16


@register(
    "embedding_covariance_matrix",
    oracle=f"""
    WITH comps AS (
        SELECT vec_id, d - 1 AS d, CAST(embedding[d] AS DOUBLE) AS x
        FROM embeddings, range(1, {COV_DIMS} + 1) t(d)),
    a AS (SELECT vec_id, d AS d1, x AS x1 FROM comps),
    b AS (SELECT vec_id, d AS d2, x AS x2 FROM comps)
    SELECT CAST(d1 AS INTEGER) AS d1, CAST(d2 AS INTEGER) AS d2,
           ROUND(covar_samp(x1, x2), 4) AS cov
    FROM a JOIN b USING (vec_id)
    WHERE d1 <= d2
    GROUP BY d1, d2
    ORDER BY d1, d2
    """,
)
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the first 16 embedding
    dimensions — the feature-engineering pass behind PCA/whitening.
    Component pairs come from a posexplode self-join on vec_id;
    covar_samp partial-aggregates, so the shuffle is O(dims²) groups
    regardless of corpus size. At 100 TB prefer one pass of
    sum/sum-product accumulators per (d1,d2) over a sampled subset —
    same plan shape, the sample bound by the estimator's variance."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    comps = e.select(
        "vec_id",
        F.posexplode(F.slice(F.transform("embedding", lambda x: x.cast("double")), 1, COV_DIMS)),
    ).select("vec_id", F.col("pos").alias("d"), F.col("col").alias("x"))
    a = comps.select("vec_id", F.col("d").alias("d1"), F.col("x").alias("x1"))
    b = comps.select("vec_id", F.col("d").alias("d2"), F.col("x").alias("x2"))
    return (
        a.join(b, "vec_id")
        .filter(F.col("d1") <= F.col("d2"))
        .groupBy("d1", "d2")
        .agg(dround(F.covar_samp("x1", "x2"), 4).alias("cov"))
        .orderBy("d1", "d2")
    )


PQ_M = 8  # subspaces
PQ_SUBDIM = 8  # 64-dim embeddings / 8
PQ_K = 16  # codes per subspace


def _pq_subvecs(df: DataFrame, vcol: str) -> DataFrame:
    """(…, m, sv): explode a vector column into its PQ_M subvectors."""
    subs = F.array(
        *[F.slice(vcol, m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)]
    )
    return df.select("vec_id", F.posexplode(subs).alias("m", "sv"))


_SQDIST = "aggregate(zip_with(sv, cvec, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)"


def _pq_codebook(e: DataFrame, seeds=None) -> DataFrame:
    """(m, code, cvec) codebook from the PQ_K lowest vec_ids' subvectors
    — the deterministic seed codebook (same convention as the IVF seed
    centroids; a trained variant would run per-subspace k-means exactly
    like kmeans_codebook). k×M×subdim doubles — trivially broadcastable.

    seeds: optionally the pre-collected PQ_K lowest-vec_id Rows
    (fields vec_id, v) — lets a caller that already collected the seed
    rows (r12: sim_topk_ivfpq shares them with the IVF coarse book)
    skip this function's own collect job."""
    if seeds is None:
        seeds = e.orderBy("vec_id").limit(PQ_K).select("vec_id", "v").collect()
    seeds = seeds[:PQ_K]
    rows = []
    for code, r in enumerate(sorted(seeds, key=lambda r: r["vec_id"])):
        v = list(r["v"])
        for m in range(PQ_M):
            rows.append((m, code, v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]))
    return e.sparkSession.createDataFrame(
        rows, "m int, code int, cvec array<double>"
    )


_SQD_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), z -> (z[1] - z[2]) * (z[1] - z[2])))"
)


def _pq_oracle() -> str:
    sub = lambda col: f"{col}[t.m * {PQ_SUBDIM} + 1 : t.m * {PQ_SUBDIM} + {PQ_SUBDIM}]"
    qcols = ",\n               ".join(
        f"SUM(CASE WHEN enc.m = {m} THEN dt.qd END) AS q{m}" for m in range(PQ_M)
    )
    est = " + ".join(f"q{m}" for m in range(PQ_M))
    return f"""
    WITH {_E_SQL},
    seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
        FROM e ORDER BY vec_id LIMIT {PQ_K}),
    book AS (
        SELECT t.m, seeds.code, {sub('seeds.v')} AS cvec
        FROM seeds, range(0, {PQ_M}) t(m)),
    subv AS (
        SELECT vec_id, t.m, {sub('e.v')} AS sv
        FROM e, range(0, {PQ_M}) t(m)),
    enc AS (
        SELECT s.vec_id, s.m, b.code
        FROM subv s JOIN book b USING (m)
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY s.vec_id, s.m
            ORDER BY {_SQD_SQL.format(a='s.sv', b='b.cvec')}, b.code) = 1),
    dt AS (
        SELECT s.m, b.code, {_SQD_SQL.format(a='s.sv', b='b.cvec')} AS qd
        FROM (SELECT m, sv FROM subv WHERE vec_id = {QUERY_VEC_ID}) s
        JOIN book b USING (m)),
    scored AS (
        SELECT enc.vec_id,
               {qcols}
        FROM enc JOIN dt USING (m, code)
        WHERE enc.vec_id <> {QUERY_VEC_ID}
        GROUP BY enc.vec_id)
    SELECT vec_id, ROUND({est}, 4) AS est_dist
    FROM scored ORDER BY {est}, vec_id LIMIT {TOP_K}
    """


@register("sim_topk_pq", oracle=_pq_oracle())
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: vectors are encoded as PQ_M=8 one-byte
    codes (nearest of PQ_K=16 codebook entries per 8-dim subspace); a
    query builds an 8×16 distance table and scores the corpus by
    asymmetric distance computation (ADC) — summing table lookups
    instead of touching floats. Top-k by estimated L2².

    This is the memory-bound scale path: at 100 TB the encoded corpus
    is M bytes/vector (64× smaller than float32×64), the distance
    table is query-sized and broadcast, and scoring is one join +
    groupBy over byte codes. Encoding cost is corpus × M×K subvector
    distances, embarrassingly parallel. Recall is bounded by codebook
    quality — the pytest checks overlap vs exact top-k and
    determinism (seed codebook, no RNG anywhere).

    Full-mirror oracle: encoding argmins and ADC lookups are exact
    arithmetic over the deterministic seed codebook, so DuckDB re-runs
    the algorithm end-to-end. The final per-vector estimate is summed
    per subspace then added in FIXED m-order (8 single-element sums +
    one left-associated chain) — not one float SUM over 8 rows — so
    the estimate is bit-identical regardless of either engine's
    aggregation order."""
    e = _prepped(spark, sf_dir)
    codebook = _pq_codebook(e)

    # encode: argmin code per (vec_id, m) as min_by over a (dist, code)
    # struct — deterministic tie-break to the lowest code, ONE hash
    # aggregation (partial+final) instead of a window sort over the
    # corpus × K candidate rows
    sub = _pq_subvecs(e, "v")
    encoded = (
        sub.join(F.broadcast(codebook), "m")
        .select("vec_id", "m", "code", F.expr(_SQDIST).alias("sqd"))
        .groupBy("vec_id", "m")
        .agg(F.min_by("code", F.struct("sqd", "code")).alias("code"))
    )

    # query ADC table: distance of the query's subvectors to every code
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID)
    dtable = (
        _pq_subvecs(q, "v")
        .join(F.broadcast(codebook), "m")
        .select("m", "code", F.expr(_SQDIST).alias("qd"))
    )

    per_m = [
        F.sum(F.when(F.col("m") == m, F.col("qd"))).alias(f"q{m}") for m in range(PQ_M)
    ]
    est = F.col("q0")
    for m in range(1, PQ_M):
        est = est + F.col(f"q{m}")
    return (
        encoded.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(dtable), ["m", "code"])
        .groupBy("vec_id")
        .agg(*per_m)
        .select("vec_id", est.alias("est"))
        .orderBy(F.col("est"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("est", 4).alias("est_dist"))
    )


ANN_INCR_CUTOFF_FRACTION = 0.8  # vec_id below lo+0.8*(hi-lo) = "history"


@register(
    "sim_ann_incremental_assign",
    oracle=f"""
    WITH {_E_SQL},
    bounds AS (SELECT MIN(vec_id) + CAST(FLOOR({ANN_INCR_CUTOFF_FRACTION} *
                      (MAX(vec_id) - MIN(vec_id))) AS BIGINT) AS cutoff
               FROM e),
    hist AS (SELECT e.* FROM e, bounds WHERE vec_id < cutoff),
    cent AS (
        SELECT vec_id AS centroid_id, v AS cv, nrm AS cn
        FROM hist ORDER BY vec_id LIMIT {N_CENTROIDS}),
    assigned AS (
        SELECT e.vec_id, c.centroid_id,
               CASE WHEN e.vec_id < b.cutoff THEN 1 ELSE 0 END AS is_hist
        FROM e CROSS JOIN bounds b CROSS JOIN cent c
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY e.vec_id
            ORDER BY {_cos_pre('e.v', 'e.nrm', 'c.cv', 'c.cn')} DESC,
                     c.centroid_id) = 1)
    SELECT centroid_id,
           CAST(SUM(is_hist) AS BIGINT) AS n_history,
           CAST(SUM(1 - is_hist) AS BIGINT) AS n_new,
           ROUND(SUM(1 - is_hist)::DOUBLE / SUM(is_hist), 4) AS growth_ratio
    FROM assigned GROUP BY centroid_id ORDER BY centroid_id
    """,
)
def sim_ann_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance: the daily-ingest shape for a
    vector index. History (vec_id below the 80% cutoff — standing in
    for yesterday's index) trains/owns the coarse codebook; the NEW
    batch is assigned to the FROZEN codebook — no re-clustering, the
    whole point of incremental maintenance — and the output is the
    per-centroid drift report (history size, new arrivals, growth
    ratio) an index operator watches to decide when re-training or
    bucket-splitting is due (a centroid whose growth ratio runs hot is
    absorbing a distribution shift).

    100 TB: assignment is one broadcast-codebook argmax pass over the
    new batch only; history sizes come from the index's metadata, not
    a re-scan (here both sides are recomputed so the report is
    self-contained and oracle-checkable). Codebook = the deterministic
    IVF seed (16 lowest history vec_ids), so the whole op — cutoff,
    codebook, argmax, counts — mirrors in DuckDB exactly."""
    e = _prepped(spark, sf_dir)
    lo, hi = e.agg(F.min("vec_id"), F.max("vec_id")).first()
    # floor (not round) on BOTH engines: Python int() truncates but a bare
    # SQL CAST(... AS BIGINT) rounds-to-nearest, so the oracle spells
    # CAST(FLOOR(...) AS BIGINT) and we floor here — cutoffs now agree for
    # every (hi-lo) % 5, not just the fixture's lucky residue.
    cutoff = lo + math.floor(ANN_INCR_CUTOFF_FRACTION * (hi - lo))
    hist = e.filter(F.col("vec_id") < cutoff)
    # same literal-argmax device as sim_topk_ivf: the frozen codebook
    # is a bounded driver-side constant, so assigning the new batch is
    # one narrow pass — no corpus shuffle.
    book = {r["centroid_id"]: list(r["cv"]) for r in _seed_centroids(hist).collect()}
    assigned = _assign_book_lit(e, book).select(
        "vec_id",
        "centroid_id",
        F.when(F.col("vec_id") < cutoff, 1).otherwise(0).alias("is_hist"),
    )
    return (
        assigned.groupBy("centroid_id")
        .agg(
            F.sum("is_hist").alias("n_history"),
            F.sum(1 - F.col("is_hist")).alias("n_new"),
            dround(
                F.sum(1 - F.col("is_hist")).cast("double") / F.sum("is_hist"), 4
            ).alias("growth_ratio"),
        )
        .orderBy("centroid_id")
    )


CONF_QUERY_BATCH = 64


@register(
    "sim_knn_confusion",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS true_label, v AS qv, nrm AS qn
          FROM e WHERE vec_id < {CONF_QUERY_BATCH}),
    nbrs AS (
        SELECT q.query_id, q.true_label, e.label
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.query_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY q.query_id
            ORDER BY list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                     / (e.nrm * q.qn) DESC, e.vec_id) <= {TOP_K}),
    votes AS (
        SELECT query_id, true_label, label AS predicted_label, COUNT(*) AS n_votes
        FROM nbrs GROUP BY query_id, true_label, label),
    preds AS (
        SELECT query_id, true_label, predicted_label
        FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, predicted_label) = 1)
    SELECT true_label, predicted_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM preds GROUP BY true_label, predicted_label
    ORDER BY true_label, predicted_label
    """,
)
def sim_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-classifier evaluation: the confusion matrix of k-NN
    majority-vote predictions over a {CONF_QUERY_BATCH}-query batch —
    the accuracy report that turns sim_knn_label_vote from a
    prediction op into an evaluated model. Same batched-top-k plan
    (one corpus scan answers all queries); everything after the scored
    scan is queries×k rows.

    100 TB note: evaluation batches are thousands of held-out points —
    still one corpus scan; the confusion matrix is labels²-bounded."""
    from pyspark.sql.window import Window

    e = _prepped(spark, sf_dir)
    q = e.filter(F.col("vec_id") < CONF_QUERY_BATCH).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    wtop = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id"))
    nbrs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "true_label", "label", cos.alias("cos"), "vec_id")
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= TOP_K)
    )
    wvote = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.col("predicted_label")
    )
    preds = (
        nbrs.groupBy("query_id", "true_label", F.col("label").alias("predicted_label"))
        .agg(F.count("*").alias("n_votes"))
        .withColumn("vr", F.row_number().over(wvote))
        .filter(F.col("vr") == 1)
    )
    return (
        preds.groupBy("true_label", "predicted_label")
        .agg(F.count("*").alias("n"))
        .orderBy("true_label", "predicted_label")
    )


SIM_RANGE_TAU = 0.80


@register(
    "sim_range_search",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id,
           ROUND(list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                 / (e.nrm * q.qn), 4) AS cosine
    FROM e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
      AND ROUND(list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
                / (e.nrm * q.qn), 4) >= {SIM_RANGE_TAU}
    ORDER BY cosine DESC, e.vec_id
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (threshold) similarity search: EVERY corpus vector with
    cosine ≥ τ={SIM_RANGE_TAU} to the query — the retrieval mode
    top-k cannot express (duplicate detection and recall-first
    filtering need all matches above a bar, not the best k). The
    threshold is applied to the 4-decimal-rounded score so the match
    set is engine-stable at the boundary.

    Plan: broadcast query, one corpus scan, the ≥ τ predicate filters
    DURING the scan stage — unlike top-k there is no ordering
    bottleneck at all (the final sort is result-sized). The IVF
    bucketed variant applies the same predicate per probed partition."""
    e = _prepped(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", dround(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= SIM_RANGE_TAU)
        .orderBy(F.desc("cosine"), "vec_id")
    )


MMR_POOL = 20  # ANN candidate pool the re-ranker consumes
MMR_K = 5  # final diverse set size
# λ·relevance − (1−λ)·max-sim-to-selected, written as 0.7/0.3 literals
# in BOTH engines so the arithmetic text is identical


def _mmr_oracle() -> str:
    """Greedy MMR unrolled as staged CTEs: p1..p5 each pick the
    argmax of 0.7*rel - 0.3*max(cos to already-picked), tie-broken by
    vec_id, from the top-20 candidate pool. Correlated MAX subqueries
    touch ≤ 4 rows; every cosine is the same fold-ordered double both
    engines compute, so the picked set and scores hash-match."""
    rel = _cos_pre("e.v", "e.nrm", "q.qv", "q.qn")
    parts = [
        f"""WITH {_E_SQL},
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID}),
    cand AS (
        SELECT e.vec_id, e.v, e.nrm, {rel} AS rel
        FROM e CROSS JOIN q WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY {rel} DESC, e.vec_id LIMIT {MMR_POOL}),
    p1 AS (SELECT vec_id, v, nrm, rel, 0.7 * rel AS score, 1 AS rank
           FROM cand ORDER BY rel DESC, vec_id LIMIT 1)"""
    ]
    for k in range(2, MMR_K + 1):
        sel = " UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, k))
        pair = _cos_pre("c.v", "c.nrm", "s.v", "s.nrm")
        parts.append(
            f"""r{k} AS (
        SELECT c.vec_id, c.v, c.nrm, c.rel,
               0.7 * c.rel - 0.3 * (SELECT MAX({pair})
                                    FROM ({sel}) s) AS score
        FROM cand c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM ({sel}) sx)),
    p{k} AS (SELECT vec_id, v, nrm, rel, score, {k} AS rank
             FROM r{k} ORDER BY score DESC, vec_id LIMIT 1)"""
        )
    picks = " UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, MMR_K + 1))
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT rank, vec_id, ROUND(rel, 4) AS relevance,
           ROUND(score, 4) AS mmr_score
    FROM ({picks}) ORDER BY rank"""
    )


@register("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998): from the query's top-20 cosine candidates, greedily pick 5
    maximizing 0.7*relevance - 0.3*max-similarity-to-already-picked —
    the diversity stage retrieval and training-data selection run
    AFTER an ANN pass so the final set isn't five near-duplicates
    (the selection-side complement of dedup_semantic_centroid).

    Plan shape: the candidate pool is one broadcast-query top-k scan
    (TakeOrderedAndProject, no global sort); each greedy round is one
    distributed argmax over the pool where the already-picked vectors
    ride the plan as LITERALS (the _assign_book_lit convention) — at a
    production pool size (re-rank 1M ANN candidates) every round stays
    a narrow scan + limit-1, and only k rows ever reach the driver.
    The returned frame is the union of the 5 one-row pick plans.

    Full-mirror oracle: the staged-CTE unroll re-runs pool selection
    and every greedy round on the same fold-ordered doubles (literal
    vectors round-trip exactly via repr), so ranks, ids, and scores
    all hash-match."""
    e = _prepped(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    rel = _cosine(F.col("v"), F.col("nrm"), F.col("qv"), F.col("qn"))
    cand = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", "nrm", rel.alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_POOL)
        .transform(cut_lineage)  # the pool feeds every greedy round
    )
    picks: list[DataFrame] = []
    selected: list[tuple[list, float]] = []
    chosen_ids: list = []
    for k in range(1, MMR_K + 1):
        if not selected:
            score = F.expr("0.7 * rel")
        else:
            sims = ", ".join(
                f"({_sql_fold_dot('v', sv)} / (nrm * {_sql_double(sn)}))"
                for sv, sn in selected
            )
            maxsim = f"greatest({sims})" if len(selected) > 1 else sims
            score = F.expr(f"0.7 * rel - 0.3 * {maxsim}")
        pool = cand.filter(~F.col("vec_id").isin(chosen_ids)) if chosen_ids else cand
        pick_plan = (
            pool.select(
                F.lit(k).alias("rank"), "vec_id", "v", "nrm", "rel",
                score.alias("score"),
            )
            .orderBy(F.desc("score"), "vec_id")
            .limit(1)
        )
        rows = pick_plan.collect()
        if not rows:
            # pool exhausted (corpus smaller than MMR_K non-query
            # vectors): return the short ranking, same as the oracle's
            # greedy unroll which likewise emits fewer rows
            break
        row = rows[0]
        selected.append((list(row["v"]), float(row["nrm"])))
        chosen_ids.append(row["vec_id"])
        picks.append(
            pick_plan.select(
                "rank",
                "vec_id",
                dround("rel", 4).alias("relevance"),
                dround("score", 4).alias("mmr_score"),
            )
        )
    if not picks:  # empty pool: typed empty ranking, not an IndexError
        return spark.createDataFrame(
            [], "rank int, vec_id bigint, relevance double, mmr_score double"
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("rank")


def _ivfpq_oracle() -> str:
    """DuckDB mirror of the composed IVF+PQ pipeline: coarse seed
    assignment + probe selection (the _IVF_SEED_ORACLE CTEs) gating
    which vectors the PQ/ADC scoring (the _pq_oracle CTEs) ever
    touches. Same deterministic-tie/fold-order conventions as the two
    oracles this composes."""
    sub = lambda col: f"{col}[t.m * {PQ_SUBDIM} + 1 : t.m * {PQ_SUBDIM} + {PQ_SUBDIM}]"
    qcols = ",\n               ".join(
        f"SUM(CASE WHEN enc.m = {m} THEN dt.qd END) AS q{m}" for m in range(PQ_M)
    )
    est = " + ".join(f"q{m}" for m in range(PQ_M))
    return f"""
    WITH {_E_SQL},
    cent AS (
        SELECT vec_id AS centroid_id, v AS cv, nrm AS cn
        FROM e ORDER BY vec_id LIMIT {N_CENTROIDS}),
    assigned AS (
        SELECT e.vec_id, e.v, c.centroid_id
        FROM e CROSS JOIN cent c
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY e.vec_id
            ORDER BY {_cos_pre('e.v', 'e.nrm', 'c.cv', 'c.cn')} DESC,
                     c.centroid_id) = 1),
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID}),
    probe AS (
        SELECT c.centroid_id FROM cent c CROSS JOIN q
        ORDER BY {_cos_pre('c.cv', 'c.cn', 'q.qv', 'q.qn')} DESC,
                 c.centroid_id
        LIMIT {N_PROBE}),
    members AS (
        SELECT a.vec_id, a.v FROM assigned a JOIN probe USING (centroid_id)),
    seeds AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
        FROM e ORDER BY vec_id LIMIT {PQ_K}),
    book AS (
        SELECT t.m, seeds.code, {sub('seeds.v')} AS cvec
        FROM seeds, range(0, {PQ_M}) t(m)),
    subv AS (
        SELECT vec_id, t.m, {sub('members.v')} AS sv
        FROM members, range(0, {PQ_M}) t(m)),
    enc AS (
        SELECT s.vec_id, s.m, b.code
        FROM subv s JOIN book b USING (m)
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY s.vec_id, s.m
            ORDER BY {_SQD_SQL.format(a='s.sv', b='b.cvec')}, b.code) = 1),
    dt AS (
        SELECT s.m, b.code, {_SQD_SQL.format(a='s.sv', b='b.cvec')} AS qd
        FROM (SELECT t.m, {sub('q.qv')} AS sv
              FROM q, range(0, {PQ_M}) t(m)) s
        JOIN book b USING (m)),
    scored AS (
        SELECT enc.vec_id,
               {qcols}
        FROM enc JOIN dt USING (m, code)
        WHERE enc.vec_id <> {QUERY_VEC_ID}
        GROUP BY enc.vec_id)
    SELECT vec_id, ROUND({est}, 4) AS est_dist
    FROM scored ORDER BY {est}, vec_id LIMIT {TOP_K}
    """


@register("sim_topk_ivfpq", oracle=_ivfpq_oracle())
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed ANN — the billion-scale serving architecture
    (Jégou et al. 2011 / FAISS IVFPQ): a coarse quantizer routes every
    vector to one of N_CENTROIDS buckets; vectors are PQ-encoded as
    PQ_M byte codes; a query probes its N_PROBE nearest buckets and
    scores ONLY their members by asymmetric-distance (ADC) table
    lookups. Top-k by estimated L2².

    Why this op exists next to sim_topk_ivf and sim_topk_pq: IVF alone
    still scans full floats inside probed buckets; PQ alone scans the
    whole encoded corpus. Composed, the scan is nprobe/ncentroids of
    an M-bytes-per-vector table — at 100 TB the encoded corpus is
    written partitioned by centroid_id (the sim_topk_ivf_partitioned
    layout executes exactly that) so a probe touches ~4/16 of a corpus
    that is already 64× smaller than float32.

    Codes are computed from RAW vectors against one shared codebook
    (FAISS by_residual=False). The textbook residual variant
    (by_residual=True) was measured on this corpus and LOSES: the
    fixture embeddings are near-uniform, the coarse centroids explain
    almost no variance, and residual reconstruction error came out
    2–30× WORSE than raw (seed book: 520 vs 376 total L2²; trained
    integer-grid book: residuals are meaningless at the 1e9 quant
    scale). by_residual pays only when the coarse quantizer captures
    real cluster structure — on uniform-ish corpora FAISS itself is
    run with by_residual=false, and that is the honest configuration
    here. Composition invariant pinned by
    test_ivfpq_equals_pq_restricted_to_probed: output == the global
    ADC ranking restricted to probed-bucket members.

    Plan shape: coarse assignment is the zero-exchange literal-argmax
    projection (_assign_book_lit) with DRIVER-side probe selection
    (_ivf_probe_topk convention) — the probed quarter of the corpus is
    selected by an isin that becomes partition pruning on the
    partitioned layout; the 8×16 codebook and the 8×16 ADC table ride
    broadcasts; encoding is one min_by hash agg whose shuffle rows are
    (vec_id, m, code) — bytes, not vectors."""
    e = _prepped(spark, sf_dir)
    # r12 optimization round: ONE driver job collects the seed rows
    # (they are simultaneously the IVF coarse book — N_CENTROIDS lowest
    # vec_ids — and the PQ codebook source — PQ_K lowest vec_ids) AND
    # the query row (flagged union branch); this op previously ran
    # three separate driver jobs for them.
    n_seed = max(N_CENTROIDS, PQ_K)
    rows = (
        e.orderBy("vec_id")
        .limit(n_seed)
        .select("vec_id", "v", "nrm", F.lit(True).alias("is_seed"))
        .unionByName(
            e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
                "vec_id", "v", "nrm", F.lit(False).alias("is_seed")
            )
        )
        .collect()
    )
    seeds = sorted((r for r in rows if r["is_seed"]), key=lambda r: r["vec_id"])
    book = {r["vec_id"]: list(r["v"]) for r in seeds[:N_CENTROIDS]}

    # probe selection: driver arithmetic over k cosines (same IEEE ops
    # as the oracle's probe CTE — _ivf_probe_topk convention)
    qrow = next(r for r in rows if not r["is_seed"])
    qv, qn = list(qrow["v"]), qrow["nrm"]
    scored_cents = []
    for cid in sorted(book):
        cv = book[cid]
        cn = math.sqrt(_fold_dot(cv, cv))
        scored_cents.append((-(_fold_dot(cv, qv) / (cn * qn)), cid))
    probes = [cid for _, cid in sorted(scored_cents)[:N_PROBE]]

    # probed members only: at scale this isin IS the partition prune —
    # everything downstream touches nprobe/ncentroids of the corpus
    members = (
        _assign_book_lit(e, book)
        .filter(F.col("centroid_id").isin(probes))
        .select("vec_id", "v")
    )

    codebook = _pq_codebook(e, seeds=seeds)
    sub = _pq_subvecs(members, "v")
    encoded = (
        sub.join(F.broadcast(codebook), "m")
        .select("vec_id", "m", "code", F.expr(_SQDIST).alias("sqd"))
        .groupBy("vec_id", "m")
        .agg(F.min_by("code", F.struct("sqd", "code")).alias("code"))
    )

    q = e.filter(F.col("vec_id") == QUERY_VEC_ID)
    dtable = (
        _pq_subvecs(q, "v")
        .join(F.broadcast(codebook), "m")
        .select("m", "code", F.expr(_SQDIST).alias("qd"))
    )

    per_m = [
        F.sum(F.when(F.col("m") == m, F.col("qd"))).alias(f"q{m}") for m in range(PQ_M)
    ]
    est = F.col("q0")
    for m in range(1, PQ_M):
        est = est + F.col(f"q{m}")
    return (
        encoded.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(dtable), ["m", "code"])
        .groupBy("vec_id")
        .agg(*per_m)
        .select("vec_id", est.alias("est"))
        .orderBy(F.col("est"), "vec_id")
        .limit(TOP_K)
        .select("vec_id", dround("est", 4).alias("est_dist"))
    )
