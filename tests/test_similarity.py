"""Similarity-search properties: IVF recall vs brute force, top-k
consistency with a full sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.operators import similarity
from tests.conftest import SMOKE_SF


def test_bruteforce_topk_is_sort_prefix(spark):
    """topk(k) must equal the first k of the full similarity sort."""
    topk = similarity.sim_topk_bruteforce(spark, SMOKE_SF).collect()
    assert len(topk) == similarity.TOP_K
    sims = sorted((r["cosine"] for r in topk), reverse=True)
    assert [r["cosine"] for r in topk] == sims  # output itself ordered


def test_ivf_recall_vs_bruteforce(spark):
    brute = {r["vec_id"] for r in similarity.sim_topk_bruteforce(spark, SMOKE_SF).collect()}
    ivf = {r["vec_id"] for r in similarity.sim_topk_ivf(spark, SMOKE_SF).collect()}
    recall = len(brute & ivf) / len(brute)
    # nprobe/ncentroids = 25% of buckets scanned; random-ish embeddings
    # mean moderate recall — the property under test is that the probe
    # machinery finds a meaningful fraction, deterministically
    assert recall >= 0.2, f"ivf recall {recall}"
    again = {r["vec_id"] for r in similarity.sim_topk_ivf(spark, SMOKE_SF).collect()}
    assert ivf == again


def test_rp_lsh_recall_and_probe_fraction(spark):
    brute = {r["vec_id"] for r in similarity.sim_topk_bruteforce(spark, SMOKE_SF).collect()}
    lsh = {r["vec_id"] for r in similarity.sim_topk_rp_lsh(spark, SMOKE_SF).collect()}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.2, f"rp-lsh recall {recall}"
    # determinism (hash-derived hyperplanes, no RNG)
    again = {r["vec_id"] for r in similarity.sim_topk_rp_lsh(spark, SMOKE_SF).collect()}
    assert lsh == again
    # the probe set must actually bound work: <= ~C(8,<=3)/256 ≈ 36% of
    # the corpus (+ slack for uneven buckets)
    e = similarity.rp_lsh_signatures(similarity._prepped(spark, SMOKE_SF))
    total = e.count()
    qsig = e.filter(F.col("vec_id") == similarity.QUERY_VEC_ID).first()["sig"]
    masks = [0] + [
        m
        for m in range(1, 1 << similarity.N_HYPERPLANES)
        if bin(m).count("1") <= similarity.N_PROBE_BITS
    ]
    probed_sigs = {qsig ^ m for m in masks}
    probed = e.filter(F.col("sig").isin(*probed_sigs)).count()
    assert probed / total < 0.6, f"probed {probed}/{total}"


def test_batch_topk_contains_single_query_topk(spark):
    """The batch query's query_id=0 slice must equal the single-query
    brute-force top-k."""
    batch = similarity.sim_topk_batch(spark, SMOKE_SF)
    q0 = [
        (r["vec_id"], r["cosine"])
        for r in batch.filter(F.col("query_id") == similarity.QUERY_VEC_ID)
        .orderBy(F.desc("cosine"), "vec_id")
        .collect()
    ]
    single = [
        (r["vec_id"], r["cosine"])
        for r in similarity.sim_topk_bruteforce(spark, SMOKE_SF).collect()
    ]
    assert q0 == single
    counts = batch.groupBy("query_id").count().collect()
    assert len(counts) == similarity.QUERY_BATCH
    assert all(r["count"] == similarity.TOP_K for r in counts)


def test_ivf_kmeans_recall_and_determinism(spark):
    """The registered op IS the ANN neighbor list (round 9 — the
    recall-bracket spelling is gone): recall vs brute force is pinned
    here, exactness of the output is pinned by the full-mirror hash
    oracle (training re-run verbatim in DuckDB)."""
    brute = {r["vec_id"] for r in similarity.sim_topk_bruteforce(spark, SMOKE_SF).collect()}
    km = {r["vec_id"] for r in similarity.sim_topk_ivf_kmeans(spark, SMOKE_SF).collect()}
    recall = len(brute & km) / len(brute)
    assert recall >= similarity.IVF_KMEANS_RECALL_MIN, f"kmeans-ivf recall {recall}"
    again = {r["vec_id"] for r in similarity.sim_topk_ivf_kmeans(spark, SMOKE_SF).collect()}
    assert km == again


def test_kmeans_codebook_properties(spark):
    """Codebook: k unit-norm centroids, deterministic across retrains,
    and Lloyd training must not increase within-cluster scatter vs the
    seed codebook (measured as mean assigned cosine — higher=tighter)."""
    e = similarity._prepped(spark, SMOKE_SF)
    book = similarity.kmeans_codebook(e)
    rows = book.collect()
    assert len(rows) == similarity.N_CENTROIDS
    for r in rows:
        assert abs(r["cn"] - 1.0) < 1e-9
    again = similarity.kmeans_codebook(e).collect()
    assert [(r["centroid_id"], r["cv"]) for r in rows] == [
        (r["centroid_id"], r["cv"]) for r in again
    ]

    def mean_cos(centroids):
        assigned = similarity.assign_centroids(e, centroids)
        joined = assigned.join(
            centroids.withColumnRenamed("centroid_id", "cid"),
            F.col("centroid_id") == F.col("cid"),
        )
        cos = similarity._cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn"))
        return joined.select(F.avg(cos).alias("m")).first()["m"]

    seed = similarity._seed_centroids(e)
    assert mean_cos(book) >= mean_cos(seed) - 1e-9


def test_centroid_assignment_total(spark):
    e = similarity._prepped(spark, SMOKE_SF)
    centroids = (
        e.orderBy("vec_id")
        .limit(similarity.N_CENTROIDS)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    assigned = similarity.assign_centroids(e, centroids)
    # every vector lands in exactly one bucket
    assert assigned.count() == e.count()
    assert assigned.select("vec_id").distinct().count() == e.count()


def test_pq_recall_and_determinism(spark):
    # PQ estimates L2 distance; compare against exact L2 top-k (not the
    # cosine ranking — the embeddings are not normalized, so the two
    # orderings legitimately differ)
    from pyspark.sql import functions as F

    e = similarity._prepped(spark, SMOKE_SF)
    q = e.filter(F.col("vec_id") == similarity.QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    exact = {
        r["vec_id"]
        for r in (
            e.filter(F.col("vec_id") != similarity.QUERY_VEC_ID)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                F.expr(
                    "aggregate(zip_with(v, qv, (a, b) -> (a - b) * (a - b)),"
                    " 0D, (acc, x) -> acc + x)"
                ).alias("d"),
            )
            .orderBy("d", "vec_id")
            .limit(similarity.TOP_K)
            .collect()
        )
    }
    pq = {r["vec_id"] for r in similarity.sim_topk_pq(spark, SMOKE_SF).collect()}
    recall = len(exact & pq) / len(exact)
    # 16-entry seed codebook over random-ish embeddings: the property
    # under test is that ADC ranking is meaningfully correlated with
    # exact distance, deterministically — not state-of-the-art recall
    assert recall >= 0.2, f"pq recall {recall}"
    again = {r["vec_id"] for r in similarity.sim_topk_pq(spark, SMOKE_SF).collect()}
    assert pq == again


def test_ivfpq_determinism_and_probe_pruning(spark):
    """IVFADC output is deterministic, its members all live in probed
    buckets, and the estimate column is ascending (it's a distance)."""
    out = similarity.sim_topk_ivfpq(spark, SMOKE_SF).collect()
    assert len(out) == similarity.TOP_K
    ests = [r["est_dist"] for r in out]
    assert ests == sorted(ests)
    again = similarity.sim_topk_ivfpq(spark, SMOKE_SF).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_ivfpq_equals_pq_restricted_to_probed(spark):
    """The composition invariant: with one shared codebook and raw
    (by_residual=false) encoding, IVFPQ's output must equal the GLOBAL
    ADC ranking restricted to probed-bucket members — IVF contributes
    exactly the membership gate, PQ exactly the scores. Verified by a
    driver-side numpy replication of both stages."""
    import numpy as np

    e = similarity._prepped(spark, SMOKE_SF)
    rows = e.select("vec_id", "v").orderBy("vec_id").collect()
    vecs = {r["vec_id"]: np.array(r["v"]) for r in rows}
    ids = sorted(vecs)
    book = {
        r["centroid_id"]: np.array(r["cv"])
        for r in similarity._seed_centroids(e).collect()
    }

    def nearest_centroid(v):
        n = np.linalg.norm(v)
        # max cosine, ties to the lowest centroid_id (sorted iteration)
        best, best_cos = None, -np.inf
        for cid in sorted(book):
            c = book[cid]
            cos = float(v @ c) / (n * np.linalg.norm(c))
            if cos > best_cos:
                best, best_cos = cid, cos
        return best

    qv = vecs[similarity.QUERY_VEC_ID]
    cents_by_cos = sorted(
        book,
        key=lambda cid: (
            -float(qv @ book[cid])
            / (np.linalg.norm(qv) * np.linalg.norm(book[cid])),
            cid,
        ),
    )
    probed = set(cents_by_cos[: similarity.N_PROBE])
    members = {i for i in ids if nearest_centroid(vecs[i]) in probed}

    M, S, K = similarity.PQ_M, similarity.PQ_SUBDIM, similarity.PQ_K
    seeds = [vecs[i] for i in ids[:K]]
    codebook = [[s[m * S : (m + 1) * S] for s in seeds] for m in range(M)]

    def adc_est(v):
        tot = 0.0
        for m in range(M):
            sv = v[m * S : (m + 1) * S]
            code = min(
                range(K), key=lambda k: (float(((sv - codebook[m][k]) ** 2).sum()), k)
            )
            qsv = qv[m * S : (m + 1) * S]
            tot += float(((qsv - codebook[m][code]) ** 2).sum())
        return tot

    expected = sorted(
        ((adc_est(vecs[i]), i) for i in members if i != similarity.QUERY_VEC_ID),
    )[: similarity.TOP_K]
    got = similarity.sim_topk_ivfpq(spark, SMOKE_SF).collect()
    assert [r["vec_id"] for r in got] == [i for _, i in expected]
    # scores match to the output rounding
    for r, (est, _) in zip(got, expected):
        assert abs(r["est_dist"] - est) < 1e-3


def test_incremental_assign_total_and_deterministic(spark):
    rows = similarity.sim_ann_incremental_assign(spark, SMOKE_SF).collect()
    assert len(rows) == similarity.N_CENTROIDS
    e = similarity._prepped(spark, SMOKE_SF)
    assert sum(r["n_history"] + r["n_new"] for r in rows) == e.count()
    # centroids are history members, so every centroid owns >= itself
    assert all(r["n_history"] >= 1 for r in rows)
    again = similarity.sim_ann_incremental_assign(spark, SMOKE_SF).collect()
    assert rows == again


def test_int8_quantized_recall(spark):
    """Scalar-quantized ranking must stay close to exact cosine:
    recall@10 >= 0.7 on the fixtures (measured 0.8-1.0; int8 min-max
    quantization loses ~1/255 per-dim resolution). Note qdot ranks by
    unnormalized quantized DOT — on unit-norm fixtures that tracks
    cosine; the floor guards a quantization regression."""
    from pwir_zadanie_4_mapreduce_spark.operators.similarity import (
        sim_topk_bruteforce,
        sim_topk_int8_quantized,
    )

    exact = {r["vec_id"] for r in sim_topk_bruteforce(spark, SMOKE_SF).collect()}
    got = {r["vec_id"] for r in sim_topk_int8_quantized(spark, SMOKE_SF).collect()}
    assert len(got & exact) / len(exact) >= 0.7, (sorted(got), sorted(exact))


def test_sql_double_literals_roundtrip_exactly(spark):
    """The literal-codebook device depends on CAST('repr(x)' AS
    DOUBLE) reproducing the Python double BIT-EXACTLY — pin it over a
    mix of adversarial and hypothesis-style values in one batch."""
    import math
    import struct as st

    from pyspark.sql import functions as F

    from pwir_zadanie_4_mapreduce_spark.operators.similarity import _sql_double

    vals = [0.1, 1e-300, 1e300, -2.5e-10, 1.0000000000000002, 3.141592653589793,
            -0.0, 5e-324, 1.7976931348623157e308, 123456789.123456789]
    # xorshift doubles across magnitudes
    x = 88172645463325252
    for _ in range(200):
        x ^= (x << 13) & (2**64 - 1)
        x ^= x >> 7
        x ^= (x << 17) & (2**64 - 1)
        d = st.unpack("<d", st.pack("<Q", x))[0]
        if math.isfinite(d):
            vals.append(d)
    expr = "array(" + ", ".join(_sql_double(v) for v in vals) + ")"
    got = spark.range(1).select(F.expr(expr).alias("a")).first()["a"]
    for want, g in zip(vals, got):
        assert st.pack("<d", want) == st.pack("<d", g), (want, g)


def test_int8_query_literal_derivation_bit_identical(spark):
    """The r12 fused-driver-job optimization derives the query's
    quantized literals in PYTHON (int(math.floor(x / scale + 0.5)))
    instead of running the Spark quantize expr — valid only if both
    paths perform the identical IEEE double ops. Pin the bit-identity
    over numerical edges: negative components, components straddling
    the .5 rounding boundary, a near-zero amax (tiny scale), and a mix
    of xorshift doubles (r12 verdict minor #6)."""
    import math
    import struct as st

    from pyspark.sql import functions as F

    from pwir_zadanie_4_mapreduce_spark.operators.similarity import (
        INT8_QMAX,
        _sql_double,
    )

    cases = [
        # (components, amax) — amax plays the fused agg's global max|x|
        ([0.5, -0.5, 0.25, -0.25, 1.0, -1.0], 1.0),
        ([1e-305, -1e-305, 3e-306, -7e-307], 1e-305),  # amax ~ 0
        ([0.1, 0.2, 0.3, -0.1, -0.2, -0.3], 0.3),
        ([127.49999999999999, -127.5, 126.99999999999999], 127.5),
    ]
    x = 6364136223846793005
    mixed = []
    for _ in range(64):
        x ^= (x << 13) & (2**64 - 1)
        x ^= x >> 7
        x ^= (x << 17) & (2**64 - 1)
        d = st.unpack("<d", st.pack("<Q", x))[0]
        if math.isfinite(d):
            mixed.append(math.fmod(d, 2.0))  # keep |x| sane
    cases.append((mixed, max(abs(v) for v in mixed)))

    for comps, amax in cases:
        scale = amax / float(INT8_QMAX)
        py = [int(math.floor(v / scale + 0.5)) for v in comps]
        arr = "array(" + ", ".join(_sql_double(v) for v in comps) + ")"
        expr = (
            f"transform({arr}, x -> CAST(FLOOR(x / {_sql_double(scale)} + 0.5)"
            " AS BIGINT))"
        )
        got = spark.range(1).select(F.expr(expr).alias("q")).first()["q"]
        assert got == py, (comps, scale, got, py)
