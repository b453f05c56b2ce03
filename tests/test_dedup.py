"""Dedup operator properties beyond the oracle comparison:
LSH recall vs the exact methods, signature determinism, idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.operators import dedup
from tests.conftest import SMOKE_SF


def _pairs(df):
    return {(r[0], r[1]) for r in df.select("doc_a", "doc_b").collect()}


def test_exact_dedup_idempotent(spark):
    once = dedup.dedup_exact(spark, SMOKE_SF)
    # dedup of an already-deduped corpus changes nothing
    assert once.count() == once.select("text").distinct().count()
    assert once.filter(F.col("n_copies") < 1).count() == 0


def test_minhash_lsh_recall_vs_exact(spark):
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, SMOKE_SF))
    lsh = _pairs(dedup.dedup_minhash_lsh(spark, SMOKE_SF))
    assert exact, "fixture should contain planted near-dup pairs"
    # LSH output is verified-exact, so precision is 1.0 by construction
    assert lsh <= exact
    # 16 bands × 2 rows at j >= 0.5: expected recall ≈ 99%
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.85, f"recall {recall:.2f} ({len(lsh)}/{len(exact)})"


def test_minhash_lsh_equals_exhaustive_on_fixture(spark):
    """The registered DuckDB oracle for dedup_minhash_lsh is the
    EXHAUSTIVE j >= 0.5 pair set — valid precisely because banding
    recall is 100% on the frozen fixture (measured at sf0.001/0.01/
    0.1). This pins the premise: if a future change drops a pair,
    this fails before the driver's hash compare does."""
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, SMOKE_SF))
    lsh = _pairs(dedup.dedup_minhash_lsh(spark, SMOKE_SF))
    assert lsh == exact, (sorted(exact - lsh), sorted(lsh - exact))


def test_minhash_signature_deterministic(spark):
    a = dedup.dedup_minhash_lsh(spark, SMOKE_SF).collect()
    b = dedup.dedup_minhash_lsh(spark, SMOKE_SF).collect()
    assert a == b


def test_simhash_finds_planted_dups(spark):
    # the fixture's exact near-dups (3-shingle jaccard >= 0.5) are
    # token-overlapping enough that close pairs exist; simhash must at
    # least produce a deterministic, symmetric-free pair list
    pairs = dedup.dedup_simhash(spark, SMOKE_SF).collect()
    seen = set()
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["hamming_dist"] <= 3
    again = dedup.dedup_simhash(spark, SMOKE_SF).collect()
    assert pairs == again


def test_cluster_components_consistent_with_pairs(spark):
    """Every near-dup pair must share a cluster; canonical is the min
    member; non-pair docs are singletons labeled by themselves."""
    labels = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.dedup_cluster_components(spark, SMOKE_SF).collect()
    }
    pairs = _pairs(dedup.dedup_ngram_jaccard(spark, SMOKE_SF))
    assert pairs, "fixture should contain planted near-dup pairs"
    in_pairs = set()
    for a, b in pairs:
        assert labels[a] == labels[b], (a, b)
        in_pairs |= {a, b}
    for doc, canon in labels.items():
        assert canon <= doc
        if doc not in in_pairs:
            assert canon == doc


def test_dfcap_jaccard_subset_of_exact(spark):
    """Capped candidates can only lose pairs, never invent them, and
    surviving pairs carry the identical exact score."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(spark, SMOKE_SF).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard_dfcap(spark, SMOKE_SF).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j == exact[pair]
    # planted near-dups share rare shingles — the cap should keep most
    assert len(capped) >= 0.8 * len(exact), (len(capped), len(exact))


def test_star_components_match_propagation(spark):
    """large-star/small-star must produce identical labels to
    min-label propagation on the real near-dup graph AND on a
    constructed high-diameter graph (a 40-node path — the case where
    propagation needs 40 rounds but star alternation needs ~log n)."""
    star = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.dedup_cluster_components_star(spark, SMOKE_SF).collect()
    }
    prop = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.dedup_cluster_components(spark, SMOKE_SF).collect()
    }
    assert star == prop

    # path 0-1-...-39, a 3-cycle {100,101,102}, singletons 200, 201
    path = [(i, i + 1) for i in range(39)]
    cycle = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(path + cycle, "u long, v long")
    nodes = spark.createDataFrame(
        [(n,) for n in list(range(40)) + [100, 101, 102, 200, 201]], "node long"
    )
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components_star(nodes, edges, max_iterations=10).collect()
    }
    want = {n: 0 for n in range(40)}
    want.update({100: 100, 101: 100, 102: 100, 200: 200, 201: 201})
    assert got == want


def test_embedding_cosine_threshold(spark):
    rows = dedup.dedup_embedding_cosine(spark, SMOKE_SF).collect()
    assert all(r["cosine"] >= dedup.COSINE_DUP_THRESHOLD - 1e-4 for r in rows)
    assert all(r["vec_a"] < r["vec_b"] for r in rows)


def test_embedding_rp_lsh_subset_and_pinned_recall(spark):
    """The banded RP-LSH dedup is verified-exact (precision 1.0 by
    construction: the verify join recomputes true cosine), and its
    banding recall on the frozen fixture is DETERMINISTIC — pin it, so
    a future change to planes/bands/threshold that silently drops
    pairs fails here before the driver's hash compare moves. τ=0.4 is
    the fixture's forced regime (max pairwise cosine 0.51) and the
    hyperplane-agreement probability at τ=0.4 is only ~0.63, so 4-bit
    bands collide on just 0.63⁴≈16 % per band — recall 35/66 here and
    40/59 at sf0.01 is the EXPECTED value of the b×r trade at this τ,
    not a defect; at a production near-dup τ≈0.9 the same config
    yields ≈0.95 (see the operator docstring)."""
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.dedup_embedding_cosine(spark, SMOKE_SF).collect()
    }
    lsh_rows = dedup.dedup_embedding_rp_lsh(spark, SMOKE_SF).collect()
    lsh = {(r["vec_a"], r["vec_b"]) for r in lsh_rows}
    assert lsh <= exact, sorted(lsh - exact)
    assert all(r["cosine"] >= dedup.COSINE_DUP_THRESHOLD - 1e-4 for r in lsh_rows)
    assert (len(lsh), len(exact)) == (35, 66), (len(lsh), len(exact))


def test_leakage_safe_split_partitions_and_never_leaks(spark):
    rows = dedup.pipeline_leakage_safe_split(spark, SMOKE_SF).collect()
    splits = {r["split"]: r for r in rows}
    assert set(splits) <= {"train", "val", "test"} and "train" in splits
    # the audit column is computed, not asserted — and must come out 0
    assert all(r["cross_split_pairs"] == 0 for r in rows)
    # splits partition the corpus: doc counts sum to |documents|
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table

    n_docs = load_table(spark, SMOKE_SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # every near-dup cluster is wholly inside one split: clusters sum
    # to the number of distinct canonical ids
    n_clusters = (
        dedup.dedup_cluster_components(spark, SMOKE_SF)
        .select("canonical_id").distinct().count()
    )
    assert sum(r["n_clusters"] for r in rows) == n_clusters
