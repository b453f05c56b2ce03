"""Deterministic-sampling properties: stable membership, sane split
fractions, subset-invariance (adding/removing rows never reassigns
survivors — the property RNG sampling lacks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.operators import sampling
from tests.conftest import SMOKE_SF


def test_split_partitions_corpus(spark):
    rows = sampling.sample_split_documents(spark, SMOKE_SF).collect()
    total = load_table(spark, SMOKE_SF, "documents").count()
    assert len(rows) == total
    counts = {s: sum(1 for r in rows if r["split"] == s) for s in ("train", "valid", "test")}
    assert sum(counts.values()) == total
    frac = {s: n / total for s, n in counts.items()}
    # 13/256 ≈ 5.1% nominal for each held-out split; allow small-N noise
    assert 0.01 <= frac["test"] <= 0.12, frac
    assert 0.01 <= frac["valid"] <= 0.12, frac
    assert frac["train"] >= 0.75, frac


def test_split_subset_invariant(spark):
    """Membership computed on half the corpus must agree row-for-row
    with membership computed on the whole corpus."""
    full = {
        r["doc_id"]: r["split"]
        for r in sampling.sample_split_documents(spark, SMOKE_SF).collect()
    }
    docs = load_table(spark, SMOKE_SF, "documents").filter(F.col("doc_id") % 2 == 0)
    b = sampling.hash_bucket("doc_id")
    split = (
        F.when(b < sampling.TEST_UPPER, F.lit("test"))
        .when(b < sampling.VALID_UPPER, F.lit("valid"))
        .otherwise(F.lit("train"))
    )
    half = {r["doc_id"]: r["split"] for r in docs.select("doc_id", split.alias("split")).collect()}
    assert half == {k: v for k, v in full.items() if k % 2 == 0}


def test_hash_sample_fraction(spark):
    sampled_n = sum(
        r["n_orders"] for r in sampling.sample_hash_orders(spark, SMOKE_SF).collect()
    )
    total = load_table(spark, SMOKE_SF, "orders").count()
    # 26/256 ≈ 10.2% nominal
    assert 0.04 <= sampled_n / total <= 0.18, sampled_n / total
