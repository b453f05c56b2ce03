"""Multimodal plumbing: binary payload round-trip, Arrow batch shape,
frame fan-out arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.operators import multimodal
from tests.conftest import SMOKE_SF


def test_payload_roundtrip(spark):
    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")
    media = multimodal.with_binary_payload(docs)
    row = media.orderBy("doc_id").first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["media_meta"]["mime"] == "image/fake"
    # payload decodes back to the original text
    back = media.select("doc_id", F.decode("payload", "UTF-8").alias("t")).orderBy("doc_id").first()
    orig = docs.orderBy("doc_id").first()
    assert back["t"] == orig["text"]


def test_decode_features_deterministic(spark):
    a = multimodal.multimodal_decode_features(spark, SMOKE_SF).orderBy("doc_id").collect()
    b = multimodal.multimodal_decode_features(spark, SMOKE_SF).orderBy("doc_id").collect()
    assert a == b
    for r in a:
        assert 64 <= r["fake_width"] < 704
        assert 1 <= r["n_frames"] <= 16


def test_frame_sample_counts(spark):
    feats = {r["doc_id"]: r["n_frames"] for r in
             multimodal.multimodal_decode_features(spark, SMOKE_SF).collect()}
    sampled = multimodal.multimodal_frame_sample(spark, SMOKE_SF).collect()
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in sampled)
    for doc_id, n_frames in feats.items():
        # frames 0, 4, 8, 12 → ceil(n/4)
        assert per_doc[doc_id] == (n_frames + 3) // 4


def test_png_decode_stats_match_formula(spark):
    """The real PNG path: decoded pixel stats must equal the
    generation formula recomputed directly (the oracle's check, but
    in-process) — any codec bug (CRC walk, inflate, unfilter) breaks
    this."""
    rows = multimodal.multimodal_png_decode_stats(spark, SMOKE_SF).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        w, h = 4 + d % 13, 4 + d % 11
        px = [(d * 31 + x * 7 + y * 13) % 256 for y in range(h) for x in range(w)]
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == sum(px)
        assert r["min_px"] == min(px) and r["max_px"] == max(px)
