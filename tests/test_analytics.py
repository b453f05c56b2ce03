"""Unit/property tests for operators/analytics.py (round 2).

The oracle comparison for the SQL-expressible queries lives in
tests/test_oracle_parity.py (auto-parametrized from the registry);
this file covers the parts an oracle can't: sketch accuracy bounds,
the generic merge_upsert contract on literal frames, and island
semantics on a hand-built edge-case frame.
"""

from __future__ import annotations

import datetime

from pwir_zadanie_4_mapreduce_spark.operators.analytics import (
    agg_hll_sketch_users,
    merge_upsert,
)
from tests.conftest import SMOKE_SF


def test_hll_estimate_within_tolerance(spark):
    """Merged daily HLL sketches must estimate within 5% of exact
    (Datasketches HLL default lgK=12 ≈ 1.6% RSE; 5% is >3 sigma) —
    the query now carries the band as a boolean (bracket oracle)."""
    rows = agg_hll_sketch_users(spark, SMOKE_SF).collect()
    assert rows, "expected at least one event_type"
    for r in rows:
        assert r["est_in_band"], (r["event_type"], r["exact_users"])


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, 99.0), (4, 40.0)], "k long, v double"
    )
    out = {r["k"]: r for r in merge_upsert(base, updates, "k").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["action"] == "unchanged" and out[1]["v"] == 10.0
    assert out[2]["action"] == "updated" and out[2]["v"] == 99.0
    # column absent from the batch passes through from base on update
    assert out[2]["name"] == "b"
    assert out[3]["action"] == "unchanged"
    assert out[4]["action"] == "inserted" and out[4]["v"] == 40.0
    assert out[4]["name"] is None


def test_merge_upsert_idempotent(spark):
    """Re-applying the same batch yields the same snapshot (MERGE is
    idempotent on non-transactional sinks when keyed)."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    updates = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k long, v double")
    once = merge_upsert(base, updates, "k").drop("action")
    twice = merge_upsert(once, updates, "k").drop("action")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_gaps_islands_splits_on_gap(spark):
    """Hand-built frame: days 1,2,3 then 5,6,7 for one user must form
    two 3-day islands, not one 6-day one."""
    from pwir_zadanie_4_mapreduce_spark.operators.registry import QUERIES

    # ts is int64 *nanoseconds* on disk, exactly like the driver
    # fixture (catalog.load_table reads nanosAsLong and truncates)
    epoch = datetime.datetime(1970, 1, 1)
    rows = [
        (
            i,
            int((datetime.datetime(2024, 1, day, 12, 0) - epoch).total_seconds() * 1e9),
            7,
            "click",
            1.0,
            "{}",
        )
        for i, day in enumerate([1, 2, 3, 5, 6, 7])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        out = QUERIES["window_gaps_islands"](spark, tmp).collect()
    assert len(out) == 2
    assert all(r["n_days"] == 3 for r in out)
    starts = sorted(r["island_start"].day for r in out)
    assert starts == [1, 5]


def test_rfm_quartiles_partition_users(spark):
    """Every user lands in exactly one quartile per dimension and the
    quartile sizes differ by at most one (NTILE contract)."""
    from collections import Counter

    from pwir_zadanie_4_mapreduce_spark.operators.registry import QUERIES

    rows = QUERIES["events_rfm_segments"](spark, SMOKE_SF).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_q", "f_q", "m_q"):
        sizes = Counter(r[col] for r in rows)
        assert set(sizes) <= {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)
        assert sum(sizes.values()) == n


def test_hll_intersection_tolerance(spark):
    from pwir_zadanie_4_mapreduce_spark.operators.analytics import agg_hll_intersection
    from tests.conftest import SMOKE_SF

    row = agg_hll_intersection(spark, SMOKE_SF).collect()[0]
    assert row["exact_intersection"] > 0
    # inclusion-exclusion compounds the ~1.6% RSE of three estimates;
    # the sets here overlap heavily, so 10% is a safe determinism bound
    assert row["est_in_band"], row
