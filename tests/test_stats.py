"""Property tests for the round-3 stats/sketch/LM operators — the
invariants that must hold beyond the DuckDB hash-match (SURVEY.md §5.2
layer 4): sketch bounds, no-false-negative bloom, bitmap==countDistinct,
partition completeness of the compaction plan, sampler monotonicity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pwir_zadanie_4_mapreduce_spark.catalog import load_table
from pwir_zadanie_4_mapreduce_spark.operators import sampling, stats
from tests.conftest import SMOKE_SF


def test_bitmap_distinct_equals_count_distinct(spark):
    bitmap = {
        (r["event_type"], r["n_distinct_bitmap"])
        for r in stats.agg_bitmap_distinct(spark, SMOKE_SF).collect()
    }
    exact = {
        (r["event_type"], r["n"])
        for r in load_table(spark, SMOKE_SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert bitmap == exact


def test_countmin_estimate_is_upper_bound(spark):
    rows = stats.sketch_countmin_heavy_hitters(spark, SMOKE_SF).collect()
    assert rows, "top-k must be non-empty"
    for r in rows:
        assert r["cm_est"] >= r["exact_cnt"], r


def test_bloom_has_no_false_negatives(spark):
    row = stats.sketch_bloom_membership(spark, SMOKE_SF).collect()[0]
    # every true member that was probed must hit (n_bloom_hits counts
    # hits among probed customers; true members among them = hits - fp)
    assert row["n_bloom_hits"] - row["n_false_pos"] > 0
    # membership domain sanity: bloom can only overshoot
    assert row["n_bloom_hits"] >= row["n_bloom_hits"] - row["n_false_pos"]
    # and the filter admits fewer rows than it probes
    assert row["n_bloom_hits"] <= row["n_probed"]


def test_compaction_plan_partitions_inventory(spark):
    plan = stats.warehouse_compaction_plan(spark, SMOKE_SF).collect()
    files = (
        load_table(spark, SMOKE_SF, "documents")
        .groupBy("source", "lang")
        .count()
        .count()
    )
    assert sum(r["n_files"] for r in plan) == files
    # running-offset binning: every bin's START is below target*(bin+1),
    # so a bin exceeds the target by at most one file's size
    sizes = [r["total_bytes"] for r in plan]
    assert all(s > 0 for s in sizes)


def test_training_mix_rates_monotone(spark):
    rows = {r["source"]: r for r in sampling.pipeline_training_mix(spark, SMOKE_SF).collect()}
    for r in rows.values():
        assert 0 <= r["n_kept"] <= r["n_total"]
        if r["rate"] == 1.0:
            assert r["n_kept"] == r["n_total"], r


def test_bootstrap_se_shape(spark):
    row = stats.stats_bootstrap_se(spark, SMOKE_SF).collect()[0]
    assert row["n_replicates"] == stats.BOOTSTRAP_REPS
    assert row["bootstrap_se"] > 0


def test_bfs_levels_frontier_is_adjacent(spark):
    rows = stats.graph_bfs_levels(spark, SMOKE_SF).collect()
    by_dist = {}
    for r in rows:
        by_dist.setdefault(r["dist"], set()).add((r["node_type"], r["node_id"]))
    assert by_dist[0] == {("S", 1)}
    edges = {
        (r["l_suppkey"], r["l_partkey"])
        for r in load_table(spark, SMOKE_SF, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    }
    seed_parts = {p for (s, p) in edges if s == 1}
    assert {n for (t, n) in by_dist.get(1, set())} == seed_parts
    # levels are disjoint (a node appears at its shortest distance only)
    seen = set()
    for d in sorted(by_dist):
        assert not (by_dist[d] & seen)
        seen |= by_dist[d]


def test_ewma_within_window_bounds(spark):
    from pwir_zadanie_4_mapreduce_spark.operators import timeseries

    rows = timeseries.timeseries_ewma(spark, SMOKE_SF).collect()
    ev = load_table(spark, SMOKE_SF, "events").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    for r in rows:
        assert ev["lo"] - 1e-9 <= r["ewma"] <= ev["hi"] + 1e-9, r


def test_cogroup_asof_merge_arrow_edge_semantics(spark, tmp_path):
    """Focused pin for the r12 applyInArrow rewrite of
    cogroup_asof_merge: the numpy-searchsorted asof pick must reproduce
    pd.merge_asof(direction="backward") exactly — at-ts clicks count
    (<=), ties on click ts resolve to the highest click_id, purchases
    with no at-or-before click (including users with ZERO clicks — the
    empty-right cogroup) emit NULLs, click-only users emit nothing."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pwir_zadanie_4_mapreduce_spark.operators.stats import cogroup_asof_merge

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: tie at ts=10 (ids 101 vs 102 -> 102 wins), later click 103
        (101, t(10), 1, "click"), (102, t(10), 1, "click"), (103, t(20), 1, "click"),
        (201, t(10), 1, "purchase"),   # at-ts tie counts -> 102
        (202, t(15), 1, "purchase"),   # backward -> 102 @10
        (203, t(25), 1, "purchase"),   # -> 103 @20
        # user 2: only a LATER click -> NULL
        (104, t(9), 2, "click"), (204, t(5), 2, "purchase"),
        # user 3: clicks only -> no output row
        (105, t(1), 3, "click"),
        # user 4: purchases only (empty right cogroup side) -> NULL
        (205, t(7), 4, "purchase"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    got = {
        r["purchase_id"]: (
            r["last_click_id"],
            None if r["last_click_ts"] is None else r["last_click_ts"].second,
        )
        for r in cogroup_asof_merge(spark, str(tmp_path)).collect()
    }
    assert got == {
        201: (102, 10),
        202: (102, 10),
        203: (103, 20),
        204: (None, None),
        205: (None, None),
    }
