"""Streaming ≡ batch: the structured-streaming jobs must produce the
same results as their batch counterparts on the static fixture."""

from __future__ import annotations

from pwir_zadanie_4_mapreduce_spark.operators.relational import (
    events_sliding_1h_30m,
    events_tumbling_hourly,
)
from pwir_zadanie_4_mapreduce_spark.streaming import (
    run_sessionization_stream,
    run_sliding_stream,
    run_tumbling_stream,
)
from tests.conftest import SMOKE_SF


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    batch = events_tumbling_hourly(spark, SMOKE_SF)
    stream = run_tumbling_stream(spark, SMOKE_SF)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_sliding_stream_equals_batch(spark):
    batch = events_sliding_1h_30m(spark, SMOKE_SF)
    stream = run_sliding_stream(spark, SMOKE_SF)
    cols = ["window_start", "n_events"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_stateful_user_totals_equals_batch(spark):
    """applyInPandasWithState running totals must converge to the
    batch per-user aggregate."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming import run_stateful_user_totals
    from pyspark.sql import functions as F2

    stream = run_stateful_user_totals(spark, SMOKE_SF)
    batch = (
        load_table(spark, SMOKE_SF, "events")
        .groupBy("user_id")
        .agg(
            F2.count("*").alias("n_events"),
            F2.round(F2.sum("value"), 4).alias("total_value"),
        )
    )
    cols = ["user_id", "n_events", "total_value"]
    srows = _rows(stream, cols)
    brows = _rows(batch, cols)
    assert len(srows) == len(brows)
    for s, b in zip(srows, brows):
        assert s[0] == b[0] and s[1] == b[1]
        assert abs(s[2] - b[2]) < 1e-6, (s, b)


def test_stream_static_join_equals_batch(spark):
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
    from pwir_zadanie_4_mapreduce_spark.streaming import run_stream_static_join
    from pyspark.sql import functions as F2

    stream = run_stream_static_join(spark, SMOKE_SF)
    ev = load_table(spark, SMOKE_SF, "events")
    cust = load_table(spark, SMOKE_SF, "customer").select(
        F2.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        ev.join(cust, "user_id")
        .groupBy("c_mktsegment")
        .agg(F2.count("*").alias("n_events"), dround(F2.sum("value"), 4).alias("total_value"))
    )
    cols = ["c_mktsegment", "n_events", "total_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream interval join must match the equivalent batch
    join (the fixture fits one micro-batch, so no pairs are lost to
    watermark eviction)."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming import run_stream_stream_join
    from pyspark.sql import functions as F2

    stream = run_stream_stream_join(spark, SMOKE_SF)
    ev = load_table(spark, SMOKE_SF, "events")
    clicks = ev.filter(F2.col("event_type") == "click").select(
        "user_id", F2.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F2.col("event_type") == "purchase").select(
        F2.col("user_id").alias("p_user"), F2.col("ts").alias("purchase_ts")
    )
    batch = (
        clicks.join(
            purchases,
            (F2.col("user_id") == F2.col("p_user"))
            & (F2.col("purchase_ts") >= F2.col("click_ts"))
            & (F2.col("purchase_ts") <= F2.col("click_ts") + F2.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F2.count("*").alias("n_pairs"))
    )
    cols = ["user_id", "n_pairs"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_foreach_batch_sink_idempotent(spark, tmp_path):
    """foreachBatch parquet sink: readback equals the source table, and
    a checkpointed re-run adds nothing (offsets committed) — the
    exactly-once contract."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming import run_foreach_batch_sink

    out = str(tmp_path / "sink")
    got = run_foreach_batch_sink(spark, SMOKE_SF, out)
    src = load_table(spark, SMOKE_SF, "events")
    assert got.count() == src.count()
    assert sorted(r["event_id"] for r in got.select("event_id").collect()) == sorted(
        r["event_id"] for r in src.select("event_id").collect()
    )
    again = run_foreach_batch_sink(spark, SMOKE_SF, out)
    assert again.count() == src.count()


def test_hourly_rollup_sink_equals_batch(spark, tmp_path):
    """The continuous hourly rollup must equal the batch hourly agg,
    and a checkpointed re-run must change nothing (idempotent
    partition overwrites, offsets committed)."""
    from pwir_zadanie_4_mapreduce_spark.operators.relational import (
        events_tumbling_hourly,
    )
    from pwir_zadanie_4_mapreduce_spark.streaming import run_hourly_rollup_sink

    out = str(tmp_path / "rollup_out")
    got = run_hourly_rollup_sink(spark, SMOKE_SF, out)
    batch = events_tumbling_hourly(spark, SMOKE_SF)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(batch, cols)
    again = run_hourly_rollup_sink(spark, SMOKE_SF, out)
    assert _rows(again, cols) == _rows(batch, cols)


def test_rate_source_demo_deterministic(spark):
    """One bounded rate-micro-batch: 100 values over 1-second windows,
    each second carrying its arithmetic-series sum."""
    from pwir_zadanie_4_mapreduce_spark.streaming import run_rate_source_demo

    rows = {r["second"]: (r["n"], r["value_sum"]) for r in run_rate_source_demo(spark).collect()}
    assert sum(n for n, _ in rows.values()) == 100
    assert sum(s for _, s in rows.values()) == sum(range(100))


def test_session_stream_total_events(spark):
    """session_window totals must cover every event exactly once."""
    stream = run_sessionization_stream(spark, SMOKE_SF)
    total = sum(r["n_events"] for r in stream.collect())
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table

    assert total == load_table(spark, SMOKE_SF, "events").count()


def test_stream_dedup_equals_batch_distinct(spark):
    """Streaming dropDuplicatesWithinWatermark over the static fixture
    must keep exactly one row per (user_id, event_type) — the same key
    set batch DISTINCT produces."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import run_stream_dedup

    out = run_stream_dedup(spark, SMOKE_SF)
    got = sorted((r["user_id"], r["event_type"]) for r in out.collect())
    batch = (
        load_table(spark, SMOKE_SF, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    want = sorted((r["user_id"], r["event_type"]) for r in batch.collect())
    assert got == want


def test_transform_with_state_equals_batch(spark):
    """transformWithStateInPandas per-user stats must equal the batch
    aggregation over the same fixture. Skips where google.protobuf is
    unavailable (the state protocol requires it; this container ships
    without it)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import run_transform_with_state
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["min_value"], r["max_value"], r["sum_value"])
        for r in run_transform_with_state(spark, SMOKE_SF).collect()
    }
    batch = (
        load_table(spark, SMOKE_SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("mn"),
            F.round(F.max("value"), 4).alias("mx"),
            F.round(F.sum("value"), 4).alias("sm"),
        )
    )
    want = {r["user_id"]: (r["n"], r["mn"], r["mx"], r["sm"]) for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g[0] == w[0] and abs(g[1] - w[1]) < 1e-9 and abs(g[2] - w[2]) < 1e-9, (k, g, w)
        assert abs(g[3] - w[3]) < 1e-6, (k, g, w)


def test_liststate_recent_events_equals_batch(spark):
    """ListState bounded-history job must equal the batch top-N-per-user
    window (N most recent by ts, ties to higher event_id)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        RECENT_N,
        run_liststate_recent_events,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_recent"], r["latest_event_id"], r["recent_sum"])
        for r in run_liststate_recent_events(spark, SMOKE_SF).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    batch = (
        load_table(spark, SMOKE_SF, "events")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RECENT_N)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max(F.struct(F.col("rk") == 1, "event_id")).getField("event_id").alias("latest"),
            F.round(F.sum("value"), 4).alias("s"),
        )
    )
    want = {r["user_id"]: (r["n"], r["latest"], r["s"]) for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert got[k][1] == want[k][1], (k, got[k], want[k])
        assert abs(got[k][2] - want[k][2]) < 1e-6, (k, got[k], want[k])


def test_mapstate_type_breakdown_equals_batch(spark):
    """MapState per-(user, event_type) breakdown must equal the batch
    groupBy over both keys."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import run_mapstate_type_breakdown
    from pyspark.sql import functions as F

    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_mapstate_type_breakdown(spark, SMOKE_SF).collect()
    }
    batch = (
        load_table(spark, SMOKE_SF, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
    )
    want = {(r["user_id"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])


def test_timer_inactivity_timeout_equals_batch(spark):
    """Event-time timers: a user's timeout row fires iff their armed
    expiry (max_ts + GAP) is <= the final watermark (global max ts −
    delay), with their full event count — the batch mirror of the
    inactivity-timeout semantics."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        TIMEOUT_GAP_MIN,
        TIMEOUT_WM_DELAY_MIN,
        run_timer_inactivity_timeout,
    )
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["last_seen_us"], r["n_events"])
        for r in run_timer_inactivity_timeout(spark, SMOKE_SF).collect()
    }
    ev = load_table(spark, SMOKE_SF, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    max_all = ev.agg(F.max("ts_us")).first()[0]
    final_wm_ms = max_all // 1000 - TIMEOUT_WM_DELAY_MIN * 60 * 1000
    per_user = ev.groupBy("user_id").agg(
        F.max("ts_us").alias("last_us"), F.count("*").alias("n")
    )
    want = {
        r["user_id"]: (r["last_us"], r["n"])
        for r in per_user.collect()
        if r["last_us"] // 1000 + TIMEOUT_GAP_MIN * 60 * 1000 <= final_wm_ms
    }
    assert got == want, (
        sorted(set(want) - set(got)),
        sorted(set(got) - set(want)),
    )


def test_initialstate_totals_equal_full_batch(spark):
    """InitialState bootstrap: users active in the streamed slice must
    report totals equal to the FULL batch aggregate (snapshot slice +
    streamed slice) — proving the warehouse bootstrap actually seeded
    the state rather than starting from zero."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import run_initialstate_user_totals
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in run_initialstate_user_totals(spark, SMOKE_SF).collect()
    }
    assert got, "no users active in the streamed slice at this sf"
    full = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, SMOKE_SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    for k, (n, s) in got.items():
        assert n == full[k][0], (k, got[k], full[k])
        assert abs(s - full[k][1]) < 1e-6, (k, got[k], full[k])


def test_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """Stop + restart recovery: phase 1 streams slice 1 and stops;
    phase 2 is a NEW query on the same checkpoint seeing slice 2.
    Final totals must equal the FULL batch aggregate — state was
    recovered (not reset) and slice 1 was not reprocessed."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import run_restartable_user_totals
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in run_restartable_user_totals(
            spark, SMOKE_SF, str(tmp_path / "restart")
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, SMOKE_SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])


def test_python_stream_source_equals_closed_form(spark):
    """The Python streaming data source must deliver exactly `total`
    deterministic rows across micro-batches — per-residue counts and
    sums equal the closed-form computation."""
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import run_python_stream_source

    rows = run_python_stream_source(spark, rows_per_batch=128, total=1000).collect()
    got = {r["residue"]: (r["n"], r["sum_value"]) for r in rows}
    want = {}
    for t in range(1000):
        r = t % 7
        n, s = want.get(r, (0, 0.0))
        want[r] = (n + 1, s + ((t * 31) % 97) / 10.0)
    assert got == {r: (n, round(s, 4)) for r, (n, s) in want.items()}
