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


def _assert_multibatch():
    """The stateful family reads the fixture as STATEFUL_N_BATCHES
    ts-ordered files (one per trigger): the just-finished query must
    have crossed at least that many micro-batches (batch_id is
    0-indexed; event-time jobs may add a trailing no-data batch)."""
    from pwir_zadanie_4_mapreduce_spark.streaming import jobs

    assert (
        jobs.LAST_PROGRESS.get("batch_id", -1) >= jobs.STATEFUL_N_BATCHES - 1
    ), jobs.LAST_PROGRESS


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
    _assert_multibatch()
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
    join: the 3 slices are ts-contiguous and the 1 h watermark delay
    exceeds the 30 min join window, so a click near a slice boundary
    still meets its purchase from the next micro-batch before state
    eviction — no pairs are lost to batching."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming import run_stream_stream_join
    from pyspark.sql import functions as F2

    stream = run_stream_stream_join(spark, SMOKE_SF)
    _assert_multibatch()
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
    _assert_multibatch()
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
    _assert_multibatch()
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
    _assert_multibatch()
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
    _assert_multibatch()
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


def _replay_inactivity_timers(slices, input_first=True):
    """Driver-side replay of the inactivity-timeout micro-batch
    semantics over pre-sliced (user, ts_us) batches: per batch, the
    watermark is max event time through the PREVIOUS batch minus the
    delay; input rows accumulate state and re-arm (one timer per key at
    last_ts + GAP); armed timers with expiry <= the batch watermark
    fire; a trailing no-data batch fires the rest. input_first selects
    whether input processing precedes timer expiry within a batch
    (Spark's actual order — validated by the test's discrimination
    assert)."""
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        TIMEOUT_GAP_MIN,
        TIMEOUT_WM_DELAY_MIN,
    )

    gap_ms = TIMEOUT_GAP_MIN * 60 * 1000
    delay_ms = TIMEOUT_WM_DELAY_MIN * 60 * 1000
    state, timers, emitted = {}, {}, []
    wm_ms, max_us = 0, 0

    def fire():
        for u in sorted(list(timers)):
            if timers[u] <= wm_ms:
                exp = timers.pop(u)
                last, cnt = state[u]
                if exp == last // 1000 + gap_ms:  # mirrors the stale check
                    emitted.append((u, last, cnt))

    for k in range(len(slices) + 1):  # + the trailing no-data batch
        batch = slices[k] if k < len(slices) else []
        if not input_first:
            fire()
        by_user = {}
        for u, ts in batch:
            by_user.setdefault(u, []).append(ts)
        for u, tss in by_user.items():
            last, cnt = state.get(u, (0, 0))
            state[u] = (max([last] + tss), cnt + len(tss))
            timers[u] = state[u][0] // 1000 + gap_ms
        if input_first:
            fire()
        for _, ts in batch:
            max_us = max(max_us, ts)
        if batch:
            wm_ms = max(wm_ms, max_us // 1000 - delay_ms)
    return emitted


def _write_batch_files(spark, tmp_path, batches, schema_cols):
    """Materialize hand-crafted micro-batches as mtime-ordered parquet
    files in a fresh source dir (the deterministic replay device)."""
    import os

    from pyspark.sql import functions as F

    d = str(tmp_path / "src")
    os.makedirs(d)
    for i, rows in enumerate(batches, 1):
        df = (
            spark.createDataFrame(rows, schema_cols)
            .select("*", F.timestamp_seconds("ts_s").alias("ts"))
            .drop("ts_s")
            .coalesce(1)
        )
        pdir = str(tmp_path / f"b{i}")
        df.write.mode("overwrite").parquet(pdir)
        src = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
        os.rename(os.path.join(pdir, src), os.path.join(d, f"{i:02d}.parquet"))
        os.utime(os.path.join(d, f"{i:02d}.parquet"), (1000000 + i, 1000000 + i))
    schema = spark.read.parquet(os.path.join(d, "01.parquet")).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
    )


def test_timer_midstream_close_and_rearm(spark, tmp_path):
    """A crafted source where user 1 goes quiet mid-stream and RETURNS:
    their session must close TWICE — once mid-stream (batch 2's
    watermark passes their batch-1 timer while they are absent, n=1)
    and once at the final no-data batch after re-arming (n=2) — the
    multi-close semantics the dense fixture never produces (every user
    is active in every slice). User 2 only advances the watermark and
    never goes inactive long enough before the final watermark."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        _inactivity_timeout_topology,
        _run_to_memory,
        _use_rocksdb,
    )

    h = 3600
    base = 1_700_000_000
    batches = [
        [(1, base), (2, base + 2 * h)],  # X@00:00 (timer 00:30), Y@02:00
        [(2, base + 3 * h)],  # wm=01:00 >= 00:30: X closes (n=1)
        [(1, base + 4 * h), (2, base + 6 * h)],  # X re-arms (04:30)
        # final no-data batch: wm=05:00 >= 04:30: X closes again (n=2);
        # Y's timer (06:30) stays beyond the final watermark
    ]
    stream = _write_batch_files(
        spark, tmp_path, batches, "user_id long, ts_s long"
    )
    _use_rocksdb(spark)
    out = _run_to_memory(_inactivity_timeout_topology(stream), "append")
    got = sorted(
        (r["user_id"], r["last_seen_us"], r["n_events"]) for r in out.collect()
    )
    want = sorted(
        [(1, base * 1_000_000, 1), (1, (base + 4 * h) * 1_000_000, 2)]
    )
    assert got == want, (got, want)


def test_timer_inactivity_timeout_equals_batch(spark):
    """Event-time timers across the 3-slice source: the emitted
    MULTISET must equal a driver-side replay of the micro-batch
    semantics — per batch, input rows are processed first (each active
    user re-arms their timer at last_ts + GAP), THEN armed timers
    whose expiry <= that batch's watermark (derived from data through
    the PREVIOUS batch) fire; the trailing no-data micro-batch
    advances the watermark to max(ts) - delay and fires the remaining
    eligible timers. A user who goes quiet mid-stream and returns
    later therefore emits one close per inactivity epoch — real
    session-close semantics exercised across batches, not just a
    final flush (the r8 two-slice run could only ever fire at the
    end). The input-first-then-timers order was validated empirically:
    the alternative (timers before input) predicts 39 emissions at
    sf0.001 vs the 13 Spark actually produces."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        STATEFUL_N_BATCHES,
        TIMEOUT_GAP_MIN,
        TIMEOUT_WM_DELAY_MIN,
        run_timer_inactivity_timeout,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = sorted(
        (r["user_id"], r["last_seen_us"], r["n_events"])
        for r in run_timer_inactivity_timeout(spark, SMOKE_SF).collect()
    )
    _assert_multibatch()

    # deterministic replay over the same ntile ts slices the split
    # source materializes
    n = STATEFUL_N_BATCHES
    rows = (
        load_table(spark, SMOKE_SF, "events")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id")
        .withColumn("slice", F.ntile(n).over(Window.orderBy("ts_us", "event_id")))
        .collect()
    )
    slices = [[] for _ in range(n)]
    for r in rows:
        slices[r["slice"] - 1].append((r["user_id"], r["ts_us"]))
    want = _replay_inactivity_timers(slices, input_first=True)
    assert got == sorted(want), (got, sorted(want))
    # order discrimination: the replay is only evidence if the batching
    # structure matters — under the WRONG processing order (timers
    # before input, so an active user's stale timer fires mid-stream
    # with a partial count) the prediction must diverge (measured: 39
    # emissions vs the 13 Spark produces at sf0.001)
    wrong = _replay_inactivity_timers(slices, input_first=False)
    assert sorted(wrong) != sorted(want)


def test_stream_dedup_eviction_readmits(spark, tmp_path):
    """dropDuplicatesWithinWatermark EVICTION pinned deterministically:
    a hand-built source where each key appears at most once per batch,
    so the stored first-arrival ts is never racy (over the fixture it
    is — see STREAM_DEDUP_WM). Batch 2 repeats A within the delay:
    suppressed by CROSS-BATCH state. A then SKIPS batch 3 — state
    eviction happens at batch end, so the key must be absent from the
    batch whose watermark passes its expiry — and returns hours later
    in batch 4: RE-ADMITTED (emitted a second time). W1..W4 are
    distinct watermark-driver keys, each emitted once."""
    import os

    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        _run_to_memory,
        _use_rocksdb,
    )
    from pyspark.sql import functions as F

    h = 3600
    base = 1_700_000_000
    batches = [
        [("A", base), ("W1", base + 60)],
        [("A", base + 30 * 60), ("W2", base + 4 * h)],  # A dup: dropped
        [("W3", base + 8 * h)],  # wm=3h past A's expiry (~1.5h): A evicted
        [("A", base + 10 * h), ("W4", base + 11 * h)],  # A re-admitted
    ]
    d = str(tmp_path / "src")
    os.makedirs(d)
    for i, rows in enumerate(batches, 1):
        df = (
            spark.createDataFrame(rows, "k string, ts_s long")
            .select("k", F.timestamp_seconds("ts_s").alias("ts"))
            .coalesce(1)
        )
        pdir = str(tmp_path / f"b{i}")
        df.write.mode("overwrite").parquet(pdir)
        src = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
        os.rename(os.path.join(pdir, src), os.path.join(d, f"{i:02d}.parquet"))
        os.utime(os.path.join(d, f"{i:02d}.parquet"), (1000000 + i, 1000000 + i))
    schema = spark.read.parquet(os.path.join(d, "01.parquet")).schema
    _use_rocksdb(spark)
    deduped = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k", F.unix_seconds("ts").alias("ts_s"))
    )
    got = sorted((r["k"], r["ts_s"]) for r in _run_to_memory(deduped, "append").collect())
    want = sorted(
        [
            ("A", base),
            ("W1", base + 60),
            ("W2", base + 4 * h),
            ("W3", base + 8 * h),
            ("A", base + 10 * h),
            ("W4", base + 11 * h),
        ]
    )
    assert got == want, (got, want)


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


def test_tws_restart_from_checkpoint(spark, tmp_path):
    """transformWithState stop + restart: typed ValueState must be
    restored from the RocksDB checkpoint by a brand-new query object
    (final totals equal the full batch aggregate), and committed
    offsets must be honored — phase 2 reads ONLY the third slice
    (pinned against the actual slice-3 row count; a from-scratch
    replay would read all three files)."""
    import os

    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming import jobs
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        STATEFUL_N_BATCHES,
        _split_dir_path,
        run_restartable_tws_totals,
    )
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in run_restartable_tws_totals(
            spark, SMOKE_SF, str(tmp_path / "tws_restart")
        ).collect()
    }
    slice3 = spark.read.parquet(
        os.path.join(
            _split_dir_path(SMOKE_SF, STATEFUL_N_BATCHES),
            f"{STATEFUL_N_BATCHES:02d}.parquet",
        )
    ).count()
    assert jobs.LAST_PROGRESS["phase2_rows"] == slice3, (
        jobs.LAST_PROGRESS,
        slice3,
    )
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


def test_tws_crash_restart_kill9(spark, tmp_path):
    """kill -9 chaos restart (round-9 verdict #8): phase 1 runs in a
    separate process that is SIGKILLed right after the first
    micro-batch commit — no graceful stop, whatever batch is in flight
    dies. A brand-new query on the same checkpoint must recover typed
    RocksDB state AND committed offsets: final totals equal the full
    batch aggregate, slice 1 is never reprocessed (phase-2 input rows
    are bounded by the uncommitted slices), and any replayed in-flight
    batch is absorbed by the idempotent monotone-max sink."""
    import os

    import pytest

    pytest.importorskip("google.protobuf")
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.streaming import jobs
    from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (
        STATEFUL_N_BATCHES,
        _split_dir_path,
        run_crash_restart_tws_totals,
    )
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in run_crash_restart_tws_totals(
            spark, SMOKE_SF, str(tmp_path / "tws_crash")
        ).collect()
    }
    split_dir = _split_dir_path(SMOKE_SF, STATEFUL_N_BATCHES)
    sizes = {
        i: spark.read.parquet(os.path.join(split_dir, f"{i:02d}.parquet")).count()
        for i in range(1, STATEFUL_N_BATCHES + 1)
    }
    lp = jobs.LAST_PROGRESS
    assert lp["first_commit_seen"], lp  # the kill landed AFTER a commit
    # offsets recovered: slice 1 (committed before the kill) is never
    # re-read; the uncommitted tail (anything after the last commit at
    # kill time) replays — at-least-once within the idempotent sink
    total = sum(sizes.values())
    # k committed batches = SOME k of the phase-1 slices (batch→file
    # order follows mtime which ties across the copies, so which slice
    # went first is not pinned); everything else replays in phase 2
    from itertools import combinations

    phase1 = [sizes[i] for i in range(1, STATEFUL_N_BATCHES)]
    valid = {
        total - sum(combo)
        for k in range(lp["commits_at_kill"], lp["commits_after_kill"] + 1)
        for combo in combinations(phase1, k)
    }
    assert lp["phase2_rows"] in valid, (lp, sizes, valid)
    assert lp["phase2_rows"] < total, lp  # the pre-kill commit survived
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


def test_state_source_inspect_matches_batch(spark, tmp_path):
    """Spark 4 state data source: the per-user totals decoded from the
    CHECKPOINT's RocksDB state (no sink, no replay) must equal the
    batch aggregate, and the state-metadata listing must name the agg
    operator with the full batch range."""
    from pwir_zadanie_4_mapreduce_spark.catalog import load_table
    from pwir_zadanie_4_mapreduce_spark.functions.rounding import dround
    from pwir_zadanie_4_mapreduce_spark.streaming import (
        run_state_source_inspect,
    )
    from pwir_zadanie_4_mapreduce_spark.streaming import jobs
    from pyspark.sql import functions as F

    totals, meta = run_state_source_inspect(spark, SMOKE_SF, str(tmp_path))
    batch = (
        load_table(spark, SMOKE_SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            dround(F.sum("value"), 4).alias("total_value"),
        )
    )
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(totals, cols) == _rows(batch, cols)
    _assert_multibatch()
    m = {r["operatorName"]: r for r in meta.collect()}
    assert "stateStoreSave" in m, m
    row = m["stateStoreSave"]
    assert row["minBatchId"] == 0
    assert row["maxBatchId"] >= jobs.STATEFUL_N_BATCHES - 1


def test_stream_ann_assign_equals_batch(spark):
    """Streaming index ingest must agree with the batch assignment:
    per-centroid arrival counts and integer-grid cosine sums over the
    3 vec_id-ordered micro-batches == one batch pass with the same
    frozen codebook. Also asserts the run really crossed micro-batches
    (cross-batch streaming agg state, not one big batch)."""
    from pyspark.sql import functions as F2

    from pwir_zadanie_4_mapreduce_spark.operators.similarity import (
        _assign_book_lit,
        _fold_dot,
        _prepped,
        _seed_centroids,
        _sql_double,
        _sql_fold_dot,
    )
    from pwir_zadanie_4_mapreduce_spark.streaming import jobs

    stream = jobs.run_stream_ann_assign(spark, SMOKE_SF)
    assert jobs.LAST_PROGRESS.get("batch_id", 0) >= jobs.STATEFUL_N_BATCHES - 1

    import math

    e = _prepped(spark, SMOKE_SF)
    book = {r["centroid_id"]: list(r["cv"]) for r in _seed_centroids(e).collect()}
    cases = " ".join(
        f"WHEN centroid_id = {cid} THEN "
        f"FLOOR(({_sql_fold_dot('v', book[cid])} / "
        f"(nrm * {_sql_double(math.sqrt(_fold_dot(book[cid], book[cid])))})) "
        f"* {jobs.ANN_STREAM_QUANT!r})"
        for cid in sorted(book)
    )
    batch = (
        _assign_book_lit(e, book)
        .withColumn("qcos", F2.expr(f"CASE {cases} END"))
        .groupBy("centroid_id")
        .agg(
            F2.count("*").alias("n_arrivals"),
            F2.sum("qcos").cast("long").alias("sum_qcos_1e9"),
        )
    )
    cols = ["centroid_id", "n_arrivals", "sum_qcos_1e9"]
    assert _rows(stream, cols) == _rows(batch, cols)
