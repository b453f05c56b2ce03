"""Structured Streaming variants of the event-time operators.

The batch queries in operators/relational.py (events_tumbling_hourly,
events_sliding_1h_30m, events_sessionization) have identical semantics
on a static table; these jobs run the same logic through readStream →
writeStream so the engine demonstrably supports the streaming
execution mode (watermarks, windowed state, session windows).
"""

from pwir_zadanie_4_mapreduce_spark.streaming.jobs import (  # noqa: F401
    run_foreach_batch_sink,
    run_hourly_rollup_sink,
    run_rate_source_demo,
    run_sessionization_stream,
    run_sliding_stream,
    run_state_source_inspect,
    run_stream_ann_assign,
    run_stateful_user_totals,
    run_stream_static_join,
    run_stream_stream_join,
    run_tumbling_stream,
)
