"""Plan inspection helpers — the engine's `.explain` feedback loop.

Used by tests to assert physical properties that matter at 100 TB:
filters reached the parquet scan, dims broadcast, codegen fused.
"""

from pwir_zadanie_4_mapreduce_spark.plans.inspect import (  # noqa: F401
    broadcast_build_outputs,
    explain_str,
    has_broadcast_join,
    has_codegen,
    has_pushed_filters,
    read_schema_columns,
)
from pwir_zadanie_4_mapreduce_spark.plans.metrics import (  # noqa: F401
    executed_nodes,
    per_exchange_records,
    scan_output_rows,
    shuffle_stats,
)
