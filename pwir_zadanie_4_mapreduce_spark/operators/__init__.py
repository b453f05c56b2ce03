"""Operator suite. Importing this package registers every query.

Each operator module registers `(name -> (spark, sf_dir) -> DataFrame)`
pairs plus (where SQL-expressible) the equivalent DuckDB oracle SQL in
``registry``. The driver consumes both via ``__spark_entry__``.
"""

from pwir_zadanie_4_mapreduce_spark.operators import (  # noqa: F401
    advanced,
    analytics,
    binned,
    dedup,
    multimodal,
    relational,
    sampling,
    sourcesink,
    similarity,
    stats,
    text,
    timeseries,
    tpch,
)
from pwir_zadanie_4_mapreduce_spark.operators.registry import ORACLES, QUERIES  # noqa: F401
