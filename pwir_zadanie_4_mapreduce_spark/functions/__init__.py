"""Reusable column-level functions (all JVM-side Catalyst expressions).

These are the engine's scalar-function layer: built from
`pyspark.sql.functions` so they stay inside whole-stage codegen — no
Python in the hot path.
"""

from pwir_zadanie_4_mapreduce_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)
from pwir_zadanie_4_mapreduce_spark.functions.textfn import (  # noqa: F401
    char_ngrams,
    tokenize,
    word_shingles,
)
