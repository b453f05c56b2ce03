"""Vector math over `array<float|double>` columns — pure Catalyst
higher-order functions (zip_with / aggregate), no UDFs, so the dot
products run inside codegen and vectorize at scale.

All intermediates are cast to double: the embeddings fixture stores
float32, and summation must be double for cross-engine parity with
the DuckDB oracle (which also sums doubles left-to-right).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def l2_normalize(a: Column) -> Column:
    """Return the array scaled to unit L2 norm (nulls/zeros untouched)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
