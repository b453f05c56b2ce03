"""Cross-engine deterministic rounding.

Spark's ROUND on doubles converts to exact BigDecimal then HALF_UP;
DuckDB's ROUND on doubles is ``std::round(x * 10^d) / 10^d`` (half
away from zero *after* the double multiply). The two disagree on
doubles whose scaled value rounds to an exact .5 (e.g.
round(55473.069749999995, 4): Spark → .0697, DuckDB → .0698).

Every oracle-compared rounded column therefore uses ``dround``, which
reproduces DuckDB's semantics exactly: sign · floor(|x|·10^d + 0.5) /
10^d, computed in double like DuckDB does. floor() returns BIGINT in
Spark, so this is valid for |x| < 2^63 / 10^d — comfortably covering
the engine's numeric ranges; NaN and NULL propagate unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(c: Column, d: int = 4) -> Column:
    """DuckDB-equivalent double rounding to ``d`` decimal places."""
    m = float(10**d)
    magnitude = F.floor(F.abs(c) * m + 0.5).cast("double") / m
    return F.signum(c) * magnitude
