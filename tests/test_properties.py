"""Property-based spot checks (SURVEY.md §5.2 item 4) — hypothesis
generates small literal tables; properties must hold for any input,
not just the TPC-H-ish fixtures.

Strategies are bounded (≤24 rows) so each example is a fast local
job; deadline disabled because Spark job latency is environmental,
not a correctness signal.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=24,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(k), float(v)) for k, v in rows], "k int, v double"
    )


@given(rows=_vals)
@_settings
def test_union_all_count_additivity(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=_vals)
@_settings
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates()
    assert once.dropDuplicates().count() == once.count()


@given(rows=_vals, k=st.integers(min_value=0, max_value=5))
@_settings
def test_topk_is_sort_prefix(spark, rows, k):
    df = _df(spark, rows)
    topk = [r["v"] for r in df.orderBy(F.desc("v"), "k").limit(k).collect()]
    full = [r["v"] for r in df.orderBy(F.desc("v"), "k").collect()]
    assert topk == full[:k]


@given(rows=_vals)
@_settings
def test_groupby_sum_partition_invariant(spark, rows):
    """Partial+final aggregation must not depend on partitioning —
    the distributed-correctness property behind every groupBy."""
    df = _df(spark, rows)
    a = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    b = {
        r["k"]: r["n"]
        for r in df.repartition(7).groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert a == b


@given(rows=_vals)
@_settings
def test_filter_complement_partitions_rows(spark, rows):
    df = _df(spark, rows)
    pred = F.col("v") > 0
    assert df.filter(pred).count() + df.filter(~pred).count() == df.count()
