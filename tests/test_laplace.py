"""Golden-output tests for the reference capability (FIXTURES.md §2).

The oracle is the compiled reference binary itself: exact iteration
counts and per-cell agreement with `laplace-seq.exe --verbose N`.
"""

from __future__ import annotations

import math
import os

import pytest

from pwir_zadanie_4_mapreduce_spark import laplace

GOLDEN_N4 = """4.5600000000 4.5600000000 4.5600000000 4.5600000000
7.3200000000 6.5462491961 6.4362495359 6.8800000000
7.3200000000 7.8687495359 7.7587491961 6.8800000000
9.8500000000 9.8500000000 9.8500000000 9.8500000000
"""

GOLDEN_N8_ITERS = 47
GOLDEN_N8_DIFF = 0.0000030808
GOLDEN_N8_ROW1 = [
    7.32,
    6.0508443009,
    5.6100965587,
    5.4539415829,
    5.4267729218,
    5.5180913101,
    5.8509568129,
    6.88,
]


def test_omega_epsilon_closed_forms():
    # laplace-common-impl.h:37-48 — golden values from BASELINE.md
    assert abs(laplace.get_epsilon(4) - 0.0000024142) < 1e-10
    assert abs(laplace.get_epsilon(8) - 0.0000036131) < 1e-10
    assert abs(laplace.get_epsilon(16) - 0.0000061258) < 1e-10


def test_n2_no_interior_cells(spark):
    # C loop body never executes for N=2: one sweep, diff 0
    r = laplace.solve(spark, 2)
    assert r.num_iterations == 1
    assert r.final_diff == 0.0


def test_n_below_2_rejected(spark):
    with pytest.raises(ValueError):
        laplace.solve(spark, 1)


def test_n4_exact_golden_grid(spark):
    r = laplace.solve(spark, 4)
    assert r.num_iterations == 15
    assert laplace.format_grid(r, 4) == GOLDEN_N4


def test_n8_iterations_and_grid(spark):
    r = laplace.solve(spark, 8)
    assert r.num_iterations == GOLDEN_N8_ITERS
    assert abs(r.final_diff - GOLDEN_N8_DIFF) < 1e-9
    rows = r.grid.orderBy("i", "j").collect()
    row1 = [rows[1 * 8 + j]["v"] for j in range(8)]
    for got, want in zip(row1, GOLDEN_N8_ROW1):
        assert math.isclose(got, want, abs_tol=1e-9)


_BIG = os.environ.get("PWIR_LAPLACE_BIG") == "1"


@pytest.mark.skipif(not _BIG, reason="~2 min; set PWIR_LAPLACE_BIG=1")
def test_n16_stats(spark):
    # FIXTURES.md §2: 132 iterations, final diff 0.0000056832
    r = laplace.solve(spark, 16)
    assert r.num_iterations == 132
    assert abs(r.final_diff - 0.0000056832) < 1e-9


def test_solve_storage_stays_bounded(spark):
    """Round-4 advice: each chunk's localCheckpoint must release the
    previous chunk's grid — a solve holds ONE live grid (like the
    reference's two malloc'd buffers), not one per chunk. N=16 runs
    132 iterations = 17 chunks at k=8; without the release the
    persistent-RDD registry would gain ~17 entries."""
    before = laplace._persisted_rdd_ids(spark.sparkContext)
    r = laplace.solve(spark, 16)
    after = laplace._persisted_rdd_ids(spark.sparkContext)
    leaked = after - before
    # only the final grid's checkpoint survives (the caller's result)
    assert len(leaked) <= 2, f"chunk checkpoints leaked: {sorted(leaked)}"
    assert r.num_iterations == 132  # release must not change results


@pytest.mark.skipif(not _BIG, reason="~6 min; set PWIR_LAPLACE_BIG=1")
def test_n32_stats(spark):
    # FIXTURES.md §2: 368 iterations, final diff 0.0000110032
    r = laplace.solve(spark, 32)
    assert r.num_iterations == 368
    assert abs(r.final_diff - 0.0000110032) < 1e-9
