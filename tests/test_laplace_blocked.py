"""Golden-output tests for the temporal-blocked solver
(`laplace_blocked.solve_blocked`).

Same oracle as test_laplace.py — the compiled reference binary's exact
iteration counts / grids — plus cross-solver bit-equality: the blocked
plan must be indistinguishable from the per-sweep plan, which is itself
byte-exact against `laplace-seq.exe`.

The block/chunk knobs are deliberately exercised off the defaults
(forced multi-block, tiny chunks, mid-chunk convergence) because at
test N the sizing heuristic would otherwise collapse to one block.
"""

from __future__ import annotations

import math

import pytest

from pwir_zadanie_4_mapreduce_spark import laplace
from pwir_zadanie_4_mapreduce_spark.laplace_blocked import solve_blocked

from tests.test_laplace import GOLDEN_N4, GOLDEN_N8_DIFF, GOLDEN_N8_ITERS, GOLDEN_N8_ROW1


def test_n_below_2_rejected(spark):
    with pytest.raises(ValueError):
        solve_blocked(spark, 1)


def test_n2_no_interior_cells(spark):
    r = solve_blocked(spark, 2)
    assert r.num_iterations == 1
    assert r.final_diff == 0.0


def test_n4_exact_golden_grid_multiblock(spark):
    # 2 blocks of 2 rows, chunks of 4 sweeps: convergence at iteration
    # 15 lands mid-chunk (15 = 3*4 + 3), covering the recompute path
    r = solve_blocked(spark, 4, num_blocks=2, sweeps_per_job=4)
    assert r.num_iterations == 15
    assert laplace.format_grid(r, 4) == GOLDEN_N4


def test_n4_exact_golden_grid_chunk_boundary(spark):
    # sweeps_per_job=5: 15 = 3*5 exactly — convergence on the last
    # sweep of a chunk (the no-recompute branch)
    r = solve_blocked(spark, 4, num_blocks=1, sweeps_per_job=5)
    assert r.num_iterations == 15
    assert laplace.format_grid(r, 4) == GOLDEN_N4


def test_n8_iterations_and_grid(spark):
    # 3 blocks → ragged last block (8 rows into blocks of 3+3+2),
    # halo (2k=8) wider than a block — the all-to-all degenerate case
    r = solve_blocked(spark, 8, num_blocks=3, sweeps_per_job=4)
    assert r.num_iterations == GOLDEN_N8_ITERS
    assert abs(r.final_diff - GOLDEN_N8_DIFF) < 1e-9
    rows = r.grid.orderBy("i", "j").collect()
    row1 = [rows[1 * 8 + j]["v"] for j in range(8)]
    for got, want in zip(row1, GOLDEN_N8_ROW1):
        assert math.isclose(got, want, abs_tol=1e-9)


def test_n8_bit_identical_to_per_sweep_solver(spark):
    blocked = solve_blocked(spark, 8, num_blocks=2, sweeps_per_job=8)
    per_sweep = laplace.solve(spark, 8)
    assert blocked.num_iterations == per_sweep.num_iterations
    assert laplace.format_grid(blocked, 8) == laplace.format_grid(per_sweep, 8)


def test_odd_n_bit_identical_to_per_sweep_solver(spark):
    """Odd n exercises the strided fallback path of the sweep kernel
    (the dense-plane fast path requires even n); capped iterations
    keep the per-sweep reference cheap while still comparing grids
    byte-for-byte after multiple chunks."""
    n = 9
    blocked = solve_blocked(spark, n, num_blocks=2, sweeps_per_job=3, max_iterations=6)
    per_sweep = laplace.solve(spark, n, max_iterations=6)
    assert blocked.num_iterations == per_sweep.num_iterations == 6
    assert laplace.format_grid(blocked, n) == laplace.format_grid(per_sweep, n)


def test_n16_stats_default_sizing(spark):
    # defaults (heuristic block count, k=32): 132 iterations, diff
    # 0.0000056832 — the BASELINE.md row, fast enough here because the
    # blocked solver is ~50× cheaper per iteration than per-sweep
    r = solve_blocked(spark, 16)
    assert r.num_iterations == 132
    assert abs(r.final_diff - 0.0000056832) < 1e-9


def test_blocked_storage_stays_bounded(spark):
    """Round-4 advice: the chunk loop must release the previous
    chunk's localCheckpoint — small k at N=16 runs many chunks, each
    materializing a grid; only the final one may remain persisted."""
    before = laplace._persisted_rdd_ids(spark.sparkContext)
    r = solve_blocked(spark, 16, sweeps_per_job=8)
    after = laplace._persisted_rdd_ids(spark.sparkContext)
    leaked = after - before
    assert len(leaked) <= 2, f"chunk checkpoints leaked: {sorted(leaked)}"
    assert r.num_iterations == 132


def test_max_iterations_cap(spark):
    r = solve_blocked(spark, 16, sweeps_per_job=8, max_iterations=20)
    assert r.num_iterations == 20
    assert r.final_diff > r.epsilon


def test_chunking_invariance_bit_exact(spark):
    """The chunk size and block count are pure execution knobs: any
    (num_blocks, sweeps_per_job) combination must produce bit-identical
    grids and identical iteration counts — this sweeps the mid-chunk
    convergence recompute, the chunk-boundary branch, k=1 (degenerate
    one-sweep chunks), and halo-wider-than-block placements in one
    invariant."""
    n = 12
    base = solve_blocked(spark, n, num_blocks=1, sweeps_per_job=64)
    base_grid = laplace.format_grid(base, n)
    for nb, k in [(1, 1), (3, 5), (4, 7), (2, 64)]:
        r = solve_blocked(spark, n, num_blocks=nb, sweeps_per_job=k)
        assert r.num_iterations == base.num_iterations, (nb, k)
        assert laplace.format_grid(r, n) == base_grid, (nb, k)
