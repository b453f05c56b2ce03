"""The reference capability: red-black SOR Laplace solver as a Spark
iterative dataflow.

Reproduces `/root/reference/laplace-seq.c` bit-faithfully:
- grid init per getInitialValue (laplace-common-impl.h:11-33),
  precedence top row > bottom row > left col > right col;
- omega = 1.6 / (1 + sqrt(1 - cos²(π/N))) (laplace-common-impl.h:37-41)
  and epsilon = 2e-6 / (2 - 1.25·omega) (:45-48), computed driver-side
  (O2) with the same libm calls;
- per sweep, two color phases (color c updates interior cells with
  (i+j) % 2 == c, from the loop bounds at laplace-seq.c:189-193); the
  second phase reads the first phase's new values — the red-black
  reordering that makes in-place Gauss–Seidel embarrassingly parallel
  (SURVEY.md §2.1 O10);
- the 5-point stencil keeps the C association order
  ((up + down) + left) + right, /4 (laplace-seq.c:196) so doubles
  match the binary exactly;
- update v' = (1-omega)·v + omega·tmp (laplace-seq.c:198);
- convergence: sweep until max |v - v'| <= epsilon over BOTH phases
  of a sweep (laplace-seq.c:184-209), one global max-reduce per sweep
  — the Spark agg is the MPI_Allreduce(MAX) of laplace-par.c:504.

Physical design (scale-first): neighbor access is NOT four joins.
Each cell of the opposite color *sends* its value to the neighbors
that will read it (filtered to interior targets), and one
groupBy(i, j) with pivoted max-aggregation reassembles
(self, up, down, left, right) — ONE shuffle per phase, whose payload
is exactly the reference's halo traffic plus the local slab
(laplace-par.c:120-129 ships the needed parity-half of boundary rows;
Spark's shuffle compression + column pruning achieve the same
minimization without custom code). The pivoted columns keep the
4-term sum in a fixed expression-tree order, so doubles stay
bit-identical regardless of row arrival order. ``localCheckpoint``
per sweep cuts lineage — the standard Spark iterative pattern.

Performance note (BASELINE.md): per-sweep job-launch overhead makes
this orders of magnitude slower than the C binary at small N; the
capability is held to the correctness bar (exact #iters, per-cell
<= 1e-9), and the architecture is what matters at N where the grid
no longer fits one machine.
"""

from __future__ import annotations

import math
import sys
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def get_omega(n: int) -> float:
    """laplace-common-impl.h:37-41 (note 1.6, not the textbook 2.0)."""
    p = math.cos(math.pi / float(n))
    return 1.6 / (1 + math.sqrt(1 - p * p))


def get_epsilon(n: int) -> float:
    """laplace-common-impl.h:45-48."""
    return 0.000002 / (2.0 - 1.25 * get_omega(n))


def make_grid(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """O1 generate source: the N×N grid with Dirichlet boundaries.

    Data is a *function*, not a file (laplace-common-impl.h:11-33);
    the when-chain preserves the C else-if precedence (corners take
    the row value).
    """
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("int").alias("i"),
            (F.col("id") % n).cast("int").alias("j"),
        )
        .withColumn(
            "v",
            F.when(F.col("i") == 0, 4.56)
            .when(F.col("i") == n - 1, 9.85)
            .when(F.col("j") == 0, 7.32)
            .when(F.col("j") == n - 1, 6.88)
            .otherwise(0.0)
            .cast("double"),
        )
    )
    if num_partitions:
        # 1-D row-block decomposition (laplace-par.c:245-251)
        df = df.repartitionByRange(num_partitions, "i")
    return df


def _color_phase(grid: DataFrame, n: int, omega: float, color: int) -> DataFrame:
    """One half-sweep over ``grid(i, j, v, diff)``.

    Returns the full grid with updated values for interior cells of
    ``color`` and ``diff`` accumulated (greatest of incoming diff and
    this phase's per-cell delta) — so a sweep is two nested calls and
    one max-agg, mirroring one MPI_Allreduce per sweep.
    """
    interior_dst = lambda di, dj: (  # noqa: E731
        (di > 0) & (di < n - 1) & (dj > 0) & (dj < n - 1)
    )
    src = grid.filter(((F.col("i") + F.col("j")) % 2) != color)

    def contrib(di_expr, dj_expr, colname: str) -> DataFrame:
        di, dj = di_expr(F.col("i")), dj_expr(F.col("j"))
        return src.filter(interior_dst(di, dj)).select(
            di.alias("i"),
            dj.alias("j"),
            F.lit(None).cast("double").alias("v"),
            F.lit(None).cast("double").alias("diff"),
            *[
                (F.col("v") if c == colname else F.lit(None).cast("double")).alias(f"n_{c}")
                for c in ("up", "down", "left", "right")
            ],
        )

    id_ = lambda c: c  # noqa: E731
    self_rows = grid.select(
        "i",
        "j",
        "v",
        "diff",
        *[F.lit(None).cast("double").alias(f"n_{c}") for c in ("up", "down", "left", "right")],
    )
    # a cell at (si, sj) is the "up" neighbor (points[i-1][j]) of
    # (si+1, sj), the "down" neighbor of (si-1, sj), "left" of
    # (si, sj+1), "right" of (si, sj-1)  — laplace-seq.c:196
    all_rows = (
        self_rows.unionByName(contrib(lambda i: i + 1, id_, "up"))
        .unionByName(contrib(lambda i: i - 1, id_, "down"))
        .unionByName(contrib(id_, lambda j: j + 1, "left"))
        .unionByName(contrib(id_, lambda j: j - 1, "right"))
    )
    g = all_rows.groupBy("i", "j").agg(
        F.max("v").alias("v"),
        F.max("diff").alias("diff"),
        *[F.max(f"n_{c}").alias(f"n_{c}") for c in ("up", "down", "left", "right")],
    )
    # ((up + down) + left) + right, then /4 — laplace-seq.c:196
    tmp = ((F.col("n_up") + F.col("n_down")) + F.col("n_left")) + F.col("n_right")
    new_v = (1.0 - omega) * F.col("v") + omega * (tmp / 4.0)
    is_target = F.col("n_up").isNotNull()  # only targets receive contributions
    return g.select(
        "i",
        "j",
        F.when(is_target, new_v).otherwise(F.col("v")).alias("v"),
        F.when(is_target, F.greatest(F.col("diff"), F.abs(F.col("v") - new_v)))
        .otherwise(F.col("diff"))
        .alias("diff"),
    )


@dataclass
class LaplaceResult:
    grid: DataFrame  # (i, j, v)
    num_iterations: int
    final_diff: float
    omega: float
    epsilon: float
    duration_s: float


def solve(
    spark: SparkSession,
    n: int,
    num_partitions: int | None = None,
    max_iterations: int | None = None,
) -> LaplaceResult:
    """Run SOR to convergence (the do-while of laplace-seq.c:184-209).

    One Spark action per sweep (the max-reduce) — exactly one
    Allreduce per sweep like laplace-par.c:504, not per color phase.
    """
    if n < 2:
        raise ValueError("numPointsPerDimension must be >= 2 (laplace-seq.c:155-161)")
    omega = get_omega(n)
    epsilon = get_epsilon(n)
    grid = make_grid(spark, n, num_partitions).localCheckpoint()
    num_iterations = 0
    max_diff = float("inf")
    t0 = time.monotonic()
    while max_diff > epsilon:
        if max_iterations is not None and num_iterations >= max_iterations:
            break
        swept = _color_phase(
            _color_phase(grid.withColumn("diff", F.lit(0.0)), n, omega, 0),
            n,
            omega,
            1,
        ).localCheckpoint()
        max_diff = swept.agg(F.max("diff")).first()[0]
        grid = swept.drop("diff")
        num_iterations += 1
    duration = time.monotonic() - t0
    return LaplaceResult(grid, num_iterations, max_diff, omega, epsilon, duration)


def format_grid(result: LaplaceResult, n: int) -> str:
    """O14 ordered sink: rows in (i, j) order, %.10f space-separated
    (laplace-seq.c:99-111)."""
    rows = result.grid.orderBy("i", "j").collect()
    lines = []
    for i in range(n):
        lines.append(" ".join("%.10f" % rows[i * n + j]["v"] for j in range(n)))
    return "\n".join(lines) + "\n"


def print_stats(result: LaplaceResult, file=sys.stderr) -> None:
    """O15 stats sink (laplace-seq.c:224-226)."""
    print(
        f"Statistics: duration(s)={result.duration_s:.6f} "
        f"#iters={result.num_iterations} diff={result.final_diff:.10f} "
        f"epsilon={result.epsilon:.10f}",
        file=file,
    )
