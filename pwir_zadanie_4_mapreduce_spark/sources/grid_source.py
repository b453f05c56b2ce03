"""Custom Python DataSource (Spark 4 pyspark.sql.datasource API): the
Laplace initial grid as a first-class *connector* instead of a
spark.range expression.

The reference generates its input from a function, not a file
(`getInitialValue`, laplace-common-impl.h:11-33) and scatters row
slabs to ranks (laplace-par.c:307-337, width split at :245-251). This
source reproduces both properties through Spark's source API:

- each InputPartition covers a contiguous block of rows — the SAME
  1-D decomposition with the same remainder rule (first N%P parts get
  one extra row), so the "scatter" is the scheduler assigning
  partitions to executors;
- the reader materializes cells from the closed-form boundary rules —
  zero input I/O, embarrassingly parallel, exactly like any generated
  / synthetic-benchmark source at 100 TB scale.

Everything the executor touches is defined INSIDE
``make_laplace_grid_datasource`` so cloudpickle serializes the
classes by VALUE: the driver may run from any cwd without this repo
on the worker PYTHONPATH (the same constraint as the closure-defined
UDFs — see the verify skill's gotcha list), and a module-level class
would be pickled by reference and fail to import on the worker.

Registration is session-scoped::

    spark.dataSource.register(make_laplace_grid_datasource())
    spark.read.format("laplace_grid").option("n", 8)
         .option("partitions", 4).load()
"""

from __future__ import annotations

from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

GRID_SCHEMA = StructType(
    [
        StructField("i", IntegerType(), nullable=False),
        StructField("j", IntegerType(), nullable=False),
        StructField("v", DoubleType(), nullable=False),
    ]
)


def make_laplace_grid_datasource():
    """Build the DataSource class (closure-scoped for by-value pickling)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    # laplace-common.h boundary constants (precedence top > bottom >
    # left > right — corners take the row value)
    def initial_value(i: int, j: int, n: int) -> float:
        """getInitialValue, laplace-common-impl.h:11-33 (else-if order)."""
        if i == 0:
            return 4.56
        if i == n - 1:
            return 9.85
        if j == 0:
            return 7.32
        if j == n - 1:
            return 6.88
        return 0.0

    class RowBlock(InputPartition):
        def __init__(self, start_row: int, end_row: int, n: int):
            self.start_row = start_row
            self.end_row = end_row
            self.n = n

    class LaplaceGridReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 8))
            self.n_parts = int(options.get("partitions", 1))
            if self.n < 2:
                raise ValueError("n must be >= 2 (laplace-seq.c:155-161)")

        def partitions(self):
            # 1-D row-block split with the reference's remainder rule:
            # width = N//P (+1 for the first N%P parts), laplace-par.c:245-251
            p = min(self.n_parts, self.n)  # surplus-process exclusion (:254)
            base, rem = divmod(self.n, p)
            blocks, start = [], 0
            for r in range(p):
                width = base + (1 if r < rem else 0)
                blocks.append(RowBlock(start, start + width, self.n))
                start += width
            return blocks

        def read(self, partition):
            n = partition.n
            for i in range(partition.start_row, partition.end_row):
                for j in range(n):
                    yield (i, j, initial_value(i, j, n))

    class LaplaceGridDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "laplace_grid"

        def schema(self):
            # inline (not the module constant) so the class closure
            # carries no reference back to this module
            return (
                "i int not null, j int not null, v double not null"
            )

        def reader(self, schema) -> DataSourceReader:
            return LaplaceGridReader(self.options)

    return LaplaceGridDataSource


def grid_reader_partitions(n: int, partitions: int):
    """Expose the row-block plan for tests (driver-side only)."""
    cls = make_laplace_grid_datasource()
    src = cls(options={"n": str(n), "partitions": str(partitions)})
    return src.reader(None).partitions()


def make_tick_stream_datasource():
    """Python STREAMING data source (Spark 4 SimpleDataSourceStreamReader):
    a deterministic bounded ticker — each micro-batch emits
    ``rows_per_batch`` rows of (tick, value = (tick*31) % 97 / 10) until
    ``total`` ticks have been produced, then reports no new data (the
    offset stops advancing, so processAllAvailable terminates). The
    offset dict {"pos": N} is the exactly-once contract: Spark persists
    it in the checkpoint and replays from it on restart.

    Closure-scoped like the batch grid source: workers and the
    streaming offset thread unpickle the class by value."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class TickStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.rows_per_batch = int(options.get("rows_per_batch", 100))
            self.total = int(options.get("total", 1000))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = int(start["pos"])
            end = min(pos + self.rows_per_batch, self.total)
            rows = [(t, ((t * 31) % 97) / 10.0) for t in range(pos, end)]
            return iter(rows), {"pos": end}

        def readBetweenOffsets(self, start, end):
            # replay path (restart recovery): regenerate deterministically
            return iter(
                (t, ((t * 31) % 97) / 10.0)
                for t in range(int(start["pos"]), int(end["pos"]))
            )

    class TickStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "pwir_tick_stream"

        def schema(self):
            return "tick bigint not null, value double not null"

        def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
            return TickStreamReader(self.options)

    return TickStreamDataSource
