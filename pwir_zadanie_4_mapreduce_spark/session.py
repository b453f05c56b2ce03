"""SparkSession construction with scale-aware defaults.

Local testing runs on ``local[N]`` (single JVM), but every conf here is
chosen to also be the right call on a 1000-executor cluster reading
100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — replaces the reference's hand-rolled load
  balancing of remainder rows (laplace-par.c:248-251).
- Arrow on for every pandas-UDF boundary.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (DuckDB timestamps are UTC-naive).
- shuffle partitions sized to cores locally; at cluster scale this is
  overridden per-job (or left to AQE's coalescing with a high initial
  count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_worker_importable() -> None:
    """Python workers unpickle module-level functions (mapInPandas,
    UDFs) by importing this package — which fails when the driver runs
    from another cwd. Prepend the repo root to PYTHONPATH before the
    JVM starts so local-mode workers inherit it; on a real cluster the
    equivalent is shipping the package via --py-files / spark.submit.pyFiles."""
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _REPO_ROOT not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([_REPO_ROOT, *parts])


def build_session(
    app_name: str = "pwir-zadanie-4-mapreduce-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine."""
    _ensure_worker_importable()
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan-split size: the default 128 MB makes every test-SF table a
        # SINGLE scan partition (lineitem@sf0.1 is 10.8 MB), serializing
        # scans, UDFs, and partial aggs onto one core — measured 2-5×
        # on scan-heavy queries. The principle is cores×~2 splits per
        # scan: at 100 TB the default already yields ~10⁶ splits, so
        # this override matters only when input_size/cores < 128 MB.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_or_tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-provided session.

    The driver hands us a SparkSession we didn't build; set the confs
    that are session-scoped (not JVM-startup-scoped) so oracle
    comparisons and small-SF plans behave.
    """
    conf = spark.conf
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # see build_session: parallelize small-SF scans (runtime-settable)
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    }.items():
        try:
            conf.set(k, v)
        except Exception:
            pass  # some confs may be fixed by the driver's session
    return spark
