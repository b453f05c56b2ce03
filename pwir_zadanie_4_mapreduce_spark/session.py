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
    """Build (or get) a SparkSession tuned for this engine.

    SPARK_GRAFT_MASTER overrides the master URL — e.g.
    ``local-cluster[2,8,4096]`` runs 2 REAL executor JVMs (own
    heaps, real serialization/broadcast/exchange transport), the
    closest single-machine approximation of a cluster and the
    multi-process evidence mode (SCALE.md). Python workers on those
    executors must import this package, so the PYTHONPATH prepared by
    _ensure_worker_importable (repo root + any active shim) is passed
    through spark.executorEnv explicitly.
    """
    _ensure_worker_importable()
    cpus = cpus or DEFAULT_CPUS
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.executorEnv.PYTHONPATH", os.environ.get("PYTHONPATH", ""))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE on scan parallelism at test SF: every fixture parquet is
        # a SINGLE row group, so parquet scans cannot split below one
        # task no matter how low maxPartitionBytes goes (verified:
        # 4 MB splits put all 600k lineitem rows in one partition, and
        # interleaved A/B timing showed no difference). The lever that
        # DOES work is an explicit repartition before CPU-heavy
        # per-row stages — catalog.spread(), used by the shingling /
        # signature / Arrow-decode operators.
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
    }.items():
        try:
            conf.set(k, v)
        except Exception:
            pass  # some confs may be fixed by the driver's session
    return spark
