"""Lineage cuts with a reliability switch (round-9 verdict #5).

Every multi-pass / iterative operator truncates lineage so re-used or
per-round frames aren't recomputed from the scan (connected components,
Lloyd k-means, PageRank, BFS, and the fan-in frames several single-job
ops re-aggregate). The default spelling is ``localCheckpoint`` —
executor-local block storage, zero extra I/O — which is the right cost
model on a healthy cluster but NON-RELIABLE: an executor loss destroys
its blocks, and because the lineage was truncated they cannot be
recomputed; the job dies (measured in tests/test_fault_recovery.py).

At 100 TB / 1000 executors, task retry and executor loss are routine,
so the engine exposes the reliable spelling behind one switch:
``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` turns every cut into
``DataFrame.checkpoint()`` — materialized to the checkpoint directory
(``SPARK_GRAFT_CHECKPOINT_DIR``, else a reaped temp dir; on a real
cluster: HDFS/object storage) — which survives any executor loss; lost
downstream partitions re-read the checkpoint files during stage retry.
The cost delta is one write+read of the cut frame per cut (measured in
SCALE.md).

Call sites keep chain style via ``.transform(cut_lineage)``.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_CONFIGURED_APPS: set[str] = set()


def reliable_checkpoints_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT", "") not in ("", "0")


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    spark = df.sparkSession
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _CONFIGURED_APPS:
        return
    d = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if not d:
        d = tempfile.mkdtemp(prefix="pwir_ckpt_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    sc.setCheckpointDir(d)
    _CONFIGURED_APPS.add(app)


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage: localCheckpoint by default, reliable
    ``checkpoint()`` when SPARK_GRAFT_RELIABLE_CHECKPOINT=1. Lazy by
    default (materializes on first use, like the call sites' previous
    ``localCheckpoint(eager=False)`` spelling)."""
    if reliable_checkpoints_enabled():
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
