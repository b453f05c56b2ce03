"""Executed-plan SQL-metric readout — shuffle VOLUME assertions.

`plans.inspect` asserts plan SHAPE (an exchange exists / doesn't);
this module reads the per-node SQL metrics after an action so tests
can pin plan VOLUME: how many bytes/records each shuffle actually
shipped. That locks in the 100 TB sizing claims in SCALE.md (e.g.
"the MinHash band shuffle ships (band_key, doc_id) only", "the
df-capped Jaccard join fans out ≤ DF_CAP² rows per shingle") so a
future edit that silently widens a shuffled payload fails a test
instead of shipping a 10× regression to the cluster.

Usage contract: run an action that executes the SAME Dataset first
(`df.collect()` — `df.write` / `df.count()` build a separate
QueryExecution whose metrics don't land on `df`'s plan), then call
these readers. Metric names are Spark's SQLMetric keys
(`shuffleBytesWritten`, `shuffleRecordsWritten`, `dataSize`,
`numOutputRows`, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_nodes(df: DataFrame) -> list[tuple[str, dict[str, int]]]:
    """(node class simple name, {metric: value}) for every node of the
    executed physical plan, in pre-order, unwrapping AQE wrappers
    (AdaptiveSparkPlanExec / *QueryStageExec) into their final plans."""
    out: list[tuple[str, dict[str, int]]] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        metrics: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = int(kv._2().value())
        out.append((cls, metrics))
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())
        else:
            children = node.children()
            for i in range(children.size()):
                walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def shuffle_stats(df: DataFrame) -> dict[str, int]:
    """Aggregate shuffle-write volume over every exchange in the
    executed plan: total records, total bytes on the wire (post
    compression), total uncompressed dataSize, and exchange count."""
    records = bytes_written = data_size = exchanges = 0
    for cls, m in executed_nodes(df):
        if cls == "ShuffleExchangeExec":
            exchanges += 1
            records += m.get("shuffleRecordsWritten", 0)
            bytes_written += m.get("shuffleBytesWritten", 0)
            data_size += m.get("dataSize", 0)
    return {
        "exchanges": exchanges,
        "records": records,
        "bytes_written": bytes_written,
        "data_size": data_size,
    }


def per_exchange_records(df: DataFrame) -> list[int]:
    """shuffleRecordsWritten of each exchange, pre-order (first =
    closest to the result)."""
    return [
        m.get("shuffleRecordsWritten", 0)
        for cls, m in executed_nodes(df)
        if cls == "ShuffleExchangeExec"
    ]


def scan_output_rows(df: DataFrame) -> int:
    """Rows the file scans emitted (post partition/split pruning and
    pushed filters) — the number DPP tests assert shrinks."""
    return sum(
        m.get("numOutputRows", 0)
        for cls, m in executed_nodes(df)
        if "FileSourceScan" in cls or cls == "FileScanExec" or "BatchScan" in cls
    )
