"""Physical-plan assertions over `df.explain("formatted")` output."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any scan in the plan carries a non-empty PushedFilters."""
    plan = explain_str(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_codegen(df: DataFrame) -> bool:
    """True if any operator runs inside whole-stage codegen.

    `explain("formatted")` marks codegen operators with a leading `*`
    (e.g. `* HashAggregate (4)`); the literal `WholeStageCodegen`
    string only appears in `"simple"` mode pre-AQE-finalization.
    """
    plan = explain_str(df)
    if "WholeStageCodegen" in plan:
        return True
    return bool(re.search(r"^\s*(?:[+:]-\s*)?\* \w", plan, re.MULTILINE))


def _walk_physical(node):
    name = node.nodeName()
    if "AdaptiveSparkPlan" in name:
        # exchanges live inside the AQE wrapper's current plan
        yield from _walk_physical(node.executedPlan())
        return
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_physical(children.apply(i))


def broadcast_build_outputs(df: DataFrame) -> list[list[str]]:
    """Output column names of every BroadcastExchange build side in the
    compile-time physical plan (AQE initial plan — exchanges inserted,
    no runtime re-plan yet), i.e. what would be collected to the driver
    and shipped to every executor. Lets tests pin WHICH relations may
    broadcast (small dims / candidate pairs) and which never may
    (corpus-sized postings), independent of node numbering."""
    plan = df._jdf.queryExecution().executedPlan()
    outs: list[list[str]] = []
    for node in _walk_physical(plan):
        if "BroadcastExchange" in node.nodeName():
            child = node.children().apply(0)
            attrs = child.output()
            outs.append([attrs.apply(i).name() for i in range(attrs.size())])
    return outs


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out
