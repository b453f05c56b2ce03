#!/usr/bin/env python
"""Interleaved min-of-N re-measurement for queries flagged as
round-over-round regressions whose PLANS did not change (round-8
verdict task #6): scheduler noise on this host hits random victims
(BASELINE.md "Host-throughput banding"), so a single bench pair cannot
distinguish drift from a stall. Interleaving N full cycles across the
suspect set puts every query through the same windows; the per-query
MIN is the steady-state plan cost, directly comparable to the
committed bench history.

Usage: python tools/ab_regressions.py [query ...] [--cycles N]
Defaults to the round-8 suspect list, 4 cycles, sf0.1 multifile.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SUSPECTS = [
    "stats_bootstrap_se",
    "events_ohlc_15min",
    "events_sessionization",
    "q18_large_volume_customers",
    "sample_reservoir_group",
]


def main() -> None:
    args = sys.argv[1:]
    cycles = 4
    if "--cycles" in args:
        i = args.index("--cycles")
        cycles = int(args[i + 1])
        del args[i : i + 2]
    names = args or SUSPECTS
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        os.path.join(REPO_ROOT, ".fixtures", "multifile", "sf0.1"),
    )

    from pwir_zadanie_4_mapreduce_spark.session import build_session

    spark = build_session(
        app_name="ab-regressions",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def release() -> None:
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass

    def run(name: str) -> float:
        release()
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run("q1_pricing_summary")  # warm-up
    canary = min(run("q1_pricing_summary") for _ in range(2))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(cycles):
        for n in names:  # interleaved: every query sees every window
            samples[n].append(run(n))
    out = {
        "sf_dir": sf_dir,
        "cycles": cycles,
        "canary_q1_s": round(canary, 3),
        "queries": {
            n: {
                "min": round(min(v), 3),
                "max": round(max(v), 3),
                "runs": [round(x, 3) for x in v],
            }
            for n, v in samples.items()
        },
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
