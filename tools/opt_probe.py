#!/usr/bin/env python
"""Optimization-round probe: time individual declared queries with the
noop sink (guide §1.4) and capture .explain("formatted") for the
plans/r12/ before/after artifacts.

Usage:
    python tools/opt_probe.py [--runs N] [--plans-dir plans/r12] \
        [--suffix before|after] [--no-plan] query1 query2 ...

Prints one line per query: name, per-run seconds, min. Writes
plans/r12/<query>_<suffix>.txt when --suffix is given.
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py, and uses
the same multifile fixture layout so numbers are bench-comparable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3, help="0 = plans only, no timing")
    ap.add_argument("--plans-dir", default=os.path.join(REPO_ROOT, "plans", "r12"))
    ap.add_argument("--suffix", default=None, help="write <query>_<suffix>.txt plan files")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pwir_zadanie_4_mapreduce_spark.session import build_session

    spark = build_session(
        app_name="opt_probe", cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from bench import _multifile_dir

    sf_dir, layout = _multifile_dir(spark, sf_dir)
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def release_storage() -> None:
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass

    if not args.no_warmup and args.runs > 0:
        spark.sparkContext.setJobDescription("warmup q1")
        materialize(queries["q1_pricing_summary"](spark, sf_dir))

    for name in args.queries:
        if name not in queries:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if args.suffix:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        runs = []
        for _ in range(args.runs):
            release_storage()
            spark.sparkContext.setJobDescription(f"probe {name}")
            t0 = time.monotonic()
            materialize(queries[name](spark, sf_dir))
            runs.append(round(time.monotonic() - t0, 3))
        if runs:
            print(f"{name}: runs={runs} min={min(runs)}", flush=True)
        else:
            print(f"{name}: plan captured", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
