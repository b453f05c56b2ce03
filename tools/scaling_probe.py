#!/usr/bin/env python
"""Measure how headline queries scale across the fixture scale factors
(sf0.001 → sf0.01 → sf0.1, a 10× step each) — evidence for the
SCALE.md claims: scan-bound plans should grow ≈ linearly with input,
groups-bounded aggregations sublinearly, and nothing superlinearly
(a superlinear slope is the signature of an all-pairs or
single-partition stage that would kill a 100× scale-up).

Usage: python tools/scaling_probe.py [query ...]
Prints one line per query: seconds at each sf and the log10-slope of
the last step (1.0 = perfectly linear in rows, < 1 sublinear).
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_topk_ivf",
    "text_tfidf_top_terms",
    "text_collocation_pmi",
    "events_sessionization",
    "agg_equidepth_histogram_binned",
    "sample_reservoir_group",
    "quality_perplexity_filter",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    from pwir_zadanie_4_mapreduce_spark.session import build_session

    spark = build_session(
        app_name="scaling-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def run(name: str, sf_dir: str) -> float:
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # warm-up JVM/codegen so sf0.001 isn't charged for startup
    run("q1_pricing_summary", SF_DIRS[0])

    print(f"{'query':35s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'slope':>6s}")
    for name in names:
        ts = [run(name, d) for d in SF_DIRS]
        # slope of the last 10× step in log-log space; guard tiny times
        import math

        slope = math.log10(max(ts[2], 1e-3) / max(ts[1], 1e-3))
        print(f"{name:35s} {ts[0]:8.2f} {ts[1]:8.2f} {ts[2]:8.2f} {slope:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
