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

# Multi-file layouts (>=32 part files per fact table; round-4 verdict
# #4) so the probe exercises split planning and parallel-scan shuffle
# fan-in; sf1 (10x sf0.1, built by tools/make_fixtures.py scaleup with
# per-replica key remap + shingle-space disjointness) adds a third
# decade of input to catch superlinear stages the 0.001->0.1 span
# misses. Build once with:
#   python tools/make_fixtures.py multifile /root/testdata/sfX .fixtures/multifile/sfX
#   python tools/make_fixtures.py scaleup  /root/testdata/sf0.1 .fixtures/multifile/sf1
_FIX = os.path.join(REPO_ROOT, ".fixtures", "multifile")
SF_DIRS = [os.path.join(_FIX, d) for d in ("sf0.001", "sf0.01", "sf0.1")]
SF1_DIR = os.path.join(_FIX, "sf1")


def main() -> None:
    with_sf1 = "--sf1" in sys.argv[1:]
    with_sf10 = "--sf10" in sys.argv[1:]  # 4th decade (factor-100 scaleup)
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or DEFAULT_QUERIES
    sf_dirs = SF_DIRS + ([SF1_DIR] if with_sf1 else [])
    if with_sf10:
        sf_dirs.append(os.path.join(_FIX, "sf10"))
    missing = [d for d in sf_dirs if not os.path.isdir(d)]
    if missing:
        sys.exit(f"missing fixture dirs (build with tools/make_fixtures.py): {missing}")
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
    run("q1_pricing_summary", sf_dirs[0])

    import math

    heads = [os.path.basename(d) for d in sf_dirs]
    print(f"{'query':35s} " + " ".join(f"{h:>8s}" for h in heads) + f" {'slope':>6s}")
    for name in names:
        # min-of-2 per (query, sf): first-touch codegen/page-cache
        # noise is larger than many of the small-sf timings themselves
        ts = [min(run(name, d), run(name, d)) for d in sf_dirs]
        # slope of the LAST 10× step in log-log space (the largest
        # measured decade; guard tiny times)
        slope = math.log10(max(ts[-1], 1e-3) / max(ts[-2], 1e-3))
        print(
            f"{name:35s} "
            + " ".join(f"{t:8.2f}" for t in ts)
            + f" {slope:6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
