"""Merge FULLCHECK shard artifacts into the committed round artifact,
annotating per-name evidence provenance (round-9 verdict #7: no name's
newest evidence may silently predate its current plan — the merged
artifact records the evidence round for every name so staleness is a
greppable fact, not an archaeology project).

Usage:
    python tools/merge_fullcheck.py --round 10 --out FULLCHECK_r10.json \
        shardA.json shardB.json [delta.json ...]

Later files win on name collisions (deltas re-verify post-fix plans).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("shards", nargs="+")
    args = ap.parse_args()

    queries: dict[str, dict] = {}
    sf_dirs = set()
    for path in args.shards:
        with open(path) as fh:
            shard = json.load(fh)
        sf_dirs.add(shard.get("sf_dir"))
        for name, rec in shard["queries"].items():
            rec = dict(rec)
            rec["evidence_round"] = args.round
            rec["evidence_shard"] = path
            queries[name] = rec
    summary = {
        "round": args.round,
        "sf_dir": sorted(d for d in sf_dirs if d),
        "total": len(queries),
        "pass": sum(1 for r in queries.values() if r["status"] == "pass"),
        "rows_only": sum(1 for r in queries.values() if r["status"] == "rows_only"),
        "fail": sum(1 for r in queries.values() if r["status"] == "fail"),
        "max_staleness_rounds": 0,  # every name re-verified this round
        "queries": dict(sorted(queries.items())),
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(
        f"wrote {args.out}: {summary['total']} names, {summary['pass']} pass, "
        f"{summary['fail']} fail, evidence_round={args.round} for all"
    )


if __name__ == "__main__":
    main()
