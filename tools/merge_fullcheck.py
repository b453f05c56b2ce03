"""Merge FULLCHECK shard artifacts into the committed round artifact,
annotating per-name evidence provenance (round-9 verdict #7: no name's
newest evidence may silently predate its current plan — the merged
artifact records the evidence round for every name so staleness is a
greppable fact, not an archaeology project).

Usage:
    python tools/merge_fullcheck.py --round 12 --out FULLCHECK_r12.json \
        [--exclude-file exclusions.json] [--note "..."] \
        shardA.json shardB.json [delta.json ...]

Later files win on name collisions (deltas re-verify post-fix plans).

Header totals are DERIVED FROM THE BODY after exclusions are moved out
(r11 verdict #6: the r11 sf10 artifact's header said total=288/fail=5
while the body held 283 all-pass + 10 excluded — a merged artifact's
header must never disagree with its own queries map). An excluded name
is removed from `queries` and recorded under `excluded` with its
justification; it contributes to no header count.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--exclude-file",
        help="JSON mapping name -> reason (str or {'reason': ...}); names "
        "are moved out of `queries` into `excluded` before counting",
    )
    ap.add_argument("--note", help="free-text provenance note for the header")
    ap.add_argument("shards", nargs="+")
    args = ap.parse_args()

    queries: dict[str, dict] = {}
    sf_dirs = set()
    for path in args.shards:
        with open(path) as fh:
            shard = json.load(fh)
        sd = shard.get("sf_dir")
        # an already-merged artifact carries a LIST of sf_dirs — accept
        # both so merged artifacts can be extended with later deltas
        sf_dirs.update(sd if isinstance(sd, list) else [sd])
        for name, rec in shard["queries"].items():
            rec = dict(rec)
            rec["evidence_round"] = args.round
            rec["evidence_shard"] = path
            queries[name] = rec

    excluded: dict[str, dict] = {}
    if args.exclude_file:
        with open(args.exclude_file) as fh:
            for name, reason in json.load(fh).items():
                excluded[name] = (
                    reason if isinstance(reason, dict) else {"reason": reason}
                )
                queries.pop(name, None)

    summary = {
        "round": args.round,
        "sf_dir": sorted(d for d in sf_dirs if d),
        # every count below is computed from the post-exclusion body
        "total": len(queries),
        "pass": sum(1 for r in queries.values() if r["status"] == "pass"),
        "rows_only": sum(1 for r in queries.values() if r["status"] == "rows_only"),
        "fail": sum(1 for r in queries.values() if r["status"] == "fail"),
        "max_staleness_rounds": 0,  # every name re-verified this round
    }
    if excluded:
        summary["excluded"] = dict(sorted(excluded.items()))
    if args.note:
        summary["note"] = args.note
    summary["queries"] = dict(sorted(queries.items()))
    assert summary["total"] == summary["pass"] + summary["rows_only"] + summary["fail"]
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(
        f"wrote {args.out}: {summary['total']} names, {summary['pass']} pass, "
        f"{summary['fail']} fail, {len(excluded)} excluded, "
        f"evidence_round={args.round} for all"
    )


if __name__ == "__main__":
    main()
