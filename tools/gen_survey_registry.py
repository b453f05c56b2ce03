"""Regenerate SURVEY.md §2.3 (implemented query registry) from
``operators.QUERIES`` so the table can never drift from the code.

Usage: python tools/gen_survey_registry.py   # rewrites SURVEY.md in place
"""

from __future__ import annotations

import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

FAMILY_OVERRIDES = {
    "merge": "cdc/warehouse",
    "scd2": "cdc/warehouse",
    "cdc": "cdc/warehouse",
    "pivot": "pivot/unpivot",
    "unpivot": "pivot/unpivot",
    "sim": "similarity",
    "embedding": "similarity",
    "sample": "sampling",
    "sql": "sql api",
    "udtf": "udf",
    "topk": "topk",
}


def family_of(name: str) -> str:
    head = name.split("_", 1)[0]
    if re.fullmatch(r"q\d+", head):
        return "TPC-H shapes"
    return FAMILY_OVERRIDES.get(head, head)


def main() -> None:
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    laplace = sorted(n for n in queries if n.startswith("laplace_sor"))
    names = sorted(n for n in queries if not n.startswith("laplace_sor"))

    fams: dict[str, list[str]] = {}
    for n in names:
        fams.setdefault(family_of(n), []).append(n)

    rows = []
    for fam in sorted(fams, key=str.lower):
        qs = ", ".join(
            f"`{q}`" + ("" if q in oracles else " (rows-only)")
            for q in sorted(fams[fam])
        )
        rows.append(f"| {fam} | {len(fams[fam])} | {qs} |")

    n_total = len(queries)
    n_oracled = len(oracles)
    laplace_list = ", ".join(f"`{n}`" for n in laplace)
    if n_oracled == n_total:
        oracle_note = (
            f"since round 7 ALL {n_total} carry oracles — the last six\n"
            "rows-only queries (ANN quartet, minhash, simhash) were converted:\n"
            "IVF/PQ/RP-LSH and simhash are full algorithm mirrors in DuckDB\n"
            "(deterministic seed codebooks, md5-derived constants, fold-ordered\n"
            "float sums), `dedup_minhash_lsh` is checked against the exhaustive\n"
            "j≥0.5 pair set (banding recall measured 100% on the frozen\n"
            "fixtures, pinned by pytest). Since round 9 the trained-IVF pair\n"
            "(`sim_topk_ivf_kmeans`, `_sampled`) are BOTH full training mirrors\n"
            "(integer-quantized Lloyd re-run verbatim in DuckDB) — no bracket\n"
            "or constant oracle column remains anywhere in the registry."
        )
    else:
        oracle_note = (
            f"{n_oracled} carry DuckDB oracles — the rest are marked rows-only "
            "(hash-function-\nspecific or approximate by design, each covered by a "
            "recall/property\npytest instead)."
        )
    header = (
        f"{n_total} queries in `__spark_entry__.queries()` ({len(names)} below + "
        f"{laplace_list},\n"
        "checked against the reference binary's golden output via golden-VALUES\n"
        f"oracles); {oracle_note}\n\n"
        "| family | n | queries |\n|---|---|---|\n" + "\n".join(rows) + "\n"
    )

    path = os.path.join(REPO_ROOT, "SURVEY.md")
    text = open(path).read()
    sec_start = text.index("### 2.3")
    body_start = text.index("\n\n", sec_start) + 2
    # generated block ends at the next paragraph that is not part of the table
    end_marker = text.index("\n\nStreaming jobs", body_start)
    new_text = text[:body_start] + header.rstrip("\n") + text[end_marker:]
    open(path, "w").write(new_text)
    print(f"SURVEY.md 2.3 regenerated: {n_total} queries, {n_oracled} oracled, "
          f"{len(fams)} families")


if __name__ == "__main__":
    main()
