"""Driver-style correctness pre-flight at sf0.01.

Mimics the driver's CORRECTNESS_r{N}.json comparison more strictly than
tests/test_oracle_parity.py: both sides go through pandas (the driver's
canonicalizer is pandas-based — see the round-1 failure trace in
CORRECTNESS_r01.json `agg_collect_sorted_list`), so anything pandas
can't sort/hash (ndarray cells) or that differs in dtype *kind*
(int vs float, object vs numeric) is caught here before the driver
sees it.

Usage:
    python tools/driver_compare.py [query ...]   # default: all oracled
    python tools/driver_compare.py --out FULLCHECK_r05.json
        # full-registry sweep, committed artifact (round-4 verdict #7):
        # oracled queries get the full rows/columns/hash compare;
        # rows-only queries are executed and their row count recorded
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_COMPARE_SF", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_frame(df):
    """Canonicalize a pandas frame the way a value-hasher would:
    columns sorted by name, rows sorted, cells stringified."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        try:
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            # collapsing 5.0 vs 5 when the column kind differs is NOT
            # done — the driver wouldn't either; keep float form.
            return f"{v:.4f}"
        if isinstance(v, bool):
            return str(int(v))
        if hasattr(v, "isoformat"):
            # normalize DATE vs midnight-DATETIME: Spark DATE comes
            # through pandas as datetime.date ('2024-01-05'), DuckDB
            # DATE as datetime64 ('2024-01-05T00:00:00') — same value,
            # different isoformat. The driver hash-matches these
            # (r04: orders_open_backlog_daily et al. passed with DATE
            # columns), so the pre-flight must not false-positive.
            import datetime as _dt

            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                v = _dt.datetime(v.year, v.month, v.day)
            return v.isoformat()
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(cell)
    rows = sorted("|".join(r) for r in df.itertuples(index=False, name=None))
    return rows


def _kind(dtype, series=None) -> str:
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    if k == "O" and series is not None:
        # Spark DATE columns surface as object-of-datetime.date; the
        # driver treats them as dates like DuckDB's datetime64 DATE
        import datetime as _dt

        vals = [v for v in series if v is not None]
        if vals and all(isinstance(v, _dt.date) for v in vals):
            return "datetime"
    return "object"


def main(argv: list[str]) -> int:
    import json

    import duckdb

    import __spark_entry__ as entrymod
    from pwir_zadanie_4_mapreduce_spark.session import build_session

    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # --out = the committed full-registry sweep: every query, rows-only
    # ones included (recorded as executed + row count, like the driver)
    names = argv or (sorted(queries) if out_path else sorted(oracles))
    results: dict[str, dict] = {}

    spark = build_session(cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "16")))
    con = duckdb.connect()
    # Bound the oracle's memory so big-SF sweeps SPILL instead of
    # OOM-killing the whole shard (r11: a shingle-pair oracle at sf10
    # ballooned DuckDB to 82 GB RSS and the kernel killed the process;
    # with a limit DuckDB grades to out-of-core execution).
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if duck_mem:
        con.sql(f"SET memory_limit='{duck_mem}'")
        # per-process spill dir: concurrent sharded workers sharing one
        # temp_directory clobber each other's spill files (r12: an sf1
        # dfcap oracle died with 'Could not read enough bytes' when a
        # sibling shard recycled the shared temp file)
        con.sql(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        # driver fixtures are single files; the .fixtures scale-ups
        # (sf1) are Spark-written DIRECTORIES of part files — DuckDB
        # needs the glob spelling for those
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    failures = []
    for name in names:
        # mirror bench.release_storage: queries that cache()/persist
        # (pagerank's edge frame et al.) must not leak InMemoryRelations
        # into the shared session across a ~270-query sweep
        spark.catalog.clearCache()
        if name not in oracles:
            if out_path:
                # rows-only by declared design: run it, record rows
                # (the weaker check the driver applies to these)
                t0 = time.monotonic()
                try:
                    n = len(queries[name](spark, SF_DIR).toPandas())
                    results[name] = {"status": "rows_only", "spark_rows": n}
                    print(f"ran  {name} ({time.monotonic() - t0:.1f}s): {n} rows (no oracle)")
                except Exception as exc:  # noqa: BLE001
                    failures.append(name)
                    results[name] = {"status": "fail", "err": repr(exc)}
                    print(f"FAIL {name}: exception {exc!r}")
            else:
                print(f"SKIP {name}: no oracle")
            continue
        t0 = time.monotonic()
        try:
            spdf = queries[name](spark, SF_DIR).toPandas()
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "fail", "err": repr(exc)}
            print(f"FAIL {name}: exception {exc!r}")
            continue
        probs = []
        if sorted(spdf.columns) != sorted(ddf.columns):
            probs.append(f"columns spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}")
        if len(spdf) != len(ddf):
            probs.append(f"rows spark={len(spdf)} duck={len(ddf)}")
        if not probs:
            for c in sorted(spdf.columns):
                ks, kd = _kind(spdf[c].dtype, spdf[c]), _kind(ddf[c].dtype, ddf[c])
                if ks != kd:
                    probs.append(f"dtype kind {c}: spark={spdf[c].dtype} duck={ddf[c].dtype}")
        if not probs:
            try:
                s_rows, d_rows = _canon_frame(spdf), _canon_frame(ddf)
            except Exception as exc:  # noqa: BLE001
                probs.append(f"canonicalize error (driver would err too): {exc!r}")
            else:
                diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
                if diff:
                    probs.append(f"{len(diff)} differing rows, first: {diff[:2]}")
        dt = time.monotonic() - t0
        if probs:
            failures.append(name)
            results[name] = {
                "status": "fail",
                "spark_rows": len(spdf),
                "oracle_rows": len(ddf),
                "probs": probs,
            }
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(probs))
        else:
            results[name] = {
                "status": "pass",
                "spark_rows": len(spdf),
                "oracle_rows": len(ddf),
            }
            print(f"ok   {name} ({dt:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
    if out_path:
        summary = {
            "sf_dir": SF_DIR,
            "total": len(names),
            "pass": sum(1 for r in results.values() if r["status"] == "pass"),
            "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
            "fail": len(failures),
            "queries": results,
        }
        with open(out_path, "w") as fh:
            json.dump(summary, fh, indent=1)
        print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
