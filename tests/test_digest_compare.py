"""The in-engine digest comparator (tools/driver_compare.py --digest).

r12: outputs whose cardinality equals the input (scalar_math_lineitem
is 6e7 rows at sf10) cannot be verified by collecting both sides into
pandas — the digest mode aggregates COUNT(*) plus an exact sum of
per-row 48-bit md5 digests over identically-canonicalized rows IN each
engine, so verification ships two numbers however large the output.
These tests pin the two properties that make it trustworthy:

1. agreement with the full pandas compare on queries that pass it
   (same canonicalization semantics: doubles through the bit-identical
   FLOOR(x*1e4+0.5) int64 map, NULL/NaN sentinels, sorted columns);
2. sensitivity — a single perturbed value in a 60k-row result flips
   the digest (anything less and "pass" would be vacuous at sf10).
"""

from __future__ import annotations

import importlib.util
import pathlib

import duckdb
import pytest

from tests.conftest import SMOKE_SF

_DC = pathlib.Path(__file__).resolve().parents[1] / "tools" / "driver_compare.py"
spec = importlib.util.spec_from_file_location("driver_compare", _DC)
dc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dc)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in dc.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SMOKE_SF}/{t}.parquet'")
    return con


def _entry():
    import __spark_entry__ as entry

    return entry


def test_digest_agrees_where_pandas_compare_passes(spark, duck):
    entry = _entry()
    qs, oracles = entry.queries(), entry.oracle_sql()
    # mixed dtypes: bigints+doubles, timestamps, strings+booleans
    for name in ("scalar_math_lineitem", "events_ohlc_15min", "q1_pricing_summary"):
        res = dc._digest_compare(qs[name](spark, SMOKE_SF), duck, oracles[name])
        assert res["match"], (name, res)


def test_digest_catches_single_value_perturbation(spark, duck):
    entry = _entry()
    good = entry.oracle_sql()["scalar_math_lineitem"]
    bad = f"""
    SELECT l_orderkey, l_linenumber, abs_disc_delta, sqrt_price, qty_sq,
           price_ceil + CASE WHEN l_orderkey = (SELECT MIN(l_orderkey) FROM ({good}))
                             THEN 1 ELSE 0 END AS price_ceil,
           price_floor, price_round1
    FROM ({good})"""
    df = entry.queries()["scalar_math_lineitem"](spark, SMOKE_SF)
    assert dc._digest_compare(df, duck, good)["match"]
    res = dc._digest_compare(df, duck, bad)
    assert not res["match"], res
    # the perturbation changes a value, not the cardinality
    assert res["spark"]["rows"] == res["oracle"]["rows"]


def test_digest_catches_dropped_row(spark, duck):
    entry = _entry()
    good = entry.oracle_sql()["q1_pricing_summary"]
    bad = f"SELECT * FROM ({good}) WHERE l_returnflag != 'R' OR l_linestatus != 'F'"
    df = entry.queries()["q1_pricing_summary"](spark, SMOKE_SF)
    res = dc._digest_compare(df, duck, bad)
    assert not res["match"], res
