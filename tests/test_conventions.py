"""Static numeric-convention lint (r11 verdict #1, second half).

Two bug classes cost the sf1/sf10 sweeps real debugging rounds and are
invisible at smoke scale by construction — they only bite when sums get
large enough for double fold-order / double-rounding to flip a decimal:

1. "Final ROUND over a fixed-point quotient": money/value sums are
   exact int64 fixed-point (``SUM(CAST(FLOOR(x*1e4+0.5) AS BIGINT))``)
   descaled by a raw quotient. Wrapping that quotient in a final
   ROUND/dround re-introduces the Spark-vs-DuckDB half-up divergence
   the fixed-point spelling exists to kill (r11: 15 ops migrated).

2. "Raw double cumsum window moments": windowed mu/sigma/z built from
   ``SUM(value*value) OVER`` in doubles diverge across engines at sf10
   because each engine folds partials in a different order; the
   convention is exact int64 cents/micros window sums (r11: window
   moments + LTTB areas migrated).

This lint makes both conventions structural so sf100 doesn't re-find
them: it scans every registered oracle (the SQL and the Spark source
are written as mirror pairs, so a convention break lands in both) and
AST-scans the operator sources for the Spark-side signatures.
"""

from __future__ import annotations

import ast
import pathlib
import re

import pytest

OPERATOR_DIR = (
    pathlib.Path(__file__).resolve().parents[1]
    / "pwir_zadanie_4_mapreduce_spark"
    / "operators"
)

# power-of-ten descale denominators used by the fixed-point convention
FIXED_POINT_DENOMS = {100, 10000, 1000000, 100000000,
                      100.0, 10000.0, 1000000.0, 100000000.0, 1e4, 1e6}


def _balanced_args(sql: str, fname: str) -> list[str]:
    """Balanced argument string of every ``fname(`` call in ``sql``."""
    out, i, upper = [], 0, sql.upper()
    pat = fname.upper() + "("
    while True:
        j = upper.find(pat, i)
        if j < 0:
            return out
        depth, start = 0, j + len(pat)
        k = start - 1
        for k in range(start - 1, len(sql)):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
        out.append(sql[start:k])
        i = k


def _windowed_sum_args(sql: str) -> list[str]:
    """Argument of every ``SUM(...) OVER`` in ``sql``."""
    out = []
    for m in re.finditer(r"SUM\s*\(", sql, re.I):
        depth, start, k = 0, m.end(), m.end() - 1
        for k in range(m.end() - 1, len(sql)):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
        if re.match(r"\s*OVER\b", sql[k + 1:k + 40], re.I):
            out.append(sql[start:k])
    return out


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as entry

    return entry.oracle_sql()


def test_no_round_over_fixed_point_in_oracles(oracles):
    """An int64-fixed-point quantity (anything BIGINT-cast inside the
    ROUND argument) must be descaled by a RAW quotient — final ROUND is
    the r11 bug class. Legit drounds over plain double aggregates stay
    legal."""
    bad = [
        f"{name}: ROUND({arg[:90]}...)"
        for name, sql in oracles.items()
        for arg in _balanced_args(sql, "ROUND")
        if "BIGINT" in arg.upper()
    ]
    assert not bad, "\n".join(bad)


def test_windowed_product_sums_are_int64_in_oracles(oracles):
    """Windowed second moments (``SUM(x*x) OVER``) must accumulate in
    exact int64 fixed-point, never raw doubles — double fold-order
    diverges across engines at sf10."""
    bad = [
        f"{name}: SUM({arg[:90]}) OVER"
        for name, sql in oracles.items()
        for arg in _windowed_sum_args(sql)
        if "*" in arg and "BIGINT" not in arg.upper()
    ]
    assert not bad, "\n".join(bad)


def _operator_asts():
    for path in sorted(OPERATOR_DIR.glob("*.py")):
        yield path.name, ast.parse(path.read_text())


def _call_name(node: ast.Call) -> str:
    f = node.func
    if isinstance(f, ast.Attribute):
        base = f.value
        if isinstance(base, ast.Name):
            return f"{base.id}.{f.attr}"
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return ""


def test_no_f_round_in_operator_sources():
    """``F.round`` is banned in operators: Spark's BigDecimal HALF_UP
    disagrees with DuckDB's double rounding on exact-.5 scaled values;
    ``dround`` (functions/rounding.py) is the only legal rounding."""
    bad = []
    for fname, tree in _operator_asts():
        for node in ast.walk(tree):
            if isinstance(node, ast.Call) and _call_name(node) == "F.round":
                bad.append(f"{fname}:{node.lineno}")
    assert not bad, f"F.round in operators: {bad}"


def test_no_dround_over_fixed_point_quotient_in_sources():
    """The Spark-side mirror of rule 1: ``dround(x / <power-of-ten>)``
    where the quotient descales a fixed-point sum is the same final-
    ROUND bug. Detected as: any dround first argument whose subtree
    divides by a power-of-ten literal."""
    bad = []
    for fname, tree in _operator_asts():
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call) and _call_name(node) == "dround"):
                continue
            if not node.args:
                continue
            for sub in ast.walk(node.args[0]):
                if (
                    isinstance(sub, ast.BinOp)
                    and isinstance(sub.op, ast.Div)
                    and isinstance(sub.right, ast.Constant)
                    and sub.right.value in FIXED_POINT_DENOMS
                ):
                    bad.append(f"{fname}:{node.lineno}")
    assert not bad, f"dround over fixed-point quotient: {bad}"
