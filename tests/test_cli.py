"""CLI front-end contract (reference O17): argument validation and
the registry listing. The laplace/query subcommands start a Spark
session, so their end-to-end paths are exercised by test_laplace and
the operator tests; here we pin the parse/validation behavior."""

from __future__ import annotations

import pytest

from pwir_zadanie_4_mapreduce_spark.cli import main


def test_list_prints_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    from pwir_zadanie_4_mapreduce_spark.operators import QUERIES

    assert set(out) >= set(QUERIES)
    assert "laplace_sor_n8" in out


def test_laplace_rejects_n_below_2(capsys):
    # laplace-seq.c:155-161 rejects N < 2
    assert main(["laplace", "1"]) == 1
    assert "N must be >= 2" in capsys.readouterr().err


def test_unknown_subcommand_exits_with_usage():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
