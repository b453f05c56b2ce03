"""Cross-engine pins for the adaptive RP-LSH width (r12).

The width formulas run TWICE — in Python (`_rp_wide_cfg`, baked into
the Spark plan) and in SQL (the oracle's `cfg` CTE, derived from
COUNT(*)). A spec mismatch between the two spellings is exactly the
bug class the r11 ADVICE flagged on SemDeDup's isqrt-vs-FLOOR(SQRT):
invisible at every tested n, divergent at some future one. These
tests evaluate the ORACLE's formula in DuckDB over a sweep of corpus
sizes (including every clamp boundary and power-of-two edge) and
require bit-equal agreement with the Python side, and pin the
backward-compatible plane regions that keep every n<=8192 output
identical to the r11 8x8 config.
"""

from __future__ import annotations

import duckdb
import pytest

from pwir_zadanie_4_mapreduce_spark.operators.dedup import (
    _LN10,
    _RP_A_TAU,
    _rp_wide_cfg,
    _rp_wide_plane,
    RP_WIDE_MAX_BANDS,
    RP_WIDE_MAX_BITS,
    RP_WIDE_TARGET_BUCKET,
)
from pwir_zadanie_4_mapreduce_spark.operators.similarity import _hyperplane

# clamp boundaries, power-of-two edges, tested fixture sizes, far tail
N_SWEEP = [1, 200, 320, 2000, 2120, 8192, 8193, 16384, 16385, 20000,
           200000, 2000000, 2**21, 2**21 + 1, 10**9]


def test_cfg_python_vs_duckdb_bit_equal():
    con = duckdb.connect()
    for n in N_SWEEP:
        bits_sql, bands_sql = con.sql(
            f"""
            SELECT bits,
                   CAST(CEIL({_LN10!r} / POWER({_RP_A_TAU!r}, bits)) AS BIGINT)
            FROM (SELECT GREATEST(8, LEAST({RP_WIDE_MAX_BITS},
                     CAST(CEIL(LOG2({n} / {float(RP_WIDE_TARGET_BUCKET)!r}))
                          AS BIGINT))) AS bits)
            """
        ).fetchone()
        assert (int(bits_sql), int(bands_sql)) == _rp_wide_cfg(n), n


def test_cfg_known_values():
    # the historical config at every small-sf fixture, and the sweep scales
    assert _rp_wide_cfg(200) == (8, 8)      # sf0.01
    assert _rp_wide_cfg(2000) == (8, 8)     # sf0.1
    assert _rp_wide_cfg(8192) == (8, 8)     # last n of the historical config
    assert _rp_wide_cfg(20000) == (10, 11)  # sf1
    assert _rp_wide_cfg(200000) == (13, 18)  # sf10 (hash-verified r12)
    bits, bands = _rp_wide_cfg(10**12)      # saturation
    assert bits == RP_WIDE_MAX_BITS and bands == RP_WIDE_MAX_BANDS == 28


def test_plane_regions_backward_compatible():
    """Bands 0-7 x bits 0-7 must be the r11 planes VERBATIM (that is
    what keeps every n<=8192 output and committed hash unchanged), and
    widening regions must never collide with them or each other."""
    for k in range(8):
        for j in range(8):
            assert _rp_wide_plane(k, j) == _hyperplane(k * 8 + j), (k, j)
    seen: dict[tuple[float, ...], tuple[int, int]] = {}
    for k in range(RP_WIDE_MAX_BANDS):
        for j in range(RP_WIDE_MAX_BITS):
            key = tuple(_rp_wide_plane(k, j))
            assert key not in seen, ((k, j), seen[key])
            seen[key] = (k, j)


def test_recall_floor_at_tau():
    """The band count must actually deliver the >=90 % recall the
    docstring claims at tau=0.9, at every width the clamp can emit."""
    for bits in range(8, RP_WIDE_MAX_BITS + 1):
        import math

        bands = math.ceil(_LN10 / _RP_A_TAU**bits)
        miss = (1.0 - _RP_A_TAU**bits) ** bands
        assert miss <= 0.1 + 1e-12, (bits, bands, miss)
