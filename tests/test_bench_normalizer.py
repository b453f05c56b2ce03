"""bench.py's median-ratio host normalizer (round-10, replacing the
2-sample q1 canary that inverted the round-9 close pair).

No Spark needed: the helpers are pure functions over timing dicts, and
the committed bench_ref.json plus the historical r9 records are the
fixtures.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ref_vector_committed_and_loadable():
    ref = bench._load_bench_ref()
    # every committed ref query is a current HEADLINE query, positive
    assert len(ref) >= 100
    assert all(v > 0 for v in ref.values())
    missing = set(ref) - set(bench.HEADLINE)
    assert not missing, f"ref entries for non-headline queries: {missing}"


def test_headline_covered_by_ref_except_new_adds():
    """New headline adds may lack a ref until the next round-close
    refresh, but the bulk must be covered or the median loses power."""
    ref = bench._load_bench_ref()
    uncovered = [q for q in bench.HEADLINE if q not in ref]
    assert len(uncovered) <= 10, uncovered


def test_median_ratio_is_robust_to_minority_changes():
    ref = {f"q{i}": 1.0 for i in range(100)}
    # host 1.2x slow everywhere; 10 queries genuinely improved 2x
    timings = {f"q{i}": 1.2 for i in range(100)}
    for i in range(10):
        timings[f"q{i}"] = 0.6
    factor, n = bench._host_factor(timings, ref)
    assert n == 100
    assert abs(factor - 1.2) < 1e-9  # the minority didn't move it


def test_small_overlap_disables_normalizer():
    ref = {f"q{i}": 1.0 for i in range(10)}
    factor, n = bench._host_factor({f"q{i}": 1.0 for i in range(10)}, ref)
    assert factor is None and n == 10
    assert bench._host_factor({}, {}) == (None, 0)


def test_tiny_refs_excluded_from_ratio():
    """Sub-0.1 s refs are overhead-dominated; their ratios are noise."""
    ref = {"big": 1.0, "tiny": 0.01}
    factor, n = bench._host_factor({"big": 1.5, "tiny": 0.2}, ref)
    assert n == 1 and abs(factor - 1.5) < 1e-9 if factor else True
    # n=1 < 20 → disabled
    assert factor is None


def test_r9_close_pair_normalizes_to_same_ordering_as_raw():
    """The acceptance criterion from the round-9 verdict: the two full
    round-9 records (IDENTICAL code, raw 83.6 vs 96.5 s in different
    host windows) must normalize to nearly the SAME value under the
    current ref — the old canary normalizer read the faster run as
    slower. Robust to ref refreshes: the invariant is the PAIR's
    agreement, not any absolute pin."""
    import subprocess

    import pytest

    ref = bench._load_bench_ref()
    pair = []
    for rev in ("def4d42", "78574ae"):  # builder 83.6s / driver 96.5s
        try:
            raw = subprocess.run(
                ["git", "show", f"{rev}:bench_out.json"],
                capture_output=True, text=True, cwd=REPO, timeout=30, check=True,
            ).stdout
        except Exception:
            pytest.skip("r9 bench records not reachable via git in this checkout")
        rec = json.loads(raw)
        factor, n = bench._host_factor(rec["queries"], ref)
        assert n >= 140
        pair.append((rec["value"], rec["value"] / factor))
    (raw_a, norm_a), (raw_b, norm_b) = pair
    assert abs(raw_a - 83.649) < 0.01 and abs(raw_b - 96.536) < 0.01
    # 15% apart raw, same code: normalized must collapse to within 5%
    # (measured 0.6% against the r9-only ref, ~3% once the ref mixes
    # in r10-close mins — that residual is the method's noise floor;
    # the q1-canary this replaced read the pair 16% apart INVERTED)
    assert abs(norm_a - norm_b) / norm_a < 0.05, (pair,)


def test_testdata_fingerprint_shape():
    fp = bench._testdata_fingerprint("/root/testdata/sf0.001")
    assert set(fp) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for v in fp.values():
        rows, h = v.split(":")
        assert int(rows) >= 1 and len(h) == 12
