"""Self-test for scripts_bench_diff.py (the mechanized bench-protocol
diff, PLANS.md "Bench protocol — comparison base").

The tool is only evidence if its bars can't rot: pin that a crosser
must exceed BOTH bars (>1.5x AND >0.3 s), that sub-bar noise is not
flagged, and that the bar constants match the ones the protocol (and
every NOTES per-query diff) cites.
"""

import scripts_bench_diff as bd


def test_bar_constants_match_protocol():
    assert bd.RATIO_BAR == 1.5
    assert bd.ABS_BAR_SEC == 0.3


def test_both_bars_required():
    base = {
        "big_ratio_small_abs": 0.10,   # 3x but +0.2 s -> not a crosser
        "big_abs_small_ratio": 2.00,   # +0.5 s but 1.25x -> not a crosser
        "both": 0.40,                  # 2x and +0.4 s -> crosser
        "improved": 1.00,
    }
    cand = {
        "big_ratio_small_abs": 0.30,
        "big_abs_small_ratio": 2.50,
        "both": 0.80,
        "improved": 0.50,
    }
    out = bd.diff(base, cand)
    assert [r["query"] for r in out["bar_crossers"]] == ["both"]
    assert out["n_shared"] == 4


def test_membership_drift_is_reported_not_crashed():
    out = bd.diff({"a": 1.0, "gone": 1.0}, {"a": 1.0, "new": 1.0})
    assert out["only_in_base"] == ["gone"]
    assert out["only_in_cand"] == ["new"]
    assert out["bar_crossers"] == []


def test_zero_base_is_infinite_crosser_not_crash():
    """A hand-edited/truncated detail file can carry a 0.0 timing; a
    positive candidate over a zero base is an infinite-ratio crosser
    (both bars trivially exceeded), never a ZeroDivisionError, and it
    sorts ahead of every finite crosser (ADVICE r13)."""
    out = bd.diff({"z": 0.0, "finite": 0.4}, {"z": 0.5, "finite": 0.9})
    names = [r["query"] for r in out["bar_crossers"]]
    assert names == ["z", "finite"]
    assert out["bar_crossers"][0]["ratio"] == "inf"
    # zero base + zero-ish candidate under the abs bar stays quiet
    assert bd.diff({"z": 0.0}, {"z": 0.2})["bar_crossers"] == []


def test_inverse_bar_reports_improvements_symmetrically():
    """An improvement must shrink by BOTH >1.5x and >0.3 s — the same
    double bar mirrored, so "flat round" claims and claimed
    optimizations are verified with the same noise floor as
    regressions."""
    base = {
        "big_ratio_small_abs": 0.30,   # 3x faster but -0.2 s -> no
        "big_abs_small_ratio": 2.50,   # -0.5 s but only 1.25x -> no
        "both": 0.80,                  # 2x faster and -0.4 s -> yes
        "regressed": 0.40,
    }
    cand = {
        "big_ratio_small_abs": 0.10,
        "big_abs_small_ratio": 2.00,
        "both": 0.40,
        "regressed": 0.80,
    }
    out = bd.diff(base, cand)
    assert [r["query"] for r in out["improvements"]] == ["both"]
    assert [r["query"] for r in out["bar_crossers"]] == ["regressed"]
