"""Property-based checks (hypothesis) for the fixed-point exactness
helpers every oracle-matched query leans on: the LONG money accumulator
must equal an exact-Decimal reference at ANY permutation/parallelism, and
the floor-truncated ratio/trunc helpers must be pure IEEE functions of
their inputs (no engine/locale/order dependence)."""

from __future__ import annotations

import math
from decimal import Decimal

from hypothesis import given, settings, strategies as st

# 2-dp money values in a realistic range, as the doubles Spark would hold
money = st.integers(min_value=-10**9, max_value=10**9).map(
    lambda c: c / 100.0
)


@settings(max_examples=200, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_fixed_point_sum_is_order_independent_and_decimal_exact(vals):
    """sum of round(x*1e6) as ints == 1e6 * exact Decimal sum, regardless
    of order — the invariant that makes money_sum shuffle-safe."""
    fixed = [int(round(v * 1_000_000)) for v in vals]
    assert sum(fixed) == sum(reversed(fixed)) == sum(sorted(fixed))
    exact = sum(Decimal(str(v)) for v in vals) * 1_000_000
    # round() of the double can differ from exact Decimal scaling only if
    # the double itself misrepresents the 2-dp value — it can't below 2^53
    assert sum(fixed) == int(exact)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**15),
    st.integers(min_value=1, max_value=10**15),
)
def test_floor_truncated_share_is_deterministic_and_bounded(num, den):
    """floor((num/den)*1e6)/1e6 — the _share recipe: pure function of the
    two LONGs, within one ulp-of-1e-6 below the true ratio, never above."""
    num = min(num, den)  # shares are <= 1
    share = math.floor((num / den) * 1_000_000.0) / 1_000_000.0
    assert share == math.floor((num / den) * 1_000_000.0) / 1_000_000.0
    assert 0.0 <= share <= 1.0
    # never overestimates the true rational by construction
    assert Decimal(str(share)) <= (Decimal(num) / Decimal(den)) + Decimal("1e-12")


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=2**62))
def test_integer_bit_length_surprisal_is_exact_log2_floor(x):
    """length(bin(x)) == bit_length == exact floor(log2 x)+1, stated as the
    power-of-two bracket 2^(b-1) <= x < 2^b.  (A libm-based
    floor(log2(x))+1 FAILS this for x near 2^62 — double log2 rounds up at
    2^k - 1 — which is exactly why docs_unigram_surprisal uses bit length
    and not a float log.)"""
    b = len(bin(x)) - 2
    assert b == x.bit_length()
    assert 2 ** (b - 1) <= x < 2 ** b
