"""Property test: the vectorized gaps-and-islands step (streaming/
pipeline.gap_scan) against a straightforward scalar fold.  The numpy form
is subtle — the round-5 review caught a phantom-empty-segment bug at the
carried-close boundary — so the scalar loop is kept here as the executable
specification and hypothesis drives both across random batches, carried
states, duplicates and late-within-gap rows.  No Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_demo_spark.streaming.pipeline import gap_scan


def scalar_gap_scan(ts, carried, gap_us):
    """The original per-event loop — the executable spec."""
    if carried is not None:
        start, last, n = carried
    else:
        start, last, n = None, None, 0
    closed = []
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_us:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = max(last, t), n + 1
    return closed, (start, last, n)


ts_batches = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
)
gaps = st.sampled_from([1, 7, 100, 1_000])
carried_states = st.one_of(
    st.none(),
    st.tuples(
        st.integers(min_value=0, max_value=2_000),  # start
        st.integers(min_value=0, max_value=4_000),  # last (>= start fixed below)
        st.integers(min_value=1, max_value=50),  # n
    ),
)


@settings(max_examples=300, deadline=None)
@given(raw=ts_batches, carried=carried_states, gap=gaps)
def test_gap_scan_matches_scalar_spec(raw, carried, gap):
    if carried is not None:
        start, last, n = carried
        carried = (start, max(start, last), n)  # state invariant: last >= start
    ts = np.sort(np.asarray(raw, dtype=np.int64))
    got_closed, got_open = gap_scan(ts, carried, gap)
    want_closed, want_open = scalar_gap_scan(sorted(raw), carried, gap)
    assert got_closed == want_closed
    assert got_open == want_open


def test_gap_scan_carried_close_boundary():
    """The exact phantom-segment regression: first batch row breaks the
    carried session — segment 0 must start at that row with n=1, and no
    empty (n=0) session may be emitted."""
    closed, open_s = gap_scan(
        np.array([1_000], dtype=np.int64), (0, 10, 3), gap_us=100
    )
    assert closed == [(0, 10, 3)]
    assert open_s == (1_000, 1_000, 1)


def test_gap_scan_late_row_within_gap_merges_without_regressing_end():
    """A batch row earlier than the carried last (late within the gap)
    joins the session and the session end does not move backward."""
    closed, open_s = gap_scan(
        np.array([50, 60], dtype=np.int64), (0, 100, 2), gap_us=1_000
    )
    assert closed == []
    assert open_s == (0, 100, 4)
