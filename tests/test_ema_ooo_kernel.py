"""Property test: the watermark-buffered EMA step (streaming/pipeline.
ema_ooo_step) composes — for ANY split of a row set into micro-batches and
ANY nondecreasing watermark sequence, chaining steps produces the same
(ema, n) as ONE ordered fold with the final-watermark cutoff.  This is the
stream == batch contract the registered streaming_value_ema_ooo query
hash-checks end-to-end; here hypothesis sweeps the batch/watermark space
the file source can't easily reach.  No Spark session needed."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_etl_demo_spark.streaming.pipeline import ema_ooo_step


def batch_fold_with_cutoff(rows, wm_ms):
    """The executable spec: one event-time-ordered fold over rows at or
    below the watermark (the registered query's oracle shape)."""
    ema, n = 0, 0
    for ts_us, _, v in sorted(rows):
        if ts_us > wm_ms * 1_000:
            continue
        ema = v if n == 0 else (2 * v + 8 * ema) // 10
        n += 1
    return ema, n


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50_000_000),  # ts_us
        st.integers(min_value=0, max_value=1_000_000),  # event_id
        st.integers(min_value=0, max_value=10_000_000),  # v6
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=300, deadline=None)
@given(
    rows=rows_strategy,
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=3),
    wms=st.lists(st.integers(min_value=-1, max_value=60), min_size=1, max_size=4),
)
def test_step_composition_equals_single_fold(rows, cuts, wms):
    # split rows into batches at the (sorted) cut points — arrival order is
    # whatever hypothesis generated, NOT event-time order
    bounds = sorted(set(c for c in cuts if c < len(rows)))
    batches, prev = [], 0
    for c in bounds + [len(rows)]:
        batches.append(rows[prev:c])
        prev = c
    # one watermark per batch, forced nondecreasing (Spark guarantees it);
    # watermark is in ms over the µs domain above
    wms = sorted(wms)[: len(batches)]
    while len(wms) < len(batches):
        wms.append(wms[-1])

    state = None
    delivered = []
    for batch, wm in zip(batches, wms):
        # drop rows Spark's late-record filter would never deliver: a row
        # at or below the watermark of its ARRIVAL batch
        deliverable = [r for r in batch if r[0] > wm * 1_000]
        delivered.extend(deliverable)
        state = ema_ooo_step(state, deliverable, wm)[0]

    final_wm = wms[-1]
    want_ema, want_n = batch_fold_with_cutoff(delivered, final_wm)
    ema, n, rest = state
    assert (ema, n) == (want_ema, want_n)
    # everything left buffered is strictly above the final watermark
    assert all(ts > final_wm * 1_000 for ts, _, _ in rest)


def test_step_rejects_negative_values():
    with pytest.raises(ValueError, match="v6 >= 0"):
        ema_ooo_step(None, [(0, 1, -5)], wm_ms=1)


def test_step_folds_late_row_in_event_time_position():
    """The defining case: a row arriving one batch later but with an
    earlier event time folds in event order: [100@0, 300@2m] then [200@1m]
    = fold([100, 200, 300]) = 156 once the watermark passes."""
    m = 60_000_000
    s1, _ = ema_ooo_step(None, [(1 * m, 10, 100), (3 * m, 12, 300)], wm_ms=0)
    s2, _ = ema_ooo_step(s1, [(2 * m, 11, 200)], wm_ms=0)
    s3, folded = ema_ooo_step(s2, [], wm_ms=20 * 60_000)
    ema, n, rest = s3
    assert (ema, n, rest, folded) == (156, 3, [], 3)


def test_step_rejects_duplicate_delivery():
    """An at-least-once redelivery of a buffered-but-unfolded row must
    fail loudly (ADVICE r5), matching the in-order kernel's contract —
    whether the duplicate arrives within one batch or rides the carried
    buffer into a later one."""
    m = 60_000_000
    with pytest.raises(ValueError, match="duplicate delivery"):
        ema_ooo_step(None, [(1 * m, 10, 100), (1 * m, 10, 100)], wm_ms=0)
    s1, _ = ema_ooo_step(None, [(5 * m, 42, 100)], wm_ms=0)  # stays buffered
    with pytest.raises(ValueError, match="duplicate delivery"):
        ema_ooo_step(s1, [(5 * m, 42, 100)], wm_ms=0)
    # same ts with distinct event_ids is legitimate, not a duplicate
    s2, _ = ema_ooo_step(None, [(5 * m, 1, 100), (5 * m, 2, 200)], wm_ms=0)
    assert len(s2[2]) == 2
