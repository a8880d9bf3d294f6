"""Semantic properties of the gap-fill and anomaly queries that the
hash-parity check can't express: the grid must be COMPLETE (every type ×
every day, zeros included) and the MAD flags must match an independent
recomputation from the day aggregates."""

from __future__ import annotations

from data_engineering_etl_demo_spark.plans import all_specs

SF_DIR = "/root/testdata/sf0.001"


def test_gapfill_grid_is_complete_with_zeros(spark):
    rows = all_specs()["events_gapfill_daily"].spark_fn(spark, SF_DIR).collect()
    types = {r["event_type"] for r in rows}
    days = {r["day_us"] for r in rows}
    # complete cross product — densification actually densified
    assert len(rows) == len(types) * len(days)
    # and the fill produced explicit zeros (the high-value filter is sparse)
    assert any(r["n"] == 0 for r in rows)
    assert any(r["n"] > 0 for r in rows)


def test_anomaly_flags_match_recomputation(spark):
    rows = (
        all_specs()["events_revenue_anomaly_days"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    revs = sorted(
        (round(r["revenue"] * 1000000), r["day_us"]) for r in rows
    )
    med = revs[(len(revs) + 1) // 2 - 1][0]
    ads = sorted(
        (abs(round(r["revenue"] * 1000000) - med), r["day_us"]) for r in rows
    )
    mad = ads[(len(ads) + 1) // 2 - 1][0]
    for r in rows:
        expect = 1 if abs(round(r["revenue"] * 1000000) - med) > 2 * mad else 0
        assert r["is_anomaly"] == expect, r
