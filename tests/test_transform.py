"""Ported reference unit tests (/root/reference/tests/test_transform.py) —
same fixtures and assertions, rebuilt on Spark DataFrames.  These pin the
transform's exact semantics: dedup keeps the latest ts, string amounts cast
to double, invalid event types are quarantined with a _reason, metrics are
consistent with output, and page-view variants canonicalize to one value."""

import pytest
from pyspark.sql import types as T

from data_engineering_etl_demo_spark.operators.transform import transform

EVENT_FIELDS = [
    ("event_id", T.StringType()),
    ("ts", T.StringType()),
    ("user_id", T.StringType()),
    ("event", T.StringType()),
    ("amount", T.StringType()),
]


def make_events(spark, rows):
    keys = set().union(*[set(r) for r in rows])
    schema = T.StructType(
        [T.StructField(n, t) for n, t in EVENT_FIELDS if n in keys]
    )
    data = [tuple(r.get(f.name) for f in schema.fields) for r in rows]
    return spark.createDataFrame(data, schema)


def make_users(spark, rows):
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("country", T.StringType()),
            T.StructField("signup_source", T.StringType()),
        ]
    )
    data = [(str(r["user_id"]), r["country"], r["signup_source"]) for r in rows]
    return spark.createDataFrame(data, schema)


@pytest.fixture
def users(spark):
    return make_users(
        spark, [{"user_id": 1, "country": "US", "signup_source": "organic"}]
    )


def test_dedup_keeps_latest(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e1", "ts": "2026-01-01T00:00:01Z", "user_id": "1", "event": "signup"},
            {"event_id": "e1", "ts": "2026-01-01T00:00:02Z", "user_id": "1", "event": "signup"},
        ],
    )
    res = transform(events, users)
    out = res.clean.collect()
    assert len(out) == 1
    assert res.bad.count() == 0
    assert res.metrics["dedup_removed"] == 1
    assert out[0]["ts"].isoformat().startswith("2026-01-01T00:00:02")


def test_amount_casting(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e2", "ts": "2026-01-01T00:00:01Z", "user_id": "1",
             "event": "purchase", "amount": "19.99"},
        ],
    )
    res = transform(events, users)
    out = res.clean.collect()
    assert float(out[0]["amount"]) == 19.99
    assert res.bad.count() == 0
    assert res.metrics["invalid_event_type"] == 0


def test_invalid_event_type_quarantined(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e1", "ts": "2026-01-01T00:00:01Z", "user_id": "1", "event": "logout"},
            {"event_id": "e2", "ts": "2026-01-01T00:00:02Z", "user_id": "1", "event": "signup"},
        ],
    )
    res = transform(events, users)
    out = res.clean.collect()
    assert len(out) == 1
    assert out[0]["event"] == "signup"
    bad = res.bad.collect()
    assert len(bad) == 1
    assert bad[0]["event_id"] == "e1"
    assert bad[0]["_reason"] == "invalid_event_type"
    assert res.metrics["invalid_event_type"] == 1


def test_invalid_event_type_goes_to_bad_records(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e_bad", "ts": "2026-01-01T00:00:01Z", "user_id": "1", "event": "logout"},
            {"event_id": "e_ok", "ts": "2026-01-01T00:00:02Z", "user_id": "1", "event": "signup"},
        ],
    )
    res = transform(events, users)
    out = res.clean.collect()
    assert len(out) == 1
    assert out[0]["event"] == "signup"
    bad = res.bad.collect()
    assert len(bad) == 1
    assert bad[0]["_reason"] == "invalid_event_type"
    assert res.metrics["invalid_event_type"] == 1


def test_metrics_rows_out_matches_output_rows(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e1", "ts": "2026-01-01T00:00:01Z", "user_id": "1", "event": "signup"},
            {"event_id": "e2", "ts": "2026-01-01T00:00:02Z", "user_id": None, "event": "pageview"},
        ],
    )
    res = transform(events, users)
    out = res.clean.collect()
    assert res.metrics["rows_out"] == len(out)
    assert res.metrics["null_user_id"] == sum(1 for r in out if r["user_id"] is None)


def test_event_normalization_page_view_variants(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e1", "ts": "2026-01-01T00:00:01Z", "user_id": "1", "event": "page_view"},
            {"event_id": "e2", "ts": "2026-01-01T00:00:02Z", "user_id": "1", "event": "Page View"},
            {"event_id": "e3", "ts": "2026-01-01T00:00:03Z", "user_id": "1", "event": "pageview"},
        ],
    )
    res = transform(events, users)
    assert res.metrics["invalid_event_type"] == 0
    assert res.bad.count() == 0
    assert {r["event"] for r in res.clean.collect()} == {"pageview"}


# --- enrichment + sentinel-null coverage beyond the reference tests --------


def test_user_enrichment_left_join(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": "e1", "ts": "2026-01-01T00:00:01Z", "user_id": " 1 ", "event": "signup"},
            {"event_id": "e2", "ts": "2026-01-01T00:00:02Z", "user_id": "999", "event": "signup"},
        ],
    )
    out = {r["event_id"]: r for r in transform(events, users).clean.collect()}
    assert out["e1"]["country"] == "US"  # trimmed join key matched
    assert out["e2"]["country"] is None  # unmatched user survives (left join)


def test_sentinel_user_ids_become_null(spark, users):
    events = make_events(
        spark,
        [
            {"event_id": f"e{i}", "ts": "2026-01-01T00:00:01Z", "user_id": s, "event": "signup"}
            for i, s in enumerate(["", "nan", "None", "<NA>", "7"])
        ],
    )
    res = transform(events, users)
    assert res.metrics["null_user_id"] == 4
    assert res.metrics["rows_out"] == 5
