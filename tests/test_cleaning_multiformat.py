"""parse_ts_multiformat vs the CPython strptime chain it cites
(kaggle_amazon_sales_loader.py:40-50 + the noon rule :55-56).  The round-5
review found the exported helper had drifted from the reference (wrong
ambiguity order: dash-separated dates are DAY-first there; missing
formats; Spark's 'yy' century differs from %y) — this pins every format
and the century boundary against datetime.strptime itself."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F  # noqa: F401

from data_engineering_etl_demo_spark.functions.cleaning import (
    parse_ts_multiformat,
)

_REF_FORMATS = [
    "%Y-%m-%d",
    "%d-%m-%Y",
    "%m/%d/%Y",
    "%d/%m/%Y",
    "%Y-%m-%d %H:%M:%S",
    "%m/%d/%Y %H:%M",
    "%d/%m/%Y %H:%M",
    "%m-%d-%y",
    "%d-%m-%y",
]


def _ref(raw: str):
    for f in _REF_FORMATS:
        try:
            dt = datetime.strptime(raw, f)
            if len(raw) <= 10:
                dt = dt.replace(hour=12)
            return dt
        except ValueError:
            pass
    return None


TOKENS = [
    "2024-01-01",  # ISO date
    "05-04-2022",  # dash + 4-digit year: DAY-first per the reference
    "04/05/2022",  # slash: month-first wins when both fit
    "25/04/2022",  # slash day-first fallback (month 25 invalid)
    "2024-01-01 10:20:30",
    "04/05/2022 10:20",
    "25/04/2022 10:20",
    "12-31-99",  # 2-digit year, %y century rule: 99 -> 1999
    "12-31-69",  # boundary: 69 -> 1969
    "12-31-68",  # boundary: 68 -> 2068
    "30-04-22",  # %d-%m-%y fallback (month 30 invalid)
    "garbage",
    "",
]


def test_multiformat_chain_matches_cpython_strptime(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], "s string")
    got = {
        r["s"]: r["t"]
        for r in df.select("s", parse_ts_multiformat("s").alias("t")).collect()
    }
    for t in TOKENS:
        assert got[t] == _ref(t), (t, got[t], _ref(t))
