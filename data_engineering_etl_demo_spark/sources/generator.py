"""Bulk dirty-data generator — the distributed form of the reference's
fuzz script (/root/reference/scripts/generate_events.py:23-49), which
clones sample events and injects the three dirty-data scenarios the
quarantine path exists to absorb:

  ~10% disallowed event types  → transform anti-split (P1)
  ~5%  null user_id            → metric exclusion (P2) / dim skip
  N    unparseable timestamps  → ingest quarantine (S1, 'invalid_timestamp')

The reference script is a driver-side ``random``-module loop over ~120
rows; this generator is a ``spark.range`` plan whose per-row decisions are
md5-derived — no RNG state, bit-reproducible at any parallelism, and the
same one-map-pass shape at 120 rows or 10 billion.  Output is a
DataFrame[value: string] of JSONL lines ready for ``.write.text()`` so the
REAL file-based ingest path (sources/ingest.read_events_jsonl) consumes it,
line numbering and all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.functions.hashing import md5_stream

# reference generate_events.py:17-18
ALLOWED_GEN_EVENTS = ("pageview", "signup", "purchase")
INVALID_GEN_EVENTS = ("click", "logout", "refund_requested")


def _hmod(salt: str, col: Column, mod: int) -> Column:
    """md5-derived integer in [0, mod): an independent deterministic
    pseudo-random stream per salt — the same engine-portable trick the
    sampling/sketch queries use."""
    return md5_stream(salt, col) % F.lit(mod)


def _pick(options: tuple[str, ...], idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(o) for o in options]), (idx + F.lit(1)).cast("int")
    )


def generate_dirty_events(
    spark: SparkSession,
    n: int,
    invalid_pct: int = 10,
    null_user_pct: int = 5,
    n_bad_ts: int = 1,
    n_users: int = 40,
) -> DataFrame:
    """JSONL event lines with the reference fuzz scenarios baked in.

    ``invalid_pct``/``null_user_pct`` are integer percentages (the rate
    comparison stays in exact integer arithmetic); the LAST ``n_bad_ts``
    rows carry the reference's literal 'BAD_TIME' timestamp.  Timestamps
    spread over 3 days starting 2026-01-05 like the reference script."""
    rows = spark.range(n)
    rid = F.col("id")
    day = _hmod("gen_day:", rid, 3)
    hh = _hmod("gen_hh:", rid, 24)
    mm = _hmod("gen_mm:", rid, 60)
    ss = _hmod("gen_ss:", rid, 60)
    ts = F.when(
        rid >= F.lit(n - n_bad_ts), F.lit("BAD_TIME")
    ).otherwise(
        F.concat(
            F.date_format(
                F.date_add(F.lit("2026-01-05").cast("date"), day.cast("int")),
                "yyyy-MM-dd",
            ),
            F.format_string("T%02d:%02d:%02dZ", hh, mm, ss),
        )
    )
    event = F.when(
        _hmod("gen_inv:", rid, 100) < F.lit(invalid_pct),
        _pick(INVALID_GEN_EVENTS, _hmod("gen_which_inv:", rid, 3)),
    ).otherwise(_pick(ALLOWED_GEN_EVENTS, _hmod("gen_which_ok:", rid, 3)))
    user_id = F.when(
        _hmod("gen_nu:", rid, 100) < F.lit(null_user_pct), F.lit(None)
    ).otherwise((rid % F.lit(n_users) + F.lit(1)).cast("string"))
    amount = F.when(
        event == "purchase",
        F.format_string(
            "%d.%02d",
            _hmod("gen_amt:", rid, 200) + F.lit(1),
            _hmod("gen_cents:", rid, 100),
        ),
    )
    line = F.to_json(
        F.struct(
            F.format_string("gen_%04d", rid).alias("event_id"),
            ts.alias("ts"),
            user_id.alias("user_id"),
            event.alias("event"),
            amount.alias("amount"),
        ),
        {"ignoreNullFields": "false"},  # reference emits "user_id": null
    )
    return rows.select(line.alias("value"))
