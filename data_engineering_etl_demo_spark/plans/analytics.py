"""Reference analytics parity queries (SURVEY.md §2.4 A1-A5, §2.6 O2, §2.2 P1).

The reference runs five SQL queries over its SQLite star schema
(/root/reference/pipeline/analytics.py:21-118).  Here each is a Spark
DataFrame plan over the driver's ``events`` table (FIXTURES.md §6 mapping:
event_type→event, value→amount), paired with DuckDB oracle SQL computing the
identical value.

Scale notes (100 TB posture):
- Every aggregate groups on event_date (low cardinality) AFTER a pushed-down
  filter; partial aggregation (map-side combine) happens automatically.
- countDistinct over user_id shuffles by (event_date, user_id) internally —
  at 100 TB that is the correct two-phase distinct plan; no driver collects.
- The preview top-k compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_etl_demo_spark.catalog import load
from data_engineering_etl_demo_spark.functions.cleaning import (
    ALLOWED_EVENTS,
    canonicalize_event,
    money_sum,
)
from data_engineering_etl_demo_spark.functions.hashing import (
    md5_stream,
    sql_md5_stream,
)
from data_engineering_etl_demo_spark.plans import register
from data_engineering_etl_demo_spark.sources.generator import (
    INVALID_GEN_EVENTS as _GEN_INVALID,
)

# ---------------------------------------------------------------------------
# Shared silver view of the events table + the matching oracle SQL fragments
# ---------------------------------------------------------------------------


def events_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver events table → reference 'clean events' shape: canonical event
    name (F1-F3), event_date string (F11), amount (value), epoch-µs ts."""
    return load(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.col("ts"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("user_id"),
        canonicalize_event(F.col("event_type")).alias("event"),
        F.col("value").alias("amount"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").alias("event_hour"),
        F.col("props"),
    )


# DuckDB-side equivalents of canonicalize_event / event_date / money_sum.
SQL_CANON = (
    "(CASE WHEN regexp_replace(lower(trim(event_type)), '[-\\s]+', '_', 'g')"
    " IN ('page_view', 'pageview', 'view') THEN 'pageview'"
    " ELSE regexp_replace(lower(trim(event_type)), '[-\\s]+', '_', 'g') END)"
)
SQL_EVENT_DATE = "strftime(ts, '%Y-%m-%d')"


def sql_money_sum(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of cleaning.money_sum (fixed-point long sum)."""
    return (
        f"ROUND(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) / 1000000.0, {scale})"
    )


# ---------------------------------------------------------------------------
# A1 — DAU (/root/reference/pipeline/analytics.py:21-35)
# ---------------------------------------------------------------------------


@register(
    "dau",
    f"""
    SELECT {SQL_EVENT_DATE} AS event_date,
           COUNT(DISTINCT user_id) AS dau
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
    doc="A1: daily distinct active users, null users excluded (P2).",
)
def q_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_silver(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_date")
        .agg(F.countDistinct("user_id").alias("dau"))
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# A2 — daily revenue over purchases (/root/reference/pipeline/analytics.py:38-52)
# ---------------------------------------------------------------------------


@register(
    "revenue",
    f"""
    SELECT {SQL_EVENT_DATE} AS event_date,
           {sql_money_sum('COALESCE(value, 0)')} AS revenue
    FROM events
    WHERE {SQL_CANON} = 'purchase'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="A2: ROUND(SUM(COALESCE(amount,0)),2) per day over purchases (P3).",
)
def q_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_silver(spark, sf_dir)
        .filter(F.col("event") == "purchase")
        .groupBy("event_date")
        .agg(money_sum(F.coalesce(F.col("amount"), F.lit(0.0))).alias("revenue"))
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# A4 — event counts per (day, event) (/root/reference/pipeline/analytics.py:71-86)
# ---------------------------------------------------------------------------


@register(
    "event_counts",
    f"""
    SELECT {SQL_EVENT_DATE} AS event_date,
           {SQL_CANON} AS event,
           COUNT(*) AS events
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="A4: COUNT(*) per (event_date, event) after canonicalization.",
)
def q_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_silver(spark, sf_dir)
        .groupBy("event_date", "event")
        .agg(F.count(F.lit(1)).alias("events"))
        .orderBy("event_date", "event")
    )


# ---------------------------------------------------------------------------
# A5 — signup→purchase funnel (/root/reference/pipeline/analytics.py:89-118)
# ---------------------------------------------------------------------------


@register(
    "funnel",
    f"""
    WITH daily AS (
        SELECT {SQL_EVENT_DATE} AS event_date,
               COUNT(DISTINCT CASE WHEN {SQL_CANON} = 'signup' THEN user_id END) AS signup_users,
               COUNT(DISTINCT CASE WHEN {SQL_CANON} = 'purchase' THEN user_id END) AS purchasers
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY 1
    )
    SELECT event_date, signup_users, purchasers,
           CASE WHEN signup_users = 0 THEN 0.0
                ELSE ROUND(1.0 * purchasers / signup_users, 4)
           END AS signup_to_purchase_rate
    FROM daily
    ORDER BY event_date
    """,
    doc="A5: conditional distinct counts + zero-guarded ratio (F8).",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        events_silver(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_date")
        .agg(
            F.countDistinct(
                F.when(F.col("event") == "signup", F.col("user_id"))
            ).alias("signup_users"),
            F.countDistinct(
                F.when(F.col("event") == "purchase", F.col("user_id"))
            ).alias("purchasers"),
        )
    )
    return daily.select(
        "event_date",
        "signup_users",
        "purchasers",
        F.when(F.col("signup_users") == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(1.0) * F.col("purchasers") / F.col("signup_users"), 4))
        .alias("signup_to_purchase_rate"),
    ).orderBy("event_date")


# ---------------------------------------------------------------------------
# A3 — international revenue analog (/root/reference/pipeline/analytics.py:55-68)
# on the orders table: substr(ts,1,10) date bucket (F4) + money sum.
# ---------------------------------------------------------------------------


@register(
    "intl_revenue",
    f"""
    SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 10) AS event_date,
           {sql_money_sum('COALESCE(o_totalprice, 0)')} AS intl_revenue
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    doc="A3: GROUP BY substr(ts,1,10) derived expr + ROUND(SUM(COALESCE)).",
)
def q_intl_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.substring(F.col("o_orderdate").cast("string"), 1, 10).alias("event_date")
        )
        .agg(
            money_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias(
                "intl_revenue"
            )
        )
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# J3 + O2 — enriched preview: events ⟕ dim, ORDER BY ts LIMIT 50
# (/root/reference/pipeline/run_pipeline.py:82-102)
# ---------------------------------------------------------------------------


@register(
    "events_preview",
    """
    SELECT e.event_id,
           epoch_us(e.ts) AS ts_us,
           e.user_id,
           c.c_name AS user_name,
           c.c_mktsegment AS segment,
           e.value AS amount
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    ORDER BY ts_us, e.event_id
    LIMIT 50
    """,
    doc="J3+O2: left join onto dim + top-k by ts (TakeOrderedAndProject).",
)
def q_events_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(
            F.broadcast(cust), ev["user_id"] == cust["c_custkey"], "left"
        )
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            F.col("c_name").alias("user_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("value").alias("amount"),
        )
        .orderBy("ts_us", "event_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# P1 — quarantine split: disallowed event types with _reason tag
# (/root/reference/pipeline/transform.py:53-70)
# ---------------------------------------------------------------------------


@register(
    "quarantine_invalid_events",
    f"""
    SELECT event_id,
           epoch_us(ts) AS ts_us,
           user_id,
           {SQL_CANON} AS event,
           'invalid_event_type' AS _reason
    FROM events
    WHERE {SQL_CANON} NOT IN ('pageview', 'signup', 'purchase')
    ORDER BY event_id
    """,
    doc="P1: anti-split of disallowed events, 4-col projection + _reason.",
)
def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_silver(spark, sf_dir)
        .filter(~F.col("event").isin(*ALLOWED_EVENTS))
        .select(
            "event_id",
            "ts_us",
            "user_id",
            "event",
            F.lit("invalid_event_type").alias("_reason"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Generated dirty data through the quarantine path, at table volume
# (the fuzz scenarios of /root/reference/scripts/generate_events.py:23-49,
# rates: ~10% invalid event types, ~5% null users, ~0.2% bad timestamps)
# ---------------------------------------------------------------------------


def _sql_h8(salt: str) -> str:
    """DuckDB: first 8 md5 hex chars of salt||event_id as BIGINT (the
    engine-portable pseudo-random stream; mirror of the Spark
    hashing.md5_stream)."""
    return sql_md5_stream(f"'{salt}' || CAST(event_id AS VARCHAR)")


def _spark_h8(salt: str) -> F.Column:
    return md5_stream(salt, F.col("event_id"))


@register(
    "events_generated_quarantine",
    f"""
    WITH c AS (
        SELECT event_id, user_id, value,
               CASE WHEN {_sql_h8('dirty_ts:')} % 1000 < 2
                    THEN NULL ELSE ts END AS ts2,
               CASE WHEN {_sql_h8('dirty_nu:')} % 100 < 5
                    THEN NULL ELSE user_id END AS user2,
               CASE WHEN {_sql_h8('dirty_inv:')} % 100 < 10
                    THEN list_extract(
                        ['click', 'logout', 'refund_requested'],
                        CAST({_sql_h8('dirty_which:')} % 3 + 1 AS INT))
                    ELSE {SQL_CANON} END AS event2
        FROM events
    ),
    v AS (
        SELECT event_id, user2,
               CASE WHEN ts2 IS NULL THEN 'quarantined_bad_ts'
                    WHEN event2 NOT IN ('pageview', 'signup', 'purchase')
                        THEN 'quarantined_invalid_event'
                    WHEN user2 IS NULL THEN 'kept_null_user'
                    ELSE 'kept' END AS verdict
        FROM c
    )
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user2) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM v
    GROUP BY 1
    ORDER BY 1
    """,
    doc="The quarantine path fuzzed at table volume: every event row is "
    "deterministically corrupted with the reference fuzz generator's "
    "scenarios (generate_events.py rates — ~10% disallowed event types "
    "drawn from its invalid list, ~5% null users, ~0.2% unparseable "
    "timestamps, each decided by an independent md5 stream so the "
    "'randomness' is engine-portable and parallelism-invariant), then "
    "classified with the S1/P1/P2 precedence: ingest ts check first, "
    "transform anti-split second, null-user metric exclusion third.  "
    "The per-verdict census pins both the corruption streams and the "
    "classification order; the file-based twin of this fuzz "
    "(sources/generator.generate_dirty_events) drives the REAL JSONL "
    "ingest in tests/test_generator.py.  One scan, one 4-group agg — "
    "the shape survives any scale.",
)
def q_events_generated_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ts2 = F.when(
        _spark_h8("dirty_ts:") % 1000 < 2, F.lit(None)
    ).otherwise(F.col("ts"))
    user2 = F.when(
        _spark_h8("dirty_nu:") % 100 < 5, F.lit(None)
    ).otherwise(F.col("user_id"))
    event2 = F.when(
        _spark_h8("dirty_inv:") % 100 < 10,
        F.element_at(
            F.array(*[F.lit(e) for e in _GEN_INVALID]),
            (_spark_h8("dirty_which:") % 3 + 1).cast("int"),
        ),
    ).otherwise(canonicalize_event(F.col("event_type")))
    verdict = (
        F.when(ts2.isNull(), F.lit("quarantined_bad_ts"))
        .when(
            ~event2.isin(*ALLOWED_EVENTS), F.lit("quarantined_invalid_event")
        )
        .when(user2.isNull(), F.lit("kept_null_user"))
        .otherwise(F.lit("kept"))
    )
    return (
        ev.select(
            "event_id", verdict.alias("verdict"), user2.alias("user2")
        )
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user2").alias("n_users"),
            F.min("event_id").alias("first_event_id"),
        )
        .orderBy("verdict")
    )


# ---------------------------------------------------------------------------
# A6 — dedup keep-latest-per-key (/root/reference/pipeline/transform.py:72-75)
# Driver event_ids are unique, so the exercised key is (user_id, event):
# keep the row with max ts per key, ties broken by event_id (deterministic —
# SURVEY.md §7 watch-out 1).
# ---------------------------------------------------------------------------


@register(
    "dedup_keep_latest",
    f"""
    SELECT user_id, event, ts_us, amount
    FROM (
        SELECT user_id,
               {SQL_CANON} AS event,
               epoch_us(ts) AS ts_us,
               value AS amount,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, {SQL_CANON}
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event
    """,
    doc="A6: window dedup, latest ts per key, explicit tiebreaker.",
)
def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id", "event")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    return (
        events_silver(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event", "ts_us", "amount")
        .orderBy("user_id", "event")
    )


# ---------------------------------------------------------------------------
# F20 — JSON payload extraction + grouped stats over props
# ---------------------------------------------------------------------------


@register(
    "props_k_stats",
    f"""
    SELECT {SQL_CANON} AS event,
           COUNT(k) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MAX(k) AS max_k
    FROM (
        SELECT event_type,
               TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
        FROM events
    )
    GROUP BY 1
    ORDER BY 1
    """,
    doc="F20: JSON field extraction (regex-portable form) + grouped stats.",
)
def q_props_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        events_silver(spark, sf_dir)
        .withColumn(
            "k", F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
        )
        .groupBy("event")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event")
    )


# ---------------------------------------------------------------------------
# As-of join: purchase → last preceding click attribution
# ---------------------------------------------------------------------------


@register(
    "events_click_attribution",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           p.value AS purchase_value,
           c.event_id AS click_id,
           epoch_us(c.ts) AS click_ts_us,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts < p.ts
    ORDER BY purchase_id
    """,
    doc="as-of join (operators/asof.py): each purchase attributed to the "
    "same user's latest strictly-earlier click; union + single-shuffle "
    "running-window form, oracle is DuckDB's native ASOF JOIN.",
)
def q_events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_etl_demo_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    j = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["event_id", "ts"],
        strict=True,
        tiebreak="event_id",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
        F.col("asof_event_id").alias("click_id"),
        F.unix_micros("asof_ts").alias("click_ts_us"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# Semi-structured props via Spark 4 VariantType (the native JSON path)
# ---------------------------------------------------------------------------


@register(
    "events_props_variant",
    f"""
    SELECT {SQL_CANON} AS event,
           CAST(COUNT(k) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
           MIN(k) AS min_k
    FROM (
        SELECT event_type,
               TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Semi-structured extraction through Spark 4's native VARIANT "
    "path: props parses once into a VariantType value "
    "(try_parse_json — binary-encoded, shreddable) and the field comes "
    "out typed via try_variant_get with a JSON path — the modern "
    "engine-native alternative to props_k_stats' regex-portable form, "
    "with real JSON semantics (nested paths, type coercion, malformed "
    "rows → NULL instead of silent mis-parses).  The oracle uses "
    "DuckDB's json_extract on the same path; both engines agree on "
    "every typed value this corpus produces.  Plan: pure column "
    "expressions into the canonical-event aggregate — variant decode "
    "is JVM-side, no UDF, same one-pass shape as every census here.",
)
def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.try_variant_get(
        F.try_parse_json(F.col("props")), "$.k", "long"
    ).alias("k")
    return (
        events_silver(spark, sf_dir)
        .select("event", k)
        .groupBy("event")
        .agg(
            F.count("k").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
            F.min("k").alias("min_k"),
        )
        .orderBy("event")
    )
