"""Validating sources with quarantine split (SURVEY.md §2.1 S1-S8).

The reference reads JSONL line-by-line, routing malformed JSON / missing
required fields / unparseable timestamps to a bad-records list
(/root/reference/pipeline/ingest.py:28-70).  Spark-first, the same contract
is one PERMISSIVE scan with a corrupt-record column and a three-way filter
split — a single distributed pass, no row-at-a-time Python.

The reference's `_line` number has no cheap distributed analog; bad records
carry the raw line (`_raw`) instead, which is strictly more debuggable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.functions.cleaning import strict_utc_ts
from data_engineering_etl_demo_spark.schemas import RAW_EVENT

REQUIRED_EVENT_FIELDS = ("event_id", "ts", "event")  # pipeline/ingest.py:12


@dataclass
class IngestResult:
    events: DataFrame  # good rows, ts parsed to TimestampType
    bad_records: DataFrame  # quarantined rows tagged with _reason


def read_events_jsonl(spark: SparkSession, path: str) -> IngestResult:
    """S1: JSONL event source with validation + quarantine.

    Split rules (matching /root/reference/pipeline/ingest.py:41-66):
      1. malformed JSON line          → _reason 'json_decode_error'
      2. missing any required field   → _reason 'missing_fields=<names>'
      3. ts present but unparseable   → _reason 'invalid_timestamp'
    Blank lines are dropped by the JSON reader itself.
    """
    raw = (
        spark.read.schema(RAW_EVENT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    parsed_ts = strict_utc_ts(F.col("ts"))

    corrupt = F.col("_corrupt_record").isNotNull()
    missing_list = F.concat_ws(
        ",",
        *[
            F.when(F.col(f).isNull(), F.lit(f))
            for f in REQUIRED_EVENT_FIELDS
        ],
    )
    missing = ~corrupt & (missing_list != "")
    bad_ts = ~corrupt & ~missing & parsed_ts.isNull()

    reason = (
        F.when(corrupt, F.lit("json_decode_error"))
        .when(missing, F.concat(F.lit("missing_fields="), missing_list))
        .when(bad_ts, F.lit("invalid_timestamp"))
    )

    tagged = raw.withColumn("_reason", reason)
    bad = tagged.filter(F.col("_reason").isNotNull()).select(
        "event_id",
        "ts",
        "user_id",
        "event",
        F.col("_reason"),
        F.col("_corrupt_record").alias("_raw"),
    )
    good = (
        tagged.filter(F.col("_reason").isNull())
        .withColumn("ts", parsed_ts)
        .drop("_reason", "_corrupt_record")
    )
    return IngestResult(events=good, bad_records=bad)


def read_users_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: users CSV; user_id kept as trimmed string (the reference's
    numeric Int64 coerce is legacy — transform re-casts to TEXT anyway,
    /root/reference/pipeline/transform.py:78-85)."""
    return (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .csv(path)
        .withColumn("user_id", F.trim(F.col("user_id").cast("string")))
    )


def read_intl_sales_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: optional international-sales JSONL."""
    return spark.read.json(path)


def write_bad_records(bad: DataFrame, path: str) -> None:
    """S6: quarantine sink — one JSON object per line."""
    bad.write.mode("overwrite").json(path)


def write_csv_export(df: DataFrame, path: str) -> None:
    """S7: CSV export sink.  coalesce(1) is export parity with the
    reference's single to_csv file — only ever used on tiny query results
    (SURVEY.md §7 watch-out 7), never on facts."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
