"""Validating sources with quarantine split (SURVEY.md §2.1 S1-S8).

The reference reads JSONL line-by-line, routing malformed JSON / missing
required fields / unparseable timestamps to a bad-records list
(/root/reference/pipeline/ingest.py:28-70).  Spark-first, the same contract
is a text scan + from_json with a corrupt-record column and a three-way
filter split — declarative, no row-at-a-time Python.

`_line` provenance (reference enumerate(f, start=1), ingest.py:41): true
per-file 1-based line numbers, computed distributed — a tiny per-input-split
count pre-pass gives each (file, split) its starting offset, then a window
keyed by (file, split) adds the local index.  The shuffle is keyed by input
split (even by construction, never one-reducer-per-file), and the offset
table is #splits rows.  Numbering includes blank lines (the reference
counts them before skipping), and bad records keep the raw line (`_raw`)
for decode errors exactly as the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_etl_demo_spark.functions.cleaning import strict_utc_ts
from data_engineering_etl_demo_spark.schemas import RAW_EVENT

REQUIRED_EVENT_FIELDS = ("event_id", "ts", "event")  # pipeline/ingest.py:12


@dataclass
class IngestResult:
    events: DataFrame  # good rows, ts parsed to TimestampType
    bad_records: DataFrame  # quarantined rows tagged with _reason + _line


def _numbered_lines(spark: SparkSession, path: str) -> DataFrame:
    """(value, _file, _line): every text line with its per-file 1-based
    line number.  Within one scan partition lines stream in file order,
    and a file's splits are planned offset-ascending (equal-size splits
    keep their relative order through Spark's stable size sort, and the
    odd-size tail is the file's last chunk), so (split-offset + local
    row_number) reproduces the sequential reader's numbering — the same
    foundation RDD.zipWithIndex stands on, but per file and without
    leaving the DataFrame API."""
    txt = spark.read.text(path).select(
        "value",
        F.col("_metadata.file_path").alias("_file"),
        F.spark_partition_id().alias("_pid"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    # pre-pass: rows per (file, split).  #splits rows — driver-safe.
    counts = txt.groupBy("_file", "_pid").count().collect()
    offsets, running = [], {}
    for r in sorted(counts, key=lambda r: (r["_file"], r["_pid"])):
        offsets.append((r["_file"], r["_pid"], running.get(r["_file"], 0)))
        running[r["_file"]] = running.get(r["_file"], 0) + r["count"]
    from data_engineering_etl_demo_spark.functions.local_rows import local_df

    off = local_df(spark, offsets, "_file string, _pid int, _off long")
    w = Window.partitionBy("_file", "_pid").orderBy("_mid")
    return (
        txt.join(F.broadcast(off), on=["_file", "_pid"])
        .withColumn("_line", (F.row_number().over(w) + F.col("_off")))
        .select("value", "_file", "_line")
    )


def read_events_jsonl(spark: SparkSession, path: str) -> IngestResult:
    """S1: JSONL event source with validation + quarantine.

    Split rules (matching /root/reference/pipeline/ingest.py:41-66):
      1. malformed JSON line          → _reason 'json_decode_error'
      2. missing any required field   → _reason 'missing_fields=<names>'
      3. ts present but unparseable   → _reason 'invalid_timestamp'
    Blank lines are counted for `_line` then dropped (reference ingest.py:
    42-44); bad records carry the true source line number.
    """
    numbered = _numbered_lines(spark, path).filter(
        F.trim(F.col("value")) != ""
    )
    raw = numbered.withColumn(
        "_p",
        F.from_json(
            "value",
            RAW_EVENT,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    ).select("_line", F.col("value").alias("_value"), "_p.*")
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
        F.col("_line"),
        F.col("_reason"),
        F.col("_corrupt_record").alias("_raw"),
    )
    good = (
        tagged.filter(F.col("_reason").isNull())
        .withColumn("ts", parsed_ts)
        .drop("_reason", "_corrupt_record", "_line", "_value")
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
