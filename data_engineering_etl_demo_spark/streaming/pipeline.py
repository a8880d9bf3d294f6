"""Structured-Streaming variant of the ingest→dedup→upsert pipeline
(SURVEY.md §2.9 / §7 Phase 7).

The reference is batch-only; its streaming-shaped properties are (a)
append-grain event input, (b) idempotent re-run via MERGE upserts
(pipeline/load.py:205-214,286-292), (c) dedup-by-key keep-latest
(pipeline/transform.py:72-75).  This module reproduces exactly those three
as a streaming topology:

    readStream (file source, explicit schema)
      → withWatermark + dropDuplicatesWithinWatermark   (retransmit guard)
      → windowed aggregation                            (late-data tolerant)
      → foreachBatch MERGE into the parquet warehouse   (idempotent upsert)

plus a custom stateful operator (user sessionization) via
``applyInPandasWithState`` — the Spark-native form of a stateful
per-key stream transform.

Scale notes: dropDuplicatesWithinWatermark keys state by event_id and
evicts at the watermark, so state is bounded by (rate × delay), not by
stream history; the windowed agg shuffles once on (window, event_type);
the foreachBatch merge rewrites only the fact partitions touched by the
micro-batch keys.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Canonical event-stream schema (the reference's events.jsonl contract:
# pipeline/ingest.py:12 requires {event_id, ts, event}).
EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source JSONL stream with the canonical event schema (the
    streaming analog of ingest.read_events_jsonl).

    ``max_files_per_trigger`` bounds each micro-batch to N input files —
    with availableNow the backlog then drains as SEVERAL ordered
    micro-batches instead of one, which is how the multi-batch tests prove
    state/watermark/timeout semantics across batch boundaries (a real
    deployment sets it for ingest smoothing)."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir)


def dedup_within_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Retransmission guard: drop repeats of (event_id) seen within the
    watermark.  Unlike the batch keep-latest dedup (A6), a stream must decide
    on arrival — first-arrival wins; the downstream MERGE still converges to
    last-writer-wins across micro-batches."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", delay: str = "10 minutes"
) -> DataFrame:
    """Late-data-tolerant tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), F.col("event"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event",
            "events",
        )
    )


def foreach_batch_merge(warehouse_path: str):
    """foreachBatch sink: MERGE each micro-batch into a parquet fact table,
    last-writer-wins on event_id (ties: later ts, then later batch).  The
    same recompute-safe upsert the batch Warehouse uses — re-running the
    stream over overlapping input converges (idempotent)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staged = batch_df.withColumn("_batch", F.lit(batch_id))
        path = Path(warehouse_path)
        old = str(path) + ".old"
        # Crash recovery before reading: a crash between the two renames
        # below leaves the previous table stranded in .old with no live
        # dir — restore it so the retried micro-batch (at-least-once
        # semantics) merges against the full history instead of silently
        # rebuilding from only the current batch.  A stale .old alongside
        # a live dir is leftover garbage from a crash after the second
        # rename; clear it so os.rename(path, old) can't hit ENOTEMPTY.
        if os.path.exists(old):
            if not path.exists():
                os.rename(old, str(path))
            else:
                shutil.rmtree(old, ignore_errors=True)
        if path.exists() and any(path.iterdir()):
            current = spark.read.parquet(warehouse_path)
            staged = current.unionByName(staged)
        from pyspark.sql.window import Window

        w = Window.partitionBy("event_id").orderBy(
            F.col("ts").desc(), F.col("_batch").desc()
        )
        winner = (
            staged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # Materialize to staging, then rename-swap (same pattern as the
        # batch Warehouse._swap_write): the live directory is never
        # half-written.  The swap is two renames, not atomic — a crash
        # between them leaves the table in .old, which the recovery block
        # above restores on the retried batch.  os.rename/shutil.rmtree
        # assume warehouse_path is on the LOCAL filesystem (matching the
        # local-only batch Warehouse); an HDFS/S3 sink would need the
        # Hadoop FileSystem API instead.
        tmp = str(path) + ".staging"
        winner.write.mode("overwrite").parquet(tmp)
        if path.exists():
            os.rename(str(path), old)
        os.rename(tmp, str(path))
        shutil.rmtree(old, ignore_errors=True)

    return merge


def sessionize(
    events: DataFrame, gap_minutes: int = 30, flush_on_timeout: bool = False
) -> DataFrame:
    """Custom stateful operator: per-user sessions with an inactivity gap,
    via applyInPandasWithState.  A session CLOSES (and is emitted) when a
    later event for the same user arrives more than ``gap_minutes`` after
    the session's last event; still-open sessions remain in state.

    ``flush_on_timeout=True`` is the production variant: EventTimeTimeout
    also emits a session once the WATERMARK passes its last event + gap —
    idle users flush without waiting for their next arrival.  The input
    must carry a watermark; sessions idle less than the watermark delay at
    end-of-stream stay open (that is the semantics, not a defect — the
    matching batch oracle applies the same cutoff)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def emit(rows: list[tuple]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [c[0] for c in rows],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in rows],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in rows],
                    "n_events": [c[3] for c in rows],
                }
            )

        if flush_on_timeout and state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit([(key[0], start_us, last_us, n)])
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        closed: list[tuple] = []
        # Buffer the group's FULL micro-batch before the gap scan: Arrow
        # hands the group's rows as multiple chunks in arrival order, so
        # sorting per-chunk is not enough — a later chunk can carry an
        # earlier timestamp, which would mis-assign it to the current
        # session (session_start never moves backward).  Only the ts values
        # are buffered (one int per event, pandas ns → µs), not the whole
        # frames.
        all_ts = sorted(int(ts.value) // 1_000 for pdf in pdfs for ts in pdf["ts"])
        for ts_us in all_ts:
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap_us:
                closed.append((key[0], start_us, last_us, n))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us, n = max(last_us, ts_us), n + 1
        state.update((start_us, last_us, n))
        if flush_on_timeout and last_us is not None:
            # fire when the watermark passes the session's gap deadline
            state.setTimeoutTimestamp(last_us // 1_000 + gap_minutes * 60_000)
        if closed:
            yield emit(closed)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if flush_on_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain a bounded stream (availableNow) into a memory sink and return
    the materialized result as a static DataFrame.  Aggregations should pass
    output_mode='complete' so windows still open at the final watermark are
    emitted too.

    The checkpoint goes to a fresh per-run dir on tmpfs when available
    (/dev/shm): the state store fsyncs its delta files at every micro-batch
    commit, which on a disk-backed /tmp dominates small-drain latency.  A
    long-lived production stream would instead point this at durable
    storage (HDFS/S3) — the checkpoint is the recovery contract there."""
    import shutil
    import tempfile
    import uuid

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    ckpt = os.path.join(base, f"spark_graft_ckpt-{query_name}-{uuid.uuid4().hex}")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(query_name)


# ---------------------------------------------------------------------------
# Streaming EMA: cross-batch sequential recurrence per key
# ---------------------------------------------------------------------------

EMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ema_e6", T.LongType()),
    ]
)
_EMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def value_ema(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user exponential moving average
    (alpha = 2/10) carried ACROSS micro-batches via applyInPandasWithState
    — the streaming form of the batch array-fold (plans/timeseries
    events_value_ema), and a recurrence no windowed aggregation can
    express.

    Input must carry (user_id, ts, event_id, v6) with v6 the fixed-point
    value (computed Spark-side so rounding matches the batch query
    bit-for-bit).  Each micro-batch's rows are buffered and folded in
    (ts, event_id) order on top of the carried state, and the CUMULATIVE
    (n_events, ema) is emitted per batch; the caller keeps each user's
    row with the highest n_events (n grows monotonically).  Exactness
    across batches requires per-user event-time-ordered arrival — true
    for a replayed file source and for any log-compacted/keyed feed;
    out-of-order feeds need the watermark-buffered variant of the same
    fold (the state contract is identical).

    State is two LONGs per user — bounded by key cardinality, not by
    stream length.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ema, n = state.get
        else:
            ema, n = 0, 0
        rows = sorted(
            (int(ts.value) // 1_000, int(e), int(v))
            for pdf in pdfs
            for ts, e, v in zip(pdf["ts"], pdf["event_id"], pdf["v6"])
        )
        if not rows:
            return
        for _, _, v in rows:
            ema = v if n == 0 else (2 * v + 8 * ema) // 10
            n += 1
        state.update((ema, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ema_e6": [ema]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EMA_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
