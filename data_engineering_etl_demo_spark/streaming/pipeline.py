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
the foreachBatch merge in THIS module rewrites the whole (small, local)
fact table per batch — the partition-pruned variant that only rewrites
touched partitions is operators/warehouse._merge_touched_partitions, which
a production foreachBatch sink would call instead.
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

        # final tiebreak = deterministic whole-row hash: two different
        # rows sharing (event_id, ts) within one batch must pick the SAME
        # winner when the micro-batch is replayed (at-least-once), or the
        # warehouse diverges across retries of identical input
        w = Window.partitionBy("event_id").orderBy(
            F.col("ts").desc(),
            F.col("_batch").desc(),
            F.xxhash64(F.struct(*[F.col(c) for c in batch_df.columns])).desc(),
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


def gap_scan(ts, carried, gap_us: int):
    """Pure vectorized gaps-and-islands step over ONE key's sorted batch:
    ``ts`` is an int64 array of event times (µs, ascending), ``carried``
    the open session from state as (start_us, last_us, n) or None.
    Returns (closed, open_session) where closed is a list of
    (start_us, last_us, n) sessions finished by this batch and
    open_session is the still-open tail to put back in state.

    Semantics (pinned by the scalar reference in
    tests/test_sessionize_kernel.py): the running "previous event" is the
    prefix MAX including the carried last — a batch row may predate the
    carried last (late within gap) and must merge without moving the
    session end backward; a gap strictly greater than ``gap_us`` closes;
    segment 0 always begins at index 0 (brk[0] only decides whether the
    CARRIED session closes — counting index 0 as a boundary would mint a
    phantom empty segment)."""
    import numpy as np

    if carried is not None:
        start0, last0, n0 = carried
        prev = np.maximum.accumulate(np.concatenate(([last0], ts)))[:-1]
    else:
        start0, last0, n0 = None, None, 0
        prev = np.concatenate(([ts[0]], np.maximum.accumulate(ts)[:-1]))
    brk = (ts - prev) > gap_us  # True at i → a new session starts at i
    seg_first = np.concatenate(([0], np.nonzero(brk[1:])[0] + 1))
    seg_start = ts[seg_first]
    seg_last = np.maximum.reduceat(ts, seg_first)
    seg_n = np.diff(np.concatenate((seg_first, [len(ts)])))
    closed: list[tuple[int, int, int]] = []
    if n0:
        if brk[0]:
            # carried session closed by the batch's first row
            closed.append((start0, last0, n0))
        else:
            seg_start[0] = start0
            seg_last[0] = max(last0, seg_last[0])
            seg_n[0] += n0
    # every segment except the final one closes within this batch
    closed.extend(
        (int(s), int(e), int(c))
        for s, e, c in zip(seg_start[:-1], seg_last[:-1], seg_n[:-1])
    )
    open_session = (int(seg_start[-1]), int(seg_last[-1]), int(seg_n[-1]))
    return closed, open_session


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
        import numpy as np

        def emit(starts, lasts, ns) -> pd.DataFrame:
            # vectorized µs→Timestamp conversion: per-session pd.Timestamp
            # objects were the kernel's hottest line at sf0.1 (~190k of
            # them); datetime64 array casts are two array ops
            starts = np.asarray(starts, dtype=np.int64)
            lasts = np.asarray(lasts, dtype=np.int64)
            return pd.DataFrame(
                {
                    "user_id": np.repeat(key[0], len(starts)),
                    "session_start": (starts * 1000).astype("datetime64[ns]"),
                    "session_end": (lasts * 1000).astype("datetime64[ns]"),
                    "n_events": np.asarray(ns, dtype=np.int64),
                }
            )

        if flush_on_timeout and state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit([start_us], [last_us], [n])
            return

        # Buffer the group's FULL micro-batch before the gap scan: Arrow
        # hands the group's rows as multiple chunks in arrival order, so
        # sorting per-chunk is not enough — a later chunk can carry an
        # earlier timestamp, which would mis-assign it to the current
        # session (session_start never moves backward).  Only the ts values
        # are buffered (one int64 per event, pandas ns → µs), not the
        # whole frames.
        raw = np.concatenate(
            [pdf["ts"].to_numpy(dtype="datetime64[ns]") for pdf in pdfs]
        )
        # drop NaT (null ts) rows: casting NaT to int64 yields INT64_MIN,
        # which would wrap the gap arithmetic and silently fuse the whole
        # history into one garbage session.  The watermarked variants never
        # see nulls (Spark filters them), but the no-watermark form does.
        raw = raw[~np.isnat(raw)]
        ts = np.sort(raw.astype("datetime64[us]").astype(np.int64))
        if len(ts) == 0:
            return
        carried = tuple(state.get) if state.exists else None
        closed, (start_us, last_us, n) = gap_scan(ts, carried, gap_us)
        state.update((start_us, last_us, n))
        if flush_on_timeout:
            # fire when the watermark passes the session's gap deadline
            state.setTimeoutTimestamp(last_us // 1_000 + gap_minutes * 60_000)
        if closed:
            yield emit(*zip(*closed))

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


# Session-local SQL confs a drain clone must inherit from its parent: they
# are runtime-set (tune_session / _event_stream), so SparkSession.newSession
# — which re-derives its SQLConf from the SHARED SparkContext conf — would
# silently lose them (UTC wall-clock casts, Arrow batching for the pandas
# state kernels).
_CLONE_INHERITED_CONFS = (
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.adaptive.enabled",
    "spark.sql.legacy.parquet.nanosAsLong",
)

# Drain-session cache: one clone per (parent session, shuffle_partitions),
# REUSED across drains — a fresh newSession() per drain would pay cold
# session state (plan/codegen caches, file listings) on every streaming
# query, which the bench measured at several seconds across the streaming
# segment.  Bounded by the distinct partition counts in use (2-3 entries).
_drain_sessions: dict = {}

# Live memory-sink table per (session, query_name): the sink name is
# per-drain unique (uuid suffix), and starting a NEW drain for the same
# query drops the PREVIOUS generation's table — so the clone's catalog
# holds at most one CATALOG ENTRY per query instead of accruing one per
# drain.  Precisely (ADVICE r7): a DataFrame returned by an earlier
# run_to_completion stays bound to its own MemorySink and keeps reading
# its own rows after the view is dropped (test_round7_infra pins this);
# what fails loudly (TABLE_NOT_FOUND) is a FRESH session.table(old_name)
# lookup.  Dropping the view frees the sink's rows only once callers
# release their DataFrame references — the bound here is on catalog
# entries, while sink memory is bounded by callers not holding old
# results (verify/bench/tests all collect per call and drop them).
_live_sinks: dict = {}


def _prune_dead_drain_state() -> None:
    """Drop drain clones (and their sink bookkeeping) whose shared
    SparkContext has stopped — same dead-session leak class as
    functions.caching._prune_dead_sessions (ADVICE r6): a long-lived
    driver cycling sessions (pytest per module) would otherwise pin every
    stopped clone and its catalog-held memory-sink tables forever.  The
    classification (including the Connect-session "no _sc => keep"
    exemption) is functions.caching.session_is_dead — the single copy
    all four memo prunes share (ADVICE r7)."""
    from data_engineering_etl_demo_spark.functions.caching import (
        session_is_dead,
    )

    for key, session in list(_drain_sessions.items()):
        try:
            dead = session_is_dead(session)
        except Exception:
            dead = True
        if dead:
            _drain_sessions.pop(key, None)
            dead_sk = key[0]
            for skey in [k for k in _live_sinks if k[0] == dead_sk]:
                _live_sinks.pop(skey, None)


def _drain_session(parent, shuffle_partitions: int, no_data_batch: bool = True):
    from data_engineering_etl_demo_spark.catalog import session_key

    _prune_dead_drain_state()
    # no_data_batch is part of the key: the conf is read at query start,
    # so two concurrent drains with different settings must not share a
    # clone (same isolation rationale as shuffle_partitions itself)
    key = (session_key(parent), shuffle_partitions, no_data_batch)
    session = _drain_sessions.get(key)
    if session is None:
        session = parent.newSession()
        _drain_sessions[key] = session
    # refresh inherited runtime confs each call: cheap, and keeps a
    # parent-side tune_session() change (e.g. timezone) visible
    for k in _CLONE_INHERITED_CONFS:
        try:
            session.conf.set(k, parent.conf.get(k))
        except Exception:
            pass  # unset in parent / fixed by the runtime
    session.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    session.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled",
        "true" if no_data_batch else "false",
    )
    return session


def run_to_completion(
    stream,
    query_name: str,
    output_mode: str = "append",
    shuffle_partitions: int | None = None,
    spark: "SparkSession | None" = None,
    no_data_batch: bool = True,
) -> DataFrame:
    """Drain a bounded stream (availableNow) into a memory sink and return
    the materialized result as a static DataFrame.  Aggregations should pass
    output_mode='complete' so windows still open at the final watermark are
    emitted too.

    ``stream`` is either a ready DataFrame or a BUILDER callable
    ``SparkSession -> streaming DataFrame`` (pass ``spark`` too in that
    case).  The builder form is required to use ``shuffle_partitions``:
    the override is applied to a per-drain SESSION CLONE
    (``spark.newSession()`` + the runtime confs above copied over), so the
    shared session's batch parallelism is never mutated — a batch query
    planned concurrently in another thread can no longer observe the
    stream's setting (ADVICE r5).  A DataFrame is already bound to its
    session, whose conf we refuse to mutate — so DataFrame +
    ``shuffle_partitions`` raises.

    The checkpoint goes to a fresh per-run dir on tmpfs when available
    (/dev/shm): the state store fsyncs its delta files at every micro-batch
    commit, which on a disk-backed /tmp dominates small-drain latency.  A
    long-lived production stream would instead point this at durable
    storage (HDFS/S3) — the checkpoint is the recovery contract there.

    ``shuffle_partitions`` pins the stream's state-store partitioning
    independently of the session's batch setting.  Each stateful operator
    keeps one state store PER shuffle partition and every store
    commits+fsyncs every micro-batch, so a JVM-stateful query
    (stream-stream join: FOUR stores/partition) wants few wide partitions,
    while an applyInPandasWithState kernel wants enough partitions to
    spread its Python workers across cores.  The results are
    partition-count-invariant; only latency moves.

    ``no_data_batch=False`` disables the trailing no-data micro-batch
    (``spark.sql.streaming.noDataMicroBatches.enabled``) on the drain
    clone.  That batch exists to advance the watermark with no new input —
    it is what fires EventTimeTimeout callbacks and emits
    watermark-gated rows (closed windows in append mode, outer-join null
    extensions), so it is load-bearing for those operators and MUST stay
    on there.  For drains whose every emission happens on arrival —
    NoTimeout pandas-state kernels, inner stream-stream joins,
    complete-mode aggregations (whose sink is replaced wholesale each
    batch) — it runs a full trigger cycle (plan, state-store commit+fsync
    per partition, offset/commit WAL) that changes nothing, a measured
    ~0.2-0.5 s per drain at sf0.1.  Results are identical by
    construction; only the drains listed per-query in
    plans/streaming_plans.py opt out.  Requires the builder form with
    ``shuffle_partitions`` (the conf lives on the clone session)."""
    import shutil
    import tempfile
    import uuid

    if callable(stream):
        if spark is None:
            raise ValueError("builder form requires the parent session")
        if shuffle_partitions is not None:
            session = _drain_session(spark, shuffle_partitions, no_data_batch)
        elif not no_data_batch:
            raise ValueError(
                "no_data_batch=False needs the builder form with "
                "shuffle_partitions: the conf is applied to a drain clone, "
                "never to the shared session"
            )
        else:
            session = spark
        stream_df = stream(session)
    else:
        if shuffle_partitions is not None:
            raise ValueError(
                "shuffle_partitions needs the builder form: a prebuilt "
                "DataFrame would require mutating its shared session conf"
            )
        if not no_data_batch:
            raise ValueError(
                "no_data_batch=False needs the builder form with "
                "shuffle_partitions: the conf is applied to a drain clone, "
                "never to the shared session"
            )
        stream_df = stream
        session = stream_df.sparkSession

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    run_id = uuid.uuid4().hex
    ckpt = os.path.join(base, f"spark_graft_ckpt-{query_name}-{run_id}")
    # Per-drain-unique sink name in a REUSED clone session: a repeated
    # drain under the bare query_name would silently replace the memory
    # table underneath any still-referenced DataFrame from the earlier
    # drain (ADVICE r6).  The previous generation's table is dropped now —
    # every caller fully consumes a drain's result before re-draining the
    # same query (verify/bench/tests all collect per call), so only a
    # genuinely stale reference can observe the drop, and it now fails
    # loudly instead of reading the wrong rows.
    from data_engineering_etl_demo_spark.catalog import session_key

    sink = f"{query_name}_{run_id[:12]}"
    sink_key = (session_key(session), query_name)
    prev_sink = _live_sinks.pop(sink_key, None)
    if prev_sink is not None:
        try:
            # a memory sink registers as a session temp view
            session.catalog.dropTempView(prev_sink)
        except Exception:
            pass  # session torn down mid-suite — nothing to free
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    except BaseException:
        # failed drain: drop the partial uuid-named sink view, or it
        # leaks in the clone's catalog with no bookkeeping entry
        try:
            session.catalog.dropTempView(sink)
        except Exception:
            pass
        raise
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    _live_sinks[sink_key] = sink
    return session.table(sink)


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
        # last folded row, for runtime detection of out-of-order arrival
        # across micro-batches (ADVICE r4): an ordered-arrival violation
        # must fail loudly, not silently diverge from the batch oracle
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def _extract_rows(pdfs, sort: bool = True) -> list:
    """(ts_us, event_id, v6) triples of one key's micro-batch, NaT rows
    dropped.  Column-level numpy casts instead of per-row pd.Timestamp
    iteration — the naive zip over pdf columns materialized a Timestamp
    object per row and was the EMA kernels' hottest path at sf0.1 (~33k
    rows/batch); the datetime64 view is two array ops.  ``sort`` orders by
    (ts_us, event_id) via lexsort (the fold order); the ooo kernel merges
    with its carried buffer first, so it sorts later."""
    import numpy as np

    ts_parts, eid_parts, v_parts = [], [], []
    for pdf in pdfs:
        t = pdf["ts"].to_numpy(dtype="datetime64[ns]")
        keep = ~np.isnat(t)  # NaT casts to INT64_MIN, not a timestamp
        ts_parts.append(t[keep].astype("datetime64[us]").astype(np.int64))
        eid_parts.append(pdf["event_id"].to_numpy(dtype=np.int64)[keep])
        v_parts.append(pdf["v6"].to_numpy(dtype=np.int64)[keep])
    if not ts_parts:
        return []
    ts = np.concatenate(ts_parts)
    if len(ts) == 0:
        return []
    eid = np.concatenate(eid_parts)
    v = np.concatenate(v_parts)
    if sort:
        order = np.lexsort((eid, ts))
        ts, eid, v = ts[order], eid[order], v[order]
    return list(zip(ts.tolist(), eid.tolist(), v.tolist()))


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
    for a replayed file source and for any log-compacted/keyed feed —
    and the kernel ENFORCES it: the last folded (ts, event_id) rides in
    the state, and a batch whose earliest row precedes it raises instead
    of silently diverging from the batch oracle.  Out-of-order feeds use
    ``value_ema_ooo`` (same state contract plus a watermark buffer).

    The fold uses Python floor division, which equals the batch query's
    ``div`` (truncation toward zero) only for non-negative operands —
    so the kernel also asserts v6 >= 0 (a future signed value source
    must fail loudly, not drift in the last unit).

    State is four LONGs per user — bounded by key cardinality, not by
    stream length.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ema, n, last_ts, last_eid = state.get
        else:
            ema, n, last_ts, last_eid = 0, 0, -1, -1
        rows = _extract_rows(pdfs)
        if not rows:
            return
        if n > 0 and rows[0][:2] <= (last_ts, last_eid):
            # <= : an exact redelivery of the last folded row (same ts AND
            # event_id) is a duplicate, which would fold twice — as loud a
            # contract violation as a reordering
            raise ValueError(
                f"value_ema requires per-user event-time-ordered arrival "
                f"across micro-batches: user {key[0]} got row "
                f"(ts_us={rows[0][0]}, event_id={rows[0][1]}) after state "
                f"(ts_us={last_ts}, event_id={last_eid}); use value_ema_ooo "
                f"for out-of-order sources"
            )
        for _, _, v in rows:
            if v < 0:
                raise ValueError(
                    "value_ema fold requires v6 >= 0: floor division "
                    "diverges from the batch oracle's trunc-toward-zero "
                    f"div on negatives (user {key[0]}, v6={v})"
                )
            ema = v if n == 0 else (2 * v + 8 * ema) // 10
            n += 1
        last_ts, last_eid = rows[-1][0], rows[-1][1]
        state.update((ema, n, last_ts, last_eid))
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


_EMA_OOO_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema", T.LongType()),
        T.StructField("n", T.LongType()),
        # watermark buffer: rows not yet folded because their event time is
        # still above the watermark (a later batch may deliver earlier rows)
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_v", T.ArrayType(T.LongType())),
    ]
)


def ema_ooo_step(carried, new_rows, wm_ms: int):
    """Pure per-key step of the watermark-buffered EMA: merge the carried
    buffer with this batch's rows, fold the ≤-watermark prefix in
    (ts_us, event_id) order on top of the carried (ema, n), keep the rest
    buffered.  ``carried`` is (ema, n, rows) or None; returns
    ((ema, n, rest_rows), n_folded).

    The composition property pinned by tests/test_ema_ooo_kernel.py: for
    ANY split of a row set into batches and ANY nondecreasing watermark
    sequence, chaining steps yields the same (ema, n) as one ordered fold
    with the final-watermark cutoff — the stream == batch contract.

    Exact duplicates raise: an at-least-once redelivery of a
    buffered-but-unfolded (ts_us, event_id) row would otherwise fold twice
    silently — the same contract violation the in-order ``value_ema``
    fails loudly on (ADVICE r5).  (ts_us, event_id) is the row identity,
    so equal pairs in the merged buffer can only be redelivery."""
    ema, n, rows = carried if carried is not None else (0, 0, [])
    rows = rows + list(new_rows)
    rows.sort()
    for prev, cur in zip(rows, rows[1:]):
        if prev[:2] == cur[:2]:
            raise ValueError(
                "value_ema_ooo got a duplicate delivery of row "
                f"(ts_us={cur[0]}, event_id={cur[1]}): at-least-once "
                "redelivery would fold twice; dedupe upstream "
                "(dedup_within_watermark) for at-least-once sources"
            )
    cutoff_us = wm_ms * 1_000
    folded = 0
    for ts_us, _, v in rows:
        if ts_us > cutoff_us:
            break
        if v < 0:
            raise ValueError(
                "value_ema_ooo fold requires v6 >= 0: floor division "
                "diverges from the batch oracle's trunc-toward-zero "
                f"div on negatives (v6={v})"
            )
        ema = v if n == 0 else (2 * v + 8 * ema) // 10
        n += 1
        folded += 1
    return (ema, n, rows[folded:]), folded


def value_ema_ooo(events: DataFrame) -> DataFrame:
    """The out-of-order-tolerant variant of ``value_ema``: same per-user
    EMA recurrence and the same (ema, n) state contract, plus a WATERMARK
    BUFFER — rows are held in state until the event-time watermark passes
    them, and only the ≤-watermark prefix is folded (in (ts, event_id)
    order).  A row delivered in a later micro-batch than a newer row is
    therefore folded in its correct event-time position, as long as its
    lateness stays inside the watermark delay — the standard streaming
    contract (Spark itself drops rows older than the watermark before any
    stateful operator sees them).

    Input must carry a ``withWatermark("ts", delay)``; EventTimeTimeout
    fires each key once the watermark advances past its registered
    deadline, so buffered rows fold (and emit) without waiting for the
    key's next arrival — including in the final no-data micro-batch of a
    bounded drain, where the watermark reaches max event time − delay.
    Rows above that final watermark remain buffered, never folded: the
    matching batch oracle applies the identical cutoff.

    State per user = two LONGs + the buffer, and the buffer is bounded by
    (per-key rate × watermark delay) — the same bound every watermarked
    stateful operator carries, NOT stream length."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            ema, n, buf_ts, buf_eid, buf_v = state.get
            carried = (ema, n, list(zip(buf_ts, buf_eid, buf_v)))
        else:
            carried = None
        new_rows = []
        if not state.hasTimedOut:
            new_rows = _extract_rows(pdfs, sort=False)
        (ema, n, rest), folded = ema_ooo_step(carried, new_rows, wm_ms)
        state.update(
            (
                ema,
                n,
                [r[0] for r in rest],
                [r[1] for r in rest],
                [r[2] for r in rest],
            )
        )
        if rest:
            # fire on the next watermark advance so the buffer drains
            # without waiting for this key's next arrival
            state.setTimeoutTimestamp(max(wm_ms, 0) + 1)
        if folded:
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ema_e6": [ema]}
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EMA_SCHEMA,
        stateStructType=_EMA_OOO_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct sketch: mergeable bounded state per group
# ---------------------------------------------------------------------------

KMV_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("n_mins", T.LongType()),
    ]
)
_KMV_STATE_SCHEMA = T.StructType(
    [
        # the ≤k smallest DISTINCT 60-bit hashes seen so far, ascending
        T.StructField("mins", T.ArrayType(T.LongType())),
        # rows processed (monotone) — the caller's recency marker
        T.StructField("n_seen", T.LongType()),
    ]
)


def kmv_sketch(hashed: DataFrame, k: int = 64) -> DataFrame:
    """Streaming KMV distinct sketch per event_type: state is the k
    smallest distinct hash values (operators/sketches.py semantics), a
    MERGEABLE bounded summary — which is the whole point of sketching a
    stream: state per key is O(k) LONGs forever, the estimate is
    available after every micro-batch, and arrival order (or disorder)
    cannot change the answer, because min-sets are a commutative
    idempotent monoid.  Contrast with the EMA kernels above, whose fold
    is order-SENSITIVE and needs the watermark machinery.

    ``hashed`` carries (event_type, h) with h precomputed Spark-side by
    sketches.hash60 (md5-derived), so the kernel never hashes — the
    exact bit pattern the DuckDB oracle replays.  Emits per batch the
    cumulative (n_seen, kth_hash = max of kept mins, n_mins); the caller
    keeps each key's row with the highest n_seen and applies the
    closed-form estimate with the SAME Catalyst expression the batch
    kmv_distinct uses, so stream == batch bit-for-bit.

    Pruning to the k smallest within the kernel is lossless: the final
    k smallest of the whole stream can only contain values that were,
    at every prefix, among that prefix's k smallest."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            mins, n_seen = state.get
            cur = set(mins)
        else:
            cur, n_seen = set(), 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            hs = pdf["h"].to_numpy(dtype=np.int64)
            n_seen += len(hs)
            cur.update(hs.tolist())
            if len(cur) > 8 * k:  # bound in-loop growth between prunes
                cur = set(sorted(cur)[:k])
        kept = sorted(cur)[:k]
        state.update((kept, n_seen))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n_seen],
                "kth_hash": [kept[-1] if kept else 0],
                "n_mins": [len(kept)],
            }
        )

    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=KMV_STREAM_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming exact top-k by value: a bounded selection monoid per key
# ---------------------------------------------------------------------------

TOPK_K = 5

TOPK_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        # cumulative top-k so far, best-first (parallel arrays)
        T.StructField("top_v6", T.ArrayType(T.LongType())),
        T.StructField("top_ids", T.ArrayType(T.LongType())),
    ]
)
_TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("top_v6", T.ArrayType(T.LongType())),
        T.StructField("top_ids", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def topk_values(scored: DataFrame, k: int = TOPK_K) -> DataFrame:
    """Streaming EXACT top-k per event_type: state is the k best
    (v6, event_id) pairs seen so far — the third streaming-state shape
    next to the KMV sketch (set monoid) and the EMA (order-sensitive
    fold).  Selection by a total order is a commutative idempotent
    monoid, so like KMV — and unlike the EMA — the answer is invariant
    to arrival order and needs no watermark: the feed is deliberately
    the out-of-order staged slices.

    ``scored`` carries (event_type, v6, event_id) with v6 the SAME
    Spark-side ROUND(value·1e6) LONG the batch queries use, so the
    DuckDB oracle is a plain window top-k over identical integers.
    Order is (v6 DESC, event_id ASC) — the unique tiebreak every other
    top-k in the repo pins.  Pruning to k inside the kernel is lossless
    for the same prefix argument as KMV's min-set.  State: 2k+1 LONGs
    per key, forever; emits the cumulative top-k after every batch and
    the caller keeps each key's most-seen row."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vs, ids, n_seen = state.get
            pairs = list(zip(vs, ids))
        else:
            pairs, n_seen = [], 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_seen += len(pdf)
            pairs.extend(
                zip(pdf["v6"].astype("int64"), pdf["event_id"].astype("int64"))
            )
            # bound in-loop growth between prunes (lossless: the stream's
            # final top-k is in every prefix's top-k)
            if len(pairs) > 64 * k:
                pairs.sort(key=lambda p: (-p[0], p[1]))
                del pairs[k:]
        pairs.sort(key=lambda p: (-p[0], p[1]))
        del pairs[k:]
        vs = [int(v) for v, _ in pairs]
        ids = [int(i) for _, i in pairs]
        state.update((vs, ids, n_seen))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n_seen],
                "top_v6": [vs],
                "top_ids": [ids],
            }
        )

    return scored.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=TOPK_STREAM_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
