"""Structured-Streaming pipeline tests: dedup-within-watermark,
foreachBatch MERGE idempotency, and stateful sessionization.
(Oracle parity for the registered streaming queries runs in
test_oracle_parity.)"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest

from data_engineering_etl_demo_spark.streaming import pipeline as P

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _write_batch(dirpath, name, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, minutes, user="u1", event="pageview", amount=None):
    return {
        "event_id": eid,
        "ts": (T0 + timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S"),
        "user_id": user,
        "event": event,
        "amount": amount,
    }


def test_dedup_within_watermark_drops_retransmits(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(
        src,
        "b1.jsonl",
        [_ev("e1", 0), _ev("e1", 0), _ev("e2", 1), _ev("e2", 1), _ev("e3", 2)],
    )
    stream = P.read_event_stream(spark, str(src))
    out = P.run_to_completion(P.dedup_within_watermark(stream), "t_dedup")
    assert sorted(r["event_id"] for r in out.collect()) == ["e1", "e2", "e3"]


def test_foreach_batch_merge_is_idempotent_upsert(spark, tmp_path):
    src = tmp_path / "src"
    wh = str(tmp_path / "fact_events")
    _write_batch(src, "b1.jsonl", [_ev("e1", 0, amount=10.0), _ev("e2", 1, amount=5.0)])
    _write_batch(
        src, "b2.jsonl", [_ev("e1", 30, amount=20.0), _ev("e3", 31, amount=7.0)]
    )

    def run():
        stream = P.read_event_stream(spark, str(src))
        q = (
            stream.writeStream.foreachBatch(P.foreach_batch_merge(wh))
            .option("checkpointLocation", str(tmp_path / f"ckpt{run.i}"))
            .trigger(availableNow=True)
            .start()
        )
        run.i += 1
        q.awaitTermination()

    run.i = 0
    run()
    rows = {r["event_id"]: r for r in spark.read.parquet(wh).collect()}
    assert set(rows) == {"e1", "e2", "e3"}
    assert rows["e1"]["amount"] == 20.0  # later ts wins (last-writer-wins MERGE)

    # Fresh checkpoint → every batch replays: the merge must converge, not
    # duplicate (the reference's "safe to run multiple times" contract).
    run()
    rows2 = {r["event_id"]: r for r in spark.read.parquet(wh).collect()}
    assert {k: (v["ts"], v["amount"]) for k, v in rows2.items()} == {
        k: (v["ts"], v["amount"]) for k, v in rows.items()
    }


def test_foreach_batch_merge_recovers_from_crashed_swap(spark, tmp_path):
    """The rename-swap is two renames, not atomic.  Simulate both crash
    states the recovery block must handle:

    1. crash BETWEEN the renames: table stranded in .old, no live dir —
       the retried batch must restore .old and merge against full history
       (not silently rebuild from only the current batch);
    2. crash AFTER the second rename: stale .old next to a live dir —
       the next batch must clear it (os.rename into a non-empty dir would
       raise ENOTEMPTY)."""
    import os
    import shutil

    src = tmp_path / "src"
    wh = str(tmp_path / "fact_events")
    _write_batch(src, "b1.jsonl", [_ev("e1", 0, amount=10.0), _ev("e2", 1, amount=5.0)])

    def run(i):
        stream = P.read_event_stream(spark, str(src))
        q = (
            stream.writeStream.foreachBatch(P.foreach_batch_merge(wh))
            .option("checkpointLocation", str(tmp_path / f"ckpt{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(0)
    assert {r["event_id"] for r in spark.read.parquet(wh).collect()} == {"e1", "e2"}

    # state 1: crash between renames — live dir gone, history in .old
    os.rename(wh, wh + ".old")
    _write_batch(src, "b2.jsonl", [_ev("e3", 30, amount=7.0)])
    run(1)  # fresh checkpoint: replays b1 + b2
    rows = {r["event_id"] for r in spark.read.parquet(wh).collect()}
    assert rows == {"e1", "e2", "e3"}
    assert not os.path.exists(wh + ".old")

    # state 2: stale .old alongside a live dir
    shutil.copytree(wh, wh + ".old")
    _write_batch(src, "b3.jsonl", [_ev("e4", 60, amount=1.0)])
    run(2)
    rows = {r["event_id"] for r in spark.read.parquet(wh).collect()}
    assert rows == {"e1", "e2", "e3", "e4"}
    assert not os.path.exists(wh + ".old")


def test_sessionize_emits_closed_sessions(spark, tmp_path):
    src = tmp_path / "src"
    # u1: two sessions (gap 45 min > 30); u2: one open session -> not emitted.
    _write_batch(
        src,
        "b1.jsonl",
        [
            _ev("a1", 0, user="u1"),
            _ev("a2", 10, user="u1"),
            _ev("a3", 55, user="u1"),
            _ev("b1", 0, user="u2"),
        ],
    )
    stream = P.read_event_stream(spark, str(src)).select("user_id", "ts")
    out = P.run_to_completion(P.sessionize(stream, gap_minutes=30), "t_sessions")
    sessions = out.collect()
    assert len(sessions) == 1
    s = sessions[0]
    assert s["user_id"] == "u1"
    assert s["n_events"] == 2
    assert s["session_start"] == T0
    assert s["session_end"] == T0 + timedelta(minutes=10)
