"""Round-8 infra pins: the preference-pairs single-pass plan shape, the
unified dead-session classifier, the green-row affirmative-signal rule,
and the shared-relation memo lock (ADVICE r7 + VERDICT r7 items 1-2)."""

from __future__ import annotations

import threading

import pytest

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# docs_preference_pairs: one aggregate pass, no windows, no self-join
# ---------------------------------------------------------------------------


def test_preference_pairs_plan_is_single_aggregate(spark):
    """VERDICT r7 weakness 1: the rewrite must keep the plan free of rank
    windows and the best×worst self-join — one partial-aggregating
    groupBy produces the pairs."""
    from data_engineering_etl_demo_spark.plans import all_specs

    df = all_specs()["docs_preference_pairs"].spark_fn(spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in opt, f"rank window came back:\n{opt}"
    assert "Join" not in opt, f"self-join came back:\n{opt}"
    assert "max_by" in opt and "min_by" in opt, opt


def test_preference_pairs_tiebreak_matches_rank_semantics(spark):
    """The struct-encoded argmax/argmin must reproduce the oracle's rank-1
    rows exactly on a tie-heavy corpus: equal q_e6 ties pick the SMALLEST
    doc_id on BOTH sides (the former windows ordered doc_id ascending)."""
    import pandas as pd

    from data_engineering_etl_demo_spark.plans.llmdata import (
        _PREF_MIN_GAP_E6,
    )

    rows = [
        # cohort A: best ties on q=900000 between doc 3 and 7 -> chosen 3;
        # worst ties on q=100000 between doc 5 and 9 -> rejected 5
        (3, "aaaa", 900_000),
        (7, "aaaa", 900_000),
        (5, "aaaa", 100_000),
        (9, "aaaa", 100_000),
        # cohort B: gap below threshold -> filtered out
        (11, "bbbb", 500_000),
        (12, "bbbb", 450_000),
        # cohort C: single doc -> chosen == rejected -> filtered out
        (20, "cccc", 700_000),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "q_e6"])
    q = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    picked = q.groupBy("lang").agg(
        F.max_by(
            F.struct("doc_id", "q_e6"),
            F.struct(F.col("q_e6"), (-F.col("doc_id")).alias("neg_id")),
        ).alias("best"),
        F.min_by(
            F.struct("doc_id", "q_e6"),
            F.struct(F.col("q_e6"), F.col("doc_id")),
        ).alias("worst"),
    )
    out = {
        r["lang"]: (r["best"]["doc_id"], r["worst"]["doc_id"])
        for r in picked.collect()
    }
    assert out["aaaa"] == (3, 5)
    # and the registered filter semantics on the other cohorts
    kept = [
        lang
        for lang, (b, w) in out.items()
        if b != w
    ]
    assert "cccc" not in kept
    assert _PREF_MIN_GAP_E6 == 100_000  # oracle constant unchanged


# ---------------------------------------------------------------------------
# session_is_dead: the single classifier every memo prune routes through
# ---------------------------------------------------------------------------


class _FakeSC:
    def __init__(self, jsc):
        self._jsc = jsc


class _FakeSession:
    def __init__(self, sc=None, has_sc=True):
        if has_sc:
            self._sc = sc


def test_session_is_dead_classification():
    from data_engineering_etl_demo_spark.functions.caching import (
        session_is_dead,
    )

    live = _FakeSession(sc=_FakeSC(jsc=object()))
    dead = _FakeSession(sc=_FakeSC(jsc=None))
    connect = _FakeSession(has_sc=False)  # no _sc attribute at all
    assert session_is_dead(live) is False
    assert session_is_dead(dead) is True
    # the Connect exemption: "no _sc" is NEVER classified dead
    assert session_is_dead(connect) is False

    class _Exploding:
        @property
        def _sc(self):
            raise RuntimeError("gateway gone")

    assert session_is_dead(_Exploding()) is True


def test_prune_dead_memo_drops_dead_keeps_live_and_keep_key():
    from data_engineering_etl_demo_spark.functions.caching import (
        prune_dead_memo,
    )

    class _FakeDF:
        def __init__(self, session):
            self.sparkSession = session

    live = _FakeDF(_FakeSession(sc=_FakeSC(jsc=object())))
    dead = _FakeDF(_FakeSession(sc=_FakeSC(jsc=None)))
    connect = _FakeDF(_FakeSession(has_sc=False))
    memo = {"live": live, "dead": dead, "connect": connect, "keep": dead}
    prune_dead_memo(memo, keep_key="keep")
    assert set(memo) == {"live", "connect", "keep"}


# ---------------------------------------------------------------------------
# _row_is_green: malformed rows grant nothing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "row,expect",
    [
        ({"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 5, "oracle_rows": 5, "err": None}, True),
        # rows-only check (no oracle): spark_rows is the affirmative signal
        ({"spark_rows": 7, "err": None}, True),
        ({}, False),                       # malformed: no signal at all
        ({"err": None}, False),            # partial: no affirmative signal
        ({"rows_match": True, "err": "boom"}, False),
        ({"rows_match": False, "spark_rows": 5, "err": None}, False),
        ({"rows_match": True, "hash_match": False, "err": None,
          "spark_rows": 5}, False),
        ("not a dict", False),
    ],
)
def test_row_is_green(row, expect):
    from data_engineering_etl_demo_spark.plans import _row_is_green

    assert _row_is_green(row) is expect


# ---------------------------------------------------------------------------
# _shared_relation: concurrent first calls build exactly once
# ---------------------------------------------------------------------------


def test_shared_relation_concurrent_first_calls_persist_once(spark):
    """r10 re-tightening of the r8 build-once pin: the plan is built
    OUTSIDE _shared_lock (reentrancy-safe for nested shared sources) but
    caching.build_once's in-flight map de-duplicates concurrent first
    calls (ADVICE r9) — so the build runs EXACTLY once, persist_latest
    runs exactly once, and both threads receive the SAME memoized handle
    (no orphaned cache entry, no consumer holding an unpersisted
    DataFrame, no throwaway build churning the persist slot)."""
    from data_engineering_etl_demo_spark.plans import REGISTRY, QuerySpec
    from data_engineering_etl_demo_spark.plans import llmdata

    calls = []
    persists = []
    barrier = threading.Barrier(2)

    def builder(s, sf_dir):
        calls.append(1)
        import time

        time.sleep(0.2)  # widen the race window
        return s.range(5).toDF("doc_id")

    name = "_r8_test_shared_relation"
    REGISTRY[name] = QuerySpec(
        name=name, spark_fn=builder, oracle=None, doc="", module="test"
    )
    # _shared_relation re-imports persist_latest from caching per call,
    # so the patch must land on the caching module, not on llmdata
    from data_engineering_etl_demo_spark.functions import caching

    real_persist = caching.persist_latest

    def counting_persist(df, slot, storage_level=None):
        persists.append(slot)
        return real_persist(df, slot, storage_level)

    results = []
    caching.persist_latest = counting_persist
    try:
        def call():
            barrier.wait()
            results.append(
                llmdata._shared_relation(spark, "/tmp/r8test", name,
                                         ("doc_id",))
            )

        ts = [threading.Thread(target=call) for _ in range(2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
    finally:
        caching.persist_latest = real_persist
        REGISTRY.pop(name, None)
        # drop the memo entry so reruns in the same session rebuild
        for k in list(llmdata._shared_memo):
            if k[2] == name:
                llmdata._shared_memo.pop(k).unpersist(blocking=False)

    assert len(calls) == 1, (
        "concurrent first calls double-built: build_once in-flight dedup "
        "regressed (ADVICE r9)"
    )
    assert len(persists) == 1, "both threads persisted: the r7 race is back"
    assert results[0] is results[1]


def test_shared_relation_nested_source_no_deadlock(spark):
    """ADVICE r8: a shared-relation source that itself consumes a shared
    relation must not self-deadlock on the non-reentrant _shared_lock.
    The r9 build-outside-the-lock restructure makes nesting legal; pin it
    with a bounded join so a regression fails fast instead of hanging."""
    from data_engineering_etl_demo_spark.plans import REGISTRY, QuerySpec
    from data_engineering_etl_demo_spark.plans import llmdata

    inner_name = "_r9_test_nested_inner"
    outer_name = "_r9_test_nested_outer"

    def inner(s, sf_dir):
        return s.range(3).toDF("doc_id")

    def outer(s, sf_dir):
        # nested shared-relation consumption — the latent r8 deadlock
        return llmdata._shared_relation(s, sf_dir, inner_name, ("doc_id",))

    REGISTRY[inner_name] = QuerySpec(
        name=inner_name, spark_fn=inner, oracle=None, doc="", module="test"
    )
    REGISTRY[outer_name] = QuerySpec(
        name=outer_name, spark_fn=outer, oracle=None, doc="", module="test"
    )
    out = []
    try:
        t = threading.Thread(
            target=lambda: out.append(
                llmdata._shared_relation(
                    spark, "/tmp/r9nested", outer_name, ("doc_id",)
                ).count()
            )
        )
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "nested shared-relation source deadlocked"
        assert out == [3]
    finally:
        REGISTRY.pop(inner_name, None)
        REGISTRY.pop(outer_name, None)
        for k in list(llmdata._shared_memo):
            if k[2] in (inner_name, outer_name):
                llmdata._shared_memo.pop(k).unpersist(blocking=False)


# ---------------------------------------------------------------------------
# scripts_changed_queries: the rotation's change-detection tool
# ---------------------------------------------------------------------------


def test_changed_queries_tool_detects_builder_drift(tmp_path, capsys,
                                                    monkeypatch):
    """The verify rotation trusts this tool's CHANGED list at round start;
    pin its diff logic: identical sources -> empty CHANGED, a drifted fn
    hash -> that query (and only it) reported."""
    import json

    import scripts_changed_queries as tool

    out = tmp_path / "hashes.json"
    monkeypatch.setattr(tool, "OUT", str(out))

    tool.main()  # baseline snapshot
    capsys.readouterr()
    snap = json.loads(out.read_text())
    assert len(snap) > 100 and "docs_preference_pairs" in snap

    tool.main()  # identical second run
    text = capsys.readouterr().out
    assert "CHANGED (add to _CHANGED_THIS_ROUND): []" in text

    # tamper with one recorded fn hash -> only that query flags CHANGED
    snap["dau"]["fn"] = "0" * 16
    out.write_text(json.dumps(snap))
    tool.main()
    text = capsys.readouterr().out
    assert "CHANGED (add to _CHANGED_THIS_ROUND): ['dau']" in text
