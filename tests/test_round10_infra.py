"""Round-10 infrastructure pins.

1. caching.build_once — the in-flight dedup that closes ADVICE r9's
   residual double-build persist churn: an internally-persisting builder
   raced by concurrent first calls must leave the memoized handle
   persisted (the old double-checked insert let the loser's build
   re-enter the winner's persist slot and unpersist it).
2. Failure semantics: a builder that raises releases the in-flight
   marker so a waiter retries and becomes the new builder.
3. Re-entrant same-key call from the owning thread falls through to a
   direct build instead of self-deadlocking on its own event.
"""

import threading

import pytest


# ---------------------------------------------------------------------------
# build_once: the ADVICE r9 scenario — internally-persisting builder
# ---------------------------------------------------------------------------


def test_build_once_internally_persisting_builder_keeps_winner_persisted(
    spark,
):
    """ADVICE r9: builders that call persist_latest INTERNALLY (e.g. the
    llmdata corpus/pair builders) re-enter the same persist slot on a
    double-build, unpersisting the winner's handle — the memoized plan
    then silently recomputes.  build_once must run the builder exactly
    once under concurrency, so the handle the memo stores is the one
    persist_latest registered and it STAYS persisted."""
    from data_engineering_etl_demo_spark.functions.caching import (
        build_once,
        persist_latest,
    )

    memo: dict = {}
    inflight: dict = {}
    lock = threading.Lock()
    calls = []
    barrier = threading.Barrier(4)
    results = []

    def builder():
        calls.append(1)
        import time

        time.sleep(0.2)  # widen the race window
        # the internal persist that made the double-build harmful
        return persist_latest(
            spark.range(9).toDF("doc_id"), "r10test.internal_persist"
        )

    def call():
        barrier.wait()
        results.append(
            build_once(memo, inflight, lock, ("k",), builder)
        )

    ts = [threading.Thread(target=call) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]

    try:
        assert len(calls) == 1, "build_once double-built under concurrency"
        assert all(r is results[0] for r in results)
        # the memoized handle is the persisted one and is still cached
        assert results[0].storageLevel.useMemory, (
            "memoized handle lost its persist: the ADVICE r9 churn is back"
        )
        assert not inflight, "in-flight marker leaked after completion"
    finally:
        results[0].unpersist(blocking=False)


def test_build_once_failed_builder_releases_waiters_to_retry():
    """A raising builder must clear its in-flight marker and wake
    waiters; one waiter becomes the new builder and succeeds, so a
    transient failure doesn't wedge every concurrent caller."""
    from data_engineering_etl_demo_spark.functions.caching import build_once

    memo: dict = {}
    inflight: dict = {}
    lock = threading.Lock()
    attempts = []
    barrier = threading.Barrier(3)
    outcomes = []

    def builder():
        attempts.append(threading.get_ident())
        import time

        time.sleep(0.1)
        if len(attempts) == 1:
            raise RuntimeError("transient first-build failure")
        return "built"

    def call():
        barrier.wait()
        try:
            outcomes.append(build_once(memo, inflight, lock, "k", builder))
        except RuntimeError:
            outcomes.append("raised")

    ts = [threading.Thread(target=call) for _ in range(3)]
    [t.start() for t in ts]
    [t.join() for t in ts]

    # exactly one caller saw the transient failure; the rest got the value
    assert sorted(outcomes) == ["built", "built", "raised"]
    assert memo.get("k") == "built"
    assert len(attempts) == 2, "waiters retried more than once (or never)"
    assert not inflight


def test_build_once_reentrant_same_key_builds_directly():
    """A builder that re-enters its OWN key (no current builder does, but
    the guard must hold) gets a direct un-memoized build instead of
    waiting on its own event forever."""
    from data_engineering_etl_demo_spark.functions.caching import build_once

    memo: dict = {}
    inflight: dict = {}
    lock = threading.Lock()
    depth = {"n": 0}

    def builder():
        depth["n"] += 1
        if depth["n"] == 1:
            # re-entrant call with the SAME key from the owning thread
            inner = build_once(memo, inflight, lock, "k", builder)
            assert inner == "leaf"
            return "outer"
        return "leaf"

    t = threading.Thread(
        target=lambda: memo.setdefault(
            "_result", build_once(memo, inflight, lock, "k", builder)
        )
    )
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "re-entrant same-key build self-deadlocked"
    assert memo["k"] == "outer"
    assert not inflight


def test_build_once_reentrant_build_runs_outside_the_lock():
    """ADVICE r10: the re-entrant same-key fallback must release ``lock``
    BEFORE calling build() — the old shape called it inside the
    ``with lock:`` block, so a self-referencing builder that also
    consumes any OTHER memoized key guarded by the same non-reentrant
    lock (the dup_clusters→near_dup composition shape) deadlocked on its
    own frame.  This test reproduces exactly that: the re-entrant branch
    of key "a" nests a build_once on key "b" under the SAME lock; with
    the bug it hangs, with the fix it completes."""
    from data_engineering_etl_demo_spark.functions.caching import build_once

    memo: dict = {}
    inflight: dict = {}
    lock = threading.Lock()
    depth = {"n": 0}

    def build_b():
        return "b-leaf"

    def build_a():
        depth["n"] += 1
        if depth["n"] == 1:
            # Same-key re-entry -> falls through to a direct build of
            # build_a, whose second frame then needs the SAME lock for
            # key "b".  Held-lock re-entry would block here forever.
            inner = build_once(memo, inflight, lock, "a", build_a)
            assert inner == "a-leaf"
            return "a-outer"
        other = build_once(memo, inflight, lock, "b", build_b)
        assert other == "b-leaf"
        return "a-leaf"

    done: dict = {}
    t = threading.Thread(
        target=lambda: done.setdefault(
            "r", build_once(memo, inflight, lock, "a", build_a)
        )
    )
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), (
        "re-entrant build ran under the held lock and deadlocked on a "
        "nested same-lock key"
    )
    assert done["r"] == "a-outer"
    assert memo == {"a": "a-outer", "b": "b-leaf"}
    assert not inflight


def test_build_once_memo_hit_skips_builder():
    """A populated memo returns without touching the builder or the
    in-flight map — the hot path stays a single locked dict read."""
    from data_engineering_etl_demo_spark.functions.caching import build_once

    memo = {"k": "cached"}
    inflight: dict = {}

    def builder():  # pragma: no cover - must not run
        pytest.fail("builder ran on a memo hit")

    out = build_once(memo, inflight, threading.Lock(), "k", builder)
    assert out == "cached"
    assert not inflight
