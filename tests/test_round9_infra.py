"""Round-9 infra pins (ADVICE r8): the mixture-weights DECIMAL(38,0)
ppm grid survives >2^63 intermediate products, the registry plan memo is
race-free under concurrent first calls, and nested memoized builders
cannot self-deadlock on the new _plan_lock."""

from __future__ import annotations

import threading

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# docs_mixture_weights: ppm math exact past the BIGINT wrap point
# ---------------------------------------------------------------------------


def test_mixture_ppm_exact_past_bigint_wrap(spark):
    """ADVICE r8: n_tokens·1e6 and w_e6·1e6 pass 2^63 near 9.2e12 total
    tokens.  Drive the REAL projection (_mixture_report) with planted
    sources in the tens-of-trillions-of-tokens range — the raw BIGINT
    formulation wraps negative here — and assert every ppm column equals
    arbitrary-precision Python integer math."""
    import math

    from data_engineering_etl_demo_spark.plans.llmdata import (
        _mixture_report,
    )

    rows = [
        # (source, n_docs, n_tokens) — totals ~3.1e13 tokens, each
        # n_tokens·1e6 > 9.22e18 = BIGINT max
        ("web", 9_000_000_000, 21_000_000_000_000),
        ("code", 1_200_000_000, 9_500_000_000_000),
        ("books", 40_000_000, 600_000_000_000_000 // 1000),
    ]
    per_py = [
        (s, d, t, math.floor(math.sqrt(t) * 1_000_000)) for s, d, t in rows
    ]
    per = spark.createDataFrame(
        per_py, "source string, n_docs long, n_tokens long, w_e6 long"
    )
    got = {
        r["source"]: r for r in _mixture_report(per).collect()
    }

    tok_total = sum(t for _, _, t, _ in per_py)
    w_total = sum(w for _, _, _, w in per_py)
    assert tok_total * 1_000_000 > 2**63 - 1  # probe really crosses wrap
    for s, d, t, w in per_py:
        natural = t * 1_000_000 // tok_total
        weight = w * 1_000_000 // w_total
        boost = weight * 1_000_000 // max(natural, 1)
        row = got[s]
        assert row["natural_ppm"] == natural, (s, row)
        assert row["weight_ppm"] == weight, (s, row)
        assert row["boost_ppm"] == boost, (s, row)
        assert row["natural_ppm"] > 0  # the wrapped BIGINT plan goes negative


# ---------------------------------------------------------------------------
# _plan_memo: concurrent first calls converge on one stored handle
# ---------------------------------------------------------------------------


def test_plan_memo_concurrent_first_calls_single_entry(spark):
    """ADVICE r8: the unlocked check-build-prune let two concurrent
    misses interleave the prune's pops with an insert.  r10 (ADVICE r9):
    caching.build_once's in-flight map de-duplicates the build itself —
    exactly ONE builder invocation, one stored handle, every caller
    receives it (losers wait instead of building a throwaway plan that
    could churn persist_latest slots for internally-persisting
    builders)."""
    from data_engineering_etl_demo_spark import plans

    calls = []
    barrier = threading.Barrier(4)
    name = "_r9_test_plan_memo"

    @plans.register(name, None, doc="r9 test")
    def _builder(s, sf_dir):  # noqa: ANN001
        calls.append(1)
        import time

        time.sleep(0.2)  # widen the race window
        return s.range(7).toDF("doc_id")

    results = []
    try:
        fn = plans.REGISTRY[name].spark_fn

        def call():
            barrier.wait()
            results.append(fn(spark, "/tmp/r9memo"))

        ts = [threading.Thread(target=call) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
    finally:
        plans.REGISTRY.pop(name, None)
        for k in list(plans._plan_memo):
            if k[0] == name:
                plans._plan_memo.pop(k, None)

    assert len(calls) == 1, (
        "concurrent first calls double-built: build_once in-flight dedup "
        "regressed (ADVICE r9)"
    )
    assert len(results) == 4
    assert all(r is results[0] for r in results), (
        "callers diverged: memo returned different handles"
    )


def test_plan_memo_nested_builder_no_deadlock(spark):
    """_plan_lock is held only around dict operations, never across the
    builder — a memoized builder that calls another memoized builder
    (the dup_clusters → near_dup composition shape) must complete."""
    from data_engineering_etl_demo_spark import plans

    inner_name = "_r9_test_memo_inner"
    outer_name = "_r9_test_memo_outer"

    @plans.register(inner_name, None, doc="r9 test")
    def _inner(s, sf_dir):  # noqa: ANN001
        return s.range(4).toDF("doc_id")

    @plans.register(outer_name, None, doc="r9 test")
    def _outer(s, sf_dir):  # noqa: ANN001
        return plans.REGISTRY[inner_name].spark_fn(s, sf_dir)

    out = []
    try:
        t = threading.Thread(
            target=lambda: out.append(
                plans.REGISTRY[outer_name]
                .spark_fn(spark, "/tmp/r9nestedmemo")
                .count()
            )
        )
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "nested memoized builder deadlocked"
        assert out == [4]
    finally:
        plans.REGISTRY.pop(inner_name, None)
        plans.REGISTRY.pop(outer_name, None)
        for k in list(plans._plan_memo):
            if k[0] in (inner_name, outer_name):
                plans._plan_memo.pop(k, None)


def test_fertility_ppm_exact_past_bigint_wrap(spark):
    """r9 proactive sweep: docs_tokenizer_fertility has the same
    per-cohort corpus-sum shape as docs_mixture_weights — one language
    holding >9.2e12 BPE tokens wraps the raw BIGINT product.  Drive the
    real projection (_fertility_report) with planted trillion-token
    languages and assert exact arbitrary-precision results."""
    from data_engineering_etl_demo_spark.plans.llmdata import (
        _fertility_report,
    )

    rows = [
        # (lang, n_words, n_bpe_tokens) — en alone crosses the wrap point
        ("en", 10_000_000_000_000, 13_000_000_000_000),
        ("zh", 2_500_000_000_000, 6_100_000_000_000),
        ("sw", 40_000_000_000, 90_000_000_000),
        ("empty", 0, 0),  # greatest(n_words, 1) guard
    ]
    per = spark.createDataFrame(
        rows, "lang string, n_words long, n_bpe_tokens long"
    )
    got = {r["lang"]: r["fertility_ppm"]
           for r in _fertility_report(per).collect()}
    for lang, nw, nb in rows:
        expect = nb * 1_000_000 // max(nw, 1)
        assert got[lang] == expect, (lang, got[lang], expect)
    assert rows[0][2] * 1_000_000 > 2**63 - 1  # probe really crosses wrap
    assert got["en"] > 0  # the wrapped BIGINT plan goes negative here
