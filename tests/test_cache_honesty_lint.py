"""Cache-honesty structural lint (r16, VERDICT r15 item 4).

The bench architecture persists shared intermediates (shingle relations,
the simhash signature, the shared pair projection) so that CONSUMERS pay
a re-scan instead of a re-derivation.  The honesty rule policing it —
"persisting select(P) must not serve P" — was, until now, enforced by
hand: commit 2fdbbdd caught the simhash signature persist serving the
``docs_simhash`` primary's entire timed pass from cache (0.04 s, kernel
never ran) and neutralized it with a marker column.  This lint makes the
rule STRUCTURAL: after a full registry build (the cache state the
bench's timed pass sees), no registered query's analyzed plan — nor any
plan reached from it by stripping only trivial root nodes (Sort /
Project / Limit / Distinct) — may be ``sameResult``-equal to a live
``persist_latest`` entry.  A query matching one would have its whole
computation (minus at most an order/projection) served from a cache
another query (or its own builder) materialized — the exact class the
r15 honesty guard fixed by hand.

``_plan_memo`` needs no separate sweep: memoized plans hold no data, and
any persisted one registers in ``functions.caching._live``, which is the
set swept here.  Streaming drains are skipped: their results are memory-
sink table scans (a drain re-runs its micro-batches on every call by
construction), which no persist slot can serve.

The canary test proves the detector catches the known instance: it
re-plants the pre-2fdbbdd state (simhash signature persisted WITHOUT the
marker column) and asserts the ``docs_simhash`` primary is flagged.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

# Root nodes whose stripping still leaves "the whole computation": a
# cache entry matching the plan under them serves everything but an
# order / projection / limit.  Filter/Aggregate/Join are real work and
# deliberately NOT in this set.
_TRIVIAL_ROOTS = {
    "Sort",
    "Project",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
}


def _analyzed(df):
    return df._jdf.queryExecution().analyzed()


def _root_prefixes(plan):
    """The analyzed plan plus each descendant reached by stripping
    single-child trivial root nodes."""
    out = [plan]
    cur = plan
    while (
        cur.getClass().getSimpleName() in _TRIVIAL_ROOTS
        and cur.children().size() == 1
    ):
        cur = cur.children().apply(0)
        out.append(cur)
    return out


def _served_whole_by(df, cached_df) -> bool:
    cplan = _analyzed(cached_df)
    return any(p.sameResult(cplan) for p in _root_prefixes(_analyzed(df)))


def _live_slots(spark) -> dict:
    from data_engineering_etl_demo_spark.catalog import session_key
    from data_engineering_etl_demo_spark.functions import caching

    sk = session_key(spark)
    return {
        slot: df
        for (slot, key), df in list(caching._live.items())
        if key == sk
    }


def test_no_primary_is_cache_served_whole(spark):
    from data_engineering_etl_demo_spark.plans import all_specs

    specs = all_specs()
    built = {}
    for name, spec in specs.items():
        if spec.module == "streaming_plans":
            continue  # memory-sink scans; drains re-run per call
        built[name] = spec.spark_fn(spark, SF_DIR)
    live = _live_slots(spark)
    assert live, (
        "no live persist slots after a full registry build — the sweep "
        "is vacuous; did persist_latest move?"
    )
    offenders = [
        (name, slot)
        for name, df in built.items()
        for slot, cached in live.items()
        if _served_whole_by(df, cached)
    ]
    assert not offenders, (
        "registered primary plan(s) sameResult-equal to a live persisted "
        "relation (modulo Sort/Project/Limit roots) — their timed pass "
        "would be served whole from cache; break the plan equality with "
        "a marker column as in dedup.simhash_near_dup, or drop the "
        f"persist: {offenders}"
    )


def test_detector_catches_the_unmarked_simhash_persist(spark):
    """Re-plant the pre-2fdbbdd cache leak and prove detection: the
    simhash signature persisted WITHOUT its marker column is plan-equal
    to the docs_simhash primary under its Sort root."""
    from data_engineering_etl_demo_spark.catalog import session_key
    from data_engineering_etl_demo_spark.functions import caching
    from data_engineering_etl_demo_spark.functions.caching import (
        persist_latest,
    )
    from data_engineering_etl_demo_spark.operators import dedup as D
    from data_engineering_etl_demo_spark.plans import all_specs
    from data_engineering_etl_demo_spark.plans.llmdata import _docs_wide

    primary = all_specs()["docs_simhash"].spark_fn(spark, SF_DIR)
    slot = "lint.selftest.simhash_unmarked"
    planted = persist_latest(D.simhash64(_docs_wide(spark, SF_DIR)), slot)
    try:
        assert _served_whole_by(primary, planted), (
            "detector failed to flag the known 2fdbbdd instance"
        )
        # the CURRENT marker-column persist must NOT be flagged (the fix
        # keeps the persisted plan a strict parent, never plan-equal)
        marked = D.simhash64(_docs_wide(spark, SF_DIR)).withColumn(
            "_join_only", F.lit(1)
        )
        assert not _served_whole_by(primary, marked)
    finally:
        planted.unpersist(blocking=False)
        caching._live.pop((slot, session_key(spark)), None)
