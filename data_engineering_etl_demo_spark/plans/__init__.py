"""Query-plan registry.

Every implemented operator/query registers a QuerySpec: a Spark callable
(spark, sf_dir) -> DataFrame plus (when SQL-expressible) the equivalent
DuckDB oracle SQL over the same parquet tables.  ``__spark_entry__``
re-exports the registry per the driver contract.

Cross-engine determinism rules used throughout (SURVEY.md §7 watch-out 6):
- money sums aggregate in DECIMAL (exact, order-independent), rounded, then
  cast back to double — identical value at any parallelism in both engines;
- timestamps compared as epoch microseconds (unix_micros / epoch_us), never
  as formatted strings;
- every computed column aliased identically in Spark and SQL;
- ties in top-k / window ranks broken by a unique key column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    module: str = ""  # defining module (basename), drives verify ordering
    # the undecorated builder, kept so scripts_changed_queries.py can hash
    # its source to SUGGEST _CHANGED_THIS_ROUND entries (suggestion only:
    # a helper an implementation calls can change without this source
    # changing, so the set stays human-curated)
    src_fn: Optional[Callable] = None


REGISTRY: dict[str, QuerySpec] = {}

# Analyzed-plan memo: a query's DataFrame is a pure function of
# (session, sf_dir), and Spark caches the analyzed/optimized plan inside the
# DataFrame object — reusing it across actions skips re-analysis of large
# expression trees (the EP3 loader's parse chains cost more to analyze than
# to run at small SF).  Streaming queries are exempt: building their result
# RUNS the stream, which must happen on every call.
_plan_memo: dict[tuple, DataFrame] = {}

# Guards _plan_memo's get-then-set and the prune's dict mutation,
# mirroring llmdata's _shared_lock (ADVICE r8: the unlocked check-build-
# prune let two concurrent misses interleave the prune's pops with an
# insert).  Held ONLY around dict operations, never across fn(): builders
# may call other registered spark_fns (e.g. dup_clusters → near_dup) and
# llmdata's shared-relation path, so holding a non-reentrant lock across
# the build would self-deadlock.  Concurrent first calls are de-duplicated
# per key via caching.build_once's in-flight map (ADVICE r9: several
# builders call persist_latest internally, so a losing double-build would
# re-enter the winner's persist slot and unpersist the memoized handle —
# losers now WAIT for the winner instead of rebuilding).
import threading as _threading  # noqa: E402

_plan_lock = _threading.Lock()
_plan_inflight: dict[tuple, tuple] = {}  # key -> (owner thread id, Event)


def register(name: str, oracle: Optional[str], doc: str = "", memoize: bool = True):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if memoize:

            def memo_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
                from data_engineering_etl_demo_spark.catalog import session_key
                from data_engineering_etl_demo_spark.functions.caching import (
                    build_once,
                    prune_dead_memo,
                )

                # applicationId, not id(spark): a stopped+restarted session
                # can reuse the same object address, which would serve a
                # stale analyzed plan from the dead context
                key = (name, session_key(spark), sf_dir)

                def _finalize(df: DataFrame) -> DataFrame:
                    # memo-miss = possibly a fresh session: drop entries
                    # whose session has stopped, so a session-cycling
                    # driver doesn't pin dead plan handles forever
                    # (ADVICE r5/r6 leak class); the classification —
                    # including the Connect-session exemption — lives in
                    # ONE place (ADVICE r7)
                    prune_dead_memo(_plan_memo, keep_key=key)
                    return df

                return build_once(
                    _plan_memo,
                    _plan_inflight,
                    _plan_lock,
                    key,
                    lambda: fn(spark, sf_dir),
                    _finalize,
                )

            spark_fn = memo_fn
        else:
            spark_fn = fn
        REGISTRY[name] = QuerySpec(
            name=name,
            spark_fn=spark_fn,
            oracle=oracle,
            doc=doc,
            module=fn.__module__.rsplit(".", 1)[-1],
            src_fn=fn,
        )
        return fn

    return wrap


# Round-10 verification ordering.  The driver walks ``queries()`` in dict
# order and stops after ~50 of the registered queries, so ordering decides
# which queries get hard-signal rows.  Principle (rounds 3-9, restated by
# VERDICT r9 item 1): order by EVIDENCE STALENESS OF THE CURRENT
# IMPLEMENTATION — queries changed this round first (their old green rows
# no longer cover the code), then ascending by the round of each query's
# freshest driver green (the _LATEST_GREEN map below, computed from the
# CORRECTNESS_r01..r09 union, distribution r6×30 / r7×48 / r8×49 / r9×50).

# Round-16 optimization phase (optimization round 2 of 2): the LSH pair
# expansion now streams through two explodes (operators/dedup.py —
# primaries and every pair consumer flow through it), corpus_pipeline
# inlines the survivors verdict, kmv_intersect fused to one linear
# pass, and warehouse_constraint_report fuses events' predicate rules
# into one scan — all listed here so the r16 window re-verifies the
# changed implementations first.
_CHANGED_THIS_ROUND: set[str] = {
    # streaming-explode LSH pair generation (operators/dedup.py):
    # primaries
    "docs_minhash_near_dup",
    "docs_minhash_containment",
    "docs_incremental_dedup",
    # pair consumers (shared pair relation / registered near-dup plan)
    "docs_dup_clusters",
    "docs_dedup_survivors",
    "docs_dedup_report",
    "docs_cluster_representatives",
    "docs_minhash_recall_sample",
    "docs_dup_triangles",
    "docs_pagerank",
    "docs_contamination_hops",
    # survivors-verdict inlined + pair-consumer
    "docs_corpus_pipeline",
    # single-pass sketch algebra
    "events_kmv_intersect",
    # fused per-table predicate scan
    "warehouse_constraint_report",
    # r16 batch 2 (sub-second-tail pass): single-scan weighted CM sketch
    "events_heavy_hitters",
    # unigram join pushed to the pair level (shared relation feeds
    # perplexity_buckets too)
    "docs_bigram_surprisal",
    "docs_perplexity_buckets",
    # one grouped pass + conditional state merge
    "events_incremental_rollup",
}
# Round-16 window math: the 19 changed queries above drain first; the
# remaining ~35 slots fill by evidence staleness from _LATEST_GREEN
# (r12-evidence cohort first, then oldest r13 entries in registration
# order) — the same routine rotation r15 ran.

# Within a staleness class, registration order normally decides who
# drains first.  This set front-loads named queries WITHIN their class
# (it never jumps a query past a staler class — _verify_priority keeps
# the round as the primary key).  Round 16: empty — no family straddle
# to repair; pure registration order stands.  Reset alongside
# _CHANGED_THIS_ROUND at each round start.
_FRONT_OF_CLASS_THIS_ROUND: set[str] = set()

# Freshest driver-green round per query, DERIVED from the committed
# CORRECTNESS_r*.json artifacts (latest green row wins; a row is green
# when it has no error and no explicit mismatch — rows-only checks
# count).  Round 6's miss was exactly this map going stale by hand:
# deriving it from the artifacts makes the rotation structural.  The
# changed-set above stays manual — it encodes which implementations
# moved, which no artifact can know.
_LATEST_GREEN: dict[str, int] = {}


def _row_is_green(row) -> bool:
    """A driver artifact row counts as green evidence iff it is a dict
    with no error, no explicit mismatch, AND at least one affirmative
    signal (rows_match is True, or rows-only checks' spark_rows) — a
    malformed/partial row ({} or all-keys-missing) must not silently
    count as fresh evidence and demote its query in the verify rotation
    (ADVICE r7)."""
    if not isinstance(row, dict):
        return False
    return (
        row.get("err") is None
        and row.get("rows_match") is not False
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
        and (
            row.get("rows_match") is True
            or row.get("spark_rows") is not None
        )
    )


def _load_latest_green() -> None:
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    repo_root = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    for path in _glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = _json.load(f)
        except Exception:
            continue  # torn/foreign artifact: skip, never fail import
        for name, row in rows.items():
            if _row_is_green(row):
                _LATEST_GREEN[name] = max(_LATEST_GREEN.get(name, 0), rnd)


_load_latest_green()


def _verify_priority(spec: QuerySpec) -> tuple[int, int]:
    if spec.name in _CHANGED_THIS_ROUND:
        return (0, 0)
    # Primary key: evidence staleness (a brand-new query has no
    # _LATEST_GREEN entry -> front of line).  Secondary key: the
    # per-round front-of-class nudge, which reorders WITHIN a staleness
    # class only — it can never promote a query past a staler one.
    rnd = _LATEST_GREEN.get(spec.name, 0)
    return (rnd, 0 if spec.name in _FRONT_OF_CLASS_THIS_ROUND else 1)


def all_specs() -> dict[str, QuerySpec]:
    # Import for side effect: modules self-register on import.
    from data_engineering_etl_demo_spark.plans import (  # noqa: F401
        analytics,
        ecommerce,
        llmdata,
        multimodal,
        scale_patterns,
        streaming_plans,
        timeseries,
        tpch,
    )
    # Stable sort: registration order preserved within each priority class.
    return dict(
        sorted(REGISTRY.items(), key=lambda kv: _verify_priority(kv[1]))
    )
