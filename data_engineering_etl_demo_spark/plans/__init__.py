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


REGISTRY: dict[str, QuerySpec] = {}

# Analyzed-plan memo: a query's DataFrame is a pure function of
# (session, sf_dir), and Spark caches the analyzed/optimized plan inside the
# DataFrame object — reusing it across actions skips re-analysis of large
# expression trees (the EP3 loader's parse chains cost more to analyze than
# to run at small SF).  Streaming queries are exempt: building their result
# RUNS the stream, which must happen on every call.
_plan_memo: dict[tuple, DataFrame] = {}


def register(name: str, oracle: Optional[str], doc: str = "", memoize: bool = True):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if memoize:

            def memo_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
                key = (name, id(spark), sf_dir)
                df = _plan_memo.get(key)
                if df is None:
                    df = fn(spark, sf_dir)
                    _plan_memo[key] = df
                return df

            spark_fn = memo_fn
        else:
            spark_fn = fn
        REGISTRY[name] = QuerySpec(
            name=name,
            spark_fn=spark_fn,
            oracle=oracle,
            doc=doc,
            module=fn.__module__.rsplit(".", 1)[-1],
        )
        return fn

    return wrap


# Round-3 verification ordering, derived from CORRECTNESS_r01/r02.json.
# The driver walks ``queries()`` in dict order and stops after ~50 of the
# 77 registered queries, so ordering decides which queries get hard-signal
# rows.  Risk-first: queries with NO green row in any round, then round-2
# reds (the ts-NTZ regression, fixed this round), then the 4 streaming
# queries (round-2's reader silently corrupted timestamps — never verified
# against the current µs testdata), then round-1-green-only queries that
# fell past round 2's cap.  Round-2 greens carry the freshest evidence and
# can safely sit beyond the cap.
_NEVER_GREEN = {
    "events_purchase_window",
    "events_rolling_hour",
    "events_ordered_funnel",
    "events_session_window",
    "events_user_scd2",
}
_ROUND2_RED = {
    "dau",
    "revenue",
    "event_counts",
    "funnel",
    "events_preview",
    "quarantine_invalid_events",
    "dedup_keep_latest",
    "props_k_stats",
    "events_click_attribution",
}
_ROUND2_GREEN = {
    "events_sketch_distinct", "events_time_rollup", "events_pivot_daily",
    "events_unpivot_daily", "events_cohort_retention", "pricing_summary",
    "top_customers", "nation_rollup", "order_rank", "customers_without_orders",
    "all_parties_union", "pricing_percentiles", "shipping_priority",
    "regional_supplier_volume", "returned_item_revenue",
    "orders_above_customer_avg", "order_priority_lateship",
    "large_quantity_orders", "customer_order_distribution",
    "idle_rich_customers", "brand_quantity_revenue", "top_supplier_revenue",
    "sole_late_supplier", "docs_pack_batches", "intl_revenue",
    "ecommerce_events_canonical", "ecommerce_loader_stats",
    "ecommerce_intl_canonical", "ecommerce_intl_stats", "docs_token_stats",
    "docs_quality", "docs_lang_id", "docs_top_tokens", "docs_exact_dedup",
    "docs_minhash_near_dup", "docs_dup_clusters",
}


def _verify_priority(spec: QuerySpec) -> int:
    if spec.name in _NEVER_GREEN:
        return 0
    if spec.name in _ROUND2_RED:
        return 1
    if spec.module == "streaming_plans":
        return 2
    if spec.name in _ROUND2_GREEN:
        return 4
    return 3


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
