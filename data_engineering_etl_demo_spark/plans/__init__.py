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
                from data_engineering_etl_demo_spark.catalog import session_key

                # applicationId, not id(spark): a stopped+restarted session
                # can reuse the same object address, which would serve a
                # stale analyzed plan from the dead context
                key = (name, session_key(spark), sf_dir)
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


# Round-4 verification ordering.  The driver walks ``queries()`` in dict
# order and stops after ~50 of the registered queries, so ordering decides
# which queries get hard-signal rows.  Principle (round-3 advice): order by
# EVIDENCE STALENESS OF THE CURRENT IMPLEMENTATION, not by last round's
# colors —
#   0. queries that have NEVER had a driver green row (new this round;
#      zero hard-signal evidence exists),
#   1. queries whose implementation changed this round but that were green
#      on the old code (local sf0.01/sf0.1 parity is their only fresh
#      evidence),
#   2. queries whose freshest green is round 2 (beyond round 3's cap; two
#      rounds stale),
#   3. everything green in round 3 (freshest evidence; safe beyond cap),
#   4. streaming last — round-3 green AND each one costs multiple seconds
#      of driver budget.
_IMPL_CHANGED_THIS_ROUND = {
    # MinHash base hash reworked (word-fold kernel, 20x2 bands)
    "docs_minhash_near_dup",
    "docs_incremental_dedup",
    "docs_dedup_survivors",
    "docs_dup_clusters",
    # IVF/k-means vectorized single-pass kernels
    "embedding_topk_ivf",
    "embedding_kmeans_step",
    # SimHash signature kernelized (word-md5 + numpy bit votes)
    "docs_simhash",
    "docs_simhash_near_dup",
    # shuffle-hash join
    "sole_late_supplier",
    # oracle empty-array guard
    "embedding_quantize",
}
_CHANGED_THIS_ROUND = {
    # NEW this round — never had a driver green row at all
    "forecast_revenue",
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "shipping_delay_priority",
    "promo_revenue",
    "docs_chunk_windows",  # new last session (sliding-window chunking)
    "min_cost_supplier",
    "important_parts",
    "supplier_part_variety",
    "small_quantity_revenue",
    "dominant_part_suppliers",
    "docs_word_bigrams",
    "docs_unigram_surprisal",
    "embedding_pq_codes",
    "embedding_pq_adc_topk",
    "events_gapfill_daily",
    "events_revenue_anomaly_days",
    "streaming_enriched_counts",
    "embedding_ivf_pq_topk",
    "multimodal_patch_grid",
    "events_salted_type_join",
    "nation_wealth_balance",
    "events_cohort_setops",
    "docs_dedup_report",
    "streaming_dedup_counts",
    "customer_balance_deciles",
    "events_inter_arrival",
    "docs_vocab_growth",
    "docs_length_histogram",
    "monthly_revenue_growth",
    "events_rolling_wau",
    "docs_dup_triangles",
    "market_basket_pairs",
    "docs_cluster_representatives",
    "events_type_transitions",
    # NEW this session
    "lineitem_zorder_pages",  # z-order zone maps (operators/layout.py)
    "docs_weighted_sample",  # A-ES weighted sampling
    "docs_pagerank",  # fixed-point PageRank over the near-dup graph
    "embedding_semdedup",  # semantic dedup verdicts (SemDeDup shape)
    "events_value_ema",  # sequential per-key recurrence as array fold
    "streaming_value_ema",  # the same recurrence with cross-batch state
    "docs_stratified_sample",  # salted two-phase per-stratum top-m
    "docs_span_dedup",
    "docs_bpe_pair_merge",
    "orders_profile",
    "embedding_topk_ivf2",
    "events_kmv_merge",
    "docs_train_split",
    "docs_minhash_containment",
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
    if spec.name in _CHANGED_THIS_ROUND:
        return 0
    if spec.name in _IMPL_CHANGED_THIS_ROUND:
        return 1
    if spec.name in _ROUND2_GREEN:
        return 2
    if spec.module == "streaming_plans":
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
