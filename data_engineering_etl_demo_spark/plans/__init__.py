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
                    # memo-miss = possibly a fresh session: drop entries
                    # whose classic SparkContext has stopped, so a
                    # session-cycling driver doesn't pin dead plan
                    # handles forever (ADVICE r5/r6 leak class; Connect
                    # sessions without _sc are kept)
                    for k in list(_plan_memo):
                        if k == key:
                            continue
                        try:
                            sc = getattr(
                                _plan_memo[k].sparkSession, "_sc", None
                            )
                            if sc is None:
                                continue
                            dead = sc._jsc is None
                        except Exception:
                            dead = True
                        if dead:
                            _plan_memo.pop(k, None)
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


# Round-7 verification ordering.  The driver walks ``queries()`` in dict
# order and stops after ~50 of the registered queries, so ordering decides
# which queries get hard-signal rows.  Principle (rounds 3-6, restated by
# VERDICT r6 item 1): order by EVIDENCE STALENESS OF THE CURRENT
# IMPLEMENTATION — queries changed this round first (their old green rows
# no longer cover the code), then ascending by the round of each query's
# freshest driver green (the _LATEST_GREEN map below, computed from the
# CORRECTNESS_r01..r06 union).  Round 7 FREEZES new-query growth (VERDICT
# r6 item 1): the changed set is 4 queries, so the ~50-slot window drains
# the entire <=r3 cohort plus the oldest r4 entries — after it lands, no
# registry query carries evidence older than r4.
#
# NOT listed as changed, deliberately: the r7 streaming-drain infra edits
# (per-drain-unique memory-sink names, dead-clone pruning in
# streaming/pipeline.py) alter no computed row of any streaming query —
# every stream's output remains pinned equal to its batch oracle by
# tests/test_streaming.py, and the registered query bodies are untouched.

_CHANGED_THIS_ROUND: set[str] = {
    # per-user rank windows -> domain-bounded histogram rank algebra,
    # DECIMAL(38,0) ppm terms (VERDICT r6 weakness 1):
    "events_concentration_report",
    # consume the shared persisted near-dup pair relation instead of
    # re-deriving the LSH pipeline per call (VERDICT r6 weakness 2):
    "docs_pagerank",
    "docs_contamination_hops",
    "docs_minhash_recall_sample",
    # tercile cut consumes the shared persisted surprisal relation
    # (VERDICT r6 item 5):
    "docs_perplexity_buckets",
}

# Freshest driver-green round per query, from the CORRECTNESS_r01..r05
# union (latest row wins; every row in that union is green).
_LATEST_GREEN: dict[str, int] = {}
for _r, _names in {
    2: [
        "brand_quantity_revenue", "customer_order_distribution",
        "idle_rich_customers", "large_quantity_orders",
        "order_priority_lateship", "orders_above_customer_avg",
        "top_supplier_revenue",
    ],
    3: [
        "dau", "dedup_keep_latest", "docs_boilerplate_ngrams",
        "docs_decontaminate", "docs_fingerprint_winnow",
        "docs_ngram_jaccard", "docs_pii_scrub", "docs_repetition",
        "docs_sample_mix", "docs_tfidf_topterms", "docs_token_stats",
        "docs_winnow_overlap", "embedding_label_stats",
        "embedding_near_dup", "embedding_near_dup_exact", "embedding_topk",
        "event_counts", "events_heavy_hitters", "events_ordered_funnel",
        "events_preview", "events_purchase_window", "events_rolling_hour",
        "events_salted_user_stats", "events_session_window",
        "events_user_scd2", "funnel", "intl_revenue",
        "multimodal_audio_features", "multimodal_decode",
        "multimodal_frame_sample", "multimodal_resize", "props_k_stats",
        "quarantine_invalid_events", "revenue",
        "streaming_click_purchase_join", "streaming_window_counts",
    ],
    4: [
        "customer_balance_deciles", "docs_bpe_pair_merge",
        "docs_chunk_windows", "docs_cluster_representatives",
        "docs_dedup_report", "docs_dup_triangles", "docs_length_histogram",
        "docs_minhash_containment", "docs_pagerank", "docs_span_dedup",
        "docs_stratified_sample", "docs_train_split",
        "docs_unigram_surprisal", "docs_vocab_growth",
        "docs_weighted_sample", "docs_word_bigrams",
        "dominant_part_suppliers", "embedding_pq_adc_topk",
        "embedding_pq_codes", "embedding_semdedup", "embedding_topk_ivf2",
        "events_cohort_setops", "events_gapfill_daily",
        "events_inter_arrival", "events_kmv_merge",
        "events_revenue_anomaly_days", "events_rolling_wau",
        "events_salted_type_join", "events_type_transitions",
        "events_value_ema", "forecast_revenue", "important_parts",
        "lineitem_zorder_pages", "market_basket_pairs", "market_share",
        "min_cost_supplier", "monthly_revenue_growth",
        "multimodal_patch_grid", "nation_trade_volume",
        "nation_wealth_balance", "orders_profile", "product_profit",
        "promo_revenue", "shipping_delay_priority",
        "small_quantity_revenue", "streaming_dedup_counts",
        "streaming_enriched_counts", "supplier_part_variety",
    ],
    5: [
        "all_parties_union", "customers_edit1_pairs",
        "customers_without_orders", "docs_contamination_hops",
        "docs_dedup_survivors", "docs_dup_clusters", "docs_exact_dedup",
        "docs_incremental_dedup", "docs_lang_id", "docs_minhash_near_dup",
        "docs_pack_batches", "docs_quality", "docs_shard_manifest",
        "docs_simhash", "docs_simhash_near_dup", "docs_top_tokens",
        "ecommerce_events_canonical", "ecommerce_intl_canonical",
        "ecommerce_intl_stats", "ecommerce_loader_stats",
        "embedding_ivf_pq_rerank", "embedding_ivf_pq_topk",
        "embedding_ivf_pq_topk2", "embedding_kmeans_step",
        "embedding_quantize", "embedding_topk_ivf",
        "events_click_attribution", "events_cohort_retention",
        "events_generated_quarantine", "events_pivot_daily",
        "events_sketch_distinct", "events_time_rollup",
        "events_type_day_cube", "events_unpivot_daily",
        "lineitem_bloom_prune", "lineitem_zonemap_skip", "nation_rollup",
        "order_rank", "pricing_percentiles", "pricing_summary",
        "regional_supplier_volume", "returned_item_revenue",
        "shipping_priority", "sole_late_supplier", "streaming_sessionize",
        "streaming_sessionize_flush", "streaming_value_ema",
        "streaming_value_ema_ooo", "top_customers",
        "warehouse_constraint_report",
    ],
    6: [
        "customer_ltv_triangle", "customer_order_distribution",
        "customers_k_anonymity", "docs_bigram_surprisal",
        "docs_cluster_representatives", "docs_corpus_pipeline",
        "docs_dedup_survivors", "docs_dup_clusters", "docs_gopher_rules",
        "docs_minhash_recall_sample", "docs_perplexity_buckets",
        "docs_preference_pairs", "docs_quality", "docs_split_leakage",
        "docs_tokenizer_fertility", "embedding_ann_recall",
        "embedding_cell_balance", "embedding_dedup_curve",
        "embedding_hamming_topk", "embedding_hard_negatives",
        "embedding_ivf_pq_rerank", "embedding_ivf_pq_topk",
        "embedding_ivf_pq_topk2", "embedding_kmeans_inertia",
        "embedding_semdedup", "events_ab_lift",
        "events_concentration_report", "events_disorder_profile",
        "events_dp_release", "events_histogram_quantiles",
        "events_incremental_rollup", "events_kmv_intersect",
        "events_markov_attribution", "events_multitouch_attribution",
        "events_position_attribution", "events_props_variant",
        "events_value_ema", "large_quantity_orders", "lineitem_dpp_prune",
        "multimodal_format_census", "multimodal_phash_dedup",
        "order_priority_lateship", "orders_above_customer_avg",
        "sole_late_supplier", "streaming_full_outer_join",
        "streaming_kmv_distinct", "streaming_left_outer_join",
        "streaming_topk_values", "streaming_value_ema_ooo",
        "warehouse_snapshot_diff",
    ],
}.items():
    for _n in _names:
        _LATEST_GREEN[_n] = _r


def _verify_priority(spec: QuerySpec) -> int:
    if spec.name in _CHANGED_THIS_ROUND:
        return 0
    # a brand-new query has no _LATEST_GREEN entry -> also front of line
    return _LATEST_GREEN.get(spec.name, 0)


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
