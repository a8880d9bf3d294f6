"""Registry-wide physical-plan lint: the 100 TB posture, enforced.

Walks every registered batch query at sf0.001 and asserts the properties
the design rules promise (README "Design rules", PLANS.md):

- no CartesianProduct node anywhere, except the explicitly documented
  bounded all-pairs baselines;
- no BatchEvalPython node (row-at-a-time Python UDF) anywhere — Python in
  the row path must be Arrow-batched (MapInPandas / FlatMapGroupsInPandas);
- every parquet scan of the wide tables prunes its ReadSchema (never reads
  all columns of events/lineitem unless the query genuinely needs them).

Streaming queries are exempt: building their plan runs the stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.plans import all_specs

SF_DIR = "/root/testdata/sf0.001"

# Documented bounded all-pairs baselines (ground truth for the LSH paths):
# - docs_ngram_jaccard: doc_id < _NGRAM_SAMPLE (import-time asserted ≤1000)
# - embedding_near_dup_exact: mapInPandas block-nested-loop, side file
#   bounded by EXACT_BASELINE_MAX_ROWS (not a Catalyst cartesian, but its
#   query plan also carries a small crossJoin for the oracle projection)
_CARTESIAN_OK = {
    "docs_ngram_jaccard",
    "embedding_near_dup_exact",
}


def _specs():
    return [
        (name, spec)
        for name, spec in all_specs().items()
        if spec.module != "streaming_plans"
    ]


@pytest.fixture(scope="module")
def plans(spark):
    """name → (optimized, executed) plan strings for every batch query."""
    out = {}
    for name, spec in _specs():
        df = spec.spark_fn(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        out[name] = (qe.optimizedPlan().toString(), qe.executedPlan().toString())
    return out


def test_no_undeclared_cartesian_products(plans):
    offenders = {
        name
        for name, (opt, phys) in plans.items()
        if "CartesianProduct" in phys and name not in _CARTESIAN_OK
    }
    assert not offenders, f"undeclared cartesian products in: {sorted(offenders)}"


def test_no_row_at_a_time_python_udfs(plans):
    offenders = {
        name for name, (opt, phys) in plans.items() if "BatchEvalPython" in phys
    }
    assert not offenders, f"row-at-a-time Python UDFs in: {sorted(offenders)}"


def test_wide_table_scans_prune_columns(plans):
    """events has 6 columns, lineitem 16: a scan that reads every column
    feeds an unpruned plan.  Whitelist queries whose SEMANTICS need all
    columns (previews/dedup emit whole rows)."""
    full_events_ok = {
        "events_preview",  # emits the full row on purpose
        "dedup_keep_latest",  # keep-latest returns whole events
        "quarantine_invalid_events",  # quarantine carries the full record
        "props_k_stats",  # needs props + all grouping columns
    }
    offenders = []
    for name, (opt, phys) in plans.items():
        for line in phys.splitlines():
            if "FileScan parquet" not in line or "events.parquet" not in line:
                continue
            if "ReadSchema" not in line:
                continue
            schema = line.split("ReadSchema:")[1]
            n_cols = schema.count(":")
            if n_cols >= 6 and name not in full_events_ok:
                offenders.append((name, schema.strip()[:80]))
    assert not offenders, f"unpruned events scans: {offenders}"


def test_scan_only_queries_push_filters_to_parquet(plans):
    """The Q6-shape contract: every predicate of a scan-only aggregate must
    reach the parquet scan as a PushedFilters entry (at 100 TB this query
    IS its IO; row-group pruning on the pushed range does the work)."""
    phys = plans["forecast_revenue"][1]
    scan_lines = [
        ln
        for ln in phys.splitlines()
        if "FileScan parquet" in ln and "lineitem.parquet" in ln
    ]
    assert scan_lines, "forecast_revenue lost its lineitem FileScan"
    line = scan_lines[0]
    pushed = line.split("PushedFilters:")[1] if "PushedFilters:" in line else ""
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to the scan: {pushed[:200]}"
    schema = line.split("ReadSchema:")[1]
    # projection pruned: only the 4 referenced columns are read
    assert schema.count(":") <= 5, f"unpruned lineitem scan: {schema[:160]}"


def test_declared_dim_broadcasts_survive_threshold_off(spark):
    """The J1/J3 dim joins declare F.broadcast explicitly — at 100 TB the
    fact side must never shuffle-sort against a dim whatever
    autoBroadcastJoinThreshold says about the sampled stats.  Pin the
    DECLARED hint by turning the threshold off entirely and asserting the
    physical plan still broadcasts (a hint regression would silently plan
    SortMergeJoin at scale while tiny-SF tests keep passing via the
    threshold).  src_fn bypasses the plan memo so the plan is built under
    this conf, not served from a default-conf cache."""
    from data_engineering_etl_demo_spark.catalog import load
    from data_engineering_etl_demo_spark.operators.transform import (
        transform,
    )
    from data_engineering_etl_demo_spark.plans import all_specs

    # Restore-to-unset (ADVICE r9): pinning an explicit '10MB' on exit
    # would mask a later session-level default differing from Spark's
    # built-in.  conf.get(key, None) returns None unless the key was
    # EXPLICITLY set (defaults don't count), so None is the exact
    # "was unset" sentinel; a non-str sentinel object is rejected by
    # PySpark's type check.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # J3: events_preview's left join onto the customer dim
        df = all_specs()["events_preview"].src_fn(spark, SF_DIR)
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in phys, phys
        assert "SortMergeJoin" not in phys, phys

        # J1: transform's events <= users enrichment join
        ev = load(spark, SF_DIR, "events")
        users = ev.select(
            F.col("user_id"), F.lit("seg").alias("segment")
        ).distinct()
        clean = transform(ev, users).clean
        phys = clean._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in phys, phys
        assert "SortMergeJoin" not in phys, phys
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
