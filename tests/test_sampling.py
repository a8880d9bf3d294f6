"""Weighted (A-ES) and stratified sampling: distributional sanity and the
exactness of the skew-safe two-phase top-m rewrite."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from data_engineering_etl_demo_spark.plans import all_specs

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_sample_favors_heavy_docs(spark):
    """A-ES with w = n_chars must overrepresent long documents: the mean
    length of the selected sample should exceed the corpus mean, and
    every weight must be respected deterministically (same result twice)."""
    spec = all_specs()["docs_weighted_sample"]
    out1 = spec.spark_fn(spark, SF_DIR).collect()
    out2 = spec.spark_fn(spark, SF_DIR).collect()
    assert out1 == out2
    sample_mean = sum(r["n_chars"] for r in out1) / len(out1)
    corpus_mean = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_stratified_two_phase_equals_direct_window(spark):
    """The salted two-phase top-m must be bit-identical to the direct
    per-stratum window on a synthetic skewed input (one giant stratum,
    several tiny ones)."""
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4600, F.lit("en"))
        .when(F.col("id") < 4800, F.lit("de"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 7).cast("string")))
        .alias("lang"),
        F.pmod(F.hash(F.col("id").cast("string")), F.lit(1 << 30)).alias("h"),
    )
    m, salts = 8, 16
    w1 = Window.partitionBy("lang", "_salt").orderBy("h", "doc_id")
    w2 = Window.partitionBy("lang").orderBy("h", "doc_id")
    two_phase = (
        df.withColumn("_salt", F.pmod("doc_id", F.lit(salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= m)
        .drop("_r1", "_salt")
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= m)
    )
    direct = df.withColumn("rk", F.row_number().over(w2)).filter(
        F.col("rk") <= m
    )
    cols = ["lang", "rk", "doc_id", "h"]
    assert sorted(map(tuple, two_phase.select(cols).collect())) == sorted(
        map(tuple, direct.select(cols).collect())
    )


def test_stratified_sample_equal_allocation(spark):
    out = all_specs()["docs_stratified_sample"].spark_fn(spark, SF_DIR).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    n_lang = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang")
        .distinct()
        .count()
    )
    assert len(by_lang) == n_lang
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_shard_manifest_covers_corpus_and_balances(spark):
    """Every doc lands in exactly one shard (token/doc totals conserved),
    all shards are populated, and the md5 mixing keeps the largest shard
    within 2x the mean — the property that makes hash sharding safe to
    use for worker balancing at any doc_id distribution."""
    rows = all_specs()["docs_shard_manifest"].spark_fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    n_total = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_total
    assert len(rows) == 16 and all(r["n_docs"] > 0 for r in rows)
    assert max(r["n_docs"] for r in rows) <= 2 * (n_total / 16)
    assert all(r["max_doc_tokens"] <= r["n_tokens"] for r in rows)
