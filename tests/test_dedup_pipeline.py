"""End-to-end dedup composition (exact fingerprint + MinHash clusters →
per-doc verdict) on planted data.  The sf testdata has near-dups but no
exact copies, so the driver's oracle check never exercises the exact_dup
branch — this fixture plants both kinds and pins the precedence rules.
"""

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.operators import dedup as D
from data_engineering_etl_demo_spark.operators import text as X
from data_engineering_etl_demo_spark.operators.graph import connected_components


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles watch from a mossy log near the river bend in early autumn"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact copy of 0
        # near-dup of 0: jaccard ≈ 0.91 — high enough that the deterministic
        # md5 LSH banding provably collides (a 0.7-jaccard variant was
        # missed: band-collision probability at 0.7 is only ~0.81)
        (2, BASE + " and more"),
        (3, "completely unrelated text about integer arithmetic and "
            "parquet row groups with nothing shared at all no fox no dog "
            "just columnar storage details repeated storage details"),
        (4, BASE.upper()),  # exact after normalization (lowercase fingerprint)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _verdicts(corpus):
    fp = corpus.select("doc_id", X.fingerprint(F.col("text")).alias("fingerprint"))
    keepers = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_id"))
    pairs = D.minhash_near_dup(corpus, threshold=0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b").withColumnRenamed(
        "node", "doc_id"
    )
    out = (
        fp.join(keepers, on="fingerprint")
        .join(comp, on="doc_id", how="left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup"))
            .when(
                F.col("component").isNotNull()
                & (F.col("component") != F.col("doc_id")),
                F.lit("near_dup"),
            )
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    return {r["doc_id"]: r["status"] for r in out.collect()}


def test_verdicts(corpus):
    got = _verdicts(corpus)
    # 0 is the min id of its fingerprint group and its cluster: kept.
    # 1 and 4 share 0's normalized fingerprint: exact (precedence over near).
    # 2 shares ~0.9 of 0's shingles: near-dup, dropped toward rep 0.
    # 3 matches nothing: kept.
    assert got == {
        0: "kept",
        1: "exact_dup",
        2: "near_dup",
        3: "kept",
        4: "exact_dup",
    }


def test_survivor_set_reconstructs(corpus):
    got = _verdicts(corpus)
    kept = {d for d, s in got.items() if s == "kept"}
    assert kept == {0, 3}
    # every dropped doc's cluster representative (or fingerprint keeper)
    # survives — nothing is orphaned
    assert all(s in {"kept", "exact_dup", "near_dup"} for s in got.values())
