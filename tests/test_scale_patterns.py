"""Scale-pattern operators: count-min never undercounts, salted aggregation
is bit-identical to the direct groupBy, SCD2 rebuilds the exact version
history, and the winnow-fingerprint kernel matches the Catalyst reference
expressions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_etl_demo_spark.operators import scd
from data_engineering_etl_demo_spark.operators import sketches as K
from data_engineering_etl_demo_spark.operators import text as X


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def test_cm_never_undercounts(spark):
    rows = [("g", v % 97) for v in range(3000)]  # 97 keys, ~31 each
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("g", T.StringType()),
                            T.StructField("k", T.LongType())])
    )
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    est = {r["k"]: r["cm_n"] for r in K.cm_estimates(df, "g", "k").collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # collisions only inflate
    # with 97 keys in 4x64 counters, the min-row estimate should stay tight
    assert sum(est[k] - exact[k] for k in exact) / len(exact) < 3 * (3000 / K.CM_WIDTH)


# ---------------------------------------------------------------------------
# salted aggregation
# ---------------------------------------------------------------------------


def test_salted_agg_equals_direct(spark):
    # one hot key (80% of rows) plus a uniform tail — the skew scenario
    rows = [(i, "hot" if i % 5 else f"u{i % 23}", float(i % 7) + 0.25)
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("event_id", T.LongType()),
                            T.StructField("user_id", T.StringType()),
                            T.StructField("value", T.DoubleType())])
    )
    fixed = F.round(F.col("value") * F.lit(1_000_000)).cast("long")
    direct = {
        r["user_id"]: (r["n"], r["s"])
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(fixed) / F.lit(1e6), 2).alias("s"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], r["s"])
        for r in df.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("user_id", "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(fixed).alias("_s"))
        .groupBy("user_id")
        .agg(F.sum("_n").alias("n"),
             F.round(F.sum("_s") / F.lit(1e6), 2).alias("s"))
        .collect()
    }
    assert salted == direct


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------

_SCD_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("attr", T.StringType()),
    ]
)


def _scd_rows(spark, rows):
    df = spark.createDataFrame(rows, _SCD_SCHEMA)
    out = scd.scd2(df, key="uid", attr="attr", ts="ts", tiebreak="seq")
    return sorted(map(tuple, out.collect()))


def test_scd2_versions_and_intervals(spark):
    rows = [
        ("u1", 10, 1, "a"),
        ("u1", 20, 2, "a"),
        ("u1", 30, 3, "b"),   # change a -> b
        ("u1", 40, 4, "a"),   # change back — a NEW version, not a merge
        ("u2", 5, 5, "x"),
    ]
    assert _scd_rows(spark, rows) == [
        ("u1", 1, "a", 10, 30, 2, 0),
        ("u1", 2, "b", 30, 40, 1, 0),
        ("u1", 3, "a", 40, None, 1, 1),
        ("u2", 1, "x", 5, None, 1, 1),
    ]


def test_scd2_null_attr_and_ties(spark):
    rows = [
        ("u1", 10, 2, None),  # leading null value is version 1
        ("u1", 10, 3, "a"),   # same ts — seq breaks the tie deterministically
        ("u1", 20, 4, None),
        ("u1", 30, 5, None),  # null == null (null-safe): same version
    ]
    assert _scd_rows(spark, rows) == [
        ("u1", 1, None, 10, 10, 1, 0),
        ("u1", 2, "a", 10, 20, 1, 0),
        ("u1", 3, None, 20, None, 2, 1),
    ]


# ---------------------------------------------------------------------------
# winnow fingerprint explode kernel == Catalyst reference expressions
# ---------------------------------------------------------------------------


def test_winnow_fingerprints_match_catalyst(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "ab"),  # shorter than one 8-gram: no fingerprints
        (4, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(
        texts, T.StructType([T.StructField("doc_id", T.LongType()),
                             T.StructField("text", T.StringType())])
    )
    norm = df.select(
        "doc_id", F.array_join(X.words(F.col("text")), " ").alias("s")
    )
    got = sorted(
        map(tuple, X.winnow_fingerprints(norm).collect())
    )
    ref = sorted(
        map(
            tuple,
            df.select(
                "doc_id",
                F.explode(X.winnow(X.rolling_hashes(F.col("text")))).alias("fp"),
            ).collect(),
        )
    )
    assert got == ref
    assert not any(d == 3 for d, _ in got)  # too short -> empty, no rows


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_windows_overlap_semantics(spark):
    vocab = " ".join(f"w{i:03d}" for i in range(300))
    df = spark.createDataFrame(
        [(1, vocab), (2, "a b c d e"), (3, ""), (4, vocab)],
        "doc_id long, text string",
    )
    rows = X.chunk_windows(df, size=128, overlap=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # doc 1: 300 tokens, step 96 -> starts 0/96/192/288
    d1 = by_doc[1]
    assert sorted(d1) == [0, 1, 2, 3]
    assert [d1[k]["start_tok"] for k in sorted(d1)] == [0, 96, 192, 288]
    assert [d1[k]["n_tokens"] for k in sorted(d1)] == [128, 128, 108, 12]
    # short doc: one truncated chunk; empty doc: no chunks
    assert by_doc[2][0]["n_tokens"] == 5 and by_doc[2][0]["start_tok"] == 0
    assert 3 not in by_doc
    # identical text -> identical chunk checksums (content-addressable)
    assert {
        (k, v["checksum"]) for k, v in by_doc[1].items()
    } == {(k, v["checksum"]) for k, v in by_doc[4].items()}


def test_edit1_blocking_equals_brute_force(spark):
    """The wildcard-neighborhood join must find EXACTLY the brute-force
    edit-distance-1 pair set — blocking is recall-complete for
    substitution distance 1 by construction (two equal-length names at
    distance 1 share the variant holed at their single differing
    position), and the levenshtein residual removes nothing true."""
    from data_engineering_etl_demo_spark.plans import all_specs

    sf = "/root/testdata/sf0.001"
    got = {
        (r["pos"], r["n_pairs"])
        for r in all_specs()["customers_edit1_pairs"].spark_fn(spark, sf).collect()
    }
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    a = c.select(F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"))
    b = c.select(F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"))
    brute = (
        a.crossJoin(b)
        .filter((F.col("ka") < F.col("kb")) & (F.levenshtein("na", "nb") == 1))
        .collect()
    )
    # recover the differing position for each brute pair driver-side
    from collections import Counter

    per_pos = Counter()
    for r in brute:
        diffs = [i + 1 for i, (x, y) in enumerate(zip(r["na"], r["nb"])) if x != y]
        assert len(diffs) == 1
        per_pos[diffs[0]] += 1
    assert got == {(p, n) for p, n in per_pos.items()}


def test_bloom_prune_no_false_negatives(spark):
    """Bloom membership can only over-approximate: every true match must
    be a candidate (candidates == true + false-positives), which is the
    no-false-negative guarantee the pruning pattern rests on."""
    from data_engineering_etl_demo_spark.plans import all_specs

    row = all_specs()["lineitem_bloom_prune"].spark_fn(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert row["n_candidates"] == row["n_true_matches"] + row["n_false_positives"]
    assert 0 < row["n_true_matches"] <= row["n_candidates"] <= row["n_fact_rows"]
    assert row["bits_set"] > 0
