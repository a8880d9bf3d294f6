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

# vocabulary for the recall corpus: deterministic pseudo-words
_VOCAB = [f"w{i:03d}" for i in range(400)]


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


def _recall_corpus():
    """40 planted near-dup pairs spanning the advertised jaccard range
    (~0.5 … ~0.95) plus 20 unrelated docs.  Each pair (2i, 2i+1) shares a
    prefix of a 40-word document; suffix words are swapped for fresh
    vocabulary to dial the shingle overlap.  Deterministic — no RNG."""
    rows = []
    n_words = 40
    for i in range(40):
        base = [_VOCAB[(i * 7 + j) % 200] for j in range(n_words)]
        # replace the last k words: shingle jaccard ≈ (n-k-2)/(n+k+2)
        k = 2 + (i % 12)  # k in 2..13 → jaccard ≈ 0.95 … 0.48
        variant = base[: n_words - k] + [
            _VOCAB[200 + (i * 13 + j) % 200] for j in range(k)
        ]
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(variant)))
    for i in range(20):
        rows.append(
            (100 + i, " ".join(_VOCAB[(100 + i * 11 + j) % 397] for j in range(25)))
        )
    return rows


def test_lsh_recall_at_advertised_threshold(spark):
    """Recall pin (SURVEY §2 dedup contract): every pair whose EXACT shingle
    jaccard clears the default verify threshold must be produced by the
    banded pipeline.  The exact ground truth is the brute-force all-pairs
    jaccard over the same shingle sets; the 12×2 band geometry gives
    ≈0.97 collision probability at 0.5 and this deterministic fixture
    (fixed md5 hashes) collides on every qualifying pair, so any geometry
    regression that reopens the round-1 recall hole turns this red."""
    corpus = spark.createDataFrame(_recall_corpus(), "doc_id long, text string")

    shingled = D.explode_shingles(corpus, "doc_id", "text")
    sa = shingled.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = shingled.select(F.col("doc_id").alias("id_b"), "shingle")
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sa.join(sb, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), on="id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), on="id_b")
        .withColumn("j", F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")))
        .filter(F.col("j") >= 0.5)
    )
    want = {(r["id_a"], r["id_b"]) for r in truth.collect()}
    assert len(want) >= 25, "fixture must actually plant pairs above threshold"
    # the planted range must include near-threshold pairs, not just easy ones
    j_vals = [r["j"] for r in truth.collect()]
    assert min(j_vals) < 0.6 and max(j_vals) > 0.85

    got_df = D.minhash_near_dup(corpus, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in got_df.collect()}
    missed = want - got
    assert not missed, f"banding missed {len(missed)} qualifying pairs: {sorted(missed)[:5]}"
    # and nothing below threshold sneaks through the exact verify
    assert all(r["jaccard"] >= 0.5 for r in got_df.collect())


def test_stop_bucket_cap_drops_mega_buckets_only(spark):
    """max_bucket_width: 30 identical boilerplate docs form mega-buckets in
    every band (their pairs are the quadratic cost); a small planted
    near-dup pair lives in narrow buckets.  With the cap, the boilerplate
    pair space is dropped while the narrow-bucket pair survives; with the
    default (None) everything is found."""
    rows = [(i, "common boilerplate header repeated on every page of the "
                "site with nothing else to say " * 3) for i in range(30)]
    rows += [(100, BASE), (101, BASE + " and a little more")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    full = {(r["id_a"], r["id_b"])
            for r in D.minhash_near_dup(corpus, threshold=0.5).collect()}
    assert (100, 101) in full
    assert (0, 1) in full  # identical docs: found when uncapped

    capped = {(r["id_a"], r["id_b"])
              for r in D.minhash_near_dup(
                  corpus, threshold=0.5, max_bucket_width=10).collect()}
    assert (100, 101) in capped  # narrow-bucket pair survives the cap
    assert not any(a < 100 and b < 100 for a, b in capped), (
        "mega-bucket (boilerplate) pairs must be dropped by the cap")


# ---------------------------------------------------------------------------
# Duplicated-span removal (CCNet line-dedup shape on planted spans)
# ---------------------------------------------------------------------------


def test_span_dedup_removes_shared_span_keeps_unique(spark):
    # span size is 8 words; doc A and doc B share their FIRST 8-word span
    # exactly, and each carries a unique second span.  The shared span must
    # be dropped from both docs, the unique spans kept verbatim.
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    ua = "iota kappa lamda mu nu xi omicron pi"  # 8 words
    ub = "rho sigma tau upsilon phi chi psi omega"  # 8 words
    docs = spark.createDataFrame(
        [(0, f"{shared} {ua}"), (1, f"{shared} {ub}"), (2, "lone short doc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.span_dedup(docs).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0]["n_spans"] == 2 and out[0]["n_dup_spans"] == 1
    assert out[0]["n_kept_tokens"] == 8
    assert out[0]["cleaned_fp"] == md5(ua)
    assert out[1]["cleaned_fp"] == md5(ub)
    # the singleton doc is untouched (its one partial span survives)
    assert out[2]["n_dup_spans"] == 0 and out[2]["n_kept_tokens"] == 3
    assert out[2]["cleaned_fp"] == md5("lone short doc")


def test_span_dedup_all_spans_removed_yields_empty_fingerprint(spark):
    # both docs are a single identical span -> everything removed; the
    # cleaned fingerprint must be md5('') in BOTH engines (the oracle
    # coalesces DuckDB's NULL string_agg to '').
    t = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(0, t), (1, t)], "doc_id long, text string"
    )
    import hashlib

    for r in D.span_dedup(docs).collect():
        assert r["n_kept_tokens"] == 0
        assert r["cleaned_fp"] == hashlib.md5(b"").hexdigest()


def test_containment_flags_embedded_doc_jaccard_misses(spark):
    # doc 1 = doc 0 plus as much new text again: containment(0,1) = 1.0
    # (every shingle of 0 appears in 1) while jaccard ~ 0.5 sits below a
    # 0.8 near-dup threshold — the asymmetric case containment exists for.
    base = " ".join(f"w{i:03d}" for i in range(40))
    extra = " ".join(f"x{i:03d}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, base), (1, base + " " + extra), (2, extra.upper() + " unrelated")],
        "doc_id long, text string",
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.minhash_containment(docs, threshold=0.8).collect()
    }
    assert cont.get((0, 1)) == 1.0
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_near_dup(docs, threshold=0.8).collect()
    }
    assert (0, 1) not in jac  # symmetric jaccard misses the embedding


def test_kernels_tolerate_null_text(spark):
    """NULL text must behave like the SQL forms (no rows / zero grams),
    not crash the Arrow kernel task (review r5 finding)."""
    from data_engineering_etl_demo_spark.operators import dedup as D
    from data_engineering_etl_demo_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(2, "the quick brown fox jumps over the lazy dog"), (4, None)],
        "doc_id long, text string",
    )
    # explode_shingles path (None word array must emit nothing)
    sh = D.explode_shingles(docs, id_col="doc_id", text_col="text").collect()
    assert {r["doc_id"] for r in sh} == {2}
    # winnowing stats path (None text = zero grams, still one stats row)
    st_rows = TX.fingerprint_winnow_stats(docs, id_col="doc_id", s_col="text")
    got = {r["doc_id"]: r["n_fp"] for r in st_rows.collect()}
    assert got[4] == 0 and got[2] > 0
