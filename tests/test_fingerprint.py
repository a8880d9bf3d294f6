"""Rolling-hash + winnowing fingerprints: the Arrow kernel must agree with
the pure-Catalyst column functions (the semantic reference) on every edge
case — empty text, text shorter than one k-gram, hash arrays shorter than
one winnow window — and fingerprints must behave like winnowing promises:
shared substrings of length >= k+w-1 produce shared fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.operators import text as X

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the river bank."),
    (1, "the QUICK brown    fox!!! jumps over the lazy dog near a canyon."),
    (2, ""),  # empty
    (3, "abc"),  # shorter than k=8 after normalization
    (4, "abcdefgh"),  # exactly one k-gram -> single window
    (5, "abcdefghij"),  # 3 grams < w=4 windows -> single min
]


def _catalyst(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    df = df.select("doc_id", X.rolling_hashes(F.col("text")).alias("H"))
    df = df.select("doc_id", "H", X.winnow(F.col("H")).alias("W"))
    return {
        r["doc_id"]: (
            len(r["H"]),
            len(r["W"]),
            r["W"][0] if r["W"] else None,
            r["W"][-1] if r["W"] else None,
        )
        for r in df.collect()
    }


def _kernel(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    norm = df.select(
        "doc_id", F.array_join(X.words(F.col("text")), " ").alias("s")
    )
    return {
        r["doc_id"]: (r["n_grams"], r["n_fp"], r["min_fp"], r["max_fp"])
        for r in X.fingerprint_winnow_stats(norm).collect()
    }


def test_kernel_matches_catalyst_reference(spark):
    assert _kernel(spark) == _catalyst(spark)


def test_shared_substring_shares_fingerprint(spark):
    df = spark.createDataFrame(DOCS[:2], ["doc_id", "text"])
    rows = df.select(
        "doc_id",
        X.winnow(X.rolling_hashes(F.col("text"))).alias("W"),
    ).collect()
    sets = {r["doc_id"]: set(r["W"]) for r in rows}
    # docs 0 and 1 share long normalized substrings -> fingerprint overlap
    assert sets[0] & sets[1]


def test_empty_and_short_docs(spark):
    got = _kernel(spark)
    assert got[2] == (0, 0, None, None)
    assert got[3] == (0, 0, None, None)
    assert got[4][0] == 1 and got[4][1] == 1
    assert got[5] == (3, 1, got[5][2], got[5][2])  # single min window


# ---------------------------------------------------------------------------
# PII scrub (planted bytes — the sf corpus contains no PII)
# ---------------------------------------------------------------------------

_PII_DOCS = [
    (0, "contact alice@example.com or bob.smith+tag@mail.co.uk today"),
    (1, "server at 192.168.0.1 and backup at 10.0.0.255 responded"),
    (2, "call +1 555 123-4567 or (020) 7946 0958 now"),
    (3, "see https://example.com/path?q=1 and http://other.org"),
    (4, "perfectly clean text with no sensitive content at all"),
]


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(_PII_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(X.PII_EMAIL_RE)).alias("e"),
            F.regexp_count(F.col("text"), F.lit(X.PII_IPV4_RE)).alias("i"),
            F.regexp_count(F.col("text"), F.lit(X.PII_PHONE_RE)).alias("p"),
            F.regexp_count(F.col("text"), F.lit(X.URL_RE)).alias("u"),
            X.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (got[0]["e"], got[0]["i"], got[0]["p"], got[0]["u"]) == (2, 0, 0, 0)
    assert "<EMAIL>" in got[0]["red"] and "alice" not in got[0]["red"]
    assert got[1]["i"] == 2 and "<IP>" in got[1]["red"]
    assert "192.168.0.1" not in got[1]["red"]
    assert got[2]["p"] >= 2 and "<PHONE>" in got[2]["red"]
    assert got[3]["u"] == 2
    assert got[4] is not None and got[4]["red"] == _PII_DOCS[4][1]


def test_pii_redaction_matches_duckdb(spark):
    """Cross-engine: the oracle's regexp_replace chain produces the same
    redacted text for the planted bytes (same regex subset both dialects)."""
    import duckdb

    df = spark.createDataFrame(_PII_DOCS, ["doc_id", "text"])
    spark_red = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", X.pii_redact(F.col("text")).alias("red")).collect()
    }
    con = duckdb.connect()
    for doc_id, text in _PII_DOCS:
        (duck_red,) = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(?,"
            f" '{X.PII_EMAIL_RE}', '<EMAIL>', 'g'),"
            f" '{X.PII_IPV4_RE}', '<IP>', 'g'),"
            f" '{X.PII_PHONE_RE}', '<PHONE>', 'g')",
            [text],
        ).fetchone()
        assert spark_red[doc_id] == duck_red, doc_id
