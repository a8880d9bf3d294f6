"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (no Python in the row path): tokenization,
BPE-ish subword counting, quality scoring, language ID, fingerprinting and
shingling.  Each has an exact DuckDB-SQL mirror in plans/llmdata.py so the
driver can oracle-check results.

Scale: every operator is a narrow map over the documents table — no
shuffle at all until an aggregation/dedup step consumes the columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex splitting on non-word runs ≈ whitespace+punctuation tokenizer.
WORD_SPLIT_RE = r"[^a-z0-9]+"

# BPE-ish token estimate: count word-piece units — runs of letters broken
# every 4 chars plus digit runs and punctuation marks.  A cheap, determin-
# istic stand-in for a real BPE vocab (which would be a broadcast lookup).
BPE_CHUNK = 4

# Tiny per-language stopword lists for n-gram-free language ID.  Real
# pipelines use fastText/CLD3; the heuristic keeps the operator fully
# SQL-expressible and deterministic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# PII / URL patterns for scrub-before-training.  Kept to the regex subset
# Java (Spark) and RE2 (DuckDB) interpret identically — character classes,
# bounded repetition, word boundaries — so the oracle replays the exact
# same match set.  Real pipelines layer NER models on top; the regex tier
# is the standard cheap first pass (and the only fully deterministic one).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d() -]{6,}\d"
URL_RE = r"https?://[^\s]+"

# Redaction applies longest-structure first (email before ipv4 before
# phone) so a pattern consumed by an earlier pass can't double-count.
PII_REDACTIONS = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def pii_redact(col: Column) -> Column:
    """text with emails → <EMAIL>, IPv4s → <IP>, phone-like digit runs →
    <PHONE>; pure Catalyst regexp_replace chain (JVM-side, no UDF)."""
    out = col
    for pattern, token in PII_REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def trunc6(x: Column) -> Column:
    """floor(x·1e6)/1e6 — engine-portable 6-decimal truncation (ROUND on
    doubles is engine-defined at the last ulp; floor/multiply/divide are
    IEEE-exact in both Spark and DuckDB)."""
    return F.floor(x * F.lit(1e6)).cast("double") / F.lit(1e6)


def norm_text(col: Column) -> Column:
    """lower + trim; the canonical form every text op works on."""
    return F.lower(F.trim(col))


def words(col: Column) -> Column:
    """array<string> of word tokens of the normalized text (empty tokens
    filtered so leading/trailing separators don't produce '' entries)."""
    return F.filter(F.split(norm_text(col), WORD_SPLIT_RE), lambda w: w != "")


def token_count(col: Column, w: Column | None = None) -> Column:
    """whitespace/punct token count.  Pass ``w`` (a precomputed words(col)
    column) to avoid re-tokenizing when several ops share one row."""
    return F.size(words(col) if w is None else w)


def bpe_token_estimate(col: Column, w: Column | None = None) -> Column:
    """ceil(len(word)/4) summed over words — a BPE-ish subword count."""
    return F.aggregate(
        words(col) if w is None else w,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(BPE_CHUNK)).cast("long"),
    )


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        trunc6(F.length(stripped) / F.length(col))
    )


def stopword_ratio(col: Column, w: Column | None = None) -> Column:
    """fraction of word tokens that are English stopwords."""
    w = words(col) if w is None else w
    hits = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS_EN)))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        trunc6(hits / F.size(w))
    )


def mean_word_len(col: Column, w: Column | None = None) -> Column:
    w = words(col) if w is None else w
    total = F.aggregate(w, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        trunc6(total / F.size(w))
    )


def quality_score(col: Column, w: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low punctuation,
    sane stopword density — the standard cheap pre-filter for web text."""
    length_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col, w) * 4, F.lit(1.0))
    return trunc6((length_term + punct_term + stop_term) / 3)


def lang_scores(col: Column, w: Column | None = None) -> dict[str, Column]:
    """markers-per-token score for each candidate language."""
    w = words(col) if w is None else w
    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(w, lambda t: t.isin(*markers)))
        out[lang] = F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
            trunc6(hits / F.size(w))
        )
    return out


def lang_id(col: Column, w: Column | None = None) -> Column:
    """argmax over lang_scores; ties broken by language code order;
    'und' (undetermined) when no marker hits at all."""
    scores = lang_scores(col, w)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # sorted → deterministic tiebreak
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the word-normalized text — whitespace/
    punctuation/case-insensitive exact-dup key (the 'rolling hash' of the
    reference's hash-id idiom, kaggle_amazon_sales_loader.py:28-31)."""
    return F.md5(F.array_join(words(col), " "))


ROLL_K = 8  # k-gram length for rolling hashes
ROLL_BASE = 31  # polynomial base
WINNOW_W = 4  # winnowing window (in consecutive k-gram hashes)


def _poly_hash_at(s: Column, i: Column, weights: list[int]) -> Column:
    """Σ_j code(s[i+j])·weights[j] as BIGINT — one k-gram's hash."""
    total = None
    for j, wgt in enumerate(weights):
        ch = F.ascii(s.substr(i + F.lit(j), F.lit(1))).cast("long")
        term = ch * F.lit(wgt).cast("long")
        total = term if total is None else total + term
    return total


def rolling_hashes(col: Column, k: int = ROLL_K, base: int = ROLL_BASE) -> Column:
    """array<long> of polynomial k-gram hashes over the word-normalized text
    (words joined by single spaces): h(i) = Σ_j code(c_{i+j})·base^(k-1-j).

    No modulus: normalized chars are [a-z0-9 ] (code ≤ 122), so the max
    hash 122·(31^8−1)/30 ≈ 1.1e13 fits BIGINT *and* sits below 2^53 —
    exact in both engines even through double conversion.  Documents
    shorter than k normalized chars yield an empty array (guarded: Spark's
    sequence(1, 0) would otherwise produce a DESCENDING [1,0])."""
    s = F.array_join(words(col), " ")
    weights = [base ** (k - 1 - j) for j in range(k)]
    n_grams = F.length(s) - F.lit(k - 1)
    return F.when(n_grams < 1, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: _poly_hash_at(s, i, weights),
        )
    )


def winnow(hashes: Column, w: int = WINNOW_W) -> Column:
    """Winnowing fingerprint set: min hash of each window of w consecutive
    k-gram hashes, deduplicated and sorted.  Any shared substring of length
    ≥ k+w−1 chars contributes a shared fingerprint (Schleimer et al.,
    SIGMOD'03 winnowing — public algorithm).  Hash arrays shorter than w
    collapse to their single overall min; empty input stays empty."""
    n_windows = F.greatest(F.size(hashes) - F.lit(w - 1), F.lit(1))
    return F.when(F.size(hashes) < 1, F.array().cast("array<long>")).otherwise(
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda i: F.array_min(F.slice(hashes, i, w)),
                )
            )
        )
    )


def _winnow_doc_fps(s, np):
    """(n_grams, sorted unique fingerprints) for ONE document — the shared
    rolling-hash + sliding-min + unique arithmetic of the two winnowing
    kernels below (one computation, two output adapters; NULL text behaves
    as empty, matching the Catalyst reference's null propagation)."""
    k, w = ROLL_K, WINNOW_W
    c = np.frombuffer((s or "").encode("ascii"), dtype=np.uint8).astype(
        np.int64
    )
    n_grams = max(len(c) - (k - 1), 0)
    if n_grams == 0:
        return 0, np.empty(0, dtype=np.int64)
    h = sum(c[j : n_grams + j] * _ROLL_WEIGHTS[j] for j in range(k))
    if len(h) < w:
        mins = np.array([h.min()])
    else:
        mins = np.minimum.reduce(
            [h[i : len(h) - (w - 1) + i] for i in range(w)]
        )
    return n_grams, np.unique(mins)


_ROLL_WEIGHTS = [ROLL_BASE ** (ROLL_K - 1 - j) for j in range(ROLL_K)]


def fingerprint_winnow_stats(norm_docs, id_col: str = "doc_id", s_col: str = "s"):
    """(doc_id, n_grams, n_fp, min_fp, max_fp) via an Arrow/numpy kernel.

    Semantics are exactly rolling_hashes + winnow above — the column-
    function form is the reference, this kernel is the hot path: the
    interpreted higher-order-function lambdas cost ~8 evaluations per
    character (28.7 s over sf0.1), while the vectorized int64 kernel is
    the same arithmetic as 8 shifted-slice adds and a width-4 sliding min
    (<1 s).  Integer hashes are order-free and < 2^53, so numpy, Catalyst
    and the DuckDB oracle agree bit-for-bit.  Input must carry the word-
    normalized text ``s`` (built with array_join(words(text), ' ') — the
    normalization stays JVM-side where it's cheap)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_grams", LongType()),
            StructField("n_fp", LongType()),
            StructField("min_fp", LongType()),
            StructField("max_fp", LongType()),
        ]
    )
    def kernel(batches):
        import numpy as np

        for pdf in batches:
            ids, ng, nf, lo, hi = [], [], [], [], []
            for doc_id, s in zip(pdf[id_col], pdf[s_col]):
                n_grams, fps = _winnow_doc_fps(s, np)
                ids.append(doc_id)
                ng.append(n_grams)
                nf.append(len(fps))
                lo.append(int(fps[0]) if len(fps) else None)
                hi.append(int(fps[-1]) if len(fps) else None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_grams": ng,
                    "n_fp": nf,
                    "min_fp": pd.array(lo, dtype="Int64"),
                    "max_fp": pd.array(hi, dtype="Int64"),
                }
            )

    return norm_docs.select(id_col, s_col).mapInPandas(kernel, out_schema)


def winnow_fingerprints(norm_docs, id_col: str = "doc_id", s_col: str = "s"):
    """(doc_id, fp) — the winnowing fingerprint set EXPLODED to one row per
    fingerprint, for set-overlap joins (shared-fingerprint near-dup).

    Same arithmetic as fingerprint_winnow_stats (rolling 8-gram polynomial
    hashes, width-4 sliding min, distinct) via the same vectorized int64
    kernel; docs with no fingerprints emit no rows.  Output is ~n_chars/w
    rows per document — the downstream overlap join is what bounds cost,
    via its stop-fingerprint frequency cap."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("fp", LongType())]
    )
    def kernel(batches):
        import numpy as np

        for pdf in batches:
            ids, fps = [], []
            for doc_id, s in zip(pdf[id_col], pdf[s_col]):
                _, uniq = _winnow_doc_fps(s, np)
                if len(uniq) == 0:
                    continue
                ids.extend([doc_id] * len(uniq))
                fps.extend(int(x) for x in uniq)
            yield pd.DataFrame({id_col: ids, "fp": pd.array(fps, dtype="Int64")})

    return norm_docs.select(id_col, s_col).mapInPandas(kernel, out_schema)


def word_shingles(col: Column, n: int = 5) -> Column:
    """array of n-word shingles (space-joined) of the normalized text.
    Documents shorter than n words yield their single full-text shingle."""
    w = words(col)
    k = F.greatest(F.size(w) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (pretraining / RAG context windows)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 128  # tokens per chunk
CHUNK_OVERLAP = 32  # tokens shared between consecutive chunks
CHUNK_HASH_P = 2147483647  # word-hash modulus (same 2^31-1 as MinHash)


def chunk_windows(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
):
    """(id, chunk_id, start_tok, n_tokens, checksum): fixed-size sliding
    token windows with overlap — the chunking step a pretraining/RAG
    pipeline runs before embedding or packing.  Chunk k covers token
    positions [k·step, k·step+size) with step = size−overlap; the last
    chunk truncates at the document end; empty docs produce no chunks.

    Plan shape (the whole point): NO per-chunk string is ever built.
    posexplode the token array once, compute each token's chunk-id range
    arithmetically (a token belongs to ≤ ceil(size/step) chunks), explode
    that tiny integer range, and aggregate per (doc, chunk) — one shuffle
    keyed by (doc, chunk), maximal cardinality, even partitions.  The
    chunk checksum is the SUM of md5-derived word hashes (order-free,
    < 2^63: exact in BIGINT on every engine), so the DuckDB oracle can
    rebuild identical rows from slices without replaying explode order."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    step = size - overlap
    ex = docs.select(
        F.col(id_col), F.posexplode(words(F.col(text_col))).alias("p", "tok")
    )
    h = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % CHUNK_HASH_P
    )
    # token at 0-based position p belongs to chunks k with
    # max(ceil((p-size+1)/step), 0) <= k <= floor(p/step); the positive-
    # only ceil form (p-size+step) div step avoids engine-specific
    # negative-division semantics.
    kmax = F.floor(F.col("p") / F.lit(step)).cast("long")
    kmin = (
        F.when(F.col("p") < size, F.lit(0))
        .otherwise(F.floor((F.col("p") - size + step) / F.lit(step)))
        .cast("long")
    )
    rows = ex.select(
        F.col(id_col),
        F.col("p"),
        h.alias("h"),
        F.explode(F.sequence(kmin, kmax)).alias("chunk_id"),
    )
    return rows.groupBy(id_col, "chunk_id").agg(
        F.min("p").cast("long").alias("start_tok"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("h").alias("checksum"),
    )
