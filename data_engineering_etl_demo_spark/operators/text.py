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


def word_shingles(col: Column, n: int = 5) -> Column:
    """array of n-word shingles (space-joined) of the normalized text.
    Documents shorter than n words yield their single full-text shingle."""
    w = words(col)
    k = F.greatest(F.size(w) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
