"""Scalar cleaning/normalization expressions (SURVEY.md §2.8 F1-F19).

Each helper mirrors an observed reference behavior (file:line cited) but is
a pure Catalyst expression — vectorized, codegen-friendly, no Python in the
row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F3: value canonicalization map (/root/reference/pipeline/transform.py:45-48).
# The driver testdata uses "view" for the same semantic event, so it joins the
# alias set; the reference's own aliases are page_view / page-view / "page view"
# (all collapse after F1+F2 normalization to "page_view"/"pageview").
EVENT_CANON = {
    "page_view": "pageview",
    "pageview": "pageview",
    "view": "pageview",
}

# /root/reference/pipeline/transform.py:8
ALLOWED_EVENTS = ("pageview", "signup", "purchase")

# /root/reference/pipeline/transform.py:79-85 sentinel strings meaning NULL
_NULL_SENTINELS = ("", "nan", "none", "<na>", "null")


def norm_text(col: Column | str) -> Column:
    """F1: trim + lowercase (/root/reference/pipeline/transform.py:36-39)."""
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def canonicalize_event(col: Column | str) -> Column:
    """F1+F2+F3: trim/lower, '-'/' '→'_', then alias map
    (/root/reference/pipeline/transform.py:34-48).  page_view / Page View /
    PAGE-VIEW / view all become 'pageview'."""
    c = norm_text(col)
    c = F.regexp_replace(c, r"[-\s]+", "_")
    expr = None
    for alias, canon in EVENT_CANON.items():
        branch = F.when(c == alias, F.lit(canon))
        expr = branch if expr is None else expr.when(c == alias, F.lit(canon))
    return expr.otherwise(c)


def null_sentinels_to_null(col: Column | str) -> Column:
    """P7: ''/'nan'/'None'/'<NA>' → NULL after trim
    (/root/reference/pipeline/transform.py:79-85)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(F.lower(c).isin(*_NULL_SENTINELS), F.lit(None)).otherwise(c)


def normalize_id(col: Column | str) -> Column:
    """Trimmed-string id semantics ("keep user_id as TEXT for real-world
    IDs", /root/reference/pipeline/transform.py:78-85): cast → trim →
    sentinel-null."""
    c = F.col(col) if isinstance(col, str) else col
    return null_sentinels_to_null(c.cast("string"))


def strict_utc_ts(col: Column | str) -> Column:
    """F9: strict timestamp parse, invalid → NULL (pandas errors='coerce',
    /root/reference/pipeline/ingest.py:59).  Session tz is pinned UTC.
    try_to_timestamp keeps coerce semantics under ANSI mode (Spark 4
    default), where to_timestamp would raise on malformed input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(F.regexp_replace(c.cast("string"), r"Z$", "+00:00"))


# F10: the Kaggle loader's 9-format fallback chain IN ITS ORDER
# (/root/reference/pipeline/sources/ecommerce/kaggle_amazon_sales_loader.py:40-50)
# plus two ISO timestamp forms ahead of it (a strict ISO token can't match
# any loader format, so prepending them changes nothing for loader inputs),
# plus the noon-default rule for date-only values (:55-56).  Ambiguity
# resolution mirrors the reference: DASH-separated 4-digit-year dates are
# day-first (%d-%m-%Y), SLASH dates try month-first then day-first.  The
# exported helper is best-effort coalesce semantics; the byte-exact,
# oracle-tested implementation of the same chain (CPython field-width and
# resolver quirks pinned as regexes) is sources/ecommerce_loader.FORMATS.
_TS_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",  # loader :41
    "dd-MM-yyyy",  # loader :42
    "MM/dd/yyyy",  # loader :43
    "dd/MM/yyyy",  # loader :44
    "yyyy-MM-dd HH:mm:ss",  # loader :45
    "MM/dd/yyyy HH:mm",  # loader :46
    "dd/MM/yyyy HH:mm",  # loader :47
)
_TS_FORMATS_2Y = (
    "MM-dd-yy",  # loader :48
    "dd-MM-yy",  # loader :49
)


def parse_ts_multiformat(col: Column | str) -> Column:
    c = F.trim((F.col(col) if isinstance(col, str) else col).cast("string"))
    parsed4 = F.coalesce(
        *[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _TS_FORMATS]
    )
    parsed2 = F.coalesce(
        *[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _TS_FORMATS_2Y]
    )
    # CPython %y century rule: 69-99 → 19xx (Spark's 'yy' maps everything
    # to 20xx); applies only to values matched by a 2-digit-year format
    parsed2 = F.when(
        F.year(parsed2) >= 2069, parsed2 - F.expr("INTERVAL 100 YEARS")
    ).otherwise(parsed2)
    parsed = F.coalesce(parsed4, parsed2)
    # date-only token (<= 10 chars) → set time to 12:00:00 noon (loader :55-56)
    return F.when(
        F.length(c) <= 10, parsed + F.expr("INTERVAL 12 HOURS")
    ).otherwise(parsed)


def money(col: Column | str, default: float | None = 0.0) -> Column:
    """F14: currency scrub — strip ',$₹€£' then cast, garbage → default
    (/root/reference/...: kaggle_amazon_sales_loader.py:95-104)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c.cast("string")), r"[,$₹€£\s]", "")
    casted = cleaned.try_cast("double")  # garbage → null even under ANSI
    if default is None:
        return casted
    return F.coalesce(casted, F.lit(float(default)))


def safe_ratio(num: Column, den: Column, scale: int = 4) -> Column:
    """A5 zero-guard ratio (/root/reference/pipeline/analytics.py:111-114):
    den==0 → 0.0 else round(num/den, scale)."""
    return F.when(den == 0, F.lit(0.0)).otherwise(F.round(num / den, scale))


# Fixed-point scale for exact money aggregation: 6 decimal digits covers
# every money expression in the workload (prices/amounts are 2 dp; the
# widest derived term, price*(1-disc)*(1+tax), is 6 dp).
MONEY_SCALE = 1_000_000


def money_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent money aggregation.

    ROUND(SUM(double)) is nondeterministic under shuffle (float addition is
    not associative) and can drift vs an oracle engine in the last ulp
    (SURVEY.md §7 watch-out 6).  Fix: round each value to fixed-point 1e-6,
    sum as LONG (exact, associative, whole-stage-codegen fast — a DECIMAL
    accumulator would be exact too but ~5x slower), then scale back and
    round.  The DuckDB oracle uses the identical shape (sql_money_sum), so
    both engines compute the same value at any parallelism.  Long capacity:
    ~9.2e18 / 1e6 ≈ 9.2e12 currency units per group — overflow raises under
    ANSI rather than corrupting.
    """
    fixed = F.round(col * F.lit(MONEY_SCALE)).cast("long")
    return F.round(F.sum(fixed) / F.lit(float(MONEY_SCALE)), scale)
