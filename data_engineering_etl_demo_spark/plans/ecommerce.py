"""EP3 loader queries + DuckDB oracles over the committed CSV fixtures.

The oracle SQL is GENERATED from the same format/candidate spec the Spark
loader uses (sources/ecommerce_loader.py), so both engines parse, reject,
default, hash, and format identically — the driver's value-hash compare is
exact.  DuckDB notes: regexp_replace needs the 'g' flag (Spark replaces all
matches by default); CAST(double AS BIGINT) rounds, so int truncation goes
through trunc(); SUM(int) widens to HUGEINT, so counters cast back to BIGINT.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.plans import register
from data_engineering_etl_demo_spark.sources import ecommerce_loader as L

_DATA = Path(__file__).resolve().parents[2] / "tests" / "data"
AMAZON_CSV = str(_DATA / "amazon_sale_report.csv")
INTL_CSV = str(_DATA / "international_sale_report.csv")
AMAZON_NAME = "amazon_sale_report.csv"
INTL_NAME = "international_sale_report.csv"

# Fixture header order (drives the full-row token-scan order in SQL exactly
# as df.columns drives it in Spark).
AMAZON_HEADERS = [
    "Order ID", "Date", "Customer Email", "Ship Name", "ASIN", "Qty",
    "Unit Price", "Amount", "Currency", "Ship Country", "Note",
]
INTL_HEADERS = [
    "INDEX", "DATE", "CUSTOMER", "SKU", "PCS", "RATE", "GROSS AMT", "Stock",
]


# --------------------------------------------------------------------------
# SQL fragment generators (mirror ecommerce_loader expression builders)
# --------------------------------------------------------------------------


def _q(name: str) -> str:
    return '"' + name + '"'


def _nb(c: str) -> str:
    return "coalesce(trim(" + c + "), '')"


def _fmt_parse(raw: str, spec: dict) -> str:
    # Same regex-gate → single regexp_replace rewrite → tolerant try-parse
    # as the Spark side (DuckDB backrefs are \N, Spark's are $N; DuckDB's
    # %m/%d/%H accept 1-2 digits like Spark's M/d/H).
    branches = []
    for rx, repl in L.format_branches(spec):
        duck_repl = repl.replace("$", "\\")
        branches.append(
            "CASE WHEN regexp_matches(" + raw + ", '" + rx + "') THEN "
            "try_strptime(regexp_replace(" + raw + ", '" + rx + "', '"
            + duck_repl + "'), '%Y-%m-%d %H:%M:%S') END"
        )
    if len(branches) == 1:
        return branches[0]
    return "coalesce(" + ", ".join(branches) + ")"


def _try_parse(c: str) -> str:
    raw = _nb(c)
    return "coalesce(" + ", ".join(_fmt_parse(raw, s) for s in L.FORMATS) + ")"


def _parse_any(headers: list[str]) -> str:
    branches = [_try_parse(_q(c)) for c in L.TS_CANDIDATES if c in headers]
    token_formats = [s for s in L.FORMATS if s["two"]]
    for c in headers:
        raw = _nb(_q(c))
        token_parse = (
            "coalesce(" + ", ".join(_fmt_parse(raw, s) for s in token_formats) + ")"
        )
        branches.append(
            "CASE WHEN regexp_matches(" + raw + ", '" + L.DATE_TOKEN_RE
            + "') THEN " + token_parse + " END"
        )
    return "coalesce(" + ", ".join(branches) + ")"


def _iso(ts: str) -> str:
    return "strftime(" + ts + ", '%Y-%m-%dT%H:%M:%S')"


def _pick(headers: list[str], keys: list[str]) -> str:
    branches = [
        "CASE WHEN " + _nb(_q(k)) + " <> '' THEN " + _nb(_q(k)) + " END"
        for k in keys
        if k in headers
    ]
    branches.append("''")
    return "coalesce(" + ", ".join(branches) + ")"


def _dflt(expr: str, default: str) -> str:
    return "CASE WHEN " + expr + " <> '' THEN " + expr + " ELSE '" + default + "' END"


def _scrub(expr: str) -> str:
    return "regexp_replace(" + expr + ", '[,$₹€£]', '', 'g')"


def _float(expr: str) -> str:
    return "coalesce(TRY_CAST(" + _scrub(expr) + " AS DOUBLE), 0.0)"


def _int(expr: str) -> str:
    return (
        "coalesce(CAST(trunc(TRY_CAST(" + _scrub(expr)
        + " AS DOUBLE)) AS BIGINT), 0)"
    )


def _hash(parts: list[str]) -> str:
    joined = " || '|' || ".join("trim(" + p + ")" for p in parts)
    return "substr(sha256(" + joined + "), 1, " + str(L.HASH_LEN) + ")"


def _src(path: str) -> str:
    return "read_csv('" + path + "', header=true, all_varchar=true)"


def _amazon_staged() -> str:
    h = AMAZON_HEADERS
    order_id = _pick(h, L.ORDER_KEYS)
    user_raw = _pick(h, L.USER_KEYS)
    user_id = (
        "CASE WHEN " + user_raw + " <> '' THEN " + user_raw
        + " WHEN " + order_id + " <> '' THEN " + order_id
        + " ELSE 'unknown_user' END"
    )
    amount0 = _float(_pick(h, L.AMOUNT_KEYS))
    qty = _int(_pick(h, L.QTY_KEYS))
    price = _float(_pick(h, L.PRICE_KEYS))
    amount = (
        "CASE WHEN " + amount0 + " = 0.0 AND " + price + " > 0.0 AND " + qty
        + " > 0 THEN " + price + " * " + qty + " ELSE " + amount0 + " END"
    )
    return (
        "SELECT " + _iso(_parse_any(h)) + " AS ts, "
        + order_id + " AS order_id, "
        + user_id + " AS user_id, "
        + _dflt(_pick(h, L.PRODUCT_KEYS), "unknown_product") + " AS product_id, "
        + amount + " AS amount, "
        + _dflt(_pick(h, L.CURRENCY_KEYS), "USD") + " AS currency, "
        + _dflt(_pick(h, L.COUNTRY_KEYS), "unknown") + " AS country"
        + " FROM " + _src(AMAZON_CSV)
    )


SQL_AMAZON_EVENTS = (
    "WITH staged AS (" + _amazon_staged() + ")"
    + " SELECT "
    + _hash(["'" + AMAZON_NAME + "'", "order_id", "product_id",
             "CAST(amount AS VARCHAR)", "ts"]) + " AS event_id,"
    + " ts, user_id, 'purchase' AS event, amount, currency, country,"
    + " order_id, product_id, '" + AMAZON_NAME + "' AS source_dataset"
    + " FROM staged WHERE ts IS NOT NULL AND amount <= 250000"
    + " ORDER BY event_id"
)

SQL_AMAZON_STATS = (
    "WITH staged AS (" + _amazon_staged() + ")"
    + " SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,"
    + " CAST(SUM(CASE WHEN ts IS NOT NULL AND amount <= 250000 THEN 1 ELSE 0 END) AS BIGINT) AS written,"
    + " CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS skipped_no_ts,"
    + " CAST(SUM(CASE WHEN ts IS NOT NULL AND amount > 250000 THEN 1 ELSE 0 END) AS BIGINT) AS skipped_amount_outlier"
    + " FROM staged"
)


def _intl_staged() -> str:
    h = INTL_HEADERS
    raw_date = _pick(h, L.INTL_DATE_KEYS)
    bad_date = (
        "(" + raw_date + " <> '' AND NOT regexp_matches(" + raw_date + ", '"
        + L.DATE_TOKEN_RE + "'))"
    )
    return (
        "SELECT " + bad_date + " AS bad_date, "
        + _iso(_parse_any(h)) + " AS ts, "
        + _dflt(_pick(h, L.CUSTOMER_KEYS), "unknown_customer") + " AS customer, "
        + _dflt(_pick(h, L.SKU_KEYS), "unknown_sku") + " AS sku, "
        + _int(_pick(h, L.PCS_KEYS)) + " AS pcs, "
        + _float(_pick(h, L.RATE_KEYS)) + " AS rate, "
        + _float(_pick(h, L.GROSS_KEYS)) + " AS gross_amt, "
        + _dflt(_pick(h, L.CURRENCY_KEYS), "USD") + " AS currency"
        + " FROM " + _src(INTL_CSV)
    )


SQL_INTL_SALES = (
    "WITH staged AS (" + _intl_staged() + ")"
    + " SELECT "
    + _hash(["'" + INTL_NAME + "'", "customer", "sku",
             "CAST(gross_amt AS VARCHAR)", "ts"]) + " AS sale_id,"
    + " ts, substr(ts, 1, 10) AS date_key, customer, sku, pcs, rate,"
    + " gross_amt, currency, '" + INTL_NAME + "' AS source_dataset"
    + " FROM staged WHERE NOT bad_date AND ts IS NOT NULL AND gross_amt <= 5000000"
    + " ORDER BY sale_id"
)

SQL_INTL_STATS = (
    "WITH staged AS (" + _intl_staged() + ")"
    + " SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,"
    + " CAST(SUM(CASE WHEN NOT bad_date AND ts IS NOT NULL AND gross_amt <= 5000000 THEN 1 ELSE 0 END) AS BIGINT) AS written,"
    + " CAST(SUM(CASE WHEN NOT bad_date AND ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS skipped_no_ts,"
    + " CAST(SUM(CASE WHEN bad_date THEN 1 ELSE 0 END) AS BIGINT) AS skipped_bad_date_value,"
    + " CAST(SUM(CASE WHEN NOT bad_date AND ts IS NOT NULL AND gross_amt > 5000000 THEN 1 ELSE 0 END) AS BIGINT) AS skipped_amount_outlier"
    + " FROM staged"
)


# --------------------------------------------------------------------------
# Registered queries (sf_dir is ignored — the loader reads its CSV fixture,
# the EP3 analog of the hard-coded Kaggle file paths)
# --------------------------------------------------------------------------


@register(
    "ecommerce_events_canonical",
    SQL_AMAZON_EVENTS,
    doc="EP3 Amazon CSV → canonical purchase events (F7/F10/F14-F16, P4).",
)
def q_ecommerce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = L.read_raw_csv(spark, AMAZON_CSV)
    return L.amazon_events(df, AMAZON_NAME).orderBy("event_id")


@register(
    "ecommerce_loader_stats",
    SQL_AMAZON_STATS,
    doc="EP3 Amazon loader counters (rows/written/no-ts/outlier).",
)
def q_ecommerce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return L.amazon_loader_stats(L.read_raw_csv(spark, AMAZON_CSV))


@register(
    "ecommerce_intl_canonical",
    SQL_INTL_SALES,
    doc="EP3 intl CSV → canonical sale lines (P5 strict date gate).",
)
def q_ecommerce_intl(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = L.read_raw_csv(spark, INTL_CSV)
    return L.international_sales(df, INTL_NAME).orderBy("sale_id")


@register(
    "ecommerce_intl_stats",
    SQL_INTL_STATS,
    doc="EP3 intl loader counters (incl. bad-date-value gate).",
)
def q_ecommerce_intl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return L.intl_loader_stats(L.read_raw_csv(spark, INTL_CSV))
