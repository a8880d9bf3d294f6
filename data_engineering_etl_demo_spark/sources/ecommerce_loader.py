"""Multi-format e-commerce CSV → canonical-JSONL loader (reference EP3).

Re-expresses /root/reference/pipeline/sources/ecommerce/
kaggle_amazon_sales_loader.py as pure Catalyst column expressions — one
``select`` per target schema, zero Python in the row path (SURVEY.md §2.8:
F7 pick, F10 format-chain timestamp parse + noon rule, F14 currency scrub,
F15 derived-amount fallback, F16 hash ids, F17/P4/P5 guards).

Cross-engine parity design: the reference parses timestamps with a chain of
nine ``datetime.strptime`` formats (kaggle_amazon_sales_loader.py:39-50).
Engine-native parsers disagree on exactly the edge cases that matter
(2-digit-year century rule, 1-vs-2-digit fields, lenient resolvers), so each
format is instead pinned as a REGEX that mirrors CPython's _strptime field
patterns (%Y→\\d{4}, %m/%d/%H/%M/%S→\\d{1,2}, %y→\\d{2}); matched components
are rebuilt into one canonical 'yyyy-MM-dd HH:mm:ss' string and validated by
a single try-parse.  The same spec drives the DuckDB oracle SQL
(plans/ecommerce.py), so both engines accept/reject identical inputs.

Century rule: CPython maps %y 00-68→20xx, 69-99→19xx; applied explicitly.
Noon rule: date-only formats (raw length ≤ 10 ⇒ midnight) get 12:00:00
(kaggle_amazon_sales_loader.py:55-56) — built into the canonical string.

At 100 TB: the whole loader is scan → select → filter → write with no
shuffle and no UDF; Catalyst prunes unused source columns and the guards
(outlier, no-ts) cut rows before any exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.functions.hashing import (
    hash_id as _hash_id,
)

# --------------------------------------------------------------------------
# Format chain (kaggle_amazon_sales_loader.py:39-50), in reference order.
# Group indices are 1-based regex capture groups; None = field absent.
# --------------------------------------------------------------------------

FORMATS: list[dict] = [
    # %Y-%m-%d
    {"rx": r"^(\d{4})-(\d{1,2})-(\d{1,2})$", "y": 1, "m": 2, "d": 3, "two": False},
    # %d-%m-%Y
    {"rx": r"^(\d{1,2})-(\d{1,2})-(\d{4})$", "d": 1, "m": 2, "y": 3, "two": False},
    # %m/%d/%Y
    {"rx": r"^(\d{1,2})/(\d{1,2})/(\d{4})$", "m": 1, "d": 2, "y": 3, "two": False},
    # %d/%m/%Y
    {"rx": r"^(\d{1,2})/(\d{1,2})/(\d{4})$", "d": 1, "m": 2, "y": 3, "two": False},
    # %Y-%m-%d %H:%M:%S
    {
        "rx": r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})$",
        "y": 1, "m": 2, "d": 3, "H": 4, "M": 5, "S": 6, "two": False,
    },
    # %m/%d/%Y %H:%M
    {
        "rx": r"^(\d{1,2})/(\d{1,2})/(\d{4}) (\d{1,2}):(\d{1,2})$",
        "m": 1, "d": 2, "y": 3, "H": 4, "M": 5, "two": False,
    },
    # %d/%m/%Y %H:%M
    {
        "rx": r"^(\d{1,2})/(\d{1,2})/(\d{4}) (\d{1,2}):(\d{1,2})$",
        "d": 1, "m": 2, "y": 3, "H": 4, "M": 5, "two": False,
    },
    # %m-%d-%y  ("important for your datasets" — the Kaggle token form)
    {"rx": r"^(\d{1,2})-(\d{1,2})-(\d{2})$", "m": 1, "d": 2, "y": 3, "two": True},
    # %d-%m-%y
    {"rx": r"^(\d{1,2})-(\d{1,2})-(\d{2})$", "d": 1, "m": 2, "y": 3, "two": True},
]

# Strict date token (kaggle_amazon_sales_loader.py:33): e.g. 04-30-22.
DATE_TOKEN_RE = r"^\d{2}-\d{2}-\d{2}$"

# Candidate header lists (kaggle_amazon_sales_loader.py:69-72,141-157,220-231).
TS_CANDIDATES = [
    "Date", "DATE", "Order Date", "OrderDate", "order_date", "date",
    "Order Date & Time", "Timestamp", "ts",
]
ORDER_KEYS = ["Order ID", "Order Id", "order_id", "OrderID", "ID"]
USER_KEYS = [
    "Customer Email", "Email", "Buyer Email", "Phone", "Customer", "Buyer",
    "Ship Name", "Name",
]
PRODUCT_KEYS = [
    "ASIN", "SKU", "SKU Code", "Product ID", "product_id", "Product", "Item",
    "Title", "Product Name", "Style",
]
QTY_KEYS = ["Qty", "Quantity", "quantity", "Units"]
PRICE_KEYS = ["Unit Price", "Price", "Item Price", "unit_price"]
AMOUNT_KEYS = ["Amount", "Sales", "Total", "Order Total", "line_total"]
CURRENCY_KEYS = ["Currency", "currency"]
COUNTRY_KEYS = ["Ship Country", "ship-country", "Country", "country"]

INTL_DATE_KEYS = ["DATE", "Date", "date"]
CUSTOMER_KEYS = ["CUSTOMER", "Customer", "customer"]
SKU_KEYS = ["SKU", "Sku", "sku"]
PCS_KEYS = ["PCS", "Qty", "Quantity", "quantity"]
RATE_KEYS = ["RATE", "Rate", "rate"]
GROSS_KEYS = ["GROSS AMT", "Gross Amt", "gross_amt", "Amount", "amount"]

AMOUNT_OUTLIER = 250_000.0       # kaggle_amazon_sales_loader.py:164
GROSS_OUTLIER = 5_000_000.0      # kaggle_amazon_sales_loader.py:226
CURRENCY_SYMBOLS_RE = r"[,$₹€£]"  # kaggle_amazon_sales_loader.py:96-100
HASH_LEN = 24                     # kaggle_amazon_sales_loader.py:31


# --------------------------------------------------------------------------
# Scalar expression builders
# --------------------------------------------------------------------------


def nb(c: Column) -> Column:
    """_norm (kaggle_amazon_sales_loader.py:25-26): None→'' then strip."""
    return F.coalesce(F.trim(c), F.lit(""))


def _col(df: DataFrame, name: str) -> Column:
    return nb(df[f"`{name}`"])


def pick(df: DataFrame, keys: list[str]) -> Column:
    """_pick (F7): first present, non-blank candidate column; else ''."""
    present = [k for k in keys if k in df.columns]
    branches = [F.when(_col(df, k) != "", _col(df, k)) for k in present]
    return F.coalesce(*branches, F.lit("")) if branches else F.lit("")


def default_if_blank(c: Column, default: str) -> Column:
    return F.when(c != "", c).otherwise(F.lit(default))


def format_branches(spec: dict) -> list[tuple[str, str]]:
    """One strptime format → (regex, '$N'-backref replacement) branches that
    rewrite a matching string into canonical 'y-M-d H:m:s' order in a SINGLE
    regexp_replace (validated by one tolerant try-parse).  This is ~5× fewer
    expression nodes than extracting each component separately — the loader's
    parse chain dominates Catalyst analysis/optimization cost otherwise.

    2-digit-year formats split into two branches to pin CPython's century
    rule (%y: 00-68 → 20xx, 69-99 → 19xx) in the regex itself."""

    def g(key: str) -> str:
        return "$" + str(spec[key])

    if spec.get("H") is None:
        time_part = "12:00:00"  # noon rule: date-only ⇒ midnight ⇒ 12:00
    elif spec.get("S") is None:
        time_part = f"{g('H')}:{g('M')}:00"
    else:
        time_part = f"{g('H')}:{g('M')}:{g('S')}"
    if not spec["two"]:
        return [(spec["rx"], f"{g('y')}-{g('m')}-{g('d')} {time_part}")]
    rx68 = spec["rx"].replace(r"(\d{2})$", r"([0-5]\d|6[0-8])$")
    rx99 = spec["rx"].replace(r"(\d{2})$", r"(69|[7-9]\d)$")
    return [
        (rx68, f"20{g('y')}-{g('m')}-{g('d')} {time_part}"),
        (rx99, f"19{g('y')}-{g('m')}-{g('d')} {time_part}"),
    ]


def _format_parse(raw: Column, spec: dict) -> Column:
    """One strptime format: regex gate → canonical rewrite → try-parse."""
    exprs = [
        F.when(
            raw.rlike(rx),
            F.try_to_timestamp(
                F.regexp_replace(raw, rx, repl), F.lit("yyyy-M-d H:m:s")
            ),
        )
        for rx, repl in format_branches(spec)
    ]
    return exprs[0] if len(exprs) == 1 else F.coalesce(*exprs)


def try_parse_ts(c: Column) -> Column:
    """_try_parse (F10): the 9-format chain, first match wins; date-only
    matches land at 12:00:00 (noon rule).  Null when nothing parses."""
    raw = nb(c)
    return F.coalesce(*[_format_parse(raw, spec) for spec in FORMATS])


def parse_any_ts(df: DataFrame) -> Column:
    """_parse_ts: candidate timestamp headers in order, then a full-row scan
    for strict date tokens (header order) — as one coalesce chain.

    The scan branches only try the two 2-digit-year formats: a strict token
    (^\\d{2}-\\d{2}-\\d{2}$) cannot match any other format in the chain, so
    this is semantically identical while generating 4.5× less code (the full
    9-format chain over every column blows Janino's 64 KB codegen limit)."""
    branches = [try_parse_ts(df[f"`{c}`"]) for c in TS_CANDIDATES if c in df.columns]
    token_formats = [s for s in FORMATS if s["two"]]
    for c in df.columns:
        raw = _col(df, c)
        token_parse = F.coalesce(*[_format_parse(raw, s) for s in token_formats])
        branches.append(F.when(raw.rlike(DATE_TOKEN_RE), token_parse))
    return F.coalesce(*branches)


def iso_ts(ts: Column) -> Column:
    """datetime.isoformat() parity: 'yyyy-MM-ddTHH:mm:ss' string."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")


def to_float_scrub(c: Column) -> Column:
    """_to_float (F14): strip commas + currency symbols; ''/garbage → 0.0."""
    cleaned = F.regexp_replace(nb(c), CURRENCY_SYMBOLS_RE, "")
    return F.coalesce(cleaned.try_cast("double"), F.lit(0.0))


def to_int_scrub(c: Column) -> Column:
    """_to_int: int(float(x)) — parse as double, truncate toward zero.
    Both casts are try_cast: a plain cast('long') under ANSI mode (the
    session default this repo runs with) THROWS on NaN/Infinity/overflow
    doubles, killing the load job, where the reference's catch-ValueError
    returns 0.  (Reference int(1e300) would return the huge int; that
    magnitude is outside any quantity column's domain — 0 is the sane
    engine-portable fallback.)"""
    cleaned = F.regexp_replace(nb(c), CURRENCY_SYMBOLS_RE, "")
    return F.coalesce(cleaned.try_cast("double").try_cast("long"), F.lit(0))


def hash_id(*parts: Column) -> Column:
    """_hash_id (F16): sha256('|'.join(stripped parts)) first 24 hex chars —
    functions/hashing.hash_id over trimmed parts (the reference _norm
    strips each part before joining, loader:27-31)."""
    return _hash_id(*[F.trim(p) for p in parts], length=HASH_LEN)


# --------------------------------------------------------------------------
# The two canonical loaders
# --------------------------------------------------------------------------


def _amazon_staged(df: DataFrame) -> DataFrame:
    """Shared staged relation of amazon_events / amazon_loader_stats: ONE
    set of field-pick / scrub / fallback expressions, so the stats report
    can never disagree with what the event builder actually wrote (the
    two used to carry copy-pasted twins of the amount-fallback rule)."""
    order_id = pick(df, ORDER_KEYS)
    user_raw = pick(df, USER_KEYS)
    user_id = F.when(user_raw != "", user_raw).otherwise(
        F.when(order_id != "", order_id).otherwise(F.lit("unknown_user"))
    )
    product_id = default_if_blank(pick(df, PRODUCT_KEYS), "unknown_product")
    qty = to_int_scrub(pick(df, QTY_KEYS))
    unit_price = to_float_scrub(pick(df, PRICE_KEYS))
    amount0 = to_float_scrub(pick(df, AMOUNT_KEYS))
    amount = F.when(
        (amount0 == 0.0) & (unit_price > 0.0) & (qty > 0), unit_price * qty
    ).otherwise(amount0)
    currency = default_if_blank(pick(df, CURRENCY_KEYS), "USD")
    country = default_if_blank(pick(df, COUNTRY_KEYS), "unknown")
    return df.select(
        parse_any_ts(df).alias("ts_raw"),
        order_id.alias("order_id"),
        user_id.alias("user_id"),
        product_id.alias("product_id"),
        amount.alias("amount"),
        currency.alias("currency"),
        country.alias("country"),
    )


def amazon_events(df: DataFrame, source_name: str) -> DataFrame:
    """Amazon Sale Report rows → canonical purchase events
    (kaggle_amazon_sales_loader.py:120-187).  Skips no-ts rows and
    amount > 250k outliers; all other semantics are column expressions."""
    staged = _amazon_staged(df).select(
        iso_ts(F.col("ts_raw")).alias("ts"),
        "order_id", "user_id", "product_id", "amount", "currency", "country",
    )
    return (
        staged.filter(F.col("ts").isNotNull())
        .filter(F.col("amount") <= F.lit(AMOUNT_OUTLIER))
        .select(
            # amount reaches the hash via cast(double AS string).  Java
            # Double.toString and Python str() agree on the currency
            # domain (2-dp values >= 0.01 and 0.0 both render plain), but
            # DIVERGE below 1e-3 (Java '1.0E-4' vs Python '0.0001') — if a
            # sub-milli amount source ever appears, pin a formatter here
            # before trusting cross-engine id equality.
            hash_id(
                F.lit(source_name),
                F.col("order_id"),
                F.col("product_id"),
                F.col("amount").cast("string"),
                F.col("ts"),
            ).alias("event_id"),
            "ts",
            "user_id",
            F.lit("purchase").alias("event"),
            "amount",
            "currency",
            "country",
            "order_id",
            "product_id",
            F.lit(source_name).alias("source_dataset"),
        )
    )


def amazon_loader_stats(df: DataFrame) -> DataFrame:
    """Per-file counters (kaggle_amazon_sales_loader.py:124-129) as one
    aggregation over the SAME staged relation the event builder writes
    from: rows_total / written / skipped_no_ts / skipped_outlier."""
    staged = _amazon_staged(df).select(
        F.col("ts_raw").alias("ts"), "amount"
    )
    no_ts = F.col("ts").isNull()
    outlier = ~no_ts & (F.col("amount") > AMOUNT_OUTLIER)
    return staged.agg(
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.when(~no_ts & ~outlier, 1).otherwise(0)).alias("written"),
        F.sum(F.when(no_ts, 1).otherwise(0)).alias("skipped_no_ts"),
        F.sum(F.when(outlier, 1).otherwise(0)).alias("skipped_amount_outlier"),
    )


def _intl_staged(df: DataFrame) -> DataFrame:
    """Shared staged relation of international_sales / intl_loader_stats
    (same single-source-of-truth rationale as _amazon_staged)."""
    raw_date = pick(df, INTL_DATE_KEYS)
    bad_date = (raw_date != "") & ~raw_date.rlike(DATE_TOKEN_RE)
    customer = default_if_blank(pick(df, CUSTOMER_KEYS), "unknown_customer")
    sku = default_if_blank(pick(df, SKU_KEYS), "unknown_sku")
    pcs = to_int_scrub(pick(df, PCS_KEYS))
    rate = to_float_scrub(pick(df, RATE_KEYS))
    gross_amt = to_float_scrub(pick(df, GROSS_KEYS))
    currency = default_if_blank(pick(df, CURRENCY_KEYS), "USD")
    return df.select(
        bad_date.alias("bad_date"),
        parse_any_ts(df).alias("ts_raw"),
        customer.alias("customer"),
        sku.alias("sku"),
        pcs.alias("pcs"),
        rate.alias("rate"),
        gross_amt.alias("gross_amt"),
        currency.alias("currency"),
    )


def international_sales(df: DataFrame, source_name: str) -> DataFrame:
    """International sale Report rows → canonical wholesale lines
    (kaggle_amazon_sales_loader.py:189-249).  A non-blank DATE that is not a
    strict date token rejects the row before any other parsing."""
    staged = _intl_staged(df).select(
        "bad_date",
        iso_ts(F.col("ts_raw")).alias("ts"),
        "customer", "sku", "pcs", "rate", "gross_amt", "currency",
    )
    return (
        staged.filter(~F.col("bad_date"))
        .filter(F.col("ts").isNotNull())
        .filter(F.col("gross_amt") <= F.lit(GROSS_OUTLIER))
        .select(
            hash_id(
                F.lit(source_name),
                F.col("customer"),
                F.col("sku"),
                F.col("gross_amt").cast("string"),
                F.col("ts"),
            ).alias("sale_id"),
            "ts",
            F.substring(F.col("ts"), 1, 10).alias("date_key"),
            "customer",
            "sku",
            "pcs",
            "rate",
            "gross_amt",
            "currency",
            F.lit(source_name).alias("source_dataset"),
        )
    )


def intl_loader_stats(df: DataFrame) -> DataFrame:
    """Counters for the intl loader (kaggle_amazon_sales_loader.py:194-200)
    over the SAME staged relation the sales builder writes from."""
    staged = _intl_staged(df).select(
        "bad_date", F.col("ts_raw").alias("ts"), "gross_amt"
    )
    bad = F.col("bad_date")
    no_ts = ~bad & F.col("ts").isNull()
    outlier = ~bad & ~no_ts & (F.col("gross_amt") > GROSS_OUTLIER)
    return staged.agg(
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.when(~bad & ~no_ts & ~outlier, 1).otherwise(0)).alias("written"),
        F.sum(F.when(no_ts, 1).otherwise(0)).alias("skipped_no_ts"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("skipped_bad_date_value"),
        F.sum(F.when(outlier, 1).otherwise(0)).alias("skipped_amount_outlier"),
    )


def read_raw_csv(spark, path: str) -> DataFrame:
    """All-string CSV read (header row, BOM-tolerant) — the Spark analog of
    csv.DictReader over utf-8-sig (kaggle_amazon_sales_loader.py:131-132).

    multiLine: csv.DictReader natively handles quoted fields containing
    embedded newlines; Spark's default line-split parser would shear such
    a record into two misaligned rows.  The option costs input-split
    parallelism WITHIN one file (each file becomes one task) — the right
    trade for parity here; a 100 TB ingest would pre-split files upstream
    or sanitize newlines before the splittable fast path."""
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .csv(path)
    )
    renames = {c: c.lstrip("﻿") for c in df.columns if c.startswith("﻿")}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def run_loader(spark, csv_dir: str, out_dir: str) -> dict:
    """EP3 driver parity (kaggle_amazon_sales_loader.py:251-303): load the
    TARGET_FILES whitelist from ``csv_dir``, write canonical JSONL datasets
    (events + intl sales, each the union of its per-file outputs) and a
    per-file stats report JSON.  Returns the report dict.

    Whitelist, not glob: the reference iterates its TARGET_FILES list
    (loader:17-22) and INTENTIONALLY skips 'Sale Report.csv' /
    'May-2022.csv' as not event-grain — globbing *.csv would route those
    through amazon_events and emit fake purchases.  Names are matched
    case/space-insensitively so 'amazon_sale_report.csv' works too;
    non-target CSVs are recorded as skipped, missing targets as missing
    (the reference warns and records {"missing": true})."""
    import json
    import os
    import re

    def norm_name(f: str) -> str:
        return re.sub(r"[^a-z0-9.]+", "_", f.lower())

    # kaggle_amazon_sales_loader.py:17-22.  canonical keeps the reference's
    # TARGET_FILES spelling so a missing target is reported under the name
    # the reference would record, not the normalized lookup key (ADVICE r5).
    target_files = {
        "Amazon Sale Report.csv": "amazon",
        "International sale Report.csv": "intl",
    }
    targets = {norm_name(f): kind for f, kind in target_files.items()}
    canonical = {norm_name(f): f for f in target_files}
    report: dict = {"files": {}, "outputs": {}}
    events_parts = []
    intl_parts = []
    seen_targets = set()
    for fname in sorted(os.listdir(csv_dir)):
        if not fname.lower().endswith(".csv"):
            continue
        kind = targets.get(norm_name(fname))
        if kind is None:
            report["files"][fname] = {"skipped_not_event_grain": True}
            continue
        seen_targets.add(norm_name(fname))
        path = os.path.join(csv_dir, fname)
        df = read_raw_csv(spark, path)
        if kind == "intl":
            intl_parts.append(international_sales(df, fname))
            stats = intl_loader_stats(df).collect()[0].asDict()
        else:
            events_parts.append(amazon_events(df, fname))
            stats = amazon_loader_stats(df).collect()[0].asDict()
        report["files"][fname] = stats
    for t in set(targets) - seen_targets:
        report["files"][canonical[t]] = {"missing": True}

    def _union(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    if events_parts:
        dest = os.path.join(out_dir, "canonical", "events")
        _union(events_parts).write.mode("overwrite").json(dest)
        report["outputs"]["events"] = dest
    if intl_parts:
        dest = os.path.join(out_dir, "canonical", "international_sales")
        _union(intl_parts).write.mode("overwrite").json(dest)
        report["outputs"]["international_sales"] = dest

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "loader_report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    return report
