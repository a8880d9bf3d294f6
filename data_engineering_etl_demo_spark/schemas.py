"""Explicit StructType contracts (schemas-as-code).

The reference infers every schema dynamically with pandas and then patches
columns defensively (`if "col" in df.columns else default`,
/root/reference/pipeline/transform.py:34,49-50,79,86-92).  Spark-first means
the contract is declared once; ``conform()`` reproduces the defensive-patch
semantics by adding any missing column as a typed null literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw sources (reference inputs)
# ---------------------------------------------------------------------------

# Raw behavioral event, one JSON object per line
# (/root/reference/pipeline/ingest.py:12 required fields {event_id, ts, event}).
RAW_EVENT = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("ts", T.StringType()),  # parsed strictly later (F9)
        T.StructField("user_id", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("amount", T.StringType()),  # "19.99" → double downstream
        T.StructField("page", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# users.csv (/root/reference/pipeline/ingest.py:73-78)
RAW_USER = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("signup_source", T.StringType()),
    ]
)

# canonical international sale (/root/reference/pipeline/load.py:150-153 contract)
INTL_SALE = T.StructType(
    [
        T.StructField("sale_id", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("date_key", T.StringType()),
        T.StructField("customer", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("pcs", T.LongType()),
        T.StructField("rate", T.DoubleType()),
        T.StructField("gross_amt", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField("source_dataset", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Silver / warehouse (star schema, /root/reference/sql/warehouse_star.sql:12-69)
# ---------------------------------------------------------------------------

CLEAN_EVENT = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("page", T.StringType()),
        T.StructField("event_date", T.StringType()),  # 'YYYY-MM-DD' (warehouse stores text)
        T.StructField("event_hour", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("signup_source", T.StringType()),
    ]
)

BAD_RECORD = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("_reason", T.StringType(), False),
        T.StructField("_raw", T.StringType()),
    ]
)


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become typed nulls,
    present columns are cast; extra columns are dropped.  This is the Spark
    form of the reference's ubiquitous ``if "col" in df.columns else default``
    guards — done once at the contract boundary instead of per-operator."""
    cols = []
    existing = {f.name for f in df.schema.fields}
    for field in schema.fields:
        if field.name in existing:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
