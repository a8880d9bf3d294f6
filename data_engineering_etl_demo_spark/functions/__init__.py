"""Column-expression libraries.

Everything here returns ``pyspark.sql.Column`` — pure plan fragments that
stay inside Catalyst/whole-stage-codegen.  No Python UDFs: SURVEY.md §2.8
established the reference's entire scalar surface (F1-F20) is expressible
with built-in functions.
"""

from data_engineering_etl_demo_spark.functions.cleaning import (  # noqa: F401
    canonicalize_event,
    money,
    normalize_id,
    null_sentinels_to_null,
    parse_ts_multiformat,
    strict_utc_ts,
)
from data_engineering_etl_demo_spark.functions.hashing import (  # noqa: F401
    hash_id,
    minhash_expr,
)
