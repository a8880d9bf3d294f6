"""Type-2 slowly-changing dimension (SCD2) builder.

The reference's warehouse keeps type-1 dims — `ON CONFLICT DO UPDATE`
overwrites the old attribute value in place (/root/reference/pipeline/
load.py:58-67), losing history.  SCD2 is the standard warehouse upgrade:
every attribute change closes the current version row (valid_to) and opens
a new one, so facts can join to the dimension *as of* their event time.

Spark-first shape: change detection is one lag() window + one running-sum
window over (key, event order) — a single hash shuffle on the dimension
key — then one aggregation per version segment and one lead() for the
validity interval.  No iterative driver logic, no per-key collects; the
partitionBy key is the dimension's natural key, so skew follows dimension
hotness, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2(
    events: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse an event log carrying attribute ``attr`` into SCD2 version
    rows: (key, version, attr, valid_from, valid_to, n_events, is_current).

    - version: 1-based, in (ts, tiebreak) order; a new version starts when
      ``attr`` differs (null-safely) from the previous event's value.
    - valid_from: first ts observed with this value; valid_to: next
      version's valid_from (null on the current version) — the standard
      half-open [valid_from, valid_to) convention.
    - ties in ts are ordered by ``tiebreak`` for determinism under shuffle
      (SURVEY.md §7 watch-out 1).
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(F.col(attr)).over(w)
    first = F.row_number().over(w) == 1
    chg = F.when(first | ~prev.eqNullSafe(F.col(attr)), 1).otherwise(0)
    seg = F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))

    segs = (
        events.select(key, attr, ts, tiebreak)
        .withColumn("version", seg)
        .groupBy(key, "version")
        .agg(
            F.min(attr).alias(attr),
            F.min(ts).alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w2 = Window.partitionBy(key).orderBy("version")
    valid_to = F.lead("valid_from").over(w2)
    return segs.select(
        key,
        "version",
        attr,
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().cast("int").alias("is_current"),
    )


def sql_scd2(
    source: str, key: str, attr: str, ts: str, tiebreak: str
) -> str:
    """DuckDB mirror of scd2; SELECTs the same seven columns."""
    return f"""
        SELECT {key}, CAST(version AS BIGINT) AS version, {attr}, valid_from,
               lead(valid_from) OVER (PARTITION BY {key} ORDER BY version)
                   AS valid_to,
               n_events,
               CAST(lead(valid_from) OVER (PARTITION BY {key} ORDER BY version)
                    IS NULL AS INT) AS is_current
        FROM (
            SELECT {key}, version, min({attr}) AS {attr},
                   min({ts}) AS valid_from, count(*) AS n_events
            FROM (
                SELECT *, sum(chg) OVER (PARTITION BY {key} ORDER BY {ts}, {tiebreak}
                                         ROWS UNBOUNDED PRECEDING) AS version
                FROM (
                    SELECT *,
                           CASE WHEN row_number() OVER (PARTITION BY {key}
                                         ORDER BY {ts}, {tiebreak}) = 1
                                     OR lag({attr}) OVER (PARTITION BY {key}
                                         ORDER BY {ts}, {tiebreak})
                                        IS DISTINCT FROM {attr}
                                THEN 1 ELSE 0 END AS chg
                    FROM {source}
                )
            )
            GROUP BY 1, 2
        )
    """
