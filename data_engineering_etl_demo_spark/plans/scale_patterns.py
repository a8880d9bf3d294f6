"""Scale-pattern queries: the operator shapes that keep a 100 TB pipeline
fast and correct, each proven result-identical to a straightforward oracle.

- count-min heavy hitters: O(1) sketch state per group instead of a
  per-key shuffle (operators/sketches.py cm_estimates);
- salted two-stage aggregation: the skew-mitigation rewrite, shown to
  produce bit-identical results to the direct groupBy;
- SCD2 dimension versioning: warehouse change history from an event log
  in two window passes (operators/scd.py);
- corpus boilerplate n-grams: C4-style "remove text repeated across
  documents" — corpus-level dfreq join back to each document;
- winnowing fingerprint overlap: shared-fingerprint near-dup pairs with a
  stop-fingerprint frequency cap bounding the pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel
from pyspark.sql.window import Window

from data_engineering_etl_demo_spark.catalog import load
from data_engineering_etl_demo_spark.functions.caching import persist_latest
from data_engineering_etl_demo_spark.functions.cleaning import MONEY_SCALE
from data_engineering_etl_demo_spark.operators import layout as L
from data_engineering_etl_demo_spark.operators import profile as P
from data_engineering_etl_demo_spark.operators import scd
from data_engineering_etl_demo_spark.operators import sketches as K
from data_engineering_etl_demo_spark.operators import text as X
from data_engineering_etl_demo_spark.plans import register
from data_engineering_etl_demo_spark.plans.analytics import sql_money_sum
from data_engineering_etl_demo_spark.plans.llmdata import (
    _ROLL_TERMS,
    SQL_WORDS,
    _docs_wide,
    _fmt,
)

# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters: top users per event type
# ---------------------------------------------------------------------------

_TOP_K = 5

_SQL_BASE_USERS = (
    "(SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL)"
)


@register(
    "events_heavy_hitters",
    f"""
    WITH est AS ({K.sql_cm_estimates(_SQL_BASE_USERS, "event_type", "user_id")}),
    exact AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS exact_n
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, user_id, cm_n, exact_n, rnk FROM (
        SELECT event_type, user_id, cm_n, exact_n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cm_n DESC, user_id) AS rnk
        FROM est JOIN exact USING (event_type, user_id)
    ) WHERE rnk <= {_TOP_K}
    ORDER BY event_type, rnk
    """,
    doc="count-min sketch heavy hitters: top users per event type by "
    "sketch-estimated frequency (DEPTH x WIDTH counters per group, "
    "mergeable O(1) state) next to the exact count; md5 coordinates make "
    "the estimate — collisions and all — engine-exact "
    "(operators/sketches.py).",
)
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-aggregate before the expansion (r16, guide §2.2): the exact
    # per-(type, user) count is computed first and the sketch counters
    # are integer sums, so the coordinate explode feeds each distinct
    # key once with weight exact_n instead of every raw occurrence 4x —
    # bit-identical counters.  Catalyst still plans three pruned
    # scan+partial-agg subtrees (join-key nullability pushdown defeats
    # exchange reuse), but each shuffles |distinct keys| partials where
    # the old form shuffled the occurrence-level explode.
    counts = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    est = K.cm_estimates_from_counts(
        counts, "event_type", "user_id", "exact_n"
    )
    rnk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.col("cm_n").desc(), F.col("user_id")
        )
    )
    return (
        est.join(counts, on=["event_type", "user_id"])
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= _TOP_K)
        .select("event_type", "user_id", "cm_n", "exact_n", "rnk")
        .orderBy("event_type", "rnk")
    )


# ---------------------------------------------------------------------------
# Salted two-stage aggregation (skew mitigation, identical results)
# ---------------------------------------------------------------------------

_SALT_BUCKETS = 16


@register(
    "events_salted_user_stats",
    f"""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           {sql_money_sum('COALESCE(value, 0)')} AS value_sum
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    doc="salted two-stage aggregation: rows spread over (user_id, salt) "
    "partial aggregates, then recombined per user — the standard hot-key "
    "skew rewrite.  The oracle is the DIRECT single-stage groupBy, proving "
    "the rewrite changes the shuffle layout but not one output bit "
    "(fixed-point LONG partials are associative; float sums would not be).",
)
def q_events_salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    fixed = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * F.lit(MONEY_SCALE)).cast(
        "long"
    )
    stage1 = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .withColumn("_salt", F.pmod(F.col("event_id"), F.lit(_SALT_BUCKETS)))
        .groupBy("user_id", "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(fixed).alias("_s"))
    )
    return (
        stage1.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_s") / F.lit(float(MONEY_SCALE)), 2).alias("value_sum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# SCD2: per-user version history of the props.k attribute
# ---------------------------------------------------------------------------

_SQL_K_EVENTS = """
    (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
            TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
     FROM events WHERE user_id IS NOT NULL)
"""


@register(
    "events_user_scd2",
    f"""
    SELECT * FROM ({scd.sql_scd2(_SQL_K_EVENTS, "user_id", "k", "ts_us", "event_id")})
    ORDER BY user_id, version
    """,
    doc="SCD2 dimension build (operators/scd.py): each user's props.k "
    "change history as versioned rows with [valid_from, valid_to) "
    "intervals — the type-2 upgrade of the reference's type-1 overwrite "
    "dims (/root/reference/pipeline/load.py:58-67); two windows + one "
    "aggregation, all shuffled once on the dimension key.",
)
def q_events_user_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_id",
            F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1)
            .cast("long")
            .alias("k"),
        )
    )
    return scd.scd2(e, key="user_id", attr="k", ts="ts_us", tiebreak="event_id").orderBy(
        "user_id", "version"
    )


# ---------------------------------------------------------------------------
# Corpus boilerplate n-grams (C4-style repeated-text flagging)
# ---------------------------------------------------------------------------

_BOILER_N = 3  # words per gram
_BOILER_MIN_DOCS = 3  # gram is boilerplate if it appears in >= this many docs


@register(
    "docs_boilerplate_ngrams",
    f"""
    WITH w AS (SELECT doc_id, {_fmt(SQL_WORDS)} AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - {_BOILER_N - 1}, 1) + 1),
                   i -> array_to_string(w[i:i+{_BOILER_N - 1}], ' '))) AS g
        FROM w
    ),
    ex AS (SELECT doc_id, unnest(g) AS g FROM sh),
    boiler AS (SELECT g FROM ex GROUP BY 1 HAVING count(*) >= {_BOILER_MIN_DOCS}),
    nb AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_boiler
        FROM ex JOIN boiler USING (g) GROUP BY 1
    )
    SELECT sh.doc_id, CAST(len(g) AS BIGINT) AS n_shingles,
           COALESCE(n_boiler, 0) AS n_boiler,
           floor(COALESCE(n_boiler, 0) / CAST(len(g) AS DOUBLE) * 1e6) / 1e6
               AS boiler_frac
    FROM sh LEFT JOIN nb USING (doc_id)
    ORDER BY 1
    """,
    doc="C4-style boilerplate detection: corpus-level document frequency "
    f"of distinct word {_BOILER_N}-grams, grams present in >= "
    f"{_BOILER_MIN_DOCS} documents flagged and counted back per document. "
    "One explode + one dfreq aggregation + one join — the 100 TB form of "
    "'remove any line occurring 3+ times in the corpus'.",
)
def q_docs_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _docs_wide(spark, sf_dir).select(
        "doc_id",
        F.array_distinct(X.word_shingles(F.col("text"), _BOILER_N)).alias("g"),
    )
    # three consumers (dfreq, flag join, per-doc totals) — persist the
    # exploded relation so the shingling lambdas evaluate once
    ex = sh.select("doc_id", F.explode("g").alias("g")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    boiler = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_dfreq"))
        .filter(F.col("_dfreq") >= _BOILER_MIN_DOCS)
        .select("g")
    )
    nb = ex.join(boiler, on="g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_boiler")
    )
    n_boiler = F.coalesce(F.col("n_boiler"), F.lit(0))
    return (
        # every doc has >= 1 shingle (the short-doc guard), so per-doc
        # totals come off the persisted relation, not a re-shingling
        ex.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
        .join(nb, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            n_boiler.cast("long").alias("n_boiler"),
            X.trunc6(n_boiler / F.col("n_shingles")).alias("boiler_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint overlap (shared-fingerprint near-dup pairs)
# ---------------------------------------------------------------------------

_STOP_CAP = 10  # drop fingerprints present in more docs than this
_MIN_SHARED = 3  # report pairs sharing at least this many rare fingerprints


@register(
    "docs_winnow_overlap",
    f"""
    WITH s AS (
        SELECT doc_id, array_to_string({_fmt(SQL_WORDS)}, ' ') AS s
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(range(1, greatest(length(s) - 7, 0) + 1),
                              i -> {_ROLL_TERMS}) AS H
        FROM s
    ),
    wn AS (
        SELECT doc_id,
               CASE WHEN len(H) < 1 THEN CAST([] AS BIGINT[])
                    ELSE list_sort(list_distinct(list_transform(
                         range(1, greatest(len(H) - 3, 1) + 1),
                         i -> list_min(H[i:i+3])))) END AS W
        FROM h
    ),
    ex AS (SELECT doc_id, unnest(W) AS fp FROM wn),
    keep AS (SELECT fp FROM ex GROUP BY 1 HAVING count(*) <= {_STOP_CAP}),
    ke AS (SELECT doc_id, fp FROM ex JOIN keep USING (fp))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM ke a JOIN ke b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {_MIN_SHARED}
    ORDER BY 1, 2
    """,
    doc="shared-fingerprint near-dup: document pairs sharing >= "
    f"{_MIN_SHARED} winnowing fingerprints, after dropping stop-"
    f"fingerprints present in > {_STOP_CAP} docs.  The cap bounds the "
    "pair join (every surviving fingerprint fans out to <= cap^2 pairs), "
    "which is what keeps fingerprint self-joins feasible at corpus scale "
    "(MOSS-style plagiarism detection, Schleimer et al. SIGMOD'03).",
)
def q_docs_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = _docs_wide(spark, sf_dir).select(
        "doc_id", F.array_join(X.words(F.col("text")), " ").alias("s")
    )
    # the fingerprint relation feeds three consumers (dfreq cap, both join
    # sides) — persist so the Arrow kernel runs once, not three times
    ex = X.winnow_fingerprints(norm).persist(StorageLevel.MEMORY_AND_DISK)
    keep = (
        ex.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_dfreq"))
        .filter(F.col("_dfreq") <= _STOP_CAP)
        .select("fp")
    )
    ke = ex.join(keep, on="fp")
    a = ke.select(F.col("doc_id").alias("id_a"), "fp")
    b = ke.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Salted join: the hot-key skew rewrite for joins
# ---------------------------------------------------------------------------

_JOIN_SALTS = 8


@register(
    "events_salted_type_join",
    f"""
    WITH dim AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_total
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_money_sum('COALESCE(e.value, 0)')} AS value_sum,
           MAX(d.type_total) AS type_total
    FROM events e
    JOIN dim d ON d.event_type = e.event_type
    GROUP BY 1 ORDER BY 1
    """,
    doc="Salted JOIN: the hot-key rewrite for shuffle joins.  event_type "
    "has only 5 values — the worst possible join-key skew: a plain "
    "shuffle join lands the entire fact on 5 reducer keys.  The rewrite "
    "spreads each fact row to salt = event_id % 8 and EXPLODES the "
    "build side 8×, so the exchange keys on (event_type, salt) — 40 "
    "even partitions instead of 5 hot ones; shuffle_hash hint keeps it "
    "an exchange-based join (Catalyst would otherwise broadcast the "
    "40-row side and hide the pattern).  The oracle is the UNSALTED "
    "join — proving the rewrite changes only the shuffle layout, not "
    "one output bit (same recipe as events_salted_user_stats for aggs).",
)
def q_events_salted_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy(F.col("event_type").alias("d_type")).agg(
        F.count(F.lit(1)).alias("type_total")
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_JOIN_SALTS)]))
    )
    fixed = F.round(
        F.coalesce(F.col("value"), F.lit(0.0)) * F.lit(MONEY_SCALE)
    ).cast("long")
    fact = ev.select(
        "event_type",
        fixed.alias("v_fixed"),
        (F.col("event_id") % F.lit(_JOIN_SALTS)).cast("int").alias("salt"),
    )
    return (
        fact.join(
            salted_dim.hint("shuffle_hash"),
            (fact["event_type"] == salted_dim["d_type"])
            & (fact["salt"] == salted_dim["salt"]),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("v_fixed") / F.lit(float(MONEY_SCALE)), 2).alias(
                "value_sum"
            ),
            F.max("type_total").alias("type_total"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT cohort comparison
# ---------------------------------------------------------------------------


@register(
    "events_cohort_setops",
    """
    SELECT 'both' AS cohort, user_id FROM (
        SELECT user_id FROM events
        WHERE event_type = 'click' AND value > 300 AND user_id IS NOT NULL
        INTERSECT
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value > 200 AND user_id IS NOT NULL
    )
    UNION ALL
    SELECT 'click_only' AS cohort, user_id FROM (
        SELECT user_id FROM events
        WHERE event_type = 'click' AND value > 300 AND user_id IS NOT NULL
        EXCEPT
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value > 200 AND user_id IS NOT NULL
    )
    ORDER BY cohort, user_id
    """,
    doc="INTERSECT / EXCEPT coverage: high-value clickers who also made a "
    "high-value purchase vs those who never did, labeled in one result.  "
    "Spark plans both set ops as distinct-aggregating hash joins on the "
    "user key (LeftSemi for INTERSECT, LeftAnti for EXCEPT) — the same "
    "one-shuffle shape as the TPC-H semi/anti joins, applied to the "
    "cohort-diff question every growth dashboard asks.",
)
def q_events_cohort_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    clickers = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") > 300)
    ).select("user_id")
    purchasers = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).select("user_id")
    both = clickers.intersect(purchasers).select(
        F.lit("both").alias("cohort"), "user_id"
    )
    click_only = clickers.subtract(purchasers).select(
        F.lit("click_only").alias("cohort"), "user_id"
    )
    return both.unionAll(click_only).orderBy("cohort", "user_id")


# ---------------------------------------------------------------------------
# Table profiling (data-quality observability pass)
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("o_custkey", "long"),
    ("o_orderdate", "ts"),
    ("o_orderkey", "long"),
    ("o_orderpriority", "string"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "money"),
]


@register(
    "orders_profile",
    P.sql_profile("orders", _PROFILE_COLS),
    doc="Column profiler over orders: row/null/exact-distinct counts plus "
    "canonical min/max per column (longs as decimal strings, money as "
    "floor-cents, timestamps as epoch-µs — no engine-defined double or "
    "date formatting).  One single-column aggregate PER column unioned, "
    "not one multi-distinct aggregate: Catalyst plans k countDistincts in "
    "one agg as an Expand that pushes every row k times through the "
    "shuffle, while k pruned scans each read one column's pages and "
    "reduce map-side to 1-row partials.  operators/profile.py; swap "
    "countDistinct for the HLL sketch at 100 TB.",
)
def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.profile(load(spark, sf_dir, "orders"), _PROFILE_COLS).orderBy(
        "col_name"
    )


# ---------------------------------------------------------------------------
# Z-order zone maps: multi-dimensional clustering key + per-page statistics
# ---------------------------------------------------------------------------

_Z_SHIFT = 22  # 32-bit z-value >> 22 -> at most 1024 z-pages

_SQL_NORM = (
    "CASE WHEN hi_{n} <= lo_{n} THEN 0 ELSE "
    "CAST(FLOOR(({c} - lo_{n}) / CAST(hi_{n} - lo_{n} AS DOUBLE) * 65535.0)"
    " AS BIGINT) END"
)


def _norm16(c: str, lo: str, hi: str):
    """Min-max normalize a key column to the 16-bit Morton grid — the
    Spark twin of _SQL_NORM; both z-order queries MUST share this exact
    arithmetic (explicit FLOOR: DuckDB CAST(double AS BIGINT) rounds
    while Spark's truncates)."""
    span = (F.col(hi) - F.col(lo)).cast("double")
    return F.when(F.col(hi) <= F.col(lo), F.lit(0)).otherwise(
        F.floor((F.col(c) - F.col(lo)) / span * F.lit(65535.0))
    )


@register(
    "lineitem_zorder_pages",
    f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS lo_p, MAX(l_partkey) AS hi_p,
               MIN(l_suppkey) AS lo_s, MAX(l_suppkey) AS hi_s
        FROM lineitem
    ),
    n AS (
        SELECT l_partkey, l_suppkey,
               {_SQL_NORM.format(c='l_partkey', n='p')} AS nx,
               {_SQL_NORM.format(c='l_suppkey', n='s')} AS ny
        FROM lineitem, b
    )
    SELECT ({L.sql_zorder_key(['nx', 'ny'])} >> {_Z_SHIFT}) AS z_page,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
           MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
    FROM n
    GROUP BY 1
    ORDER BY z_page
    """,
    doc="Zone-map construction over the Z-order (Morton) curve of "
    "(l_partkey, l_suppkey): min-max normalize each key to the 16-bit "
    "grid (one tiny broadcast aggregate — raw keys would silently alias "
    "above 65535, e.g. partkey at TPC-H sf>=1), interleave the bits "
    "(operators/layout.zorder_key — pure shift/mask Catalyst "
    "built-ins), bucket rows into at most 1024 z-pages, and emit each "
    "page's min/max per dimension — the statistics a data-skipping "
    "reader consults.  Because the curve cycles dimensions one bit at a "
    "time, BOTH keys' per-page spans are narrow (a linear sort narrows "
    "only its leading column; tests/test_layout.py measures the "
    "contrast on real files).  Normalization uses an explicit FLOOR in "
    "both engines (DuckDB CAST(double AS BIGINT) rounds, Spark's "
    "truncates — floor of a non-negative value sidesteps both).  Scale "
    "shape: per-row bit arithmetic + one partial-aggregated groupBy on "
    "a <=1024-key space; the physical rewrite counterpart "
    "(operators/layout.zorder_rewrite) range-partitions on the same "
    "normalized key.",
)
def q_lineitem_zorder_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("lo_p"),
        F.max("l_partkey").alias("hi_p"),
        F.min("l_suppkey").alias("lo_s"),
        F.max("l_suppkey").alias("hi_s"),
    )

    z = L.zorder_key([F.col("nx"), F.col("ny")])
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            "l_partkey",
            "l_suppkey",
            _norm16("l_partkey", "lo_p", "hi_p").alias("nx"),
            _norm16("l_suppkey", "lo_s", "hi_s").alias("ny"),
        )
        .select(
            F.shiftright(z, _Z_SHIFT).alias("z_page"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("z_page")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("z_page")
    )


# ---------------------------------------------------------------------------
# Entity resolution: edit-distance-1 linkage via wildcard-neighborhood
# blocking (FastSS-family) — no all-pairs comparison ever materializes
# ---------------------------------------------------------------------------


_EDIT1_MAXLEN = 64  # oracle's constant series bound (names are 18 chars)


@register(
    "customers_edit1_pairs",
    f"""
    WITH v AS (
        SELECT c_custkey, c_name, i AS pos,
               substr(c_name, 1, i - 1) || chr(1) || substr(c_name, i + 1)
                   AS variant
        FROM customer, generate_series(1, {_EDIT1_MAXLEN}) AS g(i)
        WHERE i <= length(c_name)
    )
    SELECT a.pos, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(a.c_custkey) AS BIGINT) AS min_custkey,
           CAST(MAX(b.c_custkey) AS BIGINT) AS max_custkey
    FROM v a JOIN v b ON a.variant = b.variant
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) = 1
    GROUP BY a.pos
    ORDER BY a.pos
    """,
    doc="Entity-resolution linkage: all pairs of customer names at edit "
    "distance exactly 1, found by wildcard-neighborhood blocking "
    "(FastSS family): each name emits one variant per character "
    "position with that character replaced by a hole, and two "
    "equal-length names are substitution-distance-1 iff they share a "
    "variant — at exactly one (hole-position) key, so the equi-join "
    "emits each true pair once and NO quadratic candidate set ever "
    "exists.  The report aggregates to per-differing-position pair "
    "counts.  Scale shape: the variant relation is |rows|·len(name) "
    "(linear), and a bucket holds only names agreeing everywhere "
    "except the hole — its size is bounded by the alphabet at one "
    "position (<=10 here), so the self-join's fan-out is "
    "skew-bounded by construction, unlike sorted-neighborhood or "
    "length-blocking which collapse under uniform key formats.  The "
    "levenshtein residual keeps the blocking honest (and would drop "
    "distance-0 duplicates if the key were not unique).  Both engines "
    "run integer levenshtein — engine-exact.",
)
def q_customers_edit1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    v = c.select(
        "c_custkey",
        "c_name",
        F.explode(F.sequence(F.lit(1), F.length("c_name"))).alias("pos"),
    ).select(
        "c_custkey",
        "c_name",
        "pos",
        F.concat(
            F.expr("substr(c_name, 1, pos - 1)"),
            F.lit("\x01"),
            F.expr("substr(c_name, pos + 1)"),
        ).alias("variant"),
    )
    a = v.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "pos",
        "variant",
    )
    b = v.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("variant").alias("variant_b"),
    )
    return (
        a.join(b, a["variant"] == b["variant_b"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.levenshtein("name_a", "name_b") == 1)
        )
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("key_a").alias("min_custkey"),
            F.max("key_b").alias("max_custkey"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning: compact-bitmap pre-filter for a fact scan
# ---------------------------------------------------------------------------


_BLOOM_M = 8192  # bits in the filter
_BLOOM_K = 2  # hash functions
_BLOOM_PRICE = 495000.0  # selective dim predicate (~1% of orders)


def _bloom_pos(col, j: int):
    from data_engineering_etl_demo_spark.functions.hashing import md5_stream

    return md5_stream(f"bloom{j}", col) % _BLOOM_M


def _sql_bloom_pos(expr: str, j: int) -> str:
    from data_engineering_etl_demo_spark.functions.hashing import (
        sql_md5_stream,
    )

    salted = f"'bloom{j}' || CAST({expr} AS VARCHAR)"
    return f"({sql_md5_stream(salted)} % {_BLOOM_M})"


_SQL_BLOOM = f"""
    WITH sel AS (
        SELECT o_orderkey FROM orders WHERE o_totalprice > {_BLOOM_PRICE}
    ),
    bits AS (
        SELECT DISTINCT pos FROM (
            SELECT {_sql_bloom_pos('o_orderkey', 0)} AS pos FROM sel
            UNION ALL
            SELECT {_sql_bloom_pos('o_orderkey', 1)} AS pos FROM sel
        )
    ),
    li AS (
        SELECT l_orderkey,
               {_sql_bloom_pos('l_orderkey', 0)} AS pos0,
               {_sql_bloom_pos('l_orderkey', 1)} AS pos1,
               l_orderkey IN (SELECT o_orderkey FROM sel) AS is_true
        FROM lineitem
    ),
    flags AS (
        SELECT is_true,
               (pos0 IN (SELECT pos FROM bits))
               AND (pos1 IN (SELECT pos FROM bits)) AS cand
        FROM li
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fact_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
           CAST(COUNT(*) FILTER (WHERE cand) AS BIGINT) AS n_candidates,
           CAST(COUNT(*) FILTER (WHERE is_true) AS BIGINT) AS n_true_matches,
           CAST(COUNT(*) FILTER (WHERE cand AND NOT is_true) AS BIGINT)
               AS n_false_positives
    FROM flags
"""


@register(
    "lineitem_bloom_prune",
    _SQL_BLOOM,
    doc="Bloom-filter semi-join pruning: a ~1%-selective predicate on "
    f"orders builds a {_BLOOM_M}-bit, {_BLOOM_K}-hash Bloom bitmap of "
    "the surviving keys, packed into 64-bit words and broadcast; the "
    "lineitem scan tests membership with pure bitwise expressions and "
    "only candidate rows would proceed to the real join.  The report "
    "row quantifies the trade: fact rows scanned, bits set, candidates "
    "passed, true matches, false positives.  This is the pattern that "
    "replaces a full shuffle-join when the build side is too big to "
    "broadcast as rows but its BITMAP fits anywhere: at 100 TB a "
    "billion-key filter is 2^31 bits = 256 MB of words vs tens of GB "
    "of keys, and the probe side never shuffles at all (the standard "
    "runtime-filter design; Spark's own runtime bloom filter does this "
    "opaquely — this one is md5-seeded, so the ORACLE replays the "
    "identical bit set and the FP count is hash-compared, not "
    "approximated).  No false negative is possible by construction "
    "(test pins true_matches <= candidates and exact parity of both).",
)
def q_lineitem_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    sel = orders.filter(F.col("o_totalprice") > _BLOOM_PRICE).select(
        "o_orderkey"
    )
    bits = sel.select(
        F.explode(
            F.array(
                *[_bloom_pos(F.col("o_orderkey"), j) for j in range(_BLOOM_K)]
            )
        ).alias("pos")
    ).distinct()
    words = bits.groupBy(F.expr(f"pos DIV 64").alias("widx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        ).alias("word")
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))

    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    for j in range(_BLOOM_K):
        li = li.withColumn(f"pos{j}", _bloom_pos(F.col("l_orderkey"), j))
        w = words.select(
            F.col("widx").alias(f"widx{j}"), F.col("word").alias(f"word{j}")
        )
        li = li.join(
            F.broadcast(w),
            F.expr(f"pos{j} DIV 64") == F.col(f"widx{j}"),
            "left",
        ).withColumn(
            f"hit{j}",
            F.coalesce(
                F.expr(
                    f"(word{j} & shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(pos{j} % 64 AS INT))) != 0"
                ),
                F.lit(False),
            ),
        )
    truth = sel.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(True).alias("is_true")
    )
    flags = (
        li.join(F.broadcast(truth), on="l_orderkey", how="left")
        .withColumn("is_true", F.coalesce("is_true", F.lit(False)))
        .withColumn(
            "cand",
            F.expr(" AND ".join(f"hit{j}" for j in range(_BLOOM_K))),
        )
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_fact_rows"),
        F.count_if(F.col("cand")).alias("n_candidates"),
        F.count_if(F.col("is_true")).alias("n_true_matches"),
        F.count_if(F.col("cand") & ~F.col("is_true")).alias(
            "n_false_positives"
        ),
    )
    return agg.crossJoin(F.broadcast(n_bits)).select(
        "n_fact_rows",
        "bits_set",
        "n_candidates",
        "n_true_matches",
        "n_false_positives",
    )


# ---------------------------------------------------------------------------
# Zone-map data skipping: the read-side payoff of the z-order layout
# ---------------------------------------------------------------------------


_LIN_PAGE_ROWS = 600  # rows per page in the linear-sort layout


@register(
    "lineitem_zonemap_skip",
    f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS lo_p, MAX(l_partkey) AS hi_p,
               MIN(l_suppkey) AS lo_s, MAX(l_suppkey) AS hi_s
        FROM lineitem
    ),
    pred AS (
        SELECT lo_p + ((hi_p - lo_p) * 2) // 5 AS p1,
               lo_p + (hi_p - lo_p) // 2 AS p2,
               lo_s + (hi_s - lo_s) // 10 AS s1,
               lo_s + (hi_s - lo_s) // 5 AS s2
        FROM b
    ),
    n AS (
        SELECT l_partkey, l_suppkey,
               {_SQL_NORM.format(c='l_partkey', n='p')} AS nx,
               {_SQL_NORM.format(c='l_suppkey', n='s')} AS ny,
               ROW_NUMBER() OVER (
                   ORDER BY l_partkey, l_suppkey, l_orderkey, l_linenumber
               ) AS rn
        FROM lineitem, b
    ),
    zp AS (
        SELECT ({L.sql_zorder_key(['nx', 'ny'])} >> {_Z_SHIFT}) AS page,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_partkey) AS min_p, MAX(l_partkey) AS max_p,
               MIN(l_suppkey) AS min_s, MAX(l_suppkey) AS max_s
        FROM n GROUP BY 1
    ),
    lp AS (
        SELECT (rn - 1) // {_LIN_PAGE_ROWS} AS page,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_partkey) AS min_p, MAX(l_partkey) AS max_p,
               MIN(l_suppkey) AS min_s, MAX(l_suppkey) AS max_s
        FROM n GROUP BY 1
    ),
    zs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS z_pages_total,
               CAST(COUNT(*) FILTER (WHERE NOT (
                   max_p < p1 OR min_p > p2 OR max_s < s1 OR min_s > s2
               )) AS BIGINT) AS z_pages_scanned,
               CAST(COALESCE(SUM(n_rows) FILTER (WHERE NOT (
                   max_p < p1 OR min_p > p2 OR max_s < s1 OR min_s > s2
               )), 0) AS BIGINT) AS z_rows_scanned
        FROM zp, pred
    ),
    ls AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS lin_pages_total,
               CAST(COUNT(*) FILTER (WHERE NOT (
                   max_p < p1 OR min_p > p2 OR max_s < s1 OR min_s > s2
               )) AS BIGINT) AS lin_pages_scanned,
               CAST(COALESCE(SUM(n_rows) FILTER (WHERE NOT (
                   max_p < p1 OR min_p > p2 OR max_s < s1 OR min_s > s2
               )), 0) AS BIGINT) AS lin_rows_scanned
        FROM lp, pred
    ),
    ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS rows_matching
        FROM lineitem, pred
        WHERE l_partkey BETWEEN p1 AND p2 AND l_suppkey BETWEEN s1 AND s2
    )
    SELECT z_pages_total, z_pages_scanned, z_rows_scanned,
           lin_pages_total, lin_pages_scanned, lin_rows_scanned,
           rows_matching
    FROM zs, ls, ex
    """,
    doc="Read-side zone-map data skipping — the payoff measurement for "
    "the z-order layout: a 2-D range predicate (a ~10% x 10% box of "
    "each key's domain, derived from the table bounds in exact integer "
    "arithmetic so it scales with SF) is evaluated against per-page "
    "min/max zone maps under TWO layouts of the same rows: the Morton "
    "z-page bucketing (lineitem_zorder_pages) and a linear "
    "(l_partkey, l_suppkey) sort cut into fixed-size pages.  The "
    "report: pages total/scanned and the row-IO bound under each "
    "layout, plus the true match count.  The z-curve keeps BOTH "
    "dimensions' per-page spans narrow, so it prunes pages the linear "
    "sort must scan (the trailing-dimension problem); "
    "tests/test_storage_layout.py asserts the contrast on this very "
    "query.  Scale shape: zone maps are <=  pages rows (tiny), the "
    "scan is one pass, and the linear layout's global sort stands in "
    "for the writer's range partitioning — at 100 TB the reader "
    "consults footer stats exactly like this, file by file.",
)
def q_lineitem_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    bounds = li.agg(
        F.min("l_partkey").alias("lo_p"),
        F.max("l_partkey").alias("hi_p"),
        F.min("l_suppkey").alias("lo_s"),
        F.max("l_suppkey").alias("hi_s"),
    ).select(
        "*",
        F.expr("lo_p + ((hi_p - lo_p) * 2) DIV 5").alias("p1"),
        F.expr("lo_p + (hi_p - lo_p) DIV 2").alias("p2"),
        F.expr("lo_s + (hi_s - lo_s) DIV 10").alias("s1"),
        F.expr("lo_s + (hi_s - lo_s) DIV 5").alias("s2"),
    )

    w = Window.orderBy(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    # One staged relation feeds all three consumers (zp, lp, exact) —
    # persist so the scan + broadcast-bounds join + global sort run once
    staged = persist_latest(
        li.crossJoin(F.broadcast(bounds)).select(
            "l_partkey",
            "l_suppkey",
            "p1", "p2", "s1", "s2",
            _norm16("l_partkey", "lo_p", "hi_p").alias("nx"),
            _norm16("l_suppkey", "lo_s", "hi_s").alias("ny"),
            F.row_number().over(w).alias("rn"),
        ),
        "scale_patterns.zonemap_staged",
    )
    z = L.zorder_key([F.col("nx"), F.col("ny")])
    zp = (
        staged.select(
            F.shiftright(z, _Z_SHIFT).alias("page"),
            "l_partkey", "l_suppkey", "p1", "p2", "s1", "s2",
        )
        .groupBy("page", "p1", "p2", "s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_p"),
            F.max("l_partkey").alias("max_p"),
            F.min("l_suppkey").alias("min_s"),
            F.max("l_suppkey").alias("max_s"),
        )
    )
    lp = (
        staged.select(
            F.expr(f"(rn - 1) DIV {_LIN_PAGE_ROWS}").alias("page"),
            "l_partkey", "l_suppkey", "p1", "p2", "s1", "s2",
        )
        .groupBy("page", "p1", "p2", "s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_p"),
            F.max("l_partkey").alias("max_p"),
            F.min("l_suppkey").alias("min_s"),
            F.max("l_suppkey").alias("max_s"),
        )
    )
    overlap = ~(
        (F.col("max_p") < F.col("p1"))
        | (F.col("min_p") > F.col("p2"))
        | (F.col("max_s") < F.col("s1"))
        | (F.col("min_s") > F.col("s2"))
    )

    def stats(pages: DataFrame, prefix: str) -> DataFrame:
        return pages.agg(
            F.count(F.lit(1)).alias(f"{prefix}_pages_total"),
            F.count_if(overlap).alias(f"{prefix}_pages_scanned"),
            F.coalesce(
                F.sum(F.when(overlap, F.col("n_rows"))), F.lit(0)
            ).cast("long").alias(f"{prefix}_rows_scanned"),
        )

    exact = (
        staged.filter(
            F.col("l_partkey").between(F.col("p1"), F.col("p2"))
            & F.col("l_suppkey").between(F.col("s1"), F.col("s2"))
        )
        .agg(F.count(F.lit(1)).alias("rows_matching"))
    )
    return (
        stats(zp, "z")
        .crossJoin(F.broadcast(stats(lp, "lin")))
        .crossJoin(F.broadcast(exact))
        .select(
            "z_pages_total", "z_pages_scanned", "z_rows_scanned",
            "lin_pages_total", "lin_pages_scanned", "lin_rows_scanned",
            "rows_matching",
        )
    )


# ---------------------------------------------------------------------------
# Declarative data-quality constraints: dbt-style tests as one report
# ---------------------------------------------------------------------------


_EVENT_VOCAB = ["click", "view", "purchase", "signup"]


@register(
    "warehouse_constraint_report",
    f"""
    SELECT * FROM (
        SELECT 'accepted_values:events.event_type' AS rule_id,
               'events' AS table_name, 'accepted_values' AS kind,
               CAST(COUNT(*) FILTER (WHERE event_type IS NOT NULL
                   AND event_type NOT IN ('click','view','purchase','signup'))
                   AS BIGINT) AS n_violations
        FROM events
        UNION ALL
        SELECT 'foreign_key:events.user_id', 'events', 'foreign_key',
               CAST(COUNT(*) FILTER (WHERE user_id IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = events.user_id))
                   AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'foreign_key:lineitem.l_orderkey', 'lineitem', 'foreign_key',
               CAST(COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = lineitem.l_orderkey))
                   AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'foreign_key:orders.o_custkey', 'orders', 'foreign_key',
               CAST(COUNT(*) FILTER (WHERE o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = orders.o_custkey))
                   AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'in_range:orders.o_totalprice', 'orders', 'in_range',
               CAST(COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
                   AND (o_totalprice < 0 OR o_totalprice > 450000))
                   AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'not_null:events.event_id', 'events', 'not_null',
               CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'not_null:events.user_id', 'events', 'not_null',
               CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'unique:customer.c_custkey', 'customer', 'unique',
               CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
        FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey)
        UNION ALL
        SELECT 'unique:events.event_id', 'events', 'unique',
               CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
        FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY event_id)
        UNION ALL
        SELECT 'unique:lineitem.l_orderkey+l_linenumber', 'lineitem',
               'unique', CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
        FROM (SELECT COUNT(*) AS cnt FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    )
    ORDER BY rule_id
    """,
    doc="Declarative data-quality gate (operators/constraints.py): ten "
    "dbt-style rules — not-null, multi-column uniqueness, three "
    "foreign-key containments, an accepted-values vocabulary, a numeric "
    "range — evaluated as one unioned plan that moves |rules| rows "
    "total.  The 'error' event type and the price-range rule violate on "
    "this data, so the report proves it COUNTS rather than merely "
    "passes.  Scale shape: predicate rules collapse map-side to one "
    "partial per task; uniqueness pays one keyed groupBy (the exact "
    "check's floor — swap in the KMV sketch when an estimate "
    "suffices); FK checks broadcast the dim's distinct key column, "
    "which is precisely when FK validation is sensible.  The "
    "generalization of the reference's counter-style quality report "
    "(pipeline/quality.py) into declared, re-runnable tests-for-data.",
)
def q_warehouse_constraint_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from data_engineering_etl_demo_spark.operators import constraints as C

    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    rules = [
        # events' three scan-local predicate rules share ONE scan (r16,
        # guide §6 — fused_predicates; the report rows are identical to
        # the per-rule form, constraint_report orders by rule_id anyway)
        C.fused_predicates(
            events,
            "events",
            [
                C.accepted_values_rule("events", "event_type", _EVENT_VOCAB),
                C.not_null_rule("events", "event_id"),
                C.not_null_rule("events", "user_id"),
            ],
        ),
        C.foreign_key(
            events, "events", "user_id", customer, "c_custkey",
            broadcast=True,  # customer keys are dim-sized
        ),
        # orders is fact-sized: no broadcast hint — AQE sizes the anti-join
        C.foreign_key(
            lineitem, "lineitem", "l_orderkey", orders, "o_orderkey"
        ),
        C.foreign_key(
            orders, "orders", "o_custkey", customer, "c_custkey",
            broadcast=True,
        ),
        C.in_range(orders, "orders", "o_totalprice", 0, 450000),
        C.unique(customer, "customer", ["c_custkey"]),
        C.unique(events, "events", ["event_id"]),
        C.unique(lineitem, "lineitem", ["l_orderkey", "l_linenumber"]),
    ]
    return C.constraint_report(rules)


# ---------------------------------------------------------------------------
# k-anonymity census over quasi-identifiers (privacy gate for releases)
# ---------------------------------------------------------------------------

_KANON_K = 5  # groups smaller than this are re-identification risks


@register(
    "customers_k_anonymity",
    f"""
    WITH qi AS (
        SELECT c_mktsegment,
               c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        FROM customer
    ),
    g AS (
        SELECT c_mktsegment, c_nationkey, bal_band,
               CAST(count(*) AS BIGINT) AS k
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS small_groups,
           CAST(sum(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(min(k) AS BIGINT) AS min_k
    FROM g
    GROUP BY 1
    ORDER BY 1
    """,
    doc="k-anonymity census — the privacy gate a dataset passes before "
    "release: customers grouped by the quasi-identifier triple "
    "(market segment, nation, account-balance thousand-band); any group "
    "with fewer than k=5 members is a re-identification risk (Sweeney "
    "2002).  The report gives per-segment group counts, at-risk groups "
    "and rows, and the segment's worst k — the table that decides "
    "whether bal_band needs coarsening before publishing.  Integer "
    "bands via IEEE floor(x/1000), identical in both engines.  Plan: "
    "two stacked hash aggregates (QI census, then per-segment rollup), "
    "both with map-side partials — one scan of three columns, no joins, "
    "the same shape at any scale.",
)
def q_customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    g = qi.groupBy("c_mktsegment", "c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    return (
        g.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("k") < _KANON_K, 1).otherwise(0))
            .cast("long")
            .alias("small_groups"),
            F.sum(F.when(F.col("k") < _KANON_K, F.col("k")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.min("k").cast("long").alias("min_k"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Snapshot time travel + CDC diff over the swap-write warehouse substrate
# ---------------------------------------------------------------------------

_SNAP_BUMP_MOD = 20  # 1-in-20 rows get a value bump in generation 2

from data_engineering_etl_demo_spark.functions.hashing import (  # noqa: E402
    sql_hexbig as _sql_hexbig,
)


def _snapshot_staged_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per events-file identity) a two-generation table under
    /tmp and snapshot generation 1: gen1 = first-half days of the cleaned
    event values, gen2 = MERGE of the full range with a deterministic
    1-in-20 value bump — so the v1→v2 diff exercises added AND changed.
    Same build-in-scratch + atomic-rename publication as the streaming
    staged dirs (concurrent builders can't interleave)."""
    import hashlib
    import shutil
    import uuid
    from pathlib import Path

    from data_engineering_etl_demo_spark.functions.hashing import md5_stream
    from data_engineering_etl_demo_spark.operators.warehouse import Warehouse

    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    fp = hashlib.md5(
        f"{src.resolve()}|{st.st_size}|{st.st_mtime_ns}|v1".encode()
    ).hexdigest()[:12]
    root = Path("/tmp/spark_graft_snapshots") / f"{Path(sf_dir).name}-{fp}"
    if (root / "_built").exists():
        return str(root)
    build = root.parent / f".build-{root.name}-{uuid.uuid4().hex}"
    build.mkdir(parents=True, exist_ok=True)

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            F.to_date("ts").cast("string").alias("event_date"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "_day"
            ),
            F.round(F.col("value") * 1_000_000).cast("long").alias("v6"),
        )
    )
    lo, hi = ev.agg(F.min("_day"), F.max("_day")).first()
    split = lo + (hi - lo) // 2  # gen1 = days strictly below the midpoint
    wh = Warehouse(spark, str(build))
    gen1 = ev.filter(F.col("_day") < split).drop("_day")
    wh._swap_write("fact_daily_values", gen1)
    assert wh.snapshot_table("fact_daily_values") == 1
    bump = (
        (md5_stream("bump:", F.col("event_id")) % _SNAP_BUMP_MOD == 0)
        .cast("long")
        * 1_000_000
    )
    gen2 = ev.drop("_day").withColumn("v6", F.col("v6") + bump)
    # last-writer-wins MERGE of the full recompute over gen1, then swap —
    # the same substrate the fact tables use
    merged = Warehouse._last_writer_wins(
        wh.table("fact_daily_values"), gen2, key="event_id", insert_only=False
    )
    wh._swap_write("fact_daily_values", merged)
    (build / "_built").touch()
    try:
        build.rename(root)
    except OSError:
        shutil.rmtree(build, ignore_errors=True)
        if not (root / "_built").exists():
            raise
    return str(root)


@register(
    "warehouse_snapshot_diff",
    f"""
    WITH ev AS (
        SELECT event_id,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
               (CAST(ts AS DATE) - DATE '1970-01-01') AS d,
               CAST(ROUND(value * 1000000) AS BIGINT) AS v6
        FROM events WHERE value IS NOT NULL
    ),
    b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
    s AS (SELECT lo + (hi - lo) // 2 AS split FROM b)
    SELECT event_date,
           CAST(sum(CASE WHEN d >= split THEN 1 ELSE 0 END) AS BIGINT)
               AS n_added,
           CAST(sum(CASE WHEN d < split
                          AND {_sql_hexbig("'bump:' || CAST(event_id AS VARCHAR)", 1, 8)}
                              % {_SNAP_BUMP_MOD} = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(0 AS BIGINT) AS n_removed
    FROM ev, s
    GROUP BY event_date
    HAVING sum(CASE WHEN d >= split THEN 1 ELSE 0 END)
         + sum(CASE WHEN d < split
                     AND {_sql_hexbig("'bump:' || CAST(event_id AS VARCHAR)", 1, 8)}
                         % {_SNAP_BUMP_MOD} = 0
                THEN 1 ELSE 0 END) > 0
    ORDER BY event_date
    """,
    doc="Snapshot TIME TRAVEL + CDC diff on the plain-parquet swap "
    "substrate (operators/warehouse.snapshot_table / read_snapshot / "
    "snapshot_diff): generation 1 of a value fact (first-half days) is "
    "published as an immutable hardlink-forest snapshot, generation 2 "
    "MERGEs the full range with a deterministic 1-in-20 value bump, and "
    "the query reads v1 AGAINST THE LIVE TABLE and reports per-day "
    "added/changed/removed counts — the incremental feed a downstream "
    "consumer reads instead of re-scanning the fact.  This is the "
    "Delta/Iceberg table-version contract rebuilt on immutable parquet "
    "+ atomic renames (VERDICT's one environment-bounded gap, narrowed "
    "from the storage side).  The diff itself is ONE full-outer join on "
    "the merge key comparing whole-row fingerprints; the oracle derives "
    "the same census from the raw events with the same split/bump "
    "hashes.  Row-level change identity is additionally pinned by "
    "tests/test_warehouse.py snapshots.",
    memoize=False,  # touches on-disk state; rebuild per call
)
def q_warehouse_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_etl_demo_spark.operators.warehouse import Warehouse

    root = _snapshot_staged_root(spark, sf_dir)
    wh = Warehouse(spark, root)
    v1 = wh.read_snapshot("fact_daily_values", 1)
    live = wh.table("fact_daily_values")
    diff = Warehouse.snapshot_diff(v1, live, key="event_id")
    dates = live.select("event_id", "event_date")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        diff.join(dates, on="event_id", how="left")
        .groupBy("event_date")
        .agg(
            one(F.col("change") == "added").alias("n_added"),
            one(F.col("change") == "changed").alias("n_changed"),
            one(F.col("change") == "removed").alias("n_removed"),
        )
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning: the engine-native skipping path, demonstrated
# ---------------------------------------------------------------------------


def _dpp_staged_fact(spark: SparkSession, sf_dir: str) -> str:
    """lineitem rewritten ONCE per source-file identity as a parquet
    dataset partitioned by ship month (`l_shipmonth=YYYY-MM/` dirs) —
    the physical layout dynamic partition pruning needs.  Same
    build-in-scratch + atomic-rename publication as the other staged
    dirs."""
    import hashlib
    import shutil
    import uuid
    from pathlib import Path

    src = Path(sf_dir) / "lineitem.parquet"
    st = src.stat()
    fp = hashlib.md5(
        f"{src.resolve()}|{st.st_size}|{st.st_mtime_ns}|dpp1".encode()
    ).hexdigest()[:12]
    root = Path("/tmp/spark_graft_dpp") / f"{Path(sf_dir).name}-{fp}"
    if (root / "_built").exists():
        return str(root / "lineitem")
    build = root.parent / f".build-{root.name}-{uuid.uuid4().hex}"
    build.mkdir(parents=True, exist_ok=True)
    (
        load(spark, sf_dir, "lineitem")
        .withColumn("l_shipmonth", F.date_format("l_shipdate", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("l_shipmonth")
        .parquet(str(build / "lineitem"))
    )
    (build / "_built").touch()
    try:
        build.rename(root)
    except OSError:
        shutil.rmtree(build, ignore_errors=True)
        if not (root / "_built").exists():
            raise
    return str(root / "lineitem")


@register(
    "lineitem_dpp_prune",
    """
    WITH sel AS (
        SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
    )
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) / 100.0, 2) AS revenue
    FROM lineitem
    JOIN sel ON strftime(l_shipdate, '%Y-%m') = sel.m
    GROUP BY 1
    ORDER BY 1
    """,
    doc="DYNAMIC PARTITION PRUNING, the engine-native skipping path "
    "(complementing the hand-built bloom/zone-map queries): the fact is "
    "staged once as a month-partitioned dataset, and the join against "
    "the filtered month dimension plants a dynamicpruning#N subquery "
    "into the fact scan's PartitionFilters — at execution Spark reads "
    "ONLY the ~3 matching month directories of the fact, a runtime "
    "decision no static optimizer can make because the month list comes "
    "from the dim side's rows.  tests/test_round6_queries.py asserts "
    "both the plan property (dynamicpruning in the scan) and the "
    "physical effect (partitions read == |sel|, not |months|).  At "
    "100 TB this IS how date-dim joins avoid scanning the fact: "
    "partition layout + DPP replaces per-query zone maps.  The oracle "
    "replays the same join on the unpartitioned table — layout must "
    "never change results.  Fixed-point money sum as everywhere.",
    memoize=False,  # reads staged on-disk state; keep builds visible
)
def q_lineitem_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = spark.read.parquet(_dpp_staged_fact(spark, sf_dir))
    sel = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .distinct()
    )
    return (
        fact.join(sel, fact["l_shipmonth"] == sel["m"])
        .groupBy(F.col("l_shipmonth").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("revenue"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# Differentially-private release: seeded two-sided geometric mechanism
# ---------------------------------------------------------------------------

_DP_EPS = 0.5  # per-cell privacy budget
_DP_BOUND = 16  # noise truncation (bounded-noise DP variant, documented)


def _dp_thresholds() -> list[tuple[int, int]]:
    """(threshold_u32, noise) CASE ladder for the two-sided geometric
    mechanism: P(Z=k) ∝ alpha^|k| with alpha = e^-eps, truncated at
    ±_DP_BOUND.  Thresholds are plain Python floats floored onto the
    32-bit uniform domain at module import — LITERALS by the time either
    engine sees them, so both walk the identical ladder."""
    import math

    a = math.exp(-_DP_EPS)
    ks = list(range(-_DP_BOUND, _DP_BOUND + 1))
    ws = [a ** abs(k) for k in ks]
    tot = sum(ws)
    acc = 0.0
    out = []
    for k, w in zip(ks, ws):
        acc += w / tot
        out.append((min(int(acc * 2**32), 2**32), k))
    out[-1] = (2**32, _DP_BOUND)  # float-roundoff guard: ladder is total
    return out


_DP_LADDER = _dp_thresholds()


def _sql_dp_noise(u32: str) -> str:
    whens = " ".join(
        f"WHEN {u32} < {t} THEN {k}" for t, k in _DP_LADDER
    )
    return f"(CASE {whens} END)"


@register(
    "events_dp_release",
    f"""
    WITH c AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    )
    SELECT event_type,
           CAST(greatest(n + {_sql_dp_noise(
               _sql_hexbig("'dp:' || event_type", 1, 8)
           )}, 0) AS BIGINT) AS noisy_count,
           CAST({int(_DP_EPS * 1_000_000)} AS BIGINT) AS epsilon_e6
    FROM c
    ORDER BY event_type
    """,
    doc="Differentially-private count release — the two-sided geometric "
    "mechanism (the discrete Laplace; Ghosh-Roughgarden-Sundararajan "
    "2009: utility-optimal for counts) at eps=0.5 per cell, noise "
    f"truncated at ±{_DP_BOUND} (the bounded-noise variant; the "
    "truncation's privacy cost is the standard delta term, owned "
    "here).  The inverse-CDF ladder is precomputed once as integer "
    "thresholds on the 32-bit uniform domain, so drawing noise is a "
    "CASE walk both engines execute identically.  DEMONSTRATION "
    "caveat, stated plainly: the uniform is a SEEDED md5 of the cell "
    "key so the release is reproducible and oracle-checkable — a real "
    "deployment must swap in fresh randomness per release (a seeded "
    "release is only private for the FIRST publication).  Plan: the "
    "count aggregate is the only data-sized work; noise is a per-cell "
    "scalar expression.",
)
def q_events_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_etl_demo_spark.functions.hashing import md5_stream

    u = md5_stream("dp:", F.col("event_type"))
    noise = None
    for t, k in _DP_LADDER:
        cond = u < t
        noise = F.when(cond, k) if noise is None else noise.when(cond, k)
    c = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        c.select(
            "event_type",
            F.greatest(F.col("n") + noise, F.lit(0))
            .cast("long")
            .alias("noisy_count"),
            F.lit(int(_DP_EPS * 1_000_000)).cast("long").alias("epsilon_e6"),
        )
        .orderBy("event_type")
    )
