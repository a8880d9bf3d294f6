"""Generic relational operator coverage over the TPC-H-ish tables.

The reference's own query surface is narrow (equi-join fact→dim, grouped
aggregates, top-k — SURVEY.md §2.3/§2.4).  These plans exercise the same
operator classes at warehouse scale: multi-way joins, partial aggregation,
window ranking, and top-k, each with a DuckDB oracle.

Scale notes:
- dims (region/nation/customer/part/supplier) are broadcast explicitly —
  at 100 TB lineitem/orders are the only big sides; no sort-merge join is
  ever needed for these shapes.
- pricing_summary is a 6-group agg over the fact: pure map-side combine,
  one tiny shuffle.
- order_rank windows by o_custkey — high cardinality key, so the window
  shuffle partitions evenly (no global window, SURVEY.md §7 watch-out 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_etl_demo_spark.catalog import load
from data_engineering_etl_demo_spark.functions.cleaning import money_sum
from data_engineering_etl_demo_spark.functions.caching import persist_latest
from data_engineering_etl_demo_spark.plans import register
from data_engineering_etl_demo_spark.plans.analytics import sql_money_sum


# ---------------------------------------------------------------------------
# TPC-H Q1 shape: pricing summary (grouped sums/avg/count over the fact)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_money_sum('l_quantity')} AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_base_price,
           {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           ROUND(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT)) / (COUNT(*) * 1000000.0), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: multi-aggregate group-by with pushed-down filter.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-12-01 00:00:00").cast("timestamp")
    )
    qty_fixed = F.round(F.col("l_quantity") * F.lit(1000000)).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice")
                * (F.lit(1) - F.col("l_discount"))
                * (F.lit(1) + F.col("l_tax"))
            ).alias("sum_charge"),
            F.round(
                F.sum(qty_fixed) / (F.count(F.lit(1)) * F.lit(1000000.0)), 4
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Top-k customers by order revenue (fact ⨝ broadcast dim → agg → top-k)
# ---------------------------------------------------------------------------


@register(
    "top_customers",
    f"""
    SELECT c.c_custkey,
           c.c_name,
           COUNT(*) AS order_count,
           {sql_money_sum('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    doc="J2 shape: fact ⨝ broadcast dim, grouped agg, deterministic top-k.",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Multi-way dim join rollup: region ⨝ nation ⨝ customer
# ---------------------------------------------------------------------------


@register(
    "nation_rollup",
    f"""
    SELECT r.r_name AS region,
           n.n_name AS nation,
           COUNT(c.c_custkey) AS customers,
           {sql_money_sum('COALESCE(c.c_acctbal, 0)')} AS total_acctbal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Multi-way join (inner + left outer) with grouped rollup.",
)
def q_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    return (
        region.join(
            F.broadcast(nation),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .join(cust, cust["c_nationkey"] == nation["n_nationkey"], "left")
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.count("c_custkey").alias("customers"),
            money_sum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias(
                "total_acctbal"
            ),
        )
        .orderBy("region", "nation")
    )


# ---------------------------------------------------------------------------
# Window ranking: top-3 orders per customer by totalprice
# ---------------------------------------------------------------------------


@register(
    "order_rank",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
    doc="Analytic window: per-key ranking with deterministic tiebreak.",
)
def q_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    )


# ---------------------------------------------------------------------------
# Semi/anti join coverage: customers with and without orders
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    ORDER BY c_custkey
    """,
    doc="Anti join (NOT IN → left_anti).",
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Set op coverage: union of two projections (T1/T2 shape)
# ---------------------------------------------------------------------------


@register(
    "all_parties_union",
    """
    SELECT party_id, name, kind FROM (
        SELECT c_custkey AS party_id, c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey AS party_id, s_name AS name, 'supplier' AS kind FROM supplier
    )
    ORDER BY kind, party_id
    """,
    doc="T1/T2: unionByName of conformed projections.",
)
def q_all_parties_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp).orderBy("kind", "party_id")


@register(
    "pricing_percentiles",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(l_extendedprice, 0.25) AS p25,
           quantile_disc(l_extendedprice, 0.5) AS p50,
           quantile_disc(l_extendedprice, 0.75) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="exact discrete percentiles per group (sort-based, no interpolation "
    "drift — percentile_disc picks an element, identical across engines).",
)
def q_pricing_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percentile_disc(p) = smallest value whose cume_dist >= p.  Built-in
    # percentile_disc is an object-aggregate that buffers every row of a
    # group on ONE reducer — a skew wall when groups are few (3 returnflags)
    # and huge.  Two-pass histogram refinement instead:
    #   pass 1: bucket histogram groupBy(flag, floor(price/W)) — map-side
    #     partial agg shrinks the shuffle to |buckets|; a cumulative window
    #     over the tiny histogram locates the bucket where each percentile's
    #     rank threshold crosses, and the residual rank r within it;
    #   pass 2: broadcast the O(groups × percentiles) candidate set, scan
    #     again touching only candidate-bucket rows, and take the r-th
    #     smallest by a window over those few rows.
    # Every compare is on exact integers except p·n, and p ∈ {.25,.5,.75}
    # with n < 2^53 makes p·n IEEE-exact, so the crossing bucket and residual
    # are engine-exact.  At cluster scale pass 2 per group-percentile sorts
    # ~n/|buckets| rows; widen |buckets| (or recurse) to bound it.
    from pyspark.sql.window import Window

    width = 64
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    bucket = F.floor(F.col("l_extendedprice") / width)
    hist = li.groupBy("l_returnflag", bucket.alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    h = (
        hist.withColumn("cb", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn("prev", F.col("cb") - F.col("cnt"))
    )
    pcts = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75)]
    # One histogram pass serves all percentiles: melt p in, keep the rows
    # where the rank threshold tgt = ceil(p·n) crosses (prev < tgt <= cb).
    melted = h.select(
        "l_returnflag",
        "b",
        "n",
        "prev",
        "cb",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(tag).alias("ptag"), F.lit(p).alias("p"))
                    for tag, p in pcts
                ]
            )
        ).alias("pp"),
    ).select(
        "l_returnflag",
        "b",
        "n",
        "prev",
        "cb",
        F.col("pp.ptag").alias("ptag"),
        F.ceil(F.col("pp.p") * F.col("n")).alias("tgt"),
    )
    cand = melted.filter(
        (F.col("cb") >= F.col("tgt")) & (F.col("prev") < F.col("tgt"))
    ).select(
        F.col("l_returnflag").alias("c_flag"),
        "b",
        "n",
        "ptag",
        (F.col("tgt") - F.col("prev")).alias("r"),
    )
    matched = li.join(
        F.broadcast(cand),
        (F.col("l_returnflag") == F.col("c_flag")) & (bucket == F.col("b")),
    )
    w_rank = Window.partitionBy("c_flag", "ptag").orderBy("l_extendedprice")
    picked = matched.withColumn("rn", F.row_number().over(w_rank)).filter(
        F.col("rn") == F.col("r")
    )
    return (
        picked.groupBy(F.col("c_flag").alias("l_returnflag"))
        .agg(
            F.max("n").alias("n"),
            *[
                F.max(
                    F.when(F.col("ptag") == tag, F.col("l_extendedprice"))
                ).alias(tag)
                for tag, _ in pcts
            ],
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping priority (big-big join → agg → top-k)
# ---------------------------------------------------------------------------

_Q3_DATE = "1998-03-15 00:00:00"


@register(
    "shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_money_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           epoch_us(o.o_orderdate) AS o_orderdate_us,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: the one genuinely big-big join in the workload "
    "(lineitem ⨝ orders shuffles on the order key; customer is the only "
    "broadcast side), date filters pushed to both scans, grouped revenue, "
    "deterministic top-k (TakeOrderedAndProject).",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(_Q3_DATE).cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # customer is the small side after the segment filter — broadcast;
        # lineitem ⨝ orders stays a shuffle join on the (high-cardinality,
        # even) order key, the layout that survives a 100 TB fact
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            # o_orderdate reads as TIMESTAMP_NTZ; the session tz is pinned
            # UTC, so the cast matches DuckDB's epoch_us on the naive value
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: regional local-supplier volume (6-table join)
# ---------------------------------------------------------------------------


@register(
    "regional_supplier_volume",
    f"""
    SELECT n.n_name,
           {sql_money_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-table star join with the local-supplier "
    "constraint (c_nationkey = s_nationkey).  supplier/nation/region are "
    "broadcast (true dims at any scale); customer joins by key and AQE "
    "picks its strategy; lineitem ⨝ orders is the one big shuffle.  Join "
    "order is left to Catalyst's reordering — declared, not scheduled.",
)
def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer (top 20)
# ---------------------------------------------------------------------------


@register(
    "returned_item_revenue",
    f"""
    SELECT c.c_custkey,
           c.c_name,
           n.n_name,
           {sql_money_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: which customers returned the most revenue last "
    "quarter — returnflag + date-range filters pushed to both fact scans, "
    "lineitem ⨝ orders on the order key (the one big shuffle), customer "
    "by key (AQE decides), nation broadcast, grouped revenue, "
    "deterministic top-20.",
)
def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Correlated subquery shape: orders above their customer's average
# ---------------------------------------------------------------------------


@register(
    "orders_above_customer_avg",
    """
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 1000000) AS BIGINT) AS price_fixed
    FROM orders o
    WHERE CAST(ROUND(o_totalprice * 1000000) AS BIGINT) * (
            SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        > (SELECT SUM(CAST(ROUND(i.o_totalprice * 1000000) AS BIGINT))
           FROM orders i WHERE i.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
    doc="correlated-subquery shape ('orders above their customer's "
    "average'): the oracle states it as two correlated scalar subqueries; "
    "the Spark plan is the decorrelated form — one window over the "
    "customer key, no re-scan per row.  The comparison is cross-"
    "multiplied in exact fixed-point (price·n > sum) so no division "
    "ever happens — average comparisons as integer arithmetic.",
)
def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey")
    fixed = F.round(F.col("o_totalprice") * F.lit(1_000_000)).cast("long")
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", fixed.alias("price_fixed"))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .withColumn("_s", F.sum("price_fixed").over(w))
        .filter(F.col("price_fixed") * F.col("_n") > F.col("_s"))
        .select("o_orderkey", "o_custkey", "price_fixed")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority count over an EXISTS semi-join
# ---------------------------------------------------------------------------


@register(
    "order_priority_lateship",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted: testdata lineitem has no commit/receipt "
    "dates — /root/reference has no big-big semi-join at all, so this "
    "extends coverage): orders that had any line shipped >60 days after "
    "order date, counted per priority.  EXISTS plans as a LEFT SEMI join "
    "on the order key with the date comparison as a residual — each order "
    "row emitted at most once regardless of matching line count, no "
    "distinct/agg needed.  Both date filters push to the orders scan; at "
    "100 TB both sides shuffle on the (even, high-cardinality) order key.",
)
def q_order_priority_lateship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"]
                > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-quantity orders (HAVING agg semi-joined back)
# ---------------------------------------------------------------------------


@register(
    "large_quantity_orders",
    f"""
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           epoch_us(o.o_orderdate) AS o_orderdate_us,
           o.o_totalprice,
           {sql_money_sum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 300 — an "
    "aggregate with a HAVING filter feeding an IN semi-join back into the "
    "same fact.  The inner agg is map-side-partial over the order key; "
    "its tiny surviving set (≈0.3% of orders) semi-joins the fact, then "
    "the outer agg re-groups only matching lines.  customer joins by key "
    "(AQE picks broadcast at small SF); top-100 plans as "
    "TakeOrderedAndProject.",
)
def q_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
        )
        .agg(money_sum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (agg of an agg)
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: how many customers placed how many orders — a "
    "LEFT OUTER join (zero-order customers must appear with count 0; "
    "COUNT(o_orderkey) skips their null) feeding a second aggregation "
    "over the first's result.  Level 1 shuffles on the high-cardinality "
    "customer key; level 2's input is one row per customer and its "
    "grouping key (the count) is low-cardinality but the rows are tiny — "
    "the classic distribution-histogram two-phase shape.",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: idle rich customers (global scalar subquery + anti join)
# ---------------------------------------------------------------------------


@register(
    "idle_rich_customers",
    f"""
    SELECT n.n_name,
           COUNT(*) AS numcust,
           {sql_money_sum('c.c_acctbal')} AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(ROUND(c.c_acctbal * 1000000) AS BIGINT)
              * (SELECT COUNT(*) FROM customer i WHERE i.c_acctbal > 0)
          > (SELECT SUM(CAST(ROUND(i.c_acctbal * 1000000) AS BIGINT))
             FROM customer i WHERE i.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q22 shape (acctbal stands in for the missing phone-prefix "
    "column): customers richer than the positive-balance average who never "
    "ordered, counted per nation.  The global average is a scalar-subquery "
    "aggregate — planned as a 1-row broadcast joined to every customer, "
    "never a driver-side collect; the comparison cross-multiplies in "
    "fixed-point (bal·n > sum) so no float division drifts between "
    "engines.  NOT EXISTS plans as LEFT ANTI against orders on the "
    "customer key; nation broadcasts.",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    fixed = F.round(F.col("c_acctbal") * F.lit(1_000_000)).cast("long")
    stats = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.round(F.col("c_acctbal") * F.lit(1_000_000)).cast("long")).alias(
                "_s"
            ),
        )
    )
    return (
        cust.withColumn("_bal_fixed", fixed)
        .crossJoin(F.broadcast(stats))
        .filter(F.col("_bal_fixed") * F.col("_n") > F.col("_s"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive brand/size/quantity predicates over a join
# ---------------------------------------------------------------------------


@register(
    "brand_quantity_revenue",
    f"""
    SELECT {sql_money_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size <= 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#23' AND p.p_size <= 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#34' AND p.p_size <= 35
           AND l.l_quantity BETWEEN 20 AND 35)
    GROUP BY ALL
    """,
    doc="TPC-H Q19 shape (no container/shipmode columns in testdata; the "
    "brand/size/quantity disjuncts carry the same structure): revenue from "
    "three OR'd brand+size+quantity bands.  The implied single-column "
    "envelopes are stated explicitly — p_brand IN (…) and the quantity "
    "range land in each scan's PushedFilters (disjunct envelopes are "
    "exactly what a 100 TB scan needs pruned BEFORE the join); the full "
    "OR runs as the post-join filter.  part is a broadcast dim; the "
    "global single-row aggregate is a partial-agg + 1-row merge.",
)
def q_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") <= 35)
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 35)
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size") <= 35)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(band)
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top-revenue supplier (max-of-agg joined back)
# ---------------------------------------------------------------------------


@register(
    "top_supplier_revenue",
    """
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000)
                        AS BIGINT)) AS r_fixed
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey,
           s.s_name,
           ROUND(rev.r_fixed / 1000000.0, 2) AS total_revenue
    FROM supplier s
    JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r_fixed = (SELECT MAX(r_fixed) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue — "
    "an aggregate whose MAX is computed and joined back against the same "
    "aggregate.  The scalar MAX is a 1-row broadcast (never a global "
    "window over one partition, never a collect); revenue compares in "
    "exact fixed-point so 'equal to the max' cannot drift between "
    "engines.  supplier broadcasts; the quarter filter is pushed to the "
    "lineitem scan.  The per-supplier aggregate is persisted: it is "
    "consumed twice (max + join-back) and Spark does not reuse the "
    "subplan on its own (verified executedPlan: 2 fact scans without it) "
    "— caching the SMALL relation turns a double 100 TB scan into one.",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    from pyspark import StorageLevel

    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * F.lit(1_000_000)
                ).cast("long")
            ).alias("r_fixed")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    max_rev = rev.agg(F.max("r_fixed").alias("_max_fixed"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("r_fixed") == F.col("_max_fixed"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r_fixed") / F.lit(1_000_000.0), 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: sole late supplier per multi-supplier order
# ---------------------------------------------------------------------------


@register(
    "sole_late_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l.l_orderkey
              AND l2.l_suppkey <> l.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l.l_orderkey
              AND l3.l_suppkey <> l.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 80 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (late = shipped >80 days after order date; "
    "testdata has no receipt/commit dates): late lines from orders with "
    "multiple suppliers where no OTHER supplier was late.  The oracle "
    "states it with correlated EXISTS + NOT EXISTS; the Spark plan is the "
    "decorrelated SINGLE-PASS form — one per-order aggregate computes "
    "distinct suppliers, distinct LATE suppliers, the late line count, "
    "and (via max) the late supplier's key; when n_late_supp = 1 every "
    "late line belongs to that one supplier, so EXISTS ⇔ n_supp > 1, "
    "NOT-EXISTS-other-late ⇔ n_late_supp = 1, and numwait = the summed "
    "late-line counts.  ONE shuffle on the even order key, then a tiny "
    "per-supplier agg — the naive two-consumer formulation re-ran the "
    "fact⨝orders join twice (verified executedPlan: 5 scans → 3).",
)
def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    # shuffle-hash build on the smaller orders side: same co-partitioned
    # exchange as sort-merge but skips both sort passes over the 4x-larger
    # lineitem side (~15% at sf0.1, more at scale where the sorts spill;
    # orders is NOT broadcast — it scales with the fact table).
    lines = li.join(
        orders.hint("shuffle_hash"), li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")
        ).alias("_late"),
    )
    # Two-level aggregate instead of countDistinct: two DISTINCT aggs in
    # one groupBy plan as an Expand (3x the joined fact rows through the
    # shuffle).  Pre-aggregating per (order, supplier) first needs no
    # Expand, keeps map-side partials, and the second level runs on the
    # already-tiny per-(order,supplier) relation (3.2s -> measured below).
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("_late").alias("_any_late"),
        F.sum(F.when(F.col("_late"), F.lit(1)).otherwise(F.lit(0))).alias(
            "_supp_late_lines"
        ),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum(F.col("_any_late").cast("int")).alias("_n_late_supp"),
        F.max(F.when(F.col("_any_late"), F.col("l_suppkey"))).alias(
            "_late_suppkey"
        ),
        F.sum("_supp_late_lines").alias("_late_lines"),
    )
    return (
        per_order.filter(
            (F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("_late_suppkey") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change (scan-only filter + aggregate)
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue",
    f"""
    SELECT {sql_money_sum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: the canonical scan-only query — every predicate "
    "(date range, discount band, quantity cap) must reach the parquet "
    "scan as a pushed filter; the aggregate is pure map-side combine into "
    "a single row.  At 100 TB this is the query whose entire cost is IO, "
    "so row-group pruning on l_shipdate does the heavy lifting.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade volume between two nations
# ---------------------------------------------------------------------------


@register(
    "nation_trade_volume",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           {sql_money_sum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: shipments between two specific nations, grouped "
    "by (supplier nation, customer nation, ship year).  The same dim "
    "table (nation) joins TWICE under different roles — the disjunctive "
    "nation-pair predicate can only be applied after both joins, but both "
    "nation sides and supplier are broadcast, so the only big shuffle is "
    "lineitem ⨝ orders on the order key; customer joins by key under AQE.",
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            # cast: DuckDB EXTRACT(year) is BIGINT; Spark year() is int
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region
# ---------------------------------------------------------------------------

# Exact cross-engine ratio: numerator and denominator are fixed-point LONG
# sums (exact, associative); the share divides them AS DOUBLES (BIGINT →
# double is correctly rounded in both engines) and truncates with
# floor(x*1e6)/1e6 — IEEE-exact in both engines, unlike ROUND(double, n)
# whose last ulp is engine-defined (NOTES.md exactness rule 1).


def _share(num_long, den_long):
    """floor-truncated 6-dp ratio of two exact LONG sums — Spark half."""
    return F.floor(
        (num_long.cast("double") / den_long.cast("double")) * F.lit(1000000.0)
    ) / F.lit(1000000.0)


def _sql_share(num: str, den: str) -> str:
    return (
        f"FLOOR((CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) * 1000000.0)"
        " / 1000000.0"
    )


@register(
    "market_share",
    f"""
    SELECT o_year,
           {_sql_share("SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol_fixed ELSE 0 END)",
                       "SUM(vol_fixed)")} AS mkt_share,
           ROUND(SUM(vol_fixed) / 1000000.0, 2) AS total_volume
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               n1.n_name AS supp_nation,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT) AS vol_fixed
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_5's share of STANDARD-part volume sold "
    "into ASIA, per order year.  Eight-table join where every dim "
    "(customer-side nation+region, supplier+nation, part) broadcasts and "
    "lineitem ⨝ orders is the single big shuffle; the share is a "
    "conditional-over-total ratio computed from exact fixed-point sums "
    "(see _share — floor-truncation, never ROUND(double)).",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    vol_fixed = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000)
    ).cast("long")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rkey") == region["r_regionkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.col("supp_nation"),
            vol_fixed.alias("vol_fixed"),
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("vol_fixed")).otherwise(
            F.lit(0)
        )
    )
    den = F.sum(F.col("vol_fixed"))
    return (
        joined.groupBy("o_year")
        .agg(
            _share(num, den).alias("mkt_share"),
            F.round(den / F.lit(1000000.0), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


@register(
    "product_profit",
    f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           {sql_money_sum('l.l_extendedprice * (1 - l.l_discount)'
                          ' - 0.6 * p.p_retailprice * l.l_quantity')} AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="TPC-H Q9 shape (adapted: no partsupp table in testdata, so "
    "supply cost is modeled as 60% of p_retailprice): profit on red parts "
    "by supplier nation and order year.  part/supplier/nation broadcast; "
    "the p_name prefix filter prunes the broadcast side BEFORE the join "
    "so only matching lineitem rows survive into the one big shuffle "
    "(lineitem ⨝ orders).",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (
        F.lit(1) - F.col("l_discount")
    ) - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(money_sum(profit).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: priority mix by shipping-delay bucket
# ---------------------------------------------------------------------------


@register(
    "shipping_delay_priority",
    """
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 'LATE'
                WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
                ELSE 'FAST' END AS delay_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q12 shape (adapted: no l_shipmode/commitdate in testdata — "
    "the group key is a derived ship-delay bucket instead of shipmode): "
    "did late shipments skew toward low-priority orders?  One big shuffle "
    "(lineitem ⨝ orders on the order key), conditional counts, 3-row "
    "output.  The date filter prunes the lineitem scan; the CASE runs "
    "post-join (it needs both sides).",
)
def q_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            F.lit("LATE"),
        )
        .when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            F.lit("SLOW"),
        )
        .otherwise(F.lit("FAST"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("delay_bucket")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share per month
# ---------------------------------------------------------------------------


@register(
    "promo_revenue",
    f"""
    SELECT month_us,
           {_sql_share("SUM(CASE WHEN p_type = 'PROMO' THEN rev_fixed ELSE 0 END)",
                       "SUM(rev_fixed)")} AS promo_share,
           ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN rev_fixed ELSE 0 END)
                 / 1000000.0, 2) AS promo_rev
    FROM (
        SELECT epoch_us(date_trunc('month', l.l_shipdate)) AS month_us,
               p.p_type,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT) AS rev_fixed
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY month_us
    ORDER BY month_us
    """,
    doc="TPC-H Q14 shape: what fraction of each month's revenue came from "
    "PROMO-type parts.  lineitem ⨝ broadcast part (no shuffle on the "
    "fact), grouped by truncated ship month (compared as epoch-µs, per "
    "the timestamp convention), share via exact fixed-point sums + "
    "floor-truncation.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev_fixed = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000)
    ).cast("long")
    promo_fixed = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_fixed")).otherwise(F.lit(0))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            F.unix_micros(F.date_trunc("month", F.col("l_shipdate"))).alias(
                "month_us"
            ),
            "p_type",
            rev_fixed.alias("rev_fixed"),
        )
        .groupBy("month_us")
        .agg(
            _share(promo_fixed, F.sum(F.col("rev_fixed"))).alias("promo_share"),
            F.round(promo_fixed / F.lit(1000000.0), 2).alias("promo_rev"),
        )
        .orderBy("month_us")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-acctbal supplier per part (min-per-group + dims)
# ---------------------------------------------------------------------------


@register(
    "min_cost_supplier",
    """
    SELECT p.p_partkey, s.s_name, s.s_acctbal, n.n_name
    FROM (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 25 AND r.r_name = 'EUROPE'
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY p.p_partkey ORDER BY s.s_acctbal, s.s_suppkey
    ) = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 20
    """,
    doc="TPC-H Q2 shape (adapted: no partsupp table — the part↔supplier "
    "relation is the DISTINCT (l_partkey, l_suppkey) projection of the "
    "fact, and s_acctbal stands in for ps_supplycost): the best-terms "
    "supplier per size-25 part within EUROPE.  The correlated "
    "min-subquery is decorrelated into a row_number window partitioned "
    "by the high-cardinality part key with a deterministic (acctbal, "
    "suppkey) tiebreak; supplier/nation/region/part all broadcast; the "
    "only shuffles are the pair-distinct and the window, both on partkey.",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal"), F.col("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), pairs["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("p_partkey", "s_name", "s_acctbal", "n_name")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: parts worth more than a fraction of global revenue
# ---------------------------------------------------------------------------


@register(
    "important_parts",
    """
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000)
                             AS BIGINT)) AS BIGINT) AS rev_fixed
        FROM lineitem
        GROUP BY l_partkey
    )
    -- revenue truncated to cents via exact integer division:
    -- ROUND(double, 2) is engine-defined at half-cent boundaries and
    -- DID diverge in the last cent at sf0.1
    SELECT l_partkey, (rev_fixed // 10000) / 100.0 AS revenue
    FROM pr, (SELECT CAST(SUM(rev_fixed) AS BIGINT) AS tot_fixed,
                     COUNT(*) AS np FROM pr) t
    WHERE rev_fixed * np * 4 > 5 * tot_fixed
    ORDER BY revenue DESC, l_partkey
    """,
    doc="TPC-H Q11 shape (adapted: value = lineitem revenue instead of "
    "partsupp stock value): parts earning more than 1.25x the MEAN part "
    "revenue — a scale-stable threshold (a fixed fraction-of-total "
    "cutoff empties as the part count grows).  The global scalar is a "
    "1-row aggregate OVER THE "
    "ALREADY-REDUCED per-part relation (not a second fact scan) joined "
    "back as a broadcast cross join — the Q22 pattern; the threshold "
    "compare is exact LONG fixed-point arithmetic on both engines "
    "(rev*1000 > tot, no division).",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev_fixed = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000)
    ).cast("long")
    pr = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(rev_fixed).alias("rev_fixed"))
    )
    # persist: pr feeds both the global scalar and the filter — without it
    # Spark re-runs the fact scan + agg twice (no common-subplan reuse)
    pr = persist_latest(pr, "tpch.important_parts_pr")
    tot = pr.agg(
        F.sum("rev_fixed").alias("tot_fixed"),
        F.count(F.lit(1)).alias("np"),
    )
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(
            F.col("rev_fixed") * F.col("np") * F.lit(4)
            > F.lit(5) * F.col("tot_fixed")
        )
        .select(
            "l_partkey",
            (F.expr("rev_fixed DIV 10000") / F.lit(100.0)).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_partkey"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety per part attribute group
# ---------------------------------------------------------------------------


@register(
    "supplier_part_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (9, 19, 29, 39, 49)
      AND ps.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (adapted: part↔supplier pairs from the fact; "
    "negative-acctbal suppliers stand in for the complaints exclusion): "
    "how many distinct suppliers serve each surviving (brand, type, "
    "size) group.  The NOT IN is a broadcast LEFT ANTI against a "
    "6-row exclusion list; part filters prune the broadcast side; the "
    "single COUNT(DISTINCT) plans expand-free as a two-phase aggregate.  "
    "The oracle's explicit `SELECT DISTINCT l_partkey, l_suppkey` "
    "pre-dedup is deliberately NOT mirrored: COUNT(DISTINCT) dedups in "
    "its own partial aggregate, so a separate distinct would add a "
    "second full-width shuffle of the fact pairs for nothing.  Instead "
    "the broadcast joins run FIRST (the part filters keep ~10% of "
    "parts), so the one shuffle carries only surviving rows.",
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_supp = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(9, 19, 29, 39, 49)
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == bad_supp["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: revenue locked in small-quantity lines
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue",
    """
    WITH pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT))
                    AS BIGINT) AS sum_q_fixed,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT ROUND(SUM(CAST(ROUND(l.l_extendedprice * 1000000) AS BIGINT))
                 / 7000000.0, 2) AS avg_weekly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE 2 * CAST(ROUND(l.l_quantity * 1000000) AS BIGINT) * pa.cnt
          < pa.sum_q_fixed
    """,
    doc="TPC-H Q17 shape: revenue of lines whose quantity is below half "
    "their part's average.  The oracle states the correlated AVG as a "
    "fact ⨝ agg(fact) self-join; the Spark plan uses the strictly "
    "cheaper equivalent — per-part sum/count as WINDOW aggregates over "
    "the high-cardinality part key: ONE scan and ONE shuffle instead of "
    "two of each (measured 1.36 s → the join form's second scan + "
    "double exchange dominated).  The below-half-average predicate is "
    "exact integer arithmetic: qty*2*cnt < sum(qty), no division, no "
    "float average (NOTES.md exactness rule 2).",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q_fixed = F.round(F.col("l_quantity") * F.lit(1000000)).cast("long")
    w = Window.partitionBy("l_partkey")
    return (
        li.select(
            q_fixed.alias("q_fixed"),
            F.round(F.col("l_extendedprice") * F.lit(1000000))
            .cast("long")
            .alias("price_fixed"),
            F.sum(q_fixed).over(w).alias("sum_q_fixed"),
            F.count(F.lit(1)).over(w).alias("cnt"),
        )
        .filter(
            F.lit(2) * F.col("q_fixed") * F.col("cnt") < F.col("sum_q_fixed")
        )
        .agg(
            F.round(
                F.sum(F.col("price_fixed")) / F.lit(7000000.0), 2
            ).alias("avg_weekly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers holding an outsized share of a part's volume
# ---------------------------------------------------------------------------


@register(
    "dominant_part_suppliers",
    """
    WITH sq AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT))
                    AS BIGINT) AS qty_fixed
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    pt AS (
        SELECT l_partkey, CAST(SUM(qty_fixed) AS BIGINT) AS tot_fixed
        FROM sq GROUP BY 1
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM sq
    JOIN pt ON pt.l_partkey = sq.l_partkey
    JOIN part p ON p.p_partkey = sq.l_partkey AND p.p_name LIKE 'red%'
    JOIN supplier s ON s.s_suppkey = sq.l_suppkey
    WHERE 2 * sq.qty_fixed > pt.tot_fixed
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape (adapted: 'availqty surplus' becomes 'shipped "
    "more than half of a red part's 1997 volume'): suppliers dominating "
    "any single part's supply.  Hierarchical aggregation — the per-part "
    "total reduces the ALREADY-AGGREGATED (part, supplier) relation, "
    "never the fact twice; the join back is co-partitioned on partkey; "
    "the share test is exact LONG arithmetic (2*q > tot); DISTINCT "
    "collapses multi-part winners (the semi-join of the original).",
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    q_fixed = F.round(F.col("l_quantity") * F.lit(1000000)).cast("long")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(q_fixed).alias("qty_fixed")
    )
    # persist: sq feeds both the per-part rollup and the join-back
    sq = persist_latest(sq, "tpch.top_supplier_sq")
    pt = sq.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty_fixed").alias("tot_fixed")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load(spark, sf_dir, "supplier")
    return (
        sq.join(pt, sq["l_partkey"] == pt["pt_partkey"])
        .filter(F.lit(2) * F.col("qty_fixed") > F.col("tot_fixed"))
        .join(F.broadcast(part), sq["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), sq["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Full outer join: reconcile two aggregated sides with one-sided rows
# ---------------------------------------------------------------------------


@register(
    "nation_wealth_balance",
    """
    WITH c AS (
        SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS rich_customers
        FROM customer WHERE c_acctbal > 9900 GROUP BY 1
    ),
    s AS (
        SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS rich_suppliers
        FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.rich_customers, 0) AS rich_customers,
           COALESCE(s.rich_suppliers, 0) AS rich_suppliers,
           CASE WHEN c.nk IS NULL THEN 'supplier_only'
                WHEN s.nk IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
    doc="FULL OUTER JOIN coverage: per-nation counts of high-balance "
    "customers vs high-balance suppliers, where each side genuinely has "
    "nations the other lacks (the thresholds are chosen so the result "
    "carries customer-only, supplier-only AND both rows — COALESCE keys, "
    "zero-filled counts, presence label).  Both inputs are ALREADY "
    "REDUCED per-nation aggregates before the join, so the full-outer "
    "shuffle moves at most 2·|nations| rows at any fact scale — the "
    "reconciliation-report shape (same keys, two systems, who's "
    "missing where).",
)
def q_nation_wealth_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("rich_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("rich_suppliers"))
    )
    return (
        c.join(s, c["c_nk"] == s["s_nk"], "full_outer")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
            F.coalesce(F.col("rich_customers"), F.lit(0)).cast("long").alias(
                "rich_customers"
            ),
            F.coalesce(F.col("rich_suppliers"), F.lit(0)).cast("long").alias(
                "rich_suppliers"
            ),
            F.when(F.col("c_nk").isNull(), F.lit("supplier_only"))
            .when(F.col("s_nk").isNull(), F.lit("customer_only"))
            .otherwise(F.lit("both"))
            .alias("presence"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Analytic-function family: percent_rank + ntile within partitions
# ---------------------------------------------------------------------------


@register(
    "customer_balance_deciles",
    """
    SELECT c_nationkey,
           c_custkey,
           c_acctbal,
           percent_rank() OVER w AS pct_rank,
           CAST(ntile(10) OVER w AS INT) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_nationkey, c_acctbal, c_custkey
    """,
    doc="percent_rank + ntile coverage: account-balance standing within "
    "each nation.  Both functions are rank-based — percent_rank is "
    "(rank-1)/(n-1) (two exact integers, one IEEE division) and ntile "
    "splits by the standard ceil-then-floor rule — so with a unique "
    "(acctbal, custkey) ordering both engines emit identical values.  "
    "The window partitions on the nation key; for GLOBAL quantiles at "
    "scale use the two-pass histogram (pricing_percentiles) — a global "
    "ORDER BY window would serialize on one reducer.",
)
def q_customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.percent_rank().over(w).alias("pct_rank"),
            F.ntile(10).over(w).alias("decile"),
        )
        .orderBy("c_nationkey", "c_acctbal", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Market-basket pair mining: co-purchased parts per order
# ---------------------------------------------------------------------------


@register(
    "market_basket_pairs",
    """
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket co-occurrence: which part pairs ship in the same "
    "order — the candidate-generation step of association-rule mining.  "
    "The oracle states it as the dedup + self-join; the Spark plan uses "
    "the one-shuffle equivalent: collect each order's DISTINCT sorted "
    "basket (one groupBy on the order key), then generate the strict "
    "upper-triangle pairs in an Arrow-batched numpy kernel that ALSO "
    "partially aggregates pair counts per batch (np.unique on packed "
    "64-bit keys), so the only post-kernel exchange carries distinct "
    "(pair, partial-count) rows, not the raw pair fan-out.  An earlier "
    "interpreted transform/slice/explode chain cost ~2 s of the 2.7 s "
    "entry at sf0.1; the kernel replays the same strict a<b pair set "
    "bit-exactly (sorted distinct baskets on both paths).",
)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    baskets = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )

    # the packed (part_a<<32 | part_b) key rides through the aggregation
    # exchange and is unpacked afterwards — one 8-byte key instead of two.
    out_schema = StructType(
        [
            StructField("pair", LongType()),
            StructField("n", LongType()),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        # partkeys fit in 32 bits at any TPC-H SF this repo targets; the
        # packed (a<<32 | b) key makes the partial count a single
        # np.unique.  Guarded below so a larger key space fails loud.
        for pdf in batches:
            col = pdf["parts"]
            if not len(col):
                continue
            lens = np.fromiter(map(len, col), dtype=np.int64, count=len(col))
            flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in col])
            if flat.max() >= (1 << 31):
                raise ValueError("partkey exceeds packed-pair key space")
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            keys = []
            for n_items in np.unique(lens):
                # gather every basket of this length into a (rows, n_items)
                # matrix in one fancy-index — no per-row Python work.
                s = starts[lens == n_items]
                mat = flat[s[:, None] + np.arange(n_items)[None, :]]
                ia, ib = np.triu_indices(int(n_items), k=1)
                # baskets are sorted distinct, so column ia < column ib
                # everywhere — the strict upper triangle IS the a<b pair set.
                keys.append(((mat[:, ia] << 32) | mat[:, ib]).ravel())
            u, cnt = np.unique(np.concatenate(keys), return_counts=True)
            yield pd.DataFrame({"pair": u, "n": cnt.astype(np.int64)})

    pairs = baskets.select("parts").mapInPandas(kernel, out_schema)
    # pair keys are near-unique (random baskets), so the agg exchange is
    # small in BYTES but large in KEYS — AQE's size-based coalescing folds
    # it to one reducer and the final hash agg serializes.  The explicit
    # repartition pins reducer parallelism to the session's shuffle width.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        pairs.repartition(n_shuffle, "pair")
        .groupBy("pair")
        .agg(F.sum("n").alias("n_orders"))
        .select(
            F.shiftright("pair", 32).alias("part_a"),
            F.col("pair").bitwiseAND(F.lit(0xFFFFFFFF)).alias("part_b"),
            "n_orders",
        )
        .orderBy(F.col("n_orders").desc(), F.col("part_a"), F.col("part_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Cohort LTV triangle: cumulative revenue by signup cohort and age
# ---------------------------------------------------------------------------


@register(
    "customer_ltv_triangle",
    """
    WITH first_order AS (
        SELECT o_custkey,
               MIN(year(o_orderdate) * 12 + (month(o_orderdate) - 1))
                   AS cohort_m
        FROM orders GROUP BY 1
    ),
    cell AS (
        SELECT f.cohort_m,
               (year(o.o_orderdate) * 12 + (month(o.o_orderdate) - 1))
                   - f.cohort_m AS age_months,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT))
                    AS BIGINT) AS rev_f
        FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(cohort_m // 12 AS VARCHAR) || '-' ||
               lpad(CAST(cohort_m % 12 + 1 AS VARCHAR), 2, '0')
               AS cohort_month,
           CAST(age_months AS BIGINT) AS age_months,
           n_orders,
           ROUND(rev_f / 1000000.0, 2) AS revenue,
           ROUND(CAST(SUM(rev_f) OVER (PARTITION BY cohort_m
                                       ORDER BY age_months) AS BIGINT)
                 / 1000000.0, 2) AS cum_revenue
    FROM cell
    ORDER BY cohort_month, age_months
    """,
    doc="Cohort LTV triangle — the finance-side complement of "
    "events_cohort_retention: customers are grouped by FIRST-order "
    "month, every later order lands in its (cohort, age-in-months) "
    "cell, and the running sum down each cohort row is the cumulative "
    "lifetime value curve an LTV:CAC model reads off.  Month math is "
    "explicit integer year*12+month arithmetic (no engine-defined "
    "month-diff semantics), revenue cells are fixed-point LONG sums "
    "and the CUMULATIVE sum runs over those LONGs before the one "
    "final scaling — exact at any parallelism in both engines.  Plan: "
    "first-order aggregate, one fact join on the customer key, a "
    "(cohort, age)-keyed aggregate with map-side partials, and a "
    "window over the tiny triangle relation.",
)
def q_customer_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    m = F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)
    first = orders.groupBy("o_custkey").agg(F.min(m).alias("cohort_m"))
    cell = (
        orders.join(first, on="o_custkey")
        .select(
            "cohort_m",
            (m - F.col("cohort_m")).alias("age_months"),
            F.round(F.col("o_totalprice") * 1_000_000)
            .cast("long")
            .alias("v_f"),
        )
        .groupBy("cohort_m", "age_months")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("v_f").cast("long").alias("rev_f"),
        )
    )
    w = Window.partitionBy("cohort_m").orderBy("age_months")
    return (
        cell.withColumn("cum_f", F.sum("rev_f").over(w).cast("long"))
        .select(
            F.concat(
                (F.col("cohort_m") / 12).cast("int").cast("string"),
                F.lit("-"),
                F.lpad(
                    ((F.col("cohort_m") % 12) + 1).cast("string"), 2, "0"
                ),
            ).alias("cohort_month"),
            F.col("age_months").cast("long").alias("age_months"),
            "n_orders",
            F.round(F.col("rev_f") / 1_000_000.0, 2).alias("revenue"),
            F.round(F.col("cum_f") / 1_000_000.0, 2).alias("cum_revenue"),
        )
        .orderBy("cohort_month", "age_months")
    )
