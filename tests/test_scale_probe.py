"""Scale probes for the 100x claim: run the heaviest paths on a ~10x
synthetic blow-up of the real testdata (disjoint copies with id offsets —
no new fixtures) and assert the LINEAR-SCALING invariants that a plan
which survives 100x must have:

- output cardinality exactly 10x (no cross-copy pair/cluster explosion:
  a super-linear candidate space is how banded LSH dies at scale);
- the widest shuffle key group (LSH bucket) does NOT grow with the data —
  hotspot width is set by data similarity, not corpus size;
- post-shuffle rows spread across partitions (no single-reducer funnel);
- verify candidate mass (Σ C(bucket_width, 2) over buckets — the rows
  the bucket join emits) grows sub-quadratically.  Deterministic
  operation-count bounds replaced the original wall-clock probes
  (ADVICE r11: timing bounds flake under CI load); they catch the same
  accidental O(n^2) re-shapes without the noise.

The copies are made pairwise-disjoint by prefixing every word with a
copy tag (shingle/token spaces never intersect across copies), so each
copy reproduces the original's near-dup structure exactly once.
"""

from __future__ import annotations

from functools import reduce

import pytest

from pyspark.sql import functions as F

from data_engineering_etl_demo_spark.catalog import load
from data_engineering_etl_demo_spark.operators import dedup as D
from data_engineering_etl_demo_spark.operators import text as X
from data_engineering_etl_demo_spark.operators.graph import connected_components

SF_DIR = "/root/testdata/sf0.01"
_OFFSET = 1_000_000
_COPIES = 10


def _tag_words(tag: str):
    """One-ARG lambda factory for F.transform.  The obvious spelling
    `lambda w, c=c: concat(lit(f"c{c}x"), w)` is a trap: PySpark binds a
    two-parameter lambda (defaults included) as (element, INDEX), so `c`
    becomes the index Column and the f-string bakes its repr —
    `cColumn<'y_2'>x` — into the tag.  Every copy then shares the same
    word tokens ("x<word>") and differs only in the lambda-variable
    counter digit, so copy disjointness held only for SHINGLE-space ops
    (the counter digit lands in every shingle) and only by the accident
    that PySpark's internal counter differs per built expression.  A
    closure over a plain string makes the documented per-word tag real."""
    return lambda w: F.concat(F.lit(tag), w)


def _docs_x(spark, copies: int):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(c * _OFFSET)).alias("doc_id"),
            F.array_join(
                F.transform(X.words(F.col("text")), _tag_words(f"c{c}x")),
                " ",
            ).alias("text"),
        )
        for c in range(copies)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts).repartition(
        spark.sparkContext.defaultParallelism
    )


def _events_x(spark, copies: int):
    ev = load(spark, SF_DIR, "events").select("event_id", "ts", "user_id")
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(c * _OFFSET)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(c * _OFFSET)).alias("user_id"),
        )
        for c in range(copies)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@pytest.fixture(scope="module")
def minhash_runs(spark):
    """(pairs_count, max_bucket, candidate_mass) for 1x and 10x."""

    def run(copies):
        docs = _docs_x(spark, copies)
        n_pairs = D.minhash_near_dup(docs, threshold=0.5).count()
        sh = D.explode_shingles(docs, "doc_id", "text")
        buckets = D.lsh_band_buckets(
            D.minhash_signature_components(sh, "doc_id"), "doc_id"
        )
        # max_bucket: widest shuffle group.  cand_mass: Σ C(width, 2)
        # over (band, bucket) — the exact-Jaccard verify rows the bucket
        # join emits, the deterministic operation-count proxy that
        # replaced both wall-clock probes (ADVICE r11).
        row = (
            buckets.groupBy("band", "bucket")
            .count()
            .agg(
                F.max("count").alias("max_bucket"),
                F.sum(
                    (F.col("count") * (F.col("count") - 1) / 2).cast("long")
                ).alias("cand_mass"),
            )
            .first()
        )
        return n_pairs, row["max_bucket"], row["cand_mass"]

    one = run(1)
    ten = run(_COPIES)
    return one, ten


def test_minhash_pairs_scale_linearly(minhash_runs):
    (p1, _, _), (p10, _, _) = minhash_runs
    assert p1 > 0, "base corpus must contain near-dups for this probe"
    assert p10 == _COPIES * p1, (
        f"near-dup pairs must scale 1:1 with disjoint copies "
        f"(got {p10} vs {_COPIES}x{p1}) — super-linear growth means "
        "cross-copy bucket collisions, the scale-killer shape"
    )


def test_minhash_bucket_width_does_not_grow(minhash_runs):
    # Each copy re-rolls the hash draw (its word space is tagged), so the
    # widest bucket varies a little copy to copy — the invariant is that
    # it tracks similarity structure (±copy noise), NOT corpus size: 10x
    # data must stay far from 10x width.
    (_, b1, _), (_, b10, _) = minhash_runs
    assert b10 <= 2 * b1, (
        f"widest LSH bucket grew {b1} -> {b10} under 10x disjoint data; "
        "bucket width must be set by similarity structure, not corpus size"
    )


def test_minhash_candidate_mass_subquadratic(minhash_runs):
    """Deterministic replacement for the wall-clock probe, same rationale
    as the simhash conversion (ADVICE r11: timing bounds flake under CI
    load).  The verify workload the banded bucket join emits —
    Σ C(bucket_width, 2) over (band, bucket) — is a pure function of
    the deterministic signatures.  Per-copy signatures re-roll (tagged
    word spaces), so per-copy mass varies statistically; factor-2 slack
    on the 10x-linear bound (the bucket-width test's convention) still
    fails any O(n^2) cross-copy candidate explosion outright."""
    (_, _, cand1), (_, _, cand10) = minhash_runs
    assert cand1 > 0, "base corpus must emit verify candidates"
    assert cand10 <= 2 * _COPIES * cand1, (
        f"bucket-join verify candidate mass grew {cand1} -> {cand10} "
        f"under {_COPIES}x disjoint copies (bound {2 * _COPIES} x) — "
        "super-linear candidate growth is how banded LSH dies at scale"
    )


def test_dup_clusters_scale_linearly(spark):
    def clusters(copies):
        pairs = D.minhash_near_dup(_docs_x(spark, copies), threshold=0.5)
        comp = connected_components(pairs, src="id_a", dst="id_b")
        return comp.select("component").distinct().count()

    c1 = clusters(1)
    c10 = clusters(_COPIES)
    assert c1 > 0
    assert c10 == _COPIES * c1


def test_session_window_scales_linearly_and_spreads(spark):
    gap_s = 6 * 3600
    base = _events_x(spark, 1)

    def sessions(ev):
        return (
            ev.filter(F.col("user_id").isNotNull())
            .groupBy(
                "user_id", F.session_window(F.col("ts"), f"{gap_s} seconds")
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    n1 = sessions(base).count()
    big = sessions(_events_x(spark, _COPIES))
    n10 = big.count()
    assert n10 == _COPIES * n1
    # Post-shuffle spread: the session aggregate must hash user_id evenly
    # across reducers — no single-reducer funnel.  AQE's size coalescing
    # legitimately merges these tiny local partitions into one, so switch
    # it off for the observation: what matters at 100x is the RAW hash
    # distribution the coalescer would start from.
    conf = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        sizes = [
            r["n"]
            for r in sessions(_events_x(spark, _COPIES))
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
    finally:
        spark.conf.set(conf, old)
    assert len(sizes) > 1, "session agg collapsed to a single partition"
    assert max(sizes) < 0.5 * sum(sizes), (
        f"one partition holds {max(sizes)} of {sum(sizes)} session rows"
    )


def test_market_basket_pairs_scale_linearly(spark):
    """10x disjoint order copies must produce exactly 10x basket pairs —
    the array-side pair generation is bounded by basket size, never by
    catalog or order count (a cross-order pair space would blow up here)."""
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")

    def pairs_count(copies):
        parts = [
            li.select(
                (F.col("l_orderkey") + F.lit(c * _OFFSET)).alias("l_orderkey"),
                "l_partkey",
            )
            for c in range(copies)
        ]
        df = reduce(lambda a, b: a.unionByName(b), parts)
        baskets = (
            df.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
            .filter(F.size("parts") >= 2)
        )
        return baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            )
        ).count()

    assert pairs_count(10) == 10 * pairs_count(1)


def test_rolling_wau_scales_linearly(spark):
    """10x disjoint user copies must multiply every day's WAU by exactly
    10 — the dedup-then-bounded-interval-join recipe scales with
    |user-days|, and disjoint users can never collapse across copies."""
    ev = _events_x(spark, 1)
    ev10 = _events_x(spark, 10)

    def wau(df):
        ud = (
            df.filter(F.col("user_id").isNotNull())
            .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
            .distinct()
        )
        days = ud.select(F.col("day").alias("d_day")).distinct()
        return {
            r["d_day"]: r["wau"]
            for r in days.join(
                ud,
                (ud["day"] <= F.col("d_day"))
                & (ud["day"] > F.col("d_day") - F.expr("INTERVAL 7 DAYS")),
            )
            .groupBy("d_day")
            .agg(F.count_distinct(F.col("user_id")).alias("wau"))
            .collect()
        }

    w1, w10 = wau(ev), wau(ev10)
    assert set(w1) == set(w10)
    for day, n in w1.items():
        assert w10[day] == 10 * n


def test_triangle_census_scales_linearly(spark):
    """Disjoint copies must multiply edges/wedges/triangles exactly —
    any cross-copy wedge or triangle means the orientation or the
    closure join leaks candidates across unrelated data."""
    from data_engineering_etl_demo_spark.operators.graph import triangle_census

    def census(copies):
        pairs = D.minhash_near_dup(_docs_x(spark, copies), threshold=0.5)
        return tuple(triangle_census(pairs).collect()[0])

    e1, w1, t1 = census(1)
    e10, w10, t10 = census(_COPIES)
    assert e1 > 0
    assert (e10, w10, t10) == (_COPIES * e1, _COPIES * w1, _COPIES * t1)


def test_pagerank_is_copy_invariant(spark):
    """Each disjoint copy must reproduce the original's rank vector
    exactly: PageRank mass cannot leak between unconnected components...
    except through the global teleport term, which scales as 1/N — so
    compare the RELATIVE rank ordering and the per-copy multiset of
    rank values after rescaling the teleport analytically."""
    from data_engineering_etl_demo_spark.operators.graph import pagerank

    def ranks(copies):
        pairs = D.minhash_near_dup(_docs_x(spark, copies), threshold=0.5)
        return pagerank(pairs, iters=2).collect()

    r1 = ranks(1)
    r10 = ranks(_COPIES)
    assert len(r10) == _COPIES * len(r1)
    # with 10x nodes every teleport/initial term shrinks 10x; ranks are
    # linear in them, so each copy's ranks are EXACTLY the 1x ranks
    # divided by 10 (up to integer-division remainders, bounded by the
    # number of integer-div steps: <= 4 per rank unit per iteration)
    r1_map = {r["doc_id"]: r["rank_fp"] for r in r1}
    for row in r10:
        base_id = row["doc_id"] % _OFFSET
        assert base_id in r1_map
        assert abs(row["rank_fp"] - r1_map[base_id] // 10) <= 8, (
            f"doc {row['doc_id']}: {row['rank_fp']} vs "
            f"{r1_map[base_id]} / 10 at 1x"
        )


def test_zorder_pages_scale_only_in_counts(spark, tmp_path):
    """10x row copies with IDENTICAL key values: the z-page set and every
    page's min/max must not move, only n_rows scales — zone-map quality
    (and the min-max normalization grid) is set by key distribution, not
    corpus size.  Runs the registered query itself against a duplicated
    copy of the table so the probe tracks the real implementation."""
    from functools import reduce as _red

    from data_engineering_etl_demo_spark.plans import all_specs

    spec = all_specs()["lineitem_zorder_pages"]
    base = spec.spark_fn(spark, SF_DIR)
    li = load(spark, SF_DIR, "lineitem")
    # the catalog expects single-FILE tables (footer inspection), so write
    # the duplicated copy with pyarrow, not a Spark directory write
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = _red(lambda a, b: a.unionByName(b), [li] * _COPIES).toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf), str(tmp_path / "lineitem.parquet")
    )
    pages10 = spec.spark_fn(spark, str(tmp_path))
    b = {r["z_page"]: r for r in base.collect()}
    t = {r["z_page"]: r for r in pages10.collect()}
    assert set(b) == set(t)
    for k in b:
        assert t[k]["n_rows"] == _COPIES * b[k]["n_rows"]
        for c in ("min_part", "max_part", "min_supp", "max_supp"):
            assert t[k][c] == b[k][c]


def test_bounded_hops_scales_with_disjoint_copies(spark):
    """K disjoint offset copies of a seeded graph must produce exactly K
    copies of the hop histogram — any cross-copy hop means the BFS join
    leaks labels between unrelated components."""
    from collections import Counter

    from data_engineering_etl_demo_spark.operators.graph import bounded_hops

    base_edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)]
    base_seeds = [0]
    n_ids = 10  # id space per copy (disjoint offsets)

    def histogram(copies):
        edges = [
            (a + k * n_ids, b + k * n_ids)
            for k in range(copies)
            for a, b in base_edges
        ]
        seeds = [s + k * n_ids for k in range(copies) for s in base_seeds]
        edf = spark.createDataFrame(edges, "id_a long, id_b long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "doc_id long")
        return Counter(
            r["hop"] for r in bounded_hops(edf, sdf, max_hops=3).collect()
        )

    h1 = histogram(1)
    h8 = histogram(8)
    assert sum(h1.values()) > 0
    assert h8 == Counter({hop: 8 * n for hop, n in h1.items()})


def test_ema_fold_survives_hot_key_with_bounded_batches(spark):
    """VERDICT r5 weakness 1: one bot-grade hot key (120k events on a
    single user) must flow through the EMA fold without ever
    materializing the key's history in one task.  The probe FORCES the
    bound to matter by shrinking the Arrow batch to 1k rows — the hot
    key then spans >=120 kernel batches and is correct ONLY if the
    carried (key, ema, n) state works — and checks the fold against a
    local reference recurrence."""
    from data_engineering_etl_demo_spark.plans.timeseries import (
        ema_sort_merge_fold,
    )

    hot_n = 120_000
    cold_users = 50
    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        rows = spark.range(hot_n).select(
            F.lit(7).alias("user_id"),
            (F.col("id") * 1000).alias("t"),
            F.col("id").alias("e"),
            ((F.col("id") * 37) % 9973).alias("v"),
        )
        cold = spark.range(cold_users).select(
            (F.col("id") + 100).alias("user_id"),
            F.lit(0).alias("t"),
            F.col("id").alias("e"),
            (F.col("id") % 11).alias("v"),
        )
        out = {
            r["user_id"]: (r["n_events"], r["ema_e6"])
            for r in ema_sort_merge_fold(rows.unionByName(cold)).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", saved)

    ema = 0
    for i in range(hot_n):
        v = (i * 37) % 9973
        ema = v if i == 0 else (2 * v + 8 * ema) // 10
    assert out[7] == (hot_n, ema)
    assert len(out) == 1 + cold_users
    for i in range(cold_users):
        assert out[100 + i] == (1, i % 11)


def test_split_leakage_stop_gram_guard_bounds_fanout(spark):
    """Plant ONE boilerplate 8-gram into hundreds of docs across both
    splits: with the df cap the planted gram is excluded from the join
    (pairs unchanged vs the unplanted corpus); with the cap lifted the
    same corpus explodes into thousands of cross-split pairs — the blow-up
    the guard exists to prevent at 100 TB."""
    from data_engineering_etl_demo_spark.plans.llmdata import (
        split_leakage_pairs,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    boiler = " ".join(f"boilerplate{i}" for i in range(8))
    # a doc-UNIQUE separator word between the original text and the
    # boilerplate keeps every junction gram df=1, so the ONLY new shared
    # grams are the boilerplate's own — the guard's exact target
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.col("text"),
                F.lit(" sep"),
                F.col("doc_id").cast("string"),
                F.lit(" " + boiler),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).repartition(spark.sparkContext.defaultParallelism)

    base = split_leakage_pairs(docs, persist_slot="probe.leak.base").count()
    capped = split_leakage_pairs(
        planted, persist_slot="probe.leak.capped"
    ).count()
    uncapped = split_leakage_pairs(
        planted,
        df_cap=10**9,
        min_shared=1,
        persist_slot="probe.leak.uncapped",
    ).count()

    # the planted gram is in ~250 docs >> df_cap, so the capped pipeline
    # must not see a single extra pair...
    assert capped == base
    # ...while without the cap the same corpus fans out quadratically
    # (~0.8*250 train x 0.1*250 test sharing the gram)
    assert uncapped > 50 * max(capped, 1)


def test_concentration_survives_planted_million_user_skew(spark):
    """VERDICT r6 weakness 1: the concentration report must not rank every
    user through one partition.  Plant 10**6 users — a long tail of 7
    activity levels plus a 1000-user bot head with UNIQUE volumes (worst
    case for the histogram: the head contributes one histogram row per
    user) — and check the report against an exact local computation of the
    same integer algebra.  The ordered pass is over the distinct-volume
    histogram (~1007 rows here), not the 10**6-row user relation; with the
    old per-user rank windows this probe funnels a million rows through a
    single task."""
    from data_engineering_etl_demo_spark.plans.timeseries import (
        concentration_from_volumes,
    )

    n_tail, n_head = 1_000_000 - 1_000, 1_000
    tail = spark.range(n_tail).select((F.col("id") % 7 + 1).alias("c"))
    head = spark.range(n_head).select((F.lit(5_000) + F.col("id")).alias("c"))
    row = concentration_from_volumes(tail.unionByName(head)).collect()[0]

    # exact local reference over the identical volume multiset
    vols = sorted(
        [i % 7 + 1 for i in range(n_tail)]
        + [5_000 + i for i in range(n_head)]
    )
    n, s = len(vols), sum(vols)
    ra_dot = sum((i + 1) * c for i, c in enumerate(vols))
    k1, k10 = max(n // 100, 1), max(n // 10, 1)
    top1, top10 = sum(vols[-k1:]), sum(vols[-k10:])
    assert row["n_users"] == n and row["n_events"] == s
    assert row["top1pct_share_ppm"] == top1 * 1_000_000 // s
    assert row["top10pct_share_ppm"] == top10 * 1_000_000 // s
    assert row["gini_ppm"] == max(
        2 * ra_dot * 1_000_000 // (n * s) - (n + 1) * 1_000_000 // n, 0
    )


def test_concentration_survives_all_unique_volumes(spark):
    """Adversarial worst case for the histogram form: every one of 10**6
    users has a UNIQUE volume, so the histogram has as many rows as the
    user relation and a single global cumsum window would funnel all of
    it through one task.  The two-pass distributed rank (range partition
    + within-partition cumsum + broadcast prefix offsets) must spread the
    ordered work and still reproduce the exact integer report."""
    from data_engineering_etl_demo_spark.plans.timeseries import (
        concentration_from_volumes,
    )

    n = 1_000_000
    u = spark.range(n).select((F.col("id") + 1).alias("c"))  # c = 1..n
    row = concentration_from_volumes(u).collect()[0]

    # closed forms over c = 1..n
    s = n * (n + 1) // 2
    ra_dot = n * (n + 1) * (2 * n + 1) // 6  # rank == value here
    k1, k10 = n // 100, n // 10
    top1 = s - (n - k1) * (n - k1 + 1) // 2
    top10 = s - (n - k10) * (n - k10 + 1) // 2
    assert row["n_users"] == n and row["n_events"] == s
    assert row["top1pct_share_ppm"] == top1 * 10**6 // s
    assert row["top10pct_share_ppm"] == top10 * 10**6 // s
    assert row["gini_ppm"] == max(
        2 * ra_dot * 10**6 // (n * s) - (n + 1) * 10**6 // n, 0
    )


def test_asof_join_scales_linearly_with_disjoint_copies(spark):
    """asof_join is union + ONE keyed shuffle + a running window — output
    over k disjoint key-space copies must be exactly k stacked copies of
    the base result (no cross-copy carry, no pair explosion)."""
    from data_engineering_etl_demo_spark.operators.asof import asof_join

    def build(copies):
        left = spark.range(200 * copies).select(
            (F.col("id") % F.lit(20) + (F.col("id") / 200).cast("long") * _OFFSET)
            .alias("k"),
            F.timestamp_micros((F.col("id") % 200) * 1_000_000 + 500_000)
            .alias("lts"),
            F.col("id").alias("lid"),
        )
        right = spark.range(100 * copies).select(
            (F.col("id") % F.lit(20) + (F.col("id") / 100).cast("long") * _OFFSET)
            .alias("k"),
            F.timestamp_micros((F.col("id") % 100) * 2_000_000).alias("rts"),
            (F.col("id") * 7).alias("payload"),
        )
        out = asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            payload_cols=["payload"], strict=True,
        )
        return out

    base = build(1)
    big = build(8)
    assert big.count() == 8 * base.count()  # every left row survives
    # per-copy results identical modulo the key offset: compare matched
    # payload multisets of copy 0 inside the big build vs the base build
    base_m = sorted(
        (r["lid"] % 200, r["asof_payload"]) for r in base.collect()
    )
    copy0 = big.filter(F.col("k") < _OFFSET)
    big_m = sorted(
        (r["lid"] % 200, r["asof_payload"]) for r in copy0.collect()
    )
    assert big_m == base_m


def test_interval_join_scales_linearly_and_bounds_fanout(spark):
    """Bucketed interval join: k disjoint copies give exactly k× the base
    match count, and the bucket explode is bounded by interval length /
    bucket width (never a per-key cartesian)."""
    from data_engineering_etl_demo_spark.operators.rangejoin import (
        interval_join,
    )

    def build(copies):
        pts = spark.range(300 * copies).select(
            (F.col("id") % F.lit(10) + (F.col("id") / 300).cast("long") * _OFFSET)
            .alias("k"),
            F.timestamp_micros((F.col("id") % 300) * 1_000_000).alias("pts"),
        )
        ivs = spark.range(30 * copies).select(
            (F.col("id") % F.lit(10) + (F.col("id") / 30).cast("long") * _OFFSET)
            .alias("k"),
            F.timestamp_micros((F.col("id") % 30) * 9_000_000).alias("s"),
            F.timestamp_micros((F.col("id") % 30) * 9_000_000 + 20_000_000)
            .alias("e"),
        )
        return interval_join(
            pts, ivs, key="k", point_ts="pts", start_col="s", end_col="e",
            bucket_seconds=10,
        )

    base_n = build(1).count()
    big_n = build(8).count()
    assert base_n > 0
    assert big_n == 8 * base_n


def test_preference_pairs_survives_million_doc_cohorts(spark):
    """VERDICT r7 weakness 1 follow-through: the single max_by/min_by
    aggregate must hold at 10**6 docs across 1000 cohorts with planted
    TIES at both extremes (the tiebreak path, not just the happy path).
    Layout: cohort c = doc_id % 1000, quality tier = (j // 2) * 1000 for
    the j-th doc of the cohort — every tier is a 2-doc tie, so chosen
    must be the SMALLER doc_id of the top tier and rejected the smaller
    of the bottom tier, per the oracle's rank ordering.  Closed form:
    chosen = c + 998*1000, rejected = c, gap = 499000."""
    from data_engineering_etl_demo_spark.plans.llmdata import (
        preference_pairs_from_scores,
    )

    n, k = 1_000_000, 1_000
    q = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % k).cast("string").alias("lang"),
        F.lit(0).cast("long").alias("len_bucket"),
        ((F.col("id") / k).cast("long") / 2).cast("long").alias("tier"),
    ).select(
        "doc_id", "lang", "len_bucket",
        (F.col("tier") * 1000).alias("q_e6"),
    )
    out = preference_pairs_from_scores(q)
    # plan shape: the probe must run as ONE aggregate, no rank windows
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in opt and "Join" not in opt
    rows = out.collect()
    assert len(rows) == k
    for r in rows:
        c = int(r["lang"])
        assert r["chosen_doc"] == c + 998 * k, r
        assert r["rejected_doc"] == c, r
        assert r["chosen_q_e6"] == 499_000 and r["rejected_q_e6"] == 0
        assert r["gap_e6"] == 499_000


def test_preference_pairs_matches_rank_window_reference(spark):
    """Randomized cross-check of the aggregate against a local Python
    implementation of the ORACLE's two-rank-window semantics (q_e6 DESC,
    doc_id ASC / q_e6 ASC, doc_id ASC; pair kept when chosen != rejected
    and gap >= 100000), over tie-heavy corpora — the algebraic
    equivalence claim, tested rather than argued."""
    import random

    from data_engineering_etl_demo_spark.plans.llmdata import (
        _PREF_MIN_GAP_E6,
        preference_pairs_from_scores,
    )

    for seed in (7, 23, 1009):
        rng = random.Random(seed)
        rows = [
            (
                i,
                rng.choice(["aa", "bb", "cc", "dd"]),
                rng.randrange(3),
                rng.choice([0, 50_000, 100_000, 100_000, 250_000,
                            250_000, 900_000]),  # heavy ties
            )
            for i in range(rng.randrange(150, 400))
        ]
        # local reference: rank-1 rows of both window orderings
        expect = {}
        cohorts = {}
        for doc_id, lang, bucket, q in rows:
            cohorts.setdefault((lang, bucket), []).append((doc_id, q))
        for key, docs in sorted(cohorts.items()):
            best = min(docs, key=lambda d: (-d[1], d[0]))
            worst = min(docs, key=lambda d: (d[1], d[0]))
            if (best[0] != worst[0]
                    and best[1] - worst[1] >= _PREF_MIN_GAP_E6):
                expect[key] = (best[0], worst[0], best[1], worst[1],
                               best[1] - worst[1])
        q_df = spark.createDataFrame(
            rows, "doc_id long, lang string, len_bucket long, q_e6 long"
        )
        got = {
            (r["lang"], r["len_bucket"]): (
                r["chosen_doc"], r["rejected_doc"],
                r["chosen_q_e6"], r["rejected_q_e6"], r["gap_e6"],
            )
            for r in preference_pairs_from_scores(q_df).collect()
        }
        assert got == expect, f"seed {seed}"


def test_preference_pairs_survives_adversarial_cohort_skew(spark):
    """VERDICT r8 item 7: pin the map-side-combine claim under adversarial
    skew — ONE cohort holds 99% of a 10**6-doc corpus.  A plan without
    partial aggregation would shuffle all 990k hot-cohort rows to a single
    reducer; with partial max_by/min_by each map task pre-reduces its
    partition to one struct per cohort, so the shuffle carries
    O(partitions x cohorts) rows no matter how hot the key.  Pins: (a)
    the physical plan contains the partial aggregate (map-side combine is
    real, not assumed), (b) closed-form answers for the hot cohort and
    every cold cohort."""
    from data_engineering_etl_demo_spark.plans.llmdata import (
        preference_pairs_from_scores,
    )

    n_hot, n_cold, k_cold = 990_000, 10_000, 100
    # hot cohort: doc_id in [0, 990000), all-distinct quality = doc_id
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("hot").alias("lang"),
        F.lit(0).cast("long").alias("len_bucket"),
        F.col("id").alias("q_e6"),
    )
    # 100 cold cohorts x 100 docs: cohort c = j % 100, tier = j // 100
    cold = spark.range(n_cold).select(
        (F.col("id") + n_hot).alias("doc_id"),
        (F.col("id") % k_cold).cast("string").alias("lang"),
        F.lit(0).cast("long").alias("len_bucket"),
        ((F.col("id") / k_cold).cast("long") * 10_000).alias("q_e6"),
    )
    out = preference_pairs_from_scores(hot.unionByName(cold))

    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in phys and "partial_min_by" in phys, (
        f"map-side combine missing from the physical plan:\n{phys}"
    )
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in opt and "Join" not in opt

    rows = {r["lang"]: r for r in out.collect()}
    assert len(rows) == 1 + k_cold
    h = rows["hot"]
    assert (h["chosen_doc"], h["rejected_doc"]) == (n_hot - 1, 0)
    assert (h["chosen_q_e6"], h["rejected_q_e6"]) == (n_hot - 1, 0)
    for c in range(k_cold):
        r = rows[str(c)]
        assert r["chosen_doc"] == n_hot + 99 * k_cold + c, r
        assert r["rejected_doc"] == n_hot + c, r
        assert r["gap_e6"] == 990_000, r


def test_markov_attribution_copy_invariant_and_state_space_bounded(
    spark, tmp_path
):
    """VERDICT r9 item 8: the one iterative non-CC kernel without a scale
    probe.  The Markov removal-effect plan is distributed up to the
    (src, dst) transition counts; the collect and the 12-step value
    iteration run over the FIXED channel state space, never over data.
    Two pins:

    (a) Copy-invariance: 10x disjoint user copies scale every transition
        count uniformly by 10, and the integer fixed-point probabilities
        cancel exactly — (10n * 1e6) DIV (10 * tot) == (n * 1e6) DIV tot
        — so the full output (pconv and removal effects, e9 grid) must be
        IDENTICAL to the 1x run.  Any cross-copy journey bleed (a broken
        session partition key) or a float re-shape breaks the equality.
    (b) The driver-side state space stays bounded by the channel
        vocabulary, not the corpus: #distinct (src, dst) <=
        (#channels + START) * (#channels + CONV + NULL) at both scales —
        the invariant that makes the internal collect O(1) at 100 TB.
    """
    from data_engineering_etl_demo_spark.plans import all_specs
    from data_engineering_etl_demo_spark.plans.timeseries import _MK_CHANNELS

    src_fn = all_specs()["events_markov_attribution"].src_fn
    ev = load(spark, SF_DIR, "events")

    def run(copies):
        parts = [
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(c * _OFFSET)
            ).withColumn("user_id", F.col("user_id") + F.lit(c * _OFFSET))
            for c in range(copies)
        ]
        # catalog.load reads the parquet FOOTER with pyarrow, so the
        # fixture must be a single file like the driver's testdata
        stage = tmp_path / f"mk{copies}_stage"
        reduce(lambda a, b: a.unionByName(b), parts).coalesce(1).write.parquet(
            str(stage)
        )
        part = next(stage.glob("part-*.parquet"))
        dest = tmp_path / f"mk{copies}"
        dest.mkdir()
        part.rename(dest / "events.parquet")
        out = src_fn(spark, str(dest))
        return [tuple(r) for r in out.collect()]

    one = run(1)
    ten = run(_COPIES)
    assert one == ten, (
        "Markov attribution is not copy-invariant: transition "
        "probabilities drifted under a uniform 10x count scaling — "
        f"1x={one} 10x={ten}"
    )

    # (b) state-space bound, measured on the 10x data with the SAME
    # journey construction the plan uses (30-min gaps, purchase absorbs)
    n_channels = len(_MK_CHANNELS)
    n_types = (
        load(spark, str(tmp_path / f"mk{_COPIES}"), "events")
        .filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .count()
    )
    assert n_types <= n_channels, (
        f"{n_types} non-purchase event types but only {n_channels} "
        "modeled channels — the state-space bound no longer holds"
    )
    max_pairs = (n_channels + 1) * (n_channels + 2)
    assert max_pairs < 100, "collect bound is no longer O(1)-small"


# ---------------------------------------------------------------------------
# SimHash banded near-dup under 10x disjoint copies
# ---------------------------------------------------------------------------
# SimHash differs from the MinHash probes above in one essential way:
# signatures are NOT invariant under the copy tagging (every token hash
# re-rolls), so per-copy pair COUNTS legitimately vary — "pairs == 10x"
# is the wrong invariant.  What banded Hamming search must guarantee at
# scale is:
#   (1) OUTPUT copy-locality: a chance (band, slice) bucket collision
#       across unrelated corpora may create verify work, but the
#       radius-3 xor-popcount verify must kill it — independent 60-bit
#       signatures land within Hamming 3 with probability ~3e-14;
#   (2) isolation: a copy's pair set is identical whether the copy is
#       searched alone or inside the 10x corpus (no cross-contamination
#       through the bucket join);
#   (3) bucket width tracks similarity structure plus a chance-collision
#       term that is negligible while n << 2^15 per band slice — the
#       geometry's documented ceiling (PLANS.md simhash section).


@pytest.fixture(scope="module")
def simhash_runs(spark):
    def run(copies):
        sig = D.simhash64(_docs_x(spark, copies)).cache()
        n_docs = sig.count()
        pairs = D.simhash_near_dup(sig).cache()
        n_pairs = pairs.count()
        bits = D.SIMHASH_BITS // D.SIMHASH_BANDS
        slices = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * bits)
                    .bitwiseAND(F.lit((1 << bits) - 1))
                    .alias("slice"),
                )
                for b in range(D.SIMHASH_BANDS)
            ]
        )
        # max_bucket: widest (band, slice) shuffle group.  cand_mass:
        # Σ C(width, 2) over buckets — the exact number of xor-popcount
        # verify rows the banded self-join emits, the operation-count
        # proxy behind the retired wall-clock probe (ADVICE r11).
        row = (
            sig.select(F.explode(slices).alias("bb"))
            .select("bb.band", "bb.slice")
            .groupBy("band", "slice")
            .count()
            .agg(
                F.max("count").alias("max_bucket"),
                F.sum(
                    (F.col("count") * (F.col("count") - 1) / 2).cast("long")
                ).alias("cand_mass"),
            )
            .first()
        )
        return sig, pairs, n_pairs, row["max_bucket"], row["cand_mass"], n_docs

    return run(1), run(_COPIES)


def test_simhash_pairs_are_copy_local(simhash_runs):
    (_, _, p1, _, _, _), (_, pairs10, p10, _, _, _) = simhash_runs
    assert p1 > 0, "base corpus must contain radius-3 pairs for this probe"
    cross = pairs10.filter(
        F.floor(F.col("id_a") / _OFFSET) != F.floor(F.col("id_b") / _OFFSET)
    ).count()
    assert cross == 0, (
        f"{cross} cross-copy pairs at Hamming<={D.SIMHASH_RADIUS} between "
        "token-disjoint copies — either the verify stopped filtering "
        "chance bucket collisions, or signatures are correlated across "
        "independent token spaces (the broken-tag failure this fixture "
        "fix exposed)"
    )
    assert p10 >= p1, "10x corpus lost the base copy's own pairs"


def test_simhash_copy_in_isolation_matches_copy_in_blowup(simhash_runs):
    (_, pairs1, _, _, _, _), (sig10, pairs10, _, _, _, _) = simhash_runs
    # copy 0's signatures inside the 10x corpus are byte-identical to the
    # 1x run's (deterministic md5 votes), so its pair set must be too —
    # the bucket join may not let other copies perturb it.
    alone = {(r["id_a"], r["id_b"]) for r in pairs1.collect()}
    inside = {
        (r["id_a"], r["id_b"])
        for r in pairs10.filter(
            (F.col("id_a") < _OFFSET) & (F.col("id_b") < _OFFSET)
        ).collect()
    }
    assert alone == inside, (
        f"copy-0 pair set drifted inside the 10x corpus: "
        f"{len(alone ^ inside)} symmetric-difference pairs"
    )


def test_simhash_bucket_width_tracks_structure_not_corpus(simhash_runs):
    (_, _, _, b1, _, _), (_, _, _, b10, _, _) = simhash_runs
    assert b10 <= 2 * b1, (
        f"widest (band, slice) bucket grew {b1} -> {b10} under 10x "
        "disjoint data; at n << 2^15 per slice the width must be set by "
        "similarity structure, not corpus size (the chance-collision "
        "term that DOES grow with n is owned in PLANS.md)"
    )


def test_simhash_candidate_mass_subquadratic(simhash_runs):
    """Deterministic replacement for the r11 wall-clock probe (ADVICE
    r11: under CI load or a cold JVM the 1x timing could be anomalously
    small relative to 10x, so the loose 30x timing bound was flaky).
    The quantity that timing was standing in for is the verify workload
    the banded self-join emits — Σ C(bucket_width, 2) xor-popcount rows
    over all (band, slice) buckets — and THAT is a pure function of the
    md5-deterministic signatures, so it never flakes.  Structural
    candidates scale 1:1 with disjoint copies; the only super-linear
    term is chance bucket collisions, expectation bands·C(n,2)/2^bits
    (the PLANS.md-owned quadratic term, negligible while n ≪ 2^15 per
    slice).  Budget: 10x the 1x mass plus 4x the expected chance mass
    (floor 50 rows so a tiny corpus can't make the budget vacuous)."""
    (_, _, _, _, cand1, _), (_, _, _, _, cand10, n10) = simhash_runs
    assert cand1 > 0, "base corpus must emit verify candidates"
    bits = D.SIMHASH_BITS // D.SIMHASH_BANDS
    chance = D.SIMHASH_BANDS * n10 * (n10 - 1) / 2 / (1 << bits)
    budget = _COPIES * cand1 + max(4 * chance, 50)
    assert cand10 <= budget, (
        f"banded verify candidate mass grew {cand1} -> {cand10} under "
        f"{_COPIES}x disjoint copies (budget {budget:.0f} = "
        f"{_COPIES}x structural + 4x chance-collision expectation "
        f"{chance:.0f}) — super-linear candidate growth is the O(n^2) "
        "re-shape the retired wall-clock probe was guarding against"
    )


def test_edit1_blocking_scales_linearly_in_pairs_and_candidates(
    spark, tmp_path
):
    """customers_edit1_pairs (FastSS-family substitution blocking): the
    scale quantity is the CANDIDATE mass the variant equi-join emits —
    all-pairs never materializes, so candidates (and the filtered pairs)
    must scale 1:1 with disjoint copies.  Copies are made disjoint with
    equal-LENGTH two-character tags that differ in BOTH characters
    ("aa", "bb", ...): a variant masks exactly one position, so two
    names from different copies can never share a variant (>= 1 tag
    character survives unmasked and differs) — candidate generation is
    copy-local by construction, and the levenshtein==1 residual would
    reject any cross-copy pair anyway (tag distance is 2).  Equal-length
    common-prefix tags preserve every within-copy pairwise distance, so
    each copy reproduces the base pair structure exactly."""
    from data_engineering_etl_demo_spark.plans import all_specs

    src_fn = all_specs()["customers_edit1_pairs"].src_fn
    cust = load(spark, SF_DIR, "customer")

    def stage(copies):
        parts = [
            cust.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(c * _OFFSET)
            ).withColumn(
                "c_name",
                F.concat(F.lit(chr(97 + c) * 2), F.col("c_name")),
            )
            for c in range(copies)
        ]
        st = tmp_path / f"ed{copies}_stage"
        reduce(lambda a, b: a.unionByName(b), parts).coalesce(1).write.parquet(
            str(st)
        )
        part = next(st.glob("part-*.parquet"))
        dest = tmp_path / f"ed{copies}"
        dest.mkdir()
        part.rename(dest / "customer.parquet")
        return str(dest)

    def candidates(sf_dir):
        # the blocking's candidate count, reconstructed from its public
        # shape (one \x01-masked variant per character position)
        c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
        v = c.select(
            "c_custkey",
            F.explode(F.sequence(F.lit(1), F.length("c_name"))).alias("pos"),
            F.col("c_name"),
        ).select(
            "c_custkey",
            F.concat(
                F.expr("substr(c_name, 1, pos - 1)"),
                F.lit("\x01"),
                F.expr("substr(c_name, pos + 1)"),
            ).alias("variant"),
        )
        a = v.select(F.col("c_custkey").alias("ka"), "variant")
        b = v.select(F.col("c_custkey").alias("kb"), F.col("variant").alias("vb"))
        return (
            a.join(b, a["variant"] == b["vb"])
            .filter(F.col("ka") < F.col("kb"))
            .count()
        )

    d1, d10 = stage(1), stage(_COPIES)
    one = {r["pos"]: r["n_pairs"] for r in src_fn(spark, d1).collect()}
    ten = {r["pos"]: r["n_pairs"] for r in src_fn(spark, d10).collect()}
    assert one and sum(one.values()) > 0, "base must contain edit-1 pairs"
    assert ten == {p: _COPIES * n for p, n in one.items()}, (
        f"per-position pair counts must scale exactly {_COPIES}x under "
        f"disjoint copies — 1x={one} 10x={ten}"
    )
    c1, c10 = candidates(d1), candidates(d10)
    assert c10 == _COPIES * c1, (
        f"candidate mass grew super-linearly ({c1} -> {c10}); cross-copy "
        "variant collisions mean the blocking key no longer localizes "
        "work — the quadratic shape this operator exists to avoid"
    )


def test_phash_census_scales_uniformly_with_bounded_vocabulary(
    spark, tmp_path
):
    """multimodal_phash_dedup: the census input is one 16-bit-ish row per
    image, so under a uniform 10x blow-up (id offsets only — identical
    payload bytes) the hash VOCABULARY must not grow, every count must
    scale exactly 10x, and keep_id (min doc_id per hash) must stay the
    copy-0 winner.  The offset is divisible by 3 so synth_media's
    doc_id%3 media-type cycling stays aligned per copy and each copy's
    pipeline input is bit-identical.  Growth in the phash vocabulary
    under pure duplication would mean the hash depends on something
    other than payload bytes — the property that makes the census input
    (and the final shuffle) corpus-size-independent at 100 TB."""
    from data_engineering_etl_demo_spark.plans import all_specs

    off = 1_200_000  # divisible by 3
    src_fn = all_specs()["multimodal_phash_dedup"].src_fn
    docs = load(spark, SF_DIR, "documents")

    def stage(copies):
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * off))
            for c in range(copies)
        ]
        st = tmp_path / f"ph{copies}_stage"
        reduce(lambda a, b: a.unionByName(b), parts).coalesce(1).write.parquet(
            str(st)
        )
        part = next(st.glob("part-*.parquet"))
        dest = tmp_path / f"ph{copies}"
        dest.mkdir()
        part.rename(dest / "documents.parquet")
        return str(dest)

    one = {
        r["phash"]: (r["n_images"], r["keep_id"])
        for r in src_fn(spark, stage(1)).collect()
    }
    ten = {
        r["phash"]: (r["n_images"], r["keep_id"])
        for r in src_fn(spark, stage(_COPIES)).collect()
    }
    assert one, "base census must be non-empty"
    assert set(ten) == set(one), (
        f"phash vocabulary changed under pure duplication: "
        f"{len(set(one) ^ set(ten))} symmetric-difference hashes"
    )
    bad = {
        h: (ten[h], (n * _COPIES, keep))
        for h, (n, keep) in one.items()
        if ten[h] != (n * _COPIES, keep)
    }
    assert not bad, (
        f"census rows must scale counts 10x and keep the copy-0 "
        f"min-doc_id winner; drifted: {bad}"
    )


def _stage_docs(spark, tmp_path, copies: int, label: str) -> str:
    """Tagged disjoint document copies staged as a driver-shaped
    documents.parquet (full schema; only doc_id and text move)."""
    docs = load(spark, SF_DIR, "documents")
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * _OFFSET))
        .withColumn(
            "text",
            F.array_join(
                F.transform(X.words(F.col("text")), _tag_words(f"c{c}x")),
                " ",
            ),
        )
        for c in range(copies)
    ]
    st = tmp_path / f"{label}{copies}_stage"
    reduce(lambda a, b: a.unionByName(b), parts).coalesce(1).write.parquet(
        str(st)
    )
    part = next(st.glob("part-*.parquet"))
    dest = tmp_path / f"{label}{copies}"
    dest.mkdir()
    part.rename(dest / "documents.parquet")
    return str(dest)


def test_boilerplate_ngrams_scale_as_exact_copy_union(spark, tmp_path):
    """docs_boilerplate_ngrams: corpus-level document frequency over
    tagged word 3-grams.  Gram spaces are disjoint across copies and
    dfreq is invariant under the per-copy token renaming, so the 10x
    output must be EXACTLY the 1x rows replicated per copy with offset
    ids — any drift means corpus-level dfreq leaked across copies (the
    flag threshold moving with corpus size instead of structure)."""
    from data_engineering_etl_demo_spark.plans import all_specs

    src_fn = all_specs()["docs_boilerplate_ngrams"].src_fn
    one = {
        r["doc_id"]: (r["n_shingles"], r["n_boiler"], r["boiler_frac"])
        for r in src_fn(spark, _stage_docs(spark, tmp_path, 1, "bp")).collect()
    }
    ten = {
        r["doc_id"]: (r["n_shingles"], r["n_boiler"], r["boiler_frac"])
        for r in src_fn(
            spark, _stage_docs(spark, tmp_path, _COPIES, "bp")
        ).collect()
    }
    assert one and any(v[1] > 0 for v in one.values()), (
        "base corpus must contain boilerplate grams for this probe"
    )
    expect = {
        did + c * _OFFSET: v
        for c in range(_COPIES)
        for did, v in one.items()
    }
    assert ten == expect, (
        f"boilerplate output drifted under disjoint copies: "
        f"{len(set(ten.items()) ^ set(expect.items()))} differing rows"
    )


def test_tfidf_ranking_is_corpus_size_invariant(spark, tmp_path):
    """docs_tfidf_topterms: score = tf * N / df.  Under 10x disjoint
    copies N scales 10x while every within-copy (tf, df) is preserved
    (token spaces disjoint, renaming bijective), so each copy's scores
    scale by exactly 10 and the per-document top-K ranking — the
    semantic output — must be IDENTICAL to the 1x run's (tok compared
    with the copy tag stripped; tag-prefixed tie-breaks preserve
    within-copy order).  A ranking that moved with absolute corpus size
    would mean df leaked across copies or the idf form drifted from the
    ratio.  Scores are asserted at 10x +/- 1e-12 relative (measured
    worst case: 1 ulp)."""
    from data_engineering_etl_demo_spark.plans import all_specs

    src_fn = all_specs()["docs_tfidf_topterms"].src_fn

    def strip(tok):
        return tok.split("x", 1)[1]

    one = {
        (r["doc_id"], r["rank"]): (strip(r["tok"]), r["tf"], r["df"],
                                   r["score"])
        for r in src_fn(spark, _stage_docs(spark, tmp_path, 1, "tf")).collect()
    }
    ten = {
        (r["doc_id"], r["rank"]): (strip(r["tok"]), r["tf"], r["df"],
                                   r["score"])
        for r in src_fn(
            spark, _stage_docs(spark, tmp_path, _COPIES, "tf")
        ).collect()
    }
    assert one, "base top-terms must be non-empty"
    assert len(ten) == _COPIES * len(one)
    bad = []
    for c in range(_COPIES):
        for (did, rk), (tok, tf, df, sc) in one.items():
            got = ten.get((did + c * _OFFSET, rk))
            if (
                got is None
                or got[:3] != (tok, tf, df)
                or abs(got[3] - 10 * sc) > 1e-12 * 10 * sc
            ):
                bad.append(((did, rk, c), (tok, tf, df, sc), got))
    assert not bad, (
        f"top-term ranking moved with corpus size ({len(bad)} rows); "
        f"first: {bad[:3]}"
    )
