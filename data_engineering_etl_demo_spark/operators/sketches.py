"""Deterministic distinct-count sketches (KMV and HLL) as pure Catalyst
expressions.

Spark ships approx_count_distinct (HyperLogLog++), but its estimate depends
on an engine-internal hash, so no external oracle can check it.  These
sketches rebuild the same ideas on an md5-derived 60-bit hash that every
engine computes identically, which makes even the *approximate* answers
hash-exact across Spark / DuckDB — the property this repo's correctness
gate needs — while keeping the sketch's O(k) / O(m) state per group:

- KMV (k-minimum-values): keep the k smallest hash values per group;
  distinct ≈ (k-1) · 2^60 / h_k.  Exact below k distinct values.
- HLL (raw): 64 registers, register j holds the max leading-zero rank of
  hashes landing in j; distinct ≈ α·m²·2^55 / Σ 2^(55-M_j).  The classic
  small-range linear-counting correction is deliberately omitted — it needs
  ln(), whose last ulp is libm-dependent and would break cross-engine
  bit-exactness.  Raw-estimate relative error is ~1.04/√m (≈13% at m=64).

Every arithmetic step is either exact integer math (shifts, int sums — the
register sums use 2^(55-M) so 64 registers can never overflow BIGINT) or a
fixed sequence of IEEE-754 double ops identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KMV_K = 64
HLL_M = 64  # registers; must be a power of two
_HLL_REG_BITS = 6  # log2(HLL_M)
_HASH_BITS = 60  # 15 md5 hex chars
_W_BITS = _HASH_BITS - _HLL_REG_BITS  # 54 value bits per register
# α_m for m=64 (Flajolet et al. 2007): inlined identically in the oracle SQL
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hash60(col: Column) -> Column:
    """First 15 md5 hex chars of the value as a 60-bit non-negative BIGINT —
    portable to any engine that has md5 (the DuckDB mirror rebuilds it with
    per-char shifts since DuckDB lacks conv)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """DuckDB mirror of hash60."""
    return (
        "CAST(list_sum(list_transform(range(1, 16),"
        " i -> CAST(instr('0123456789abcdef',"
        f" substr(md5(CAST({expr} AS VARCHAR)), i, 1)) - 1 AS BIGINT)"
        " << (4 * (15 - i)))) AS BIGINT)"
    )


def kmv_distinct(
    hashed: DataFrame, group_col: str, hash_col: str, k: int = KMV_K
) -> DataFrame:
    """(group, kmv_users): KMV distinct estimate per group over pre-hashed
    values.  Demo plan: distinct → per-group rank window → k-th minimum.
    At fleet scale the window over a single group key is the skew point —
    the production form computes per-partition partial k-minima first
    (mapPartitions heap) and merges k·P values per group, which this
    operator's math is unchanged by (the k smallest of the union)."""
    kth = (
        hashed.select(group_col, hash_col)
        .distinct()
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(F.col(hash_col))
            ),
        )
        .filter(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(F.max(hash_col).alias("_hk"), F.count(F.lit(1)).alias("_nh"))
    )
    return kth.select(
        group_col,
        kmv_estimate(F.col("_hk"), F.col("_nh"), k).alias("kmv_users"),
    )


def kmv_estimate(hk: Column, nh: Column, k: int = KMV_K) -> Column:
    """Closed-form KMV estimate from (k-th minimum, kept count) — exact
    count below k distinct values, (k-1)·2^60/h_k above.  Shared by the
    batch kmv_distinct and the streaming kernel's post-drain select so
    both paths apply the IDENTICAL fixed double-op sequence."""
    est = F.when(nh < k, nh.cast("double")).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(float(2**_HASH_BITS)) / hk.cast("double")
        ).cast("double")
    )
    return est.cast("long")


def sql_kmv_distinct(source: str, group_col: str, hash_expr: str, k: int = KMV_K) -> str:
    """DuckDB CTE chain mirroring kmv_distinct; SELECTs (group, kmv_users)."""
    # string→DOUBLE casts: a bare decimal literal parses as DECIMAL in
    # DuckDB (overflow + rounding hazards); strtod is correctly rounded,
    # so the parsed double equals the Python float bit-for-bit
    return f"""
        SELECT {group_col},
               CAST(CASE WHEN _nh < {k} THEN CAST(_nh AS DOUBLE)
                    ELSE floor(CAST('{float(k - 1)!r}' AS DOUBLE)
                               * CAST('{float(2 ** _HASH_BITS)!r}' AS DOUBLE)
                               / CAST(_hk AS DOUBLE)) END AS BIGINT) AS kmv_users
        FROM (
            SELECT {group_col}, max(h) AS _hk, count(*) AS _nh
            FROM (
                SELECT {group_col}, h,
                       row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
                FROM (SELECT DISTINCT {group_col}, {hash_expr} AS h FROM {source})
            ) WHERE rn <= {k}
            GROUP BY 1
        )
    """


CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 64  # counters per row; must be a power of two


def cm_coord(value: Column, j: int) -> Column:
    """Column index of ``value`` in count-min row ``j``: a seeded 60-bit
    md5 hash reduced mod CM_WIDTH (hash60 is non-negative, so ``%`` is safe
    in both engines)."""
    return (
        hash60(F.concat(F.lit(f"cm{j}:"), value.cast("string"))) % CM_WIDTH
    ).cast("long")


def cm_estimates(rows: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, key, cm_n): count-min sketch frequency estimate for every
    distinct key, per group.

    The sketch is DEPTH×WIDTH integer counters per group — O(1) state no
    matter how many distinct keys flow through, mergeable by elementwise
    add (so map-side partial aggregation applies), the property that makes
    it the heavy-hitters structure at 100 TB where a full per-key count
    would itself be a giant shuffle.  cm_n >= true count always (collisions
    only ever inflate), with the usual ~N·e/WIDTH error bound.  Every
    counter is an exact integer sum over deterministic md5 coordinates, so
    the estimate — error and all — is bit-identical across engines."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), cm_coord(F.col(key_col), j).alias("c")
                )
                for j in range(CM_DEPTH)
            ]
        )
    )
    ex = rows.select(
        group_col, key_col, coords.alias("jc")
    ).select(group_col, key_col, F.col("jc.j").alias("j"), F.col("jc.c").alias("c"))
    sketch = ex.groupBy(group_col, "j", "c").agg(F.count(F.lit(1)).alias("_cnt"))
    keys = ex.distinct()
    return (
        keys.join(sketch, on=[group_col, "j", "c"])
        .groupBy(group_col, key_col)
        .agg(F.min("_cnt").alias("cm_n"))
    )


def cm_estimates_from_counts(
    counts: DataFrame, group_col: str, key_col: str, n_col: str
) -> DataFrame:
    """(group, key, cm_n): cm_estimates computed from a PRE-AGGREGATED
    (group, key, n) relation instead of raw occurrence rows.

    Every sketch counter is an integer sum over rows hashing to its
    (j, c) coordinate, so feeding each distinct key once with weight n
    yields bit-identical counters to feeding n raw rows — but the
    4-way coordinate explode and its shuffle now run over |distinct
    keys| rows, not |occurrences| (guide §2.2: pre-aggregate before
    the expensive expansion).  Callers that also need the exact count
    read it off the same logical relation (each consuming subtree still
    plans its own pruned scan + partial aggregate, but those shuffle
    distinct-key partials, not occurrences)."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), cm_coord(F.col(key_col), j).alias("c")
                )
                for j in range(CM_DEPTH)
            ]
        )
    )
    ex = counts.select(group_col, key_col, n_col, coords.alias("jc")).select(
        group_col,
        key_col,
        n_col,
        F.col("jc.j").alias("j"),
        F.col("jc.c").alias("c"),
    )
    sketch = ex.groupBy(group_col, "j", "c").agg(
        F.sum(n_col).cast("long").alias("_cnt")
    )
    return (
        ex.select(group_col, key_col, "j", "c")
        .join(sketch, on=[group_col, "j", "c"])
        .groupBy(group_col, key_col)
        .agg(F.min("_cnt").alias("cm_n"))
    )


def sql_cm_estimates(source: str, group_col: str, key_col: str) -> str:
    """DuckDB CTE chain mirroring cm_estimates; SELECTs (group, key, cm_n)."""
    seeded = sql_hash60(f"'cm' || CAST(j AS VARCHAR) || ':' || CAST({key_col} AS VARCHAR)")
    return f"""
        SELECT {group_col}, {key_col}, min(_cnt) AS cm_n
        FROM (SELECT DISTINCT {group_col}, {key_col}, j, c FROM (
                SELECT {group_col}, {key_col}, j, {seeded} % {CM_WIDTH} AS c
                FROM {source} CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS j)
             )) k
        JOIN (SELECT {group_col}, j, c, count(*) AS _cnt FROM (
                SELECT {group_col}, j, {seeded} % {CM_WIDTH} AS c
                FROM {source} CROSS JOIN (SELECT unnest(range(0, {CM_DEPTH})) AS j)
             ) GROUP BY 1, 2, 3) s
        USING ({group_col}, j, c)
        GROUP BY 1, 2
    """


def hll_distinct(
    hashed: DataFrame, group_col: str, hash_col: str
) -> DataFrame:
    """(group, hll_users): raw-HLL distinct estimate per group over
    pre-hashed values.  Fully agg-shaped — two groupBys, no window, no
    sort — so it scales to any group cardinality with map-side partial
    aggregation; the register rank uses length(bin(w)) (an exact
    integer-via-string bit length) instead of log2, which is not
    correctly-rounded-guaranteed across engines."""
    h = F.col(hash_col)
    w = F.shiftright(h, _HLL_REG_BITS)
    rank = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(w))
    )
    regs = (
        hashed.select(
            F.col(group_col),
            h.bitwiseAND(F.lit(HLL_M - 1)).alias("_reg"),
            rank.alias("_rank"),
        )
        .groupBy(group_col, "_reg")
        .agg(F.max("_rank").alias("_m"))
    )
    # Σ 2^(55-M) over present registers, + 2^55 per absent register (M=0)
    scale = _W_BITS + 1  # 55
    sums = regs.groupBy(group_col).agg(
        # python shiftleft() only takes a literal bit count — SQL's takes
        # an expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - _m)")).alias("_s"),
        F.count(F.lit(1)).alias("_nreg"),
    )
    s_total = F.col("_s") + (F.lit(HLL_M) - F.col("_nreg")) * F.lit(2**scale)
    est = F.floor(
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(2**scale))
        / s_total.cast("double")
    )
    return sums.select(group_col, est.cast("long").alias("hll_users"))


def sql_hll_distinct(source: str, group_col: str, hash_expr: str) -> str:
    """DuckDB CTE chain mirroring hll_distinct; SELECTs (group, hll_users)."""
    scale = _W_BITS + 1
    return f"""
        SELECT {group_col},
               CAST(floor(CAST('{HLL_ALPHA!r}' AS DOUBLE)
                          * CAST('{float(HLL_M * HLL_M)!r}' AS DOUBLE)
                          * CAST('{float(2 ** scale)!r}' AS DOUBLE)
                          / CAST(_s + ({HLL_M} - _nreg) * (CAST(1 AS BIGINT) << {scale})
                                 AS DOUBLE)) AS BIGINT) AS hll_users
        FROM (
            SELECT {group_col},
                   SUM(CAST(1 AS BIGINT) << ({scale} - _m)) AS _s,
                   COUNT(*) AS _nreg
            FROM (
                SELECT {group_col}, h & {HLL_M - 1} AS _reg,
                       MAX(CASE WHEN (h >> {_HLL_REG_BITS}) = 0 THEN {scale}
                           ELSE {scale} - length(bin(h >> {_HLL_REG_BITS})) END) AS _m
                FROM (SELECT {group_col}, {hash_expr} AS h FROM {source})
                GROUP BY 1, 2
            )
            GROUP BY 1
        )
    """
