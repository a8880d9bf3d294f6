"""Z-order layout: the rewrite must preserve rows exactly and must
actually tighten per-file zone-map spans in EVERY clustered column — the
property a linear sort cannot deliver for the trailing dimension."""

import pyspark.sql.functions as F
import pytest

from data_engineering_etl_demo_spark.operators import layout as L

N_ROWS = 40_000
N_FILES = 16
DOMAIN = 1 << 12


@pytest.fixture(scope="module")
def xy_df(spark):
    # two INDEPENDENT pseudo-random dimensions — the adversarial case for
    # a linear sort (sorting by x leaves every file spanning all of y)
    return spark.range(N_ROWS).select(
        F.col("id"),
        F.pmod(F.hash(F.col("id") * 2 + 1), F.lit(DOMAIN)).alias("x"),
        F.pmod(F.hash(F.col("id") * 2), F.lit(DOMAIN)).alias("y"),
    )


def _avg_spans(spark, path):
    rows = L.file_spans(spark, path, ["x", "y"]).collect()
    sx = sum((r["max_x"] - r["min_x"]) / DOMAIN for r in rows) / len(rows)
    sy = sum((r["max_y"] - r["min_y"]) / DOMAIN for r in rows) / len(rows)
    return sx, sy, len(rows)


def test_zorder_rewrite_preserves_rows_and_tightens_both_dims(
    spark, tmp_path, xy_df
):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    xy_df.write.parquet(zpath)
    before = sorted(tuple(r) for r in spark.read.parquet(zpath).collect())

    # linear layout: global sort on x only
    xy_df.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.parquet(
        lpath
    )

    report = L.zorder_rewrite(spark, zpath, ["x", "y"], n_files=N_FILES)
    assert report["n_rows"] == N_ROWS

    after = sorted(tuple(r) for r in spark.read.parquet(zpath).collect())
    assert after == before  # layout changed, content bit-identical

    zx, zy, zn = _avg_spans(spark, zpath)
    lx, ly, _ = _avg_spans(spark, lpath)
    assert zn == N_FILES
    # the linear sort is tight on its leading column but spans ~the whole
    # domain of the other; z-order is materially tight on BOTH
    assert lx < 0.2
    assert ly > 0.8
    assert zx < 0.6
    assert zy < 0.6


def test_zorder_key_matches_sql_replay(spark):
    # the Catalyst expression and the DuckDB replay must agree bit-exactly
    import duckdb

    df = spark.range(500).select(
        F.pmod(F.hash("id"), F.lit(1 << 16)).alias("a"),
        F.pmod(F.hash(F.col("id") + 7), F.lit(1 << 16)).alias("b"),
    )
    pdf = df.withColumn("z", L.zorder_key([F.col("a"), F.col("b")])).toPandas()
    con = duckdb.connect()
    con.register("t", pdf[["a", "b"]])
    expect = con.execute(
        f"SELECT {L.sql_zorder_key(['a', 'b'])} AS z FROM t"
    ).df()["z"]
    assert (pdf["z"].to_numpy() == expect.to_numpy()).all()


def test_zorder_key_bit_positions():
    # tiny closed-form check: x=0b11 (bits 0,1), y=0b01 -> z interleaves
    # x into even positions, y into odd: z = 1 + 4 + 2 = 0b111
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    row = (
        spark.range(1)
        .select(
            L.zorder_key([F.lit(3), F.lit(1)], bits=4).alias("z"),
        )
        .collect()[0]
    )
    assert row["z"] == 0b111


def test_normalize_dim_constant_column(spark):
    df = spark.range(10).select(
        L.normalize_dim(F.lit(5), F.lit(5), F.lit(5)).alias("n")
    )
    assert all(r["n"] == 0 for r in df.collect())


def test_zorder_key_roundtrip_property(spark):
    """Injectivity via exact de-interleave: recover (x, y) from z for a
    hypothesis-style sweep of boundary + random grid points (driven
    through one DataFrame pass, not per-example Spark jobs)."""
    import random

    rng = random.Random(20260814)
    pts = [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    pts += [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", L.zorder_key([F.col("x"), F.col("y")]).alias("z")
    ).collect()

    def deinterleave(z):
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert deinterleave(r["z"]) == (r["x"], r["y"])
    # z-order locality: within a 2^k-aligned square, all z-values are
    # contiguous — the property file skipping relies on
    assert (
        spark.range(16)
        .select(
            L.zorder_key(
                [(F.col("id") % 4) + 64, (F.col("id") / 4).cast("long") + 32]
            ).alias("z")
        )
        .agg((F.max("z") - F.min("z")).alias("span"))
        .collect()[0]["span"]
        == 15
    )
