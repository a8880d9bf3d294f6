"""Broadcast-bounds census (r12 companion to the ledger lint).

The ledger lint pins that every ``F.broadcast`` site is CLASSIFIED; this
census pins that the representative bounds those classifications claim
are TRUE at the data — measured, not just documented.  One instance per
measurable category (DuckDB reads the same parquet the engine reads, so
no JVM is needed; model-constant categories are checked directly on the
source constants).  A future edit that silently grows one of these past
its documented bound fails here even though the ledger key (the source
line) never changed.
"""

import os

import duckdb

from data_engineering_etl_demo_spark.operators import similarity as S
from data_engineering_etl_demo_spark.plans import llmdata, scale_patterns

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _count(table: str) -> int:
    con = duckdb.connect()
    return con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).fetchone()[0]


def test_static_dim_bounds_hold_at_the_data():
    """`static-dim`: nation/region are spec-constant at EVERY TPC-H SF —
    the one category whose bound is an absolute row count."""
    assert _count("nation") == 25
    assert _count("region") == 5


def test_sf_dim_ratios_hold_at_the_data():
    """`sf-dim-pin`: the documented safety argument is the spec RATIO —
    dims sit orders below lineitem.  Measure it: every pinned dim must
    be <=1/10th of the fact side at this SF (the spec ratio is ~1/30
    for part, ~1/40 for customer, ~1/600 for supplier)."""
    li = _count("lineitem")
    for dim in ("customer", "supplier", "part"):
        n = _count(dim)
        assert n * 10 <= li, (
            f"{dim} = {n} rows vs lineitem = {li} — the sf-dim-pin "
            "category's orders-below-fact premise no longer holds"
        )


def test_literal_const_bound():
    """`literal-const`: the dedup-curve threshold table is exactly the
    source literal's length."""
    assert len(llmdata._CURVE_TS) <= 8


def test_fitted_model_bounds():
    """`fitted-model`: model constants bound the broadcast rows.
    Bloom word array = _BLOOM_M/64 longs; ADC LUT rows per query =
    2 cells x PQ_M subspaces x PQ_K codes = 2x4x16 = 128 rows/query,
    x|Q| queries (512 total at the bench geometry's 4-query workload).
    Both must stay far under the ~10 MB broadcast comfort zone even at
    1000x the query load."""
    assert scale_patterns._BLOOM_M // 64 <= 10_000
    lut_rows_per_query = 2 * S.PQ_M * S.PQ_K
    assert lut_rows_per_query <= 4096, (
        f"ADC LUT grew to {lut_rows_per_query} rows/query — re-adjudicate "
        "the fitted-model bound in the PLANS.md ledger"
    )


def test_bounded_agg_checkpoint_grid():
    """`bounded-agg`: the vocab-growth checkpoint grid is spark.range(5)
    — pin the literal so a silent widening re-opens the adjudication."""
    import inspect

    src = inspect.getsource(llmdata.q_docs_vocab_growth.__wrapped__
                            if hasattr(llmdata.q_docs_vocab_growth, "__wrapped__")
                            else llmdata.q_docs_vocab_growth)
    assert "spark.range(5)" in src
