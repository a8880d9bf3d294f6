"""Guards for the differential-fuzz harness (r15, VERDICT r14 item 1).

The harness (scripts_differential_fuzz.py) generates seeded ANSI SQL
from a typed column census and runs each case through BOTH spark.sql
and DuckDB — the first correctness evidence that probes the space
BETWEEN the 177 registered queries.  These tests pin:

1. the committed FUZZ artifact's floor (>=1000 cases, zero mismatches,
   zero errors, majority-nonempty results — a vacuous-green guard);
2. round-seeded determinism: regenerating the artifact's case prefix
   from the same round number and data reproduces it bit-for-bit;
3. the grammar's structural trap exclusions (module docstring of the
   harness): no division, no raw-DOUBLE SUM/AVG, no LIMIT without a
   full ORDER BY, no ORDER BY without spelled NULLS direction, no raw
   timestamp projection;
4. a live mini-fuzz at sf0.001: a small seeded case set must match
   across engines in-process, so a regression fails here before the
   next artifact run.
"""

import glob
import json
import os
import random
import re
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import scripts_differential_fuzz as fuzz  # noqa: E402
from oracle_compare import duckdb_connection  # noqa: E402

_CASE_FLOOR = 1000
_SMOKE_SF = "/root/testdata/sf0.001"


def _latest_artifact():
    paths = sorted(glob.glob(os.path.join(_REPO, "FUZZ_r*.json")))
    if not paths:
        pytest.fail(
            "no FUZZ_r*.json artifact committed — run "
            "scripts_differential_fuzz.py --round <N> --cases 1000"
        )
    with open(paths[-1]) as f:
        return paths[-1], json.load(f)


def test_artifact_floor_and_green():
    path, art = _latest_artifact()
    assert art["n_cases"] >= _CASE_FLOOR, (path, art["n_cases"])
    assert art["n_mismatch"] == 0 and art["mismatches"] == [], (
        f"{path}: engine mismatches recorded — adjudicate in NOTES "
        f"(engine difference vs bug) before touching the grammar: "
        f"{art['mismatches'][:3]}"
    )
    assert art["n_error"] == 0 and art["errors"] == [], (
        f"{path}: cases errored: {art['errors'][:3]}"
    )
    # vacuous-green guards: the accounting must close, the grammar must
    # exercise every shape, and most cases must return rows
    assert art["n_match"] == art["n_cases"]
    assert set(art["shape_census"]) == set(fuzz.SHAPES)
    assert all(v > 0 for v in art["shape_census"].values())
    assert sum(art["shape_census"].values()) == art["n_cases"]
    assert art["n_nonempty"] >= art["n_cases"] * 0.5
    assert art["rows_total"] > 0


def test_case_stream_is_round_seeded_deterministic():
    """Same round + same data ⇒ same SQL, reproduced from scratch
    (census and literal pools recomputed from the artifact's sf dir)."""
    path, art = _latest_artifact()
    con = duckdb_connection(art["sf_dir"])
    census = fuzz.column_census(art["sf_dir"])
    pools = fuzz.literal_pools(con, census)
    unique = fuzz.key_uniqueness(con, census)
    n = len(art["sample_sqls"])
    regen = [
        sql
        for _s, sql in fuzz.gen_cases(art["round"], n, census, pools, unique)
    ]
    assert regen == art["sample_sqls"], (
        f"{path}: regenerated case prefix diverged — generator or data "
        "changed without a new artifact run"
    )


# one strip of generated SQL reused by the structural checks below
def _sample_sqls(n=400, round_no=7):
    con = duckdb_connection(_SMOKE_SF)
    census = fuzz.column_census(_SMOKE_SF)
    pools = fuzz.literal_pools(con, census)
    unique = fuzz.key_uniqueness(con, census)
    return fuzz.gen_cases(round_no, n, census, pools, unique)


def _strip_sql_strings(sql: str) -> str:
    """Blank out single-quoted literals so structural checks can't be
    fooled by data-derived literal contents (a '/' inside a LIKE
    pattern is string data, not division)."""
    return re.sub(r"'(?:[^']|'')*'", "''", sql)


def _order_by_items(sql: str):
    """Yield the comma-separated items of EVERY ORDER BY clause —
    top-level (ends at LIMIT/end) and window (ends at the OVER's
    closing paren), paren-depth aware."""
    for m in re.finditer(r"ORDER BY ", sql):
        seg, depth, item_start = m.end(), 0, m.end()
        i = seg
        while i < len(sql):
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break  # window clause closes
                depth -= 1
            elif ch == "," and depth == 0:
                yield sql[item_start:i]
                item_start = i + 1
            elif depth == 0 and sql.startswith(" LIMIT ", i):
                break
            i += 1
        yield sql[item_start:i]


def test_grammar_honors_trap_exclusions():
    cases = _sample_sqls()
    ts_cols = {
        c
        for t, cols in fuzz.column_census(_SMOKE_SF).items()
        for c, cls in cols.items()
        if cls == "timestamp"
    }
    dbl_cols = {
        c
        for t, cols in fuzz.column_census(_SMOKE_SF).items()
        for c, cls in cols.items()
        if cls == "double"
    }
    for shape, sql in cases:
        bare = _strip_sql_strings(sql)
        # no division anywhere (Spark NULL vs DuckDB error on zero);
        # string literals excluded — a '/' in data is not an operator
        assert "/" not in bare, sql
        # LIMIT only under an ORDER BY; every ORDER BY item (top-level
        # AND window) spells its NULLS direction
        if "LIMIT" in bare:
            assert "ORDER BY" in bare, sql
        for item in _order_by_items(bare):
            assert "NULLS FIRST" in item or "NULLS LAST" in item, (
                sql,
                item,
            )
        # SUM/AVG never touch raw DOUBLE columns (aggregation order);
        # the conditional-count CASE form is exact integer arithmetic
        for m in re.finditer(r"\b(SUM|AVG)\(([^)]*)", bare):
            arg = m.group(2)
            if m.group(1) == "AVG":
                assert not any(d in arg for d in dbl_cols), sql
            elif any(d in arg for d in dbl_cols):
                assert arg.startswith(("CAST(", "CASE WHEN")), sql
        # raw timestamps never projected — only CAST(ts AS DATE) or
        # predicate use after WHERE/ON (outer select list checked;
        # subquery select lists are key/part/date-cast by construction).
        # A CASE WHEN <pred> THEN inside an aggregate is predicate
        # position, not a projection — blank it before scanning.
        head = bare.split(" FROM ", 1)[0]
        head = re.sub(r"CASE WHEN .*? THEN", "CASE WHEN _ THEN", head)
        for c in ts_cols:
            for m in re.finditer(rf"\b{c}\b", head):
                before = head[: m.start()]
                assert re.search(r"CAST\((?:[ab]\.)?$", before), sql


def test_live_mini_fuzz_matches(spark):
    """A seeded 12-case strip must match Spark-vs-DuckDB in-process.
    Distinct round seed (3) from the artifact's so this is additional
    coverage, not a replay."""
    from data_engineering_etl_demo_spark.catalog import register_views

    con = duckdb_connection(_SMOKE_SF)
    census = fuzz.column_census(_SMOKE_SF)
    pools = fuzz.literal_pools(con, census)
    unique = fuzz.key_uniqueness(con, census)
    register_views(spark, _SMOKE_SF)
    fails = []
    for shape, sql in fuzz.gen_cases(3, 12, census, pools, unique):
        ok, _n, detail = fuzz.compare_sql(spark, con, sql)
        if not ok:
            fails.append((shape, sql, detail))
    assert not fails, fails


def test_rollup_empty_input_divergence_still_holds(spark):
    """Pins the r15 fuzz harness's first FINDING: Spark emits zero rows
    for ROLLUP over an empty input, DuckDB (standard semantics, like
    PostgreSQL) emits the () grouping set's grand-total row (NULL, 0).
    The grammar excludes the case by construction (rollup shape has no
    WHERE).  If a future Spark release aligns with the standard this
    test fails, flagging the exclusion for removal — the exclusion must
    never outlive its justification."""
    import duckdb

    spark.range(5).createOrReplaceTempView("fuzz_rollup_probe")
    sql = (
        "SELECT id AS g, COUNT(*) AS c FROM fuzz_rollup_probe "
        "WHERE id < 0 GROUP BY ROLLUP(id)"
    )
    assert spark.sql(sql).collect() == []
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_rollup_probe AS SELECT 0 AS id WHERE 1=0")
    con.execute("INSERT INTO fuzz_rollup_probe SELECT range FROM range(5)")
    assert con.execute(sql).fetchall() == [(None, 0)]


def test_pools_are_decile_sampled_not_random():
    """Determinism self-test: two pool computations are identical, and
    the per-case RNG isolation means case i is reproducible alone."""
    con = duckdb_connection(_SMOKE_SF)
    census = fuzz.column_census(_SMOKE_SF)
    p1 = fuzz.literal_pools(con, census)
    p2 = fuzz.literal_pools(duckdb_connection(_SMOKE_SF), census)
    assert p1 == p2
    unique = fuzz.key_uniqueness(con, census)
    one = fuzz.gen_case(random.Random(5 * 1_000_000 + 7), census, p1, unique)
    strip = fuzz.gen_cases(5, 8, census, p1, unique)
    assert strip[7] == one
    # the fuzz-found data fact the LAG gate rests on: the synthetic
    # lineitem spine is NOT unique, every other table's key is
    assert unique["lineitem"] is False
    assert all(v for t, v in unique.items() if t != "lineitem"), unique
