"""Differential-fuzz harness (r15): seeded SQL generated from a typed
column census, each case ONE ANSI SQL string run by BOTH ``spark.sql``
and DuckDB over the same parquet views, results compared with the
oracle gate's canonicalization.  This probes the space BETWEEN the 177
registered queries — a mismatch is an engine-semantics finding on the
exact operator surface the engine ships (scan/filter/project/agg/join/
top-k), not a generator artifact, because there is no per-engine
translation step.

Determinism: the case stream is a pure function of (--round, --cases,
the table data).  Literal pools are sampled by DECILE (quantile_disc /
evenly-spaced distincts), never ORDER BY random(); per-case RNGs are
seeded ``round * 1_000_000 + case_index``.  No wall-clock anywhere in
the generation path (the sweep family's rule), so FUZZ_r{N}.json is
reproducible bit-for-bit and the guard test replays a prefix.

Semantic traps EXCLUDED from the grammar up front — documented engine
differences, not bugs (NOTES r14 sketch):

- float aggregation order: SUM/AVG never touch raw DOUBLE columns.
  SUM over DOUBLE goes through CAST(col AS DECIMAL(18,2)) (exact,
  order-independent, same scale in both engines); AVG is INT-only
  (exact int sum / count = one deterministic double division).
- division: no ``/`` anywhere (Spark NULL vs DuckDB error on zero).
- NULL ordering defaults (Spark ASC=NULLS FIRST, DuckDB=NULLS LAST):
  every ORDER BY spells NULLS FIRST/LAST explicitly.
- LIMIT nondeterminism: LIMIT only appears under an ORDER BY that is
  provably total — the table's full unique key, all GROUP BY keys
  (unique post-aggregation), or a sort column + unique-key tiebreak.
- raw TIMESTAMP projection (collect-side zone conversion differs):
  timestamps appear in predicates and as CAST(ts AS DATE) only.
- ANSI overflow: no arithmetic on INT columns without a BIGINT cast;
  DECIMAL sums at DECIMAL(18,2) keep headroom at tested SFs.
- AVG(DECIMAL) result-scale divergence (Spark +4 scale vs DuckDB
  double): AVG restricted to INT columns.

The r15 widening (window/EXISTS/UNION/ROLLUP/CASE shapes) adds its own
determinism rules: window ORDER BYs are either the unique-key spine
(ROW_NUMBER/LAG — total order) or a bare ranked column for RANK (tied
rows get identical ranks in both engines, so values stay
deterministic); unframed OVER (PARTITION BY ...) aggregates are
whole-partition in both engines and SUM stays INT-only there; UNION
(dedup) projects int/string/date only, mirroring DISTINCT; ROLLUP
groups only base columns that are never NULL in the data, so subtotal
NULL markers are unambiguous; the CASE WHEN aggregate is
SUM(CASE WHEN p THEN 1 ELSE 0 END) — exact integer arithmetic.

The second widening (subquery/derived shapes) stays inside the same
rules: [NOT] IN subqueries project the parent KEY (standard 3VL,
identical in both engines; never NULL in this data so NOT IN's
empty-on-NULL rule is not even in play); correlated scalar subqueries
are COUNT-only (exact int, 0 on no match in both engines); derived
projections use engine-identical scalar functions only (CASE picks
between same-class columns, BIGINT-cast int arithmetic, UPPER/LENGTH/
SUBSTR/|| with character semantics, ABS); FILTER-clause aggregates
keep COUNT/INT-SUM exactness.

FUZZ-FOUND trap (r15, the harness's first finding): **ROLLUP /
GROUPING SETS over an EMPTY input** — Spark returns ZERO rows while
DuckDB (per the standard, like PostgreSQL) emits the `()` grouping
set's grand-total row (NULL keys, COUNT 0).  Minimal repro:
``SELECT id AS g, COUNT(*) AS c FROM t WHERE id < 0 GROUP BY
ROLLUP(id)`` → Spark [], DuckDB [(NULL, 0)].  Adjudicated an upstream
Spark semantic difference, not an engine bug here; the rollup shape
therefore carries no WHERE clause (an unfiltered base table is never
empty), and tests/test_differential_fuzz.py pins the divergence so the
exclusion is re-examined if a future Spark release aligns with the
standard.

Usage:
    python scripts_differential_fuzz.py --round 15 --cases 1000 \
        [--sf-dir /root/testdata/sf0.01] [--out FUZZ_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# ---------------------------------------------------------------------------
# typed column census
# ---------------------------------------------------------------------------

# class ∈ {"int", "double", "string", "timestamp"}; columns of other
# physical types (list<float> embeddings) are excluded from the grammar.
_CLASS_OF = {
    "int32": "int",
    "int64": "int",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "timestamp[us]": "timestamp",
    "timestamp[ns]": "timestamp",
}

# ORDER-BY spine per table (TESTDATA.md shapes).  NOT assumed unique:
# the r15 fuzz found the synthetic lineitem violates the TPC-H primary
# key — (l_orderkey, l_linenumber) has duplicate pairs (4599 distinct
# of 6000 rows at sf0.001) — so uniqueness is MEASURED per sf dir by
# ``key_uniqueness`` and order-sensitive constructs (LAG of a
# non-spine column) are gated on it.  The topk / ROW_NUMBER shapes
# stay deterministic even over a tied spine because their projected
# columns coincide with the order columns (tied rows project identical
# tuples, so the result SET is order-independent).
TABLE_KEYS = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# FK equi-join pairs (child, child_col, parent, parent_col).  events →
# customer is a synthetic-id join, not a constrained FK; INNER/LEFT
# semantics are still engine-identical on it.
FK_PAIRS = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def column_census(sf_dir: str) -> dict[str, dict[str, str]]:
    """{table: {column: class}} from the parquet footers (the same
    ground truth catalog._ts_columns trusts)."""
    import pyarrow.parquet as pq

    from data_engineering_etl_demo_spark.catalog import TABLES

    census: dict[str, dict[str, str]] = {}
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        cols = {}
        for f in schema:
            cls = _CLASS_OF.get(str(f.type))
            if cls:
                cols[f.name] = cls
        census[t] = cols
    return census


# ---------------------------------------------------------------------------
# literal pools (decile sampling — deterministic given the data)
# ---------------------------------------------------------------------------

_DECILES = [i / 10 for i in range(11)]


def literal_pools(con, census) -> dict[str, dict[str, list]]:
    """Per (table, column): ~11 real values at the deciles, so generated
    predicates are selective-but-nonempty instead of vacuous."""
    pools: dict[str, dict[str, list]] = {}
    for t, cols in census.items():
        if not cols:
            continue
        exprs = ", ".join(
            f"quantile_disc({c}, {_DECILES!r}) AS {c}" for c in cols
        )
        row = con.execute(f"SELECT {exprs} FROM {t}").fetchone()
        pools[t] = {
            c: sorted(set(v)) if v else [] for c, v in zip(cols, row)
        }
    return pools


def key_uniqueness(con, census) -> dict[str, bool]:
    """Measured truth of each table's TABLE_KEYS spine in THIS sf dir —
    the gate for order-sensitive constructs (see TABLE_KEYS comment)."""
    unique = {}
    for t in census:
        key = TABLE_KEYS[t]
        expr = key[0] if len(key) == 1 else f"({', '.join(key)})"
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {expr}) FROM {t}"
        ).fetchone()
        unique[t] = n == d
    return unique


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _sql_lit(v, cls: str) -> str:
    if cls == "string":
        return _sql_str(v)
    if cls == "timestamp":
        return f"TIMESTAMP '{v}'"
    if cls == "double":
        return repr(float(v))
    return str(int(v))


# ---------------------------------------------------------------------------
# grammar
# ---------------------------------------------------------------------------


def _atom(rng, col: str, cls: str, pool: list, qual: str = "") -> str:
    """One predicate atom over ``col``; ``qual`` prefixes a table alias."""
    c = f"{qual}{col}"
    if not pool:
        return f"{c} IS NOT NULL"
    pick = lambda: _sql_lit(rng.choice(pool), cls)  # noqa: E731
    kinds: list[str]
    if cls == "double" or cls == "timestamp":
        kinds = ["cmp", "between"]
    elif cls == "int":
        kinds = ["cmp", "between", "in", "eq"]
    else:  # string
        kinds = ["cmp", "in", "eq", "neq", "like"]
    k = rng.choice(kinds)
    if k == "cmp":
        return f"{c} {rng.choice(['<', '<=', '>', '>='])} {pick()}"
    if k == "between":
        a, b = sorted(rng.sample(pool, 2) if len(pool) > 1 else pool * 2)
        return f"{c} BETWEEN {_sql_lit(a, cls)} AND {_sql_lit(b, cls)}"
    if k == "in":
        vals = rng.sample(pool, min(len(pool), rng.randint(2, 4)))
        return f"{c} IN ({', '.join(_sql_lit(v, cls) for v in vals)})"
    if k == "eq":
        return f"{c} = {pick()}"
    if k == "neq":
        return f"{c} <> {pick()}"
    # like: prefix pattern from a real value, metacharacters stripped so
    # the pattern means the same literal prefix in both engines
    v = str(rng.choice(pool)).replace("%", "").replace("_", "")
    prefix = v[: rng.randint(1, min(4, max(1, len(v))))]
    return f"{c} LIKE {_sql_str(prefix + '%')}"


def _predicate(rng, table: str, census, pools, qual: str = "") -> str:
    cols = list(census[table])
    n = rng.randint(1, 3)
    atoms = [
        _atom(rng, c, census[table][c], pools[table].get(c, []), qual)
        for c in rng.sample(cols, min(n, len(cols)))
    ]
    out = atoms[0]
    for a in atoms[1:]:
        out = f"({out} {rng.choice(['AND', 'OR'])} {a})"
    return out


def _projectable(census, table: str) -> list[tuple[str, str]]:
    """(select_expr, class) choices — raw timestamps excluded, the
    date-cast offered instead (module docstring trap list)."""
    out = []
    for c, cls in census[table].items():
        if cls == "timestamp":
            out.append((f"CAST({c} AS DATE)", "date"))
        else:
            out.append((c, cls))
    return out


def _agg_exprs(
    rng, table: str, census, qual: str = "", pools=None
) -> list[str]:
    """1-3 aggregate expressions honoring the trap exclusions.  With
    ``pools``, a conditional-count aggregate (SUM over CASE WHEN —
    exact integer arithmetic, order-independent) joins the menu."""
    cols = census[table]
    menu = [f"COUNT(*)"]  # noqa: F541
    for c, cls in cols.items():
        qc = f"{qual}{c}"
        if cls in ("int", "string"):
            menu.append(f"COUNT({qc})")
            menu.append(f"COUNT(DISTINCT {qc})")
        if cls in ("int", "string", "double"):
            menu.append(f"MIN({qc})")
            menu.append(f"MAX({qc})")
        if cls == "timestamp":
            menu.append(f"MIN(CAST({qc} AS DATE))")
            menu.append(f"MAX(CAST({qc} AS DATE))")
        if cls == "int":
            menu.append(f"SUM({qc})")
            menu.append(f"AVG({qc})")
        if cls == "double":
            menu.append(f"SUM(CAST({qc} AS DECIMAL(18,2)))")
    if pools is not None:
        c = rng.choice(list(cols))
        atom = _atom(rng, c, cols[c], pools[table].get(c, []), qual)
        menu.append(f"SUM(CASE WHEN {atom} THEN 1 ELSE 0 END)")
        # FILTER clause (standard, identical in both engines); COUNT is
        # exact, SUM stays INT-only like the bare form
        c2 = rng.choice(list(cols))
        atom2 = _atom(rng, c2, cols[c2], pools[table].get(c2, []), qual)
        menu.append(f"COUNT(*) FILTER (WHERE {atom2})")
        ints = [c3 for c3, cls in cols.items() if cls == "int"]
        if ints:
            menu.append(
                f"SUM({qual}{rng.choice(ints)}) FILTER (WHERE {atom2})"
            )
    return rng.sample(menu, min(len(menu), rng.randint(1, 3)))


def _derived_expr(rng, table: str, census, pools, qual: str = ""):
    """One derived projection expression (expr, class) — engine-identical
    scalar functions only: CASE picks between same-class columns,
    BIGINT-cast integer arithmetic (no ANSI overflow), UPPER/LENGTH/
    SUBSTR/|| on strings (character semantics match), ABS on ints."""
    cols = census[table]
    ints = [c for c, cls in cols.items() if cls == "int"]
    strs = [c for c, cls in cols.items() if cls == "string"]
    kinds = []
    if ints:
        kinds += ["abs", "add"]
    if strs:
        kinds += ["upper", "length", "substr", "concat"]
    if ints and len(ints) >= 2 or strs and len(strs) >= 2:
        kinds.append("case_pick")
    if not kinds:
        return None
    k = rng.choice(kinds)
    if k == "abs":
        return f"ABS({qual}{rng.choice(ints)})", "int"
    if k == "add":
        a, b = rng.choice(ints), rng.choice(ints)
        return (
            f"CAST({qual}{a} AS BIGINT) + CAST({qual}{b} AS BIGINT)",
            "int",
        )
    if k == "upper":
        return f"UPPER({qual}{rng.choice(strs)})", "string"
    if k == "length":
        return f"LENGTH({qual}{rng.choice(strs)})", "int"
    if k == "substr":
        return (
            f"SUBSTR({qual}{rng.choice(strs)}, 1, {rng.randint(1, 5)})",
            "string",
        )
    if k == "concat":
        a, b = rng.choice(strs), rng.choice(strs)
        return f"{qual}{a} || {qual}{b}", "string"
    # case_pick: CASE WHEN <pred> THEN colA ELSE colB END, same class
    pick_ints = len(ints) >= 2 and (len(strs) < 2 or rng.random() < 0.5)
    a, b = rng.sample(ints if pick_ints else strs, 2)
    pc = rng.choice(list(cols))
    atom = _atom(rng, pc, cols[pc], pools[table].get(pc, []), qual)
    return (
        f"CASE WHEN {atom} THEN {qual}{a} ELSE {qual}{b} END",
        "int" if pick_ints else "string",
    )


def _group_cols(rng, table: str, census, qual: str = "") -> list[str]:
    """1-2 grouping expressions (int/string/date-cast)."""
    choices = []
    for c, cls in census[table].items():
        if cls in ("int", "string"):
            choices.append(f"{qual}{c}")
        elif cls == "timestamp":
            choices.append(f"CAST({qual}{c} AS DATE)")
    return rng.sample(choices, min(len(choices), rng.randint(1, 2)))


def _order_limit(rng, aliases: list[str]) -> str:
    """Total ORDER BY over ``aliases`` (caller guarantees uniqueness of
    the combination) + LIMIT, nulls direction always spelled."""
    parts = []
    for a in aliases:
        if rng.random() < 0.5:
            parts.append(f"{a} ASC NULLS FIRST")
        else:
            parts.append(f"{a} DESC NULLS LAST")
    return f" ORDER BY {', '.join(parts)} LIMIT {rng.randint(1, 200)}"


SHAPES = (
    "filter_project",
    "topk",
    "group_agg",
    "scalar_agg",
    "distinct",
    "join_project",
    "join_agg",
    # r15 widening — engine-identical ANSI constructs, same trap rules:
    # window orders are total (unique-key spine), EXISTS correlates on
    # the FK pairs, ROLLUP only over never-NULL base columns (so the
    # rollup's NULL markers are unambiguous), UNION branches share one
    # projection list.
    "window_rank",
    "window_agg",
    "exists_semi",
    "union_all",
    "rollup",
    # set ops (INTERSECT/EXCEPT [ALL] — standard multiplicity semantics
    # in both engines; equality-typed projections only, like UNION) and
    # 3-table joins (chain a→b→c and star a→{b,c} — Catalyst join
    # reordering surface)
    "setop",
    "join3",
    # non-correlated [NOT] IN subqueries and correlated scalar COUNT
    # subqueries on the FK pairs; FILTER-clause aggregates and derived
    # scalar projections ride along inside existing shapes
    "in_subquery",
    "scalar_subquery",
)

# 3-table shapes: chains a→b→c (FK of the FK) and stars a→{b,c} (two
# independent FKs out of the same fact).
JOIN_CHAINS = [
    # (a, a_fk, b, b_key, b_fk, c, c_key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey",
     "o_custkey", "customer", "c_custkey"),
    ("orders", "o_custkey", "customer", "c_custkey",
     "c_nationkey", "nation", "n_nationkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey",
     "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey",
     "c_nationkey", "nation", "n_nationkey"),
]
JOIN_STARS = [
    # (a, [(a_fk, dim, dim_key), ...])
    ("lineitem", (("l_partkey", "part", "p_partkey"),
                  ("l_suppkey", "supplier", "s_suppkey"))),
    ("lineitem", (("l_orderkey", "orders", "o_orderkey"),
                  ("l_suppkey", "supplier", "s_suppkey"))),
]


def gen_case(rng, census, pools, unique) -> tuple[str, str]:
    """Returns (shape, sql)."""
    shape = rng.choice(SHAPES)
    if shape in ("join_project", "join_agg"):
        lt, lc, rt, rc = rng.choice(FK_PAIRS)
        jt = rng.choice(["JOIN", "LEFT JOIN"])
        base = (
            f"FROM {lt} a {jt} {rt} b ON a.{lc} = b.{rc}"
        )
        where = ""
        if rng.random() < 0.8:
            # predicate on the left (preserved) side only for LEFT JOIN
            # so filter-pushdown semantics stay engine-identical; INNER
            # may filter either side
            side = "a." if jt == "LEFT JOIN" or rng.random() < 0.5 else "b."
            t = lt if side == "a." else rt
            where = " WHERE " + _predicate(rng, t, census, pools, side)
        if shape == "join_project":
            proj = []
            for t, q in ((lt, "a."), (rt, "b.")):
                for expr, _cls in rng.sample(
                    _projectable(census, t), rng.randint(1, 2)
                ):
                    # qualify bare column names; date-casts wrap them
                    proj.append(
                        expr.replace("CAST(", f"CAST({q}")
                        if expr.startswith("CAST(")
                        else f"{q}{expr}"
                    )
            sel = ", ".join(
                f"{e} AS c{i}" for i, e in enumerate(proj)
            )
            return shape, f"SELECT {sel} {base}{where}"
        # join_agg
        gt, gq = rng.choice(((lt, "a."), (rt, "b.")))
        groups = _group_cols(rng, gt, census, gq)
        at, aq = rng.choice(((lt, "a."), (rt, "b.")))
        aggs = _agg_exprs(rng, at, census, aq, pools)
        gsel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(groups))
        asel = ", ".join(f"{a} AS m{i}" for i, a in enumerate(aggs))
        sql = (
            f"SELECT {gsel}, {asel} {base}{where} "
            f"GROUP BY {', '.join(groups)}"
        )
        if rng.random() < 0.3:
            sql += f" HAVING COUNT(*) > {rng.randint(1, 5)}"
        if rng.random() < 0.3:
            sql += _order_limit(rng, [f"g{i}" for i in range(len(groups))])
        return shape, sql

    if shape == "join3":
        # chain a→b→c or star a→{b,c}; INNER throughout, or one LEFT at
        # the far end (keeps every ON key non-null-preserved, so the
        # join tree's semantics are reorder-safe in both engines)
        far_left = rng.random() < 0.3
        j2 = "LEFT JOIN" if far_left else "JOIN"
        if rng.random() < 0.6:
            a, afk, b, bkey, bfk, c, ckey = rng.choice(JOIN_CHAINS)
            base = (
                f"FROM {a} a JOIN {b} b ON a.{afk} = b.{bkey} "
                f"{j2} {c} c ON b.{bfk} = c.{ckey}"
            )
        else:
            a, dims = rng.choice(JOIN_STARS)
            (fk1, b, bkey), (fk2, c, ckey) = dims
            base = (
                f"FROM {a} a JOIN {b} b ON a.{fk1} = b.{bkey} "
                f"{j2} {c} c ON a.{fk2} = c.{ckey}"
            )
        where = ""
        if rng.random() < 0.7:
            # predicate on a non-null-preserved side (a or b)
            tq = rng.choice(((a, "a."), (b, "b.")))
            where = " WHERE " + _predicate(
                rng, tq[0], census, pools, tq[1]
            )
        if rng.random() < 0.5:
            proj = []
            for t, q in ((a, "a."), (b, "b."), (c, "c.")):
                e, _cls = rng.choice(_projectable(census, t))
                proj.append(
                    e.replace("CAST(", f"CAST({q}")
                    if e.startswith("CAST(")
                    else f"{q}{e}"
                )
            sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(proj))
            return shape, f"SELECT {sel} {base}{where}"
        gt, gq = rng.choice(((a, "a."), (b, "b."), (c, "c.")))
        groups = _group_cols(rng, gt, census, gq)
        at, aq = rng.choice(((a, "a."), (b, "b.")))
        aggs = _agg_exprs(rng, at, census, aq, pools)
        gsel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(groups))
        asel = ", ".join(f"{a2} AS m{i}" for i, a2 in enumerate(aggs))
        return shape, (
            f"SELECT {gsel}, {asel} {base}{where} "
            f"GROUP BY {', '.join(groups)}"
        )
    if shape == "exists_semi":
        # correlated [NOT] EXISTS on an FK pair: semi/anti-join plans
        # in Spark, same boolean semantics in DuckDB.  Parent side
        # projected; child may carry its own predicate.
        lt, lc, rt, rc = rng.choice(FK_PAIRS)
        neg = "NOT " if rng.random() < 0.4 else ""
        cands = _projectable(census, rt)
        proj = rng.sample(cands, min(len(cands), rng.randint(1, 3)))
        sel = ", ".join(
            (
                e.replace("CAST(", "CAST(b.")
                if e.startswith("CAST(")
                else f"b.{e}"
            )
            + f" AS c{i}"
            for i, (e, _) in enumerate(proj)
        )
        sub_pred = ""
        if rng.random() < 0.5:
            sub_pred = " AND " + _predicate(rng, lt, census, pools, "a.")
        outer_pred = ""
        if rng.random() < 0.4:
            outer_pred = (
                " AND " + _predicate(rng, rt, census, pools, "b.")
            )
        return shape, (
            f"SELECT {sel} FROM {rt} b WHERE {neg}EXISTS "
            f"(SELECT 1 FROM {lt} a WHERE a.{lc} = b.{rc}{sub_pred})"
            f"{outer_pred}"
        )

    t = rng.choice([x for x in census if census[x]])
    if shape == "window_rank":
        # ROW_NUMBER/RANK over (PARTITION BY low-card expr ORDER BY a
        # total order) + rn-filter in an outer query: deterministic —
        # ROW_NUMBER's order is the unique-key spine; RANK additionally
        # ranks a sort column with the key as tiebreak, so tied rows get
        # identical ranks in both engines.
        part = _group_cols(rng, t, census)[:1]
        if not part:
            part = [TABLE_KEYS[t][0]]
        key = TABLE_KEYS[t]
        fn = rng.choice(["ROW_NUMBER", "RANK"])
        order_cols = []
        if fn == "RANK":
            # RANK orders by a possibly-tied column WITHOUT a key
            # tiebreak: tied rows get identical ranks in both engines,
            # so the rank values AND the rn<=k row set stay
            # deterministic while genuinely exercising tie semantics.
            extra = [
                c
                for c, cls in census[t].items()
                if cls in ("int", "double", "string") and c not in key
            ]
            if extra:
                s = rng.choice(extra)
                order_cols.append(
                    f"{s} {rng.choice(['ASC NULLS FIRST', 'DESC NULLS LAST'])}"
                )
        if not order_cols:
            order_cols = [f"{k} ASC NULLS FIRST" for k in key]
        proj = list(dict.fromkeys(list(key) + part))
        sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(proj))
        where = ""
        if rng.random() < 0.5:
            where = " WHERE " + _predicate(rng, t, census, pools)
        inner = (
            f"SELECT {sel}, {fn}() OVER (PARTITION BY {part[0]} "
            f"ORDER BY {', '.join(order_cols)}) AS rn FROM {t}{where}"
        )
        return shape, (
            f"SELECT * FROM ({inner}) w WHERE rn <= {rng.randint(1, 5)}"
        )
    if shape == "window_agg":
        # unframed whole-partition aggregates (no ORDER BY in the OVER
        # ⇒ full-partition frame in both engines) + optional LAG over
        # the unique-key spine.  SUM int-only / COUNT — exact.
        part = _group_cols(rng, t, census)[:1]
        if not part:
            part = [TABLE_KEYS[t][0]]
        key = TABLE_KEYS[t]
        int_cols = [
            c for c, cls in census[t].items() if cls == "int"
        ]
        proj = list(dict.fromkeys(list(key) + part))
        sel = [f"{e} AS c{i}" for i, e in enumerate(proj)]
        over = f"OVER (PARTITION BY {part[0]})"
        sel.append(f"COUNT(*) {over} AS m0")
        if int_cols:
            sel.append(f"SUM({rng.choice(int_cols)}) {over} AS m1")
        if rng.random() < 0.5 and unique.get(t):
            # LAG of an arbitrary column needs a TOTAL order — gated on
            # the measured spine uniqueness (fuzz-found: the synthetic
            # lineitem's tied spine made the predecessor row, and so
            # the lagged value, engine-order-dependent)
            lag_col = rng.choice(
                [
                    c
                    for c, cls in census[t].items()
                    if cls in ("int", "string")
                ]
            )
            spine = ", ".join(f"{k} ASC NULLS FIRST" for k in key)
            sel.append(
                f"LAG({lag_col}, 1) OVER (PARTITION BY {part[0]} "
                f"ORDER BY {spine}) AS m2"
            )
        where = ""
        if rng.random() < 0.5:
            where = " WHERE " + _predicate(rng, t, census, pools)
        return shape, f"SELECT {', '.join(sel)} FROM {t}{where}"
    if shape == "setop":
        # INTERSECT/EXCEPT [ALL]: standard multiplicity semantics in
        # both engines; equality-typed projections only (int/string/
        # date), mirroring the UNION-dedup restriction.
        op = rng.choice(
            ["INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
        )
        cands = [
            (e, cls)
            for e, cls in _projectable(census, t)
            if cls in ("int", "string", "date")
        ]
        proj = rng.sample(cands, min(len(cands), rng.randint(1, 3)))
        sel = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(proj))
        p1 = _predicate(rng, t, census, pools)
        p2 = _predicate(rng, t, census, pools)
        return shape, (
            f"SELECT {sel} FROM {t} WHERE {p1} "
            f"{op} SELECT {sel} FROM {t} WHERE {p2}"
        )
    if shape == "union_all":
        # two branches over the same table share ONE projection list.
        # UNION (dedup) keeps to int/string/date like the DISTINCT
        # shape; UNION ALL may project doubles (no equality involved).
        op = rng.choice(["UNION ALL", "UNION"])
        cands = [
            (e, cls)
            for e, cls in _projectable(census, t)
            if op == "UNION ALL" or cls in ("int", "string", "date")
        ]
        proj = rng.sample(cands, min(len(cands), rng.randint(1, 3)))
        sel = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(proj))
        p1 = _predicate(rng, t, census, pools)
        p2 = _predicate(rng, t, census, pools)
        return shape, (
            f"SELECT {sel} FROM {t} WHERE {p1} "
            f"{op} SELECT {sel} FROM {t} WHERE {p2}"
        )
    if shape == "rollup":
        # GROUP BY ROLLUP over base columns that are never NULL in the
        # data, so the rollup's NULL subtotal markers are unambiguous
        # (no collision with NULL group values).  NO WHERE clause — the
        # r15 fuzz FOUND the empty-input divergence (trap list): a
        # selective filter can empty the input, and there Spark emits
        # zero rows while DuckDB emits the () grand-total row.  An
        # unfiltered base table is never empty, so the shape keeps
        # exercising rollup semantics without the divergent case.
        groups = _group_cols(rng, t, census)
        if not groups:
            groups = [TABLE_KEYS[t][0]]
        aggs = _agg_exprs(rng, t, census, "", pools)
        gsel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(groups))
        asel = ", ".join(f"{a} AS m{i}" for i, a in enumerate(aggs))
        return shape, (
            f"SELECT {gsel}, {asel} FROM {t} "
            f"GROUP BY ROLLUP({', '.join(groups)})"
        )
    if shape == "filter_project":
        cands = _projectable(census, t)
        proj = rng.sample(cands, min(len(cands), rng.randint(1, 4)))
        if rng.random() < 0.4:
            d = _derived_expr(rng, t, census, pools)
            if d:
                proj.append(d)
        sel = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(proj))
        where = " WHERE " + _predicate(rng, t, census, pools)
        return shape, f"SELECT {sel} FROM {t}{where}"
    if shape == "in_subquery":
        # [NOT] IN (SELECT key ...): non-correlated semi/anti form.
        # Standard 3VL either way; the subquery projects the parent KEY
        # (never NULL in this data), so NOT IN's empty-on-NULL rule is
        # not in play — and both engines implement it identically
        # regardless.
        lt, lc, rt, rc = rng.choice(FK_PAIRS)
        neg = "NOT " if rng.random() < 0.4 else ""
        cands = _projectable(census, lt)
        proj = rng.sample(cands, min(len(cands), rng.randint(1, 3)))
        sel = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(proj))
        sub_where = ""
        if rng.random() < 0.6:
            sub_where = " WHERE " + _predicate(rng, rt, census, pools)
        outer = ""
        if rng.random() < 0.4:
            outer = " AND " + _predicate(rng, lt, census, pools)
        return shape, (
            f"SELECT {sel} FROM {lt} WHERE {lc} {neg}IN "
            f"(SELECT {rc} FROM {rt}{sub_where}){outer}"
        )
    if shape == "scalar_subquery":
        # correlated scalar COUNT subquery in the select list — exact
        # int, COUNT's no-match row is 0 in both engines
        lt, lc, rt, rc = rng.choice(FK_PAIRS)
        cands = _projectable(census, rt)
        proj = rng.sample(cands, min(len(cands), rng.randint(1, 2)))
        sel = ", ".join(
            (
                e.replace("CAST(", "CAST(b.")
                if e.startswith("CAST(")
                else f"b.{e}"
            )
            + f" AS c{i}"
            for i, (e, _) in enumerate(proj)
        )
        sub_pred = ""
        if rng.random() < 0.5:
            sub_pred = " AND " + _predicate(rng, lt, census, pools, "a.")
        where = ""
        if rng.random() < 0.5:
            where = " WHERE " + _predicate(rng, rt, census, pools, "b.")
        return shape, (
            f"SELECT {sel}, (SELECT COUNT(*) FROM {lt} a "
            f"WHERE a.{lc} = b.{rc}{sub_pred}) AS m0 FROM {rt} b{where}"
        )
    if shape == "topk":
        # full unique key leads the projection; optional extra sort col
        # ranks first with the key as tiebreak — total order either way
        key = TABLE_KEYS[t]
        extra = [
            c
            for c, cls in census[t].items()
            if cls in ("int", "double", "string") and c not in key
        ]
        proj = list(key)
        order: list[str] = []
        if extra and rng.random() < 0.6:
            s = rng.choice(extra)
            proj.append(s)
            order.append(f"c{len(proj) - 1}")
        order += [f"c{i}" for i in range(len(key))]
        sel = ", ".join(f"{c} AS c{i}" for i, c in enumerate(proj))
        where = ""
        if rng.random() < 0.6:
            where = " WHERE " + _predicate(rng, t, census, pools)
        return shape, f"SELECT {sel} FROM {t}{where}" + _order_limit(
            rng, order
        )
    if shape == "group_agg":
        groups = _group_cols(rng, t, census)
        if not groups:
            groups = [TABLE_KEYS[t][0]]
        aggs = _agg_exprs(rng, t, census, "", pools)
        gsel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(groups))
        asel = ", ".join(f"{a} AS m{i}" for i, a in enumerate(aggs))
        where = ""
        if rng.random() < 0.6:
            where = " WHERE " + _predicate(rng, t, census, pools)
        sql = (
            f"SELECT {gsel}, {asel} FROM {t}{where} "
            f"GROUP BY {', '.join(groups)}"
        )
        if rng.random() < 0.3:
            sql += f" HAVING COUNT(*) > {rng.randint(1, 5)}"
        if rng.random() < 0.3:
            sql += _order_limit(rng, [f"g{i}" for i in range(len(groups))])
        return shape, sql
    if shape == "scalar_agg":
        aggs = _agg_exprs(rng, t, census, "", pools)
        asel = ", ".join(f"{a} AS m{i}" for i, a in enumerate(aggs))
        where = ""
        if rng.random() < 0.6:
            where = " WHERE " + _predicate(rng, t, census, pools)
        return shape, f"SELECT {asel} FROM {t}{where}"
    # distinct
    cands = [
        (e, cls)
        for e, cls in _projectable(census, t)
        if cls in ("int", "string", "date")
    ]
    proj = rng.sample(cands, min(len(cands), rng.randint(1, 3)))
    sel = ", ".join(f"{e} AS c{i}" for i, (e, _) in enumerate(proj))
    where = ""
    if rng.random() < 0.5:
        where = " WHERE " + _predicate(rng, t, census, pools)
    return shape, f"SELECT DISTINCT {sel} FROM {t}{where}"


def gen_cases(
    round_no: int, n: int, census, pools, unique
) -> list[tuple[str, str]]:
    """The deterministic case stream: case i uses its own RNG seeded
    round*1_000_000+i, so any single case replays in isolation."""
    out = []
    for i in range(n):
        rng = random.Random(round_no * 1_000_000 + i)
        out.append(gen_case(rng, census, pools, unique))
    return out


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def compare_sql(spark, con, sql: str) -> tuple[bool, int, str]:
    """(match, spark_row_count, detail) — same canonicalization as the
    oracle gate (tests/oracle_compare.rows_canonical)."""
    from oracle_compare import rows_canonical

    sdf = spark.sql(sql)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        return False, len(s_rows), (
            f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        )
    if len(s_rows) != len(d_rows):
        return False, len(s_rows), (
            f"row count: spark={len(s_rows)} duck={len(d_rows)}"
        )
    sc = rows_canonical(s_cols, s_rows)
    dc = rows_canonical(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, len(s_rows), f"value mismatch, first diffs: {diffs}"
    return True, len(s_rows), "ok"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--cases", type=int, default=1000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        _REPO, f"FUZZ_r{args.round:02d}.json"
    )

    from oracle_compare import duckdb_connection

    con = duckdb_connection(args.sf_dir)
    census = column_census(args.sf_dir)
    pools = literal_pools(con, census)
    unique = key_uniqueness(con, census)
    cases = gen_cases(args.round, args.cases, census, pools, unique)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        # engine contract: session TZ pinned UTC (calendar bucketing —
        # CAST(ts AS DATE) here — follows the session zone)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName(f"differential-fuzz-r{args.round}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_etl_demo_spark.catalog import register_views

    register_views(spark, args.sf_dir)

    t0 = time.perf_counter()
    n_match = n_nonempty = rows_total = 0
    shape_census: dict[str, int] = {}
    mismatches, errors = [], []
    for i, (shape, sql) in enumerate(cases):
        shape_census[shape] = shape_census.get(shape, 0) + 1
        try:
            ok, nrows, detail = compare_sql(spark, con, sql)
        except Exception as exc:  # record, keep fuzzing
            errors.append(
                {"case": i, "shape": shape, "sql": sql,
                 "error": f"{type(exc).__name__}: {exc}"}
            )
            continue
        rows_total += nrows
        if nrows:
            n_nonempty += 1
        if ok:
            n_match += 1
        else:
            mismatches.append(
                {"case": i, "shape": shape, "sql": sql, "detail": detail}
            )
        if (i + 1) % 100 == 0:
            print(
                f"  ... {i + 1}/{len(cases)} "
                f"({n_match} match, {len(mismatches)} mismatch, "
                f"{len(errors)} error, {time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
    artifact = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "n_cases": len(cases),
        "n_match": n_match,
        "n_mismatch": len(mismatches),
        "n_error": len(errors),
        "n_nonempty": n_nonempty,
        "rows_total": rows_total,
        "shape_census": dict(sorted(shape_census.items())),
        "mismatches": mismatches,
        "errors": errors,
        # replay anchor for the guard test's determinism check
        "sample_sqls": [sql for _s, sql in cases[:25]],
        "elapsed_sec": round(time.perf_counter() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        f"FUZZ round {args.round}: {n_match}/{len(cases)} match, "
        f"{len(mismatches)} mismatch, {len(errors)} error, "
        f"{n_nonempty} nonempty, {rows_total} rows -> {out_path}"
    )
    spark.stop()
    return 0 if not mismatches and not errors else 1


if __name__ == "__main__":
    sys.exit(main())
