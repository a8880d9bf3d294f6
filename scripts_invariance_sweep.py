"""Physical-invariance sweep -> INVARIANCE_r{N}.json (VERDICT r11 item 8).

Promotes the r11 NOTES ritual into a scripted, diffable artifact: replay
the FULL query registry against the DuckDB oracle under perturbed
physical layouts and assert every result is value-identical.  This is
the distributed-correctness property a 1000-executor cluster actually
needs — no result may depend on partition count, task parallelism,
per-partition evaluation order, or adaptive re-planning (the class that
bites float summation order, first/last-without-ordering, and
partition-id-leaking kernels at scale).

Default matrix (the r11-certified set):
  narrow   local[7],  shuffle.partitions=5,  AQE on,  sf0.01
  wide     local[32], shuffle.partitions=97, AQE on,  sf0.01
  no-aqe   local[32], shuffle.partitions=32, AQE OFF, sf0.01
  bench-sf local[32], shuffle.partitions=97, AQE on,  sf0.1   (skipped
           with --quick; it is the long pole at ~10 min)

Each config runs in its OWN subprocess (a JVM's master/AQE flags are
fixed at session start), compares sorted result rows against the oracle
SQL run by DuckDB on the same parquet files, and reports per-config
match counts.  The parent merges them into INVARIANCE_r{N}.json:

  {"round": N, "configs": {name: {"ok": bool, "n_queries": int,
   "n_match": int, "mismatches": [...], "rows_only": int,
   "elapsed_sec": float, ...}}, "ok": bool}

Usage:
  python scripts_invariance_sweep.py [--round N] [--quick] [--out PATH]
  python scripts_invariance_sweep.py --one narrow   (internal: one cell)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))

_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

_CONFIGS: dict[str, dict] = {
    "narrow": {
        "master": "local[7]",
        "shuffle_partitions": 5,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
    },
    "wide": {
        "master": "local[32]",
        "shuffle_partitions": 97,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
    },
    "no-aqe": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "aqe": False,
        "sf_dir": "/root/testdata/sf0.01",
    },
    "bench-sf": {
        "master": "local[32]",
        "shuffle_partitions": 97,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.1",
    },
}


def run_one(name: str) -> dict:
    cfg = _CONFIGS[name]
    t0 = time.perf_counter()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(cfg["master"])
        .config("spark.sql.shuffle.partitions", str(cfg["shuffle_partitions"]))
        .config("spark.sql.adaptive.enabled", str(cfg["aqe"]).lower())
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName(f"invariance-{name}")
        .getOrCreate()
    )
    sys.path.insert(0, _REPO)
    import __spark_entry__ as e

    import duckdb

    qs, osql = e.queries(), e.oracle_sql()
    sf = cfg["sf_dir"]
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    mismatches, errors, rows_only, n_match = [], [], 0, 0
    for qname in qs:
        try:
            srows = sorted(
                map(tuple, qs[qname](spark, sf).collect()), key=repr
            )
            if qname in osql:
                drows = sorted(
                    map(tuple, con.execute(osql[qname]).fetchall()), key=repr
                )
                if srows == drows:
                    n_match += 1
                else:
                    mismatches.append(qname)
            else:
                rows_only += 1
        except Exception as exc:  # record, keep sweeping
            errors.append(f"{qname}: {type(exc).__name__}: {exc}")
    spark.stop()
    return {
        "ok": not mismatches and not errors,
        "master": cfg["master"],
        "shuffle_partitions": cfg["shuffle_partitions"],
        "aqe": cfg["aqe"],
        "sf_dir": sf,
        "n_queries": len(qs),
        "n_match": n_match,
        "rows_only": rows_only,
        "mismatches": mismatches,
        "errors": errors,
        "elapsed_sec": round(time.perf_counter() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--quick", action="store_true",
                    help="skip the sf0.1 bench-sf cell")
    ap.add_argument("--out", default=None)
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        print(json.dumps(run_one(args.one)))
        return 0

    names = [n for n in _CONFIGS if not (args.quick and n == "bench-sf")]
    out = {"configs": {}}
    if args.round is not None:
        out["round"] = args.round
    for name in names:
        print(f"[invariance] {name}: starting", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=_REPO,
        )
        if proc.returncode != 0:
            out["configs"][name] = {
                "ok": False,
                "errors": [f"subprocess failed: {proc.stderr[-2000:]}"],
            }
        else:
            out["configs"][name] = json.loads(proc.stdout.strip().splitlines()[-1])
        c = out["configs"][name]
        print(
            f"[invariance] {name}: ok={c.get('ok')} "
            f"match={c.get('n_match')}/{c.get('n_queries')} "
            f"elapsed={c.get('elapsed_sec')}s",
            file=sys.stderr,
        )
    out["ok"] = all(c.get("ok") for c in out["configs"].values())
    path = args.out or os.path.join(
        _REPO,
        f"INVARIANCE_r{args.round:02d}.json" if args.round is not None
        else "INVARIANCE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": out["ok"], "artifact": path}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
