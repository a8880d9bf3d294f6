"""Physical-invariance sweep -> INVARIANCE_r{N}.json (VERDICT r11 item 8).

Promotes the r11 NOTES ritual into a scripted, diffable artifact: replay
the FULL query registry against the DuckDB oracle under perturbed
physical layouts and assert every result is value-identical.  This is
the distributed-correctness property a 1000-executor cluster actually
needs — no result may depend on partition count, task parallelism,
per-partition evaluation order, or adaptive re-planning (the class that
bites float summation order, first/last-without-ordering, and
partition-id-leaking kernels at scale).

Default matrix (r11-certified set + the r13 spill cell + the r14
environment cells):
  narrow   local[7],  shuffle.partitions=5,  AQE on,  sf0.01
  wide     local[32], shuffle.partitions=97, AQE on,  sf0.01
  no-aqe   local[32], shuffle.partitions=32, AQE OFF, sf0.01
  bench-sf local[32], shuffle.partitions=97, AQE on,  sf0.1   (skipped
           with --quick; it is the long pole at ~10 min)
  spill    local[7],  shuffle.partitions=13, AQE on,  sf0.01, with
           Spark's public spill thresholds forced low so every sort /
           window buffer / SMJ buffer / hash-agg goes through the
           external-spill paths (external at 64 rows; spill files cut
           every 4096 rows — see the config comment for why not 512);
           spilled bytes recorded via the UI REST API as proof the
           paths ran
  host-tz  local[32], shuffle.partitions=32, AQE on,  sf0.01, child
           process launched with TZ=America/New_York so the JVM's
           default zone is shifted while the session pins UTC per the
           engine contract — proof the contract defeats the HOST
           environment (r13's probe showed an unpinned session shifts
           24 calendar-bucketing queries by the zone offset); the
           JVM's observed default zone is recorded so the cell can't
           go green vacuously (TZ not propagating)
  storage- local[32], shuffle.partitions=32, AQE on — the same sf0.01
  layout   rows REWRITTEN with a deliberately different physical
           parquet layout (512-row row groups vs the generator's one
           per table, 2 KB pages, zstd, dictionary off) and the full
           registry replayed against the oracle on the rewritten
           files: results must not depend on how the bytes are laid
           out (row-group statistics/pruning, split planning,
           non-dictionary decode); observed layout recorded so the
           cell can't go green vacuously
  arrow-   local[32], shuffle.partitions=32, AQE on, Arrow
  batch    maxRecordsPerBatch=64 so every mapInPandas kernel sees
           many batches per partition instead of one — no Python
           kernel may depend on batch boundaries; observed probe
           batch count recorded
  no-      local[32], shuffle.partitions=32, AQE on, whole-stage
  codegen  codegen OFF — the interpreted path a real cluster falls
           back to (wide schemas, >64KB methods) must produce
           identical results; probe plan recorded WSCG-free

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
    # Spill-pressure cell (VERDICT r12 item 7): at sf0.01 the working set
    # never outgrows a 128 GiB container heap, so genuine memory-pressure
    # spill can't arise naturally — instead force the external-spill code
    # paths DETERMINISTICALLY via Spark's public spill thresholds: window /
    # sort-merge-join buffers go external at 64 rows (in.memory.threshold —
    # this is what routes every buffer through
    # ExternalAppendOnlyUnsafeRowArray / UnsafeExternalSorter), unsafe
    # sorts cut a new spill FILE every 4096 elements, and
    # ObjectHashAggregate falls back to sort-based aggregation after 16
    # distinct keys.  A 100 TB shuffle lives in exactly these paths; a
    # cell that replays all 177 oracles value-identical through them is
    # the evidence that no kernel depends on staying in-memory.
    # measure_spill records memory/disk bytes spilled from the UI REST
    # API as proof the paths ran.
    #
    # File-granularity thresholds were 64/512 in r13 and OOMed in r14:
    # UnsafeExternalSorter's merge opens a ~1-2 MB ReadAheadInputStream
    # per spill file SIMULTANEOUSLY, so a documented global-window query
    # at 64 rows/file produced thousands of files -> ~2 MB x files x 7
    # concurrent tasks > the 8g heap (OOM in getIterator/
    # UnsafeSorterSpillReader, reproduced standalone).  4096 rows/file
    # keeps every buffer on the identical external code path (the
    # in.memory thresholds still force external at 64 rows) while
    # bounding merge fan-in — the same fix a real cluster would make.
    "spill": {
        "master": "local[7]",
        "shuffle_partitions": 13,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
        "measure_spill": True,
        "extra_conf": {
            "spark.shuffle.spill.numElementsForceSpillThreshold": "4096",
            "spark.sql.windowExec.buffer.in.memory.threshold": "64",
            "spark.sql.windowExec.buffer.spill.threshold": "4096",
            "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": "64",
            "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "4096",
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "16",
        },
    },
    # Host-TZ cell (VERDICT r13 item 5): promote the r13 one-off probe to
    # a standing artifact.  The CHILD PROCESS is launched with
    # TZ=America/New_York, so the JVM's default zone (and Python's local
    # zone) are shifted the way a mis-configured cluster node would be —
    # but every session this engine builds pins
    # spark.sql.session.timeZone=UTC (the session-TZ contract, lint-
    # enforced at each builder site).  All 177 queries value-identical to
    # the oracle here proves the CONTRACT defeats the ENVIRONMENT: the
    # 24 calendar-bucketing queries that shifted by the zone offset under
    # r13's unpinned-session probe stay exact.  The observed JVM default
    # zone is recorded in the cell (host_tz) and a guard test requires it
    # to be non-UTC — a green cell where TZ silently failed to propagate
    # would be vacuous.
    "host-tz": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
        "env": {"TZ": "America/New_York"},
    },
    # Storage-layout cell (r14, property class: physical-ENCODING
    # independence).  The generator writes every sf0.01 table as ONE
    # snappy row group with dictionary encoding — so row-group
    # statistics granularity, row-group pruning, split planning, and
    # the non-dictionary decode path are all untested axes on the
    # default matrix.  At 100 TB a lake never looks like the generator's
    # output: files arrive with wildly varying row-group sizes, page
    # sizes, compressions, and encodings.  This cell rewrites the same
    # logical data with pyarrow (values byte-identical by read/write
    # round-trip) into tiny row groups (512 rows -> lineitem gets ~117
    # groups), tiny pages, zstd, dictionary OFF, and replays the whole
    # registry against the oracle on the SAME rewritten files — results
    # must not depend on how the bytes are laid out.  The observed
    # rewritten layout is recorded (storage_layout) and a guard test
    # requires it to be genuinely shifted (multi-row-group + ZSTD), the
    # same anti-vacuous convention as the spill and host-tz cells.
    "storage-layout": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
        "rewrite_layout": {
            "dest": "/tmp/invariance_storage_sf0.01",
            "row_group_size": 512,
            "data_page_size": 2048,
            "compression": "zstd",
            "use_dictionary": False,
        },
    },
    # Arrow-batch cell (r14, property class: PYTHON-KERNEL BATCH
    # independence).  Every Python-executed kernel in this engine is an
    # Arrow-batched mapInPandas/applyInPandas; the classic bug class
    # there is logic that accidentally depends on BATCH BOUNDARIES
    # (a diff/cumsum/dedup computed within a batch instead of within
    # the semantic group).  Default maxRecordsPerBatch is 10,000 — at
    # sf0.01 many kernels see exactly ONE batch per partition, so that
    # bug class is invisible to the default matrix.  64-row batches
    # force every mapInPandas kernel through many batches per
    # partition; 177/177 value-identical proves no kernel leans on a
    # batch edge.  A probe records the OBSERVED batch count so the cell
    # can't go green with the conf silently ignored.
    "arrow-batch": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
        "probe_arrow_batches": True,
        "extra_conf": {
            "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
        },
    },
    # No-codegen cell (r14, property class: CODEGEN-FALLBACK equality).
    # Spark silently falls back from whole-stage codegen to the
    # interpreted path in real clusters (wide schemas >100 fields, >64KB
    # generated methods, codegen cache pressure) — precisely the shapes
    # a 100 TB pipeline hits.  Running the registry with
    # spark.sql.codegen.wholeStage=false certifies both execution
    # strategies produce identical results, so a production fallback
    # can never silently change answers.  A probe records that the
    # physical plan genuinely lost its WholeStageCodegen nodes.
    "no-codegen": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "aqe": True,
        "sf_dir": "/root/testdata/sf0.01",
        "probe_codegen_off": True,
        "extra_conf": {
            "spark.sql.codegen.wholeStage": "false",
        },
    },
}


def _rewrite_layout(src_dir: str, opts: dict) -> dict:
    """Rewrite every table of ``src_dir`` into ``opts['dest']`` with a
    deliberately different physical parquet layout (row-group size,
    page size, compression, dictionary) and identical logical values.
    Returns the observed layout of the rewritten files as evidence."""
    import glob

    import pyarrow.parquet as pq

    import shutil

    dest = opts["dest"]
    # Fresh dest every run (ADVICE r14): a reused /tmp dir could carry
    # files from a prior run with different rewrite options, and the
    # layout evidence below would then describe stale bytes.
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    layout = {}
    for path in sorted(glob.glob(os.path.join(src_dir, "*.parquet"))):
        name = os.path.basename(path)
        table = pq.read_table(path)
        out_path = os.path.join(dest, name)
        pq.write_table(
            table,
            out_path,
            row_group_size=opts["row_group_size"],
            data_page_size=opts["data_page_size"],
            compression=opts["compression"],
            use_dictionary=opts["use_dictionary"],
        )
        # Back the "values byte-identical by read/write round-trip"
        # claim with code (ADVICE r14): both engines read the rewritten
        # files so the invariance comparison is sound either way, but
        # silent rewrite-induced drift vs the generator data would
        # otherwise go unnoticed.
        if not pq.read_table(out_path).equals(table):
            raise AssertionError(
                f"layout rewrite changed logical values for {name}"
            )
        meta = pq.ParquetFile(out_path).metadata
        layout[name] = {
            "rows": meta.num_rows,
            "row_groups": meta.num_row_groups,
            "compression": meta.row_group(0).column(0).compression,
        }
    return layout


def run_one(name: str) -> dict:
    cfg = _CONFIGS[name]
    t0 = time.perf_counter()
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(cfg["master"])
        .config("spark.sql.shuffle.partitions", str(cfg["shuffle_partitions"]))
        .config("spark.sql.adaptive.enabled", str(cfg["aqe"]).lower())
        # UTC is part of the engine contract (session-TZ ledger): without
        # the pin this artifact would inherit the HOST zone and spuriously
        # fail the 24 calendar-bucketing queries on any non-UTC machine
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", str(bool(cfg.get("measure_spill"))).lower())
        .config("spark.driver.memory", "8g")
        .appName(f"invariance-{name}")
    )
    for k, v in cfg.get("extra_conf", {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    sys.path.insert(0, _REPO)
    # ADVICE r12: the sweep and the parity gate must share ONE comparison
    # definition — reuse the certified harness compare (column-name
    # reordering, NaN/datetime canonicalization, first-diff reporting)
    # instead of a positional tuple equality that would flag spurious
    # mismatches the gate would not.  duckdb_connection also sources the
    # view list from catalog.TABLES, so a new catalog table can never be
    # silently absent from the sweep's DuckDB views.
    from data_engineering_etl_demo_spark.plans import all_specs
    from tests.oracle_compare import compare_query, duckdb_connection

    specs = all_specs()
    sf = cfg["sf_dir"]
    storage_layout = None
    if cfg.get("rewrite_layout"):
        # Physical-encoding shift: same logical rows, different bytes.
        # Spark AND the oracle both read the rewritten files, so any
        # mismatch is layout-dependence in the engine, not data drift.
        storage_layout = _rewrite_layout(sf, cfg["rewrite_layout"])
        sf = cfg["rewrite_layout"]["dest"]
    con = duckdb_connection(sf)
    mismatches, errors, rows_only, n_match = [], [], 0, 0
    for qname, spec in specs.items():
        try:
            ok, detail = compare_query(spark, con, spec, sf)
            if spec.oracle is None:
                rows_only += 1
            elif ok:
                n_match += 1
            else:
                mismatches.append(f"{qname}: {detail}")
        except Exception as exc:  # record, keep sweeping
            errors.append(f"{qname}: {type(exc).__name__}: {exc}")
    spill = _spill_bytes(spark) if cfg.get("measure_spill") else None
    arrow_probe = None
    if cfg.get("probe_arrow_batches"):
        # Observed evidence the 64-row batch conf took effect: count the
        # Arrow batches a 10k-row mapInPandas actually receives on one
        # partition (expect ~157 at 64 rows/batch; 1-2 if the conf were
        # silently ignored).  The guard test requires >10.
        import pandas as _pd

        def _count_batches(it):
            n = 0
            for _batch in it:
                n += 1
            yield _pd.DataFrame({"n_batches": [n]})

        probe_df = spark.range(10_000).coalesce(1).mapInPandas(
            _count_batches, "n_batches long"
        )
        arrow_probe = {
            "probe_rows": 10_000,
            "observed_batches": int(probe_df.collect()[0][0]),
        }
    codegen_probe = None
    if cfg.get("probe_codegen_off"):
        # Observed evidence codegen is genuinely off: a plan that would
        # always be whole-stage-generated must have no WholeStageCodegen
        # node.  The guard test requires plan_has_wscg == False.
        plan = (
            spark.range(100)
            .selectExpr("sum(id) as s")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        codegen_probe = {"plan_has_wscg": "WholeStageCodegen" in plan}
    host_tz = None
    if cfg.get("env"):
        # Evidence the shifted zone actually reached this process: the
        # JVM default zone (what an unpinned session would inherit) and
        # Python's view.  The guard test requires jvm_default_tz != UTC.
        host_tz = {
            "TZ_env": os.environ.get("TZ"),
            "jvm_default_tz": (
                spark._jvm.java.util.TimeZone.getDefault().getID()
            ),
            "python_tzname": time.tzname,
            "session_tz": spark.conf.get("spark.sql.session.timeZone"),
        }
    spark.stop()
    out = {
        "ok": not mismatches and not errors,
        "master": cfg["master"],
        "shuffle_partitions": cfg["shuffle_partitions"],
        "aqe": cfg["aqe"],
        "sf_dir": sf,
        "n_queries": len(specs),
        "n_match": n_match,
        "rows_only": rows_only,
        "mismatches": mismatches,
        "errors": errors,
        "elapsed_sec": round(time.perf_counter() - t0, 1),
    }
    if cfg.get("extra_conf"):
        out["extra_conf"] = cfg["extra_conf"]
    if cfg.get("env"):
        out["env"] = cfg["env"]
    if cfg.get("rewrite_layout"):
        out["rewrite_layout"] = cfg["rewrite_layout"]
    if spill is not None:
        out["spill"] = spill
    if host_tz is not None:
        out["host_tz"] = host_tz
    if storage_layout is not None:
        out["storage_layout"] = storage_layout
    if arrow_probe is not None:
        out["arrow_probe"] = arrow_probe
    if codegen_probe is not None:
        out["codegen_probe"] = codegen_probe
    return out


def _spill_bytes(spark) -> dict:
    """Sum memory/disk bytes spilled across all stages via the UI REST
    API — the proof that the forced-spill cell actually exercised the
    external-spill paths rather than silently staying in-memory."""
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        # No status filter: spill from stages Spark marks failed (then
        # retried) or skipped must still count toward the recorded
        # evidence, or the zero-spill guard could false-trip on a run
        # whose spill happened in a retried attempt (ADVICE r13).
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages",
            timeout=30,
        ) as resp:
            stages = json.loads(resp.read())
        return {
            "memory_bytes_spilled": sum(
                s.get("memoryBytesSpilled", 0) for s in stages
            ),
            "disk_bytes_spilled": sum(
                s.get("diskBytesSpilled", 0) for s in stages
            ),
            "n_stages": len(stages),
        }
    except Exception as exc:  # measurement is evidence, not a gate
        return {"error": f"{type(exc).__name__}: {exc}"}


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
        child_env = None
        if _CONFIGS[name].get("env"):
            child_env = dict(os.environ, **_CONFIGS[name]["env"])
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=_REPO, env=child_env,
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
