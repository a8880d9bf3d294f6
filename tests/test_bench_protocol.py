"""The bench protocol contract: stdout must carry EXACTLY ONE compact
JSON line the driver can machine-parse (three rounds of `parsed: null`
came from per-query detail overflowing the driver's stdout tail capture
— VERDICT r3 item 1; this test pins the fix)."""

import json
import os
import subprocess
import sys


def test_bench_stdout_is_one_parseable_protocol_line(tmp_path):
    from data_engineering_etl_demo_spark.plans import all_specs

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ORACLE="0",  # oracle timings: covered by the
        # real per-round runs; this pins the stdout contract cheaply
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_DETAIL=str(tmp_path / "detail.json"),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE line, got {len(lines)}"
    protocol = json.loads(lines[0])
    assert protocol["metric"] == "total_query_sec"
    assert protocol["unit"] == "sec"
    assert protocol["sf"] == 0.001
    assert protocol["n_queries"] == len(all_specs())
    assert protocol["value"] > 0
    assert len(lines[0]) < 1000  # compact: survives any stdout tail capture
    # the full per-query breakdown lands in the detail artifact instead
    detail = json.loads((tmp_path / "detail.json").read_text())
    assert set(detail["queries"]) == set(all_specs())
