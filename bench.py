"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (collect) — results are small
aggregates by design, so collect measures full plan execution without
driver-side bloat.  A warmup query first amortizes JVM/codegen startup so
numbers reflect steady-state engine throughput, not session boot.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_etl_demo_spark.catalog import load  # noqa: E402
from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402
from data_engineering_etl_demo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # 8 shuffle partitions: bench SFs fit comfortably (AQE coalesces to size
    # regardless); a cluster deployment sizes this to ~2-3x total cores.
    spark = get_spark(app_name="bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def run(spec) -> None:
        # noop sink: full plan execution JVM-side, no Python row
        # materialization — measures engine throughput, same as the writes
        # a production job would do.
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warmup: one untimed pass compiles each plan's whole-stage codegen and
    # primes file listings, so the timed pass measures steady-state engine
    # throughput rather than one-time JVM compilation.
    load(spark, sf_dir, "lineitem").count()
    specs = sorted(all_specs().items())
    for _, spec in specs:
        run(spec)

    timings: dict[str, float] = {}
    for name, spec in specs:
        t0 = time.perf_counter()
        run(spec)
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
