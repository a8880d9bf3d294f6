"""Streaming tuning harness (dev tool, not part of the package).

Runs the 12 streaming queries at sf0.1 in one warm session, reports
per-query wall time, with optional overrides:
  SP_PANDAS  - override shuffle_partitions for the 16-partition kernels
  SP_JVM     - override shuffle_partitions for the 4-partition kernels
  ARROW_MAX  - spark.sql.execution.arrow.maxRecordsPerBatch on the clones
Each query runs REPS times; min is reported (steady state).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "2"))
SP_PANDAS = os.environ.get("SP_PANDAS")
SP_JVM = os.environ.get("SP_JVM")
ARROW_MAX = os.environ.get("ARROW_MAX")
ONLY = os.environ.get("ONLY")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import data_engineering_etl_demo_spark.streaming.pipeline as P  # noqa: E402

_orig_rtc = P.run_to_completion


def patched_rtc(stream, query_name, output_mode="append",
                shuffle_partitions=None, spark=None):
    sp = shuffle_partitions
    if sp == 16 and SP_PANDAS:
        sp = int(SP_PANDAS)
    elif sp == 4 and SP_JVM:
        sp = int(SP_JVM)
    return _orig_rtc(stream, query_name, output_mode, sp, spark)


P.run_to_completion = patched_rtc

_orig_ds = P._drain_session


STATE_STORE = os.environ.get("STATE_STORE")  # e.g. "rocksdb"


def patched_ds(parent, shuffle_partitions):
    s = _orig_ds(parent, shuffle_partitions)
    if ARROW_MAX:
        s.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", ARROW_MAX)
    if STATE_STORE == "rocksdb":
        s.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    return s


P._drain_session = patched_ds

from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402

specs = all_specs()
names = [n for n in specs if n.startswith("streaming")]
if ONLY:
    names = [n for n in names if n in ONLY.split(",")]

spark.range(10).count()  # warm

times = {}
for name in names:
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        specs[name].spark_fn(spark, SF).collect()
        best = min(best, time.time() - t0)
    times[name] = best
    print(f"{name:35s} {best:6.2f}", flush=True)
print(f"subtotal {sum(times.values()):.1f} s  "
      f"(SP_PANDAS={SP_PANDAS} SP_JVM={SP_JVM} ARROW_MAX={ARROW_MAX})")
spark.stop()
