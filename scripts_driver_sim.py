"""Fresh-process full-registry driver simulation: run every registered
query AND its DuckDB oracle at the given SF, compare like the driver's
correctness gate (rows + schema + value hash). Prints failures and a
summary line. SF_DIR env overrides (default sf0.01)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

from pyspark.sql import SparkSession

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

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

from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402
from tests.oracle_compare import compare_query, duckdb_connection  # noqa: E402

specs = all_specs()
con = duckdb_connection(SF)
t0 = time.time()
ok_n = 0
fails = []
for i, (name, spec) in enumerate(specs.items(), 1):
    try:
        ok, msg = compare_query(spark, con, spec, SF)
    except Exception as e:  # noqa: BLE001
        ok, msg = False, f"EXC {type(e).__name__}: {e}"
    if ok:
        ok_n += 1
    else:
        fails.append((name, msg))
        print(f"FAIL {name}: {msg}", flush=True)
    if i % 25 == 0:
        print(f"  ... {i}/{len(specs)} ({ok_n} ok, {time.time()-t0:.0f}s)",
              flush=True)
print(f"RESULT {ok_n}/{len(specs)} green at {SF} in {time.time()-t0:.0f}s")
for n, m in fails:
    print("  failed:", n, m)
spark.stop()
sys.exit(0 if not fails else 1)
