"""Oracle replay for a named query subset at one SF (r16 dev tool):
ONLY=q1,q2 SF_DIR=/root/testdata/sf0.01 python scripts_subset_oracle.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

from pyspark.sql import SparkSession

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
ONLY = [s for s in os.environ.get("ONLY", "").split(",") if s]

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
fails = []
for name in ONLY:
    try:
        ok, msg = compare_query(spark, con, specs[name], SF)
    except Exception as e:  # noqa: BLE001
        ok, msg = False, f"EXC {type(e).__name__}: {e}"
    print(("OK  " if ok else "FAIL") + f" {name}" + ("" if ok else f": {msg}"),
          flush=True)
    if not ok:
        fails.append(name)
print(f"RESULT {len(ONLY) - len(fails)}/{len(ONLY)} at {SF} "
      f"in {time.time()-t0:.0f}s")
spark.stop()
sys.exit(0 if not fails else 1)
