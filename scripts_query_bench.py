"""Per-query optimization harness (r15 dev tool, not part of the package).

Times named queries in one warm session with the bench's exact methodology
(noop sink, shuffle_partitions=8, warmup pass first), REPS times each, and
optionally dumps .explain('formatted') per query.

  ONLY=q1,q2 REPS=3 EXPLAIN_DIR=/root/repo/plans/r15 SUFFIX=_before \
      python scripts_query_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402
from data_engineering_etl_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ONLY = [s for s in os.environ.get("ONLY", "").split(",") if s]
REPS = int(os.environ.get("REPS", "3"))
EXPLAIN_DIR = os.environ.get("EXPLAIN_DIR")
SUFFIX = os.environ.get("SUFFIX", "")

spark = get_spark(app_name="qbench", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

specs = all_specs()
names = ONLY or sorted(specs)
out = {}
for name in names:
    spec = specs[name]
    spark.sparkContext.setJobDescription(f"qbench:{name}")
    df = spec.spark_fn(spark, SF_DIR)
    if EXPLAIN_DIR:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(EXPLAIN_DIR, f"{name}{SUFFIX}.txt"), "w") as f:
            f.write(plan)
    # warmup (untimed), then REPS timed runs
    df.write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        spec.spark_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 4))
    out[name] = times
    print(f"{name}: {times}", file=sys.stderr)
print(json.dumps(out))
