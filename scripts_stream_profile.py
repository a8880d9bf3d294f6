"""Round-8: per-micro-batch duration decomposition for the streaming
drains (throwaway). Patches run_to_completion to dump lastProgress
durationMs per batch."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
ONLY = os.environ.get(
    "ONLY",
    "streaming_value_ema_ooo,streaming_sessionize_flush,"
    "streaming_full_outer_join",
)

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

_orig = P.run_to_completion


def patched(stream, query_name, output_mode="append",
            shuffle_partitions=None, spark=None, no_data_batch=True):
    import shutil
    import tempfile
    import uuid

    if callable(stream):
        session = (P._drain_session(spark, shuffle_partitions, no_data_batch)
                   if shuffle_partitions is not None else spark)
        stream_df = stream(session)
    else:
        stream_df = stream
        session = stream_df.sparkSession
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    run_id = uuid.uuid4().hex
    ckpt = os.path.join(base, f"prof-{query_name}-{run_id}")
    sink = f"{query_name}_{run_id[:12]}"
    t0 = time.time()
    q = (stream_df.writeStream.format("memory").queryName(sink)
         .outputMode(output_mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    print(f"\n=== {query_name}: wall {wall:.2f}s, "
          f"{len(q.recentProgress)} progress entries ===")
    for p in q.recentProgress:
        d = p.get("durationMs", {})
        rows = p.get("numInputRows", 0)
        so = p.get("stateOperators", [])
        st = ";".join(
            f"rows={s.get('numRowsTotal')},upd={s.get('numRowsUpdated')},"
            f"commit={s.get('allUpdatesTimeMs',0)}+{s.get('commitTimeMs',0)}"
            for s in so)
        print(f"  batch {p.get('batchId')}: in={rows} "
              f"trig={d.get('triggerExecution')} add={d.get('addBatch')} "
              f"plan={d.get('queryPlanning')} wal={d.get('walCommit')} "
              f"off={d.get('commitOffsets')} get={d.get('getBatch')} "
              f"latest={d.get('latestOffset')}  [{st}]")
    shutil.rmtree(ckpt, ignore_errors=True)
    return session.table(sink)


P.run_to_completion = patched

from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402

specs = all_specs()
spark.range(10).count()
for name in ONLY.split(","):
    t0 = time.time()
    specs[name].spark_fn(spark, SF).collect()
    print(f"TOTAL {name}: {time.time()-t0:.2f}s (incl. finishing)")
spark.stop()
