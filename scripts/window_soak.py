#!/usr/bin/env python
"""sf1-sf10 scale soak for the windowed/sessionization family (g16 tumbling,
g16b sliding, g17 sessionization) — the last query family without a
measured scale row.

Events scale by USER-OFFSET replication: replica r keeps timestamps and
event types but moves users to a disjoint id range (+r*10^9) and event ids
to +r*10^12, so g17's per-user session structure is identical in every
replica (output rows x k, window-function state per user unchanged — the
partition-by-user shuffle gets k x more groups of the SAME size, which is
how user-keyed analytics actually grow) and g16/g16b keep a constant
window-bucket set with counts x k.

Usage: python scripts/window_soak.py [out_root] [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.io import load_tables
from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
TARGETS = ("g16_tumbling_window", "g16b_sliding_window", "g17_sessionization")


def generate(spark, out_dir: str, k: int) -> None:
    ev = load_tables(spark, BASE, ("events",), register=False)["events"]
    reps = spark.range(k).withColumnRenamed("id", "r")
    scaled = (
        ev.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") + F.col("r") * 1_000_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("r") * 1_000_000_000_000)
        .drop("r")
    )
    os.makedirs(out_dir, exist_ok=True)
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/window_soak"
    skip_gen = "--skip-gen" in sys.argv
    spark = get_spark(app_name="window_soak")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {"sf0.1": BASE}
    for name, k in (("sf1", 10), ("sf10", 100)):
        d = os.path.join(out_root, name)
        dirs[name] = d
        if not skip_gen:
            generate(spark, d, k)

    specs = all_specs()
    results = []
    for sf_name, sf_dir in dirs.items():
        for q in TARGETS:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            n = specs[q].builder(spark, sf_dir).count()
            wall = time.monotonic() - t0
            rec = {"sf": sf_name, "query": q, "rows": n, "wall_s": round(wall, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
