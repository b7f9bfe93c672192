#!/usr/bin/env python
"""sf1-sf10 scale soak for the relational/join family — the shuffle-heavy
counterpart of scripts/scale_soak.py (which covered dedup/CC/decontam).

Generates 10x (sf1) and 100x (sf10) TPC-H-ish warehouses from the driver's
sf0.1 tables by KEY-OFFSET replication: replica r adds r*OFFSET to every
join key (orderkey, custkey, suppkey, partkey), so each replica is a
disjoint sub-warehouse with the original's full join structure — fact AND
scaling-dimension tables grow together exactly as TPC-H scales them
(lineitem 600k→60M, orders 150k→15M, customer 15k→1.5M at sf10), while
nation/region stay fixed. True outputs are known by construction: g01's
group set is unchanged with values ×k, g03's per-nation revenue is ×k,
g02's top-10 re-ranks across replicas (ties split by orderkey).

What this measures that the dedup soak could not:

- the partial/final hash-agg path under 100× scan growth (g01);
- a 3-way fact join whose "small" side outgrows the broadcast threshold —
  at sf0.1 the filtered customer side broadcasts, at sf10 AQE must flip
  g02 to a shuffle join; the soak proves the plan survives the flip;
- g03's star join with explicit broadcast hints on SCALING dimensions
  (customer/supplier) — the hint is a bet that post-filter dims stay
  executor-memory-small; the soak measures where that bet breaks.

Runs the REAL registry builders against the scaled dirs and records wall
time, output rows, and shuffle read/write deltas (Spark REST API).

Usage: python scripts/relational_soak.py [out_root] [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
OFFSET = 1_000_000_000
SCALE_KEYS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
}
FIXED = ("region", "nation")
TARGETS = (
    "g01_hash_agg_tpch_q1",
    "g02_join_agg_topk_tpch_q3",
    "g03_star_join_tpch_q5",
)


def generate(spark, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(k).withColumnRenamed("id", "r")
    for tbl, keys in SCALE_KEYS.items():
        df = spark.read.parquet(os.path.join(BASE, f"{tbl}.parquet"))
        scaled = df.crossJoin(reps)
        for key in keys:
            scaled = scaled.withColumn(key, F.col(key) + F.col("r") * OFFSET)
        scaled.drop("r").repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{tbl}.parquet")
        )
    for tbl in FIXED:
        dst = os.path.join(out_dir, f"{tbl}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE, f"{tbl}.parquet"), dst)


def shuffle_bytes(spark) -> tuple[int, int]:
    """(shuffle_read, shuffle_write) summed over all completed stages."""
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
    except Exception:
        return (0, 0)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rel_soak"
    skip_gen = "--skip-gen" in sys.argv
    spark = get_spark(
        app_name="relational_soak", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {"sf0.1": BASE}
    for name, k in (("sf1", 10), ("sf10", 100)):
        d = os.path.join(out_root, name)
        dirs[name] = d
        if not skip_gen:
            t0 = time.monotonic()
            generate(spark, d, k)
            print(f"generated {name} (k={k}) in {time.monotonic()-t0:.1f}s",
                  flush=True)

    specs = all_specs()
    results = []
    for sf_name, sf_dir in dirs.items():
        for q in TARGETS:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            r0, w0 = shuffle_bytes(spark)
            t0 = time.monotonic()
            n = specs[q].builder(spark, sf_dir).count()
            wall = time.monotonic() - t0
            r1, w1 = shuffle_bytes(spark)
            rec = {"sf": sf_name, "query": q, "rows": n,
                   "wall_s": round(wall, 1),
                   "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                   "shuffle_write_mb": round((w1 - w0) / 1e6, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
