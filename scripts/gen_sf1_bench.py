#!/usr/bin/env python
"""Generate a full sf1 bench directory (10× the driver's sf0.1) so the
headline bench can run above the sf0.1 task-dispatch floor (VERDICT r16
directive 6: at sf0.1 the 8-core leg BEATS the 32-core leg — the bench
cannot resolve real compute-bound deltas under ~20%).

The driver's own testdata is read-only and its generator is not in-repo,
so this derives sf1 from sf0.1 by structure-preserving 10× replication
into a SEPARATE root (never /root/testdata):

- fact/key tables (lineitem, orders, customer, supplier, part,
  embeddings): replica r offsets every entity key by r×OFFSET — each
  replica is an FK-consistent sub-database, so join fan-outs, filter
  selectivities and per-key group sizes stay at their sf0.1 values while
  volumes scale exactly 10×;
- documents: vocabulary-disjoint replication (scripts/scale_soak.py) —
  replica r suffixes every token, so pair/shingle structure replicates
  per replica and per-shingle document frequency stays at sf0.1 level
  (a shared vocabulary would saturate the stop-shingle valve and
  measure nothing);
- dimension tables (nation, region) and any table no headline spec
  scales on (events) are copied as-is — events in particular carries
  TIMESTAMP(NANOS) that only survives byte-copying.

Usage: python scripts/gen_sf1_bench.py [out_dir]   (default /root/scaledata/sf1)
then   SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""
from __future__ import annotations

import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from core_etl_spark.session import get_spark  # noqa: E402
from scale_soak import generate as generate_documents  # noqa: E402

BASE = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # same disjoint-id convention as scale_soak
K = 10

#: bigint entity/FK columns to shift per replica, per table
_KEYED = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "embeddings": ("vec_id",),
}
_COPY = ("nation", "region", "events")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/scaledata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="gen_sf1_bench")
    reps = spark.range(K).withColumnRenamed("id", "_r")
    for name, keys in _KEYED.items():
        base = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
        scaled = base.crossJoin(reps)
        for k in keys:
            scaled = scaled.withColumn(k, F.col(k) + F.col("_r") * OFFSET)
        (
            scaled.drop("_r")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{name}.parquet"))
        )
        print(f"scaled {name} x{K}", flush=True)
    for name in _COPY:
        src = os.path.join(BASE, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
        print(f"copied {name}", flush=True)
    generate_documents(spark, out_dir, K)
    print(f"documents x{K} (vocabulary-disjoint)", flush=True)
    print(f"sf1 bench dir ready: {out_dir}", flush=True)


if __name__ == "__main__":
    main()
