#!/usr/bin/env python
"""sf0.1 → sf10 soak for the sketch family (portable vs built-in vs exact).

Same key-offset replication as relational_soak.py (replica r adds
r*1e9 to every key, so distinct cardinality scales WITH the data —
orders custkeys ~10k → ~1M, lineitem rows 600k → 60M). At each scale,
times three cardinality paths (portable md5-HLL / built-in HLL++ /
exact countDistinct), three quantile paths (hash-sample / built-in
percentile_approx / exact percentile), and the CMS heavy-hitter plan,
recording walls plus the estimates themselves so accuracy drift with
scale is visible alongside cost. The question this answers: what does
bit-replayability cost versus the engine-private sketches at 100×, and
does the portable-HLL estimate hold its error bound once the data
outgrows the linear-counting branch?

Usage: python scripts/sketch_soak.py [out_root] [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.operators import sketches
from core_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
OFFSET = 1_000_000_000
SCALE_KEYS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
}


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


def timed(label, sf_name, fn, results):
    t0 = time.monotonic()
    out = fn()
    rec = {"sf": sf_name, "query": label, "wall_s": round(time.monotonic() - t0, 1),
           "result": out}
    results.append(rec)
    print(json.dumps(rec), flush=True)


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sketch_soak"
    skip_gen = "--skip-gen" in sys.argv
    spark = get_spark(app_name="sketch_soak")
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

    results = []
    for sf_name, sf_dir in dirs.items():
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        spark.catalog.clearCache()

        timed("hll_portable", sf_name, lambda: sketches.hll_count_distinct(
            orders, "o_custkey").collect()[0]["estimate"], results)
        timed("hll_builtin", sf_name, lambda: orders.agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("e")
        ).collect()[0]["e"], results)
        timed("distinct_exact", sf_name, lambda: orders.agg(
            F.countDistinct("o_custkey").alias("e")).collect()[0]["e"], results)

        def cms_heavy():
            sketch = sketches.cms_build(li, "l_suppkey")
            probes = (
                li.groupBy("l_suppkey").agg(F.count("*").alias("exact_n"))
                .orderBy(F.col("exact_n").desc(), F.col("l_suppkey")).limit(5)
            )
            est = sketches.cms_estimate(sketch, probes.select("l_suppkey"),
                                        "l_suppkey")
            rows = probes.join(est, "l_suppkey").collect()
            return [{"exact": r["exact_n"], "cms": r["cms_n"]} for r in rows]
        timed("cms_heavy_hitters", sf_name, cms_heavy, results)

        def hot_keys():
            from core_etl_spark.operators import skew
            skewed = li.select(
                F.when(F.col("l_orderkey") % 4 == 0, F.lit(-1))
                .when(F.col("l_orderkey") % 4 == 1, F.lit(-2))
                .otherwise(F.col("l_orderkey")).cast("long").alias("k"),
                F.concat_ws("_", F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string")).alias("rk"),
            )
            rows = skew.detect_hot_keys(skewed, "k", F.col("rk"), 0.05).collect()
            return sorted((r["k"], round(r["est_share"], 4)) for r in rows)
        timed("hot_key_detection", sf_name, hot_keys, results)

        key = F.concat_ws("_", F.col("l_orderkey").cast("string"),
                          F.col("l_linenumber").cast("string"))
        timed("quantile_sample", sf_name, lambda: sketches.sampled_quantiles(
            li, "l_extendedprice", key, probs=(0.5,), shift=4
        ).collect()[0]["p50"], results)
        timed("quantile_builtin", sf_name, lambda: li.agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p")
        ).collect()[0]["p"], results)
        timed("quantile_exact", sf_name, lambda: li.agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p")
        ).collect()[0]["p"], results)

    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
