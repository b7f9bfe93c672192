#!/usr/bin/env python
"""Skewed-join soak — turns the g23 salting story from plan-shape into
measurement, completing the soak set (dedup / relational / ingest / skew).

Shape: a 60M-row fact where ONE key owns 25% of all rows (15M), joined to
a 1M-row dim that is too wide to broadcast (64-char padding, ~100 MB —
over the 10 MB auto-broadcast threshold, so the plan is a shuffle join
and the hot key lands on a single reducer unless something intervenes).
Three strategies over the identical join, validated to produce identical
(rows, checksum):

1. **naive**     — AQE skew-join OFF: the straggler baseline.
2. **aqe-skew**  — AQE skew-join ON. The skewed-partition THRESHOLD is
   lowered (256 MB → 32 MB) so the optimizer sees the same hot/median
   RATIO it would see at cluster scale — at the default threshold a local
   ~240 MB hot partition sits just under the trigger and splits never
   happen; at 100 TB the defaults trigger naturally.
3. **salted**    — operators/skew.py::salted_join (explicit n_salts=32
   spread; the strategy for engines/joins where AQE can't help, e.g.
   when the skewed side feeds a window next).

Aggregation skew is deliberately NOT part of this soak: combinable aggs
(count/sum/avg/percentile_approx/countDistinct) are absorbed map-side by
partial aggregation, so a hot GROUP BY key never concentrates raw rows on
one reducer — salted_count/salted_sum exist for the non-combinable tail
(g22's oracle documents this). Joins and windows are where skew bites.

Usage: python scripts/skew_soak.py [n_rows] [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.operators.skew import salted_join
from core_etl_spark.session import get_spark

HOT = 0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="skew_soak", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    # 25% of rows on the hot key, the rest uniform over n_keys.
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 4 == 0, F.lit(HOT))
        .otherwise(F.col("id") % n_keys)
        .alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.lpad(F.conv(F.col("id").cast("string"), 10, 16), 64, "x").alias("pad"),
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_soak/fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_soak/dim")
    fact = spark.read.parquet("/tmp/skew_soak/fact")
    dim = spark.read.parquet("/tmp/skew_soak/dim")

    def check(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("v") * F.length("pad")).alias("chk"),
        ).collect()[0]
        return row["n"], row["chk"]

    def run(label, fn, confs):
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            n, chk = check(fn())
            wall = time.monotonic() - t0
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
        rec = {"strategy": label, "wall_s": round(wall, 1), "rows": n, "chk": chk}
        print(json.dumps(rec), flush=True)
        return rec

    plain = lambda: fact.join(dim, "k")
    results = [
        run("naive", plain, {"spark.sql.adaptive.skewJoin.enabled": "false"}),
        run("aqe-skew", plain, {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        }),
        run("salted", lambda: salted_join(fact, dim, "k", n_salts=32), {}),
    ]
    assert len({(r["rows"], r["chk"]) for r in results}) == 1, results
    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
