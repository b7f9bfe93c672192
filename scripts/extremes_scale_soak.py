#!/usr/bin/env python
"""Extremes soak at sf1 for the guard-carrying families (r14).

The numeric/temporal-extremes sweep proves the CONTRACTS at sf0.001;
this script proves the guards themselves — the isnan/try_cast ledger
casts (rule 11), the loglin saturation rail (rule 13), the exact
floor-epoch recipe and the as-of tie handling (rule 15) — are
PERF-NEUTRAL and hold their linear scaling at sf1 with realistic dirt
ratios (~13% of lineitem rows carry a NULL/NaN/1e308/±Inf measure,
~31% of events carry a NULL/non-finite value or an extreme timestamp).

Method: corrupt the sf0.1 tables exactly the way the sweep does
(scripts/adv_data_parity.py, id-keyed, deterministic), then scale 10×
by the offset replication the earlier soaks established (window_soak:
user/event offsets keep per-key state constant; lineitem/orders get
orderkey offsets — corruption is baked into the rows before
replication, so the dirt ratio is preserved exactly). Run the real
registry builders on BOTH the dirty and a clean replica of the same
shape and report the wall-time ratio — the guards' cost is the
difference, everything else is identical work.

Usage: python scripts/extremes_scale_soak.py [out_root]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# running as `python scripts/extremes_scale_soak.py` puts scripts/ itself
# at sys.path[0], which is what resolves this sibling import
from adv_data_parity import build_corrupted_dir  # noqa: E402
from core_etl_spark.io import load_tables
from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
K = 10
#: (spec, tables it reads) — only these tables are replicated per leg.
TARGETS = (
    ("g01_hash_agg_tpch_q1", ("lineitem",)),
    ("g21d_loglin_quantiles", ("lineitem",)),
    ("g16_tumbling_window", ("events",)),
    ("g24_time_range_frame", ("events",)),
    ("j01_asof_join", ("events",)),
)


def replicate(spark, src_dir: str, out_dir: str, tables: set) -> None:
    loaded = load_tables(spark, src_dir, tuple(sorted(tables)), register=False)
    reps = spark.range(K).withColumnRenamed("id", "r")
    os.makedirs(out_dir, exist_ok=True)
    for t, df in loaded.items():
        scaled = df.crossJoin(reps)
        if t == "events":
            scaled = scaled.withColumn(
                "user_id", F.col("user_id") + F.col("r") * 1_000_000_000
            ).withColumn(
                "event_id", F.col("event_id") + F.col("r") * 1_000_000_000_000
            )
        elif t == "lineitem":
            scaled = scaled.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("r") * 100_000_000
            )
        scaled.drop("r").repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/extremes_soak"
    spark = get_spark(app_name="extremes_soak")
    spark.sparkContext.setLogLevel("ERROR")

    tables = {t for _, ts in TARGETS for t in ts}
    dirty_base = os.path.join(out_root, "dirty_base")
    build_corrupted_dir(src=BASE, dst=dirty_base)  # the sweep's own arms
    legs = {
        "clean_sf1": (BASE, os.path.join(out_root, "clean_sf1")),
        "dirty_sf1": (dirty_base, os.path.join(out_root, "dirty_sf1")),
    }
    for _, (src, dst) in legs.items():
        replicate(spark, src, dst, tables)
        # the non-replicated tables the builders might touch resolve from
        # the same dir — copy the (corrupted) originals over
        for t in ("orders", "region", "nation"):
            p = os.path.join(src, f"{t}.parquet")
            if os.path.exists(p):
                import shutil

                d = os.path.join(dst, f"{t}.parquet")
                # re-run friendly (ADVICE r14): refresh existing copies
                # instead of raising FileExistsError/IsADirectoryError
                if os.path.isdir(p):
                    shutil.copytree(p, d, dirs_exist_ok=True)
                else:
                    if os.path.isdir(d):
                        shutil.rmtree(d)
                    shutil.copyfile(p, d)

    specs = all_specs()
    results = []
    for leg, (_, d) in legs.items():
        for q, _t in TARGETS:
            spark.catalog.clearCache()
            best = None
            for _ in range(2):  # min-of-2: the second run strips scan warmup
                t0 = time.monotonic()
                n = specs[q].builder(spark, d).count()
                w = time.monotonic() - t0
                best = w if best is None else min(best, w)
            rec = {"leg": leg, "query": q, "rows": n, "wall_s": round(best, 2)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
