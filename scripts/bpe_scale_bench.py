#!/usr/bin/env python
"""Batched-BPE scale bench — VERDICT r08 directive 3's "Done" evidence.

Trains >=5000 BPE merges over a 10k-distinct-word corpus (md5 hex of
event_id — the synthetic documents table has only 31 distinct words, which
exhausts BPE at 89 merges, so the hex corpus is the deterministic
high-cardinality stand-in) and records rounds, Spark job count, and wall
time for the batched trainer vs what the sequential trainer would cost.

Usage: python scripts/bpe_scale_bench.py [sf_dir] [n_merges] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.io import load_tables
from core_etl_spark.operators import text as X
from core_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    spark = get_spark(app_name="bpe_scale_bench")
    sc = spark.sparkContext
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    corpus = ev.select(F.md5(F.col("event_id").cast("string")).alias("text"))

    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        tag = f"bpe-aqe={aqe}"
        sc.setJobGroup(tag, tag)
        t0 = time.monotonic()
        merges = X.bpe_merges(corpus, n_merges=n_merges, batch=batch)
        got = merges.count()
        wall = time.monotonic() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        print(
            f"aqe={aqe} n_merges={n_merges} batch={batch}: trained={got} "
            f"jobs={jobs} wall={wall:.1f}s "
            f"(sequential would be ~{got} rounds / ~{2 * got} jobs)",
            flush=True,
        )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
