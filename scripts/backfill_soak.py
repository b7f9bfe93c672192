#!/usr/bin/env python
"""10x/100x scale soak for the o1 backfill pipeline — the ingest-path
counterpart of scale_soak.py (dedup) and relational_soak.py (joins).

Runs the REAL ``backfill`` (normalize + CBC20 decode + receipt join +
partitioned lake writes + prefetch pipelining) over fixture chains of
500 / 5,000 / 50,000 blocks (x4 txs each: 2k / 20k / 200k transactions),
with the o1 spec's chunk shape held constant (2 chunks, so chunk size
scales with the chain — the realistic backfill knob: a 100x deeper chain
gets bigger batches, not 100x more sequential round-trips) and the lake's
bucket_size fixed at the o1 production value (125 blocks/bucket — bucket
COUNT grows 100x, which is exactly what a date/height-partitioned lake
does at 100 TB; file-count pathology would show up here as superlinear
write wall time).

Records wall seconds, ingested blocks, and per-table row counts.

Usage: python scripts/backfill_soak.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.lake import Lake
from core_etl_spark.pipeline import backfill
from core_etl_spark.session import get_spark
from core_etl_spark.sources.fixtures import WATCH_CONTRACT
from core_etl_spark.sources.provider import FixtureBlockProvider


def main() -> None:
    spark = get_spark(app_name="backfill_soak")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for label, nb in (("x1", 500), ("x10", 5_000), ("x100", 50_000)):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        root = tempfile.mkdtemp(prefix=f"backfill_soak_{label}_")
        lake = Lake(spark, root, bucket_size=125)
        provider = FixtureBlockProvider(n_blocks=nb, txs_per_block=4)
        try:
            t0 = time.monotonic()
            n = backfill(
                spark, lake, provider, (WATCH_CONTRACT,), chunk_size=nb // 2
            )
            wall = time.monotonic() - t0
            rec = {
                "scale": label,
                "n_blocks": n,
                "wall_s": round(wall, 1),
                "blocks": lake.blocks().count(),
                "transactions": lake.transactions().count(),
                "token_transfers": lake.token_transfers().count(),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
