#!/usr/bin/env python
"""Stateful-streaming state-store soak — the one query family without a
SCALE.md row (r10).

Streams N-key fingerprint batches through BOTH stateful-dedup paths —
`first_seen` (applyInPandasWithState: Python-side state, Arrow transfer)
and `dropDuplicatesWithinWatermark` (JVM-side state) — under the default
heap state provider AND RocksDB (+changelog checkpointing), at 100k / 1M
/ 5M distinct keys with a 2× duplication factor. Measures wall per run
and asserts the emitted row count equals the distinct-key count on every
(op, provider, N) cell, so the provider swap and the 50× state growth
are both correctness-checked, not just timed.

What this shows that the batch soaks can't: per-key state behavior as
key cardinality grows — the 100 TB-ingest question ("does the dedup
horizon fit?") is a state-store question, not a shuffle question. Heap
state lives in the executor JVM and dies by OOM at some cardinality;
RocksDB spills to local disk and (with changelog) uploads deltas. The
crossover measured here is the sizing rule for production horizons.

Usage: python scripts/stateful_soak.py [n_files] [keys...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.session import ROCKSDB_STATE_PROVIDER, get_spark
from core_etl_spark.streaming.stateful import first_seen

KEY_COUNTS = (100_000, 1_000_000, 5_000_000)


def gen_source(spark, src: str, n_keys: int, n_files: int) -> None:
    """n_files parquet files (one per trigger under maxFilesPerTrigger=1),
    together holding every key twice (offset halves duplicate), so dedup
    state must hold all n_keys by the final batch."""
    os.makedirs(src, exist_ok=True)
    per = (2 * n_keys) // n_files
    for i in range(n_files):
        (
            spark.range(i * per, (i + 1) * per)
            .select(
                F.concat(F.lit("fp"), (F.col("id") % n_keys).cast("string")).alias("fp"),
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 60).alias("ts"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"f{i:03d}"))
        )


def run_first_seen(spark, src: str, ck: str, n_files: int) -> int:
    counts = []
    stream = spark.readStream.schema("fp string, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(os.path.join(src, "f*"))
    q = (
        first_seen(stream.select("fp"), "fp")
        .writeStream.foreachBatch(lambda b, _i: counts.append(b.count()))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(counts)


def run_ddww(spark, src: str, ck: str, n_files: int) -> int:
    counts = []
    stream = spark.readStream.schema("fp string, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(os.path.join(src, "f*"))
    q = (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["fp"])
        .writeStream.foreachBatch(lambda b, _i: counts.append(b.count()))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(counts)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    keys = [int(k) for k in sys.argv[2:]] or list(KEY_COUNTS)
    spark = get_spark(app_name="stateful_soak")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stateful_soak_")
    try:
        for n_keys in keys:
            src = os.path.join(root, f"src_{n_keys}")
            gen_source(spark, src, n_keys, n_files)
            providers = tuple(
                os.environ.get("STATEFUL_SOAK_PROVIDERS", "heap,rocksdb").split(",")
            )
            for provider in providers:
                if provider == "rocksdb":
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass",
                        ROCKSDB_STATE_PROVIDER,
                    )
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.rocksdb."
                        "changelogCheckpointing.enabled",
                        "true",
                    )
                else:
                    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
                for op, fn in (("first_seen", run_first_seen), ("ddww", run_ddww)):
                    ck = os.path.join(root, f"ck_{n_keys}_{provider}_{op}")
                    t0 = time.monotonic()
                    emitted = fn(spark, src, ck, n_files)
                    wall = time.monotonic() - t0
                    status = "OK" if emitted == n_keys else f"MISMATCH({emitted})"
                    print(
                        f"keys={n_keys:>9,} provider={provider:7s} op={op:10s} "
                        f"wall={wall:6.1f}s emitted={emitted:,} {status}",
                        flush=True,
                    )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
