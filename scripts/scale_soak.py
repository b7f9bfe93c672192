#!/usr/bin/env python
"""sf1-sf10 scale soak for the dedup/CC/decontamination family — VERDICT
r08 directive 2: the only way a 100 TB claim stops being an argument from
plan shape.

Generates 10x (sf1) and 100x (sf10) documents corpora from the driver's
sf0.1 table by VOCABULARY-DISJOINT replication: replica 0 is the original
text; replica r suffixes every token with ``_r`` — so each replica carries
the original corpus's full pair/shingle structure on its own vocabulary
and the true output (near-dup pairs, LSH candidates, components) scales
exactly linearly while per-shingle document frequency — the skew the
max_shingle_df valve bounds — stays at its sf0.1 level, which is the
realistic growth regime (vocabulary grows with a crawl; a fixed 31-word
vocabulary would saturate every shingle past the valve by 10x and measure
nothing).

Runs the REAL registry builders (l06x, l07x, c04, l34) against the scaled
dirs plus a star-CC soak with linearly scaled chain edges, and records
wall time, output rows, and shuffle read/write bytes (Spark REST API) per
(sf, query).

Usage: python scripts/scale_soak.py [out_root] [--skip-gen]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.operators.dedup import neardup_components_star as star_components
from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
OFFSET = 10_000_000
TARGETS = ("l06x_ngram_jaccard_xxhash", "l07x_minhash_lsh_xxhash",
           "c04_fuzzy_dedup", "l34_bloom_decontamination")


def generate(spark, out_dir: str, k: int) -> None:
    base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    reps = spark.range(k).withColumnRenamed("id", "r")
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("r").cast("string")),
        ),
        " ",
    )
    scaled = base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("r") * OFFSET).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text")).otherwise(suffixed).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    os.makedirs(out_dir, exist_ok=True)
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


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


def chain_edges(spark, n_chains: int, length: int = 64):
    """n_chains disjoint path graphs of `length` nodes — the l18b shape,
    linearly scaled. Worst case for label propagation, O(log n) rounds
    for star-CC."""
    return (
        spark.range(n_chains * (length - 1))
        .select(
            (F.col("id") + (F.col("id") / F.lit(length - 1)).cast("long")).alias("id_a")
        )
        .select("id_a", (F.col("id_a") + 1).alias("id_b"))
    )


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_soak"
    skip_gen = "--skip-gen" in sys.argv
    spark = get_spark(
        app_name="scale_soak", extra_conf={"spark.ui.enabled": "true"}
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
            # Reclaim the previous query's localCheckpoint blocks NOW: the
            # ContextCleaner frees them only after a driver GC notices the
            # dropped references, and at sf10 several GB of stale blocks
            # otherwise sit in the one local-mode heap and starve the next
            # query's broadcast build (found by this soak's first run).
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

    # star-CC chain soak: 200 / 2k / 20k chains of 64 nodes
    for sf_name, n_chains in (("sf0.1", 200), ("sf1", 2000), ("sf10", 20000)):
        edges = chain_edges(spark, n_chains).localCheckpoint(eager=True)
        r0, w0 = shuffle_bytes(spark)
        t0 = time.monotonic()
        n = star_components(
            edges.select(F.col("id_a"), F.col("id_b"))
        ).count()
        wall = time.monotonic() - t0
        r1, w1 = shuffle_bytes(spark)
        rec = {"sf": sf_name, "query": "l18b_star_cc_chains_soak", "rows": n,
               "wall_s": round(wall, 1),
               "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
               "shuffle_write_mb": round((w1 - w0) / 1e6, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("SOAK_RESULTS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
