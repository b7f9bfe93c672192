#!/usr/bin/env python
"""Corrupt-data soak at sf1 for the dedup family (VERDICT r13 stretch 7).

The adversarial sweep proves corrupt-data SEMANTICS at sf0.001; this
script proves the robustness machinery — the blank-doc shingle valve,
the non-empty tokenization, the NULL-propagation rules — holds its
LINEAR SCALING with realistic dirt ratios at sf1 (50k docs, ~13% of
them corrupted: NULL / empty / whitespace text, NULL lang/source).

Method: corrupt the sf0.1 documents table exactly the way the sweep
does (id-keyed cycle, scripts/adv_data_parity.py), then scale 10x by
the vocabulary-disjoint replication scale_soak.py established (replica
r suffixes every token with ``_r``; NULL/blank docs replicate as
NULL/blank — dirt ratio is preserved). Run the real registry builders
for l06x / l07x / c04 and compare wall time against the CLEAN sf1
numbers in SCALE.md (6.0 / 6.8 / 12.8 s).

Usage: python scripts/corrupt_scale_soak.py [out_root] [K] [targets]

``K`` is the replication factor over the corrupted sf0.1 base (default
10 → sf1, the r14 leg; 100 → sf10, VERDICT r14 directive 4 — the same
vocabulary-disjoint replication the clean sf10 rows in SCALE.md used,
so dirty and clean sf10 wall-times are directly comparable; 1000 →
sf100-equivalent, 5M docs, VERDICT r15 directive 8 — the banded paths
only: pass ``targets`` as a comma list, the all-pairs-adjacent l06x
shingle self-join is deliberately out of scope at that size).
``targets`` defaults to the full TARGETS tuple.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
OFFSET = 10_000_000
TARGETS = ("l06x_ngram_jaccard_xxhash", "l07x_minhash_lsh_xxhash",
           "c04_fuzzy_dedup")


def corrupt_documents(src: str, dst_parquet: str) -> None:
    """The sweep's id-keyed documents corruption (adv_data_parity.py),
    applied to the sf0.1 table."""
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT doc_id,
                   CASE doc_id % 23
                        WHEN 0 THEN NULL
                        WHEN 1 THEN ''
                        WHEN 2 THEN '   '
                        ELSE text END AS text,
                   CASE WHEN doc_id % 23 = 3 THEN NULL ELSE lang END AS lang,
                   CASE WHEN doc_id % 23 = 4 THEN NULL ELSE source END AS source,
                   n_chars
            FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst_parquet}' (FORMAT PARQUET)
    """)


def scale_kx(spark, corrupted_parquet: str, out_dir: str, k: int) -> None:
    base = spark.read.parquet(corrupted_parquet)
    reps = spark.range(k).withColumnRenamed("id", "r")
    # Suffix only REAL tokens (r15): split('') yields [''] and split('   ')
    # yields ['','',''] — suffixing those turned every blank doc in replica
    # r into the identical one-token doc '_r', i.e. the generator
    # fabricated ~217-doc cliques of genuinely identical docs per replica
    # (~4.7M true near-dup pairs at sf10) that say nothing about dirt
    # handling. Dropping empty fragments first keeps blank docs blank, so
    # the dirt ratio AND the known pair counts replicate unchanged.
    suffixed = F.array_join(
        F.transform(
            F.filter(F.split(F.col("text"), " "), lambda t: t != ""),
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


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corrupt_scale_soak"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    targets = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else TARGETS
    os.makedirs(out_root, exist_ok=True)
    spark = get_spark(app_name="corrupt_scale_soak")
    spark.sparkContext.setLogLevel("ERROR")

    corrupted = os.path.join(out_root, "documents_corrupt_sf0.1.parquet")
    if not os.path.exists(corrupted):
        corrupt_documents(BASE, corrupted)
        print("corrupted sf0.1 documents", flush=True)
    out_dir = os.path.join(out_root, f"sf{k / 10:g}_corrupt")
    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        t0 = time.monotonic()
        scale_kx(spark, corrupted, out_dir, k)
        print(f"scaled {k}x in {time.monotonic()-t0:.1f}s", flush=True)

    n_docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet")).count()
    print(f"sf{k / 10:g} corrupt corpus: {n_docs} docs (~13% dirty)", flush=True)

    specs = all_specs()
    for q in targets:
        # Reclaim the previous query's localCheckpoint blocks NOW (same as
        # scale_soak.py): the ContextCleaner frees them only after a driver
        # GC notices, and at sf10 several GB of stale blocks otherwise sit
        # in the one local-mode heap — the first K=100 run of this script
        # OOMed in l07x's checkpoint for exactly that reason.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        rows = specs[q].builder(spark, out_dir).count()
        print(f"{q}: {time.monotonic()-t0:.1f}s  rows={rows}", flush=True)


if __name__ == "__main__":
    main()
