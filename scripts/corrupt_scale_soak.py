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

Usage: python scripts/corrupt_scale_soak.py [out_root]
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


def scale_10x(spark, corrupted_parquet: str, out_dir: str) -> None:
    base = spark.read.parquet(corrupted_parquet)
    reps = spark.range(10).withColumnRenamed("id", "r")
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


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corrupt_scale_soak"
    os.makedirs(out_root, exist_ok=True)
    spark = get_spark(app_name="corrupt_scale_soak")
    spark.sparkContext.setLogLevel("ERROR")

    corrupted = os.path.join(out_root, "documents_corrupt_sf0.1.parquet")
    if not os.path.exists(corrupted):
        corrupt_documents(BASE, corrupted)
        print("corrupted sf0.1 documents", flush=True)
    sf1_dir = os.path.join(out_root, "sf1_corrupt")
    if not os.path.exists(os.path.join(sf1_dir, "documents.parquet")):
        t0 = time.monotonic()
        scale_10x(spark, corrupted, sf1_dir)
        print(f"scaled to sf1 (10x) in {time.monotonic()-t0:.1f}s", flush=True)

    n_docs = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet")).count()
    print(f"sf1 corrupt corpus: {n_docs} docs (~13% dirty)", flush=True)

    specs = all_specs()
    for q in TARGETS:
        t0 = time.monotonic()
        rows = specs[q].builder(spark, sf1_dir).count()
        print(f"{q}: {time.monotonic()-t0:.1f}s  rows={rows}", flush=True)


if __name__ == "__main__":
    main()
