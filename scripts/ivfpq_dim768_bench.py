#!/usr/bin/env python
"""IVF-PQ byte shrink at PRODUCTION dims (VERDICT r09 stretch 9).

The dim-64 bench (scripts/ivfpq_bytes_bench.py) measures 8.6× — bounded
by parquet framing over tiny vectors. The docstring claim to substantiate
is the "~100× regime": dim-768 float32 embeddings (~3 KB/row raw) vs the
m=96 / ksub=256 PQ layout (~100 B/row).

Corpus: the sf0.1 embeddings table (2k × dim-64) expanded to dim-768 by
concatenating 12 deterministically-scaled blocks, replicated 10× with
disjoint ids → 20k vectors. Codebooks: first-k (deterministic). Encoding:
``pq_encode_pandas`` — the literal-codebook ``pq_encode`` is O(m·ksub·dsub)
expressions and is the wrong tool at this layout; the script times the
literal plan's CONSTRUCTION alone for the comparison the operator
docstring quotes.

Usage: python scripts/ivfpq_dim768_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.operators import similarity as S
from core_etl_spark.session import get_spark

M, KSUB, N_CENTROIDS = 96, 256, 16


def tree_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    spark = get_spark(app_name="ivfpq_dim768")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    # dim-64 -> dim-768: 12 scaled copies of the base vector (block b is
    # coords * (1 + b/7), rounded to 3 dp) — deterministic, block-diverse
    blocks = [
        F.transform(
            F.col("embedding"), lambda x, b=b: F.round(x * (1.0 + b / 7.0), 3)
        )
        for b in range(12)
    ]
    wide = base.select("vec_id", F.flatten(F.array(*blocks)).alias("embedding"))
    reps = spark.range(10).withColumnRenamed("id", "r")
    # per-(id, coord) deterministic jitter so every coordinate of every
    # vector is distinct — without it the 10x replication (and the 12
    # scaled blocks) dictionary-compress on disk and flatter BOTH layouts
    # (first run of this script measured 137 B/row for dim-768 raw lists,
    # which is a parquet-encoding artifact, not an index property)
    vid = F.col("vec_id") * 10 + F.col("r")
    corpus = (
        wide.crossJoin(reps)
        .select(
            vid.alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, k: F.round(
                    x + F.pmod(vid * 31 + k * 7 + 13, F.lit(997)) / 997.0, 3
                ),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_vec = corpus.count()
    dim = len(corpus.first().embedding)
    print(f"corpus: {n_vec} vectors, dim={dim}", flush=True)

    t0 = time.monotonic()
    cb = S.pq_codebooks_first_k(corpus, m=M, ksub=KSUB)
    t_cb = time.monotonic() - t0
    print(f"codebooks: m={M} ksub={KSUB} dsub={len(cb[0][0])} "
          f"({t_cb:.1f}s)", flush=True)

    # The literal-codebook pq_encode is NOT timed here: measured r10, its
    # plan CONSTRUCTION alone (building the m·ksub·dsub ≈ 200k-expression
    # argmin tree through py4j) had not finished after >7 minutes at this
    # layout — the whole bench below completes first. That asymmetry is
    # the reason pq_encode_pandas exists; see its docstring.

    root = tempfile.mkdtemp(prefix="ivfpq768_")
    try:
        # raw IVF lists (the engine's own uncompressed index format)
        t0 = time.monotonic()
        S.write_ivf_index(corpus, f"{root}/ivf", n_centroids=N_CENTROIDS)
        t_ivf = time.monotonic() - t0
        ivf_bytes = tree_bytes(f"{root}/ivf/lists")

        # PQ lists via the pandas encoder, same cell partitioning
        t0 = time.monotonic()
        # reuse the ivf index's centroids so both layouts share cells
        cents = spark.read.parquet(f"{root}/ivf/centroids")
        n = S.with_norm(corpus, "embedding").select(
            F.col("vec_id").alias("id"), "_dec", "_normsq"
        ).withColumnRenamed("_dec", "dec").withColumnRenamed("_normsq", "normsq")
        cells = S.ivf_assign_cells(n, cents).select("id", "cell")
        codes = S.pq_encode_pandas(corpus, cb)
        (codes.join(cells, "id")
              .repartition("cell")
              .write.mode("overwrite")
              .partitionBy("cell")
              .parquet(f"{root}/ivfpq/lists"))
        t_pq = time.monotonic() - t0
        pq_bytes = tree_bytes(f"{root}/ivfpq/lists")

        raw_fp32 = n_vec * dim * 4
        print(
            f"raw float32 equivalent: {raw_fp32:,} B ({raw_fp32 // n_vec} B/row)\n"
            f"ivf lists (decimal vectors): {ivf_bytes:,} B "
            f"({ivf_bytes // n_vec} B/row, build {t_ivf:.1f}s)\n"
            f"ivfpq lists (m={M} codes):   {pq_bytes:,} B "
            f"({pq_bytes // n_vec} B/row, build {t_pq:.1f}s)\n"
            f"shrink vs ivf lists: {ivf_bytes / pq_bytes:.1f}x | "
            f"vs raw float32: {raw_fp32 / pq_bytes:.1f}x",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
