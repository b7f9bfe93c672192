#!/usr/bin/env python
"""ANN throughput soak: brute-force vs persisted-IVF top-k at corpus sizes
the sf tables don't reach (default 1M vectors, dim 64).

The byte-cut side of the ANN scale story is already measured
(scripts/ivfpq_bytes_bench.py, SCALE.md "Trainers / indexes"); this soak
measures the QUERY side: wall time of exact brute-force cosine top-k vs
`ivf_index_topk` over a `write_ivf_index` layout, plus recall@k of the
pruned search against the exact baseline — the speed/recall trade that
justifies the index at 100 TB.

Corpus is generated deterministically IN Spark (xxhash64-derived
coordinates, per-coordinate distinct so nothing dictionary-compresses
into an unrealistically small index) and materialized to parquet first:
both paths read real files, not a cached lineage.

Env: ANN_N (corpus size, default 1_000_000), ANN_K (centroids, 256),
ANN_NPROBE (8), ANN_NQ (queries, 32), ANN_TOPK (10), RUNS (3),
ANN_DIR (workdir, default /tmp/ann_soak).
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from core_etl_spark.operators import similarity as S  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("ANN_N", "1000000"))
K = int(os.environ.get("ANN_K", "256"))
NPROBE = int(os.environ.get("ANN_NPROBE", "8"))
NQ = int(os.environ.get("ANN_NQ", "32"))
TOPK = int(os.environ.get("ANN_TOPK", "10"))
RUNS = int(os.environ.get("RUNS", "3"))
DIM = 64
ROOT = os.environ.get("ANN_DIR", "/tmp/ann_soak")


def main() -> None:
    spark = get_spark(app_name="ann_throughput_soak")
    shutil.rmtree(ROOT, ignore_errors=True)
    corpus_path = f"{ROOT}/corpus"
    index_path = f"{ROOT}/ivf"

    # deterministic synthetic corpus with CLUSTER STRUCTURE (real
    # embeddings cluster; uniform random is IVF's worst case and would
    # understate recall): vector i belongs to cluster c = i mod CLUSTERS,
    # coord j = 0.8·hash(c, j) + 0.2·hash(i, j), both hashes mapped to
    # [-1, 1), rounded to the module's 3-dp decimal grid. Every
    # coordinate stays distinct (the noise term), so the parquet doesn't
    # dictionary-compress into a toy index (the r10 ivfpq lesson).
    clusters = int(os.environ.get("ANN_CLUSTERS", "1024"))
    t0 = time.perf_counter()

    def _unit(a, b):  # hash(a, b) → [-1, 1)
        return (
            F.pmod(F.xxhash64(a, b), F.lit(2_000_000)) / F.lit(1_000_000.0)
            - F.lit(1.0)
        )

    (
        spark.range(N)
        .select(
            F.col("id").alias("vec_id"),
            F.pmod(F.col("id"), F.lit(clusters)).alias("_c"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: F.round(
                    F.lit(0.8) * _unit(F.col("_c"), j + F.lit(1_000_000))
                    + F.lit(0.2) * _unit(F.col("id"), j),
                    3,
                ),
            ).alias("embedding"),
        )
        .drop("_c")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    gen_s = time.perf_counter() - t0
    corpus = spark.read.parquet(corpus_path)
    # orderBy before limit: a bare limit over the pmod filter is
    # plan/partition-dependent whenever the filter passes more than NQ
    # rows, so the brute and IVF runs could measure DIFFERENT query sets
    # (and recall would count phantom misses)
    queries = (
        corpus.filter(F.pmod(F.col("vec_id"), F.lit(max(1, N // NQ))) == 0)
        .orderBy("vec_id")
        .limit(NQ)
    )
    nq = queries.count()
    print(f"corpus N={N} dim={DIM} gen={gen_s:.1f}s queries={nq}", flush=True)

    # index build (one-off): KMeans centroids on a sample + partitioned lists
    t0 = time.perf_counter()
    frac = min(1.0, 50_000 / N)
    cents = S.kmeans_centroids(corpus, K, sample_fraction=frac)
    S.write_ivf_index(corpus, index_path, vec_col="embedding", id_col="vec_id", centroids=cents)
    build_s = time.perf_counter() - t0
    print(f"ivf build (kmeans K={K} on {frac:.3f} sample + lists): {build_s:.1f}s", flush=True)

    def timed(fn) -> tuple[float, list]:
        best, rows = None, None
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            r = fn().collect()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, rows = dt, r
        return best, rows

    brute_s, brute_rows = timed(
        lambda: S.brute_force_topk(corpus, queries, k=TOPK, dim=DIM)
    )
    ivf_s, ivf_rows = timed(
        lambda: S.ivf_index_topk(spark, index_path, queries, k=TOPK, nprobe=NPROBE)
    )

    exact = {}
    for r in brute_rows:
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for r in ivf_rows if r.neighbor_id in exact.get(r.query_id, set())
    )
    recall = hits / max(1, len(brute_rows))
    print(
        f"brute={brute_s:.2f}s ivf={ivf_s:.2f}s speedup={brute_s / ivf_s:.1f}x "
        f"recall@{TOPK}={recall:.3f} (nprobe={NPROBE}/{K} cells "
        f"= {NPROBE / K:.3f} of the corpus scanned)",
        flush=True,
    )
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
