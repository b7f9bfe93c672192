#!/usr/bin/env python
"""IVF vs IVF-PQ probe byte-count bench — VERDICT r08 stretch 8: put a
measured number behind similarity.py's "~100x fewer bytes per probe"
docstring.

Scales the sf0.1 embeddings table 10x (sf1-equivalent: 20k vectors, ids
offset per replica — byte accounting only cares about row count and
vector width), builds BOTH persisted indexes with identical centroids
(the deterministic first-K default, so the probed cells match exactly),
runs the same query batch through each, and reports:

- on-disk bytes of the full inverted lists (parquet, du -s equivalent);
- bytes of the PROBED cell directories (what a query batch's partition
  filter actually admits);
- actual scan input bytes per query (Spark REST inputBytes delta).

Usage: python scripts/ivfpq_bytes_bench.py [k_replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from core_etl_spark.operators import similarity as S
from core_etl_spark.session import get_spark


def tree_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def input_bytes(spark) -> int:
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages") as r:
            return sum(s.get("inputBytes", 0) for s in json.load(r))
    except Exception:
        return 0


def main() -> None:
    k_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(
        app_name="ivfpq_bytes", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    reps = spark.range(k_rep).withColumnRenamed("id", "r")
    corpus = (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("r") * 10_000_000).alias("vec_id"), "embedding"
        )
        .localCheckpoint(eager=True)
    )
    queries = base.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    n_vec = corpus.count()

    root = tempfile.mkdtemp(prefix="ivfpq_bytes_")
    try:
        t0 = time.monotonic()
        S.write_ivf_index(corpus, f"{root}/ivf", n_centroids=16)
        t_ivf = time.monotonic() - t0
        t0 = time.monotonic()
        S.write_ivfpq_index(corpus, f"{root}/ivfpq", n_centroids=16, m=4, ksub=16)
        t_pq = time.monotonic() - t0

        ivf_lists = tree_bytes(f"{root}/ivf/lists")
        pq_lists = tree_bytes(f"{root}/ivfpq/lists")
        print(
            f"n_vectors={n_vec} | full lists on disk: ivf={ivf_lists:,} B "
            f"ivfpq={pq_lists:,} B ratio={ivf_lists / pq_lists:.1f}x "
            f"(build {t_ivf:.1f}s / {t_pq:.1f}s)",
            flush=True,
        )

        results = {}
        for name, fn, path in (
            ("ivf", S.ivf_index_topk, f"{root}/ivf"),
            ("ivfpq", S.ivfpq_index_topk, f"{root}/ivfpq"),
        ):
            b0 = input_bytes(spark)
            out = fn(spark, path, queries, k=5, nprobe=3)
            rows = out.count()
            b1 = input_bytes(spark)
            results[name] = {"rows": rows, "scan_bytes": b1 - b0}
            print(f"{name}: topk rows={rows} scan_input_bytes={b1 - b0:,}",
                  flush=True)
        r = results["ivf"]["scan_bytes"] / max(results["ivfpq"]["scan_bytes"], 1)
        print(f"probe scan ratio (ivf/ivfpq): {r:.1f}x", flush=True)

        # probed-directory bytes over the cells the queries ACTUALLY probe
        # (ADVICE r09: the old code summed the first 3 listdir entries —
        # arbitrary filesystem order). Replay the query's own probe
        # ranking: top-nprobe centroids by cosine per query, same as
        # ivf_index_topk / ivfpq_index_topk. Both indexes share the
        # deterministic centroids, so one probed-cell set serves both.
        cents = spark.read.parquet(f"{root}/ivf/centroids")
        q = S.with_norm(queries, "embedding", parallelize=False).select(
            F.col("vec_id").alias("query_id"),
            F.col("_dec").alias("q_dec"),
            F.col("_normsq").alias("q_normsq"),
        )
        qscored = q.crossJoin(F.broadcast(cents)).withColumn(
            "_cos",
            S.cosine(S._dot(F.col("q_dec"), F.col("c_dec")),
                     F.col("q_normsq"), F.col("c_normsq")),
        )
        wq = W.partitionBy("query_id").orderBy(F.desc("_cos"), "cent_id")
        probed_cells = sorted({
            r.cell
            for r in qscored.withColumn("_pr", F.row_number().over(wq))
            .filter(F.col("_pr") <= 3)
            .select(F.col("cent_id").alias("cell"))
            .distinct()
            .collect()
        })
        probed = [f"cell={c}" for c in probed_cells]
        ivf_probe = sum(tree_bytes(os.path.join(f"{root}/ivf/lists", d)) for d in probed)
        pq_probe = sum(
            tree_bytes(os.path.join(f"{root}/ivfpq/lists", d)) for d in probed
        )
        print(
            f"{len(probed)} probed cell dirs {probed_cells}: "
            f"ivf={ivf_probe:,} B ivfpq={pq_probe:,} B "
            f"ratio={ivf_probe / pq_probe:.1f}x",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
