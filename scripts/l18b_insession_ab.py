#!/usr/bin/env python
"""l18b input-mode A/B under BENCH-SESSION conditions.

The fresh-session A/B (scripts/l18b_ckpt_ab.py) and the full bench
disagree: isolated, input_mode=none wins (~2.67 s); inside a session that
has already executed the l06/l07/l09/l12 pipelines (bench.py runs
families alphabetically, so l18b always follows them) the ranking flips
and eager wins (r10 measurements: eager 2.88 / lazy 2.99 / none 3.42).
This script replays that session state and then A/Bs the modes — the
driver bench measures the in-session shape, so this harness decides the
shipped default.

Usage: python scripts/l18b_insession_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.operators import dedup as D
from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark

PRECEDING = (
    "l06_ngram_jaccard_dedup",
    "l06x_ngram_jaccard_xxhash",
    "l07_minhash_lsh_dedup",
    "l07x_minhash_lsh_xxhash",
    "l09_cosine_topk",
    "l12_ann_ivf_topk",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="l18b_insession_ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    print("replaying preceding llm-family queries...", flush=True)
    for n in PRECEDING:
        specs[n].builder(spark, sf_dir).count()

    spec = specs["l18b_star_cc_chains"]
    for mode in ("eager", "lazy", "none"):
        D.CHECKPOINT_MODE = mode
        spec.builder(spark, sf_dir).count()  # warmup per mode
        walls = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            walls.append(round(time.perf_counter() - t0, 3))
        print(f"{mode:5s} min={min(walls):.3f} runs={walls}", flush=True)
    D.CHECKPOINT_MODE = "eager"
    spark.stop()


if __name__ == "__main__":
    main()
