#!/usr/bin/env python
"""Scale soak for the mergeable log-linear quantile histogram (r11):
600k → 6M → 60M deterministic values, at each scale recording

- wall for histogram+quantiles vs exact ``percentile`` vs the
  deterministic-hash-sample path (the family's other replayable member),
- the histogram's STATE SIZE (bucket rows) — the bounded-state claim is
  that it stays flat while the data grows 100×,
- p50/p95 estimates next to the exact answers — the error-bound claim
  (≤ 1/16-octave before interpolation) should not drift with scale.

Values are a deterministic multiplicative-hash spread over ~(0, 2.1e6):
same distribution at every scale, so estimates are directly comparable.

Usage: python scripts/loglin_soak.py  (prints one JSON line per cell)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.operators import sketches
from core_etl_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="loglin_soak")
    for n in (600_000, 6_000_000, 60_000_000):
        vals = spark.range(n).select(
            (((F.col("id") * 2654435761) % (1 << 31)) / 1000.0).alias("v")
        )
        # exact ``percentile`` buffers the whole group's values in one
        # aggregator — at 60M rows that is the operator the sketches
        # exist to replace, and this soak measured it going from 5.9 s
        # (600k) to 43 s (6M) to not-finishing-in-10-min (60M). The 60M
        # cell therefore reuses the 6M exact values as reference: the
        # value distribution is scale-identical by construction.
        if n <= 6_000_000:
            t0 = time.monotonic()
            exact = vals.agg(
                F.expr("percentile(v, 0.5)").alias("p50"),
                F.expr("percentile(v, 0.95)").alias("p95"),
            ).collect()[0]
            t_exact = round(time.monotonic() - t0, 2)
            last_exact = exact
        else:
            exact, t_exact = last_exact, None

        t0 = time.monotonic()
        hist = sketches.loglin_histogram(vals, "v")
        state_rows = hist.count()
        est = sketches.loglin_quantiles(hist, (0.5, 0.95)).collect()[0]
        t_loglin = time.monotonic() - t0

        t0 = time.monotonic()
        samp = sketches.sampled_quantiles(
            vals, "v", F.col("v"), probs=(0.5, 0.95)
        ).collect()[0]
        t_sample = time.monotonic() - t0

        print(
            json.dumps(
                {
                    "n": n,
                    "wall_exact_s": t_exact,
                    "wall_loglin_s": round(t_loglin, 2),
                    "wall_sample_s": round(t_sample, 2),
                    "state_rows": state_rows,
                    "p50_exact": round(exact["p50"], 1),
                    "p50_loglin": est["p50"],
                    "p50_rel_err": round(est["p50"] / exact["p50"] - 1, 4),
                    "p95_exact": round(exact["p95"], 1),
                    "p95_loglin": est["p95"],
                    "p95_rel_err": round(est["p95"] / exact["p95"] - 1, 4),
                    "p50_sample": samp["p50"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
