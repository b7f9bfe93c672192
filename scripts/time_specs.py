#!/usr/bin/env python
"""Ad-hoc per-spec timer: `python scripts/time_specs.py l06 l07 ...` times
the named specs (prefix match) at $SPARK_GRAFT_SF_DIR, min of $RUNS."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.plans import all_specs  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    prefixes = sys.argv[1:]
    spark = get_spark(app_name="spec_timer")
    specs = {
        n: s for n, s in all_specs().items()
        if not prefixes or any(n.startswith(p) for p in prefixes)
    }
    for name, spec in specs.items():
        spec.builder(spark, sf_dir).count()  # warmup
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(times)} runs={times}", flush=True)


if __name__ == "__main__":
    main()
