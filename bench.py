#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full plan execution to a count-collect (results are materialized,
nothing cached between queries). A warmup run of the first query absorbs
JVM/codegen startup so numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from core_etl_spark.plans import all_specs  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="core_etl_spark_bench")

    specs = {n: s for n, s in all_specs().items() if s.headline}
    names = sorted(specs)

    # Warmup: run the first headline query once to absorb JVM startup.
    specs[names[0]].builder(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].builder(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
