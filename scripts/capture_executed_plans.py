#!/usr/bin/env python
"""Capture AQE-FINAL executed plans (collect-then-explain) for the named
specs into plans/<tag>/<name>_<suffix>.txt — VERDICT r16 directive 2: the
static explain shows `AdaptiveSparkPlan isFinalPlan=false`, so runtime
re-optimizations (ReusedExchange, join-strategy conversions, coalesced
AQEShuffleRead) are invisible in it. Executing the SAME QueryExecution
first (collect) finalizes the adaptive plan, and the subsequent
explainString shows what actually ran.

Usage: python scripts/capture_executed_plans.py <tag> <suffix> [spec-prefix ...]
e.g.   python scripts/capture_executed_plans.py r17 before_executed
       python scripts/capture_executed_plans.py r17 after_executed l06 l18b

Note: pipeline/mutation specs (o1) run their work at BUILD time and return
a checkpointed digest frame — their executed plan here is just the digest
scan; their write-path shape is pinned by the lake tests instead."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.plans import all_specs  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before_executed"
    prefixes = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="executed_plan_capture")
    specs = {
        n: s
        for n, s in all_specs().items()
        if (s.headline if not prefixes else any(n.startswith(p) for p in prefixes))
    }
    for name, spec in sorted(specs.items()):
        df = spec.builder(spark, sf_dir)
        df.collect()  # finalize the adaptive plan on THIS QueryExecution
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
