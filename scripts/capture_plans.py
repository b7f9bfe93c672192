#!/usr/bin/env python
"""Capture `.explain("formatted")` for the named specs (default: all
headline specs) into plans/<tag>/<name>_<suffix>.txt — the optimization
round's before/after plan evidence.

Usage: python scripts/capture_plans.py <tag> <suffix> [spec-prefix ...]
e.g.   python scripts/capture_plans.py r16 before
       python scripts/capture_plans.py r16 after l06 l07

Note: pipeline/mutation specs (o1 — a backfill that runs at build time
and returns a checkpointed digest frame) leave only the post-run digest
plan visible here; their write-path plan shape is pinned by the lake
tests instead.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.plans import all_specs  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    prefixes = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_capture")
    specs = {
        n: s
        for n, s in all_specs().items()
        if (s.headline if not prefixes else any(n.startswith(p) for p in prefixes))
    }
    for name, spec in sorted(specs.items()):
        df = spec.builder(spark, sf_dir)
        jvm = spark.sparkContext._jvm
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
