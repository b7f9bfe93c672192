#!/usr/bin/env python
"""A/B experiment: receipts-join strategy for the o1 backfill headline
(VERDICT r09 directive 2).

r09 removed the forced ``broadcast()`` on the receipts side of the
transfer-assembly join (receipts scale with the chunk — forcing their
broadcast is the g03 executor-OOM pattern at 100 TB) and claimed
"identical wall with and without the hint", measured on the builder host.
The driver bench then crept 2.21 → 2.82 s. This script re-measures the
claim on THIS host: isolated min-of-N o1 runs at sf0.1, hint off (the
production AQE path) vs hint on, plus job/task counts.

The scale rule stands regardless of the local result — this experiment
only decides whether the comment says "identical wall" or "costs ~X s
locally, accepted for the scale rule".

Usage: python scripts/o1_receipts_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.operators import decode as DC
from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark


def run_once(spark, spec, sf_dir: str, tag: str) -> dict:
    sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.setJobGroup(tag, tag, interruptOnCancel=False)
    t0 = time.monotonic()
    spec.builder(spark, sf_dir).count()
    wall = time.monotonic() - t0
    sc.setJobGroup("idle", "idle")
    st = sc.statusTracker()
    job_ids = st.getJobIdsForGroup(tag)
    n_tasks = n_stages = 0
    for jid in job_ids:
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is None:
                continue
            n_stages += 1
            n_tasks += si.numCompletedTasks
    return {"wall": round(wall, 3), "jobs": len(job_ids), "stages": n_stages,
            "tasks": n_tasks}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="o1_receipts_ab")
    spec = all_specs()["o1_backfill_pipeline"]

    results: dict[str, list[dict]] = {}
    for hint in (None, "broadcast"):
        DC.RECEIPTS_JOIN_HINT = hint
        label = hint or "aqe"
        spec.builder(spark, sf_dir).count()  # warmup per strategy
        rows = [run_once(spark, spec, sf_dir, f"{label}:{i}") for i in range(runs)]
        results[label] = rows
        walls = [r["wall"] for r in rows]
        print(f"{label:9s} min={min(walls):.3f} "
              f"med={sorted(walls)[len(walls)//2]:.3f} max={max(walls):.3f} "
              f"tasks={[r['tasks'] for r in rows]} "
              f"jobs={[r['jobs'] for r in rows]}", flush=True)
    DC.RECEIPTS_JOIN_HINT = None
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
