#!/usr/bin/env python
"""A/B/C experiment: input-materialization strategy for the l18b star-CC
headline (VERDICT r09 directive 1).

r09 defaulted CHECKPOINT_MODE to "eager" after the l06 A/B showed lazy-mode
AQE races recomputing the expensive shingle pipeline. That default also
changed l18b, whose input is a CHEAP synthetic chain self-join — and the
driver bench regressed 2.59 → 3.36 s (+29%). The suspicion: eager adds a
dedicated materialization job per call, pure fixed overhead when the
upstream is one narrow self-join that costs less than the job round-trip.

This script measures eager/lazy/none for the star-CC *input* on this host,
same protocol as scripts/l06_checkpoint_ab.py (wall + job count + completed
tasks per run; min-of-N decides).

Usage: python scripts/l18b_ckpt_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.operators import dedup as D
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
    n_tasks = 0
    n_stages = 0
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
    spark = get_spark(app_name="l18b_ckpt_ab")
    specs = all_specs()
    targets = {n: specs[n] for n in ("l18b_star_cc_chains",)}

    results: dict[str, dict[str, list[dict]]] = {}
    for mode in ("eager", "lazy", "none"):
        D.CHECKPOINT_MODE = mode
        results[mode] = {}
        for name, spec in targets.items():
            spec.builder(spark, sf_dir).count()  # warmup per (mode, query)
            rows = [run_once(spark, spec, sf_dir, f"{mode}:{name}:{i}")
                    for i in range(runs)]
            results[mode][name] = rows
            walls = [r["wall"] for r in rows]
            print(f"{mode:5s} {name:28s} min={min(walls):.3f} "
                  f"med={sorted(walls)[len(walls)//2]:.3f} max={max(walls):.3f} "
                  f"tasks={[r['tasks'] for r in rows]} "
                  f"jobs={[r['jobs'] for r in rows]}", flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
