#!/usr/bin/env python
"""A/B/C experiment: materialization strategy for the l06 shingle index.

VERDICT r08 flagged l06/l06x regressing +33-44% on the driver bench across
two rounds with *unchanged operator code*, suspecting the r07
``localCheckpoint(eager=False)`` conversion's worst case — concurrently
launched AQE stages racing to materialize the lazy checkpoint and each
recomputing the tokenize→shingle pipeline. This script measures all three
strategies on THIS host and prints per-run wall time, Spark job count, and
completed-task count (the task count is the smoking gun: a lazy-mode race
shows up as more tasks executed for an identical logical plan).

Usage: python scripts/l06_checkpoint_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark import operators
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
    spark = get_spark(app_name="l06_ckpt_ab")
    specs = all_specs()
    targets = {n: specs[n] for n in ("l06_ngram_jaccard_dedup",
                                     "l06x_ngram_jaccard_xxhash")}

    results: dict[str, dict[str, list[dict]]] = {}
    for mode in ("lazy", "eager", "none"):
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
