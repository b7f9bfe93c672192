#!/usr/bin/env python
"""Full-surface byte-identity sweep (SCALE.md local-cluster section, r12).

Value-hashes EVERY registry spec at sf0.001 under one master and
checkpoints per-spec to a JSON state file, so runs capped at 10 minutes
resume where they left off. Run both legs, then compare:

    python scripts/bi_sweep.py local
    python scripts/bi_sweep.py cluster
    python scripts/bi_sweep.py compare

The claim this produces: every spec — the 158 oracle-backed ones AND
the 5 engine-specific rows-only ones — hashes identically between
local[32] (one JVM, no serialization) and local-cluster[3,4,4096]
(real executor JVMs, serialized shuffle, separate Python workers), i.e.
no operator depends on single-JVM object identity or unserialized
state. Rows-only identity is configuration-pinned (identical input
splits, shuffle partitions 32 on both); the oracle-backed specs are
layout-independent by construction (they match DuckDB).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("BI_SF_DIR", "/root/testdata/sf0.001")
STATE_DIR = os.environ.get("BI_STATE_DIR", "/tmp/bi_sweep")
MASTERS = {"local": None, "cluster": "local-cluster[3,4,4096]"}


def state_path(tag: str) -> str:
    return os.path.join(STATE_DIR, f"bi_{tag}.json")


def load(tag: str) -> dict:
    # ValueError too: the run cap can kill mid-dump; a truncated checkpoint
    # must restart that tag, not wedge the resumable sweep (ADVICE r12).
    try:
        with open(state_path(tag)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save(tag: str, state: dict) -> None:
    # temp-file + rename so a kill mid-dump never leaves truncated JSON
    tmp = state_path(tag) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, state_path(tag))


def sweep(tag: str) -> None:
    from core_etl_spark.plans import all_specs
    from core_etl_spark.session import get_spark

    os.makedirs(STATE_DIR, exist_ok=True)
    state = load(tag)
    master = MASTERS[tag]
    if master:
        os.environ.setdefault("SPARK_GRAFT_EXECUTOR_MEM", "3g")
    spark = get_spark(
        app_name=f"bi_sweep_{tag}", **({"master": master} if master else {})
    )
    specs = all_specs()
    todo = [n for n in sorted(specs) if n not in state]
    print(f"{tag}: {len(todo)} to run ({len(specs) - len(todo)} cached)", flush=True)
    for name in todo:
        t0 = time.perf_counter()
        try:
            rows = sorted(
                repr(tuple(r)) for r in specs[name].builder(spark, SF).collect()
            )
            state[name] = {
                "hash": hashlib.md5("\n".join(rows).encode()).hexdigest(),
                "rows": len(rows),
            }
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            state[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        save(tag, state)
        print(name, state[name].get("hash", state[name].get("err")),
              round(time.perf_counter() - t0, 1), flush=True)
    print("SWEEP DONE", tag, flush=True)


def compare() -> int:
    from core_etl_spark.plans import REGISTRY

    loc, clu = load("local"), load("cluster")
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    missing = sorted(set(REGISTRY) - set(loc)) + sorted(set(REGISTRY) - set(clu))
    errs = {n: v["err"] for src in (loc, clu) for n, v in src.items() if "err" in v}
    mismatches = [
        n for n in REGISTRY
        if n in loc and n in clu and "err" not in loc[n] and "err" not in clu[n]
        and loc[n] != clu[n]
    ]
    print(json.dumps({
        "specs": len(REGISTRY),
        "missing_from_a_leg": missing,
        "errors": errs,
        "mismatches": mismatches,
        "rows_only_among_mismatches": sorted(set(mismatches) & rows_only),
        "identical": not (missing or errs or mismatches),
    }))
    return 0 if not (missing or errs or mismatches) else 1


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if which == "compare":
        sys.exit(compare())
    sweep(which)
