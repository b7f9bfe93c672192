#!/usr/bin/env python
"""Ad-hoc oracle drive: `python scripts/drive_specs.py l06 l07 ...` runs the
named specs (prefix match; no args = ALL) through the same compare harness
tests/test_parity.py uses, at one or more scale dirs, and prints one
PASS/ROWS_ONLY/FAIL line per (sf, spec). Exit code 1 on any FAIL.

$SPARK_GRAFT_DRIVE_SF: comma-separated sf dirs (default sf0.01)."""
from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from parity import compare, duck_connection  # noqa: E402

from core_etl_spark.plans import all_specs  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dirs = os.environ.get(
        "SPARK_GRAFT_DRIVE_SF", "/root/testdata/sf0.01"
    ).split(",")
    prefixes = sys.argv[1:]
    spark = get_spark(app_name="drive_specs")
    specs = {
        n: s for n, s in all_specs().items()
        if not prefixes or any(n.startswith(p) for p in prefixes)
    }
    bad = 0
    for sf_dir in sf_dirs:
        con = duck_connection(sf_dir)
        for name, spec in specs.items():
            try:
                sdf = spec.builder(spark, sf_dir)
                if spec.oracle is None:
                    n = sdf.count()
                    print(f"{sf_dir} {name}: ROWS_ONLY rows={n}", flush=True)
                    continue
                probs = compare(sdf, con.execute(spec.oracle).df())
            except Exception as e:  # noqa: BLE001 — report, keep driving
                probs = [f"exception: {e!r}"[:300]]
            if probs:
                bad += 1
                print(f"{sf_dir} {name}: FAIL {probs[:2]}", flush=True)
            else:
                print(f"{sf_dir} {name}: PASS", flush=True)
    print(f"TOTAL_BAD {bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
