#!/usr/bin/env python
"""NULL-vs-NaN mask audit (r14) — closes the harness's one conflation
blind spot.

``tests/parity.compare`` (and any pandas-mediated comparison) sees both
SQL NULL and IEEE NaN as ``NaN`` in a float64 column, so a spec that
emitted NULL on Spark and NaN on DuckDB — or vice versa — could pass
the value-hash gate undetected. This audit re-compares every
oracle-backed spec using NATIVE row fetches, where the two are
distinguishable (Python ``None`` vs ``float('nan')`` on both engines),
and checks the {null, nan, +inf, -inf, finite, non-float} masks —
PER KEY-JOINED ROW where the result carries a stable key (so a
compensating NULL/NaN swap within one column is caught too, ADVICE
r14), per-column multiset otherwise. The harness lives in
``tests/parity.mask_diffs``; a per-family representative runs in the
default pytest suite (tests/test_adversarial_sweep.py) so a mask
regression turns red without anyone remembering to re-run this script
(VERDICT r14 directive 8).

r14 result on the fully-corrupted warehouse (every arm at once): all
168 oracle-backed specs, ZERO mask differences — the ledger-cast and
validity-gate contracts really do produce NULL (not NaN) on both
engines everywhere.

Usage: ADV_DIR=/path/to/corrupted python scripts/nan_null_mask_audit.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = os.environ.get("ADV_DIR", "/tmp/r13/sf_adv")


def main() -> None:
    from core_etl_spark.plans import REGISTRY
    from core_etl_spark.session import get_spark
    from tests.parity import duck_connection, mask_diffs

    spark = get_spark(app_name="nan_null_audit")
    con = duck_connection(DIR)
    bad = 0
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        try:
            sdf = spec.builder(spark, DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            diffs = mask_diffs(s_rows, s_cols, o_rows, o_cols)
            if diffs:
                bad += 1
                print(name, "MASK-DIFF", diffs, flush=True)
            else:
                print(name, "ok", flush=True)
        except Exception as e:  # noqa: BLE001 — a crash IS a finding
            bad += 1
            print(name, "ERR", str(e)[:160], flush=True)
    print("AUDIT DONE, problems:", bad, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
