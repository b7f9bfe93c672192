#!/usr/bin/env python
"""NULL-vs-NaN mask audit (r14) — closes the harness's one conflation
blind spot.

``tests/parity.compare`` (and any pandas-mediated comparison) sees both
SQL NULL and IEEE NaN as ``NaN`` in a float64 column, so a spec that
emitted NULL on Spark and NaN on DuckDB — or vice versa — could pass
the value-hash gate undetected. This audit re-compares every
oracle-backed spec using NATIVE row fetches, where the two are
distinguishable (Python ``None`` vs ``float('nan')`` on both engines),
and checks the per-column multiset over
{null, nan, +inf, -inf, finite, non-float} order-insensitively.

r14 result on the fully-corrupted warehouse (every arm at once): all
168 oracle-backed specs, ZERO mask differences — the ledger-cast and
validity-gate contracts really do produce NULL (not NaN) on both
engines everywhere.

Usage: ADV_DIR=/path/to/corrupted python scripts/nan_null_mask_audit.py
"""
from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = os.environ.get("ADV_DIR", "/tmp/r13/sf_adv")


def canon(rows, cols):
    out = {c: Counter() for c in cols}
    for r in rows:
        for c, v in zip(cols, r):
            if v is None:
                out[c]["null"] += 1
            elif isinstance(v, float):
                if math.isnan(v):
                    out[c]["nan"] += 1
                elif math.isinf(v):
                    out[c]["inf" if v > 0 else "-inf"] += 1
                else:
                    out[c]["f"] += 1
            else:
                out[c]["v"] += 1
    return out


def main() -> None:
    from core_etl_spark.plans import REGISTRY
    from core_etl_spark.session import get_spark
    from tests.parity import duck_connection

    spark = get_spark(app_name="nan_null_audit")
    con = duck_connection(DIR)
    bad = 0
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        try:
            sdf = spec.builder(spark, DIR)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(getattr(r, c) for c in s_cols) for r in sdf.collect()]
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            idx = [o_cols.index(c) for c in sorted(o_cols)]
            o_rows = [tuple(t[i] for i in idx) for t in cur.fetchall()]
            a, b = canon(s_rows, s_cols), canon(o_rows, sorted(o_cols))
            diffs = {
                c: (dict(a[c]), dict(b.get(c, {})))
                for c in a
                if a[c] != b.get(c, Counter())
            }
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
