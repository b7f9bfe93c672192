#!/usr/bin/env python
"""Empty-table parity sweep (r16): run EVERY registry spec and its DuckDB
oracle against a warehouse where every input table exists with the right
schema and ZERO rows — the day-zero state of a real deployment (and of
every new partition/tenant/date before the first ingest lands).

Empty input is the classic stage-killer class: ``.first()[0]`` on no
rows, argmax over nothing, div-by-zero in ratio denominators, quantile
grids over empty samples, broadcast builds of empty dims. It is also a
semantics class: a GLOBAL aggregate over empty input yields ONE row
(NULL/0) in ANSI SQL while ``groupBy().agg()`` with keys yields ZERO —
operators that hand-roll fallbacks (q01's coalesce chain) or seed
accumulators must agree with the oracle on which of those they mean.

Verdict policy (docs/adversarial-data.md Rule 19): empty-in/empty-out is
the required default; a raise is acceptable ONLY when the operation is
undefined without data (e.g. fitting k-means centroids to nothing) and
then it must be a *designed* error — ``ValueError``/``AnalysisException``
with a message naming the emptiness — never an IndexError/TypeError/
NoneType crash leaking from an unguarded ``.first()``.

Like adv_data_parity.py this is resumable: state is checkpointed per
spec under ``EMPTY_OUT_DIR`` and a re-run skips finished names.

Usage: python scripts/empty_table_parity.py
  EMPTY_SCOPE=sf    only specs that read the sf tables (default: all)
  EMPTY_LIMIT=k     k-row tables instead of zero-row (deterministic
                    ORDER BY ALL prefix, identical bytes to both engines)
                    — the degenerate-cardinality leg: one row breaks
                    referential integrity between the TPC-H tables, puts
                    quantile grids / k-means / top-k / band-joins below
                    their natural minimums, and exercises every "fewer
                    rows than k/strata/centroids" branch at once.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = os.environ.get("EMPTY_SF_DIR", "/root/testdata/sf0.001")
DST = os.environ.get("EMPTY_OUT_DIR", "/tmp/r16/sf_empty")
CKPT = os.path.join(DST, "_results.json")

# Designed-loud exceptions: emptiness makes the op undefined and the
# operator documents that by raising with a message that names it.
# ("absent": mixture_rebalance's bounded-strata guard — explicit mixture
# targets over a corpus missing those strata is a config error, and the
# empty corpus is just its extreme.)
_DESIGNED_MARKERS = ("empty", "no rows", "zero rows", "no valid", "absent")


def build_empty_dir(src: str = None, dst: str = None, limit: int = 0) -> None:
    """Write a ``limit``-row, schema-identical twin of every table. The
    COPY through DuckDB preserves the parquet logical types (including
    the events table's TIMESTAMP(NANOS) that io.load_tables
    special-cases). For ``limit > 0`` the kept prefix is ORDER BY ALL, so
    the chosen rows are deterministic and identical for both engines."""
    src, dst = src or SRC, dst or DST
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    order = "ORDER BY ALL" if limit else ""
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{f}') {order} "
            f"LIMIT {limit}) TO '{dst}/{f}' (FORMAT PARQUET)"
        )
    con.close()


def classify(exc: Exception) -> str:
    msg = f"{type(exc).__name__}: {exc}".lower()
    designed_type = isinstance(exc, ValueError) or type(exc).__name__ == (
        "AnalysisException"
    )
    if designed_type and any(m in msg for m in _DESIGNED_MARKERS):
        return "LOUD_DESIGNED"
    return "CRASH"


def main() -> None:
    build_empty_dir(limit=int(os.environ.get("EMPTY_LIMIT", "0")))
    from core_etl_spark.plans import REGISTRY
    from core_etl_spark.session import get_spark
    from tests.parity import duck_connection, compare

    try:
        with open(CKPT) as f:
            state = json.load(f)
    except (OSError, ValueError):
        state = {}

    spark = get_spark(app_name="empty_table_parity")
    con = duck_connection(DST)
    scope = os.environ.get("EMPTY_SCOPE", "all")
    names = sorted(REGISTRY)
    if scope == "sf":
        # fixture-backed chain specs generate their own data and are
        # exercised by the driver rotation either way.
        names = [n for n in names if n[0] in "lcgjv" or n.startswith("q")]
    print(f"{len(names)} specs in scope={scope}; {len(state)} cached", flush=True)
    deadline = time.time() + float(os.environ.get("EMPTY_TIME_CAP", "520"))
    for name in names:
        if name in state:
            continue
        spec = REGISTRY[name]
        try:
            sdf = spec.builder(spark, DST)
            if spec.oracle is None:
                state[name] = {"status": "rows_only", "rows": sdf.count()}
            else:
                problems = compare(sdf, con.execute(spec.oracle).fetchdf())
                state[name] = {
                    "status": "OK" if not problems else "MISMATCH",
                    "detail": None if not problems else str(problems)[:300],
                }
        except Exception as e:  # noqa: BLE001 — a crash IS the finding
            state[name] = {
                "status": classify(e),
                "detail": f"{type(e).__name__}: {e}"[:300],
            }
        tmp = CKPT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, CKPT)
        print(name, state[name]["status"],
              state[name].get("detail") or "", flush=True)
        if time.time() > deadline:
            print("TIME CAP — resumable, re-run", flush=True)
            return
    bad = {k: v for k, v in state.items()
           if v["status"] not in ("OK", "rows_only", "LOUD_DESIGNED")}
    loud = sorted(k for k, v in state.items() if v["status"] == "LOUD_DESIGNED")
    print("LOUD_DESIGNED:", loud, flush=True)
    print("SWEEP COMPLETE; problems:",
          json.dumps(bad, indent=1) if bad else "none", flush=True)


if __name__ == "__main__":
    main()
