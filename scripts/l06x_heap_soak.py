#!/usr/bin/env python
"""Clean-sf10 l06x heap-headroom soak — VERDICT r15 directive 2.

r15's sf10 runs put clean l06x "at the 8g-heap edge": the eagerly
localCheckpointed ~2 GB shingle index lives as STORAGE blocks in the
unified memory region and competes with AQE broadcast builds (this soak's
own first cut reproduced the failure exactly — a second back-to-back
in-memory run died with "Not enough memory to build and broadcast the
table"). r16 stages the index to DISK_ONLY past
`dedup.DISK_STAGE_SOURCE_BYTES` of source (Catalyst estimate — zero extra
jobs). This soak measures BOTH modes on the same generated sf10 corpus
(vocabulary-disjoint 100× replication, scripts/scale_soak.py generator),
each leg in a FRESH session so no leg inherits the previous leg's blocks:

- **peak pinned storage memory** (50 ms sampler over
  ``getExecutorMemoryStatus`` — max-minus-remaining is exactly the bytes
  storage blocks take from the unified region): the number that decides
  whether a concurrent broadcast build has room. This is the headroom
  claim's denominator-honest metric — raw used-heap or old-gen peaks
  over-read by whatever garbage the lazy GC hasn't collected yet (both
  modes read ~8/8 GB on those gauges while differing by gigabytes here);
- peak old-gen pool usage (JVM resettable peak) for reference;
- wall time;
- the output pair count, which must be IDENTICAL between modes.

Usage: python scripts/l06x_heap_soak.py [out_root] [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import core_etl_spark.operators.dedup as dedup
from core_etl_spark.plans import all_specs
from core_etl_spark.session import get_spark
from scripts.scale_soak import generate


class Gauges:
    """Peak pinned-storage-memory sampler + old-gen peak reader."""

    def __init__(self, spark, interval: float = 0.05) -> None:
        self._sc = spark.sparkContext
        mf = self._sc._jvm.java.lang.management.ManagementFactory
        self._old = next(
            p for p in mf.getMemoryPoolMXBeans()
            if "old" in p.getName().lower() or "tenured" in p.getName().lower()
        )
        self._old.resetPeakUsage()
        self.heap_max = int(mf.getMemoryMXBean().getHeapMemoryUsage().getMax())
        self.peak_storage = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, args=(interval,), daemon=True)

    def _storage_used(self) -> int:
        used = 0
        status = self._sc._jsc.sc().getExecutorMemoryStatus()
        it = status.iterator()
        while it.hasNext():
            entry = it.next()
            mem = entry._2()
            used += int(mem._1()) - int(mem._2())  # maxMem - remaining
        return used

    def _loop(self, interval: float) -> None:
        while not self._stop.is_set():
            try:
                self.peak_storage = max(self.peak_storage, self._storage_used())
            except Exception:  # noqa: BLE001 — sampling must never kill the leg
                pass
            time.sleep(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(2)
        self.old_peak = int(self._old.getPeakUsage().getUsed())


def leg(mode: str, sf10: str) -> dict:
    spark = get_spark(app_name=f"l06x_heap_{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        dedup.DISK_STAGE_SOURCE_BYTES = (
            8 * 1024 * 1024 if mode == "disk_staged" else 1 << 50
        )
        spec = all_specs()["l06x_ngram_jaccard_xxhash"]
        spec.builder(spark, "/root/testdata/sf0.1").count()  # JIT warmup
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        with Gauges(spark) as g:
            t0 = time.monotonic()
            n = spec.builder(spark, sf10).count()
            wall = time.monotonic() - t0
        return {
            "mode": mode,
            "rows": n,
            "wall_s": round(wall, 1),
            "peak_storage_mem_gb": round(g.peak_storage / 2**30, 2),
            "peak_oldgen_gb": round(g.old_peak / 2**30, 2),
            "max_heap_gb": round(g.heap_max / 2**30, 2),
            "storage_headroom_pct": round(
                100 * (1 - g.peak_storage / g.heap_max), 1
            ),
        }
    finally:
        spark.stop()
        time.sleep(2)


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_soak"
    skip_gen = "--skip-gen" in sys.argv
    sf10 = os.path.join(out_root, "sf10")
    if not skip_gen or not os.path.exists(sf10):
        spark = get_spark(app_name="l06x_heap_gen")
        generate(spark, sf10, 100)
        spark.stop()
        time.sleep(2)

    results = []
    for mode in ("in_memory", "disk_staged", "in_memory", "disk_staged"):
        rec = leg(mode, sf10)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    rows = {r["rows"] for r in results}
    assert len(rows) == 1, f"disk staging changed the pair set! {rows}"
    print("PAIR SETS IDENTICAL (by count); soak complete", flush=True)


if __name__ == "__main__":
    main()
