"""Multi-process stress of the sketch-store writer lock (r15).

The interleaving unit tests in test_sketches.py drive the r15 protocol
(atomic link(2) restore, contested-restore failure, post-acquire
readback, content-checked release) through monkeypatched syscalls in ONE
process; this module validates the protocol's actual job — mutual
exclusion — across real processes, where pid-alive probing, O_EXCL
atomicity, and rename visibility are the kernel's, not a mock's.

Each worker loops: acquire → read counter file → increment → write →
release, retrying on StoreLockedError (the designed caller response).
Any mutual-exclusion violation loses an increment; any protocol deadlock
starves a worker past its retry budget. A second leg plants a STALE
sentinel (dead pid, old timestamp) before the workers start, so the
stale-break path runs under real contention — the three-way races the
r14 verdict flagged live exactly there.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import socket
import time

import pytest


def _worker(store: str, counter: str, n_iters: int, out_q) -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from core_etl_spark.operators.sketches import StoreLockedError, _store_lock

    done = 0
    for _ in range(n_iters):
        for _attempt in range(2000):
            try:
                with _store_lock(store):
                    with open(counter) as f:
                        v = int(f.read())
                    # widen the race window a touch
                    time.sleep(0.0005)
                    tmp = f"{counter}.{os.getpid()}"
                    with open(tmp, "w") as f:
                        f.write(str(v + 1))
                    os.replace(tmp, counter)
                done += 1
                break
            except StoreLockedError:
                time.sleep(0.002)
        else:
            out_q.put(("starved", os.getpid(), done))
            return
    out_q.put(("ok", os.getpid(), done))


def _run_stress(tmp_path, n_procs: int, n_iters: int, plant_stale: bool) -> None:
    store = str(tmp_path / "store")
    counter = str(tmp_path / "counter")
    with open(counter, "w") as f:
        f.write("0")
    if plant_stale:
        # a crashed holder from a previous run: dead-ish pid, ancient ts
        from core_etl_spark.operators import sketches

        with open(f"{store}__lock", "w") as f:
            f.write(
                f"999999 {time.time() - 2 * sketches._LOCK_STALE_SEC} "
                f"{socket.gethostname()}"
            )
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(store, counter, n_iters, q))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(30)
    assert all(r[0] == "ok" for r in results), results
    with open(counter) as f:
        final = int(f.read())
    assert final == n_procs * n_iters, (
        f"mutual exclusion violated: {final} != {n_procs * n_iters} "
        f"(lost {n_procs * n_iters - final} increments)"
    )
    # the lock must be fully released at the end — no stranded sentinel
    assert not os.path.exists(f"{store}__lock")


@pytest.mark.parametrize("plant_stale", [False, True])
def test_store_lock_multiprocess_mutual_exclusion(tmp_path, plant_stale):
    _run_stress(tmp_path, n_procs=8, n_iters=60, plant_stale=plant_stale)


def test_store_lock_multiprocess_report(tmp_path):
    # smoke-record the throughput shape so a protocol change that
    # serializes pathologically (e.g. every acquire walking the break
    # path) shows up as a wall-time cliff in the suite
    t0 = time.monotonic()
    _run_stress(tmp_path, n_procs=4, n_iters=40, plant_stale=False)
    wall = time.monotonic() - t0
    print(json.dumps({"procs": 4, "iters": 40, "wall_s": round(wall, 2)}))
    assert wall < 60
