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


def _threaded_worker(store: str, counter: str, n_iters: int, n_threads: int, out_q) -> None:
    import sys
    import threading

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from core_etl_spark.operators.sketches import StoreLockedError, _store_lock

    results = []

    def loop():
        done = 0
        for _ in range(n_iters):
            for _attempt in range(5000):
                try:
                    with _store_lock(store):
                        with open(counter) as f:
                            v = int(f.read())
                        time.sleep(0.0003)
                        tmp = f"{counter}.{os.getpid()}.{threading.get_ident()}"
                        with open(tmp, "w") as f:
                            f.write(str(v + 1))
                        os.replace(tmp, counter)
                    done += 1
                    break
                except StoreLockedError:
                    time.sleep(0.001)
            else:
                results.append(("starved", done))
                return
        results.append(("ok", done))

    ts = [threading.Thread(target=loop) for _ in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    out_q.put((os.getpid(), results))


def _stale_planter(store: str, stop_flag: str) -> None:
    """Plant a STALE sentinel whenever the lock path is free: workers must
    stale-break to proceed, so concurrent breakers (across threads AND
    processes) run constantly — the regime where pid-shared grave names
    let one breaker's unlink destroy another's caught lock (r15 review).
    Planting only on a free path never harms a live holder."""
    import random
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from core_etl_spark.operators import sketches

    lock = f"{store}__lock"
    stale = (
        f"999999 {time.time() - 2 * sketches._LOCK_STALE_SEC} "
        f"{socket.gethostname()}"
    )
    while not os.path.exists(stop_flag):
        if not os.path.exists(lock) and random.random() < 0.4:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(stale)
            except FileExistsError:
                pass
        time.sleep(0.002)


def test_store_lock_threads_and_processes_with_stale_storm(tmp_path):
    # 2 processes x 4 threads, with a planter keeping the break path hot:
    # acquisitions repeatedly contend through stale-breaking across thread
    # AND process boundaries, and mutual exclusion must hold throughout.
    # (The same-pid grave collision this round fixed is prevented
    # STRUCTURALLY — grave names carry pid+thread+uuid, pinned by
    # test_sketches.py::test_store_lock_grave_names_unique_per_call — a
    # stochastic storm can't reliably reach its microsecond window, so
    # this test's claim is the broader exclusion property.)
    store = str(tmp_path / "store")
    counter = str(tmp_path / "counter")
    stop_flag = str(tmp_path / "stop")
    with open(counter, "w") as f:
        f.write("0")
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    n_procs, n_threads, n_iters = 2, 4, 25
    planter = ctx.Process(target=_stale_planter, args=(store, stop_flag))
    planter.start()
    procs = [
        ctx.Process(
            target=_threaded_worker, args=(store, counter, n_iters, n_threads, q)
        )
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(30)
    with open(stop_flag, "w") as f:
        f.write("stop")
    planter.join(10)
    flat = [r for _, rs in results for r in rs]
    assert all(r[0] == "ok" for r in flat), flat
    with open(counter) as f:
        final = int(f.read())
    want = n_procs * n_threads * n_iters
    assert final == want, (
        f"mutual exclusion violated under stale storm: {final} != {want}"
    )
