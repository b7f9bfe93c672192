#!/usr/bin/env python
"""Executor-LOSS chaos soak (VERDICT r10 directive 6; SCALE.md executor
section): the one cluster behavior local-cluster soaks hadn't measured —
what happens when an executor JVM dies mid-stage.

Method: run real workloads under ``local-cluster[3,4,4096]`` (separate
executor JVMs, serialized network shuffle) and SIGKILL one
``CoarseGrainedExecutorBackend`` process while a job is mid-flight, then
compare the run's value hash against a kill-free run of the identical
code in the same session configuration.

What Spark should do — and what this script verifies it does here:

- tasks running on the killed executor fail and are re-scheduled
  (``spark.task.maxFailures`` = 4 default covers one loss);
- shuffle map outputs the dead executor held trigger ``FetchFailed`` →
  the DAGScheduler resubmits the parent stage's lost partitions
  (recomputation, not failure);
- the standalone Worker relaunches a replacement executor, so capacity
  returns without operator action;
- the final ANSWER is byte-identical to the kill-free run — failure
  handling must be invisible in the data.

Legs:

1. **batch / dedup family**: the l06 n-gram Jaccard spec and the g03
   star join at $CHAOS_SF_DIR (default sf0.1), one clean run + one run
   with a mid-job executor kill each.
2. **checkpointed streaming resume**: the persisted-HLL-store ingest
   loop (foreachBatch → update_hll_store, checkpointLocation set) with
   an executor killed mid-stream; the final register store must equal a
   single-pass sketch of every row ever fed — this also exercises the
   r11 crash-recovery path of the store swap under real failure.

Output: one JSON line per leg to stdout; summarized into SCALE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core_etl_spark.plans import all_specs  # noqa: E402
from core_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("CHAOS_SF_DIR", "/root/testdata/sf0.1")
MASTER = "local-cluster[3,4,4096]"


def executor_pids() -> list[int]:
    try:
        out = subprocess.check_output(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"], text=True
        )
    except subprocess.CalledProcessError:
        return []
    return [int(p) for p in out.split()]


def value_hash(df) -> tuple[str, int]:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)


class Killer(threading.Thread):
    """SIGKILL one executor JVM ``delay`` seconds after start()."""

    def __init__(self, delay: float):
        super().__init__(daemon=True)
        self.delay = delay
        self.killed_pid: int | None = None

    def run(self) -> None:
        time.sleep(self.delay)
        pids = executor_pids()
        if pids:
            self.killed_pid = pids[0]
            os.kill(self.killed_pid, signal.SIGKILL)


def fresh_session(app: str):
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = "3g"
    return get_spark(app_name=app, master=MASTER)


def batch_leg() -> None:
    specs = all_specs()
    for name in ("l06_ngram_jaccard_dedup", "g03_star_join_tpch_q5"):
        spec = specs[name]
        spark = fresh_session(f"chaos_{name}")
        try:
            spec.builder(spark, SF_DIR).count()  # warm (codegen, workers)
            t0 = time.perf_counter()
            clean_hash, n = value_hash(spec.builder(spark, SF_DIR))
            clean_wall = time.perf_counter() - t0

            before = executor_pids()
            killer = Killer(delay=max(0.5, clean_wall * 0.3))
            t0 = time.perf_counter()
            killer.start()
            chaos_hash, n2 = value_hash(spec.builder(spark, SF_DIR))
            chaos_wall = time.perf_counter() - t0
            killer.join()
            time.sleep(3)  # give the Worker a beat to relaunch
            after = executor_pids()
            print(
                json.dumps(
                    {
                        "leg": name,
                        "rows": n,
                        "identical": chaos_hash == clean_hash and n == n2,
                        "killed_pid": killer.killed_pid,
                        "kill_landed_mid_job": killer.killed_pid is not None
                        and chaos_wall > killer.delay,
                        "executors_before": len(before),
                        "executors_after": len(after),
                        "relaunched": bool(
                            set(after) - set(before)
                        ),
                        "clean_wall_s": round(clean_wall, 2),
                        "chaos_wall_s": round(chaos_wall, 2),
                    }
                ),
                flush=True,
            )
        finally:
            spark.stop()
            time.sleep(2)


def stream_leg() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from core_etl_spark.operators import sketches

    spark = fresh_session("chaos_stream")
    try:
        root = tempfile.mkdtemp(prefix="chaos_stream_")
        src, store, ck = f"{root}/src", f"{root}/store", f"{root}/ck"
        n_files, rows_per = 6, 200_000
        for i in range(n_files):
            spark.range(i * rows_per, (i + 1) * rows_per).select(
                F.col("id").cast("string").alias("k")
            ).coalesce(2).write.parquet(f"{src}/f{i}")

        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        killer = Killer(delay=4.0)
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _i: sketches.update_hll_store(b, "k", store)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        killer.start()
        q.awaitTermination()
        killer.join()

        whole = sketches.hll_registers(
            spark.range(n_files * rows_per).select(
                F.col("id").cast("string").alias("k")
            ),
            "k",
        )
        got = sorted(
            map(tuple, spark.read.parquet(store).select("bucket", "rho").collect())
        )
        want = sorted(map(tuple, whole.select("bucket", "rho").collect()))
        print(
            json.dumps(
                {
                    "leg": "stream_hll_store",
                    "rows_fed": n_files * rows_per,
                    "killed_pid": killer.killed_pid,
                    "store_equals_single_pass": got == want,
                    "registers": len(got),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    finally:
        spark.stop()


def stream_loglin_leg() -> None:
    """The loglin-store twin of ``stream_leg`` (VERDICT r11 directive 6):
    foreachBatch → update_loglin_store with the epoch id as batch_id (the
    r12 ledger wiring — a kill-induced batch REDELIVERY must be absorbed
    by the ledger, where the HLL store relies on max-merge idempotence),
    one executor SIGKILLed mid-stream; the final store histogram and the
    quantiles read off it must equal a single-pass histogram of every
    row ever fed."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from core_etl_spark.operators import sketches

    spark = fresh_session("chaos_stream_loglin")
    try:
        root = tempfile.mkdtemp(prefix="chaos_loglin_")
        src, store, ck = f"{root}/src", f"{root}/store", f"{root}/ck"
        n_files, rows_per = 6, 200_000
        for i in range(n_files):
            spark.range(i * rows_per, (i + 1) * rows_per).select(
                (F.col("id") * 0.37 + 1.0).alias("v")
            ).coalesce(2).write.parquet(f"{src}/f{i}")

        stream = (
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        killer = Killer(delay=4.0)
        q = (
            stream.writeStream.foreachBatch(
                lambda b, i: sketches.update_loglin_store(
                    b, "v", store, batch_id=str(i)
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        killer.start()
        q.awaitTermination()
        killer.join()

        whole = sketches.loglin_histogram(
            spark.range(n_files * rows_per).select(
                (F.col("id") * 0.37 + 1.0).alias("v")
            ),
            "v",
        )
        got = sorted(
            map(tuple, spark.read.parquet(store).select("bucket", "n").collect())
        )
        want = sorted(map(tuple, whole.select("bucket", "n").collect()))
        got_q = sketches.loglin_quantiles(
            spark.read.parquet(store), (0.5, 0.95)
        ).collect()
        want_q = sketches.loglin_quantiles(whole, (0.5, 0.95)).collect()
        print(
            json.dumps(
                {
                    "leg": "stream_loglin_store",
                    "rows_fed": n_files * rows_per,
                    "killed_pid": killer.killed_pid,
                    "store_equals_single_pass": got == want,
                    "quantiles_equal": got_q == want_q,
                    "hist_rows": len(got),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    finally:
        spark.stop()


def ckpt_leg() -> None:
    """The _materialize executor-loss trade, measured both ways: kill an
    executor AFTER an intermediate is materialized, then consume it.

    - ``eager`` (localCheckpoint): lineage is truncated and blocks are
      unreplicated — losing the executor that holds some of them should
      FAIL the consuming job (the docstring's documented trade).
    - ``persist2`` (MEMORY_AND_DISK_2): blocks are 2×-replicated AND the
      lineage survives — the same kill must recompute/fall back and
      return the correct answer.

    The intermediate must be WIDE and multi-partition for the experiment
    to mean anything: the first cut of this leg materialized a 9973-row
    aggregate that AQE coalesced onto one executor, so the kill landed on
    an executor holding no blocks and both modes trivially "survived".
    This version repartitions 3M full-width rows over 24 partitions
    before materializing — every executor provably holds blocks, so the
    kill always destroys some."""
    from pyspark.sql import functions as F

    from core_etl_spark.operators import dedup

    def build(spark):
        return (
            spark.range(0, 3_000_000)
            .repartition(24)
            .select(
                F.col("id"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
        )

    def consume(df) -> tuple[int, int]:
        r = df.agg(
            F.count("*").alias("rows"),
            F.count_distinct(F.substring("payload", 1, 2)).alias("pfx"),
        ).collect()[0]
        return int(r.rows), int(r.pfx)

    expect = (3_000_000, 256)
    for mode in ("eager", "persist2"):
        spark = fresh_session(f"chaos_ckpt_{mode}")
        try:
            inter = dedup._materialize(build(spark), mode=mode)
            inter.count()  # force materialization onto the executors
            pids = executor_pids()
            os.kill(pids[0], signal.SIGKILL)
            time.sleep(3)
            try:
                got = consume(inter)
                outcome = {
                    "survived": True,
                    "correct": got == expect,
                    "got": got,
                }
            except Exception as e:  # noqa: BLE001 - the measurement itself
                outcome = {
                    "survived": False,
                    "error": f"{type(e).__name__}: {str(e)[:160]}",
                }
            print(
                json.dumps(
                    {"leg": f"ckpt_{mode}", "expected_rows_keys": expect, **outcome}
                ),
                flush=True,
            )
        finally:
            spark.stop()
            time.sleep(2)


def ingest_leg() -> None:
    """r15: executor loss mid-BACKFILL under the full recovery story.

    A kill mid-chunk severs the eagerly-localCheckpointed batch's
    lineage (non-recomputable by design — the documented trade), so the
    backfill JOB fails; ``run_with_retry`` then truncates the top 100
    heights and replays — and the replayed chunk re-delivers rows the
    crashed run already committed, which is exactly what the r15
    idempotent append (``Lake._drop_redelivered``) must absorb. The
    warehouse end state must be row-identical to a kill-free control
    backfill: retry + truncate + idempotent re-append, all invisible in
    the data."""
    import shutil
    import tempfile

    from core_etl_spark.lake import Lake
    from core_etl_spark.pipeline import backfill, run_with_retry
    from core_etl_spark.sources.fixtures import WATCH_CONTRACT
    from core_etl_spark.sources.provider import FixtureBlockProvider

    spark = fresh_session("chaos_ingest")
    try:
        root = tempfile.mkdtemp(prefix="chaos_ingest_")
        provider = FixtureBlockProvider(n_blocks=2000, txs_per_block=4)

        # cold run warms codegen/workers; the WARM wall calibrates the kill
        warm = Lake(spark, f"{root}/warmup", bucket_size=125)
        backfill(spark, warm, provider, (WATCH_CONTRACT,), chunk_size=250)
        control = Lake(spark, f"{root}/control", bucket_size=125)
        t0 = time.perf_counter()
        backfill(spark, control, provider, (WATCH_CONTRACT,), chunk_size=250)
        clean_wall = time.perf_counter() - t0

        victim = Lake(spark, f"{root}/victim", bucket_size=125)
        killer = Killer(delay=max(0.5, clean_wall * 0.35))
        attempts = {"n": 0}

        def job() -> int:
            attempts["n"] += 1
            return backfill(
                spark, victim, provider, (WATCH_CONTRACT,), chunk_size=250
            )

        before = executor_pids()
        t0 = time.perf_counter()
        killer.start()
        run_with_retry(job, victim, attempts=10, truncate_blocks=100)
        chaos_wall = time.perf_counter() - t0
        killer.join()
        time.sleep(3)
        after = executor_pids()

        identical = True
        counts = {}
        for name in ("blocks", "transactions", "token_transfers"):
            ch, n1 = value_hash(victim.read(name).drop("block_bucket"))
            cc, n2 = value_hash(control.read(name).drop("block_bucket"))
            counts[name] = n1
            identical = identical and ch == cc and n1 == n2
        print(
            json.dumps(
                {
                    "leg": "ingest_backfill_retry",
                    "identical": identical,
                    "job_attempts": attempts["n"],
                    "killed_pid": killer.killed_pid,
                    "kill_landed_mid_job": killer.killed_pid is not None
                    and chaos_wall > killer.delay,
                    "executors_before": len(before),
                    "executors_after": len(after),
                    "clean_wall_s": round(clean_wall, 2),
                    "chaos_wall_s": round(chaos_wall, 2),
                    **counts,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    finally:
        spark.stop()
        time.sleep(2)


def tail_leg() -> None:
    """r16 (VERDICT r15 directive 6): executor SIGKILL mid-*microbatch* of
    the STREAMING tail — the r15 chaos leg killed mid-backfill only; the
    tail's contiguity guard + commit-watermark had unit tests but no
    kill-mid-foreachBatch soak.

    A kill severs the micro-batch's eager localCheckpoint lineage, the
    foreachBatch job fails, and the QUERY terminates with an error — the
    designed behavior. Recovery is a checkpoint RESTART: the source offset
    log replays the failed batch, the stale guard + idempotent append
    absorb whatever the crashed batch already committed (including a torn
    write_all), and the warehouse must end row-identical to a kill-free
    control drain of the same drops."""
    import shutil
    import tempfile

    from core_etl_spark.lake import Lake
    from core_etl_spark.sources.fixtures import WATCH_CONTRACT
    from core_etl_spark.sources.provider import FixtureBlockProvider
    from core_etl_spark.streaming.tail import start_tail

    spark = fresh_session("chaos_tail")
    try:
        root = tempfile.mkdtemp(prefix="chaos_tail_")
        provider = FixtureBlockProvider(n_blocks=1200, txs_per_block=4)
        drops = f"{root}/drops"
        for i in range(12):  # 12 drops → 12 micro-batches (1 file/trigger)
            provider.fetch_blocks(spark, i * 100, i * 100 + 99).coalesce(
                1
            ).write.mode("append").parquet(drops)

        def drain(lake: Lake, ck: str):
            q = start_tail(spark, lake, drops, ck, (WATCH_CONTRACT,),
                           provider.receipts_for)
            q.awaitTermination()

        warm = Lake(spark, f"{root}/warmup", bucket_size=125)
        drain(warm, f"{root}/ck_w")
        control = Lake(spark, f"{root}/control", bucket_size=125)
        t0 = time.perf_counter()
        drain(control, f"{root}/ck_c")
        clean_wall = time.perf_counter() - t0

        victim = Lake(spark, f"{root}/victim", bucket_size=125)
        killer = Killer(delay=max(0.5, clean_wall * 0.4))
        before = executor_pids()
        killer.start()
        t0 = time.perf_counter()
        restarts = 0
        query_error = None
        while True:
            try:
                drain(victim, f"{root}/ck_v")
                break
            except Exception as e:  # noqa: BLE001 — the failed query IS the drill
                query_error = type(e).__name__
                restarts += 1
                if restarts > 5:
                    raise
                time.sleep(2)  # let the worker relaunch the executor
        chaos_wall = time.perf_counter() - t0
        killer.join()
        time.sleep(3)
        after = executor_pids()

        identical = True
        counts = {}
        for name in ("blocks", "transactions", "token_transfers"):
            ch, n1 = value_hash(victim.read(name).drop("block_bucket"))
            cc, n2 = value_hash(control.read(name).drop("block_bucket"))
            counts[name] = n1
            identical = identical and ch == cc and n1 == n2
        print(
            json.dumps(
                {
                    "leg": "tail_kill_mid_microbatch",
                    "identical": identical,
                    "checkpoint_restarts": restarts,
                    "query_error": query_error,
                    "killed_pid": killer.killed_pid,
                    "kill_landed_mid_stream": killer.killed_pid is not None
                    and chaos_wall > killer.delay,
                    "executors_before": len(before),
                    "executors_after": len(after),
                    "clean_wall_s": round(clean_wall, 2),
                    "chaos_wall_s": round(chaos_wall, 2),
                    **counts,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    finally:
        spark.stop()
        time.sleep(2)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "batch"):
        batch_leg()
    if which in ("all", "stream"):
        stream_leg()
    if which in ("all", "stream_loglin"):
        stream_loglin_leg()
    if which in ("all", "ckpt"):
        ckpt_leg()
    if which in ("all", "ingest"):
        ingest_leg()
    if which in ("all", "tail"):
        tail_leg()
