"""Lake tests: partition layout, mutation semantics (reorg / truncate /
retention), maturity recompute, resume point, and reorg detection — the K1-K10
surface of SURVEY §2.3 over a temp warehouse."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from core_etl_spark.lake import Lake
from core_etl_spark.operators import decode as D
from core_etl_spark.operators import transforms as T
from core_etl_spark.sources import fixtures as FX

N_BLOCKS = 40
BUCKET = 10


@pytest.fixture()
def lake(spark, tmp_path):
    raw = FX.raw_blocks(spark, n_blocks=N_BLOCKS, txs_per_block=4)
    blocks = T.normalize_blocks(raw)
    txs = T.normalize_transactions(raw)
    transfers = D.extract_token_transfers(txs, FX.WATCH_CONTRACT, FX.receipts(raw))
    transfers = T.propagate_created_at(transfers, txs, blocks)
    lk = Lake(spark, str(tmp_path / "wh"), bucket_size=BUCKET)
    lk.write_all(blocks, txs, transfers)
    return lk


def test_layout_and_roundtrip(lake):
    assert lake.blocks().count() == N_BLOCKS
    assert lake.transactions().count() == N_BLOCKS * 4
    assert lake.token_transfers().count() > 0
    # physical layout: block_bucket dirs; transfers nested under address
    buckets = {d for d in os.listdir(lake.path("blocks")) if d.startswith("block_bucket=")}
    assert buckets == {f"block_bucket={b}" for b in range(N_BLOCKS // BUCKET)}
    addr_dirs = [d for d in os.listdir(lake.path("token_transfers")) if d.startswith("address=")]
    assert addr_dirs and os.listdir(os.path.join(lake.path("token_transfers"), addr_dirs[0]))


def test_partition_pruned_point_lookup(lake):
    df = lake.block_by_number(17)
    assert df.count() == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the derived bucket predicate must reach PartitionFilters in the scan
    assert "PartitionFilters" in plan and "block_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_pruned_range_scan(lake):
    assert lake.blocks_in_range(15, 24).count() == 10
    assert lake.blocks_in_range(35).count() == 5  # open-ended
    assert lake.block_transactions(17).count() == 4


def test_latest_and_fallback(lake, spark, tmp_path):
    assert lake.latest_block_number() == N_BLOCKS - 1
    empty = Lake(spark, str(tmp_path / "none"))
    assert empty.latest_block_number() == -1
    # transactions-only warehouse falls back to block_number
    txs_only = Lake(spark, str(tmp_path / "txs"), bucket_size=BUCKET)
    txs_only.write("transactions", lake.transactions())
    assert txs_only.latest_block_number() == N_BLOCKS - 1


def test_latest_ignores_uncommitted_writes(lake):
    """A crashed/in-flight write leaves _temporary task-attempt trees (and
    stray hidden files); the tip must answer from committed data only, like
    Hadoop's hiddenFileFilter — else resume would skip real blocks (K8/O3)."""
    import shutil

    blocks_dir = lake.path("blocks")
    committed = next(
        d for d in os.listdir(blocks_dir) if d.startswith("block_bucket=")
    )
    tmp = os.path.join(
        blocks_dir, "_temporary", "0", "attempt_1", "block_bucket=999"
    )
    os.makedirs(tmp)
    # a real parquet file (copied from a committed leaf) inside the
    # uncommitted tree — footer stats exist but must not be trusted
    src_leaf = os.path.join(blocks_dir, committed)
    src_file = next(f for f in os.listdir(src_leaf) if f.endswith(".parquet"))
    shutil.copy(os.path.join(src_leaf, src_file), os.path.join(tmp, src_file))
    # hidden file inside a committed leaf dir must be skipped too
    open(os.path.join(src_leaf, ".part-inflight.parquet"), "w").close()
    assert lake.latest_block_number() == N_BLOCKS - 1
    # transfers layout (address=*/block_bucket=*) gets the same treatment
    tdir = lake.path("token_transfers")
    os.makedirs(os.path.join(tdir, "_temporary", "0", "address=x", "block_bucket=7"))
    assert lake.latest_block_number() == N_BLOCKS - 1


def test_maturity_recompute(lake):
    m = lake.blocks_with_maturity(depth=5)
    rows = {r.number: r.matured for r in m.collect()}
    assert rows[N_BLOCKS - 1 - 5] == 1
    assert rows[N_BLOCKS - 1 - 4] == 0
    assert rows[0] == 1 and rows[N_BLOCKS - 1] == 0


def test_clean_block_data(lake):
    victim = 17
    before_tx = lake.transactions().count()
    tx_in_block = lake.transactions().filter(F.col("block_number") == victim).count()
    lake.clean_block_data(victim)
    assert lake.blocks().filter(F.col("number") == victim).count() == 0
    assert lake.blocks().count() == N_BLOCKS - 1
    assert lake.transactions().count() == before_tx - tx_in_block
    assert lake.token_transfers().filter(F.col("block_number") == victim).count() == 0
    # untouched neighbors survive
    assert lake.blocks().filter(F.col("number").isin(16, 18)).count() == 2


def test_truncate_from_last_saved(lake):
    lake.truncate_from_last_saved(12)  # cutoff 27: bucket 3 emptied wholly
    assert lake.latest_block_number() == N_BLOCKS - 1 - 12
    assert lake.blocks().count() == N_BLOCKS - 12
    assert lake.transactions().agg(F.max("block_number")).first()[0] == N_BLOCKS - 13
    # emptied top bucket is gone from disk; boundary bucket survives
    assert not os.path.exists(os.path.join(lake.path("blocks"), "block_bucket=3"))
    assert os.path.exists(os.path.join(lake.path("blocks"), "block_bucket=2"))


def test_retention_cleanup(lake):
    # fixture timestamps: epoch + 7*number; cut everything strictly below
    # block 25's timestamp → blocks 0..24 dropped
    cutoff = FX._EPOCH + 7 * 25
    lake.retention_cleanup(cutoff)
    assert lake.blocks().agg(F.min("number")).first()[0] == 25
    assert lake.transactions().agg(F.min("block_number")).first()[0] == 25
    # buckets 0 and 1 dropped wholly at the directory level
    assert not os.path.exists(os.path.join(lake.path("blocks"), "block_bucket=0"))
    assert not os.path.exists(os.path.join(lake.path("blocks"), "block_bucket=1"))
    assert os.path.exists(os.path.join(lake.path("blocks"), "block_bucket=2"))


def test_detect_reorgs(lake, spark):
    good = FX.raw_blocks(spark, n_blocks=N_BLOCKS).select(
        "number", "hash", "parent_hash", "timestamp"
    )
    assert lake.detect_reorgs(good.filter(F.col("number") >= 15)).count() == 0

    # header 20 claims a different parent → stored 19 is on a dead branch
    bad_parent = good.withColumn(
        "parent_hash",
        F.when(F.col("number") == 20, F.lit("f" * 64)).otherwise(F.col("parent_hash")),
    )
    hits = lake.detect_reorgs(bad_parent.filter(F.col("number") >= 15)).collect()
    assert [h.forked_number for h in hits] == [19]

    # header 20 itself re-issued with a new hash → stored 20 conflicts
    # (the PK-conflict analogue), and stored 20's child link breaks too
    fork20 = good.withColumn(
        "hash",
        F.when(F.col("number") == 20, F.lit("f" * 64)).otherwise(F.col("hash")),
    )
    hits = {
        h.forked_number
        for h in lake.detect_reorgs(fork20.filter(F.col("number") == 20)).collect()
    }
    assert hits == {20}


def test_bucketed_join_has_no_shuffle(lake, spark):
    """Both sides bucketed on the height key → the equi-join plans with
    zero Exchange operators (co-located, shuffle-free)."""
    bt = lake.write_bucketed("blocks", lake.blocks(), n_buckets=4)
    tt = lake.write_bucketed("transactions", lake.transactions(), n_buckets=4)
    b = spark.table(bt).select(F.col("number"), "hash")
    t = spark.table(tt).select(F.col("block_number").alias("number"), "from_addr")
    joined = b.hint("merge").join(t, "number")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join still shuffles"
    assert joined.count() == lake.transactions().count()


def test_compaction(spark, tmp_path):
    lk = Lake(spark, str(tmp_path / "cw"), bucket_size=20)
    raw = FX.raw_blocks(spark, n_blocks=40, txs_per_block=2)
    # simulate streaming: 8 tiny appends of 5 blocks each
    for lo in range(0, 40, 5):
        batch = raw.filter(F.col("number").between(lo, lo + 4))
        lk.write("blocks", T.normalize_blocks(batch))
    import glob
    files_before = glob.glob(str(tmp_path / "cw/blocks/**/*.parquet"), recursive=True)
    assert len(files_before) > 2  # many micro-batch files

    n = lk.compact("blocks", target_rows_per_file=1000)
    assert n == 2  # both buckets had more files than needed
    files_after = glob.glob(str(tmp_path / "cw/blocks/**/*.parquet"), recursive=True)
    assert len(files_after) < len(files_before)
    assert lk.blocks().count() == 40  # no rows lost
    assert lk.blocks().select("number").distinct().count() == 40
    assert lk.compact("blocks", target_rows_per_file=1000) == 0  # idempotent


def test_compaction_honors_per_file_target(spark, tmp_path):
    """An oversized bucket must split into ~ceil(rows/target) files, not
    collapse to one giant file (scan-parallelism at 100 TB)."""
    import glob

    lk = Lake(spark, str(tmp_path / "cw2"), bucket_size=100)
    raw = FX.raw_blocks(spark, n_blocks=90, txs_per_block=2)
    for lo in range(0, 90, 5):  # 18 micro-batches, all into one bucket
        batch = raw.filter(F.col("number").between(lo, lo + 4))
        lk.write("blocks", T.normalize_blocks(batch))
    assert lk.compact("blocks", target_rows_per_file=30) == 1
    files = glob.glob(str(tmp_path / "cw2/blocks/**/*.parquet"), recursive=True)
    assert 3 <= len(files) <= 4  # 90 rows / 30-per-file target
    assert lk.blocks().count() == 90
    assert lk.blocks().select("number").distinct().count() == 90


def test_module_gating(spark, tmp_path):
    lk = Lake(spark, str(tmp_path / "gated"), bucket_size=BUCKET, modules=("blocks",))
    raw = FX.raw_blocks(spark, n_blocks=5)
    lk.write_all(T.normalize_blocks(raw), T.normalize_transactions(raw))
    assert lk.blocks().count() == 5
    assert not lk.exists("transactions")
    assert lk.transactions().count() == 0  # empty frame with full schema


def test_idempotent_bucket_overwrite(lake, spark):
    """Exactly-once story: re-writing the same bucket with dynamic overwrite
    leaves counts unchanged (idempotent re-ingest after a crash)."""
    raw = FX.raw_blocks(spark, n_blocks=N_BLOCKS)
    blocks = T.normalize_blocks(raw).filter(F.col("number") >= 30)
    lake.write("blocks", blocks, mode="overwrite")
    assert lake.blocks().count() == N_BLOCKS
    assert lake.blocks().filter(F.col("number") >= 30).count() == 10


def test_compact_concurrent_with_appends_loses_nothing(spark, tmp_path):
    """r05 closed compact()'s side (scan-stage-swap holds the lake lock);
    r06 closes the writer side: ``Lake.write`` itself takes the mutex, so a
    BARE write — pipeline.ingest_raw/backfill never took the lock
    voluntarily — can no longer land between compact's scan and its swap
    and be silently dropped by the stale staged rewrite (ADVICE r05).
    Hammer bare appends from a thread while compacting in a loop, then
    account for every row."""
    import threading

    lk = Lake(spark, str(tmp_path / "ccw"), bucket_size=50)
    raw = FX.raw_blocks(spark, n_blocks=200, txs_per_block=1)
    norm = T.normalize_blocks(raw).localCheckpoint(eager=True)
    lk.write("blocks", norm.filter(F.col("number") < 20))

    def appender():
        for lo in range(20, 200, 20):
            batch = norm.filter(F.col("number").between(lo, lo + 19))
            lk.write("blocks", batch)  # no voluntary lock — write takes it

    th = threading.Thread(target=appender)
    th.start()
    for _ in range(6):
        lk.compact("blocks", target_rows_per_file=100)
    th.join()
    lk.compact("blocks", target_rows_per_file=100)
    assert lk.blocks().count() == 200
    assert lk.blocks().select("number").distinct().count() == 200


def test_incremental_agg_merge_hand_case(spark):
    """Merging a batch aggregate into the stored aggregate must equal the
    from-scratch aggregate: overlapping keys sum, prior-only and
    batch-only keys pass through untouched."""
    from core_etl_spark.operators.maintenance import incremental_agg_merge

    schema = "user_id long, event_type string, n_events long, total_v decimal(18,2)"
    from decimal import Decimal as D

    prev = spark.createDataFrame(
        [(1, "a", 2, D("10.50")), (2, "b", 1, D("3.00"))], schema
    )
    batch = spark.createDataFrame(
        [(1, "a", 1, D("0.25")), (3, "a", 4, D("7.75"))], schema
    )
    got = {
        (r.user_id, r.event_type): (r.n_events, r.total_v)
        for r in incremental_agg_merge(
            prev, batch, ("user_id", "event_type")
        ).collect()
    }
    assert got == {
        (1, "a"): (3, D("10.75")),  # overlap: counts and sums merge
        (2, "b"): (1, D("3.00")),   # prior-only key unchanged
        (3, "a"): (4, D("7.75")),   # batch-only key appears
    }


def test_snapshot_diff_hand_case(spark):
    from core_etl_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "same", 3: "changed", 4: "added"}


def test_snapshot_diff_null_payloads(spark):
    """ADVICE r06: md5(NULL) is NULL, so presence must be tracked with
    explicit flags — a key present on both sides with a NULL payload is
    'same', NULL→value and value→NULL are 'changed', and a NULL-payload
    key on one side only is still added/removed."""
    from core_etl_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (5, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now-set"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "same",      # NULL vs NULL
        2: "changed",   # NULL -> value
        3: "changed",   # value -> NULL
        4: "added",     # NULL payload, new-only
        5: "removed",   # NULL payload, old-only
    }


def test_positional_check_scalable_two_phase(spark):
    """V3's global rank is now two-phase (per-bucket row_number + prefix
    offsets), so a tiny bucket size must still produce the exact global
    positions — including violations that straddle bucket boundaries —
    and the data-sized window must be PARTITIONED (no single-partition
    global sort in the plan)."""
    from core_etl_spark.operators.verify import positional_check

    # values 0..9 with 4 and 7 missing, and 20 as an outlier:
    vals = [v for v in range(10) if v not in (4, 7)] + [20]
    df = spark.createDataFrame([(v,) for v in vals], "number long")
    out = positional_check(df, bucket=3)  # buckets of 3 → many boundaries
    got = {(r.value, r.pos) for r in out.collect()}
    # ordered values: 0,1,2,3,5,6,8,9,20 → positions 0..8
    assert got == {(5, 4), (6, 5), (8, 6), (9, 7), (20, 8)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-sized window carries a partition spec; only the bucket-count
    # offsets window (|N|/B rows) is global
    assert "windowspecdefinition(bucket" in plan.lower().replace(" ", "") or \
        "partitionby" not in plan.lower()  # fallback: plan text format drift
    # clean sequence from zero → no violations
    clean = spark.createDataFrame([(v,) for v in range(50)], "number long")
    assert positional_check(clean, bucket=7).count() == 0
    # negative values bucket correctly (floor division): ordered -2,-1,0,1
    # sit at positions 0,1,2,3 — every value differs from its position
    neg = spark.createDataFrame([(-2,), (-1,), (0,), (1,)], "number long")
    got_neg = {(r.value, r.pos) for r in positional_check(neg, bucket=3).collect()}
    assert got_neg == {(-2, 0), (-1, 1), (0, 2), (1, 3)}


def test_profile_columns_hand_case(spark):
    from core_etl_spark.operators.verify import profile_columns

    df = spark.createDataFrame(
        [(1, "en", None), (2, "en", "x"), (3, None, "x"), (4, "de", "y")],
        "id long, lang string, src string",
    )
    got = {r.col: (r.n_rows, r.n_nonnull, r.n_distinct)
           for r in profile_columns(df, ["lang", "src"]).collect()}
    assert got == {"lang": (4, 3, 2), "src": (4, 3, 2)}
    import pytest as _pt

    with _pt.raises(ValueError):
        profile_columns(df, [])


# --- warehouse writer lock (r16: cross-process single-writer contract) -------


def _plant_sentinel(root: str, pid: int, age_sec: float = 0.0) -> str:
    """Write a writer-lock sentinel as another process would have."""
    import socket
    import time

    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, ".writer__lock")
    with open(lock, "w") as f:
        f.write(f"{pid} {time.time() - age_sec} {socket.gethostname()}")
    return lock


def _tiny_blocks(spark):
    raw = FX.raw_blocks(spark, n_blocks=3, txs_per_block=1)
    return T.normalize_blocks(raw)


def test_second_process_writer_is_refused(spark, tmp_path):
    """A LIVE foreign holder (here: pid 1, alive but not us) must refuse
    this process's first mutation loudly — two processes appending to one
    warehouse interleave the commit marker and stage-and-swaps."""
    from core_etl_spark.lake import WarehouseLockedError

    root = str(tmp_path / "wh_contested")
    _plant_sentinel(root, pid=1)
    lk = Lake(spark, root, bucket_size=BUCKET)
    with pytest.raises(WarehouseLockedError, match="another process"):
        lk.write_all(_tiny_blocks(spark))
    # reads never need the lock
    assert lk.latest_block_number() == -1


def test_stale_writer_lock_is_broken(spark, tmp_path):
    """A crashed writer's sentinel (dead pid) is stale — the next writer
    breaks it and proceeds; no manual cleanup."""
    import multiprocessing as mp

    child = mp.Process(target=lambda: None)
    child.start()
    child.join()  # dead pid, guaranteed ours-to-know
    root = str(tmp_path / "wh_stale")
    _plant_sentinel(root, pid=child.pid, age_sec=7200.0)
    lk = Lake(spark, root, bucket_size=BUCKET)
    lk.write_all(_tiny_blocks(spark))
    assert lk.blocks().count() == 3


def test_same_process_reopen_reenters_lock(spark, tmp_path):
    """Every Lake instance in one process shares the per-root holder —
    re-opening a warehouse (backfill-then-tail, tests) must not
    self-collide."""
    root = str(tmp_path / "wh_reopen")
    Lake(spark, root, bucket_size=BUCKET).write_all(_tiny_blocks(spark))
    lk2 = Lake(spark, root, bucket_size=BUCKET)
    lk2.truncate_from_last_saved(1)
    assert lk2.blocks().count() == 2
    assert os.path.exists(os.path.join(root, ".writer__lock"))


def test_read_only_lake_takes_no_lock(spark, tmp_path):
    root = str(tmp_path / "wh_readonly")
    os.makedirs(root)
    lk = Lake(spark, root, bucket_size=BUCKET)
    assert lk.latest_block_number() == -1
    assert not os.path.exists(os.path.join(root, ".writer__lock"))


def test_run_with_retry_fails_fast_on_foreign_writer(spark, tmp_path):
    """A WarehouseLockedError is an operational error, not a torn write —
    run_with_retry must surface it immediately instead of burning ten
    truncate-and-retry cycles that each need the same lock."""
    from core_etl_spark.lake import WarehouseLockedError
    from core_etl_spark.pipeline import run_with_retry

    root = str(tmp_path / "wh_foreign")
    _plant_sentinel(root, pid=1)
    lk = Lake(spark, root, bucket_size=BUCKET)
    calls = []

    def job():
        calls.append(1)
        lk.write_all(_tiny_blocks(spark))
        return 0

    with pytest.raises(WarehouseLockedError):
        run_with_retry(job, lk, attempts=10)
    assert len(calls) == 1  # no retry loop
