"""The lake — partitioned-Parquet storage layout and mutation semantics.

This is the Spark-first replacement for the reference's storage backends
(reference crates/storage/sqlite3/src/sqlite3.rs, postgres.rs):

- **Layout** (K1/K2/K3): three tables under a warehouse root, partitioned by
  ``block_bucket = number div bucket_size`` (transfers additionally by token
  ``address``, collapsing the reference's table-per-token family,
  sqlite3.rs:230-270). Rows are sorted by ``number`` within partitions on
  write, so Parquet min/max stats replace the reference's six b-tree indexes
  (sqlite3.rs:131-151). At 100 TB the bucket size bounds every mutation to a
  rewrite of a few hundred MB, and point/range queries prune to one bucket.
- **Writes** (K4/K5): micro-batch appends; Spark owns buffering, so the
  reference's 750/500-row thresholds (sqlite3.rs:401, postgres.rs:394)
  disappear. Module gating (sqlite3.rs:422,443,453) is the ``modules`` set.
- **Mutations** (K6-K9): Parquet files are immutable, so every mutation is a
  *partition-scoped* delete-and-rewrite — read ONLY the affected buckets
  (partition-pruned scan), filter, dynamically overwrite those buckets.
  Nothing outside the touched partitions is ever rewritten; a reorg at the
  tip costs one bucket regardless of table size. Fully-emptied buckets are
  dropped at the directory level (the local-FS stand-in for a metastore
  ``ALTER TABLE DROP PARTITION``).
- **Maturity** (K6): recomputed, never stored — ``matured`` is
  ``number <= tip - depth`` (reference mutates rows in place,
  sqlite3.rs:213-228; a computed view is both cheaper and can't go stale).
- **Reorg detection** (K10): the reference discovers reorgs via PK-conflict
  on insert (etl.rs:147-169); append-only Parquet has no PK, so we check
  explicitly: an incoming header whose ``parent_hash`` disagrees with the
  stored hash at ``number - 1`` marks a fork.
"""

from __future__ import annotations

import atexit
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import BLOCK_SCHEMA, TOKEN_TRANSFER_SCHEMA, TRANSACTION_SCHEMA

DEFAULT_BUCKET_SIZE = 100_000
MATURITY_DEPTH = 5  # reference etl.rs:171,253 — 5-block confirmation

BLOCKS, TRANSACTIONS, TOKEN_TRANSFERS = "blocks", "transactions", "token_transfers"
ALL_MODULES = (BLOCKS, TRANSACTIONS, TOKEN_TRANSFERS)

_SCHEMAS = {
    BLOCKS: BLOCK_SCHEMA,
    TRANSACTIONS: TRANSACTION_SCHEMA,
    TOKEN_TRANSFERS: TOKEN_TRANSFER_SCHEMA,
}
#: column holding the block height per table (transfers/txs use block_number)
_NUMBER_COL = {BLOCKS: "number", TRANSACTIONS: "block_number", TOKEN_TRANSFERS: "block_number"}
_PARTITION_COLS = {
    BLOCKS: ["block_bucket"],
    TRANSACTIONS: ["block_bucket"],
    TOKEN_TRANSFERS: ["address", "block_bucket"],
}
#: Natural row identity per table — the Spark-side replacement for the
#: reference's PRIMARY KEYs (DDL sqlite3.rs:68-108; insert-conflict handling
#: etl.rs:147-169). Append-mode writes anti-join incoming rows against these
#: keys in the touched buckets, so a crashed-and-retried delivery cannot
#: double-append (ingest-level idempotency, r15). A batchTransfer fans one tx
#: into N transfer rows, so the transfer identity includes ``transfer_index``.
_NATURAL_KEY = {
    BLOCKS: ("number",),
    TRANSACTIONS: ("hash",),
    TOKEN_TRANSFERS: ("tx_hash", "address", "transfer_index"),
}


class WarehouseLockedError(RuntimeError):
    """Another PROCESS holds this warehouse's writer lock.

    Two processes appending to one warehouse root (two backfill jobs
    pointed at the same path — an orchestration mistake that WILL happen
    at scale) interleave parquet appends and group-commit marker writes
    with no coordination: the marker records heights the other writer
    never delivered, compact/retention stage-and-swaps silently drop the
    other's committed batches, and the idempotency anti-join reads a
    half-written view. The in-process ``Lake.mutex`` cannot see across
    processes, so the first MUTATION a process performs takes a
    create-exclusive on-disk writer lock (the sketch-store lock
    machinery — pid/host sentinel, live-holder-never-broken, stale-break
    with content pinning) and holds it for the process lifetime. A
    second writing process fails loudly with this error instead of
    corrupting silently. Read-only use (views, verify) never locks."""


#: warehouse root (absolute) → held lock, process-wide: every Lake
#: instance in one process shares one writer-lock holder per root, so
#: re-opening a warehouse (tests, the CLI's backfill-then-tail flow)
#: re-enters instead of self-colliding. Held until process exit — the
#: single-WRITING-PROCESS contract is per process, not per Lake object.
_WRITER_LOCKS: dict = {}
_WRITER_LOCKS_GUARD = threading.Lock()


def _release_writer_locks() -> None:
    for lk in list(_WRITER_LOCKS.values()):
        try:
            lk.__exit__(None, None, None)
        except Exception:  # noqa: BLE001 — exit path: never mask interpreter teardown
            pass
    _WRITER_LOCKS.clear()


atexit.register(_release_writer_locks)


class Lake:
    """One warehouse: paths, writes, reads, and partition-scoped mutations."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bucket_size: int = DEFAULT_BUCKET_SIZE,
        modules: tuple[str, ...] = ALL_MODULES,
    ) -> None:
        self.spark = spark
        self.root = root
        self.bucket_size = bucket_size
        self.modules = tuple(modules)
        #: serializes partition mutations against concurrent batch
        #: processing: the retention scheduler thread's stage-and-swap
        #: (rmtree + move of bucket dirs) must not race the streaming
        #: tail's reorg-check reads, and compact's scan→stage→swap must not
        #: race ANY writer — so write/write_all take this too (ADVICE r05).
        #: Re-entrant so a mutation inside the tail's own batch doesn't
        #: self-deadlock.
        self.mutex = threading.RLock()

    def _ensure_writer_lock(self) -> None:
        """Take (or re-enter) this process's on-disk writer lock for the
        warehouse root before any mutation — see
        :class:`WarehouseLockedError`. First call per (process, root)
        pays one O_CREAT|O_EXCL + ~40-byte write; every later mutation is
        a dict hit. Held until process exit (atexit); a crashed writer's
        sentinel is stale-detected by pid probe and broken by the next
        writer, so no manual cleanup is ever needed."""
        from .operators.sketches import StoreLockedError, _store_lock

        key = os.path.abspath(self.root)
        with _WRITER_LOCKS_GUARD:
            if key in _WRITER_LOCKS:
                return
            os.makedirs(key, exist_ok=True)
            lk = _store_lock(os.path.join(key, ".writer"))
            try:
                lk.__enter__()
            except StoreLockedError as e:
                raise WarehouseLockedError(
                    f"warehouse writer lock held: {key} — another process "
                    "is writing this warehouse (two concurrent exports on "
                    "one path interleave appends and the commit marker); "
                    "stop it or point this job at its own warehouse root"
                ) from e
            _WRITER_LOCKS[key] = lk

    # --- layout --------------------------------------------------------------

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(("block_bucket=", "address="))
            for f in os.listdir(p)
        )

    def _bucket(self, number_col: str) -> F.Column:
        return (F.col(number_col) / F.lit(self.bucket_size)).cast("long").alias(
            "block_bucket"
        )

    # --- writes (K4/K5) --------------------------------------------------------

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "append",
        height_range: tuple[int, int] | None = None,
    ) -> None:
        """Append a micro-batch. Adds the bucket column, sorts within
        partitions by height (clustering for min/max skipping — the index
        replacement), and writes through the partition layout. ``mode`` may
        be ``overwrite`` with dynamic partition overwrite for idempotent
        re-ingest of a bucket (the exactly-once story, SURVEY §7).

        Holds the lake mutex: ``compact``'s scan→stage→swap is only safe if
        every writer serializes against it — a write landing between
        compact's scan and its directory swap would be silently dropped by
        the stale staged rewrite. Re-entrant for the streaming tail's outer
        hold."""
        self._ensure_writer_lock()
        with self.mutex:
            self._write_unlocked(name, df, mode, height_range)

    def _write_unlocked(
        self,
        name: str,
        df: DataFrame,
        mode: str,
        height_range: tuple[int, int] | None = None,
    ) -> None:
        # Lock-free body so write_all's pool workers (different threads — an
        # RLock hold doesn't extend to them) can run concurrently under the
        # single group hold taken by the submitting thread.
        if name not in self.modules:  # K5 module gating
            return
        num = _NUMBER_COL[name]
        out = df.withColumn("block_bucket", self._bucket(num))
        if mode == "append":
            out = self._drop_redelivered(name, out, height_range)
        parts = _PARTITION_COLS[name]
        (
            out.repartition(*[F.col(c) for c in parts])
            .sortWithinPartitions(num)
            .write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(self.path(name))
        )

    def _drop_redelivered(
        self,
        name: str,
        out: DataFrame,
        height_range: tuple[int, int] | None = None,
    ) -> DataFrame:
        """Ingest-level idempotency (r15, the last reference-parity gap):
        drop incoming rows whose natural key (``_NATURAL_KEY``) already
        exists in the lake, so a crashed-and-retried backfill chunk or a
        re-delivered streaming batch cannot double-append. The reference
        gets this free from its PRIMARY KEYs (etl.rs:147-169,
        sqlite3.rs:68-108); append-only Parquet has no PK, so the check is
        explicit — and *bounded*:

        - the key probe reads ONLY the buckets the batch touches
          (partition-pruned via the committed leaf-dir listing — one
          listdir per layout level, no data read to decide) and ONLY the
          key columns (column-pruned scan);
        - the touched-bucket range comes from one 1-row min/max aggregate
          over the batch (batches are materialized upstream, see
          ``pipeline.ingest_raw``, so this is a cheap re-scan);
        - during normal forward progress a new chunk lands in buckets that
          do not exist yet, the overlap is empty, and the anti-join is
          skipped entirely — the common path pays only the 1-row aggregate.

        At 100 TB the probe cost is O(chunk), never O(table). The
        left-anti join shuffles the bounded batch against the pruned key
        set; AQE broadcasts the small side at runtime. Within-batch
        uniqueness is the upstream normalizer's invariant (one row per
        block/tx/log from nested raw blocks), not re-checked here.
        Partition mutations (reorg clean, truncate, retention) run under
        the same mutex, so probe + write are atomic against them. NULL
        keys never equi-match, so NULL-key rows are always kept — the
        same stance as a SQL PRIMARY KEY, which forbids NULL members."""
        if not self.exists(name):
            return out
        committed = self._bucket_leaf_dirs(name)
        if not committed:
            return out
        if height_range is not None:
            # Caller-supplied covering range (the backfill loop knows each
            # chunk's [lo, hi] exactly): the touched buckets follow by
            # arithmetic — the probe costs ZERO extra jobs on the hot
            # path. The hint must COVER the batch's heights; a narrower
            # range would let out-of-range rows bypass the key probe.
            lo_b = height_range[0] // self.bucket_size
            hi_b = height_range[1] // self.bucket_size
        else:
            row = out.agg(
                F.min("block_bucket").alias("lo"),
                F.max("block_bucket").alias("hi"),
            ).first()
            if row is None or row["lo"] is None:
                return out  # empty batch
            lo_b, hi_b = row["lo"], row["hi"]
        overlap = [b for b in committed if lo_b <= b <= hi_b]
        if not overlap:
            return out
        keys = list(_NATURAL_KEY[name])
        existing = (
            self.spark.read.parquet(self.path(name))
            .filter(F.col("block_bucket").isin(overlap))
            .select(*keys)
        )
        # Re-select the incoming column order: a list-form equi-join moves
        # the key columns to the FRONT, so a deduped append would write
        # parquet files whose column order differs from fresh appends —
        # by-name parquet resolution hides it on reads, but positional
        # consumers (exceptAll, byte-identity sweeps) then see garbage
        # (r16, found by the integrity-sweep repair test).
        return out.join(existing, on=keys, how="left_anti").select(*out.columns)

    def write_all(
        self,
        blocks: DataFrame | None = None,
        transactions: DataFrame | None = None,
        token_transfers: DataFrame | None = None,
        mode: str = "append",
        height_range: tuple[int, int] | None = None,
        delivery_verified: bool = False,
        verified_hi: int | None = None,
    ) -> None:
        """Write up to three modules as CONCURRENT Spark jobs: the sinks are
        independent (separate directories), so serializing them leaves the
        cluster idle during each job's commit phase. Wall time per batch is
        max(write) instead of sum(write); inputs must derive from a
        materialized batch (see ``pipeline.ingest_raw``) so the concurrent
        jobs don't race to recompute shared lineage.

        ``delivery_verified=True`` asserts the caller ALREADY proved the
        batch covers ``height_range`` contiguously (the streaming tail's
        rank-window guard constructs exactly ``[last+1, last+n]``), so the
        delivery-contiguity probe is skipped — one fewer aggregate job per
        micro-batch on the live path (r16 review). Never pass it for
        provider-fetched chunks: silently skipped heights are precisely
        what the probe exists to catch.

        ``verified_hi`` (r17): the probe's PRECOMPUTED result, for callers
        that already ran the exact contiguity aggregate over the
        materialized chunk — the backfill loop fuses it into the prefetch
        thread's checkpoint job (one job materializes the chunk AND
        probes it, overlapped with the previous chunk's ingest), so the
        ingest-path pool here shrinks to the three sink writes. Same
        math, same marker rules; ``None`` keeps the in-pool probe."""
        from concurrent.futures import ThreadPoolExecutor

        todo = [
            (name, df)
            for name, df in (
                (BLOCKS, blocks),
                (TRANSACTIONS, transactions),
                (TOKEN_TRANSFERS, token_transfers),
            )
            if df is not None
        ]
        # One mutex hold around the whole group: the sinks stay concurrent
        # with each other (workers run the lock-free body) while the group as
        # a unit serializes against compact/retention stage-and-swap.
        need_marker = bool(todo) and mode == "append" and height_range is not None
        self._ensure_writer_lock()
        with self.mutex:
            if len(todo) == 1 and not need_marker:
                self._write_unlocked(todo[0][0], todo[0][1], mode, height_range)
            else:
                # The delivery-contiguity probe (one 1-row aggregate over
                # the materialized chunk) rides the SAME pool as the sink
                # writes — a sequential probe added one driver-scheduled
                # job per chunk to the hot ingest path (bench o1 +20%,
                # r16); concurrent, its wall cost hides behind the writes.
                # It must still COMPLETE before the marker advances.
                with ThreadPoolExecutor(max_workers=len(todo) + 1) as pool:
                    verify_fut = (
                        pool.submit(
                            self._verified_contiguous_hi, blocks, height_range
                        )
                        if need_marker and not delivery_verified
                        and verified_hi is None
                        else None
                    )
                    futures = [
                        pool.submit(
                            self._write_unlocked, name, df, mode, height_range
                        )
                        for name, df in todo
                    ]
                    for f in futures:
                        f.result()
                    if verify_fut is not None:
                        hi = verify_fut.result()
                    elif need_marker and verified_hi is not None and not delivery_verified:
                        hi = verified_hi
                    else:
                        hi = height_range[1] if need_marker else None
                if need_marker and hi is not None:
                    self._advance_commit_marker(hi, lo=height_range[0])

    def _verified_contiguous_hi(
        self, blocks: DataFrame | None, height_range: tuple[int, int]
    ) -> int | None:
        """Highest height through which THIS chunk's delivery is verifiably
        contiguous (ADVICE r15): ``fetch_blocks`` silently skips heights
        (null/pruned replies, raised transport errors), and advancing the
        group-commit marker to the *requested* hi would make those heights
        permanent holes — ``resume_point`` starts past them and the
        idempotent anti-join can only heal ranges that get re-delivered.
        Mirrors the streaming tail's contiguity guard: verify the delivered
        block numbers cover ``[lo, hi]`` with one 1-row aggregate over the
        (already materialized) chunk; on a gap, advance only to the prefix
        before the first missing height so the next resume re-fetches it.
        Returns ``None`` only when there is no delivery evidence at all (no
        blocks frame in the group). When the chunk's FIRST height is the
        missing one (or nothing was delivered), it returns ``lo - 1`` — the
        vacuous verified prefix — rather than ``None``: on a marker-less
        warehouse (fresh bootstrap, pre-marker legacy) a ``None`` would
        leave no marker file at all and ``resume_point`` would fall back to
        the blocks TIP, silently skipping the hole forever (r16 review).
        ``lo - 1`` is uniformly safe: with an existing marker the frontier
        rule reduces it to a no-op, and on bootstrap it pins resume at the
        hole."""
        if blocks is None:
            return None  # no delivery evidence — keep the old watermark
        lo, hi = height_range
        nums = blocks.select(F.col("number")).filter(
            F.col("number").between(lo, hi)
        )
        row = nums.agg(
            F.countDistinct("number").alias("cnt"),
            F.min("number").alias("mn"),
            F.max("number").alias("mx"),
        ).first()
        if row is None or row["cnt"] == 0 or row["mn"] != lo:
            return lo - 1
        if row["cnt"] == hi - lo + 1:
            return hi  # common path: one cheap aggregate, full range verified
        # Gap somewhere in (lo, hi]: find the first missing height with one
        # bounded anti-join (chunk-sized range frame vs chunk-sized key set —
        # O(chunk), never O(table)).
        missing = (
            self.spark.range(lo, hi + 1)
            .withColumnRenamed("id", "number")
            .join(nums, on="number", how="left_anti")
            .agg(F.min("number").alias("m"))
            .first()
        )
        first_gap = missing["m"] if missing is not None else None
        if first_gap is None:
            return hi
        return int(first_gap) - 1 if first_gap > lo else None

    # --- group-commit watermark (r15 review) ------------------------------------
    #
    # ``write_all``'s sinks are independent jobs: a crash between them
    # leaves a TORN group (blocks committed, transactions not), and the
    # blocks-derived tip then hides the tear from both the tail's stale
    # guard and backfill resume — the idempotent anti-join can only heal
    # what gets re-delivered. The marker records the highest height through
    # which a whole append GROUP committed; ``resume_point`` reads it, so a
    # torn range is always re-delivered (and the anti-join absorbs the
    # already-committed sinks). Atomic tmp+rename under the lake mutex;
    # height-removing mutations clamp it back. A marker-less warehouse
    # (pre-r15, or ad-hoc writes without a height_range) falls back to the
    # legacy blocks-tip resume.

    def _marker_path(self) -> str:
        return os.path.join(self.root, "_ingest_commit")

    def _read_marker(self) -> int | None:
        import json as _json

        try:
            with open(self._marker_path()) as f:
                return int(_json.load(f)["hi"])
        except (OSError, ValueError, KeyError, TypeError):
            return None

    def _write_marker(self, hi: int) -> None:
        import json as _json

        os.makedirs(self.root, exist_ok=True)
        tmp = f"{self._marker_path()}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            _json.dump({"hi": int(hi)}, f)
        os.replace(tmp, self._marker_path())

    def _advance_commit_marker(self, hi: int, lo: int | None = None) -> None:
        """Advance the watermark to ``hi`` — but never ACROSS a gap: when
        the caller supplies the verified range's ``lo``, the advance is
        refused if ``lo > marker + 1`` (r16 self-review: a hole in chunk N
        made that chunk advance only to the verified prefix, but chunk
        N+1's blind max-advance then papered over the hole permanently —
        the exact defect the contiguity guard exists to prevent, one
        chunk later). A refused advance is not lost progress: resume
        re-fetches from the marker, the already-committed heights above
        the hole dedup via the anti-join, and the re-delivered chunks
        re-advance the marker chunk by chunk. ``lo=None`` (legacy callers,
        marker-less bootstrap) keeps the plain max semantics."""
        prev = self._read_marker()
        if prev is not None and lo is not None and lo > prev + 1:
            return
        if prev is None or hi > prev:
            self._write_marker(hi)

    def _clamp_marker(self) -> None:
        """After a height-removing mutation the marker may exceed the real
        tip; resuming from it would skip the re-fetch and leave a hole —
        clamp it to the surviving tip."""
        m = self._read_marker()
        if m is None:
            return
        # the callers' per-table deletes early-return on absent tables, so
        # this can be the mutation's FIRST write — it still needs the
        # cross-process writer lock (r16 completeness pass)
        self._ensure_writer_lock()
        tip = self.latest_block_number()
        if tip < m:
            self._write_marker(tip)

    def resume_point(self) -> int:
        """Highest height through which ingest is known COMPLETE across all
        modules: the group-commit marker when present, else the legacy
        blocks-tip fallback chain. This — not ``latest_block_number`` — is
        what O3 resume and the tail's stale guard must key on, or a torn
        ``write_all`` strands per-sink holes forever (r15 review)."""
        m = self._read_marker()
        return m if m is not None else self.latest_block_number()

    # --- reads -----------------------------------------------------------------

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            return self.spark.createDataFrame([], _SCHEMAS[name])
        return self.spark.read.parquet(self.path(name))

    def blocks(self) -> DataFrame:
        return self.read(BLOCKS)

    def transactions(self) -> DataFrame:
        return self.read(TRANSACTIONS)

    def token_transfers(self) -> DataFrame:
        return self.read(TOKEN_TRANSFERS)

    # --- height-pruned lookups ----------------------------------------------------
    #
    # Catalyst cannot infer ``block_bucket`` from a ``number`` predicate, so a
    # bare height filter scans every partition. These helpers add the derived
    # bucket predicate, turning point/range lookups into one-bucket scans
    # (check ``PartitionFilters`` in .explain) — the engine's replacement for
    # the reference's b-tree index lookups (sqlite3.rs:131-151).

    def height_pruned(
        self, name: str, lo: int | None = None, hi: int | None = None
    ) -> DataFrame:
        """Rows of ``name`` with height in [lo, hi], bucket-pruned."""
        num = _NUMBER_COL[name]
        df = self.read(name)
        cond = F.lit(True)
        if lo is not None:
            cond = (F.col(num) >= lo) & (
                F.col("block_bucket") >= lo // self.bucket_size
            )
        if hi is not None:
            cond = cond & (F.col(num) <= hi) & (
                F.col("block_bucket") <= hi // self.bucket_size
            )
        return df.filter(cond)

    def block_by_number(self, n: int) -> DataFrame:
        """Q2 point lookup, pruned to one bucket (sqlite3.rs:706-719)."""
        return self.height_pruned(BLOCKS, n, n)

    def blocks_in_range(self, start: int, end: int = -1) -> DataFrame:
        """Q5 range scan; ``end < 0`` open-ended (sqlite3.rs:684-704)."""
        return self.height_pruned(BLOCKS, start, end if end >= 0 else None)

    def block_transactions(self, n: int) -> DataFrame:
        """Q6 — all transactions of one block, pruned (sqlite3.rs:644-657)."""
        return self.height_pruned(TRANSACTIONS, n, n)

    # --- resume / tip (O3, Q1) ---------------------------------------------------

    def _bucket_leaf_dirs(self, name: str) -> dict[int, list[str]]:
        """Committed ``block_bucket=*`` leaf dirs keyed by bucket value,
        from the partition layout alone — one ``listdir`` per layout level
        (the local-FS stand-in for a metastore ``SHOW PARTITIONS``), never a
        full tree walk; no data files are read. Hidden entries
        (``_temporary`` task-attempt trees, ``_SUCCESS``, dotfiles) are
        pruned at every level, mirroring Hadoop's hiddenFileFilter — an
        in-flight or crashed write must not leak uncommitted partitions
        into tip/resume/truncate decisions."""
        parents = [self.path(name)]
        for col in _PARTITION_COLS[name][:-1]:
            nxt: list[str] = []
            for p in parents:
                try:
                    entries = os.listdir(p)
                except OSError:
                    continue
                nxt.extend(
                    os.path.join(p, d)
                    for d in entries
                    if d.startswith(f"{col}=")
                )
            parents = nxt
        leaves: dict[int, list[str]] = {}
        for p in parents:
            try:
                entries = os.listdir(p)
            except OSError:
                continue
            for d in entries:
                if not d.startswith("block_bucket="):
                    continue
                try:
                    b = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                leaves.setdefault(b, []).append(os.path.join(p, d))
        return leaves

    def _footer_max(self, name: str, leaf_dirs: list[str]) -> int | None:
        """Max height across one bucket's leaf dirs from parquet footer
        statistics — pure driver-side metadata, no cluster job (the write
        path sorts by height within partitions, so row-group min/max stats
        are always present and tight). Returns None when stats are
        unavailable and the caller must fall back to a scan."""
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover — pyarrow ships with pyspark
            return None
        col = _NUMBER_COL[name]
        best = None
        for dirpath in leaf_dirs:
            try:
                files = os.listdir(dirpath)
            except OSError:
                return None
            for f in files:
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(dirpath, f)).metadata
                except Exception:  # noqa: BLE001 — torn file → scan fallback
                    return None
                idx = next(
                    (i for i in range(md.num_columns)
                     if md.schema.column(i).name == col),
                    None,
                )
                if idx is None:
                    return None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        return None
                    best = st.max if best is None else max(best, st.max)
        return int(best) if best is not None else None

    def latest_block_number(self) -> int:
        """Resume point (reference etl.rs:84-89): max height with the Q1
        fallback chain blocks → transactions → transfers → -1 (the reference
        returns 0 for empty; -1 distinguishes 'nothing synced' from
        'genesis synced').

        The tip can only live in the highest ``block_bucket``, so the lookup
        prunes to that one partition via the directory listing and then
        answers from parquet footer statistics alone — a driver-side
        metadata read, no cluster job. At 100 TB this is one bucket's
        footers instead of the whole table, and it runs at every job start
        (O3) and before every truncate (K8). (On an object store the same
        role falls to the table format's column stats — e.g. Delta/Iceberg
        manifest entries — rather than raw footer reads.)"""
        for name in (BLOCKS, TRANSACTIONS, TOKEN_TRANSFERS):
            if name in self.modules and self.exists(name):
                leaves = self._bucket_leaf_dirs(name)
                top = max(leaves) if leaves else None
                if top is not None:
                    m = self._footer_max(name, leaves[top])
                    if m is not None:
                        return m
                if top is None:
                    df = self.read(name)
                else:
                    # read ONLY the top bucket's leaf dirs — skips the
                    # full-table file listing, not just the file scan
                    # (block_bucket is the leaf level in every layout)
                    df = self.spark.read.parquet(*leaves[top])
                row = df.agg(F.max(_NUMBER_COL[name]).alias("m")).first()
                if row and row.m is not None:
                    return int(row.m)
        return -1

    # --- maturity (K6) -----------------------------------------------------------

    def blocks_with_maturity(self, depth: int = MATURITY_DEPTH) -> DataFrame:
        """Blocks with ``matured`` *recomputed* against the current tip —
        the replacement for the reference's in-place UPDATE
        (sqlite3.rs:213-228, driven at etl.rs:171,318-321,253)."""
        from .operators.maintenance import with_maturity

        return with_maturity(self.blocks(), depth)

    # --- partition-scoped delete-and-rewrite core --------------------------------

    def _delete_where(self, name: str, heights_pred) -> None:
        """Delete rows matching ``heights_pred(number_col)`` from ``name`` by
        rewriting only the buckets that can contain them: the survivors are
        staged to a scratch dir, then swapped in at the partition-directory
        level (staged-then-move — the overwrite never races the read plan,
        and a crash mid-swap loses no committed bucket)."""
        if name not in self.modules or not self.exists(name):
            return
        self._ensure_writer_lock()
        with self.mutex:
            self._delete_where_locked(name, heights_pred)

    def _delete_where_locked(self, name: str, heights_pred) -> None:
        num = F.col(_NUMBER_COL[name])
        df = self.spark.read.parquet(self.path(name))
        buckets = [
            r.block_bucket
            for r in df.filter(heights_pred(num)).select("block_bucket").distinct().collect()
        ]
        if not buckets:
            return
        scoped = df.filter(F.col("block_bucket").isin(buckets))  # pruned scan
        kept = scoped.filter(~heights_pred(num))
        parts = _PARTITION_COLS[name]
        stage = os.path.join(self.root, f".stage_{name}_{os.urandom(6).hex()}")
        (
            kept.repartition(*[F.col(c) for c in parts])
            .sortWithinPartitions(_NUMBER_COL[name])
            .write.mode("overwrite")
            .partitionBy(*parts)
            .parquet(stage)
        )
        try:
            self._swap_buckets(name, stage, set(buckets))
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    @staticmethod
    def _leaf_partition_dirs(base: str) -> list[str]:
        """Relative paths of every committed partition leaf dir holding
        parquet files. Hidden subtrees (``_temporary``, dotdirs) are pruned
        so an in-flight write's task-attempt dirs can never be swapped in as
        if they were committed partitions."""
        out = []
        for dirpath, dirnames, filenames in os.walk(base):
            dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
            if any(
                f.endswith(".parquet") and not f.startswith(("_", "."))
                for f in filenames
            ):
                out.append(os.path.relpath(dirpath, base))
        return out

    def _swap_buckets(self, name: str, stage: str, buckets: set[int]) -> None:
        """Replace every affected bucket's leaf dir with its staged rewrite;
        affected buckets absent from the stage became empty → dropped (the
        local-FS stand-in for ``ALTER TABLE DROP PARTITION``)."""
        target = self.path(name)
        affected = {f"block_bucket={b}" for b in buckets}
        for rel in self._leaf_partition_dirs(target):
            if os.path.basename(rel) in affected:
                shutil.rmtree(os.path.join(target, rel), ignore_errors=True)
        for rel in self._leaf_partition_dirs(stage):
            if os.path.basename(rel) in affected:
                dst = os.path.join(target, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.rmtree(dst, ignore_errors=True)
                shutil.move(os.path.join(stage, rel), dst)

    # --- reorg cleanup (K7) --------------------------------------------------------

    def clean_block_data(self, number: int) -> None:
        """Remove one block's rows across all modules (reference
        sqlite3.rs:272-325 runs transactional DELETEs over blocks, txs, and
        every catalog-discovered transfer table). One bucket rewrite per
        table."""
        for name in self.modules:
            self._delete_where(name, lambda c: c == F.lit(number))
        self._clamp_marker()

    def clean_blocks(self, numbers: list[int]) -> None:
        """Batch form of :func:`clean_block_data`: remove a SET of heights
        in one bucket-scoped rewrite pass per table (the integrity sweep
        repairs many flagged heights at once — per-height calls would pay
        one staged-swap per height per table; ADVICE r15)."""
        numbers = [int(n) for n in numbers]
        if not numbers:
            return
        for name in self.modules:
            self._delete_where(name, lambda c: c.isin(numbers))
        self._clamp_marker()

    # --- truncate last N (K8) --------------------------------------------------------

    def truncate_from_last_saved(self, n: int) -> None:
        """Delete the top-N heights: ``number > max(number) - n`` per table
        (reference sqlite3.rs:327-392 scalar-subquery DELETE; crash recovery
        truncates 100, export.rs:62)."""
        tip = self.latest_block_number()
        if tip < 0:
            return
        cutoff = tip - n
        for name in self.modules:
            self._delete_where(name, lambda c: c > F.lit(cutoff))
        self._clamp_marker()

    # --- retention cleanup (K9) -------------------------------------------------------

    def retention_cleanup(self, cutoff_unix: int) -> None:
        """Drop data older than the cutoff (reference sqlite3.rs:483-536:
        periodic ``DELETE WHERE created_at < now - retention`` over every
        table). Heights are time-ordered, so the cutoff maps to one boundary
        height; whole buckets below it are dropped at the partition level and
        only the boundary bucket is rewritten."""
        self._ensure_writer_lock()
        with self.mutex:  # one consistent sweep vs the streaming tail
            blocks = self.blocks()
            if BLOCKS in self.modules and self.exists(BLOCKS):
                row = (
                    blocks.filter(F.col("timestamp") < F.lit(cutoff_unix))
                    .agg(F.max("number").alias("m"))
                    .first()
                )
                if row is None or row.m is None:
                    return
                boundary = int(row.m)
            else:
                return
            for name in self.modules:
                self._delete_where(name, lambda c: c <= F.lit(boundary))

    # --- bucketed mirrors (co-located joins) ---------------------------------------

    def write_bucketed(self, name: str, df: DataFrame, n_buckets: int = 16) -> str:
        """Write a hash-bucketed mirror of a table for *shuffle-free* equi-
        joins on the height key: two tables bucketed the same way co-locate
        matching keys, so ``blocks ⋈ transactions`` needs no Exchange on
        either side — the 100 TB answer when both join sides are too big to
        broadcast and the join recurs (SURVEY §4's bucketing row).

        Bucketing metadata only exists in the session catalog
        (``saveAsTable``), so mirrors are managed tables named
        ``<name>_bucketed``; call once per ingest epoch, not per query."""
        self._ensure_writer_lock()
        num = _NUMBER_COL[name]
        table = f"{name}_bucketed"
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, num)
            .sortBy(num)
            .format("parquet")
            .option("path", os.path.join(self.root, "_bucketed", table))
            .saveAsTable(table)
        )
        return table

    # --- compaction ---------------------------------------------------------------

    def compact(self, name: str, target_rows_per_file: int = 1_000_000) -> int:
        """Compact small files: streaming appends leave one file per
        micro-batch per partition; a month of 7-second blocks is ~370k tiny
        files — scan-killing at 100 TB. Rewrites each bucket whose file
        count exceeds rows/target into ⌈rows/target⌉ files (same
        staged-then-move swap as the mutations, so readers never see a
        half-compacted bucket). Returns the number of buckets rewritten."""
        if name not in self.modules or not self.exists(name):
            return 0
        # The whole scan→stage→swap must hold the lake mutex: a micro-batch
        # append committed between the scan and the swap would land in a
        # bucket the swap then replaces with the stale staged rewrite,
        # silently dropping the committed rows (same discipline as
        # _delete_where and retention_cleanup).
        self._ensure_writer_lock()
        with self.mutex:
            df = self.spark.read.parquet(self.path(name))
            per_bucket = (
                df.withColumn("_file", F.input_file_name())
                .groupBy("block_bucket")
                .agg(
                    F.count("*").alias("_rows"),
                    F.count_distinct("_file").alias("_files"),
                )
                .collect()
            )
            todo = [
                (r.block_bucket, int(r._rows))
                for r in per_bucket
                if r._files > max(1, -(-int(r._rows) // target_rows_per_file))
            ]
            if not todo:
                return 0
            buckets = [b for b, _ in todo]
            scoped = df.filter(F.col("block_bucket").isin(buckets))
            parts = _PARTITION_COLS[name]
            num = _NUMBER_COL[name]
            n_files = max(1, -(-sum(r for _, r in todo) // target_rows_per_file))
            stage = os.path.join(self.root, f".stage_{name}_{os.urandom(6).hex()}")
            # Range-partition on (partition cols, number): an oversized bucket
            # spreads across several sorted tasks instead of collapsing to one
            # writer, and maxRecordsPerFile enforces the per-file target even
            # when a single task still holds more than one file's worth.
            (
                scoped.repartitionByRange(n_files, *[F.col(c) for c in parts], F.col(num))
                .sortWithinPartitions(num)
                .write.mode("overwrite")
                .option("maxRecordsPerFile", target_rows_per_file)
                .partitionBy(*parts)
                .parquet(stage)
            )
            try:
                self._swap_buckets(name, stage, set(buckets))
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            return len(buckets)

    # --- reorg detection (K10) -----------------------------------------------------

    def detect_reorgs(self, incoming_headers: DataFrame) -> DataFrame:
        """Fork check replacing the reference's PK-conflict signal
        (etl.rs:147-169). Two signals, both needed:

        - **same-height conflict** — an incoming header whose ``hash``
          differs from the stored block at the same ``number`` (this is the
          literal analogue of the reference's duplicate-PK insert failure);
        - **parent mismatch** — an incoming header whose ``parent_hash``
          disagrees with the stored hash at ``number - 1``, invalidating the
          stored parent.

        Returns one column ``forked_number``: stored heights invalidated by
        the incoming batch. The caller truncates from ``min(forked_number)``
        (everything stored above a fork point was built on the dead branch)."""
        from .operators.maintenance import detect_reorgs

        return detect_reorgs(self.blocks(), incoming_headers)
