"""Portable sketches — cross-engine-deterministic HyperLogLog and
deterministic-sample quantiles (SURVEY §2.8 approx family).

Spark's built-in sketches (``approx_count_distinct`` HLL++,
``percentile_approx`` KLL-style digest — specs g06b/g21b) are the fast
path at 100 TB, but their register layouts are engine-private: the same
data gives different estimates on a different engine, so the specs can
only be rows-only-checked. These operators close that gap with sketches
whose STATE is plain integer columns derived from md5 — every
intermediate (bucket, rho, scaled register sum) and the final estimate
replay bit-for-bit in any engine with md5/substr/bin/pow, which is what
lets g06c/g21c carry full DuckDB value-hash oracles.

Portability rules (all verified against DuckDB in tests/test_parity):

- hash = md5 of the key's decimal string — identical bytes everywhere;
- hex→int via 8-hex-char (32-bit) words, so BIGINT never overflows
  (Spark ``conv(hex,16,10)`` == DuckDB ``CAST('0x'||hex AS BIGINT)``);
- rho (leading-zero rank) from ``33 - length(bin(word))`` — both engines
  print ``bin`` without leading zeros, no float log2 at bucket edges;
- the register sum is INTEGER-scaled by 2^33 (each bucket contributes
  2^(33-rho), empty buckets 2^33), so the only float ops are one final
  division and, in the linear-counting branch, one ``ln`` — both
  floor-truncated at 4 dp (``floor(x*10000)/10000``, NOT ``round``:
  round()'s half-boundary is implementation-defined across engines,
  floor of an identical IEEE double is bit-deterministic).

Scale shape: ``hll_registers`` is one pass with map-side partial
``max(rho)`` per (group, bucket) — each mapper emits ≤ m rows per group
regardless of input size, the shuffle moves registers, never rows, and
merging two register tables is the same ``max``, which is how partial
sketches from 1000 executors (or 1000 days of increments) combine
without re-reading data. ``sampled_quantiles`` filters on a hash bit
range before any shuffle, so the sort/percentile work downstream sees
1/2^shift of the rows.

Accuracy: standard HLL (Flajolet/Fusy/Gandouet/Meunier 2007), ±1.04/
sqrt(m) relative std error (m=4096 → ~1.6%), with the linear-counting
correction below 2.5m. The default 32-bit rho word makes estimates above
~100M per group drift low (the classic large-range regime);
``word_hex=12`` switches to a 48-bit word, pushing that ceiling past
10^13 with the same bit-replayability (tested against the Python
reference). The Count-Min sketch follows Cormode &
Muthukrishnan 2005; the weighted-sampling companion in
operators/sampling.py is Efraimidis & Spirakis 2006; the mergeable
log-linear quantile histogram at the bottom of this module is
HdrHistogram's bucketing (Tene) with DDSketch's error model (Masson,
Rim & Lee, VLDB 2019), done entirely in dyadic-exact arithmetic.

The persisted-store contract (staged swap, applied-batch ledger,
single-writer lock, batch_id wiring for foreachBatch vs cron, geometry
rules) is consolidated in one page: ``docs/sketch-stores.md``.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: scaling exponent for the integer register sum: contribution
#: 2^(rho_max - rho), rho ∈ [1, rho_max] → contributions are exact
#: BIGINTs. rho_max = word bits + 1; the default 32-bit word (8 hex
#: chars) is good to ~100M distinct per group, `word_hex=12` (48-bit)
#: raises that past 10^13 — sums stay < 2^(49+p) < 2^63 for p ≤ 12.
def _rho_max(word_hex: int) -> int:
    assert word_hex in (8, 12), "rho word must be 8 (32-bit) or 12 (48-bit) hex"
    return 4 * word_hex + 1


def _hash_words(key: Column, word_hex: int = 8) -> tuple[Column, Column]:
    """Bucket word (32-bit) + rho word (``word_hex`` hex chars) from one
    md5 of the key's string form."""
    h = F.md5(key.cast("string"))
    w1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    w2 = F.conv(F.substring(h, 9, word_hex), 16, 10).cast("long")
    return w1, w2


def _alpha(m: int) -> str:
    """HLL bias constant as a SQL-literal expression (kept textual so the
    Spark and DuckDB sides evaluate the identical IEEE expression).

    Every literal is e-notation (r16 review, verified live on both
    engines): ``0.7213 / (1 + 1.079 / 4096.0)`` parses as DECIMAL
    arithmetic on Spark — which ROUNDS the inner quotient to scale 9 —
    but DOUBLE on DuckDB, a ~2.7e-10 relative drift that exceeds the
    4-dp floor grid for any estimate above ~4e5 and can even flip the
    linear-counting branch. E-notation literals are DOUBLE in both
    dialects, so the expression is bit-identical again."""
    assert m >= 128, "portable HLL supports p >= 7"
    return f"0.7213e0 / (1e0 + 1.079e0 / {m}e0)"


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: Sequence[str] = (),
    word_hex: int = 8,
) -> DataFrame:
    """One-pass HLL register table: (group_cols..., bucket, rho).

    bucket = first 32-bit md5 word mod 2^p; rho = leading-zero rank of the
    rho word (rho_max − bin-length, rho_max when the word is 0). The
    groupBy's map-side partial ``max`` bounds every mapper's output at m
    rows per group — the sketch, not the data, is what shuffles.
    ``word_hex`` must match between registers and estimate (8 → counts to
    ~100M per group; 12 → past 10^13).
    """
    m = 1 << p
    rho_max = _rho_max(word_hex)
    # the register sum must stay inside BIGINT: contribution 2^rho_max per
    # empty bucket × m buckets → needs rho_max + p < 63 (r16 review; the
    # old comment documented "p <= 12" but nothing enforced it, and the
    # overflow wraps SILENTLY under Spark's non-ANSI default)
    assert rho_max + p < 63, (
        f"register sum overflows BIGINT: 4*word_hex+1+p = {rho_max + p} >= 63"
    )
    w1, w2 = _hash_words(F.col(col), word_hex)
    rho = (
        F.when(w2 == 0, F.lit(rho_max))
        .otherwise(F.lit(rho_max) - F.length(F.bin(w2)))
        .cast("int")
    )
    return (
        # NULL keys carry no distinct identity (COUNT DISTINCT and HLL++
        # both ignore them); unfiltered, md5(NULL)=NULL minted a phantom
        # (bucket NULL, rho NULL) register that corrupted used_buckets/
        # zero_buckets/sum_scaled (r16 review)
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, (w1 % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    registers: Iterable[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge register tables (partial sketches) — union + max per bucket.
    Exactly the combine step a 1000-executor tree aggregation or an
    incremental daily sketch store performs; tests assert merge(halves)
    is frame-identical to a single-pass sketch of the whole."""
    regs = list(registers)
    if not regs:
        # A store-update loop that filtered every partial away would
        # otherwise die on a bare IndexError (ADVICE r10).
        raise ValueError("at least one register table required")
    out = regs[0]
    for r in regs[1:]:
        out = out.unionByName(r)
    return out.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    p: int = 12,
    group_cols: Sequence[str] = (),
    estimate_col: str = "estimate",
    word_hex: int = 8,
) -> DataFrame:
    """Estimate from a register table: integer-scaled harmonic mean +
    linear-counting correction below 2.5m, floor-truncated at 4 dp.
    ``word_hex`` must match the value the registers were built with.

    Output columns: group_cols..., used_buckets, zero_buckets,
    sum_scaled (the exact BIGINT register sum — the auditable sketch
    state), <estimate_col>.
    """
    m = 1 << p
    rho_max = _rho_max(word_hex)
    scale = float(1 << rho_max)
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("used_buckets"),
        F.sum(F.expr(f"CAST(pow(2.0, {rho_max} - rho) AS BIGINT)")).alias(
            "_present"
        ),
    )
    zeros = F.lit(m) - F.col("used_buckets")
    sum_scaled = (F.col("_present") + zeros * F.lit(1 << rho_max)).cast("long")
    with_state = agg.withColumn("zero_buckets", zeros.cast("long")).withColumn(
        "sum_scaled", sum_scaled
    )
    raw = F.expr(
        f"({_alpha(m)}) * {m}.0 * {m}.0 * {scale} / CAST(sum_scaled AS DOUBLE)"
    )
    linear = F.expr(f"{m}.0 * ln({m}.0 / zero_buckets)")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zero_buckets") > 0), linear
    ).otherwise(raw)
    # floor-at-4dp, NOT round: round()'s half-boundary behavior is
    # implementation-defined across engines (Spark BigDecimal half-up on
    # the shortest decimal repr vs DuckDB's scaled C round — l44 hit a
    # real .5 boundary at sf0.001), while floor of the identical IEEE
    # double is bit-deterministic.
    return with_state.select(
        *group_cols,
        F.col("used_buckets").cast("long").alias("used_buckets"),
        "zero_buckets",
        "sum_scaled",
        (F.floor(est * F.lit(10000.0)) / F.lit(10000.0)).alias(estimate_col),
    )


def hll_count_distinct(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: Sequence[str] = (),
    estimate_col: str = "estimate",
    word_hex: int = 8,
) -> DataFrame:
    """End-to-end portable approx-distinct: registers → estimate."""
    regs = hll_registers(df, col, p=p, group_cols=group_cols, word_hex=word_hex)
    return hll_estimate(
        regs, p=p, group_cols=group_cols, estimate_col=estimate_col,
        word_hex=word_hex,
    )


def hll_buckets_sql(key_expr: str, p: int = 12, word_hex: int = 8) -> str:
    """(bucket, rho) expressions over md5 of ``key_expr`` — the DuckDB
    replay of ``hll_registers``'s per-row stage (pre-aggregation)."""
    m = 1 << p
    rho_max = _rho_max(word_hex)
    word1 = f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT)"
    word2 = (
        f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 9, {word_hex})"
        f" AS BIGINT)"
    )
    return (
        f"{word1} % {m} AS bucket, "
        f"CASE WHEN {word2} = 0 THEN {rho_max} "
        f"ELSE {rho_max} - length(bin({word2})) END AS rho"
    )


def hll_tail_sql(
    p: int = 12,
    group_cols: Sequence[str] = (),
    estimate_col: str = "estimate",
    regs: str = "regs",
    word_hex: int = 8,
) -> str:
    """The estimate stage as SQL over an existing ``regs(group..., bucket,
    rho)`` CTE — shared by every HLL oracle so the constants and the IEEE
    expression shape cannot drift between specs."""
    m = 1 << p
    rho_max = _rho_max(word_hex)
    scale_int = 1 << rho_max
    g_col = "".join(f"{g}, " for g in group_cols)
    g_by = f"GROUP BY {', '.join(group_cols)}" if group_cols else ""
    raw = (
        f"({_alpha(m)}) * {m}.0 * {m}.0 * {float(scale_int)} / CAST(sum_scaled AS DOUBLE)"
    )
    return f"""
        agg AS (
            SELECT {g_col}COUNT(*) AS used_buckets,
                   SUM(CAST(pow(2.0, {rho_max} - rho) AS BIGINT)) AS present
            FROM {regs} {g_by}
        ), state AS (
            SELECT {g_col}CAST(used_buckets AS BIGINT) AS used_buckets,
                   CAST({m} - used_buckets AS BIGINT) AS zero_buckets,
                   CAST(present + ({m} - used_buckets) * {scale_int} AS BIGINT)
                       AS sum_scaled
            FROM agg
        )
        SELECT {g_col}used_buckets, zero_buckets, sum_scaled,
               floor((CASE WHEN {raw} <= {2.5 * m} AND zero_buckets > 0
                           THEN {m}.0 * ln({m}.0 / zero_buckets)
                           ELSE {raw} END) * 10000.0) / 10000.0
                   AS {estimate_col}
        FROM state
    """


def hll_oracle_sql(
    table: str,
    key_expr: str,
    p: int = 12,
    group_expr: str | None = None,
    group_alias: str = "g",
    estimate_col: str = "estimate",
    word_hex: int = 8,
) -> str:
    """The DuckDB replay of registers+estimate — generated here so the two
    dialects share one set of constants (the g30 zorder-oracle pattern)."""
    g_sel = f"{group_expr} AS {group_alias}, " if group_expr else ""
    g_col = f"{group_alias}, " if group_expr else ""
    groups = (group_alias,) if group_expr else ()
    return f"""
        WITH hashed AS (
            SELECT {g_sel}{key_expr} AS k FROM {table}
            WHERE {key_expr} IS NOT NULL
        ), buckets AS (
            SELECT {g_col}{hll_buckets_sql("k", p, word_hex)} FROM hashed
        ), regs AS (
            SELECT {g_col}bucket, MAX(rho) AS rho FROM buckets
            GROUP BY {g_col}bucket
        ), {hll_tail_sql(p, groups, estimate_col, word_hex=word_hex)}
    """


def hll_split_overlap(
    df: DataFrame,
    key_col: str,
    split_col: str,
    p: int = 12,
    estimate_col: str = "estimate",
) -> DataFrame:
    """Per-split + ``'union'`` HLL estimates from ONE hash pass — the
    no-join set-overlap estimator (train/eval contamination, day-over-day
    corpus drift). Registers are built once grouped by split; the union
    row is a register-level max-merge (``hll_merge`` semantics), never a
    second scan. Intersection follows by inclusion–exclusion:
    ``est(a) + est(b) − est(union)`` — at 100 TB this replaces a
    shingle-level join with arithmetic on three 4096-cell tables."""
    # The union branch re-derives from regs0 and Catalyst does NOT reuse
    # common subplans across a union — without the (lazy) checkpoint the
    # whole upstream (hash pass included) executes once per appearance
    # (4× measured on the l44 plan: ArrowEvalPython 4 → 1). regs0 is ≤ m
    # rows per split, so materializing it is the cheap side of the trade.
    regs0 = hll_registers(df, key_col, p=p, group_cols=(split_col,)).localCheckpoint(
        eager=False
    )
    # The synthetic row reuses the user's split domain, so a REAL split
    # literally named 'union' would silently double-count into the
    # overlap arithmetic (duplicate (split, bucket) rows past the
    # aggregate) — fail loudly instead (r16 review). The probe runs on
    # the register table (≤ m × n_splits rows) and doubles as the eager
    # materialization of the lazy checkpoint, so the run-once property
    # is kept, not broken.
    if regs0.filter(F.col(split_col) == "union").limit(1).count():
        raise ValueError(
            f"hll_split_overlap: the {split_col!r} domain contains the "
            "reserved label 'union' — rename that split (the synthetic "
            "union row would silently collide with it)"
        )
    regs_union = (
        regs0.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .withColumn(split_col, F.lit("union"))
    )
    regs = regs0.unionByName(regs_union.select(split_col, "bucket", "rho"))
    return hll_estimate(
        regs, p=p, group_cols=(split_col,), estimate_col=estimate_col
    )


def _recover_store(path: str) -> None:
    """Clear whatever a previous crash stranded around a persisted sketch
    store (shared by the HLL and CMS stores): a crash between the two
    promotion renames leaves the full pre-merge store at ``__retired``
    (restored — that batch is simply re-appliable, never silently
    forgotten); a crash after promotion leaves stale ``__staged``/
    ``__retired`` dirs that would make the next renames raise.

    SINGLE WRITER ONLY (ADVICE r11): recovery + promotion assume one
    ``update_*_store`` caller per store path at a time — two concurrent
    updates can interleave (one's recovery rmtree deleting the other's
    freshly written ``__staged``, or racing renames) and silently drop a
    batch. Since r13 the assumption is ENFORCED, not documented: every
    ``update_*_store`` call runs recover→promote inside ``_store_lock``,
    so a concurrent update raises :class:`StoreLockedError` loudly
    instead of losing a batch."""
    import os
    import shutil

    retired = f"{path}__retired"
    if not os.path.exists(path) and os.path.exists(retired):
        os.rename(retired, path)  # crash landed between the two renames
    shutil.rmtree(f"{path}__staged", ignore_errors=True)
    shutil.rmtree(retired, ignore_errors=True)


class StoreLockedError(RuntimeError):
    """Another ``update_*_store`` call holds this store's writer lock.

    Raised INSTEAD of proceeding: two concurrent updates on one store
    path can interleave recovery/renames and silently drop a batch
    (VERDICT r12 directive 4) — a loud failure the caller can retry
    beats a quiet lost update. Serialize updates per store
    (foreachBatch already does; a cron'd loader must not overlap
    itself)."""


#: a writer-lock sentinel older than this is presumed stranded by a
#: crashed/killed process even when its pid can't be probed (pid reuse,
#: or the lock was taken from another container sharing the volume).
#: Generous vs any sane store update (the stores are ≤ a few thousand
#: rows; updates take seconds) while still self-healing unattended.
_LOCK_STALE_SEC = 3600.0


class _store_lock:
    """Create-exclusive writer lock around a store's recover→promote
    window. ``O_CREAT | O_EXCL`` on ``<path>__lock`` is atomic on POSIX
    and local filesystems; the sentinel records ``pid start-time`` so a
    stranded lock (holder crashed between create and unlink) is
    stale-detected — holder pid no longer alive, or sentinel older than
    ``_LOCK_STALE_SEC`` — and broken exactly once before retrying. A
    LIVE holder is never broken: that's the concurrent-writer case and
    it raises :class:`StoreLockedError`."""

    def __init__(self, path: str):
        self._lock = f"{path}__lock"
        #: the exact sentinel bytes this instance wrote on acquire; release
        #: and readback are content-checked against it so this instance can
        #: never unlink (or believe it holds) somebody else's lock (r15).
        self._token: str | None = None

    @staticmethod
    def _read_sentinel(lock: str) -> str | None:
        """The lock's current content, or None if the file is gone. The
        acquire loop judges staleness on THIS content and passes the SAME
        bytes to the breaker — judging one read and breaking another is
        the r15 multi-process stress finding (see ``__enter__``)."""
        try:
            with open(lock) as f:
                return f.read()
        except OSError:
            return None

    def _holder_alive(self, lock: str) -> bool:
        """Legacy single-shot probe (reads + judges in one call). The
        acquire path does NOT use this — it must pin judgment and break
        to one read — but it remains the right shape for one-off
        diagnostics and the older tests."""
        content = self._read_sentinel(lock)
        if content is None:
            return False  # vanished — holder finished
        return self._sentinel_alive(lock, content)

    @staticmethod
    def _sentinel_alive(lock: str, content: str) -> bool:
        import os
        import socket
        import time

        try:
            parts = content.split()
            pid, ts = int(parts[0]), float(parts[1])
            host = parts[2] if len(parts) > 2 else None
        except (ValueError, IndexError):
            # unreadable/torn sentinel: only age can judge it
            try:
                return time.time() - os.path.getmtime(lock) < _LOCK_STALE_SEC
            except OSError:
                return False  # vanished — holder finished
        if host != socket.gethostname():
            # Foreign holder (store on a shared volume updated from another
            # container/host, or a pre-r14 two-field sentinel): probing the
            # pid on THIS host says nothing about the writer — kill(pid, 0)
            # would break a LIVE remote lock the moment the pid happens to
            # be free locally (ADVICE r13). Age is the only available
            # judge for un-probeable holders.
            return time.time() - ts < _LOCK_STALE_SEC
        # Same-host holder: the pid probe is AUTHORITATIVE and runs FIRST
        # (r16 review) — the old age-first order broke a LIVE holder whose
        # single update legitimately ran past _LOCK_STALE_SEC (a corpus-
        # scale batch hash pass + write inside the lock), reintroducing
        # the two-writer interleave the lock exists to prevent. A live
        # process IS a live holder, whatever the sentinel's age; age only
        # judges holders that cannot be probed.
        try:
            os.kill(pid, 0)  # signal 0: existence probe, nothing delivered
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # alive, owned by someone else
        # pid exists — but guard the recycled-pid residual (without an age
        # fallback a stranger wearing the dead holder's pid would hold the
        # lock forever): a process whose start time postdates the sentinel
        # cannot be its writer. /proc ctime ≈ process start; unreadable →
        # assume genuine holder (never break a live holder on doubt).
        try:
            started = os.stat(f"/proc/{pid}").st_ctime
            if started > ts + 60.0:  # 60 s slack for clock fuzz
                return False
        except OSError:
            pass
        return True

    def _break_stale(self, judged: str | None = None) -> None:
        """Break a stale sentinel atomically: rename it aside first — only
        one of N concurrent breakers wins the rename, so two waiters that
        both judged the same sentinel stale cannot each unlink a lock (the
        loser of the race would otherwise remove the winner's FRESH lock —
        the TOCTOU in ADVICE r13). The caught file is re-verified by
        content before deletion; catching a different (fresh) sentinel
        restores it.

        ``judged`` MUST be the exact content the caller's staleness
        decision was made on (r15 multi-process stress finding): when this
        method re-read the lock itself, a caller whose judged file had
        VANISHED (holder released between create-fail and probe) would
        hand the breaker a lock that now held a fresh third-party
        sentinel — which the breaker then read as ``judged``, renamed
        aside, saw ``caught == judged``, and deleted: a live holder's lock
        destroyed, two holders after the retry (measured: 9 lost
        increments per 480 contended cycles, tests/test_lock_multiprocess).
        With the caller's bytes pinned, a recreated lock always fails the
        content verify and is restored."""
        import os

        if judged is None:
            try:
                with open(self._lock) as f:
                    judged = f.read()
            except OSError:
                return  # vanished/unreadable — retry the create
        # Unique per CALL, not per pid: two threads of one process breaking
        # the same stale sentinel would otherwise share a grave path — the
        # second rename silently REPLACES the first grave (os.rename), and
        # the first thread's pending unlink then deletes whatever lock the
        # second thread caught, possibly a live third party's (r15 review).
        import threading as _th
        import uuid as _uuid

        grave = (
            f"{self._lock}.stale.{os.getpid()}."
            f"{_th.get_ident()}.{_uuid.uuid4().hex[:8]}"
        )
        try:
            os.rename(self._lock, grave)
        except OSError:
            return  # another breaker (or the holder's exit) got there first
        try:
            with open(grave) as f:
                caught = f.read()
        except OSError:
            return
        if caught == judged:
            try:
                os.unlink(grave)
            except FileNotFoundError:
                pass
        else:
            # We raced past a break+recreate and caught a FRESH lock — put
            # it back. ``link(2)`` is atomic and NEVER overwrites, so a
            # third waiter that claimed the freed path inside this window
            # is never clobbered (``os.rename`` silently REPLACES an
            # existing dst on POSIX — the r14 restore hole, VERDICT r14
            # item 2). On success grave and lock are one inode; dropping
            # the grave name completes the restore.
            try:
                os.link(grave, self._lock)
            except FileExistsError:
                # Contested: a third waiter holds the path while the live
                # sentinel we displaced sits in our grave. No sequence of
                # renames can merge two holders back into one from here —
                # fail LOUDLY instead of `pass`-ing and then re-entering
                # the create loop as a second holder ourselves (the r14
                # three-way race). The grave file is left in place: the
                # displaced holder's readback (see ``__enter__``) detects
                # the theft and re-queues, and graves are never consulted
                # by ``_holder_alive``.
                raise StoreLockedError(
                    f"store writer lock contested during stale-break "
                    f"restore: {self._lock} — displaced live sentinel "
                    f"parked at {grave}; serialize updates per store"
                ) from None
            except OSError:
                # Filesystem without hard links: best-effort rename-if-free
                # (the no-clobber guarantee degrades on such hosts, but a
                # held path still raises rather than being replaced).
                if os.path.exists(self._lock):
                    raise StoreLockedError(
                        f"store writer lock contested during stale-break "
                        f"restore: {self._lock} — displaced live sentinel "
                        f"parked at {grave}; serialize updates per store"
                    ) from None
                try:
                    os.rename(grave, self._lock)
                except OSError:
                    pass
                return
            try:
                os.unlink(grave)
            except FileNotFoundError:
                pass

    def __enter__(self):
        import os
        import socket
        import time

        broke = False
        for _attempt in range(6):
            try:
                fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                # Reclaim our own displaced-then-restored sentinel: if a
                # breaker renamed our fresh lock aside (we re-queued below)
                # and then restored it, the path now holds OUR token — no
                # one else can hold it, so adopting is safe and avoids
                # waiting out our own pid-alive sentinel (r15).
                if self._token is not None:
                    try:
                        with open(self._lock) as f:
                            if f.read() == self._token:
                                return self
                    except OSError:
                        pass
                judged = self._read_sentinel(self._lock)
                if judged is None:
                    # the holder released between our create-fail and the
                    # probe: the path is (or is about to be) free — retry
                    # the create, and NEVER enter the break path off a
                    # vanished file (the r15 two-holder hole: the breaker
                    # would re-read and destroy a THIRD party's fresh lock
                    # whose content trivially matched its own re-read)
                    continue
                if not broke and not self._sentinel_alive(self._lock, judged):
                    broke = True
                    self._break_stale(judged)  # may raise StoreLockedError
                    continue
                raise StoreLockedError(
                    f"store writer lock held: {self._lock} — another "
                    "update_*_store call is in flight on this path; "
                    "serialize updates per store"
                ) from None
            token = f"{os.getpid()} {time.time()} {socket.gethostname()}"
            with os.fdopen(fd, "w") as f:
                f.write(token)
            self._token = token
            # Post-acquire readback (r15): a breaker that judged the
            # PREVIOUS sentinel stale can rename OUR fresh file aside
            # between the create and here (its judgment predates our
            # create). Returning without the sentinel in place is the
            # two-holder seed — verify, and re-queue if displaced (the
            # breaker's atomic link-restore may hand the path back, which
            # the reclaim branch above then adopts).
            try:
                with open(self._lock) as f:
                    ours = f.read() == token
            except OSError:
                ours = False
            if ours:
                return self
            time.sleep(0.05)
        raise StoreLockedError(
            f"store writer lock unstable: {self._lock} — sentinel "
            "displaced repeatedly during acquisition; serialize updates "
            "per store"
        )

    def __exit__(self, *exc):
        import os

        # Content-checked release: unlink only OUR sentinel, so an instance
        # whose lock was broken-and-reacquired by someone else can never
        # release the new holder's lock (r15; unconditional unlink was the
        # last unguarded edge of the r13/r14 races).
        try:
            with open(self._lock) as f:
                if self._token is not None and f.read() != self._token:
                    return False
        except OSError:
            return False
        try:
            os.unlink(self._lock)
        except FileNotFoundError:
            pass
        return False


#: name of the applied-batch ledger dir INSIDE a store: the leading
#: underscore makes Spark's parquet listing treat it as metadata (like
#: _SUCCESS), so ``spark.read.parquet(store)`` still reads just the
#: sketch rows, while the ledger rides INSIDE the staged-swap dir and
#: therefore promotes/retires/recovers atomically with the registers it
#: guards — no second consistency protocol.
_LEDGER_DIR = "_batches"

#: how many applied-batch ids the ledger retains, in application order.
#: Sized for the deliveries that can actually repeat: a Structured
#: Streaming foreachBatch retry re-runs only the LAST epoch after a
#: failure/restart (older epochs are committed in the checkpoint), and a
#: batch orchestrator's re-run window is bounded by its own retention —
#: 4096 ids covers both with orders of magnitude to spare while keeping
#: the per-update ledger read/rewrite O(1) instead of O(batches-ever),
#: so the "cost ∝ the batch" claim survives years of minutely batches.
#: A batch older than the retained window would NOT be deduplicated —
#: callers replaying ancient history must rebuild the store instead.
_LEDGER_RETAIN = 4096


def _applied_batch_ids(spark, path: str) -> list[str]:
    """Batch ids already folded into the store at ``path``, oldest first
    (empty for a ledger-less store — one updated only by batch_id=None
    calls)."""
    import os

    ledger = os.path.join(path, _LEDGER_DIR)
    if not os.path.exists(ledger):
        return []
    rows = spark.read.parquet(ledger).collect()
    return [r.batch_id for r in sorted(rows, key=lambda r: r.seq)]


def _promote_store(
    merged: DataFrame, path: str, ledger_ids: Sequence[str] = ()
) -> None:
    """Staged-swap write (k78's pattern): the merged table lands beside
    the store, then two renames promote it — the store stays readable if
    the job dies mid-update, and ``_recover_store`` handles the rename
    window on the next call. ``ledger_ids`` (the applied-batch ledger of
    the sum-merge stores) is written INSIDE the staged dir before the
    swap, so ledger and registers can never disagree about which batches
    are in. Single-writer only — see ``_recover_store``."""
    import os
    import shutil

    staged = f"{path}__staged"
    retired = f"{path}__retired"
    merged.write.mode("overwrite").parquet(staged)
    if ledger_ids:
        # keep only the newest _LEDGER_RETAIN ids (see the constant's
        # sizing note); seq preserves application order across rewrites.
        kept = list(ledger_ids)[-_LEDGER_RETAIN:]
        merged.sparkSession.createDataFrame(
            list(enumerate(kept)), "seq long, batch_id string"
        ).coalesce(1).write.parquet(os.path.join(staged, _LEDGER_DIR))
    if os.path.exists(path):
        os.rename(path, retired)
    os.rename(staged, path)
    shutil.rmtree(retired, ignore_errors=True)


def update_hll_store(
    df: DataFrame,
    key_col: str,
    path: str,
    p: int = 12,
    group_cols: Sequence[str] = (),
) -> None:
    """Roll a persisted register store forward with one batch — the
    continuous-cardinality-monitoring loop (``foreachBatch(lambda b, _:
    update_hll_store(b, key, path))`` on an ingest stream, or one call
    per daily crawl). Cost ∝ the batch: the store holds ≤ m rows per
    group, the batch is hashed once, and the merge is the register-level
    ``max`` — history is never re-read beyond the tiny store itself.
    Register merge is exact, so the store equals a single-pass sketch of
    everything ever fed (tested in test_sketches), and
    :func:`hll_estimate` reads estimates off it at any point.

    The staged-swap write (k78's pattern) keeps the store readable if
    the job dies mid-update: the merged table is written beside the
    store and promoted with two renames, never overwriting the input
    it was derived from mid-plan. The rename pair itself is NOT atomic,
    so every call first recovers whatever a previous crash stranded
    (ADVICE r10): a crash between the renames leaves the full pre-merge
    store at ``__retired`` (restored here — that batch is simply
    re-appliable, never silently forgotten), and a crash after
    promotion leaves stale ``__staged``/``__retired`` dirs that would
    make this run's renames raise — both are cleared up front
    (``_recover_store``). Under ``foreachBatch`` retry semantics the
    worst case is one batch merged twice, which HLL max-merge absorbs
    exactly — this store needs no batch ledger (the sum-merge CMS and
    loglin stores do; see :func:`update_cms_store`). Single-writer per
    store path, enforced by ``_store_lock`` (raises
    :class:`StoreLockedError` on a concurrent update)."""
    import os

    with _store_lock(path):
        _recover_store(path)
        spark = df.sparkSession
        new = hll_registers(df, key_col, p=p, group_cols=group_cols)
        if os.path.exists(path):
            old = spark.read.parquet(path)
            merged = hll_merge([old, new], group_cols=group_cols)
        else:
            merged = new
        _promote_store(merged, path)


#: Count-Min geometry: 4 hash rows (the four 32-bit words of one md5) ×
#: ``width`` columns → the sketch is ≤ depth×width (row, col, n) tuples
#: regardless of input size; expected overcount per probe ≈ n_total/width,
#: min over 4 rows. The default width suits the test corpora; for a real
#: corpus size it from the measured rule (SCALE.md sketch section):
#: width ≈ n_total / target_absolute_error (e.g. 10¹¹ rows, ±10⁵ error →
#: width 10⁶ — still a ≤4M-cell table, broadcastable). Width must match
#: between build, merge inputs, estimate, and the SQL replay.
_CMS_DEPTH = 4
_CMS_WIDTH = 1024


def _cms_cells(key: Column, width: int = _CMS_WIDTH) -> Column:
    """Array of (row_idx, col_idx) structs — one per CMS hash row, the four
    words carved from a single md5 so one hash pass feeds all rows."""
    h = F.md5(key.cast("string"))
    cells = []
    for i in range(_CMS_DEPTH):
        word = F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
        cells.append(
            F.struct(
                F.lit(i).alias("row_idx"), (word % width).alias("col_idx")
            )
        )
    return F.array(*cells)


def _quantile_col_name(q: float) -> str:
    """Column name for quantile ``q`` — p50, p95, p999... Validates the
    open interval (r16 review: ``q=1.0`` produced the name ``p1.0``,
    emitted verbatim as ``AS p1.0`` in generated DuckDB SQL — a parse
    error; use max()/min() for the endpoints, they are exact order
    statistics, not quantile estimates)."""
    if not (0.0 < q < 1.0):
        raise ValueError(f"quantile probs must be in (0, 1), got {q}")
    return "p" + f"{q:.6f}".split(".")[1].rstrip("0").ljust(2, "0")


def cms_build(df: DataFrame, col: str, width: int = _CMS_WIDTH) -> DataFrame:
    """Count-Min sketch table: (row_idx, col_idx, n). One pass; the
    groupBy's map-side partial sum bounds every mapper's output at
    depth×width rows, so only the sketch shuffles. Merge = union +
    groupBy sum (``cms_merge``) — the increment/combine step of a
    distributed or day-over-day frequency store. ``width`` sizes the
    error bound (≈ n_total/width overshoot before the row-min); pick it
    by the SCALE.md rule in the geometry note above."""
    cells = _cms_cells(F.col(col), width)
    return (
        # NULL keys: md5(NULL) propagates to col_idx NULL cells that no
        # probe join can ever match (NULL equality) — they'd bloat the
        # sketch past the depth×width bound and ride the persisted store
        # forever (r16 review); frequency of NULL is profile_columns' job
        df.filter(F.col(col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .select("c.row_idx", "c.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").alias("n"))
    )


def cms_merge(sketches_: Iterable[DataFrame]) -> DataFrame:
    """Merge CMS tables — union + sum per cell (counters are additive).
    All inputs must share one ``width`` (cell indices are meaningless
    across geometries)."""
    sk = list(sketches_)
    if not sk:
        raise ValueError("at least one sketch table required")
    out = sk[0]
    for s in sk[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "col_idx").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int = _CMS_WIDTH
) -> DataFrame:
    """Point-frequency estimates: min over the probe key's depth cells.
    CMS never undercounts — estimate ≥ true frequency, overshoot bounded
    by colliding mass ≈ n_total/width per row before the min. The sketch
    side carries an explicit broadcast hint: it is ≤ depth×width rows BY
    CONSTRUCTION (a fixed-cardinality dim in the r9 hint rule — the bound
    holds however large the data or the probe list grows), so the probe
    side never shuffles. ``width`` must equal the build-side width."""
    cells = probes.select(
        col, F.explode(_cms_cells(F.col(col), width)).alias("c")
    ).select(col, "c.row_idx", "c.col_idx")
    return (
        cells.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("cms_n"))
    )


#: SQL VALUES list enumerating the hash rows (cross-join fan-out in oracles).
CMS_ROWS_VALUES = ", ".join(f"({i})" for i in range(_CMS_DEPTH))


def cms_col_expr_sql(
    key_expr: str, row_idx_col: str = "row_idx", width: int = _CMS_WIDTH
) -> str:
    """DuckDB replay of ``_cms_cells``'s column index as a CASE over the
    hash-row number — generated so both dialects share the depth/width
    constants and the md5 word offsets. ``width`` must equal the value
    the Spark-side sketch was built with."""
    whens = " ".join(
        f"WHEN {i} THEN CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)),"
        f" {1 + 8 * i}, 8) AS BIGINT) % {width}"
        for i in range(_CMS_DEPTH)
    )
    return f"CASE {row_idx_col} {whens} END"


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    row_key: Column,
    probs: Sequence[float],
    group_cols: Sequence[str] = (),
    shift: int = 4,
) -> DataFrame:
    """Deterministic-hash-sample quantiles: keep rows whose 32-bit md5
    word of ``row_key`` falls below 2^(32-shift) (rate 1/2^shift), then
    take EXACT interpolated percentiles of the sample.

    Unlike rand()-sampling the selected set is a pure function of the
    data, so any engine recomputes the identical sample — a quantile
    "sketch" whose answer is replayable in SQL. The filter runs before
    any shuffle; downstream sort/percentile work sees 1/2^shift of the
    rows, which is the whole scale trick. Output: group_cols...,
    n_sample, p_<prob> columns floor-truncated at 4 dp — the module's
    one rounding rule (see ``hll_estimate``): round()'s half-boundary is
    implementation-defined across engines, floor of the identical IEEE
    double is bit-deterministic (ADVICE r10).

    The grid is applied only below ``|pct| < 1e12`` (r16, NULL-PK sweep
    finding): a huge-but-legal measure (1e308) overflowed the grid
    arithmetic itself — ``pct * 1e4`` is +Inf in DuckDB while Spark's
    ``floor(double)→long`` clamps at 2^63 — two different wrong answers
    for the same data. Above the bound a double carries ≲4 fractional
    digits anyway, so the raw IEEE percentile is already the
    bit-deterministic value; SQL twins carry the same CASE.
    """
    w1, _ = _hash_words(row_key)
    sampled = df.filter(w1 < F.lit(1 << (32 - shift)))
    aggs = [F.count("*").cast("long").alias("n_sample")]
    for q in probs:
        name = _quantile_col_name(q)
        aggs.append(
            F.expr(
                f"CASE WHEN abs(percentile({value_col}, {q})) < 1e12 "
                f"THEN floor(percentile({value_col}, {q}) * 10000.0) / 10000.0 "
                f"ELSE percentile({value_col}, {q}) END"
            ).alias(name)
        )
    return sampled.groupBy(*group_cols).agg(*aggs)


def _check_ledger_args(batch_id: str | None, unledgered: bool) -> None:
    """The sum-merge stores' opt-out guard (VERDICT r12 directive 3):
    omitting ``batch_id`` must be an explicit acknowledgment, never an
    accident — an unledgered update under at-least-once delivery
    silently double-counts retried batches."""
    if batch_id is None and not unledgered:
        raise ValueError(
            "batch_id=None would skip the applied-batch ledger and "
            "double-count a redelivered batch under at-least-once "
            "delivery. Pass the delivery's batch/epoch id (foreachBatch "
            "hands you one), or pass unledgered=True to acknowledge the "
            "source is exactly-once."
        )
    if batch_id is not None and unledgered:
        raise ValueError(
            "batch_id and unledgered=True are mutually exclusive — "
            "pick ledgered (batch_id=...) or acknowledged-unledgered."
        )


def update_cms_store(
    df: DataFrame,
    col: str,
    path: str,
    width: int = _CMS_WIDTH,
    batch_id: str | None = None,
    unledgered: bool = False,
) -> bool:
    """Roll a persisted Count-Min frequency store forward with one batch —
    the counter analogue of :func:`update_hll_store` (counters are
    additive, so merge = union + sum), with the same crash-safe
    staged-swap promotion and recovery. Cost ∝ the batch; history is
    never re-read beyond the ≤ depth×width-row store itself.

    Unlike the HLL store, sum-merge is NOT idempotent — a foreachBatch
    RETRY that re-applies a committed batch would double-count it. Pass
    ``batch_id`` (Structured Streaming hands foreachBatch exactly this —
    a monotone epoch id that repeats on retry) and the store keeps an
    applied-batch ledger INSIDE itself (``_batches``, promoted atomically
    with the counters by the same staged swap): a re-delivered batch is
    detected and skipped, making the update effectively-once under
    at-least-once delivery (VERDICT r11 directive 2). The ledger retains
    the newest ``_LEDGER_RETAIN`` ids (see its sizing note — repeats only
    ever come from the recent window), so the per-update cost stays O(1)
    however many batches the store has ever absorbed. Returns True if the
    batch was applied, False if the ledger says it already was.

    Skipping the ledger is an explicit, acknowledged choice (VERDICT r12
    directive 3): ``batch_id=None`` alone raises — under at-least-once
    delivery it would silently double-count a retried batch. A caller
    whose delivery really is exactly-once (a one-shot backfill, a
    driver-side loop with no retry) passes ``unledgered=True`` to say so.
    ``width`` must stay constant across the store's life. Single-writer
    per store path, enforced by ``_store_lock`` (raises
    :class:`StoreLockedError` on a concurrent update)."""
    import os

    _check_ledger_args(batch_id, unledgered)
    with _store_lock(path):
        _recover_store(path)
        spark = df.sparkSession
        applied = (
            _applied_batch_ids(spark, path) if os.path.exists(path) else []
        )
        if batch_id is not None and batch_id in applied:
            return False
        new = cms_build(df, col, width=width)
        if os.path.exists(path):
            merged = cms_merge([spark.read.parquet(path), new])
        else:
            merged = new
        ledger = [*applied, batch_id] if batch_id is not None else applied
        _promote_store(merged, path, ledger_ids=ledger)
        return True


# --- mergeable quantiles: log-linear (HDR-style) histogram -------------------
#
# The deterministic-hash-sample quantiles above replay exactly but their
# state is a SAMPLE — it grows with the data and two stores can only be
# combined by re-unioning rows. This family is the bounded-state
# alternative: an HdrHistogram-style log-linear bucketing (Tene's
# HdrHistogram; same error model as DDSketch, Masson et al. VLDB 2019)
# whose state is ≤ (2·64·S + 1) counter rows per group at S sub-buckets
# per octave (sign-mirrored buckets cover negatives, r11.13), merge =
# union + sum (distributed combine AND incremental
# day-over-day stores), and every bucket boundary is an exact dyadic
# rational — octave from ``length(bin(x))``, sub-bucket from integer
# arithmetic and divisions by powers of two only — so histogram AND
# quantile estimates replay bit-for-bit in any engine with bin/floor/
# pow. Relative error is bounded by the sub-bucket width (1/S of the
# octave: S=16 → ≤6.25% before interpolation, ~1-2% typical after).

#: log2 of the default value scaling (values are floored onto a
#: 2^-scale_pow grid first — dyadic, so the scaling is exact) and log2 of
#: the per-octave sub-bucket count. Both powers of two so every division
#: in the pipeline is by a power of two, i.e. exact in IEEE doubles.
_LOGLIN_SCALE_POW = 8
_LOGLIN_SUBDIV_POW = 4


def _loglin_max_v(scale_pow: int) -> float:
    """Saturation rail: the largest magnitude the documented domain
    (|v|·2^scale_pow < 2^53) can hold. (2^53−1) and the power-of-two
    division are both exactly representable, so the clamp and the
    clamped bucket are bit-identical across engines."""
    return float((1 << 53) - 1) / float(1 << scale_pow)


def _loglin_bucket(value: Column, scale_pow: int, subdiv_pow: int) -> Column:
    # Sign-mirrored (r11.13): negatives get bucket −2 − posb(|x|), so
    # ascending bucket index == ascending value across the whole real
    # line (…, −2−16·S < … < −2 [x=−1's bucket] < −1 [x=0] < 0 < …) and
    # the quantile cumsum needs no special-casing.
    #
    # Out-of-domain magnitudes SATURATE (r14 numeric-extremes leg):
    # ±Infinity and finite values beyond the 2^53 grid clamp to the
    # extreme bucket (HdrHistogram's highest-trackable-value behavior) —
    # they keep their count and their ordering rank, and the quantile
    # estimate for ranks landing there reports ≈ the domain edge. The
    # alternative (dropping them like NULLs) would silently shift every
    # upper quantile left. Without the clamp, one 1e308 row is a
    # stage-killer: floor(1e308·2^8) is +Inf and the BIGINT cast raises
    # under ANSI (Spark) / errors (DuckDB). NaN has no order rank at all
    # and is EXCLUDED upstream like NULL (loglin_histogram's filter —
    # clamping NaN is unsafe anyway: least(NaN, rail) silently returns
    # the rail on both engines, which would count an undefined value as
    # a huge one).
    #
    # The sub-bucket is PURE INTEGER arithmetic (r12, VERDICT r11): the
    # r11 double floor-division ((y−pot)·S as DOUBLE / pot) lost exactness
    # above y·S ≈ 2^53 — at y = 2^53−1 the numerator 2^56−16 rounds to
    # 2^56 and the sub-bucket lands at S, colliding with the next octave's
    # first bucket. num − num%pot is q·2^(octave−1) for q < S, i.e. at
    # most subdiv_pow significant bits, so its double conversion and the
    # power-of-two division are both exact over the FULL documented domain
    # y < 2^53 (num < 2^53·S < 2^63 keeps the BIGINT side exact too).
    s = 1 << subdiv_pow
    rail = _loglin_max_v(scale_pow)
    clamped = F.least(F.greatest(value, F.lit(-rail)), F.lit(rail))
    x = F.floor(clamped * F.lit(float(1 << scale_pow))).cast("long")
    y = F.abs(x)
    blen = F.length(F.bin(y))
    pot = F.pow(F.lit(2.0), blen - 1).cast("long")  # 2^(octave-1), exact
    num = (y - pot) * F.lit(s)  # exact BIGINT, ≥ 0 (pot ≤ y for y ≥ 1)
    sub = ((num - num % pot) / pot).cast("long")
    posb = (blen - 1) * s + sub
    return (
        F.when(x == 0, F.lit(-1))
        .when(x > 0, posb)
        .otherwise(F.lit(-2) - posb)
    )


def loglin_bucket_sql(value_expr: str, scale_pow: int = _LOGLIN_SCALE_POW,
                      subdiv_pow: int = _LOGLIN_SUBDIV_POW) -> str:
    """DuckDB replay of :func:`_loglin_bucket` — generated so both
    dialects share the scale/subdivision constants (and the r14
    saturation rail; NaN exclusion lives in the caller's WHERE, mirroring
    loglin_histogram's filter)."""
    s = 1 << subdiv_pow
    rail = _loglin_max_v(scale_pow)
    clamped = f"least(greatest(({value_expr}), {-rail!r}), {rail!r})"
    x = f"CAST(floor({clamped} * {float(1 << scale_pow)}) AS BIGINT)"
    y = f"abs({x})"
    blen = f"length(bin({y}))"
    pot = f"CAST(pow(2.0, {blen} - 1) AS BIGINT)"
    num = f"(({y} - {pot}) * {s})"
    # pure-integer sub-bucket (r12) — see _loglin_bucket: exact over the
    # full y < 2^53 domain where the r11 double floor-division was not.
    sub = f"CAST(({num} - {num} % {pot}) / {pot} AS BIGINT)"
    posb = f"(({blen} - 1) * {s} + {sub})"
    return (
        f"CASE WHEN {x} = 0 THEN -1 "
        f"WHEN {x} > 0 THEN {posb} "
        f"ELSE -2 - {posb} END"
    )


def loglin_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    scale_pow: int = _LOGLIN_SCALE_POW,
    subdiv_pow: int = _LOGLIN_SUBDIV_POW,
) -> DataFrame:
    """One-pass log-linear histogram: (group_cols..., bucket, n). Domain
    is the full real line with ``|value|·2^scale_pow < 2^53`` (sums,
    lengths, prices, deltas, scores): negatives land in sign-mirrored
    buckets (−2 − posb(|v|), still ascending-bucket == ascending-value).
    Quantization is the FLOOR grid, so only ``[0, 2^−scale_pow)``
    collapses to bucket −1 (estimated as exactly 0); negatives in
    ``(−2^−scale_pow, 0)`` floor to grid point −1 and land in bucket −2,
    estimated ≈ −2^−scale_pow — sub-grid negatives keep their sign
    (ADVICE r11: the old doc claimed the open interval around 0 was
    symmetric; the code was right, the doc was not). Map-side partial count
    bounds every mapper's output at the bucket count per group — the
    histogram, not the data, is what shuffles. Merge with
    :func:`loglin_merge`. NULL values are excluded (a null bucket row
    would poison the quantile cumsum, and the two engines disagree on
    default NULL ordering in window frames — the oracle generator
    filters identically). NaN is excluded the same way (r14
    numeric-extremes leg: it has no order rank, and the saturation clamp
    would silently count it as the domain edge); ±Inf and finite
    overflow SATURATE to the extreme bucket — see :func:`_loglin_bucket`."""
    b = _loglin_bucket(F.col(value_col), scale_pow, subdiv_pow)
    return (
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("n"))
    )


def loglin_merge(
    hists: Iterable[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge histograms — union + sum per bucket (counters are additive);
    the distributed/incremental combine step, exactly like cms_merge."""
    hs = list(hists)
    if not hs:
        raise ValueError("at least one histogram table required")
    out = hs[0]
    for h in hs[1:]:
        out = out.unionByName(h)
    return out.groupBy(*group_cols, "bucket").agg(F.sum("n").alias("n"))


def _loglin_est_exprs(
    probs: Sequence[float], scale_pow: int, subdiv_pow: int
) -> list[tuple[str, str, str]]:
    """(name, per-row estimate expr, rank filter expr) per prob — the
    textual core shared verbatim by the Spark agg and the DuckDB oracle
    so the IEEE expression shape cannot drift. Expects columns bucket,
    n, cum (running count by bucket), total (group count)."""
    s = 1 << subdiv_pow
    scale = float(1 << scale_pow)
    out = []
    # pb = the positive-equivalent bucket (negatives are sign-mirrored at
    # −2 − pb); a negative bucket's value interval is (−hi, −lo], so its
    # interpolation base is −hi with the same (hi − lo) slope.
    pb = "(CASE WHEN bucket >= 0 THEN bucket ELSE -bucket - 2 END)"
    for q in probs:
        name = _quantile_col_name(q)
        rank = f"greatest(1, CAST(ceil({q} * total) AS BIGINT))"
        oct_ = f"CAST(floor({pb} / {s}.0) AS BIGINT)"
        pot = f"pow(2.0, {oct_})"
        j = f"({pb} - {oct_} * {s})"
        lo = f"({pot} * (1.0 + {j} / {s}.0))"
        hi = f"({pot} * (1.0 + ({j} + 1) / {s}.0))"
        base = f"(CASE WHEN bucket >= 0 THEN {lo} ELSE -{hi} END)"
        frac = f"(({rank} - (cum - n)) / CAST(n AS DOUBLE))"
        est = (
            f"CASE WHEN bucket = -1 THEN 0.0 "
            f"ELSE ({base} + {frac} * ({hi} - {lo})) / {scale} END"
        )
        out.append((name, est, f"cum >= {rank}"))
    return out


def loglin_quantiles(
    hist: DataFrame,
    probs: Sequence[float],
    group_cols: Sequence[str] = (),
    scale_pow: int = _LOGLIN_SCALE_POW,
    subdiv_pow: int = _LOGLIN_SUBDIV_POW,
) -> DataFrame:
    """Quantile estimates off a histogram (possibly a merged store):
    rank = max(1, ⌈q·n⌉), pick the first bucket whose running count
    covers it, linearly interpolate inside the bucket, floor-truncate at
    4 dp (the module rounding rule). The window/sort runs over ≤ ~1k
    bucket rows per group, never the data. Output: group_cols...,
    n_total, p<prob> columns."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy("bucket")
    wg = Window.partitionBy(*[F.col(g) for g in group_cols])
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wg)
    )
    aggs = [F.max("total").cast("long").alias("n_total")]
    for name, est, cond in _loglin_est_exprs(probs, scale_pow, subdiv_pow):
        aggs.append(
            # 1e4, not 10000.0: SQL parses the latter as DECIMAL, and
            # bigint/decimal division comes back as a Decimal column
            F.expr(
                f"floor(min_by({est}, bucket) FILTER (WHERE {cond})"
                f" * 1e4) / 1e4"
            ).alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def loglin_quantiles_sql(
    table: str,
    value_expr: str,
    probs: Sequence[float],
    group_expr: str | None = None,
    group_alias: str = "g",
    scale_pow: int = _LOGLIN_SCALE_POW,
    subdiv_pow: int = _LOGLIN_SUBDIV_POW,
) -> str:
    """Full DuckDB replay (histogram + quantile tail) generated from the
    same constants and estimate expressions as the Spark side."""
    g_sel = f"{group_expr} AS {group_alias}, " if group_expr else ""
    g_col = f"{group_alias}, " if group_expr else ""
    part = f"PARTITION BY {group_alias}" if group_expr else ""
    g_by = f"GROUP BY {group_alias}" if group_expr else ""
    sels = ["CAST(max(total) AS BIGINT) AS n_total"]
    for name, est, cond in _loglin_est_exprs(probs, scale_pow, subdiv_pow):
        sels.append(
            f"floor(min_by({est}, bucket) FILTER (WHERE {cond})"
            f" * 1e4) / 1e4 AS {name}"
        )
    return f"""
        WITH vals AS (
            SELECT {g_sel}{value_expr} AS v FROM {table}
            WHERE ({value_expr}) IS NOT NULL
              AND NOT isnan(CAST({value_expr} AS DOUBLE))
        ), hist AS (
            SELECT {g_col}{loglin_bucket_sql("v", scale_pow, subdiv_pow)} AS bucket,
                   count(*) AS n
            FROM vals GROUP BY {g_col}bucket
        ), cum AS (
            SELECT {g_col}bucket, n,
                   SUM(n) OVER ({part} ORDER BY bucket) AS cum,
                   SUM(n) OVER ({part}) AS total
            FROM hist
        )
        SELECT {g_col}{", ".join(sels)} FROM cum {g_by}
    """


def update_loglin_store(
    df: DataFrame,
    value_col: str,
    path: str,
    group_cols: Sequence[str] = (),
    scale_pow: int = _LOGLIN_SCALE_POW,
    subdiv_pow: int = _LOGLIN_SUBDIV_POW,
    batch_id: str | None = None,
    unledgered: bool = False,
) -> bool:
    """Roll a persisted quantile-histogram store forward with one batch —
    the reason this family exists: quantiles over everything-ever-seen
    from bounded state, no history re-read (``loglin_quantiles`` reads
    estimates off the store at any point). Same crash-safe staged swap
    as the HLL/CMS stores, and the same applied-batch ledger as
    :func:`update_cms_store` (VERDICT r11 directive 2): pass the
    foreachBatch epoch as ``batch_id`` and a retried batch is a no-op
    instead of a double-count — returns False when skipped. As with
    :func:`update_cms_store`, ``batch_id=None`` requires an explicit
    ``unledgered=True`` acknowledgment or raises (VERDICT r12
    directive 3). Geometry (scale_pow, subdiv_pow) must stay constant
    across the store's life. Single-writer per store path, enforced by
    ``_store_lock`` (raises :class:`StoreLockedError` on a concurrent
    update)."""
    import os

    _check_ledger_args(batch_id, unledgered)
    with _store_lock(path):
        _recover_store(path)
        spark = df.sparkSession
        applied = (
            _applied_batch_ids(spark, path) if os.path.exists(path) else []
        )
        if batch_id is not None and batch_id in applied:
            return False
        new = loglin_histogram(
            df, value_col, group_cols=group_cols, scale_pow=scale_pow,
            subdiv_pow=subdiv_pow,
        )
        if os.path.exists(path):
            merged = loglin_merge(
                [spark.read.parquet(path), new], group_cols=group_cols
            )
        else:
            merged = new
        ledger = [*applied, batch_id] if batch_id is not None else applied
        _promote_store(merged, path, ledger_ids=ledger)
        return True
