"""Data-quality verification — the reference's ``verify`` subcommand
(reference bin/core-etl/src/verify.rs:27-94) as window-function DataFrames.

The reference loads all rows to the client, sorts in memory, and walks
adjacent pairs (verify.rs:46-59). Here each check is one distributed plan:
a ``lag`` window for contiguity, an aggregate compare for the tip. At 100 TB
the global ``Window.orderBy`` would single-partition; ``gap_ranges`` instead
uses a per-bucket window (partition by ``floor(number/bucket)``) plus a
cross-bucket boundary check, which scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sequence_gaps(df: DataFrame, col: str = "number") -> DataFrame:
    """V2 — ranged gap check: rows whose predecessor is not ``value - 1``
    (reference verify.rs:48-59). Returns (prev_value, value, missing) rows,
    one per gap.

    NULL keys are excluded EXPLICITLY (r14 chain-corruption audit): a
    NULL carries no position in a sequence, and leaving it to implicit
    comparison semantics makes the two engines disagree on where it
    sorts (Spark windows order NULLS FIRST, DuckDB NULLS LAST) and lets
    it silently vanish from the ``!=`` filter. The contract is "gaps
    among the real keys"; NULL-key accounting is :func:`profile_columns`'
    job (v05)."""
    w = W.orderBy("value")
    return (
        df.select(F.col(col).cast("long").alias("value"))
        .filter(F.col("value").isNotNull())
        .select("value", F.lag("value", 1).over(w).alias("prev_value"))
        .filter(F.col("prev_value").isNotNull() & (F.col("value") != F.col("prev_value") + 1))
        .select(
            "prev_value",
            "value",
            (F.col("value") - F.col("prev_value") - 1).alias("missing"),
        )
    )


def sequence_gaps_scalable(df: DataFrame, col: str = "number", bucket: int = 1_000_000) -> DataFrame:
    """V2 at scale: contiguity via count/min/max per bucket instead of one
    global-ordered window. A bucket of size B is gap-free iff
    ``count == max - min + 1`` *and* it chains to its neighbor; violations
    surface as (bucket, expected, actual) rows. One shuffle on ~|N|/B keys."""
    # Exact integer floor-division: the double form ((col / bucket)
    # .cast("long")) truncates toward zero — wrong bucket for negative keys
    # vs the SQL oracle's floor() — and loses exactness above 2^53. `div`
    # stays integral; correcting the negative-remainder case makes it floor.
    bucket = int(bucket)
    q = F.expr(f"`{col}` div {bucket}")
    r = F.col(col) % F.lit(bucket)
    b = F.when(r < 0, q - 1).otherwise(q).alias("bucket")
    # NULL keys excluded explicitly — same contract as sequence_gaps
    # (implicitly they'd form a NULL bucket here but silently drop in
    # the non-scalable form: divergent, so neither is allowed to count)
    df = df.filter(F.col(col).isNotNull())
    agg = df.select(F.col(col).alias("v"), b).groupBy("bucket").agg(
        F.count("v").alias("cnt"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    w = W.orderBy("bucket")
    return (
        agg.select(
            "bucket",
            "cnt",
            "lo",
            "hi",
            F.lag("hi", 1).over(w).alias("prev_hi"),
            F.lag("bucket", 1).over(w).alias("prev_bucket"),
        )
        .filter(
            (F.col("cnt") != F.col("hi") - F.col("lo") + 1)
            | (
                F.col("prev_hi").isNotNull()
                & (
                    (F.col("lo") != F.col("prev_hi") + 1)
                    | (F.col("bucket") != F.col("prev_bucket") + 1)
                )
            )
        )
        .select("bucket", "cnt", "lo", "hi", "prev_hi")
    )


def positional_check(df: DataFrame, col: str = "number", bucket: int = 1_000_000) -> DataFrame:
    """V3 — full check from zero: the i-th row (ordered) must equal i
    (reference verify.rs:74-79). Returns violating rows with their position.

    Scales like ``sequence_gaps_scalable``, not like a global window: the
    global rank is computed two-phase — per-bucket row_number (bucket =
    floor(value/B), monotone in value, so (bucket, value) order == global
    value order) plus each bucket's exclusive prefix count from a tiny
    window over the ~|N|/B bucket-count rows. One data shuffle + one
    broadcast join; no single-partition sort at any table size."""
    bucket = int(bucket)
    vals = df.select(F.col(col).cast("long").alias("value")).filter(
        F.col("value").isNotNull()  # NULL keys: no position — see sequence_gaps
    )
    # exact floor division (negative-safe, like sequence_gaps_scalable)
    q = F.expr(f"value div {bucket}")
    r = F.col("value") % F.lit(bucket)
    vals = vals.withColumn("bucket", F.when(r < 0, q - 1).otherwise(q))
    cnts = vals.groupBy("bucket").agg(F.count("*").alias("_n"))
    w_off = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offs = cnts.select(
        "bucket", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = W.partitionBy("bucket").orderBy("value")
    return (
        vals.join(F.broadcast(offs), "bucket")
        .select(
            "value",
            (F.row_number().over(w_in) - 1 + F.col("_off")).alias("pos"),
        )
        .filter(F.col("value") != F.col("pos"))
    )


def unverifiable_blocks(blocks: DataFrame) -> DataFrame:
    """V2 extension (ADVICE r15): stored block heights whose ``hash`` is
    NULL — rows that can never anchor a parent-hash verification.

    ``detect_reorgs``' parent-mismatch signal deliberately skips NULL-hash
    parents (unknowable ≠ disagreeing, the r15 liveness trade), and no
    automatic path ever re-delivers a height *below* the resume point —
    backfill resumes from ``resume_point()+1`` and the tail's stale guard
    filters old heights — so without this sweep an unverifiable parent
    persists forever. The sweep's output feeds
    :func:`~core_etl_spark.pipeline.repair_unverifiable_blocks`, which
    cleans the flagged heights and re-fetches them so they are eventually
    repaired rather than only on coincidental redelivery.

    One column-pruned scan, no shuffle; output is one ``(number)`` row per
    flagged height (NULL-number rows are excluded — a height-less row has
    no repair address and is :func:`profile_columns`' finding)."""
    return (
        blocks.filter(F.col("hash").isNull() & F.col("number").isNotNull())
        .select(F.col("number").cast("long").alias("number"))
        .distinct()
    )


def tip_lag(stored: DataFrame, chain_tip: int, col: str = "number") -> DataFrame:
    """V4 — stored tip vs node tip (reference verify.rs:35-39,60-67).
    One row: (stored_tip, chain_tip, behind)."""
    tip = F.lit(chain_tip).cast("long")
    return stored.agg(F.max(col).alias("stored_tip")).select(
        "stored_tip",
        tip.alias("chain_tip"),
        (tip - F.col("stored_tip")).alias("behind"),
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile — one row per column: row count, non-null
    count, exact distinct count. The drift detector every scheduled
    pipeline wants between snapshots (a sudden null-ratio jump or
    distinct-count collapse is the classic upstream-schema-break signal).

    Single corpus pass: all per-column aggregates ride ONE aggregation
    (Spark plans multi-distinct via expand — fine for the handful of
    profiled columns; swap exact distincts for approx_count_distinct when
    profiling dozens of columns at 100 TB), then a zero-shuffle stack to
    one-row-per-column."""
    if not cols:
        raise ValueError("profile_columns: cols must name at least one column")
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', _nn_{c}, _nd_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col, n_nonnull, n_distinct)",
        "_n AS n_rows",
    ).select("col", "n_rows", "n_nonnull", "n_distinct")


def measure_cast_quarantine(
    df: DataFrame, cols: list[str], precision: int = 12, scale: int = 2
) -> DataFrame:
    """Observability for the ledger-cast contract (r15, ADVICE r14): the
    contract maps any measure the DECIMAL(p,s) grid cannot represent —
    NaN, ±Inf, or a finite overflow like 1e308 — to NULL, which SUM then
    skips while COUNT(*)-based averages still count the row. Correct and
    engine-consistent, but silent: a corrupt-but-finite money value simply
    vanishes from totals. This audit makes the drop channel visible — one
    row per measure column with the quarantine counts by class:

    ``(col, n_rows, n_nonnull, n_nan, n_inf, n_overflow, n_quarantined)``

    where ``n_overflow`` counts finite values rejected by the decimal cast
    and ``n_quarantined`` is the total excluded from SUM (everything
    non-null the ledger cast NULLs). Run it next to any money aggregate
    the way ``bound_event_time``'s inverse predicate audits watermark
    poisoning: totals stay clean, drops stay counted.

    Scale shape mirrors :func:`profile_columns`: every class count rides
    ONE aggregation over one scan (row-local column expressions, no
    shuffle beyond the single 1-row agg), then a zero-shuffle ``stack`` to
    one-row-per-column."""
    if not cols:
        raise ValueError("measure_cast_quarantine: cols must name at least one column")
    dec = f"decimal({precision},{scale})"
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        col = F.col(c)
        is_nan = F.isnan(col)
        is_inf = col.cast("double").isin(float("inf"), float("-inf"))
        finite = col.isNotNull() & ~is_nan & ~is_inf
        rejected = finite & col.try_cast(dec).isNull()
        aggs.append(F.count(col).alias(f"_nn_{c}"))
        aggs.append(F.sum(is_nan.cast("long")).alias(f"_nan_{c}"))
        aggs.append(F.sum(is_inf.cast("long")).alias(f"_inf_{c}"))
        aggs.append(F.sum(rejected.cast("long")).alias(f"_ov_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nan_{c}, _inf_{c}, _ov_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col, n_nonnull, n_nan, n_inf, n_overflow)",
        "_n AS n_rows",
    ).select(
        "col",
        "n_rows",
        "n_nonnull",
        "n_nan",
        "n_inf",
        "n_overflow",
        (F.col("n_nan") + F.col("n_inf") + F.col("n_overflow")).alias(
            "n_quarantined"
        ),
    )
