"""Skew mitigation — salting patterns for hot keys (SURVEY §scale; the
reference never needs them because SQLite is single-node, but at 100 TB a
single hot token address or hot shingle dominates a shuffle partition).

Semantics are identical to the unsalted operator — these are *physical*
rewrites, so each has a plain-SQL oracle. AQE's skew-join splitting handles
the join case automatically when statistics surface it; explicit salting is
the deterministic fallback for aggregation pipelines and for joins whose
skew AQE can't see (e.g. post-explode fan-out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(
    df: DataFrame, keys: list[str], n_salts: int = 16, agg_col: str = "n"
) -> DataFrame:
    """Two-stage count: stage 1 groups on (keys, salt) — the hot key spreads
    over ``n_salts`` reducers — stage 2 sums the partials on keys alone.
    The second shuffle moves ≤ ``n_salts`` rows per key, not the raw rows.

    Thin wrapper over :func:`salted_count_sum` (r14, VERDICT r13 directive
    5): a caller who wants count AND sum must call the one-pass form, never
    join this with :func:`salted_sum` — the equi-join drops the NULL-key
    group GROUP BY produces and scans the data twice."""
    return salted_count_sum(
        df, keys, F.lit(0), n_salts=n_salts, count_col=agg_col, sum_col="_drop"
    ).drop("_drop")


def salted_sum(
    df: DataFrame, keys: list[str], value: Column, n_salts: int = 16, agg_col: str = "total"
) -> DataFrame:
    """Two-stage sum with the same spread; value must be decimal/long for
    order-independent exactness (doubles re-associate). Thin wrapper over
    :func:`salted_count_sum` — see :func:`salted_count` for why the joined
    count⋈sum form is banned."""
    return salted_count_sum(
        df, keys, value, n_salts=n_salts, count_col="_drop", sum_col=agg_col
    ).drop("_drop")


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salts: int = 16,
    count_col: str = "n",
    sum_col: str = "total",
) -> DataFrame:
    """Two-stage count AND sum in ONE salted pass — what a caller who
    wants both should use instead of joining :func:`salted_count` with
    :func:`salted_sum` on the keys: that join scans the data twice, and
    a plain equi-join DROPS the NULL-key group that GROUP BY produces
    (r13 adversarial-data audit: the joined form lost the null-supplier
    row the moment the key column had nulls). Here both measures ride
    the same two shuffles and nulls group exactly like GROUP BY."""
    salt = (F.rand(seed=42) * n_salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .withColumn("_v", value)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_pn"), F.sum("_v").alias("_pv"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pn").cast("long").alias(count_col),
        F.sum("_pv").alias(sum_col),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the large side gets a random salt in
    [0, n_salts); the small side is replicated ``n_salts`` × via explode.
    Join key becomes (key, salt), so one hot key spreads over ``n_salts``
    tasks.

    This is the LAST-RESORT strategy, not a default. Measured
    (scripts/skew_soak.py, 60M-row fact with a 25-75% hot key joining a
    1M-row non-broadcastable dim): AQE's skew-join split handles the same
    join for free (it beat the unsalted baseline 2× and cost nothing over
    it), while salting paid 7-25× over AQE — the n_salts× replication of
    the small side is a real shuffle cost the optimizer never has to pay.
    Use salting only where AQE cannot act: stream-stream joins, a join
    whose output must keep a specific partitioning, or the window-by-hot-
    key shapes (there the two-phase bucket trick in verify.py::v03 is the
    same idea). For plain batch joins, leave AQE on and keep the hint
    off."""
    salted_large = large.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")


def detect_hot_keys(
    df: DataFrame,
    key: str,
    row_key: Column,
    min_share: float = 0.01,
    sample_shift: int = 8,
    salt: str = "hotkeys1",
) -> DataFrame:
    """Pre-join skew diagnostic: (key, est_n, est_share) for keys whose
    estimated row share exceeds ``min_share`` — the "know your hot keys"
    input for the AQE-blind contexts where :func:`salted_join`/the
    two-phase window trick are the remedy (stream-stream joins, pinned
    partitionings).

    Two sketch passes, never a full groupBy on the key:

    1. **Candidates** from a deterministic 1/2^shift ROW sample (gated
       on md5 of ``row_key``, a row-unique expression as in
       sketches.sampled_quantiles — gating on the KEY would select every
       key with the same 2^-shift probability regardless of its mass). A
       key owning min_share of n rows dodges the sample only with
       probability (1−2^-shift)^(min_share·n) — already < 10⁻⁶ at the
       60k-row test scale, astronomically small anywhere skew matters.
    2. **Verification** by Count-Min estimate over the FULL data — one
       partial-agg pass building the ≤ depth×width counter table, then a
       broadcast lookup of the candidates. CMS never undercounts, so a
       truly hot key cannot be filtered out; over-threshold false
       positives are bounded by the colliding mass n/width.

    The total row count that turns CMS counts into shares is read off
    the sketch itself — every row lands exactly one cell in hash row 0,
    so ``sum(n) where row_idx = 0`` IS the row count — not from a
    ``df.count()``, which at 100 TB would be a third full-corpus scan
    for a diagnostic that needs two (VERDICT r10). The sketch feeds
    both the total and the estimates, so it is lazily checkpointed
    (≤ depth×width rows) to keep its build pass single-execution.

    Both stages are md5-deterministic, so the detected set is stable
    across runs, engines, and retries (unlike a rand()-sampled probe)."""
    from . import sketches

    # concat (NULL-propagating), not concat_ws (NULL-skipping): with
    # concat_ws a NULL row_key collapsed to md5(salt) — ONE shared gate
    # value for every such row, so the whole NULL-key population was
    # sampled all-or-nothing while the SQL twin's `salt || ':' || rk`
    # excluded it (NULL gate) — a live divergence found by the dirty
    # sweep's NULL-PK arm (Rule 1; the same trap weighted_sample hit
    # r15). A NULL row_key row now never enters the candidate sample.
    sampled = df.filter(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit(":"), row_key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        < F.lit(1 << (32 - sample_shift))
    )
    candidates = sampled.select(key).distinct()
    sketch = sketches.cms_build(df, key).localCheckpoint(eager=False)
    total = sketch.filter(F.col("row_idx") == 0).agg(
        F.sum("n").cast("long").alias("_n_total")
    )
    est = sketches.cms_estimate(sketch, candidates, key)
    return (
        est.crossJoin(F.broadcast(total))
        .withColumn("est_share", F.col("cms_n") / F.col("_n_total").cast("double"))
        .filter(F.col("est_share") >= min_share)
        .select(key, F.col("cms_n").alias("est_n"), "est_share")
    )
