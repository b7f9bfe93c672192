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
    The second shuffle moves ≤ ``n_salts`` rows per key, not the raw rows."""
    salt = (F.rand(seed=42) * n_salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(agg_col))


def salted_sum(
    df: DataFrame, keys: list[str], value: Column, n_salts: int = 16, agg_col: str = "total"
) -> DataFrame:
    """Two-stage sum with the same spread; value must be decimal/long for
    order-independent exactness (doubles re-associate)."""
    salt = (F.rand(seed=42) * n_salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .withColumn("_v", value)
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(agg_col))


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
