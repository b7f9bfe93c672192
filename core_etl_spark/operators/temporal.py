"""Temporal joins Spark lacks as primitives — as-of join and interval range
join — built as compositions of existing DataFrame ops (no UDFs, no cross
products), per the brief's custom-operator ladder.

- **as-of join** (backward): each left row picks the latest right row with
  ``right.ts <= left.ts`` per key. Implemented with the union trick: tag
  both sides, one shuffle+sort on (key, ts), then ``last(right_value,
  ignorenulls)`` over an unbounded-preceding window carries the most recent
  right value forward onto left rows. Cost: ONE shuffle of |L|+|R| rows —
  never a join fan-out, never a cross product. (DuckDB's native ASOF JOIN
  is the differential oracle.)
- **range join**: pairs (l, r) with ``l.ts ∈ [r.start, r.end]``. The naive
  plan is a broadcast-nested-loop; the scale path buckets time into
  ``bucket_width`` cells, explodes each interval into the cells it covers
  (``sequence``), equi-joins on the cell, then exact-filters. Shuffle is
  |L| + Σ interval-widths/bucket, linear for bounded intervals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    right_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: attach the latest ``right`` row (per ``by`` key,
    ``right.on <= left.on``) to every left row. Left rows with no prior
    right row get NULLs. Ties on the timestamp prefer the right row (it is
    'already known' at that instant)."""
    keys = [by] if by else []
    l_tag = left.select(
        *keys, F.col(on), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *keys, F.col(on), F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts (ties prefer right);
    # right rows that also tie on ts order by their value columns so the
    # carried value is deterministic across runs (last = greatest values),
    # not whichever row the shuffle happened to place last
    w = (
        W.partitionBy(*keys)
        .orderBy(
            F.col(on).asc(),
            F.col("_is_left").asc(),
            *[F.col(f"_r_{c}").asc_nulls_first() for c in right_cols],
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    return carried.filter(F.col("_is_left") == 1).select(
        *out_cols, *[f"{c}{suffix}" for c in right_cols]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket: Column | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval containment join, bucketed: explode each right interval into
    the time cells it covers, equi-join cells, exact-filter. Equivalent to
    ``l JOIN r ON l.ts BETWEEN r.start AND r.end`` (the oracle) without the
    nested-loop blowup."""
    cell = lambda c: (F.unix_timestamp(c) / bucket_seconds).cast("long")  # noqa: E731
    l_cells = left.withColumn("_cell", cell(F.col(ts)))
    r_cells = right.withColumn(
        "_cell",
        F.explode(F.sequence(cell(F.col(start)), cell(F.col(end)))),
    )
    return (
        l_cells.join(r_cells, "_cell")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_cell")
    )
