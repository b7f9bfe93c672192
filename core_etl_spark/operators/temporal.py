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
    'already known' at that instant).

    Dirty-data rules (r13 adversarial-data audit, matching DuckDB's
    native ASOF JOIN): a right row with a NULL timestamp is DROPPED —
    "at-or-before" is undefined for an un-timed mark, and under Spark's
    NULLS FIRST window order it would otherwise leak its value into
    every left row. A left row with a NULL timestamp gets NULLs (no
    prior mark can be established). And the carried payload rides in a
    STRUCT, so a right row whose VALUE is NULL is still "the latest
    mark" and correctly yields NULL — the old bare-column carry used
    ``last(ignorenulls)`` which skipped it and resurrected an older
    mark's value. A right row with a NULL ``by`` key is dropped for the
    same reason: join equality never matches NULL (the window's
    partitionBy would otherwise pool all NULL-key rows into one bogus
    timeline and hand its marks to every NULL-key left row)."""
    keys = [by] if by else []
    right = right.filter(F.col(on).isNotNull())
    if by:
        right = right.filter(F.col(by).isNotNull())
    payload_t = (
        "struct<"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols)
        + ">"
    )
    l_tag = left.select(
        *keys, F.col(on), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(payload_t).alias("_r"),
    )
    r_tag = right.select(
        *keys, F.col(on), F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).cast(payload_t).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts (ties prefer right);
    # right rows that also tie on ts order by their value columns so the
    # carried value is deterministic across runs (last = greatest values),
    # not whichever row the shuffle happened to place last
    w = (
        W.partitionBy(*keys)
        .orderBy(
            F.col(on).asc_nulls_first(),  # NULL-ts left rows see no marks
            F.col("_is_left").asc(),
            *[F.col("_r")[c].asc_nulls_first() for c in right_cols],
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_carried")
    )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    return carried.filter(F.col("_is_left") == 1).select(
        *out_cols,
        *[F.col("_carried")[c].alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket: Column | None = None,
    bucket_seconds: int = 3600,
    max_cells: int = 10_000,
) -> DataFrame:
    """Interval containment join, bucketed: explode each right interval into
    the time cells it covers, equi-join cells, exact-filter. Equivalent to
    ``l JOIN r ON l.ts BETWEEN r.start AND r.end`` (the oracle) without the
    nested-loop blowup.

    Two per-row explosion valves (r16 review — the same DoS class as the
    batch-decode count word, missed here by the r13 audit):

    - an INVERTED interval (``end < start`` — dirty data) is dropped
      before the explode. BETWEEN never matches it, so this is
      value-identical; without the filter, Spark's ``sequence`` happily
      builds a DESCENDING cell array (step defaults to -1), and one
      corrupt 1677..2262 inversion is a multi-billion-element stage
      killer.
    - an interval wider than ``max_cells`` buckets (legal but rare —
      maintenance windows, open-ended sessions) is routed through an
      exact broadcast join instead of the explode: wide intervals are
      assumed FEW (it's the narrow ones that come in billions), so
      broadcasting them costs KBs while exploding them costs
      width/bucket rows EACH. The two paths partition the intervals, so
      the union is exactly the BETWEEN semantics."""
    cell = lambda c: (F.unix_timestamp(c) / bucket_seconds).cast("long")  # noqa: E731
    exact = (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    right = right.filter(F.col(end) >= F.col(start))
    width = cell(F.col(end)) - cell(F.col(start))
    narrow = right.filter(width < max_cells)
    wide = right.filter(width >= max_cells)
    l_cells = left.withColumn("_cell", cell(F.col(ts)))
    r_cells = narrow.withColumn(
        "_cell",
        F.explode(F.sequence(cell(F.col(start)), cell(F.col(end)))),
    )
    bucketed = (
        l_cells.join(r_cells, "_cell")
        .filter(exact)
        .drop("_cell")
    )
    wide_hits = left.join(F.broadcast(wide), exact)
    return bucketed.unionByName(wide_hits)
