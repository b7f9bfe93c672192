"""Watermarked stream aggregations — SURVEY §2.8's streaming-window row.

The reference's only stream is the block-header tail with its implicit
5-block maturity delay (etl.rs:171) and stale-header guard (etl.rs:134-136);
a same-capability engine exposes the general forms: event-time tumbling /
sliding / session windows with a late-data watermark. These run identically
over a batch DataFrame (for the DuckDB parity oracle) and a streaming one —
the functions take either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: Default event-time sanity window for bound_event_time — wide enough
#: for any honest telemetry, narrow enough that no representable-garbage
#: timestamp (epoch zero, parquet-NANOS domain edges 1677/2262, a device
#: clock reset to 1969) can poison a watermark.
EVENT_TIME_VALID_RANGE = ("2000-01-01", "2100-01-01")


def bound_event_time(
    events: DataFrame,
    ts_col: str = "ts",
    lo: str = EVENT_TIME_VALID_RANGE[0],
    hi: str = EVENT_TIME_VALID_RANGE[1],
) -> DataFrame:
    """Watermark-poisoning guard (r14 temporal-extremes leg): keep only
    rows with ``lo <= ts < hi`` (NULL excluded). The watermark is
    ``max(event time) − delay`` and only ever advances, so ONE row with a
    far-future timestamp silently turns every subsequent honest event
    into "late data" — the r14 sweep measured a stream-stream join
    emitting 6 of 163 rows after a single planted 2262-04-11 event, with
    no error anywhere. A 100 TB telemetry stream WILL carry corrupt
    device clocks; bound event time BEFORE the watermark, and quarantine
    the complement (the inverse predicate) if the garbage needs auditing.
    Batch and streaming DataFrames both accepted (plain filter)."""
    c = F.col(ts_col)
    return events.filter(c.isNotNull() & (c >= F.lit(lo)) & (c < F.lit(hi)))


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "1 minute") -> DataFrame:
    """Late-data bound: state for windows older than max(event time) − delay
    is finalized and dropped — the streaming analogue of the reference's
    confirmation depth (a block is final 5 blocks ≈ 35 s past the tip)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, delay)
    return events  # batch: watermark is a no-op


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "5 minutes",
    keys: tuple[str, ...] = (),
    delay: str = "1 minute",
) -> DataFrame:
    """Per-window event counts (tumbling). Partial aggregation happens
    map-side; the shuffle key is (window, *keys) so state is evenly spread
    unless a key is skewed — salt upstream if one is."""
    # a tumbling window IS a sliding window with slide == width
    # (F.window(ts, w) defaults the slide to w) — one aggregation body,
    # no drift between the two shapes (r15 review)
    return sliding_counts(events, ts_col, width, width, keys, delay)


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    keys: tuple[str, ...] = (),
    delay: str = "1 minute",
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    src = with_watermark(events, ts_col, delay)
    return (
        src.groupBy(F.window(ts_col, width, slide).alias("w"), *[F.col(k) for k in keys])
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    keys: tuple[str, ...] = ("user_id",),
    delay: str = "1 minute",
) -> DataFrame:
    """Session windows: gap-based, one state row per open session per key.
    Only meaningful with keys (a global session degenerates)."""
    src = with_watermark(events, ts_col, delay)
    return (
        src.groupBy(
            F.session_window(ts_col, gap).alias("w"), *[F.col(k) for k in keys]
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    delay: str = "1 minute",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with the right
    events for the same key whose timestamp lands in
    ``[left_ts - ... , left_ts + upper]`` — Spark's canonical two-stream
    correlation (impressions↔clicks, orders↔payments, header↔receipt
    arrival). Both sides MUST carry a watermark plus the time-range
    condition: together they bound the join state (each side buffers only
    rows younger than watermark + interval, then evicts) — that bound is
    what lets the join run forever on unbounded streams.

    Runs identically on batch inputs (the condition degrades to a plain
    range predicate), which is how the parity test pins the streaming
    result to the batch answer. One shuffle per side on the equi-key;
    the range condition is evaluated within co-partitioned state."""
    l = with_watermark(left, left_ts, delay)
    r = with_watermark(right, right_ts, delay)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner").select(
        l[key].alias(key),
        F.col(left_ts),
        F.col(right_ts),
        (F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))).alias(
            "lag_us"
        ),
    )
