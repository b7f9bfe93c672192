"""Temporal-join specs — as-of join (DuckDB's native ASOF JOIN is the
oracle) and interval range join (oracle: plain BETWEEN join), both over the
events table. The Spark side uses the shuffle-bounded compositions in
operators/temporal.py, never a nested-loop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.temporal import asof_join, range_join_bucketed
from .base import register


@register(
    "j01_asof_join",
    tables=("events",),
    oracle="""
        -- Dirty-data contract made explicit (r13 adversarial-data audit):
        -- marks need a timestamp and a key (an un-timed or keyless mark
        -- belongs to no timeline), and an un-timed LEFT event has no
        -- "most recent prior" — NULL, by three-valued logic. DuckDB's
        -- KEYED ASOF would otherwise sort the NULL-ts left after
        -- everything and hand it the latest mark (its own unkeyed ASOF
        -- returns NULL for the same row), so the un-timed lefts are
        -- routed around the ASOF.
        --
        -- Simultaneous marks collapse to MAX(value) (r14 temporal-extremes
        -- leg): two error marks of one user at the SAME instant have no
        -- defined "most recent" between them — DuckDB's native ASOF picks
        -- one arbitrarily, while the Spark composition deterministically
        -- carries the greatest payload (its tie window orders by value).
        -- Unique-ts data is unaffected; the planted constant-ts arms made
        -- the ambiguity real.
        WITH marks AS (
            SELECT user_id, ts, MAX(value) AS mark_value
            FROM events
            WHERE event_type = 'error'
              AND ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY user_id, ts
        )
        SELECT e.event_id,
               e.user_id,
               m.mark_value AS last_error_value
        FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
        ASOF LEFT JOIN marks m
          ON e.user_id = m.user_id AND e.ts >= m.ts
        UNION ALL
        SELECT event_id, user_id, NULL AS last_error_value
        FROM events WHERE ts IS NULL
    """,
    tags=("asof", "temporal", "window", "join"),
)
def j01(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """As-of join: every event picks up the value of the user's most recent
    error at-or-before it. One shuffle of |L|+|R| via the union+window
    composition (operators/temporal.py) — checked against DuckDB's native
    ASOF JOIN."""
    events = t["events"]
    marks = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("mark_value")
    )
    out = asof_join(
        events, marks, on="ts", by="user_id", right_cols=("mark_value",), suffix=""
    )
    return out.select(
        "event_id", "user_id", F.col("mark_value").alias("last_error_value")
    )


@register(
    "j02_range_join",
    tables=("events",),
    oracle="""
        WITH windows AS (
            SELECT event_id AS purchase_id, user_id,
                   ts AS w_start, ts + INTERVAL 30 MINUTE AS w_end
            FROM events WHERE event_type = 'purchase'
        )
        SELECT w.purchase_id,
               CAST(count(*) AS BIGINT) AS n_clicks_in_window
        FROM events e
        JOIN windows w
          ON e.user_id = w.user_id
         AND e.ts BETWEEN w.w_start AND w.w_end
        WHERE e.event_type = 'click'
        GROUP BY w.purchase_id
    """,
    tags=("range-join", "temporal", "interval"),
)
def j02(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Range join: clicks falling inside each purchase's 30-minute follow-up
    window, counted per purchase. Bucketed-cell equi-join + exact filter
    (operators/temporal.py) — equivalent to the BETWEEN join the oracle
    runs, without the nested-loop blowup."""
    events = t["events"]
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    windows = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("w_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    joined = range_join_bucketed(
        clicks, windows, ts="ts", start="w_start", end="w_end", bucket_seconds=1800
    ).filter(F.col("user_id") == F.col("w_user"))
    return joined.groupBy("purchase_id").agg(
        F.count("*").alias("n_clicks_in_window")
    )
