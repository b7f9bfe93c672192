"""Temporal join edge cases: NULL before first mark, equal-timestamp ties
prefer the right side, per-key isolation, inclusive interval boundaries,
and cross-bucket intervals in the range join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from core_etl_spark.operators.temporal import asof_join, range_join_bucketed

T0 = dt.datetime(2026, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "a", _ts(10)), (3, "a", _ts(20)), (4, "b", _ts(10))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(5), 50.0), ("a", _ts(20), 200.0), ("b", _ts(11), 999.0)],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_basic_and_null_before_first(frames):
    left, right = frames
    out = asof_join(left, right, on="ts", by="k", right_cols=("v",))
    got = {r.id: r.v_asof for r in out.collect()}
    assert got[1] is None          # before any mark
    assert got[2] == 50.0          # latest at-or-before t=10
    assert got[3] == 200.0         # tie at t=20 prefers the right row
    assert got[4] is None          # b's mark is later (t=11 > t=10)


def test_asof_row_count_preserved(frames):
    left, right = frames
    assert asof_join(left, right, on="ts", by="k", right_cols=("v",)).count() == left.count()


def test_range_join_inclusive_bounds_and_cross_bucket(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(30)), (3, _ts(90)), (4, _ts(91))],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(0), _ts(30)), (20, _ts(45), _ts(90))],  # 2nd spans buckets
        "rid long, start timestamp, end timestamp",
    )
    out = range_join_bucketed(left, right, bucket_seconds=600)  # 10-min cells
    pairs = {(r.id, r.rid) for r in out.collect()}
    assert pairs == {(1, 10), (2, 10), (3, 20)}  # bounds inclusive; 91 excluded


def test_range_join_inverted_interval_dropped_without_explosion(spark):
    """end < start never matches BETWEEN; before r16 it also exploded a
    DESCENDING sequence() (step defaults to -1) — one wide inversion was
    a multi-billion-cell stage killer. Now dropped pre-explode."""
    left = spark.createDataFrame([(1, _ts(10))], "id long, ts timestamp")
    right = spark.createDataFrame(
        # ~47 years inverted: would be ~1.5M hourly cells if exploded
        [(10, _ts(60 * 24 * 365 * 47), _ts(0))],
        "rid long, start timestamp, end timestamp",
    )
    out = range_join_bucketed(left, right, bucket_seconds=3600)
    assert out.count() == 0


def test_range_join_wide_interval_takes_broadcast_path(spark):
    """A legal interval wider than max_cells buckets must still match —
    via the exact broadcast leg, not a width/bucket-sized explode."""
    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(60 * 24 * 30))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(-1), _ts(60 * 24 * 365))],  # ~1 year window
        "rid long, start timestamp, end timestamp",
    )
    out = range_join_bucketed(left, right, bucket_seconds=60, max_cells=100)
    assert {(r.id, r.rid) for r in out.collect()} == {(1, 10), (2, 10)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the wide leg
    # and the narrow leg kept its equi-join (no cartesian anywhere)
    assert "CartesianProduct" not in plan


def test_range_join_paths_partition_exactly(spark):
    """narrow + wide legs must produce exactly the BETWEEN join result —
    no row lost or doubled at the max_cells boundary."""
    rows_l = [(i, _ts(i * 7)) for i in range(40)]
    rows_r = [
        (100 + j, _ts(j * 11), _ts(j * 11 + w))
        for j, w in enumerate([5, 50, 500, 5000, 20, 0])
    ]
    left = spark.createDataFrame(rows_l, "id long, ts timestamp")
    right = spark.createDataFrame(rows_r, "rid long, start timestamp, end timestamp")
    got = range_join_bucketed(left, right, bucket_seconds=600, max_cells=2)
    oracle = left.join(
        right,
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")),
    )
    g = sorted((r.id, r.rid) for r in got.collect())
    o = sorted((r.id, r.rid) for r in oracle.collect())
    assert g == o and len(g) > 0
