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
