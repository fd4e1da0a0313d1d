"""Banded range join: result parity with the naive theta-join, boundary
inclusivity, left-join null preservation, and the plan staying an equi-join."""

from pyspark.sql import functions as F

from mbgspark.operators.rangejoin import banded_range_join


def _data(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 17.3), (4, 99.9), (5, 2000.0)],
        "pid int, v double",
    )
    intervals = spark.createDataFrame(
        [(0.0, 5.0, "a"), (5.0, 50.0, "b"), (50.0, 100.0, "c")],
        "lo double, hi double, tag string",
    )
    return points, intervals


def test_matches_naive_theta_join(spark):
    points, intervals = _data(spark)
    banded = {
        (r["pid"], r["tag"])
        for r in banded_range_join(points, intervals, "v", "lo", "hi", 10.0).collect()
    }
    naive = {
        (r["pid"], r["tag"])
        for r in points.join(
            intervals, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert banded == naive
    assert (2, "a") in banded and (2, "b") in banded  # inclusive boundary: both


def test_left_keeps_unmatched_points(spark):
    points, intervals = _data(spark)
    rows = banded_range_join(points, intervals, "v", "lo", "hi", 10.0, how="left")
    got = {(r["pid"], r["tag"]) for r in rows.collect()}
    assert (5, None) in got  # 2000.0 is outside every tier


def test_plan_is_equijoin_not_nested_loop(spark):
    points, intervals = _data(spark)
    plan = (
        banded_range_join(points, intervals, "v", "lo", "hi", 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
