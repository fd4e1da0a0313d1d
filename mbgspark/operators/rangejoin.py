"""Banded range join — interval-containment joins without the nested loop.

``point ∈ [lo, hi]`` joins are theta-joins; Spark plans them as
BroadcastNestedLoopJoin (fine for tiny interval tables) or, worse, a
cartesian product. The scale formulation buckets both sides by a band
width: every interval is replicated onto each band it overlaps, points land
in exactly one band, and the join becomes a hash equi-join on the band id
followed by the exact range filter. Cost is |points| + Σ interval-spans /
band_width replicated rows — linear, shuffled on band keys, AQE-coalesced.

Pick ``band_width`` ≈ the median interval length: too small replicates
intervals, too large puts many intervals per band back into the per-row
filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _band(c: Column, width: float) -> Column:
    return F.floor(c / F.lit(width)).cast("long")


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to interval rows with lo ≤ point ≤ hi, via a
    band-bucket equi-join. ``how='left'`` keeps pointless points with null
    interval columns.

    Points carry a surrogate row id through the band join so the left-mode
    anti-join matches on identity, not on all payload columns — null-unsafe
    column equality would re-emit any matched row containing a NULL payload
    value."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    p0 = points.withColumn("__pid", F.monotonically_increasing_id())
    p = p0.withColumn("__band", _band(F.col(point_col), band_width))
    i = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(
                _band(F.col(lo_col), band_width), _band(F.col(hi_col), band_width)
            )
        ),
    )
    joined = p.join(i, "__band", "inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    ).drop("__band")
    if how == "inner":
        return joined.drop("__pid")
    # re-attach points that matched no interval, by surrogate id
    missing = p0.join(joined.select("__pid"), "__pid", "left_anti")
    return joined.unionByName(missing, allowMissingColumns=True).drop("__pid")
