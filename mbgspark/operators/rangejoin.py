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
    interval columns."""
    p = points.withColumn("__band", _band(F.col(point_col), band_width))
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
        return joined
    if how == "left":
        # re-attach points that matched no interval
        matched = joined.select(*points.columns)
        missing = points.join(matched, points.columns, "left_anti")
        return joined.unionByName(missing, allowMissingColumns=True)
    raise ValueError(f"unsupported how={how!r} (inner|left)")
