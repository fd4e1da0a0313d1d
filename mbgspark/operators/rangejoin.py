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

    The range predicate rides INSIDE the join condition (equi keys + a
    residual filter), so left semantics come straight from the outer hash
    join: a point lands in exactly one band, hence exactly one join-probe
    row that either matches intervals or nulls out. No surrogate row id is
    needed — the previous formulation correlated two recomputations of
    ``monotonically_increasing_id`` across DAG branches, and MID is not
    stable under recomputation when the points lineage contains a shuffle,
    which could drop or duplicate left-mode rows. One join instead of
    join + anti-join + union also kills a whole probe of the points side."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    p = points.withColumn("__band", _band(F.col(point_col), band_width))
    i = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(
                _band(F.col(lo_col), band_width), _band(F.col(hi_col), band_width)
            )
        ),
    )
    cond = (
        (p["__band"] == i["__band"])
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    return p.join(i, cond, how).drop(p["__band"]).drop(i["__band"])
