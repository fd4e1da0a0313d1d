"""Slowly-changing-dimension maintenance (SCD Type 2) — the warehouse
operator that versions dimension rows instead of overwriting them, so every
fact can be joined against the dimension AS OF its own timestamp (the
batch-table complement of ``operators.asof``: as-of JOINS read time-versioned
data; SCD2 is how that data gets WRITTEN).

Distributed shape: one keyed equi-join between the current slice and the
(deduplicated) update batch decides every row's fate; history rows pass
through untouched. No windows over the dimension, no driver-side state —
the dimension can be any size, the update batch is typically small
(broadcastable; left to AQE, which picks broadcast when it is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension table.

    ``dim`` rows carry ``(key, *attrs, valid_from, valid_to)`` with
    ``valid_to IS NULL`` marking the current version. ``updates`` carry
    ``(key, *attrs, eff_col)``. Semantics per key:

    - attrs CHANGED → the current row closes (``valid_to = eff``) and a
      new current row opens (``valid_from = eff``);
    - attrs identical → no-op (idempotent: replaying the same batch
      changes nothing — the crash-recovery property every merge sink in
      this repo maintains);
    - key unseen → a new current row opens;
    - keys without an update pass through unchanged.

    Multiple updates per key in one batch collapse to the LATEST by
    ``eff_col`` (keep-latest, deterministic id-free tiebreak on the
    attrs struct) before the join — applying intra-batch intermediate
    versions requires a per-key ordered fold and is a different operator.
    History rows (``valid_to`` set) are untouched by construction.

    Late-arriving updates (``eff`` earlier than the current row's
    ``valid_from``) would mint INVERTED validity intervals that no as-of
    read could ever match — the row would silently vanish from temporal
    queries — so they raise instead (an eager validation action at call
    time, same documented trade as ``io.merge_by_key``'s partition
    check); retrofitting history is a restatement job, not an apply."""
    latest = updates.groupBy(key).agg(
        F.max(F.struct(F.col(eff_col), *[F.col(a) for a in attrs])).alias("__u")
    )
    u = latest.select(
        F.col(key),
        F.col(f"__u.{eff_col}").alias("__eff"),
        *[F.col(f"__u.{a}").alias(f"__new_{a}") for a in attrs],
    )
    hist = dim.filter(F.col(to_col).isNotNull())
    cur = dim.filter(F.col(to_col).isNull())
    joined = cur.join(u, key, "full_outer")
    n_late = joined.filter(
        F.col("__eff").isNotNull()
        & F.col(from_col).isNotNull()
        & (F.col("__eff") < F.col(from_col))
    ).count()
    if n_late:
        raise ValueError(
            f"scd2_apply: {n_late} update(s) effective BEFORE the current "
            "version's valid_from — late-arriving updates would invert "
            "validity intervals; restate history explicitly instead"
        )
    changed = F.col("__eff").isNotNull() & (
        F.col(from_col).isNull()  # new key: no current row
        | ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"__new_{a}").alias(a) for a in attrs])
        )
    )
    # Every joined row yields 1-2 output rows, decided ROW-LOCALLY:
    # unchanged keys keep their current row; changed keys with a current
    # row emit its closed version AND the opened one; brand-new keys emit
    # only the opened row. Emitting them as a conditional struct array +
    # explode keeps the (dim ⋈ updates) subtree a SINGLE plan consumer —
    # the earlier union-of-three-filtered-projections shape re-ran the
    # whole dimension scan + full-outer join once per branch (3x the scan
    # and shuffle at every scale; visible as three repeated join subtrees
    # in the executed plan at sf1).
    from_t = dim.schema[from_col].dataType
    to_t = dim.schema[to_col].dataType

    def _version(attr_cols, from_expr, to_expr):
        return F.struct(
            F.col(key).alias(key),
            *[c.alias(a) for a, c in zip(attrs, attr_cols)],
            from_expr.cast(from_t).alias(from_col),
            to_expr.cast(to_t).alias(to_col),
        )

    keep_or_close = F.when(
        F.col(from_col).isNotNull(),
        _version(
            [F.col(a) for a in attrs],
            F.col(from_col),
            F.when(changed, F.col("__eff")).otherwise(F.col(to_col)),
        ),
    )
    opened = F.when(
        changed,
        _version(
            [F.col(f"__new_{a}") for a in attrs],
            F.col("__eff"),
            F.lit(None),
        ),
    )
    out = joined.select(
        F.explode(
            F.filter(F.array(keep_or_close, opened), lambda x: x.isNotNull())
        ).alias("__v")
    ).select(f"__v.{key}", *[f"__v.{a}" for a in attrs], f"__v.{from_col}", f"__v.{to_col}")
    return hist.select(key, *attrs, from_col, to_col).unionByName(out)
