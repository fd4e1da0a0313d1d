"""As-of (point-in-time) join — an operator Spark lacks natively, built as a
composition of DataFrame ops per the "custom operators" ladder (compose >
pandas UDF > mapPartitions).

For each left row, find the right row with the greatest ``right_ts`` ≤
``left_ts`` within the same key — the standard time-series enrichment join
(trades→quotes, clicks→views). The distributed formulation is NOT a range
theta-join (quadratic) but union + per-key sort + carry-forward:

    tag sides → unionByName → window last(value, ignorenulls=True)
    over (partition by key order by ts, side rows unbounded preceding)
    → keep left rows

One shuffle + sort per key partition — the same cost as any keyed window,
linear in |left| + |right|, skew-handled by AQE like any other shuffle. At
equal timestamps the right row sorts FIRST (side 0 < 1), giving "at or
before" semantics — identical to DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``,
which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """Left as-of join: every left row, enriched with ``right_vals`` from
    the most recent right row at-or-before its timestamp (nulls when no
    prior right row exists)."""
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for v in right_vals:
        l_tagged = l_tagged.withColumn(f"__r_{v}", F.lit(None).cast(right.schema[v].dataType))
    # a null-timestamp right row can never be "the most recent at-or-
    # before" anything, but under asc-nulls-first ordering it would sort
    # ahead of EVERYTHING in the window and leak its values into
    # null-timestamp left rows — exclude it (found by the cogrouped-
    # equality null test, review r4)
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_vals],
    )
    l_cols = [c for c in l_tagged.columns if c in left.columns or c in ("__ts", "__side") or c.startswith("__r_")]
    unioned = l_tagged.select(*l_cols).unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{v}"), ignorenulls=True).over(w).alias(f"__asof_{v}")
            for v in right_vals
        ],
    )
    out = carried.filter(F.col("__side") == 1)
    for v in right_vals:
        out = out.withColumn(f"asof_{v}", F.col(f"__asof_{v}"))
    drop = ["__ts", "__side"] + [f"__r_{v}" for v in right_vals] + [f"__asof_{v}" for v in right_vals]
    return out.drop(*drop)


def as_of_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """The same as-of semantics via the cogrouped-pandas path
    (``groupBy().cogroup().applyInPandas`` + ``pandas.merge_asof``) —
    the rung BELOW the compositional default on the custom-operator
    ladder, kept as a pinned-equal alternative for two reasons: it
    exercises the cogroup API end-to-end (both sides of a key arrive in
    one Arrow batch pair), and it is the escape hatch when per-key logic
    outgrows window semantics (irregular interpolation, per-key models).
    Same shuffle cost as the window formulation (both sides hash on
    key); the difference is an Arrow round trip and a per-key pandas
    sort instead of codegen — prefer ``as_of_join`` in the hot path.
    ``tests/test_asof.py`` pins the two formulations row-identical.

    Key-type contract: pandas merge_asof requires numeric/datetime
    ordering keys and rejects nulls, where the window form is total —
    NULL-timestamp left rows are therefore routed AROUND the merge
    (emitted with null asof values, matching the window form's
    last(ignorenulls) result) and null right timestamps are dropped
    (they can never be "the most recent at-or-before" anything).

    The right timestamp is renamed to the reserved ``__r_ts`` before the
    merge (ADVICE r4): with the raw name, a left column spelled like
    ``right_ts`` — including the common same-name-both-sides layout —
    makes pandas suffix the collision ``_x``/``_y`` and the output
    projection KeyErrors, where the window form handles same-name
    columns fine. Left columns named ``__r_ts`` or colliding with an
    ``asof_*`` output are rejected eagerly with the rename guidance."""
    import pandas as pd

    reserved = {"__r_ts"} | {f"asof_{v}" for v in right_vals}
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"as_of_join_cogrouped: left columns {clash} collide with "
            "reserved merge names (__r_ts / asof_*); rename them first"
        )
    if len(set(right_vals)) != len(right_vals):
        raise ValueError(
            "as_of_join_cogrouped: right_vals contains duplicates — the "
            "output would carry ambiguous duplicate asof_* columns"
        )
    if right_ts in right_vals:
        # the rename dict would collapse ({right_ts: __r_ts} and
        # {right_ts: asof_*} share a key) and the merge key vanishes —
        # the window form handles this layout; use it, or alias the
        # timestamp to a second column on the right first
        raise ValueError(
            f"as_of_join_cogrouped: right_vals must not contain the "
            f"right timestamp column {right_ts!r}; select it under a "
            "second alias on the right side, or use as_of_join"
        )

    out_fields = [f for f in left.schema.fields]
    r_types = {v: right.schema[v].dataType.simpleString() for v in right_vals}
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields]
        + [f"`asof_{v}` {r_types[v]}" for v in right_vals]
    )
    l_cols = [f.name for f in out_fields]

    out_cols = l_cols + [f"asof_{v}" for v in right_vals]

    def with_null_asof(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        for v in right_vals:
            out[f"asof_{v}"] = None
        return out[out_cols]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        null_left = l_pdf[l_pdf[left_ts].isna()]
        l_live = l_pdf[l_pdf[left_ts].notna()]
        r_live = r_pdf[r_pdf[right_ts].notna()] if not r_pdf.empty else r_pdf
        if l_live.empty or r_live.empty:
            return with_null_asof(l_pdf)
        l_sorted = l_live.sort_values(left_ts, kind="mergesort")
        r_sorted = (
            r_live[[right_ts] + right_vals]
            .rename(
                columns={right_ts: "__r_ts", **{v: f"asof_{v}" for v in right_vals}}
            )
            .sort_values("__r_ts", kind="mergesort")
        )
        out = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on="__r_ts",
            direction="backward",
            allow_exact_matches=True,
        )[out_cols]
        if null_left.empty:
            return out
        return pd.concat([out, with_null_asof(null_left)], ignore_index=True)

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema=schema)
    )
