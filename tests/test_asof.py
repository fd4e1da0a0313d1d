"""As-of join semantics: at-or-before matching, exact-timestamp ties match,
no-prior-row yields null, and keys never cross."""

import datetime as dt

from mbgspark.operators.asof import as_of_join

T = dt.datetime


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, T(2025, 1, 1, 12, 0, 0)),   # after r2 → matches r2
            (2, 10, T(2025, 1, 1, 10, 0, 0)),   # exact tie with r1 → matches r1
            (3, 10, T(2025, 1, 1, 9, 0, 0)),    # before all → null
            (4, 20, T(2025, 1, 1, 12, 0, 0)),   # other key, no rights → null
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, T(2025, 1, 1, 10, 0, 0), 100.0),  # r1
            (10, T(2025, 1, 1, 11, 0, 0), 200.0),  # r2
        ],
        "user_id int, ts timestamp, price double",
    )
    out = {
        r["event_id"]: r["asof_price"]
        for r in as_of_join(left, right, "user_id", "ts", "ts", ["price"]).collect()
    }
    assert out == {1: 200.0, 2: 100.0, 3: None, 4: None}


def test_cogrouped_asof_matches_window_formulation(spark):
    """The cogrouped-pandas merge_asof variant is row-identical to the
    window carry-forward default on real events (same at-or-before
    semantics, same nulls when no prior right row), including a key
    present only on the left."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.asof import as_of_join, as_of_join_cogrouped

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("value").alias("vval")
    )

    a = as_of_join(clicks, views, "user_id", "ts", "vts", ["vval"])
    b = as_of_join_cogrouped(clicks, views, "user_id", "ts", "vts", ["vval"])
    got_a = sorted(
        (r["user_id"], r["event_id"], str(r["ts"]), r["asof_vval"])
        for r in a.collect()
    )
    got_b = sorted(
        (r["user_id"], r["event_id"], str(r["ts"]), r["asof_vval"])
        for r in b.collect()
    )
    assert len(got_a) == len(got_b) > 0
    assert got_a == got_b


def test_scd2_apply_semantics_and_idempotence(spark):
    """Changed keys close+reopen, unchanged-attr updates are no-ops,
    new keys insert, history passes through — and replaying the SAME
    batch leaves the dimension identical (idempotence)."""
    from pyspark.sql import functions as F  # noqa: F401

    from mbgspark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "A", "2020-01-01", None),
            (1, "Z", "2019-01-01", "2020-01-01"),  # history row
            (2, "B", "2020-01-01", None),
            (3, "C", "2020-01-01", None),
        ],
        "k bigint, seg string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [
            (1, "A2", "2021-06-01"),  # changed
            (2, "B", "2021-06-01"),   # same attrs: no-op
            (9, "NEW", "2021-06-01"), # new key
        ],
        "k bigint, seg string, eff string",
    )
    out = scd2_apply(dim, updates, "k", ["seg"], "eff")
    rows = sorted(map(tuple, out.collect()))
    assert rows == sorted(
        [
            (1, "Z", "2019-01-01", "2020-01-01"),
            (1, "A", "2020-01-01", "2021-06-01"),
            (1, "A2", "2021-06-01", None),
            (2, "B", "2020-01-01", None),
            (3, "C", "2020-01-01", None),
            (9, "NEW", "2021-06-01", None),
        ]
    )
    replay = scd2_apply(out, updates, "k", ["seg"], "eff")
    assert sorted(map(tuple, replay.collect())) == rows


def test_cogrouped_asof_handles_null_timestamps(spark):
    """NULL-timestamp left rows get null asof values (like the window
    form) instead of crashing pandas merge_asof; null right timestamps
    are ignored."""
    from mbgspark.operators.asof import as_of_join, as_of_join_cogrouped

    left = spark.createDataFrame(
        [(1, 100, 10), (1, None, 11), (2, 50, 20)],
        "user_id bigint, ts bigint, event_id bigint",
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, None, 9.9), (2, 60, 2.0)],
        "user_id bigint, vts bigint, vval double",
    )
    a = sorted(
        (r["user_id"], r["event_id"], r["asof_vval"])
        for r in as_of_join(left, right, "user_id", "ts", "vts", ["vval"]).collect()
    )
    b = sorted(
        (r["user_id"], r["event_id"], r["asof_vval"])
        for r in as_of_join_cogrouped(
            left, right, "user_id", "ts", "vts", ["vval"]
        ).collect()
    )
    assert b == [(1, 10, 1.0), (1, 11, None), (2, 20, None)]
    assert a == b


def test_scd2_rejects_late_arriving_updates(spark):
    """An update effective before the current version's valid_from would
    invert the validity interval — scd2_apply raises instead."""
    import pytest

    from mbgspark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, "A", "2021-01-01", None)],
        "k bigint, seg string, valid_from string, valid_to string",
    )
    late = spark.createDataFrame(
        [(1, "B", "2020-06-01")], "k bigint, seg string, eff string"
    )
    with pytest.raises(ValueError, match="late-arriving"):
        scd2_apply(dim, late, "k", ["seg"], "eff")


def test_cogrouped_asof_same_name_timestamps(spark):
    """Left and right timestamp columns sharing a name (the common
    layout) work in the cogrouped form — the right ts is renamed to the
    reserved __r_ts before merge_asof, so pandas never suffixes a
    collision (ADVICE r4). Pinned equal to the window form."""
    from mbgspark.operators.asof import as_of_join, as_of_join_cogrouped

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 80, 11), (2, 50, 20)],
        "user_id bigint, ts bigint, event_id bigint",
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, 100, 2.0), (2, 60, 3.0)],
        "user_id bigint, ts bigint, vval double",
    )
    a = sorted(
        (r["user_id"], r["event_id"], r["asof_vval"])
        for r in as_of_join(left, right, "user_id", "ts", "ts", ["vval"]).collect()
    )
    b = sorted(
        (r["user_id"], r["event_id"], r["asof_vval"])
        for r in as_of_join_cogrouped(
            left, right, "user_id", "ts", "ts", ["vval"]
        ).collect()
    )
    assert b == [(1, 10, 2.0), (1, 11, None), (2, 20, None)]
    assert a == b


def test_cogrouped_asof_rejects_reserved_left_columns(spark):
    """A left column colliding with the reserved merge names raises
    eagerly with rename guidance instead of KeyErroring inside pandas."""
    import pytest

    from mbgspark.operators.asof import as_of_join_cogrouped

    left = spark.createDataFrame(
        [(1, 100, 5.0)], "user_id bigint, ts bigint, asof_vval double"
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0)], "user_id bigint, vts bigint, vval double"
    )
    with pytest.raises(ValueError, match="asof_vval"):
        as_of_join_cogrouped(left, right, "user_id", "ts", "vts", ["vval"])


def test_cogrouped_asof_rejects_right_ts_in_right_vals(spark):
    """right_vals containing the right timestamp column would collapse
    the rename dict and KeyError inside the executor — rejected eagerly
    with guidance (review r5); the window form handles the same request."""
    import pytest

    from mbgspark.operators.asof import as_of_join, as_of_join_cogrouped

    left = spark.createDataFrame(
        [(1, 100, 10)], "user_id bigint, lts bigint, event_id bigint"
    )
    right = spark.createDataFrame([(1, 90)], "user_id bigint, ts bigint")
    with pytest.raises(ValueError, match="right_vals"):
        as_of_join_cogrouped(left, right, "user_id", "lts", "ts", ["ts"])
    # the window form serves the same request fine
    got = as_of_join(left, right, "user_id", "lts", "ts", ["ts"]).collect()
    assert got[0]["asof_ts"] == 90


def test_cogrouped_asof_rejects_duplicate_right_vals(spark):
    import pytest

    from mbgspark.operators.asof import as_of_join_cogrouped

    left = spark.createDataFrame(
        [(1, 100, 10)], "user_id bigint, lts bigint, event_id bigint"
    )
    right = spark.createDataFrame(
        [(1, 90, 1.0)], "user_id bigint, ts bigint, vval double"
    )
    with pytest.raises(ValueError, match="duplicates"):
        as_of_join_cogrouped(left, right, "user_id", "lts", "ts", ["vval", "vval"])
