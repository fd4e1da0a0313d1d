"""Salted join / salted distinct must be result-identical to the plain
formulations — only the physical key distribution differs."""

from pyspark.sql import functions as F

from mbgspark.operators.skew import salted_count_distinct, salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows share key 1
    fact = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 1000 + k) for k in range(2, 12)],
        "k int, payload int",
    )
    build = spark.createDataFrame([(k, f"v{k}") for k in range(12)], "k int, val string")
    plain = {(r["k"], r["payload"], r["val"]) for r in fact.join(build, "k").collect()}
    salted = {
        (r["k"], r["payload"], r["val"])
        for r in salted_join(fact, build, "k", buckets=4).collect()
    }
    assert salted == plain and len(salted) == 100


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (99, "b")], "k int, p string")
    build = spark.createDataFrame([(1, "v1")], "k int, val string")
    rows = {
        (r["k"], r["val"]) for r in salted_join(fact, build, "k", 4, "left").collect()
    }
    assert rows == {(1, "v1"), (99, None)}


def test_salted_count_distinct_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(13)],
        "g string, v int",
    )
    got = {
        r["g"]: r["distinct_v"]
        for r in salted_count_distinct(df, "g", "v", buckets=4).collect()
    }
    assert got == {"a": 7, "b": 13}


def test_skew_default_stance_is_aqe_split(spark):
    """The measured pin (SCALE.md r10, tools/key_skew_octave.py): at a
    50%-hot join key the winning non-broadcast strategy is AQE's skew
    split (5.7 s vs plain 15.8 s vs salted 22.1 s at 59.4M fact rows),
    so the engine session MUST keep it on — salting is the documented
    exception path, never the default."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_salted_join_rejects_build_duplicating_types(spark):
    """right/full outer would emit every unmatched build row x buckets —
    the operator must refuse, not return silently wrong rows."""
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k int, p string")
    build = spark.createDataFrame([(2, "v")], "k int, val string")
    with pytest.raises(ValueError, match="would duplicate"):
        salted_join(fact, build, "k", 4, "right")
