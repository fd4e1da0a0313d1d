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
