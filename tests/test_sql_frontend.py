"""The engine's second public surface (SURVEY §7): ``spark.sql`` over the
registered temp views must answer the same queries as the DataFrame API."""

from pyspark.sql import functions as F

from mbgspark.io import load_table, register_views

SF = "/root/testdata/sf0.001"


def test_register_views_and_sql(spark):
    register_views(spark, SF)
    got = {
        r["l_returnflag"]: r["cnt"]
        for r in spark.sql(
            "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1"
        ).collect()
    }
    want = {
        r["l_returnflag"]: r["cnt"]
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want and len(got) == 3


def test_sql_join_over_views(spark):
    register_views(spark, SF)
    rows = spark.sql(
        """
        SELECT r_name, count(*) AS n
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert len(rows) == 5 and sum(r["n"] for r in rows) == 25


def test_events_view_timestamp_readable(spark):
    # the TIMESTAMP(NANOS) rebuild must hold through the view layer
    register_views(spark, SF)
    row = spark.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM events").first()
    assert row["lo"].year >= 2024 and row["hi"] >= row["lo"]
