"""Bucketed co-located join: same key, same bucket count on both sides ⇒
the join plan has NO shuffle exchange — the scale lever for repeated joins
on the store's key column."""

from pyspark.sql import functions as F

from mbgspark.io import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    # default warehouse dir (static conf); managed tables dropped in finally
    orders = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8)
    write_bucketed(customer, "b_customer", "c_custkey", num_buckets=8)

    bo = spark.table("b_orders")
    bc = spark.table("b_customer")
    # disable broadcast so the test proves bucketing (not broadcast) removed
    # the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, bo["o_custkey"] == bc["c_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # result parity with the plain join
        n_plain = (
            load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.count() == n_plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
