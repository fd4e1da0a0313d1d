"""Multi-join / set-op / windowed analytics gate queries.

These go beyond the reference's single-fact lineage to prove the engine
handles the plans a 100 TB warehouse actually runs: star-schema multi-joins
where Catalyst must broadcast the dimension chain and shuffle only the
facts, CUBE subtotal lattices, lag/lead deltas, INTERSECT/EXCEPT set
algebra, and scalar-subquery (cross-join-broadcast) comparisons.

Shapes modeled on TPC-H Q3/Q5 (public spec) restated over the driver's
TPC-H-ish testdata. Reference parity anchor: these generalize the
dashboard aggregations of SURVEY §2.6 A8 (`README.md:84-94` per-region /
trend rollups) from 2-table to full snowflake depth.

Same contract rules as catalog_core: identical aliases both engines, total
ORDER BY, floats rounded (2 dp money), counts left as native BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mbgspark.plans.catalog_core import _MONEY, _money, _money_sum, _t


def _revenue():
    """Exact decimal line revenue: extendedprice * (1 - discount).

    Computed in DECIMAL so group sums are associative and engine-identical
    at any scale (see catalog_core._money_sum) — the double form flipped a
    cent vs the oracle at sf1 once per-nation sums passed ~7e7."""
    return _money("l_extendedprice") * (F.lit(1).cast(_MONEY) - _money("l_discount"))


def _revenue_sum(alias="revenue", nd=2):
    """round(sum(_revenue()), nd) exactly, output DOUBLE (driver contract)."""
    return F.round(F.sum(_revenue()), nd).cast("double").alias(alias)


# ------------------------------------------------------------ TPC-H Q3 ----
def shipping_priority_top10(spark, sf_dir):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, segment + date window
    filters pushed below the joins, per-order revenue, global top-10.
    customer is broadcast; only orders⋈lineitem shuffles on orderkey."""
    CUT = "1997-06-01"
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(CUT))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(CUT))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_sum())
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < '1997-06-01'
  AND l_shipdate  > '1997-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ------------------------------------------------------------ TPC-H Q5 ----
def region_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-table snowflake (region→nation→customer/supplier →
    orders→lineitem) with the local-supplier constraint
    c_nationkey = s_nationkey. All four dimension hops broadcast; the
    single shuffle is orders⋈lineitem."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_revenue_sum())
        .orderBy(F.desc("revenue"), "n_name")
    )


REGION_NATION_SQL = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ------------------------------------------------------- CUBE lattice -----
def cube_flag_status(spark, sf_dir):
    """Full CUBE over (l_returnflag, l_linestatus): every subtotal level in
    one pass (Spark Expand + single hash agg — no N re-scans). grouping_id
    disambiguates the lattice level; null group cells mapped to 'ALL' so
    null-ordering dialects can't skew the hash."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.col("gid").cast("bigint").alias("gid"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


CUBE_SQL = """
SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         AS gid,
       coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
"""


# ------------------------------------------------- lag/lead day deltas ----
def dod_order_delta(spark, sf_dir):
    """Day-over-day delta of daily order counts via lag(), plus the next
    day's count via lead() — the trend-dashboard derivative (SURVEY A8)
    as window functions over one sorted pass."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = Window.orderBy("day")
    return (
        daily.select(
            "day",
            "cnt",
            (F.col("cnt") - F.lag("cnt", 1).over(w)).alias("dod_delta"),
            F.lead("cnt", 1).over(w).alias("next_cnt"),
        )
        .orderBy("day")
        .limit(120)
    )


DOD_DELTA_SQL = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS cnt
  FROM orders GROUP BY 1
)
SELECT day, cnt,
       cnt - lag(cnt, 1) OVER (ORDER BY day) AS dod_delta,
       lead(cnt, 1) OVER (ORDER BY day) AS next_cnt
FROM daily ORDER BY day LIMIT 120
"""


# ------------------------------------------- INTERSECT / EXCEPT algebra ---
def customer_period_sets(spark, sf_dir):
    """Customer-retention set algebra: buyers active in both 1996 and 1997
    (INTERSECT) vs churned (EXCEPT) vs acquired (reverse EXCEPT), counted.
    Spark plans these as left-semi / left-anti joins over the distinct
    key sets — no driver-side materialization."""
    o = _t(spark, sf_dir, "orders")

    def buyers(y0: str, y1: str):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(y0))
                & (F.col("o_orderdate") < F.lit(y1))
            )
            .select("o_custkey")
            .distinct()
        )

    a = buyers("1996-01-01", "1997-01-01")
    b = buyers("1997-01-01", "1998-01-01")
    rows = [
        ("acquired_1997", b.subtract(a)),
        ("churned_after_1996", a.subtract(b)),
        ("retained_both", a.intersect(b)),
    ]
    out = None
    for name, df in rows:
        piece = df.agg(F.count("*").alias("cnt")).select(
            F.lit(name).alias("segment"), "cnt"
        )
        out = piece if out is None else out.unionByName(piece)
    return out.orderBy("segment")


PERIOD_SETS_SQL = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'),
     b AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01')
SELECT 'acquired_1997' AS segment,
       (SELECT count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)) AS cnt
UNION ALL
SELECT 'churned_after_1996',
       (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
UNION ALL
SELECT 'retained_both',
       (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
ORDER BY segment
"""


# ----------------------------------------- scalar-subquery comparison -----
def big_spenders_vs_avg(spark, sf_dir):
    """Customers whose lifetime spend beats the average customer's: scalar
    aggregate broadcast against the per-customer rollup (the Spark plan is
    a 1-row broadcast nested-loop — no second scan of orders). The whole
    knife-edge comparison runs in exact integer cents: per-row
    floor(price·100 + 0.5) → exact BIGINT sums, threshold = half-up integer
    division — fp summation order can't flip a membership, and the
    avg-of-rounded-values tie (the curate_corpus round-1 failure mode)
    can't occur because no float reaches the comparison or the hash."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("spend_c")
    )
    thr = spend.agg(
        F.expr("(2 * sum(spend_c) + count(*)) div (2 * count(*))")
        .cast("bigint")
        .alias("thr_c")
    )
    return (
        spend.join(F.broadcast(thr))
        .filter(F.col("spend_c") > F.col("thr_c"))
        .agg(
            F.count("*").alias("n_above"),
            F.sum("spend_c").cast("bigint").alias("spend_above_c"),
            F.min("o_custkey").alias("first_custkey"),
        )
    )


BIG_SPENDERS_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS spend_c
  FROM orders GROUP BY o_custkey
),
thr AS (
  SELECT CAST((2 * sum(spend_c) + count(*)) // (2 * count(*)) AS BIGINT)
           AS thr_c
  FROM spend
)
SELECT count(*) AS n_above,
       CAST(sum(spend_c) AS BIGINT) AS spend_above_c,
       min(o_custkey) AS first_custkey
FROM spend, thr WHERE spend_c > thr_c
"""


# ------------------------------------------------- correlated EXISTS -----
def exists_shipped_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders in a quarter having at least one lineitem
    shipped after the order date (correlated EXISTS), counted per priority.
    Spark plans the EXISTS as a LEFT SEMI join on the orderkey with the
    non-equi ship-date predicate evaluated inside the join — one pass over
    each side, no duplicate-order inflation, map-side combine on the agg.
    Parity anchor: SURVEY §2.8 U3 generalized from anti- to semi-join."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


EXISTS_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------- order-count distribution ----
def cust_order_histogram(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by how many orders they
    placed, INCLUDING zero-order customers (left outer join, count of the
    nullable side). Two cascaded aggregations; the second one's input is
    one row per customer, so the re-shuffle is tiny regardless of fact
    size — the shape that survives 100 TB is exactly this two-level agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUST_HISTOGRAM_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------- ntile spend tiers -----
def spend_quartiles(spark, sf_dir):
    """Customer-spend quartiles: per-customer rollup, ntile(4) over a
    deterministic total order (spend DESC, custkey tiebreak), then
    per-quartile stats. The global window runs on the per-customer rollup
    (|customers| rows, not |orders|), so the single-partition sort stays
    bounded; at 100 TB swap the exact ntile for approxQuantile cutpoints
    + a broadcast range assignment (same output contract)."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(_money_sum("o_totalprice", "spend"))
    w = Window.orderBy(F.desc("spend"), "o_custkey")
    return (
        spend.select("o_custkey", "spend", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_cust"),
            # spend is an exact 2-dp double, so the re-cast is lossless
            _money_sum("spend", "total_spend"),
            F.round(F.min("spend"), 2).alias("min_spend"),
        )
        .orderBy("quartile")
    )


SPEND_QUARTILES_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
),
tiers AS (
  SELECT o_custkey, spend,
         ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS quartile
  FROM spend
)
SELECT quartile, count(*) AS n_cust,
       CAST(round(sum(CAST(spend AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_spend,
       round(min(spend), 2) AS min_spend
FROM tiers GROUP BY quartile ORDER BY quartile
"""


# ------------------------------------------------- date-spine gap-fill ---
def daily_gapfill(spark, sf_dir):
    """Gap-filled daily revenue series: a date spine generated from the
    data's own min/max (sequence + explode — never a driver-side loop),
    left-joined against the daily rollup, gaps coalesced to zero. This is
    the trend dashboard (SURVEY §2.6 A8) made safe for charting: days with
    no orders appear as 0 instead of vanishing. The spine is one row per
    day (~thousands) so Spark broadcasts it against the rollup."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("cnt"),
        _money_sum("o_totalprice", "rev"),
    )
    spine = (
        o.agg(
            F.min(F.to_date("o_orderdate")).alias("d0"),
            F.max(F.to_date("o_orderdate")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("rev", F.lit(0.0)).alias("rev"),
        )
        .orderBy("day")
    )


DAILY_GAPFILL_SQL = """
WITH b AS (
  SELECT min(CAST(o_orderdate AS DATE)) AS d0,
         max(CAST(o_orderdate AS DATE)) AS d1
  FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM b
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(spine.day, '%Y-%m-%d') AS day,
       coalesce(daily.cnt, 0) AS cnt,
       coalesce(daily.rev, 0.0) AS rev
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY day
"""


# ------------------------------------------------- top-N per group -------
def top3_orders_per_segment(spark, sf_dir):
    """Top-3 orders by value within each market segment: the per-group
    top-N window (row_number over a partition, deterministic orderkey
    tiebreak). Unlike a global ORDER BY + LIMIT, the sort is partitioned
    by segment so no single task ever sees the full fact."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("rank_in_seg", F.row_number().over(w))
        .filter(F.col("rank_in_seg") <= 3)
        .select(
            "c_mktsegment",
            "rank_in_seg",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("c_mktsegment", "rank_in_seg")
    )


TOP3_PER_SEGMENT_SQL = """
SELECT c_mktsegment, rank_in_seg, o_orderkey, round(o_totalprice, 2) AS price
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_seg
  FROM orders JOIN customer ON o_custkey = c_custkey
) ranked
WHERE rank_in_seg <= 3
ORDER BY c_mktsegment, rank_in_seg
"""


# --------------------------------------------- percent-of-total window ---
def segment_revenue_share(spark, sf_dir):
    """Each segment's share of total revenue: aggregate first (5 rows),
    then a whole-frame window sum for the denominator — the window runs
    over the GROUPED result, never the fact, so the unpartitioned frame
    is 5 rows regardless of data scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    seg = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(_money_sum("o_totalprice", "rev"))
    )
    total = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        "rev",
        F.round(F.col("rev") / F.sum("rev").over(total), 6).alias("share"),
    ).orderBy("c_mktsegment")


SEGMENT_SHARE_SQL = """
WITH seg AS (
  SELECT c_mktsegment,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, rev,
       round(rev / sum(rev) OVER (), 6) AS share
FROM seg ORDER BY c_mktsegment
"""


# ------------------------------------------------------------ TPC-H Q1 ----
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical wide aggregate — 8 aggregates over 2
    group keys in ONE hash-agg pass (sum/avg/count share the partial-agg
    buffers; no re-scan per aggregate). The ship-date filter reaches the
    parquet scan.

    Hashed surface is exact-integer: every per-row term is a fixed-decimal
    value (qty int, price 2dp, disc 2dp ⇒ disc_price 4dp, charge 6dp), so it
    is scaled to a BIGINT per row (floor(v·10^d + 0.5) — identical IEEE ops
    in both engines) and summed exactly; averages are half-up integer
    division of those exact sums. No float ever reaches the hash, so fp
    summation order and engine rounding rules can't flip a value — the
    failure mode that bit curate_corpus in round 1."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc * (F.lit(1) + F.col("l_tax"))

    def e(col, d):  # exact scaled integer of a fixed-decimal double
        return F.floor(col * F.lit(10**d) + F.lit(0.5)).cast("bigint")

    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(e(F.col("l_quantity"), 0)).cast("bigint").alias("sum_qty"),
            F.sum(e(F.col("l_extendedprice"), 2)).cast("bigint").alias("sum_base_price_c"),
            F.sum(e(disc, 4)).cast("bigint").alias("sum_disc_price_e4"),
            F.sum(e(charge, 6)).cast("bigint").alias("sum_charge_e6"),
            F.sum(e(F.col("l_discount"), 2)).cast("bigint").alias("__sum_disc_c"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price_c",
            "sum_disc_price_e4",
            "sum_charge_e6",
            # half-up integer division: round(10^d * sum / cnt)
            F.expr("(2 * 10000 * sum_qty + count_order) div (2 * count_order)")
            .cast("bigint")
            .alias("avg_qty_e4"),
            F.expr(
                "(2 * 100 * sum_base_price_c + count_order) div (2 * count_order)"
            )
            .cast("bigint")
            .alias("avg_price_e4"),
            F.expr("(2 * 10000 * __sum_disc_c + count_order) div (2 * count_order)")
            .cast("bigint")
            .alias("avg_disc_e6"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_base_price_c,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_charge_e6,
         CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_disc_c,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= '1998-09-01'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       sum_qty, sum_base_price_c, sum_disc_price_e4, sum_charge_e6,
       CAST((2 * 10000 * sum_qty + count_order) // (2 * count_order) AS BIGINT)
         AS avg_qty_e4,
       CAST((2 * 100 * sum_base_price_c + count_order) // (2 * count_order)
            AS BIGINT) AS avg_price_e4,
       CAST((2 * 10000 * sum_disc_c + count_order) // (2 * count_order)
            AS BIGINT) AS avg_disc_e6,
       count_order
FROM s
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------ TPC-H Q6 ----
def forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: scan-dominated filter + single global aggregate.
    All three predicates (date window, discount band, quantity cap) are
    pushable — at 100 TB this query is pure I/O, and the plan must show
    PushedFilters on every column it touches."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_money("l_extendedprice") * _money("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# -------------------------------------------- explicit GROUPING SETS -----
def grouping_sets_status(spark, sf_dir):
    """Explicit GROUPING SETS — the asymmetric subtotal lattice CUBE can't
    express: (status, priority) detail + per-status subtotal + grand total,
    but NO per-priority slice. Driven through the spark.sql frontend over
    the registered views (one Expand + single hash agg, same physical shape
    as cube_flag_status)."""
    from mbgspark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS BIGINT) AS gid,
               coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS cnt,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, status, priority
        """
    )


GROUPING_SETS_SQL = """
SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
         AS gid,
       coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS cnt,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid, status, priority
"""


# ----------------------------------------------------------- TPC-H Q10 ---
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter — orders date-windowed, lineitem filtered to returnflag='R'
    BEFORE the join, customer+nation broadcast, global top-20 with key
    tiebreak. The only shuffle is orders⋈lineitem + the final agg."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_revenue_sum())
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


RETURNED_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= '1996-10-01' AND o_orderdate < '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ----------------------------------------------------------- TPC-H Q14 ---
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue as a % of all revenue in one month —
    conditional aggregation over a fact⋈dim join (part broadcast), both
    numerator and denominator in a single pass."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    rev = _revenue()
    zero = F.lit(0).cast(_MONEY)
    # numerator and denominator are exact decimal sums; the division runs
    # in double on IDENTICAL inputs both engines (decimal/decimal scale
    # rules differ between Spark and DuckDB, double division does not)
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


PROMO_SHARE_SQL = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                   * (1 - CAST(l_discount AS DECIMAL(12,2)))
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             4) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'
"""


# ------------------------------------------------------------ TPC-H Q7 ----
def volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between a nation pair by
    ship year — lineitem⋈orders shuffle with supplier/customer/nation(×2)
    all broadcast; the OR-of-pairs predicate evaluates after the two
    nation hops, everything else pushes to the scans."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_revenue_sum())
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


VOLUME_SHIPPING_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ------------------------------------------------------------ TPC-H Q8 ----
def market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_1's share of ASIA-region PROMO-part revenue
    by order year — numerator and denominator in ONE conditional
    aggregate pass over the joined fact, all dims broadcast."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _revenue()
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
                        F.lit(0).cast(_MONEY)
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
                      THEN CAST(l_extendedprice AS DECIMAL(12,2))
                           * (1 - CAST(l_discount AS DECIMAL(12,2)))
                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
             4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------- TPC-H Q17 ---
def small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from lineitems under half their part's
    average quantity — the correlated scalar subquery decorrelated into a
    per-part aggregate joined back to the fact (broadcast: one row per
    part)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            F.round(F.sum(_money("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
        )
    )


SMALL_QTY_SQL = """
WITH pa AS (SELECT l_partkey AS pk, avg(l_quantity) AS aq FROM lineitem GROUP BY 1)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa   ON pk = l_partkey
WHERE p_brand = 'Brand#4' AND l_quantity < 0.5 * aq
"""


# ----------------------------------------------------------- TPC-H Q18 ---
def large_orders(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total quantity exceeds 300 — the
    HAVING subquery is the same lineitem aggregate the outer query needs,
    so it is computed once and semi-reused as the join input."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(total_qty, 2) AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


# ----------------------------------------------------------- TPC-H Q19 ---
def disjunctive_part_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-conjuncts across the join — the common
    l_partkey = p_partkey equi-join stays a hash join and the per-branch
    brand/size/quantity predicates evaluate post-join; per-column ranges
    that hold across ALL branches still push to the scans."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2)
        .agg(
            _revenue_sum(),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


DISJUNCTIVE_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
"""


# ------------------------------------------------- RANGE-frame window -----
def trailing_30d_revenue(spark, sf_dir):
    """Time-RANGE window frame (not ROWS): per-customer trailing-30-day
    order revenue — the frame is defined by the timestamp interval, so
    ties and gaps behave identically however rows are batched. Bounded:
    the window partitions by customer and sorts only each customer's
    orders."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr(
                "CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER ("
                "PARTITION BY o_custkey ORDER BY o_orderdate "
                "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2) AS DOUBLE)"
            ).alias("trailing_30d"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


TRAILING_30D_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS trailing_30d
FROM orders
WHERE o_custkey < 20
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


# --------------------------------------------- window rank features -------
def window_rank_features(spark, sf_dir):
    """Ranking-function breadth in one partitioned pass: percent_rank,
    cume_dist, quartile ntile, and the 2nd-highest order value per
    priority class — one Window sort per partition, no global sort
    (output ordering is the catalog's own orderBy)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.nth_value("o_totalprice", 2).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("second_highest"),
        )
        .orderBy("o_orderpriority", F.desc("o_totalprice"), "o_orderkey")
    )


WINDOW_RANK_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       nth_value(o_totalprice, 2) OVER (
         PARTITION BY o_orderpriority
         ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_highest
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
"""


# ----------------------------------------------------------- TPC-H Q21 ---
def waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    multi-supplier orders, count per supplier the orders where THIS
    supplier was the only late one — EXISTS(another supplier on the
    order) AND NOT EXISTS(another LATE supplier on the order).

    The testdata lineitem has no commit/receipt dates, so "late" is
    restated as shipping >45 days after the order date (same plan shape:
    the lateness predicate needs the orders join before the two
    correlated quantifiers can run).

    Plan: ONE lineitem⋈orders('F') shuffle builds the late set; the
    EXISTS is a left-semi against the raw lineitem keyed on orderkey with
    the suppkey-inequality in the join condition, the NOT EXISTS a
    left-anti against the late set itself. Both correlated subqueries
    become hash joins on l_orderkey — the decorrelation every serious
    optimizer applies to Q21; no per-row subquery execution anywhere.
    supplier⋈nation is broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    blamed = late.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "leftsemi",
    ).join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "leftanti",
    )
    return (
        blamed.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


WAITING_SUPPLIERS_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 45 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ----------------------------------------------------------- TPC-H Q15 ---
def top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the supplier(s) achieving the maximum — the classic
    view + scalar-max + join-back. One lineitem aggregate feeds both the
    per-supplier rows and the 1-row max (broadcast), so the fact scans
    once; revenue is rounded to 2 dp BEFORE the max/equality compare so
    the float-sum tie surface is deterministic across engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue_sum("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------- TPC-H Q22 ---
def dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): customers in a
    nation-key band holding above-average positive balances who have
    not ordered RECENTLY — scalar subquery (the positive-balance average)
    as a broadcast 1-row cross join, the NOT EXISTS as a left-anti hash
    join on custkey, grouped by nation key. Two testdata adaptations,
    same plan shape: customer has no phone column, so the country-code
    substring becomes c_nationkey directly; and every customer in this
    generator has at least one order, so "never ordered" is restated as
    "no order since 1999-01-01" (the date filter pushes to the orders
    scan below the anti-join)."""
    CUT = "1999-01-01"
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    # the threshold is a KNIFE-EDGE membership test (c_acctbal > avg), so
    # the average must be engine-identical: exact decimal sum cast to
    # double, then one double division — a plain double avg() is
    # order-dependent and the two engines could disagree on borderline
    # rows at scale (same class as the _money_sum cent flip)
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "__avg_bal"
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(CUT))
        .select(F.col("o_custkey").alias("ok"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, F.col("c_custkey") == F.col("ok"), "leftanti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            _money_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("cntry")
    )


DORMANT_RICH_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS cntry,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey < 10
  AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                          / count(*)
                   FROM customer
                   WHERE c_acctbal > 0.0 AND c_nationkey < 10)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------- SCD Type 2 --
def scd2_customer_dim(spark, sf_dir):
    """SCD2 dimension maintenance over customer: the stored dimension is
    every customer current since epoch '1995-01-01'; the update batch
    (built in-query, identically in the oracle) moves customers with
    c_custkey % 7 == 0 to segment 'MOVED' and adds two brand-new keys at
    '2000-06-01'. Changed keys close + reopen, the c_custkey % 14 == 0
    half of a parallel no-op batch proves idempotence (same attrs →
    untouched), new keys insert. Output = the full versioned dimension."""
    from mbgspark.operators.scd import scd2_apply

    c = _t(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd_changed = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit("2000-06-01").alias("eff"),
    )
    upd_same = c.filter(F.col("c_custkey") % 14 == 1).select(
        "c_custkey", "c_mktsegment", F.lit("2000-06-01").alias("eff")
    )
    upd_new = spark.range(2).select(
        (F.col("id") + 9000000).alias("c_custkey"),
        F.lit("FRESH").alias("c_mktsegment"),
        F.lit("2000-06-01").alias("eff"),
    )
    updates = upd_changed.unionByName(upd_same).unionByName(upd_new)
    return scd2_apply(
        dim, updates, "c_custkey", ["c_mktsegment"], "eff"
    ).orderBy("c_custkey", "valid_from", F.col("valid_to").asc_nulls_last())


SCD2_SQL = """
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         '1995-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
  FROM customer
),
updates AS (
  SELECT c_custkey, 'MOVED' AS seg, '2000-06-01' AS eff
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, '2000-06-01'
  FROM customer WHERE c_custkey % 14 = 1
  UNION ALL
  SELECT 9000000 + g.i, 'FRESH', '2000-06-01'
  FROM (SELECT unnest(generate_series(0, 1)) AS i) g
),
j AS (
  SELECT coalesce(d.c_custkey, u.c_custkey) AS k,
         d.c_mktsegment AS old_seg, d.valid_from, d.valid_to,
         u.seg AS new_seg, u.eff,
         (u.eff IS NOT NULL
          AND (d.valid_from IS NULL
               OR d.c_mktsegment IS DISTINCT FROM u.seg)) AS changed
  FROM dim d FULL OUTER JOIN updates u USING (c_custkey)
)
SELECT k AS c_custkey, old_seg AS c_mktsegment, valid_from, valid_to
FROM j WHERE valid_from IS NOT NULL AND NOT changed
UNION ALL
SELECT k, old_seg, valid_from, eff
FROM j WHERE changed AND valid_from IS NOT NULL
UNION ALL
SELECT k, new_seg, eff, CAST(NULL AS VARCHAR)
FROM j WHERE changed
ORDER BY c_custkey, valid_from, valid_to NULLS LAST
"""


def scd2_asof_revenue(spark, sf_dir):
    """The SCD2 READ path: orders joined to the versioned customer
    dimension AS OF each order's date — revenue by the segment the
    customer was in WHEN THEY ORDERED, not the segment they hold today
    (the question SCD2 exists to answer). The versioned dim is built by
    the same scd2_apply fixture as scd2_customer_dim; the temporal match
    is a keyed equi-join plus a row-local validity-interval filter —
    never an interval theta-join, because versions of one key are what
    the interval bounds belong to."""
    from mbgspark.operators.scd import scd2_apply

    c = _t(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit("2000-06-01").alias("eff"),
    )
    versioned = scd2_apply(dim, upd, "c_custkey", ["c_mktsegment"], "eff")
    # validity bounds compared as DATEs: casting the ~|dim| version bounds
    # (to_date on the dim side) costs |versions| conversions, while the
    # earlier date_format(o_orderdate) cost a string ALLOCATION per fact
    # row; ts→date cast is integer arithmetic. Equivalent to the oracle's
    # yyyy-MM-dd string compare: both reduce to day granularity, and the
    # boundary cases (order ts ≥ midnight of valid_from, < midnight of
    # valid_to) decide identically.
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("od")
    )
    return (
        # the versioned dim is the BIG side here (full customer + extra
        # versions) — broadcast is AQE's call, not a hint (review r4)
        o.join(versioned, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.col("od") >= F.to_date("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("od") < F.to_date("valid_to")))
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            _money_sum("o_totalprice", "revenue"),
        )
        .orderBy("c_mktsegment")
    )


SCD2_ASOF_SQL = """
WITH versioned AS (
  SELECT c_custkey, c_mktsegment,
         '1995-01-01' AS valid_from,
         CASE WHEN c_custkey % 7 = 0 THEN '2000-06-01' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MOVED', '2000-06-01', CAST(NULL AS VARCHAR)
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT v.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
FROM orders o
JOIN versioned v ON o.o_custkey = v.c_custkey
WHERE strftime(o.o_orderdate, '%Y-%m-%d') >= v.valid_from
  AND (v.valid_to IS NULL OR strftime(o.o_orderdate, '%Y-%m-%d') < v.valid_to)
GROUP BY v.c_mktsegment
ORDER BY v.c_mktsegment
"""


JOINS: dict[str, tuple] = {
    "shipping_priority_top10": (shipping_priority_top10, SHIPPING_PRIORITY_SQL),
    "region_nation_revenue": (region_nation_revenue, REGION_NATION_SQL),
    "cube_flag_status": (cube_flag_status, CUBE_SQL),
    "dod_order_delta": (dod_order_delta, DOD_DELTA_SQL),
    "customer_period_sets": (customer_period_sets, PERIOD_SETS_SQL),
    "big_spenders_vs_avg": (big_spenders_vs_avg, BIG_SPENDERS_SQL),
    "exists_shipped_priority": (exists_shipped_priority, EXISTS_PRIORITY_SQL),
    "cust_order_histogram": (cust_order_histogram, CUST_HISTOGRAM_SQL),
    "spend_quartiles": (spend_quartiles, SPEND_QUARTILES_SQL),
    "daily_gapfill": (daily_gapfill, DAILY_GAPFILL_SQL),
    "top3_orders_per_segment": (top3_orders_per_segment, TOP3_PER_SEGMENT_SQL),
    "segment_revenue_share": (segment_revenue_share, SEGMENT_SHARE_SQL),
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "forecast_revenue": (forecast_revenue, FORECAST_REVENUE_SQL),
    "grouping_sets_status": (grouping_sets_status, GROUPING_SETS_SQL),
    "returned_item_customers": (returned_item_customers, RETURNED_CUSTOMERS_SQL),
    "promo_revenue_share": (promo_revenue_share, PROMO_SHARE_SQL),
    "volume_shipping": (volume_shipping, VOLUME_SHIPPING_SQL),
    "market_share": (market_share, MARKET_SHARE_SQL),
    "small_qty_revenue": (small_qty_revenue, SMALL_QTY_SQL),
    "large_orders": (large_orders, LARGE_ORDERS_SQL),
    "disjunctive_part_revenue": (disjunctive_part_revenue, DISJUNCTIVE_SQL),
    "trailing_30d_revenue": (trailing_30d_revenue, TRAILING_30D_SQL),
    "window_rank_features": (window_rank_features, WINDOW_RANK_SQL),
    "waiting_suppliers": (waiting_suppliers, WAITING_SUPPLIERS_SQL),
    "top_supplier": (top_supplier, TOP_SUPPLIER_SQL),
    "dormant_rich_customers": (dormant_rich_customers, DORMANT_RICH_SQL),
    "scd2_customer_dim": (scd2_customer_dim, SCD2_SQL),
    "scd2_asof_revenue": (scd2_asof_revenue, SCD2_ASOF_SQL),
}
