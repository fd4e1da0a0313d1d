"""Declared correctness query set Q1–Q28 (SURVEY.md §2.11).

Each entry: a Spark builder ``(spark, sf_dir) -> DataFrame`` and the
equivalent ANSI SQL for the DuckDB oracle. Contract rules (driver compare is
column-name keyed + value-hash):

- every computed column aliased IDENTICALLY in Spark and SQL;
- every output totally ordered (deterministic tie-breaks);
- money sums computed EXACTLY in DECIMAL(12,2) on both engines
  (``_money_sum`` below — rounding a double sum is NOT enough once a
  group's total passes ~1e9, see the comment at ``_MONEY``); other float
  aggregates rounded (4 dp ratios/avgs) in BOTH engines so fp summation
  order can't flip the hash;
- int-typed computed columns cast to bigint (DuckDB length/count are BIGINT);
- builders never assume session config: UTC + legacy-cast semantics are
  pinned per-call (the driver owns the SparkSession).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mbgspark.functions.cleaning import clean_for_analysis
from mbgspark.functions.lexicon import with_lexicon_sentiment
from mbgspark.io import load_table
from mbgspark.operators.analytics import daily_trend, frequency, top_k_tokens
from mbgspark.operators.locate import containment_join_first_match, fuzzy_top1_join


# re-exported for backward compatibility; implementation lives in session.py
from mbgspark.session import ensure_session_conf  # noqa: E402,F401


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_conf(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Exact money sums. A DOUBLE sum is order-dependent; once a group's sum
# reaches ~1e9 the accumulated error (~1e-4..1e-3) is within reach of the
# round(.., 2) half-cent boundary — observed as a one-cent flip vs the
# DuckDB oracle at sf1 (region_nation_revenue, NATION_12: ..50.04 vs
# ..50.05). Money columns in the testdata are cent-precise
# (tests/test_determinism.py pins this), so the decimal cast is lossless, and
# decimal sums are associative: any partitioning/AQE re-plan yields the
# same cents on both engines at any scale. The result is cast back to
# DOUBLE so the driver's typed-hash contract (money columns are double)
# is unchanged.
_MONEY = "decimal(12,2)"


def _money(col):
    """Lossless DECIMAL(12,2) view of a cent-precise money column."""
    return F.col(col).cast(_MONEY)


def _money_sum(col, alias, nd=2):
    """round(sum(money), nd) computed exactly in decimal, output DOUBLE."""
    return F.round(F.sum(_money(col)), nd).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Q1 scan + project (S1-S3, P1)
# NOTE on corpus-sized outputs and ORDER BY: queries whose output is one
# row per input row (q1, q22, q24, gopher_quality, ...) carry NO global
# sort, in Spark or oracle. Two reasons, both measured (SCALE.md r7):
# a total order over a corpus-sized result is an anti-pattern at 100 TB
# (single range-partitioned write wave for presentation nobody consumes),
# and Spark's global-sort range sampler RE-EXECUTES a scan-fed child to
# pick boundaries — for expression-heavy row-local projections that
# doubles the whole query (gopher at sf1: 4.1 s sorted vs 1.9 s unsorted).
# The driver's value-hash is order-insensitive (18 unordered catalog
# queries green across r1-r6), as is tools/parity.py. Queries whose
# ORDER is semantic (q14/q17 date order = SURVEY O1, top-k rows) keep it
# — their sort children are post-shuffle aggregates, which AQE
# materializes before sampling, so they never re-execute anyway.
def q1(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


Q1_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
"""

# Q2 half-open date window (F1, T7) — resilient_etl.py:306-311
D0, D1 = "1996-01-01", "1998-01-01"


def q2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit(D0)) & (F.col("o_orderdate") < F.lit(D1))
    ).agg(F.count("*").alias("cnt"))


Q2_SQL = f"""
SELECT count(*) AS cnt FROM orders
WHERE o_orderdate >= TIMESTAMP '{D0}' AND o_orderdate < TIMESTAMP '{D1}'
"""


# Q3 null/missing-field predicate (F2) — fix_unprocessed:96-111.
# Testdata has no physically-null columns, so the missing-field shape is
# exercised on a derived nullable: regexp miss → NULLIF '' → NULL.
def q3(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    extracted = F.nullif(F.regexp_extract(F.col("text"), r"\bspark\b", 0), F.lit(""))
    return d.agg(
        F.sum(F.when(extracted.isNull(), 1).otherwise(0)).cast("bigint").alias("missing_cnt"),
        F.count("*").alias("total_cnt"),
    )


Q3_SQL = r"""
SELECT CAST(sum(CASE WHEN NULLIF(regexp_extract(text, '\bspark\b'), '') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS missing_cnt,
       count(*) AS total_cnt
FROM documents
"""


# Q4 min-length text filter (F3, C13) — resilient_scraper.py:399
def q4(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.length(F.trim(F.col("text"))) >= 200).agg(
        F.count("*").alias("cnt")
    )


Q4_SQL = """
SELECT count(*) AS cnt FROM documents WHERE length(trim(text)) >= 200
"""

# Q5 keyword OR-search (F4, C6-C7) — the 5-query OR-composition over one scan
KEYWORD_RE = "spark|stream|vector"


def q5(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.lower(F.col("text")).rlike(KEYWORD_RE)).agg(
        F.count("*").alias("cnt")
    )


Q5_SQL = f"""
SELECT count(*) AS cnt FROM documents WHERE regexp_matches(lower(text), '{KEYWORD_RE}')
"""


# Q6 keyword AND membership compound (F5) — resilient_scraper.py:216,255
def q6(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        F.lower(F.col("text")).rlike(KEYWORD_RE) & F.col("lang").isin("en", "fr")
    ).agg(F.count("*").alias("cnt"))


Q6_SQL = f"""
SELECT count(*) AS cnt FROM documents
WHERE regexp_matches(lower(text), '{KEYWORD_RE}') AND lang IN ('en','fr')
"""


# Q7 dedup by key (D1) — dropDuplicates([_id]) ≅ count distinct key
def q7(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select("o_custkey").dropDuplicates(["o_custkey"]).agg(
        F.count("*").alias("distinct_custs")
    )


Q7_SQL = """
SELECT count(DISTINCT o_custkey) AS distinct_custs FROM orders
"""


# Q8 dedup by normalized text (D2, M1, C5-C6)
def q8(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.lower(F.trim(F.col("text"))).alias("norm"))
        .dropDuplicates(["norm"])
        .agg(F.count("*").alias("distinct_texts"))
    )


Q8_SQL = """
SELECT count(DISTINCT lower(trim(text))) AS distinct_texts FROM documents
"""


# Q9 keep-latest-per-key (D3) — the upsert analog, resilient_scraper.py:944-951
def q9(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


Q9_SQL = """
SELECT user_id, event_id, ts, event_type FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""

# Q10 broadcast containment join, first-match-wins (J1) — utils.py:336-437.
# Keyword dim plays the (province, city) dictionary; dict_order pins the
# reference's iteration-order tie-break (SURVEY §7 risk register).
KEYWORD_DIM = [("spark", 1), ("stream", 2), ("vector", 3), ("window", 4), ("join", 5)]
KEYWORD_DIM_SQL = "(VALUES " + ", ".join(f"('{k}', {o})" for k, o in KEYWORD_DIM) + ") AS dim(kw, dict_order)"


def q10(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    dim = spark.createDataFrame(KEYWORD_DIM, "kw string, dict_order int")
    return (
        containment_join_first_match(
            d, dim, "doc_id", "text", "kw", explode_tokens=True
        )
        .select("doc_id", "kw", "dict_order")
        .orderBy("doc_id")
    )


Q10_SQL = f"""
SELECT doc_id, kw, dict_order
FROM documents CROSS JOIN {KEYWORD_DIM_SQL}
WHERE list_contains(string_split(lower(text), ' '), kw)
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY dict_order) = 1
ORDER BY doc_id
"""


# Q11 similarity top-1 (J2, O4) — levenshtein arg-max, utils.py:440-492
def q11(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    left = n.select(F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a"))
    right = n.select(F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("match_name"))
    scored = (
        left.crossJoin(F.broadcast(right))
        .filter(F.col("key_a") != F.col("key_b"))
        .withColumn(
            "lev_dist", F.levenshtein(F.col("name_a"), F.col("match_name")).cast("bigint")
        )
    )
    w = Window.partitionBy("name_a").orderBy(F.asc("lev_dist"), F.asc("match_name"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("name_a").alias("n_name"), "match_name", "lev_dist")
        .orderBy("n_name")
    )


Q11_SQL = """
SELECT name_a AS n_name, match_name, lev_dist FROM (
  SELECT a.n_name AS name_a, b.n_name AS match_name,
         CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS lev_dist
  FROM nation a CROSS JOIN nation b
  WHERE a.n_nationkey <> b.n_nationkey
  QUALIFY row_number() OVER (PARTITION BY a.n_name ORDER BY lev_dist, b.n_name) = 1
)
ORDER BY n_name
"""


# Q12 equi-join (J3) — orders ⋈ customer
def q12(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


Q12_SQL = """
SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


# Q13 counts + filtered counts (A1-A2)
def q13(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("total_cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("bigint").alias("open_cnt"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).cast("bigint").alias("urgent_cnt"),
    )


Q13_SQL = """
SELECT count(*) AS total_cnt,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_cnt
FROM orders
"""


# Q14 frequency / value_counts (A3, O1) — notebook cells 11/15
def q14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return frequency(li, "l_returnflag")


Q14_SQL = """
SELECT l_returnflag, count(*) AS cnt FROM lineitem
GROUP BY l_returnflag ORDER BY cnt DESC, l_returnflag
"""


# Q15 avg/min/max (A4) — notebook cell 15
def q15(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


Q15_SQL = """
SELECT round(avg(l_extendedprice), 4) AS avg_price,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem
"""


# Q16 single-pass conditional rollup (A5) — fix_unprocessed:204-211
def q16(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("bigint").alias("cnt_f"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).cast("bigint").alias("cnt_p"),
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).cast("bigint").alias("cnt_high"),
    )


Q16_SQL = """
SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p,
       CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_high
FROM orders
"""


# Q17 monthly rollup (A7, U1, T5) — utils.py:225-253
def q17(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count("*").alias("cnt"),
            _money_sum("o_totalprice", "sum_price"),
        )
        .orderBy("month")
    )


Q17_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS cnt,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1 ORDER BY 1
"""


# Q18 daily trend (A8) — per-day × category counts
def q18(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return daily_trend(e, "ts", "event_type")


Q18_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS cnt
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# Q18r per-region rollup (A8) — region ⋈ nation ⋈ customer ⋈ orders
def q18r(spark, sf_dir):
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("order_cnt"),
            _money_sum("o_totalprice", "revenue"),
        )
        .orderBy("r_name")
    )


Q18R_SQL = """
SELECT r_name, count(*) AS order_cnt,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# Q19 token top-k (A8, O2) — explode/split/group/limit
def q19(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return top_k_tokens(d, "text", k=20)


Q19_SQL = """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY cnt DESC, token LIMIT 20
"""


# Q20 union of filtered scans + dedup by key (U2)
def q20(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return a.union(b).dropDuplicates(["o_orderkey"]).orderBy("o_orderkey")


Q20_SQL = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
UNION
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY o_orderkey
"""


# Q21 anti-join (U3, F6) — customers with no orders in a recent window
# (every customer has *some* order in the synthetic data, so the plain
# anti-join would be trivially empty; windowing keeps the result non-trivial)
def q21(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q21_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
)
ORDER BY c_custkey
"""


# Q22 cleaning regex chain (C1-C6) — utils.py:28-50 analytics cleaner over a
# synthesized raw string (URL + mention + hashtag injected around the text).
def q22(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("#Intro "),
        F.col("text"),
        F.lit(" @user http://example.com/"),
        F.col("doc_id").cast("string"),
    )
    # no global sort: corpus-sized row-local output (see q1 note)
    return d.select("doc_id", clean_for_analysis(raw).alias("clean_text"))


Q22_SQL = r"""
SELECT doc_id,
       lower(trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace('#Intro ' || text || ' @user http://example.com/' || CAST(doc_id AS VARCHAR),
                            'http\S+|www\S+', '', 'g'),
             '@\w+', '[MENTION]', 'g'),
           '#\w+', '[HASHTAG]', 'g'),
         '\s+', ' ', 'g'))) AS clean_text
FROM documents
"""


# Q23 digit extraction (C11) — resilient_scraper.py:467-477
def q23(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    digits = F.expr(r"try_cast(regexp_extract(props, '\\d+', 0) AS bigint)")
    return e.agg(F.sum(digits).cast("bigint").alias("digit_sum"), F.count("*").alias("cnt"))


Q23_SQL = r"""
SELECT CAST(sum(TRY_CAST(regexp_extract(props, '\d+') AS BIGINT)) AS BIGINT) AS digit_sum,
       count(*) AS cnt
FROM events
"""


# Q24 calendar functions (T1-T6) — last_day / trunc / date_add / datediff /
# date_format, projected per order
def q24(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        od.alias("od"),
        F.trunc(od, "month").alias("month_start"),
        F.last_day(od).alias("month_end"),
        F.date_add(od, 7).alias("next_week"),
        F.datediff(od, F.trunc(od, "month")).cast("bigint").alias("days_into_month"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("ymd"),
    )  # no global sort: corpus-sized row-local output (see q1 note)


Q24_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS od,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS DATE) AS next_week,
       datediff('day', CAST(date_trunc('month', o_orderdate) AS DATE),
                CAST(o_orderdate AS DATE)) AS days_into_month,
       strftime(o_orderdate, '%Y%m%d') AS ymd
FROM orders
"""


# Q25 deterministic LIMIT + substring (O2, O5-O6)
def q25(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.substring("o_orderpriority", 1, 3).alias("prio3"),
        )
    )


Q25_SQL = """
SELECT o_orderkey, o_totalprice, substr(o_orderpriority, 1, 3) AS prio3
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# Q26 deterministic lexicon sentiment (X1 fallback) — label distribution
def q26(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = with_lexicon_sentiment(d, "text")
    return (
        scored.groupBy("label")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("confidence_score"), 4).alias("avg_conf"))
        .orderBy("label")
    )


Q26_SQL = """
WITH toks AS (
  SELECT string_split(lower(trim(substr(text, 1, 512))), ' ') AS t FROM documents
), scored AS (
  SELECT len(list_filter(t, x -> x IN ('fast','big','vector','spark'))) AS pos_hits,
         len(list_filter(t, x -> x IN ('slow','small','dup','error'))) AS neg_hits,
         len(t) AS total_tokens
  FROM toks
), labeled AS (
  SELECT CASE WHEN total_tokens <= 0 THEN 'neutral'
              WHEN pos_hits > neg_hits THEN 'positive'
              WHEN pos_hits < neg_hits THEN 'negative'
              ELSE 'neutral' END AS label,
         round(CASE WHEN total_tokens <= 0 THEN 0.0
                    ELSE (pos_hits + neg_hits) / CAST(total_tokens AS DOUBLE) END, 4)
           AS confidence_score
  FROM scored
)
SELECT label, count(*) AS cnt, round(avg(confidence_score), 4) AS avg_conf
FROM labeled GROUP BY label ORDER BY label
"""


# Q27 tumbling 1-day event-time window (X6-X7) — late rows land in their
# event-time window regardless of arrival order
def q27(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("cnt"), _money_sum("value", "sum_value"))
        .select(F.col("w.start").alias("day_start"), "cnt", "sum_value")
        .orderBy("day_start")
    )


Q27_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, count(*) AS cnt,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1 ORDER BY 1
"""


# Q28 cross-micro-batch dedup (X8) — two overlapping "batches" unioned then
# deduped by key, the batch equivalent of dropDuplicates on a stream
def q28(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    b1 = e.filter(F.col("event_id") % 2 == 0)
    b2 = e.filter(F.col("event_id") % 3 == 0)
    return (
        b1.unionByName(b2)
        .dropDuplicates(["event_id"])
        .agg(F.count("*").alias("cnt"))
    )


Q28_SQL = """
SELECT count(DISTINCT event_id) AS cnt FROM events
WHERE event_id % 2 = 0 OR event_id % 3 = 0
"""

CORE: dict[str, tuple] = {
    "q1": (q1, Q1_SQL), "q2": (q2, Q2_SQL), "q3": (q3, Q3_SQL), "q4": (q4, Q4_SQL),
    "q5": (q5, Q5_SQL), "q6": (q6, Q6_SQL), "q7": (q7, Q7_SQL), "q8": (q8, Q8_SQL),
    "q9": (q9, Q9_SQL), "q10": (q10, Q10_SQL), "q11": (q11, Q11_SQL),
    "q12": (q12, Q12_SQL), "q13": (q13, Q13_SQL), "q14": (q14, Q14_SQL),
    "q15": (q15, Q15_SQL), "q16": (q16, Q16_SQL), "q17": (q17, Q17_SQL),
    "q18": (q18, Q18_SQL), "q18r": (q18r, Q18R_SQL), "q19": (q19, Q19_SQL),
    "q20": (q20, Q20_SQL), "q21": (q21, Q21_SQL), "q22": (q22, Q22_SQL),
    "q23": (q23, Q23_SQL), "q24": (q24, Q24_SQL), "q25": (q25, Q25_SQL),
    "q26": (q26, Q26_SQL), "q27": (q27, Q27_SQL), "q28": (q28, Q28_SQL),
}
