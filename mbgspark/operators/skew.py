"""Skew mitigation for large-scale joins/aggregations.

At 100 TB a handful of hot keys (one viral tweet id, one dominant date,
one empty-string location) can pin a whole stage on one task. Two levers,
complementary to AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py):

- ``salted_join``: explicit salting for shuffle equi-joins where AQE can't
  help (e.g. the build side is too large to broadcast but small enough to
  replicate ×S). Fact rows get a deterministic salt in [0, S); the build
  side is exploded ×S; the join key becomes (key, salt), spreading each hot
  key over S tasks. Deterministic (hash of the row's own key column, never
  rand()) so retries/replays stay idempotent.
- ``salted_count_distinct``: two-stage distinct aggregation — partial
  distinct per (key, salt) then re-aggregate per key — for skewed
  count-distinct where a single reducer would otherwise hold the whole
  hot key's value set. Plain count/sum/avg don't need this: Spark's
  hash-aggregate already does map-side partials.

MEASURED ORDER OF PREFERENCE (tools/key_skew_octave.py, SCALE.md r10:
one custkey holding 50% of orders rows, best-of-2, checksummed
identical results). At 59.4M fact rows / 29.7M hot / 1.485M-row build
(too big for the 10 MB auto-broadcast): broadcast-hint 2.3 s <
**AQE-skew-split 5.7 s** < plain SMJ 15.8 s < salted_join(16) 22.1 s;
at 14.85M/7.4M the straggler doesn't yet dominate and AQE ≈ plain
(3.5/3.7 s) with salted still ×2.8 worse. Count-distinct under the
same 50%-hot group key: plain 6.3 s < salted 8.6 s — Spark's
Expand-based two-phase distinct already spreads the hot group across
the (group, value) shuffle. So the engine's DEFAULT stance (pinned in
test_skew.py): broadcast when the build legally fits, otherwise trust
AQE's skew split (on in every get_spark session); reach for
``salted_join`` only where AQE's split cannot apply — a join whose
output partitioning must be preserved for a downstream stage, or a
non-SMJ/SHJ path — and expect to PAY the ×S build replication for it.
``salted_count_distinct`` earns its keep only when the per-(group,
value) pair set itself overwhelms a reducer, not at any shape measured
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, buckets: int, out: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) derived from the key value itself
    (replay-safe, unlike rand())."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)).cast("int"))


def explode_to_salts(df: DataFrame, buckets: int, out: str = "__salt") -> DataFrame:
    """Replicate every row once per salt bucket (the build side of a salted
    join). Row count multiplies by ``buckets`` — size the build side
    accordingly."""
    return df.withColumn(
        out, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(out, F.col(out).cast("int"))


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ build ON fact.on = build.on`` with each fact key
    spread over ``buckets`` shuffle partitions. For the supported join types
    the result is identical to the plain join (salt columns are dropped);
    only the physical distribution changes.

    Fact-preserving joins only: the build side is replicated once per salt
    bucket, so right/full outer would emit every unmatched build row
    ``buckets`` times — rejected rather than silently wrong."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched build rows "
            f"x{buckets}; supported: {sorted(allowed)}"
        )
    f = with_salt(fact, on, buckets)
    b = explode_to_salts(build, buckets)
    return f.join(b, on=[on, "__salt"], how=how).drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, buckets: int = 8
) -> DataFrame:
    """count(DISTINCT distinct_col) GROUP BY group_col, skew-resistant:
    stage 1 dedups within (group, salt-of-value); stage 2 sums partial
    distinct counts. Exact (each distinct value lands in exactly one salt
    bucket because the salt is a hash of the value itself)."""
    salted = with_salt(df, distinct_col, buckets)
    partial = (
        salted.select(group_col, "__salt", distinct_col)
        .distinct()
        .groupBy(group_col, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("__partial").cast("bigint").alias(f"distinct_{distinct_col}")
    )
