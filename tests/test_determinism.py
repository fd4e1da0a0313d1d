"""Engine-grade determinism: results must not depend on physical
parallelism. Every operator that claims partition-independence (hash
ordering, integer fixed-point, total output ordering) is run under a
different shuffle-partition count and must return byte-identical rows —
the property that lets the same code run on local[32] and a
1000-executor cluster and hash-match a single-threaded oracle."""

import pytest

from mbgspark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"

# Representative partition-sensitive shapes: LSH band joins, window-rank
# sampling, distributed ntile sharding, weighted interleave, star-graph
# components, salted aggregation.
QUERIES = [
    "dedup_minhash_lsh",
    "group_sample_per_lang",
    "corpus_shuffle_shards",
    "mixture_interleave",
    "dup_components",
    "salted_segment_revenue",
    "split_assign_counts",
]


def _rows(spark, name):
    df = CATALOG[name][0](spark, SF)
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name} result depends on shuffle partitioning"


# ---------------------------------------------------------------------------
# Exact-money precondition. catalog_core._money casts money doubles to
# DECIMAL(12,2) so group sums are associative and engine-identical at any
# scale (a double sum flipped a cent vs the oracle at sf1 —
# region_nation_revenue). The cast is only lossless if every money column
# really carries at most 2 fractional digits; pin that here so a future
# data generator change fails loudly instead of silently re-introducing
# order-dependent cents.
MONEY_COLUMNS = [
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
    ("events", "value"),
]


@pytest.mark.parametrize("table,col", MONEY_COLUMNS)
def test_money_columns_are_cent_precise(spark, table, col):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF}/{table}.parquet")
    if col not in df.columns:
        pytest.skip(f"{table}.{col} not in this generator's schema")
    # compare against the decimal round-trip, not value*100 arithmetic
    # (at 1e7 magnitude value*100 has its own representation error)
    bad = df.filter(
        F.col(col).cast("decimal(12,2)").cast("double") != F.col(col)
    ).count()
    assert bad == 0, f"{table}.{col}: {bad} rows are not 2-dp exact"
