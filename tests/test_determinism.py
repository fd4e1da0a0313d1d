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
