"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship per-region revenue rollup on sf0.001.
queries()    — every implemented operator from SURVEY.md §2.11 (q1–q28) plus
               the north-star extension suite (dedup / similarity search /
               text analysis / multimodal plumbing).
oracle_sql() — matching DuckDB SQL per query (omitted only for intentionally
               approximate ops → rows-only check).

Implementation lives in the ``mbgspark`` package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mbgspark.plans.catalog import oracle_sql_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-region order-count + revenue rollup
    (region ⋈ nation ⋈ customer ⋈ orders, broadcast dims) on sf0.001."""
    from mbgspark.plans.catalog_core import q18r

    return q18r(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
