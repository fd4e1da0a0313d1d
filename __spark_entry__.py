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
    """Flagship query: the full §3.1 ETL lifecycle (clean → broadcast
    containment locate → lexicon label → event-date rollup) on sf0.001 —
    the reference's run_etl re-expressed as one declarative lineage."""
    from mbgspark.plans.catalog_lifecycle import etl_lifecycle

    return etl_lifecycle(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
