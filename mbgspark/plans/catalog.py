"""Unified query catalog: SURVEY.md §2.11 core set (Q1–Q28) + north-star
extensions (dedup suite, similarity search, text analysis, multimodal).

``CATALOG[name] = (builder, oracle_sql | None)`` — builder signature is the
driver contract ``(spark, sf_dir) -> DataFrame``; ``None`` oracle means the
driver records a rows-only check (intentionally approximate / non-SQL ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mbgspark.plans.catalog_core import CORE
from mbgspark.plans.catalog_ext import EXT
from mbgspark.plans.catalog_joins import JOINS
from mbgspark.plans.catalog_lifecycle import LIFECYCLE

CATALOG: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    **CORE,
    **EXT,
    **JOINS,
    **LIFECYCLE,
}


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: builder for name, (builder, _) in CATALOG.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: sql for name, (_, sql) in CATALOG.items() if sql is not None}
