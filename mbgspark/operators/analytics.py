"""Aggregation / analytics layer — SURVEY.md §2.6–§2.8 (A1–A8, O1–O6, U1–U3).

These feed the reference's dashboard surface (README.md:84-94): sentiment
distribution, trends over time, per-region breakdowns, engagement stats,
top-k tokens.  Everything is declarative groupBy/agg/window — partial
aggregation (map-side combine) and AQE coalescing come free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frequency(df: DataFrame, col: str) -> DataFrame:
    """A3 value_counts (notebook cells 11/15): deterministic order."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
    )


def conditional_rollup(df: DataFrame, preds: dict[str, Column]) -> DataFrame:
    """A5 single-pass multi-predicate counts
    (fix_unprocessed_monthly_tweets.py:204-211)."""
    return df.agg(
        *[F.sum(F.when(p, 1).otherwise(0)).cast("bigint").alias(name) for name, p in preds.items()]
    )


def monthly_rollup(
    df: DataFrame, ts_col: str, aggs: list[Column]
) -> DataFrame:
    """A7/T5: month partition rollup (utils.py:225-253)."""
    return (
        df.groupBy(F.date_trunc("month", F.col(ts_col)).alias("month"))
        .agg(*aggs)
        .orderBy("month")
    )


def daily_trend(df: DataFrame, ts_col: str, category_col: str) -> DataFrame:
    """A8 trend: per-day × category counts."""
    return (
        df.groupBy(
            F.to_date(F.col(ts_col)).alias("day"), F.col(category_col)
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("day", category_col)
    )


def top_k_tokens(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """A8 top keywords: explode(split(lower(text))) → count → top-k with total
    tie-break. At scale this is the classic skew-prone agg — partial
    aggregation handles it; the final top-k is a tiny sorted limit."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )
