"""Canonical schemas — SURVEY.md §1.

The reference's unit of data is a nested tweet document (dict-per-tweet,
schema-by-convention — src/resilient_scraper.py:916-934); we declare it as a
fixed StructType with nullable fields (dynamic-schema `$exists` checks become
IS NULL predicates). The flat analytics view (utils.py:204-222, notebook
cell 5) is the working DataFrame shape; ``nest_tweets`` / ``flatten_tweets``
below convert between the two (P1/P2, SURVEY §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# struct for a detected location (utils.py:607-630)
LOCATION_STRUCT = T.StructType(
    [
        T.StructField("province", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("detected_from", T.StringType()),
        T.StructField("original_location", T.StringType()),
    ]
)

# flat scrape record — extractor output (src/resilient_scraper.py:489-498;
# FIXTURES.md §1)
TWEET_RAW_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("scraped_at", T.TimestampType()),
        T.StructField("tweet_url", T.StringType()),
        T.StructField("author_handle", T.StringType()),
        T.StructField("author_name", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("reply_count", T.IntegerType()),
        T.StructField("retweet_count", T.IntegerType()),
        T.StructField("like_count", T.IntegerType()),
    ]
)

# nested stored document (src/resilient_scraper.py:916-934 + enrichment
# utils.py:113,146-149,187-196; FIXTURES.md §2)
TWEET_DOC_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField(
            "content",
            T.StructType(
                [
                    T.StructField("text", T.StringType()),
                    T.StructField("clean_text", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("author_name", T.StringType()),
                    T.StructField("author_handle", T.StringType()),
                    T.StructField("created_at", T.TimestampType()),
                    T.StructField("scraped_at", T.TimestampType()),
                    T.StructField("location", LOCATION_STRUCT),
                    T.StructField("tweet_url", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "metrics",
            T.StructType(
                [
                    T.StructField("reply_count", T.IntegerType()),
                    T.StructField("retweet_count", T.IntegerType()),
                    T.StructField("like_count", T.IntegerType()),
                ]
            ),
        ),
        T.StructField(
            "sentiment_analysis",
            T.StructType(
                [
                    T.StructField("label", T.StringType()),
                    T.StructField("confidence_score", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "processing_status",
            T.StructType(
                [
                    T.StructField("sentiment_analyzed", T.BooleanType()),
                    T.StructField("cleaning_completed", T.BooleanType()),
                ]
            ),
        ),
        # root-level duplicate of metadata.location (utils.py:143,539-542)
        T.StructField("location", LOCATION_STRUCT),
    ]
)

def nest_tweets(flat: DataFrame) -> DataFrame:
    """P2 (src/resilient_scraper.py:916-934): flat scrape/enriched record →
    nested stored document via ``F.struct`` constructors. Missing enrichment
    columns (clean_text, sentiment, location struct fields) become nulls —
    the StructType twin of the reference's schema-by-convention dicts."""
    cols = set(flat.columns)

    def opt(name: str, dtype: str = "string") -> F.Column:
        c = F.col(name) if name in cols else F.lit(None).cast(dtype)
        return c.alias(name)

    return flat.select(
        F.col("_id"),
        F.struct(opt("text"), opt("clean_text")).alias("content"),
        F.struct(
            opt("author_name"),
            opt("author_handle"),
            opt("created_at", "timestamp"),
            opt("scraped_at", "timestamp"),
            F.struct(
                opt("province"),
                opt("city"),
                opt("detected_from"),
                opt("original_location"),
            ).alias("location"),
            opt("tweet_url"),
        ).alias("metadata"),
        F.struct(
            opt("reply_count", "int"),
            opt("retweet_count", "int"),
            opt("like_count", "int"),
        ).alias("metrics"),
        F.struct(
            opt("sentiment_label").alias("label"),
            opt("confidence_score", "double"),
        ).alias("sentiment_analysis"),
        F.struct(
            opt("sentiment_analyzed", "boolean"),
            opt("cleaning_completed", "boolean"),
        ).alias("processing_status"),
        # root-level duplicate of metadata.location (utils.py:143,539-542)
        F.struct(
            opt("province"),
            opt("city"),
            opt("detected_from"),
            opt("original_location"),
        ).alias("location"),
    )


def flatten_tweets(docs: DataFrame) -> DataFrame:
    """P1 (utils.py:204-222, notebook cell 5): nested doc → 12-leaf flat
    analytics row, with the reference's defaults for missing fields
    (`get(..., '')/0/0.0/False`) via coalesce."""
    return docs.select(
        F.col("_id"),
        F.coalesce("content.text", F.lit("")).alias("text"),
        F.coalesce("content.clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("metadata.author_handle", F.lit("")).alias("author_handle"),
        F.col("metadata.created_at").alias("created_at"),
        F.coalesce("metadata.tweet_url", F.lit("")).alias("tweet_url"),
        F.coalesce("metrics.reply_count", F.lit(0)).alias("reply_count"),
        F.coalesce("metrics.retweet_count", F.lit(0)).alias("retweet_count"),
        F.coalesce("metrics.like_count", F.lit(0)).alias("like_count"),
        F.coalesce("sentiment_analysis.label", F.lit("")).alias("sentiment_label"),
        F.coalesce("sentiment_analysis.confidence_score", F.lit(0.0)).alias(
            "sentiment_confidence"
        ),
        F.coalesce("processing_status.sentiment_analyzed", F.lit(False)).alias(
            "sentiment_analyzed"
        ),
    )


# location dimension (config/indonesia_locations.json exploded per
# utils.py:364; FIXTURES.md §3) — dict_order pins first-match iteration order
LOCATIONS_DIM_SCHEMA = T.StructType(
    [
        T.StructField("province", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("dict_order", T.IntegerType(), False),
        # alias rows (jaksel→jakarta selatan etc., utils.py:384-394) carry
        # the surface form in `term`; canonical rows have term == city
        T.StructField("term", T.StringType(), False),
    ]
)

# default location dimension: the reference's hard-coded 5-province fallback
# (utils.py:311-317) + the abbreviation aliases (utils.py:384-394)
DEFAULT_LOCATIONS = [
    # (province, city, dict_order, term)
    ("dki jakarta", "jakarta pusat", 1, "jakarta pusat"),
    ("dki jakarta", "jakarta selatan", 2, "jakarta selatan"),
    ("dki jakarta", "jakarta selatan", 3, "jaksel"),
    ("dki jakarta", "jakarta utara", 4, "jakarta utara"),
    ("jawa barat", "bandung", 5, "bandung"),
    ("jawa barat", "bandung", 6, "bdg"),
    ("jawa barat", "bekasi", 7, "bekasi"),
    ("jawa tengah", "semarang", 8, "semarang"),
    ("jawa tengah", "semarang", 9, "smg"),
    ("jawa timur", "surabaya", 10, "surabaya"),
    ("jawa timur", "surabaya", 11, "sby"),
    ("sumatera utara", "medan", 12, "medan"),
]
