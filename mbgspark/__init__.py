"""mbgspark — a PySpark-native analytics engine re-expressing the query and
data-processing semantics of the reference ETL pipeline
(`syahrul-kustiawan-alzayyan/ETL-Automation-Web-Scraping-MBG`) as idiomatic
Spark: DataFrame/SQL + Catalyst + Structured Streaming.

Layout (SURVEY.md §7):
  session    — SparkSession factory (UTC, AQE, Arrow, shuffle sizing)
  io         — readers/writers for the partitioned store + testdata catalog
  functions  — scalar layers: cleaning regex chains, calendar, lexicon sentiment
  operators  — dedup, containment/fuzzy location join, analytics aggregations,
               similarity search, text stats, multimodal plumbing
  plans      — the declared query set (SURVEY.md §2.11) + DuckDB oracles
  sources    — ingest boundary (scrape-record parsing, from_json)
  streaming  — Structured Streaming parity (watermark, dedup, foreachBatch merge)
  pipeline   — end-to-end lifecycles (clean → locate → label → merge)
"""

from mbgspark.io import (
    compact_store,
    load_table,
    merge_by_key,
    register_views,
    write_partitioned,
)
from mbgspark.pipeline import reprocess, run_etl
from mbgspark.session import cluster_profile, ensure_session_conf, get_spark

__all__ = [
    "cluster_profile",
    "compact_store",
    "ensure_session_conf",
    "get_spark",
    "load_table",
    "merge_by_key",
    "register_views",
    "reprocess",
    "run_etl",
    "write_partitioned",
]
__version__ = "0.1.0"
