"""Ingest boundary — SURVEY.md §2.1 S5/S6, §3.2.

The reference's extract stage (Selenium scroll loop,
src/resilient_scraper.py:302-374) is external to the engine (north-star:
scraping stays a non-Spark producer). The engine's ingest contract is the
flat scrape record (S6, :376-502) landing as JSON/parquet micro-batch files;
this module is the Spark-side parse + hygiene:

- S6 record parse: ``from_json`` against TWEET_RAW_SCHEMA.
- C11 metric parse: button text like "3 replies" → int
  (resilient_scraper.py:467-477).
- F3 min-length filter (:399), F7 noise filter (:410,544).
- D1/D2 ingest dedup (:55-56,352-358).
- T2/T8 timestamps: ISO parse; scraped_at defaulted to now (:451-455).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbgspark.functions.cleaning import clean_at_ingest
from mbgspark.schema import TWEET_RAW_SCHEMA


def search_url(query: F.Column) -> F.Column:
    """C12 (the last SURVEY §2 gap): the reference's search-URL encoding —
    exactly the three character replacements it performs (' '→%20, ':'→%3A,
    ','→%2C; resilient_scraper.py:274) wrapped in its URL template (:275).
    Deliberately NOT url_encode(): the reference's scheme leaves every other
    reserved character bare, and fidelity beats RFC-compliance here. A pure
    column expression, usable on a DataFrame of per-day query strings (the
    batch analog of the scraper's per-date loop)."""
    enc = F.replace(
        F.replace(
            F.replace(query, F.lit(" "), F.lit("%20")), F.lit(":"), F.lit("%3A")
        ),
        F.lit(","),
        F.lit("%2C"),
    )
    return F.concat(
        F.lit("https://x.com/search?q="), enc, F.lit("&src=typed_query&f=live")
    )


def daily_search_query(
    base_query: str, date_col: F.Column
) -> F.Column:
    """The date-windowed search query (build_search_query,
    resilient_scraper.py:146-180 core): base query + since/until bounds of
    one day — since = the date, until = the next day."""
    return F.concat(
        F.lit(f"{base_query} since:"),
        F.date_format(date_col, "yyyy-MM-dd"),
        F.lit(" until:"),
        F.date_format(F.date_add(date_col, 1), "yyyy-MM-dd"),
    )


def parse_metric_counts(raw: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """C11: extract leading digits from metric button text → int, 0 default
    (resilient_scraper.py:467-477)."""
    for c in cols:
        raw = raw.withColumn(
            c,
            F.coalesce(
                F.expr(
                    f"try_cast(regexp_extract(cast({c} as string), '\\\\d+', 0) as int)"
                ),
                F.lit(0),
            ),
        )
    return raw


def ingest_raw_records(json_lines: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse raw JSON-line scrape records into the typed flat schema and
    apply the reference's ingest hygiene in declarative form.

    Works identically on a batch DataFrame or a streaming source — it is a
    pure column pipeline (usable under readStream)."""
    parsed = json_lines.select(
        F.from_json(F.col(json_col), TWEET_RAW_SCHEMA).alias("r")
    ).select("r.*")
    return (
        parsed
        # F3: drop too-short texts (resilient_scraper.py:399)
        .filter(F.length(F.trim(F.col("text"))) >= 5)
        # F7: drop photo/video permalinks misparsed as tweets (:410)
        .filter(
            F.col("tweet_url").isNull()
            | ~F.col("tweet_url").rlike("/(photo|video)/")
        )
        # T8: scraped_at fallback to ingest time (:453-455)
        .withColumn("scraped_at", F.coalesce("scraped_at", F.current_timestamp()))
        # ingest-variant cleaning (C2/C4 keep-word, :868-889)
        .withColumn("clean_text", F.lower(clean_at_ingest(F.col("text"))))
    )


def dedup_ingest_batch(df: DataFrame) -> DataFrame:
    """D1 + D2 in one pass: first by id, then by normalized-text key, the
    same cascade as resilient_scraper.py:352-358."""
    return (
        df.dropDuplicates(["_id"])
        .withColumn("__tkey", F.xxhash64(F.lower(F.trim("text"))))
        .dropDuplicates(["__tkey"])
        .drop("__tkey")
    )


def parse_with_quarantine(
    spark,
    path_or_glob: str,
    schema=None,
) -> tuple[DataFrame, DataFrame]:
    """Malformed-record quarantine at the ingest boundary: read JSON lines
    in PERMISSIVE mode with a corrupt-record column and split the input
    into (parsed, quarantined). A scraper restart mid-write, a truncated
    upload, or a producer bug lands malformed lines in the batch dir; at
    100 TB "fail the whole job" (FAILFAST) and "silently drop"
    (DROPMALFORMED) are both wrong — route bad lines to a quarantine sink
    with their raw text so they can be re-parsed after the producer fix.

    Returns lazily-split frames off ONE read lineage. Note Spark's
    PERMISSIVE contract: a malformed line has every schema column NULL
    and the raw text in the corrupt column — the filter keys on that
    column alone.
    """
    from mbgspark.schema import TWEET_RAW_SCHEMA

    base = schema if schema is not None else TWEET_RAW_SCHEMA
    with_corrupt = base.add("_corrupt_record", "string")
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path_or_glob)
        # Spark DISALLOWS queries whose referenced columns are only the
        # corrupt-record column (SPARK-21610 / QUERY_ONLY_CORRUPT_RECORD
        # _COLUMN): the documented contract is to cache the parsed batch
        # first. An ingest micro-batch is bounded, so caching it is the
        # intended (and cheap) pattern — both split frames then read the
        # same parsed data.
        .cache()
    )
    parsed = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantined = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return parsed, quarantined


def observed_ingest(df: DataFrame, name: str = "ingest_metrics"):
    """Attach Spark's Observation metrics to an ingest frame: row count,
    null-text count, and total characters are collected AS A SIDE EFFECT
    of whatever action the caller already runs — no second scan, no
    separate count() job, which is the whole point at 100 TB (a metrics
    pass that re-reads the input doubles the ingest cost; Observation
    piggybacks on the existing one). Returns ``(df, observation)``; read
    ``observation.get`` AFTER an action has run. The per-run numbers
    feed the same operational surface as the reference's per-run count
    logging (resilient_etl.py's summary lines), but from the engine's
    own metric channel instead of extra queries."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_chars"),
    )
    return observed, obs
