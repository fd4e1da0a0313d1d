"""Lifecycle tests incl. the reference's own closest-to-an-oracle invariant:
after reprocessing, the unprocessed work set must be empty
(fix_unprocessed_monthly_tweets.py:229-234)."""

from pyspark.sql import functions as F

from mbgspark.pipeline import (
    incremental_dates,
    locations_dim,
    reprocess,
    run_etl,
    unprocessed_predicate,
)
from mbgspark.sources.ingest import dedup_ingest_batch


def test_run_etl_full_lineage(spark, tweets_raw):
    dim = locations_dim(spark)
    out = run_etl(dedup_ingest_batch(tweets_raw), dim)
    rows = {r["_id"]: r for r in out.collect()}
    # cleaning: URLs stripped, lowercased
    assert "http" not in rows["1"]["clean_text"]
    # location: containment join found jakarta selatan for tweet 1
    assert rows["1"]["city"] == "jakarta selatan"
    # author-name fallback: tweet 3's author mentions Semarang, but text has
    # bandung → text match wins by dict order (bandung order 5 < smg 9)
    assert rows["3"]["city"] == "bandung"
    # sentiment: 'bagus' → positive; 'gagal' → negative
    assert rows["1"]["sentiment_label"] == "positive"
    assert rows["2"]["sentiment_label"] == "negative"
    # event_date derived from created_at (event time, not scrape time)
    assert rows["6"]["event_date"] == "2025-01-01"


def test_reprocess_idempotent(spark, tweets_raw):
    dim = locations_dim(spark)
    store = run_etl(dedup_ingest_batch(tweets_raw), dim)
    # damage some rows: null out sentiment for one id
    damaged = store.withColumn(
        "sentiment_label",
        F.when(F.col("_id") == "2", F.lit(None)).otherwise(F.col("sentiment_label")),
    )
    work1, fixed = reprocess(damaged, dim)
    assert work1.count() == 1
    work2, _ = reprocess(fixed, dim)
    assert work2.count() == 0  # the reference's post-hoc invariant


def test_unprocessed_predicate_or_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", "clean", "positive", True),
            ("b", None, "positive", True),
            ("c", "clean", None, True),
            ("d", "clean", "neutral", None),  # location stage never ran
        ],
        "_id string, clean_text string, sentiment_label string, location_checked boolean",
    )
    got = {r["_id"] for r in df.filter(unprocessed_predicate()).collect()}
    assert got == {"b", "c", "d"}


def test_incremental_dates_skip_scan(spark):
    cand = spark.createDataFrame([("2025-01-01",), ("2025-01-02",)], "event_date string")
    have = spark.createDataFrame([("2025-01-01",)], "event_date string")
    out = incremental_dates(cand, have).collect()
    assert [r["event_date"] for r in out] == ["2025-01-02"]


def test_ingest_quarantine_splits_malformed_lines(spark, tmp_path):
    from mbgspark.sources.ingest import parse_with_quarantine

    src = tmp_path / "batch"
    src.mkdir()
    good = '{"_id": "1", "text": "hello", "created_at": "2025-01-01T10:00:00Z"}'
    bad1 = '{"_id": "2", "text": "truncated...'
    bad2 = 'not json at all'
    (src / "b0.json").write_text("\n".join([good, bad1, bad2]))
    parsed, quarantined = parse_with_quarantine(spark, str(src))
    ok = parsed.select("_id").collect()
    assert [r["_id"] for r in ok] == ["1"]
    bad = sorted(r["raw_line"] for r in quarantined.collect())
    assert bad == sorted([bad1, bad2])


def test_observed_ingest_piggybacks_metrics_on_the_action(spark):
    """Observation metrics arrive from the SAME action that consumes the
    frame — no second scan; null text is counted, chars exclude nulls."""
    from mbgspark.sources.ingest import observed_ingest

    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "de")], "id bigint, text string"
    )
    observed, obs = observed_ingest(df)
    assert observed.count() == 3  # the action the metrics ride on
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_text"] == 1
    assert got["n_chars"] == 5
