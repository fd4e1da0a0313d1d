"""P1/P2 round trip: flat → nested doc → flat must preserve every leaf and
apply the reference's defaults for absent enrichment fields."""

import datetime as dt

from mbgspark.schema import TWEET_DOC_SCHEMA, flatten_tweets, nest_tweets


def test_nest_matches_doc_schema(spark, tweets_raw):
    docs = nest_tweets(tweets_raw)
    want = {f.name: f.dataType for f in TWEET_DOC_SCHEMA.fields}
    got = {f.name: f.dataType for f in docs.schema.fields}
    assert set(got) == set(want)
    assert got["content"] == want["content"]
    assert got["metrics"] == want["metrics"]
    assert got["sentiment_analysis"] == want["sentiment_analysis"]


def test_round_trip_preserves_leaves_and_defaults(spark, tweets_raw):
    flat = flatten_tweets(nest_tweets(tweets_raw))
    row = {r["_id"]: r for r in flat.collect()}["1"]
    assert row["text"].startswith("Program MBG bagus")
    assert row["author_handle"] == "u1"
    assert row["created_at"] == dt.datetime(2025, 1, 1, 10)
    assert (row["reply_count"], row["retweet_count"], row["like_count"]) == (1, 2, 3)
    # enrichment never ran → reference defaults, not nulls
    assert row["clean_text"] == ""
    assert row["sentiment_label"] == ""
    assert row["sentiment_confidence"] == 0.0
    assert row["sentiment_analyzed"] is False
