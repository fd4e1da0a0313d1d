"""X1 pandas-UDF sentiment stage: the Arrow path must agree exactly with the
column-expression lexicon (same strategy, two physical plans), and the HF
model factory must fail loudly — not at import time — when torch/transformers
are absent."""

import pytest

from mbgspark.functions.lexicon import with_lexicon_sentiment
from mbgspark.functions.sentiment import hf_classify_factory, with_sentiment_udf

TEXTS = [
    ("1", "spark is fast and big"),          # positive
    ("2", "slow small dup error"),           # negative
    ("3", "nothing to see here"),            # neutral
    ("4", ""),                               # empty → neutral 0.0
    ("5", None),                             # null → neutral 0.0
    ("6", "  fast   slow  "),                # tie → neutral, hits counted
    ("7", "x" * 600 + " fast"),              # truncation at 512 drops ' fast'
]


def test_udf_matches_column_lexicon(spark):
    df = spark.createDataFrame(TEXTS, "id string, text string")
    via_udf = {
        r["id"]: (r["label"], r["confidence_score"])
        for r in with_sentiment_udf(df, "text").collect()
    }
    via_cols = {
        r["id"]: (r["label"], r["confidence_score"])
        for r in with_lexicon_sentiment(df, "text").collect()
    }
    assert via_udf == via_cols
    assert via_udf["1"][0] == "positive"
    assert via_udf["2"][0] == "negative"
    assert via_udf["4"] == ("neutral", 0.0)
    assert via_udf["5"] == ("neutral", 0.0)
    assert via_udf["6"][0] == "neutral"
    assert via_udf["7"][0] == "neutral"  # 'fast' beyond the 512-char cap


def test_hf_factory_gated():
    with pytest.raises(NotImplementedError):
        hf_classify_factory()
