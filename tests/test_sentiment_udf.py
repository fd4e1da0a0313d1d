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


def test_model_branch_with_fake_predictor(spark):
    """The MODEL branch of with_sentiment_udf (utils.py:85-92 semantics),
    exercised through an injected fake predictor: 512-char truncation is
    applied BEFORE inference, model labels are lowercased, scores pass
    through, and nulls arrive as empty strings."""
    from mbgspark.functions.sentiment import make_model_classify

    seen_batches = []

    def fake_predict(vals):
        seen_batches.append(list(vals))
        out = []
        for v in vals:
            assert len(v) <= 512  # truncation happened before the model
            out.append(("POSITIVE", 0.9) if "bagus" in v else ("Negative", 0.25))
        return out

    df = spark.createDataFrame(
        [("1", "program bagus"), ("2", "x" * 600 + " bagus"), ("3", None)],
        "id string, text string",
    )
    got = {
        r["id"]: (r["label"], r["confidence_score"])
        for r in with_sentiment_udf(
            df, "text", classify=make_model_classify(fake_predict)
        ).collect()
    }
    assert got["1"] == ("positive", 0.9)  # label lowercased
    assert got["2"] == ("negative", 0.25)  # 'bagus' truncated away at 512
    assert got["3"] == ("negative", 0.25)  # null → '' reaches the model
    assert all(len(v) <= 512 for batch in seen_batches for v in batch)


def test_model_branch_error_degradation(spark):
    """A failing model batch degrades every row to ('neutral', 0.0) —
    utils.py:88-92 — instead of failing the job."""
    from mbgspark.functions.sentiment import make_model_classify

    def broken_predict(vals):
        raise RuntimeError("model exploded")

    df = spark.createDataFrame([("1", "apa saja"), ("2", "bagus")], "id string, text string")
    got = {
        r["id"]: (r["label"], r["confidence_score"])
        for r in with_sentiment_udf(
            df, "text", classify=make_model_classify(broken_predict)
        ).collect()
    }
    assert got == {"1": ("neutral", 0.0), "2": ("neutral", 0.0)}


def test_hf_factory_error_names_the_fallback_and_dispatch_matches():
    """VERDICT r5 item 5: the factory's no-deps error must NAME the
    deterministic strategy the caller should use, and the named fallback
    must be exactly what with_sentiment_udf dispatches to by default
    (classify=None)."""
    with pytest.raises(NotImplementedError, match=r"make_lexicon_classify\(\)"):
        hf_classify_factory()


def test_default_dispatch_is_lexicon_strategy(spark):
    from mbgspark.functions.sentiment import make_lexicon_classify

    df = spark.createDataFrame(
        [("1", "program bagus sekali"), ("2", "gagal buruk"), ("3", None)],
        "id string, text string",
    )
    default = sorted(
        map(tuple, with_sentiment_udf(df, "text").collect())
    )
    explicit = sorted(
        map(
            tuple,
            with_sentiment_udf(
                df, "text", classify=make_lexicon_classify()
            ).collect(),
        )
    )
    assert default == explicit


def test_hf_integration_when_transformers_present(spark):
    """Integration seam for the real HF path (reference utils.py:53-92):
    skipped in this container (no transformers/torch); the day the
    dependency appears, this drives hf_classify_factory end-to-end
    through the Arrow UDF. The error-degradation contract means a
    present-but-offline model still yields ('neutral', 0.0) rows, which
    the assertions accept — the test pins the SEAM, not the weights."""
    pytest.importorskip("transformers")
    pytest.importorskip("torch")

    clf = hf_classify_factory()
    df = spark.createDataFrame(
        [("1", "program makan bergizi gratis sangat bagus"), ("2", None)],
        "id string, text string",
    )
    got = {
        r["id"]: (r["label"], r["confidence_score"])
        for r in with_sentiment_udf(df, "text", classify=clf).collect()
    }
    assert set(got) == {"1", "2"}
    for label, score in got.values():
        assert label in {"positive", "negative", "neutral"}
        assert 0.0 <= score <= 1.0
