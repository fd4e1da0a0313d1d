"""X1 sentiment-classification stage — the one true model UDF surface.

Reference: ``utils.py:53-92`` (HF pipeline init + classify with GPU-if-
available and error→('NEUTRAL', 0.0) semantics) applied in batches of 50
(``utils.py:157-201``). Spark shape: an Arrow-batched pandas UDF returning
``struct<label string, confidence_score double>`` — batching becomes an
engine concern (``spark.sql.execution.arrow.maxRecordsPerBatch``), the
model loads once per Python worker instead of once per row, and Arrow
transfer replaces the reference's manual batch slicing.

The classifier is a pluggable strategy (SURVEY.md §7 risk register):

- ``lexicon_classify`` — deterministic, dependency-free; EXACTLY the same
  semantics as the column-expression lexicon (functions/lexicon.py), so the
  DuckDB oracle for either path is identical. Correctness tests use this.
- ``hf_classify`` — the real HuggingFace model path
  (w11wo/indonesian-roberta-base-sentiment-classifier, utils.py:58), gated
  behind an import-try: the container has no torch/transformers, so it
  raises with a clear message instead of failing at import time.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mbgspark.functions.lexicon import NEGATIVE, POSITIVE

SENTIMENT_RESULT_TYPE = "label string, confidence_score double"

ClassifyFn = Callable[[pd.Series], pd.DataFrame]


def make_lexicon_classify(
    positive: tuple[str, ...] = POSITIVE, negative: tuple[str, ...] = NEGATIVE
) -> ClassifyFn:
    """Vectorized pandas twin of functions/lexicon.py: truncate to 512 chars
    (utils.py:85-86), trim spaces, lowercase, split on single space; label by
    pos-vs-neg occurrence counts; score = hits/total_tokens rounded to 4 dp;
    null/empty → ('neutral', 0.0) (utils.py:81-92)."""
    pos, neg = set(positive), set(negative)

    def classify(texts: pd.Series) -> pd.DataFrame:
        # mirror F.lower(F.trim(F.substring(text, 1, 512))): substring first,
        # then trim (ASCII space only — Spark's trim), then casefold
        clean = texts.fillna("").str.slice(0, 512).str.strip(" ").str.lower()
        toks = clean.str.split(" ")
        pos_hits = toks.map(lambda ts: sum(t in pos for t in ts))
        neg_hits = toks.map(lambda ts: sum(t in neg for t in ts))
        total = toks.map(len)
        label = pd.Series("neutral", index=texts.index)
        label[pos_hits > neg_hits] = "positive"
        label[pos_hits < neg_hits] = "negative"
        label[total <= 0] = "neutral"
        score = ((pos_hits + neg_hits) / total.where(total > 0, 1)).round(4)
        score[total <= 0] = 0.0
        return pd.DataFrame({"label": label, "confidence_score": score})

    return classify


def make_model_classify(
    predict: Callable[[list[str]], list[tuple[str, float]]],
    truncate: int = 512,
) -> ClassifyFn:
    """Wrap any batch model predictor in the reference's batch semantics
    (utils.py:85-92): 512-char truncation before inference, labels
    lowercased, and a failing batch degrading to ('neutral', 0.0) for every
    row instead of failing the job. The HF path and test fakes share this
    adapter, so the model BRANCH of with_sentiment_udf is exercised without
    torch/transformers in the container (VERDICT r1 item 8)."""

    def classify(texts: pd.Series) -> pd.DataFrame:
        vals = [t[:truncate] for t in texts.fillna("")]
        try:
            out = predict(vals)
            return pd.DataFrame(
                {
                    "label": [label.lower() for label, _ in out],
                    "confidence_score": [float(score) for _, score in out],
                }
            )
        except Exception:
            return pd.DataFrame(
                {
                    "label": ["neutral"] * len(vals),
                    "confidence_score": [0.0] * len(vals),
                }
            )

    return classify


def hf_classify_factory(
    model_name: str = "w11wo/indonesian-roberta-base-sentiment-classifier",
) -> ClassifyFn:
    """The reference's real model path (utils.py:53-92). Loads lazily inside
    the UDF so each Python worker initializes the pipeline once; batch
    semantics (truncation, error degradation) via make_model_classify."""
    try:
        from transformers import pipeline  # noqa: F401
    except ImportError as exc:  # pragma: no cover - model env only
        raise NotImplementedError(
            "transformers/torch not installed in this environment; use "
            "make_lexicon_classify() (the deterministic strategy) instead"
        ) from exc

    _model_holder: list = []

    def predict(vals: list[str]) -> list[tuple[str, float]]:  # pragma: no cover
        if not _model_holder:
            _model_holder.append(pipeline("sentiment-analysis", model=model_name))
        out = _model_holder[0](vals)
        return [(r["label"], float(r["score"])) for r in out]

    return make_model_classify(predict)


def with_sentiment_udf(
    df: DataFrame,
    text_col: str = "text",
    classify: ClassifyFn | None = None,
) -> DataFrame:
    """Apply a classifier strategy as an Arrow-batched pandas UDF, adding
    ``label`` and ``confidence_score`` columns. The UDF is the slow path by
    design (SURVEY.md §2.10 X1) — everything around it stays in codegen."""
    fn = classify or make_lexicon_classify()

    @pandas_udf(SENTIMENT_RESULT_TYPE)
    def _clf(texts: pd.Series) -> pd.DataFrame:
        return fn(texts)

    out = df.withColumn("__sent", _clf(F.col(text_col)))
    return (
        out.withColumn("label", F.col("__sent.label"))
        .withColumn("confidence_score", F.col("__sent.confidence_score"))
        .drop("__sent")
    )
