from mbgspark.functions.cleaning import clean_at_ingest, clean_for_analysis
from mbgspark.functions.lexicon import lexicon_label, lexicon_score

__all__ = [
    "clean_at_ingest",
    "clean_for_analysis",
    "lexicon_label",
    "lexicon_score",
]
