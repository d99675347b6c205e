"""Source loaders (SURVEY.md §2.1)."""

from nessie_spark.sources.loaders import (
    load_sequence_labeling_conll,
    load_text_classification_tsv,
    write_text_classification_tsv,
)

__all__ = [
    "load_sequence_labeling_conll",
    "load_text_classification_tsv",
    "write_text_classification_tsv",
]
