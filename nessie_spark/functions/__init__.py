"""Column-expression library shared by operators and the lakehouse engine."""

from nessie_spark.functions.core import (
    char_ngrams,
    cosine_sim,
    entropy_ln,
    entropy_log2,
    h64,
    hilbert_key_udf,
    morton32,
    prob_margin,
    softmax_arr,
    word_tokens,
)

__all__ = [
    "char_ngrams",
    "cosine_sim",
    "entropy_ln",
    "entropy_log2",
    "h64",
    "hilbert_key_udf",
    "morton32",
    "prob_margin",
    "softmax_arr",
    "word_tokens",
]
