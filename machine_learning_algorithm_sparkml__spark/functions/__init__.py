from machine_learning_algorithm_sparkml__spark.functions.text import (
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_token_count,
)
from machine_learning_algorithm_sparkml__spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "STOPWORDS",
    "tokens",
    "token_count",
    "word_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
