from .text import (
    STOPWORDS,
    avg_word_len,
    bpe_ish_token_count,
    digit_ratio,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
    whitespace_token_count,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "STOPWORDS",
    "avg_word_len",
    "bpe_ish_token_count",
    "digit_ratio",
    "lang_id",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "tokens",
    "whitespace_token_count",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
