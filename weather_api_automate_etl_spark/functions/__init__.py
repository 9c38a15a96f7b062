from weather_api_automate_etl_spark.functions.core import (
    SURROGATE_NULL_SENTINEL,
    ilike_recode,
    pg_dow,
    pg_hour,
    range_bucket,
    surrogate_key,
    temperature_category,
    weather_category,
)
from weather_api_automate_etl_spark.functions.text import (
    bpe_ish_token_count,
    char_ngrams,
    document_fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    tokens,
    word_shingles,
)
from weather_api_automate_etl_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)

__all__ = [
    "SURROGATE_NULL_SENTINEL",
    "surrogate_key",
    "pg_dow",
    "pg_hour",
    "ilike_recode",
    "range_bucket",
    "temperature_category",
    "weather_category",
    "tokens",
    "word_shingles",
    "char_ngrams",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "document_fingerprint",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
]
