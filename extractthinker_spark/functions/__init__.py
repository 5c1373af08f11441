from extractthinker_spark.functions.tokens import (  # noqa: F401
    count_tokens_series,
    normalize_whitespace,
    normalize_whitespace_series,
    simple_token_count,
    truncate_to_token_limit,
)
