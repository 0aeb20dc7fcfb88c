from .analyzer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze,
    analyze_detailed,
    analyze_query_terms,
)
