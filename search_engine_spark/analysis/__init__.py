from .analyzer import (
    STOPWORDS,
    analyze,
    analyze_query,
    analyze_series,
    analyze_with_positions,
    stem_token,
    tokenize,
)
from .porter import porter_stem

__all__ = [
    "STOPWORDS",
    "analyze",
    "analyze_query",
    "analyze_series",
    "analyze_with_positions",
    "porter_stem",
    "stem_token",
    "tokenize",
]
