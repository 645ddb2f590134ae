"""search_engine_spark — a from-scratch PySpark-native inverted-index + BM25
engine with the capabilities of Doha-Ahmed-E/Search_engine (see SURVEY.md)."""

__version__ = "0.1.0"
