"""Text-analysis chain: tokenize -> stopword-filter -> stem.

Semantics mirror the reference chain (all citations into /root/reference):

* Tokenize: OpenNLP SimpleTokenizer followed by an ``[a-zA-Z]+`` keep-filter
  (``Indexer/Tokenizer.java:24-25``). After the alpha filter the effective
  output equals the maximal ASCII-letter runs of the input, so the regex IS
  the spec here.
* Stopwords: lowercase, then drop members of the 128-word list vendored at
  ``search_engine_spark/data/stop_words.txt`` (``Indexer/StopWords.java:41-44``).
* Stem: drop length<=1 or all-digit tokens (impossible post-regex); keep
  length<=3 tokens lowercased un-stemmed; Porter-stem the rest
  (``Indexer/Stemmer.java:33-38``).
* Positions: 0-based ordinal over the SURVIVING token stream — stopword-
  removed and stem-dropped tokens do not consume a position
  (``Indexer/Indexer.java:231-247``: ``wordCount`` only increments for kept
  tokens). ``doc_len`` = number of surviving terms
  (``Indexer/Indexer.java:156-176``).

This module is pure Python/pandas — imported by both the Spark pandas UDFs
and the pytest/DuckDB oracles so that parity holds by construction.
"""

from __future__ import annotations

import re
from importlib import resources

from .porter import porter_stem

_TOKEN_RE = re.compile(r"[a-zA-Z]+")


def load_stopwords() -> frozenset[str]:
    # importlib.resources is zip-safe: the package may be deployed via
    # spark-submit --py-files search_engine_spark.zip
    text = (
        resources.files("search_engine_spark.data")
        .joinpath("stop_words.txt")
        .read_text()
    )
    words = []
    for line in text.splitlines():
        w = line.strip().lower()
        if w:
            words.append(w)
    return frozenset(words)


STOPWORDS: frozenset[str] = load_stopwords()


def tokenize(text: str) -> list[str]:
    """Maximal ASCII-letter runs (Tokenizer.java:24-25), original case."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)


def stem_token(token_lower: str) -> str | None:
    """Stemmer.java:33-38 semantics on an already-lowercased token.

    Returns None when the token is dropped (len<=1; all-digit tokens cannot
    occur after the alpha tokenizer).
    """
    n = len(token_lower)
    if n <= 1:
        return None
    if n <= 3:
        return token_lower
    return porter_stem(token_lower)


def analyze(text: str, stem: bool = True) -> list[str]:
    """Full chain: tokenize -> lowercase -> stopword filter -> stem.

    With ``stem=False`` the Porter step is skipped (tokens are still
    lowercased, stop-filtered and len<=1-dropped) — used for the
    DuckDB-oracle-checkable query variants where SQL cannot stem.
    """
    out: list[str] = []
    for tok in _TOKEN_RE.findall(text or ""):
        low = tok.lower()
        if low in STOPWORDS:
            continue
        if stem:
            s = stem_token(low)
            if s is not None:
                out.append(s)
        else:
            if len(low) > 1:
                out.append(low)
    return out


def analyze_with_positions(text: str, stem: bool = True) -> list[tuple[str, int]]:
    """As ``analyze`` but with the 0-based surviving-stream position."""
    return [(t, i) for i, t in enumerate(analyze(text, stem=stem))]


def analyze_query(query: str, stem: bool = True) -> list[str]:
    """Query-side preprocessing (QueryProcessor.java:507-522) — identical
    chain to the index side; duplicates preserved in order."""
    return analyze(query, stem=stem)


# ---------------------------------------------------------------------------
# pandas-vectorized variants (Arrow batch path; no per-row Python from Spark's
# perspective — Spark hands us a pandas Series per batch).
# ---------------------------------------------------------------------------

def analyze_batch(texts, stem: bool = True) -> list[list[str]]:
    """``[analyze(t) for t in texts]`` with a per-batch RAW-token memo:
    the token -> kept-term mapping is context-free and Zipf repetition
    makes most tokens in a batch repeats, so the lower/stopword/stem
    chain runs once per DISTINCT raw token instead of per occurrence
    (measured ~1.5x on the build's analysis stage; output identical by
    construction — test_analyzer pins it)."""
    memo: dict[str, str | None] = {}
    out: list[list[str]] = []
    for t in texts:
        kept: list[str] = []
        for tok in _TOKEN_RE.findall(t or ""):
            if tok in memo:
                r = memo[tok]
            else:
                low = tok.lower()
                if low in STOPWORDS:
                    r = None
                elif stem:
                    r = stem_token(low)
                else:
                    r = low if len(low) > 1 else None
                memo[tok] = r
            if r is not None:
                kept.append(r)
        out.append(kept)
    return out


def analyze_series(texts, stem: bool = True):
    """pandas Series[str] -> pandas Series[list[str]] applying ``analyze``.

    The per-batch raw-token memo (``analyze_batch``) plays the role of the
    reference's 50k stem LRU (Stemmer.java:13-27) on top of the
    module-level lru_cache.
    """
    import pandas as pd

    return pd.Series(
        analyze_batch(list(texts), stem=stem),
        index=texts.index if hasattr(texts, "index") else None,
    )
