"""Deterministic synthetic transcripts corpus.

Stand-in for the reference's crawled ``pages`` collection
(``Crawler/WebCrawler.java:397-401``); shape is the authoritative
``input_hint`` from BASELINE.json:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

One row = one turn = one indexable document. The generator is seeded and
counter-based per conversation, so the pandas version (tests / oracle) and
the distributed Spark version (bench scale) produce identical rows for the
same (seed, n_convs).

Text properties (FIXTURES.md §1): Zipfian vocabulary, a few deliberately hot
head terms (exercise skew salting), embedded stopwords / mixed case /
punctuation / numerals (exercise the analyzer), and occasional duplicated
turns (exercise sha2 dedup, ``Crawler/PageHasher.java:15-23``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SEED = 42

# ---------------------------------------------------------------------------
# Vocabulary: deterministic pseudo-words + hot head terms + stopword fillers.
# ---------------------------------------------------------------------------

_SYLLABLES = [
    "ba", "co", "da", "fen", "gor", "hal", "jin", "kel", "lum", "mar",
    "nor", "pol", "quin", "ras", "sel", "tor", "ul", "ven", "wex", "yor",
    "zan", "bri", "cla", "dro", "fra",
]

HEAD_TERMS = ["spark", "index", "query", "agent", "model", "token", "search", "data"]

_FILLERS = ["the", "a", "of", "to", "and", "is", "in", "it", "you", "that"]

_TOOLS = ["bash", "python", "browser", "editor", "search", ""]

_ROLES = ["user", "assistant", "tool"]


def build_vocab(size: int = 2000) -> list[str]:
    """Deterministic vocabulary of ``size`` pseudo-words (no RNG needed)."""
    vocab: list[str] = []
    i = 0
    while len(vocab) < size:
        a = _SYLLABLES[i % len(_SYLLABLES)]
        b = _SYLLABLES[(i // len(_SYLLABLES)) % len(_SYLLABLES)]
        c = _SYLLABLES[(i // (len(_SYLLABLES) ** 2)) % len(_SYLLABLES)]
        w = a + b + (c if i >= len(_SYLLABLES) ** 2 else "")
        vocab.append(w)
        i += 1
    return vocab


VOCAB = build_vocab()
# Zipf weights over the vocabulary (s = 1.1).
_ZIPF_W = 1.0 / np.arange(1, len(VOCAB) + 1) ** 1.1
_ZIPF_P = _ZIPF_W / _ZIPF_W.sum()


def _turns_for_conv(conv_index: int) -> int:
    """Deterministic turn count per conversation (3..10)."""
    return 3 + (conv_index * 2654435761 % 8)


def conv_id_str(conv_index: int) -> str:
    return f"conv_{conv_index:08d}"


def _gen_turn_text(rng: np.random.Generator, prev_texts: list[str]) -> str:
    """One turn's text: Zipf words + head terms + fillers + noise tokens."""
    # 2% duplicated turn (dedup exercise)
    if prev_texts and rng.random() < 0.02:
        return prev_texts[int(rng.integers(0, len(prev_texts)))]
    n_words = int(rng.integers(5, 40))
    idx = rng.choice(len(VOCAB), size=n_words, p=_ZIPF_P)
    words = [VOCAB[j] for j in idx]
    # sprinkle head terms (hot, skewed)
    for k in range(len(words)):
        r = rng.random()
        if r < 0.08:
            words[k] = HEAD_TERMS[int(rng.integers(0, len(HEAD_TERMS)))]
        elif r < 0.20:
            words[k] = _FILLERS[int(rng.integers(0, len(_FILLERS)))]
    # analyzer stressors: mixed case, punctuation, numerals
    if rng.random() < 0.3 and words:
        j = int(rng.integers(0, len(words)))
        words[j] = words[j].upper()
    if rng.random() < 0.2:
        words.append(str(int(rng.integers(0, 9999))))
    if rng.random() < 0.3 and len(words) > 2:
        j = int(rng.integers(1, len(words)))
        words[j] = words[j] + ","
    return " ".join(words) + "."


def generate_conv(conv_index: int, seed: int = DEFAULT_SEED) -> list[dict]:
    """All turns of one conversation — the unit of determinism."""
    rng = np.random.default_rng([seed, conv_index])
    n_turns = _turns_for_conv(conv_index)
    cid = conv_id_str(conv_index)
    base_ts = np.datetime64("2025-01-01T00:00:00") + np.timedelta64(
        conv_index * 3600, "s"
    )
    rows = []
    prev: list[str] = []
    for t in range(n_turns):
        role = _ROLES[t % 3] if n_turns >= 3 else _ROLES[t % 2]
        text = _gen_turn_text(rng, prev)
        prev.append(text)
        tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else ""
        rows.append(
            {
                "conv_id": cid,
                "turn_idx": np.int32(t),
                "role": role,
                "text": text,
                "tool": tool,
                "ts": pd.Timestamp(base_ts + np.timedelta64(t * 60, "s")),
            }
        )
    return rows


def generate_pandas(n_convs: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Small-scale corpus for tests / the pytest oracle."""
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(generate_conv(c, seed))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


TRANSCRIPTS_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def generate_spark(spark, n_convs: int, seed: int = DEFAULT_SEED, parallelism: int | None = None):
    """Distributed generation: partition the conv-index range, regenerate each
    conversation with the same counter-based RNG — identical rows to
    ``generate_pandas`` for the same (seed, n_convs), at any parallelism.
    """
    from pyspark.sql import functions as F  # noqa: F401

    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            out: list[dict] = []
            for c in pdf["id"].tolist():
                out.extend(generate_conv(int(c), seed))
            if out:
                yield pd.DataFrame(out)

    base = spark.range(0, n_convs, 1, parallelism)
    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA_DDL)


def n_turns_for(n_convs: int) -> int:
    return sum(_turns_for_conv(c) for c in range(n_convs))
