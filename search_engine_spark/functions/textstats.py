"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All JVM-side (built-in functions; the regexes are the spec, shared verbatim
with the DuckDB oracle SQL). Semantics chosen to be exactly expressible in
ANSI SQL so every operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.analyzer import STOPWORDS

ALPHA_RE = "[a-zA-Z]+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_alpha_tokens, n_bpe_tokens)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col("text")), "\\s+")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(ALPHA_RE), 0))
        .cast("long")
        .alias("n_alpha_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, quality) — deterministic heuristic quality score in
    [0,1]: rewards sentence-like length, moderate punctuation, and a natural
    stopword rate."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(F.col("text")).cast("double")
    n_punct = F.length(
        F.regexp_replace(F.col("text"), "[a-zA-Z0-9\\s]", "")
    ).cast("double")
    stop_arr = F.filter(
        toks, lambda t: t.isin(*[F.lit(s) for s in sorted(STOPWORDS)])
    )
    n_stop = F.size(stop_arr).cast("double")
    mean_tok = F.when(n_tokens > 0, (F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n_tokens)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    len_score = F.least(n_tokens / 20.0, F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), 1.0 - punct_ratio * 5.0)
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    quality = F.round(
        0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score, 6
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred) — n-gram-free heuristic: share of tokens that are
    English stopwords >= 5% -> 'en', else 'unk'. (A real model would be a
    fastText-style classifier in a pandas UDF; the heuristic keeps the
    operator oracle-checkable.)"""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    n_tokens = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in sorted(STOPWORDS)]))
    ).cast("double")
    pred = F.when(
        (n_tokens > 0) & (n_stop / n_tokens >= 0.05), F.lit("en")
    ).otherwise(F.lit("unk"))
    return docs.select(F.col(id_col).alias("doc_id"), pred.alias("lang_pred"))


def en_bigram_table() -> tuple[dict[str, float], float]:
    """Deterministic English character-bigram log-probability table, built
    from the bundled public stopword lexicon (Laplace-smoothed over the
    26x26 bigram space). Self-contained — no external model — and small
    enough to inline into both a Catalyst literal map and a DuckDB VALUES
    table (the LSH-planes trick). Returns (table, unseen_logp)."""
    import math
    from collections import Counter

    c: Counter = Counter()
    for w in sorted(STOPWORDS):
        for i in range(len(w) - 1):
            bg = w[i:i + 2]
            if bg.isalpha():
                c[bg] += 1
    total = sum(c.values())
    v = 26 * 26
    table = {
        bg: math.log((n + 1.0) / (total + v)) for bg, n in sorted(c.items())
    }
    return table, math.log(1.0 / (total + v))


def en_bigram_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, en_logp) — mean log-probability of the doc's
    character bigrams under the English bigram model (en_bigram_table).
    English-like text scores high; random letter strings score near the
    unseen-bigram floor. Continuous score by design (no threshold label —
    a boundary doc would make the oracle comparison flaky); compose with
    ``lang_id`` for a hard decision.

    Fully Catalyst-side: tokens -> per-token bigrams via transform/sequence,
    table lookup via a literal map (no join, no UDF) — scale-safe."""
    table, unseen = en_bigram_table()
    map_args = []
    for bg, lp in table.items():
        map_args += [F.lit(bg), F.lit(lp)]
    lp_map = F.create_map(*map_args)

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("tok"),
    )
    bgs = toks.select(
        "doc_id",
        F.explode_outer(
            F.when(
                F.length("tok") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("tok") - 1),
                    lambda i: F.col("tok").substr(i, F.lit(2)),
                ),
            )
        ).alias("bg"),
    )
    scored = bgs.withColumn(
        "lp",
        F.when(
            F.col("bg").isNotNull(),
            F.coalesce(lp_map[F.col("bg")], F.lit(unseen)),
        ),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("lp").alias("n_bigrams"),
            F.round(F.coalesce(F.avg("lp"), F.lit(unseen)), 6).alias("en_logp"),
        )
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — order-insensitive content fingerprint:
    sha256 over the sorted distinct lowercase alpha tokens. Near-duplicate
    docs with shuffled word order collide; whitespace/punct changes are
    ignored (cheap canonical form of the reference's sha256 content hash,
    Crawler/PageHasher.java:15-23)."""
    toks = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.array_join(toks, " "), 256).alias("fingerprint"),
    )


def repetition_scores(docs: DataFrame, id_col: str = "doc_id",
                      n: int = 3) -> DataFrame:
    """(doc_id, n_ngrams, rep_frac) — repeated word-n-gram fraction, the
    Gopher/C4-family quality signal: rep_frac = 1 - distinct/total over the
    doc's word n-grams (0.0 when the doc has < n words). High values mark
    boilerplate/looping text a training pipeline drops.

    Entirely per-row Catalyst (regexp tokenize -> transform over an index
    sequence -> array_distinct): NO shuffle, no UDF — at 100 TB this is a
    map-only pass that scales with input splits."""
    arr = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    total = F.size(arr) - (n - 1)
    # greatest(total, 1): sequence(1, 0) would DESCEND and slice(arr, 0, n)
    # throws — short docs take the CASE's other branch anyway
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.array_join(F.slice(arr, i, n), " "),
    )
    rep = F.round(
        1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6
    )
    has = F.size(arr) >= n
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(has, total).otherwise(0).cast("long").alias("n_ngrams"),
        F.when(has, rep).otherwise(0.0).alias("rep_frac"),
    )
