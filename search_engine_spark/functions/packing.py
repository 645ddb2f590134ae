"""Token-budget sequence packing: group documents into training
sequences whose token totals fit a fixed context budget.

LLM pretraining consumes fixed-length sequences; feeding one (usually
short) document per sequence wastes most of the context window, so
production pipelines PACK documents: concatenate until the next one
would overflow the budget, then start a new sequence. The classic
formulation is bin packing (NP-hard); every real pipeline uses the
greedy first-fit-in-order heuristic because it is single-pass,
deterministic, and within a few percent of optimal at corpus scale.

Scale shape: sequences never cross SHARDS — shard = pmod(doc_id,
n_shards), a deterministic map-side assignment — so packing is
embarrassingly parallel: one ``applyInPandas`` group per shard, a
single O(rows) pass inside each (the running-total reset makes this a
genuinely sequential recurrence — not expressible as a window cumsum —
which is exactly what the per-shard kernel is for). At 100 TB you size
``n_shards`` so a shard's (doc_id, n_tokens) rows fit an executor
(~10^7 rows each is nothing: two longs), and shard-local packing loses
nothing measurable vs global packing when shards hold thousands of
budget-multiples of tokens. Only ids and counts move — never text; the
assignment joins back to the corpus by doc_id.

Deterministic by construction (shard hash + doc_id order + greedy
rule), so the assignment is reproducible run-to-run and oracle-checkable
(the contract row replays the recurrence as a recursive CTE in DuckDB).
A document larger than the budget gets a sequence of its own (callers
truncate or split downstream — this operator never drops rows).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id long, shard int, seq_idx long, n_tokens long"


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """(doc_id, shard, seq_idx, n_tokens): greedy in-doc_id-order packing
    of each shard's documents into sequences of <= ``budget`` tokens.
    ``tokens_col=None`` counts BPE-ish tokens (textstats.token_counts'
    ``n_bpe_tokens``) from the ``text`` column; pass a column name to
    pack on precomputed counts instead."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if tokens_col is None:
        from .textstats import token_counts

        counts = token_counts(docs, id_col=id_col).select(
            F.col(id_col).alias("doc_id"),
            F.col("n_bpe_tokens").cast("long").alias("n_tokens"),
        )
    else:
        counts = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
    counts = counts.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(int(n_shards))).cast("int")
    )

    b = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        seq, run, out = 0, 0, []
        for n in pdf["n_tokens"].to_numpy():
            if run > 0 and run + n > b:
                seq += 1
                run = 0
            run += int(n)
            out.append(seq)
        pdf["seq_idx"] = out
        return pdf[["doc_id", "shard", "seq_idx", "n_tokens"]]

    return counts.groupBy("shard").applyInPandas(_pack, PACK_SCHEMA)


def packed_stats(assignment: DataFrame, budget: int) -> DataFrame:
    """Per-sequence fill summary of a ``pack_sequences`` result:
    (shard, seq_idx, n_docs, seq_tokens, fill) — fill = seq_tokens/budget,
    > 1.0 only for single oversized documents."""
    return assignment.groupBy("shard", "seq_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        (F.sum("n_tokens") / F.lit(float(budget))).alias("fill"),
    )
