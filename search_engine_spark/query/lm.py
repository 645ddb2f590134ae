"""Dirichlet-smoothed language-model ranking (second similarity).

Lucene-parity feature (``LMDirichletSimilarity``): per matched query term

    score(t, D) = qtf(t) * [ ln(1 + tf / (mu * P(t|C))) + ln(mu / (dl + mu)) ]
    P(t|C)      = cf(t) / |C|

with cf(t) = total occurrences of t in the corpus and |C| = total token
count (n_docs * avgdl — exact, since avgdl is the arithmetic mean of kept
doc lengths). mu defaults to Lucene's 2000. Swapping similarities is a
first-class production-engine capability the BM25/tf-idf pair alone does
not demonstrate.

Scale shape (100 TB story): identical to the BM25 DataFrame path — ONE
tbucket-pruned, term-IN-pushed posting scan. cf(t) is a static per-term
scalar computed at BUILD time (``index.build.build_term_stats`` folds a
``sum(tf)`` into the job that already computes df) and read from the
broadcast term_stats join like ``bm25_idf`` — zero query-time shuffles
beyond BM25's own; the per-doc fold reuses the sorted-term
conditional-sum kernel so scores are deterministic bit-for-bit. Stores
built before the cf column fall back to a window over the pruned scan
(one partition per query term — correct, but skew-prone at head terms;
rebuild or compact to upgrade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.storage import IndexStore

LM_MU = 2000.0


def lm_dirichlet_topk(
    spark: SparkSession,
    store: IndexStore,
    terms: list[str],
    k: int = 10,
    mu: float = LM_MU,
) -> DataFrame:
    """Top-k (doc_id, score) under Dirichlet-smoothed query likelihood."""
    from .bm25 import _per_term_sum, candidates_for_terms

    cand = candidates_for_terms(spark, store, terms, with_cf=True)
    if cand is None:
        return spark.createDataFrame([], "doc_id long, score double")
    cstats = store.corpus_stats()
    total_tokens = float(cstats["n_docs"]) * float(cstats["avgdl"])

    if "cf" in cand.columns:
        # build-time collection frequency, broadcast with the stats join:
        # integer-exact (sum of tf), bit-identical to the window sum below
        scored = cand.withColumn("cf", F.col("cf").cast("double"))
    else:
        # pre-cf store: window-sum over the term partition — the pruned
        # posting scan is read once, but every posting of a query term
        # lands in ONE window partition (skewed at head terms; kept only
        # as the legacy-store fallback). Integer tf sums are exact in
        # doubles, so partition order cannot perturb cf.
        from pyspark.sql import Window

        scored = cand.withColumn(
            "cf",
            F.sum(F.col("tf").cast("double")).over(Window.partitionBy("term")),
        )

    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    p_c = F.col("cf") / F.lit(total_tokens)
    term_score = F.col("qtf") * (
        F.log(F.lit(1.0) + tf / (F.lit(mu) * p_c))
        + F.log(F.lit(mu) / (dl + F.lit(mu)))
    )
    cols, fold = _per_term_sum(sorted(set(terms)))
    agg = (
        scored.withColumn("term_score", term_score)
        .groupBy("doc_id")
        .agg(*cols)
        .select("doc_id", fold.alias("score"))
    )
    from ..index.deletes import topk_live

    return topk_live(spark, store, agg, k)
