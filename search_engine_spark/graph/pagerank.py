"""DataFrame PageRank — the popularity prior (G1).

Reference semantics (``Popularity/PageRank.java:18-95``): d=0.85, uniform
init 1/N, dangling mass redistributed uniformly, L1-normalize every
iteration, converge on max |delta| < 1e-6, cap 100 iterations. The reference
loops O(V*E) single-threaded over an in-memory adjacency map; here each
iteration is an edge join + aggregate (shuffle hash join on src), with the
rank vector checkpointed via localCheckpoint every few iterations to truncate
lineage — the standard scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85          # PageRank.java:18
EPSILON = 1e-6          # PageRank.java:19
MAX_ITERATIONS = 100    # PageRank.java:20

DEFAULT_POPULARITY = 0.5  # fixture default, query_results.json popularity


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    epsilon: float = EPSILON,
    max_iter: int = MAX_ITERATIONS,
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges: (src, dst). Returns (node, rank). Nodes = union of src/dst."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg")).persist()
    # nodes with no out-edges contribute dangling mass; detect once
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.src, "left_anti"
    ).persist()
    has_dangling = dangling_nodes.limit(1).count() > 0
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()

    for it in range(max_iter):
        prev = ranks
        contribs = (
            edges.join(prev, edges.src == prev.node)
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        # dangling mass redistributed uniformly (PageRank.java:46-50);
        # skipped entirely when the graph has no dangling nodes
        dangling = 0.0
        if has_dangling:
            dangling = (
                dangling_nodes.join(prev, "node").agg(F.sum("rank")).collect()[0][0]
                or 0.0
            )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
            ).alias("rank"),
        )
        # L1 normalize (PageRank.java:65-69); localCheckpoint truncates the
        # per-iteration lineage so plans stay O(1) deep
        new_ranks = new_ranks.localCheckpoint()
        total = new_ranks.agg(F.sum("rank")).collect()[0][0]
        new_ranks = new_ranks.withColumn(
            "rank", F.col("rank") / F.lit(total)
        ).localCheckpoint()
        ranks = new_ranks
        # convergence on max |delta| (PageRank.java:85-95); with epsilon<=0
        # the caller wants exactly max_iter iterations (oracle parity mode)
        if epsilon > 0:
            delta = (
                new_ranks.alias("n")
                .join(prev.alias("p"), "node")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("p.rank"))))
                .collect()[0][0]
            )
            if delta is not None and delta < epsilon:
                break
    return ranks


def conversation_graph(docs: DataFrame) -> DataFrame:
    """Derive a conversation-reference graph from the transcripts corpus
    (SURVEY.md §2.10 "transcripts analog"): within a conversation each turn
    endorses the previous turn (reply structure), and tool turns endorse the
    assistant turn that invoked them. Deterministic, derived purely from
    the corpus — the analog of pages.outgoingLinks (PageRank.java:97-136)."""
    a = docs.select("doc_id", "conv_id", "turn_idx", "role")
    b = docs.select(
        F.col("doc_id").alias("prev_doc_id"),
        F.col("conv_id").alias("p_conv"),
        F.col("turn_idx").alias("p_idx"),
    )
    return (
        a.join(
            b,
            (a.conv_id == b.p_conv) & (a.turn_idx == b.p_idx + 1),
        )
        .select(F.col("doc_id").alias("src"), F.col("prev_doc_id").alias("dst"))
    )


def write_popularity(spark, store, ranks: DataFrame) -> None:
    """G2 rank->popularity writeback (PageRank.java:138-171): join ranks
    onto the doc registry and rewrite it with a ``popularity`` column
    (min-max scaled to [0,1] like a prior; docs outside the graph get the
    fixture default 0.5)."""
    docs = store.docs(spark)
    stats = ranks.agg(
        F.min("rank").alias("lo"), F.max("rank").alias("hi")
    ).collect()[0]
    lo, hi = float(stats["lo"] or 0.0), float(stats["hi"] or 1.0)
    span = (hi - lo) or 1.0
    scaled = ranks.select(
        F.col("node").alias("doc_id"),
        ((F.col("rank") - F.lit(lo)) / F.lit(span)).alias("popularity"),
    )
    out = docs.drop("popularity").join(scaled, "doc_id", "left").withColumn(
        "popularity", F.coalesce(F.col("popularity"), F.lit(DEFAULT_POPULARITY))
    )
    # rewrite via a temp dir: the source of the plan is the same parquet dir.
    # The swap goes through IndexStore (Iceberg equivalent: overwrite commit)
    # so operator code never touches the filesystem directly.
    tmp = store.docs_path + "_tmp"
    out.write.mode("overwrite").parquet(tmp)
    store.replace_dir(tmp, store.docs_path)
