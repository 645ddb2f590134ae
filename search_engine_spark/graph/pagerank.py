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
