"""Iterative connected components (large-star / small-star).

DataFrame-only implementation of the alternating star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), per the north rule (/root/repo/BASELINE.json:6,14):
self-joins with checkpointed lineage, O(log n) rounds expected.

Contract: input is an edge list (src, dst); output assigns every node
appearing in the edge list to component id = the minimum node id in
its component.  Singleton handling (nodes with no edges) is the
caller's job — see operators.dedup.cluster_assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    # for each u: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient edges toward smaller ids: (u, v) with v < u
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    joined = oriented.join(mins, "src")
    # emit (v, m) for each small neighbor v, plus (u, m)
    out = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        joined.select(F.col("src"), F.col("m").alias("dst"))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    checkpoint_every: int = 1,
    check_from_iteration: int = 2,
) -> DataFrame:
    """Resolve components over an undirected edge list.

    Returns DataFrame(node long, component long) for every node that
    appears in `edges`; component = min node id of the component.
    Lineage is cut with localCheckpoint each round so the loop's plan
    stays bounded (north-rule requirement: checkpointed lineage).
    """
    current = (
        edges.selectExpr("cast(src as long) src", "cast(dst as long) dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    # fixpoint test: edge multiset stable under a cheap signature
    # (bit_xor is overflow-free under ANSI mode and order-insensitive).
    # Duplicate-cluster graphs (near-cliques from bucket joins) need
    # 2-3 star rounds, so the convergence probe — one agg action per
    # round — only starts at `check_from_iteration`.
    sig_expr = [
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
    ]
    prev_sig = None

    for iteration in range(max_iterations):
        stepped = _small_star(_large_star(current))
        stepped = stepped.localCheckpoint() if (iteration % checkpoint_every == 0) else stepped
        current = stepped
        if iteration + 1 >= check_from_iteration:
            next_sig = current.agg(*sig_expr).first()
            if next_sig == prev_sig:
                break
            prev_sig = next_sig

    # after convergence every edge points node -> component root;
    # roots themselves appear only as dst
    assignments = current.select(
        F.col("src").alias("node"), F.col("dst").alias("component")
    )
    roots = current.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return (
        assignments.unionByName(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
