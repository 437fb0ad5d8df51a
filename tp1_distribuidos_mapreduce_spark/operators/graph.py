"""Graph analytics beyond connected components (operators/dedup.py):
PageRank over the part co-purchase graph — the influence/centrality
measure a recommender or curation pipeline runs over an item graph.

Graph construction reuses the market-basket shape (plans/retail.py):
per-order distinct part sets built with ONE groupBy (basket sizes are
bounded), pairs expanded IN-ROW, deduplicated to an undirected edge
list. PageRank then iterates rank ← (1−d)/N + d·Σ rank/out_degree over
the edge list:

- Each round is one edge-keyed join (ranks are node-cardinality; edges
  carry the data weight) plus a destination-keyed aggregate — the
  textbook distributed formulation, linear in |edges| per round.
- The ranks frame is ``localCheckpoint``-ed every round: the iterative-
  DataFrame lesson from connected components (planning time doubles per
  round otherwise). No driver collect inside the loop — the loop body
  is pure plan construction; the fixed iteration count means no
  convergence action either.
- An undirected co-occurrence graph has no dangling nodes (every node
  in the edge list has degree ≥ 1), so the dangling-mass correction
  term vanishes and the per-round plan stays join + aggregate.

Float partial-sum order perturbs ranks at the last ulp → rows-only
driver check; tests/test_graph.py pins every node's rank against a
numpy power-iteration reference well inside the 6dp output rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _pairs_within

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 10


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected co-purchase edge list as directed rows (a→b and b→a),
    deduplicated: (src, dst)."""
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .where(F.size("parts") >= 2)
    )
    pairs = baskets.select(F.explode(_pairs_within("parts")).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    undirected = pairs.distinct()
    return undirected.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(undirected.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def pagerank_copurchase(
    lineitem: DataFrame,
    damping: float = PAGERANK_DAMPING,
    n_iter: int = PAGERANK_ITERS,
) -> DataFrame:
    """PageRank over the co-purchase graph: (part_id, out_degree, rank).

    Deterministic contract: fixed ``n_iter`` rounds from the uniform
    start, rank rounded at 6dp in the output (partial-sum order wobbles
    the last ulp only). Returns every node, ordered by part_id.
    """
    edges = copurchase_edges(lineitem).localCheckpoint()
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n_nodes = degrees.count()
    base = (1.0 - damping) / n_nodes

    ranks = degrees.select(
        "src", F.lit(1.0 / n_nodes).alias("rank"), "out_deg"
    ).localCheckpoint()
    for _ in range(n_iter):
        contribs = (
            edges.join(ranks, "src")
            .select(F.col("dst").alias("src"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            degrees.join(contribs, "src", "left")
            .select(
                "src",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
                "out_deg",
            )
            .localCheckpoint()
        )
    return ranks.select(
        F.col("src").alias("part_id"),
        "out_deg",
        F.round("rank", 6).alias("rank"),
    ).orderBy("part_id")
