"""Graph analytics beyond connected components (operators/dedup.py):
PageRank over the part co-purchase graph — the influence/centrality
measure a recommender or curation pipeline runs over an item graph.

Graph construction reuses the market-basket shape (plans/retail.py):
per-order distinct part sets built with ONE groupBy (basket sizes are
bounded), pairs expanded IN-ROW, deduplicated to an undirected edge
list. PageRank then iterates rank ← (1−d)/N + d·Σ rank/out_degree over
the edge list:

- Each round is one edge⨝ranks join (ranks are node-cardinality; edges
  carry the data weight) plus a destination-keyed aggregate — the
  textbook distributed formulation, linear in |edges| per round. While
  the node table fits executor memory the ranks side is BROADCAST, so
  the cached edge table is never shuffled inside the loop (measured 3×
  at sf0.1); past PAGERANK_BROADCAST_NODE_LIMIT it degrades gracefully
  to the shuffled equi-join.
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
# Broadcast the node-cardinality ranks frame into the per-round edge join
# while it plausibly fits executor memory (~24 bytes/node → ~24 MB at the
# limit); beyond that fall back to the shuffled equi-join. At sf0.1 the
# broadcast variant measured 19.8s → 6.6s (adjacent idle A/B, identical
# output): the per-round shuffle of the EDGE table is what it removes.
PAGERANK_BROADCAST_NODE_LIMIT = 1_000_000


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
    bcast = n_nodes <= PAGERANK_BROADCAST_NODE_LIMIT
    for _ in range(n_iter):
        contribs = (
            edges.join(F.broadcast(ranks) if bcast else ranks, "src")
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


def copurchase_jaccard(lineitem: DataFrame, top_k: int = 50) -> DataFrame:
    """Item-item Jaccard similarity over co-purchase baskets — the
    collaborative-filtering neighbor table (sim(a,b) = |orders with
    both| / |orders with either|), reported as the global top-k pairs.

    Shape: basket-bounded in-row pair expansion (the market_basket /
    pagerank edge discipline — never a part×part cross), one pair-keyed
    count, one part-keyed basket count joined TWICE by key (item
    cardinality ≪ pair cardinality, a plain shuffled equi-join at any
    scale), and a deterministic (jaccard DESC, a, b) top-k cut. The
    Jaccard itself is an exact integer ratio evaluated identically by
    both engines, so ordering and rounding are deterministic.
    """
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pair_counts = (
        baskets.where(F.size("parts") >= 2)
        .select(F.explode(_pairs_within("parts")).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    part_counts = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count("*").alias("n_part"))
    )
    na = part_counts.select(F.col("part").alias("a"), F.col("n_part").alias("n_a"))
    nb = part_counts.select(F.col("part").alias("b"), F.col("n_part").alias("n_b"))
    return (
        pair_counts.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab")
                / (F.col("n_a") + F.col("n_b") - F.col("n_ab")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
        .limit(top_k)
    )


COPURCHASE_JACCARD_ORACLE = """
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
), pairs AS (
  SELECT a.l_orderkey, a.l_partkey AS a, b.l_partkey AS b
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), pair_counts AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM pairs GROUP BY a, b
), part_counts AS (
  SELECT l_partkey AS part, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_part
  FROM lineitem GROUP BY l_partkey
)
SELECT p.a, p.b, p.n_ab,
       x.n_part AS n_a, y.n_part AS n_b,
       round(p.n_ab / CAST(x.n_part + y.n_part - p.n_ab AS DOUBLE), 6) AS jaccard
FROM pair_counts p
JOIN part_counts x ON p.a = x.part
JOIN part_counts y ON p.b = y.part
ORDER BY jaccard DESC, p.a, p.b
LIMIT 50
"""
