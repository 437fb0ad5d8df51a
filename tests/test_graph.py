"""Numpy power-iteration pin for the rows-only PageRank query
(operators/graph.py)."""

from __future__ import annotations

import duckdb
import numpy as np

from conftest import SF_SMOKE

from tp1_distribuidos_mapreduce_spark import registry
from tp1_distribuidos_mapreduce_spark.operators import graph as GR


def _reference_pagerank(sf_dir: str):
    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM '{sf_dir}/lineitem.parquet'
        ), und AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        )
        SELECT a AS src, b AS dst FROM und
        UNION ALL
        SELECT b, a FROM und
        """
    ).fetchall()
    con.close()
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    d = GR.PAGERANK_DAMPING
    for _ in range(GR.PAGERANK_ITERS):
        mass = np.zeros(n)
        contrib = rank / out_deg
        for s, t in edges:
            mass[idx[t]] += contrib[idx[s]]
        rank = (1.0 - d) / n + d * mass
    return nodes, out_deg, rank


def test_pagerank_matches_numpy(spark):
    nodes, out_deg, rank = _reference_pagerank(SF_SMOKE)
    rows = registry.queries()["pagerank_copurchase"](spark, SF_SMOKE).collect()
    assert [r["part_id"] for r in rows] == nodes
    got_deg = np.array([r["out_deg"] for r in rows])
    np.testing.assert_array_equal(got_deg, out_deg)
    got = np.array([r["rank"] for r in rows])
    # Spark's partial-sum order perturbs ranks at the last ulp; the 6dp
    # output rounding dominates any engine difference.
    assert np.abs(got - np.round(rank, 6)).max() <= 1.01e-6


def test_pagerank_is_a_distribution(spark):
    rows = registry.queries()["pagerank_copurchase"](spark, SF_SMOKE).collect()
    total = sum(r["rank"] for r in rows)
    # No dangling nodes in an undirected graph → ranks sum to 1 (up to
    # the 6dp rounding × node count).
    assert abs(total - 1.0) <= 5e-7 * len(rows) + 1e-6
    assert all(r["rank"] > 0 for r in rows)
