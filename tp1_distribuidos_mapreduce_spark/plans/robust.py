"""Robust/inequality statistics: percentile-trimmed means and Gini
coefficients — the outlier-resistant summary layer a data-quality
dashboard runs next to the plain aggregates (plans/relational.py).

Both queries follow the repo's exact-arithmetic oracle discipline
(verify notes / ADVICE r7): threshold comparisons use percent_rank —
an exact rational (rank−1)/(n−1) both engines compute identically from
identical integers — and every mean is an integer-cents half-up
division, never a float avg() that can land on a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def trimmed_mean_price(part: DataFrame, trim: float = 0.1) -> DataFrame:
    """Per-brand mean retail price after trimming the cheapest and most
    expensive ``trim`` fraction — the robust location estimate that one
    mispriced SKU cannot move, unlike the plain avg beside it.

    Rows with percent_rank in [trim, 1−trim] survive; percent_rank is
    (rank−1)/(n−1) — ties share a rank, both engines agree exactly. The
    trimmed mean itself is computed in integer cents with half-up
    division ((sum + n/2) div n), so no float-boundary flake surface
    exists (the corpus_curation lesson). One window + one aggregate,
    both partitioned by brand — no global ordering at any scale.
    """
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    kept = (
        part.select("p_brand", "p_retailprice", cents.alias("cents"))
        .withColumn("pr", F.percent_rank().over(w))
        .where((F.col("pr") >= trim) & (F.col("pr") <= 1 - trim))
    )
    sum_c = F.sum("cents")
    n = F.count(F.lit(1))
    return (
        kept.groupBy("p_brand")
        .agg(
            n.cast("long").alias("n_kept"),
            (
                F.expr("(sum(cents) + count(1) div 2) div count(1)") / 100.0
            ).alias("trimmed_mean"),
        )
        .orderBy("p_brand")
    )


TRIMMED_MEAN_ORACLE = """
WITH ranked AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
         percent_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice)
           AS pr
  FROM part
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_kept,
       ((sum(cents) + count(*) // 2) // count(*)) / 100.0 AS trimmed_mean
FROM ranked
WHERE pr >= 0.1 AND pr <= 0.9
GROUP BY p_brand
ORDER BY p_brand
"""


def source_gini(documents: DataFrame) -> DataFrame:
    """Gini coefficient of document-length mass per source — the corpus
    balance census: 0 = every doc contributes equal text, →1 = a few
    giants dominate. The number a mixture designer reads next to
    source_mix_weights before setting sampling rates.

    Formula (sorted ascending, i = 1..n):
      G = (2·Σ i·wᵢ − (n+1)·Σ wᵢ) / (n·Σ wᵢ)
    Every term is 64-bit integer arithmetic over identical inputs, and
    the 6dp rounding runs as HALF-UP INTEGER division — even on
    identical doubles, Spark's shortest-repr round and DuckDB's
    raw-double round split when the exact rational lands on a 7th-
    decimal .5 boundary. One per-source window (rank by n_chars, doc_id
    tiebreak for a total order) + one aggregate; no global sort. BIGINT
    headroom: 2e6·num overflows past ~4.6e12 char-rank mass per source.
    """
    w = Window.partitionBy("source").orderBy("w", "doc_id")
    ranked = documents.select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("w")
    ).withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("i") * F.col("w")).alias("siw"),
            F.sum("w").alias("sw"),
        )
        .select(
            "source",
            "n_docs",
            (
                F.expr(
                    "(2000000 * (2 * siw - (n_docs + 1) * sw) + n_docs * sw)"
                    " div (2 * n_docs * sw)"
                )
                / 1000000.0
            ).alias("gini"),
        )
        .orderBy("source")
    )


SOURCE_GINI_ORACLE = """
WITH ranked AS (
  SELECT source, CAST(n_chars AS BIGINT) AS w,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars, doc_id) AS BIGINT) AS i
  FROM documents
), g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(i * w) AS BIGINT) AS siw,
         CAST(sum(w) AS BIGINT) AS sw
  FROM ranked
  GROUP BY source
)
SELECT source, n_docs,
       ((2000000 * (2 * siw - (n_docs + 1) * sw) + n_docs * sw)
        // (2 * n_docs * sw)) / 1000000.0 AS gini
FROM g
ORDER BY source
"""


# --------------------------------------------------------------------------
# 2D Pareto frontier (skyline) and nucleus (top-p) coverage cut
# --------------------------------------------------------------------------


def pareto_frontier_parts(part: DataFrame) -> DataFrame:
    """The price/size skyline: parts not dominated by any part that is
    cheaper-or-equal AND smaller-or-equal with at least one strict —
    the multi-objective 'best value' shortlist.

    2D skylines need no pairwise join. Reduce to one row per distinct
    price (the per-price minimum size — anything above it is dominated
    within its own price), then one ordered window over the DISTINCT
    PRICES computes the running minimum size of all strictly cheaper
    prices (a ROWS frame is exact here because each row IS one price).
    A price's minimum-size points survive iff that running minimum is
    absent or strictly larger. Ties on (price, size) are mutually
    non-dominating and all survive via the final equi-join back to the
    part rows. The only global window runs over |distinct prices| ≪
    |parts| aggregated rows; at fact scale you'd add the standard local-
    skyline-then-merge first pass. All comparisons are exact (doubles
    compared for order only, never arithmetic).
    """
    pts = part.select("p_partkey", "p_retailprice", "p_size")
    per_price = pts.groupBy("p_retailprice").agg(
        F.min("p_size").alias("gmin")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_prices = (
        per_price.withColumn("m", F.min("gmin").over(w))
        .where(F.col("m").isNull() | (F.col("gmin") < F.col("m")))
        # Renamed to break lineage with pts before the self-derived join
        # (same-attribute refs make the equality trivially true).
        .select(
            F.col("p_retailprice").alias("f_price"),
            F.col("gmin").alias("f_size"),
        )
    )
    return (
        pts.join(
            F.broadcast(frontier_prices),
            (F.col("p_retailprice") == F.col("f_price"))
            & (F.col("p_size") == F.col("f_size")),
        )
        .select(
            "p_partkey",
            "p_retailprice",
            F.col("p_size").cast("long").alias("p_size"),
        )
        .orderBy("p_retailprice", "p_partkey")
    )


PARETO_FRONTIER_ORACLE = """
WITH per_price AS (
  SELECT p_retailprice, min(p_size) AS gmin
  FROM part GROUP BY p_retailprice
), frontier AS (
  SELECT p_retailprice, gmin,
         min(gmin) OVER (ORDER BY p_retailprice
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS m
  FROM per_price
)
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p
JOIN frontier f
  ON p.p_retailprice = f.p_retailprice AND p.p_size = f.gmin
WHERE f.m IS NULL OR f.gmin < f.m
ORDER BY p.p_retailprice, p.p_partkey
"""


def nucleus_token_cut(documents: DataFrame, permille: int = 900) -> DataFrame:
    """Per-source nucleus (top-p) coverage cut: the smallest set of
    longest documents covering ``permille``‰ of the source's character
    mass, reported as (source, n_docs_total, n_docs_nucleus,
    nucleus_chars) — the top-p analogue of customer_ltv_pareto applied
    to corpus curation (how concentrated is each feed; what survives a
    '90% of tokens' budget cut).

    A doc is in the nucleus iff the cumulative mass of docs at least as
    long (longest-first walk, doc_id tiebreak) minus its own weight is
    still below the threshold — i.e. the doc crosses or precedes the
    p-line. The gate is exact integer arithmetic: 1000·(cum−w) <
    permille·total, no float division anywhere (the
    customer_ltv_pareto integer-head-gate discipline). One per-source
    window + one aggregate.
    """
    w = Window.partitionBy("source").orderBy(
        F.desc("w"), F.asc("doc_id")
    )
    ranked = (
        documents.select(
            "source", "doc_id", F.col("n_chars").cast("long").alias("w")
        )
        .withColumn("cum", F.sum("w").over(w).cast("long"))
        .withColumn(
            "total", F.sum("w").over(Window.partitionBy("source")).cast("long")
        )
    )
    in_nucleus = (1000 * (F.col("cum") - F.col("w"))) < (
        permille * F.col("total")
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_total"),
            F.sum(in_nucleus.cast("long")).cast("long").alias("n_docs_nucleus"),
            F.sum(F.when(in_nucleus, F.col("w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("nucleus_chars"),
        )
        .orderBy("source")
    )


NUCLEUS_CUT_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n_chars) OVER (PARTITION BY source) AS total
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_total,
       CAST(sum(CASE WHEN 1000 * (cum - w) < 900 * total THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_nucleus,
       CAST(sum(CASE WHEN 1000 * (cum - w) < 900 * total THEN w ELSE 0 END)
            AS BIGINT) AS nucleus_chars
FROM ranked
GROUP BY source
ORDER BY source
"""
