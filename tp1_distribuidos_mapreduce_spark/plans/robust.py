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
    Every term is 64-bit integer arithmetic over identical inputs — the
    division to double happens exactly once on identical integers, so
    the 6dp rounding is deterministic cross-engine. One per-source
    window (rank by n_chars, doc_id tiebreak for a total order) + one
    aggregate; no global sort.
    """
    w = Window.partitionBy("source").orderBy("w", "doc_id")
    ranked = documents.select(
        "source", "doc_id", F.col("n_chars").cast("long").alias("w")
    ).withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                (2 * F.sum(F.col("i") * F.col("w")) - (F.count(F.lit(1)) + 1) * F.sum("w"))
                / (F.count(F.lit(1)) * F.sum("w")),
                6,
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
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round((2 * sum(i * w) - (count(*) + 1) * sum(w))
             / CAST(count(*) * sum(w) AS DOUBLE), 6) AS gini
FROM ranked
GROUP BY source
ORDER BY source
"""
