"""URL / domain analytics for web-corpus curation: extract link targets
from document text and report the per-domain footprint.

Additive LLM-pipeline surface (no reference counterpart — the reference's
text processing is the wc/ii tokenizer, SURVEY.md §2 O5/O6). Domain
censuses are the first pass of every web-scale curation pipeline (C4 /
RefinedWeb style): per-domain volume decides blocklists, crawl budgets,
and per-domain dedup keys before any content filter runs.

Scale shape: extraction is a map-only ``regexp_extract_all`` inside
whole-stage codegen (the pii_scrub discipline — the pattern is restricted
to the Java-regex/RE2 common subset); the explode emits only matched
URLs (sparse), and the census is a domain-keyed aggregate with map-side
combine. The share-of-total denominator is computed with a single-
partition window over the ALREADY-AGGREGATED domain frame (domain
cardinality, not corpus cardinality) — the same bounded-final-window
pattern the decile/quantile plans use.

The fixture corpus contains no URLs, so the query derives a deterministic
dirty variant from doc_id (the pii_scrub injection discipline) and the
oracle derives the exact same variant — extraction is exercised
non-trivially while remaining an exact differential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Scheme + host, host captured as group 1. Java-regex/RE2-common syntax
# only (character classes, no lookaround), identical semantics both sides.
URL_RE = r"https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+)[A-Za-z0-9./_-]*"


def _with_injected_urls(documents: DataFrame) -> DataFrame:
    """Every 3rd document gains a docs link, every 4th a CDN link — both
    derived from doc_id so Spark and the oracle inject identically."""
    site = F.concat(
        F.lit(" See https://site"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.org/page/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(" for details."),
    )
    cdn = F.concat(
        F.lit(" Asset at http://cdn"),
        (F.col("doc_id") % 11).cast("string"),
        F.lit(".example-cdn.net/a_"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".js here."),
    )
    dirty = F.col("text")
    dirty = F.when(F.col("doc_id") % 3 == 0, F.concat(dirty, site)).otherwise(dirty)
    dirty = F.when(F.col("doc_id") % 4 == 0, F.concat(dirty, cdn)).otherwise(dirty)
    return documents.withColumn("dirty", dirty)


def url_domain_stats(documents: DataFrame) -> DataFrame:
    """Per-domain link census: (domain, n_urls, n_docs, url_share).

    ``n_docs`` counts distinct documents linking to the domain;
    ``url_share`` is the domain's fraction of all extracted URLs (4dp).
    Map-only extraction → sparse explode → domain-keyed aggregate; the
    only unkeyed step is the share denominator over the domain-cardinality
    result frame.
    """
    d = _with_injected_urls(documents)
    hosts = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("dirty"), F.lit(URL_RE), 1)).alias(
            "domain"
        ),
    )
    per_domain = hosts.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    total = Window.partitionBy()
    return (
        per_domain.withColumn("tot", F.sum("n_urls").over(total))
        .select(
            "domain",
            "n_urls",
            "n_docs",
            # half-up integer division at 4dp (integer-count ratio ties
            # at the 5th decimal; float round() splits the engines).
            (F.expr("(20000 * n_urls + tot) div (2 * tot)") / 10000.0).alias(
                "url_share"
            ),
        )
        .orderBy("domain")
    )


URL_DOMAIN_STATS_ORACLE = rf"""
WITH dirty1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' See https://site' || CAST(doc_id % 20 AS VARCHAR)
                        || '.example.org/page/' || CAST(doc_id % 7 AS VARCHAR)
                        || ' for details.'
              ELSE text END AS d1
  FROM documents
), dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN d1 || ' Asset at http://cdn' || CAST(doc_id % 11 AS VARCHAR)
                      || '.example-cdn.net/a_' || CAST(doc_id % 5 AS VARCHAR)
                      || '.js here.'
              ELSE d1 END AS dirty
  FROM dirty1
), hosts AS (
  SELECT doc_id, unnest(regexp_extract_all(dirty, '{URL_RE}', 1)) AS domain
  FROM dirty
), per_domain AS (
  SELECT domain,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM hosts GROUP BY domain
)
SELECT domain, n_urls, n_docs,
       ((20000 * n_urls + tot) // (2 * tot)) / 10000.0 AS url_share
FROM (
  SELECT domain, n_urls, n_docs, sum(n_urls) OVER () AS tot
  FROM per_domain
)
ORDER BY domain
"""
