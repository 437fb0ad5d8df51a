"""Corpus-level vocabulary analytics: the dataset-card summary a training
run publishes, and the first round of byte-pair-merge statistics a
tokenizer-training pipeline computes.

Additive LLM-pipeline surface (no reference counterpart; the reference
stops at wc/ii — SURVEY.md §2 O5-O9 — these are the corpus-wide rollups
built on the same tokenize() contract).

Scale shapes:
- corpus_card: one explode → two aggregates. The vocab count shuffles
  distinct (source, word) pairs — the wc shape, bounded by vocabulary not
  corpus size after the map-side partial distinct.
- bpe_pair_counts: per-token character bigrams built IN-ROW (transform
  over substr) and pre-counted per token string, so the shuffle carries
  (pair, partial_count) rows bounded by distinct-token × pair-width — at
  100 TB you'd add a distinct-token pre-aggregate first, which is exactly
  what the `words` CTE shape here does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize

BPE_TOP_K = 30


def corpus_card(documents: DataFrame) -> DataFrame:
    """Per-source dataset-card row: docs, token totals, vocabulary size,
    and type-token ratio (vocab / total tokens, the classic lexical
    diversity signal; low TTR flags TEMPLATED/boilerplate sources).

    Integer-only aggregates plus one final ratio, so the differential is
    exact: the ratio divides two BIGINTs identically in both engines and
    rounds at 4dp (deterministic — same ints → same IEEE quotient).
    """
    t = F.filter(tokenize("text"), lambda x: x != "")
    d = documents.select("source", "doc_id", t.alias("t"))
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("t")).alias("total_tokens"),
    )
    vocab = (
        d.select("source", F.explode("t").alias("w"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("vocab_size"))
    )
    return (
        per_source.join(vocab, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "vocab_size",
            F.round(
                F.col("vocab_size") / F.greatest(F.col("total_tokens"), F.lit(1)), 4
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


CORPUS_CARD_ORACLE = r"""
WITH toks AS (
  SELECT source, doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), x -> x <> '') AS t
  FROM documents
), per_source AS (
  SELECT source, count(*) AS n_docs, sum(len(t)) AS total_tokens
  FROM toks GROUP BY source
), vocab AS (
  SELECT source, count(*) AS vocab_size
  FROM (SELECT DISTINCT source, unnest(t) AS w FROM toks)
  GROUP BY source
)
SELECT p.source,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(p.total_tokens AS BIGINT) AS total_tokens,
       CAST(v.vocab_size AS BIGINT) AS vocab_size,
       round(v.vocab_size / greatest(p.total_tokens, 1), 4) AS type_token_ratio
FROM per_source p JOIN vocab v USING (source)
ORDER BY p.source
"""


def bpe_pair_counts(documents: DataFrame, top_k: int = BPE_TOP_K) -> DataFrame:
    """The first byte-pair-merge round of tokenizer training: corpus-wide
    counts of adjacent character pairs inside tokens, top ``top_k`` by
    count (ties broken by pair text so the cut is deterministic).

    Plan: tokenize → explode to words → count words (the wc aggregate,
    collapsing the corpus to its distinct vocabulary) → build each word's
    character bigrams in-row → explode only VOCABULARY-sized data →
    weighted pair count. Pair frequencies over a 100 TB corpus thus
    shuffle |vocab| rows twice, never |corpus| — the same two-level
    rollup real BPE trainers (sentencepiece) use.
    """
    t = F.filter(tokenize("text"), lambda x: x != "")
    words = (
        documents.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    bigrams = F.expr(
        """
        CASE WHEN length(w) < 2 THEN array()
             ELSE transform(sequence(1, length(w) - 1),
                            i -> substring(w, i, 2))
        END
        """
    )
    return (
        words.select(F.explode(bigrams).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("pair"))
        .limit(top_k)
    )


BPE_PAIR_COUNTS_ORACLE = rf"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{{L}}]+'), x -> x <> '') AS t
  FROM documents
), words AS (
  SELECT w, count(*) AS wc
  FROM (SELECT unnest(t) AS w FROM toks)
  GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, greatest(length(w), 1)),
                               i -> substr(w, i, 2))) AS pair,
         wc
  FROM words
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY pair
ORDER BY n_pairs DESC, pair ASC
LIMIT {BPE_TOP_K}
"""
