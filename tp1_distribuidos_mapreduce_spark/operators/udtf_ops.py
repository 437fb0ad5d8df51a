"""Python UDTF surface: the official table-function API for 1→N expansion.

The reference's Map contract (`Map(filename, contents) []KeyValue`,
seq/sequential.go:14) is a user-defined TABLE function: one input record,
many output records. operators/mapreduce.py realizes it with Arrow-batched
``mapInPandas`` (the throughput shape); this module demonstrates the other
official Spark surface for the same contract — ``pyspark.sql.functions.udtf``
— which composes lazily in the middle of a SELECT (`.lateralJoin` /
`LATERAL`) instead of consuming a whole DataFrame.

Scale notes: a UDTF evaluates row-at-a-time in Python workers; with
``useArrow=True`` input batches transfer via Arrow but eval is still
per-row. Use it for low-volume / high-fanout expansion where plan
composability matters; keep bulk tokenization on `explode(split(...))`
(JVM, codegen) or mapInPandas.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Engine-portable sentence boundary: RE2-compatible (no lookbehind) AND
# whitespace spelled out as RE2's exact \s class [\t\n\f\r ] — Python's \s
# and str.split() are Unicode-aware (match U+00A0 etc.), so relying on
# them would silently diverge from the DuckDB oracle on non-ASCII spaces.
_WS = "[\t\n\x0c\r ]"
_SENT_RE = re.compile(rf"[.!?]+{_WS}+")
_WORD_RE = re.compile(rf"{_WS}+")


def _sentences_udtf():
    """Factory: @udtf at module scope would bind before any session exists
    (same trap as module-level pandas_udf — see the verify skill notes)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="sent_id int, sentence string, n_words int",
        useArrow=False,
    )
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001 — UDTF contract
            if text is None:
                return
            for i, raw in enumerate(_SENT_RE.split(text)):
                words = [w for w in _WORD_RE.split(raw) if w]
                if words:
                    yield i, raw.strip("\t\n\x0c\r "), len(words)

    return SplitSentences


def sentence_stats(documents: DataFrame) -> DataFrame:
    """Per-document sentence statistics via a lateral UDTF join:
    (doc_id, n_sentences, avg_sentence_words, max_sentence_words)."""
    SplitSentences = _sentences_udtf()
    exploded = documents.lateralJoin(
        SplitSentences(F.col("text").outer()).alias("s")
    )
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            # integer word counts: half-up integer division at 4dp
            # (round(avg(int)) ties at the 5th decimal and float
            # partial-sum order decides the side).
            (
                F.expr(
                    "(20000 * sum(n_words) + count(n_words))"
                    " div (2 * count(n_words))"
                )
                / 10000.0
            ).alias("avg_sentence_words"),
            F.max("n_words").alias("max_sentence_words"),
        )
        .orderBy("doc_id")
    )


SENTENCE_STATS_ORACLE = r"""
WITH sents AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(s, '[\t\n\f\r ]+'), w -> w <> ''))
           AS n_words
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+[\t\n\f\r ]+')) AS s
    FROM documents
  )
)
SELECT doc_id,
       count(*) AS n_sentences,
       ((20000 * CAST(sum(n_words) AS BIGINT) + count(n_words))
        // (2 * count(n_words))) / 10000.0 AS avg_sentence_words,
       max(n_words) AS max_sentence_words
FROM sents
WHERE n_words > 0
GROUP BY doc_id
ORDER BY doc_id
"""
