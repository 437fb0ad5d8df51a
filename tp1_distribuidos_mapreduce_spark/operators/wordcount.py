"""The reference's two shipped queries, Spark-first.

- word count     → reference plugins/wc/wc.go (Map: tokenize+lower emit
  (word,"1"), wc.go:11-21; Reduce: len(values), wc.go:24-26)
- inverted index → reference plugins/ii/ii.go (Map: tokenize+lower emit
  (word, filename), ii.go:12-23; Reduce: distinct+sort+comma-join,
  ii.go:26-41)

Design notes vs the reference (SURVEY.md §2, §4.2):

- Catalyst inserts a partial HashAggregate before the exchange — the
  reference shuffles every ``(word,"1")`` pair with no combiner, so at scale
  our shuffle volume is O(distinct words per partition), theirs O(tokens).
- Counts are typed bigint, doc lists typed array<string>; stringly-typed
  values (wc.go:18's Value:"1") exist only at the text-sink boundary.
- ``collect_set`` + ``sort_array`` reproduces ii's true spec: first-seen
  order in ii.go:31-36 is discarded by the sort at ii.go:38, so
  sorted-distinct-set IS the semantics (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import words_from


def word_count(corpus: DataFrame, text_col: str = "value") -> DataFrame:
    """(word string, cnt bigint), ordered by word — exercises O5-O8, O10, O14."""
    return (
        words_from(corpus, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("word")
    )


def inverted_index(
    corpus: DataFrame, text_col: str = "value", doc_col: str = "doc_id"
) -> DataFrame:
    """(word string, docs string, docs_arr array<string>), ordered by word.

    ``docs`` is the reference's comma-joined rendering (ii.go:40); the typed
    ``docs_arr`` is the modern surface (FIXTURES.md expects both).
    """
    words = words_from(corpus, text_col, doc_col)
    return (
        words.groupBy("word")
        .agg(F.sort_array(F.collect_set(F.col(doc_col).cast("string"))).alias("docs_arr"))
        .select(
            "word",
            F.array_join("docs_arr", ",").alias("docs"),
            "docs_arr",
        )
        .orderBy("word")
    )
