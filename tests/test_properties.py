"""Property-based differential tests (hypothesis): the tokenizer and wc
semantics must agree with the DuckDB oracle on arbitrary unicode inputs —
the reference's case/punctuation test classes (tests/test_wc.py:82-162)
generalized from fixed strings to generated ones."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tp1_distribuidos_mapreduce_spark.operators.wordcount import word_count

# text with letters (several scripts), digits, punctuation, whitespace
_ALPHABET = st.sampled_from(
    list("abcXYZñÑüÜßλΩ日本語0123456789 \t\n.,;:!?¡¿'\"-_()[]{}@#$%&*+=/\\|~`^")
)
_TEXTS = st.lists(st.text(_ALPHABET, max_size=80), min_size=1, max_size=6)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS)
def test_wordcount_matches_duckdb_on_arbitrary_text(spark, texts):
    corpus = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, value string"
    )
    got = {(r.word, r.cnt) for r in word_count(corpus).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (text VARCHAR)")
    for t in texts:
        con.execute("INSERT INTO docs VALUES (?)", [t])
    want = set(
        con.sql(
            r"""
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^\p{L}]+')) AS word
                  FROM docs)
            WHERE word <> ''
            GROUP BY word
            """
        ).fetchall()
    )
    con.close()
    assert got == want
