"""Semantic unit tests for the round-7 curation operators: PII scrubbing,
repetition stats, incremental bloom dedup, shared-span dedup, and the
generic MERGE/upsert. The sf0.001 oracle differential in test_relational.py
covers the registered queries end-to-end; these pin the operator semantics
on tiny hand-computed inputs so a future regression localizes to the
operator, not the whole differential."""

from __future__ import annotations

from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.operators.dedup import (
    incremental_dedup,
    shared_span_pairs,
)
from tp1_distribuidos_mapreduce_spark.operators.textclean import (
    pii_scrub,
    repetition_stats,
)
from tp1_distribuidos_mapreduce_spark.plans.merge import merge_upsert

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOC_SCHEMA
    )


def test_pii_scrub_counts_and_redacts(spark):
    # doc 7 gets the injected trailer (7 % 7 == 0); doc 1 carries its own
    # email; doc 2 carries an IPv4; doc 3 is clean.
    docs = _docs(
        spark,
        [
            (1, "write to alice@example.org today", "a"),
            (2, "server at 192.168.0.1 down", "a"),
            (3, "nothing sensitive here", "b"),
            (7, "plain text", "b"),
        ],
    )
    got = {r["source"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert got["a"]["n_emails"] == 1 and got["a"]["n_ipv4"] == 1
    assert got["a"]["docs_with_email"] == 1 and got["a"]["docs_with_ipv4"] == 1
    # doc 7's trailer injects exactly one email and one IP into source b
    assert got["b"]["n_emails"] == 1 and got["b"]["n_ipv4"] == 1
    # redaction shrinks: 'alice@example.org' (17) -> '[EMAIL]' (7)
    assert got["a"]["chars_removed"] == (17 - 7) + (11 - 4)  # email + '192.168.0.1'->'[IP]'


def test_repetition_stats_fold_matches_hand_count(spark):
    # 'a b a b a' -> tokens 5, distinct 2 -> dup_frac 0.6
    # bigrams: 'a b','b a','a b','b a' -> 4 total, modal count 2 -> 0.5
    docs = _docs(spark, [(1, "a b a b a", "s"), (2, "x", "s"), (3, "", "s")])
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert rows[1]["n_tokens"] == 5 and rows[1]["dup_token_frac"] == 0.6
    assert rows[1]["n_bigrams"] == 4 and rows[1]["top_bigram_frac"] == 0.5
    # single-token and empty docs: no bigrams, zero fractions, no NULLs
    for d in (2, 3):
        assert rows[d]["n_bigrams"] == 0 and rows[d]["top_bigram_frac"] == 0.0


def test_incremental_dedup_flags_replays_only_when_base_has_original(spark):
    # doc 6 (%3==0) is fresh; doc 7 (%7==0, %3!=0) stays in base AND is
    # replayed -> its replay is the only duplicate; doc 21 (%3==0 and
    # %7==0) moved wholly to the new batch, so its replay is NOT a dup.
    docs = _docs(
        spark,
        [(6, "six", "s"), (7, "seven", "s"), (21, "twentyone", "s"), (8, "eight", "s")],
    )
    got = {r["source"]: r.asDict() for r in incremental_dedup(docs).collect()}
    # new batch: fresh {6, 21} + replays {7+1M, 21+1M} = 4 rows
    assert got["s"]["n_new"] == 4
    assert got["s"]["n_dup_vs_base"] == 1  # only replay of 7
    assert got["s"]["n_kept"] == 3


def test_shared_span_pairs_exact_span_and_df_cut(spark):
    span = " ".join("w%d" % i for i in range(8))
    boiler = " ".join("b%d" % i for i in range(8))
    docs = _docs(
        spark,
        # docs 1,2 share a verbatim 8-token span; 3 does not; the boiler
        # span appears in ALL docs and must be killed by max_span_df=2.
        [
            (1, span + " unique one tail " + boiler, "s"),
            (2, "head filler words " + span + " " + boiler, "s"),
            (3, "totally different text body here " + boiler, "s"),
        ],
    )
    got = shared_span_pairs(docs, k=8, max_span_df=2).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]
    assert got[0]["n_shared_spans"] == 1


def test_merge_upsert_update_insert_persist(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k bigint, v string, x double"
    )
    source = spark.createDataFrame(
        [(2, "B", 25.0), (3, "c", 30.0)], "k bigint, v string, x double"
    )
    got = {r["k"]: (r["v"], r["x"]) for r in merge_upsert(target, source, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 25.0), 3: ("c", 30.0)}


def test_merge_upsert_broadcasts_small_change_batch(spark):
    """The scale contract: a ≪-target change batch must not shuffle the
    target — the anti-join decomposition lets Spark broadcast the batch
    keys (a full-outer formulation could never broadcast)."""
    target = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    source = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("x")
    )
    merged = merge_upsert(target, source, "k")
    assert merged.count() == 10_000
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_top_terms_hand_computed(spark):
    # 3 docs; 'rare' appears twice in doc 1 only: tf=2, df=1,
    # tfidf = 2*ln(3/1) = 2.1972. 'common' is in all docs: idf = 0.
    docs = _docs(
        spark,
        [
            (1, "common rare rare", "s"),
            (2, "common other", "s"),
            (3, "common other", "s"),
        ],
    )
    from tp1_distribuidos_mapreduce_spark.operators.ranking import tfidf_top_terms

    rows = tfidf_top_terms(docs, top_k=1).collect()
    top = {r["doc_id"]: r for r in rows}
    assert top[1]["term"] == "rare" and top[1]["tf"] == 2 and top[1]["df"] == 1
    assert abs(top[1]["tfidf"] - 2.1972) < 1e-9
    # docs 2/3: 'other' (df=2) beats 'common' (idf=0)
    assert top[2]["term"] == "other" and top[3]["term"] == "other"


def test_positional_index_postings_contract(spark):
    # 'b' occurs in doc 1 at positions 2,4 and doc 2 at position 1;
    # postings list docs ascending, positions ascending within doc.
    docs = _docs(spark, [(1, "a b a b", "s"), (2, "b c", "s")])
    from tp1_distribuidos_mapreduce_spark.operators.ranking import positional_index

    idx = {r["term"]: r for r in positional_index(docs).collect()}
    assert idx["b"]["postings"] == "1:2,4;2:1"
    assert idx["b"]["n_docs"] == 2
    assert idx["a"]["postings"] == "1:1,3"
    assert idx["c"]["postings"] == "2:2"


def test_bm25_top_terms_hand_computed(spark):
    import math

    docs = _docs(
        spark,
        [
            (1, "common rare rare", "s"),
            (2, "common other", "s"),
            (3, "common other", "s"),
        ],
    )
    from tp1_distribuidos_mapreduce_spark.operators.ranking import (
        BM25_B,
        BM25_K1,
        bm25_top_terms,
    )

    top = {r["doc_id"]: r for r in bm25_top_terms(docs, top_k=1).collect()}
    assert top[1]["term"] == "rare" and top[1]["tf"] == 2 and top[1]["dl"] == 3
    # closed-form check: N=3, df(rare)=1, dl=3, avgdl=7/3
    idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    denom = 2 + BM25_K1 * (1 - BM25_B + BM25_B * 3 / (7 / 3))
    want = round(idf * 2 * (BM25_K1 + 1) / denom, 4)
    assert abs(top[1]["bm25"] - want) < 1e-9
    assert top[2]["term"] == "other" and top[3]["term"] == "other"


def test_value_outliers_flags_only_extreme_points(spark):
    from tp1_distribuidos_mapreduce_spark.plans.relational_ext import value_outliers

    rows = [(i, "2024-01-01 00:00:00", 1, "t", 10.0, "{}") for i in range(20)]
    rows.append((99, "2024-01-01 00:00:00", 1, "t", 10.5, "{}"))   # mild
    rows.append((100, "2024-01-01 00:00:00", 1, "t", 1000.0, "{}"))  # extreme
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = value_outliers(ev).collect()[0]
    assert got["n_events"] == 22 and got["n_outliers"] == 1


def test_value_outliers_zero_variance_group_has_no_outliers(spark):
    from tp1_distribuidos_mapreduce_spark.plans.relational_ext import value_outliers

    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", 1, "z", 5.0, "{}") for i in range(5)],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = value_outliers(ev).collect()[0]
    assert got["n_outliers"] == 0 and got["stddev_value"] == 0.0


def test_value_outliers_single_event_group_emits_no_nulls(spark):
    from tp1_distribuidos_mapreduce_spark.plans.relational_ext import value_outliers

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "solo", 5.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = value_outliers(ev).collect()[0]
    assert got["stddev_value"] == 0.0 and got["n_outliers"] == 0
    assert all(v is not None for v in got.asDict().values())


def test_phrase_search_counts_adjacent_occurrences_only(spark):
    from tp1_distribuidos_mapreduce_spark.operators.ranking import phrase_search

    docs = _docs(
        spark,
        [
            (1, "the table hash join and table hash again", "a"),  # 2 occurrences
            (2, "table of hash values", "a"),                      # not adjacent
            (3, "hash table inverted order", "b"),                 # wrong order
            (4, "x", "b"),                                          # shorter than L
        ],
    )
    got = {r["source"]: r.asDict() for r in phrase_search(docs, ("table", "hash")).collect()}
    assert got["a"]["n_docs_with_phrase"] == 1 and got["a"]["n_occurrences"] == 2
    assert got["b"]["n_docs_with_phrase"] == 0 and got["b"]["n_occurrences"] == 0


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, (ts, u, t) in enumerate(rows)],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_is_ordered_not_existence(spark):
    from tp1_distribuidos_mapreduce_spark.plans.behavior import funnel_conversion

    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            ("2024-01-01 10:00:00", 1, "view"),
            ("2024-01-01 11:00:00", 1, "click"),
            ("2024-01-01 12:00:00", 1, "purchase"),
            # user 2: purchase BEFORE click -> reaches click stage only
            ("2024-01-01 10:00:00", 2, "view"),
            ("2024-01-01 12:00:00", 2, "click"),
            ("2024-01-01 11:00:00", 2, "purchase"),
            # user 3: click before any view -> stuck at view stage
            ("2024-01-01 09:00:00", 3, "click"),
            ("2024-01-01 10:00:00", 3, "view"),
            # user 4: never viewed -> not in the funnel at all
            ("2024-01-01 10:00:00", 4, "click"),
            ("2024-01-01 11:00:00", 4, "purchase"),
        ],
    )
    got = {r["stage"]: r for r in funnel_conversion(ev).collect()}
    assert got[1]["n_users"] == 3          # users 1, 2, 3 viewed
    assert got[2]["n_users"] == 2          # users 1, 2 clicked after view
    assert got[3]["n_users"] == 1          # only user 1 purchased after click
    assert got[3]["conversion"] == round(1 / 3, 4)


def test_cohort_retention_offsets_and_churn(spark):
    from tp1_distribuidos_mapreduce_spark.plans.behavior import cohort_retention

    ev = _events(
        spark,
        [
            # user 1: first week W1 (Mon 2024-01-01), active W1 and W3
            ("2024-01-02 10:00:00", 1, "view"),
            ("2024-01-16 10:00:00", 1, "view"),
            # user 2: first week W1, active W1 only
            ("2024-01-03 10:00:00", 2, "view"),
            # user 3: first week W2 -> its own cohort
            ("2024-01-10 10:00:00", 3, "view"),
        ],
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 2)] == 1       # only user 1 returned in W3
    assert ("2024-01-01", 1) not in got      # nobody active in W2 from cohort 1
    assert got[("2024-01-08", 0)] == 1       # user 3's own cohort


def test_top_event_paths_order_ties_and_prefix_cap(spark):
    from tp1_distribuidos_mapreduce_spark.plans.behavior import top_event_paths

    ev = _events(
        spark,
        [
            # user 1 and 2: identical 3-event journeys
            ("2024-01-01 10:00:00", 1, "view"),
            ("2024-01-01 11:00:00", 1, "click"),
            ("2024-01-01 12:00:00", 1, "purchase"),
            ("2024-01-01 10:00:00", 2, "view"),
            ("2024-01-01 11:00:00", 2, "click"),
            ("2024-01-01 12:00:00", 2, "purchase"),
            # user 3: simultaneous events -> tie broken by event_id order
            ("2024-01-01 10:00:00", 3, "view"),
            ("2024-01-01 10:00:00", 3, "click"),
            # user 4: 5 events, cap at 3 keeps only the first three
            ("2024-01-01 10:00:00", 4, "view"),
            ("2024-01-01 11:00:00", 4, "view"),
            ("2024-01-01 12:00:00", 4, "view"),
            ("2024-01-01 13:00:00", 4, "purchase"),
            ("2024-01-01 14:00:00", 4, "purchase"),
        ],
    )
    got = {r["path"]: r["n_users"] for r in top_event_paths(ev, max_events=3).collect()}
    assert got["view>click>purchase"] == 2
    # user 3's tie: its view row precedes its click row in _events order,
    # so event_id ordering yields view>click
    assert got["view>click"] == 1
    assert got["view>view>view"] == 1          # user 4 capped at 3
    assert "view>view>view>purchase>purchase" not in got
