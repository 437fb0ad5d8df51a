"""Property tests for the training-data pipeline operators (split/chunk).

Oracle parity is covered by the auto-parametrized differential test in
test_relational.py; these pin the semantic properties that matter for a
corpus freeze: determinism, partition, coverage, overlap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.operators import pipeline as P

from conftest import SF_SMOKE


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_is_deterministic_and_partitions(spark):
    documents = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = {(r.doc_id, r.split) for r in P.train_val_test_split(documents).collect()}
    b = {(r.doc_id, r.split) for r in P.train_val_test_split(documents).collect()}
    assert a == b
    assert len(a) == documents.count()  # every doc assigned exactly once
    assert {s for _, s in a} <= {"train", "val", "test"}


def test_split_fractions_near_nominal(spark):
    # 5000 ids through a uniform hash: 80/10/10 ± a few points.
    documents = spark.range(5000).select(F.col("id").alias("doc_id"))
    counts = {
        r.split: r.n
        for r in P.train_val_test_split(documents)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert abs(counts["train"] / 5000 - 0.80) < 0.03
    assert abs(counts["val"] / 5000 - 0.10) < 0.02
    assert abs(counts["test"] / 5000 - 0.10) < 0.02


def test_split_independent_of_row_order_and_extra_rows(spark):
    # Pure function of doc_id: adding unrelated docs never reassigns others.
    small = spark.range(100).select(F.col("id").alias("doc_id"))
    big = spark.range(1000).select(F.col("id").alias("doc_id"))
    small_map = {r.doc_id: r.split for r in P.train_val_test_split(small).collect()}
    big_map = {r.doc_id: r.split for r in P.train_val_test_split(big).collect()}
    assert all(big_map[d] == s for d, s in small_map.items())


def test_chunks_cover_every_token_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(150))
    out = P.chunk_documents(docs(spark, [(1, text)]), chunk_size=64, stride=48).collect()
    # starts 0,48,96,144 -> sizes 64,64,54,6
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [64, 64, 54, 6]


def test_chunking_short_doc_single_chunk(spark):
    out = P.chunk_documents(docs(spark, [(1, "a b c")]), chunk_size=64, stride=48).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 3


def test_nonoverlapping_chunks_partition_tokens(spark):
    text = " ".join(f"t{i}" for i in range(100))
    out = P.chunk_documents(docs(spark, [(1, text)]), chunk_size=32, stride=32).collect()
    assert sum(r.n_chunk_tokens for r in out) == 100


def test_avg_quality_rounding_portable_at_half_boundaries(spark, duck):
    """corpus_curation's integer round-half-up must agree between engines
    for every (scaled_sum, n): plain double round(S/(n*1e4), 4) provably
    does not (S=3, n=2 → Spark 0.0002 vs DuckDB 0.0001 — Spark rounds
    half-up via BigDecimal, DuckDB's floating std::round can go down)."""
    from pyspark.sql import functions as F

    pairs = [(s, n) for n in (1, 2, 3, 4, 7) for s in range(0, 60)]
    sdf = spark.createDataFrame(pairs, "s long, n long").select(
        "s",
        "n",
        (F.floor((2 * F.col("s") + F.col("n")) / (2 * F.col("n"))) / 10000.0).alias(
            "q"
        ),
    )
    got = {(r.s, r.n): r.q for r in sdf.collect()}
    values = ",".join(f"({s},{n})" for s, n in pairs)
    want = {
        (s, n): q
        for s, n, q in duck.sql(
            f"SELECT s, n, floor((2*s + n)/(2*n))/10000.0 AS q"
            f" FROM (VALUES {values}) t(s, n)"
        ).fetchall()
    }
    assert got == want


def test_weighted_sample_zero_mass_source_defined_and_dropped(spark, duck):
    """A source whose total character mass is 0 (all-empty docs) must not
    crash either engine nor be sampled: with greatest(stride, 1) the
    grid-crossing test is defined and no zero-weight row crosses a line.
    Before the guard, stride=0 made Spark's div yield NULL (silent drop)
    while DuckDB's // raised — a latent engine/oracle divergence."""
    rows = [
        (1, "empty", 0),
        (2, "empty", 0),
        (3, "full", 40),
        (4, "full", 40),
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {(r.source, r.doc_id) for r in P.weighted_systematic_sample(d, k=2).collect()}
    assert got and all(s == "full" for s, _ in got)
    # oracle side runs without error on the same degenerate input
    values = ",".join(f"({i},'{s}',{w})" for i, s, w in rows)
    duck.sql(
        "WITH documents AS (SELECT * FROM (VALUES " + values + ") t(doc_id, source, n_chars)), "
        "cum AS (SELECT source, doc_id, n_chars AS w, "
        " sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_w, "
        " sum(n_chars) OVER (PARTITION BY source) AS total_w FROM documents) "
        "SELECT source, doc_id FROM (SELECT source, doc_id, w, cum_w, "
        " greatest((total_w + 1) // 2, 1) AS stride FROM cum) "
        "WHERE cum_w // stride > (cum_w - w) // stride"
    ).fetchall()
