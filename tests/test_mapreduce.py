"""Generic MapReduce plugin API (O12) + KV text sink (O3/O4) tests."""

from __future__ import annotations

import glob
import os

from tp1_distribuidos_mapreduce_spark.operators.mapreduce import (
    II_JOB,
    WC_JOB,
    MapReduceJob,
    run_mapreduce,
)
from tp1_distribuidos_mapreduce_spark.operators.wordcount import word_count
from tp1_distribuidos_mapreduce_spark.sinks import read_kv_text, write_sorted_kv_text


def corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, value string")


ROWS = [
    ("pg-1", "HOla don pepito,, y don JOSE!"),
    ("pg-2", "hola don jose"),
    ("pg-3", "chau chau chau"),
]


def test_mr_wc_matches_native_wordcount(spark):
    df = corpus(spark, ROWS)
    mr = {r.key: int(r.value) for r in run_mapreduce(df, WC_JOB).collect()}
    native = {r.word: r.cnt for r in word_count(df).collect()}
    assert mr == native


def test_mr_ii_sorted_distinct(spark):
    df = corpus(spark, ROWS)
    got = {r.key: r.value for r in run_mapreduce(df, II_JOB).collect()}
    assert got["don"] == "pg-1,pg-2"
    assert got["hola"] == "pg-1,pg-2"
    assert got["chau"] == "pg-3"
    assert got["jose"] == "pg-1,pg-2"


def test_mr_combiner_equivalence(spark):
    df = corpus(spark, ROWS)
    no_comb = MapReduceJob(map_fn=WC_JOB.map_fn, reduce_fn=WC_JOB.reduce_fn)
    a = sorted(map(tuple, run_mapreduce(df, WC_JOB).collect()))
    b = sorted(map(tuple, run_mapreduce(df, no_comb).collect()))
    assert a == b


def test_mr_partitions_default_matches_reference_r2(spark):
    # num_partitions=None (default) resolves to the session's shuffle
    # parallelism; results must be identical to the reference's R=2
    # (common/config.go:7) — partitioning is a physical choice only.
    df = corpus(spark, ROWS)
    import dataclasses

    r2 = dataclasses.replace(WC_JOB, num_partitions=2)
    assert run_mapreduce(df, WC_JOB).collect() == run_mapreduce(df, r2).collect()


def test_mr_output_sorted_by_key(spark):
    df = corpus(spark, ROWS)
    keys = [r.key for r in run_mapreduce(df, WC_JOB).collect()]
    assert keys == sorted(keys)


def test_custom_plugin(spark):
    # a user-defined job: per-doc letter histogram key=letter value=count
    job = MapReduceJob(
        map_fn=lambda doc, text: [(ch, "1") for ch in text if ch.isalpha()],
        reduce_fn=lambda k, vs: str(sum(int(v) for v in vs)),
    )
    df = corpus(spark, [("d1", "aab"), ("d2", "ba")])
    got = {r.key: r.value for r in run_mapreduce(df, job).collect()}
    assert got == {"a": "3", "b": "2"}


def test_kv_text_sink_roundtrip(spark, tmp_path):
    df = corpus(spark, ROWS)
    out = run_mapreduce(df, WC_JOB)
    path = os.path.join(str(tmp_path), "mr-out")
    write_sorted_kv_text(out, path, num_partitions=2)

    files = sorted(glob.glob(os.path.join(path, "part-*")))
    assert len(files) == 2  # R=2, reference common/config.go:7
    for f in files:  # each file sorted by key (worker.go:208-210)
        keys = [ln.split(" ", 1)[0] for ln in open(f) if ln.strip()]
        assert keys == sorted(keys)

    back = {r.key: r.value for r in read_kv_text(spark, path).collect()}
    assert back == {r.key: r.value for r in out.collect()}
