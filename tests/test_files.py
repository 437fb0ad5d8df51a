"""Round-trip and quarantine tests for the CSV/JSONL connectors."""

from __future__ import annotations

from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.sources import files as FS
from tp1_distribuidos_mapreduce_spark.sources.tables import load_table

from conftest import SF_SMOKE

ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate string, o_orderpriority string"
)


def test_jsonl_roundtrip_preserves_rows_and_types(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").limit(200)
    p = str(tmp_path / "orders_jsonl")
    FS.write_jsonl(orders, p)
    back = FS.valid_records(
        FS.read_jsonl(spark, p, orders.schema)
    )
    # nullability flags differ between parquet metadata and a JSON read;
    # the type structure itself must round-trip exactly
    assert back.schema.simpleString() == orders.schema.simpleString()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))


def test_jsonl_roundtrip_array_column(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(50)
    p = str(tmp_path / "emb_jsonl")
    FS.write_jsonl(emb, p)
    back = FS.valid_records(FS.read_jsonl(spark, p, emb.schema))
    got = {r.vec_id: r.embedding for r in back.collect()}
    exp = {r.vec_id: r.embedding for r in emb.collect()}
    assert got == exp


def test_jsonl_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "n_chars")
    p = str(tmp_path / "docs_by_lang")
    FS.write_jsonl(docs, p, partition_by=["lang"])
    back = FS.valid_records(
        FS.read_jsonl(spark, p, "doc_id bigint, n_chars bigint, lang string")
    )
    one = back.where(F.col("lang") == "en")
    # partition pruning: the en filter must hit PartitionFilters, not data
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() == docs.where(F.col("lang") == "en").count()


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    d = tmp_path / "bad_jsonl"
    d.mkdir()
    (d / "part-0.json").write_text(
        '{"a": 1, "b": "x"}\n'
        "this is not json\n"
        '{"a": 2, "b": "y"}\n'
        '{"a": "NaNope", "b": 3}\n'
    )
    df = FS.read_jsonl(spark, str(d), "a bigint, b string")
    # contract: valid rows FULLY conform to the schema — a row with any
    # coercion failure ("a": "NaNope" as bigint) is quarantined whole
    assert FS.valid_records(df).count() == 2
    bad = sorted(r[0] for r in FS.corrupt_records(df).collect())
    assert bad == ["this is not json", '{"a": "NaNope", "b": 3}']


def test_jsonl_strict_mode_fails_fast(spark, tmp_path):
    d = tmp_path / "bad_strict"
    d.mkdir()
    (d / "part-0.json").write_text('{"a": 1}\nnope\n')
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        FS.read_jsonl(spark, str(d), "a bigint", strict=True).collect()


def test_csv_roundtrip(spark, tmp_path):
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .limit(100)
        .withColumn("o_orderdate", F.col("o_orderdate").cast("string"))
    )
    p = str(tmp_path / "orders_csv")
    FS.write_csv(orders, p)
    back = FS.valid_records(FS.read_csv(spark, p, ORDERS_DDL))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))


def test_csv_quarantines_malformed_rows(spark, tmp_path):
    d = tmp_path / "bad_csv"
    d.mkdir()
    (d / "part-0.csv").write_text("a,b\n1,x\nnot_a_number,y\n3,z\n")
    df = FS.read_csv(spark, str(d), "a bigint, b string")
    assert FS.valid_records(df).count() == 2
    assert FS.corrupt_records(df).count() == 1


NASTY = [
    (1, "comma, inside"),
    (2, 'quote " inside'),
    (3, "unicode: héllo wörld 中文 🎉"),
    (4, ""),
    (5, None),
    (6, "tab\tinside"),
    (7, "trailing space "),
]
# Not in NASTY: a literal string equal to the null marker "\\N" cannot
# round-trip through CSV (the inherent marker ambiguity — Spark's native
# reader/writer pair drops it too). JSONL is the fidelity format.


def _null_safe_sort(rows):
    return sorted(rows, key=lambda t: t[0])


def test_csv_nasty_strings_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(NASTY, "id long, s string")
    p = str(tmp_path / "nasty_csv")
    FS.write_csv(df, p)
    back = FS.valid_records(FS.read_csv(spark, p, "id long, s string"))
    assert _null_safe_sort(map(tuple, back.collect())) == _null_safe_sort(NASTY)


def test_jsonl_nasty_strings_roundtrip_including_newlines(spark, tmp_path):
    rows = NASTY + [
        (9, "line1\nline2"),
        (10, 'json {"k": [1,2]} inside'),
        (11, "\\N"),  # JSONL has no null-marker ambiguity
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    p = str(tmp_path / "nasty_jsonl")
    FS.write_jsonl(df, p)
    back = FS.valid_records(FS.read_jsonl(spark, p, "id long, s string"))
    assert _null_safe_sort(map(tuple, back.collect())) == _null_safe_sort(rows)


def test_csv_rfc4180_doubled_quotes_via_options(spark, tmp_path):
    d = tmp_path / "rfc"
    d.mkdir()
    (d / "f.csv").write_text('id,s\n1,"say ""hi"""\n')
    back = FS.valid_records(
        FS.read_csv(spark, str(d), "id long, s string", options={"escape": '"'})
    )
    assert back.collect()[0].s == 'say "hi"'


def test_csv_header_never_eats_identical_data_rows(spark, tmp_path):
    """All-string schema: a data row rendering identically to the header
    must survive (headers come through as data — documented trade; silent
    loss is the failure mode this pins against)."""
    df = spark.createDataFrame([("a", "b"), ("x", "y")], "a string, b string")
    p = str(tmp_path / "selfheader")
    FS.write_csv(df, p)
    back = FS.valid_records(FS.read_csv(spark, p, "a string, b string"))
    assert ("a", "b") in set(map(tuple, back.collect()))


def test_csv_typed_schema_drops_headers_per_file(spark, tmp_path):
    df = spark.createDataFrame([(i, f"s{i}") for i in range(50)], "id long, s string")
    p = str(tmp_path / "manyfiles")
    df.repartition(8).write.mode("overwrite").option("header", "true").option(
        "nullValue", "\\N"
    ).csv(p)
    back = FS.valid_records(FS.read_csv(spark, p, "id long, s string"))
    assert back.count() == 50  # 8 per-file headers all dropped, no data lost
    assert FS.corrupt_records(FS.read_csv(spark, p, "id long, s string")).count() == 0


def test_type_widening_fixture_really_heterogeneous(spark):
    """The widened-orders corpus must genuinely carry DIFFERENT physical
    types across batches (v1 INT32, v2 INT64) — otherwise the
    type_widening_census query proves nothing. Pin the per-footer types,
    pin that Spark's parquet footer merge REFUSES the cross-type merge
    (so mergeSchema alone is not the evolution answer), and pin that the
    schema-directed read widens the INT32 batch to BIGINT at scan."""
    import os

    import pytest
    from pyspark.sql.types import IntegerType, LongType

    from tp1_distribuidos_mapreduce_spark.sources import formats as FM

    root = FM.orders_widened_batches(spark, SF_SMOKE)
    t_v1 = spark.read.parquet(os.path.join(root, "batch=v1")).schema["o_custkey"].dataType
    t_v2 = spark.read.parquet(os.path.join(root, "batch=v2")).schema["o_custkey"].dataType
    assert isinstance(t_v1, IntegerType) and isinstance(t_v2, LongType)
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS"):
        spark.read.option("mergeSchema", "true").parquet(root).schema
    directed = spark.read.schema(FM.WIDENED_ORDERS_SCHEMA).parquet(root)
    assert isinstance(directed.schema["o_custkey"].dataType, LongType)
    # and the up-cast really reads the INT32 rows (not nulls/zeros)
    v1_rows = directed.where("batch = 'v1'").where("o_custkey > 0").count()
    assert v1_rows > 0
