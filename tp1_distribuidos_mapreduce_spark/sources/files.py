"""File-format connectors: schema-enforced CSV and JSONL read/write.

The reference's only I/O is space-delimited text on a shared filesystem
(SURVEY.md §1.2, "no columnar formats, no connectors"). This module is the
interchange surface an engine actually needs next to parquet: JSONL for
nested/typed exchange (the lingua franca of training-data pipelines) and
CSV as the flat-file compatibility boundary.

Scale rules baked in:
- **Schema is mandatory on read.** Schema inference is a full extra pass
  over the data before the real job starts — at 100 TB that is a second
  100 TB scan. Callers pass a DDL string or StructType; the reader fails
  fast on missing columns instead of silently inferring strings.
- **Malformed rows are quarantined, not fatal.** The rescue path parses
  lines with `from_json`/`from_csv` expressions over a text scan instead
  of the source readers' internal `_corrupt_record` machinery — Spark
  disallows queries that reference only that internal column
  (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so e.g.
  `corrupt_records(df).count()` monitoring would need a cache() with the
  built-in path. The expression formulation has identical per-row cost,
  stays in one pass, and keeps partition-directory columns working via
  the text scan's own partition discovery.
- **Writes partition by low-cardinality columns only** (partitionBy on a
  high-cardinality key creates one directory per value — a small-files
  catastrophe), and compress by default (gzip for JSONL interchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_CORRUPT = "_corrupt_record"


def _as_struct(schema: str | StructType) -> StructType:
    return StructType.fromDDL(schema) if isinstance(schema, str) else schema


# Timestamp precision contract for the text connectors: the fixture's
# events carry MICROsecond timestamps, and Spark's JSON/CSV writer default
# (millisecond .SSS) silently truncates them — caught by the
# latest_event_from_jsonl oracle differential. The writer always emits 6
# fraction digits; the reader accepts both 6-digit and fraction-less
# forms (bracket-optional section) so foreign midnight-only data still
# parses.
TS_WRITE_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
TS_READ_FMT = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX"
# TIMESTAMP_NTZ columns (the fixture's orders.o_orderdate) are governed by
# the SEPARATE timestampNTZFormat option — timestampFormat is silently
# ignored for them (how the truncation first slipped through). No offset
# section: NTZ has no zone to render.
TS_NTZ_WRITE_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
TS_NTZ_READ_FMT = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"


def _parse_lines(
    raw: DataFrame, schema: StructType, parser: str, options: dict[str, str]
) -> DataFrame:
    """Shared rescue-parse shape: text lines -> typed columns + _corrupt_record.

    Partition-directory columns discovered by the text scan pass through
    as-is; only the remaining schema fields are parsed from the line. A
    line is corrupt when the parser returns a null struct (unparseable) or
    flags it via its own PERMISSIVE corrupt field (type-coercion failure).
    """
    part_cols = [c for c in raw.columns if c != "value"]
    json_fields = [f for f in schema.fields if f.name not in part_cols]
    parse_st = StructType(list(json_fields)).add(_CORRUPT, "string")
    if parser == "json":
        fn, fn_schema = F.from_json, parse_st
    else:  # from_csv accepts only a DDL string schema
        fn, fn_schema = F.from_csv, ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in parse_st.fields
        )
    parsed = raw.select(
        fn(
            F.col("value"),
            fn_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT, **options},
        ).alias("r"),
        F.col("value").alias("_raw"),
        *part_cols,
    )
    corrupt = F.when(
        F.col("r").isNull() | F.col(f"r.{_CORRUPT}").isNotNull(), F.col("_raw")
    )
    return parsed.select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in json_fields],
        *part_cols,
        corrupt.alias(_CORRUPT),
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: str | StructType, strict: bool = False
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    Non-strict (default): malformed lines land in `_corrupt_record` with
    every data column null — split with `valid_records` /
    `corrupt_records`. Strict: FAILFAST via the native reader, the whole
    job dies on the first malformed line.
    """
    st = _as_struct(schema)
    if strict:
        return (
            spark.read.schema(st)
            .option("mode", "FAILFAST")
            .option("timestampFormat", TS_READ_FMT)
            .option("timestampNTZFormat", TS_NTZ_READ_FMT)
            .json(path)
        )
    raw = spark.read.text(path).where(F.col("value") != "")
    return _parse_lines(
        raw,
        st,
        "json",
        {"timestampFormat": TS_READ_FMT, "timestampNTZFormat": TS_NTZ_READ_FMT},
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read CSV with an explicit schema (no inference pass); malformed
    rows are quarantined in `_corrupt_record` like read_jsonl. With
    header=True the header line (exact column-name match) is dropped —
    column ORDER comes from the schema, as with Spark's native reader.

    Null/empty disambiguation matches write_csv: literal ``\\N`` is NULL,
    a quoted empty field is the empty string. Pass ``options`` (univocity
    parser settings) for foreign dialects — e.g. RFC-4180 doubled-quote
    escapes need ``{"escape": '"'}``; records must be single-line (as with
    Spark's native reader unless multiLine, which a line-oriented text
    scan cannot express).

    Header handling: a line-oriented scan has no per-file line numbers, so
    header removal is by VALUE, restricted to lines that both equal the
    header text AND failed schema coercion — a typed schema rejects its
    own header, while a data row that happens to render identically to the
    header parses cleanly and is NEVER silently dropped. Corollary: with
    an all-string schema the header is indistinguishable from data and
    comes through as a data row — use header=False, a typed column, or
    Spark's native reader for that shape."""
    st = _as_struct(schema)
    raw = spark.read.text(path).where(F.col("value") != "")
    parsed = _parse_lines(
        raw,
        st,
        "csv",
        {
            "nullValue": "\\N",
            # univocity trims by default, silently corrupting padded strings
            "ignoreLeadingWhiteSpace": "false",
            "ignoreTrailingWhiteSpace": "false",
            "timestampFormat": TS_READ_FMT,
            "timestampNTZFormat": TS_NTZ_READ_FMT,
            **(options or {}),
        },
    )
    if header:
        # the header line renders only the FILE's columns —
        # directory-partition columns never appear in it. Join with the
        # dialect's separator: under options={'sep': ';'} the real header
        # is 'a;b;c' and a comma-joined predicate would let it survive
        # into _corrupt_record as a phantom malformed row per file.
        sep = (options or {}).get("sep", ",")
        part_cols = [c for c in raw.columns if c != "value"]
        header_line = sep.join(f.name for f in st.fields if f.name not in part_cols)
        parsed = parsed.where(
            F.col(_CORRUPT).isNull() | (F.col(_CORRUPT) != header_line)
        )
    return parsed


def corrupt_records(df: DataFrame) -> DataFrame:
    """The quarantined rows of a non-strict read (raw line only)."""
    return df.where(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)


def valid_records(df: DataFrame) -> DataFrame:
    """The clean rows of a non-strict read, rescue column dropped."""
    if _CORRUPT not in df.columns:
        return df
    return df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "gzip",
) -> None:
    """Write newline-delimited JSON, gzip-compressed by default.

    Timestamps serialize as ISO-8601 with the session (UTC) zone, so a
    read_jsonl round-trip with the same schema is lossless for all fixture
    types including array columns.
    """
    w = (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("timestampFormat", TS_WRITE_FMT)
        .option("timestampNTZFormat", TS_NTZ_WRITE_FMT)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, compression: str = "none"
) -> None:
    """Write CSV (flat schemas only — Spark rejects array/struct columns,
    which is correct: CSV is the compatibility boundary, not the lake
    format). NULL is written as ``\\N`` and the empty string as a quoted
    empty field so read_csv can tell them apart — the classic CSV
    ambiguity that silently corrupts string columns otherwise. One residual
    ambiguity is inherent: a literal string equal to the marker ``\\N``
    reads back as NULL (Spark's native reader/writer pair shares this);
    data that can contain it belongs in JSONL/parquet."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("compression", compression)
        .option("timestampFormat", TS_WRITE_FMT)
        .option("timestampNTZFormat", TS_NTZ_WRITE_FMT)
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
