"""Training-data pipeline operators: deterministic splits and chunking.

Additive LLM-pipeline surface (BASELINE.md) — the reference has no
counterpart (its only data model is string KV pairs, SURVEY.md §1). These
are the corpus-preparation steps between dedup and training: carve the
corpus into train/val/test and re-shape documents into fixed-size token
windows.

Scale design:
- Both operators are map-only Catalyst expressions — no shuffle, no
  Python, no state. They scale linearly with input splits and survive any
  corpus size; the split assignment in particular must be a pure function
  of the document key (not `rand()`, not `sampleBy`) so that re-runs,
  backfills, and late-arriving shards land each document in the same
  split without coordination.
- Chunking explodes one row per window; output row width is bounded by
  `chunk_size`, so downstream shuffle/write sizing stays predictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: F.Column, mod: int = 1000) -> F.Column:
    """Deterministic bucket in [0, mod) from the first 4 hex chars of
    md5(key) — engine-portable (the DuckDB oracle reproduces it with an
    instr() hex decode, verified digit-for-digit)."""
    hex4 = F.substring(F.md5(key.cast("string").cast("binary")), 1, 4)
    return (F.conv(hex4, 16, 10).cast("long") % mod).cast("int")


def train_val_test_split(
    documents: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Assign every document to train/val/test by hashing its doc_id.

    The assignment is a pure deterministic function of doc_id: stable
    across runs, machines, and data layout — the property that matters for
    reproducible corpus freezes at 100 TB (a `rand()`-based split changes
    under retry/speculative execution; `sampleBy` needs a driver-known
    fraction per stratum).

    Returns (doc_id, bucket, split) for every document.
    """
    bucket = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < train_pct * 10, "train")
        .when(bucket < (train_pct + val_pct) * 10, "val")
        .otherwise("test")
    )
    return (
        documents.select("doc_id")
        .withColumn("bucket", bucket)
        .withColumn("split", split)
        .orderBy("doc_id")
    )


TRAIN_VAL_TEST_ORACLE = """
WITH b AS (
  SELECT doc_id,
         CAST(((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),1,1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),2,1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),3,1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),4,1)) - 1)) % 1000
           AS INTEGER) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 800 THEN 'train'
            WHEN bucket < 900 THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id
"""


def chunk_documents(
    documents: DataFrame, chunk_size: int = 64, stride: int = 48
) -> DataFrame:
    """Split each document into strided windows of whitespace tokens.

    Window w starts at token offset w*stride and takes up to chunk_size
    tokens; starts cover [0, n_tokens) so every token lands in ≥1 chunk
    (trailing chunks may be short). With stride < chunk_size consecutive
    chunks overlap by chunk_size - stride tokens — the standard LM
    pretraining shape that preserves cross-boundary context.

    Returns (doc_id, chunk_id, n_chunk_tokens, chunk_md5); the chunk text
    itself is hashed rather than carried so result rows stay fixed-width
    (the write path re-materializes text by re-slicing where needed).
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
    chunk = F.slice("toks", F.col("start") + 1, chunk_size)
    return (
        documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
        .select("doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


CHUNK_DOCUMENTS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(s.i / 48 AS INTEGER) AS chunk_id,
         t[s.i + 1 : s.i + 64]     AS chunk
  FROM toks, unnest(range(0, len(t), 48)) AS s(i)
  WHERE len(t) > 0
)
SELECT doc_id, chunk_id,
       CAST(len(chunk) AS INTEGER)        AS n_chunk_tokens,
       md5(array_to_string(chunk, ' '))   AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_id
"""
