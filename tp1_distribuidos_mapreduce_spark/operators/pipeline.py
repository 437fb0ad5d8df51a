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


_REBALANCE_KEEP_PERMILLE = {"en": 300, "de": 800}  # others keep all


def _quota_expr() -> F.Column:
    """Per-language keep-quota (permille) — the single quota definition
    shared by language_rebalance and stratified_sample (and both
    hard-coded oracle CASE expressions); a drift between copies would
    silently desynchronize the two registered queries."""
    return F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(p))
            for lang, p in _REBALANCE_KEEP_PERMILLE.items()
        ],
        F.lit(1000),
    )


def language_rebalance(documents: DataFrame) -> DataFrame:
    """Stratified downsampling with exact deterministic quotas: keep a
    per-language fraction of documents (300‰ of en, 800‰ of de, all of the
    rest) selected by the same md5 bucket as train_val_test_split.

    This is the corpus rebalancing step (downweight the dominant language)
    done WITHOUT `sampleBy`: membership is a pure function of doc_id, so
    the selection is reproducible across runs, engines, and partitionings,
    and composes with the split (a doc's split never depends on which
    strata survived). Map-only; the rollup is the only shuffle.

    Returns per-language (n_total, n_kept, kept_permille).
    """
    bucket = _hash_bucket(F.col("doc_id"))
    quota = _quota_expr()
    return (
        documents.select("doc_id", "lang")
        .withColumn("kept", (bucket < quota).cast("int"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").alias("n_kept"),
            # integer round-half-up, same rationale as corpus_curation's
            # avg_quality: round(double, 1) disagrees between engines when
            # 1000*kept/count lands at an exact half (e.g. 7/20000 →
            # 0.35 → Spark 0.4, DuckDB 0.3). floor((2*10000*S + n)/(2n))
            # stays integer-exact on both.
            (
                F.floor(
                    (2 * 10000 * F.sum("kept") + F.count("*")) / (2 * F.count("*"))
                )
                / 10.0
            ).alias("kept_permille"),
        )
        .orderBy("lang")
    )


LANGUAGE_REBALANCE_ORACLE = """
WITH b AS (
  SELECT doc_id, lang,
         ((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),1,1)) - 1) * 4096
        + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),2,1)) - 1) * 256
        + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),3,1)) - 1) * 16
        + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),4,1)) - 1)) % 1000
           AS bucket
  FROM documents
),
k AS (
  SELECT lang,
         CASE WHEN bucket < (CASE lang WHEN 'en' THEN 300
                                       WHEN 'de' THEN 800
                                       ELSE 1000 END)
              THEN 1 ELSE 0 END AS kept
  FROM b
)
SELECT lang,
       count(*) AS n_total,
       -- DuckDB sum() over INTEGER returns HUGEINT, which pandas widens to
       -- float64 and the driver hash then diverges from Spark's int64; cast
       -- back explicitly (count(*) is immune: DuckDB returns BIGINT there).
       CAST(sum(kept) AS BIGINT) AS n_kept,
       -- integer round-half-up mirror of the Spark side (round(double,1)
       -- is engine-divergent at exact halves)
       floor((2 * 10000 * sum(kept) + count(*)) / (2 * count(*))) / 10.0
         AS kept_permille
FROM k
GROUP BY lang
ORDER BY lang
"""


def corpus_curation(
    documents: DataFrame, min_tokens: int = 10, min_quality: float = 0.15
) -> DataFrame:
    """End-to-end corpus curation: exact dedup → quality gate → language
    gate → per-(source, language) survivor stats. The composition every
    pretraining data pipeline runs, built from the same tested expressions
    as text_quality / language_id / dedup_exact.

    Single-pass plan shape (the 100 TB formulation): ONE scan computes
    every signal plus the text hash in one projection — the text column
    dies at the scan and only fixed-width signal rows move. Dedup
    survivorship is a window-min over the hash (one shuffle), the gates
    are a filter, and the rollup is the only other exchange. The naive
    composition (join three per-doc signal frames onto a keep-list) costs
    4 scans + 6 exchanges; this is 1 scan + 2.
    """
    from pyspark.sql import Window

    from .textstats import n_tokens_expr, pred_lang_expr, quality_score_expr

    sig = documents.select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("text_hash"),
        n_tokens_expr().alias("n_tokens"),
        quality_score_expr().alias("quality_score"),
        pred_lang_expr().alias("pred_lang"),
    )
    keep_id = F.min("doc_id").over(Window.partitionBy("text_hash"))
    return (
        sig.withColumn("keep_id", keep_id)
        .where(
            (F.col("doc_id") == F.col("keep_id"))
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_quality)
            & (F.col("pred_lang") != "und")
        )
        .groupBy("source", "pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            # avg over doubles is summation-order-dependent (Spark's partial
            # aggregates combine in scheduling order), so round(avg(..), 4)
            # can flip its last digit between runs when a group average
            # lands on a rounding boundary — an intermittent oracle-hash
            # flake. quality_score carries exactly 4 decimals, so sum it as
            # a scaled BIGINT (exact, order-independent). The final rounding
            # must ALSO stay integer-exact: engines disagree on double
            # round-at-half (Spark BigDecimal HALF_UP vs DuckDB's
            # floating-point std::round — verified divergent for scaled sum
            # 3, n=2), so round-half-up is computed as floor((2S+n)/(2n))
            # in integers (exact in double for 2S+n < 2^52; final /1e4 is
            # one correctly-rounded IEEE op on both engines).
            (
                F.floor(
                    (
                        2 * F.sum(F.round(F.col("quality_score") * 10000).cast("long"))
                        + F.count("*")
                    )
                    / (2 * F.count("*"))
                )
                / 10000.0
            ).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source", "pred_lang")
    )


def _curation_oracle() -> str:
    from .textstats import _LANG_PROFILES, _profile_sql

    return rf"""
WITH base AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(lower(text), '[^\p{{L}}]+'), x -> x <> '') AS t,
         length(text) AS n_chars,
         length(regexp_replace(text, '[\p{{L}}\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^\p{{L}}]', '', 'g')) AS n_alpha
  FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
signals AS (
  SELECT doc_id, source,
         len(t) AS n_tokens,
         -- integer half-up mirror of quality_score_expr (tie-proof; the
         -- >= 0.15 gate below makes a rounding tie flip ROWS, not digits)
         ((20000 * (least(len(t), 50) * n_alpha * (greatest(n_chars, 1) - n_punct))
           + (50 * greatest(n_chars, 1) * greatest(n_chars, 1)))
          // (2 * (50 * greatest(n_chars, 1) * greatest(n_chars, 1)))) / 10000.0
           AS quality_score,
         {_profile_sql(_LANG_PROFILES['en'])} AS s_en,
         {_profile_sql(_LANG_PROFILES['es'])} AS s_es,
         {_profile_sql(_LANG_PROFILES['de'])} AS s_de,
         {_profile_sql(_LANG_PROFILES['fr'])} AS s_fr
  FROM base
),
lang AS (
  SELECT *,
         CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
              WHEN s_es = greatest(s_es, s_de, s_fr) THEN 'es'
              WHEN s_de = greatest(s_de, s_fr) THEN 'de'
              ELSE 'fr' END AS pred_lang
  FROM signals
)
SELECT source, pred_lang,
       count(*) AS n_docs,
       -- integer-scaled sum + integer round-half-up, NOT round(avg()):
       -- see corpus_curation — order-exact AND tie-exact on both engines
       -- (double round-at-half differs between Spark and DuckDB)
       floor((2 * sum(CAST(round(quality_score * 10000) AS BIGINT)) + count(*))
             / (2 * count(*))) / 10000.0 AS avg_quality,
       -- CAST: DuckDB HUGEINT sum -> pandas float64 -> hash mismatch vs
       -- Spark int64 (same artifact as LANGUAGE_REBALANCE_ORACLE's n_kept).
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM lang
JOIN keep USING (doc_id)
WHERE n_tokens >= 10 AND quality_score >= 0.15 AND pred_lang <> 'und'
GROUP BY source, pred_lang
ORDER BY source, pred_lang
"""


CORPUS_CURATION_ORACLE = _curation_oracle()


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


def stratified_sample(documents: DataFrame) -> DataFrame:
    """Stratified sampling with exact deterministic hash quotas, emitting
    the surviving ROWS (language_rebalance's row-level generalization: that
    operator reports per-stratum counts; this one materializes the sampled
    corpus itself).

    Membership is a pure function of doc_id — same md5 bucket as
    train_val_test_split — so the sample is reproducible across runs,
    engines, partitionings, and late-arriving shards, and a document's
    split/sample fate never depends on scan order. Map-only: a filter the
    scan can evaluate; no shuffle at any scale (the orderBy is
    presentation-only for the oracle compare).
    """
    bucket = _hash_bucket(F.col("doc_id"))
    quota = _quota_expr()
    return (
        documents.select("doc_id", "lang", "source")
        .withColumn("bucket", bucket)
        .where(F.col("bucket") < quota)
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_ORACLE = """
WITH b AS (
  SELECT doc_id, lang, source,
         CAST(((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),1,1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),2,1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),3,1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR),4,1)) - 1)) % 1000
           AS INTEGER) AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket
FROM b
WHERE bucket < (CASE lang WHEN 'en' THEN 300
                          WHEN 'de' THEN 800
                          ELSE 1000 END)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Weighted systematic sampling: hit a per-source TOKEN budget, not a row
# budget
# --------------------------------------------------------------------------

SYSTEMATIC_SAMPLE_K = 8  # target docs per source stratum


def weighted_systematic_sample(
    documents: DataFrame, k: int = SYSTEMATIC_SAMPLE_K
) -> DataFrame:
    """Per-source weighted systematic sample: walk each source's docs in
    doc_id order, lay a grid of ``k`` equal-weight strides over the
    source's total character mass, and keep exactly the documents whose
    cumulative-weight span crosses a grid line. Selection probability is
    proportional to n_chars (big docs straddle more grid lines — a doc
    wider than one stride is simply kept), which is how a curation
    pipeline samples to a TOKEN budget rather than a row budget.

    Everything is 64-bit integer arithmetic — cumulative sums, stride =
    ceil(total/k), and the grid-crossing test cum div S > (cum-w) div S
    — so Spark and the oracle agree bit-for-bit with no float rounding
    surface anywhere (the ADVICE-r7 lesson: cross-engine float
    thresholds are latent flakes). Every operand is non-negative, so
    truncating division (Spark ``div``, DuckDB ``//``) and floor
    division coincide — the off-by-one family that a (cum-1)/(cum-w-1)
    formulation hits on the first row of a stratum (−1 div S is 0 when
    truncating but −1 when flooring) cannot arise. Deterministic in
    partitioning and scan order because the walk order is
    (source, doc_id).

    Scale shape: one shuffle on source for the ordered window plus a
    broadcast-size per-source total joined back. Stride walks are
    per-stratum, so no global ordering exists anywhere; a pathologically
    hot source would take the same salted two-phase treatment as
    operators/skew.py (sample within salted sub-strata, then thin).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    totals = documents.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("total_w")
    )
    cum = (
        documents.select("doc_id", "source", F.col("n_chars").cast("long").alias("w"))
        .withColumn("cum_w", F.sum("w").over(w).cast("long"))
        .join(F.broadcast(totals), "source")
        # greatest(..., 1): a source whose total mass is 0 (all-empty
        # docs) would otherwise get stride = 0 — Spark's div yields NULL
        # (silently dropping the source) while DuckDB's // raises; the
        # floor of 1 keeps both engines defined and agreeing (no row of
        # an all-zero source crosses a grid line, so none are sampled).
        .withColumn("stride", F.expr(f"greatest((total_w + {k} - 1) div {k}, 1)"))
    )
    crosses = F.expr("cum_w div stride") > F.expr("(cum_w - w) div stride")
    return (
        cum.where(crosses)
        .select("source", "doc_id", F.col("w").alias("n_chars"))
        .orderBy("source", "doc_id")
    )


WEIGHTED_SYSTEMATIC_SAMPLE_ORACLE = """
WITH cum AS (
  SELECT source, doc_id, n_chars AS w,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
         sum(n_chars) OVER (PARTITION BY source) AS total_w
  FROM documents
)
SELECT source, doc_id, CAST(w AS BIGINT) AS n_chars
FROM (SELECT source, doc_id, w, cum_w,
             greatest((total_w + 7) // 8, 1) AS stride FROM cum)
WHERE cum_w // stride > (cum_w - w) // stride
ORDER BY source, doc_id
"""
