"""Source audit: no tie-capable round() over a float aggregate.

Spark's round() re-decimalizes a double via shortest-repr BigDecimal
(HALF_UP on printed digits) while DuckDB rounds the raw double, so any
aggregate whose TRUE value can land exactly on a rounding boundary is an
intermittent cross-engine flake — the class behind every historical
oracle-hash mismatch of this kind in this repo. The fix is the
nation_trade_flows discipline: exact scaled-integer sums + half-up
INTEGER division, mirrored in the oracle.

This test greps the package for the `F.round(F.sum(...)` /
`F.round(F.avg(...)` shapes and requires every remaining occurrence to be
a documented tie-safe site:

- sums of INTEGRAL columns (exact in a double below 2^53);
- divisions by a power of two (exact binary doubles — both engines round
  the identical exact value identically);
- CONTINUOUS measures (cosines, log-likelihoods): a tie requires the true
  value to be an exact decimal, a measure-zero event for real-valued
  inputs (and deterministic inputs make it reproducible, not flaky).

A new `F.round(F.sum/avg(...))` over money/ratio/fixed-decimal columns
must instead use the integer discipline; add it here ONLY with a written
tie-safety argument.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "tp1_distribuidos_mapreduce_spark"

# (filename, line-content substring) -> why the site cannot tie.
ALLOWED = {
    # ---- round-over-division sites (RATIO_PATTERN) ----
    ("plans/approx.py", 'F.round(est_cents / F.lit(100.0), 6).alias("approx_value"),'):
        "DDSketch midpoint estimator 2·gamma^idx/(gamma+1): goes through "
        "pow of the non-decimal gamma = 101/99, so the true value is "
        "irrational — no decimal tie; rows-only query besides",
    ("plans/relational_ext.py", 'F.round(F.col("cents") / 100.0, 2)'):
        "integer cents / 10^2 rounded at 2dp: the true value IS on the "
        "rounding grid, so no tie exists",
    ("plans/retail.py", 'F.round(F.col("cents") / 100.0, 2)'):
        "integer cents / 10^2 at 2dp — value on the grid, no tie",
    ("plans/retail.py", 'F.round(F.col("prev_cents") / 100.0, 2)'):
        "integer cents / 10^2 at 2dp — value on the grid, no tie",
    ("operators/vocab.py", 'F.round(w / F.col("p"), 4)'):
        "w goes through sqrt: the true value is irrational, a decimal tie "
        "is impossible, and round() of the identical double is "
        "engine-deterministic",
    ("operators/ranking.py", "F.round(F.col(\"tf\") * F.log("):
        "tf-idf goes through log: irrational true value, no decimal tie",
    ("operators/ranking.py", "F.round(idf * F.col(\"tf\") * (BM25_K1 + 1.0) / denom, 4)"):
        "bm25 goes through log and non-decimal constants: irrational true "
        "value, no decimal tie",
    ("plans/relational_ext.py", 'F.round(F.sum("l_quantity"), 4)'):
        "l_quantity is integral; a double sum of integers is exact below 2^53",
    ("plans/relational.py", 'F.round(F.sum("l_quantity"), 2)'):
        "l_quantity is integral; a double sum of integers is exact below 2^53",
    ("operators/vocab.py", 'F.round(F.sum("n_tokens") / F.lit(float(seq_len)), 4)'):
        "seq_len is a power of two: S/seq_len is an exact binary double, and "
        "half-up (Spark) == half-away (DuckDB) on exactly-representable ties",
    ("operators/vectors.py", 'F.round(F.avg("cos"), 4)'):
        "cosine similarities are continuous reals; an exact 5th-decimal tie "
        "is measure-zero",
    ("operators/lm.py", 'F.round(F.avg("doc_nll"), 4)'):
        "log-likelihoods are continuous reals; an exact 5th-decimal tie is "
        "measure-zero",
}

PATTERN = re.compile(r"F\.round\(\s*F\.(sum|avg)\(")
# round over a division on the same line: integer-ratio rounds (7/160 =
# 0.04375 etc.) tie exactly on decimal boundaries. `[^)]*` keeps the
# match inside the round() call's first argument region, so e.g.
# `F.round(x * 100).cast(...) / 100` (division OUTSIDE round) is exempt.
RATIO_PATTERN = re.compile(r"F\.round\([^)]*/")


def test_no_tie_capable_round_over_float_aggregate():
    violations = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            if not (PATTERN.search(line) or RATIO_PATTERN.search(line)):
                continue
            if any(
                rel == f and snippet in line for (f, snippet) in ALLOWED
            ):
                continue
            violations.append(f"{rel}:{lineno}: {line.strip()}")
    assert not violations, (
        "tie-capable F.round(F.sum/avg(...)) outside the documented "
        "allowlist — use exact scaled-integer sums with half-up integer "
        "division (see nation_trade_flows) or add a tie-safety argument "
        "to ALLOWED:\n" + "\n".join(violations)
    )


def test_allowlist_entries_still_exist():
    """Prune stale allowlist rows so the audit stays meaningful."""
    stale = []
    for f, snippet in ALLOWED:
        text = (PKG / f).read_text()
        if snippet not in text:
            stale.append(f"{f}: {snippet}")
    assert not stale, "ALLOWED entries no longer present:\n" + "\n".join(stale)


def test_q11_threshold_compare_is_wrap_proof_at_overflow_magnitude(spark):
    """ADVICE r17 regression pin, at TRUE overflow magnitudes (the r14
    guard lesson: synthetic values, no physical rows needed). Q11's
    HAVING compare (plans/tpch_more.py q11_important_stock) is
    value×1000 > total; with BIGINT operands Spark's default non-ANSI
    mode WRAPS the product silently once value > ~9.2e15/1000, turning
    a qualifying row into a silently dropped one. The shipped compare
    casts both sides to DECIMAL(38,0) first, which is exact to 1e38.
    This pins the EXPRESSION SEMANTICS: at magnitudes where the raw
    BIGINT product provably wraps (value = 2^60), the decimal compare
    still agrees with exact Python integer arithmetic — and the test
    also demonstrates the wrap it guards against, so a future edit that
    drops the cast fails here, not at 100 TB."""
    from pyspark.sql import functions as F

    # r19 (ADVICE r18): in the real plan __vu/__tot are now DECIMAL(38,0)
    # SUMS (the per-row product is cast before F.sum), so the compare's
    # operands can no longer wrap upstream either; this test keeps BIGINT
    # operands deliberately to pin the compare KERNEL at the magnitudes
    # where a raw product provably wraps. Session config pins
    # spark.sql.ansi.enabled=false (session.py), so the raw product WRAPS
    # rather than errors.
    rows = [
        # (vu, tot): vu * 1000 vs tot decided by exact Python ints
        (1 << 60, 9_000_000_000_000_000_000),  # qualifies (1.15e21 > 9e18);
                                               # raw product wraps NEGATIVE
        (10_000_000_000_000_000, 9_000_000_000_000_000_000),  # qualifies
                                               # (1e19 > 9e18); raw product
                                               # exceeds int64 max and wraps
        (9_000_000_000_000_000, 9_100_000_000_000_000_000),  # does not
                                               # qualify (9e18 < 9.1e18)
        (1, 10_000),                  # small sanity row: does not qualify
    ]
    df = spark.createDataFrame(rows, "vu long, tot long")
    decimal_kept = (
        df.where(
            F.col("vu").cast("decimal(38,0)") * 1000
            > F.col("tot").cast("decimal(38,0)")
        )
        .select("vu", "tot")
        .collect()
    )
    want = {(vu, tot) for vu, tot in rows if vu * 1000 > tot}
    assert {(r["vu"], r["tot"]) for r in decimal_kept} == want
    # The hazard is real: the raw BIGINT product of row 1 wraps negative
    # under non-ANSI mode, so the un-cast compare silently drops it.
    wrapped = df.where(
        (F.col("vu") * 1000).cast("long") > F.col("tot")
    ).count()
    assert wrapped < len(want), (
        "expected the raw BIGINT x1000 compare to wrap (and drop rows) "
        "at 2^60 magnitudes — if Spark now errors or widens instead, "
        "the DECIMAL cast in q11 may be simplifiable; re-read ADVICE r17"
    )


def test_q11_sum_is_wrap_proof_at_overflow_magnitude(spark):
    """ADVICE r18 regression pin: the compare above was hardened in r18,
    but the BIGINT sums FEEDING it could still wrap silently past
    ~9.2e18 (Spark non-ANSI F.sum over long) while DuckDB's sum is
    HUGEINT-exact — a cross-engine divergence the driver hash compare
    would catch only at magnitudes no fixture reaches. r19 moved the
    DECIMAL(38,0) cast below the aggregation (q11 sums
    (cost × qty).cast(decimal(38,0))); this pins that SHAPE at true
    overflow magnitudes: two rows of 9e18 sum to 1.8e19 — past int64 —
    and the decimal sum agrees with exact Python arithmetic while the
    raw BIGINT sum demonstrably wraps."""
    from pyspark.sql import functions as F

    rows = [(9_000_000_000_000_000_000, 1), (9_000_000_000_000_000_000, 1)]
    df = spark.createDataFrame(rows, "cost long, qty long")
    exact = sum(c * q for c, q in rows)
    got = df.agg(
        F.sum((F.col("cost") * F.col("qty")).cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    assert int(got) == exact, (got, exact)
    # The hazard is real: the raw BIGINT sum wraps negative under
    # non-ANSI mode at these magnitudes.
    raw = df.agg(F.sum(F.col("cost") * F.col("qty")).alias("s")).collect()[0][
        "s"
    ]
    assert raw != exact, (
        "expected the raw BIGINT sum to wrap at 1.8e19 — if Spark now "
        "errors or widens instead, q11's pre-aggregation DECIMAL cast "
        "may be simplifiable; re-read ADVICE r18"
    )
