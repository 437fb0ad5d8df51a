"""Hash/sketch expressions for near-duplicate detection — all JVM-side.

MinHash and SimHash are built from ``xxhash64`` (a Catalyst expression) via
higher-order array functions, so signature computation happens inside
whole-stage codegen during the scan — no Python UDF, no shuffle. At 100 TB
this is the difference between a map-only signature pass and a crawl.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ngram_shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array (array<string> → array<string>).

    Documents shorter than ``n`` tokens yield their whole text as one
    shingle so they still participate in similarity.
    """
    k = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))


def minhash_signature_expr(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: array<bigint> of length ``num_hashes``.

    Hash family: xxhash64 seeded by position via an extra literal column —
    standard "k independent hashes from one keyed hash" construction.
    min() over the shingle set per seed = the MinHash estimator.

    NB: the per-seed lambda must take exactly ONE parameter — pyspark's
    ``transform`` passes the array index to a two-parameter lambda, which
    would silently replace the seed and collapse the hash family.
    """

    def min_hash(seed: int) -> Column:
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), s)))

    return F.array(*[min_hash(i) for i in range(num_hashes)])


def simhash_expr(tokens: Column, bits: int = 64) -> Column:
    """64-bit SimHash fingerprint (bigint) of a token array.

    Single-pass: per token, derive its ±1 bit-vector from xxhash64, then
    elementwise-sum across tokens with ``aggregate``; the sign of each
    accumulated component becomes the fingerprint bit. Bit 63 wrapping to a
    negative bigint is fine — the value is an opaque fingerprint.
    """
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)

    def bit_vec(tok: Column) -> Column:
        # shift amounts must be Python ints (shiftright takes no Column);
        # static unrolling also keeps the whole thing inside codegen.
        h = F.xxhash64(tok)
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for j in range(bits)
            ]
        )

    def finish(sums: Column) -> Column:
        # `sums` is a lambda variable here (aggregate's finish), so the 64
        # references don't duplicate the accumulation expression.
        acc = F.lit(0).cast("long")
        for j in range(bits):
            bitval = -(1 << 63) if j == 63 else (1 << j)
            acc = acc.bitwiseOR(
                F.when(F.element_at(sums, j + 1) > 0, F.lit(bitval).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
        return acc

    return F.aggregate(
        tokens,
        zeros,
        lambda acc, tok: F.zip_with(acc, bit_vec(tok), lambda a, b: a + b),
        finish,
    )


def hamming_distance64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints via popcount(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
