"""Pins for operators/lm.py: the BPE trainer's full rule sequence vs an
independent sequential Python implementation (word frequencies derived
via DuckDB with the same tokenizer regex), and structural properties of
the perplexity scorer that the sf0.001 differential can't see."""

from __future__ import annotations

import duckdb

from conftest import SF_SMOKE

from tp1_distribuidos_mapreduce_spark import registry
from tp1_distribuidos_mapreduce_spark.operators import lm as LM


def _word_freqs(sf_dir: str) -> dict[str, int]:
    con = duckdb.connect()
    rows = con.execute(
        rf"""
        SELECT w, count(*) FROM (
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^\p{{L}}]+'),
                   x -> x <> '')) AS w
          FROM '{sf_dir}/documents.parquet'
        ) GROUP BY w
        """
    ).fetchall()
    con.close()
    return dict(rows)


def _reference_bpe(freqs: dict[str, int], n_merges: int):
    """Sequential Sennrich-style BPE: argmax pair (lexicographic
    tie-break), left-to-right non-overlapping merge."""
    syms = {
        w: [c if i < len(w) - 1 else c + "</w>" for i, c in enumerate(w)]
        for w in freqs
    }
    rules = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rank, l, r, n))
        for w in syms:
            s = syms[w]
            out: list[str] = []
            for tok in s:
                if out and out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            syms[w] = out
    return rules


def test_bpe_merges_match_python_reference(spark):
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in registry.queries()["bpe_train_merges"](spark, SF_SMOKE).collect()
    ]
    expect = _reference_bpe(_word_freqs(SF_SMOKE), LM.BPE_N_MERGES)
    assert got == expect


def test_perplexity_train_source_scores_lowest_quantile(spark):
    """The training source must be among the best-scoring (lowest mean
    NLL) sources — the signal the filter exists to produce. Fixture
    sources share a topical vocabulary, so demand top-half rather than
    strict argmin."""
    rows = registry.queries()["bigram_perplexity"](spark, SF_SMOKE).collect()
    scores = {r["source"]: r["mean_nll"] for r in rows}
    assert LM.LM_TRAIN_SOURCE in scores
    ranked = sorted(scores, key=scores.get)
    assert ranked.index(LM.LM_TRAIN_SOURCE) < len(ranked) / 2, scores
