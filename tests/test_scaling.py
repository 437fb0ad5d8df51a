"""10× scale drill for the heavy hitters (VERDICT r9 #7).

No sf1 fixture exists, so the drill builds one IN SPARK: 10 disjoint,
deterministically-keyed copies of the sf0.1 co-purchase input (graph
queries) and 10 shingle-disjoint copies of the sf0.1 documents table
(dedup queries), then times each query at 1× and 10× and pins the
wall-clock slope at ≤ LINEAR_SLOPE_CAP × the size ratio. An accidental
quadratic (all-pairs join, unbounded adjacency, per-round full-table
rescan) shows up as a ~100× slope and fails loudly here before it
matters at 100 TB.

Marked `slow` (≈5 min) and deselected from the default run by
pytest.ini; run with `pytest -m slow tests/test_scaling.py -s`.
Measured numbers are recorded in SCALING.md per round.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.operators import dedup as D
from tp1_distribuidos_mapreduce_spark.operators import graph as GR
from tp1_distribuidos_mapreduce_spark.sources.tables import load_table

pytestmark = pytest.mark.slow

SF_BENCH = "/root/testdata/sf0.1"
COPIES = 10
# Generous so machine noise never flakes the drill: a truly linear query
# lands ≈10, mild superlinearity (shuffle fan-in, codegen) ≈12-15, an
# accidental quadratic ≈100.
LINEAR_SLOPE_CAP = 2.5  # × the size ratio (i.e. slope ≤ 25 for 10 copies)


def _scaled_lineitem(spark, copies: int = COPIES):
    """10 disjoint graph copies: orderkey and partkey spaces are shifted
    per copy, so |nodes| and |edges| both scale exactly ×copies while
    per-copy structure (degrees, triangles, cores) is preserved."""
    li = load_table(spark, SF_BENCH, "lineitem").select("l_orderkey", "l_partkey")
    pmax = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    copies_df = spark.range(copies).select(F.col("id").alias("cp"))
    return (
        li.crossJoin(F.broadcast(copies_df))
        .select(
            (F.col("l_orderkey") * copies + F.col("cp")).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("cp") * pmax).alias("l_partkey"),
        )
        .localCheckpoint(eager=True)
    )


# Per-copy vowel rotations make the copies (near-)disjoint in shingle
# space, so near-dup pair/cluster output grows ~linearly instead of each
# document gaining 9 exact clones (which would make the OUTPUT itself
# quadratic in copies and invalidate the slope).
_ROTATIONS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeiuo", "eiuoa", "iuoae", "uoaei", "oaeiu",
]


def _scaled_documents(spark, copies: int = COPIES):
    d = load_table(spark, SF_BENCH, "documents").select(
        "doc_id", "text", "n_chars"
    )
    dmax = d.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [
        d.select(
            (F.col("doc_id") + i * dmax).alias("doc_id"),
            F.translate(F.col("text"), "aeiou", _ROTATIONS[i]).alias("text"),
            "n_chars",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def _time(fn, inp) -> tuple[float, int]:
    """Time plan CONSTRUCTION + full materialization. Construction is
    inside the clock because the iterative operators do their real work
    in eager localCheckpoints at build time; materialization goes
    through the noop sink because count() prunes every computed column
    (the bench.py discipline — .count() lies)."""
    t0 = time.perf_counter()
    df = fn(inp)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt, df.count()


def _drill(name, fn, small, big, results):
    t1, n1 = _time(fn, small)
    t10, n10 = _time(fn, big)
    slope = t10 / max(t1, 1e-9)
    results.append((name, t1, t10, slope, n1, n10))
    print(
        f"\n[scale drill] {name}: 1x={t1:.1f}s ({n1} rows) "
        f"10x={t10:.1f}s ({n10} rows) slope={slope:.1f}"
    )
    assert slope <= COPIES * LINEAR_SLOPE_CAP, (
        f"{name}: 10x input cost {slope:.1f}x — superlinear beyond the "
        f"{COPIES * LINEAR_SLOPE_CAP}x cap, likely an accidental quadratic"
    )


def test_graph_queries_scale_linearly(spark):
    small = _scaled_lineitem(spark, 1)
    big = _scaled_lineitem(spark, COPIES)
    results: list = []
    _drill("pagerank_copurchase", GR.pagerank_copurchase, small, big, results)
    _drill("triangle_count", GR.triangle_count, small, big, results)
    # the other two iterative shapes: frontier relaxation and peeling.
    # NOTE the disjoint-copy caveat for BFS: the root is the global min
    # part id, so only ONE copy is reachable — the measured 10× cost is
    # the frontier walk of one copy plus edge-table scans 10× wider,
    # still a valid no-quadratic check on the join shapes.
    _drill("bfs_distances", GR.bfs_distances, small, big, results)
    _drill("kcore_members", lambda li: GR.kcore_members(li, k=3), small, big, results)
    # disjoint copies: triangle tallies must scale EXACTLY ×copies —
    # a correctness pin on the scaled fixture itself
    tri1 = GR.triangle_count(small).collect()[0]
    tri10 = GR.triangle_count(big).collect()[0]
    assert tri10["n_nodes"] == COPIES * tri1["n_nodes"]
    assert tri10["n_edges"] == COPIES * tri1["n_edges"]
    assert tri10["n_triangles"] == COPIES * tri1["n_triangles"]


def _scaled_lineitem_prices(spark, copies: int = COPIES):
    """10 verbatim copies of (returnflag, price): row count scales
    ×copies while both groups' price DISTRIBUTIONS are unchanged — so
    the KS statistic must be bit-identical at 1× and 10× (the ECDFs are
    scale-invariant rationals and the final division sees the same
    exact-integer ratio), which pins the scaled fixture's correctness
    the way the triangle tallies do for the graph drill."""
    li = load_table(spark, SF_BENCH, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    copies_df = spark.range(copies).select(F.col("id").alias("cp"))
    return li.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
        eager=True
    )


def test_stats_ks_scales_linearly(spark):
    """VERDICT r11 #6: the stats layer's heaviest member —
    ks_returned_price's per-cent-value bucketed cumulative — joins the
    drill. The cumulative frame is bounded by the price DOMAIN, not the
    data, so 10× rows must cost ~1× the cumulative plus a 10× scan."""
    from tp1_distribuidos_mapreduce_spark.plans import stats as STT

    small = _scaled_lineitem_prices(spark, 1)
    big = _scaled_lineitem_prices(spark, COPIES)
    results: list = []
    _drill("ks_returned_price", STT.ks_returned_price, small, big, results)
    r1 = STT.ks_returned_price(small).collect()[0]
    r10 = STT.ks_returned_price(big).collect()[0]
    assert r10["n_returned"] == COPIES * r1["n_returned"]
    assert r10["n_other"] == COPIES * r1["n_other"]
    # verbatim copies: the ECDFs are unchanged, so the statistic is the
    # SAME exact rational both sides — bit-identical doubles, not close
    assert r10["ks_stat"] == r1["ks_stat"]


def _scaled_events(spark, copies: int = COPIES):
    """10 verbatim copies of (event_type, user_id, ts): the row count
    scales ×copies while the DISTINCT (type, user) set — and therefore
    the exact overlap output — is unchanged, so the drill pins output
    identity alongside the slope (the KS drill's convention)."""
    ev = load_table(spark, SF_BENCH, "events").select(
        "event_type", "user_id", "ts"
    )
    copies_df = spark.range(copies).select(F.col("id").alias("cp"))
    return ev.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
        eager=True
    )


def _scaled_orders(spark, copies: int = COPIES):
    """10 verbatim copies of (o_orderdate, o_totalprice): the daily
    collapse yields the SAME day frame with every daily total ×copies,
    so Theil-Sen's pairwise-slope stage — the quadratic-LOOKING shape —
    does identical work at 1× and 10×, and the slope scales exactly
    ×copies (every pairwise (Δy×10)/Δx) while the day/pair counts are
    unchanged. Only the first collapse scans more rows."""
    o = load_table(spark, SF_BENCH, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    copies_df = spark.range(copies).select(F.col("id").alias("cp"))
    return o.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
        eager=True
    )


def test_theil_sen_scales_linearly(spark):
    """The round-12 stats member with a self-join: the drill proves the
    day-domain collapse keeps the pairwise stage constant in raw rows."""
    from tp1_distribuidos_mapreduce_spark.plans import stats as STT

    small = _scaled_orders(spark, 1)
    big = _scaled_orders(spark, COPIES)
    results: list = []
    _drill(
        "theil_sen_revenue_trend",
        STT.theil_sen_revenue_trend,
        small,
        big,
        results,
    )
    r1 = STT.theil_sen_revenue_trend(small).collect()[0]
    r10 = STT.theil_sen_revenue_trend(big).collect()[0]
    assert r10["n_days"] == r1["n_days"]
    assert r10["n_pairs"] == r1["n_pairs"]
    # daily cents all ×copies → ×copies is monotone on the exact
    # rational slopes, so the SAME pair is selected as the median both
    # sides; fl(10·r) vs 10·fl(r) differ by at most an ulp or two
    # (double rounding on the ×10), so the pin is a 1e-12-tight isclose,
    # not equality.
    import math

    assert math.isclose(
        r10["slope_cents_per_day"],
        COPIES * r1["slope_cents_per_day"],
        rel_tol=1e-12,
    )


def test_overlap_join_scales_linearly(spark):
    """event_user_overlap's user-keyed pair expansion is the round-12
    addition with a join fan-out — the drill proves the distinct-first
    collapse keeps it linear in raw rows (the pair work is bounded by
    users × types², unchanged at 10×)."""
    from tp1_distribuidos_mapreduce_spark.plans import approx as AX

    small = _scaled_events(spark, 1)
    big = _scaled_events(spark, COPIES)
    results: list = []
    _drill("event_user_overlap", AX.event_user_overlap, small, big, results)
    r1 = sorted(tuple(r) for r in AX.event_user_overlap(small).collect())
    r10 = sorted(tuple(r) for r in AX.event_user_overlap(big).collect())
    assert r1 == r10  # verbatim copies: distinct (type, user) unchanged


def _scaled_lineitem_qty_prices(spark, copies: int = COPIES):
    """10 verbatim copies of (quantity, price): every tie group scales
    ×copies, so each 2·midrank transforms AFFINELY (2R' = 10·(2R) − 9
    for 10 copies) and Spearman ρ — affine-invariant in both rank
    vectors — must be unchanged up to float-chain noise."""
    li = load_table(spark, SF_BENCH, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    copies_df = spark.range(copies).select(F.col("id").alias("cp"))
    return li.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
        eager=True
    )


def test_spearman_scales_linearly(spark):
    """quantity_price_spearman's y-rank map is the round-12 shape with a
    value-domain shuffle: the drill proves the rank-domain collapse
    keeps it linear (the rank maps are the same size at 1× and 10×;
    only the first cell collapse and the weighted aggregate scan more)."""
    import math

    from tp1_distribuidos_mapreduce_spark.plans import stats as STT

    small = _scaled_lineitem_qty_prices(spark, 1)
    big = _scaled_lineitem_qty_prices(spark, COPIES)
    results: list = []
    _drill(
        "quantity_price_spearman",
        STT.quantity_price_spearman,
        small,
        big,
        results,
    )
    r1 = STT.quantity_price_spearman(small).collect()[0]
    r10 = STT.quantity_price_spearman(big).collect()[0]
    assert r10["n_rows"] == COPIES * r1["n_rows"]
    # affine rank transform → mathematically identical rho; the float
    # chains see different integers, so the pin is a tight isclose
    assert math.isclose(
        r10["spearman_rho"], r1["spearman_rho"], rel_tol=1e-9, abs_tol=1e-12
    )


def test_dedup_queries_scale_linearly(spark):
    small = _scaled_documents(spark, 1)
    big = _scaled_documents(spark, COPIES)
    results: list = []
    _drill(
        "dedup_jaccard_prefix",
        lambda d: D.ngram_jaccard_prefix_pairs(d),
        small,
        big,
        results,
    )
    _drill(
        "dedup_clusters", lambda d: D.near_dup_clusters(d), small, big, results
    )


def test_ddsketch_scales_linearly(spark):
    """The r13 sketch member: the log-domain bucket build is one hash
    aggregate, so 10 verbatim copies of the value column must cost
    ~linear — and because every bucket count scales exactly ×copies,
    the ceil-rank falls in the SAME bucket both sides (prior < rank ≤
    prior+cnt is scale-invariant for integer priors), so every
    approx_value is IDENTICAL and n_rows is exactly ×copies."""
    from tp1_distribuidos_mapreduce_spark.plans import approx as AX

    ev = load_table(spark, SF_BENCH, "events").select("value")
    copies_df = spark.range(COPIES).select(F.col("id").alias("cp"))
    small = ev.localCheckpoint(eager=True)
    big = (
        ev.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
            eager=True
        )
    )
    results: list = []
    _drill(
        "ddsketch_event_quantiles",
        AX.ddsketch_event_quantiles,
        small,
        big,
        results,
    )
    q1 = {r["percent"]: r for r in AX.ddsketch_event_quantiles(small).collect()}
    q10 = {r["percent"]: r for r in AX.ddsketch_event_quantiles(big).collect()}
    assert q1.keys() == q10.keys()
    for p in q1:
        assert q10[p]["n_rows"] == COPIES * q1[p]["n_rows"]
        assert q10[p]["approx_value"] == q1[p]["approx_value"]  # bit-identical

def test_ddsketch_grouped_scales_linearly(spark):
    """The r14 grouped members: per-(type, idx) counts scale exactly
    ×copies under verbatim duplication, so by the scale-invariance of
    integer ceil-rank selection (prior < rank ≤ prior+cnt, all terms
    ×copies; ceil(ceil(10pn/10)/10) = ceil(pn/100)) every per-type
    approx_value — and the exact twin's selected element — is
    IDENTICAL at 10× while n_rows scales exactly. The merge-proof
    flags must stay all-true at 10×."""
    from tp1_distribuidos_mapreduce_spark.plans import approx as AX

    ev = load_table(spark, SF_BENCH, "events").select("event_type", "value")
    copies_df = spark.range(COPIES).select(F.col("id").alias("cp"))
    small = ev.localCheckpoint(eager=True)
    big = (
        ev.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
            eager=True
        )
    )
    results: list = []
    _drill(
        "ddsketch_quantiles_by_type",
        AX.ddsketch_quantiles_by_type,
        small,
        big,
        results,
    )
    _drill("ddsketch_merge_proof", AX.ddsketch_merge_proof, small, big, results)
    _drill(
        "event_value_quartiles_by_type",
        AX.event_value_quartiles_by_type,
        small,
        big,
        results,
    )
    q1 = {
        (r["event_type"], r["percent"]): r
        for r in AX.ddsketch_quantiles_by_type(small).collect()
    }
    q10 = {
        (r["event_type"], r["percent"]): r
        for r in AX.ddsketch_quantiles_by_type(big).collect()
    }
    assert q1.keys() == q10.keys()
    for key in q1:
        assert q10[key]["n_rows"] == COPIES * q1[key]["n_rows"]
        assert q10[key]["approx_value"] == q1[key]["approx_value"]
    assert all(
        r["merge_matches_onebuild"]
        for r in AX.ddsketch_merge_proof(big).collect()
    )


def test_sketch_merge_proofs_scale_linearly(spark):
    """The r15 merge proofs: both are two hash-aggregate sketch builds
    plus a constant-size compare, so 10 verbatim copies of (event_type,
    user_id) must cost ~linear. Verbatim duplication leaves the DISTINCT
    user set per type unchanged, so the register arrays and bottom-K
    arrays are IDENTICAL at 10× (HLL folding and bottom-K truncation are
    idempotent under duplicates) — the whole proof row must be
    bit-identical at both scales with flags true."""
    from tp1_distribuidos_mapreduce_spark.plans import approx as AX

    ev = load_table(spark, SF_BENCH, "events").select("event_type", "user_id")
    copies_df = spark.range(COPIES).select(F.col("id").alias("cp"))
    small = ev.localCheckpoint(eager=True)
    big = (
        ev.crossJoin(F.broadcast(copies_df)).drop("cp").localCheckpoint(
            eager=True
        )
    )
    results: list = []
    _drill("hll_merge_proof", AX.hll_merge_proof, small, big, results)
    _drill("kmv_merge_proof", AX.kmv_merge_proof, small, big, results)
    from tp1_distribuidos_mapreduce_spark.plans import bloom as BL

    _drill("bloom_merge_proof", BL.bloom_merge_proof, small, big, results)
    for fn in (AX.hll_merge_proof, AX.kmv_merge_proof, BL.bloom_merge_proof):
        r1 = fn(small).collect()[0]
        r10 = fn(big).collect()[0]
        assert r1["merge_matches_onebuild"] and r10["merge_matches_onebuild"]
        assert tuple(r1) == tuple(r10)  # duplicate-idempotent: identical
    # the ADDITIVE member drills on documents: verbatim ×10 copies
    # multiply every cell count (and so total_count) exactly ×10 while
    # the cell SET — and the merge flag — is unchanged
    docs = load_table(spark, SF_BENCH, "documents")
    d_small = docs.localCheckpoint(eager=True)
    d_big = (
        docs.crossJoin(F.broadcast(copies_df))
        .drop("cp")
        .localCheckpoint(eager=True)
    )
    _drill("cms_merge_proof", AX.cms_merge_proof, d_small, d_big, results)
    c1 = AX.cms_merge_proof(d_small).collect()[0]
    c10 = AX.cms_merge_proof(d_big).collect()[0]
    assert c1["merge_matches_onebuild"] and c10["merge_matches_onebuild"]
    assert c10["n_cells"] == c1["n_cells"]
    assert c10["total_count"] == COPIES * c1["total_count"]


def _scaled_partsupp_world(spark, copies: int = COPIES):
    """Jointly key-shifted copies of (part, supplier, lineitem) for the
    r17 derived-partsupp TPC-H tier: p_partkey/l_partkey shift by
    cp·pmax and s_suppkey/l_suppkey by cp·smax IN STEP, so every copy
    is a self-consistent world — the cold-part filter, the pair
    aggregation, and the supplier semi-join all stay within-copy —
    while |part|, |supplier|, |lineitem|, and NATION_8's supplier
    population each scale exactly ×copies. nation is left 1× (a true
    dimension). The q11 hash modulus sees 10× suppliers, so its pair
    MAPPING differs from 1× (expected — the drill pins wall-clock
    slope and non-degenerate output, not row identity)."""
    part = load_table(spark, SF_BENCH, "part")
    supp = load_table(spark, SF_BENCH, "supplier")
    li = load_table(spark, SF_BENCH, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    pmax = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    smax = supp.agg(F.max("s_suppkey")).collect()[0][0] + 1
    copies_df = spark.range(copies).select(F.col("id").alias("cp"))

    def shifted(df, shifts):
        out = df.crossJoin(F.broadcast(copies_df))
        for c, m in shifts.items():
            out = out.withColumn(c, F.col(c) + F.col("cp") * m)
        return out.drop("cp").localCheckpoint(eager=True)

    return (
        shifted(part, {"p_partkey": pmax}),
        shifted(supp, {"s_suppkey": smax}),
        shifted(li, {"l_partkey": pmax, "l_suppkey": smax}),
    )


def test_tpch_partsupp_queries_scale_linearly(spark):
    """r17 entrants: q20 is the round's only new fact-touching query
    (one pruned pair-shuffle over lineitem — must scale ~linearly);
    q11 is dimension-bounded (derived partsupp + two 1-row broadcasts)
    so its 10× cost is the dimension build, nothing fact-shaped."""
    from tp1_distribuidos_mapreduce_spark.plans import tpch_more as TM

    nation = load_table(spark, SF_BENCH, "nation")
    p1, s1, l1 = _scaled_partsupp_world(spark, 1)
    p10, s10, l10 = _scaled_partsupp_world(spark, COPIES)
    results: list = []
    _drill(
        "q20_potential_promotion",
        lambda t: TM.q20_potential_promotion(t[0], t[1], nation, t[2]),
        (p1, s1, l1),
        (p10, s10, l10),
        results,
    )
    _drill(
        "q11_important_stock",
        lambda t: TM.q11_important_stock(t[0], t[1], nation),
        (p1, s1, l1),
        (p10, s10, l10),
        results,
    )
    # r18 entrant: q16 is dimension-bounded like q11 (derived pairs +
    # broadcast anti-join + grouped count-distinct; lineitem unused).
    # Its group cells are the (brand, type, size) vocabulary, which the
    # key-shifted copies REPLICATE rather than extend, so the output
    # row count stays cell-bounded at 10× while per-cell supplier
    # counts grow — pin rows non-empty at both scales, not growth.
    _drill(
        "q16_supplier_part_counts",
        lambda t: TM.q16_supplier_part_counts(t[0], t[1]),
        (p1, s1, l1),
        (p10, s10, l10),
        results,
    )
    # q20's eligible-supplier rows live in within-copy worlds so 10×
    # must produce MORE rows. q11's HAVING fraction (1/1000) is
    # deliberately fixed while the NATION_3 partkey scope grows ×10, so
    # the threshold moves from ~3× to ~32× the average share and the
    # output legitimately EMPTIES at 10× — the same reason TPC-H scales
    # Q11's fraction by 1/SF. The 10× timing is still the full
    # dimension-build + aggregate cost (the filter is last), so the
    # slope assertion stands; only the 1× output is pinned non-empty.
    n20_1 = results[0][4]
    n20_10 = results[0][5]
    assert n20_1 > 0 and n20_10 > n20_1
    assert results[1][4] > 0
    # q16: non-empty at BOTH scales (cell-bounded output, see above)
    assert results[2][4] > 0 and results[2][5] > 0


def test_q21_scales_linearly(spark):
    """r19 entrant: q21 is the registry's only existential-self-join
    member and its rewrite exists for exactly this drill — the plan is
    ONE fact shuffle (status-pruned orders⨝lineitem on orderkey) with
    both per-order aggregates riding that partitioning, so 10× jointly
    key-shifted copies (o_orderkey/l_orderkey by cp·omax,
    s_suppkey/l_suppkey by cp·smax, every copy a self-consistent world
    whose per-order supplier sets never cross copies) must cost
    ~linearly. NATION_19's supplier population scales ×10 with the
    copies, so the qualifying output must GROW at 10× (unlike the
    cell-bounded q16) — the literal l2/l3 self-join formulation this
    rewrite replaces would show its quadratic here."""
    from tp1_distribuidos_mapreduce_spark.plans import tpch_more as TM

    nation = load_table(spark, SF_BENCH, "nation")
    supp = load_table(spark, SF_BENCH, "supplier")
    orders = load_table(spark, SF_BENCH, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    li = load_table(spark, SF_BENCH, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    omax = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    smax = supp.agg(F.max("s_suppkey")).collect()[0][0] + 1

    def world(copies):
        copies_df = spark.range(copies).select(F.col("id").alias("cp"))

        def shifted(df, shifts):
            out = df.crossJoin(F.broadcast(copies_df))
            for c, m in shifts.items():
                out = out.withColumn(c, F.col(c) + F.col("cp") * m)
            return out.drop("cp").localCheckpoint(eager=True)

        return (
            shifted(supp, {"s_suppkey": smax}),
            shifted(li, {"l_orderkey": omax, "l_suppkey": smax}),
            shifted(orders, {"o_orderkey": omax}),
        )

    w1 = world(1)
    w10 = world(COPIES)
    results: list = []
    _drill(
        "q21_waiting_suppliers",
        lambda t: TM.q21_waiting_suppliers(t[0], t[1], t[2], nation),
        w1,
        w10,
        results,
    )
    n1, n10 = results[0][4], results[0][5]
    assert n1 > 0, "q21 must qualify suppliers at 1x (NATION_19 fixture)"
    # Output ROWS are name-bounded, not copy-bounded: the key shift
    # leaves s_name verbatim, so all 10 copies of a supplier merge into
    # one groupBy(s_name) row (42 names at both scales, under the LIMIT
    # 100). The ×10 growth lives in the COUNTS: every copy is an
    # identical world modulo shift, so each contributes the same
    # qualifying late rows per name and total numwait is EXACTLY ×10 —
    # a falsifiable equality, not a loose bound.
    assert n10 == n1, (n1, n10)
    sum1 = (
        TM.q21_waiting_suppliers(w1[0], w1[1], w1[2], nation)
        .agg(F.sum("numwait"))
        .collect()[0][0]
    )
    sum10 = (
        TM.q21_waiting_suppliers(w10[0], w10[1], w10[2], nation)
        .agg(F.sum("numwait"))
        .collect()[0][0]
    )
    assert sum10 == COPIES * sum1, (sum1, sum10)


def test_q22_scales_linearly(spark):
    """r19 entrant: q22's fact-sized work is ONE date-pruned anti-join
    on custkey; 10× jointly key-shifted copies of (customer, orders)
    must cost ~linearly. The copies are identical worlds modulo the key
    shift (balances and order dates are copied verbatim), so the
    positive-balance average over 10× candidates EQUALS the 1× average,
    each copy qualifies the same customers, and — since output rows are
    bounded by the 7-value country-code domain — per-group numcust and
    totacctbal are EXACTLY ×10: a falsifiable equality on both the
    integer count and the display division of an exact cents sum."""
    from tp1_distribuidos_mapreduce_spark.plans import tpch_more as TM

    cust = load_table(spark, SF_BENCH, "customer")
    orders = load_table(spark, SF_BENCH, "orders").select(
        "o_custkey", "o_orderdate"
    )
    cmax = cust.agg(F.max("c_custkey")).collect()[0][0] + 1

    def world(copies):
        copies_df = spark.range(copies).select(F.col("id").alias("cp"))

        def shifted(df, col):
            return (
                df.crossJoin(F.broadcast(copies_df))
                .withColumn(col, F.col(col) + F.col("cp") * cmax)
                .drop("cp")
                .localCheckpoint(eager=True)
            )

        return (shifted(cust, "c_custkey"), shifted(orders, "o_custkey"))

    c1, o1 = world(1)
    c10, o10 = world(COPIES)
    results: list = []
    _drill(
        "q22_global_sales_opportunity",
        lambda t: TM.q22_global_sales_opportunity(t[0], t[1]),
        (c1, o1),
        (c10, o10),
        results,
    )
    r1 = {
        r["cntrycode"]: (r["numcust"], r["totacctbal"])
        for r in TM.q22_global_sales_opportunity(c1, o1).collect()
    }
    r10 = {
        r["cntrycode"]: (r["numcust"], r["totacctbal"])
        for r in TM.q22_global_sales_opportunity(c10, o10).collect()
    }
    assert r1 and set(r10) == set(r1)
    for code, (n, tot) in r1.items():
        n10, tot10 = r10[code]
        assert n10 == COPIES * n, (code, n, n10)
        assert abs(tot10 - COPIES * tot) < 1e-6, (code, tot, tot10)


def test_q12_scales_linearly(spark):
    """r20 entrant: q12's only fact-sized work is the single pruned
    orderkey equi-join; 10× jointly key-shifted copies of (orders,
    lineitem) must cost ~linearly. Output rows are bounded by the
    2-value mode domain (the key shift leaves l_returnflag verbatim,
    so all copies merge into the same two groups) and every copy is an
    identical world modulo the shift, so per-mode high_line_count and
    low_line_count are EXACTLY ×10 — a falsifiable integer equality,
    the Q21/Q22 drill discipline."""
    from tp1_distribuidos_mapreduce_spark.plans import tpch_more as TM

    orders = load_table(spark, SF_BENCH, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, SF_BENCH, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    omax = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1

    def world(copies):
        copies_df = spark.range(copies).select(F.col("id").alias("cp"))

        def shifted(df, col):
            return (
                df.crossJoin(F.broadcast(copies_df))
                .withColumn(col, F.col(col) + F.col("cp") * omax)
                .drop("cp")
                .localCheckpoint(eager=True)
            )

        return (shifted(orders, "o_orderkey"), shifted(li, "l_orderkey"))

    o1, l1 = world(1)
    o10, l10 = world(COPIES)
    results: list = []
    _drill(
        "q12_shipmode_priority",
        lambda t: TM.q12_shipmode_priority(t[0], t[1]),
        (o1, l1),
        (o10, l10),
        results,
    )
    r1 = {
        r["shipmode"]: (r["high_line_count"], r["low_line_count"])
        for r in TM.q12_shipmode_priority(o1, l1).collect()
    }
    r10 = {
        r["shipmode"]: (r["high_line_count"], r["low_line_count"])
        for r in TM.q12_shipmode_priority(o10, l10).collect()
    }
    assert set(r1) == {"A", "R"} and set(r10) == set(r1)
    for mode, (hi, lo) in r1.items():
        hi10, lo10 = r10[mode]
        assert hi10 == COPIES * hi, (mode, hi, hi10)
        assert lo10 == COPIES * lo, (mode, lo, lo10)
