"""Independent pins for plans/stats.py — the grouped-OLS trend and the
chi-square independence test are re-derived in plain Python (exact int
sufficient statistics + the same canonical-order double fold) and
compared with == on floats, not approx: the module's docstrings claim
bit-identical cross-engine results, so the test holds it to that.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.plans import stats as STT

from conftest import SF_SMOKE


def test_nation_trend_slope_bit_exact_vs_python(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")

    got = {
        r["n_name"]: (r["n_days"], r["slope_cents_per_day"])
        for r in STT.nation_revenue_trend(orders, customer, nation).collect()
    }

    # Independent re-derivation: exact ints all the way to one division.
    rows = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.datediff(
                F.col("o_orderdate"), F.lit(STT._X_EPOCH).cast("date")
            ).alias("x"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    daily: dict[tuple[str, int], int] = {}
    for r in rows:
        daily[(r["n_name"], r["x"])] = daily.get((r["n_name"], r["x"]), 0) + r[
            "cents"
        ]
    stats: dict[str, list[int]] = {}
    for (name, x), y in daily.items():
        s = stats.setdefault(name, [0, 0, 0, 0, 0])  # n, sx, sy, sxy, sxx
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * y
        s[4] += x * x
    want = {}
    for name, (n, sx, sy, sxy, sxx) in stats.items():
        den = n * sxx - sx * sx
        if den != 0:
            want[name] = (n, (n * sxy - sx * sy) / den)

    assert got == want  # == on floats: one division of identical BIGINTs
    assert len(got) >= 20  # fixture has 25 nations; most must survive


def test_chi2_bit_exact_vs_python_ordered_fold(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    row = STT.event_weekday_chi2(events).collect()[0]

    cells: dict[tuple[str, int], int] = {}
    for r in (
        events.select(
            "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
        )
        .groupBy("event_type", "dow")
        .count()
        .collect()
    ):
        cells[(r["event_type"], r["dow"])] = r["count"]
    rt: dict[str, int] = {}
    ct: dict[int, int] = {}
    for (t, d), o in cells.items():
        rt[t] = rt.get(t, 0) + o
        ct[d] = ct.get(d, 0) + o
    n_total = sum(cells.values())
    chi2 = 0.0  # same left fold over the same (type, dow) sort order
    for t, d in sorted(cells):
        o = cells[(t, d)]
        diff = float(n_total * o - rt[t] * ct[d])  # exact BIGINT -> double
        chi2 += diff * diff / (float(n_total) * float(rt[t]) * float(ct[d]))

    assert row["n_cells"] == len(cells)
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert row["chi2"] == chi2  # bit-identical, not approx
    mindim = min(len(rt) - 1, len(ct) - 1)
    assert row["cramers_v"] == math.sqrt(chi2 / (n_total * mindim))


def test_brand_corr_bit_exact_vs_python(spark):
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    got = {
        r["p_brand"]: (r["n_items"], r["corr_qty_price"])
        for r in STT.brand_qty_price_corr(lineitem, part).collect()
    }

    rows = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.round("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    s: dict[str, list[int]] = {}
    for r in rows:
        t = s.setdefault(r["p_brand"], [0, 0, 0, 0, 0, 0])
        x, y = r["x"], r["y"]  # Python ints: exact, unbounded
        t[0] += 1
        t[1] += x
        t[2] += y
        t[3] += x * y
        t[4] += x * x
        t[5] += y * y
    want = {}
    for brand, (n, sx, sy, sxy, sxx, syy) in s.items():
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        if da and db:
            want[brand] = (
                n,
                float(n * sxy - sx * sy)
                / math.sqrt(float(da))
                / math.sqrt(float(db)),
            )
    assert got == want  # == on floats: identical op chain over exact ints
    assert len(got) == 25


def test_autocorrelation_consecutive_days_only(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    row = STT.revenue_autocorrelation(orders).collect()[0]

    daily: dict[int, int] = {}
    epoch_rows = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lit(STT._X_EPOCH).cast("date")
        ).alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    for r in epoch_rows:
        daily[r["d"]] = daily.get(r["d"], 0) + r["cents"]
    pairs = [
        (daily[d], daily[d + 1]) for d in sorted(daily) if d + 1 in daily
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    da, db = n * sxx - sx * sx, n * syy - sy * sy
    want = float(n * sxy - sx * sy) / math.sqrt(float(da)) / math.sqrt(
        float(db)
    )
    assert row["n_pairs"] == n
    assert row["autocorr_lag1"] == want
    # the fixture calendar has gaps: consecutive-day pairing must drop
    # at least one day, i.e. pairs < days
    assert n < len(daily)


def test_ks_statistic_bit_exact_vs_python(spark):
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    row = STT.ks_returned_price(lineitem).collect()[0]

    per_v: dict[int, list[int]] = {}
    for r in lineitem.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (F.col("l_returnflag") == "R").alias("is_r"),
    ).collect():
        c = per_v.setdefault(r["cents"], [0, 0])
        c[0 if r["is_r"] else 1] += 1
    n1 = sum(v[0] for v in per_v.values())
    n2 = sum(v[1] for v in per_v.values())
    cum1 = cum2 = 0
    dnum = 0
    for cents in sorted(per_v):
        cum1 += per_v[cents][0]
        cum2 += per_v[cents][1]
        dnum = max(dnum, abs(cum1 * n2 - cum2 * n1))
    assert row["n_returned"] == n1 and row["n_other"] == n2
    assert row["ks_stat"] == float(dnum) / float(n1 * n2)
    assert 0.0 <= row["ks_stat"] <= 1.0


def test_entropy_matches_python_ordered_fold(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    got = {
        r["dow"]: (
            r["n_events"],
            r["n_types"],
            r["entropy_bits"],
            r["norm_entropy"],
        )
        for r in STT.event_type_entropy(events).collect()
    }

    cells: dict[tuple[int, str], int] = {}
    for r in (
        events.select(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"), "event_type"
        )
        .groupBy("dow", "event_type")
        .count()
        .collect()
    ):
        cells[(r["dow"], r["event_type"])] = r["count"]
    for dow in sorted({d for d, _ in cells}):
        cl = sorted((t, c) for (d, t), c in cells.items() if d == dow)
        n = sum(c for _, c in cl)
        h = 0.0  # same left fold, same (event_type) order
        for _, c in cl:
            p = c / n
            h += -(p * math.log(p))
        n_ev, n_ty, bits, norm = got[dow]
        assert (n_ev, n_ty) == (n, len(cl))
        assert bits == pytest.approx(h / math.log(2.0), abs=1e-6)
        if len(cl) > 1:
            assert norm == pytest.approx(h / math.log(len(cl)), abs=1e-6)
            assert 0.0 <= norm <= 1.0
        else:
            assert norm == 0.0


def test_benford_shares_exact_and_complete(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    rows = STT.benford_price_audit(orders).collect()

    counts: dict[int, int] = {}
    for r in orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    ).collect():
        if r["cents"] > 0:
            d = int(str(r["cents"])[0])
            counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    got = {r["digit"]: r for r in rows}
    assert set(got) == set(counts)
    for d, n in counts.items():
        r = got[d]
        assert r["n_orders"] == n
        assert r["obs_share"] == n / total  # raw exact-rational division
        assert r["exp_share"] == math.log10(1.0 + 1.0 / d)
        assert r["abs_dev"] == abs(n / total - math.log10(1.0 + 1.0 / d))
    # shares sum to 1 within float error; TPC-H prices are roughly
    # log-uniform over one decade so every digit appears at this SF
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-9
