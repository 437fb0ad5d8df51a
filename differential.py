"""Full-registry differential harness: every oracled query's Spark result
hash-compared against its DuckDB oracle at a chosen scale factor, written
as a committed per-round artifact (DIFFERENTIAL_r{N}.json — VERDICT r12
"Next round" #2).

Why this exists: the driver's per-round correctness pass covers only the
first 50 registry entries (the _WINDOW), so 3/4 of the oracled registry
is re-proven each round only by builder-side runs that used to live in
prose. This harness makes that compensating signal a machine-checkable
artifact: per-query rows/schema/hash matches at sf0.1 — the 32-partition
scale where float partial-sum order actually varies — for EVERY oracled
query, committed alongside BENCH_r{N}.json.

Usage:
    python differential.py [OUT.json]
      SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
      SPARK_GRAFT_DIFF_THREADS  collect parallelism (default 8)

The comparison is the driver's own semantics (the verify-skill recipe):
columns sorted by name, rows as tuples in sorted-column order, sha256
over sorted row reprs. A query passes only on rows AND schema AND hash.

Rows-only queries (no oracle by design: sketches, quantizers, media,
graph floats) get the next-strongest machine check at the same scale:
two independent executions must hash identically (the sf0.001
determinism gate from tests/test_relational.py, re-proven at sf0.1
where partition count and partial-order actually vary).

Exit code = number of failing queries (either kind).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _vhash(rows: list[tuple]) -> str:
    h = hashlib.sha256()
    # key=repr gives a total order even when a column mixes NULL (None)
    # with non-None values — plain sorted(rows) would raise TypeError on
    # the None-vs-float comparison and record a false err for a
    # legitimately-NULL-producing query (ADVICE r13).
    for r in sorted(rows, key=repr):
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    from tp1_distribuidos_mapreduce_spark import registry
    from tp1_distribuidos_mapreduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "DIFFERENTIAL.json"
    n_threads = int(os.environ.get("SPARK_GRAFT_DIFF_THREADS", "8"))

    spark = get_spark("differential")
    qs, oracles = registry.queries(), registry.oracle_sql()
    names = [n for n in qs if n in oracles]

    # DuckDB connections are not thread-safe; one per worker thread, all
    # sharing the same read-only parquet views.
    tls = threading.local()

    def con():
        if not hasattr(tls, "con"):
            c = duckdb.connect()
            for t in TABLES:
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            tls.con = c
        return tls.con

    def one(name: str) -> tuple[str, dict]:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(row[c] for c in scols) for row in sdf.collect()]
            rel = con().sql(oracles[name])
            dcols = sorted(rel.columns)
            idx = [rel.columns.index(c) for c in dcols]
            drows = [tuple(r[i] for i in idx) for r in rel.fetchall()]
            rec = {
                "rows_spark": len(srows),
                "rows_oracle": len(drows),
                "rows_match": len(srows) == len(drows),
                "schema_match": scols == dcols,
                "hash_match": _vhash(srows) == _vhash(drows),
                "sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as ex:  # record, never abort the sweep
            rec = {"err": f"{type(ex).__name__}: {ex}"[:300],
                   "sec": round(time.perf_counter() - t0, 2)}
        return name, rec

    rows_only = [n for n in qs if n not in oracles]

    def one_rows_only(name: str) -> tuple[str, dict]:
        t0 = time.perf_counter()

        def run() -> tuple[int, str]:
            sdf = qs[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            rows = [tuple(row[c] for c in cols) for row in sdf.collect()]
            return len(rows), _vhash(rows)

        try:
            (n_a, h_a), (n_b, h_b) = run(), run()
            rec = {
                "rows": n_a,
                "two_run_hash_match": (n_a, h_a) == (n_b, h_b),
                "sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as ex:
            rec = {"err": f"{type(ex).__name__}: {ex}"[:300],
                   "sec": round(time.perf_counter() - t0, 2)}
        return name, rec

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        results = dict(pool.map(one, names))
        ro_results = dict(pool.map(one_rows_only, rows_only))
    wall = round(time.perf_counter() - t0, 1)
    spark.stop()

    ok = [n for n, r in results.items()
          if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")]
    bad = [n for n in names if n not in ok]
    ro_ok = [n for n, r in ro_results.items() if r.get("two_run_hash_match")]
    ro_bad = [n for n in rows_only if n not in ro_ok]
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__) or ".",
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    artifact = {
        "sf_dir": sf_dir,
        "generated_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "git_commit": commit,
        "n_oracled": len(names),
        "n_full_green": len(ok),
        "failing": bad,
        "n_rows_only": len(rows_only),
        "n_rows_only_deterministic": len(ro_ok),
        "rows_only_failing": ro_bad,
        "wall_sec": wall,
        "queries": {n: results[n] for n in names},
        "rows_only_queries": {n: ro_results[n] for n in rows_only},
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
        f.write("\n")
    print(
        f"differential: {len(ok)}/{len(names)} oracled full-green, "
        f"{len(ro_ok)}/{len(rows_only)} rows-only two-run-deterministic "
        f"at {sf_dir} in {wall}s -> {out_path}"
    )
    if bad:
        print("FAILING:", ", ".join(bad))
    if ro_bad:
        print("ROWS-ONLY FAILING:", ", ".join(ro_bad))
    return len(bad) + len(ro_bad)


if __name__ == "__main__":
    raise SystemExit(main())
