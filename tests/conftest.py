from __future__ import annotations

import duckdb
import pytest

from tp1_distribuidos_mapreduce_spark.session import get_spark
from tp1_distribuidos_mapreduce_spark.sources.tables import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tp1-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with fixture tables registered as views at sf0.001,
    mirroring the driver's oracle setup (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_oracle(sdf, duck, sql, float_tol=1e-9):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL —
    the same discipline as the driver's t2 gate (and the reference's
    sequential-oracle comparison, tests/test_wc.py:30-39)."""
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(row[c] for c in spark_cols) for row in sdf.collect()]
    assert_rows_match_oracle(spark_cols, spark_rows, duck, sql, float_tol)


def assert_rows_match_oracle(spark_cols, spark_rows, duck, sql, float_tol=1e-9):
    """Comparison half of assert_df_matches_oracle, over already-collected
    (cols, rows) — lets the oracle differential collect all queries
    CONCURRENTLY (Spark's scheduler is thread-safe) and compare serially."""
    def row_key(row):
        # None-safe, type-stable sort key; identical values get identical
        # keys in both engines so rows pair up correctly. Numerics sort
        # NUMERICALLY (a str() key would order "10.0" < "9.0" — harmless
        # while both engines emit identical values, but a last-ulp
        # divergence could then mispair rows whose string forms flip
        # order; the numeric key keeps near-equal values adjacent so the
        # float_tol comparison sees the intended pairing).
        return tuple(
            (v is None, "", float(v))
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            else (v is None, str(type(v).__name__), str(v))
            for v in row
        )

    spark_rows = sorted(spark_rows, key=row_key)
    # Engine-wide output policy (verify notes): no NULLs in any query
    # output — the driver may sort rows as plain tuples, and None vs
    # str/datetime raises there. Enforced mechanically on every
    # oracle-backed query; coalesce to sentinels in BOTH engines instead.
    nulls = [
        (spark_cols[i], r)
        for r in spark_rows
        for i, v in enumerate(r)
        if v is None
    ]
    assert not nulls, f"NULLs in query output (policy: coalesce to sentinels): {nulls[:3]}"
    rel = duck.sql(sql)
    duck_cols = sorted(rel.columns)
    assert spark_cols == duck_cols, f"columns differ: {spark_cols} vs {duck_cols}"
    idx = [rel.columns.index(c) for c in duck_cols]
    duck_rows = sorted(
        (tuple(r[i] for i in idx) for r in rel.fetchall()), key=row_key
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    )
    for sr, dr in zip(spark_rows, duck_rows):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) and isinstance(dv, float):
                assert abs(sv - dv) <= float_tol * max(1.0, abs(sv), abs(dv)), (sr, dr)
            else:
                assert sv == dv, (sr, dr)
