"""Registry-wide guard against the DuckDB HUGEINT/DECIMAL oracle trap.

DuckDB's sum() over INTEGER returns HUGEINT (and some arithmetic widens to
DECIMAL); pandas/Arrow then surfaces those as float/object/decimal128,
which value-hash-diverges from Spark's BIGINT in the driver's correctness
gate even when every value is identical — round 7's only red row
(`pii_scrub`) was exactly this. Every oracle must therefore CAST its
aggregates so DuckDB returns plain int/float/string/timestamp columns.

This test executes EVERY registered oracle at sf0.001 and asserts the
Arrow schema of the result contains only driver-safe types, so a future
oracle that drops a cast fails in pytest instead of as a red driver row.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from tp1_distribuidos_mapreduce_spark.registry import oracle_sql


def _is_driver_safe(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)  # int8..int64/uint — pandas keeps these integral
        or pa.types.is_floating(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_boolean(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
    )


@pytest.mark.parametrize("name", sorted(oracle_sql()))
def test_oracle_returns_driver_safe_dtypes(duck, name):
    tbl = duck.sql(oracle_sql()[name]).fetch_arrow_table()
    bad = [
        f"{f.name}: {f.type}" for f in tbl.schema if not _is_driver_safe(f.type)
    ]
    assert not bad, (
        f"oracle '{name}' returns HUGEINT/DECIMAL-class columns {bad} — "
        "wrap the offending aggregates in CAST(... AS BIGINT) / CAST(... AS "
        "DOUBLE) so the driver's pandas conversion matches Spark's types"
    )
