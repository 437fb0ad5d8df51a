"""Differential tests: every registered query with an oracle is checked
against DuckDB at sf0.001 — the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tp1_distribuidos_mapreduce_spark import registry

from conftest import SF_SMOKE, assert_df_matches_oracle

ORACLE_NAMES = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    sdf = registry.queries()[name](spark, SF_SMOKE)
    assert_df_matches_oracle(sdf, duck, registry.oracle_sql()[name])


def test_every_query_has_callable_signature(spark):
    qs = registry.queries()
    assert len(qs) >= 4
    for name, fn in qs.items():
        assert callable(fn), name
