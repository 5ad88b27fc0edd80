"""Differential test: every registered query must match its DuckDB
oracle at sf0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from data_warehouse_implementation_spark import registry

from .oracle_utils import compare_to_oracle

ORACLE_NAMES = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    compare_to_oracle(spark, name)


def test_every_query_has_rows_at_smoke_sf(spark):
    for name, q in registry.queries().items():
        assert q(spark, "/root/testdata/sf0.001").count() > 0, name
