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


# Queries whose CORRECT output is empty on the driver corpora, with the
# reason; every other query must produce rows at smoke sf.
#   embedding_semantic_dedup: emits only vectors in semantic-dup groups,
#   and the driver embeddings have none (measured max within-cell cosine
#   0.60 at every sf vs tau 0.92 — see the registry comment); its
#   companion stats row is the non-empty driver differential and the
#   dup-structured sf1 corpus exercises the group path. The trained-
#   quantizer variant is empty for the same measured reason (training
#   moves cell boundaries, not pairwise cosines; within-cell pairs are
#   a subset of all pairs, whose max is 0.60).
_EMPTY_AT_SMOKE_SF = {
    "embedding_semantic_dedup",
    "embedding_semantic_dedup_trained",
}


def test_every_query_has_rows_at_smoke_sf(spark):
    for name, q in registry.queries().items():
        n = q(spark, "/root/testdata/sf0.001").count()
        if name in _EMPTY_AT_SMOKE_SF:
            assert n == 0, f"{name} documented empty but produced {n} rows"
        else:
            assert n > 0, name
