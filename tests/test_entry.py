from __future__ import annotations

import importlib
import sys


def test_entry_smoke(spark):
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "timely_rank" in df.columns
    # oracle keys must be a subset of query keys
    assert set(mod.oracle_sql()) <= set(mod.queries())
