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


def test_driver_window_integrity():
    """The driver checks the FIRST 50 registry entries: every window
    name must exist in the registry, carry an oracle, and appear only
    once — and every query registered this round (not present in any
    prior CORRECTNESS file) must sit INSIDE the first 50, the
    never-deferred rule for additions."""
    import json
    from pathlib import Path

    from data_warehouse_implementation_spark import registry

    w = registry._DRIVER_WINDOW
    assert len(w) == len(set(w)), "duplicate window entries"
    missing = [n for n in w if n not in registry._QUERIES]
    assert not missing, f"window names not registered: {missing}"
    first50 = [n for n in w if n in registry._QUERIES][:50]
    no_oracle = [n for n in first50 if n not in registry._ORACLES]
    assert not no_oracle, f"windowed queries without oracles: {no_oracle}"

    repo_root = Path(__file__).resolve().parents[1]
    checked_before = set()
    for i in range(1, 20):
        p = repo_root / f"CORRECTNESS_r{i:02d}.json"
        if p.exists():
            checked_before.update(json.loads(p.read_text()))
    assert checked_before, "no prior CORRECTNESS files found — repo-root derivation broken?"
    new_queries = [n for n in registry._QUERIES if n not in checked_before]
    deferred = [n for n in new_queries if n not in first50]
    assert not deferred, f"new queries deferred past the window: {deferred}"

def test_survey_count_matches_registry():
    """SURVEY.md's footer count must track the registry (VERDICT r5 #3:
    the doc drifted to 144 while the registry held 152)."""
    import re
    from pathlib import Path

    from data_warehouse_implementation_spark import registry

    text = (Path(__file__).resolve().parents[1] / "SURVEY.md").read_text()
    m = re.search(r"(\d+) registered queries, (\d+) with SQL oracles", text)
    assert m, "SURVEY.md footer count sentence not found"
    assert int(m.group(1)) == len(registry._QUERIES), (m.group(1), len(registry._QUERIES))
    assert int(m.group(2)) == len(registry._ORACLES), (m.group(2), len(registry._ORACLES))
