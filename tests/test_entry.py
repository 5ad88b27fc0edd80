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
    # Capacity escape hatch: deferring an addition is legal ONLY when
    # the window is genuinely full of must-run rows (the flagship, the
    # entire max-staleness cohort, and same-round additions occupy all
    # 50 slots), and every deferred addition must sit in the tail
    # positions immediately after the window (interleaved at most with
    # other documented same-round deferrals, e.g. an impl-changed
    # query) so the NEXT round's driver checks it before anything
    # else. Meanwhile the full local oracle battery
    # (tests/test_oracle.py) proves it with the driver's own
    # dtype-strict differential.
    if deferred:
        # (a) the window must be GENUINELY full of must-run rows:
        # every first-50 slot is the flagship, a member of the
        # max-staleness cohort, or a same-round addition — otherwise a
        # fresh, just-checked query is squatting on a slot the new
        # query should have.
        sys.path.insert(0, str(repo_root / "tools"))
        import staleness

        rows = staleness.staleness_table(repo_root)
        checked_rows = [r for r in rows if r[1] > 0]
        worst = max(s for _, _, s, _ in checked_rows)
        stalest = {n for n, _, s, _ in checked_rows if s == worst}
        must_run = {"timely_rank_report"} | stalest | set(new_queries)
        squatters = [n for n in first50 if n not in must_run]
        assert not squatters, (
            f"new queries deferred ({deferred}) while non-must-run rows "
            f"hold first-50 slots: {squatters}"
        )
        # (b) the deferred additions must lead position 51+ so the next
        # round's driver checks them first — interleaved ONLY with the
        # explicitly documented same-round deferrals (impl-changed
        # rows) in registry._WINDOW_DEFERRAL_INTERLEAVE.
        interleave = list(getattr(registry, "_WINDOW_DEFERRAL_INTERLEAVE", []))
        unregistered_il = [n for n in interleave if n not in registry._QUERIES]
        assert not unregistered_il, (
            f"interleave names not registered: {unregistered_il}"
        )
        new_il = [n for n in interleave if n in new_queries]
        assert not new_il, (
            f"interleave must hold impl-changed (not new) rows: {new_il}"
        )
        window_names = [n for n in registry._DRIVER_WINDOW if n in registry._QUERIES]
        # the deferred additions must form the tail's leading block,
        # interleaved only with documented names; the prefix scan stops
        # at the first row that is neither (so a stale interleave entry
        # absent from the tail can never extend the slice onto the
        # refresh-order rows behind it)
        lead_block: list[str] = []
        for n in window_names[50:]:
            if n in deferred or n in interleave:
                lead_block.append(n)
            else:
                break
        missing_from_lead = [n for n in deferred if n not in lead_block]
        assert not missing_from_lead, (
            f"deferred additions must lead position 51+: {missing_from_lead}"
        )

def test_driver_window_covers_stalest():
    """VERDICT r6 #7: window rotation is derived from the committed
    staleness census (tools/staleness.py) instead of re-derived by
    hand — the first 50 must contain EVERY query whose latest driver
    check is maximally stale (never-checked queries are covered by the
    never-deferred rule above), and no first-50 slot may be wasted on
    a query checked in the most recent round other than the flagship
    and queries changed this round (approximated: the window must
    include all queries >= 2 rounds stale, up to capacity)."""
    import sys
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo_root / "tools"))
    import staleness

    from data_warehouse_implementation_spark import registry

    rows = staleness.staleness_table(repo_root)
    checked = [r for r in rows if r[1] > 0]  # never-checked handled elsewhere
    assert checked, "no staleness data"
    worst = max(s for _, _, s, _ in checked)
    stalest = {n for n, _, s, _ in checked if s == worst}
    never = {n for n, rnd, _, _ in rows if rnd == 0}
    first50 = [n for n in registry._DRIVER_WINDOW if n in registry._QUERIES][:50]
    missing = stalest - set(first50)
    if missing:
        # Capacity rule (mirrors the integrity test's escape hatch):
        # when flagship + never-checked + max-stale exceed 50 slots the
        # cohort cannot retire whole. Overflow is legal ONLY when (a)
        # every first-50 slot holds a must-run row (no fresher query is
        # squatting on a slot an overflow member should have) and (b)
        # the overflowed max-stale rows lead position 51+ (interleaved
        # at most with documented same-round deferrals / deferred new
        # additions, which hold the same must-run rank) so next round's
        # driver reaches them first.
        must_run = {"timely_rank_report"} | stalest | never
        squatters = [n for n in first50 if n not in must_run]
        assert not squatters, (
            f"max-staleness queries overflow the window ({sorted(missing)}) "
            f"while non-must-run rows hold first-50 slots: {squatters}"
        )
        window_names = [n for n in registry._DRIVER_WINDOW if n in registry._QUERIES]
        interleave = set(getattr(registry, "_WINDOW_DEFERRAL_INTERLEAVE", []))
        lead_block: list[str] = []
        for n in window_names[50:]:
            if n in missing or n in never or n in interleave:
                lead_block.append(n)
            else:
                break
        not_leading = missing - set(lead_block)
        assert not not_leading, (
            f"overflowed max-staleness ({worst} rounds) queries must lead "
            f"position 51+: {sorted(not_leading)}"
        )
    # every query must appear somewhere in the window ordering so the
    # round-over-round rotation never silently orphans one
    orphans = set(registry._QUERIES) - set(registry._DRIVER_WINDOW)
    stale_orphans = {n for n, _, s, _ in checked if s >= 2} & orphans
    assert not stale_orphans, f"stale queries absent from window ordering: {sorted(stale_orphans)}"


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


def test_survey_test_count_matches_collection():
    """SURVEY.md's pytest-test count must track the collected suite
    (VERDICT r6 #4: the footer said 249 while the suite held 300).
    Counted by a collect-only subprocess so a filtered (-k) run of this
    test still sees the full suite size."""
    import re
    import subprocess
    import sys
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    text = (repo_root / "SURVEY.md").read_text()
    m = re.search(r"(\d+) pytest tests", text)
    assert m, "SURVEY.md test-count sentence not found"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        cwd=repo_root, capture_output=True, text=True, timeout=300,
    )
    mc = re.search(r"(\d+) tests collected", out.stdout)
    assert mc, f"could not parse collect-only output:\n{out.stdout[-2000:]}"
    assert int(m.group(1)) == int(mc.group(1)), (
        f"SURVEY.md says {m.group(1)} tests; collection finds {mc.group(1)} — "
        "update the SURVEY footer"
    )


def test_registry_wide_plan_lint_no_cartesian(spark):
    """Engine-wide scale invariant, checked over EVERY registered
    query's compiled plan at sf0.001: no CartesianProduct anywhere,
    and every BroadcastNestedLoopJoin is a one-row scalar-frame
    broadcast (IdentityBroadcastMode — the lazy `broadcast scalar N`
    pattern), never a data-by-data nested loop. This is the lint that
    would have caught an accidental unconstrained crossJoin in any of
    the 171 queries the day it was written."""
    from data_warehouse_implementation_spark import registry

    offenders = []
    for name, q in registry.queries().items():
        plan = (
            q(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        n_scalar = plan.count("IdentityBroadcastMode")
        if n_bnlj > n_scalar:
            offenders.append((name, f"non-scalar BNLJ ({n_bnlj} > {n_scalar})"))
    assert not offenders, offenders


def test_staleness_tool_census_and_window_suggestion():
    """tools/staleness.py: latest_checks keeps the NEWEST round per
    query and marks red checks; suggest_window leads with the flagship,
    then never-checked, then stalest-first."""
    import json
    import sys
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo_root / "tools"))
    import staleness

    # synthetic correctness history in a temp root
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        (root / "CORRECTNESS_r01.json").write_text(json.dumps({
            "q_old": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
            "q_red": {"rows_match": False, "schema_match": True, "hash_match": False, "err": None},
        }))
        (root / "CORRECTNESS_r03.json").write_text(json.dumps({
            "q_red": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        }))
        latest = staleness.latest_checks(root)
        assert latest["q_old"] == (1, True)
        assert latest["q_red"] == (3, True)  # newest check wins, now green

    # live repo: the suggestion starts with the flagship and contains
    # every registered query exactly once when unsliced
    from data_warehouse_implementation_spark import registry

    full = staleness.suggest_window(0)
    assert full[0] == "timely_rank_report"
    assert sorted(full) == sorted(registry._QUERIES)
    assert staleness.suggest_window(10) == full[:10]


def test_bench_regression_gate_noise_floor():
    """VERDICT r7 #2: the bench regression gate must not flag shared-
    box contention. A query with a noisy run history earns a floor of
    3x its spread, so the r7-style +1.4s wobble passes; a historically
    stable query still trips on a real slowdown; and both the ratio
    and the absolute floor must trip together."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # no history: absolute floor only
    assert bench.noise_floor([]) == bench.NOISE_FLOOR_SECONDS
    assert bench.noise_floor([1.3]) == bench.NOISE_FLOOR_SECONDS
    # noisy history widens the floor: MAD 0.35 -> spread 1.225 -> ~3.7s
    # (matches the old max-min floor of 3.6 on genuinely-spread noise)
    noisy = [1.2, 2.4, 1.5, 1.9]
    assert bench.noise_floor(noisy) == 3.0 * bench.MAD_SCALE * 0.35
    assert abs(bench.noise_floor(noisy) - 3.6) < 0.2
    # the r7 adjudication case: 1.27s -> 2.69s (2.1x, +1.4s) on a query
    # whose 3-run history wobbles by >0.5s -> NOT a regression (with
    # < 4 runs no point is an identifiable outlier, so the full range
    # stays the spread)
    assert not bench.is_regression(2.69, 1.27, [1.27, 1.9, 1.4])
    # same delta on a rock-stable query -> flagged
    assert bench.is_regression(2.69, 1.27, [1.27, 1.28, 1.26])
    # VERDICT r9 #7 (robust spread): ONE stray spike in an otherwise
    # flat history must NOT widen the floor — the MAD ignores it, so a
    # later real regression on the flat baseline still trips...
    spiky = [1.0, 1.01, 1.0, 4.0, 1.02]
    assert bench.noise_floor(spiky) == bench.NOISE_FLOOR_SECONDS
    assert bench.is_regression(2.6, 1.0, spiky)
    # ...under the old max-min rule the same spike set a 9s floor
    assert 3.0 * (max(spiky) - min(spiky)) > 2.6 - 1.0
    # big ratio but tiny absolute delta (fast query jitter) -> not flagged
    assert not bench.is_regression(0.6, 0.2, [0.2, 0.21])
    # big absolute delta but ratio under 1.5x -> not flagged
    assert not bench.is_regression(13.0, 10.0, [10.0, 10.1])
    # unambiguous regression on an empty history -> flagged
    assert bench.is_regression(4.0, 1.0, [])
    # ADVICE r8 (self-widening floor): a run flagged as a regression is
    # EXCLUDED from the rolling history, so it can never widen its own
    # query's noise floor and mask follow-on regressions...
    hist = bench.next_history(
        {"q": [1.0, 1.1], "stable": [2.0]},
        {"q": 4.0, "stable": 2.1},
        {"q": {"now": 4.0}},
    )
    assert hist == {"q": [1.0, 1.1], "stable": [2.0, 2.1]}
    # ...and unflagged runs still roll forward, capped at HISTORY_KEEP
    long_hist = bench.next_history(
        {"q": [float(i) for i in range(bench.HISTORY_KEEP)]}, {"q": 9.9}, {}
    )
    assert len(long_hist["q"]) == bench.HISTORY_KEEP
    assert long_hist["q"][-1] == 9.9


def test_registry_exchange_budget(spark):
    """VERDICT r7 #5: structural shuffle budget. Every registered
    query's compiled plan must not contain MORE shuffle exchanges than
    its committed budget (tools/exchange_baseline.json) — a shuffle
    regression is caught here, on any machine, without timing noise.
    Intentional plan changes regenerate the baseline in the same commit
    (python tools/exchange_budget.py --update; RUNBOOK §9). A query
    missing from the baseline fails too: new queries must land with
    their budget."""
    import sys
    from pathlib import Path

    repo_root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo_root / "tools"))
    import exchange_budget

    base = exchange_budget.load_baseline()
    counts = exchange_budget.census(spark)
    missing = sorted(set(counts) - set(base))
    assert not missing, (
        f"queries without a committed exchange budget: {missing} — run "
        "`python tools/exchange_budget.py --update` and commit the baseline"
    )
    over = {
        n: (c, base[n]) for n, c in counts.items() if n in base and c > base[n]
    }
    assert not over, (
        "shuffle-exchange count increased (now, budget): "
        f"{over} — if intentional, regenerate tools/exchange_baseline.json "
        "in the same commit"
    )
