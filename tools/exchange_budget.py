"""Registry-wide SHUFFLE-EXCHANGE budget (VERDICT r7 #5).

The bench's timing signal is noisy (shared box); the number of shuffle
exchanges in a query's compiled physical plan is not. This tool
snapshots, per registered query, the count of shuffle Exchange nodes
(broadcast exchanges excluded — broadcasting a dim is the cheap path we
WANT) in the plan compiled at sf0.001, into the committed baseline
``tools/exchange_baseline.json``. The paired test
(``tests/test_entry.py::test_registry_exchange_budget``) fails when a
query's shuffle count EXCEEDS its committed budget — a structural
shuffle regression is caught at test time on any machine, no timing
required. Intentional plan changes update the baseline in the same
commit (RUNBOOK §9)::

    python tools/exchange_budget.py --update   # regenerate the baseline
    python tools/exchange_budget.py            # print the current census

Counts are deterministic because the census clears the session
materialization cache first and compiles in registry order — the same
family-head-builds-the-cache attribution the bench uses.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
BASELINE_PATH = Path(__file__).resolve().parent / "exchange_baseline.json"
CENSUS_SF_DIR = "/root/testdata/sf0.001"


def shuffle_count(plan: str) -> int:
    """Shuffle exchanges in a physical-plan string: every ``Exchange``
    node that is not a ``BroadcastExchange``. (Reused-exchange nodes
    print as ``ReusedExchange`` and are intentionally not counted — a
    reuse is the optimizer eliminating a shuffle, not adding one.)"""
    return (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )


def census(spark) -> dict[str, int]:
    """{query: shuffle exchange count} over every registered query's
    compiled plan, from a cleared materialization cache, in registry
    order (so family-cache builds land on the same heads every run)."""
    sys.path.insert(0, str(REPO_ROOT))
    from data_warehouse_implementation_spark import registry
    from data_warehouse_implementation_spark.plans import materialize

    materialize.clear()
    out: dict[str, int] = {}
    for name, q in registry.queries().items():
        plan = (
            q(spark, CENSUS_SF_DIR)._jdf.queryExecution().executedPlan().toString()
        )
        out[name] = shuffle_count(plan)
    return out


def load_baseline() -> dict[str, int]:
    return json.loads(BASELINE_PATH.read_text())


def main() -> None:
    sys.path.insert(0, str(REPO_ROOT))
    from data_warehouse_implementation_spark.session import get_spark

    spark = get_spark(app_name="exchange-budget")
    spark.sparkContext.setLogLevel("ERROR")
    counts = census(spark)
    if "--update" in sys.argv:
        BASELINE_PATH.write_text(json.dumps(counts, indent=1, sort_keys=True) + "\n")
        print(f"wrote {BASELINE_PATH} ({len(counts)} queries)")
    else:
        base = load_baseline() if BASELINE_PATH.exists() else {}
        for name, n in sorted(counts.items()):
            was = base.get(name)
            mark = "" if was == n else f"  (baseline: {was})"
            print(f"{name:40s} {n:3d}{mark}")
    spark.stop()


if __name__ == "__main__":
    main()
