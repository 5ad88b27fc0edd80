"""Driver-verification staleness census (VERDICT r6 #7).

Reads every ``CORRECTNESS_r0N.json`` at the repo root and prints, per
registered query, the latest round the driver checked it and whether
that check was green — the table each round's ``_DRIVER_WINDOW``
rotation is derived from, so window selection stops being re-derived by
hand (and ``tests/test_entry.py::test_driver_window_covers_stalest``
enforces that the first 50 actually cover the stalest queries).

Usage::

    python tools/staleness.py                    # full table, stalest first
    python tools/staleness.py --stale 2          # only queries >= 2 rounds stale
    python tools/staleness.py --suggest-window 50  # next round's refresh order
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def correctness_rounds(root: Path = REPO_ROOT) -> dict[int, dict]:
    """{round: parsed CORRECTNESS json} for every round file present."""
    out: dict[int, dict] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.split("_r")[1])
        except (IndexError, ValueError):
            continue
        out[rnd] = json.loads(p.read_text())
    return out


def latest_checks(root: Path = REPO_ROOT) -> dict[str, tuple[int, bool]]:
    """{query: (latest round checked, was that check green)}. A check is
    green when rows+schema matched and (if hashed) the value hash did."""
    latest: dict[str, tuple[int, bool]] = {}
    for rnd, data in sorted(correctness_rounds(root).items()):
        for name, res in data.items():
            green = bool(
                res.get("rows_match")
                and res.get("schema_match", True)
                and res.get("hash_match", True)
                and not res.get("err")
            )
            latest[name] = (rnd, green)
    return latest


def staleness_table(root: Path = REPO_ROOT) -> list[tuple[str, int, int, bool]]:
    """[(query, latest_round, rounds_stale, green)] sorted stalest
    first; never-checked registered queries come first with round 0."""
    sys.path.insert(0, str(root))
    from data_warehouse_implementation_spark import registry

    latest = latest_checks(root)
    current = max(correctness_rounds(root), default=0)
    rows = []
    for name in registry._QUERIES:
        rnd, green = latest.get(name, (0, False))
        rows.append((name, rnd, current - rnd, green))
    rows.sort(key=lambda r: (r[1], r[0]))
    return rows


def suggest_window(slots: int, root: Path = REPO_ROOT) -> list[str]:
    """Mechanized window rotation: the flagship first, then
    never-checked queries (the never-deferred rule), then everything
    else stalest-first (ties by name). The round's builder still
    prepends queries whose IMPLEMENTATION changed that round — code
    changes aren't visible to this census — but the staleness ordering
    itself stops being re-derived by hand (VERDICT r6 #7)."""
    rows = staleness_table(root)
    never = sorted(n for n, rnd, _, _ in rows if rnd == 0 and n != "timely_rank_report")
    checked = sorted(
        ((s, n) for n, rnd, s, _ in rows if rnd > 0 and n != "timely_rank_report"),
        key=lambda t: (-t[0], t[1]),
    )
    ordered = ["timely_rank_report", *never, *(n for _, n in checked)]
    return ordered[:slots] if slots else ordered


def main() -> None:
    if "--suggest-window" in sys.argv:
        idx = sys.argv.index("--suggest-window") + 1
        try:
            slots = int(sys.argv[idx])
        except (IndexError, ValueError):
            print(__doc__, file=sys.stderr)
            sys.exit(2)
        for name in suggest_window(slots):
            print(name)
        return
    min_stale = 0
    if "--stale" in sys.argv:
        idx = sys.argv.index("--stale") + 1
        try:
            min_stale = int(sys.argv[idx])
        except (IndexError, ValueError):
            print(__doc__, file=sys.stderr)
            sys.exit(2)
    rows = staleness_table()
    print(f"{'query':40s} {'last':>4s} {'stale':>5s} green")
    for name, rnd, stale, green in rows:
        if stale >= min_stale:
            print(f"{name:40s} {rnd:4d} {stale:5d} {green}")
    worst = max((s for _, _, s, _ in rows), default=0)
    print(f"# {len(rows)} queries; max staleness {worst} rounds", file=sys.stderr)


if __name__ == "__main__":
    main()
