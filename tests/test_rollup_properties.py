"""Property-based differential for the hypertable cascade: the
hour -> day -> month merge of partials must equal a direct Python
replay of the month-grain aggregate on randomized event streams —
month/day/hour boundary timestamps, negative values, duplicate
timestamps, and single-row groups included. (The DuckDB oracle proves
cascade == direct on the fixed testdata; this drives the same claim
through adversarial micro-corpora.)"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_implementation_spark.plans.ingest_queries import (
    events_hypertable_rollup,
)

BASE = dt.datetime(2024, 1, 30, 0, 0, 0)

ev_rows = st.lists(
    st.tuples(
        # minutes offset: spans the Jan->Feb AND Feb->Mar boundaries
        st.integers(min_value=0, max_value=90 * 24 * 60),
        st.sampled_from(["a", "b"]),
        # integer cents: the decimal(18,2) cast is exact, so the
        # replay needs no rounding-mode modelling
        st.integers(min_value=-50_000, max_value=50_000),
    ),
    min_size=1,
    max_size=30,
)


def _replay(rows):
    agg: dict = {}
    for off, et, cents in rows:
        ts = BASE + dt.timedelta(minutes=off)
        month = ts.date().replace(day=1).strftime("%Y-%m-%d")
        hour = ts.replace(minute=0, second=0, microsecond=0)
        v = cents / 100.0
        s = agg.setdefault(
            (month, et),
            {"n": 0, "cents": 0, "mn": v, "mx": v, "hours": set()},
        )
        s["n"] += 1
        s["cents"] += cents
        s["mn"] = min(s["mn"], v)
        s["mx"] = max(s["mx"], v)
        s["hours"].add(hour)
    return sorted(
        (m, et, s["n"], s["cents"] / 100.0, s["mn"], s["mx"], len(s["hours"]))
        for (m, et), s in agg.items()
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ev_rows)
def test_cascade_matches_direct_replay(spark, rows):
    df = spark.createDataFrame(
        [(BASE + dt.timedelta(minutes=off), et, cents / 100.0) for off, et, cents in rows],
        "ts timestamp, event_type string, value double",
    )
    got = sorted(tuple(r) for r in events_hypertable_rollup({"events": df}).collect())
    assert got == _replay(rows)
