"""Hypothesis differentials for the graph-walk operators: the
distributed formulations must match a direct per-node Python replay on
arbitrary small graphs — the same strategy the SCD algebra uses against
its per-row trigger replay."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_implementation_spark.operators import graph

# random directed weighted edge lists over a small node universe;
# dedup (src, dst) so weights are well-defined
_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=16,
).map(
    lambda rows: list(
        {(s, d): (f"n{s}", f"n{d}", w) for s, d, w in rows if s != d}.values()
    )
)


def _py_pagerank(edges, iterations=3, damping=0.85):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_tot = {}
    for s, _, w in edges:
        out_tot[s] = out_tot.get(s, 0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        mass = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            mass[d] += rank[s] * (w / out_tot[s])
        rank = {v: (1.0 - damping) / n + damping * mass[v] for v in nodes}
    return rank


def _py_lpa(edges, iterations=3):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    label = {v: v for v in nodes}
    for _ in range(iterations):
        new = {}
        for v in nodes:
            masses = {}
            for s, d, w in edges:
                if d == v:
                    masses[label[s]] = masses.get(label[s], 0) + w
            if masses:
                # largest mass, then smallest label
                new[v] = min(masses, key=lambda lb: (-masses[lb], lb))
            else:
                new[v] = label[v]
        label = new
    return label


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_edges_strategy)
def test_pagerank_matches_python_replay(spark, edges):
    if not edges:
        return
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {r.node: r["rank"] for r in graph.pagerank(df, iterations=3).collect()}
    want = _py_pagerank(edges, iterations=3)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_edges_strategy)
def test_label_propagation_matches_python_replay(spark, edges):
    if not edges:
        return
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {
        r.node: r.label for r in graph.label_propagation(df, iterations=3).collect()
    }
    assert got == _py_lpa(edges, iterations=3)
