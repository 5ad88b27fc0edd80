"""Operator-level invariants for the scale-technique queries
(plans/scale_queries.py, operators/runtime_filters.py). The oracle
differentials in test_oracle.py check end-to-end values; these pin the
properties the differential alone would not distinguish."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import runtime_filters as rf
from data_warehouse_implementation_spark.plans import scale_queries
from data_warehouse_implementation_spark.session import load_tables


def test_bloom_no_false_negatives_and_some_pruning(spark):
    """Every member key must pass (no false negatives), and the filter
    must actually prune non-members (it is not an always-true stub)."""
    keys = spark.range(1, 401).select(F.col("id").alias("k"))
    probe = spark.range(1, 20_001).select(F.col("id").alias("x"))
    out = rf.bloom_prefilter(probe, keys, "x", "k")
    passed = {r.x for r in out.filter("bloom_pass").collect()}
    members = set(range(1, 401))
    assert members <= passed, "bloom dropped a true member"
    # 400 keys * 3 bits in 16384 -> fp rate ~ (0.07)^3; 19600 non-member
    # probes must be overwhelmingly pruned
    assert len(passed - members) < 200, "bloom is not pruning"


def test_bloom_prefilter_survives_column_name_collisions(spark):
    """A fact that already owns 'bloom' / '__rf...'-shaped columns must
    pass through untouched: scratch names are reserved dynamically, so
    the probe neither clobbers user data nor raises ambiguity errors."""
    keys = spark.range(1, 51).select(F.col("id").alias("k"))
    probe = spark.range(1, 1_001).select(
        F.col("id").alias("x"),
        F.lit("user-bloom").alias("bloom"),
        F.lit(7).alias("__rfp0"),
        F.lit(8).alias("__rfw0"),
    )
    out = rf.bloom_prefilter(probe, keys, "x", "k")
    assert set(out.columns) == {"x", "bloom", "__rfp0", "__rfw0", "bloom_pass"}
    rows = out.filter("bloom_pass").collect()
    assert {r.x for r in rows} >= set(range(1, 51))
    assert all(
        r["bloom"] == "user-bloom" and r["__rfp0"] == 7 and r["__rfw0"] == 8
        for r in rows
    )


def test_bloom_prefilter_refuses_to_clobber_output_column(spark):
    """The OUTPUT column gets the same no-clobber protection as the
    scratch columns: withColumn would silently overwrite a pre-existing
    'bloom_pass' on the fact, so the probe must refuse instead."""
    import pytest

    keys = spark.range(1, 51).select(F.col("id").alias("k"))
    probe = spark.range(1, 101).select(
        F.col("id").alias("x"), F.lit(True).alias("bloom_pass")
    )
    with pytest.raises(ValueError, match="bloom_pass"):
        rf.bloom_prefilter(probe, keys, "x", "k")


def test_bloom_probe_plan_is_map_side(spark):
    """The probe side must not shuffle the fact: the only exchange in
    the plan feeds the broadcast of the 1-row filter."""
    keys = spark.range(1, 101).select(F.col("id").alias("k"))
    probe = spark.range(1, 1_001).select(F.col("id").alias("x"))
    plan = rf.bloom_prefilter(probe, keys, "x", "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    import re

    # no shuffle exchange over the probe relation (hash aggregation of
    # the tiny position table is allowed)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "x#" not in line, f"fact side shuffled: {line}"


def test_quantile_rollup_bounds(spark):
    """Histogram quantile lower bounds must bracket the exact quantile
    within one bin width, and be monotone p50 <= p90 <= p99."""
    t = load_tables(spark, "/root/testdata/sf0.01")
    out = {r.event_type: r for r in scale_queries.events_quantile_rollup(t).collect()}
    exact = (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    )
    for r in exact:
        o = out[r.event_type]
        assert o.p50_lo <= o.p90_lo <= o.p99_lo
        for q in ("p50", "p90", "p99"):
            lo = getattr(o, f"{q}_lo")
            assert lo - scale_queries.BIN_W <= getattr(r, q) <= lo + scale_queries.BIN_W


def test_priority_sample_partition_invariant(spark):
    """The selected sample must be a pure function of (id, weight) —
    identical under any physical partitioning (the property rand()-based
    weighted sampling lacks)."""
    from data_warehouse_implementation_spark.operators import corpus

    docs = load_tables(spark, "/root/testdata/sf0.01")["documents"].select(
        "doc_id", "n_chars"
    )
    a = {
        r.doc_id
        for r in corpus.priority_sample(docs.repartition(1), "n_chars", 25).collect()
    }
    b = {
        r.doc_id
        for r in corpus.priority_sample(docs.repartition(13, "doc_id"), "n_chars", 25).collect()
    }
    assert a == b and len(a) == 25


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60, unique=True),
    probes=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60, unique=True),
)
def test_bloom_never_false_negative_property(spark, keys, probes):
    """For ANY build set and probe set: every probe that IS a member
    passes the filter (no false negatives, the Bloom invariant that
    makes the join-prefilter transparent)."""
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    pdf = spark.createDataFrame([(p,) for p in set(probes) | set(keys)], "x long")
    out = rf.bloom_prefilter(pdf, kdf, "x", "k")
    passed = {r.x for r in out.filter("bloom_pass").collect()}
    assert set(keys) <= passed
