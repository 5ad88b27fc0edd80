"""Unit tests for the as-of / range-join / salted-agg operators —
edge cases the sf0.01 differential can't isolate (equal-timestamp
inclusivity, no-match nulls, collision guard, algebraic equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import asof


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "a"),   # matches r@100 (inclusive equality)
            (1, 150, "b"),   # matches r@100 (not r@200)
            (1, 250, "c"),   # matches r@200
            (2, 50, "d"),    # no right row at or before -> nulls
            (3, 10, "e"),    # key absent from right entirely
        ],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0), (2, 60, 9.0)],
        "k long, ts long, payload double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof.asof_join(left, right, on=["k"], ts_col="ts", payload=["payload"])
    got = {r["tag"]: (r["payload"], r["matched_ts"]) for r in out.collect()}
    assert got == {
        "a": (1.0, 100),
        "b": (1.0, 100),
        "c": (2.0, 200),
        "d": (None, None),
        "e": (None, None),
    }
    assert out.count() == left.count()  # left-join semantics: no row loss


def test_asof_payload_collision_raises(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof.asof_join(
            left, right.withColumnRenamed("payload", "tag"),
            on=["k"], ts_col="ts", payload=["tag"],
        )


def test_band_range_join_disjoint_and_unbounded(spark):
    fact = spark.createDataFrame([(0.0,), (49.9,), (50.0,), (999.0,)], "v double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("hi", 50.0, None)], "band string, lo double, hi double"
    )
    out = asof.band_range_join(fact, bands, "v")
    assert out.count() == 4  # every row matches exactly one band
    got = dict(out.groupBy("band").count().collect())
    assert got == {"lo": 2, "hi": 2}


def test_salted_agg_matches_direct(tables):
    li = tables["lineitem"]
    salted = asof.salted_two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), F.sum),
            "s": (F.sum(F.col("l_quantity").cast("decimal(18,2)")), F.sum),
        },
        salt_expr=F.hash("l_orderkey"),
        buckets=8,
    )
    direct = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))
