"""random_sample_fill determinism + distribution-correctness tests
(the round-1 scale/reproducibility findings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import imputation


def _frame(spark):
    rows = [(i, None if i % 3 == 0 else ("a" if i % 2 else "b")) for i in range(60)]
    return spark.createDataFrame(rows, "id long, v string")


def test_fill_is_deterministic_across_runs_and_partitionings(spark):
    df = _frame(spark)
    r1 = sorted(
        (r.id, r.v)
        for r in imputation.random_sample_fill(df, ["v"], id_col="id").collect()
    )
    r2 = sorted(
        (r.id, r.v)
        for r in imputation.random_sample_fill(
            df.repartition(7), ["v"], id_col="id"
        ).collect()
    )
    assert r1 == r2
    assert all(v is not None for _, v in r1)


def test_fill_values_come_from_pool(spark):
    df = _frame(spark)
    out = imputation.random_sample_fill(df, ["v"], id_col="id")
    filled = {r.v for r in out.filter(F.col("id") % 3 == 0).collect()}
    assert filled <= {"a", "b"}


def test_different_seed_changes_some_fill(spark):
    df = _frame(spark)
    a = sorted(
        (r.id, r.v)
        for r in imputation.random_sample_fill(df, ["v"], id_col="id", seed=1).collect()
    )
    b = sorted(
        (r.id, r.v)
        for r in imputation.random_sample_fill(df, ["v"], id_col="id", seed=2).collect()
    )
    assert a != b  # with 20 filled slots, P(identical) is negligible


def test_all_null_column_left_untouched(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    out = imputation.random_sample_fill(df, ["v"], id_col="id")
    assert [r.v for r in out.collect()] == [None, None]


def test_non_null_rows_never_change(spark):
    df = _frame(spark)
    out = imputation.random_sample_fill(df, ["v"], id_col="id")
    orig = {r.id: r.v for r in df.filter(F.col("v").isNotNull()).collect()}
    got = {r.id: r.v for r in out.collect() if r.id in orig}
    assert got == orig
