"""End-to-end warehouse build tests (SURVEY §5 strategy #3):
referential integrity, active-version uniqueness, surrogate
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.plans import warehouse


def test_build_warehouse_referential_integrity(spark, tables):
    wh = warehouse.build_warehouse(tables)
    fact = wh["lineitem_fact"].cache()
    staging_n = warehouse._staging(tables).count()
    # every staging row produced exactly one fact row => every FK resolved
    assert fact.count() == staging_n
    # every surrogate FK resolves back to its dimension
    for fk, dim in [
        ("company_id", "company_dim"),
        ("location_id", "location_dim"),
        ("category_id", "category_dim"),
    ]:
        unresolved = fact.join(
            wh[dim].select(F.col(fk)), on=fk, how="left_anti"
        ).count()
        assert unresolved == 0, fk
    # date FKs exist in the calendar
    dates = wh["date_dim"].select("date_id")
    for fk in ("date_id_ship", "date_id_order"):
        unresolved = fact.join(
            dates.withColumnRenamed("date_id", fk), on=fk, how="left_anti"
        ).count()
        assert unresolved == 0, fk
    fact.unpersist()


def test_scd2_dim_active_uniqueness(spark, tables):
    wh = warehouse.build_warehouse(tables)
    res = wh["resolution_dim"]
    dup_active = (
        res.filter("active").groupBy("o_orderkey").count().filter("count > 1").count()
    )
    assert dup_active == 0


def test_surrogate_keys_deterministic_across_runs(spark, tables):
    d1 = warehouse.warehouse_dim_build(tables).collect()
    d2 = warehouse.warehouse_dim_build(tables).collect()
    assert d1 == d2
    # dense 1..N assignment
    ids = sorted(r.category_id for r in d1)
    assert ids == list(range(1, len(ids) + 1))
