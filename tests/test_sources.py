"""Sources/sinks + catalog guard tests (S1-S9, M5/M7)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_warehouse_implementation_spark.sources import csvio, nested
from data_warehouse_implementation_spark.sources.catalog import (
    ProtectedTableError,
    WarehouseCatalog,
)

REPO_TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "test_tmp")


@pytest.fixture()
def tmp_root():
    import shutil

    path = os.path.join(REPO_TMP, "catalog")
    shutil.rmtree(path, ignore_errors=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_csv_roundtrip_with_explicit_schema(spark, tmp_root):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.25)], "id long, s string, v double"
    )
    path = os.path.join(tmp_root, "csv")
    csvio.write_csv(df, path)
    back = csvio.read_csv(spark, path, schema="id long, s string, v double")
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, None, 2.25),
    ]


def test_nested_flatten_and_select(spark):
    df = spark.createDataFrame(
        [(1, {"total": {"a18": 10, "a65": 3}, "state": "tx"})],
        StructType(
            [
                StructField("id", LongType()),
                StructField(
                    "pop",
                    StructType(
                        [
                            StructField(
                                "total",
                                StructType(
                                    [
                                        StructField("a18", IntegerType()),
                                        StructField("a65", IntegerType()),
                                    ]
                                ),
                            ),
                            StructField("state", StringType()),
                        ]
                    ),
                ),
            ]
        ),
    )
    flat = nested.flatten(df)
    assert set(flat.columns) == {"id", "pop.total.a18", "pop.total.a65", "pop.state"}
    proj = nested.select_nested(df, {"pop.total.a18": "over_18", "pop.state": "state"})
    r = proj.collect()[0]
    assert (r.over_18, r.state) == (10, "tx")


def test_parse_json_column(spark):
    df = spark.createDataFrame([('{"k": 7}',), ("not json",)], "props string")
    out = nested.parse_json_column(df, "props", "k INT", out_col="p")
    vals = [(r.p.k if r.p else None) for r in out.collect()]
    assert sorted(vals, key=lambda v: (v is None, v)) == [7, None]


def test_catalog_ddl_write_append_drop(spark, tmp_root):
    cat = WarehouseCatalog(spark, tmp_root)
    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    cat.create_table("dim", schema)
    assert cat.table("dim").count() == 0
    assert cat.table("dim").schema == schema

    cat.insert_into("dim", spark.createDataFrame([(1, "a")], schema))
    cat.insert_into("dim", spark.createDataFrame([(2, "b")], schema))
    assert cat.table("dim").count() == 2

    cat.write("dim", spark.createDataFrame([(3, "c")], schema), mode="overwrite")
    assert [tuple(r) for r in cat.table("dim").collect()] == [(3, "c")]

    cat.drop_table("dim")
    assert not cat.exists("dim")


def test_catalog_append_only_guard(spark, tmp_root):
    """M5: the reference's delete-guard trigger
    (creating-tables.sql:196-216) as an engine-level protection."""
    cat = WarehouseCatalog(spark, tmp_root)
    schema = "k long, v string"
    cat.create_table("issue_dim", schema)
    cat.insert_into("issue_dim", spark.createDataFrame([(1, "a")], schema))
    cat.protect("issue_dim")

    for op in (
        lambda: cat.drop_table("issue_dim"),
        lambda: cat.truncate("issue_dim"),
        lambda: cat.delete_where("issue_dim", "k = 1"),
        lambda: cat.write("issue_dim", cat.table("issue_dim"), mode="overwrite"),
    ):
        with pytest.raises(ProtectedTableError):
            op()
    # appends still allowed (append-only, not read-only)
    cat.insert_into("issue_dim", spark.createDataFrame([(2, "b")], schema))
    assert cat.table("issue_dim").count() == 2


def test_catalog_truncate_and_delete_where(spark, tmp_root):
    cat = WarehouseCatalog(spark, tmp_root)
    schema = "k long, v string"
    cat.create_table("f", schema)
    cat.insert_into(
        "f", spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema)
    )
    cat.delete_where("f", "k >= 3")
    assert sorted(r.k for r in cat.table("f").collect()) == [1, 2]
    cat.truncate("f")
    assert cat.table("f").count() == 0
    assert [f.name for f in cat.table("f").schema.fields] == ["k", "v"]


def test_delete_where_null_predicate_rows_survive(spark, tmp_root):
    """delete_where removes exactly the rows where the predicate is
    TRUE: rows where it evaluates to NULL are kept — and kept the SAME
    whether or not any other row matched (the no-op fast path and the
    rewrite path must agree on NULL semantics)."""
    cat = WarehouseCatalog(spark, tmp_root)
    schema = "k long, v string"
    cat.create_table("g", schema)
    cat.insert_into(
        "g", spark.createDataFrame([(1, "a"), (None, "n"), (3, "c")], schema)
    )
    # no row matches: fast path, NULL row survives
    cat.delete_where("g", "k = 99")
    assert sorted(r.v for r in cat.table("g").collect()) == ["a", "c", "n"]
    # a row matches: rewrite path, NULL row must STILL survive
    cat.delete_where("g", "k = 3")
    assert sorted(r.v for r in cat.table("g").collect()) == ["a", "n"]


def test_bucketed_tables_join_without_shuffle(spark, tmp_root):
    """S10 at scale: two tables bucketed on the join key at write time
    join with NO Exchange in the physical plan — the shuffle was paid
    once at load, not per query (the engine analog of the reference's
    btree indexes)."""
    cat = WarehouseCatalog(spark, tmp_root)
    fact = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("m")
    )
    dim = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    # simulate an interrupted previous session: the managed-table dir is
    # on disk but the (in-memory) metastore has no entry — write_bucketed
    # must pre-clean the orphan instead of failing LOCATION_ALREADY_EXISTS
    wdir = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    orphan = os.path.join(wdir, "bkt_fact")
    os.makedirs(orphan, exist_ok=True)
    cat.write_bucketed("bkt_fact", fact, buckets=8, bucket_by=["k"], sort_by=["k"])
    cat.write_bucketed("bkt_dim", dim, buckets=8, bucket_by=["k"], sort_by=["k"])
    # rerun-safe: overwriting an existing registered table also works
    cat.write_bucketed("bkt_dim", dim, buckets=8, bucket_by=["k"], sort_by=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path so the assertion targets bucketing,
        # not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cat.managed_table("bkt_fact").join(cat.managed_table("bkt_dim"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
        # a groupBy on the bucket key also rides the bucketing
        agg = cat.managed_table("bkt_fact").groupBy("k").agg(F.sum("m"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
        assert agg.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        cat.drop_managed_table("bkt_fact")
        cat.drop_managed_table("bkt_dim")


def test_write_bucketed_rejects_path_shaped_names(spark, tmp_root):
    """The orphan-cleanup branch recursively deletes a path built from
    the table name — names carrying separators or parent refs must be
    refused before any filesystem action."""
    import pytest

    cat = WarehouseCatalog(spark, tmp_root)
    df = spark.range(10).select(F.col("id").alias("k"))
    for bad in ("../evil", "a/b", "x/../y"):
        with pytest.raises(ValueError, match="unsafe table name"):
            cat.write_bucketed(bad, df, buckets=2, bucket_by=["k"])


def test_partition_pruning_shows_in_plan(spark, tmp_root):
    """A year-partitioned fact scanned with a year predicate must carry
    it as a PartitionFilter (metadata pruning), not a data filter."""
    cat = WarehouseCatalog(spark, tmp_root)
    df = spark.createDataFrame(
        [(1, 1992), (2, 1992), (3, 1993), (4, 1994)], "k long, year int"
    )
    cat.write("fact_py", df, partition_by=["year"])
    scan = cat.table("fact_py").filter(F.col("year") == 1992)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1992" in plan, plan
    assert scan.count() == 2


def test_partitioned_fact_write_prunes(spark, tmp_root):
    """Facts partitioned by a date-ish key: reading one partition must
    not list the others (partition pruning at the source)."""
    cat = WarehouseCatalog(spark, tmp_root)
    df = spark.createDataFrame(
        [(1, 1992), (2, 1992), (3, 1993)], "k long, year int"
    )
    cat.write("fact", df, partition_by=["year"])
    got = cat.table("fact").filter(F.col("year") == 1992)
    assert got.count() == 2
    # hive-style layout on disk => partition pruning applies at the scan
    assert any(d.startswith("year=1992") for d in os.listdir(cat.path("fact")))
    only_1992 = spark.read.parquet(os.path.join(cat.path("fact"), "year=1992"))
    assert only_1992.count() == 2


def test_compact_reduces_files_preserves_rows(spark, tmp_root):
    cat = WarehouseCatalog(spark, tmp_root)
    schema = "k long, v double"
    cat.create_table("frag", schema)
    for i in range(6):  # six tiny appends -> many small files
        cat.insert_into(
            "frag", spark.createDataFrame([(i * 10 + j, float(j)) for j in range(10)], schema)
        )
    before = sorted(r.k for r in cat.table("frag").collect())
    n_files_before = len([f for f in os.listdir(cat.path("frag")) if f.endswith(".parquet")])
    assert n_files_before > 2

    cat.protect("frag")  # compaction must be allowed on append-only tables
    cat.compact("frag", target_files=2, sort_by=["k"])
    after_df = cat.table("frag")
    assert sorted(r.k for r in after_df.collect()) == before
    n_files_after = len([f for f in os.listdir(cat.path("frag")) if f.endswith(".parquet")])
    assert n_files_after <= 2
    # range-partitioned + sorted: each file holds a contiguous, sorted k-range
    import pyarrow.parquet as pq

    for f in os.listdir(cat.path("frag")):
        if f.endswith(".parquet"):
            ks = pq.read_table(os.path.join(cat.path("frag"), f)).column("k").to_pylist()
            assert ks == sorted(ks)


def test_zorder_compaction_clusters_both_columns(spark, tmp_root):
    """Z-order files must be selective on BOTH interleaved columns: the
    mean per-file min/max span of each column is a fraction of its
    global span, whereas a plain single-column sort leaves the second
    column's per-file span at ~full range."""
    import pyarrow.parquet as pq

    cat = WarehouseCatalog(spark, tmp_root)
    # full 64x64 grid: x and y independent, so a single-column sort
    # cannot cluster the other column
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    cat.write("zt", df)
    before = sorted(r.payload for r in cat.table("zt").collect())

    def mean_spans(table):
        spans_x, spans_y = [], []
        for f in os.listdir(cat.path(table)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(cat.path(table), f))
            if t.num_rows == 0:
                continue
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            spans_x.append(max(xs) - min(xs))
            spans_y.append(max(ys) - min(ys))
        return sum(spans_x) / len(spans_x), sum(spans_y) / len(spans_y)

    cat.compact_zorder("zt", target_files=16, zorder_by=["x", "y"], bits=6)
    zx, zy = mean_spans("zt")
    # both columns clustered: mean per-file span well under the 0..63 range
    assert zx <= 32 and zy <= 32, (zx, zy)
    # rows preserved exactly
    assert sorted(r.payload for r in cat.table("zt").collect()) == before

    # contrast: plain sort by x clusters x but leaves y at ~full span
    cat.write("st", df)
    cat.compact("st", target_files=16, sort_by=["x"])
    sx, sy = mean_spans("st")
    assert sx <= 8 and sy >= 48, (sx, sy)


def test_schema_evolution_append_and_merged_read(spark, tmp_root):
    """Appending a batch that carries a NEW column must not break the
    table: a merged read surfaces the union schema with NULLs for rows
    written before the column existed, and a batch missing a column
    reads back NULL there."""
    cat = WarehouseCatalog(spark, tmp_root)
    cat.write("ev", spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    # batch 2 adds a column
    cat.insert_into(
        "ev", spark.createDataFrame([(3, 3.0, "x")], "k long, v double, tag string")
    )
    # batch 3 misses a column
    cat.insert_into("ev", spark.createDataFrame([(4,)], "k long"))
    got = {r.k: (r.v, r.tag) for r in cat.table("ev", merge_schema=True).collect()}
    assert got == {1: (1.0, None), 2: (2.0, None), 3: (3.0, "x"), 4: (None, None)}
    assert set(cat.table("ev", merge_schema=True).columns) == {"k", "v", "tag"}


def test_time_travel_versions_and_rollback(spark, tmp_root):
    """Each replace retains the displaced state as a version (pure
    rename); table_version reads any retained state; rollback restores
    one non-destructively (the pre-rollback state is itself retained);
    retention prunes to keep_versions."""
    cat = WarehouseCatalog(spark, tmp_root)
    schema = "k long, v string"
    cat.write("dim", spark.createDataFrame([(1, "a")], schema))
    cat.replace("dim", spark.createDataFrame([(1, "b")], schema))   # v1 = {a}
    cat.replace("dim", spark.createDataFrame([(1, "bad")], schema))  # v2 = {b}
    assert cat.versions("dim") == [1, 2]
    assert [tuple(r) for r in cat.table_version("dim", 1).collect()] == [(1, "a")]
    assert [tuple(r) for r in cat.table_version("dim", 2).collect()] == [(1, "b")]
    assert [tuple(r) for r in cat.table("dim").collect()] == [(1, "bad")]

    cat.rollback("dim", 2)  # undo the bad batch; 'bad' retained as v3
    assert [tuple(r) for r in cat.table("dim").collect()] == [(1, "b")]
    assert [tuple(r) for r in cat.table_version("dim", 3).collect()] == [(1, "bad")]

    # pruning: many replaces keep only the last 3 versions
    for i in range(5):
        cat.replace("dim", spark.createDataFrame([(1, f"r{i}")], schema))
    vs = cat.versions("dim")
    assert len(vs) == 3 and vs == sorted(vs)
    # versions dir never leaks into the table listing
    assert cat.tables() == ["dim"]


def test_create_table_as_stages_and_reads_back(spark, tmp_root):
    cat = WarehouseCatalog(spark, tmp_root)
    src = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 7).alias("g"))
    staged = cat.create_table_as("agg", src.groupBy("g").count())
    assert staged.count() == 7
    assert sorted(r.g for r in cat.table("agg").collect()) == list(range(7))
    with pytest.raises(ValueError):
        cat.create_table_as("agg", src)


def test_write_observed_collects_metrics_in_single_pass(spark, tmp_root):
    """write_observed must return metric values describing exactly the
    rows written, matching independently recomputed aggregates — and
    the write itself must have landed."""
    cat = WarehouseCatalog(spark, tmp_root)
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2).alias("v"),
    )
    got = cat.write_observed(
        "observed_tbl",
        df,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.when(F.col("v").isNull(), 1)),
            "max_k": F.max("k"),
            "neg_k": F.count(F.when(F.col("k") < 0, 1)),
        },
        mode="overwrite",
    )
    assert got == {"n_rows": 1000, "n_null_v": 100, "max_k": 999, "neg_k": 0}
    back = cat.table("observed_tbl")
    assert back.count() == 1000
    assert back.filter(F.col("v").isNull()).count() == 100
