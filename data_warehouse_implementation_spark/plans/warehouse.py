"""Warehouse build pipeline (reference ``inserting-data.sql`` end to
end): dimension builds with dedup + deterministic surrogate keys, and
the multi-way star fact build with surrogate-key resolution, COALESCE
null-canonical joins, role-playing date dims, and the SCD active-version
filter (SURVEY §2.9 J7/J8 + §7 Step 3).

Domain mapping (reference -> testdata), continuing analytics.py's:

- ``company_dimension``  (dedup+upsert, ``inserting-data.sql:61-65``)   -> nation name
- ``location_dimension`` (dedup+union, ``inserting-data.sql:22-30``)    -> c_mktsegment
- ``category_dimension`` (4-key natural key, ``inserting-data.sql:74-86``) -> (p_brand, p_type, p_size), with synthesized NULLs to exercise the COALESCE discipline
- ``date_dimension`` role-played twice (``inserting-data.sql:164-169``) -> ship date + order date
- ``issue_dimension`` (SCD3, keyed by complaint id)                     -> keyed by o_orderkey, tracking o_orderpriority
- ``resolution_dimension`` (SCD2, ``where r.active=true``)              -> keyed by o_orderkey over o_orderstatus
- ``complaint_fact`` (7-way star, ``inserting-data.sql:150-178``)       -> one row per lineitem

Surrogate keys: the reference uses ``SERIAL`` (insertion-order ints);
we assign ``row_number() OVER (ORDER BY natural key)`` — deterministic
across runs and parallelism (SURVEY §4 note 3). The global window is
applied only to *deduplicated dimension* rows (#distinct values), never
to fact rows; fact-sized SCD dims reuse their natural key as the
surrogate instead of paying a global sort.

Scale shape of the fact build: one shuffle join chain on the fact keys
(lineitem⋈orders on orderkey, ⋈customer on custkey, ⋈part on partkey) —
all other resolutions are broadcast-hash joins against dim tables, so
the fact is never reshuffled for dimension lookups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.scalar import canonicalize_nulls
from ..operators import calendar as cal
from ..operators import relational
from . import materialize, scd
from .analytics import CAL_END, CAL_START

AS_OF = "2024-06-01"  # injectable current_date (F8) for deterministic builds


def build_dim(
    df: DataFrame,
    natural_keys: Sequence[str],
    surrogate_col: str,
    canonicalize: bool = True,
) -> DataFrame:
    """Generic dimension build (``inserting-data.sql:22-86``): dedup the
    natural key tuple (optionally NULL->'' canonicalized, F4) and assign
    a deterministic surrogate equal to ``row_number() OVER (ORDER BY
    natural keys)`` — but computed WITHOUT a global single-task sort,
    via :func:`relational.global_rank`'s deterministic two-phase rank
    (pure value-derived buckets, parallel within-bucket rank,
    cumulative-offset merge; see its docstring for why the buckets must
    be a pure function of the key, never a sampled range). A
    million-row dimension ranks in parallel where the old global window
    serialized on one task."""
    dim = relational.dedup_distinct(df.select(*natural_keys), canonicalize=canonicalize)
    return assign_surrogate(dim, natural_keys, surrogate_col)


def assign_surrogate(
    dim: DataFrame,
    natural_keys: Sequence[str],
    surrogate_col: str,
) -> DataFrame:
    """The rank-assignment half of :func:`build_dim`, for callers whose
    key tuples are ALREADY distinct (e.g. one grouping-sets pass that
    produced several dims' key sets at once). Delegates to
    :func:`relational.global_rank` — the engine's one shared
    deterministic two-phase rank (also the token ranker inside
    ``dedup.jaccard_prefix_join``)."""
    return relational.global_rank(dim, natural_keys, surrogate_col).select(
        *natural_keys, surrogate_col
    )


def _staging(
    t: dict[str, DataFrame], orderkey_extra: DataFrame | None = None
) -> DataFrame:
    """The wide staging row (``complaints`` analog): lineitem ⋈ orders
    ⋈ customer, with the category natural keys pulled from part and
    NULLs synthesized on the brand key (NULLIF) so the COALESCE join
    discipline is actually exercised (testdata has no NULLs).

    ``orderkey_extra`` (if given) is joined on ``o_orderkey``
    immediately after the orders join, while the chain is still hash-
    partitioned on the order key — a free co-partitioned join instead
    of a fourth fact-wide shuffle at the end of the chain (the SCD
    lookup uses this)."""
    li = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate", "l_returnflag"
    )
    orders = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_orderpriority"
    )
    cust = t["customer"].select("c_custkey", "c_nationkey", "c_mktsegment")
    nation = t["nation"].select("n_nationkey", "n_name")
    part = t["part"].select(
        "p_partkey",
        F.nullif(F.col("p_brand"), F.lit("Brand#33")).alias("p_brand"),
        "p_type",
        "p_size",
    )
    chain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    if orderkey_extra is not None:
        chain = chain.join(orderkey_extra, on="o_orderkey")
    return (
        chain.join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(part, F.col("l_partkey") == part.p_partkey)
    )


def shared_category_dim(t: dict[str, DataFrame]) -> DataFrame:
    """The category dimension, session-cached: it is the one dim TWO
    registered queries consume (``warehouse_dim_build`` returns it,
    ``warehouse_fact_build`` joins it), so the staging pass + surrogate
    ranking behind it runs once per session instead of once per query.

    Deliberately the ONLY cached piece of the warehouse build. The
    company/location dims and the SCD lookup have a single consumer
    (the fact build), and materializing each one separately adds its
    own jobs — repartitionByRange sampling, cache writes — that cost
    more at bench scale than the recompute they save; left lazy, they
    fuse into the fact build's single job where their stages run
    concurrently (measured: per-piece caching regressed the cold
    dim+fact pair 4.6s -> 13s at sf0.1). At 100 TB the cross-query
    reuse story is a parquet staging table
    (``WarehouseCatalog.create_table_as``), not executor memory.

    Cache keying follows the near-dup family: ``semanticHash`` of the
    pruned staging plan identifies the corpus."""
    src = _staging(t).select("p_brand", "p_type", "p_size")
    return materialize.get_or_build(
        "wh_category_dim",
        str(src.semanticHash()),
        lambda: build_dim(src, ["p_brand", "p_type", "p_size"], "category_id"),
    )


def build_warehouse(t: dict[str, DataFrame], as_of: str = AS_OF) -> dict[str, DataFrame]:
    """Compose every dim + the star fact, mirroring the reference's load
    order (``inserting-data.sql``). Returns {table_name: DataFrame}."""
    spark = t["orders"].sparkSession
    # The staging join feeds three dim builds AND the fact. Only the
    # category dim is cached (see shared_category_dim); the other two
    # dim builds read 1-column pruned variants of the join chain and
    # stay lazy so they fuse into the fact job — each separate
    # materialization costs more in fixed job overhead than the pruned
    # recompute it saves. At 100 TB the right staging reuse is a real
    # parquet staging table (WarehouseCatalog.create_table_as) — how
    # the reference stages too (MongoDB -> postgres staging) — not
    # executor-memory cache.
    staging = _staging(t)

    company_dim = build_dim(
        staging.select(F.col("n_name").alias("company")), ["company"], "company_id"
    )
    location_dim = build_dim(
        staging.select(F.col("c_mktsegment").alias("segment")), ["segment"], "location_id"
    )
    category_dim = shared_category_dim(t)
    date_dim = cal.build_calendar(spark, CAL_START, CAL_END)

    # SCD-shaped dims keyed by the order (fact-sized): natural key doubles
    # as the surrogate — no global window over fact-scale rows.
    orders_batch = t["orders"].select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    empty_res = spark.createDataFrame(
        [], "o_orderkey long, o_orderstatus string, start_date date, end_date date, active boolean"
    )
    resolution_dim = scd.scd2_apply(
        empty_res,
        orders_batch.select("o_orderkey", "o_orderstatus", F.col("o_orderkey").alias("seq")),
        ["o_orderkey"],
        as_of=as_of,
        order_col="seq",
    )
    empty_issue = spark.createDataFrame(
        [],
        "o_orderkey long, o_orderpriority string, o_orderpriority_old string, effective_date date",
    )
    issue_dim = scd.scd3_apply(
        empty_issue,
        orders_batch.select("o_orderkey", "o_orderpriority", F.col("o_orderkey").alias("seq")),
        ["o_orderkey"],
        tracked_col="o_orderpriority",
        as_of=as_of,
        order_col="seq",
        old_col="o_orderpriority_old",
    )

    # keyed SCD lookups: active resolution version only (M6/J9). The two
    # order-keyed dims are pre-joined with each other (dim-scale shuffle)
    # and then injected into the fact chain while it is still partitioned
    # on the order key (see _staging) — the fact is never reshuffled for
    # the SCD resolution. Left lazy (not cached): the fact build is its
    # only consumer, and a separate materialization just adds jobs.
    scd_lookup = (
        scd.active_rows(resolution_dim)
        .select("o_orderkey", F.col("o_orderkey").alias("resolution_id"))
        .join(
            issue_dim.select("o_orderkey", F.col("o_orderkey").alias("issue_id")),
            on="o_orderkey",
        )
    )
    fact = _build_fact(
        _staging(t, orderkey_extra=scd_lookup),
        date_dim,
        company_dim,
        location_dim,
        category_dim,
    )
    return {
        "company_dim": company_dim,
        "location_dim": location_dim,
        "category_dim": category_dim,
        "date_dim": date_dim,
        "issue_dim": issue_dim,
        "resolution_dim": resolution_dim,
        "lineitem_fact": fact,
    }


def publish_warehouse(catalog, t: dict[str, DataFrame], as_of: str = AS_OF) -> None:
    """Persist the star to a :class:`WarehouseCatalog`: dims as plain
    parquet tables, the fact hive-partitioned by order month
    (``order_month = date_id_order div 100``, a yyyymm int derived from
    the deterministic yyyymmdd date surrogate).

    The reference answers "queries hit recent months" with ~30 b-tree
    indexes (``creating-tables.sql:11-21``); Spark's equivalent is
    LAYOUT — a month-partitioned fact turns every date-range predicate
    into metadata pruning (whole partition directories skipped before a
    single byte is read), which is the difference between scanning one
    month and scanning 100 TB."""
    wh = build_warehouse(t, as_of=as_of)
    for name, df in wh.items():
        if name == "lineitem_fact":
            catalog.write(
                name,
                df.withColumn("order_month", F.expr("date_id_order div 100")),
                partition_by=["order_month"],
            )
        else:
            catalog.write(name, df)


def _build_fact(
    staging: DataFrame,
    date_dim: DataFrame,
    company_dim: DataFrame,
    location_dim: DataFrame,
    category_dim: DataFrame,
) -> DataFrame:
    """The star fact build (``inserting-data.sql:150-178``): role-playing
    date joins (J3/J5), COALESCE natural-key category join (J2/J4),
    broadcast dim resolution (J1/S10), flag measures (F5/F6/F11 analog).
    The SCD active-version lookup (M6/J9) arrives pre-joined inside
    ``staging`` (co-partitioned on the order key — see build_warehouse)."""
    # single-key role-playing joins: the calendar's date column IS the
    # natural key, so each role joins on one computed DATE instead of a
    # 3-way (year, month, day) equality — one hash per probe row, same
    # referential semantics (calendar dates are distinct)
    ship_cal = date_dim.select(
        F.col("date_id").alias("date_id_ship"), F.col("date").alias("_sdate")
    )
    ord_cal = date_dim.select(
        F.col("date_id").alias("date_id_order"), F.col("date").alias("_odate")
    )
    resolved = (
        staging.join(broadcast(ship_cal), F.to_date("l_shipdate") == F.col("_sdate"))
        .join(broadcast(ord_cal), F.to_date("o_orderdate") == F.col("_odate"))
        .join(broadcast(company_dim), F.col("n_name") == F.col("company"))
        .join(broadcast(location_dim), F.col("c_mktsegment") == F.col("segment"))
    )
    resolved = relational.null_canonical_join(
        resolved,
        broadcast(
            category_dim.select(
                F.col("p_brand").alias("cat_brand"),
                F.col("p_type").alias("cat_type"),
                F.col("p_size").alias("cat_size"),
                "category_id",
            )
        ),
        [("p_brand", "cat_brand"), ("p_type", "cat_type")],
    ).filter(F.col("p_size").eqNullSafe(F.col("cat_size")))
    return resolved.select(
        "l_orderkey",
        "l_linenumber",
        "date_id_ship",
        "date_id_order",
        "company_id",
        "location_id",
        "category_id",
        "issue_id",
        "resolution_id",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("timely_response"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("consumer_disputed"),
    )


def population_fact_build(t: dict[str, DataFrame]) -> DataFrame:
    """The second fact build (J8 — ``population_fact``,
    ``inserting-data.sql:128-141``): a measures table joined through a
    dim *pair* (year ⋈ location) to resolve surrogate FKs, with
    COALESCE(measure, 0) defaulting. Analog: order activity per
    (order year, market segment)."""
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    cust = t["customer"].select("c_custkey", "c_mktsegment")
    demo = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "total_price"
            ),
        )
    )
    year_dim = build_dim(demo.select("yr"), ["yr"], "year_id", canonicalize=False)
    location_dim = build_dim(demo.select("segment"), ["segment"], "location_id")
    return (
        demo.join(broadcast(year_dim), on="yr")
        .join(broadcast(location_dim), on="segment")
        .select(
            "year_id",
            "location_id",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_price"), F.lit(0.0)).alias("total_price"),
        )
        .orderBy("year_id", "location_id")
    )


POPULATION_FACT_BUILD_ORACLE = """
WITH demo AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, c_mktsegment AS segment,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
year_dim AS (
  SELECT yr, CAST(ROW_NUMBER() OVER (ORDER BY yr) AS BIGINT) AS year_id
  FROM (SELECT DISTINCT yr FROM demo)
),
location_dim AS (
  SELECT segment, CAST(ROW_NUMBER() OVER (ORDER BY segment) AS BIGINT) AS location_id
  FROM (SELECT DISTINCT segment FROM demo)
)
SELECT y.year_id, l.location_id,
       COALESCE(d.n_orders, 0) AS n_orders,
       COALESCE(d.total_price, 0.0) AS total_price
FROM demo d
JOIN year_dim y ON d.yr = y.yr
JOIN location_dim l ON d.segment = l.segment
ORDER BY year_id, location_id
"""


# ---------------------------------------------------------------------------
# Registered queries


def warehouse_dim_build(t: dict[str, DataFrame]) -> DataFrame:
    """Category dimension build: canonicalized dedup + deterministic
    surrogate keys (J2 natural key, F4 canonicalization). Reads the
    session-cached dim (:func:`shared_category_dim`), so the staging
    pass it shares with ``warehouse_fact_build`` runs once per
    session, not once per query."""
    return shared_category_dim(t).orderBy("category_id")


WAREHOUSE_DIM_BUILD_ORACLE = """
WITH staged AS (
  SELECT DISTINCT COALESCE(NULLIF(p_brand, 'Brand#33'), '') AS p_brand, p_type, p_size
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
)
SELECT p_brand, p_type, p_size,
       CAST(ROW_NUMBER() OVER (ORDER BY p_brand, p_type, p_size) AS BIGINT) AS category_id
FROM staged ORDER BY category_id
"""


def warehouse_fact_build(t: dict[str, DataFrame]) -> DataFrame:
    """The full star fact build — every fact row with all surrogate FKs
    resolved. The differential against the oracle proves referential
    integrity (row count = staging count iff every FK resolved)."""
    # no ORDER BY: the driver compare is order-insensitive and a global
    # sort of fact-scale rows would be pure overhead
    return build_warehouse(t)["lineitem_fact"]


WAREHOUSE_FACT_BUILD_ORACLE = """
WITH company_dim AS (
  SELECT company, CAST(ROW_NUMBER() OVER (ORDER BY company) AS BIGINT) AS company_id
  FROM (SELECT DISTINCT n_name AS company
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey)
),
location_dim AS (
  SELECT segment, CAST(ROW_NUMBER() OVER (ORDER BY segment) AS BIGINT) AS location_id
  FROM (SELECT DISTINCT c_mktsegment AS segment
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey)
),
category_dim AS (
  SELECT p_brand, p_type, p_size,
         CAST(ROW_NUMBER() OVER (ORDER BY p_brand, p_type, p_size) AS BIGINT) AS category_id
  FROM (SELECT DISTINCT COALESCE(NULLIF(p_brand, 'Brand#33'), '') AS p_brand, p_type, p_size
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN part ON l_partkey = p_partkey)
)
SELECT
  l_orderkey, l_linenumber,
  CAST(year(l_shipdate)*10000 + month(l_shipdate)*100 + day(l_shipdate) AS BIGINT) AS date_id_ship,
  CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS BIGINT) AS date_id_order,
  cod.company_id,
  ld.location_id,
  cd.category_id,
  o_orderkey AS issue_id,
  o_orderkey AS resolution_id,
  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS timely_response,
  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS consumer_disputed
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
JOIN company_dim cod ON n_name = cod.company
JOIN location_dim ld ON c_mktsegment = ld.segment
JOIN category_dim cd ON COALESCE(NULLIF(part.p_brand, 'Brand#33'), '') = cd.p_brand
                     AND part.p_type = cd.p_type AND part.p_size = cd.p_size
"""


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-rollup refresh)

INCR_CUTOFF = "1997-01-01"  # the "already loaded" / "new batch" boundary


def incremental_agg_refresh(t: dict[str, DataFrame]) -> DataFrame:
    """Incremental refresh of a materialized rollup: the pre-cutoff
    pre-aggregate (the state a nightly job would have on disk) is merged
    with the aggregate of ONLY the delta batch by re-aggregating the
    partial sums/counts — never rescanning history. This is the 100 TB
    maintenance move: a day's refresh costs O(delta) + O(|rollup|), not
    O(fact). COUNT merges as SUM of partial counts; AVG is derived at
    read time from merged SUM/COUNT (never merged directly).

    The oracle is the full recompute over all rows — the differential
    proves partial-aggregate merge == full aggregation.
    """
    orders = t["orders"]
    cutoff = F.lit(INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority", "o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_sum_price"),
        )

    existing = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        existing.unionByName(delta)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum_price").alias("_sum_price"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_orders",
        F.col("_sum_price").cast("double").alias("sum_price"),
        (F.col("_sum_price").cast("double") / F.col("n_orders")).alias("avg_price"),
    ).orderBy("o_orderpriority", "o_orderstatus")


INCREMENTAL_AGG_REFRESH_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# Referential-integrity report (data-quality gate after a fact load)


def integrity_report(t: dict[str, DataFrame]) -> DataFrame:
    """Warehouse data-quality gate: per foreign-key edge, the number of
    orphan child rows (anti-join on the parent key) next to the child
    row count. Each check is one left-anti broadcast/shuffle join —
    the shape a post-load CI assertion runs at any scale. A healthy
    star reports zero orphans; the row is emitted either way.
    """
    lineitem, orders, customer, part = (
        t["lineitem"],
        t["orders"],
        t["customer"],
        t["part"],
    )

    def check(name: str, child: DataFrame, key, parent: DataFrame, pkey) -> DataFrame:
        orphans = (
            child.join(parent, child[key] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        total = child.agg(F.count(F.lit(1)).alias("n_child_rows"))
        return orphans.crossJoin(broadcast(total)).select(
            F.lit(name).alias("fk_edge"), "n_orphans", "n_child_rows"
        )

    checks = [
        check("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        check("lineitem->part", lineitem, "l_partkey", part, "p_partkey"),
        check("orders->customer", orders, "o_custkey", customer, "c_custkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("fk_edge")


INTEGRITY_REPORT_ORACLE = """
SELECT 'lineitem->orders' AS fk_edge,
       (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL) AS n_orphans,
       (SELECT COUNT(*) FROM lineitem) AS n_child_rows
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_partkey IS NULL),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL),
       (SELECT COUNT(*) FROM orders)
ORDER BY fk_edge
"""


def order_lifecycle_fact(t: dict[str, DataFrame]) -> DataFrame:
    """Accumulating-snapshot fact (the Kimball pattern the star/SCD
    build doesn't cover): one row per order tracking its lifecycle
    milestones — order date, first and last ship date, line counts, and
    the days-to-first-ship lag. Each incremental load UPDATES milestone
    columns as lineitems arrive (here computed in one pass: a single
    orders⋈lineitem shuffle join + per-order aggregate)."""
    orders = t["orders"].select("o_orderkey", "o_orderdate", "o_orderstatus")
    li = t["lineitem"].select("l_orderkey", "l_shipdate", "l_quantity")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(
            F.count("l_shipdate").alias("n_lines"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
            F.datediff(F.min("l_shipdate"), F.min("o_orderdate"))
            .cast("long")
            .alias("days_to_first_ship"),
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderstatus",
            "n_lines",
            "first_ship",
            "last_ship",
            "days_to_first_ship",
        )
        .orderBy("o_orderkey")
    )


ORDER_LIFECYCLE_FACT_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderstatus,
       COUNT(l_shipdate) AS n_lines,
       strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(MIN(l_shipdate) AS DATE)) AS BIGINT)
         AS days_to_first_ship
FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderdate, o_orderstatus
ORDER BY o_orderkey
"""
