"""Data-quality CORRECTNESS queries: post-load table profiling and
source-vs-target full-outer reconciliation — the QA surface a warehouse
runs after every batch load (reference analog: the row-count sanity
probes around ``inserting-data.sql``'s loads, promoted to first-class
operators).

Scale notes are on the operators (``operators/profile.py``); the
reconciliation below is a single full-outer shuffle join on the
business key with both sides pre-aggregated to key grain first — the
join input is #keys rows, never #fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.profile import profile_table
from .ingest_queries import _decimal_sum_as_double

# ---------------------------------------------------------------------------
# Table profiling (orders: ints, strings, a double, a date)

PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_totalprice",
    "o_orderdate",
]


def orders_profile(t: dict[str, DataFrame]) -> DataFrame:
    """One-pass per-column profile of ``orders`` (see
    operators/profile.py for the single-Expand scale shape)."""
    return profile_table(t["orders"], PROFILE_COLS).orderBy("column_name")


def _profile_col_sql(c: str, stringify: str) -> str:
    mn = stringify.format(expr=f"MIN({c})")
    mx = stringify.format(expr=f"MAX({c})")
    return f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT({c}) AS n_nonnull,
       COUNT(DISTINCT {c}) AS n_distinct,
       {mn} AS min_value,
       {mx} AS max_value
FROM orders"""


_PLAIN = "CAST({expr} AS VARCHAR)"
_DEC = "CAST(CAST({expr} AS DECIMAL(18,2)) AS VARCHAR)"

ORDERS_PROFILE_ORACLE = (
    "\nUNION ALL\n".join(
        _profile_col_sql(c, _DEC if c == "o_totalprice" else _PLAIN)
        for c in PROFILE_COLS
    )
    + "\nORDER BY column_name"
)


# ---------------------------------------------------------------------------
# Source-vs-target reconciliation (full outer join, key-grain)

ACCTBAL_MIN = 0.0  # "source" side: customers in good standing only


def customer_order_reconcile(t: dict[str, DataFrame]) -> DataFrame:
    """Reconcile the positive-balance customer register against the
    order ledger: FULL OUTER join of the two key sets, classify every
    business key as matched / customer_only / orders_only, and report
    per-(status, segment) key counts with order totals. Both sides are
    reduced to key grain BEFORE the join (orders pre-aggregated per
    customer), so the full-outer shuffle moves #keys rows; the segment
    of an orders-only key is reported as '(unknown)' — the canonical
    full-outer-reconciliation shape (J-coverage: full outer was the one
    join type the r1 battery lacked)."""
    cust = (
        t["customer"]
        .filter(F.col("c_acctbal") > ACCTBAL_MIN)
        .select("c_custkey", "c_mktsegment")
    )
    ords = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _decimal_sum_as_double(F.col("o_totalprice")).alias("total_price"),
        )
    )
    joined = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    status = (
        F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), "matched")
        .when(F.col("c_custkey").isNotNull(), "customer_only")
        .otherwise("orders_only")
    )
    return (
        joined.select(
            status.alias("status"),
            F.coalesce(F.col("c_mktsegment"), F.lit("(unknown)")).alias("segment"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_price"), F.lit(0.0)).alias("total_price"),
        )
        .groupBy("status", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_orders").alias("n_orders"),
            _decimal_sum_as_double(F.col("total_price")).alias("total_price"),
        )
        .orderBy("status", "segment")
    )


CUSTOMER_ORDER_RECONCILE_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > {ACCTBAL_MIN}
),
ords AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
  FROM orders GROUP BY o_custkey
),
recon AS (
  SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'matched'
              WHEN c_custkey IS NOT NULL THEN 'customer_only'
              ELSE 'orders_only' END AS status,
         COALESCE(c_mktsegment, '(unknown)') AS segment,
         COALESCE(n_orders, 0) AS n_orders,
         COALESCE(total_price, 0.0) AS total_price
  FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey
)
SELECT status, segment, COUNT(*) AS n_keys, CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(total_price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM recon GROUP BY status, segment ORDER BY status, segment
"""


# ---------------------------------------------------------------------------
# Documents profile (the corpus-side twin of orders_profile)

DOC_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def documents_profile(t: dict[str, DataFrame]) -> DataFrame:
    """One-pass per-column profile of the corpus table — the ingest
    health check a pipeline runs before admitting a crawl batch
    (same single-Expand shape as orders_profile)."""
    return profile_table(t["documents"], DOC_PROFILE_COLS).orderBy("column_name")


def _doc_profile_col_sql(c: str) -> str:
    return f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT({c}) AS n_nonnull,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM documents"""


DOCUMENTS_PROFILE_ORACLE = (
    "\nUNION ALL\n".join(_doc_profile_col_sql(c) for c in DOC_PROFILE_COLS)
    + "\nORDER BY column_name"
)


# ---------------------------------------------------------------------------
# Declared-constraint gate (reference DDL constraints as a batch job)


def orders_constraint_gate(t: dict[str, DataFrame]) -> DataFrame:
    """The reference's PRIMARY KEY / NOT NULL / FK / CHECK declarations
    (``creating-tables.sql``) run as a post-load validation gate over
    ``orders``: unique orderkey, non-null custkey, FK into customer,
    non-negative totalprice, plus a CHECK the data actually violates
    (totalprice > 100000 — roughly the lower third of orders fails) so
    the differential proves violations are COUNTED, not just asserted
    absent."""
    from ..operators import constraints as C

    orders, customer = t["orders"], t["customer"]
    return C.validate(
        [
            C.unique_key(orders, ["o_orderkey"]),
            C.not_null(orders, "o_custkey"),
            C.foreign_key(orders, ["o_custkey"], customer, ["c_custkey"]),
            C.check(orders, "totalprice_nonneg", "o_totalprice >= 0"),
            C.check(orders, "totalprice_over_100k", "o_totalprice > 100000"),
        ]
    ).orderBy("constraint_name")


ORDERS_CONSTRAINT_GATE_ORACLE = """
SELECT 'unique(o_orderkey)' AS constraint_name, CAST(NULL AS VARCHAR) AS detail,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'not_null(o_custkey)', NULL,
       CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'fk(o_custkey)', NULL, CAST(COUNT(*) AS BIGINT)
FROM (
  SELECT o.o_custkey FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
UNION ALL
SELECT 'check(totalprice_nonneg)', 'o_totalprice >= 0',
       CAST(COUNT(CASE WHEN NOT COALESCE(o_totalprice >= 0, FALSE) THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'check(totalprice_over_100k)', 'o_totalprice > 100000',
       CAST(COUNT(CASE WHEN NOT COALESCE(o_totalprice > 100000, FALSE) THEN 1 END) AS BIGINT)
FROM orders
ORDER BY constraint_name
"""
