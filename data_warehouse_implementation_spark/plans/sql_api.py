"""Raw-SQL query surface (S5/§2 SQL-first parity).

The reference's analytics layer is literal SQL (``analysis.sql``); the
engine supports the same entry point — ``spark.sql`` over the registered
table views — not just the DataFrame DSL. The query below is executed
from the SAME SQL text on both engines (Spark and the DuckDB oracle),
which is the strongest possible dialect-parity statement: a user can
paste their ANSI SQL at either and get identical bytes.

Numeric discipline (registry contract): measure sums go through
DECIMAL(18,2) so they are exact and order-independent, then surface as
DOUBLE; averages are double divisions of those exact sums by BIGINT
counts — bit-identical across engines and shuffle schedules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# TPC-H Q1-shaped pricing summary (scan -> date predicate -> grouped
# exact aggregates -> ordered). Catalyst pushes the shipdate predicate
# and the 4-column pruning into the parquet scan; one shuffle.
PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def pricing_summary_sql(t: dict[str, DataFrame]) -> DataFrame:
    """Run the pricing summary through ``spark.sql`` over the registered
    views — the raw-SQL entry point, zero DataFrame DSL."""
    return t["lineitem"].sparkSession.sql(PRICING_SUMMARY_SQL)


PRICING_SUMMARY_ORACLE = PRICING_SUMMARY_SQL


# Q3-shaped shipping priority: selective dim predicate -> 3-way join ->
# grouped revenue -> deterministic top-10. Revenue is an EXACT decimal
# product/sum (both engines compute the identical exact value), surfaced
# as DOUBLE; the LIMIT is made order-deterministic by the full tiebreak.
SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate  > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def shipping_priority_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(SHIPPING_PRIORITY_SQL)


SHIPPING_PRIORITY_ORACLE = SHIPPING_PRIORITY_SQL


# Q5-shaped local-supplier volume: the 6-way join (customer, orders,
# lineitem, supplier, nation, region) with the customer-and-supplier-
# same-nation equi-constraint — exercises the supplier and region tables
# end to end. nation/region broadcast under AQE; the fact chain shuffles
# on its join keys only.
LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def local_supplier_volume_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(LOCAL_SUPPLIER_VOLUME_SQL)


LOCAL_SUPPLIER_VOLUME_ORACLE = LOCAL_SUPPLIER_VOLUME_SQL


# Q4-shaped order-priority check: correlated EXISTS against the fact
# table. Catalyst decorrelates this into a left-semi join on
# l_orderkey (with the shipdate>orderdate comparison as the join
# residual) — no per-row subquery execution, one shuffle.
LATE_ORDER_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS late_order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def late_order_exists_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(LATE_ORDER_EXISTS_SQL)


LATE_ORDER_EXISTS_ORACLE = LATE_ORDER_EXISTS_SQL


# Q17-shaped small-quantity revenue: correlated SCALAR subquery (the
# per-part average) in the predicate. Catalyst rewrites it into an
# aggregate-then-join on l_partkey. The average is a double division of
# an exactly-representable integer-valued sum by a count, so the
# comparison threshold is bit-identical on both engines.
SMALL_QTY_REVENUE_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
GROUP BY p_brand
ORDER BY p_brand
"""


def small_qty_revenue_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(SMALL_QTY_REVENUE_SQL)


SMALL_QTY_REVENUE_ORACLE = SMALL_QTY_REVENUE_SQL


# Explicit GROUPING SETS with GROUPING() disambiguation — the
# report-cube primitive underlying ROLLUP/CUBE (both also registered);
# one shuffle, Spark expands the sets in a single Expand node rather
# than unioning three scans.
PRIORITY_STATUS_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY g_priority, g_status,
         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""


def priority_status_sets_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(PRIORITY_STATUS_SETS_SQL)


PRIORITY_STATUS_SETS_ORACLE = PRIORITY_STATUS_SETS_SQL


# Q7-shaped bilateral shipping volume: two role-playing nation joins
# (supplier's nation AND customer's nation), a symmetric OR pair filter,
# year extraction, exact-decimal revenue by (supp_nation, cust_nation,
# year). Same text on both engines; EXTRACT is ANSI.
NATION_VOLUME_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume
  FROM supplier
  JOIN lineitem  ON s_suppkey = l_suppkey
  JOIN orders    ON o_orderkey = l_orderkey
  JOIN customer  ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def nation_volume_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(NATION_VOLUME_SQL)


NATION_VOLUME_ORACLE = NATION_VOLUME_SQL


# Q8-shaped market share: a 7-way join through BOTH nation roles and
# region, then a conditional-share ratio per order year. The share is a
# double division of two exact decimal sums — bit-identical on both
# engines regardless of aggregation order.
MARKET_SHARE_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_0' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_items
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem  ON p_partkey = l_partkey
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'PROMO'
    AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def market_share_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(MARKET_SHARE_SQL)


MARKET_SHARE_ORACLE = MARKET_SHARE_SQL


# Q6-shaped forecast-revenue filter: pure scan + tight multi-predicate
# filter + single exact-decimal aggregate. The whole WHERE clause
# reaches the parquet scan as pushed filters.
FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def forecast_revenue_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(FORECAST_REVENUE_SQL)


FORECAST_REVENUE_ORACLE = FORECAST_REVENUE_SQL


# Q10-shaped returned-item report: who returned the most revenue in a
# quarter — 4-way join, return-flag predicate, per-customer exact
# revenue, deterministic top-20.
RETURNED_ITEM_SQL = """
SELECT c_custkey, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def returned_item_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(RETURNED_ITEM_SQL)


RETURNED_ITEM_ORACLE = RETURNED_ITEM_SQL


# Q14-shaped promo revenue share: join + conditional aggregation into a
# single global ratio. The CASE-gated decimal product sums are exact on
# both engines; the ratio is one double division at the end.
PROMO_REVENUE_SQL = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
"""


def promo_revenue_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(PROMO_REVENUE_SQL)


PROMO_REVENUE_ORACLE = PROMO_REVENUE_SQL


# Q18-shaped large-volume orders: IN over a grouped-HAVING subquery
# (Catalyst rewrites it to a semi-join on the aggregated key set), then
# the customer/order detail re-aggregated. Deterministic top-20 via the
# full tiebreak.
LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


def large_orders_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(LARGE_ORDERS_SQL)


LARGE_ORDERS_ORACLE = LARGE_ORDERS_SQL


# Q19-shaped disjunctive-predicate revenue: three OR-branches over
# (brand, size band, quantity band) after the part join — the classic
# predicate too disjunctive for index plans, exactly where a columnar
# scan + hash join wins; Catalyst extracts the common l_partkey join
# key and pushes the residual disjunction below the join output.
BRAND_BAND_REVENUE_SQL = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def brand_band_revenue_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(BRAND_BAND_REVENUE_SQL)


BRAND_BAND_REVENUE_ORACLE = BRAND_BAND_REVENUE_SQL


# Q22-shaped dormant high-balance customers: scalar average subquery +
# correlated NOT EXISTS anti-join, grouped by nation. Both engines
# decorrelate the NOT EXISTS into a left-anti join and broadcast the
# 1-row average.
DORMANT_BALANCE_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def dormant_balance_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(DORMANT_BALANCE_SQL)


DORMANT_BALANCE_ORACLE = DORMANT_BALANCE_SQL


# Window-function dialect parity: RANK / LAG / running SUM frame spec in
# ONE raw-SQL text executed by both engines. The running total is a
# decimal sum (exact, order-fixed by the window ORDER BY + tiebreak).
WINDOW_FUNCS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_rank,
       CAST(LAG(o_orderkey) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS prev_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey % 100 = 7
ORDER BY o_custkey, order_rank
"""


def window_funcs_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(WINDOW_FUNCS_SQL)


WINDOW_FUNCS_ORACLE = WINDOW_FUNCS_SQL


# Q13-shaped customer order-count distribution: LEFT JOIN preserving
# order-less customers, two stacked aggregations (per-customer count,
# then histogram of counts). The left join is what distinguishes this
# from every inner-join query here — zero-order customers must appear
# in the c_count = 0 bucket.
CUST_ORDER_DIST_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def cust_order_dist_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(CUST_ORDER_DIST_SQL)


CUST_ORDER_DIST_ORACLE = CUST_ORDER_DIST_SQL


# Q15-shaped top supplier(s): quarterly supplier revenue, then the
# suppliers achieving the MAXIMUM revenue via an uncorrelated scalar
# subquery over the same derived table (the view-reuse pattern of the
# original; exact decimal revenue makes the equality comparison safe
# across engines).
TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


def top_supplier_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(TOP_SUPPLIER_SQL)


TOP_SUPPLIER_ORACLE = TOP_SUPPLIER_SQL


# Q17-shaped small-quantity revenue against a CORRELATED aggregate
# subquery: the per-part quantity threshold is an average computed by a
# subquery correlated on the outer part key — the SQL feature this
# battery had not yet exercised (Catalyst rewrites it to an aggregate +
# join; DuckDB runs it natively — identical results either way). The
# average is spelled as exact-decimal-sum / count so both engines
# derive the identical double threshold.
AVG_QTY_GATED_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
       / CAST(7 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (
    SELECT CAST(0.5 AS DOUBLE)
           * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def avg_qty_gated_revenue_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(AVG_QTY_GATED_REVENUE_SQL)


AVG_QTY_GATED_REVENUE_ORACLE = AVG_QTY_GATED_REVENUE_SQL


# Q11-shaped concentration report: grouped value filtered by a scalar
# subquery INSIDE the HAVING clause (share-of-global-total threshold) —
# the remaining untested subquery position. The threshold and the group
# sums are exact decimals surfaced as doubles on both engines.
NATION_VALUE_CONCENTRATION_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
       > (SELECT CAST(0.04 AS DOUBLE)
                 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
          FROM lineitem)
ORDER BY value DESC, n_name
"""


def nation_value_concentration_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(NATION_VALUE_CONCENTRATION_SQL)


NATION_VALUE_CONCENTRATION_ORACLE = NATION_VALUE_CONCENTRATION_SQL


# Q16-shaped supplier census: null-aware NOT IN anti-join against a
# predicate-filtered key list, plus COUNT(DISTINCT) per group and a
# fully tie-broken LIMIT — the anti-join-by-subquery form (the DSL
# battery covers left_anti; this is the SQL spelling Catalyst plans as
# a null-aware anti join).
SUPPLIER_PART_CENSUS_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type NOT LIKE 'MEDIUM%'
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0 AS DOUBLE))
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 20
"""


def supplier_part_census_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(SUPPLIER_PART_CENSUS_SQL)


SUPPLIER_PART_CENSUS_ORACLE = SUPPLIER_PART_CENSUS_SQL


# Window FRAME + distribution-function battery: the window surface the
# RANK/LAG/ROWS query leaves untouched — NTILE bucketing, the two
# int-ratio distribution functions (PERCENT_RANK = (rank-1)/(n-1),
# CUME_DIST = n_peers_le/n — doubles of exact integers, deterministic
# across engines), FIRST/LAST_VALUE under an explicit full frame
# (LAST_VALUE with the default frame is the classic current-row trap —
# the explicit UNBOUNDED FOLLOWING frame is the semantics people
# actually want), LEAD with an explicit default, and a VALUE-RANGE
# frame (RANGE BETWEEN n PRECEDING over a numeric key — peers by value
# distance, not row count). Unique order key per partition makes every
# output deterministic.
WINDOW_FRAMES_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT)
         AS key_quartile,
       CAST(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE)
         AS pr,
       CAST(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE)
         AS cd,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
       CAST(LEAD(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
         AS BIGINT) AS next_key,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS keys_within_1000
FROM orders
WHERE o_custkey % 100 = 7
ORDER BY o_custkey, o_orderkey
"""


def window_frames_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(WINDOW_FRAMES_SQL)


WINDOW_FRAMES_ORACLE = WINDOW_FRAMES_SQL


# Q21-shaped waiting-supplier report: the one classic subquery SHAPE the
# battery still lacked — DOUBLE correlation on the same fact table, an
# EXISTS and a NOT EXISTS both correlated to the outer row's order AND
# referencing an outer JOIN column (o_orderdate) inside the inner
# predicate. "Late" is shipped > 60 days after order date (the
# testdata's slimmed lineitem carries no commit/receipt dates, so the
# ship-lag proxy stands in for TPC-H's l_receiptdate > l_commitdate —
# same correlation structure, same decorrelation stress). Catalyst
# rewrites the pair into a left-semi and a left-anti join against
# aggregated/filtered copies of lineitem; DuckDB plans its own
# (de)correlation — identical rows either way, and COUNT(*) per
# supplier is exact-integer deterministic. The multi-supplier EXISTS
# keeps only orders more than one supplier touched; the NOT EXISTS
# keeps only rows where the outer supplier was the SOLE late one.
WAITING_SUPPLIER_SQL = """
SELECT s_name, n_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


def waiting_supplier_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(WAITING_SUPPLIER_SQL)


WAITING_SUPPLIER_ORACLE = WAITING_SUPPLIER_SQL


# LATERAL correlated subquery: per-nation top-2 customers by balance,
# written as `JOIN LATERAL (... ORDER BY ... LIMIT 2) ON true` — the
# ANSI shape for "top-k per outer row". Catalyst decorrelates the
# LATERAL into a ranked join (no per-row re-execution: the inner query
# becomes one window over customer partitioned by the correlation key),
# so at scale this costs one shuffle of customer by nation key — the
# same physical plan as the DSL `top_k_per_group`, reached from plain
# SQL. Deterministic ties via c_custkey.
TOP_BALANCE_LATERAL_SQL = """
SELECT n_name, c_name, c_acctbal
FROM nation JOIN LATERAL (
  SELECT c_name, c_acctbal
  FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) ON true
ORDER BY n_name, c_acctbal DESC, c_name
"""


def top_balance_lateral_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["customer"].sparkSession.sql(TOP_BALANCE_LATERAL_SQL)


TOP_BALANCE_LATERAL_ORACLE = TOP_BALANCE_LATERAL_SQL


# Q2-shaped min-cost supplier: the correlated scalar-MAX-over-a-join
# subquery in the WHERE clause — for each size-15 part, keep only the
# supplier(s) whose account balance equals the best balance among ALL
# suppliers who ever shipped that part. The reference's partsupp role is
# played by the distinct (part, supplier) pairs observed in lineitem
# (hence the DISTINCT: the fact join multiplies rows per shipment).
# Catalyst decorrelates the scalar aggregate into a grouped max joined
# back on p_partkey — one aggregate + one join, never per-row
# re-execution; at 100 TB the inner aggregate shuffles (partkey) key
# groups only. s_acctbal flows straight from parquet (no arithmetic), so
# the double equality is exact on both engines.
MIN_COST_SUPPLIER_SQL = """
SELECT DISTINCT p_partkey, p_name, s_name, n_name, s_acctbal
FROM part
JOIN lineitem ON l_partkey = p_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_size = 15
  AND s_acctbal = (
    SELECT MAX(s2.s_acctbal)
    FROM supplier s2
    JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
    WHERE l2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 20
"""


def min_cost_supplier_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(MIN_COST_SUPPLIER_SQL)


MIN_COST_SUPPLIER_ORACLE = MIN_COST_SUPPLIER_SQL


# Q9-shaped product-profit measure: 5-way star with a DERIVED measure
# combining columns from two different tables (revenue minus a
# retail-cost surrogate for the missing ps_supplycost), grouped by
# supplier nation x order YEAR — the classic "profit by nation and
# year" rollup. Every term is exact cent/quantity decimal arithmetic
# summed before the final double cast, so the result is
# order-independent and bit-identical across engines and shuffle
# schedules. The part-name predicate prunes the probe side before the
# fact join; nation broadcasts under AQE.
PRODUCT_PROFIT_SQL = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


def product_profit_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(PRODUCT_PROFIT_SQL)


PRODUCT_PROFIT_ORACLE = PRODUCT_PROFIT_SQL


# Q12-shaped shipping-speed priority census: group by a DERIVED
# dimension (CASE ladder over the ship-lag interval, standing in for
# the testdata's missing l_shipmode) with the two complementary
# conditional counts over order priority. The CASE and both SUM(CASE)
# flags are integer-exact; the whole query is one fact-fact equi-join
# plus a 3-group aggregate — map-side partials do almost all the work
# at scale.
SHIP_SPEED_PRIORITY_SQL = """
SELECT ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY THEN 'SLOW'
              WHEN l_shipdate > o_orderdate + INTERVAL 15 DAY THEN 'MEDIUM'
              ELSE 'FAST' END AS ship_bucket
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
) shipped
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


def ship_speed_priority_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(SHIP_SPEED_PRIORITY_SQL)


SHIP_SPEED_PRIORITY_ORACLE = SHIP_SPEED_PRIORITY_SQL


# Q20-shaped concentrated-supply report: TPC-H's deepest subquery
# nesting — an IN whose subquery scans a DERIVED partsupp (distinct
# part x supplier shipment totals), itself filtered by a second IN
# (part-name list) AND a correlated scalar aggregate that references
# TWO columns of the derived table (the all-time total for that exact
# part-supplier pair). Keeps suppliers for whom some 'small%' part's
# 1996 shipments exceed half its all-time volume. Catalyst decorrelates
# the scalar into a grouped sum joined on (partkey, suppkey) and plans
# both INs as semi joins — three aggregates, three equi-joins, zero
# per-row subquery execution; every shuffle is keyed on part/supplier
# ids, so the plan scales with the distinct-pair count, not the fact
# row count.
CONCENTRATED_SUPPLY_SQL = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT ps.l_suppkey
  FROM (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS year_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_partkey, l_suppkey
  ) ps
  WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND ps.year_qty > (
      SELECT CAST(0.5 AS DOUBLE)
             * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      FROM lineitem l2
      WHERE l2.l_partkey = ps.l_partkey AND l2.l_suppkey = ps.l_suppkey))
ORDER BY s_name
"""


def concentrated_supply_sql(t: dict[str, DataFrame]) -> DataFrame:
    return t["lineitem"].sparkSession.sql(CONCENTRATED_SUPPLY_SQL)


CONCENTRATED_SUPPLY_ORACLE = CONCENTRATED_SUPPLY_SQL
