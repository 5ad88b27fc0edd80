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
