"""ETL cleaning pipelines — Spark ports of the reference's two pandas
transforms (SURVEY §7 Step 5):

- :func:`complaints_clean` mirrors ``eda_complaints`` (``python.py:
  66-111``): drop -> format-parse dates -> range filter -> Yes/No binary
  encode -> seeded random-sample imputation.
- :func:`demo_reshape_pipeline` mirrors ``eda_demo`` (``python.py:
  115-188``): column-name filter -> melt -> rsplit compound names ->
  regex remap -> pivot -> group median fill.
- :func:`segment_mode_fill` exercises the per-group mode fill the demo
  pipeline applies to string columns (``python.py:177-181``).

Everything is built from the operator library (reshape/imputation/
relational) — these functions are the *composition* proof. The random
imputation uses the portable draw (``imputation.sample_draw``) so the
DuckDB oracle replays fills exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import yes_no_to_int
from ..operators import imputation, relational, reshape
from ..operators.imputation import _HASH_A, _HASH_B, _HASH_P

CLEAN_START, CLEAN_END = "1996-01-01", "1999-12-31"
IMPUTE_SEED = 7


def complaints_clean(t: dict[str, DataFrame]) -> DataFrame:
    """Row-cleaning pipeline (``eda_complaints``): P3 drop, F2/F15
    format-parse, P4 range filter, F11 Yes/No encode (P status -> NULL),
    F16 seeded empirical imputation of the NULLs."""
    staged = (
        t["orders"]
        .drop("o_totalprice")  # P3: drop unused wide columns early
        .withColumn("date_str", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .withColumn("order_date", F.to_date("date_str", "yyyy-MM-dd"))  # F2/F15
        .filter(F.col("order_date").between(CLEAN_START, CLEAN_END))  # P4
        .withColumn(
            "status_yn",
            F.when(F.col("o_orderstatus") == "F", "Yes").when(
                F.col("o_orderstatus") == "O", "No"
            ),  # 'P' -> NULL, the reference's unanswered-survey analog
        )
        .withColumn("timely", yes_no_to_int("status_yn"))  # F11
    )
    filled = imputation.random_sample_fill(
        staged, ["timely"], id_col="o_orderkey", seed=IMPUTE_SEED
    )
    return filled.select(
        "o_orderkey",
        F.year("order_date").cast("long").alias("order_year"),
        F.col("timely").cast("int").alias("timely"),
    )


COMPLAINTS_CLEAN_ORACLE = f"""
WITH staged AS (
  SELECT o_orderkey,
         strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')::DATE AS order_date,
         CASE WHEN o_orderstatus = 'F' THEN 1 WHEN o_orderstatus = 'O' THEN 0 END AS timely
  FROM orders
  WHERE strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')::DATE
        BETWEEN DATE '{CLEAN_START}' AND DATE '{CLEAN_END}'
),
pool AS (
  SELECT timely AS v, COUNT(*) AS n FROM staged WHERE timely IS NOT NULL GROUP BY timely
),
freq AS (
  SELECT v, n,
         SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS off
  FROM pool
),
tot AS (SELECT SUM(n) AS t FROM pool)
SELECT s.o_orderkey,
       CAST(year(s.order_date) AS BIGINT) AS order_year,
       CAST(COALESCE(s.timely, f.v) AS INT) AS timely
FROM staged s
CROSS JOIN tot
LEFT JOIN freq f
  ON s.timely IS NULL
 AND ((s.o_orderkey % {_HASH_P}) * {_HASH_A} + {_HASH_B} + {IMPUTE_SEED}) % {_HASH_P} % tot.t >= f.off
 AND ((s.o_orderkey % {_HASH_P}) * {_HASH_A} + {_HASH_B} + {IMPUTE_SEED}) % {_HASH_P} % tot.t < f.off + f.n
"""


DEMO_YEARS = [1995, 1996, 1997, 1998]


def demo_reshape_pipeline(t: dict[str, DataFrame]) -> DataFrame:
    """Reshape pipeline (``eda_demo``): build a wide table with compound
    ``category.metric.year`` column names (the census shape), then P8
    name-filter -> F17 melt -> F12 rsplit -> F13 regex remap -> F14 cast
    -> F18 pivot -> A9 group median fill (1998 synthesized as missing)."""
    orders = t["orders"].withColumn("yr", F.year("o_orderdate"))
    base = orders.filter(F.col("yr").between(DEMO_YEARS[0], DEMO_YEARS[-1]))
    counts = (
        base.groupBy("o_orderpriority")
        .pivot("yr", [str(y) for y in DEMO_YEARS])
        .agg(F.count(F.lit(1)))
    )
    # compound column names + decoy columns the name filter must drop
    wide = counts.select(
        "o_orderpriority",
        *[F.col(f"`{y}`").alias(f"orders.cnt.{y}") for y in DEMO_YEARS],
        *[(F.col(f"`{y}`") * 0).alias(f"census.skip.{y}") for y in DEMO_YEARS],
    )

    kept = relational.drop_columns_matching(wide, "census")  # P8
    long = reshape.melt(  # F17
        kept,
        id_vars=["o_orderpriority"],
        value_vars=[f"orders.cnt.{y}" for y in DEMO_YEARS],
        var_name="metric",
        value_name="value",
    )
    split = (
        long.withColumn("yr", F.substring_index("metric", ".", -1).cast("int"))  # F12+F14
        .withColumn("category", F.regexp_replace("metric", "\\.\\d+$", ""))  # F12
        .withColumn("category", F.regexp_replace("category", "^orders\\.", ""))  # F13
        .withColumn(
            "category",
            F.when(F.col("category") == "cnt", "n_orders").otherwise(F.col("category")),
        )  # F13 literal remap
    )
    wide2 = reshape.pivot_wide(  # F18
        split,
        index=["o_orderpriority", "yr"],
        pivot_col="category",
        value_col="value",
        values=["n_orders"],
        agg="min",
    )
    gappy = wide2.withColumn(
        "n_orders", F.when(F.col("yr") == 1998, F.lit(None)).otherwise(F.col("n_orders"))
    )
    filled = imputation.group_median_fill(gappy, ["o_orderpriority"], ["n_orders"])  # A9
    return filled.orderBy("o_orderpriority", "yr")


DEMO_RESHAPE_ORACLE = f"""
WITH counts AS (
  SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(COUNT(*) AS DOUBLE) AS n_orders
  FROM orders
  WHERE year(o_orderdate) BETWEEN {DEMO_YEARS[0]} AND {DEMO_YEARS[-1]}
  GROUP BY 1, 2
),
gappy AS (
  SELECT o_orderpriority, yr,
         CASE WHEN yr = 1998 THEN NULL ELSE n_orders END AS n_orders
  FROM counts
)
SELECT o_orderpriority, yr,
       COALESCE(n_orders, MEDIAN(n_orders) OVER (PARTITION BY o_orderpriority)) AS n_orders
FROM gappy ORDER BY o_orderpriority, yr
"""


def segment_mode_fill(t: dict[str, DataFrame]) -> DataFrame:
    """A10 per-group mode *fill*: NULL-ed segment values (synthesized
    via NULLIF, testdata has no NULLs) refilled with each nation's
    deterministic modal segment (``python.py:177-181`` semantics:
    most frequent, then smallest)."""
    cust = t["customer"].join(
        t["nation"].select("n_nationkey", "n_name"),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        "c_custkey",
        "n_name",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment"),
    )
    filled = imputation.group_mode_fill(cust, ["n_name"], ["segment"])
    return (
        filled.groupBy("n_name", "segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name", "segment")
    )


SEGMENT_MODE_FILL_ORACLE = """
WITH src AS (
  SELECT c_custkey, n_name, NULLIF(c_mktsegment, 'BUILDING') AS segment
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
modes AS (
  SELECT n_name, segment AS mode_segment FROM (
    SELECT n_name, segment,
           ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY COUNT(*) DESC, segment ASC) AS rn
    FROM src WHERE segment IS NOT NULL GROUP BY n_name, segment
  ) WHERE rn = 1
)
SELECT src.n_name, COALESCE(src.segment, m.mode_segment) AS segment,
       COUNT(*) AS n_customers
FROM src LEFT JOIN modes m ON src.n_name = m.n_name
GROUP BY 1, 2 ORDER BY 1, 2
"""
