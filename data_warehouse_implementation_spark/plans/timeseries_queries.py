"""Time-series / window-frame / set-operation / skew-aggregation
extension queries (beyond the reference's own surface — SURVEY §7 lists
as-of joins, frame-spec windows, INTERSECT/EXCEPT, and grouping sets as
extensions; the brief's event-analytics angle needs all of them).

Every query here has a full DuckDB oracle — the as-of join is checked
against DuckDB's native ``ASOF LEFT JOIN``, which is the strongest
differential available for it (an independent implementation of the
same semantics, not a replay of ours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import asof
from .ingest_queries import _decimal_sum_as_double, _event_ts

# ---------------------------------------------------------------------------
# As-of join: each purchase joined to the user's most recent prior view.


def events_asof_join(t: dict[str, DataFrame]) -> DataFrame:
    """Backward as-of join over the event stream: for every purchase,
    the same user's latest view at-or-before the purchase time (the
    trade/quote pattern). Implementation is the scalable union +
    running-``last(ignorenulls)`` window (`operators/asof.py`) — one
    shuffle on user_id, no range-join explosion; DuckDB's native
    ASOF LEFT JOIN is the oracle."""
    ev = t["events"].select(
        "event_id", "user_id", "event_type", "value", _event_ts(t["events"]).alias("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    joined = asof.asof_join(
        purchases, views, on=["user_id"], ts_col="ts",
        payload=["view_value"], matched_ts_col="view_ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "value",
        "view_value",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("us_since_view"),
    ).orderBy("event_id")


EVENTS_ASOF_JOIN_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts, value AS view_value FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value,
       v.view_value,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       epoch_us(p.ts) - epoch_us(v.ts) AS us_since_view
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# Band / range join: broadcast interval lookup.

_BANDS = [
    ("b0_low", 0.0, 50.0),
    ("b1_mid", 50.0, 150.0),
    ("b2_high", 150.0, 300.0),
    ("b3_top", 300.0, None),
]


def event_value_band_join(t: dict[str, DataFrame]) -> DataFrame:
    """Range join of the event stream against a tiny interval table
    ([lo, hi) value bands, NULL hi = unbounded). The band table is
    broadcast — the fact side never shuffles and each row matches
    exactly one disjoint band."""
    ev = t["events"].select("event_type", "value")
    bands = ev.sparkSession.createDataFrame(_BANDS, "band string, lo double, hi double")
    joined = asof.band_range_join(ev, bands, "value")
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _decimal_sum_as_double(F.col("value")).alias("total_value"),
        )
        .orderBy("band")
    )


EVENT_VALUE_BAND_JOIN_ORACLE = """
WITH bands(band, lo, hi) AS (VALUES
  ('b0_low', 0.0, 50.0), ('b1_mid', 50.0, 150.0),
  ('b2_high', 150.0, 300.0), ('b3_top', 300.0, CAST(NULL AS DOUBLE)))
SELECT band, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN bands b ON e.value >= b.lo AND (b.hi IS NULL OR e.value < b.hi)
GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# Salted two-phase aggregation (skew pattern, oracle = plain GROUP BY).


def salted_skew_agg(t: dict[str, DataFrame]) -> DataFrame:
    """Two-phase salted aggregation over lineitem grouped by the
    3-value (maximally skewed) l_returnflag key. The salt fans each hot
    key over 32 reducers in phase 1; phase 2 re-aggregates ~96 partial
    rows. Result is algebraically identical to the direct GROUP BY —
    which is exactly what the oracle runs."""
    out = asof.salted_two_phase_agg(
        t["lineitem"],
        ["l_returnflag"],
        {
            "n_items": (F.count(F.lit(1)), F.sum),
            "sum_qty": (F.sum(F.col("l_quantity").cast("decimal(18,2)")), F.sum),
            "max_price": (F.max("l_extendedprice"), F.max),
        },
        salt_expr=F.hash("l_orderkey"),
        buckets=32,
    )
    return out.select(
        "l_returnflag",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "max_price",
    ).orderBy("l_returnflag")


SALTED_SKEW_AGG_ORACLE = """
SELECT l_returnflag, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Exact distinct counts (the dedup-adjacent cardinality primitive).


def event_user_distinct(t: dict[str, DataFrame]) -> DataFrame:
    """Exact per-type distinct-user counts. COUNT(DISTINCT) expands to
    a two-level aggregate in Spark (partial distinct per partition,
    then merge) — no driver-side set. For 100 TB cardinality scans use
    approx_count_distinct (HLL) instead; exact is the oracle-checkable
    variant."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


EVENT_USER_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Frame-spec windows: running totals, moving window, lag deltas.


def customer_running_totals(t: dict[str, DataFrame]) -> DataFrame:
    """Per-customer order timeline: running spend (UNBOUNDED PRECEDING),
    3-order moving average (ROWS 2 PRECEDING), and days since the
    previous order (LAG). All windows are partitioned by customer —
    the work spreads across executors; sums run over decimal casts so
    the running accumulation is order-exact on both engines."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.sum(dec).over(run).cast("double").alias("running_spend"),
            (F.sum(dec).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias("mov3_avg"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("long").alias("days_since_prev"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


CUSTOMER_RUNNING_TOTALS_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
            / COUNT(*) OVER w3 AS mov3_avg,
       date_diff('day', LAG(o_orderdate) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS days_since_prev
FROM orders
WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT.


def customer_set_ops(t: dict[str, DataFrame]) -> DataFrame:
    """Customers active in both 1995 and 1996 but not in 1997 —
    INTERSECT then EXCEPT (both distinct), matching SQL's precedence
    ((A INTERSECT B) EXCEPT C). Spark plans these as aggregated
    left-semi / left-anti joins on the hashed key."""
    o = t["orders"]

    def _year(y: int) -> DataFrame:
        return o.filter(F.year("o_orderdate") == y).select("o_custkey")

    return _year(1995).intersect(_year(1996)).subtract(_year(1997)).orderBy("o_custkey")


CUSTOMER_SET_OPS_ORACLE = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# CUBE grouping sets (completes rollup coverage).


def order_cube(t: dict[str, DataFrame]) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one
    pass; grouping_id distinguishes levels (companion to
    analytics.order_rollup)."""
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _decimal_sum_as_double(F.col("o_totalprice")).alias("total_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


ORDER_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Exact percentile aggregation (interpolated, order-statistics class).


def brand_price_percentiles(t: dict[str, DataFrame]) -> DataFrame:
    """Exact interpolated p50/p90/p99 of part retail price per brand.
    Prices are first cast to exact integer cents so both engines
    interpolate over identical integer order statistics — the
    lower + (upper-lower)*fraction arithmetic is then bit-identical.
    Exact percentiles sort within each group (fine for bounded group
    cardinality); at 100 TB switch to percentile_approx (t-digest
    sketch, mergeable map-side)."""
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("bigint")
    agg = t["part"].select("p_brand", cents.alias("cents")).groupBy("p_brand")
    return agg.agg(
        (F.percentile("cents", 0.5) / 100.0).alias("p50"),
        (F.percentile("cents", 0.9) / 100.0).alias("p90"),
        (F.percentile("cents", 0.99) / 100.0).alias("p99"),
        F.count(F.lit(1)).alias("n_parts"),
    ).orderBy("p_brand")


BRAND_PRICE_PERCENTILES_ORACLE = """
WITH c AS (SELECT p_brand,
                  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM part)
SELECT p_brand,
       quantile_cont(cents, 0.5) / 100.0 AS p50,
       quantile_cont(cents, 0.9) / 100.0 AS p90,
       quantile_cont(cents, 0.99) / 100.0 AS p99,
       COUNT(*) AS n_parts
FROM c GROUP BY p_brand ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# HLL sketch cardinality, checked against the exact count.


def user_sketch_distinct(t: dict[str, DataFrame]) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=1%) next to the exact
    distinct count, emitting a within-5% acceptance flag. The sketch is
    the 100 TB path — mergeable partial state, no shuffle of distinct
    values; the exact count is what the oracle can check, and the flag
    pins the sketch's accuracy contract (deterministic: HLL++ has no
    RNG, identical input -> identical estimate)."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("n_approx") - F.col("n_users"))
                <= 0.05 * F.col("n_users")
            ).alias("sketch_ok"),
        )
        .orderBy("event_type")
    )


USER_SKETCH_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, TRUE AS sketch_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (from-scratch frequency sketch — the
# companion to the cardinality sketches above: HLL answers "how many
# distinct", CMS answers "how often does each one occur" in fixed space).

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_P = 2_147_483_647
CMS_A = [1103515245 + 12345 * i for i in range(CMS_DEPTH)]
CMS_B = [7 + 1013904223 * i for i in range(CMS_DEPTH)]
CMS_HH_PCT = 1  # heavy hitter: estimated count >= 1% of the stream


def events_heavy_hitters_cms(t: dict[str, DataFrame]) -> DataFrame:
    """Heavy-hitter detection through a from-scratch count-min sketch:
    every event increments ``CMS_DEPTH`` cells (one universal-hash
    bucket per row; the sketch build is one groupBy over DEPTH x WIDTH
    = 256 bounded cells — mergeable partial state, same 100 TB posture
    as the HLL queries), and a user's estimate is the MIN over its
    DEPTH cells — always >= the true count, never under. Users whose
    ESTIMATE clears CMS_HH_PCT% of the stream are reported next to
    their true count and the per-row guarantee flag. All integer
    modular arithmetic, so the oracle replays sketch construction AND
    query bit-for-bit."""
    spark = t["events"].sparkSession
    params = spark.createDataFrame(
        [(i, CMS_A[i], CMS_B[i]) for i in range(CMS_DEPTH)], "i int, a long, b long"
    )
    ev = t["events"].select("user_id")
    cell = F.pmod((F.col("user_id") % CMS_P) * F.col("a") + F.col("b"), F.lit(CMS_P)) % CMS_WIDTH
    # sketch build: DEPTH copies of the stream -> (row, bucket) counts
    cells = (
        ev.crossJoin(F.broadcast(params))
        .select("i", cell.alias("col"))
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    total = ev.select(F.count(F.lit(1)).alias("_total"))
    est = (
        users.crossJoin(F.broadcast(params))
        .select("user_id", "true_count", "i", cell.alias("col"))
        .join(F.broadcast(cells), on=["i", "col"])
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est_count") * 100 >= F.col("_total") * CMS_HH_PCT)
        .select(
            "user_id",
            "est_count",
            "true_count",
            (F.col("est_count") >= F.col("true_count")).alias("never_undercounts"),
        )
        .orderBy("user_id")
    )


_CMS_PARAMS_SQL = ", ".join(
    f"({i}, {CMS_A[i]}, {CMS_B[i]})" for i in range(CMS_DEPTH)
)

EVENTS_HEAVY_HITTERS_CMS_ORACLE = f"""
WITH params(i, a, b) AS (VALUES {_CMS_PARAMS_SQL}),
ev AS (SELECT user_id FROM events),
cells AS (
  SELECT i, ((user_id % {CMS_P}) * a + b) % {CMS_P} % {CMS_WIDTH} AS col,
         COUNT(*) AS c
  FROM ev CROSS JOIN params GROUP BY 1, 2
),
users AS (SELECT user_id, COUNT(*) AS true_count FROM ev GROUP BY user_id),
tot AS (SELECT COUNT(*) AS total FROM ev),
est AS (
  SELECT u.user_id, u.true_count, CAST(MIN(c.c) AS BIGINT) AS est_count
  FROM users u
  CROSS JOIN params p
  JOIN cells c ON c.i = p.i
   AND c.col = ((u.user_id % {CMS_P}) * p.a + p.b) % {CMS_P} % {CMS_WIDTH}
  GROUP BY u.user_id, u.true_count
)
SELECT user_id, est_count, true_count,
       est_count >= true_count AS never_undercounts
FROM est CROSS JOIN tot
WHERE est_count * 100 >= total * {CMS_HH_PCT}
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Salted skew JOIN (companion to the salted two-phase AGG above).

_FLAG_LABELS = [("R", "returned"), ("A", "accepted"), ("N", "none")]


def salted_flag_join(t: dict[str, DataFrame]) -> DataFrame:
    """Join the maximally-skewed lineitem.l_returnflag (3 hot keys)
    against a label dim through ``salted_skew_join``: the fact side is
    salted by a row-id hash, the dim replicated x32, so each hot key
    fans out over 32 reducers instead of hot-spotting 3. The oracle is
    the plain unsalted join — salting must be algebraically invisible."""
    li = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    dim = li.sparkSession.createDataFrame(
        _FLAG_LABELS, "l_returnflag string, flag_label string"
    )
    joined = asof.salted_skew_join(
        li,
        dim,
        on=["l_returnflag"],
        salt_expr=F.xxhash64("l_orderkey", "l_linenumber"),
        buckets=32,
    )
    return (
        joined.groupBy("flag_label")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _decimal_sum_as_double(F.col("l_quantity")).alias("total_qty"),
        )
        .orderBy("flag_label")
    )


SALTED_FLAG_JOIN_ORACLE = """
WITH labels(l_returnflag, flag_label) AS (VALUES
  ('R', 'returned'), ('A', 'accepted'), ('N', 'none'))
SELECT flag_label, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN labels USING (l_returnflag)
GROUP BY flag_label ORDER BY flag_label
"""


# ---------------------------------------------------------------------------
# Day-over-day deltas via lag (the metric-dashboard staple)


def events_daily_delta(t: dict[str, DataFrame]) -> DataFrame:
    """Daily event value totals per event_type with day-over-day delta
    and percent change via ``lag`` over a per-type window. The window
    partitions by event_type and holds #days rows per partition — the
    fact stream is aggregated to day grain BEFORE any window runs, so
    at 100 TB the window input is ~|types|x|days|, not |events|."""
    ev = t["events"].select(
        "event_type",
        F.date_format(F.date_trunc("day", _event_ts(t["events"])), "yyyy-MM-dd").alias("day"),
        "value",
    )
    daily = ev.groupBy("event_type", "day").agg(
        _decimal_sum_as_double(F.col("value")).alias("day_value")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("day_value").over(w)
    return (
        daily.withColumn("prev_value", prev)
        .withColumn("delta", F.col("day_value") - prev)
        .withColumn(
            "pct_change",
            F.when(prev != 0.0, (F.col("day_value") - prev) / prev),
        )
        .orderBy("event_type", "day")
    )


EVENTS_DAILY_DELTA_ORACLE = """
WITH daily AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, day_value,
       LAG(day_value) OVER w AS prev_value,
       day_value - LAG(day_value) OVER w AS delta,
       CASE WHEN LAG(day_value) OVER w <> 0.0
            THEN (day_value - LAG(day_value) OVER w) / LAG(day_value) OVER w END AS pct_change
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Quartile assignment via ntile + percent_rank


def customer_spend_quartiles(t: dict[str, DataFrame]) -> DataFrame:
    """Customer lifetime-spend quartiles per market segment: exact
    decimal spend totals, then ``ntile(4)`` and ``percent_rank`` over a
    window partitioned by segment (the cohort-bucketing pattern). The
    window input is the aggregated per-customer table, one row per
    customer."""
    spend = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(_decimal_sum_as_double(F.col("o_totalprice")).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        spend.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .withColumn("spend_pct_rank", F.percent_rank().over(w))
        .orderBy("c_mktsegment", "quartile", "c_custkey")
    )


CUSTOMER_SPEND_QUARTILES_ORACLE = """
WITH spend AS (
  SELECT c_custkey, c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
)
SELECT c_custkey, c_mktsegment, total_spend,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS spend_pct_rank
FROM spend
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY total_spend DESC, c_custkey)
ORDER BY c_mktsegment, quartile, c_custkey
"""


# ---------------------------------------------------------------------------
# Fixed-width histogram binning (the profiling staple)

HIST_BIN_WIDTH = 50_000.0


def price_histogram(t: dict[str, DataFrame]) -> DataFrame:
    """Order-price histogram: fixed-width bins via floor division — a
    single map-side bin assignment + one aggregate, the distribution
    profile every data-quality dashboard starts with. Bin edges are
    exact double arithmetic, identical on both engines."""
    binned = t["orders"].withColumn(
        "bin_id", F.floor(F.col("o_totalprice") / F.lit(HIST_BIN_WIDTH)).cast("long")
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .withColumn("bin_low", F.col("bin_id") * F.lit(HIST_BIN_WIDTH))
        .select("bin_id", "bin_low", "n_orders", "min_price", "max_price")
        .orderBy("bin_id")
    )


PRICE_HISTOGRAM_ORACLE = f"""
SELECT CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin_id,
       CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT) * {HIST_BIN_WIDTH} AS bin_low,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY 1, 2 ORDER BY bin_id
"""


# ---------------------------------------------------------------------------
# Sorted string aggregation (listagg) over per-group top-k


def nation_top_customer_list(t: dict[str, DataFrame]) -> DataFrame:
    """Per nation: customer count and a comma-joined list of its top-3
    customers by account balance (deterministic tie-break on name). The
    Spark side builds the list with ``collect_list(struct) ->
    array_sort -> transform -> concat_ws`` — sorted-array algebra that
    makes the unordered ``collect_list`` deterministic; the oracle is
    DuckDB's ordered ``string_agg``. The window is partitioned per
    nation; only 3 rows per group reach the list aggregation."""
    cust = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_name")
    )
    top3 = cust.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= 3)
    counts = cust.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))
    lists = top3.groupBy("n_name").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rk", "c_name"))),
                lambda s: s["c_name"],
            ),
        ).alias("top_customers")
    )
    return counts.join(lists, on="n_name").orderBy("n_name")


NATION_TOP_CUSTOMER_LIST_ORACLE = """
WITH ranked AS (
  SELECT n_name, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_name) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
counts AS (
  SELECT n_name, COUNT(*) AS n_customers
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, n_customers,
       (SELECT string_agg(c_name, ',' ORDER BY rk)
        FROM ranked r WHERE r.n_name = counts.n_name AND rk <= 3) AS top_customers
FROM counts ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Percent-of-total (ratio_to_report window)


def nation_revenue_share(t: dict[str, DataFrame]) -> DataFrame:
    """Revenue per nation with its share of the corpus total — the
    ``ratio_to_report`` window shape. Revenue is aggregated FIRST (one
    shuffle to #nations rows); the unpartitioned total-sum window then
    runs over 25 post-aggregation rows, never the fact table, so the
    single-task global window is O(#groups) — the same discipline as the
    rank reports (analytics.py). Sums are exact-cents decimals; the
    share is a double division of two exact decimals, bit-identical
    across engines."""
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"))
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        F.col("_rev").cast("double").alias("revenue"),
        (F.col("_rev").cast("double") / F.sum("_rev").over(w).cast("double")).alias(
            "revenue_share"
        ),
    ).orderBy("n_name")


NATION_REVENUE_SHARE_ORACLE = """
WITH rev AS (
  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS revenue_share
FROM rev ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Funnel analysis (ordered event-sequence matching per user)

FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def events_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """Ordered conversion funnel: per user, each stage counts only if it
    occurs STRICTLY AFTER the user's entry into the previous stage
    (min-timestamp chaining, the standard product-analytics funnel).
    One shuffle per stage on user_id — each stage is a filtered
    aggregate joined to the previous stage's (user, ts) frontier; no
    windows over the event stream, no state. Emits one row per stage
    with the surviving user count and the share of stage-1 users.
    Stage counts are left-joined against the literal stage table with a
    COALESCE to 0, so a stage no user reaches (including an absent
    entry stage) still emits its row — matching the oracle's global
    COUNTs, which always produce a row even over an empty set; the
    entry-share denominator is NULL-guarded identically on both
    sides."""
    ev = t["events"].select(
        "user_id", "event_type", _event_ts(t["events"]).alias("ts")
    )
    frontier = None
    counts = []
    for stage in FUNNEL_STAGES:
        stage_ev = ev.filter(F.col("event_type") == stage)
        if frontier is None:
            frontier = stage_ev.groupBy("user_id").agg(F.min("ts").alias("_t"))
        else:
            frontier = (
                stage_ev.join(frontier.select("user_id", F.col("_t").alias("_prev")), on="user_id")
                .filter(F.col("ts") > F.col("_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("_t"))
            )
        counts.append(frontier.select(F.lit(stage).alias("stage"), F.col("user_id")))
    spark = ev.sparkSession
    stage_order = spark.createDataFrame(
        [(s, i + 1) for i, s in enumerate(FUNNEL_STAGES)], "stage string, stage_idx long"
    )
    agg = None
    for c in counts:
        a = c.groupBy("stage").agg(F.countDistinct("user_id").alias("n_users"))
        agg = a if agg is None else agg.unionByName(a)
    # An empty frontier aggregates to zero rows, so anchor on the literal
    # stage table: every stage emits a row, with n_users coalesced to 0.
    out = (
        stage_order.join(agg.withColumnRenamed("n_users", "_n"), on="stage", how="left")
        .select("stage", "stage_idx", F.coalesce(F.col("_n"), F.lit(0)).alias("n_users"))
    )
    first = out.filter(F.col("stage_idx") == 1).select(F.col("n_users").alias("_n0"))
    return (
        out.crossJoin(F.broadcast(first))
        .select(
            "stage_idx",
            "stage",
            "n_users",
            F.when(
                F.col("_n0") > 0,
                F.col("n_users").cast("double") / F.col("_n0").cast("double"),
            ).alias("share_of_entry"),
        )
        .orderBy("stage_idx")
    )


EVENTS_FUNNEL_ORACLE = """
WITH ev AS (SELECT user_id, event_type, ts FROM events),
s1 AS (
  SELECT user_id, MIN(ts) AS t FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
),
stages AS (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
  UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
  UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
)
SELECT stage_idx, stage, n_users,
       CAST(n_users AS DOUBLE)
       / CAST(NULLIF((SELECT n_users FROM stages WHERE stage_idx = 1), 0) AS DOUBLE)
         AS share_of_entry
FROM stages ORDER BY stage_idx
"""


# ---------------------------------------------------------------------------
# Retention cohorts (first-activity cohort x day offset activity matrix)

RETENTION_MAX_OFFSET = 7


def user_retention_cohorts(t: dict[str, DataFrame]) -> DataFrame:
    """Retention matrix: users cohorted by first-activity day; for each
    day offset 0..RETENTION_MAX_OFFSET, how many of the cohort were
    active that day. Two aggregates (first-day per user, distinct
    user-days) joined on user_id, then one (cohort, offset) group-by —
    every shuffle is on user or cohort keys, nothing corpus-global."""
    ev = t["events"].select(
        "user_id", F.to_date(_event_ts(t["events"])).alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    user_days = ev.distinct()
    return (
        user_days.join(first_day, on="user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("long"))
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .withColumn("cohort_day", F.date_format("cohort_day", "yyyy-MM-dd"))
        .orderBy("cohort_day", "day_offset")
    )


USER_RETENTION_COHORTS_ORACLE = f"""
WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
fd AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT strftime(fd.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day - cohort_day AS BIGINT) AS day_offset,
       COUNT(DISTINCT ev.user_id) AS n_active
FROM ev JOIN fd ON ev.user_id = fd.user_id
WHERE day - cohort_day <= {RETENTION_MAX_OFFSET}
GROUP BY fd.cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# Rolling z-score volume anomaly detection

ANOMALY_WINDOW = 7  # preceding days in the baseline
ANOMALY_Z = 2.0


def events_volume_anomaly(t: dict[str, DataFrame]) -> DataFrame:
    """Operational anomaly detection: per (event_type, day), compare the
    day's event count against the trailing ANOMALY_WINDOW-day baseline
    (rolling mean and population stddev over a rowsBetween frame) and
    flag |z| >= ANOMALY_Z. Day-grain pre-aggregation first, so the
    frame windows run over ~#days rows per event type — never the raw
    event stream. Variance comes from (sum, sum-of-squares, count) in a
    fixed expression order, so the doubles are engine-portable."""
    ev = t["events"].select(
        "event_type", F.to_date(_event_ts(t["events"])).alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOMALY_WINDOW, -1)
    )
    base_n = F.count(F.lit(1)).over(w)
    base_sum = F.sum("n_events").over(w)
    base_sumsq = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    mean = base_sum.cast("double") / base_n.cast("double")
    var = base_sumsq.cast("double") / base_n.cast("double") - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    out = (
        daily.withColumn("_bn", base_n)
        .withColumn("base_mean", mean)
        .withColumn("base_std", std)
        .filter(F.col("_bn") >= ANOMALY_WINDOW)  # full baseline only
        .withColumn(
            "z",
            F.when(
                F.col("base_std") > 0,
                (F.col("n_events").cast("double") - F.col("base_mean"))
                / F.col("base_std"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("is_anomaly", F.abs(F.col("z")) >= ANOMALY_Z)
    )
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "base_mean",
        "base_std",
        "z",
        "is_anomaly",
    ).orderBy("event_type", "day")


EVENTS_VOLUME_ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
framed AS (
  SELECT event_type, day, n_events,
         COUNT(*) OVER w AS bn,
         SUM(n_events) OVER w AS bsum,
         SUM(n_events * n_events) OVER w AS bsumsq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ANOMALY_WINDOW} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, day, n_events,
         CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE) AS base_mean,
         sqrt(greatest(CAST(bsumsq AS DOUBLE) / CAST(bn AS DOUBLE)
              - (CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE))
                * (CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE)), 0.0)) AS base_std
  FROM framed WHERE bn >= {ANOMALY_WINDOW}
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events, base_mean, base_std,
       CASE WHEN base_std > 0
            THEN (CAST(n_events AS DOUBLE) - base_mean) / base_std
            ELSE 0.0 END AS z,
       CASE WHEN base_std > 0
            THEN abs((CAST(n_events AS DOUBLE) - base_mean) / base_std) >= {ANOMALY_Z}
            ELSE false END AS is_anomaly
FROM scored ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Mergeable sketch rollup (incremental distinct maintenance)


def user_sketch_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Incremental distinct-count maintenance via MERGEABLE sketches:
    COUNT(DISTINCT) is not algebraic — a rollup table of daily distinct
    counts cannot be summed into a monthly one. Datasketches HLL
    sketches can: build one sketch per (event_type, day), then merge
    the day sketches per type (``hll_union_agg``) and estimate. This is
    the O(delta) maintenance path for distincts at 100 TB — each new
    day appends one sketch row, month-to-date re-estimates from ~30
    sketch merges instead of rescanning the raw stream. The exact
    distinct pins the estimate with a within-5% acceptance flag
    (deterministic: HLL has no RNG)."""
    ev = t["events"].select(
        "event_type", "user_id", F.to_date(_event_ts(t["events"])).alias("day")
    )
    merged = hll_union_estimate(daily_hll_sketches(ev)).withColumnRenamed(
        "n_approx", "_n_approx"
    ).withColumnRenamed("n_sketches", "n_day_sketches")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    return (
        exact.join(merged, on="event_type")
        .select(
            "event_type",
            "n_users",
            "n_day_sketches",
            (
                F.abs(F.col("_n_approx") - F.col("n_users"))
                <= 0.05 * F.col("n_users")
            ).alias("rollup_ok"),
        )
        .orderBy("event_type")
    )


def daily_hll_sketches(ev: DataFrame, key_col: str = "user_id") -> DataFrame:
    """One mergeable HLL sketch per (event_type, day) — ``(event_type,
    day, sk)``. Expects ``ev`` to carry a NORMALIZED date column
    ``day`` (the batch query derives it via ``_event_ts``; the
    streaming sink via its ``ts_col``). Shared verbatim by
    ``user_sketch_rollup`` and ``streaming/pipelines.py::
    hll_sketch_sink`` so their batch/stream parity is structural."""
    return ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg(key_col).alias("sk")
    )


def hll_union_estimate(sketches: DataFrame) -> DataFrame:
    """Union-merge (event_type, day, sk) sketch rows per type and
    estimate — ``(event_type, n_approx, n_sketches)``. Shared by the
    batch rollup and ``streaming/pipelines.py::distinct_from_state``."""
    return sketches.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_approx"),
        F.count(F.lit(1)).alias("n_sketches"),
    )


USER_SKETCH_ROLLUP_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_day_sketches,
       TRUE AS rollup_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts)


def event_transitions(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user event-type transition counts (prev_type -> type) with
    each source type's outgoing share — the first-order Markov view of
    user behavior (what follows a view? what precedes churn-y errors?).
    One lag window partitioned by user, one (pair) aggregate; shares
    are double divisions of exact counts."""
    ev = t["events"].select(
        "user_id", "event_type", _event_ts(t["events"]).alias("ts"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_src = Window.partitionBy("prev_type")
    return (
        pairs.withColumn(
            "share_from_prev",
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_src).cast("double"),
        )
        .orderBy("prev_type", "event_type")
    )


EVENT_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)
         AS share_from_prev
FROM pairs ORDER BY prev_type, event_type
"""


# ---------------------------------------------------------------------------
# Within-session conversion (sessionize x funnel composition)


def session_conversion(t: dict[str, DataFrame]) -> DataFrame:
    """Conversion at SESSION grain: reuse the gap-based sessionizer's
    algebra (same lag+cumsum, same 30-min gap) and ask, per session,
    whether a purchase followed a view INSIDE the session — the
    composition of the sessionization and funnel primitives. Emits one
    summary row: sessions, sessions with a view, sessions converted
    (first view strictly before last purchase), and the rate."""
    ev = t["events"].select(
        "user_id", _event_ts(t["events"]).alias("ts"), "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "new_session",
        F.coalesce(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            > F.lit(1800 * 1_000_000),
            F.lit(True),
        ).cast("int"),
    )
    sess = gapped.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("_first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "_last_purchase"
        ),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("_first_view").alias("n_with_view"),
        F.count(
            F.when(F.col("_first_view") < F.col("_last_purchase"), 1)
        ).alias("n_converted"),
    ).withColumn(
        "conversion_rate",
        F.col("n_converted").cast("double") / F.col("n_with_view").cast("double"),
    )


SESSION_CONVERSION_ORACLE = """
WITH gapped AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gapped
),
per_session AS (
  SELECT user_id, session_seq,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM sess GROUP BY user_id, session_seq
)
SELECT COUNT(*) AS n_sessions,
       COUNT(first_view) AS n_with_view,
       COUNT(CASE WHEN first_view < last_purchase THEN 1 END) AS n_converted,
       CAST(COUNT(CASE WHEN first_view < last_purchase THEN 1 END) AS DOUBLE)
         / CAST(COUNT(first_view) AS DOUBLE) AS conversion_rate
FROM per_session
"""


# ---------------------------------------------------------------------------
# IQR outlier fences (per-group robust outlier detection)


def brand_price_outliers(t: dict[str, DataFrame]) -> DataFrame:
    """Robust per-brand price outlier census via Tukey fences: values
    beyond Q1 - 1.5*IQR or Q3 + 1.5*IQR, with the quartiles computed
    over exact integer cents so both engines interpolate identically.
    Two passes over the group (quartile aggregate, then a broadcast
    join back for the fence test) — the standard profiling shape; at
    100 TB swap the exact quartiles for percentile_approx and keep the
    identical fence algebra."""
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("bigint")
    priced = t["part"].select("p_brand", cents.alias("cents"))
    q = priced.groupBy("p_brand").agg(
        F.percentile("cents", 0.25).alias("_q1"),
        F.percentile("cents", 0.75).alias("_q3"),
    )
    fenced = priced.join(F.broadcast(q), on="p_brand").withColumn(
        "_iqr", F.col("_q3") - F.col("_q1")
    )
    is_out = (F.col("cents") < F.col("_q1") - 1.5 * F.col("_iqr")) | (
        F.col("cents") > F.col("_q3") + 1.5 * F.col("_iqr")
    )
    return (
        fenced.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count(F.when(is_out, 1)).alias("n_outliers"),
            (F.min(F.col("_q1")) / 100.0).alias("q1"),
            (F.min(F.col("_q3")) / 100.0).alias("q3"),
        )
        .orderBy("p_brand")
    )


BRAND_PRICE_OUTLIERS_ORACLE = """
WITH c AS (SELECT p_brand,
                  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM part),
q AS (
  SELECT p_brand, quantile_cont(cents, 0.25) AS q1c, quantile_cont(cents, 0.75) AS q3c
  FROM c GROUP BY p_brand
)
SELECT c.p_brand,
       COUNT(*) AS n_parts,
       COUNT(CASE WHEN c.cents < q.q1c - 1.5 * (q.q3c - q.q1c)
                    OR c.cents > q.q3c + 1.5 * (q.q3c - q.q1c) THEN 1 END) AS n_outliers,
       MIN(q.q1c) / 100.0 AS q1,
       MIN(q.q3c) / 100.0 AS q3
FROM c JOIN q ON c.p_brand = q.p_brand
GROUP BY c.p_brand ORDER BY c.p_brand
"""


# ---------------------------------------------------------------------------
# Hierarchical percent-of-parent shares (region -> nation)


def region_nation_revenue_share(t: dict[str, DataFrame]) -> DataFrame:
    """Two-level percent-of-parent report: each nation's share WITHIN
    its region and each region's share of the total — the hierarchy
    drill every finance report wants. One star aggregate, then two
    window sums over #nations rows (post-aggregation, never
    fact-scale); exact decimal revenue so the ratios are
    order-independent doubles."""
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        F.col("_rev").cast("double").alias("revenue"),
        (
            F.col("_rev").cast("double") / F.sum("_rev").over(w_region).cast("double")
        ).alias("share_of_region"),
        (
            F.sum("_rev").over(w_region).cast("double")
            / F.sum("_rev").over(w_all).cast("double")
        ).alias("region_share_of_total"),
    ).orderBy("r_name", "n_name")


REGION_NATION_REVENUE_SHARE_ORACLE = """
WITH rev AS (
  SELECT r_name, n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE)
         / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE) AS share_of_region,
       CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE)
         / CAST(SUM(rev) OVER () AS DOUBLE) AS region_share_of_total
FROM rev ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Date-spine gap filling (sparse series -> dense calendar)

GAP_FILL_MIN_VALUE = 180.0


def events_gap_fill(t: dict[str, DataFrame]) -> DataFrame:
    """Dense daily series from a sparse event slice: high-value events
    (value >= 180, ~p97 of the value distribution) occur on only some days per type, so the daily
    aggregate has holes a downstream forecasting/chart consumer cannot
    tolerate. Build the full date spine (one global min..max day
    sequence crossed with the type list — spine rows = |days| x
    |types|, tiny), left-join the sparse dailies, zero-fill counts, and
    forward-fill the last observed daily max via ``last(ignorenulls)``
    over an unbounded-preceding frame — the canonical gap-fill +
    LOCF composition.

    100 TB shape: the fact scan reduces to day grain FIRST (map-side
    combine on the selective predicate), the spine is generated not
    scanned, and the LOCF window runs over |days| rows per type."""
    ev = t["events"].select(
        "event_type",
        F.date_format(F.date_trunc("day", _event_ts(t["events"])), "yyyy-MM-dd").alias(
            "day"
        ),
        "value",
    ).filter(F.col("value") >= GAP_FILL_MIN_VALUE)
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.max("value").alias("day_max")
    )
    bounds = daily.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine_days = bounds.select(
        F.explode(
            F.sequence(
                F.to_date("mn"), F.to_date("mx"), F.expr("interval 1 day")
            )
        ).alias("d")
    ).select(F.date_format("d", "yyyy-MM-dd").alias("day"))
    types = daily.select("event_type").distinct()
    spine = spine_days.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, on=["event_type", "day"], how="left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("day_max").alias("day_max"),
            F.last("day_max", ignorenulls=True).over(w).alias("locf_max"),
        )
        .orderBy("event_type", "day")
    )


EVENTS_GAP_FILL_ORACLE = f"""
WITH ev AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
  FROM events WHERE value >= {GAP_FILL_MIN_VALUE}
),
daily AS (
  SELECT event_type, day, COUNT(*) AS n, MAX(value) AS day_max
  FROM ev GROUP BY event_type, day
),
bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
spine_days AS (
  SELECT strftime(unnest(generate_series(CAST(mn AS DATE), CAST(mx AS DATE),
                 INTERVAL 1 DAY)), '%Y-%m-%d') AS day
  FROM bounds
),
spine AS (
  SELECT d.day, ty.event_type
  FROM spine_days d CROSS JOIN (SELECT DISTINCT event_type FROM daily) ty
)
SELECT s.event_type, s.day,
       COALESCE(dl.n, 0) AS n_events,
       dl.day_max AS day_max,
       LAST_VALUE(dl.day_max IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_max
FROM spine s LEFT JOIN daily dl ON s.event_type = dl.event_type AND s.day = dl.day
ORDER BY s.event_type, s.day
"""


def events_asof_forward(t: dict[str, DataFrame]) -> DataFrame:
    """FORWARD as-of join: for every purchase, the same user's FIRST
    view at-or-after the purchase time (post-conversion behavior — the
    mirror of ``events_asof_join``'s trade/quote lookup). Same
    union + keyed-window plan, ``first(ignorenulls)`` over the
    following frame; DuckDB's native forward ASOF (``l.ts <= r.ts``)
    is the oracle."""
    from ..operators import asof

    ev = t["events"].select(
        "event_id", "user_id", "event_type", "value", _event_ts(t["events"]).alias("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    joined = asof.asof_join(
        purchases, views, on=["user_id"], ts_col="ts",
        payload=["view_value"], matched_ts_col="view_ts",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "value",
        "view_value",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
        (F.unix_micros("view_ts") - F.unix_micros("ts")).alias("us_until_view"),
    ).orderBy("event_id")


EVENTS_ASOF_FORWARD_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts, value AS view_value FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value,
       v.view_value,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       epoch_us(v.ts) - epoch_us(p.ts) AS us_until_view
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
ORDER BY p.event_id
"""
