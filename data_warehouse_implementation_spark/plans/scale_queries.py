"""Scale-technique queries: runtime bloom-filter join pruning and
mergeable histogram-sketch quantile rollups.

Both are engine techniques the reference outsources to PostgreSQL
internals (b-tree index scans, exact ``percentile_cont`` over full
sorts); at Spark scale they become explicit plan shapes, and both are
expressed in engine-portable integer/double arithmetic so the DuckDB
oracles replay the *technique* (bit positions, bin counts), not just a
final answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import runtime_filters as rf
from .ingest_queries import _event_ts

# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning


def bloom_prefilter_join(t: dict[str, DataFrame]) -> DataFrame:
    """Prune the orders fact scan by a 2 KiB Bloom filter built over the
    BUILDING-segment customers, then run the real join and report, per
    order priority: total rows, bloom survivors, true matches, and the
    false positives the join removed. The filter is transparent to
    correctness (the join re-verifies); the *survivor counts* are what
    the oracle checks, so a degenerate always-true filter fails the
    differential.

    100 TB shape: the probe is map-side against a broadcast fixed-size
    bit array — the fact is never shuffled to discover that 98% of it
    joins nothing (Spark's own runtime bloom filter,
    ``spark.sql.optimizer.runtime.bloomFilter.enabled``, injects this
    exact plan automatically; reference analog: b-tree index scans,
    ``creating-tables.sql:11-21``)."""
    keys = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    probed = rf.bloom_prefilter(t["orders"], keys, "o_custkey", "k")
    # the real join: broadcast here because the dim is small at test sf;
    # the bloom is what stands in when the dim is NOT broadcast-sized
    marked = probed.join(
        F.broadcast(keys.withColumn("matched", F.lit(True))),
        on=[probed.o_custkey == keys.k],
        how="left",
    )
    return (
        marked.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("bloom_pass"), 1)).alias("n_bloom_pass"),
            F.count(F.when(F.col("matched"), 1)).alias("n_matched"),
            (
                F.count(F.when(F.col("bloom_pass"), 1))
                - F.count(F.when(F.col("matched"), 1))
            ).alias("n_false_pos"),
        )
        .orderBy("o_orderpriority")
    )


def _pos_sql(key: str, i: int) -> str:
    return (
        f"((({key} % {rf.HASH_P}) * {rf.BLOOM_A[i]} + {rf.BLOOM_B[i]})"
        f" % {rf.HASH_P}) % {rf.BLOOM_M}"
    )


# Membership against the packed bit array is equivalent to membership in
# the distinct-position set ((word, bit) <-> position is a bijection),
# so the oracle tests IN the position set — same semantics, same false
# positives, no bit packing needed on the DuckDB side.
BLOOM_PREFILTER_JOIN_ORACLE = f"""
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
),
pos AS (
  SELECT DISTINCT {_pos_sql('k', 0)} AS p FROM keys
  UNION
  SELECT {_pos_sql('k', 1)} FROM keys
  UNION
  SELECT {_pos_sql('k', 2)} FROM keys
),
probe AS (
  SELECT o.o_orderpriority,
         ({_pos_sql('o.o_custkey', 0)}) IN (SELECT p FROM pos)
     AND ({_pos_sql('o.o_custkey', 1)}) IN (SELECT p FROM pos)
     AND ({_pos_sql('o.o_custkey', 2)}) IN (SELECT p FROM pos) AS bloom_pass,
         o.o_custkey IN (SELECT k FROM keys) AS matched
  FROM orders o
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE bloom_pass) AS n_bloom_pass,
       COUNT(*) FILTER (WHERE matched) AS n_matched,
       COUNT(*) FILTER (WHERE bloom_pass)
         - COUNT(*) FILTER (WHERE matched) AS n_false_pos
FROM probe GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Mergeable histogram-sketch quantiles (O(delta) percentile maintenance)

BIN_W = 10.0  # histogram resolution: quantile error <= one bin width


def events_quantile_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Approximate per-type value quantiles from DAILY mergeable
    histogram sketches: each day contributes (type, bin, count) rows;
    the rollup is a plain re-aggregation (histograms merge by adding
    counts — the property exact percentiles lack), and the quantile
    estimate is the lower bound of the first bin whose cumulative count
    reaches ``q * total``.

    100 TB shape: the raw stream is reduced to day-grain sketch rows at
    ingest (map-side combine), nightly maintenance merges |days| x
    |types| x |bins| tiny rows, and the final window runs over <=
    #bins rows per type — no full sort of the fact, ever (contrast the
    exact order-statistics path in ``brand_price_percentiles``, which
    is the small-table tool). Companion of ``user_sketch_rollup``
    (mergeable HLL distinct) — same maintenance contract, for
    quantiles."""
    daily = histogram_partials(
        t["events"].withColumn("_ts", _event_ts(t["events"])), ts_col="_ts"
    )
    merged = daily.groupBy("event_type", "bin").agg(F.sum("n").alias("n"))
    return quantiles_from_bins(merged)


def histogram_partials(ev: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Day-grain mergeable histogram partials ``(day, event_type, bin,
    n)`` — partials for the same (day, type, bin) merge by summing
    ``n``, which is what the coarser rollup and the streaming sink
    (``streaming/pipelines.py::histogram_sketch_sink``) rely on; shared
    verbatim by both so their parity is structural."""
    return (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", ts_col), "yyyy-MM-dd").alias("day"),
            F.floor(F.col("value") / BIN_W).cast("long").alias("bin"),
        )
        .groupBy("day", "event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles_from_bins(merged: DataFrame) -> DataFrame:
    """Quantile report from fully-merged ``(event_type, bin, n)`` rows —
    the estimate is the lower bound of the first bin whose cumulative
    count reaches ``q * total``. Shared by the batch rollup and the
    streaming state reader."""
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = merged.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("event_type"))
    )
    aggs = [F.max("total").alias("n_events")]
    # integer rank test (100*cum >= q100*total), never q*total in
    # doubles: a float threshold that lands exactly on an integer rank
    # resolves differently ULP-by-ULP across engines
    for q100, nm in ((50, "p50_lo"), (90, "p90_lo"), (99, "p99_lo")):
        aggs.append(
            (
                F.min(
                    F.when(
                        F.col("cum") * 100 >= F.lit(q100) * F.col("total"),
                        F.col("bin"),
                    )
                )
                * BIN_W
            ).alias(nm)
        )
    return cum.groupBy("event_type").agg(*aggs).orderBy("event_type")


EVENTS_QUANTILE_ROLLUP_ORACLE = f"""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         CAST(FLOOR(value / {BIN_W}) AS BIGINT) AS bin, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, bin, CAST(SUM(n) AS BIGINT) AS n
  FROM daily GROUP BY event_type, bin
),
cum AS (
  SELECT event_type, bin, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM merged
)
SELECT event_type,
       MAX(total) AS n_events,
       MIN(CASE WHEN cum * 100 >= 50 * total THEN bin END) * CAST({BIN_W} AS DOUBLE) AS p50_lo,
       MIN(CASE WHEN cum * 100 >= 90 * total THEN bin END) * CAST({BIN_W} AS DOUBLE) AS p90_lo,
       MIN(CASE WHEN cum * 100 >= 99 * total THEN bin END) * CAST({BIN_W} AS DOUBLE) AS p99_lo
FROM cum GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Skew diagnostics (the census that decides when to salt)

SKEW_SALT_TARGET = 100_000  # rows per task a salt factor should aim for


def events_skew_census(t: dict[str, DataFrame]) -> DataFrame:
    """Key-skew diagnostics for the events stream's natural shuffle key:
    per event_type, the key-frequency distribution summary a pipeline
    operator reads before choosing a join/agg strategy — distinct keys,
    max and p99 key frequency, the share of rows owned by the single
    hottest key, and the salt factor ``ceil(max_freq / TARGET)`` that
    ``salted_two_phase_agg`` / ``salted_skew_join`` would need. The
    operator-facing answer to 'is this key safe to shuffle on?'.

    Two aggregates: rows -> (type, key) counts (the only corpus-scale
    shuffle), then #keys-rows -> summary. p99 is an exact order
    statistic over per-type key counts via the same integer rank test
    as ``events_quantile_rollup`` (no float thresholds)."""
    ev = t["events"].select("event_type", "user_id")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("n", "user_id")
    ranked = per_key.withColumn("rk", F.row_number().over(w)).withColumn(
        "nk", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("nk").alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_key_freq"),
            F.min(F.when(F.col("rk") * 100 >= F.col("nk") * 99, F.col("n"))).alias(
                "p99_key_freq"
            ),
        )
        .withColumn(
            "max_key_share",
            F.col("max_key_freq").cast("double") / F.col("n_rows").cast("double"),
        )
        .withColumn(
            "salt_factor",
            F.ceil(F.col("max_key_freq").cast("double") / SKEW_SALT_TARGET).cast("long"),
        )
        .orderBy("event_type")
    )


EVENTS_SKEW_CENSUS_ORACLE = f"""
WITH per_key AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, user_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS nk
  FROM per_key
)
SELECT event_type,
       CAST(MAX(nk) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       MAX(n) AS max_key_freq,
       MIN(CASE WHEN rk * 100 >= nk * 99 THEN n END) AS p99_key_freq,
       CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS max_key_share,
       CAST(CEIL(CAST(MAX(n) AS DOUBLE) / {SKEW_SALT_TARGET}) AS BIGINT) AS salt_factor
FROM ranked GROUP BY event_type ORDER BY event_type
"""
