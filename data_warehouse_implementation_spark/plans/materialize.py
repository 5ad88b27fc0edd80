"""Session-scoped materialization of shared intermediates (reference S7:
``CREATE TEMPORARY TABLE ... AS`` — ``analysis.sql:13,63,110,155,254``).

The reference computes ``temp_timely`` / ``temp_disputed`` /
``temp_companies`` / ``temp_cf`` once per session and reuses them across
queries. Spark's analog is ``.cache()`` + reuse of the same DataFrame
object; this module provides that reuse across *separate* registry query
invocations inside one SparkSession (the driver's correctness gate and
the bench both call queries independently in one process).

Cache entries are keyed by (name, sf_dir) and validated against the
current SparkSession — a new session (tests stop/recreate them) simply
rebuilds. Most entries hold ~#groups rows (interest lists,
pre-aggregates); the near-dup (doc, shingle-id) entry is corpus-scale —
at 100 TB it belongs in a parquet staging table (WarehouseCatalog.create_table_as)
rather than executor memory, at the cost of one write/read cycle.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}

#: Append-only log of cache names BUILT (not served) this process, in
#: build order. The bench snapshots it around each timed query so
#: bench_detail.json can attribute shared-cache build cost to the query
#: that actually paid it — round-over-round comparisons otherwise read
#: a family-cache reordering as a per-query regression (VERDICT r5 #6).
BUILD_LOG: list[str] = []

#: Lockstep with BUILD_LOG: wall seconds each build took, EXCLUSIVE of
#: nested child builds (a builder that itself calls get_or_build is not
#: double-charged). Builds are forced eagerly inside get_or_build so the
#: cost is measured HERE, not inside whichever consumer query happens to
#: run the first action — this is what makes per-query bench timings
#: independent of window/bench ordering (VERDICT r8 #2b).
BUILD_SECONDS: list[float] = []

_CHILD_TIME: list[float] = [0.0]  # per-depth child-build accumulator


def get_or_build(
    name: str,
    sf_dir: str,
    builder: Callable[[], DataFrame],
    corpus_scale: bool = False,
) -> DataFrame:
    """Return the cached DataFrame for (name, sf_dir), building and
    ``.cache()``-ing it on first use in the current session.

    ``corpus_scale=True`` marks entries whose size grows with the corpus
    (exploded shingle sets, band tables): when ``SPARK_GRAFT_STAGE_DIR``
    is set, those are staged as parquet tables instead of executor
    memory — the 100 TB answer; unset (tests/bench at small sf) they use
    the memory cache like everything else."""
    spark = SparkSession.getActiveSession()
    entry = _CACHE.get((name, sf_dir))
    if entry is not None:
        owner, df = entry
        if owner is spark:
            return df
        # stale entry from a stopped/replaced session — rebuild
        _CACHE.pop((name, sf_dir), None)
    stage_dir = os.environ.get("SPARK_GRAFT_STAGE_DIR")
    staged_path = None
    if corpus_scale and stage_dir:
        # Corpus-scale intermediates don't belong in executor memory
        # at production scale — persist to a parquet staging table
        # instead (one write/read cycle; columnar scans thereafter).
        # Keyed by (name, dataset) exactly like the memory cache.
        staged_path = os.path.join(
            stage_dir, f"{name}_{sf_dir.strip('/').replace('/', '_')}"
        )
        if os.path.exists(staged_path):
            # A staging table persisted by a PREVIOUS session: re-opening
            # parquet is NOT a build — logging it would attribute a
            # phantom ~0s 'build' to whichever query touched the cache
            # first in this process (ADVICE r9), so skip the BUILD_LOG/
            # BUILD_SECONDS append entirely.
            df = spark.read.parquet(staged_path)
            _CACHE[(name, sf_dir)] = (spark, df)
            return df
    pos = len(BUILD_LOG)
    BUILD_LOG.append(name)
    BUILD_SECONDS.append(0.0)
    _CHILD_TIME.append(0.0)
    t0 = time.perf_counter()
    try:
        if staged_path is not None:
            builder().write.mode("overwrite").parquet(staged_path)
            df = spark.read.parquet(staged_path)
        else:
            df = builder().cache()
            # Force materialization NOW so the build cost is timed and
            # attributed here, once, instead of landing on whichever
            # consumer query runs the cache's first action.
            df.count()
    finally:
        dt = time.perf_counter() - t0
        BUILD_SECONDS[pos] = round(dt - _CHILD_TIME.pop(), 3)
        _CHILD_TIME[-1] += dt
    _CACHE[(name, sf_dir)] = (spark, df)
    return df


def materialize(name: str, df: DataFrame, sf_dir: str = "") -> DataFrame:
    """Explicitly cache ``df`` under ``name`` (S7 public API). Also
    registers it as a temp view so ``spark.sql`` can reference it."""
    out = get_or_build(name, sf_dir, lambda: df)
    out.createOrReplaceTempView(name)
    return out


def clear() -> None:
    """Unpersist and drop every cached intermediate (test hygiene)."""
    for _, (owner, df) in list(_CACHE.items()):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _CACHE.clear()
