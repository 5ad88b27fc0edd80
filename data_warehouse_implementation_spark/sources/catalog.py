"""Parquet-backed warehouse catalog: DDL, sinks, and mutation guards
(reference S4/S5/S8/S9 + M5/M7).

The reference's warehouse is a set of PostgreSQL tables with declared
DDL (``creating-tables.sql``), populated by ``INSERT INTO ... SELECT``
(``inserting-data.sql``), torn down with ``DROP TABLE``
(``inserting-data.sql:189-215``), and protected by BEFORE-DELETE
triggers that raise on ``issue_dimension`` / ``resolution_dimension``
(``creating-tables.sql:196-216``). Spark has no enforced constraints or
triggers, so (per SURVEY §1.3) these become engine-level guarantees:

- ``create_table`` = declared ``StructType`` + empty parquet seed (S5);
- ``write``/``insert_into`` = sink + append (S4/S9);
- ``drop_table``/``truncate``/``delete_where`` raise ``PermissionError``
  on protected tables (M5/M7) — the delete-guard trigger's batch analog.

Storage is a directory of parquet tables — the same layout works
against object storage on a cluster (rename ``root`` to an ``s3a://``
URI). Facts should be written with ``partition_by`` (e.g. by year) so
partition pruning applies downstream.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class ProtectedTableError(PermissionError):
    """Raised for delete/drop/truncate on an append-only table (the
    reference trigger's ``RAISE EXCEPTION``, ``creating-tables.sql:199``)."""


class WarehouseCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._protected: set[str] = set()
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def tables(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(self.path(d)) and not d.startswith(".")
        )

    # -- DDL (S5) ------------------------------------------------------
    def create_table(self, name: str, schema: StructType | str, overwrite: bool = False) -> None:
        """Declare a table with an explicit schema (reference DDL,
        ``creating-tables.sql:29-178``) by seeding an empty parquet
        dataset — downstream reads see the declared schema."""
        if self.exists(name) and not overwrite:
            raise ValueError(f"table {name!r} already exists")
        empty = self.spark.createDataFrame([], schema)
        empty.write.mode("overwrite").parquet(self.path(name))

    def create_table_as(
        self, name: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> DataFrame:
        """CTAS (reference ``CREATE TABLE ... AS SELECT``,
        ``inserting-data.sql:7-10``): materialize a query result as a
        table and return the read-back DataFrame — the parquet staging
        move that replaces executor-memory caching for corpus-scale
        intermediates (see plans/materialize.py). Errors if the table
        exists; use :meth:`replace` to swap contents."""
        if self.exists(name):
            raise ValueError(f"table {name!r} already exists")
        self.write(name, df, partition_by=partition_by)
        return self.table(name)

    # -- guards (M5) ---------------------------------------------------
    def protect(self, *names: str) -> None:
        """Mark tables append-only (the BEFORE-DELETE trigger analog)."""
        self._protected.update(names)

    def _check_mutable(self, name: str) -> None:
        if name in self._protected:
            raise ProtectedTableError(
                f"Deleting records from {name} is not allowed."
            )

    # -- sinks (S4/S9) -------------------------------------------------
    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """Full-table sink (reference ``to_sql(if_exists='replace')``,
        ``python.py:217-218``). Overwrite of a protected table is a
        delete in disguise — guarded."""
        if mode == "overwrite":
            self._check_mutable(name)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    def insert_into(self, name: str, df: DataFrame) -> None:
        """``INSERT INTO ... SELECT`` append (S9,
        ``inserting-data.sql:22-178``). Appends are always allowed —
        protection is append-ONLY, not read-only."""
        df.write.mode("append").parquet(self.path(name))

    def write_observed(
        self,
        name: str,
        df: DataFrame,
        metrics: dict[str, "Column"],
        mode: str = "append",
    ) -> dict[str, object]:
        """Sink with IN-FLIGHT data-quality metrics: attach a
        ``DataFrame.observe`` node so the named aggregate expressions
        (row counts, null counts, min/max, violation counts …) are
        collected DURING the write's single pass over the data — the
        production QC pattern that replaces a separate validation scan
        (at 100 TB, "write, then re-read to count nulls" doubles the
        I/O; observe makes the metrics free). Returns the collected
        metric values keyed by name.

        Metrics must be aggregate expressions containing no distinct
        (Spark ``observe`` contract). The observation is bound to THIS
        write's execution — re-running the returned dict requires
        another write, which is exactly the semantics a QC gate wants
        (metrics describe the rows actually written, not a re-scan
        that may race concurrent appends)."""
        from pyspark.sql import Observation

        if mode == "overwrite":
            self._check_mutable(name)
        obs = Observation(f"qc_{name}")
        observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
        observed.write.mode(mode).parquet(self.path(name))
        return dict(obs.get)

    # -- maintenance ----------------------------------------------------
    def compact(self, name: str, target_files: int, sort_by: list[str] | None = None) -> None:
        """Rewrite a table into ``target_files`` files (small-files
        compaction — the operational tax of frequent appends; thousands
        of tiny files destroy scan throughput and driver listing time).
        ``sort_by`` additionally sorts rows within each output file so
        parquet row-group min/max statistics become selective: scans
        with predicates on the sort key skip whole row groups.
        Compaction only reorganizes bytes — never drops rows — so it is
        allowed on protected (append-only) tables."""
        df = self.table(name)
        if sort_by:
            df = df.repartitionByRange(target_files, *sort_by).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(target_files)
        self.replace(name, df, internal=True)

    def compact_zorder(
        self, name: str, target_files: int, zorder_by: list[str], bits: int = 16
    ) -> None:
        """Z-order compaction: rewrite the table range-partitioned and
        sorted by the Morton interleave of ``zorder_by``, so parquet
        min/max statistics are selective for predicates on ANY of those
        columns (a plain sort clusters only its leading key). The
        multi-column analog of :meth:`compact`'s sort_by."""
        from ..functions.scalar import zorder_key

        df = self.table(name)
        z = zorder_key(zorder_by, bits=bits)
        out = (
            df.withColumn("_z", z)
            .repartitionByRange(target_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        self.replace(name, out, internal=True)

    # -- bucketed sinks (co-located joins at scale) ---------------------
    def write_bucketed(
        self,
        name: str,
        df: DataFrame,
        buckets: int,
        bucket_by: list[str],
        sort_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Bucketed managed-table sink: rows are hash-partitioned into
        ``buckets`` files by ``bucket_by`` at WRITE time, so a later join
        or aggregation on those keys needs NO shuffle — the exchange is
        paid once at load instead of per query. This is the engine-level
        answer to the reference's btree indexes (``creating-tables.sql``
        S10): both pre-organize the table by key at write time.

        Spark only supports bucketing through the session catalog
        (``saveAsTable``), so bucketed tables live in the metastore
        warehouse dir, not under ``self.root``; read them back with
        :meth:`managed_table`. Guarded like any overwrite.

        Idempotent on overwrite: ``saveAsTable`` alone is not rerun-safe
        when the metastore is fresh (in-memory catalog per session) but a
        previous session's managed-table directory survives on disk —
        Spark then fails with ``LOCATION_ALREADY_EXISTS`` rather than
        replacing it. Pre-clean the catalog entry (DROP TABLE removes a
        managed table's real location, wherever the catalog put it) and,
        for catalog-unknown orphans only, the warehouse-dir path — with
        the table name validated against path separators first, since
        that branch is a recursive delete on a string-built path.
        """
        if mode == "overwrite":
            self._check_mutable(name)
            if os.sep in name or "/" in name or ".." in name:
                raise ValueError(f"unsafe table name for bucketed sink: {name!r}")
            if self.spark.catalog.tableExists(name):
                # known table: DROP TABLE deletes the managed location
                # the catalog actually recorded — no path guessing
                self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
            elif "." not in name:
                # orphan: a previous session's managed dir with no
                # catalog entry (in-memory metastore died). Only the
                # unqualified layout (<warehouse>/<name>) is
                # reconstructible from the name; qualified names live
                # under <db>.db/ and are left alone.
                wdir = self.spark.conf.get(
                    "spark.sql.warehouse.dir",
                    os.path.join(os.getcwd(), "spark-warehouse"),
                ).removeprefix("file:")
                orphan = os.path.join(wdir, name.lower())
                if os.path.isdir(orphan):
                    shutil.rmtree(orphan)
        writer = df.write.mode(mode).bucketBy(buckets, *bucket_by)
        if sort_by:
            writer = writer.sortBy(*sort_by)
        writer.format("parquet").saveAsTable(name)

    def managed_table(self, name: str) -> DataFrame:
        """Read back a bucketed (metastore-managed) table with its
        bucketing metadata intact — joins on the bucket key skip the
        exchange."""
        return self.spark.table(name)

    def drop_managed_table(self, name: str) -> None:
        self._check_mutable(name)
        self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")

    # -- reads ---------------------------------------------------------
    def table(self, name: str, merge_schema: bool = False) -> DataFrame:
        """Read a table. ``merge_schema=True`` unions the schemas of all
        parquet files in the table (schema evolution: batches appended
        with extra columns surface them, older rows read NULL there) —
        without it Spark takes one file's footer as the schema, which is
        arbitrary for a mixed-schema dir. Pair with
        :meth:`insert_into` appends that add columns over time."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self.path(name))

    # -- teardown (S8/M7) ---------------------------------------------
    def drop_table(self, name: str) -> None:
        self._check_mutable(name)
        if self.exists(name):
            shutil.rmtree(self.path(name))

    def truncate(self, name: str) -> None:
        """``DELETE FROM t`` / ``TRUNCATE`` (M7 — the commented-out
        ``DELETE FROM complaint_fact``, ``inserting-data.sql:182``)."""
        self._check_mutable(name)
        schema = self.table(name).schema
        self.create_table(name, schema, overwrite=True)

    def replace(
        self, name: str, df: DataFrame, internal: bool = False, keep_versions: int = 3
    ) -> None:
        """Replace a table's contents with a DataFrame *derived from
        that table* (SCD applies, predicate deletes): write to a side
        directory first, then swap — never overwrite files still being
        read by the plan. Guarded (a replace can drop rows) unless
        ``internal=True`` — SCD maintenance only closes/adds versions,
        mirroring how the reference's SCD trigger UPDATEs bypass its
        BEFORE-DELETE guard (``creating-tables.sql:205-239``).

        The displaced contents are RETAINED as a time-travel version
        (a directory rename — zero data copied): each replace pushes
        the old state to ``.versions/<name>/v<N>``, pruned to the last
        ``keep_versions``. Read old states with :meth:`table_version`,
        restore with :meth:`rollback` — the audit/undo story an
        SCD-maintained warehouse needs when a bad batch lands
        (``keep_versions=0`` disables retention)."""
        if not internal:
            self._check_mutable(name)
        tmp = self.path(name) + "._tmp"
        df.write.mode("overwrite").parquet(tmp)
        if self.exists(name):
            if keep_versions > 0:
                vdir = self._version_dir(name)
                os.makedirs(vdir, exist_ok=True)
                nxt = max(self.versions(name), default=0) + 1
                os.rename(self.path(name), os.path.join(vdir, f"v{nxt}"))
                for old in sorted(self.versions(name))[:-keep_versions]:
                    shutil.rmtree(os.path.join(vdir, f"v{old}"))
            else:
                shutil.rmtree(self.path(name))
        os.rename(tmp, self.path(name))

    # -- time travel ----------------------------------------------------
    def _version_dir(self, name: str) -> str:
        return os.path.join(self.root, ".versions", name)

    def versions(self, name: str) -> list[int]:
        """Retained version numbers for ``name`` (ascending; each was
        the table state displaced by one :meth:`replace`)."""
        vdir = self._version_dir(name)
        if not os.path.isdir(vdir):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(vdir) if d.startswith("v")
        )

    def table_version(self, name: str, version: int) -> DataFrame:
        """Time-travel read: the table as it was before the replace
        that created version ``version``."""
        return self.spark.read.parquet(
            os.path.join(self._version_dir(name), f"v{version}")
        )

    def rollback(self, name: str, version: int) -> None:
        """Restore a retained version as the current table state (the
        bad-batch undo). The restore itself goes through
        :meth:`replace`, so the pre-rollback state is retained too —
        a rollback is never destructive. Guarded like any replace."""
        self.replace(name, self.table_version(name, version))

    def delete_where(self, name: str, condition: str) -> None:
        """Predicate delete = keep the complement (batch formulation of
        row deletes). Guarded like all destructive ops.

        Deletes exactly the rows where the predicate is TRUE; rows
        where it evaluates to NULL are kept (null-safe complement —
        a bare ``NOT(cond)`` rewrite would drop them as collateral,
        and only when some other row happened to match).

        NO-OP fast path: when the predicate matches nothing, skip the
        rewrite entirely. A delete is a full read + overwrite + version
        archive, and the streaming sinks call this once per state table
        per micro-batch for replay idempotence — on the normal
        (no-replay) path the probe is one pruned scan and the state is
        never rewritten, keeping per-batch cost O(batch), not O(state)."""
        self._check_mutable(name)
        current = self.table(name)
        if current.filter(condition).limit(1).count() == 0:
            return
        self.replace(
            name,
            current.filter(f"NOT ({condition}) OR ({condition}) IS NULL"),
        )
