"""Physical data-layout operators: file assignment under a sort order,
min/max data-skipping effectiveness census, and best-fit-decreasing
file compaction planning.

No reference analog — the reference's btree indexes
(``creating-tables.sql`` S10) are its only layout lever. At 100 TB the
dominant scan-cost lever is FILE layout: which rows share a parquet
file decides which files a predicate can prune via footer min/max
stats. These operators make that decision measurable and plannable
*inside* the engine:

1. :func:`assign_files` — deterministic file ids under any sort order
   via the two-phase ``relational.global_rank`` (never a single-task
   global sort; RUNBOOK §3). The same operator expresses a linear
   (time-sorted) layout and a Morton/Z-order layout
   (``functions.scalar.zorder_key``) — the engine's write-side
   ``compact_zorder`` (``sources/catalog.py``) uses the identical key.
2. :func:`skipping_census` — given file-assigned rows and a box
   predicate, the files a min/max-pruning reader would actually open:
   the number every layout decision should be judged by.
3. :func:`bfd_bins` — generic best-fit-decreasing bin packing of
   (id, size) items under a capacity, the small-file compaction
   planner (Delta OPTIMIZE / Iceberg rewrite_data_files plan step).
   Same distribution contract as ``corpus.pack_sequences_bfd``: BFD
   runs inside contiguous global-rank groups of ``group_size`` items
   — group-count-way parallel, one in-row integer fold per group,
   bit-replayable by any engine.

All arithmetic is int64 (ranks, bit-interleaves, integer division) so
every operator replays exactly in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import relational


def assign_files(
    df: DataFrame,
    order_keys: list[str],
    n_files: int,
    out_col: str = "file_id",
    bucket: Column | None = None,
) -> DataFrame:
    """Assign each row to one of ``n_files`` equal-row files under the
    total order ``order_keys`` — the row-to-file map a writer doing
    ``repartitionByRange(n).sortWithinPartitions`` would produce, but
    DETERMINISTIC (rank arithmetic, not sampled range boundaries) so
    an oracle replays it and a backfill reproduces it byte-for-byte.

    ``file_id = (rank - 1) div ceil(n_rows / n_files)`` with the rank
    from the two-phase :func:`relational.global_rank` (no single-task
    sort at any scale). ``order_keys`` must be a total order (append a
    unique id as tiebreak)."""
    ranked = relational.global_rank(df, order_keys, "_lrk", bucket=bucket)
    # count from the INPUT, not the ranked frame — same number, but the
    # count branch must not re-evaluate the whole two-phase rank subtree
    cnt = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(cnt))
        .withColumn(
            out_col,
            F.expr(f"(_lrk - 1) div ((_n + {int(n_files)} - 1) div {int(n_files)})"),
        )
        .drop("_lrk", "_n")
    )


def skipping_census(
    df: DataFrame,
    file_col: str,
    preds: list[tuple[str, Column, Column]],
    layout: str,
) -> DataFrame:
    """One-row min/max data-skipping census for a conjunctive box
    predicate over a file-assigned frame: how many files a
    footer-stats-pruning reader opens (a file survives pruning iff
    EVERY predicate's [lo, hi] overlaps the file's [min, max]), how
    many rows those files hold, and how many rows actually match.

    ``preds``: (value_col, lo, hi) triples; lo/hi may reference
    columns attached to ``df`` (e.g. bounds derived from a broadcast
    aggregate) — they must be constant per file. Returns
    (layout, n_files, files_scanned, rows_total, rows_scanned,
    rows_matched, scan_pct) with integer-percent ``scan_pct`` =
    ``100 * rows_scanned div rows_total``. One shuffle on
    ``file_col`` (file count is small by construction), then a
    broadcast-size final fold."""
    matched = F.lit(True)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("_rows"),
    ]
    for i, (c, lo, hi) in enumerate(preds):
        matched = matched & (F.col(c) >= lo) & (F.col(c) <= hi)
        aggs += [
            F.min(c).cast("long").alias(f"_min{i}"),
            F.max(c).cast("long").alias(f"_max{i}"),
            F.min(lo).cast("long").alias(f"_lo{i}"),
            F.min(hi).cast("long").alias(f"_hi{i}"),
        ]
    aggs.append(F.sum(matched.cast("long")).cast("long").alias("_matched"))
    stats = df.groupBy(file_col).agg(*aggs)
    scanned = F.lit(True)
    for i in range(len(preds)):
        scanned = (
            scanned
            & (F.col(f"_max{i}") >= F.col(f"_lo{i}"))
            & (F.col(f"_min{i}") <= F.col(f"_hi{i}"))
        )
    s = scanned.cast("long")
    return (
        stats.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(s).cast("long").alias("files_scanned"),
            F.sum("_rows").cast("long").alias("rows_total"),
            F.sum(s * F.col("_rows")).cast("long").alias("rows_scanned"),
            F.sum(s * F.col("_matched")).cast("long").alias("rows_matched"),
        )
        .withColumn("scan_pct", F.expr("(100 * rows_scanned) div rows_total"))
        .select(
            F.lit(layout).alias("layout"),
            "n_files",
            "files_scanned",
            "rows_total",
            "rows_scanned",
            "rows_matched",
            "scan_pct",
        )
    )


def bfd_bins(
    df: DataFrame,
    size_col: str,
    capacity: int | str,
    tiebreak: list[str],
    group_size: int = 128,
    bucket: Column | None = None,
) -> DataFrame:
    """Best-fit-decreasing bin packing of generic sized items — the
    compaction planner: merge small files into target-size files,
    largest first, each into the fullest bin it still fits
    (never above capacity), opening a new bin only when none fits.

    ``tiebreak``: columns that together with ``size_col`` form a total
    order over the items (e.g. the file's partition key columns). They
    ride INSIDE the fold's item structs and come back on the output —
    no surrogate id and no join-back against the ranked frame, which
    would re-evaluate the whole two-phase rank subtree once per branch.

    ``capacity`` is either a literal int or the NAME of a column on
    ``df`` that is constant across all rows (e.g. a data-derived
    target like ``2 * max(file_bytes)`` attached by broadcast) — a
    data-derived capacity keeps the planner scale-free, engaging the
    same way at any SF.

    Distribution contract (same as ``corpus.pack_sequences_bfd``,
    which specializes this fold to token chunks): items are ranked
    (size desc, *tiebreak) by the two-phase ``relational.global_rank``
    (numeric derived-width bucketing on the size by default; pass
    ``bucket`` to refine heavy-tie size distributions, e.g. a census
    where every file is exactly the rollover size), then BFD runs
    INSIDE contiguous groups of ``group_size`` items as one in-row
    integer fold — a 10^8-file table is group-count-way parallel,
    O(group_size²) work per group, and because ranks are globally
    size-sorted each group's size profile is near-uniform, so quality
    loss vs one global BFD is at most ~one bin per group. An item
    larger than capacity gets a bin of its own (BFD's natural
    behavior: nothing fits, open new).

    Returns (*tiebreak, size_col, bin_id) with
    ``bin_id = group * group_size + local_bin - 1`` (bins per group
    never exceed group_size), deterministic on any cluster layout."""
    dtypes = dict(df.dtypes)
    base = df.withColumn("_negsz", (-F.col(size_col)).cast("long"))
    ranked = relational.global_rank(base, ["_negsz", *tiebreak], "_rk", bucket=bucket)
    grp = ranked.withColumn(
        "_grp", F.expr(f"(_rk - 1) div {int(group_size)}").cast("long")
    )
    cap_aggs = [
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_rk").alias("rk"),
                    F.col(size_col).cast("long").alias("sz"),
                    *[F.col(c) for c in tiebreak],
                )
            )
        ).alias("_items")
    ]
    if isinstance(capacity, str):
        cap_aggs.append(F.min(capacity).cast("long").alias("_cap"))
        cap_token = "_cap"
    else:
        cap_token = str(int(capacity))
    items = grp.groupBy("_grp").agg(*cap_aggs)
    out_fields = ", ".join(
        ["sz: bigint"] + [f"`{c}`: {dtypes[c]}" for c in tiebreak] + ["bin: bigint"]
    )
    carry = ", ".join(["it.sz as sz"] + [f"it.`{c}` as `{c}`" for c in tiebreak])
    fold = f"""
      aggregate(
        _items,
        struct(
          cast(array() as array<bigint>) as loads,
          cast(array() as array<struct<{out_fields}>>) as outs),
        (acc, it) -> element_at(transform(array(
            try_element_at(array_sort(CASE WHEN size(acc.loads) = 0
                THEN cast(array() as array<struct<negnl: bigint, i: int>>)
                ELSE filter(transform(sequence(1, size(acc.loads)),
                       i -> struct(-(element_at(acc.loads, i) + it.sz) as negnl, i as i)),
                     c -> -c.negnl <= {cap_token})
              END), 1)),
          bst -> CASE WHEN bst IS NULL THEN struct(
              acc.loads || array(it.sz) as loads,
              acc.outs || array(struct({carry},
                                       cast(size(acc.loads) + 1 as bigint) as bin)) as outs)
            ELSE struct(
              transform(sequence(1, size(acc.loads)),
                i -> if(i = bst.i, element_at(acc.loads, i) + it.sz,
                        element_at(acc.loads, i))) as loads,
              acc.outs || array(struct({carry},
                                       cast(bst.i as bigint) as bin)) as outs)
            END), 1),
        acc -> acc.outs)
    """
    return (
        items.select("_grp", F.explode(F.expr(fold)).alias("_o"))
        .select(
            *[F.col(f"_o.`{c}`").alias(c) for c in tiebreak],
            F.col("_o.sz").alias(size_col),
            (F.col("_grp") * F.lit(int(group_size)) + F.col("_o.bin") - 1).alias(
                "bin_id"
            ),
        )
    )


# Deterministic bloom hash family for the point-lookup skipping census:
# h_i(x) = ((x mod P) * A_i + B_i) mod P mod m — pure int64 modular
# arithmetic so the oracle replays bit positions exactly (the same
# constant-family discipline as the CMS sketch).
BLOOM_P = 2_147_483_647
BLOOM_A = [31, 131, 1031]
BLOOM_B = [7, 101, 1009]
BLOOM_K = len(BLOOM_A)


def _bloom_bit(col: Column, i: int, m_bits: int) -> Column:
    return (
        F.pmod((F.pmod(col, F.lit(BLOOM_P)) * BLOOM_A[i] + BLOOM_B[i]), F.lit(BLOOM_P))
        % F.lit(int(m_bits))
    )


def bloom_point_census(
    df: DataFrame,
    file_col: str,
    key_col: str,
    probes: DataFrame,
    m_bits: int,
    layout: str,
) -> DataFrame:
    """Per-file BLOOM data-skipping census for a point-lookup workload
    — the pruning mechanism min/max footer stats structurally cannot
    provide on a high-cardinality column the layout is NOT sorted by
    (every file's [min, max] spans the whole key range, so a range
    reader opens everything; a per-file bloom opens only the files
    whose filter matches). This is exactly Parquet's column bloom
    filter / Delta's deletion-vector-adjacent file-skipping metadata,
    measured: one row per probe key with the files a min/max reader,
    a bloom reader, and ground truth each open.

    Mechanics, all file-metadata scale: (1) the per-file bit table —
    distinct (file, bit) over K deterministic hashes of the distinct
    (file, key) pairs — is at most ``n_files × m_bits`` rows, the
    size class engines keep in footers; (2) a probe opens a file iff
    ALL K of its bits are present (groupBy count == K over the
    bit-table join — probes are a broadcast-size frame); (3) min/max
    openings come from a bucketed interval join (bucket width = the
    widest file span, so file stats explode to <= 2 buckets each and a
    probe hits one bucket — at most ~2×n_files + n_probes rows, NEVER
    a probes×files product, at any file count); true-containment
    counts come from one file-grain aggregate and one probe×key
    semi-count. No corpus-scale shuffle other than the two distincts
    that build the metadata, which a real writer pays once at write
    time.

    Output per probe: (layout, probe_key, present, files_with_key,
    files_opened_minmax, files_opened_bloom, bloom_fp_files) —
    ``bloom_fp_files`` = bloom-opened files not truly containing the
    key; saturation (distinct keys per file approaching ``m_bits``)
    shows up as fp growth, which is the sizing signal a table owner
    reads. ``m_bits`` must be sized ~10x the expected distinct keys
    per file (the standard 1%-fp bloom rule)."""
    keys = df.select(F.col(file_col).alias("f"), F.col(key_col).alias("k")).distinct()
    # deferred barrier: the bit explode and the truth count both read it
    keys = keys.localCheckpoint(eager=False)
    bits = (
        keys.select(
            "f",
            F.explode(
                F.array(*[_bloom_bit(F.col("k"), i, m_bits) for i in range(BLOOM_K)])
            ).alias("bit"),
        )
        .distinct()
    )
    stats = df.groupBy(F.col(file_col).alias("f")).agg(
        F.min(key_col).cast("long").alias("_min"), F.max(key_col).cast("long").alias("_max")
    ).localCheckpoint(eager=False)  # two consumers: width derivation + bucket explode
    p = probes.select(F.col("probe_key").cast("long").alias("q"))
    pbits = p.select(
        "q",
        F.posexplode(
            F.array(*[_bloom_bit(F.col("q"), i, m_bits) for i in range(BLOOM_K)])
        ).alias("_i", "bit"),
    )
    opened_bloom = (
        pbits.join(bits, on="bit")
        .select("q", "f", "_i")
        .distinct()
        .groupBy("q", "f")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == BLOOM_K)
        .groupBy("q")
        .agg(F.count(F.lit(1)).cast("long").alias("files_opened_bloom"))
    )
    # min/max openings via a BUCKETED interval join, never probes×files
    # (VERDICT r14 #8: the old crossJoin was file-count-bounded at the
    # test scale but is a probes×files blowup at real lakehouse file
    # counts, ~10^6 files). Bucket width = the WIDEST file span, so
    # every file's [min,max] interval overlaps at most TWO buckets
    # (explode bound: 2×n_files rows) and a probe joins exactly its own
    # bucket. Degenerate case: one file spanning the whole key range
    # collapses to one bucket — which is also exactly when min/max
    # skipping itself cannot skip, so the join SHOULD touch every file.
    gstats = stats.agg(
        F.min("_min").alias("_gmin"),
        F.greatest(
            F.lit(1).cast("long"), F.max(F.col("_max") - F.col("_min") + 1)
        ).alias("_w"),
    )
    fbuckets = (
        stats.crossJoin(F.broadcast(gstats))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor((F.col("_min") - F.col("_gmin")) / F.col("_w")),
                    F.floor((F.col("_max") - F.col("_gmin")) / F.col("_w")),
                )
            ),
        )
        .select("f", "_min", "_max", "_bkt")
    )
    pbuckets = (
        p.crossJoin(F.broadcast(gstats))
        .withColumn("_bkt", F.floor((F.col("q") - F.col("_gmin")) / F.col("_w")))
        .select("q", "_bkt")
    )
    opened_minmax = (
        pbuckets.join(fbuckets, on="_bkt")
        .filter((F.col("q") >= F.col("_min")) & (F.col("q") <= F.col("_max")))
        .groupBy("q")
        .agg(F.count(F.lit(1)).cast("long").alias("files_opened_minmax"))
    )
    truth = (
        p.join(keys, on=F.col("q") == F.col("k"))
        .groupBy("q")
        .agg(F.count(F.lit(1)).cast("long").alias("files_with_key"))
    )
    z = F.lit(0).cast("long")
    return (
        p.join(truth, on="q", how="left")
        .join(opened_minmax, on="q", how="left")
        .join(opened_bloom, on="q", how="left")
        .select(
            F.lit(layout).alias("layout"),
            F.col("q").alias("probe_key"),
            (F.coalesce("files_with_key", z) > 0).alias("present"),
            F.coalesce("files_with_key", z).alias("files_with_key"),
            F.coalesce("files_opened_minmax", z).alias("files_opened_minmax"),
            F.coalesce("files_opened_bloom", z).alias("files_opened_bloom"),
            (
                F.coalesce("files_opened_bloom", z) - F.coalesce("files_with_key", z)
            ).alias("bloom_fp_files"),
        )
    )
