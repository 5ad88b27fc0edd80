"""Physical-layout CORRECTNESS queries: Z-order data-skipping census
and best-fit-decreasing small-file compaction planning (see
operators/layout.py for the scale design notes; no reference analog —
the reference's only layout lever is its btree indexes, S10).

Both oracles replay the FULL pipeline in DuckDB — the Morton key is
the identical bit-interleave expression (``scalar.zorder_key_sql``),
file assignment is rank arithmetic, and the BFD fold is a recursive
CTE stepping one file at a time — so the differential checks layout
decisions end to end, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalar
from ..operators import layout

# ---------------------------------------------------------------------------
# Z-order vs linear layout: min/max data-skipping census

ZORDER_N_FILES = 64
ZORDER_BITS = 16
ZORDER_EPOCH = "1995-01-01"  # orders date floor at every SF
ZORDER_DAY_LO = 400
ZORDER_DAY_HI = 800


def _orders_probe(t: dict[str, DataFrame]) -> tuple[DataFrame, list]:
    """Shared probe frame + box predicate for the two layout queries
    (one definition — the census/advisor pair must judge the SAME box
    on the SAME projected columns or their comparison is meaningless):
    orders projected to (o_orderkey, ck, day_n) with the custkey box
    bounds attached from a broadcast one-row aggregate."""
    o = t["orders"].select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit(ZORDER_EPOCH)))
        .cast("long")
        .alias("day_n"),
    )
    bounds = o.agg(F.max("ck").alias("_ckmax"))
    o2 = (
        o.crossJoin(F.broadcast(bounds))
        .withColumn("_ck_lo", F.expr("_ckmax div 8"))
        .withColumn("_ck_hi", F.expr("_ckmax div 4"))
        .drop("_ckmax")
    )
    preds = [
        ("ck", F.col("_ck_lo"), F.col("_ck_hi")),
        ("day_n", F.lit(ZORDER_DAY_LO).cast("long"), F.lit(ZORDER_DAY_HI).cast("long")),
    ]
    return o2, preds


def zorder_skipping_census(t: dict[str, DataFrame]) -> DataFrame:
    """THE layout decision, measured: write ``orders`` as
    ``ZORDER_N_FILES`` files either linearly (time-sorted — the
    layout an append-only pipeline gets for free) or Z-ordered on
    (custkey, order day), then count the files a footer min/max
    pruning reader opens for a box predicate on BOTH columns
    (custkey in [max/8, max/4], day in [400, 800]).

    The Morton interleave makes per-file min/max selective on EVERY
    participating column, so the z layout scans a small neighborhood
    of the box while the linear layout must open every file in the
    day range regardless of custkey. One row per layout:
    (layout, n_files, files_scanned, rows_total, rows_scanned,
    rows_matched, scan_pct) — all int64 rank/bit arithmetic, replayed
    exactly by the oracle.

    At 100×: file assignment is the two-phase global rank (no
    single-task sort), the census shuffles once on file_id (file
    count, not row count), and the custkey box bounds derive from a
    broadcast one-row aggregate. Columns wider than ``ZORDER_BITS``
    bits should be rank-compressed before interleaving (the mask
    otherwise aliases distant values into the same cell — hurts
    clustering, never correctness)."""
    o2, preds = _orders_probe(t)
    z = scalar.zorder_key([F.col("ck"), F.col("day_n")], bits=ZORDER_BITS)
    zdf = layout.assign_files(
        o2.withColumn("_z", z), ["_z", "o_orderkey"], ZORDER_N_FILES
    )
    ldf = layout.assign_files(o2, ["day_n", "o_orderkey"], ZORDER_N_FILES)
    zc = layout.skipping_census(zdf, "file_id", preds, "zorder")
    lc = layout.skipping_census(ldf, "file_id", preds, "linear")
    return zc.unionByName(lc).orderBy("layout")


def _zorder_census_oracle() -> str:
    zexpr = scalar.zorder_key_sql(["ck", "day_n"], bits=ZORDER_BITS)
    n = ZORDER_N_FILES

    def census(src: str, order_by: str, name: str) -> str:
        return f"""
SELECT '{name}' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sc) AS BIGINT) AS files_scanned,
       CAST(SUM(rows_) AS BIGINT) AS rows_total,
       CAST(SUM(sc * rows_) AS BIGINT) AS rows_scanned,
       CAST(SUM(sc * mt) AS BIGINT) AS rows_matched,
       CAST((100 * SUM(sc * rows_)) // SUM(rows_) AS BIGINT) AS scan_pct
FROM (
  SELECT file_id, COUNT(*) AS rows_,
         CASE WHEN MAX(ck) >= MIN(ck_lo) AND MIN(ck) <= MIN(ck_hi)
               AND MAX(day_n) >= {ZORDER_DAY_LO} AND MIN(day_n) <= {ZORDER_DAY_HI}
              THEN 1 ELSE 0 END AS sc,
         SUM(CASE WHEN ck BETWEEN ck_lo AND ck_hi
                   AND day_n BETWEEN {ZORDER_DAY_LO} AND {ZORDER_DAY_HI}
                  THEN 1 ELSE 0 END) AS mt
  FROM (
    SELECT s.*, (ROW_NUMBER() OVER (ORDER BY {order_by}) - 1)
                  // ((b.n_rows + {n} - 1) // {n}) AS file_id
    FROM {src} s CROSS JOIN b
  ) GROUP BY file_id
)"""

    return f"""
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(date_diff('day', DATE '{ZORDER_EPOCH}', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_n
  FROM orders
),
b AS (SELECT MAX(ck) // 8 AS g_ck_lo, MAX(ck) // 4 AS g_ck_hi, COUNT(*) AS n_rows FROM o),
ob AS (
  SELECT o.*, b.g_ck_lo AS ck_lo, b.g_ck_hi AS ck_hi, {zexpr} AS zk
  FROM o CROSS JOIN b
)
SELECT * FROM (
{census("ob", "zk, o_orderkey", "zorder")}
UNION ALL
{census("ob", "day_n, o_orderkey", "linear")}
) ORDER BY layout
"""


ZORDER_SKIPPING_CENSUS_ORACLE = _zorder_census_oracle()


# ---------------------------------------------------------------------------
# Small-file compaction plan (best-fit-decreasing to a derived target)

COMPACT_FILE_BUCKETS = 4
COMPACT_GROUP = 128


def compaction_plan(t: dict[str, DataFrame]) -> DataFrame:
    """Small-file compaction planning (Delta OPTIMIZE / Iceberg
    rewrite_data_files, as a plan you can read): the per-(source,
    lang, id-bucket) file census of ``documents`` is BFD-packed into
    merge bins of capacity ``2 × max(file_bytes)`` — a DATA-DERIVED
    target, so the planner engages identically at any SF instead of
    degenerating when files outgrow a fixed constant.

    Returns the full witness — every file with its assigned
    ``bin_id`` — not just bin totals, so the differential checks the
    exact greedy placement. The file's OWN key columns (source, lang,
    bkt) are the BFD tiebreak and ride inside the fold — no surrogate
    file id and no join-back against the ranked frame (a join-back
    re-evaluates the whole two-phase rank subtree once per branch;
    the oracle keeps its fid purely as SQL bookkeeping — ROW_NUMBER
    over (file_bytes, source, lang, bkt) makes (file_bytes DESC, fid)
    the same total order as (file_bytes DESC, source, lang, bkt))."""
    files = (
        t["documents"]
        .groupBy(
            "source",
            "lang",
            F.pmod(F.col("doc_id"), F.lit(COMPACT_FILE_BUCKETS))
            .cast("long")
            .alias("bkt"),
        )
        .agg(F.sum("n_chars").cast("long").alias("file_bytes"))
    )
    cap = files.agg((F.lit(2) * F.max("file_bytes")).cast("long").alias("_capc"))
    packed = layout.bfd_bins(
        files.crossJoin(F.broadcast(cap)),
        size_col="file_bytes",
        capacity="_capc",
        tiebreak=["source", "lang", "bkt"],
        group_size=COMPACT_GROUP,
    )
    return packed.select("source", "lang", "bkt", "file_bytes", "bin_id").orderBy(
        "source", "lang", "bkt"
    )


def _compaction_plan_oracle() -> str:
    g = COMPACT_GROUP
    return f"""
WITH RECURSIVE files AS (
  SELECT source, lang, CAST(doc_id % {COMPACT_FILE_BUCKETS} AS BIGINT) AS bkt,
         CAST(SUM(n_chars) AS BIGINT) AS file_bytes
  FROM documents GROUP BY source, lang, doc_id % {COMPACT_FILE_BUCKETS}
),
cap AS (SELECT 2 * MAX(file_bytes) AS c FROM files),
rid AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY file_bytes, source, lang, bkt) AS fid
  FROM files
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY file_bytes DESC, fid) AS rnk FROM rid
),
gi AS MATERIALIZED (
  SELECT CAST((rnk - 1) // {g} AS BIGINT) AS grp,
         list(struct_pack(rnk := rnk, id := fid, sz := file_bytes) ORDER BY rnk) AS items
  FROM rk GROUP BY 1
),
bfd AS (
  SELECT grp, 0 AS i, []::BIGINT[] AS loads,
         []::STRUCT(id BIGINT, sz BIGINT, bin BIGINT)[] AS outs
  FROM gi
  UNION ALL
  SELECT grp, i + 1,
    CASE WHEN bsti IS NULL
      THEN loads || [itsz]
      ELSE list_transform(generate_series(1, len(loads)),
             x -> CASE WHEN x = bsti THEN loads[x] + itsz ELSE loads[x] END)
    END,
    outs || [struct_pack(id := itid, sz := itsz,
                         bin := coalesce(bsti, len(loads) + 1))]
  FROM (
    SELECT b.grp, b.i, b.loads, b.outs,
           g.items[b.i + 1].id AS itid,
           g.items[b.i + 1].sz AS itsz,
           list_sort(list_filter(list_transform(generate_series(1, len(b.loads)),
               x -> struct_pack(negnl := -(b.loads[x] + g.items[b.i + 1].sz),
                                i := CAST(x AS BIGINT))),
             cc -> -cc.negnl <= cap.c))[1].i AS bsti
    FROM bfd b JOIN gi g USING (grp) CROSS JOIN cap WHERE b.i < len(g.items)
  )
),
fin AS (
  SELECT b.grp, unnest(b.outs) AS o
  FROM bfd b JOIN gi g USING (grp) WHERE b.i = len(g.items)
)
SELECT r.source, r.lang, r.bkt, r.file_bytes,
       CAST(grp * {g} + o.bin - 1 AS BIGINT) AS bin_id
FROM fin JOIN rid r ON o.id = r.fid
ORDER BY source, lang, bkt
"""


COMPACTION_PLAN_ORACLE = _compaction_plan_oracle()


# ---------------------------------------------------------------------------
# Layout advisor: rank candidate sort orders by measured skipping

ADVISOR_ZORDER_COARSE_BITS = 8


def layout_advisor_report(t: dict[str, DataFrame]) -> DataFrame:
    """The sort-order DECISION, made by measurement instead of folklore:
    four candidate layouts for ``orders`` — the two single-column
    linear orders, the 16-bit Morton interleave, and a deliberately
    coarse 8-bit interleave (the classic over-quantization mistake:
    masking a key wider than the bit budget aliases distant values
    into the same cell) — each written as ``ZORDER_N_FILES`` files and
    scored by the SAME box-predicate skipping census as
    :func:`zorder_skipping_census`. Output: one row per candidate
    with its census and its rank by files scanned (ties break by
    name), ``rank 1`` = the layout a table owner should declare.

    Scale: each candidate costs one two-phase rank + one file-grain
    aggregate over the same cached scan; candidates are independent
    branches of one plan, so a 100-TB advisor run is exactly four
    layout passes — embarrassingly parallel, no cross-candidate
    shuffle. The final rank is a window over four rows."""
    o2, preds = _orders_probe(t)
    zf = scalar.zorder_key([F.col("ck"), F.col("day_n")], bits=ZORDER_BITS)
    zc = scalar.zorder_key(
        [F.col("ck"), F.col("day_n")], bits=ADVISOR_ZORDER_COARSE_BITS
    )
    candidates = {
        "linear_day": o2.withColumn("_o", F.col("day_n")),
        "linear_custkey": o2.withColumn("_o", F.col("ck")),
        "zorder16_ck_day": o2.withColumn("_o", zf),
        "zorder8_ck_day": o2.withColumn("_o", zc),
    }
    censuses = [
        layout.skipping_census(
            layout.assign_files(df, ["_o", "o_orderkey"], ZORDER_N_FILES),
            "file_id",
            preds,
            name,
        )
        for name, df in candidates.items()
    ]
    u = censuses[0]
    for c in censuses[1:]:
        u = u.unionByName(c)
    from pyspark.sql.window import Window

    w = Window.orderBy("files_scanned", "layout")  # four rows — trivially tiny
    return (
        u.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "layout",
            "n_files",
            "files_scanned",
            "rows_scanned",
            "rows_matched",
            "scan_pct",
        )
        .orderBy("rank")
    )


def _layout_advisor_oracle() -> str:
    zf = scalar.zorder_key_sql(["ck", "day_n"], bits=ZORDER_BITS)
    zc = scalar.zorder_key_sql(
        ["ck", "day_n"], bits=ADVISOR_ZORDER_COARSE_BITS
    )
    n = ZORDER_N_FILES

    def census(order_by: str, name: str) -> str:
        return f"""
SELECT '{name}' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(sc) AS BIGINT) AS files_scanned,
       CAST(SUM(sc * rows_) AS BIGINT) AS rows_scanned,
       CAST(SUM(sc * mt) AS BIGINT) AS rows_matched,
       CAST((100 * SUM(sc * rows_)) // SUM(rows_) AS BIGINT) AS scan_pct
FROM (
  SELECT file_id, COUNT(*) AS rows_,
         CASE WHEN MAX(ck) >= MIN(ck_lo) AND MIN(ck) <= MIN(ck_hi)
               AND MAX(day_n) >= {ZORDER_DAY_LO} AND MIN(day_n) <= {ZORDER_DAY_HI}
              THEN 1 ELSE 0 END AS sc,
         SUM(CASE WHEN ck BETWEEN ck_lo AND ck_hi
                   AND day_n BETWEEN {ZORDER_DAY_LO} AND {ZORDER_DAY_HI}
                  THEN 1 ELSE 0 END) AS mt
  FROM (
    SELECT s.*, (ROW_NUMBER() OVER (ORDER BY {order_by}) - 1)
                  // ((b.n_rows + {n} - 1) // {n}) AS file_id
    FROM ob s CROSS JOIN b
  ) GROUP BY file_id
)"""

    return f"""
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(date_diff('day', DATE '{ZORDER_EPOCH}', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_n
  FROM orders
),
b AS (SELECT MAX(ck) // 8 AS g_ck_lo, MAX(ck) // 4 AS g_ck_hi, COUNT(*) AS n_rows FROM o),
ob AS (
  SELECT o.*, b.g_ck_lo AS ck_lo, b.g_ck_hi AS ck_hi
  FROM o CROSS JOIN b
),
cen AS (
{census("day_n, o_orderkey", "linear_day")}
UNION ALL
{census("ck, o_orderkey", "linear_custkey")}
UNION ALL
{census(zf + ", o_orderkey", "zorder16_ck_day")}
UNION ALL
{census(zc + ", o_orderkey", "zorder8_ck_day")}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY files_scanned, layout) AS BIGINT) AS rank,
       layout, n_files, files_scanned, rows_scanned, rows_matched, scan_pct
FROM cen ORDER BY rank
"""


LAYOUT_ADVISOR_REPORT_ORACLE = _layout_advisor_oracle()


# ---------------------------------------------------------------------------
# Bloom point-lookup skipping census (round 13 — the pruning mechanism
# min/max footer stats cannot provide; operators/layout.py)

BLOOM_M_BITS = 16384  # ~10x the per-file distinct custkeys at sf0.1
BLOOM_PRESENT_STEP = 97  # present-candidate probes: ck = 97*j, j=1..8
BLOOM_N_PRESENT = 8
BLOOM_N_ABSENT = 4  # guaranteed-absent probes: ckmax + 1..4


def _bloom_probes(o2) -> DataFrame:
    """Deterministic probe frame — multiples of BLOOM_PRESENT_STEP
    (dense TPC-H custkeys make most of them real, and `present`
    reports the truth per probe) plus guaranteed-absent keys past the
    max (pure false-positive measurement). Derived from one broadcast
    aggregate, no ordering anywhere."""
    spark = o2.sparkSession
    mx = o2.agg(F.max("ck").alias("_mx"))
    js = spark.range(1, BLOOM_N_PRESENT + 1).select(
        (F.col("id") * BLOOM_PRESENT_STEP).alias("probe_key")
    )
    ab = (
        spark.range(1, BLOOM_N_ABSENT + 1)
        .crossJoin(F.broadcast(mx))
        .select((F.col("_mx") + F.col("id")).alias("probe_key"))
    )
    return js.unionByName(ab)


def bloom_skipping_census(t: dict[str, DataFrame]) -> DataFrame:
    """Point-lookup file skipping, measured across BOTH pruning
    mechanisms and BOTH layouts: per probe custkey, the files a
    min/max reader and a per-file-bloom reader each open on (a) the
    free time-sorted layout — where every file's custkey [min, max]
    spans the whole range, so min/max opens everything and only the
    bloom prunes — and (b) the custkey-sorted layout, where min/max
    is already selective and the bloom adds little. This is the
    companion decision to `zorder_skipping_census`: z-order serves
    range boxes, blooms serve point lookups on columns the sort order
    cannot cover; a table owner reads the two censuses together.
    All bloom arithmetic is the deterministic mod-P hash family
    (`layout.BLOOM_A/B`), replayed bit-exactly by the oracle."""
    o2, _ = _orders_probe(t)
    o2 = o2.select("o_orderkey", "ck", "day_n").localCheckpoint(eager=False)
    probes = _bloom_probes(o2).localCheckpoint(eager=False)
    tdf = layout.assign_files(o2, ["day_n", "o_orderkey"], ZORDER_N_FILES)
    cdf = layout.assign_files(o2, ["ck", "o_orderkey"], ZORDER_N_FILES)
    tc = layout.bloom_point_census(
        tdf, "file_id", "ck", probes, BLOOM_M_BITS, "time_sorted"
    )
    cc = layout.bloom_point_census(
        cdf, "file_id", "ck", probes, BLOOM_M_BITS, "custkey_sorted"
    )
    return tc.unionByName(cc).orderBy("layout", "probe_key")


def _bloom_census_oracle() -> str:
    n = ZORDER_N_FILES
    m = BLOOM_M_BITS
    from ..operators.layout import BLOOM_A, BLOOM_B, BLOOM_K, BLOOM_P

    # sign-safe modulus (ADVICE r13): Spark's pmod is non-negative for
    # any operand sign while DuckDB '%' follows the dividend's sign —
    # (x % P + P) % P equals pmod for ALL keys, and reduces to x % P on
    # the non-negative keys of this corpus (no hash change here; the
    # pair is divergence-proof for a future negative-keyed probe set)
    hashes_k = ", ".join(
        f"(((ck % {BLOOM_P} + {BLOOM_P}) % {BLOOM_P}) * {BLOOM_A[i]} + {BLOOM_B[i]}) % {BLOOM_P} % {m}"
        for i in range(BLOOM_K)
    )
    hash_rows = ", ".join(
        f"({i}, {BLOOM_A[i]}, {BLOOM_B[i]})" for i in range(BLOOM_K)
    )

    def one(order_by: str, name: str) -> str:
        return f"""
SELECT '{name}' AS layout, p.q AS probe_key,
       COALESCE(t.nf, 0) > 0 AS present,
       COALESCE(t.nf, 0) AS files_with_key,
       COALESCE(mm.nf, 0) AS files_opened_minmax,
       COALESCE(bl.nf, 0) AS files_opened_bloom,
       COALESCE(bl.nf, 0) - COALESCE(t.nf, 0) AS bloom_fp_files
FROM probes p
LEFT JOIN (
  SELECT q, CAST(COUNT(*) AS BIGINT) AS nf
  FROM probes JOIN (SELECT DISTINCT f, ck FROM (
    SELECT ck, (ROW_NUMBER() OVER (ORDER BY {order_by}) - 1)
               // ((b.n_rows + {n} - 1) // {n}) AS f
    FROM o CROSS JOIN b)) ON ck = q GROUP BY q
) t ON t.q = p.q
LEFT JOIN (
  SELECT q, CAST(COUNT(*) AS BIGINT) AS nf
  FROM probes JOIN (
    SELECT f, MIN(ck) AS mn, MAX(ck) AS mx FROM (
      SELECT ck, (ROW_NUMBER() OVER (ORDER BY {order_by}) - 1)
                 // ((b.n_rows + {n} - 1) // {n}) AS f
      FROM o CROSS JOIN b) GROUP BY f
  ) ON q BETWEEN mn AND mx GROUP BY q
) mm ON mm.q = p.q
LEFT JOIN (
  SELECT q, CAST(COUNT(*) AS BIGINT) AS nf FROM (
    SELECT pb.q, fb.f
    FROM (SELECT q, h.i,
                 (((q % {BLOOM_P} + {BLOOM_P}) % {BLOOM_P}) * h.a + h.bb) % {BLOOM_P} % {m} AS bit
          FROM probes, (VALUES {hash_rows}) AS h(i, a, bb)) pb
    JOIN (SELECT DISTINCT f, bit FROM (
      SELECT f, unnest([{hashes_k}]) AS bit FROM (SELECT DISTINCT f, ck FROM (
        SELECT ck, (ROW_NUMBER() OVER (ORDER BY {order_by}) - 1)
                   // ((b.n_rows + {n} - 1) // {n}) AS f
        FROM o CROSS JOIN b)))) fb
    ON fb.bit = pb.bit
    GROUP BY pb.q, fb.f HAVING COUNT(DISTINCT pb.i) = {BLOOM_K}
  ) GROUP BY q
) bl ON bl.q = p.q"""

    return f"""
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(date_diff('day', DATE '{ZORDER_EPOCH}', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_n
  FROM orders
),
b AS (SELECT COUNT(*) AS n_rows, MAX(ck) AS ckmax FROM o),
probes AS (
  SELECT CAST({BLOOM_PRESENT_STEP} * j AS BIGINT) AS q
  FROM generate_series(1, {BLOOM_N_PRESENT}) AS t(j)
  UNION ALL
  SELECT ckmax + j FROM b, generate_series(1, {BLOOM_N_ABSENT}) AS t(j)
)
SELECT * FROM (
{one("day_n, o_orderkey", "time_sorted")}
UNION ALL
{one("ck, o_orderkey", "custkey_sorted")}
)
ORDER BY layout, probe_key
"""


BLOOM_SKIPPING_CENSUS_ORACLE = _bloom_census_oracle()
