"""Physical-layout operators (operators/layout.py) and the exact
integer square root (functions/scalar.py:isqrt) behind α=0.5
temperature mixing.

Covers what the sf0.01 oracle differential cannot: hand-computed
skipping censuses, a sequential-reference BFD differential, partition
invariance, the RUNBOOK §3 plan-shape bans, and isqrt exactness at
adversarial magnitudes.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_warehouse_implementation_spark.functions import scalar
from data_warehouse_implementation_spark.operators import corpus, layout


def test_isqrt_exact_at_adversarial_magnitudes(spark):
    """floor(sqrt(n)) must be EXACT — including k²-1 / k² / k²+1
    straddles where the double rounds to the wrong side — for every
    magnitude up to the documented 2^52 bound."""
    ks = [0, 1, 2, 3, 10, 255, 256, 65537, 10**6, 2**26 - 1, 2**26]
    ns = sorted(
        {max(0, k * k + d) for k in ks for d in (-1, 0, 1)} | {5, 99, 2**52 - 1}
    )
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {
        r.n: r.r
        for r in df.select("n", scalar.isqrt("n").alias("r")).collect()
    }
    for n in ns:
        assert got[n] == math.isqrt(n), (n, got[n], math.isqrt(n))


def _ref_bfd(items, capacity, group_size):
    """Sequential reference: rank (size desc, tiebreak), BFD within
    contiguous rank groups — best-fit = fullest bin that still fits."""
    ranked = sorted(items, key=lambda it: (-it[0], it[1:]))
    out = {}
    for g in range(0, len(ranked), group_size):
        loads: list[int] = []
        for sz, *tb in ranked[g : g + group_size]:
            fits = [
                (-(loads[i] + sz), i)
                for i in range(len(loads))
                if loads[i] + sz <= capacity
            ]
            if fits:
                _, i = min(fits)
                loads[i] += sz
            else:
                loads.append(sz)
                i = len(loads) - 1
            out[tuple(tb)] = (g // group_size) * group_size + i
    return out


def test_bfd_bins_matches_sequential_reference(spark):
    """The in-row SQL fold must place every item exactly where the
    sequential greedy would — multiple groups, ties, oversize items."""
    import random

    rng = random.Random(7)
    items = [(rng.choice([3, 5, 8, 8, 13, 21, 40, 120]), i) for i in range(90)]
    df = spark.createDataFrame(
        [(sz, i) for sz, i in items], "sz long, item long"
    ).repartition(7)
    got = {
        (r.item,): r.bin_id
        for r in layout.bfd_bins(
            df, size_col="sz", capacity=100, tiebreak=["item"], group_size=16
        ).collect()
    }
    assert got == _ref_bfd(items, capacity=100, group_size=16)


def test_bfd_bins_capacity_and_partition_contract(spark):
    """Every multi-item bin's load <= capacity (an OVERSIZE item gets a
    singleton bin — BFD's nothing-fits case), the output is an exact
    partition of the input, and the placement is identical under any
    input partitioning."""
    rows = [(7 * i % 50 + 1 if i != 13 else 999, i) for i in range(60)]
    df = spark.createDataFrame(rows, "sz long, item long")
    out = layout.bfd_bins(
        df, size_col="sz", capacity=64, tiebreak=["item"], group_size=32
    )
    got = out.collect()
    assert sorted((r.item, r.sz) for r in got) == sorted(
        (i, sz) for sz, i in rows
    )
    loads: dict[int, list[int]] = {}
    for r in got:
        loads.setdefault(r.bin_id, []).append(r.sz)
    for b, szs in loads.items():
        assert sum(szs) <= 64 or len(szs) == 1, (b, szs)
    assert any(sum(szs) > 64 for szs in loads.values())  # 999 engaged
    again = {
        r.item: r.bin_id
        for r in layout.bfd_bins(
            df.repartition(11),
            size_col="sz",
            capacity=64,
            tiebreak=["item"],
            group_size=32,
        ).collect()
    }
    assert again == {r.item: r.bin_id for r in got}


def test_bfd_bins_column_capacity_and_string_tiebreak(spark):
    """capacity-as-column (the data-derived target) and a non-numeric
    tiebreak column must both ride the fold unchanged."""
    rows = [(10, "b", 1), (10, "a", 2), (4, "c", 3), (4, "a", 4)]
    df = spark.createDataFrame(rows, "sz long, k string, b long").withColumn(
        "cap", F.lit(14).cast("long")
    )
    got = {
        (r.k, r.b): (r.sz, r.bin_id)
        for r in layout.bfd_bins(
            df, size_col="sz", capacity="cap", tiebreak=["k", "b"], group_size=128
        ).collect()
    }
    # rank order: (10,a,2),(10,b,1),(4,a,4),(4,c,3); cap 14 =>
    # bins: [10+4(a,4)], [10+4(c,3)]
    assert got == {
        ("a", 2): (10, 0),
        ("b", 1): (10, 1),
        ("a", 4): (4, 0),
        ("c", 3): (4, 1),
    }


def test_assign_files_rank_arithmetic_contract(spark):
    """Files are contiguous rank blocks of ceil(n/n_files) rows: sizes
    match the contract and file boundaries respect the sort order."""
    rows = [((i * 37) % 101, i) for i in range(101)]
    df = spark.createDataFrame(rows, "k long, id long").repartition(9)
    got = layout.assign_files(df, ["k", "id"], 8).collect()
    assert len(got) == 101
    by_file: dict[int, list[int]] = {}
    for r in got:
        by_file.setdefault(r.file_id, []).append(r.k)
    assert sorted(by_file) == list(range(8))
    sizes = [len(by_file[f]) for f in range(8)]
    assert sizes == [13] * 7 + [10]  # ceil(101/8)=13, remainder last
    for f in range(7):
        assert max(by_file[f]) <= min(by_file[f + 1])


def test_skipping_census_hand_computed(spark):
    """Crafted 3-file frame: file min/max straddles decide scanned;
    row-level predicate decides matched."""
    rows = [
        # file 0: k in [0, 9] — overlaps box [5, 14], 2 rows match
        (0, 0), (0, 5), (0, 9),
        # file 1: k in [20, 30] — disjoint from the box, pruned
        (1, 20), (1, 30),
        # file 2: k in [10, 40] — overlaps, 1 row matches
        (2, 10), (2, 40),
    ]
    df = spark.createDataFrame(rows, "f long, k long")
    got = layout.skipping_census(
        df,
        "f",
        [("k", F.lit(5).cast("long"), F.lit(14).cast("long"))],
        "crafted",
    ).collect()[0]
    assert (
        got.layout,
        got.n_files,
        got.files_scanned,
        got.rows_total,
        got.rows_scanned,
        got.rows_matched,
        got.scan_pct,
    ) == ("crafted", 3, 2, 7, 5, 3, 71)


def test_mix_sources_temperature_weights_flatten(spark):
    """weight == isqrt(source token total), so a 100× source gets ~10×
    the share; rate caps at 100; keep set is partition-invariant."""
    rows = [(i, "big", "w " * 10) for i in range(400)] + [
        (1000 + i, "small", "w " * 10) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = corpus.mix_sources_temperature(df, token_budget=1200)
    agg = {
        r.source: r
        for r in out.groupBy("source", "weight", "rate_pct")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert agg["big"].weight == math.isqrt(4000) == 63
    assert agg["small"].weight == math.isqrt(40) == 6
    # small: target = 1200*6/69 ≈ 104 tokens > its 40 -> rate capped at 100
    assert agg["small"].rate_pct == 100 and agg["small"].n == 4
    # big: rate = 1200*100*63 // (69*4000) = 27%
    assert agg["big"].rate_pct == 27
    kept1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    kept2 = sorted(
        r.doc_id
        for r in corpus.mix_sources_temperature(
            df.repartition(13), token_budget=1200
        )
        .select("doc_id")
        .collect()
    )
    assert kept1 == kept2


def test_layout_ops_scale_plan_invariants(spark):
    """RUNBOOK §3 bans on the new surfaces: no CartesianProduct and no
    unpartitioned row-scale window — the only global windows allowed
    are the two-phase rank's bucket-count offsets pass."""
    from data_warehouse_implementation_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    from data_warehouse_implementation_spark.plans import layout_queries

    for name, df in {
        "zorder_census": layout_queries.zorder_skipping_census(t),
        "compaction": layout_queries.compaction_plan(t),
        "mix_temp": corpus.mix_sources_temperature(
            t["documents"], token_budget=5000
        ),
    }.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                # every window must be two-phase-rank machinery: either
                # partitioned by the bucket column or the offsets pass
                # over bucket-grain rows (both mention _b)
                assert "_b#" in line, (
                    f"{name}: window outside the two-phase rank:\n{line}"
                )


def test_bloom_point_census_brute_force(spark):
    """Brute-force differential for the bloom skipping census on a
    crafted frame: replay the hash family in python per (file, key)
    and per probe, and check minmax/bloom/truth counts per probe —
    including an absent key inside a file's [min, max] (minmax false
    positive the bloom rejects) and an absent key whose bits happen to
    be checked against every file."""
    from pyspark.sql import functions as F

    from data_warehouse_implementation_spark.operators import layout

    m = 64  # small filter: collisions plausible, brute force decides
    rows = [(f, k) for f, ks in [(0, [1, 5, 9]), (1, [2, 5, 100]), (2, [3, 7, 11])] for k in ks]
    df = spark.createDataFrame(rows, "file_id long, ck long")
    # 999 (above every file max) and -5 (below every file min) pin the
    # bucketed interval join's out-of-range edges: the probe's derived
    # bucket (past-the-end / negative) matches no file bucket, so
    # minmax opens zero files — same totality the crossJoin filter had
    probes = spark.createDataFrame(
        [(5,), (100,), (6,), (999,), (-5,)], "probe_key long"
    )
    out = {
        r.probe_key: (
            r.present,
            r.files_with_key,
            r.files_opened_minmax,
            r.files_opened_bloom,
            r.bloom_fp_files,
        )
        for r in layout.bloom_point_census(
            df, "file_id", "ck", probes, m, "t"
        ).collect()
    }

    def bits(x):
        return {
            ((x % layout.BLOOM_P) * layout.BLOOM_A[i] + layout.BLOOM_B[i])
            % layout.BLOOM_P
            % m
            for i in range(layout.BLOOM_K)
        }

    files = {0: [1, 5, 9], 1: [2, 5, 100], 2: [3, 7, 11]}
    fbits = {f: set().union(*(bits(k) for k in ks)) for f, ks in files.items()}
    for q in [5, 100, 6, 999, -5]:
        truth = sum(q in ks for ks in files.values())
        mm = sum(min(ks) <= q <= max(ks) for ks in files.values())
        bl = sum(bits(q) <= fb for fb in fbits.values())
        assert out[q] == (truth > 0, truth, mm, bl, bl - truth), (q, out[q])
    # the crafted minmax false positive: 6 is inside file 0's and
    # file 2's ranges but present nowhere
    assert out[6][1] == 0 and out[6][2] >= 2


def test_bloom_hash_sign_safe_across_engines(spark):
    """ADVICE r13: the census oracle's sign-safe modulus
    ((x % P + P) % P) must equal Spark's pmod bit layout for NEGATIVE
    keys too (DuckDB '%' follows the dividend's sign, so the plain
    form only agreed because driver keys are non-negative) — and a
    negative-keyed census must round-trip between the operator and the
    same replay arithmetic."""
    import duckdb
    from pyspark.sql import functions as F

    from data_warehouse_implementation_spark.operators import layout
    from data_warehouse_implementation_spark.operators.layout import (
        BLOOM_A,
        BLOOM_B,
        BLOOM_K,
        BLOOM_P,
    )

    m = 64
    keys = [-7, -1, -2_147_483_650, 0, 5, 2_147_483_650]
    spark_bits = (
        spark.createDataFrame([(k,) for k in keys], "k long")
        .select(
            "k",
            F.array(
                *[layout._bloom_bit(F.col("k"), i, m) for i in range(BLOOM_K)]
            ).alias("bits"),
        )
        .collect()
    )
    got = {r.k: list(r.bits) for r in spark_bits}
    for k in keys:
        want = [
            duckdb.sql(
                # CAST mirrors the oracle (ck/q are BIGINT there); a bare
                # small literal is INT32 in DuckDB and overflows the mul
                f"SELECT (((CAST({k} AS BIGINT) % {BLOOM_P} + {BLOOM_P}) % {BLOOM_P}) * {BLOOM_A[i]}"
                f" + {BLOOM_B[i]}) % {BLOOM_P} % {m}"
            ).fetchone()[0]
            for i in range(BLOOM_K)
        ]
        assert got[k] == want, (k, got[k], want)
        assert all(b >= 0 for b in got[k])
    # negative-keyed census end-to-end: present key found, absent not
    df = spark.createDataFrame(
        [(0, -7), (0, -1), (1, -7), (1, 5)], "file_id long, ck long"
    )
    probes = spark.createDataFrame([(-7,), (-99,)], "probe_key long")
    out = {
        r.probe_key: (r.files_with_key, r.files_opened_bloom)
        for r in layout.bloom_point_census(
            df, "file_id", "ck", probes, 512, "t"
        ).collect()
    }
    assert out[-7][0] == 2 and out[-7][1] >= 2
    assert out[-99][0] == 0
