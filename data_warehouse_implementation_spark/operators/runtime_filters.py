"""Runtime join filters: a from-scratch Bloom filter built as pure
DataFrame algebra (no reference analog — the reference relies on
PostgreSQL b-tree indexes for join pruning; the Spark-native analog of
"prune the fact scan by the filtered dim" is a runtime bloom filter,
which Spark itself applies via
``spark.sql.optimizer.runtime.bloomFilter.enabled``; this module makes
the technique explicit, inspectable, and engine-portable).

Why this matters at 100 TB: a selective dimension predicate (e.g. 2% of
customers) should prune the *fact shuffle*, not just the post-join
output. Broadcasting the full key set works only while the key set is
broadcast-sized; a Bloom filter compresses an arbitrarily large build
side to a fixed ``m``-bit array (here 16384 bits = 2 KiB as 256 int64
words) at the price of a quantifiable false-positive rate, and the real
join afterwards removes the false positives, so the filter is
*transparent to correctness* — exactly the contract of engine-internal
runtime filters.

Engine portability: the ``k`` bit positions come from universal hashes
``((key mod P) * A_i + B_i) mod P mod m`` — plain int64 arithmetic
(products stay under 2^63) that DuckDB replays bit-for-bit, so the
oracle can check the *pruned candidate counts*, not just the final
joined rows: a membership test that silently passed everything would
fail the differential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_P = 2_147_483_647  # 2^31 - 1
BLOOM_M = 16_384  # bits
BLOOM_WORDS = BLOOM_M // 64
#: k=3 universal-hash coefficients, shared verbatim with oracle SQL.
BLOOM_A = [2_654_435_761, 2_246_822_519, 3_266_489_917]
BLOOM_B = [1_013_904_223, 374_761_393, 668_265_263]


def bloom_positions(key) -> list:
    """The k bit positions of ``key`` — int64 modular arithmetic only;
    ``(P-1) * max(A) < 2^63`` so the products never overflow."""
    key = F.col(key) if isinstance(key, str) else key
    return [
        (((key % HASH_P) * F.lit(a) + F.lit(b)) % HASH_P % BLOOM_M).cast("long")
        for a, b in zip(BLOOM_A, BLOOM_B)
    ]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the filter over the (already filtered) build-side keys:
    one row with a dense ``bloom`` array of ``BLOOM_WORDS`` int64 words.
    Distributed shape: explode keys to (word, bit), ``bit_or`` the masks
    per word (a #words-row aggregate), then densify via a map lookup —
    no collect, broadcastable as a single tiny row."""
    pos = keys.select(
        F.explode(F.array(*bloom_positions(key_col))).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("long").alias("w")).agg(
        # expr, not F.shiftleft: the python helper only accepts a
        # literal shift amount, the SQL function takes any expression
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")).alias(
            "mask"
        )
    )
    return words.groupBy().agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("mask")).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
            lambda w: F.coalesce(
                F.element_at("_m", w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def bloom_prefilter(
    fact: DataFrame, keys: DataFrame, fact_key: str, build_key: str
) -> DataFrame:
    """Attach ``bloom_pass`` to ``fact``: the runtime-filter probe. The
    2 KiB filter row is broadcast; the probe is map-side O(1) per row
    (word fetch + shift) — the fact is never shuffled. Callers follow
    with the real join, which keeps correctness independent of the
    false-positive rate. False negatives are impossible."""
    # collision-safe scratch names: the fact may legitimately own a
    # 'bloom' (or '_bp0'...) column; reserve a prefix and lengthen it
    # until it collides with nothing, so the probe neither shadows nor
    # drops user data. The OUTPUT column gets the same protection: a
    # pre-existing 'bloom_pass' would be silently overwritten by
    # withColumn — refuse instead of clobbering user data.
    if "bloom_pass" in fact.columns:
        raise ValueError(
            "bloom_prefilter output column 'bloom_pass' already exists on the "
            "fact — rename it before probing"
        )
    rf = "__rf"
    while any(c.startswith(rf) for c in fact.columns):
        rf += "_"
    bloom_col = f"{rf}bloom"
    filt = bloom_build(keys.select(build_key), build_key).withColumnRenamed(
        "bloom", bloom_col
    )
    out = fact.crossJoin(F.broadcast(filt))
    temp: list[str] = []
    tests = []
    for i, p in enumerate(bloom_positions(fact_key)):
        bp, bw = f"{rf}p{i}", f"{rf}w{i}"
        out = out.withColumn(bp, p).withColumn(
            bw, F.get(F.col(bloom_col), (F.col(bp) / 64).cast("int"))
        )
        # & 1, never % 2: an arithmetic right shift of a word with the
        # sign bit set yields a negative long, and Spark's % follows
        # the dividend's sign (-1 % 2 == -1).
        tests.append(
            F.expr(
                f"(shiftright({bw}, CAST({bp} % 64 AS INT)) & CAST(1 AS BIGINT))"
                " = CAST(1 AS BIGINT)"
            )
        )
        temp += [bp, bw]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return out.withColumn("bloom_pass", cond).drop(bloom_col, *temp)
