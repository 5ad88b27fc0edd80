"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, columns sorted by name) — the same contract the
driver's CORRECTNESS gate applies.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from data_warehouse_implementation_spark.session import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            # unify resolution too (Spark→ns, DuckDB→us): a resolution
            # difference is representational, not a value difference
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
        elif dt == object:
            # date objects / decimals / strings: stringify for stable compare
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_to_oracle(spark, name: str, sf_dir: str = "/root/testdata/sf0.01") -> None:
    from data_warehouse_implementation_spark import registry

    q = registry.queries()[name]
    oracle = registry.oracle_sql()[name]
    got = normalize(q(spark, sf_dir).toPandas())
    con = duckdb_conn(sf_dir)
    try:
        want = normalize(con.execute(oracle).fetchdf())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    # The driver's value hash is dtype-sensitive: DuckDB SUM(BIGINT) yields
    # HUGEINT (surfacing as float64), so an un-cast oracle hashes 515.0 vs
    # Spark's 515 even when values agree. Compare post-normalize dtypes
    # strictly so that bug class fails locally, not in the driver window.
    assert list(got.dtypes) == list(want.dtypes), (
        f"{name}: dtype mismatch {dict(got.dtypes)} vs {dict(want.dtypes)} "
        "(likely a missing CAST(... AS BIGINT) around a DuckDB SUM)"
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False, obj=name)
