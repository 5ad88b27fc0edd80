"""ORC staging source/sink — the second columnar interchange format
next to parquet (reference S1 analog; Spark ships a native vectorized
ORC reader/writer, so this is the format to meet Hive-ecosystem
producers halfway).

Scale posture: ORC is splittable and stripe-indexed with min/max
statistics, so predicate pushdown and column pruning work exactly as
with parquet (``spark.sql.orc.filterPushdown`` is on by default);
nothing in the engine treats it as second-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read an ORC file/directory. ORC is self-describing; pass
    ``schema`` only to assert/narrow the expected shape."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as an ORC directory (one stripe-set per
    partition; zlib-compressed by Spark's default)."""
    df.write.mode(mode).orc(path)
