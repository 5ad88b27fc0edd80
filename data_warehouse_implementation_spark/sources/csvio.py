"""CSV staging source/sink (reference S1: ``pd.read_csv``,
``python.py:13``).

Schema discipline (SURVEY §1.3): staging reads may infer, but warehouse
loads should pass an explicit ``StructType`` — inference costs an extra
full scan and can flip types between sf dirs. On a cluster the same
calls stream-split large files per executor (CSV is splittable when
uncompressed), so no single-node bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Read a CSV file/directory. Pass ``schema`` (StructType or DDL
    string) to skip inference; otherwise one extra pass infers types
    (matching pandas' behavior in the reference)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """Write a DataFrame as a CSV directory (one part-file per
    partition; coalesce upstream for a single file if required)."""
    df.write.option("header", str(header).lower()).mode(mode).csv(path)
