"""JSON-lines staging source/sink (S2-adjacent: the reference ingests
semi-structured documents from MongoDB, ``python.py:18-58``; JSONL is
the file-shaped equivalent of that feed).

Same schema discipline as the CSV source: staging reads may infer, but
production loads pass an explicit schema — inference costs a full extra
scan, and on JSON it also silently widens types across batches. JSONL
is line-splittable, so a large file fans out across executors; nulls
and nested structs survive the round trip (unlike CSV, which flattens
both away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read JSON-lines. Pass ``schema`` (StructType or DDL string) to
    skip inference; nested fields arrive as StructType and flatten via
    ``sources.nested.select_nested``."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as a JSONL directory (one part-file per
    partition). Null fields are dropped per JSON convention — readers
    see them as missing keys, which the schema resolves back to NULL."""
    df.write.mode(mode).json(path)
