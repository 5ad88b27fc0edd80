"""XML staging source/sink — the document-markup interchange path next
to CSV/JSONL/ORC (reference S1 analog; Spark 4 ships the former
spark-xml package as a NATIVE ``format("xml")`` data source, so no
external jar is involved).

Scale posture: the reader splits on row tags per file and infers or
accepts an explicit schema exactly like the JSON source; XML is a
text interchange format, so like CSV it is for meeting producers
halfway at the edge — facts are converted to parquet/ORC at ingest,
never queried repeatedly as XML. Doubles survive the round-trip via
shortest-repr formatting, which the staging query's oracle proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

ROW_TAG = "row"


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    row_tag: str = ROW_TAG,
    **options: str,
) -> DataFrame:
    """Read an XML directory written by :func:`write_xml` (or any XML
    with one record per ``row_tag`` element). Pass ``schema`` to pin
    types — inference samples the data like the JSON reader."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, mode: str = "overwrite", row_tag: str = ROW_TAG
) -> None:
    """Write a DataFrame as an XML directory, one ``row_tag`` element
    per record."""
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)
