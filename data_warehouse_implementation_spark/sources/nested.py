"""Nested-document flattening (reference S2/S3: MongoDB dotted-path
projection + ``json_normalize``, ``python.py:18-59``).

The reference pushes a dotted-path projection into MongoDB and flattens
client-side. The Spark equivalents keep the same two phases but both
stay declarative: ``select`` of nested paths (Catalyst prunes unused
struct leaves at the parquet/JSON scan — the projection-pushdown
analog) and struct expansion into flat columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def select_nested(df: DataFrame, paths: dict[str, str]) -> DataFrame:
    """Project dotted nested paths to flat aliased columns — the Spark
    form of the reference's MongoDB projection template
    (``python.py:27-49``): ``{"unemployment.employed": 1, ...}`` becomes
    ``select_nested(df, {"unemployment.employed": "employed", ...})``.
    Nested-schema pruning keeps unreferenced leaves out of the scan.
    """
    return df.select(*[F.col(p).alias(a) for p, a in paths.items()])


def _leaf_columns(schema: StructType, parent: str = "", sep: str = ".") -> list[tuple[str, str]]:
    """(dotted_path, flat_alias) for every leaf field, depth-first."""
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        path = f"{parent}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(_leaf_columns(f.dataType, parent=f"{path}.", sep=sep))
        else:
            out.append((path, path.replace(".", sep)))
    return out


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Fully flatten all struct columns into top-level columns named by
    their dotted path (``json_normalize`` analog, ``python.py:59``).
    Arrays are left intact (explode is a row-multiplying choice the
    caller must make explicitly)."""
    cols: list[Column] = []
    for path, alias in _leaf_columns(df.schema, sep=sep):
        cols.append(F.col(f"`{'`.`'.join(path.split('.'))}`").alias(alias))
    return df.select(*cols)


def parse_json_column(df: DataFrame, col: str, schema: str, out_col: str | None = None) -> DataFrame:
    """Parse a JSON string column into a typed struct (``from_json``) —
    the ingest path for semi-structured event payloads like
    ``events.props``. ``schema`` is a DDL string, e.g. ``"k INT"``."""
    return df.withColumn(out_col or col, F.from_json(F.col(col), schema))
