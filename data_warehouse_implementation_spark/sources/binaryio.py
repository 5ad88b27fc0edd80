"""Raw-file media ingestion via Spark's built-in ``binaryFile`` source —
how image/audio/video blobs enter the lake from a directory of files
(the 100 TB media-crawl shape: millions of small objects on
S3/HDFS-like storage), complementing the parquet-column path the
multimodal operators consume.

Scale posture: ``binaryFile`` is a standard FileFormat — listing is
driver-side but distributed-read; ``pathGlobFilter`` prunes by
extension at the listing, and the 2 GB per-file Spark row limit is far
above any sane media object. Files land as (path, modificationTime,
length, content); this module maps them straight into the engine's
``MEDIA_SCHEMA`` so every downstream operator (decode, resize,
patchify, feature-extract) works unchanged on file-ingested blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_media(
    spark: SparkSession,
    path: str,
    kind: str,
    glob: str | None = None,
) -> DataFrame:
    """Read a directory of raw media files into ``MEDIA_SCHEMA`` rows:
    ``media_id`` is the integer filename stem (the crawl-manifest id
    convention; non-numeric stems hash deterministically via xxhash64
    so ids stay stable across re-ingests), ``payload`` is the file
    content, ``meta`` is null — decoders derive real dimensions from
    the bytes themselves."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    # Strip ONLY the final extension — crawl filenames routinely carry
    # hyphens, spaces, and inner dots ('img-001.jpg', 'a.tar.gz'), which
    # a \w-only stem regex silently collapsed to '' and hence ONE
    # colliding xxhash64 id for every such file (ADVICE r8). A dotfile
    # with no other name ('.gitignore') keeps its full filename as the
    # stem so it still hashes uniquely.
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    bare = F.regexp_replace(fname, r"\.[^.]+$", "")
    stem = F.when(F.length(bare) > 0, bare).otherwise(fname)
    media_id = (
        F.when(stem.rlike(r"^\d+$"), stem.cast("long"))
        .otherwise(F.xxhash64(stem))
        .alias("media_id")
    )
    return files.select(
        media_id,
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
        F.lit(None).cast("struct<width: int, height: int, sample_rate: int>").alias("meta"),
    )
