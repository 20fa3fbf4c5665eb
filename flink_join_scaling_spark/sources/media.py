"""Binary-media directory source: the ingestion half of the multimodal
pipeline (``operators/multimodal.py``).

``read_media_dir`` wraps Spark's ``binaryFile`` source into the payload
shape the decode/feature operators consume — (doc_id, payload,
media_type, n_bytes) plus the source path for lineage. Media type is
derived from the file extension (a real lakehouse would read it from a
manifest; the extension map is the dependency-free default).

Scale shape: ``binaryFile`` lists and reads files distributed, one
partition per (large) file or group of small ones; payloads never
visit the driver; the decode stage runs ``mapInPandas`` where the
bytes land. Pair with ``spark.sql.files.maxPartitionBytes`` for large
clips and ``pathGlobFilter``/``recursiveFileLookup`` options passed
through ``options``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_TYPES = {
    "wav": "audio/wav",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "mp4": "video/mp4",
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a directory of media files into the standard payload shape.

    Columns: ``doc_id`` (stable hash of the path — deterministic
    across runs, unlike ``monotonically_increasing_id``), ``payload``
    (binary), ``media_type`` (from extension, 'application/octet-
    stream' when unknown), ``n_bytes``, ``src_path``.
    """
    reader = spark.read.format("binaryFile")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mt = F.lit("application/octet-stream")
    for e, t in _EXT_TYPES.items():
        mt = F.when(ext == e, F.lit(t)).otherwise(mt)
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        mt.alias("media_type"),
        # the source's own length metadata column — no payload scan
        # needed to know the size, and it survives content pruning
        F.col("length").cast("bigint").alias("n_bytes"),
        F.col("path").alias("src_path"),
    )
