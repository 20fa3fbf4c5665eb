"""Table catalog over the driver-generated parquet test data.

The reference's only source is an in-memory collection
(``/root/reference/src/test/scala/flink_perf/JoinSpec.scala:140``); this
engine's primary source is columnar parquet — scans get predicate
pushdown, column pruning, and partition-sized splits from Catalyst for
free, which is the behavior that matters at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic scale factor
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (applicationId, sf_dir, table) → (mtime_ns, DataFrame). A DataFrame
#: is an immutable lazy plan, so handing the same one to every query is
#: safe — and skips the per-call parquet footer read + relation
#: analysis that otherwise taxes every plan build (a real metastore
#: caches table schemas for exactly this reason). The stored mtime
#: invalidates the entry when the parquet file is regenerated in place
#: (the documented between-rounds testdata refresh): a cached plan
#: snapshots the file listing (InMemoryFileIndex), so serving it across
#: a regeneration would read deleted or stale files.
_DF_CACHE: dict[tuple[str, str, str], tuple[int, DataFrame]] = {}


def invalidate_cache() -> None:
    """Drop every cached table plan — for callers that replace testdata
    without touching file mtimes (the mtime check below covers the
    normal regeneration path automatically)."""
    _DF_CACHE.clear()


def _mtime_ns(path: str) -> int:
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return -1  # let the parquet reader raise the real error


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    mtime = _mtime_ns(f"{sf_dir}/{name}.parquet")
    cached = _DF_CACHE.get(key)
    if cached is not None and cached[0] == mtime:
        return cached[1]
    df = _load_table_uncached(spark, sf_dir, name)
    _DF_CACHE[key] = (mtime, df)
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped in two physical layouts across testdata
        # generations: TIMESTAMP(NANOS) (which Spark reads as epoch-nanos
        # LongType under the legacy conf) and plain timestamp[us]
        # (TIMESTAMP_NTZ). Branch on the loaded dtype and expose the same
        # logical schema either way: µs-precision TimestampType `ts` plus
        # epoch-nanos LongType `ts_ns`.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(raw.schema["ts"].dataType, LongType):
            # integer division — epoch-ns exceeds double's 53-bit
            # mantissa, so float math here would corrupt timestamps
            return raw.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # timestamp[us] / TIMESTAMP_NTZ: session timezone is pinned to
        # UTC (session.py), so the NTZ→TIMESTAMP cast is exact
        return raw.withColumn(
            "ts_ns",
            F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form queries work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
