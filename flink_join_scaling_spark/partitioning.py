"""Scale-adaptive partitioning helpers shared across operators.

``widen_if_narrow`` lived in ``operators.dedup`` through r16; it moved
here in the r17 optimization round so column-builder modules
(``functions.text``) and plan modules can use it without importing the
dedup operator stack (circular-import hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism ONLY
    when its current partitioning is narrower — a no-op at real scale.

    Compute-heavy row-local stages (per-doc shingle sorts, signature
    hashing) inherit the SCAN's partitioning, and a small parquet file
    is one split regardless of ``maxPartitionBytes`` — so at bench/test
    scale the whole map stage runs on one core of 32. At 100 TB the
    scan yields thousands of splits and this returns ``df`` unchanged
    (the guard is what makes it safe to leave in the production path:
    an unconditional repartition would be a full-corpus shuffle).
    """
    if df.isStreaming:  # no .rdd on streaming frames; micro-batch
        return df       # partitioning is the source's business
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
