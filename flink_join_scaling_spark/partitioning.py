"""Scale-adaptive partitioning helpers shared across operators.

``widen_if_narrow`` lived in ``operators.dedup`` through r16; it moved
here in the r17 optimization round so column-builder modules
(``functions.text``) and plan modules can use it without importing the
dedup operator stack (circular-import hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def pin_partitioning(df: DataFrame, *cols: str, n: int | None = None) -> DataFrame:
    """Hash-repartition on ``cols`` with an EXPLICIT partition count —
    an exchange AQE's byte-based coalescing will not shrink.

    For an aggregation or window whose reduce-side work is CPU-dense
    far beyond its shuffle byte size (transcendental folds over
    collect_list arrays, per-row hashing), AQE sees a few MB and
    coalesces the exchange to 1-4 tasks, serializing the compute
    (guide §2: partition by the work, not the bytes — measured r17:
    the NB per-doc fold ran 1.25 s of CPU on 4 tasks). Placing this
    exchange under such an operator satisfies its clustering
    requirement (same hash family), so no second exchange appears,
    and REPARTITION_BY_NUM is exempt from coalescing.

    ONLY safe where map-side partial aggregation does not reduce the
    shuffle (collect_list/window/post-distinct maps): for count/sum
    aggregations the user exchange would replace the partial-agg
    shape and shuffle every input row — use the default path there.

    ``n`` defaults to the session's default parallelism (cluster cores
    at real scale — the same sizing as ``spark.sql.shuffle.partitions``)."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols])
