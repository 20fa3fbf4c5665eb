"""Streaming sinks beyond the built-ins: idempotent keyed upsert.

The reference's downstream contract is a changelog — every emission
supersedes the previous row for its key (``SURVEY §3.1 step 3``); its
only sink is an in-memory test buffer (``sinks.scala:9-27``). A real
consumer wants the *converged table*: latest row per key. Spark's file
sinks are append-only, so the upsert is done in ``foreachBatch`` — the
standard Structured Streaming pattern for merge targets without a
transactional table format (with Delta/Iceberg you'd issue MERGE INTO
instead; same shape, one merge per micro-batch).

Layout: one parquet snapshot directory per micro-batch generation,
written atomically (tmp dir + rename), with a `_LATEST` pointer file.
Readers always see a complete snapshot. State needed per merge = old
snapshot ⋈ batch — a key-partitioned merge, shuffle-bounded by the
snapshot size, executed by Spark (no driver-side rows).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _latest_path(root: str) -> str | None:
    ptr = os.path.join(root, "_LATEST")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        gen = f.read().strip()
    return os.path.join(root, gen) if gen else None


def read_upsert_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """Read the current converged table (or None before first commit)."""
    path = _latest_path(root)
    return spark.read.parquet(path) if path else None


def upsert_sink(
    root: str,
    key_cols: str | Sequence[str],
    ts_col: str | None = None,
):
    """Build a ``foreachBatch`` function that merges each micro-batch
    into a keyed parquet snapshot: new keys inserted, existing keys
    replaced (or replaced only by newer ``ts_col`` when given —
    last-writer-wins against out-of-order redelivery).

    Usage::

        q = (changelog.writeStream
             .foreachBatch(upsert_sink("/data/out", "k"))
             .outputMode("update").trigger(availableNow=True).start())
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # within-batch: keep one row per key (latest by ts if given)
        if ts_col is not None:
            w = Window.partitionBy(*keys).orderBy(F.desc(ts_col))
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch_df = batch_df.dropDuplicates(keys)
        old = read_upsert_snapshot(spark, root)
        if old is None:
            merged = batch_df
        elif ts_col is not None:
            # keep an old row unless the batch brings a strictly newer
            # version of its key; admit a batch row unless an
            # at-least-as-new old row exists
            newer = batch_df.alias("n")
            cond = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys]
            keep_old = old.alias("o").join(
                newer,
                on=[*cond, F.col(f"n.{ts_col}") > F.col(f"o.{ts_col}")],
                how="left_anti",
            )
            fresh_new = newer.join(
                old.alias("o"),
                on=[*cond, F.col(f"o.{ts_col}") >= F.col(f"n.{ts_col}")],
                how="left_anti",
            )
            merged = keep_old.unionByName(fresh_new)
        else:
            merged = old.join(batch_df, on=keys, how="left_anti").unionByName(
                batch_df
            )
        gen = f"gen-{batch_id:09d}"
        out = os.path.join(root, gen)
        merged.write.mode("overwrite").parquet(out)
        # atomic-enough pointer flip (single small file rewrite)
        tmp = os.path.join(root, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(gen)
        os.replace(tmp, os.path.join(root, "_LATEST"))

    return merge
