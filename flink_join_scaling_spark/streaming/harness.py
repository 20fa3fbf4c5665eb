"""Streaming test/run harness: bounded execution of unbounded plans.

Mirrors the reference's test path (``/root/reference/src/test/scala/
flink_perf/JoinSpec.scala:135-155``): bounded collection source →
streaming job → collecting sink (``sinks.scala:9-27``) → converged
comparison. Here: chunked parquet file source (``maxFilesPerTrigger=1``
≙ one micro-batch per chunk, preserving out-of-order arrival) →
``availableNow`` trigger (process everything, then stop) → memory sink
or a per-batch emission log (≙ ``TestSink1``'s synchronized buffer).
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def chunked_parquet_stream(
    spark: SparkSession,
    df: DataFrame,
    tmpdir: str,
    n_chunks: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Write ``df`` as ``n_chunks`` parquet files and read them back as
    a stream, one file per micro-batch.

    Chunk assignment is round-robin over the input order (parquet file
    listing is lexicographic), so records of one key spread across
    micro-batches — the arrival-interleaving the reference's generators
    produce. Test-only: a production job points ``readStream`` at the
    live directory / Kafka topic instead.
    """
    path = os.path.join(tmpdir, f"stream-{uuid.uuid4().hex[:8]}")
    pdf = df.toPandas()  # test-scale inputs only; ordering must be stable
    os.makedirs(path, exist_ok=True)
    for i in range(n_chunks):
        chunk = pdf.iloc[i::n_chunks]
        if len(chunk) or i == 0:
            spark.createDataFrame(chunk, schema=df.schema).coalesce(1).write.parquet(
                os.path.join(path, f"chunk-{i:03d}"), mode="overwrite"
            )
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(os.path.join(path, "chunk-*"))
    )


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "update",
    query_name: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (``availableNow``) into a
    memory sink; return a batch DataFrame over everything emitted."""
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.sql(f"SELECT * FROM {name}")


def collect_emissions(
    sdf: DataFrame,
    output_mode: str = "update",
) -> pd.DataFrame:
    """Run to completion via ``foreachBatch``, returning the full
    emission log as pandas with a ``_batch_id`` column.

    This is the collecting sink of the reference's tests: every
    incremental emission is retained so tests can assert both the
    changelog property (≥ converged count) and the converged result
    (last emission per key) — ``JoinSpec.scala:153-154``.
    """
    log: list[pd.DataFrame] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        pdf = batch_df.toPandas()
        pdf["_batch_id"] = batch_id
        log.append(pdf)

    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not log:
        return pd.DataFrame()
    return pd.concat(log, ignore_index=True)


def converged(emissions: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """O15 OmniscientDeduplicator (``/root/reference/src/test/scala/
    flink_perf/OmnicientDeduplicator.scala:4-21``): reduce an emission
    log to the final answer — last emission per key wins."""
    if emissions.empty:
        return emissions
    last = emissions.groupby(key_cols)["_batch_id"].transform("max")
    return (
        emissions[emissions["_batch_id"] == last]
        .drop(columns=["_batch_id"])
        .sort_values(key_cols)
        .reset_index(drop=True)
    )
