"""Tests for stream monitoring (O13: observe + listener)."""

from __future__ import annotations

import time

from flink_join_scaling_spark.streaming import chunked_parquet_stream
from flink_join_scaling_spark.streaming.monitor import StreamMetrics, observed


def test_observe_and_listener_collect_batch_metrics(streaming_spark, tmp_path):
    spark = streaming_spark
    df = spark.createDataFrame(
        [(i, i * 1000) for i in range(12)], "id long, ts long"
    )
    s = chunked_parquet_stream(spark, df, str(tmp_path), n_chunks=3)
    mon = StreamMetrics.install(spark)
    try:
        q = (
            observed(s, ts_col="ts")
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        for _ in range(40):
            if sum(b.num_input_rows for b in mon.batches) >= 12:
                break
            time.sleep(0.25)
    finally:
        mon.uninstall(spark)

    data_batches = [b for b in mon.batches if b.num_input_rows > 0]
    assert len(data_batches) == 3  # one per chunk
    assert sum(b.num_input_rows for b in data_batches) == 12
    # observed metrics rode the plan: counts and event-time bounds
    assert all(b.observed["n_rows"] == b.num_input_rows for b in data_batches)
    assert max(b.observed["max_ts"] for b in data_batches) == 11000
