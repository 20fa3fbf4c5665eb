"""Tests for the foreachBatch keyed-upsert sink (streaming/sinks.py)."""

from __future__ import annotations

from flink_join_scaling_spark.streaming import chunked_parquet_stream
from flink_join_scaling_spark.streaming.dedup import stream_dedup_latest
from flink_join_scaling_spark.streaming.sinks import (
    read_upsert_snapshot,
    upsert_sink,
)

A_SCHEMA = "id long, ts long, tag string"


def _run(sdf, sink):
    q = (
        sdf.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_upsert_converges_to_latest(streaming_spark, tmp_path):
    """Changelog of a versioned dedup upserted into a snapshot equals
    the batch dedup of the full input."""
    spark = streaming_spark
    rows = [(i % 4, t, f"v{t}") for t, i in ((t, t) for t in range(16))]
    df = spark.createDataFrame(rows, A_SCHEMA)
    s = chunked_parquet_stream(spark, df, str(tmp_path / "in"), n_chunks=4)
    out = stream_dedup_latest(s, "id", "ts", tiebreak=["tag"])
    _run(out, upsert_sink(str(tmp_path / "snap"), "id", ts_col="ts"))

    snap = read_upsert_snapshot(spark, str(tmp_path / "snap"))
    got = {(r.id, r.ts, r.tag) for r in snap.collect()}
    from flink_join_scaling_spark.operators.versioned import dedup_latest

    exp = {(r.id, r.ts, r.tag) for r in dedup_latest(df, "id", "ts").collect()}
    assert got == exp
    assert snap.count() == 4  # exactly one row per key


def test_upsert_ignores_stale_redelivery(streaming_spark, tmp_path):
    """A redelivered older version must not overwrite a newer snapshot
    row when ts_col is given (last-writer-wins at the sink)."""
    spark = streaming_spark
    root = str(tmp_path / "snap")
    sink = upsert_sink(root, "id", ts_col="ts")
    b1 = spark.createDataFrame([(1, 100, "new")], A_SCHEMA)
    b2 = spark.createDataFrame([(1, 50, "stale"), (2, 10, "other")], A_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)
    snap = read_upsert_snapshot(spark, root)
    assert {(r.id, r.ts, r.tag) for r in snap.collect()} == {
        (1, 100, "new"),
        (2, 10, "other"),
    }


def test_upsert_without_ts_replaces(streaming_spark, tmp_path):
    spark = streaming_spark
    root = str(tmp_path / "snap")
    sink = upsert_sink(root, "id")
    sink(spark.createDataFrame([(1, 1, "a")], A_SCHEMA), 0)
    sink(spark.createDataFrame([(1, 2, "b")], A_SCHEMA), 1)
    snap = read_upsert_snapshot(spark, root)
    assert {(r.id, r.ts, r.tag) for r in snap.collect()} == {(1, 2, "b")}
