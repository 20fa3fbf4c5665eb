"""Checkpoint recovery: a restarted streaming query resumes from its
offsets — already-committed input is not reprocessed, new input is,
and stateful operators rehydrate their state store.

This is the property that replaces the reference's never-restarting
local mini-cluster (``FlinkTestEnv.scala:8-13``) in any real
deployment: the source offsets + state live in the checkpoint, so the
changelog survives process death.
"""

from __future__ import annotations

import os

import pandas as pd

from flink_join_scaling_spark.streaming.dedup import stream_dedup_latest

A_SCHEMA = "id long, ts long, tag string"


def _write_chunk(spark, df, root: str, name: str) -> None:
    df.coalesce(1).write.parquet(os.path.join(root, name), mode="overwrite")


def _read_stream(spark, root: str, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "chunk-*"))
    )


def _run_once(sdf, sink_dir: str, ckpt: str) -> None:
    q = (
        sdf.writeStream.foreachBatch(
            lambda b, i: b.toPandas().to_json(
                os.path.join(sink_dir, f"b{i:04d}.json"), orient="records"
            )
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _emissions(sink_dir: str) -> pd.DataFrame:
    frames = [
        pd.read_json(os.path.join(sink_dir, f), orient="records")
        for f in sorted(os.listdir(sink_dir))
        if os.path.getsize(os.path.join(sink_dir, f)) > 2
    ]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_restart_resumes_without_reprocessing(streaming_spark, tmp_path):
    spark = streaming_spark
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src), os.makedirs(sink)

    df1 = spark.createDataFrame([(1, 10, "v10"), (2, 5, "w5")], A_SCHEMA)
    _write_chunk(spark, df1, src, "chunk-000")

    # run 1: processes chunk 0, emits initial latest rows
    out = stream_dedup_latest(_read_stream(spark, src, df1.schema), "id", "ts", tiebreak=["tag"])
    _run_once(out, sink, ckpt)
    em1 = _emissions(sink)
    assert sorted(zip(em1["id"], em1["ts"])) == [(1, 10), (2, 5)]

    # new data lands while the query is down: a newer + a stale version
    df2 = spark.createDataFrame([(1, 20, "v20"), (2, 1, "stale")], A_SCHEMA)
    _write_chunk(spark, df2, src, "chunk-001")

    # run 2, same checkpoint: must process ONLY chunk 1, and the
    # rehydrated state must suppress the stale id-2 version
    out2 = stream_dedup_latest(_read_stream(spark, src, df1.schema), "id", "ts", tiebreak=["tag"])
    _run_once(out2, sink, ckpt)
    em2 = _emissions(sink)

    # exactly one new emission: id 1 improved to ts 20; id 2's stale
    # version emitted nothing (state survived the restart), and chunk 0
    # was not reprocessed (no duplicate (1,10)/(2,5) rows)
    assert sorted(zip(em2["id"], em2["ts"])) == [(1, 10), (1, 20), (2, 5)]
