"""Tests: skew helpers (salted join/agg) and the built-in watermarked
stream-stream join."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_join_scaling_spark.operators.skew import salted_agg, salted_join
from flink_join_scaling_spark.streaming import (
    chunked_parquet_stream,
    collect_emissions,
)
from flink_join_scaling_spark.streaming.joins import stream_stream_join_within


def _skewed_rows(n=2000, hot_frac=0.8, seed=7):
    rng = random.Random(seed)
    return [
        (0 if rng.random() < hot_frac else rng.randrange(1, 50), rng.randrange(1000))
        for _ in range(n)
    ]


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(_skewed_rows(), "k long, v long")
    small = spark.createDataFrame([(i, f"d{i}") for i in range(50)], "k long, name string")
    plain = big.join(small.withColumnRenamed("k", "k2"), big["k"] == F.col("k2"))
    salted = salted_join(big, small.withColumnRenamed("k", "k2"), "k", "k2", num_salts=4)
    exp = sorted((r.k, r.v, r.name) for r in plain.collect())
    got = sorted((r.k, r.v, r.name) for r in salted.collect())
    assert got == exp
    assert len(got) == 2000  # every row matched exactly once


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(0, 1), (0, 2), (99, 3)], "k long, v long")
    small = spark.createDataFrame([(0, "hot")], "k2 long, name string")
    out = salted_join(big, small, "k", "k2", num_salts=4, how="left_outer")
    rows = {(r.v, r.name) for r in out.collect()}
    assert rows == {(1, "hot"), (2, "hot"), (3, None)}


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(_skewed_rows(), "k long, v long")
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    got = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            df, "k", {"s": "v:sum", "n": "v:count", "mn": "v:min", "mx": "v:max"}
        ).collect()
    }
    assert got == plain


def test_stream_stream_join_within(streaming_spark, tmp_path):
    """Built-in watermarked stream-stream inner join equals the batch
    join with the same time constraint on bounded input."""
    spark = streaming_spark
    rng = random.Random(11)
    xs = [(i, rng.randrange(3), rng.randrange(0, 3600) * 1000) for i in range(40)]
    ys = [(100 + i, rng.randrange(3), rng.randrange(0, 3600) * 1000) for i in range(40)]
    dfx = spark.createDataFrame(xs, "xid long, k long, ts_ms long").withColumn(
        "xts", F.timestamp_millis("ts_ms")
    ).drop("ts_ms")
    dfy = spark.createDataFrame(ys, "yid long, k long, ts_ms long").withColumn(
        "yts", F.timestamp_millis("ts_ms")
    ).drop("ts_ms")

    batch = dfx.alias("x").join(
        dfy.withColumnRenamed("k", "k2").alias("y"),
        (F.col("x.k") == F.col("k2"))
        & (F.col("yts") >= F.col("xts") - F.expr("INTERVAL 5 minutes"))
        & (F.col("yts") <= F.col("xts") + F.expr("INTERVAL 5 minutes")),
    )
    expected = sorted((r.xid, r.yid) for r in batch.collect())
    assert expected  # non-trivial fixture

    sx = chunked_parquet_stream(spark, dfx, str(tmp_path / "x"), n_chunks=2)
    sy = chunked_parquet_stream(
        spark, dfy.withColumnRenamed("k", "k2"), str(tmp_path / "y"), n_chunks=2
    )
    out = stream_stream_join_within(
        sx, sy, sx["k"] == sy["k2"], "xts", "yts", within="5 minutes", delay="2 hours"
    )
    em = collect_emissions(out, output_mode="append")
    got = sorted(zip(em["xid"], em["yid"]))
    assert got == expected


def test_registered_stream_join_matches_streaming_execution(streaming_spark, tmp_path):
    """The registered q_stream_join (batch form) and the actual
    streaming execution (stream_stream_join_within with the asymmetric
    forward window) produce the same pair set on the real events table
    — the registered query IS the streaming operator's semantics.
    Timestamps are truncated to epoch-ms on both sides (the batch
    form's unit), so window edges agree exactly. The chunker delivers
    round-robin (NOT time-ordered), so the watermark delay is set past
    the data's full span — no row is ever late; lateness-dropping under
    a tight delay is covered by the recovery/watermark tests."""
    from flink_join_scaling_spark import plans
    from flink_join_scaling_spark.sources.catalog import load_table
    from flink_join_scaling_spark.streaming import (
        chunked_parquet_stream,
        collect_emissions,
    )

    spark = streaming_spark
    sf = "/root/testdata/sf0.001"
    expected = {
        (r.click_id, r.purchase_id)
        for r in plans.QUERIES["q_stream_join"].fn(spark, sf).collect()
    }

    ev = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_millis(F.expr("ts_ns div 1000000")).alias("tsm"),
    )
    src = str(tmp_path / "ev")
    s = chunked_parquet_stream(spark, ev, src, n_chunks=3)
    ck = s.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"),
        F.col("event_id").alias("click_id"),
        F.col("tsm").alias("cts"),
    )
    pu = s.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"),
        F.col("event_id").alias("purchase_id"),
        F.col("tsm").alias("pts"),
    )
    out = stream_stream_join_within(
        ck,
        pu,
        on=(F.col("c_uid") == F.col("p_uid")),
        x_ts="cts",
        y_ts="pts",
        before="0 seconds",
        after="30 minutes",
        delay="3650 days",
    ).select("click_id", "purchase_id")
    em = collect_emissions(out, output_mode="append")
    got = {tuple(r) for r in em[["click_id", "purchase_id"]].itertuples(index=False)}
    assert got == expected and len(expected) > 0
