"""Time-windowed streaming aggregations over event streams.

The reference has only global windows (O11); time windows are part of
the declared engine surface (SURVEY §2.2 "Streaming"). These wrappers
run the exact plans of ``plans/streaming_q.py`` on an unbounded input:
watermark (the reference's bounded out-of-orderness, O2 —
``GenJoinInput.scala:36-52``, 10 s bound ``JoinSpec.scala:19``) +
built-in window functions, append mode (a window emits once, when the
watermark passes its end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_agg(
    sdf: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    delay: str = "10 seconds",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    keys = keys or []
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(F.count("*").alias("n"), F.round(F.sum(value_col), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "sum_value")
    )


def stream_sliding_agg(
    sdf: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    slide: str = "30 minutes",
    delay: str = "10 seconds",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    keys = keys or []
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, size, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n"), F.round(F.sum(value_col), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "sum_value")
    )


def stream_session_agg(
    sdf: DataFrame,
    ts_col: str = "ts",
    gap: str = "6 hours",
    delay: str = "10 seconds",
    keys: list[str] | None = None,
) -> DataFrame:
    keys = keys or []
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), *keys, "n_events")
    )
