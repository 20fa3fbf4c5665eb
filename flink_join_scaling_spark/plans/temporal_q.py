"""Temporal join queries over the events stream (as-of + range).

The reference's joins are equi-joins on a string key
(``joins.scala:10-70``); these exercise the temporal operators in
``operators/temporal.py`` — the time-series siblings that a versioned
event engine needs. Timestamps are epoch micros (Spark-native
precision for the events table, SURVEY §1.4 note on ns parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_join_scaling_spark.operators.temporal import asof_join, range_join, sessionize
from flink_join_scaling_spark.plans.registry import query
from flink_join_scaling_spark.sources.catalog import load_table


def _typed_events(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == event_type).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )


@query(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts_us,
           c.event_id AS click_event_id,
           p.ts_us - c.ts_us AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
    headline=True,
    tags=("temporal", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each purchase picks the user's most recent click
    at-or-before it (left-outer; unmatched purchases keep nulls)."""
    p = _typed_events(spark, sf_dir, "purchase")
    c = _typed_events(spark, sf_dir, "click")
    out = asof_join(p, c, on="user_id", left_ts="ts_us", right_ts="ts_us")
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("r_event_id").alias("click_event_id"),
        (F.col("ts_us") - F.col("r_ts_us")).alias("gap_us"),
    )


_RANGE_US = 10 * 60 * 1_000_000  # 10 minutes in micros


@query(
    "q_join_range",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
               FROM events WHERE event_type = 'error'),
         v AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
               FROM events WHERE event_type = 'view')
    SELECT e.event_id, count(*) AS n_views,
           max(v.ts_us) AS last_view_us
    FROM e JOIN v
      ON e.user_id = v.user_id
     AND v.ts_us >= e.ts_us - {_RANGE_US}
     AND v.ts_us <= e.ts_us
    GROUP BY e.event_id
    """,
    headline=True,
    tags=("temporal", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: views by the same user in the 10 minutes before
    each error, aggregated per error. The bucketed equi-join in
    ``range_join`` keeps this a shuffle join (no nested-loop) at any
    scale."""
    e = _typed_events(spark, sf_dir, "error")
    v = _typed_events(spark, sf_dir, "view")
    pairs = range_join(
        e, v, "user_id", "user_id", "ts_us", "ts_us", lower=-_RANGE_US, upper=0
    )
    return pairs.groupBy(F.col("l_event_id").alias("event_id")).agg(
        F.count("*").alias("n_views"), F.max("r_ts_us").alias("last_view_us")
    )


_SESSION_GAP_NS = 30 * 60 * 1_000_000_000  # 30 minutes


@query(
    "q_sessionize",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns, value FROM events),
    lagd AS (
        SELECT *, lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
        FROM e
    ),
    flags AS (
        SELECT *, CASE WHEN prev IS NULL OR tns - prev > {_SESSION_GAP_NS}
                       THEN 1 ELSE 0 END AS is_new
        FROM lagd
    ),
    sess AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
        FROM flags
    )
    SELECT user_id,
           CAST(sid AS BIGINT) AS session_idx,
           CAST(min(tns) // 1000000 AS BIGINT) AS session_start_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
    tags=("temporal", "session"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-minute inactivity gap) with
    per-session aggregates — the behavioural-analytics sibling of the
    streaming ``session_window`` query, on exact ns-integer
    timestamps. One shuffle by user + in-partition sort, then a
    session-keyed aggregation that reuses the same partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_ns"), "value"
    )
    s = sessionize(ev, "user_id", "ts_ns", _SESSION_GAP_NS, tiebreak=["event_id"])
    return s.groupBy("user_id", "session_idx").agg(
        F.expr("CAST(min(ts_ns) div 1000000 AS BIGINT)").alias("session_start_ms"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
