"""Temporal join operators: as-of join and range (interval) join.

The reference's join family is pure equi-join over versioned state
(``/root/reference/src/main/scala/flink_perf/joins.scala:10-70``); these
are the temporal siblings a time-series / training-data engine needs
(SURVEY §2.2 notes their absence from the reference). Both are built
so the *shuffle is an equi-shuffle* — no broadcast-nested-loop, no
cartesian corner:

* :func:`asof_join` — one shuffle on the key, one per-partition sort:
  both sides are unioned, sorted by (key, ts, side), and the latest
  right row is propagated forward with ``last(ignorenulls)`` over a
  running window. O(n log n) per partition, whole-stage codegen, no
  Python. This is the plan you want at 100 TB — the alternative
  (per-key ``merge_asof`` via cogroup/applyInPandas) pays the Arrow
  boundary and Python per group.
* :func:`range_join` — equi-join on (key, time bucket) with the left
  side exploded to the buckets its window spans, then an exact filter.
  Bucket width = window span, so each left row lands in ≤ 2 buckets
  (+1 per extra span multiple) and each (left, right) pair meets in
  exactly one bucket — no dedup needed. Catalyst sees a plain
  shuffled hash/sort-merge join; skew and sizing are AQE's problem,
  exactly as for any other equi-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_list(cols: str | Sequence[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``right_ts <= left_ts`` for the same key (inclusive), left
    rows without a match keep nulls (left-outer semantics).

    ``on`` keys must be non-null on both sides. Timestamps are numeric
    (epoch micros/millis) or naturally ordered types. ``tolerance``
    (same unit as ts) drops matches older than ``left_ts - tolerance``.

    Equivalent SQL (DuckDB)::

        FROM left ASOF LEFT JOIN right
          ON left.k = right.k AND left.ts >= right.ts
    """
    keys = _as_list(on)
    rcols = [c for c in right.columns if c not in keys]
    lcols = [c for c in left.columns]

    # tagged union: side 0 = right (sorts before left at equal ts so
    # ties are inclusive), side 1 = left
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = r_tag.unionByName(l_tag)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Propagate the latest right row as ONE struct so every output column
    # comes from the SAME matched row — per-column last(ignorenulls) would
    # stitch null payload columns from older right rows, emitting composite
    # rows that never existed.
    m_struct = F.struct(
        *[F.col(f"__r_{c}").alias(c) for c in rcols],
        F.col("__ts").alias("__mts"),
    )
    filled = u.select(
        *keys,
        "__ts",
        "__side",
        *[F.col(f"__l_{c}") for c in lcols],
        F.last(F.when(F.col("__side") == 0, m_struct), ignorenulls=True)
        .over(w)
        .alias("__m"),
    ).where(F.col("__side") == 1)

    if tolerance is not None:
        in_tol = F.col("__m").getField("__mts") >= F.col("__ts") - F.lit(tolerance)
        filled = filled.withColumn("__m", F.when(in_tol, F.col("__m")))

    out_cols = (
        [F.col(f"__l_{c}").alias(c) for c in lcols]
        + [F.col("__m").getField(c).alias(f"{right_prefix}{c}") for c in rcols]
    )
    return filled.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str | Sequence[str],
    right_key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Interval equi-join: pairs where
    ``left_ts + lower <= right_ts <= left_ts + upper`` and keys match.

    Implemented as a bucketed equi-join (bucket width = window span):
    the left row explodes to every bucket its window overlaps, the
    right row sits in its own bucket, the join is a plain equi-join on
    (key, bucket), and an exact range filter finishes. No pair can
    match in two buckets (the right bucket is a function of right_ts),
    so no distinct is needed.
    """
    if upper <= lower:
        raise ValueError("need upper > lower")
    lkeys, rkeys = _as_list(left_key), _as_list(right_key)
    span = upper - lower

    lt, rt = F.col("__lts"), F.col("__rts")
    l2 = left.select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
        F.col(left_ts).alias("__lts"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lower)) / F.lit(span)),
                F.floor((lt + F.lit(upper)) / F.lit(span)),
            )
        ),
    )
    r2 = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        F.col(right_ts).alias("__rts"),
    ).withColumn("__bucket", F.floor(rt / F.lit(span)))

    cond = l2["__bucket"] == r2["__bucket"]
    for a, b in zip(lkeys, rkeys):
        cond = cond & (F.col(f"{left_prefix}{a}") == F.col(f"{right_prefix}{b}"))

    joined = l2.join(r2, on=cond, how="inner").where(
        (rt >= lt + F.lit(lower)) & (rt <= lt + F.lit(upper))
    )
    keep = [f"{left_prefix}{c}" for c in left.columns] + [
        f"{right_prefix}{c}" for c in right.columns
    ]
    return joined.select(*keep)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: assign a 1-based ``session_idx`` per
    ``key_col``, starting a new session when the time since the
    previous event exceeds ``gap`` (same units as ``ts_col`` — pass
    integer timestamps for exact arithmetic).

    The batch sibling of ``F.session_window`` (used by the streaming
    surface): one shuffle keyed by ``key_col`` plus an in-partition
    sort, all built-in expressions — the canonical distributed
    sessionization, linear in events per key. ``tiebreak`` columns pin
    a total order for equal timestamps so the plan is deterministic.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(key_col).orderBy(*order)
    flagged = df.withColumn(
        "__new_session",
        F.when(
            F.lag(F.col(ts_col)).over(w).isNull()
            | ((F.col(ts_col) - F.lag(F.col(ts_col)).over(w)) > F.lit(gap)),
            1,
        ).otherwise(0),
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_idx", F.sum("__new_session").over(wcum).cast("long")
    ).drop("__new_session")


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse a versioned stream into SCD2 validity intervals
    (slowly-changing-dimension type-2 history construction).

    Per ``key_col``, versions ordered by ``(ts_col, *tiebreak)`` are
    run-length compressed on ``attr_col`` (null-safe equality):
    consecutive versions carrying the same attribute merge into one
    interval row ``(key, attr, valid_from, valid_to, n_versions,
    is_current)`` where ``valid_to`` is the next interval's
    ``valid_from`` (half-open ``[from, to)`` convention; null on the
    open current interval, flagged ``is_current``).

    This is the warehouse-history face of the reference's versioned
    record model (``versionDeduplicator.scala:13-108`` keeps only the
    newest version; SCD2 keeps the full change history but compacted
    to *distinct* states): the islands trick sessionize uses for time
    gaps applied to value changes. Two shuffles, both keyed by
    ``key_col`` (change detection + interval ordering; the groupBy
    rides the same partitioning), per-key work linear in versions —
    keys parallelize, so the shape holds at 100 TB. Pass an integer
    ``ts_col`` for exact cross-engine arithmetic.

    Null-timestamp versions are DROPPED: a version without a timestamp
    has no place on the validity axis, and every consumer (the
    streaming sibling ``streaming.dedup.stream_scd2_intervals``, the
    DuckDB oracle) applies the same rule — engines disagree on null
    ordering (Spark ASC is NULLS FIRST, DuckDB NULLS LAST), so
    admitting them would make the segmentation engine-dependent.
    """
    df = df.where(F.col(ts_col).isNotNull())
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(key_col).orderBy(*order)
    # IS DISTINCT FROM semantics: first row (lag null vs non-null attr)
    # opens a segment; a null attr only differs from a non-null one
    chg = F.when(
        F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col)), 0
    ).otherwise(1)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = df.withColumn("__chg", chg).withColumn(
        "__seg", F.sum("__chg").over(wcum)
    )
    # attr is constant within a segment by construction (the null-safe
    # equality chain), so min() is a deterministic pick of that value
    intervals = seg.groupBy(key_col, "__seg").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_versions"),
    )
    wlead = Window.partitionBy(key_col).orderBy("__seg")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(wlead))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__seg")
    )
