"""Unit tests for the temporal operators (as-of join, range join)."""

from __future__ import annotations

import random

from flink_join_scaling_spark.operators.temporal import asof_join, range_join

L_SCHEMA = "k long, ts long, ltag string"
R_SCHEMA = "k long, ts long, rtag string"


def _py_asof(left, right, tolerance=None):
    out = []
    for lk, lts, ltag in left:
        cands = [r for r in right if r[0] == lk and r[1] <= lts]
        if tolerance is not None:
            cands = [r for r in cands if r[1] >= lts - tolerance]
        best = max(cands, key=lambda r: r[1], default=None)
        out.append((lk, lts, ltag, best[1] if best else None, best[2] if best else None))
    return sorted(out)


def _py_range(left, right, lower, upper):
    return sorted(
        (lk, lts, rk, rts)
        for lk, lts, _ in left
        for rk, rts, _ in right
        if lk == rk and lts + lower <= rts <= lts + upper
    )


def _gen(seed, n, keys=4, tmax=100):
    rng = random.Random(seed)
    return [
        (rng.randrange(keys), rng.randrange(tmax), f"x{i}") for i in range(n)
    ]


def test_asof_join_matches_python_oracle(spark):
    left, right = _gen(1, 40), _gen(2, 40)
    # drop duplicate (k, ts) on the right: with ties the argmax row is
    # implementation-defined; determinism under ties is tested separately
    seen, r2 = set(), []
    for r in right:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            r2.append(r)
    dfl = spark.createDataFrame(left, L_SCHEMA)
    dfr = spark.createDataFrame(r2, R_SCHEMA)
    got = sorted(
        (r.k, r.ts, r.ltag, r.r_ts, r.r_rtag)
        for r in asof_join(dfl, dfr, "k", "ts", "ts").collect()
    )
    assert got == _py_asof(left, r2)


def test_asof_join_tolerance(spark):
    left = [(1, 100, "L")]
    right = [(1, 10, "OLD"), (1, 95, "NEAR")]
    dfl = spark.createDataFrame(left, L_SCHEMA)
    dfr = spark.createDataFrame(right, R_SCHEMA)
    strict = asof_join(dfl, dfr, "k", "ts", "ts", tolerance=3).collect()[0]
    assert strict.r_rtag is None  # 95 is 5 away > 3
    loose = asof_join(dfl, dfr, "k", "ts", "ts", tolerance=10).collect()[0]
    assert loose.r_rtag == "NEAR"


def test_asof_join_inclusive_at_equal_ts(spark):
    dfl = spark.createDataFrame([(1, 50, "L")], L_SCHEMA)
    dfr = spark.createDataFrame([(1, 50, "EQ"), (1, 49, "BEFORE")], R_SCHEMA)
    row = asof_join(dfl, dfr, "k", "ts", "ts").collect()[0]
    assert row.r_rtag == "EQ"


def test_asof_join_no_cross_row_stitching(spark):
    """All matched right columns must come from the SAME right row: when the
    latest right row has a null payload column, that null must NOT be
    back-filled from an older right row (regression for per-column
    last(ignorenulls) stitching)."""
    wide = "k long, ts long, rtag string, rextra string"
    dfl = spark.createDataFrame([(1, 100, "L")], L_SCHEMA)
    dfr = spark.createDataFrame(
        [(1, 10, "A", None), (1, 20, None, "B")], wide
    )
    row = asof_join(dfl, dfr, "k", "ts", "ts").collect()[0]
    # latest right row is (ts=20, rtag=None, rextra='B') — take it verbatim
    assert (row.r_ts, row.r_rtag, row.r_rextra) == (20, None, "B")
    # tolerance window keyed off the matched row's ts, not a stitched one
    tol = asof_join(dfl, dfr, "k", "ts", "ts", tolerance=80).collect()[0]
    assert (tol.r_ts, tol.r_rtag, tol.r_rextra) == (20, None, "B")
    none = asof_join(dfl, dfr, "k", "ts", "ts", tolerance=50).collect()[0]
    assert (none.r_ts, none.r_rtag, none.r_rextra) == (None, None, None)


def test_range_join_matches_python_oracle(spark):
    left, right = _gen(3, 50), _gen(4, 50)
    dfl = spark.createDataFrame(left, L_SCHEMA)
    dfr = spark.createDataFrame(right, R_SCHEMA)
    for lower, upper in [(-10, 10), (0, 25), (-7, -1)]:
        got = sorted(
            (r.l_k, r.l_ts, r.r_k, r.r_ts)
            for r in range_join(
                dfl, dfr, "k", "k", "ts", "ts", lower=lower, upper=upper
            ).collect()
        )
        assert got == _py_range(left, right, lower, upper), (lower, upper)


def test_range_join_no_duplicate_pairs(spark):
    """A pair whose left window spans multiple buckets must appear once."""
    dfl = spark.createDataFrame([(1, 0, "L")] * 1, L_SCHEMA)
    dfr = spark.createDataFrame([(1, t, f"R{t}") for t in range(-30, 31, 5)], R_SCHEMA)
    rows = range_join(dfl, dfr, "k", "k", "ts", "ts", lower=-20, upper=20).collect()
    pairs = [(r.l_ts, r.r_ts) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert sorted(p[1] for p in pairs) == list(range(-20, 21, 5))


def test_range_join_shuffle_not_nested_loop(spark):
    """The physical plan must be an equi-join (hash/sort-merge), never
    BroadcastNestedLoopJoin / CartesianProduct — the whole point of the
    bucketing at scale."""
    dfl = spark.createDataFrame(_gen(5, 30), L_SCHEMA)
    dfr = spark.createDataFrame(_gen(6, 30), R_SCHEMA)
    plan = range_join(dfl, dfr, "k", "k", "ts", "ts", lower=-5, upper=5)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_sessionize_gap_boundary_and_ties(spark):
    """Gap exactly equal to the threshold continues the session (only
    strictly-greater starts a new one); first event per key starts
    session 1; tiebreak pins equal timestamps."""
    from flink_join_scaling_spark.operators.temporal import sessionize

    rows = [
        # user 1: ts 0, 100 (gap=100 == gap -> same session), 201 (gap=101 -> new)
        (1, 10, 0), (1, 11, 100), (1, 12, 201),
        # user 2: single event
        (2, 20, 50),
        # user 1: tie at ts 201 -> ordered by event_id, same session
        (1, 13, 201),
    ]
    df = spark.createDataFrame(rows, "user long, eid long, ts long")
    out = sessionize(df, "user", "ts", gap=100, tiebreak=["eid"])
    got = {(r.user, r.eid): r.session_idx for r in out.collect()}
    assert got == {(1, 10): 1, (1, 11): 1, (1, 12): 2, (1, 13): 2, (2, 20): 1}


def test_gapfill_grid_and_zero_rows(spark):
    """q_gapfill invariants at sf0.001: the grid is exactly
    hours_in_range x distinct_types rows; the non-zero rows equal the
    sparse groupBy; every remaining row is an explicit zero."""
    from pyspark.sql import functions as F

    from flink_join_scaling_spark import plans
    from flink_join_scaling_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["q_gapfill"].fn(spark, sf).toPandas()
    ev = load_table(spark, sf, "events")
    sparse = {
        (r.hour, r.event_type): r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_types = ev.select("event_type").distinct().count()
    hours = sorted(out["hour"].unique())
    assert len(out) == len(hours) * n_types  # dense grid
    got = {(r.hour, r.event_type): r.n for r in out.itertuples()}
    for k, v in sparse.items():
        assert got[k] == v  # observed buckets preserved
    assert sum(1 for v in got.values() if v == 0) == len(got) - len(sparse)


def test_scd2_intervals_collapses_runs_and_flags_current(spark):
    """Hand-built version stream: runs of equal attr collapse, interval
    bounds chain half-open, null attrs compare null-safely, and exactly
    one open (is_current) interval per key."""
    from flink_join_scaling_spark.operators.temporal import scd2_intervals

    rows = [
        # key 1: A A B A  -> [A@10,30) x2, [B@30,40) x1, [A@40,None) x1
        (1, "A", 10, 100),
        (1, "A", 20, 101),
        (1, "B", 30, 102),
        (1, "A", 40, 103),
        # key 2: null null C -> [null@5,25) x2, [C@25,None) x1
        (2, None, 5, 200),
        (2, None, 15, 201),
        (2, "C", 25, 202),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, id long")
    out = scd2_intervals(df, "k", "attr", "ts", tiebreak=["id"])
    got = sorted(
        (
            (r.k, r.attr or "", r.valid_from),
            (r.k, r.attr, r.valid_from, r.valid_to, r.n_versions, r.is_current),
        )
        for r in out.collect()
    )
    got = [g[1] for g in got]
    assert got == [
        (1, "A", 10, 30, 2, False),
        (1, "A", 40, None, 1, True),
        (1, "B", 30, 40, 1, False),
        (2, None, 5, 25, 2, False),
        (2, "C", 25, None, 1, True),
    ]
    # conservation: interval version counts sum back to the input rows
    assert sum(g[4] for g in got) == len(rows)


def test_histogram_constant_column_is_bucket_zero(spark):
    """Degenerate profiling input (all values equal): zero bucket width
    must not divide by zero (ANSI Spark raises) and both engines pin
    the rows to bucket 0 — regression for the vmax == vmin guard."""
    import duckdb

    import flink_join_scaling_spark.plans.relational_ext as rx
    from flink_join_scaling_spark.sources import catalog

    rows = [(1, 5.0, "click"), (2, 5.0, "view"), (3, None, "click")]
    df = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    orig = catalog.load_table
    try:
        catalog.load_table = lambda spark, sf, name: df  # noqa: ARG005
        rx.load_table = catalog.load_table
        got = {
            (r.event_type, r.bucket, r.n)
            for r in rx.q_histogram(spark, "ignored").collect()
        }
    finally:
        catalog.load_table = orig
        rx.load_table = orig
    assert got == {("click", 0, 1), ("view", 0, 1)}
    # the oracle agrees on the same degenerate input
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1, 5.0, 'click'), (2, 5.0, 'view'), (3, NULL, 'click')"
        ") t(event_id, value, event_type)"
    )
    from flink_join_scaling_spark.plans.registry import QUERIES

    du = {tuple(r) for r in con.sql(QUERIES["q_histogram"].oracle).fetchall()}
    assert du == got
