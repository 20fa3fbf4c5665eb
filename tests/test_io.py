"""Round-trip and plan tests for the I/O layer (sources/io.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_join_scaling_spark.sources import io
from flink_join_scaling_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_csv_json_roundtrip(spark, tmp_path):
    n = load_table(spark, SF_SMALL, "nation")
    want = sorted(tuple(r) for r in n.collect())
    schema = n.schema

    io.write_csv(n, str(tmp_path / "csv"))
    got_csv = io.read_csv(spark, str(tmp_path / "csv"), schema)
    assert sorted(tuple(r) for r in got_csv.collect()) == want

    io.write_json(n, str(tmp_path / "json"))
    got_json = io.read_json(spark, str(tmp_path / "json"), schema)
    assert sorted(tuple(r) for r in got_json.collect()) == want


def test_partitioned_write_prunes(spark, tmp_path):
    c = load_table(spark, SF_SMALL, "customer")
    io.write_partitioned(c, str(tmp_path / "p"), "c_mktsegment")
    back = io.read_parquet(spark, str(tmp_path / "p"))
    assert back.count() == c.count()
    filtered = back.where(F.col("c_mktsegment") == "BUILDING")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # the segment predicate must be a partition filter (directory
    # pruning), not a data filter
    assert "PartitionFilters" in plan and "c_mktsegment" in plan.split("PartitionFilters")[1].split("]")[0]
    exp = c.where(F.col("c_mktsegment") == "BUILDING").count()
    assert filtered.count() == exp


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with no
    Exchange on either side — the co-located join the reference gets
    from keyBy co-partitioning."""
    c = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    io.write_bucketed(c, "t_cust_b", "c_custkey", 8, path=str(tmp_path / "c"))
    io.write_bucketed(o, "t_ord_b", "o_custkey", 8, path=str(tmp_path / "o"))
    tc, to = spark.table("t_cust_b"), spark.table("t_ord_b")
    joined = tc.join(to, tc["c_custkey"] == to["o_custkey"])
    # disable broadcast so the co-location is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_stream_parquet_sink(spark, tmp_path):
    from flink_join_scaling_spark.streaming import chunked_parquet_stream

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "id long, v long"
    )
    s = chunked_parquet_stream(spark, df, str(tmp_path / "in"), n_chunks=2)
    q = io.stream_write_parquet(
        s, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    back = io.read_parquet(spark, str(tmp_path / "out"))
    assert sorted(tuple(r) for r in back.collect()) == [
        (i, i * 10) for i in range(20)
    ]


def test_events_loader_handles_both_timestamp_layouts(spark, tmp_path):
    """The testdata generator has shipped events.ts both as parquet
    TIMESTAMP(NANOS) and as plain timestamp[us] across regenerations
    (the round-3 incident): load_table must expose the same logical
    schema — µs TimestampType `ts` + epoch-nanos LongType `ts_ns` —
    for either physical layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, TimestampType

    from flink_join_scaling_spark.sources.catalog import load_table

    us = [1704067200_000000, 1704067260_500000]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    }
    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    d_us.mkdir()
    d_ns.mkdir()
    pq.write_table(
        pa.table({**cols, "ts": pa.array(us, pa.timestamp("us"))}),
        str(d_us / "events.parquet"),
    )
    pq.write_table(
        pa.table({**cols, "ts": pa.array([u * 1000 for u in us], pa.timestamp("ns"))}),
        str(d_ns / "events.parquet"),
        version="2.6",
    )

    for sf_dir in (str(d_us), str(d_ns)):
        ev = load_table(spark, sf_dir, "events")
        assert isinstance(ev.schema["ts"].dataType, TimestampType), sf_dir
        assert isinstance(ev.schema["ts_ns"].dataType, LongType), sf_dir
        rows = {r.event_id: r.ts_ns for r in ev.collect()}
        assert rows == {1: us[0] * 1000, 2: us[1] * 1000}, sf_dir


def test_table_cache_invalidates_on_regeneration(spark, tmp_path):
    """The _DF_CACHE plan memo must not outlive an in-place testdata
    regeneration within one Spark application: a cached plan snapshots
    the parquet file listing, so serving it after the file is replaced
    reads deleted/stale data. The cache keys on file mtime to detect
    the rewrite."""
    import os
    import time

    path = tmp_path / "region.parquet"
    spark.createDataFrame([(1, "AAA", "x")], "r_regionkey long, r_name string, r_comment string").write.parquet(str(path))
    first = load_table(spark, str(tmp_path), "region")
    assert first.count() == 1
    # same Spark app, same path: returns the identical cached plan
    assert load_table(spark, str(tmp_path), "region") is first

    time.sleep(0.01)  # ensure a distinct mtime even on coarse clocks
    spark.createDataFrame(
        [(1, "AAA", "x"), (2, "BBB", "y")],
        "r_regionkey long, r_name string, r_comment string",
    ).write.mode("overwrite").parquet(str(path))
    os.utime(path)  # directory mtime, the regeneration signal
    fresh = load_table(spark, str(tmp_path), "region")
    assert fresh is not first
    assert fresh.count() == 2


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink parity with parquet: same rows, schema, and
    pushdown-capable columnar format — the second lakehouse format the
    engine reads natively (no extra packages)."""
    n = load_table(spark, SF_SMALL, "nation")
    path = str(tmp_path / "nation_orc")
    io.write_orc(n, path)
    back = io.read_orc(spark, path)
    assert back.schema == n.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))
    # predicate pushdown reaches the ORC scan like parquet
    plan = back.where(back.n_nationkey == 3)._jdf.queryExecution().executedPlan().toString()
    assert "n_nationkey" in plan


def test_events_queries_identical_across_timestamp_layouts(spark, tmp_path):
    """The r3 catastrophe armor, end to end: four representative
    events QUERIES (tumbling window, multi-resolution rollup,
    stream-join pairing, versioned dedup) produce IDENTICAL results
    whether events.parquet ships as TIMESTAMP(NANOS) (the current
    generation) or plain timestamp[us] (the other historical layout),
    because the catalog normalizes both to (ts timestamp, ts_ns long).
    Sub-microsecond precision is absent from the generator, so even
    ts_ns-derived values agree exactly."""
    import os
    import shutil

    from flink_join_scaling_spark import plans
    from flink_join_scaling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    sf = SF_SMALL
    alt = str(tmp_path / "alt_sf")
    os.makedirs(alt)
    # rewrite events in the us layout (Spark writes TIMESTAMP_NTZ as
    # int64 micros); other tables link through unchanged
    ev = load_table(spark, sf, "events")
    ev.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.parquet(os.path.join(alt, "events.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(f"{sf}/{t}.parquet", os.path.join(alt, f"{t}.parquet"))

    for name in ("q_stream_tumbling", "q_rollup_multires", "q_stream_join",
                 "q_stream_dedup", "q_zorder_layout"):
        fn = plans.QUERIES[name].fn
        a = sorted(map(tuple, fn(spark, sf).collect()))
        b = sorted(map(tuple, fn(spark, alt).collect()))
        assert a == b and len(a) > 0, name
    shutil.rmtree(alt)


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    """Small-file compaction: 40 tiny files collapse to the computed
    target count, content identical, input replaced atomically."""
    p = str(tmp_path / "frag")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "id long, v string"
    )
    df.repartition(40).write.parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = io.compact_parquet(spark, p, target_file_bytes=1 << 30)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1  # everything fits one target file
    assert stats["rows"] == 2000
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before
    assert not os.path.exists(p + ".compacting")


def test_compact_parquet_sorted_narrows_file_envelopes(spark, tmp_path):
    """sort_by clusters the output by range: each compacted file's
    (min, max) id envelope is disjoint, which is what statistics
    data-skipping prunes on."""
    p = str(tmp_path / "frag")
    df = spark.createDataFrame([(i,) for i in range(4000)], "id long")
    # write deliberately scrambled across files
    df.orderBy(F.expr("hash(id)")).repartition(20).write.parquet(p)
    io.compact_parquet(spark, p, target_file_bytes=12_000, sort_by="id")
    per_file = (
        spark.read.parquet(p)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    assert len(per_file) > 1
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo  # disjoint envelopes: range-clustered files


def test_tsv_lines_reference_printer_semantics(spark):
    """O18 parity: tag + 0-based index prefix, null-presence-first
    deterministic ordering (absent rows sort before present — the
    reference's isDefined ordering), '' for None, '|'-joined struct
    fields inside ','-joined arrays, and a loud refusal past max_rows."""
    import pytest

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (2, "x", [(20, "b"), (21, "c")]),
            (1, "y", [(10, "a")]),
            (3, None, []),
        ],
        "id long, name string, items array<struct<n: long, s: string>>",
    ).withColumn(
        "name", F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("name"))
    )
    lines = io.tsv_lines(df, "tagA", sort_cols=["name", "id"])
    assert lines == [
        "tagA\t0\t3\t\t",           # null name sorts first (absent-first)
        "tagA\t1\t2\tx\t20|b,21|c",
        "tagA\t2\t1\ty\t10|a",
    ]
    with pytest.raises(ValueError, match="debug printer"):
        io.tsv_lines(df, "tagA", max_rows=2)
