"""File-format sources and sinks beyond the primary parquet catalog.

The reference reads only in-memory collections and writes only to a
test sink (``/root/reference/src/main/scala/flink_perf/sinks.scala:9-27``,
``JoinSpec.scala:140``); a real engine needs durable columnar I/O.
Everything here wraps Spark's native readers/writers — the point of
these helpers is to encode the *scale discipline*, not to reimplement
I/O:

* reads take an explicit schema (no ``inferSchema`` full-file
  pre-scan — at 100 TB schema inference is a second job);
* writes default to snappy parquet, the only format the engine
  considers a system of record; CSV/JSON exist for interchange;
* `write_partitioned` hash-lays-out by key columns so downstream
  key-equi-joins and partition-pruned scans skip data;
* `write_bucketed` persists a bucketed table: two datasets bucketed
  the same way join WITHOUT a shuffle (Catalyst sees the bucket spec)
  — the batch analogue of the reference's ``keyBy`` co-location
  (``joins.scala:15-17``).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with an explicit schema (never inferSchema — that is a full
    extra pass over the data before the real job starts)."""
    return spark.read.options(header=str(header).lower(), **options).schema(
        schema
    ).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """JSON-lines with an explicit schema (same inference rule as CSV)."""
    return spark.read.options(**options).schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — schema from footers, pushdown/pruning native."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> None:
    df.write.mode(mode).option("compression", compression).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — like parquet, schema comes from file metadata and
    predicate pushdown / column pruning are native (ORC is the other
    first-class columnar format in Spark's built-in datasources)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> None:
    df.write.mode(mode).option("compression", compression).orc(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet: scans filtered on the partition
    columns prune whole directories (visible as PartitionFilters in the
    plan). Keep partition cardinality moderate (≤ ~10k dirs); high-
    cardinality keys belong in bucketing instead."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | Sequence[str],
    num_buckets: int = 32,
    sort_by: str | Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (``saveAsTable`` — bucket
    metadata lives in the catalog, so joins/aggs on the bucket keys of
    two co-bucketed tables skip the shuffle entirely)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*s)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def stream_write_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Streaming parquet sink with exactly-once file commit via the
    checkpoint log (the durable replacement for the reference's
    synchronized in-memory TestSink1)."""
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: str | Sequence[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files (optionally
    re-sorted for locality), replacing the input atomically via a
    sibling staging directory + rename.

    Small files are the classic lakehouse decay mode — a streaming
    sink or a per-micro-batch append leaves thousands of KB-sized
    files whose open/footer costs dominate scans. Compaction is the
    maintenance pass that restores scan efficiency; at 100 TB it runs
    per PARTITION directory (each partition compacts independently in
    parallel jobs), and a table format (Iceberg/Delta rewrite-files)
    subsumes the swap with a metadata commit.

    LOCAL-filesystem directories only (enforced): the sizing walk and
    the swap use OS primitives. Remote tables (s3://, hdfs://) belong
    to a table format's rewrite — silently mis-sizing them to one
    output file would be a catastrophic single-task rewrite. The swap
    renames the old directory aside, renames staging in, then deletes
    the old. That is CRASH-RECOVERABLE, not reader-atomic: between the
    two renames the path briefly does not exist, and the final delete
    breaks a concurrent reader still scanning old files — the operator
    assumes a single writer and no concurrent readers during the swap
    (true reader atomicity is exactly what a table format's metadata
    commit buys). A crash between the renames leaves the data
    recoverable under one of the two names. Row counts come from the
    staged files' parquet FOOTERS (metadata-only), not a second data
    scan.

    Returns {"files_before", "files_after", "bytes", "rows"}.
    """
    import math
    import shutil

    if "://" in path:
        raise ValueError(
            f"compact_parquet operates on local directories; got {path!r} "
            "— remote tables belong to a table format's rewrite-files"
        )
    path = os.path.abspath(path)

    def _files(p: str) -> list[str]:
        out = []
        for root, _dirs, names in os.walk(p):
            out += [
                os.path.join(root, n)
                for n in names
                if n.endswith(".parquet")
            ]
        return out

    before = _files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    staging = path + ".compacting"
    retired = path + ".compacted-old"
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        # repartitionByRange + sortWithinPartitions: globally range-
        # clustered output files (min/max envelopes narrow per file —
        # the statistics data-skipping consults), without a single-
        # partition global sort
        out = df.repartitionByRange(n_out, *s).sortWithinPartitions(*s)
    else:
        out = df.repartition(n_out)
    try:
        out.write.mode("overwrite").parquet(staging)
        import pyarrow.parquet as pq

        after = _files(staging)
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in after)
        os.rename(path, retired)
        os.rename(staging, path)
    except BaseException:
        # restore the original name first if the swap half-completed
        if not os.path.exists(path) and os.path.exists(retired):
            os.rename(retired, path)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(retired, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total,
        "rows": rows,
    }


_TSV_MAX_ROWS = 100_000


def tsv_lines(
    df: DataFrame,
    tag: str,
    sort_cols: Sequence[str] | None = None,
    max_rows: int = _TSV_MAX_ROWS,
) -> list[str]:
    """Deterministic tagged-TSV debug rendering — the engine's form of
    the reference's O18 debug printers (GenJoinInput.scala:139-220
    print/printAB/printABSeq/printBC/printC), completing that last
    reference surface: every line is ``tag \\t row_index \\t fields...``
    with rows sorted DETERMINISTICALLY first by null-presence of the
    sort columns (absent before present — the reference's
    ``isDefined`` boolean ordering), then by their values nulls-first;
    None renders as the empty string, arrays render ``,``-joined with
    struct fields ``|``-joined (the reference's stringOfA/stringOfB
    convention for nested Seqs).

    Driver-side BY DESIGN — this is a debug/diff printer for test-size
    frames (the reference's printers are test-only dead code in
    production too), so it refuses loudly past ``max_rows`` instead of
    silently truncating a diff surface.
    """
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    cols = list(sort_cols) if sort_cols else list(df.columns)
    order = []
    for c in cols:
        order.append(F.col(c).isNotNull().asc())
        order.append(F.col(c).asc_nulls_first())
    rows = df.orderBy(*order).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"tsv_lines({tag!r}) got more than {max_rows} rows — this "
            "is a test-size debug printer; filter or raise max_rows "
            "explicitly"
        )

    def render(v) -> str:
        if v is None:
            return ""
        # Row before tuple: Row IS a tuple subclass, but structs join
        # with '|' (stringOfA/B) while arrays join with ','
        if isinstance(v, Row):
            return "|".join("" if x is None else str(x) for x in v)
        if isinstance(v, (list, tuple)):
            return ",".join(render(x) for x in v)
        return str(v)

    out_cols = df.columns
    return [
        "\t".join([tag, str(i), *(render(r[c]) for c in out_cols)])
        for i, r in enumerate(rows)
    ]


def debug_print_tsv(
    df: DataFrame,
    tag: str,
    sort_cols: Sequence[str] | None = None,
    max_rows: int = _TSV_MAX_ROWS,
) -> None:
    """Print :func:`tsv_lines` to stdout — the drop-in for the
    reference's ``GenJoinInput.print*`` call sites."""
    for line in tsv_lines(df, tag, sort_cols, max_rows):
        print(line)
