"""Persisted IVF index as CELL-PARTITIONED parquet: partition pruning
IS the ANN index.

The build writes each corpus vector (plus its precomputed L2 norm)
into ``index_dir/cells/cell=<j>/`` via ``partitionBy("cell")`` and the
trained centroid list to ``index_dir/centroids``. A query batch then
probes its ``nprobe`` nearest cells and reads the cell table with a
``cell IN (...)`` predicate — Spark's partition pruning turns that
into a directory-level file skip, so a 100 TB index serves a query
batch by scanning only ``nprobe / num_cells`` of its bytes, with no
custom storage engine: the lakehouse layout is the index structure
(the same idea as Z-order/bucketing in ``plans/layout.py``, applied
to vector search). Tested: the probed scan's input files lie entirely
inside the probed cell directories (``test_ann_index.py``).

Build once / query many is the deployment shape the in-session
:func:`~flink_join_scaling_spark.operators.similarity.ann_ivf_topk`
cannot offer — there the assignment pass reruns per job; here it is
amortized into the layout, and incremental corpus top-ups append new
rows into their cells without touching existing files (the
``operators/incremental.py`` discipline applied to ANN).

With ``pq=`` codebooks the cell files additionally carry a ``codes``
column (product quantization, ~4 B/vector at m=8/nbits=4) and
``ivf_index_topk(adc=True)`` serves queries by scanning ONLY the
(id, codes) columns of the probed cells — partition pruning picks the
cells, columnar projection skips the float payload, and an exact
re-rank fetches just the shortlist ids: the complete FAISS IVF-PQ
read path expressed as lakehouse layout + Catalyst pruning.

Same determinism contract as the similarity module: assignments rank
cells by round-6 cosine with ties to the lower cell id, centroid
training is the deterministic md5-sampled spherical k-means, and
query scoring reuses the Arrow-vectorized e6-integer cosine with
(query_id, cosine_e6 DESC, vec_id) total-order ranking.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_join_scaling_spark.operators.similarity import (
    _adc_shortlist,
    _pq_query_luts,
    _probe_and_rank,
    ivf_cells_pandas,
    ivf_centroids,
    ivf_centroids_kmeans,
    pq_encode,
    pq_train,
)


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "meta.json")


def ivf_index_build(
    vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    train: bool = True,
    mode: str = "overwrite",
    pq: dict | None = None,
) -> dict:
    """Build (or append to) the partitioned IVF index.

    Centroid training is sample-bounded on the driver
    (:func:`ivf_centroids_kmeans`); the corpus-sized work — cell
    assignment and the partitioned write — stays distributed. With
    ``mode="append"`` the existing centroid list AND the stored meta
    (num_cells, id_col, vec_col, pq codebooks) are REUSED — the
    caller's arguments for those are ignored, because an index's cell
    space and column schema must stay fixed across top-ups or old and
    new rows disagree about what a cell/column means; a batch lacking
    the stored columns raises instead of silently null-filling. New
    vectors land in their cells as new files.

    ``pq`` (e.g. ``{"m": 8, "nbits": 4}``) additionally trains
    product-quantization codebooks (stored in meta) and writes a
    ``codes`` column next to each vector — parquet is columnar, so the
    ADC query path (``ivf_index_topk(adc=True)``) scans ONLY the
    (id, codes) columns of the probed cells: at m=8/nbits=4 that is
    ~4 B/vector instead of the float payload, the FAISS IVF-PQ read
    shape on top of the same cell-pruned layout.

    Returns the meta dict (num_cells, id/vec column names, trained).
    """
    cells_dir = os.path.join(index_dir, "cells")
    spark = vectors.sparkSession
    if mode == "append" and os.path.exists(_meta_path(index_dir)):
        meta = json.loads(open(_meta_path(index_dir)).read())
        # the stored schema WINS over the caller's arguments: appended
        # files must carry the same column names as the existing cell
        # files, or parquet schema merging silently null-fills — the
        # exact corruption the meta exists to prevent
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        missing = {id_col, vec_col} - set(vectors.columns)
        if missing:
            raise ValueError(
                f"append batch lacks the index's columns {sorted(missing)}; "
                f"the index was built with id_col={id_col!r}, "
                f"vec_col={vec_col!r}"
            )
        # names matching is not enough: a float batch appended to a
        # double index (or a different id type) writes files whose
        # parquet schema diverges from existing cells — inconsistent
        # schema merging / matmul failures at QUERY time, far from the
        # write that caused them. Fail at the write instead.
        if "cells_schema" in meta:
            from pyspark.sql.types import StructType

            stored = StructType.fromJson(json.loads(meta["cells_schema"]))
            for c in (id_col, vec_col):
                want, got = stored[c].dataType, vectors.schema[c].dataType
                if want != got:
                    raise ValueError(
                        f"append batch column {c!r} has type "
                        f"{got.simpleString()} but the index stores "
                        f"{want.simpleString()}"
                    )
        cents = [
            {"cell": r.cell, "cvec": list(r.cvec)}
            for r in spark.read.parquet(
                os.path.join(index_dir, "centroids")
            ).collect()
        ]
        cents.sort(key=lambda c: c["cell"])
        # dimension check (first row is enough to catch a wrong-model
        # batch cheaply; a mixed-dim batch still fails loudly in the
        # assignment matmul)
        dim = len(cents[0]["cvec"]) if cents else None
        first = vectors.select(F.size(F.col(vec_col)).alias("n")).first()
        if dim is not None and first is not None and first.n != dim:
            raise ValueError(
                f"append batch vectors have dimension {first.n} but the "
                f"index's centroids are {dim}-dimensional"
            )
    else:
        cents_fn = ivf_centroids_kmeans if train else ivf_centroids
        cents = cents_fn(vectors, id_col, vec_col, num_cells)
        # the index's cell labels are its OWN namespace: always dense
        # ints 0..n-1 (the untrained seeds label cells with raw vector
        # ids, which may be strings — unusable as a partition value
        # schema and irrelevant to a persisted index)
        cents = [
            {"cell": j, "cvec": [float(x) for x in c["cvec"]]}
            for j, c in enumerate(cents)
        ]
        meta = {
            "num_cells": num_cells,
            "id_col": id_col,
            "vec_col": vec_col,
            "trained": bool(train),
        }
        if pq:
            meta["pq"] = pq_train(
                vectors, id_col=id_col, vec_col=vec_col,
                m=pq.get("m", 8), nbits=pq.get("nbits", 4),
            )
        spark.createDataFrame(
            [(int(c["cell"]), [float(x) for x in c["cvec"]]) for c in cents],
            "cell int, cvec array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "centroids")
        )
        os.makedirs(index_dir, exist_ok=True)
    assigned = ivf_cells_pandas(
        vectors, id_col, vec_col, meta["num_cells"], nprobe=1, centroids=cents
    ).select(id_col, vec_col, "l2_norm", "cell")
    if meta.get("pq"):
        # stored codebooks win in append mode for the same reason the
        # centroid list does: codes are only comparable within one
        # quantizer. The join-back is keyed by id — one build-time
        # shuffle, amortized like the assignment itself.
        codes = pq_encode(vectors, meta["pq"], id_col=id_col, vec_col=vec_col)
        assigned = assigned.join(codes, id_col)
    # the cell schema rides in meta so a fully-purged index (every row
    # deleted → no parquet files left) still reads as EMPTY instead of
    # failing schema inference
    meta["cells_schema"] = assigned.schema.json()
    assigned.write.mode(
        "append" if mode == "append" else "overwrite"
    ).partitionBy("cell").parquet(cells_dir)
    # meta is the index's commit marker: written LAST (after the cell
    # write succeeded), via temp-file + atomic rename, so a crashed
    # fresh build has NO meta (readers error loudly instead of serving
    # a partial/empty index as if complete)
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))
    return meta


def ivf_index_cells(spark: SparkSession, index_dir: str) -> DataFrame:
    """The raw cell table (id, vec, l2_norm, cell) — partition-pruned
    when filtered on ``cell``. A fully-purged index (no cell
    directories remain after deletions) reads as an EMPTY table with
    the schema stored at build time, not a schema-inference error."""
    cells_dir = os.path.join(index_dir, "cells")
    has_cells = os.path.isdir(cells_dir) and any(
        e.startswith("cell=") for e in os.listdir(cells_dir)
    )
    if not has_cells:
        from pyspark.sql.types import StructType

        meta = json.loads(open(_meta_path(index_dir)).read())
        if "cells_schema" not in meta:
            raise FileNotFoundError(
                f"no cell data under {cells_dir} and the index meta "
                "predates schema persistence — rebuild the index"
            )
        schema = StructType.fromJson(json.loads(meta["cells_schema"]))
        return spark.createDataFrame([], schema)
    return spark.read.parquet(cells_dir)


def ivf_index_topk(
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    nprobe: int = 2,
    exclude_self: bool = True,
    adc: bool = False,
    refine_factor: int = 16,
) -> DataFrame:
    """Approximate top-k against the persisted index.

    The query batch is assigned to its ``nprobe`` nearest cells with
    the index's OWN centroids (loaded from the index — never re-derived
    from the queries, which would probe a different partition of the
    corpus). The cell scan carries ``cell IN (<probed>)``: partition
    pruning reads only the probed directories, which is the entire
    point of the layout. Scoring and ranking share the similarity
    module's exact tail (``_probe_and_rank``) with the in-session
    ``ann_ivf_topk``, so the two paths cannot drift.

    ``adc=True`` (requires a ``pq=``-built index) is the FAISS IVF-PQ
    read shape: the probed-cell scan selects ONLY the (id, codes)
    columns — parquet's columnar layout means the float vectors are
    never read during the scan, ~4 B/vector at m=8/nbits=4 — scores
    by per-query lookup tables, and re-ranks the ADC
    ``refine_factor × k`` shortlist by exact cosine against one more
    probed-cell scan filtered to the shortlist ids (predicate pushdown
    does the fetch-by-id). Both stages stay inside the probed cells,
    so ADC composes WITH partition pruning, not instead of it.

    ``exclude_self`` drops query_id == vec_id pairs — the right
    convention when the queries ARE corpus members (dedup-style use);
    pass ``False`` for a foreign query batch whose id space merely
    collides with corpus ids, or its true nearest neighbors would be
    silently filtered.

    The probed-cell set is collected to build the pruning predicate —
    bounded by ``num_cells`` (an index parameter, not data-sized); the
    probe assignment is pinned first so the collect and the join don't
    run the NumPy assignment twice.
    """
    spark = queries.sparkSession
    meta = json.loads(open(_meta_path(index_dir)).read())
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cents = [
        {"cell": r.cell, "cvec": list(r.cvec)}
        for r in spark.read.parquet(
            os.path.join(index_dir, "centroids")
        ).collect()
    ]
    cents.sort(key=lambda c: c["cell"])
    probes = ivf_cells_pandas(
        queries, id_col, vec_col, meta["num_cells"], nprobe=nprobe,
        centroids=cents,
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("vq"),
        F.col("l2_norm").alias("nq"),
        "cell",
    ).localCheckpoint(eager=True)
    probed_cells = sorted(
        r.cell for r in probes.select("cell").distinct().collect()
    )
    pruned = ivf_index_cells(spark, index_dir).where(
        F.col("cell").isin(probed_cells)
    )
    if adc:
        if not meta.get("pq"):
            raise ValueError(
                "adc=True requires an index built with pq= codebooks"
            )
        from flink_join_scaling_spark.functions.vectors import (
            cosine_e6_pandas,
            l2_norm_expr,
        )
        from flink_join_scaling_spark.operators.similarity import _ranked

        qids, luts = _pq_query_luts(queries, meta["pq"], id_col, vec_col)
        shortlist = max(k, refine_factor * k)
        # pin the shortlist: it feeds both the refine join and (as a
        # broadcast) the float fetch — without the pin the ADC scan
        # would run twice
        ranked = _adc_shortlist(
            pruned.select(F.col(id_col), "codes"),
            qids, luts, meta["pq"]["m"], shortlist,
            id_col=id_col, exclude_self=exclude_self,
        ).localCheckpoint(eager=True)
        cand = F.broadcast(ranked.select("query_id", "vec_id"))
        # fetch-by-id inside the probed cells: a broadcast semi-join
        # restricts the float column to shortlist rows right behind the
        # scan (a literal id IN (...) predicate would push into parquet
        # row-group stats, but a thousands-element literal costs more
        # in planning than it saves on scattered ids; a table format
        # with point lookups subsumes this fetch in production)
        fetched = pruned.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vc"),
            F.col("l2_norm").alias("nc"),
        ).join(F.broadcast(ranked.select("vec_id").distinct()), "vec_id", "semi")
        qdf = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq")
        ).withColumn("nq", l2_norm_expr("vq"))
        pairs = (
            fetched.join(cand, "vec_id")
            .join(F.broadcast(qdf), "query_id")
            .select(
                "query_id",
                "vec_id",
                cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
            )
        )
        return _ranked(pairs, k).select("query_id", "vec_id", "cosine_e6", "rank")
    idx = pruned.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vc"),
        F.col("l2_norm").alias("nc"),
        "cell",
    )
    return _probe_and_rank(idx, probes, k, exclude_self=exclude_self)


def ivf_index_delete(
    spark: SparkSession, index_dir: str, ids: list | DataFrame
) -> int:
    """Deletion propagation (right-to-be-forgotten) on the persisted
    index: remove the given ids and rewrite ONLY the cell partitions
    that contained them.

    One pruned-to-nothing full scan finds the affected cells (an
    id→cell sidecar would avoid even that; at this index's scale the
    scan is the simpler correct choice), then the surviving rows of
    just those cells are rewritten under dynamic partition overwrite —
    untouched cells' files are never read back or rewritten, which is
    what makes per-document deletion affordable on a 100 TB index. A
    cell whose every member is deleted writes no replacement rows, so
    dynamic overwrite would leave its old files; those directories are
    removed explicitly (a table format with delete support — Iceberg /
    Delta — subsumes this step in production).

    Returns the number of index rows deleted (duplicate requested ids
    count once — each index row is removed once).
    """
    import shutil

    from pyspark.sql.types import StructField, StructType

    meta = json.loads(open(_meta_path(index_dir)).read())
    id_col = meta["id_col"]
    cells_dir = os.path.join(index_dir, "cells")
    tbl = ivf_index_cells(spark, index_dir)
    if isinstance(ids, DataFrame):
        ids_df = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    else:
        # the id column keeps the INDEX's own type (string ids build
        # and query fine, so they must delete fine too) and the list
        # is deduped — a duplicated request must not fan out the join
        # and overcount the return value
        id_type = tbl.schema[id_col].dataType
        ids_df = spark.createDataFrame(
            [(i,) for i in dict.fromkeys(ids)],
            StructType([StructField(id_col, id_type)]),
        )
    doomed = tbl.join(F.broadcast(ids_df), id_col)
    # ONE full-scan job yields both the affected cell set and the
    # deleted-row count (the docstring's single-scan claim)
    per_cell = doomed.groupBy("cell").count().collect()
    affected = sorted(r.cell for r in per_cell)
    if not affected:
        return 0
    n_deleted = sum(r["count"] for r in per_cell)
    survivors = (
        tbl.where(F.col("cell").isin(affected))
        .join(F.broadcast(ids_df), id_col, "left_anti")
        # localCheckpoint: the overwrite below deletes the very files
        # this frame reads — pin the rows first or the write races its
        # own input
        .localCheckpoint(eager=True)
    )
    nonempty = {r.cell for r in survivors.select("cell").distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy("cell").parquet(cells_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for cell in affected:
        if cell not in nonempty:
            shutil.rmtree(
                os.path.join(cells_dir, f"cell={cell}"), ignore_errors=True
            )
    return n_deleted


def ivf_index_compact(
    spark: SparkSession,
    index_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Maintenance pass closing the index lifecycle
    (build → append → delete → COMPACT): fold each cell directory's
    append-accumulated small files into ``ceil(bytes/target)`` files.

    Every ``mode="append"`` top-up lands new files in existing cell
    directories, and dynamic-overwrite deletion rewrites survivors as
    fresh files — after enough cycles a cell is hundreds of KB-sized
    parquet files whose open/footer costs dominate the probe scan.
    Compaction runs :func:`~flink_join_scaling_spark.sources.io.
    compact_parquet` PER CELL directory, so the partition layout —
    which IS the index (pruning reads nprobe/num_cells of the bytes) —
    is untouched: rows never move between cells, ``cell=`` directory
    names never change, and a cell already at ``min_files`` or fewer
    files is skipped (nothing to fold). At 100 TB each cell compacts
    independently — embarrassingly parallel maintenance, and a table
    format's rewrite-files subsumes the swap with a metadata commit.

    Returns {"cells_compacted", "files_before", "files_after"}
    (skipped cells count in neither files total).
    """
    from flink_join_scaling_spark.sources.io import compact_parquet

    cells_dir = os.path.join(index_dir, "cells")
    if not os.path.exists(_meta_path(index_dir)):
        raise FileNotFoundError(f"no index meta under {index_dir}")
    done = {"cells_compacted": 0, "files_before": 0, "files_after": 0}
    if not os.path.isdir(cells_dir):
        return done  # fully-purged index: nothing to compact
    for entry in sorted(os.listdir(cells_dir)):
        cell_dir = os.path.join(cells_dir, entry)
        if not entry.startswith("cell=") or not os.path.isdir(cell_dir):
            continue
        n_files = sum(
            1
            for f in os.listdir(cell_dir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if n_files <= min_files:
            continue
        stats = compact_parquet(spark, cell_dir, target_file_bytes)
        done["cells_compacted"] += 1
        done["files_before"] += stats["files_before"]
        done["files_after"] += stats["files_after"]
    return done
