"""Persisted IVF index (operators/ann_index.py): build → query across
sessions-of-use, partition pruning as the index structure, append
top-ups in a fixed cell space, and recall against brute force.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_join_scaling_spark.operators.ann_index import (
    ivf_index_build,
    ivf_index_cells,
    ivf_index_topk,
)
from flink_join_scaling_spark.operators.similarity import cosine_topk
from flink_join_scaling_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )


def test_build_then_query_matches_recall_gate(spark, tmp_path):
    """End-to-end: build the partitioned index, query the first 20
    vectors, and require recall@5 ≥ 0.6 vs exact brute force (nprobe=2
    of 8 cells — the approximate trade the in-session ann_ivf_topk
    makes, now amortized into a persisted layout)."""
    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    meta = ivf_index_build(e, idx, num_cells=8, train=True)
    assert meta["num_cells"] == 8
    queries = e.where(F.col("vec_id") < 20)
    got = ivf_index_topk(queries, idx, k=5, nprobe=2).collect()
    approx = {}
    for r in got:
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    exact = {}
    for r in cosine_topk(e, queries, "vec_id", "embedding", k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_partition_pruning_reads_only_probed_cells(spark, tmp_path):
    """The layout claim itself: the probed scan's input files all live
    under the probed cell directories — partition pruning skips every
    other cell's data at the FILE level, which is what makes the
    persisted index serve queries in nprobe/num_cells of the bytes."""
    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_index_build(e, idx, num_cells=8, train=False)
    probed = [1, 3]
    scan = ivf_index_cells(spark, idx).where(F.col("cell").isin(probed))
    files = scan.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert files, "pruned scan returned no files"
    for r in files:
        assert any(f"cell={c}/" in r.f for c in probed), r.f
    # and the pruned scan reads strictly fewer files than the full one
    all_files = ivf_index_cells(spark, idx).select(
        F.input_file_name().alias("f")
    ).distinct().count()
    assert len(files) < all_files


def test_append_topup_keeps_cell_space_and_serves_new_vectors(spark, tmp_path):
    """Incremental top-up: mode="append" reuses the stored centroids
    (the cell space must stay fixed across builds) and the appended
    vectors become findable — an exact duplicate of a new vector ranks
    first for it."""
    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    base = e.where(F.col("vec_id") % 2 == 0)
    ivf_index_build(base, idx, num_cells=4, train=True)
    n_before = ivf_index_cells(spark, idx).count()

    topup = e.where(F.col("vec_id") % 2 == 1)
    meta = ivf_index_build(topup, idx, mode="append")
    assert meta["num_cells"] == 4  # reused, not retrained
    n_after = ivf_index_cells(spark, idx).count()
    assert n_after == n_before + topup.count()

    # query an odd (appended) vector: its identical twin is itself —
    # excluded — but its own cell must now contain it for OTHER queries
    some_odd = topup.limit(1)
    [q] = some_odd.collect()
    got = ivf_index_topk(some_odd, idx, k=3, nprobe=2).collect()
    assert got and all(r.query_id == q.vec_id for r in got)
    assert all(r.vec_id != q.vec_id for r in got)  # self excluded


def test_append_without_meta_builds_fresh(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    meta = ivf_index_build(e, idx, num_cells=4, mode="append", train=False)
    assert meta["num_cells"] == 4
    assert os.path.exists(os.path.join(idx, "meta.json"))
    assert ivf_index_cells(spark, idx).count() == e.count()


def test_append_reuses_stored_columns_and_rejects_mismatch(spark, tmp_path):
    """The stored meta wins on append: a batch carrying only the wrong
    column names raises instead of writing null-filled parquet."""
    import pytest

    idx = str(tmp_path / "ivf")
    e = _emb(spark).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("emb")
    )
    ivf_index_build(
        e, idx, id_col="doc_id", vec_col="emb", num_cells=4, train=False
    )
    wrong = _emb(spark)  # columns vec_id/embedding, not doc_id/emb
    with pytest.raises(ValueError, match="built with id_col='doc_id'"):
        ivf_index_build(wrong, idx, mode="append")
    # a conforming batch appends fine even with default args — the
    # stored id/vec column names are used, not the signature defaults
    more = e.withColumn("doc_id", F.col("doc_id") + F.lit(100000))
    meta = ivf_index_build(more, idx, mode="append")
    assert meta["id_col"] == "doc_id" and meta["num_cells"] == 4
    assert ivf_index_cells(spark, idx).count() == 2 * e.count()


def test_foreign_query_batch_keeps_colliding_ids(spark, tmp_path):
    """exclude_self=False: a foreign query whose id collides with a
    corpus vec_id can still retrieve it — with exclude_self=True an
    identical twin sharing the id would be silently dropped."""
    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_index_build(e, idx, num_cells=4, train=False)
    # the foreign batch: corpus vector 3's exact embedding, under id 3
    foreign = e.where(F.col("vec_id") == 3)
    got = ivf_index_topk(foreign, idx, k=1, nprobe=2, exclude_self=False)
    [r] = got.collect()
    assert (r.query_id, r.vec_id) == (3, 3)  # its own twin ranks first
    excl = ivf_index_topk(foreign, idx, k=1, nprobe=2).collect()
    assert all(x.vec_id != 3 for x in excl)


def test_streaming_ingest_appends_into_index(streaming_spark, tmp_path):
    """The continuous-ingestion loop: micro-batches land in the
    persisted index through foreachBatch(ivf_index_build mode=append)
    — the stored cell space absorbs each batch, and after the stream
    drains the index serves every streamed vector. No new operator:
    the append path IS the streaming sink."""
    from flink_join_scaling_spark.streaming import chunked_parquet_stream

    spark = streaming_spark
    idx = str(tmp_path / "ivf")
    e = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    seed = e.where(F.col("vec_id") < 100)
    ivf_index_build(seed, idx, num_cells=4, train=True)

    arriving = e.where(F.col("vec_id") >= 100)
    s = chunked_parquet_stream(spark, arriving, str(tmp_path / "src"), n_chunks=3)
    q = (
        s.writeStream.foreachBatch(
            lambda batch, _i: ivf_index_build(batch, idx, mode="append")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert ivf_index_cells(spark, idx).count() == e.count()
    # a streamed vector is served: query one and get real neighbors
    streamed_one = arriving.orderBy("vec_id").limit(1)
    got = ivf_index_topk(streamed_one, idx, k=3, nprobe=2).collect()
    assert len(got) == 3


def test_delete_propagation_rewrites_only_affected_cells(spark, tmp_path):
    """Right-to-be-forgotten: deleted ids vanish from the index, only
    their cells' files change (untouched cells keep their exact file
    set), and a fully-emptied cell's directory disappears."""
    import os as _os

    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_index_build(e, idx, num_cells=4, train=False)
    from flink_join_scaling_spark.operators.ann_index import ivf_index_delete

    tbl = ivf_index_cells(spark, idx)
    by_cell = {
        r.cell: r.ids
        for r in tbl.groupBy("cell").agg(
            F.collect_list("vec_id").alias("ids")
        ).collect()
    }
    # wipe one whole cell + two ids from another
    cells = sorted(by_cell)
    wipe_cell, touch_cell = cells[0], cells[1]
    untouched = [c for c in cells if c not in (wipe_cell, touch_cell)]
    victims = list(by_cell[wipe_cell]) + list(by_cell[touch_cell])[:2]

    def files_of(cell):
        d = _os.path.join(idx, "cells", f"cell={cell}")
        return sorted(_os.listdir(d)) if _os.path.isdir(d) else None

    before = {c: files_of(c) for c in untouched}
    n = ivf_index_delete(spark, idx, victims)
    assert n == len(victims)

    after_tbl = ivf_index_cells(spark, idx)
    assert after_tbl.where(F.col("vec_id").isin(victims)).count() == 0
    assert after_tbl.count() == e.count() - len(victims)
    assert files_of(wipe_cell) is None  # emptied cell's dir removed
    for c in untouched:  # untouched cells byte-identical file sets
        assert files_of(c) == before[c]
    # a query still works against the post-delete index
    q = after_tbl.limit(1).select("vec_id", "embedding")
    assert ivf_index_topk(q, idx, k=2, nprobe=2).count() == 2


def test_delete_duplicate_ids_counts_rows_once(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    e = _emb(spark).limit(40)
    ivf_index_build(e, idx, num_cells=4, train=False)
    from flink_join_scaling_spark.operators.ann_index import ivf_index_delete

    assert ivf_index_delete(spark, idx, [5, 5, 7]) == 2
    assert ivf_index_cells(spark, idx).count() == 38


def test_full_purge_leaves_readable_empty_index(spark, tmp_path):
    """Deleting every row must leave an index that reads as EMPTY (the
    schema persisted in meta), not one that crashes schema inference —
    the very right-to-be-forgotten scenario the op exists for."""
    idx = str(tmp_path / "ivf")
    e = _emb(spark).limit(20)
    ivf_index_build(e, idx, num_cells=4, train=False)
    from flink_join_scaling_spark.operators.ann_index import ivf_index_delete

    ids = [r.vec_id for r in e.collect()]
    assert ivf_index_delete(spark, idx, ids) == 20
    assert ivf_index_cells(spark, idx).count() == 0
    assert ivf_index_topk(e.limit(1), idx, k=3, nprobe=2).count() == 0
    # and the index is still appendable afterwards
    ivf_index_build(e.limit(5), idx, mode="append")
    assert ivf_index_cells(spark, idx).count() == 5


def test_delete_string_id_index(spark, tmp_path):
    """Deletion honors the index's own id type: string-keyed indexes
    (which build and query fine) must delete fine too."""
    idx = str(tmp_path / "ivf")
    e = _emb(spark).limit(20).select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("doc_id"),
        "embedding",
    )
    ivf_index_build(e, idx, id_col="doc_id", num_cells=4, train=False)
    from flink_join_scaling_spark.operators.ann_index import ivf_index_delete

    assert ivf_index_delete(spark, idx, ["doc-3", "doc-4", "doc-999"]) == 2
    assert ivf_index_cells(spark, idx).count() == 18


def test_append_rejects_wrong_vector_type_and_dimension(spark, tmp_path):
    """Names matching is not enough: a float batch appended to a
    double index, or a wrong-dimension batch (different embedding
    model), must fail at the WRITE — not as schema-merge/matmul
    corruption at query time."""
    import pytest

    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_index_build(e, idx, num_cells=4, train=False)
    doubly = e.withColumn("embedding", F.col("embedding").cast("array<double>"))
    with pytest.raises(ValueError, match="array<double>"):
        ivf_index_build(doubly, idx, mode="append")
    short = e.withColumn("embedding", F.slice("embedding", 1, 3))
    with pytest.raises(ValueError, match="dimension 3"):
        ivf_index_build(short, idx, mode="append")
    # the failed appends must not have written anything
    assert ivf_index_cells(spark, idx).count() == e.count()


def test_meta_is_written_last(spark, tmp_path, monkeypatch):
    """meta.json is the commit marker: if the cell write dies, the
    fresh build leaves NO meta, so readers error loudly instead of
    serving a partial index as complete."""
    import pytest

    import flink_join_scaling_spark.operators.ann_index as ai

    idx = str(tmp_path / "ivf")
    e = _emb(spark)

    def boom(*a, **k):
        raise RuntimeError("simulated cell-write failure")

    real = ai.ivf_cells_pandas
    monkeypatch.setattr(ai, "ivf_cells_pandas", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        ivf_index_build(e, idx, num_cells=4, train=False)
    assert not os.path.exists(os.path.join(idx, "meta.json"))
    monkeypatch.setattr(ai, "ivf_cells_pandas", real)
    ivf_index_build(e, idx, num_cells=4, train=False)  # clean retry works
    assert ivf_index_cells(spark, idx).count() == e.count()


def test_compact_folds_appended_files_and_preserves_results(spark, tmp_path):
    """build → append → append → COMPACT: per-cell file counts
    collapse, the cell= partition layout (the index's pruning
    structure) is untouched, and top-k results are unchanged."""
    from flink_join_scaling_spark.operators.ann_index import ivf_index_compact

    idx = str(tmp_path / "ivf")
    e = _emb(spark)
    ivf_index_build(e, idx, num_cells=4, train=False)
    for i in (1, 2):
        more = e.withColumn("vec_id", F.col("vec_id") + F.lit(100000 * i))
        ivf_index_build(more, idx, mode="append")

    cells_dir = os.path.join(idx, "cells")

    def files_per_cell():
        return {
            d: sorted(
                f
                for f in os.listdir(os.path.join(cells_dir, d))
                if f.endswith(".parquet")
            )
            for d in os.listdir(cells_dir)
            if d.startswith("cell=")
        }

    before = files_per_cell()
    assert any(len(v) >= 3 for v in before.values()), before  # 3 writes
    queries = e.where(F.col("vec_id") < 10)
    res_before = sorted(
        (r.query_id, r.vec_id)
        for r in ivf_index_topk(queries, idx, k=5, nprobe=2).collect()
    )
    stats = ivf_index_compact(spark, idx)
    assert stats["cells_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]
    after = files_per_cell()
    assert set(after) == set(before)  # same cell directories
    assert all(len(v) <= 2 for v in after.values()), after
    res_after = sorted(
        (r.query_id, r.vec_id)
        for r in ivf_index_topk(queries, idx, k=5, nprobe=2).collect()
    )
    assert res_after == res_before
    # idempotent: a second pass finds nothing left to fold
    assert ivf_index_compact(spark, idx)["cells_compacted"] == 0


def test_pq_index_adc_path(spark, tmp_path):
    """IVF-PQ: a pq= build stores codebooks in meta and a codes column
    in the cells; adc=True scans codes-only (the scan's ReadSchema
    carries no float vector column), refines exactly, and beats the
    recall gate; adc on a non-PQ index raises."""
    import json

    import pytest

    idx = str(tmp_path / "ivfpq")
    e = _emb(spark)
    meta = ivf_index_build(
        e, idx, num_cells=4, train=True, pq={"m": 8, "nbits": 4}
    )
    assert meta["pq"]["m"] == 8 and len(meta["pq"]["codebooks"]) == 8
    cells = ivf_index_cells(spark, idx)
    assert "codes" in cells.columns
    # the ADC scan projection never touches the float column
    plan = cells.select("vec_id", "codes")._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan
    q = e.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk(e, q, k=5).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in ivf_index_topk(q, idx, k=5, nprobe=4, adc=True).collect()
    }
    assert len(exact & got) / len(exact) >= 0.5
    # ADC result stays inside what the non-ADC path could see: same
    # probed cells, so exact-rerank output schema matches
    plain = ivf_index_topk(q, idx, k=5, nprobe=4)
    assert set(plain.columns) == {"query_id", "vec_id", "cosine_e6", "rank"}
    # a non-PQ index refuses the ADC path loudly
    idx2 = str(tmp_path / "plain")
    ivf_index_build(e, idx2, num_cells=4, train=False)
    with pytest.raises(ValueError, match="pq="):
        ivf_index_topk(q, idx2, k=5, adc=True)
    # meta survives the JSON round-trip byte-exactly (codes comparable
    # across sessions)
    assert json.loads(open(os.path.join(idx, "meta.json")).read())["pq"] == meta["pq"]


def test_pq_index_append_reuses_codebooks_and_delete_keeps_codes(spark, tmp_path):
    """Top-ups encode with the STORED codebooks (codes comparable
    across batches); deletion rewrites survivors with their codes
    intact so the ADC path keeps working."""
    from flink_join_scaling_spark.operators.ann_index import ivf_index_delete

    idx = str(tmp_path / "ivfpq")
    e = _emb(spark)
    ivf_index_build(e, idx, num_cells=4, train=True, pq={"m": 8, "nbits": 4})
    before = {
        r.vec_id: list(r.codes) for r in ivf_index_cells(spark, idx).collect()
    }
    more = e.withColumn("vec_id", F.col("vec_id") + F.lit(100000))
    ivf_index_build(more, idx, mode="append")
    after = {
        r.vec_id: list(r.codes) for r in ivf_index_cells(spark, idx).collect()
    }
    assert len(after) == 2 * len(before)
    # identical vectors ⇒ identical codes under the stored codebooks
    for vid, codes in before.items():
        assert after[vid + 100000] == codes
    assert ivf_index_delete(spark, idx, [0, 1, 100000]) == 3
    q = e.where(F.col("vec_id").between(2, 6))
    got = ivf_index_topk(q, idx, k=3, nprobe=4, adc=True)
    assert got.count() == 5 * 3
