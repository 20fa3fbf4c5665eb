"""Incremental (cross-run) corpus deduplication against a persisted
index — the production ingestion pattern: each batch of NEW documents
is checked against everything ever accepted, without rescanning the
historical corpus.

Two tiers, mirroring the batch family in ``operators.dedup``:

* :func:`dedup_incremental_exact` — content-hash index. A new doc is
  accepted iff its normalized-text sha2 has never been seen (in the
  index OR earlier in the same batch, min-id keeper); accepted hashes
  append to the index.
* :func:`dedup_incremental_minhash` — LSH band index. New docs whose
  band buckets intersect the index are flagged as near-dup candidates
  (same md5 hash family as ``operators.dedup.minhash_bands``, so a
  backfill-built index and incremental batches interoperate);
  non-candidates' bands append to the index.

Scale shape: the index is a parquet table keyed by hash — each
incremental run is one equi-join of the (small) new batch against it,
plus an append. The historical TEXT is never re-read; the index rows
are a hash + id, orders of magnitude smaller than the corpus. On a
real deployment the index lives on object storage and compacts
periodically; correctness only needs hash-key equi-join semantics.

The reference analogue: ``VersioningEvictor``'s compacted keyed state
(``VersioningEvictor.scala:10-29``) persisted ACROSS jobs — what its
in-memory window state cannot do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_join_scaling_spark.functions.text import norm_text
from flink_join_scaling_spark.operators.dedup import (
    hash64_band_array,
    minhash_bands,
    minhash_signatures,
)


def _index_exists(index_dir: str) -> bool:
    return os.path.isdir(index_dir) and any(
        f.endswith(".parquet") for f in os.listdir(index_dir)
    )


def dedup_incremental_exact(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Accept only never-seen documents; persist their hashes.

    Returns the accepted subset of ``new_docs`` (original columns).
    Survivor rule, precisely: WITHIN a batch, the min-id keeper (the
    batch ``dedup_exact_apply`` rule); ACROSS batches,
    first-arrival-wins (the index has no notion of a better id, only
    "seen"). The two compose to the batch min-id rule exactly when
    batches arrive in non-decreasing id order — the ingestion norm,
    and what tests/test_incremental.py asserts. An out-of-id-order
    backfill keeps the EARLIER-ARRIVED copy, not the min-id one;
    re-run the batch dedup over the union if min-id survivors matter
    for such a replay.
    """
    hashed = new_docs.withColumn(
        "__h", F.sha2(norm_text(F.col(text_col)), 256)
    )
    if _index_exists(index_dir):
        known = spark.read.parquet(index_dir).select(F.col("h").alias("__h"))
        hashed = hashed.join(known, "__h", "left_anti")
    keeper = hashed.groupBy(F.col("__h").alias("__kh")).agg(
        F.min(id_col).alias("__keep_id")
    )
    accepted = (
        hashed.join(
            keeper,
            (F.col("__h") == F.col("__kh"))
            & (F.col(id_col) == F.col("__keep_id")),
        )
        .select(*new_docs.columns, "__h")
    )
    # localCheckpoint: the accepted set must be PINNED before the index
    # append — otherwise the lazy plan would re-read the index it is
    # about to modify
    accepted = accepted.localCheckpoint(eager=True)
    accepted.select(F.col("__h").alias("h")).write.mode("append").parquet(
        index_dir
    )
    return accepted.select(*new_docs.columns)


def dedup_incremental_minhash(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    append: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup screening of a new batch against the historical band
    index. Returns ``(accepted, flagged)``:

    * ``flagged`` — (new_id, known_id) candidate pairs whose band
      buckets collide with the index (exact-verify downstream if the
      workload needs it, as in the batch path);
    * ``accepted`` — new docs with NO collision against the index or
      an earlier-id doc of the same batch; their bands append to the
      index.

    The same band formulas as the batch/streaming paths: an index
    bootstrapped by a batch backfill keeps working incrementally.

    ``append=False`` runs the SCREEN only (no index write) — for
    composers like :func:`dedup_incremental_ensemble` that must decide
    the accepted set from SEVERAL screens before any index commits
    (an eager per-face append would admit docs a sibling screen
    rejects).
    """
    sigs = minhash_signatures(new_docs, id_col, text_col, num_hashes)
    bands = minhash_bands(sigs, id_col, num_hashes, band_size).select(
        F.col(id_col).alias("new_id"), "band_idx", "band_hash"
    )
    bands = bands.localCheckpoint(eager=True)
    if _index_exists(index_dir):
        known = spark.read.parquet(index_dir)
        hist_hits = bands.join(known, ["band_idx", "band_hash"]).select(
            "new_id", F.col("known_id")
        )
    else:
        # derive the id type from the input — a hardcoded long would
        # fail (or mis-coerce) the first, index-absent run of any
        # workload whose id_col is a string/int (advisor r10)
        id_t = new_docs.schema[id_col].dataType.simpleString()
        hist_hits = spark.createDataFrame(
            [], f"new_id {id_t}, known_id {id_t}"
        )
    # within-batch collisions: earlier (smaller) id wins, later id flags
    b2 = bands.select(
        F.col("new_id").alias("known_id"), "band_idx", "band_hash"
    )
    batch_hits = (
        bands.join(b2, ["band_idx", "band_hash"])
        .where(F.col("new_id") > F.col("known_id"))
        .select("new_id", "known_id")
    )
    flagged = hist_hits.unionByName(batch_hits).distinct().localCheckpoint(
        eager=True
    )
    accepted = new_docs.join(
        flagged.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    if append:
        # pinned only on the commit path: screen-only callers (the
        # ensemble composer) decide acceptance from SEVERAL screens and
        # would throw this frame away — an eager job for nothing
        accepted = accepted.localCheckpoint(eager=True)
        accepted_bands = bands.join(
            accepted.select(F.col(id_col).alias("new_id")), "new_id", "left_semi"
        )
        accepted_bands.select(
            F.col("new_id").alias("known_id"), "band_idx", "band_hash"
        ).write.mode("append").parquet(index_dir)
    return accepted, flagged


def dedup_incremental_hash64(
    spark: SparkSession,
    hashes: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    append: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Cross-run MEDIA near-dup screening against a persisted 64-bit
    fingerprint index — the incremental face of the perceptual
    families (image dHash, audio envelope hash; any 64-bit fingerprint
    with the 4×16-bit band layout). ``hashes`` is the precomputed
    (id, hash) table from ``multimodal.phash_hashes`` /
    ``audiohash_hashes`` — media BYTES are decoded once by the caller
    and never touch the index machinery.

    Returns ``(accepted_ids, flagged)``:

    * ``flagged`` — (new_id, known_id, hamming) pairs hamming-VERIFIED
      at ``max_hamming`` against the index (which stores the full
      hash next to each band row, so verification needs no second
      lookup) or against an earlier-id row of the same batch;
    * ``accepted_ids`` — new ids with no verified collision; their
      band rows (with the full hash) append to the index.

    Same band formulas as ``dedup.hash64_band_pairs``: a
    backfill-built index and incremental batches interoperate, and
    the pigeonhole completeness argument (4 disjoint 16-bit bands ≥
    one exact match at hamming ≤ 3) carries over. Index rows are
    (known_id, band_idx, band_val, h64) — ~32 bytes × 4 per media
    item, orders of magnitude smaller than the payload corpus the
    history never re-reads.

    ``append=False`` runs the SCREEN only (no index write) — the
    decide-then-commit mode :func:`dedup_incremental_ensemble` uses
    to compose this face with the text/semantic generators (an eager
    per-face append would admit items a sibling screen rejects,
    drifting the sub-indexes apart)."""
    if max_hamming > 3:
        raise ValueError(
            "dedup_incremental_hash64: the 4x16-bit band layout is "
            f"pigeonhole-complete only for max_hamming <= 3 (got "
            f"{max_hamming}); pairs beyond that radius would be "
            "silently missed"
        )
    bands = hashes.select(
        F.col(id_col).alias("new_id"),
        F.col(hash_col).alias("h64"),
        F.posexplode(hash64_band_array(hash_col)).alias(
            "band_idx", "band_val"
        ),
    ).localCheckpoint(eager=True)
    ham = F.bit_count(F.expr("h64 ^ known_h64")).cast("bigint").alias("hamming")
    if _index_exists(index_dir):
        known = spark.read.parquet(index_dir).withColumnRenamed(
            "h64", "known_h64"
        )
        hist_hits = (
            bands.join(known, ["band_idx", "band_val"])
            .select("new_id", "known_id", ham)
            .where(F.col("hamming") <= max_hamming)
        )
    else:
        id_t = hashes.schema[id_col].dataType.simpleString()
        hist_hits = spark.createDataFrame(
            [], f"new_id {id_t}, known_id {id_t}, hamming long"
        )
    b2 = bands.select(
        F.col("new_id").alias("known_id"),
        F.col("h64").alias("known_h64"),
        "band_idx",
        "band_val",
    )
    batch_hits = (
        bands.join(b2, ["band_idx", "band_val"])
        .where(F.col("new_id") > F.col("known_id"))
        .select("new_id", "known_id", ham)
        .where(F.col("hamming") <= max_hamming)
    )
    flagged = (
        hist_hits.unionByName(batch_hits).distinct().localCheckpoint(eager=True)
    )
    accepted_ids = hashes.select(F.col(id_col)).join(
        flagged.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    if append:
        # pin only on the commit path: in append=False screen mode the
        # ensemble composer discards this frame, and an eager pin
        # would run a batch-sized anti-join job for nothing (the
        # minhash/semantic faces' guard, r13 review)
        accepted_ids = accepted_ids.localCheckpoint(eager=True)
        accepted_bands = bands.join(
            accepted_ids.select(F.col(id_col).alias("new_id")),
            "new_id",
            "left_semi",
        )
        accepted_bands.select(
            F.col("new_id").alias("known_id"), "band_idx", "band_val", "h64"
        ).write.mode("append").parquet(index_dir)
    return accepted_ids, flagged


def dedup_incremental_winnow(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Cross-run copied-PASSAGE screening against a persisted
    winnowing-fingerprint index — the incremental face of
    ``operators.dedup.winnow_dedup_pairs`` (local fingerprints, so a
    shared token run of length ≥ k+w−1 is caught even when the
    documents are globally dissimilar — the niche the minhash index
    doesn't cover).

    Returns ``(accepted, flagged)`` with the family's established
    greedy rule (the ``dedup_incremental_minhash`` contract): a new
    doc is flagged iff it shares ≥ ``min_shared`` fingerprints with an
    ACCEPTED doc of an earlier run (the index) or with ANY smaller-id
    doc of its own batch; only accepted docs' fingerprints append to
    the index. ``flagged`` carries (new_id, known_id, n_shared).

    The stop-fingerprint cap (``max_df``, the batch path's bounded-
    join-bucket discipline) is evaluated against the document
    frequency across the INDEX plus the current batch, so buckets stay
    ≤ max_df² per run regardless of history size. Chunked runs equal
    the batch backfill exactly as long as no fingerprint crosses the
    cap mid-history (a fingerprint hot in the final union is dropped
    by the backfill everywhere, but an early chunk may see it cold) —
    the same caveat as re-running any df-capped dedup on a growing
    corpus; the equivalence test pins the uncapped regime.

    Scale shape: index rows are (known_id, fp) — two longs per
    SELECTED gram (winnowing keeps ~2/(w+1) of grams), orders of
    magnitude smaller than the text history, which is never re-read.
    Each run is one equi-join of the new batch's fingerprints against
    the index plus an append."""
    from flink_join_scaling_spark.operators.dedup import winnow_fingerprints

    fps = (
        winnow_fingerprints(new_docs, id_col, text_col, k, w)
        .select(F.col(id_col).alias("new_id"), "fp")
        .localCheckpoint(eager=True)
    )
    id_t = new_docs.schema[id_col].dataType.simpleString()
    if _index_exists(index_dir):
        known = spark.read.parquet(index_dir)
    else:
        known = spark.createDataFrame([], f"known_id {id_t}, fp long")
    # stop-fingerprint cap over index + batch document frequency
    df_counts = (
        fps.select(F.col("new_id").alias("__d"), "fp")
        .unionByName(known.select(F.col("known_id").alias("__d"), "fp"))
        .groupBy("fp")
        .agg(F.countDistinct("__d").alias("__df"))
    )
    hot = df_counts.where(F.col("__df") > max_df).select("fp")
    cold = fps.join(F.broadcast(hot), "fp", "left_anti")
    cold_known = known.join(F.broadcast(hot), "fp", "left_anti")
    hist_hits = (
        cold.join(cold_known, "fp")
        .groupBy("new_id", "known_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    b2 = cold.select(F.col("new_id").alias("known_id"), "fp")
    batch_hits = (
        cold.join(b2, "fp")
        .where(F.col("new_id") > F.col("known_id"))
        .groupBy("new_id", "known_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    flagged = (
        hist_hits.unionByName(batch_hits).localCheckpoint(eager=True)
    )
    accepted = (
        new_docs.join(
            flagged.select(F.col("new_id").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        .localCheckpoint(eager=True)
    )
    accepted_fps = fps.join(
        accepted.select(F.col(id_col).alias("new_id")), "new_id", "left_semi"
    )
    accepted_fps.select(
        F.col("new_id").alias("known_id"), "fp"
    ).write.mode("append").parquet(index_dir)
    return accepted, flagged


def dedup_incremental_semantic(
    spark: SparkSession,
    new_vecs: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_e6: int = 850_000,
    num_cells: int = 8,
    nprobe: int = 2,
    append: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Cross-run SEMANTIC (embedding-cosine) dedup against the
    persisted cell-partitioned IVF index — the SemDeDup face of the
    incremental family: each new embedding batch is screened against
    everything ever accepted WITHOUT re-reading history vectors
    outside the probed cells.

    Returns ``(accepted, flagged)`` with the family's greedy contract
    (the ``dedup_incremental_minhash`` rule): a new vector is flagged
    iff its e6-quantized cosine reaches ``threshold_e6`` against an
    ACCEPTED vector of an earlier run, or against ANY smaller-id
    vector of its own batch; only accepted vectors append to the
    index. ``flagged`` carries (new_id, known_id, cosine_e6).

    Mechanics, all reused from the attested components so the scoring
    contract cannot drift:

    * history screen — ``ann_index.ivf_index_topk`` with ``k=1``
      (max-cosine is the only statistic the ≥θ rule needs) over the
      persisted index: the query batch probes ``nprobe`` cells of the
      index's OWN stored centroids and partition pruning reads only
      those directories; ``exclude_self=False`` because a re-submitted
      id must still match its accepted twin.
    * within-batch screen — ``dedup.embedding_dedup_pairs_ivf``
      (``emit_e6=True``) over the batch alone, with transient
      batch-trained cells (the batch is run-sized; its cell space
      need not match the index's).
    * index append — ``ann_index.ivf_index_build(mode="append")``:
      the stored centroids/meta WIN, so the cell space, column
      schema, and quantizer never shift across runs (first run
      bootstraps with trained centroids).

    Same approximation class as every IVF consumer here: a pair whose
    members' probed cells miss each other is not flagged — recall is
    the ``nprobe``/``num_cells`` dial, exhaustive at
    ``nprobe=num_cells``. Scale shape: per run, cost is (batch ×
    probed-cell occupancy) for the screen plus one batch-sized
    assignment + partitioned append; history VECTORS outside probed
    cells are never read, and nothing ever touches history²."""
    from flink_join_scaling_spark.operators.ann_index import (
        ivf_index_build,
        ivf_index_topk,
    )
    from flink_join_scaling_spark.operators.dedup import (
        embedding_dedup_pairs_ivf,
    )

    id_t = new_vecs.schema[id_col].dataType.simpleString()
    if os.path.exists(os.path.join(index_dir, "meta.json")):
        hist_hits = (
            ivf_index_topk(
                new_vecs.select(id_col, vec_col),
                index_dir,
                k=1,
                nprobe=nprobe,
                exclude_self=False,
            )
            .where(F.col("cosine_e6") >= threshold_e6)
            .select(
                F.col("query_id").alias("new_id"),
                F.col("vec_id").alias("known_id"),
                "cosine_e6",
            )
        )
        first_run = False
    else:
        hist_hits = spark.createDataFrame(
            [], f"new_id {id_t}, known_id {id_t}, cosine_e6 bigint"
        )
        first_run = True
    batch_hits = embedding_dedup_pairs_ivf(
        new_vecs.select(id_col, vec_col),
        id_col,
        vec_col,
        threshold=threshold_e6 / 1_000_000.0,
        num_cells=num_cells,
        nprobe=nprobe,
        emit_e6=True,
    ).select(
        # canonicalized id_a < id_b: the greedy rule flags the LARGER id
        F.col("id_b").alias("new_id"),
        F.col("id_a").alias("known_id"),
        "cosine_e6",
    )
    flagged = (
        hist_hits.unionByName(batch_hits).distinct().localCheckpoint(eager=True)
    )
    accepted = new_vecs.join(
        flagged.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    if append:
        # pinned only on the commit path (the minhash face's rule):
        # screen-only callers decide acceptance elsewhere
        accepted = accepted.localCheckpoint(eager=True)
    # a fully-flagged (or empty) batch appends nothing; on a FIRST run
    # it also cannot train centroids, so index creation simply defers
    # to the next non-empty accepted batch. append=False = screen only
    # (the ensemble composer commits both indexes itself)
    if append and accepted.count() > 0:
        ivf_index_build(
            accepted.select(id_col, vec_col),
            index_dir,
            id_col=id_col,
            vec_col=vec_col,
            num_cells=num_cells,
            train=True,
            mode="overwrite" if first_run else "append",
        )
    return accepted, flagged


def dedup_incremental_ensemble(
    spark: SparkSession,
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    num_hashes: int = 8,
    band_size: int = 2,
    threshold_e6: int = 850_000,
    num_cells: int = 8,
    nprobe: int = 2,
    hash_col: str | None = None,
    max_hamming: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Cross-run ENSEMBLE dedup — the incremental face of
    ``q_dedup_ensemble``'s any-generator-fires policy: a new doc
    (carrying text, its embedding, and — with ``hash_col`` — a 64-bit
    perceptual media fingerprint) is flagged iff the minhash band
    screen OR the semantic cosine screen OR the perceptual hamming
    screen fires against the respective persisted index (or a
    smaller-id batch peer); the SINGLE accepted set then extends ALL
    participating indexes.

    The decide-then-commit order is the point of the ``append=False``
    screen mode: running the faces independently would let each admit
    docs a sibling rejects, and the indexes would drift apart — after
    a few runs none would describe the surviving corpus. Here every
    sub-index always describes exactly the ensemble-accepted history
    (asserted by the composition tests, including the 3-face one).

    Returns ``(accepted, flagged)``; ``flagged`` carries
    (new_id, known_id, via ∈ {'minhash','semantic','phash'}) — a pair
    caught by several screens appears once per generator, like the
    batch ensemble's pair-set union before distinct.

    Scale shape: the union of the faces' screens (each one equi-join
    of the batch against its index) plus one batch-sized band
    recomputation, one cell assignment, and one 4-band explode for
    the commits — still nothing history-sized; media PAYLOADS never
    enter (``hash_col`` is the caller's precomputed fingerprint from
    the one map-only decode pass)."""
    # each face's lazy accepted frame is discarded — the composer
    # decides acceptance from the UNION of flags (append=False also
    # skips the faces' commit-path checkpoints, so no job runs for it)
    _acc_mh, flag_mh = dedup_incremental_minhash(
        spark,
        new_docs,
        os.path.join(index_dir, "minhash"),
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        band_size=band_size,
        append=False,
    )
    _acc_sem, flag_sem = dedup_incremental_semantic(
        spark,
        new_docs,
        os.path.join(index_dir, "semantic"),
        id_col=id_col,
        vec_col=vec_col,
        threshold_e6=threshold_e6,
        num_cells=num_cells,
        nprobe=nprobe,
        append=False,
    )
    flagged = flag_mh.select(
        "new_id", "known_id", F.lit("minhash").alias("via")
    ).unionByName(
        flag_sem.select("new_id", "known_id", F.lit("semantic").alias("via"))
    )
    if hash_col is not None:
        _acc_ph, flag_ph = dedup_incremental_hash64(
            spark,
            new_docs.select(id_col, hash_col),
            os.path.join(index_dir, "phash"),
            id_col=id_col,
            hash_col=hash_col,
            max_hamming=max_hamming,
            append=False,
        )
        flagged = flagged.unionByName(
            flag_ph.select("new_id", "known_id", F.lit("phash").alias("via"))
        )
    flagged = flagged.distinct().localCheckpoint(eager=True)
    accepted = new_docs.join(
        flagged.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    ).localCheckpoint(eager=True)
    # commit BOTH indexes from the one ensemble-accepted set; an
    # empty batch short-circuits BOTH commits symmetrically (an
    # unconditional band append would create an empty minhash index
    # directory while the guarded semantic commit skips — r12 advisor)
    if accepted.count() > 0:
        mh_dir = os.path.join(index_dir, "minhash")
        bands = minhash_bands(
            minhash_signatures(accepted, id_col, text_col, num_hashes),
            id_col,
            num_hashes,
            band_size,
        )
        bands.select(
            F.col(id_col).alias("known_id"), "band_idx", "band_hash"
        ).write.mode("append").parquet(mh_dir)
        if hash_col is not None:
            accepted.select(
                F.col(id_col).alias("known_id"),
                F.col(hash_col).alias("h64"),
                F.posexplode(hash64_band_array(hash_col)).alias(
                    "band_idx", "band_val"
                ),
            ).select("known_id", "band_idx", "band_val", "h64").write.mode(
                "append"
            ).parquet(os.path.join(index_dir, "phash"))
        from flink_join_scaling_spark.operators.ann_index import ivf_index_build

        sem_dir = os.path.join(index_dir, "semantic")
        ivf_index_build(
            accepted.select(id_col, vec_col),
            sem_dir,
            id_col=id_col,
            vec_col=vec_col,
            num_cells=num_cells,
            train=True,
            mode=(
                "append"
                if os.path.exists(os.path.join(sem_dir, "meta.json"))
                else "overwrite"
            ),
        )
    return accepted, flagged
