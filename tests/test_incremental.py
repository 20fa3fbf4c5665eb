"""Incremental (cross-run) dedup against a persisted index
(operators/incremental.py): chunked ingestion must accept exactly the
same documents as one batch run over the union, and the index must
carry state across separate invocations — the property that makes
daily-ingestion dedup work without rescanning history.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark.operators.incremental import (
    dedup_incremental_exact,
    dedup_incremental_minhash,
)
from flink_join_scaling_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_incremental_exact_matches_batch(spark, tmp_path):
    """Three chunked runs accept the same id set as the batch
    min-id-keeper rule over the union — duplicates planted both
    WITHIN a chunk and ACROSS chunks."""
    rows = [
        (1, "alpha beta gamma"), (2, "ALPHA  beta gamma"),  # dup within chunk 1
        (3, "delta epsilon"),
        (4, "alpha beta gamma"),                            # dup across chunks
        (5, "zeta eta"),
        (6, "delta  EPSILON"), (7, "theta iota"),           # dup across chunks
    ]
    chunks = [rows[:3], rows[3:5], rows[5:]]
    idx = str(tmp_path / "idx")
    accepted: list[int] = []
    for c in chunks:
        df = spark.createDataFrame(c, "doc_id long, text string")
        out = dedup_incremental_exact(spark, df, idx)
        accepted += [r["doc_id"] for r in out.collect()]
    # batch truth: min id per normalized text
    assert sorted(accepted) == [1, 3, 5, 7]


def test_incremental_exact_on_real_corpus(spark, tmp_path):
    """Real documents split in two runs: run 2 re-ingests run 1's docs
    plus new ones — only the new ones are accepted."""
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    first = d.where(F.col("doc_id") < 25)
    idx = str(tmp_path / "idx")
    a1 = dedup_incremental_exact(spark, first, idx)
    n1 = a1.count()
    assert n1 > 0
    # second run: everything (old + new)
    a2 = dedup_incremental_exact(spark, d, idx)
    ids2 = {r["doc_id"] for r in a2.collect()}
    assert ids2 and all(i >= 25 for i in ids2)  # old content rejected
    # third run with identical input accepts nothing
    a3 = dedup_incremental_exact(spark, d, idx)
    assert a3.count() == 0


def test_incremental_minhash_flags_cross_run_near_dups(spark, tmp_path):
    """A near-identical doc arriving in a LATER run is flagged against
    the index entry from the earlier run (bands persisted), and only
    non-colliding docs extend the index."""
    idx = str(tmp_path / "bidx")
    base = "the quick brown fox jumps over the lazy dog again and again"
    run1 = spark.createDataFrame(
        [(1, base), (2, "completely different words entirely here today")],
        "doc_id long, text string",
    )
    acc1, flag1 = dedup_incremental_minhash(spark, run1, idx)
    assert {r["doc_id"] for r in acc1.collect()} == {1, 2}
    assert flag1.count() == 0

    run2 = spark.createDataFrame(
        [(10, base), (11, "unrelated fresh content nothing shared at all")],
        "doc_id long, text string",
    )
    acc2, flag2 = dedup_incremental_minhash(spark, run2, idx)
    flagged_pairs = {(r["new_id"], r["known_id"]) for r in flag2.collect()}
    assert (10, 1) in flagged_pairs  # cross-run near-dup caught
    assert {r["doc_id"] for r in acc2.collect()} == {11}

    # the accepted doc's bands joined the index: a copy of IT now flags
    run3 = spark.createDataFrame(
        [(20, "unrelated fresh content nothing shared at all")],
        "doc_id long, text string",
    )
    acc3, flag3 = dedup_incremental_minhash(spark, run3, idx)
    assert acc3.count() == 0
    assert (20, 11) in {(r["new_id"], r["known_id"]) for r in flag3.collect()}


def test_incremental_minhash_equals_python_oracle(spark, tmp_path):
    """Chunked incremental runs accept exactly the operator's documented
    semantics, replayed by a Python oracle over the batch band table:
    a doc is blocked iff its buckets intersect the INDEX (accepted docs
    from earlier chunks) or ANY smaller-id doc of its own chunk; only
    accepted docs' bands join the index. Planted 3-copy corpus so
    collisions abound."""
    from collections import defaultdict

    from flink_join_scaling_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures,
    )

    base = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    shift = base.agg(F.max("doc_id")).first()[0] + 1
    docs = base
    for i in (1, 2):
        docs = docs.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        )

    bands = minhash_bands(minhash_signatures(docs, "doc_id", "text"), "doc_id")
    by_doc = defaultdict(set)
    for r in bands.collect():
        by_doc[r["doc_id"]].add((r["band_idx"], r["band_hash"]))

    ids = sorted(by_doc)
    chunk_bounds = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]

    def chunk_of(did):
        return sum(did >= b for b in chunk_bounds)

    chunks: dict[int, list[int]] = defaultdict(list)
    for did in ids:
        chunks[chunk_of(did)].append(did)

    # Python oracle replaying the operator's exact rule
    index: set = set()
    accepted_oracle: list[int] = []
    for ci in sorted(chunks):
        batch = chunks[ci]
        blocked = set()
        for did in batch:
            if by_doc[did] & index:
                blocked.add(did)
        for did in batch:
            for other in batch:
                if other < did and by_doc[did] & by_doc[other]:
                    blocked.add(did)
        for did in batch:
            if did not in blocked:
                accepted_oracle.append(did)
                index |= by_doc[did]

    # chunked incremental runs, chunks in id order
    idx = str(tmp_path / "idx")
    got: list[int] = []
    lo = None
    for hi in chunk_bounds + [None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") < hi)
        acc, _ = dedup_incremental_minhash(spark, docs.where(cond), idx)
        got += [r["doc_id"] for r in acc.collect()]
        lo = hi
    assert sorted(got) == sorted(accepted_oracle)
    # sanity: the dedup actually rejected the planted copies
    assert len(accepted_oracle) < len(ids)


def test_incremental_hash64_media_index(spark, tmp_path):
    """Cross-run image dedup: run 1 indexes two unrelated images; run
    2's near-duplicates of BOTH are flagged with verified hamming, a
    fresh group is accepted, and within-batch (even, odd) pairs flag
    without touching the index. History (payload bytes) is never
    re-read — only the ~32-byte band rows."""
    from flink_join_scaling_spark.operators import multimodal as mm
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_hash64,
    )

    idx = str(tmp_path / "media_index")

    def hashes_for(ids):
        df = spark.createDataFrame(
            [(i, mm.synth_png(i)) for i in ids], "doc_id long, payload binary"
        )
        return mm.phash_hashes(df, "doc_id")

    # run 1: images 0 and 8 (different groups) — both accepted
    acc1, flg1 = dedup_incremental_hash64(spark, hashes_for([0, 8]), idx)
    assert {r.doc_id for r in acc1.collect()} == {0, 8}
    assert flg1.count() == 0

    # run 2: 1 (near-dup of 0), 9 (near-dup of 8), 20 (new group)
    acc2, flg2 = dedup_incremental_hash64(spark, hashes_for([1, 9, 20]), idx)
    flagged = {(r.new_id, r.known_id): r.hamming for r in flg2.collect()}
    assert set(flagged) == {(1, 0), (9, 8)}
    assert all(h <= 3 for h in flagged.values())
    assert {r.doc_id for r in acc2.collect()} == {20}

    # run 3: within-batch pair (30, 31) — 31 flags against 30 in-batch;
    # both unrelated to history
    acc3, flg3 = dedup_incremental_hash64(spark, hashes_for([30, 31]), idx)
    assert {(r.new_id, r.known_id) for r in flg3.collect()} == {(31, 30)}
    assert {r.doc_id for r in acc3.collect()} == {30}

    # index holds exactly the accepted ids' band rows (4 per id)
    known = spark.read.parquet(idx)
    assert known.count() == 4 * 4  # ids 0, 8, 20, 30
    assert {r.known_id for r in known.select("known_id").distinct().collect()} == {0, 8, 20, 30}


def test_incremental_hash64_string_id_first_run(spark, tmp_path):
    """Advisor r10: the index-absent branch hardcoded the hist_hits
    schema to long ids; a workload with string ids failed (or
    mis-coerced) at unionByName on its very FIRST run. The empty
    frame's schema now derives from the input's id type."""
    from flink_join_scaling_spark.operators import multimodal as mm
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_hash64,
    )

    idx = str(tmp_path / "sidx")

    def hashes_for(ids):
        df = spark.createDataFrame(
            [(f"doc-{i:03d}", mm.synth_png(i)) for i in ids],
            "doc_id string, payload binary",
        )
        return mm.phash_hashes(df, "doc_id")

    # first (index-absent) run — the branch the defect lived in: the
    # empty hist_hits must union with string-id batch rows
    acc1, flg1 = dedup_incremental_hash64(spark, hashes_for([0]), idx)
    assert {r.doc_id for r in acc1.collect()} == {"doc-000"}
    assert flg1.count() == 0
    # second run: image 1 is the planted near-dup of 0 (synth_png
    # groups by id//2) — cross-run flag against the string-keyed index
    acc2, flg2 = dedup_incremental_hash64(spark, hashes_for([1]), idx)
    assert {(r.new_id, r.known_id) for r in flg2.collect()} == {
        ("doc-001", "doc-000")
    }
    assert acc2.count() == 0


def test_incremental_minhash_string_id_first_run(spark, tmp_path):
    """Same latent defect in the pre-existing minhash variant."""
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_minhash,
    )

    idx = str(tmp_path / "midx")
    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog today"),
         ("b", "completely unrelated text about spark shuffles here")],
        "doc_id string, text string",
    )
    acc, flg = dedup_incremental_minhash(spark, docs, idx)
    assert {r.doc_id for r in acc.collect()} == {"a", "b"}
    assert flg.count() == 0


def test_hash64_band_radius_guard(spark, tmp_path):
    """Advisor r10: 4 sixteen-bit bands are pigeonhole-complete only
    for hamming <= 3; a larger radius must raise, not silently return
    an incomplete pair set — at every entry point."""
    import pytest

    from flink_join_scaling_spark.operators import multimodal as mm
    from flink_join_scaling_spark.operators.dedup import hash64_band_pairs
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_hash64,
    )
    from flink_join_scaling_spark.streaming.dedup import (
        stream_dedup_audiohash,
        stream_dedup_phash,
    )

    df = spark.createDataFrame(
        [(0, mm.synth_png(0))], "doc_id long, payload binary"
    )
    hashes = mm.phash_hashes(df, "doc_id")
    with pytest.raises(ValueError, match="pigeonhole"):
        hash64_band_pairs(hashes, "doc_id", "phash", max_hamming=4)
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup_incremental_hash64(
            spark, hashes, str(tmp_path / "x"), max_hamming=4
        )
    with pytest.raises(ValueError, match="pigeonhole"):
        stream_dedup_phash(df, "doc_id", max_hamming=4)
    with pytest.raises(ValueError, match="pigeonhole"):
        stream_dedup_audiohash(df, "doc_id", max_hamming=4)


def test_stream_media_dedup_rejects_non_integral_id(spark):
    """Advisor r10: the media detectors carried ids through a silent
    cast('long'); string ids became NULL and pairs vanished without
    error. Non-integral ids now raise before the stateful exchange."""
    import pytest

    from flink_join_scaling_spark.operators import multimodal as mm
    from flink_join_scaling_spark.streaming.dedup import (
        stream_dedup_audiohash,
        stream_dedup_phash,
    )

    img = spark.createDataFrame(
        [("u-0", mm.synth_png(0))], "doc_id string, payload binary"
    )
    wav = spark.createDataFrame(
        [("u-0", mm.synth_wav(0))], "doc_id string, payload binary"
    )
    with pytest.raises(TypeError, match="integral"):
        stream_dedup_phash(img, "doc_id")
    with pytest.raises(TypeError, match="integral"):
        stream_dedup_audiohash(wav, "doc_id")


def test_incremental_winnow_equals_python_oracle(spark, tmp_path):
    """Chunked incremental winnow runs accept exactly the documented
    greedy semantics, replayed by a Python oracle over the batch
    fingerprint table: a doc is blocked iff it shares >= min_shared
    fingerprints with an ACCEPTED doc of an earlier chunk (the index)
    or ANY smaller-id doc of its own chunk; only accepted docs'
    fingerprints join the index. Copied-passage corpus: later docs
    splice an earlier doc's passage into otherwise-unrelated text, the
    local-overlap case minhash misses and winnowing exists for."""
    from collections import defaultdict

    from flink_join_scaling_spark.operators.dedup import winnow_fingerprints
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_winnow,
    )

    base = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 40)
    )
    rows = base.collect()
    shift = max(r.doc_id for r in rows) + 1
    planted = []
    for j, r in enumerate(rows[:20]):
        words = r.text.split()
        passage = " ".join(words[:12]) if len(words) >= 12 else r.text
        planted.append(
            (
                shift + j,
                f"unrelated filler {j} opens here {passage} and closes "
                f"with more unrelated filler {j}",
            )
        )
    docs = base.unionByName(
        spark.createDataFrame(planted, "doc_id long, text string")
    )

    MIN_SHARED, MAX_DF = 2, 10_000  # cap never fires: uncapped regime
    fp_rows = winnow_fingerprints(docs, "doc_id", "text").collect()
    by_doc = defaultdict(set)
    for r in fp_rows:
        by_doc[r.doc_id].add(r.fp)
    ids = sorted({r.doc_id for r in docs.select("doc_id").collect()})
    chunk_bounds = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]

    index_fps: dict[int, set] = {}
    accepted_oracle: list[int] = []
    chunks = defaultdict(list)
    for did in ids:
        chunks[sum(did >= b for b in chunk_bounds)].append(did)
    for ci in sorted(chunks):
        batch = chunks[ci]
        blocked = set()
        for did in batch:
            if any(
                len(by_doc[did] & kfps) >= MIN_SHARED
                for kfps in index_fps.values()
            ):
                blocked.add(did)
            for other in batch:
                if other < did and len(by_doc[did] & by_doc[other]) >= MIN_SHARED:
                    blocked.add(did)
        for did in batch:
            if did not in blocked:
                accepted_oracle.append(did)
                index_fps[did] = by_doc[did]

    idx = str(tmp_path / "widx")
    got: list[int] = []
    lo = None
    for hi in chunk_bounds + [None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") < hi)
        acc, _ = dedup_incremental_winnow(
            spark, docs.where(cond), idx,
            min_shared=MIN_SHARED, max_df=MAX_DF,
        )
        got += [r.doc_id for r in acc.collect()]
        lo = hi
    assert sorted(got) == sorted(accepted_oracle)
    # sanity: the splices were actually caught (winnowing's guarantee:
    # a shared run of >= k+w-1 = 8 tokens contributes >= 1 shared
    # fingerprint; 12-token passages at min_shared=2 flag reliably)
    assert len(accepted_oracle) < len(ids)


def test_incremental_winnow_flags_cross_run_passage_copy(spark, tmp_path):
    """A later RUN's doc splicing an indexed doc's passage is flagged
    against the index entry with the shared-fingerprint count; an
    unrelated doc extends the index."""
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_winnow,
    )

    idx = str(tmp_path / "widx2")
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    run1 = spark.createDataFrame(
        [(1, f"document one says {passage} then stops"),
         (2, "totally different second document with other words inside")],
        "doc_id long, text string",
    )
    acc1, flg1 = dedup_incremental_winnow(spark, run1, idx)
    assert {r.doc_id for r in acc1.collect()} == {1, 2}
    assert flg1.count() == 0

    run2 = spark.createDataFrame(
        [(10, f"later arrival quoting {passage} inside new framing"),
         (11, "fresh unrelated content sharing nothing with anyone")],
        "doc_id long, text string",
    )
    acc2, flg2 = dedup_incremental_winnow(spark, run2, idx)
    flagged = {(r.new_id, r.known_id): r.n_shared for r in flg2.collect()}
    assert (10, 1) in flagged and flagged[(10, 1)] >= 2
    assert {r.doc_id for r in acc2.collect()} == {11}


def test_incremental_hash64_accepts_frame_hashes(spark, tmp_path):
    """The SURVEY claim that the persisted 64-bit band index is the
    cross-run face of the FRAME family: apng_frame_hashes' (node,
    fhash) rows drive dedup_incremental_hash64 directly — run 2's
    containers are flagged frame-by-frame against run 1's indexed
    frames, history payloads never re-read."""
    from flink_join_scaling_spark.operators import multimodal as mm
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_hash64,
    )

    idx = str(tmp_path / "fidx")

    def frame_hashes(ids):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        return mm.apng_frame_hashes(
            mm.attach_synth_apng_group(df, "doc_id"), "doc_id"
        ).select("node", "fhash")

    # run 1: container 0 (group 0, 2 frames) — all frames accepted
    acc1, flg1 = dedup_incremental_hash64(
        spark, frame_hashes([0]), idx, id_col="node", hash_col="fhash"
    )
    assert {r.node for r in acc1.collect()} == {0, 1}  # nodes 0*16+f
    assert flg1.count() == 0

    # run 2: container 1 (frame-wise near-dup of 0) + container 4
    # (group 2, unrelated) — every frame of 1 flags against 0's
    # indexed frames, frame-aligned; container 4's frames are accepted
    acc2, flg2 = dedup_incremental_hash64(
        spark, frame_hashes([1, 4]), idx, id_col="node", hash_col="fhash"
    )
    flagged = {(r.new_id, r.known_id) for r in flg2.collect()}
    assert flagged == {(16, 0), (17, 1)}  # doc1 frames vs doc0 frames
    n4 = 2 + (4 // 2) % 3  # 4 frames
    assert {r.node for r in acc2.collect()} == {64 + f for f in range(n4)}


def _unit(d: int, dim: int = 8, eps_at: int | None = None) -> list:
    """Deterministic embedding: the d-th standard basis direction,
    optionally perturbed in one other coordinate — cosine between a
    base vector and its perturbed twin is 1/sqrt(1+0.01) ≈ 0.995,
    while distinct directions are orthogonal (cosine 0)."""
    v = [0.0] * dim
    v[d % dim] = 1.0
    if eps_at is not None:
        v[(d + 1 + eps_at) % dim] = 0.1
    return v


def test_incremental_semantic_flags_cross_run_near_dups(spark, tmp_path):
    """A near-identical embedding arriving in a LATER run is flagged
    against the accepted vector from the earlier run (probed through
    the persisted index's OWN centroids), only non-matching vectors
    extend the index, and the stored cell space never shifts."""
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_semantic,
    )

    idx = str(tmp_path / "semidx")
    run1 = spark.createDataFrame(
        [(1, _unit(0)), (2, _unit(1))],
        "vec_id long, embedding array<double>",
    )
    # nprobe == num_cells → exhaustive probing: the planted pair sets
    # below are exact, not recall-dependent
    acc1, flg1 = dedup_incremental_semantic(
        spark, run1, idx, num_cells=2, nprobe=2
    )
    assert {r.vec_id for r in acc1.collect()} == {1, 2}
    assert flg1.count() == 0

    cents1 = {
        (r.cell, tuple(r.cvec))
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }

    run2 = spark.createDataFrame(
        [(10, _unit(0, eps_at=0)), (11, _unit(2))],
        "vec_id long, embedding array<double>",
    )
    acc2, flg2 = dedup_incremental_semantic(
        spark, run2, idx, num_cells=2, nprobe=2
    )
    flagged = {(r.new_id, r.known_id) for r in flg2.collect()}
    assert flagged == {(10, 1)}  # cross-run near-dup caught
    assert {r.vec_id for r in acc2.collect()} == {11}
    for r in flg2.collect():
        assert r.cosine_e6 >= 850_000

    # append mode reused the stored centroids verbatim
    cents2 = {
        (r.cell, tuple(r.cvec))
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    assert cents1 == cents2

    # the run-2 accepted vector joined the index: its twin now flags
    run3 = spark.createDataFrame(
        [(20, _unit(2, eps_at=1))], "vec_id long, embedding array<double>"
    )
    acc3, flg3 = dedup_incremental_semantic(
        spark, run3, idx, num_cells=2, nprobe=2
    )
    assert acc3.count() == 0
    assert {(r.new_id, r.known_id) for r in flg3.collect()} == {(20, 11)}


def test_incremental_semantic_within_batch_greedy(spark, tmp_path):
    """Inside one batch the family's greedy rule applies: the smaller
    id of a ≥θ pair is accepted, the larger flagged against it — and a
    FULLY-flagged-or-kept first batch still bootstraps the index."""
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_semantic,
    )

    idx = str(tmp_path / "semidx2")
    batch = spark.createDataFrame(
        [(1, _unit(0)), (2, _unit(0, eps_at=0)), (3, _unit(1))],
        "vec_id long, embedding array<double>",
    )
    acc, flg = dedup_incremental_semantic(
        spark, batch, idx, num_cells=2, nprobe=2
    )
    assert {(r.new_id, r.known_id) for r in flg.collect()} == {(2, 1)}
    assert {r.vec_id for r in acc.collect()} == {1, 3}
    # only ACCEPTED vectors entered the index
    stored = {
        r.vec_id
        for r in spark.read.parquet(f"{idx}/cells").select("vec_id").collect()
    }
    assert stored == {1, 3}


def test_incremental_ensemble_composes_both_screens(spark, tmp_path):
    """Either-generator-fires across runs, with ONE accepted set
    committed to BOTH indexes: a text copy with an unrelated embedding
    flags via minhash, an embedding twin with unrelated text flags via
    semantic, and a doc accepted because neither fired extends both
    indexes — so ITS later twins flag through each respective index
    (the decide-then-commit property an eager per-face append would
    break)."""
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_ensemble,
    )

    idx = str(tmp_path / "ens")
    schema = "doc_id long, text string, embedding array<double>"
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different words entirely here today my friend yes"
    t3 = "a third separate document about winnowing rivers and stones"
    run1 = spark.createDataFrame(
        [(1, t1, _unit(0)), (2, t2, _unit(1))], schema
    )
    acc1, flg1 = dedup_incremental_ensemble(
        spark, run1, idx, num_cells=2, nprobe=2
    )
    assert {r.doc_id for r in acc1.collect()} == {1, 2}
    assert flg1.count() == 0

    run2 = spark.createDataFrame(
        [
            (10, t1, _unit(2)),            # text copy of 1, foreign vec
            (11, "unrelated fresh content nothing shared at all",
             _unit(1, eps_at=0)),          # vec twin of 2, foreign text
            (12, t3, _unit(3)),            # new on both axes
        ],
        schema,
    )
    acc2, flg2 = dedup_incremental_ensemble(
        spark, run2, idx, num_cells=2, nprobe=2
    )
    flagged = {(r.new_id, r.known_id, r.via) for r in flg2.collect()}
    assert (10, 1, "minhash") in flagged
    assert (11, 2, "semantic") in flagged
    assert {r.new_id for r in flg2.collect()} == {10, 11}
    assert {r.doc_id for r in acc2.collect()} == {12}

    # both sub-indexes describe exactly the ensemble-accepted history
    mh_ids = {
        r.known_id
        for r in spark.read.parquet(f"{idx}/minhash").select("known_id").collect()
    }
    sem_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/semantic/cells").select("doc_id").collect()
    }
    assert mh_ids == sem_ids == {1, 2, 12}

    # doc 12's commit reached BOTH indexes: its text twin flags via
    # minhash, its embedding twin via semantic
    run3 = spark.createDataFrame(
        [(20, t3, _unit(0, eps_at=2)), (21, "totally novel sentence here",
                                        _unit(3, eps_at=1))],
        schema,
    )
    _acc3, flg3 = dedup_incremental_ensemble(
        spark, run3, idx, num_cells=2, nprobe=2
    )
    f3 = {(r.new_id, r.known_id, r.via) for r in flg3.collect()}
    assert (20, 12, "minhash") in f3
    assert (21, 12, "semantic") in f3


def test_incremental_ensemble_three_faces(spark, tmp_path):
    """The media-aware ensemble (r13): text + embedding + perceptual
    fingerprint. Any of the THREE screens firing flags the doc, and
    the single accepted set extends all three indexes — so a later
    perceptual twin of an accepted doc flags through the phash index
    (decide-then-commit for the new face), and an all-flagged batch
    leaves every index untouched (the symmetric empty-commit guard)."""
    from flink_join_scaling_spark.operators.incremental import (
        dedup_incremental_ensemble,
    )

    idx = str(tmp_path / "ens3")
    schema = (
        "doc_id long, text string, embedding array<double>, phash long"
    )
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different words entirely here today my friend yes"
    t3 = "a third separate document about winnowing rivers and stones"
    h1 = 0x1234_5678_9ABC_DEF0
    h2 = 0x0F0F_F0F0_3C3C_C3C3
    h3 = 0x7777_0000_FFFF_1111
    h4 = 0x00FF_AA55_1357_9BDF
    run1 = spark.createDataFrame(
        [(1, t1, _unit(0), h1), (2, t2, _unit(1), h2)], schema
    )
    acc1, flg1 = dedup_incremental_ensemble(
        spark, run1, idx, num_cells=2, nprobe=2, hash_col="phash"
    )
    assert {r.doc_id for r in acc1.collect()} == {1, 2}
    assert flg1.count() == 0

    run2 = spark.createDataFrame(
        [
            # perceptual twin of 1 (hamming 2), foreign text + vec
            (10, "nothing shared textually with anyone here at all",
             _unit(4), h1 ^ 0b101),
            # text copy of 2, foreign vec + far hash
            (11, t2, _unit(5), h3),
            # new on all three axes
            (12, t3, _unit(3), h4),
        ],
        schema,
    )
    acc2, flg2 = dedup_incremental_ensemble(
        spark, run2, idx, num_cells=2, nprobe=2, hash_col="phash"
    )
    flagged = {(r.new_id, r.known_id, r.via) for r in flg2.collect()}
    assert (10, 1, "phash") in flagged
    assert (11, 2, "minhash") in flagged
    assert {r.new_id for r in flg2.collect()} == {10, 11}
    assert {r.doc_id for r in acc2.collect()} == {12}

    # ALL THREE sub-indexes describe exactly the accepted history
    mh_ids = {
        r.known_id
        for r in spark.read.parquet(f"{idx}/minhash").select("known_id").collect()
    }
    sem_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/semantic/cells")
        .select("doc_id").collect()
    }
    ph_ids = {
        r.known_id
        for r in spark.read.parquet(f"{idx}/phash").select("known_id").collect()
    }
    assert mh_ids == sem_ids == ph_ids == {1, 2, 12}

    # doc 12's commit reached the phash index: its perceptual twin
    # flags cross-run through the committed third face
    run3 = spark.createDataFrame(
        [(20, "yet another completely original text right here",
          _unit(6), h4 ^ 0b11)],
        schema,
    )
    _acc3, flg3 = dedup_incremental_ensemble(
        spark, run3, idx, num_cells=2, nprobe=2, hash_col="phash"
    )
    assert {(r.new_id, r.known_id, r.via) for r in flg3.collect()} == {
        (20, 12, "phash")
    }

    # all-flagged batch: the symmetric guard skips every commit
    # (h2 ^ 1 twins ACCEPTED doc 2's committed hash — h3 was doc 11's,
    # which was flagged and therefore never reached the index)
    run4 = spark.createDataFrame([(30, t1, _unit(7), h2 ^ 0b1)], schema)
    acc4, flg4 = dedup_incremental_ensemble(
        spark, run4, idx, num_cells=2, nprobe=2, hash_col="phash"
    )
    assert acc4.count() == 0
    assert {(r.new_id, r.via) for r in flg4.collect()} == {
        (30, "minhash"), (30, "phash")
    }
    assert {
        r.known_id
        for r in spark.read.parquet(f"{idx}/phash").select("known_id").collect()
    } == {1, 2, 12}
    assert {
        r.known_id
        for r in spark.read.parquet(f"{idx}/minhash").select("known_id").collect()
    } == {1, 2, 12}
