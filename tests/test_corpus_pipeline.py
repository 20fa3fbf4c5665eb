"""End-to-end corpus pipeline: the operators composed the way a real
training-data job runs them — filter → near-dup pairs → duplicate
groups → survivor selection → sequence packing — with conservation
invariants checked at each boundary. This is the system-level test
that the pieces compose, not just pass their unit oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark.functions import text as tx
from flink_join_scaling_spark.operators import dedup as dd
from flink_join_scaling_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_corpus_pipeline_end_to_end(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source",
        tx.quality_score(F.col("text")).alias("quality"),
        tx.n_tokens_ws(F.col("text")).alias("n_tok"),
    )
    kept = docs.where(F.col("quality") >= 0.4)
    n_kept = kept.count()
    assert 0 < n_kept  # the gate keeps a working corpus

    pairs = dd.minhash_dedup_pairs(kept, "doc_id", "text", threshold=0.5)
    comp = dd.connected_components(pairs)
    best = dd.dedup_keep_best(kept, pairs, "doc_id", "quality")

    members = comp.count()
    n_groups = best.count()
    # every component elects exactly one keeper
    assert n_groups == comp.select("component_id").distinct().count()
    # group sizes add up to the member count
    assert best.agg(F.sum("n_members")).first()[0] == members

    # survivors = non-members + keepers
    keeper_ids = {r.keeper_id for r in best.collect()}
    member_ids = {r.node for r in comp.collect()}
    survivors = kept.where(
        ~F.col("doc_id").isin(list(member_ids - keeper_ids))
    )
    assert survivors.count() == n_kept - (members - n_groups)

    # pack survivors into ~512-token bins per source; token mass is
    # conserved exactly through the packing
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        survivors.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("bin_idx", F.floor((F.col("cum") - F.col("n_tok")) / 512))
        .groupBy("source", "bin_idx")
        .agg(F.sum("n_tok").alias("bin_tokens"), F.count("*").alias("n_docs"))
    )
    total_before = survivors.agg(F.sum("n_tok")).first()[0]
    total_after = packed.agg(F.sum("bin_tokens")).first()[0]
    assert total_before == total_after
    # no bin except possibly a source's last overflows past budget+max_doc
    assert packed.where(F.col("n_docs") <= 0).count() == 0


def test_collocations_planted_phrase_tops_lift(spark):
    """A phrase whose words appear ONLY together must out-lift a pair
    of independently frequent words; counts are exact."""
    from flink_join_scaling_spark.plans.corpus import q_collocations

    # "zig zag" always adjacent (8x); "the cat" co-occurs 8x but both
    # words also appear apart, diluting their lift.
    docs = [
        (i, "zig zag the cat " + ("the dog " * 3) + "cat nap", "en", "s0", 0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.createOrReplaceTempView("__colloc_docs")
    import flink_join_scaling_spark.plans.corpus as cp
    from flink_join_scaling_spark.sources import catalog

    orig = catalog.load_table
    try:
        catalog.load_table = lambda spark, sf, name: df  # noqa: ARG005
        cp.load_table = catalog.load_table
        out = q_collocations(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        cp.load_table = orig
    by_bigram = {r.bigram: r for r in out}
    assert by_bigram["zig zag"].n_xy == 8
    assert by_bigram["zig zag"].n_x == 8 and by_bigram["zig zag"].n_y == 8
    # planted exclusive pair has the highest lift in the corpus
    assert out[0].bigram == "zig zag"
    assert by_bigram["zig zag"].lift_e6 > by_bigram["the cat"].lift_e6


def test_source_overlap_counts_shared_shingles_exactly(spark):
    """Two sources sharing exactly one 3-gram, a third disjoint source:
    the pair row carries exact sizes and the disjoint source is absent."""
    from flink_join_scaling_spark.plans.corpus import q_source_overlap
    import flink_join_scaling_spark.plans.corpus as cp
    from flink_join_scaling_spark.sources import catalog

    docs = [
        (1, "alpha beta gamma delta", "en", "sA", 0),  # shingles: abg, bgd
        (2, "alpha beta gamma", "en", "sB", 0),        # shingle:  abg
        (3, "zeta eta theta", "en", "sC", 0),          # disjoint
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda spark, sf, name: df  # noqa: ARG005
        cp.load_table = catalog.load_table
        rows = q_source_overlap(spark, "ignored").collect()
    finally:
        catalog.load_table = orig
        cp.load_table = orig
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_a, r.src_b) == ("sA", "sB")
    assert (r.n_inter, r.n_a, r.n_b) == (1, 2, 1)
    assert abs(r.jaccard - 0.5) < 1e-9


# ---------------------------------------------------- source drift PSI


def test_source_drift_nonnegative_and_total(spark):
    """PSI is a sum of (p-q)*ln(p/q) terms, each >= 0 (both factors
    share sign), so every source's PSI must be >= 0; one row per
    source; per-source doc counts reconcile with the corpus."""
    from flink_join_scaling_spark.plans import QUERIES
    from flink_join_scaling_spark.sources.catalog import load_table
    from tests.conftest import SF_ORACLE

    out = QUERIES["q_source_drift"].fn(spark, SF_ORACLE).collect()
    d = load_table(spark, SF_ORACLE, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(out) == n_sources
    assert all(r.psi >= 0 for r in out)
    assert sum(r.n_docs for r in out) == d.count()
