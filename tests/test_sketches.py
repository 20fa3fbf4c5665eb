"""Invariant tests for the Misra-Gries heavy-hitter operator
(operators/sketches.py): candidate soundness under a hostile k, exact
recount equality, and the k-bound guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_join_scaling_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_summaries,
)
from flink_join_scaling_spark.plans import QUERIES
from tests.conftest import SF_ORACLE


def _tokens(spark, sf_dir):
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(F.explode(tx.tokens_ws(F.col("text"))).alias("w"))


def test_candidates_superset_of_true_heavy_hitters(spark):
    """The MG candidate union must contain every token above W/(k+1) —
    checked against the exact counts, at the operator's minimum legal
    k (the worst case for the guarantee, not the 5x-slack default)."""
    toks = _tokens(spark, SF_ORACLE)
    theta = 200
    k = theta  # minimum legal: k + 1 > theta
    summ = misra_gries_summaries(toks, "w", k)
    cands = {
        r.token
        for r in summ.where(F.col("token").isNotNull()).distinct().collect()
    }
    exact = toks.groupBy("w").count()
    total = toks.count()
    truth = {
        r.w for r in exact.where(theta * F.col("count") > total).collect()
    }
    assert truth <= cands, sorted(truth - cands)[:10]


def test_heavy_hitters_equals_plain_groupby(spark):
    """The two-phase result is EXACT: identical to the full groupBy
    with the same threshold."""
    toks = _tokens(spark, SF_ORACLE)
    got = {
        (r.token, r.n_occurrences)
        for r in heavy_hitters(toks, "w", theta=200).collect()
    }
    total = toks.count()
    want = {
        (r.w, r["count"])
        for r in toks.groupBy("w")
        .count()
        .where(200 * F.col("count") > total)
        .collect()
    }
    assert got == want


def test_k_bound_guard():
    with pytest.raises(ValueError, match="too small"):
        heavy_hitters(None, "w", theta=200, k=100)


def test_registered_query_nonempty(spark):
    """Sanity on the registered form: stopword-like tokens exist at
    sf0.01, so the output is non-empty and sorted heaviest-first."""
    out = QUERIES["q_heavy_hitters"].fn(spark, SF_ORACLE).collect()
    assert len(out) > 0
    counts = [r.n_occurrences for r in out]
    assert counts == sorted(counts, reverse=True)


# ------------------------------------------------- streaming sibling


def test_stream_heavy_hitters_sound_and_never_overcounts(
    streaming_spark, tmp_path
):
    """The streaming MG candidate union contains every true heavy
    hitter of the fed corpus (soundness: a token's whole count lives in
    ONE bucket, undercount ≤ W_bucket/(k+1)), and no emission ever
    overcounts a token (MG only decrements). Data spans micro-batches,
    so candidates must survive state round-trips."""
    from flink_join_scaling_spark.streaming import (
        chunked_parquet_stream,
        collect_emissions,
        stream_heavy_hitters,
    )

    spark = streaming_spark
    toks = _tokens(spark, "/root/testdata/sf0.001")
    theta = 50
    total = toks.count()
    exact = {r.w: r["count"] for r in toks.groupBy("w").count().collect()}
    truth = {w for w, c in exact.items() if theta * c > total}
    assert truth, "fixture has no heavy hitters; lower theta"

    s = chunked_parquet_stream(spark, toks, str(tmp_path), n_chunks=3)
    em = collect_emissions(
        stream_heavy_hitters(s, "w", k=256, buckets=8), output_mode="update"
    )
    cands = set(em["token"])
    assert truth <= cands, sorted(truth - cands)[:10]
    over = [
        (t, int(e))
        for t, e in em[["token", "est"]].itertuples(index=False)
        if int(e) > exact.get(t, 0)
    ]
    assert not over, over[:10]


def test_stream_heavy_hitters_converged_equals_batch_adversarial_order(
    streaming_spark, tmp_path
):
    """Converged == batch under adversarial arrival: tokens stream in
    ascending-frequency order (floods of distinct rare tokens first,
    heavy mass last — the worst case for MG eviction pressure), split
    across micro-batches. The converged candidate union then goes
    through the SAME two-phase protocol the batch operator proves
    (exact recount of candidates, HAVING theta*c > W): the result must
    equal both the plain groupBy truth and the batch heavy_hitters()
    output. This is the sketch-then-verify guarantee carried over to
    continuous state: soundness survives any arrival order."""
    from pyspark.sql import Window

    from flink_join_scaling_spark.streaming import (
        chunked_parquet_stream,
        collect_emissions,
        converged,
        stream_heavy_hitters,
    )

    spark = streaming_spark
    toks = _tokens(spark, "/root/testdata/sf0.001")
    theta = 50
    total = toks.count()
    exact = {r.w: r["count"] for r in toks.groupBy("w").count().collect()}
    truth = {
        w: c for w, c in exact.items() if theta * c > total
    }
    assert truth, "fixture has no heavy hitters; lower theta"

    adversarial = toks.withColumn(
        "freq", F.count("*").over(Window.partitionBy("w"))
    ).orderBy(F.asc("freq"), F.asc("w")).select("w")
    s = chunked_parquet_stream(spark, adversarial, str(tmp_path), n_chunks=4)
    em = collect_emissions(
        stream_heavy_hitters(s, "w", k=256, buckets=8), output_mode="update"
    )
    conv = converged(em, ["bucket", "token"])
    cands = set(conv["token"])
    # phase 2: exact recount of the converged candidates only
    cand_df = spark.createDataFrame([(t,) for t in cands], "w string")
    recount = {
        r.w: r["count"]
        for r in toks.join(F.broadcast(cand_df), "w").groupBy("w").count().collect()
    }
    verified = {w: c for w, c in recount.items() if theta * c > total}
    assert verified == truth
    # and the batch operator agrees with the same truth
    from flink_join_scaling_spark.operators.sketches import heavy_hitters

    batch = {
        r.token: r.n_occurrences
        for r in heavy_hitters(toks, "w", theta=theta).collect()
    }
    assert batch == truth
    # converged estimates never overcount the exact counts
    over = [
        (t, int(e))
        for t, e in conv[["token", "est"]].itertuples(index=False)
        if int(e) > exact.get(t, 0)
    ]
    assert not over, over[:10]


# ------------------------------------------------ pagerank centrality


def test_pagerank_driver_path_bit_identical_to_distributed(spark):
    """The r17 size-gated driver replay must return BIT-identical
    doubles to the distributed join+agg rounds (same sorted-by-src
    left fold, same literals) — q_dedup_canonical_rank's round-6
    argmax depends on it. Graph mixes a clique, a chain, a star and
    duplicate edges so fold order and degree weighting are exercised."""
    from flink_join_scaling_spark.operators.dedup import pagerank

    edges = (
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]  # clique
        + [(10 + i, 11 + i) for i in range(6)]                  # chain
        + [(100, leaf) for leaf in (101, 102, 103, 104, 105)]   # star
        + [(1, 10), (4, 100), (1, 10)]                          # bridge + dup
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    drv = {r.node: r.r for r in pagerank(pairs).collect()}
    dist = {
        r.node: r.r
        for r in pagerank(pairs, driver_threshold=0).collect()
    }
    assert set(drv) == set(dist)
    diff = {n: (drv[n], dist[n]) for n in drv if drv[n] != dist[n]}
    assert not diff, diff  # exact ==, not approx


def test_pagerank_matches_hand_replay_and_prefers_hub(spark):
    """On a 4-node star the operator's ranks equal a pure-Python replay
    of the same fixed-iteration recurrence, and the hub outranks every
    leaf — the property canonical selection relies on."""
    from flink_join_scaling_spark.operators.dedup import pagerank

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {r.node: r.r for r in pagerank(pairs).collect()}

    nbrs = {1: [2, 3, 4], 2: [1], 3: [1], 4: [1]}
    deg = {n: len(v) for n, v in nbrs.items()}
    rr = {n: 1.0 for n in nbrs}
    for _ in range(3):
        rr = {
            n: 0.15 + 0.85 * sum(rr[m] / deg[m] for m in nbrs[n])
            for n in nbrs
        }
    assert set(got) == set(rr)
    assert all(abs(got[n] - rr[n]) < 1e-9 for n in rr)
    assert all(got[1] > got[leaf] for leaf in (2, 3, 4))


def test_cms_never_undercounts_any_token(spark):
    """The CMS guarantee holds for EVERY token, not just the top-k the
    registered query probes: est(token) >= exact(token) for all."""
    from flink_join_scaling_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = d.select(F.explode(tx.tokens_ws(F.col("text"))).alias("w"))
    sketch = cms_build(words, "w").localCheckpoint()
    exact = words.groupBy(F.col("w").alias("token")).agg(
        F.count("*").alias("exact_cnt")
    )
    est = cms_estimate(sketch, exact, "token")
    bad = est.where(F.col("cms_est") < F.col("exact_cnt")).count()
    assert bad == 0


def test_cms_sketch_is_mergeable(spark):
    """Union-by-summing two halves' sketches equals the whole-stream
    sketch — exact integer counters, the mergeability the streaming
    sibling relies on."""
    from flink_join_scaling_spark.operators.sketches import cms_build
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.sources.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = d.select("doc_id", F.explode(tx.tokens_ws(F.col("text"))).alias("w"))
    whole = cms_build(words, "w")
    a = cms_build(words.where(F.col("doc_id") % 2 == 0), "w")
    b = cms_build(words.where(F.col("doc_id") % 2 == 1), "w")
    merged = (
        a.unionByName(b)
        .groupBy("d", "pos")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    got = {(r.d, r.pos): r.cnt for r in merged.collect()}
    want = {(r.d, r.pos): r.cnt for r in whole.collect()}
    assert got == want


def test_stream_cms_converged_equals_batch(spark, tmp_path):
    """Continuous CMS: the converged last-emission-per-(d,pos) counter
    table equals the batch sketch on the same data regardless of
    micro-batch split."""
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.operators.sketches import cms_build
    from flink_join_scaling_spark.sources.catalog import load_table
    from flink_join_scaling_spark.streaming.harness import (
        chunked_parquet_stream,
        collect_emissions,
        converged,
    )
    from flink_join_scaling_spark.streaming.sketches import stream_cms

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    words = d.select(F.explode(tx.tokens_ws(F.col("text"))).alias("w"))
    batch = {(r.d, r.pos): r.cnt for r in cms_build(words, "w").collect()}
    s = chunked_parquet_stream(spark, words, str(tmp_path), n_chunks=4)
    em = collect_emissions(stream_cms(s, "w"), output_mode="update")
    conv = converged(em, ["d", "pos"])
    got = {
        (int(r.d), int(r.pos)): int(r.cnt) for _, r in conv.iterrows()
    }
    assert got == batch


def test_cms_estimate_preserves_unseen_keys(spark):
    """Contract regression: cms_estimate ADDS cms_est to every probe
    key. A key whose counter positions were never touched gets those
    counters as 0 (participating in the min), and a key with all D
    positions absent estimates exactly 0 — before the left-join fix it
    inflated the min or vanished from the output."""
    from flink_join_scaling_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    data = spark.createDataFrame([("aaa",)] * 5 + [("bbb",)] * 2, "w string")
    sketch = cms_build(data, "w")
    # probe one seen key and one key never inserted; md5 collisions
    # into ALL THREE of a seen key's rows are impossible here (only 2
    # distinct seen keys, W=1024), so the unseen key must estimate 0
    probes = spark.createDataFrame(
        [("aaa",), ("never-inserted-key",)], "token string"
    )
    got = {
        r.token: int(r.cms_est)
        for r in cms_estimate(sketch, probes, "token").collect()
    }
    assert set(got) == {"aaa", "never-inserted-key"}
    assert got["aaa"] >= 5          # never undercounts
    assert got["never-inserted-key"] == 0
