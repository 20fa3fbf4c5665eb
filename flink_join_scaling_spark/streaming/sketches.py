"""Streaming heavy hitters: keyed Misra-Gries state per hash bucket —
the continuous sibling of ``operators/sketches.py``.

Tokens are hash-partitioned into a fixed number of buckets (the
stateful exchange's key), and each bucket maintains one Misra-Gries
summary of at most k counters in ``applyInPandasWithState``. Because
every occurrence of a token lands in exactly ONE bucket (unlike the
batch path, where a token's count is spread across input partitions),
the soundness bound tightens: a token's undercount is at most
W_bucket/(k+1) ≤ W/(k+1), so with k+1 > θ no global θ-heavy-hitter can
ever be evicted from its bucket's summary. Each micro-batch re-emits
the updated summary for exactly the buckets that received data
(update-mode changelog, the engine's CountTrigger mapping) — the union
of emissions is therefore a sound, continuously-maintained candidate
set for the same exact recount the batch operator runs.

State per bucket is ≤ k (token, count) pairs + one total: bounded
regardless of stream length — the ``VersioningEvictor`` discipline
(bounded keyed state under continuous updates) applied to frequency
sketching.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _mg_bucket_fn(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, counts, total = state.get
            counters = dict(zip(list(toks), (int(c) for c in counts)))
            total = int(total)
        else:
            counters, total = {}, 0
        changed = False
        for pdf in pdfs:
            vc = pdf["token"].dropna().value_counts()
            if len(vc) == 0:
                continue
            changed = True
            total += int(vc.sum())
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                # δ = (k+1)-th largest → ≥ k+1 counters lose δ each:
                # Σδ ≤ W_bucket/(k+1), the eviction-soundness bound
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - delta for t, c in counters.items() if c > delta
                }
        if changed:
            state.update(
                (
                    list(counters),
                    [int(v) for v in counters.values()],
                    total,
                )
            )
            yield pd.DataFrame(
                {
                    "bucket": [int(key[0])] * len(counters),
                    "token": list(counters),
                    "est": list(counters.values()),
                    "bucket_total": [total] * len(counters),
                }
            )

    return fn


def stream_heavy_hitters(
    sdf: DataFrame, col: str, k: int = 1024, buckets: int = 32
) -> DataFrame:
    """Continuous heavy-hitter candidates over a token stream.

    Map side: bucket = md5-derived hash of the token mod ``buckets``
    (the same deterministic md5 discipline as the batch hash family) —
    the only shuffle is the bucket-keyed stateful exchange, carrying
    (token, bucket) rows. Emissions are update-mode summaries
    (bucket, token, est, bucket_total); ``est`` never overcounts
    (Misra-Gries only decrements), and the converged candidate union
    contains every token with global count > total/(k+1)."""
    toks = sdf.select(F.col(col).alias("token")).where(
        F.col("token").isNotNull()
    )
    bucketed = toks.withColumn(
        "bucket",
        (
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint")
            % buckets
        ).cast("int"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _mg_bucket_fn(k),
        outputStructType="bucket int, token string, est long, bucket_total long",
        stateStructType="tokens array<string>, counts array<long>, total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_hll_rollup(
    sdf: DataFrame, key_col: str, col: str, lg_k: int = 12
) -> DataFrame:
    """Continuous per-key distinct-count sketches: the streaming
    sibling of the registered ``q_hll_rollup`` batch query.

    A plain update-mode streaming aggregation carries the DataSketches
    HLL register state (constant-size per key: 2^lg_k registers) in
    the engine's state store — no custom state machine needed, because
    ``hll_sketch_agg`` is an algebraic aggregate and Structured
    Streaming maintains algebraic aggregates incrementally. Each
    micro-batch re-emits (key, n_est, sketch) for the keys it touched;
    the converged last-emission-per-key estimates equal the batch
    sketch on the same data under any arrival order (asserted in
    tests/test_streaming_text.py), and the emitted sketch BINARIES are
    the mergeable partials: a downstream ``hll_union_agg`` over the
    converged sketches yields the batch global estimate without
    re-reading the stream — the same rollup algebra the batch query
    proves, maintained continuously.
    """
    src = sdf.select(F.col(key_col), F.col(col).alias("__item")).where(
        F.col("__item").isNotNull()
    )
    return src.groupBy(key_col).agg(
        F.expr(f"hll_sketch_agg(__item, {lg_k})").alias("sketch"),
    ).select(
        key_col,
        F.expr("cast(round(hll_sketch_estimate(sketch)) as bigint)").alias(
            "n_est"
        ),
        "sketch",
    )


def stream_cms(sdf: DataFrame, col: str) -> DataFrame:
    """Continuous Count-Min sketch: the streaming sibling of the batch
    ``operators.sketches.cms_build``. A plain update-mode streaming
    aggregation on (d, pos) — the D×W counter table is the aggregate
    state (bounded by the sketch geometry, NOT by stream volume or key
    cardinality, which is the whole point of sketching an unbounded
    token stream), and each micro-batch re-emits the counters it
    touched. The converged last-emission-per-(d, pos) table equals the
    batch sketch on the same data under any arrival order (exact
    integer sums — asserted in tests), so a downstream probe runs
    ``cms_estimate`` against the maintained table without re-reading
    the stream."""
    from flink_join_scaling_spark.operators.sketches import cms_positions

    return (
        sdf.where(F.col(col).isNotNull())
        .select(F.posexplode(F.array(*cms_positions(col))).alias("d", "pos"))
        .groupBy("d", "pos")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
