"""Mergeable frequency sketches: Misra-Gries heavy-hitter candidates
with exact recount.

The pattern this module exists for: finding all items above a
frequency threshold when the key cardinality is far too large to
groupBy (at 100 TB a raw token groupBy shuffles billions of distinct
keys, nearly all of which are irrelevant). The two-phase shape —

1. per-partition Misra-Gries summaries (bounded memory, one map-only
   pass, NO shuffle of the raw key stream), whose union is guaranteed
   to contain every item with global weight > W/(k+1);
2. exact recount of only the candidate set (the second scan is
   map-only too: a broadcast semi-join filters the stream, and the
   partial agg collapses to ≤ partitions x candidates rows before the
   one tiny exchange)

— delivers EXACT results (not estimates) with a shuffle bounded by
the candidate count, which is the sketch-then-verify discipline used
for heavy hitters at scale. The Misra-Gries merge guarantee makes the
candidate superset sound, so the final output equals a plain
``GROUP BY ... HAVING`` — which is exactly what the DuckDB oracle
runs.

Guarantee (per partition): every δ-trim subtracts δ from at least
k+1 counters (δ is the (k+1)-th largest count at trim time), so the
total mass removed per trim is ≥ (k+1)·δ and Σδ ≤ W_i/(k+1). An item
t with global count C missed by every partition therefore has
C ≤ Σ_i W_i/(k+1) = W/(k+1): choosing k+1 > θ makes missing a
global θ-heavy-hitter impossible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries: ≤ k candidate rows per partition plus
    one sentinel row (NULL token) carrying the partition's total item
    weight, so the caller gets candidates AND the global total from the
    same single pass. Batches are pre-aggregated with ``value_counts``
    (exact), so the Python-side work per batch is vocabulary-sized,
    not row-sized."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["token"].dropna().value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - delta for t, c in counters.items() if c > delta
                }
        yield pd.DataFrame(
            {
                "token": list(counters) + [None],
                "weight": [*counters.values(), total],
            }
        )

    return df.select(F.col(col).alias("token")).mapInPandas(
        part, schema="token string, weight long"
    )


def heavy_hitters(
    df: DataFrame, col: str, theta: int, k: int | None = None
) -> DataFrame:
    """All items whose exact count exceeds total/theta, with exact
    counts — computed without ever shuffling the raw key stream.

    ``k`` defaults to ``5 * theta`` (the soundness bound only needs
    ``k + 1 > theta``; the slack keeps candidates sound even under
    adversarial partition order). Output: (token, n_occurrences),
    heaviest first, token as tiebreak."""
    if k is None:
        k = 5 * theta
    if k + 1 <= theta:
        raise ValueError(f"k={k} too small for theta={theta}: need k+1 > theta")
    summaries = misra_gries_summaries(df, col, k)
    # localCheckpoint: the summaries feed two consumers (candidates +
    # total); without it the map pass would run twice
    summaries = summaries.localCheckpoint(eager=False)
    cands = summaries.where(F.col("token").isNotNull()).select("token").distinct()
    total = summaries.where(F.col("token").isNull()).agg(
        F.sum("weight").alias("n")
    )
    exact = (
        df.select(F.col(col).alias("token"))
        .join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.lit(theta) * F.col("n_occurrences") > F.col("n"))
        .select("token", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
    )


# ------------------------------------------------------- Count-Min sketch

#: CMS geometry: D independent hash rows × W counters. Error bound:
#: estimate ∈ [true, true + 2·N/W] with prob ≥ 1 − (1/2)^D over the
#: hash draw (here the hash family is FIXED md5 slices, so for given
#: data the sketch — and therefore every estimate — is deterministic
#: and engine-reproducible).
CMS_D = 3
CMS_W = 1024


def cms_positions(key) -> list[F.Column]:
    """D counter positions from ONE md5: disjoint 8-nibble slices
    (the MinHash/bloom hash-family discipline — one digest, sliced)."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("bigint") % CMS_W
        for j in range(CMS_D)
    ]


def cms_build(df: DataFrame, col: str) -> DataFrame:
    """The sketch itself as a (d, pos, cnt) table — ≤ D×W rows
    regardless of input size. ONE map-only pass explodes each item to
    its D positions; the only shuffle is keyed by (d, pos), collapsing
    map-side to ≤ partitions × D × W partial rows. The table is
    MERGEABLE by construction: sketches of disjoint data union by
    summing counters (exact integer adds), which is also why the
    identical shape runs continuously as a streaming update-mode agg
    (``streaming.sketches.stream_cms``)."""
    return (
        df.select(F.posexplode(F.array(*cms_positions(col))).alias("d", "pos"))
        .groupBy("d", "pos")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates: per key, min over the D rows of its
    counters — adds ``cms_est`` to ``keys``. The sketch (≤ D×W rows)
    broadcasts; the probe is an equi-join on (d, pos), never a scan of
    the original stream."""
    probes = keys.select(
        "*", F.posexplode(F.array(*cms_positions(key_col))).alias("d", "pos")
    )
    others = [c for c in keys.columns]
    # LEFT join + coalesce-0: a probe key whose counter position was
    # never touched means that counter is 0, so it must participate in
    # the min (and a key with ALL D positions absent estimates 0, not
    # vanish) — an inner join would both inflate the min and silently
    # drop unseen keys, breaking the "adds cms_est to keys" contract.
    return (
        probes.join(F.broadcast(sketch), ["d", "pos"], "left")
        .groupBy(*others)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )
