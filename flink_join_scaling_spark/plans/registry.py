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

#: Queries whose oracle parity crosses a round-6 float boundary on
#: pairwise-summed dot products: Spark evaluates them through the
#: NumPy/Arrow path (pairwise summation) while DuckDB folds
#: sequentially (see functions/vectors.py cosine6_pandas note) — an
#: accepted, property-tested ulp risk. If a regeneration flakes the
#: driver hash on EXACTLY these names, triage there first; it is the
#: documented boundary, not a logic bug. Kept in sync with the
#: "float-boundary-sensitive" query tag by a registry test.
FLOAT_BOUNDARY_SENSITIVE: tuple[str, ...] = (
    "q_dedup_embedding",
    "q_sim_ann_lsh",
    # History of this manifest (each cohort left by adopting integer
    # quantization): the SemDeDup/ensemble family left in round 7
    # (pair thresholds, argmin keys, and exposed centroid cosines
    # became e6 BIGINTs — functions/vectors.cosine_e6_pandas); the
    # quality-display cohort (q_quality_score/filter, q_source_stats,
    # q_dedup_keep_best) left in round 8 (raw-double predicates/order
    # keys + e4/e6 integer display, the q_source_cap discipline —
    # their decimal round(…,4) display hit a cross-engine midpoint on
    # some fixtures, e.g. doc 234 at sf0.001); and the whole
    # similarity top-k family ranks on e6 BIGINTs since round 8. The
    # two residents stay because their SCORING (q_dedup_embedding's
    # round-6 pair threshold) or ASSIGNMENT (q_sim_ann_lsh's dot>0
    # bucket sign on pairwise-vs-sequential summation) still crosses
    # a float boundary the oracle folds differently by ulps.
)


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
        # round-5 rotation greens: CORRECTNESS_r05.json — 50/50 hash
        # green, including the 11 post-regeneration re-attestations and
        # the two converted-to-self-attesting entries.
        "q_agg_skew_salted", "q_approx_distinct", "q_approx_quantiles",
        "q_cohort_retention", "q_dedup_containment", "q_dedup_lines",
        "q_dedup_minhash_ml", "q_dq_profile", "q_dq_rules", "q_ema",
        "q_entity_resolution", "q_fuzzy_match", "q_gapfill",
        "q_higher_order_funcs", "q_histogram", "q_join_skew_salted",
        "q_json_funcs", "q_quantize_embeddings", "q_rollup_multires",
        "q_scd2_intervals", "q_sim_ann_ivf_trained", "q_stream_join",
        "q_tpch_q11_important_stock", "q_tpch_q12_priority_class",
        "q_tpch_q13_order_distribution", "q_tpch_q15_top_supplier",
        "q_tpch_q16_supplier_counts", "q_tpch_q17_small_quantity",
        "q_tpch_q19_disjunctive_rev", "q_tpch_q20_excess_suppliers",
        "q_tpch_q21_waiting_suppliers", "q_tpch_q22_dormant_customers",
        "q_tpch_q2_min_cost_supplier", "q_tpch_q4_late_orders",
        "q_tpch_q7_nation_volume", "q_tpch_q8_market_share",
        "q_tpch_q9_product_profit", "q_transition_matrix",
        "q_window_distribution",
        # round-6 rotation greens: CORRECTNESS_r06.json — 50/50 hash
        # green, including all 17 previously never-attested names and
        # the round-6-new semantic/ensemble/triangles/persisted-ANN ops.
        "q_bm25", "q_collocations", "q_dedup_canonical_rank",
        "q_dedup_ensemble", "q_dedup_ensemble_apply", "q_dedup_semantic",
        "q_dedup_semantic_apply", "q_embed_outliers", "q_graph_triangles",
        "q_heavy_hitters", "q_hll_rollup", "q_join_bloom_reduced",
        "q_lm_score", "q_mixture_weights", "q_pipeline_e2e",
        "q_ppl_buckets", "q_retrieval_rrf", "q_shard_assignment",
        "q_sim_ann_persisted", "q_snapshot_diff", "q_source_drift",
        "q_source_overlap", "q_split_leakage_safe", "q_tfidf",
        "q_zorder_layout",
        # round-7 rotation greens: CORRECTNESS_r07.json — 50/50 hash
        # green: the r7-new trainers (BPE, classifier), spans census,
        # mixture temperature, source cap, knn/hard-negatives, fuzzy
        # decontamination, length buckets, dedup weights, plus fresh
        # re-attestations for the r3/r4-stale llmdata cohort and the
        # streaming four.
        "q_bpe_encode", "q_bpe_train", "q_decontaminate_fuzzy",
        "q_dedup_latest", "q_dedup_spans", "q_dedup_spans_apply",
        "q_dedup_weights", "q_hard_negatives", "q_knn_labels",
        "q_length_buckets", "q_mixture_temperature",
        "q_quality_classifier", "q_quality_classifier_apply",
        "q_sim_ann_pq", "q_source_cap",
    }
)

#: Highest CORRECTNESS round whose greens are folded into
#: ``_DRIVER_GREEN``. The rotation-hygiene test allows exactly ONE
#: newer round file on disk (the driver writes r{N+1} after the
#: round's last commit, so it can only be folded next round); two
#: newer rounds mean the rotation went stale — the starvation bug this
#: machinery exists to prevent — and the test fails loudly.
ROTATION_FOLDED_THROUGH = 7

# Queries whose output CHANGED this round, invalidating their prior
# green rows outright (not merely aging them). Round 8: the similarity
# family now ranks and exposes e6-integer cosines (cosine → cosine_e6
# BIGINT, raw-product quantization instead of round-6-then-scale); the
# classifier pair labels over e6-quantized quartiles derived without
# the global window; the quality-display cohort switched to raw-double
# compares + e4/e6 integer display; the two keeper elections rank on
# the raw score; q_mixture_temperature's upsample divides before
# multiplying. Ordered before even the stalest re-attestations — a
# changed query with an old green row is the one kind of entry whose
# CORRECTNESS record is actively wrong.
_CHANGED_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_sim_topk", "q_sim_topk_pandas", "q_sim_ann_lsh", "q_sim_ann_ivf",
        "q_knn_labels", "q_hard_negatives",
        "q_quality_classifier", "q_quality_classifier_apply",
        "q_quality_score", "q_quality_filter", "q_source_stats",
        "q_dedup_keep_best", "q_dedup_apply", "q_dedup_ensemble_apply",
        "q_mixture_temperature",
    }
)

# Queries whose latest driver row is stale and must be re-attested
# before never-recorded queries. Round 8 targets the r7 verdict's
# item 3: the 17 names whose latest green row is round 4, then the
# round-5 cohort living in files refactored since (tpch_full.py and
# temporal_q.py). 15 changed + 17 r4-stale + 9 r5 + 9 never-attested
# r8-new (CMS, bigram LM, novelty, NB trio, DSIR pair, trained
# pipeline — group 2) = 50 = the driver's window; the
# relational_ext.py r5 cohort (skew-salted pair, JSON/HOF, histogram,
# entity resolution, fuzzy match, DQ pair, approx pair, window
# distribution), the six temporal analytics whose plans the r8
# refactors did not touch (EMA, gap-fill, SCD2, cohort retention,
# transition matrix, multires rollup), and the TPC-H Q21/Q22 pair
# (bumped when q_novelty and q_nb_confusion landed — never-attested
# queries outrank re-attesting rows that still stand, the r7-new
# precedent) are the explicit round-9 deferral.
#: Subset of ``_NEEDS_FRESH_ROW`` with the OLDEST last-green round;
#: ordered ahead of the rest of group 1 so a time-budget cutoff starves
#: the freshest names, not the stalest.
_NEEDS_FRESH_ROW_FIRST: frozenset[str] = frozenset(
    {
        # last green in round 4 (every other query is r5+ at its latest
        # attestation)
        "q_join_semi", "q_join_anti", "q_pivot", "q_unpivot",
        "q_percentiles", "q_tpch_q3_shipping", "q_tpch_q6_forecast",
        "q_tpch_q10_returns", "q_tpch_q14_promo",
        "q_tpch_q18_large_orders", "q_join_asof", "q_join_range",
        "q_sessionize", "q_value_outliers", "q_funnel",
        "q_decontaminate_apply", "q_mixture_budget",
    }
)

_NEEDS_FRESH_ROW: frozenset[str] = _NEEDS_FRESH_ROW_FIRST | frozenset(
    {
        # round-5 rows in files refactored since: all 11 tpch_full.py
        # shapes and the temporal_q.py six
        "q_tpch_q2_min_cost_supplier", "q_tpch_q8_market_share",
        "q_tpch_q9_product_profit", "q_tpch_q11_important_stock",
        "q_tpch_q12_priority_class", "q_tpch_q15_top_supplier",
        "q_tpch_q16_supplier_counts", "q_tpch_q19_disjunctive_rev",
        "q_tpch_q20_excess_suppliers",
    }
)


def query_fns() -> dict[str, QueryFn]:
    """Driver iteration order. Groups, stable registration order
    within each: (0) queries whose output changed this round (their
    old rows are invalid, not just stale); (1) queries needing a fresh
    CORRECTNESS row this round (stale or never recorded) — the
    driver's ~50-entry window must land on these, oracle-bearing
    before rows-only; (2) oracle-bearing
    queries with no green row yet; (3) oracle-bearing queries already
    green in a prior round (their rows stand); (4) remaining rows-only
    queries last — a cutoff shadowing them loses nothing, they can
    never hash-match anyway."""
    order = list(QUERIES)

    def rank(s: QuerySpec) -> tuple[int, int, int, int, int, int]:
        return (
            s.name not in _CHANGED_THIS_ROUND,  # invalidated rows first
            s.name not in _NEEDS_FRESH_ROW,  # stale/missing rows next
            s.name not in _NEEDS_FRESH_ROW_FIRST,  # stalest first in group 1
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
