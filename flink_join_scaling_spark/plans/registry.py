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
    # EMPTY since round 10: the last two residents adopted the
    # e6-BIGINT recipe — q_dedup_embedding scores/thresholds on
    # CAST(round(cos*1e6) AS BIGINT) (integer compare, no decimal-
    # rounding ulp at the 0.45 boundary) and q_sim_ann_lsh takes its
    # sign-random-projection bucket bits on the e6-quantized plane
    # dots (a |dot| within summation noise of zero rounds to the same
    # integer 0 in both engines). The documented ulp-risk class is
    # closed; the manifest and tag machinery stay for any future
    # query that reopens it.
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
    # last two residents (q_dedup_embedding's round-6 pair threshold,
    # q_sim_ann_lsh's dot>0 bucket sign) left in round 10 as above.
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


# ------------------------------------------------------------------
# Driver-window rotation (round 9 policy: stalest-first, mechanically)
#
# The driver replays the first ~50 entries of ``query_fns()`` each
# round under a time budget. ``_LAST_GREEN`` maps every query to the
# round of its LATEST hash-green CORRECTNESS row, folded through
# ``ROTATION_FOLDED_THROUGH``; ordering ascends on that round so the
# window always lands on the stalest attestations automatically — the
# hand-curated ``_NEEDS_FRESH_ROW`` lists of rounds 5-8 are retired
# (they required re-deriving the cohort every round and twice deferred
# names past 3-rounds-stale). ``tests/test_registry_rotation.py``
# recomputes this map from the CORRECTNESS files on disk and fails on
# any divergence, and enforces the standing policy: after each round's
# window runs, no query's latest green row may be older than
# ``ROTATION_FOLDED_THROUGH - 2`` (every ≥3-rounds-stale name must
# rank inside the window).
_LAST_GREEN: dict[str, int] = {
    "q_agg_cube": 14, "q_agg_distinct": 14, "q_agg_group": 14,
    "q_agg_grouping_sets": 13, "q_agg_rollup": 14, "q_agg_skew_salted": 13,
    "q_approx_distinct": 14, "q_approx_quantiles": 13,
    "q_array_explode": 14, "q_array_funcs": 14, "q_audio_resample": 15,
    "q_bm25": 14, "q_bpe_encode": 15, "q_bpe_train": 15, "q_cms_freq": 15,
    "q_cohort_retention": 13, "q_collocations": 14, "q_date_funcs": 14,
    "q_decontaminate": 15, "q_decontaminate_apply": 12,
    "q_decontaminate_fuzzy": 15, "q_decontaminate_semantic": 13,
    "q_dedup_apply": 12, "q_dedup_audiohash": 15,
    "q_dedup_audiohash_apply": 15, "q_dedup_canonical_rank": 14,
    "q_dedup_components": 15, "q_dedup_containment": 13,
    "q_dedup_embedding": 14, "q_dedup_embedding_ivf": 14,
    "q_dedup_ensemble": 15, "q_dedup_ensemble_apply": 12,
    "q_dedup_exact": 13, "q_dedup_exact_apply": 15, "q_dedup_frames": 15,
    "q_dedup_keep_best": 12, "q_dedup_latest": 15,
    "q_dedup_latest_by_key": 12, "q_dedup_lines": 13,
    "q_dedup_minhash": 13, "q_dedup_minhash_ml": 13, "q_dedup_ngram": 15,
    "q_dedup_phash": 15, "q_dedup_phash_apply": 15,
    "q_dedup_phash_jpeg": 12, "q_dedup_phash_mixed": 12,
    "q_dedup_phash_progressive": 13, "q_dedup_semantic": 15,
    "q_dedup_semantic_apply": 15, "q_dedup_simhash": 15,
    "q_dedup_spans": 15, "q_dedup_spans_apply": 15, "q_dedup_videos": 12,
    "q_dedup_weights": 15, "q_dedup_winnow": 13,
    "q_dedup_winnow_apply": 13, "q_dq_profile": 13, "q_dq_rules": 13,
    "q_dsir_select": 12, "q_dsir_weights": 12, "q_ema": 13,
    "q_embed_centroids": 15, "q_embed_outliers": 14,
    "q_entity_resolution": 13, "q_extract_html": 14,
    "q_extract_html_apply": 14, "q_extract_links": 15,
    "q_extract_warc": 14, "q_fingerprint": 13, "q_funnel": 12,
    "q_fuzzy_match": 13, "q_gapfill": 13, "q_gopher_rules": 13,
    "q_graph_triangles": 14, "q_hard_negatives": 12,
    "q_hard_negatives_ann": 13, "q_heavy_hitters": 14,
    "q_higher_order_funcs": 13, "q_histogram": 13, "q_hll_rollup": 14,
    "q_inverted_index": 15, "q_join_anti": 12, "q_join_asof": 12,
    "q_join_bloom_reduced": 14, "q_join_full_outer": 13,
    "q_join_full_outer_seq": 14, "q_join_inner": 14,
    "q_join_left_outer": 14, "q_join_left_outer_seq": 14,
    "q_join_range": 12, "q_join_semi": 12, "q_join_skew_salted": 13,
    "q_json_funcs": 13, "q_knn_labels": 12, "q_lang_id": 13,
    "q_length_buckets": 15, "q_lm_bigram": 12, "q_lm_bigram_hashed": 13,
    "q_lm_score": 14, "q_math_funcs": 14, "q_mixture_budget": 12,
    "q_mixture_temperature": 12, "q_mixture_weights": 14,
    "q_mmr_select": 13, "q_multimodal_features": 15,
    "q_multimodal_frames": 15, "q_multimodal_frames_real": 15,
    "q_multimodal_meta": 15, "q_multimodal_resize": 15,
    "q_nb_confusion": 12, "q_nb_lang_apply": 12, "q_nb_lang_train": 12,
    "q_novelty": 12, "q_pack_sequences": 15, "q_percentiles": 12,
    "q_pii_redact": 15, "q_pipeline_audio": 12, "q_pipeline_e2e": 14,
    "q_pipeline_media": 15, "q_pipeline_trained": 12, "q_pivot": 12,
    "q_ppl_buckets": 14, "q_quality_classifier": 12,
    "q_quality_classifier_apply": 12, "q_quality_filter": 12,
    "q_quality_score": 12, "q_quantize_embeddings": 13, "q_repetition": 15,
    "q_retrieval_rrf": 14, "q_rollup_multires": 13, "q_sample_hash": 15,
    "q_sample_stratified": 15, "q_scalar_subquery": 13,
    "q_scan_filter_project": 14, "q_scd2_intervals": 13,
    "q_sessionize": 12, "q_set_except": 14, "q_set_intersect": 14,
    "q_set_union": 14, "q_shard_assignment": 14, "q_sim_ann_ivf": 15,
    "q_sim_ann_ivf_trained": 13, "q_sim_ann_lsh": 14,
    "q_sim_ann_persisted": 13, "q_sim_ann_pq": 15, "q_sim_topk": 12,
    "q_sim_topk_pandas": 15, "q_snapshot_diff": 14, "q_source_cap": 15,
    "q_source_drift": 14, "q_source_overlap": 14, "q_source_stats": 12,
    "q_split_leakage_safe": 14, "q_stream_dedup": 15, "q_stream_join": 13,
    "q_stream_session": 15, "q_stream_sliding": 15,
    "q_stream_tumbling": 15, "q_string_funcs": 14, "q_text_chunks": 13,
    "q_text_stats": 13, "q_tfidf": 14, "q_token_count": 13,
    "q_tokenizer_fertility": 13, "q_topk": 14, "q_tpch_q10_returns": 12,
    "q_tpch_q11_important_stock": 12, "q_tpch_q12_priority_class": 12,
    "q_tpch_q13_order_distribution": 13, "q_tpch_q14_promo": 12,
    "q_tpch_q15_top_supplier": 12, "q_tpch_q16_supplier_counts": 12,
    "q_tpch_q17_small_quantity": 13, "q_tpch_q18_large_orders": 12,
    "q_tpch_q19_disjunctive_rev": 12, "q_tpch_q1_pricing": 14,
    "q_tpch_q20_excess_suppliers": 12, "q_tpch_q21_waiting_suppliers": 13,
    "q_tpch_q22_dormant_customers": 13, "q_tpch_q2_min_cost_supplier": 12,
    "q_tpch_q3_shipping": 15, "q_tpch_q4_late_orders": 12,
    "q_tpch_q5_local_supplier": 15, "q_tpch_q6_forecast": 15,
    "q_tpch_q7_nation_volume": 13, "q_tpch_q8_market_share": 12,
    "q_tpch_q9_product_profit": 12, "q_transition_matrix": 13,
    "q_triplet_mining": 13, "q_unpivot": 12, "q_url_canonicalize": 15,
    "q_value_outliers": 12, "q_vocab_df": 15, "q_window_analytic": 14,
    "q_window_distribution": 13, "q_window_range_frame": 13,
    "q_window_rank": 14, "q_zorder_layout": 14,
}

#: Back-compat view used by tests: the set of queries holding ANY
#: driver-green row through the folded round.
_DRIVER_GREEN: frozenset[str] = frozenset(_LAST_GREEN)

#: Highest CORRECTNESS round whose greens are folded into
#: ``_LAST_GREEN``. The rotation-hygiene test allows exactly ONE
#: newer round file on disk (the driver writes r{N+1} after the
#: round's last commit, so it can only be folded next round); two
#: newer rounds mean the rotation went stale — the starvation bug this
#: machinery exists to prevent — and the test fails loudly.
ROTATION_FOLDED_THROUGH = 15

# Queries whose output CHANGED this round, invalidating their prior
# green rows outright (not merely aging them). Round 16: one
# verdict-ordered fixture hardening changes its driver hash:
# - q_url_canonicalize: the messy-URL fixture gains planted
#   dot-segment spellings (`/../k/` on the even side, `/./` on the
#   odd side) now that canonicalize_url applies the RFC 3986 §6.2.2.3
#   remove_dot_segments walk (the r15 verdict's task 4 — the
#   documented remaining swap slot, now spent).
_CHANGED_THIS_ROUND: frozenset[str] = frozenset({"q_url_canonicalize"})

#: Names whose operator code changed after their latest green row was
#: recorded, with an argument — not a driver-attested proof — that
#: outputs are unchanged. Promoted ahead of their same-staleness peers
#: so the window re-executes the argument cheaply. Round 16 EXTENDS
#: the rule per the r15 verdict's What's-wrong finding: implementation
#: changes are treated like fixture changes — the narrow
#: "exclusion class" of r14/r15 (semantics-preserving code changes
#: documented in comments but left OUT of the window) is retired.
#: - q_extract_warc: sources/warc.py was substantially rewritten in
#:   r15 (gz member framing dispatch, tolerant charset-aware body
#:   decode) AFTER its r14 attestation; the r15 verdict orders it
#:   into the r16 window.
#: - q_extract_html / q_extract_html_apply / q_extract_links: the r16
#:   HTML5 ``<head>`` implicit-close fix (both parsers moved to a
#:   skip STACK) plus the synth_html hardening that omits ``</head>``
#:   on every 5th fixture page. Outputs are argued unchanged (the
#:   implicit close restores identical segmentation; filtered DuckDB
#:   re-verification hash-green at sf0.01 after the change) — the
#:   window re-executes the argument.
_TOUCHED_SINCE_GREEN: frozenset[str] = frozenset(
    {
        "q_extract_warc",
        "q_extract_html",
        "q_extract_html_apply",
        "q_extract_links",
    }
)

#: Names explicitly deferred from the previous round, ordered at the
#: very front of their staleness cohort so a driver time-budget cutoff
#: starves the freshest names, never these. Round 16: EMPTY — the r15
#: window ran 50/50 green with no cutoff.
_PRIORITY_FIRST: frozenset[str] = frozenset()

#: Stale names mechanically displaced OUT of this round's 50-slot
#: window because changed/touched/new registrations preempt them (the
#: r15 verdict's task 2: the window is permanently full from r16 on —
#: cohorts are 50 names — so preemption is ordered, not optional:
#: "task 1's new registration plus q_extract_warc must preempt").
#: Discipline: (a) the set is exactly the LOWEST-ranked stale names —
#: the rank function decides who spills, never hand-picking; (b) its
#: size never exceeds the number of preempting (changed ∪ touched ∪
#: never-green) names inside the window; (c) at the NEXT round's fold
#: every name here moves into ``_PRIORITY_FIRST`` so it leads the
#: next window and can never spill twice in a row. All three clauses
#: are enforced by tests/test_registry_rotation.py.
_DISPLACED_THIS_ROUND: frozenset[str] = frozenset(
    {
        "q_dsir_select",
        "q_dsir_weights",
        "q_nb_confusion",
        "q_nb_lang_apply",
        "q_nb_lang_train",
        "q_pipeline_trained",
    }
)

#: Computed stale set (kept for the hygiene tests): every query whose
#: latest green row is ≥3 rounds older than the folded-through round —
#: the cohort this round's window MUST cover.
_NEEDS_FRESH_ROW: frozenset[str] = frozenset(
    n for n, r in _LAST_GREEN.items() if r <= ROTATION_FOLDED_THROUGH - 3
)


def query_fns() -> dict[str, QueryFn]:
    """Driver iteration order. Tiers: (0) queries whose output changed
    this round (their old rows are invalid, not just stale); (1)
    ``_TOUCHED_SINCE_GREEN`` — operator code changed after the last
    green row, so the attestation argument is weakest (r10 verdict:
    "at the very front", ahead even of new registrations, so a
    time-budget cutoff can never defer them again); (2) oracle-bearing
    queries with no green row yet (new registrations); (3) everything
    else ascending by latest-green round — stalest first — with
    ``_PRIORITY_FIRST`` leading each cohort; rows-only queries sort
    after oracle-bearing peers (a cutoff shadowing them loses nothing
    — they can never hash-match); stable registration order breaks
    remaining ties."""
    order = list(QUERIES)

    def rank(s: QuerySpec) -> tuple:
        return (
            s.name not in _CHANGED_THIS_ROUND,  # invalidated rows first
            s.oracle is None,  # rows-only after oracle-bearing
            s.name not in _TOUCHED_SINCE_GREEN,  # weakest attestation next
            _LAST_GREEN.get(s.name, 0),  # never-green (0), then stalest
            s.name not in _PRIORITY_FIRST,  # explicit leads per cohort
            order.index(s.name),
        )

    specs = sorted(QUERIES.values(), key=rank)
    return {s.name: s.fn for s in specs}


def oracle_sqls() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


def headline_queries() -> list[str]:
    return [n for n, s in QUERIES.items() if s.headline]
