"""Invariant tests for the layout operators (plans/layout.py): Bloom
semi-join reduction, leakage-safe splitting, Z-order layout keys.

The exact-value gate is tests/test_oracle_parity.py (auto-covers every
registry entry); these pin the semantic guarantees that survive a
testdata regeneration: the Bloom no-false-negative law, the
zero-leakage split property, and the Z-order envelope bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark import plans
from tests.conftest import SF_ORACLE

# ------------------------------------------------- bloom semi-join


def test_bloom_no_false_negatives_and_reduction(spark):
    """Every true match passes the filter (the Bloom guarantee), the
    filter admits strictly fewer rows than the full fact, and the
    cross-tab accounts for every lineitem row exactly once."""
    out = plans.QUERIES["q_join_bloom_reduced"].fn(spark, SF_ORACLE)
    rows = {(r.passes_filter, r.is_match): r.n_rows for r in out.collect()}
    # a matching row rejected by the filter would be a false negative
    assert (False, True) not in rows
    from flink_join_scaling_spark.sources.catalog import load_table

    n_fact = load_table(spark, SF_ORACLE, "lineitem").count()
    assert sum(rows.values()) == n_fact
    admitted = sum(n for (p, _), n in rows.items() if p)
    assert 0 < admitted < n_fact  # the filter actually reduces traffic
    # false positives exist but stay a bounded fraction of the admitted
    fp = rows.get((True, False), 0)
    assert fp < admitted  # matches dominate the admitted traffic


# ---------------------------------------------- leakage-safe split


def test_split_leakage_free_and_total(spark):
    """No duplicate group straddles the split, both splits are
    non-empty, and doc/group counts reconcile with the corpus."""
    out = plans.QUERIES["q_split_leakage_safe"].fn(spark, SF_ORACLE)
    rows = {r.split: r for r in out.collect()}
    assert set(rows) == {"train", "valid"}
    assert all(r.n_leaked_groups == 0 for r in rows.values())
    assert all(r.n_docs >= r.n_groups > 0 for r in rows.values())
    from flink_join_scaling_spark.sources.catalog import load_table

    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert rows["train"].n_docs + rows["valid"].n_docs == n_docs
    # ~90/10 by construction; allow wide slack for bucket granularity
    frac = rows["train"].n_docs / n_docs
    assert 0.75 < frac < 0.99


# ------------------------------------------------------------ z-order


def test_zorder_envelopes_bounded(spark):
    """Each z-range file's min/max envelope is bounded on BOTH
    dimensions: 1024 z-values per file can span at most 32 distinct
    x values and 32 distinct y values (interleaved 5 low bits each),
    which is the data-skipping payoff vs a single-column sort."""
    out = plans.QUERIES["q_zorder_layout"].fn(spark, SF_ORACLE)
    bad = out.where(
        (F.col("x_max") - F.col("x_min") >= 32)
        | (F.col("y_max") - F.col("y_min") >= 32)
    ).count()
    assert bad == 0
    # files partition the rows exactly
    from flink_join_scaling_spark.sources.catalog import load_table

    ev = load_table(spark, SF_ORACLE, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    total = out.agg(F.sum("n_rows")).collect()[0][0]
    assert total == ev.count()
