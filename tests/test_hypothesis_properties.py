"""Hypothesis property tests — the direct analogue of the reference's
ScalaCheck protocol (``JoinSpec.scala:16-36``): randomized inputs with
shrinking, tight id/ts ranges to force the nasty regimes (id
collisions, timestamp ties, empty sides, dangling keys), compared
field-exact against the pure-Python oracle of
``test_versioned_properties``.

Example counts are small (Spark jobs per example); the seeded configs
in test_versioned_properties remain the broad-coverage workhorse.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_join_scaling_spark.operators.joins import join_full_outer, join_inner
from flink_join_scaling_spark.operators.versioned import dedup_latest
from tests.test_versioned_properties import A_SCHEMA, B_SCHEMA, _pairs, py_dedup, py_join

# tiny domains → collisions and ties are the common case, not the edge
a_row = st.tuples(
    st.integers(0, 5), st.integers(0, 3), st.sampled_from(["p", "q", "r"])
)
b_row = st.tuples(
    st.integers(0, 5), st.integers(0, 3), st.integers(0, 7),
    st.sampled_from(["x", "y", "z"]),
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _stable_b_keys(b_rows):
    """Enforce the reference invariant: one join key per entity id
    (GenJoinInput.scala:89-95)."""
    ida_of, out = {}, []
    for bid, ts, ida, tag in b_rows:
        ida_of.setdefault(bid, ida)
        out.append((bid, ts, ida_of[bid], tag))
    return out


@given(a=st.lists(a_row, max_size=12))
@SET
def test_dedup_latest_property(spark, a):
    df = spark.createDataFrame(a, A_SCHEMA) if a else spark.createDataFrame([], A_SCHEMA)
    got = {tuple(r) for r in dedup_latest(df, "id", "ts").collect()}
    assert got == {tuple(r) for r in py_dedup(a, (0,), 1)}


@given(a=st.lists(a_row, max_size=10), b=st.lists(b_row, max_size=10))
@SET
def test_full_outer_property(spark, a, b):
    b = _stable_b_keys(b)
    dfa = spark.createDataFrame(a, A_SCHEMA) if a else spark.createDataFrame([], A_SCHEMA)
    dfb = spark.createDataFrame(b, B_SCHEMA) if b else spark.createDataFrame([], B_SCHEMA)
    res = join_full_outer(dfa, dfb, "id", "ida", "id", "id", "ts", "ts")
    cols = ["x_id", "x_ts", "x_tag", "y_id", "y_ts", "ida", "y_tag"]
    got = _pairs([tuple(r[c] for c in cols) for r in res.collect()], a_cols=3)
    assert got == py_join(a, b, "full_outer")


@given(a=st.lists(a_row, max_size=10), b=st.lists(b_row, max_size=10))
@SET
def test_inner_property(spark, a, b):
    b = _stable_b_keys(b)
    dfa = spark.createDataFrame(a, A_SCHEMA) if a else spark.createDataFrame([], A_SCHEMA)
    dfb = spark.createDataFrame(b, B_SCHEMA) if b else spark.createDataFrame([], B_SCHEMA)
    res = join_inner(dfa, dfb, "id", "ida", "id", "id", "ts", "ts")
    cols = ["x_id", "x_ts", "x_tag", "y_id", "y_ts", "ida", "y_tag"]
    got = _pairs([tuple(r[c] for c in cols) for r in res.collect()], a_cols=3)
    assert got == py_join(a, b, "inner")
