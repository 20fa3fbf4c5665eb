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


# ------------------------------------------- round-2 operator properties

edge = st.tuples(st.integers(0, 12), st.integers(0, 12))


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find oracle: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(st.lists(edge, min_size=1, max_size=25))
@SET
def test_connected_components_matches_union_find(spark, edges):
    from flink_join_scaling_spark.operators.dedup import connected_components

    # self-loops are legal input (a pair list never has them, but the
    # operator shouldn't care); drop them from the pair frame only if
    # the whole list is self-loops (empty edges -> nothing to assert)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component_id
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got == _py_components(edges)


event = st.tuples(st.integers(0, 3), st.integers(0, 100))


def _py_sessions(rows: list[tuple[int, int, int]], gap: int) -> dict[tuple, int]:
    """Fold oracle: (user, eid) -> 1-based session index."""
    out: dict[tuple, int] = {}
    by_user: dict[int, list] = {}
    for u, ts, eid in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is None or ts - prev > gap:
                sid += 1
            out[(u, eid)] = sid
            prev = ts
    return out


@given(st.lists(event, min_size=1, max_size=30), st.integers(1, 20))
@SET
def test_sessionize_matches_fold(spark, evs, gap):
    from flink_join_scaling_spark.operators.temporal import sessionize

    rows = [(u, ts, i) for i, (u, ts) in enumerate(evs)]
    df = spark.createDataFrame(rows, "user long, ts long, eid long")
    out = sessionize(df, "user", "ts", gap=gap, tiebreak=["eid"])
    got = {(r.user, r.eid): r.session_idx for r in out.collect()}
    assert got == _py_sessions(rows, gap)
