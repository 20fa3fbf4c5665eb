"""Rotation-hygiene guards for the driver's ~50-slot correctness window.

The driver replays roughly the first 50 entries of ``queries()`` each
round. ``plans/registry.py`` orders never/stale-attested queries first
so the window eventually covers every query. These tests make the
round-5 failure mode — rotation sets one round stale, so the same 50
queries get re-checked while the tail starves forever — structurally
impossible:

1. Every hash-green row in every CORRECTNESS_r*.json on disk must be
   folded into ``_DRIVER_GREEN`` (or listed stale in
   ``_NEEDS_FRESH_ROW``). A forgotten fold fails this test.
2. Every oracle-bearing query without a driver-green row must rank
   inside the window (position < 50); greens come after all
   non-greens. If more unattested queries exist than slots, the test
   demands the overflow be *newly registered* this round (absent from
   every CORRECTNESS file), i.e. starvation of old queries is never
   the thing that overflows.
"""

from __future__ import annotations

import json
from pathlib import Path

from flink_join_scaling_spark.plans import registry

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50


def _round_no(stem: str) -> int:
    return int(stem.rsplit("_r", 1)[1])


def _correctness_rows(max_round: int | None = None) -> dict[str, set[str]]:
    """name -> set of rounds with a hash-green (or rows-only-green) row."""
    greens: dict[str, set[str]] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        if max_round is not None and _round_no(f.stem) > max_round:
            continue
        data = json.loads(f.read_text())
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") or (
                row.get("hash_match") is None and row.get("rows_match")
            )
            if ok:
                greens.setdefault(name, set()).add(f.stem)
    return greens


def test_sets_reference_registered_queries_only():
    names = set(registry.QUERIES)
    assert registry._DRIVER_GREEN <= names, (
        registry._DRIVER_GREEN - names
    )
    assert registry._NEEDS_FRESH_ROW <= names, (
        registry._NEEDS_FRESH_ROW - names
    )


def test_every_recorded_green_is_folded_into_rotation_sets():
    """A green driver row must move its query out of group 2.

    Lifecycle: the driver writes CORRECTNESS_r{N+1}.json AFTER the
    round's last commit, so exactly ONE round newer than
    ``ROTATION_FOLDED_THROUGH`` may exist unfolded (the judge reruns
    tests at that moment). Greens up to the folded-through round must
    all be in the sets, and a file TWO rounds ahead means the rotation
    went stale across a full round — the r5→r6 near-starvation this
    machinery exists to prevent.
    """
    folded_through = registry.ROTATION_FOLDED_THROUGH
    newest = max(
        (_round_no(f.stem) for f in REPO.glob("CORRECTNESS_r*.json")),
        default=0,
    )
    # an over-bumped constant (claiming rounds that don't exist are
    # folded) would silently disable this guard forever
    assert folded_through <= newest, (
        f"ROTATION_FOLDED_THROUGH={folded_through} exceeds the newest "
        f"CORRECTNESS file on disk (r{newest:02d}) — you cannot have "
        "folded rounds that were never recorded"
    )
    assert newest <= folded_through + 1, (
        f"CORRECTNESS_r{newest:02d} exists but rotation sets are folded "
        f"only through r{folded_through}: fold the r{folded_through + 1} "
        "greens into _DRIVER_GREEN and bump ROTATION_FOLDED_THROUGH"
    )
    recorded = set(_correctness_rows(max_round=folded_through)) & set(
        registry.QUERIES
    )
    unfolded = recorded - registry._DRIVER_GREEN - registry._NEEDS_FRESH_ROW
    assert not unfolded, (
        f"{len(unfolded)} driver-green queries not folded into "
        f"_DRIVER_GREEN (or marked stale): {sorted(unfolded)}"
    )


def test_unattested_oracle_queries_fit_the_driver_window():
    """No oracle-bearing query may starve outside the ~50-slot window.

    Position ≥ WINDOW is only acceptable for queries that already hold
    a driver row (their rows stand) or are rows-only (can never
    hash-match). Previously-seen-by-a-round queries must never be
    pushed out by this round's ordering.
    """
    order = list(registry.query_fns())
    recorded = set(_correctness_rows())
    for pos, name in enumerate(order):
        spec = registry.QUERIES[name]
        if spec.oracle is None:
            continue
        needs_row = (
            name in registry._NEEDS_FRESH_ROW
            or name not in registry._DRIVER_GREEN
        )
        if needs_row and pos >= WINDOW:
            # Overflow tolerated only for brand-new registrations that
            # no driver round has ever had a chance to see, or for the
            # round's tracked displacement set (window oversubscribed
            # by changed/touched/new names — r15 verdict task 2).
            assert (
                name not in recorded
                or name in registry._DISPLACED_THIS_ROUND
            ), (
                f"{name} needs a driver row but ranks {pos} (≥{WINDOW}) "
                "— it would starve again; update registry rotation sets"
            )


def test_last_green_map_matches_correctness_files():
    """``_LAST_GREEN`` must be a mechanical transcript of the
    CORRECTNESS files through the folded round — a hand-maintained map
    that drifts from disk would silently mis-rank the window."""
    folded = registry.ROTATION_FOLDED_THROUGH
    latest: dict[str, int] = {}
    for name, stems in _correctness_rows(max_round=folded).items():
        if name in registry.QUERIES:
            latest[name] = max(_round_no(s) for s in stems)
    assert latest == registry._LAST_GREEN, {
        "missing_from_map": sorted(set(latest) - set(registry._LAST_GREEN)),
        "extra_in_map": sorted(set(registry._LAST_GREEN) - set(latest)),
        "wrong_round": sorted(
            n for n in set(latest) & set(registry._LAST_GREEN)
            if latest[n] != registry._LAST_GREEN[n]
        ),
    }


def test_staleness_policy_no_query_three_rounds_stale_outside_window():
    """Standing rotation policy (round-9 verdict item 7): after each
    round's window runs, no registered query's latest green row may be
    older than ``ROTATION_FOLDED_THROUGH - 2``. Equivalently, every
    query whose row is already ≥3 rounds stale must rank inside the
    window THIS round, so the driver re-attests it before it ages
    further.

    Amended for round 16 per the r15 verdict's task 2 (the window is
    permanently full once every cohort is 50 names, and the verdict
    ORDERS changed/touched/new names to preempt): stale names may
    rank outside the window only when (a) they are exactly the
    mechanically lowest-ranked stale names — the registry's
    ``_DISPLACED_THIS_ROUND`` must EQUAL the computed spill set, so
    displacement is never hand-picked and never silent; (b) the spill
    count never exceeds the number of preempting (changed ∪ touched ∪
    never-attested) names inside the window; and (c) the fold
    workflow moves every displaced name into ``_PRIORITY_FIRST`` next
    round (clause enforced socially by the fold checklist; clauses
    a+b mechanically here)."""
    order = list(registry.query_fns())
    horizon = registry.ROTATION_FOLDED_THROUGH - 3
    stale = [
        n for n, r in registry._LAST_GREEN.items()
        if r <= horizon and registry.QUERIES[n].oracle is not None
    ]
    outside = {n for n in stale if order.index(n) >= WINDOW}
    assert outside == set(registry._DISPLACED_THIS_ROUND), (
        f"stale names outside the {WINDOW}-slot window must exactly "
        f"match _DISPLACED_THIS_ROUND; computed spill = "
        f"{sorted(outside)}, declared = "
        f"{sorted(registry._DISPLACED_THIS_ROUND)}"
    )
    preempting = [
        n for n in order[:WINDOW]
        if n in registry._CHANGED_THIS_ROUND
        or n in registry._TOUCHED_SINCE_GREEN
        or n not in registry._LAST_GREEN
    ]
    # r18 amendment: "displacement without cause" originally bounded
    # the spill by the preempting count alone, which is satisfiable
    # only while the stale cohort itself fits the window. When a fold
    # covers MORE than one driver round (r17, optimization round 1,
    # did not rotate — its window re-ran r16's byte-identical names),
    # staleness accumulates past 50 names and the excess spills
    # mechanically no matter what preempts. The bound therefore allows
    # exactly that excess and nothing more: every displaced name is
    # displaced either by a preempting name occupying a slot or by the
    # stale cohort's own overflow beyond the window. With a normal
    # one-round fold (stale ≤ WINDOW) this reduces to the original
    # clause.
    overflow = max(0, len(stale) - WINDOW)
    assert len(outside) <= len(preempting) + overflow, (
        f"{len(outside)} stale names displaced but only "
        f"{len(preempting)} preempting names occupy window slots and "
        f"the stale cohort overflows the window by {overflow} — "
        "displacement without cause"
    )


def test_survey_counts_match_registry():
    """SURVEY.md's §7 inventory line must state the registry's actual
    counts — the doc-drift class the r8 verdict flagged (claimed 50
    headline when the registry had 49)."""
    import re

    text = (REPO / "SURVEY.md").read_text()
    m = re.search(r"(\d+) registered queries", text)
    assert m and int(m.group(1)) == len(registry.QUERIES), (
        f"SURVEY.md says {m and m.group(1)} registered queries; "
        f"registry has {len(registry.QUERIES)}"
    )
    m = re.search(r"bench covers (\d+) headline queries", text)
    headline = sum(1 for s in registry.QUERIES.values() if s.headline)
    assert m and int(m.group(1)) == headline, (
        f"SURVEY.md says {m and m.group(1)} headline queries; "
        f"registry has {headline}"
    )
    readme = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) registered queries", readme)
    assert m and int(m.group(1)) == len(registry.QUERIES), (
        f"README.md says {m and m.group(1)} registered queries; "
        f"registry has {len(registry.QUERIES)}"
    )


def test_float_boundary_manifest_matches_tags():
    """The ulp-risk manifest and the query tags must agree, so a flake
    triage can trust either one."""
    tagged = {
        n for n, s in registry.QUERIES.items()
        if "float-boundary-sensitive" in s.tags
    }
    assert tagged == set(registry.FLOAT_BOUNDARY_SENSITIVE)


def test_greens_rank_after_all_queries_needing_rows():
    """Settled greens must never shadow queries that need a driver row.

    "Needing a row" includes ``_TOUCHED_SINCE_GREEN``: their green rows
    exist but predate operator-code changes, so they rank at the very
    front (r10 verdict) — they are pending, not settled."""
    order = list(registry.query_fns())
    pend = [
        n for n in order
        if registry.QUERIES[n].oracle is not None
        and (n in registry._NEEDS_FRESH_ROW
             or n in registry._CHANGED_THIS_ROUND
             or n in registry._TOUCHED_SINCE_GREEN
             or n not in registry._DRIVER_GREEN)
    ]
    if not pend:
        return
    last_pending = max(order.index(n) for n in pend)
    settled_before = [
        n for n in order[:last_pending]
        if n in registry._DRIVER_GREEN
        and n not in registry._NEEDS_FRESH_ROW
        and n not in registry._CHANGED_THIS_ROUND
        and n not in registry._TOUCHED_SINCE_GREEN
    ]
    assert not settled_before, (
        f"green queries rank before pending ones: {settled_before[:5]}"
    )
