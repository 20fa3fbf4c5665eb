"""Bench-artifact contract: the driver records only the LAST ~2000
characters of bench.py's stdout and parses the final JSON line.

Round 9 lost its attested medians to exactly this: the per-query
spread/reps dicts pushed the single output line past the capture, so
`BENCH_r09.json` shipped `parsed: null`. bench.py now prints the
variance evidence on a preceding line and a compact final line with
the headline total + per-query medians; these tests pin the final
line's worst-case size against the capture so adding headline queries
can't silently regress the artifact again.
"""

from __future__ import annotations

import json

from flink_join_scaling_spark import plans

# the driver's stdout tail capture (observed 2000 in BENCH_r09.json's
# truncated "tail"); bench.py guards at 1900 for slack
DRIVER_TAIL_CHARS = 2000
BENCH_GUARD = 1900


def _final_line(names: list[str]) -> str:
    # worst-realistic-case widths: 4-digit seconds with 3 decimals per
    # query (no headline query has ever exceeded 13 s), 5-digit total
    out = {
        "metric": "headline_total",
        "value": 99999.999,
        "unit": "sec",
        "calibration": 0.0123,
        "queries": {n: 9999.999 for n in names},
        "sf": 0.1,
    }
    return json.dumps(out, separators=(",", ":"))


def test_final_bench_line_fits_driver_capture():
    line = _final_line(plans.headline_queries())
    assert len(line) <= BENCH_GUARD, (
        f"final bench line would be {len(line)} chars (> {BENCH_GUARD}): "
        "the driver tail capture would truncate the medians — trim the "
        "headline set or shorten query names"
    )


def test_final_bench_line_has_headroom_for_growth():
    """Fail BEFORE the cliff: leave room for ~5 more headline names."""
    line = _final_line(plans.headline_queries() + [f"q_future_name_{i}" for i in range(5)])
    assert len(line) <= DRIVER_TAIL_CHARS, (
        "headline set is within 5 queries of overflowing the driver "
        "capture — plan the next additions with shorter names or split "
        "the artifact"
    )


def test_headline_includes_round9_families():
    names = set(plans.headline_queries())
    assert {"q_dedup_winnow", "q_gopher_rules", "q_tokenizer_fertility"} <= names
