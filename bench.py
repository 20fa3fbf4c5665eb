#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": 0.1}

Each query is forced with a count-style action (``df.count()`` after a
noop cache-free plan) so the measured time is scan→compute, not result
serialization to the driver. A warmup pass initializes the JVM, Arrow,
and parquet footer caches so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_join_scaling_spark import plans  # noqa: E402
from flink_join_scaling_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    # split file scans small: bench data is a few MB/table, so Spark's
    # default 128m split turns every scan into one task on 32 cores
    # (on a real cluster at real scale the default is correct)
    spark = get_spark(
        app_name="fjss-bench",
        cpus=cpus,
        shuffle_partitions=cpus,
        max_partition_bytes="8m",
    )

    names = plans.headline_queries()
    # warmup pass (JMH-style): run every headline query once so the
    # measured pass reflects steady state — whole-stage codegen is
    # Janino-compiled per plan shape on first execution (nested
    # higher-order-function expressions cost seconds to compile), and
    # at real scale that one-time cost amortizes to nothing
    for name in names:
        plans.QUERIES[name].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = plans.QUERIES[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
