"""flink_join_scaling_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``jeffhgs/flink-join-scaling`` (a Flink streaming-join library studying
continuously-maintained outer joins over streams of *versioned* upsert
records — see ``/root/reference/src/main/scala/flink_perf/joins.scala:10-70``),
rebuilt idiomatically on the Spark DataFrame / Catalyst / Structured
Streaming stack, plus a standard relational operator surface and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (Spark-first, scale-first):
- Declarative DataFrame/SQL plans; Catalyst picks physical strategies.
- Versioned dedup is a ``groupBy(id).agg(max_by(struct(*), ordering))``
  — one shuffle with map-side partial aggregation, not a window sort.
- The reference's fire-per-record GlobalWindow + CountTrigger(1) +
  VersioningEvictor machinery collapses, in Spark, into either a plain
  batch join after dedup (converged semantics) or micro-batch
  incremental state in Structured Streaming (changelog semantics).
"""

__version__ = "0.1.0"

from flink_join_scaling_spark.session import get_spark  # noqa: F401
from flink_join_scaling_spark.sources.catalog import TABLES, load_table, register_views  # noqa: F401
from flink_join_scaling_spark.operators.versioned import (  # noqa: F401
    dedup_latest,
    dedup_latest_by_key,
)
from flink_join_scaling_spark.operators.joins import (  # noqa: F401
    join_full_outer,
    join_full_outer_seq,
    join_inner,
    join_left_outer,
    join_left_outer_seq,
)
