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


def query_fns() -> dict[str, QueryFn]:
    """Oracle-bearing queries first (stable registration order within each
    group): the driver iterates this dict under a time budget, so a cutoff
    must only ever shadow rows-only entries, never an oracle comparison."""
    specs = sorted(QUERIES.values(), key=lambda s: s.oracle is None)
    return {s.name: s.fn for s in specs}


def oracle_sqls() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


def headline_queries() -> list[str]:
    return [n for n, s in QUERIES.items() if s.headline]
