"""Skew mitigation: salted joins and salted heavy-hitter aggregation.

At 100 TB a handful of hot keys (a null-ish default id, a bot user, an
empty-document hash) can pin one reducer while 999 executors idle. AQE's
skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in this
engine's session) handles most shuffle-join skew automatically — prefer
it. These helpers cover the cases AQE can't:

* :func:`salted_join` — explicit N-way replication for *known* hot keys
  when the build side must stay a shuffle join (AQE skew splitting
  works on sort-merge joins, but not when the skewed side feeds another
  exchange-reusing stage, and not for aggregation-before-join patterns).
* :func:`salted_agg` — two-phase aggregation for high-cardinality
  *values* under few keys where a single reducer would own a hot group.
  Only valid for decomposable aggregates (sum/count/min/max —
  anything with a merge function).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: each skewed row gets a
    random salt in [0, num_salts); ``other`` is replicated once per
    salt value, and the join runs on (key, salt) — spreading each hot
    key over ``num_salts`` reducers.

    Costs ``num_salts``× the small side's shuffle volume; use only when
    AQE's runtime skew splitting doesn't apply. For ``inner``/``left``
    the result equals the unsalted join (the salt is dropped). Right/
    full outer joins are rejected: the replicated ``other`` side would
    emit every unmatched other row once per salt value (its salt never
    meets a nothing-side row), so the unsalted equivalence breaks.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicating the other side breaks right/full-outer "
            "semantics (unmatched other rows would emit num_salts times)"
        )
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted.join(
        replicated,
        (salted[skewed_key] == replicated[other_key])
        & (salted["__salt"] == replicated["__salt"]),
        how,
    )
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for hot groups: first aggregate on
    (keys, salt) — spreading each hot group across ``num_salts``
    partial groups — then merge the partials on keys alone.

    ``aggs`` maps output column → ``"input_col:fn"`` with fn one of
    sum/count/min/max. (Spark's own map-side partial aggregation
    already does this *per input partition*; explicit salting helps
    when a post-shuffle group is still too hot, e.g. the partial rows
    themselves skew.)
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    parsed: dict[str, tuple[str, str]] = {}
    for out, spec in aggs.items():
        col, _, fn = spec.partition(":")
        if fn not in mergers:
            raise ValueError(f"non-decomposable aggregate {fn!r} in {spec!r}")
        parsed[out] = (col, fn)
    salted = df.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[firsts[fn](col).alias(f"__p_{out}") for out, (col, fn) in parsed.items()]
    )
    return partial.groupBy(*keys).agg(
        *[mergers[fn](F.col(f"__p_{out}")).alias(out) for out, (_, fn) in parsed.items()]
    )
