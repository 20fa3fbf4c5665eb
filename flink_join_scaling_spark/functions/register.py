"""SQL-surface registration: expose the engine's column expressions as
SQL functions and the catalog tables as views, so ``spark.sql`` users
get the same surface as the DataFrame API.

The reference is library-only (extractor functions passed to Scala
calls, ``joins.scala:11-13``); this engine additionally serves SQL.
Functions are registered as Spark SQL scalar UDFs (``CREATE FUNCTION
... RETURN <expression>``, Spark 4 SQL-standard UDFs) — they inline
into the plan as JVM expressions, so there is no Python boundary and
whole-stage codegen applies exactly as for the DataFrame forms.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from flink_join_scaling_spark.sources.catalog import register_views

#: name -> (signature, return type, SQL body). Bodies mirror
#: functions/text.py expression builders (kept in sync by test).
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "fjs_norm_text": (
        "(s STRING)",
        "STRING",
        r"regexp_replace(lower(trim(s)), '\\s+', ' ')",
    ),
    "fjs_tokens_ws": (
        "(s STRING)",
        "ARRAY<STRING>",
        r"split(regexp_replace(lower(trim(s)), '\\s+', ' '), ' ')",
    ),
    "fjs_n_tokens_ws": (
        "(s STRING)",
        "BIGINT",
        r"CAST(size(split(regexp_replace(lower(trim(s)), '\\s+', ' '), ' ')) AS BIGINT)",
    ),
    "fjs_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "fjs_l2_norm": (
        "(a ARRAY<DOUBLE>)",
        "DOUBLE",
        "sqrt(aggregate(transform(a, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    "fjs_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "fjs_dot(a, b) / (fjs_l2_norm(a) * fjs_l2_norm(b))",
    ),
}


def register_sql_surface(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register engine SQL functions (and optionally the table views)::

        register_sql_surface(spark, "/root/testdata/sf0.01")
        spark.sql("SELECT doc_id, fjs_n_tokens_ws(text) FROM documents")
    """
    if sf_dir is not None:
        register_views(spark, sf_dir)
    for name, (sig, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
