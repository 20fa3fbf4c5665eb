"""Vector column builders — dot product / norm / cosine as JVM-side
higher-order functions (zip_with + aggregate), no Python boundary.

Floats are cast to double inside the fold so both Spark and the DuckDB
oracle accumulate in float64 left-to-right; residual accumulation-order
noise is handled by rounding at comparison sites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_expr(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sumsq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sumsq)


def with_l2_norm(df: DataFrame, vec_col: str, out_col: str = "l2_norm") -> DataFrame:
    return df.withColumn(out_col, l2_norm_expr(vec_col))


def cosine_expr(a: str | Column, b: str | Column, norm_a: str | Column, norm_b: str | Column) -> Column:
    na = F.col(norm_a) if isinstance(norm_a, str) else norm_a
    nb = F.col(norm_b) if isinstance(norm_b, str) else norm_b
    return dot_expr(a, b) / (na * nb)
