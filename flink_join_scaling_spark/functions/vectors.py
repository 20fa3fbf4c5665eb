"""Vector column builders — dot product / norm / cosine as JVM-side
higher-order functions (zip_with + aggregate), no Python boundary.

Floats are cast to double inside the fold so both Spark and the DuckDB
oracle accumulate in float64 left-to-right; residual accumulation-order
noise is handled by rounding at comparison sites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def np_round_half_away(c, decimals: int = 6):
    """NumPy rounding that matches Spark ``F.round`` / DuckDB ``round()``
    (half-AWAY-from-zero). ``np.round`` is half-to-even, so at an exact
    .5 midpoint of the last kept digit the engines would deterministically
    disagree by one ulp of the quantum — a different (and silent) failure
    mode from the documented within-an-ulp accumulation risk. Safe for
    cosine-scale magnitudes: |c|*10^decimals stays far below 2^53.
    """
    import numpy as np

    scale = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(c) * scale + 0.5), c) / scale


def np_quantize_e6(c):
    """``CAST(round(c * 1e6) AS BIGINT)`` in NumPy, half-away-from-zero
    to match both engines' ``round`` (see :func:`np_round_half_away`)."""
    import numpy as np

    return np.copysign(np.floor(np.abs(c) * 1e6 + 0.5), c).astype(np.int64)


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


def cosine6_pandas(a, b, norm_a, norm_b) -> Column:
    """round(cosine, 6) as an Arrow-batched pandas UDF — the vectorized
    twin of ``F.round(cosine_expr(...), 6)`` for pair-heavy plans.

    Catalyst's higher-order functions are interpreted per element, so a
    candidate join evaluating millions of dim-wide dot products spends
    its whole runtime in the fold; here each Arrow batch is two NumPy
    matrices and one row-wise multiply-sum. float64 math and round-6
    keep it value-identical to the expression/oracle form (pairwise vs
    sequential summation differs by ulps, far inside the rounding).
    Zero-norm inputs define cosine as 0.0 (same guard as the IVF
    assignment paths).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in (a, b, norm_a, norm_b)]
    return _cosine6_udf()(*cols)


def _cosine6_udf():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(va, vb, na, nb):
        if not len(va):
            return pd.Series(np.empty(0, dtype=np.float64))
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        denom = na.to_numpy() * nb.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(denom == 0.0, 0.0, (A * B).sum(axis=1) / denom)
        return pd.Series(np_round_half_away(c, 6))

    _cos.__annotations__ = {
        "va": pd.Series, "vb": pd.Series, "na": pd.Series, "nb": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf("double")(_cos)


def cosine_e6_pandas(a, b, norm_a, norm_b) -> Column:
    """Integer-quantized cosine ``round(cos * 1e6) AS BIGINT`` — the
    engine-stable form of :func:`cosine6_pandas` for values that are
    COMPARED (thresholds, argmin keys) or EXPOSED in query output.

    A round-6 *double* still carries two cross-engine hazards: the
    rounded value itself is not exactly representable (so Spark/NumPy
    and DuckDB can stringify the "same" round-6 value differently in a
    hash compare), and ordering keys inherit the representation noise.
    A BIGINT has one representation; after quantization every
    downstream compare is exact integer math. The only residual risk
    is a true cosine landing within an ulp of an exact .5e-6 midpoint
    — strictly narrower than the round-6-double boundary it replaces
    (the q_embed_outliers e4 discipline, promoted to the pair stage).
    Zero-norm inputs define cosine as 0 like the rest of the family.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in (a, b, norm_a, norm_b)]
    return _cosine_e6_udf()(*cols)


def _cosine_e6_udf():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos_e6(va, vb, na, nb):
        if not len(va):
            return pd.Series(np.empty(0, dtype=np.int64))
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        denom = na.to_numpy() * nb.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(denom == 0.0, 0.0, (A * B).sum(axis=1) / denom)
        return pd.Series(np_quantize_e6(c))

    _cos_e6.__annotations__ = {
        "va": pd.Series, "vb": pd.Series, "na": pd.Series, "nb": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf("long")(_cos_e6)
