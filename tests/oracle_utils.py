"""Local replica of the driver's DuckDB-oracle comparison protocol:
row count + column set + order-insensitive exact value comparison.

Stricter than tolerance-based checks on purpose: if these pass with
exact comparison, any reasonable value-hash the driver computes will
match too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from flink_join_scaling_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_col(s: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.astype("datetime64[us]").astype("i8").astype("float64")
    if pd.api.types.is_bool_dtype(s) or str(s.dtype) == "boolean":
        return s.astype("object").map(
            lambda v: np.nan if v is None or v is pd.NA else float(bool(v))
        )
    if pd.api.types.is_numeric_dtype(s):
        return s.astype("float64")
    # object column: could be str-with-None or bools-as-objects
    def norm(v):
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA:
            return "\x00NULL"
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v))
        return str(v)

    return s.map(norm)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({c: _canon_col(df[c]) for c in sorted(df.columns)})
    if len(out.columns):
        out = out.sort_values(
            by=list(out.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
    return out


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, float_ulp_tol: float = 0.0):
    sp = spark_df.toPandas()
    du = run_oracle(oracle_sql, sf_dir)
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count: spark={len(sp)} oracle={len(du)}"
    csp, cdu = canonicalize(sp), canonicalize(du)
    for c in csp.columns:
        a, b = csp[c], cdu[c]
        if pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b):
            an, bn = a.to_numpy(), b.to_numpy()
            both_nan = np.isnan(an) & np.isnan(bn)
            eq = (an == bn) | both_nan
            if float_ulp_tol:
                close = np.isclose(an, bn, rtol=float_ulp_tol, atol=0, equal_nan=True)
                eq = eq | close
            assert eq.all(), (
                f"col {c}: {int((~eq).sum())} mismatches; first: "
                f"{an[~eq][:3]} vs {bn[~eq][:3]}"
            )
        else:
            eq = a.to_numpy() == b.to_numpy()
            assert eq.all(), (
                f"col {c}: {int((~eq).sum())} mismatches; first: "
                f"{a[~eq][:3].tolist()} vs {b[~eq][:3].tolist()}"
            )
