"""Distributed PCA / whitening over embedding columns.

The training-data-pipeline use: compress ``array<float>`` embeddings
before semantic dedup / ANN (SemDeDup and retrieval stacks routinely
PCA-then-whiten to cut index bytes and decorrelate dimensions), and
surface outlier-visible axes. Nothing here ships the corpus to the
driver — the moment computation is the classic distributed-Gramian
shape (what MLlib's ``RowMatrix.computePrincipalComponents`` does
internally), re-expressed over the native array column without an
mllib ``Vector`` conversion:

Scale shape — ONE corpus scan computes per-partition partial moments
(row count, sum vector, X^T X Gramian) in an Arrow ``mapInPandas``
pass; each task emits exactly ONE row of ``1 + d + d*d`` doubles
regardless of how many rows it read, so the driver collects
``num_partitions × (d² + d + 1)`` numbers — for d = 64 that is 4 KB
per task — never the data. The d×d covariance eigendecomposition is
driver-side (cost d³, microseconds). Projection is a broadcast
``(d, k)`` matmul in a second Arrow pass: map-side only, no shuffle
anywhere in fit or transform. At 100 TB the fit is one full scan
with a 4 KB-per-task reduce and the transform is embarrassingly
parallel.

Determinism: partial Gramians are float64 NumPy sums per partition,
summed on the driver in partition order; ``eigh`` of the resulting
symmetric matrix is deterministic; eigenvector sign is fixed by
forcing the largest-|coordinate| component positive. Reference
provenance: the reference engine has no linear algebra — this is a
beyond-reference LLM-data operator like operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, covariance) of an ``array<float>`` column, computed
    with one scan of per-partition partial moments (see module doc).
    Covariance is the population covariance (divide by n) of float64
    accumulations. Raises on an empty frame or inconsistent dims."""
    schema = "n long, s array<double>, g array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                np.stack(pdf[vec_col].to_numpy()), dtype=np.float64
            )
            n += x.shape[0]
            cs = x.sum(axis=0)
            cg = x.T @ x
            s = cs if s is None else s + cs
            g = cg if g is None else g + cg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(partials, schema=schema).collect()
    if not rows:
        raise ValueError("embedding_moments: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    whiten: bool = False,
    eps: float = 1e-9,
) -> dict:
    """Fit a PCA (optionally whitening) model; returns a plain-dict
    model (JSON-serializable lists) usable by :func:`pca_transform`:
    ``{mean (d,), components (k, d), explained_var (k,), whiten}``.
    Components are unit eigenvectors of the covariance, eigenvalue-
    descending, sign-fixed (largest-|coordinate| positive)."""
    n, mean, cov = embedding_moments(df, vec_col)
    d = mean.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"pca_fit: k={k} outside [1, {d}]")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    ev = np.maximum(vals[order], 0.0)
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return {
        "n": int(n),
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_var": ev.tolist(),
        "whiten": bool(whiten),
        "eps": float(eps),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    keep_input: bool = False,
) -> DataFrame:
    """Project ``vec_col`` onto the model's components (whitening if
    the model says so): map-side broadcast matmul, no shuffle. Output
    schema = input with ``out_col array<double>`` appended (the input
    vector column dropped unless ``keep_input``)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)  # (k, d)
    if model.get("whiten"):
        scale = 1.0 / np.sqrt(
            np.asarray(model["explained_var"]) + model.get("eps", 1e-9)
        )
        proj = comps.T * scale  # (d, k)
    else:
        proj = comps.T
    fields = [
        f for f in df.schema.fields if keep_input or f.name != vec_col
    ]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + f", {out_col} array<double>"
    )
    cols = [f.name for f in fields]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(np.stack(pdf[vec_col].to_numpy()), dtype=np.float64)
            y = (x - mean) @ proj
            out = pdf[cols].copy()
            out[out_col] = list(y)
            yield out

    return df.mapInPandas(project, schema=out_schema)
