"""Distributed PCA/whitening vs exact NumPy on the collected fixture.

The operator's claim is that the one-scan partial-moment reduce plus
driver eigh equals the textbook computation — so the oracle here is
numpy.linalg on the same 500 vectors, compared to float tolerance.
"""

import numpy as np
import pytest

from flink_join_scaling_spark.operators import embeddings as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").repartition(7)


@pytest.fixture(scope="module")
def x(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def test_moments_match_numpy(emb, x):
    n, mean, cov = E.embedding_moments(emb, "embedding")
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-10)
    exact = np.cov(x, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, exact, rtol=0, atol=1e-10)


def test_components_match_numpy_eigh(emb, x):
    k = 8
    model = E.pca_fit(emb, "embedding", k=k)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    np.testing.assert_allclose(
        model["explained_var"], vals[order], rtol=1e-8, atol=1e-12
    )
    comps = np.asarray(model["components"])
    for i, j in enumerate(order):
        # same axis up to sign; the model fixes sign deterministically
        assert abs(float(comps[i] @ vecs[:, j])) > 1 - 1e-8
        assert comps[i, np.abs(comps[i]).argmax()] > 0


def test_transform_matches_numpy_projection(emb, x):
    model = E.pca_fit(emb, "embedding", k=5)
    out = E.pca_transform(emb, model, "embedding", out_col="pca")
    assert "embedding" not in out.columns and "pca" in out.columns
    got = {r["vec_id"]: np.asarray(r["pca"]) for r in out.collect()}
    proj = np.asarray(model["components"]).T
    want = (x - np.asarray(model["mean"])) @ proj
    ids = sorted(got)
    np.testing.assert_allclose(
        np.stack([got[i] for i in ids]), want, rtol=0, atol=1e-8
    )


def test_whitened_projection_has_identity_covariance(emb):
    model = E.pca_fit(emb, "embedding", k=6, whiten=True)
    out = E.pca_transform(emb, model, "embedding", out_col="w")
    y = np.stack([np.asarray(r["w"]) for r in out.collect()])
    np.testing.assert_allclose(
        np.cov(y, rowvar=False, bias=True), np.eye(6), rtol=0, atol=1e-4
    )


def test_keep_input_and_k_validation(emb):
    model = E.pca_fit(emb, "embedding", k=2)
    out = E.pca_transform(emb, model, "embedding", keep_input=True)
    assert "embedding" in out.columns
    with pytest.raises(ValueError):
        E.pca_fit(emb, "embedding", k=65)


def test_fit_is_partitioning_invariant(spark, emb):
    """The partial-moment reduce must not depend on the partition
    layout beyond float addition order (~1e-12)."""
    other = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(3)
    a = E.pca_fit(emb, "embedding", k=4)
    b = E.pca_fit(other, "embedding", k=4)
    np.testing.assert_allclose(
        a["components"], b["components"], rtol=0, atol=1e-7
    )
