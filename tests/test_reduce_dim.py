"""Tests for distributed PCA (operators/reduce_dim.py): exact parity with a
single-node numpy PCA, orthonormality, variance accounting, projection."""

from __future__ import annotations

import numpy as np

from clp_spark.operators import reduce_dim as RD

SF_DIR = "/root/testdata/sf0.001"
K = 8


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _local_matrix(spark):
    rows = _emb(spark).select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_pca_fit_matches_numpy_exactly(spark):
    mean, comps, evals = RD.pca_fit(_emb(spark), k=K)
    x = _local_matrix(spark)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w, kind="stable")[::-1][:K]
    assert np.allclose(evals, w[order], atol=1e-8)
    want = v[:, order].T
    flip = np.sign(want[np.arange(K), np.abs(want).argmax(axis=1)])
    want = want * flip[:, None]
    assert np.allclose(comps, want, atol=1e-7)


def test_pca_fit_partition_invariant(spark):
    """The moment-partial reduce is exact: any partitioning gives the same
    fit (floating-point association differences stay below tolerance)."""
    e = _emb(spark)
    m1, c1, v1 = RD.pca_fit(e.repartition(16), k=4)
    m2, c2, v2 = RD.pca_fit(e.coalesce(1), k=4)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(v1, v2, atol=1e-7)
    assert np.allclose(c1, c2, atol=1e-6)


def test_pca_components_orthonormal_and_variance_ordered(spark):
    _, comps, evals = RD.pca_fit(_emb(spark), k=K)
    assert np.allclose(comps @ comps.T, np.eye(K), atol=1e-8)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(K - 1))
    assert evals[-1] >= 0


def test_pca_project_variance_equals_eigenvalues(spark):
    e = _emb(spark)
    mean, comps, evals = RD.pca_fit(e, k=K)
    out = RD.pca_project(e, mean, comps)
    p = np.asarray(
        [r["proj"] for r in out.select("proj").collect()], dtype=np.float64
    )
    assert p.shape[1] == K
    got = p.var(axis=0, ddof=1)
    assert np.allclose(got, evals, rtol=1e-6)
    # projection of the mean is ~0
    assert np.allclose(p.mean(axis=0), 0.0, atol=1e-9)
