"""Embedding covariance + PCA projection — pinned against numpy."""

from __future__ import annotations

import numpy as np
import pytest

from debezium_server_bigquery_spark.functions.pca import (
    embedding_covariance,
    pca_project,
)
from debezium_server_bigquery_spark.sources.tables import load_table


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    data = rng.normal(size=(40, 5)).astype(np.float32)
    got = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(_emb(spark, data.tolist())).collect()
    }
    want = np.cov(data.astype(np.float64), rowvar=False, bias=True)
    for i in range(5):
        for j in range(i, 5):
            assert got[(i + 1, j + 1)] == pytest.approx(want[i, j], abs=1e-9)


def test_covariance_upper_triangle_only(spark):
    out = embedding_covariance(_emb(spark, [[1.0, 2.0], [3.0, 5.0]])).collect()
    keys = {(r.i, r.j) for r in out}
    assert keys == {(1, 1), (1, 2), (2, 2)}
    by = {(r.i, r.j): r.cov for r in out}
    # population covariance of {1,3} and {2,5}: var=1.0, 2.25, cov=1.5
    assert by[(1, 1)] == pytest.approx(1.0)
    assert by[(2, 2)] == pytest.approx(2.25)
    assert by[(1, 2)] == pytest.approx(1.5)


def test_pca_project_orders_by_explained_variance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    out = pca_project(emb, n_components=4).select("pca").collect()
    mat = np.array([r.pca for r in out])
    assert mat.shape[1] == 4
    variances = mat.var(axis=0)
    # components come back in decreasing explained-variance order
    assert all(variances[k] >= variances[k + 1] - 1e-9 for k in range(3))


def test_pca_project_recovers_dominant_axis(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(100, 1)) * np.array([[5.0, 0.0, 0.0, 0.0]])
    noise = rng.normal(scale=0.05, size=(100, 4))
    data = (base + noise).astype(np.float32)
    out = pca_project(_emb(spark, data.tolist()), n_components=1).collect()
    proj = np.array([r.pca[0] for r in out])
    x0 = data[:, 0].astype(np.float64)
    corr = abs(np.corrcoef(proj, x0)[0, 1])
    assert corr > 0.99  # first PC is the planted dominant axis (up to sign)
