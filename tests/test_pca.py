"""PCA operator vs a direct numpy reference on the same vectors."""

from __future__ import annotations

import numpy as np
import pytest

from realtime_spark.operators.pca import covariance, pca_fit, pca_project
from tests.conftest import SF_DIR as SF_DIR_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    from realtime_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR_SMALL, "embeddings").persist()


@pytest.fixture(scope="module")
def x(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    return ids, np.array([r["embedding"] for r in rows], dtype=np.float64)


class TestMoments:
    def test_covariance_matches_numpy(self, emb, x):
        _, mat = x
        mean, cov, n = covariance(emb)
        assert n == mat.shape[0]
        np.testing.assert_allclose(mean, mat.mean(axis=0), rtol=0, atol=1e-10)
        ref_cov = (mat.T @ mat) / n - np.outer(mat.mean(axis=0), mat.mean(axis=0))
        np.testing.assert_allclose(cov, ref_cov, rtol=0, atol=1e-10)


class TestFitProject:
    def test_explained_variance(self, emb, x):
        _, mat = x
        model = pca_fit(emb, k=8)
        ref_cov = np.cov(mat, rowvar=False, bias=True)
        ref_vals = np.sort(np.linalg.eigvalsh(ref_cov))[::-1][:8]
        np.testing.assert_allclose(model["eigvals"], ref_vals, atol=1e-9)
        assert np.all(np.diff(model["eigvals"]) <= 1e-12)  # descending
        assert model["explained"].sum() <= 1.0 + 1e-9

    def test_projection_matches_numpy(self, emb, x):
        ids, mat = x
        model = pca_fit(emb, k=4)
        got = {
            r["vec_id"]: np.array(r["pc"])
            for r in pca_project(emb, model).collect()
        }
        ref = (mat - model["mean"]) @ model["components"].T
        for i, vid in enumerate(ids):
            np.testing.assert_allclose(got[vid], ref[i], atol=1e-9)

    def test_whitened_projection_unit_variance(self, emb):
        model = pca_fit(emb, k=4)
        proj = pca_project(emb, model, whiten=True)
        rows = np.array([r["pc"] for r in proj.collect()])
        # population variance of each whitened axis ~= 1
        np.testing.assert_allclose(rows.var(axis=0), np.ones(4), rtol=1e-6)

    def test_sign_canonicalized(self, emb):
        m1 = pca_fit(emb, k=4)
        for row in m1["components"]:
            j = int(np.argmax(np.abs(row)))
            assert row[j] > 0


def test_powersums_determine_block_eigenvalues(spark, sf_dir):
    """The oracled Newton power sums p_k = trace(B^k) equal the power sums
    of numpy's eigenvalues of the same quantized block — tying the
    integer-exact oracle quantity to the actual spectrum."""
    import math

    import numpy as np

    from realtime_spark.operators.pca import covariance
    from realtime_spark.plans.pca_plan import (
        _COV_BLOCK,
        _EIG_SCALE,
        q_emb_eig_powersums,
    )
    from realtime_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _, cov, _ = covariance(emb)
    d = _COV_BLOCK
    B = np.array(
        [[math.floor(cov[i, j] * _EIG_SCALE + 0.5) for j in range(d)]
         for i in range(d)],
        dtype=np.float64,
    )
    eig = np.linalg.eigvalsh(B)
    got = {r["k"]: int(r["p"]) for r in q_emb_eig_powersums(spark, sf_dir).collect()}
    for k in range(1, d + 1):
        expect = float(np.sum(eig ** k))
        assert abs(got[k] - expect) <= abs(expect) * 1e-10 + 1.0
