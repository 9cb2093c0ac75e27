"""Distributed PCA (operators/embeddings.py): the mapInArrow partial-sums
fit must agree with a straight numpy PCA over the collected corpus, and
the projection query must be a faithful application of that model.
"""

from __future__ import annotations

import json

import numpy as np

from pyspark.sql import functions as F

from xml_hive_spark.operators import all_queries, t
from xml_hive_spark.operators.embeddings import pca_fit


def _corpus(spark, sf_dir):
    rows = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, x


class TestPcaFit:
    def test_matches_numpy(self, spark, sf_dir):
        ids, x = _corpus(spark, sf_dir)
        mean, comps = pca_fit(t(spark, sf_dir, "embeddings"), k=8)
        assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
        cov = np.cov(x, rowvar=False, bias=True)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:8]
        ref = evecs[:, order]
        # eigenvector sign is arbitrary — compare up to sign per column
        for j in range(8):
            d = min(
                np.abs(comps[:, j] - ref[:, j]).max(),
                np.abs(comps[:, j] + ref[:, j]).max(),
            )
            assert d < 1e-6, (j, d)

    def test_components_orthonormal_and_variance_ordered(self, spark, sf_dir):
        ids, x = _corpus(spark, sf_dir)
        mean, comps = pca_fit(t(spark, sf_dir, "embeddings"), k=8)
        assert np.allclose(comps.T @ comps, np.eye(8), atol=1e-9)
        proj = (x - mean) @ comps
        var = proj.var(axis=0)
        assert all(var[i] >= var[i + 1] - 1e-12 for i in range(7)), var


class TestProjectionQuery:
    def test_projection_matches_model(self, spark, sf_dir):
        ids, x = _corpus(spark, sf_dir)
        mean, comps = pca_fit(t(spark, sf_dir, "embeddings"), k=8)
        expected = {
            int(i): np.round((v - mean) @ comps, 6)
            for i, v in zip(ids, x)
        }
        out = all_queries()["embedding_pca_project"].fn(spark, sf_dir).collect()
        assert len(out) == len(ids)
        for r in out:
            got = np.array(json.loads(r.pc_json))
            # both sides round(6); partial-sum order can flip the last
            # digit at a rounding boundary
            assert np.allclose(got, expected[r.vec_id], atol=2e-6)
