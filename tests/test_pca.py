"""embedding_pca_power vs an independent dense eigensolver.

The oracle-parity sweep already pins Spark == DuckDB bit-for-bit; this
test pins that what both engines compute IS the PCA: the returned
loadings match numpy's eigendecomposition of the sample covariance (up
to the documented sign convention), the eigenvalues are the top-2 of
the spectrum, and the two components are orthonormal.
"""

from __future__ import annotations

import numpy as np
import pytest

from m4i_flink_tasks_spark.queries.llm_similarity import (
    embedding_pca_power,
)
from m4i_flink_tasks_spark.sources import load_table


@pytest.fixture(scope="module")
def pca_result(spark, sf_dir):
    df = embedding_pca_power(spark, sf_dir)
    rows = df.collect()
    comps: dict[int, np.ndarray] = {}
    lams: dict[int, float] = {}
    for c in (1, 2):
        sub = sorted(
            (r for r in rows if r.component == c), key=lambda r: r.pos
        )
        comps[c] = np.array([r.loading for r in sub])
        lams[c] = sub[0].eigenvalue
    return comps, lams


@pytest.fixture(scope="module")
def reference_spectrum(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    X = np.array(
        [r.embedding for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    # population covariance (divide by n), matching the query
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    return w[order], V[:, order]


def test_matches_numpy_eigendecomposition(pca_result, reference_spectrum):
    comps, lams = pca_result
    w, V = reference_spectrum
    for c in (1, 2):
        got = comps[c]
        ref = V[:, c - 1]
        # sign convention: largest-|loading| entry is positive
        k = int(np.argmax(np.abs(ref)))
        if ref[k] < 0:
            ref = -ref
        assert lams[c] == pytest.approx(w[c - 1], rel=1e-3)
        assert np.max(np.abs(got - ref)) < 1e-3, (
            f"component {c} deviates from the dense eigensolver"
        )


def test_components_orthonormal(pca_result):
    comps, lams = pca_result
    assert np.abs(np.dot(comps[1], comps[1]) - 1.0) < 1e-4
    assert np.abs(np.dot(comps[2], comps[2]) - 1.0) < 1e-4
    assert np.abs(np.dot(comps[1], comps[2])) < 1e-3
    assert lams[1] >= lams[2] > 0.0


def test_sign_convention(pca_result):
    comps, _ = pca_result
    for c in (1, 2):
        v = comps[c]
        assert v[int(np.argmax(np.abs(v)))] > 0
