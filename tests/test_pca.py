"""Distributed PCA: the quantized statistics match an exact pure-Python
mirror under any partitioning, the solve recovers planted structure, and
the projection is a zero-shuffle map."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cdc_audit_spark.operators.pca import (
    COV_QUANT,
    column_means,
    covariance_q,
    pca_project,
    pca_train,
)
from cdc_audit_spark.operators.clustering import QUANT as MEAN_QUANT


def _vecs(seed=7, n=120, d=6):
    rng = np.random.RandomState(seed)
    # anisotropic: one planted dominant direction
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    base = rng.randn(n, d) * 0.05
    amps = rng.randn(n, 1) * 0.8
    return (base + amps * direction).astype(np.float32), direction


def _df(spark, arr):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(arr)],
        "vec_id long, embedding array<float>")


def _mirror_means(arr):
    q = np.floor(arr.astype(np.float64) * MEAN_QUANT).astype(np.int64)
    return [(int(s) / MEAN_QUANT) / len(arr) for s in q.sum(axis=0)]


def _mirror_cov_q(arr, mean):
    x = arr.astype(np.float64) - np.asarray(mean)
    d = x.shape[1]
    out = {}
    for i in range(d):
        for j in range(i, d):
            q = np.floor(x[:, i] * x[:, j] * COV_QUANT + 0.5).astype(
                np.int64)
            out[(i, j)] = int(q.sum())
    return out


def test_means_and_covariance_match_python_mirror_exactly(spark):
    arr, _ = _vecs()
    df = _df(spark, arr)
    mean = column_means(df, "embedding")
    assert mean == _mirror_means(arr)
    got = {(r["i"], r["j"]): r["cov_q"]
           for r in covariance_q(df, "embedding", mean).collect()}
    assert got == _mirror_cov_q(arr, mean)


def test_statistics_are_partitioning_invariant(spark):
    arr, _ = _vecs(seed=11)
    one = _df(spark, arr).repartition(1)
    many = _df(spark, arr).repartition(13)
    m1, m13 = column_means(one, "embedding"), column_means(many, "embedding")
    assert m1 == m13
    c1 = {(r["i"], r["j"]): r["cov_q"]
          for r in covariance_q(one, "embedding", m1).collect()}
    c13 = {(r["i"], r["j"]): r["cov_q"]
           for r in covariance_q(many, "embedding", m13).collect()}
    assert c1 == c13
    t1 = pca_train(one, "embedding", 2)
    t13 = pca_train(many, "embedding", 2)
    assert t1.components == t13.components  # bit-identical, not approx


def test_top_component_recovers_planted_direction(spark):
    arr, direction = _vecs(seed=3)
    model = pca_train(_df(spark, arr), "embedding", 2)
    w = np.asarray(model.components[0])
    assert abs(float(np.dot(w, direction))) > 0.99
    assert model.explained_variance[0] > 5 * model.explained_variance[1]
    # orthonormal, variance-descending
    assert math.isclose(float(np.dot(w, w)), 1.0, rel_tol=1e-9)
    assert math.isclose(
        float(np.dot(w, model.components[1])), 0.0, abs_tol=1e-9)


def test_projection_matches_numpy_and_is_shuffle_free(spark):
    arr, _ = _vecs(seed=5, n=60)
    df = _df(spark, arr)
    model = pca_train(df, "embedding", 3)
    proj = pca_project(df, "embedding", "vec_id", model)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    got = {r["vec_id"]: [r["p0"], r["p1"], r["p2"]]
           for r in proj.collect()}
    w = np.asarray(model.components).T
    expect = (arr.astype(np.float64) - np.asarray(model.mean)) @ w
    for i, row in enumerate(expect):
        assert got[i] == pytest.approx(list(row), abs=1e-9)


def test_sign_convention_is_deterministic(spark):
    arr, _ = _vecs(seed=9)
    model = pca_train(_df(spark, arr), "embedding", 3)
    for w in model.components:
        pivot = max(range(len(w)), key=lambda i: abs(w[i]))
        assert w[pivot] > 0


def test_k_out_of_range_refused(spark):
    arr, _ = _vecs(n=20, d=4)
    df = _df(spark, arr)
    with pytest.raises(ValueError):
        pca_train(df, "embedding", 0)
    with pytest.raises(ValueError):
        pca_train(df, "embedding", 5)
