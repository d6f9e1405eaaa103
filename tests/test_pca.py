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


def _audit(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, audit_event string, "
              "audit_pk long")


def test_maintained_moments_match_rebuild_exactly(spark):
    """Signed moment maintenance ≡ recomputing the raw second-moment
    sums on the post-batch corpus — integer equality, including an
    update+delete interplay and a brand-new row."""
    from cdc_audit_spark.operators.pca import incremental_moments

    arr, _ = _vecs(seed=13, n=30, d=5)
    base = _df(spark, arr)
    batch = _audit(spark, [
        (3, [float(-x) for x in arr[3]], "update", 1),
        (7, [float(x) for x in arr[7]], "delete", 2),
        (200, [float(x * 2) for x in arr[0]], "insert", 3),
    ])
    final = np.vstack([
        np.delete(arr, [3, 7], axis=0),
        (-arr[3])[None, :],
        (arr[0] * np.float32(2))[None, :],
    ])
    got = {(r["i"], r["j"]): r["s2_q"] for r in incremental_moments(
        base, batch, "embedding", ["vec_id"]).collect()}
    expect = _mirror_cov_q(final, [0.0] * 5)  # mean 0 → raw moments
    assert got == expect


def test_moments_delta_of_noop_update_is_all_zero(spark):
    """An update that re-states the same vector nets to exact zero in
    every cell — integer cancellation, no quantization residue."""
    from cdc_audit_spark.operators.pca import moments_delta

    arr, _ = _vecs(seed=17, n=10, d=4)
    base = _df(spark, arr)
    batch = _audit(spark, [(2, [float(x) for x in arr[2]], "update", 1)])
    rows = moments_delta(base, batch, "embedding", ["vec_id"]).collect()
    assert all(r["s2_q"] == 0 for r in rows)


def test_covariance_derived_from_maintained_moments_agrees(spark):
    """cov = (S2/Q − n·µµᵀ)/(n−1) from MAINTAINED sums agrees with the
    direct centered-product path within the mean quantum's floor-bias
    bound (~|µ|·1e-6 per cell — measured ~1e-8 on real data), i.e. far
    below eigendecomposition sensitivity."""
    from cdc_audit_spark.operators.pca import incremental_moments

    arr, _ = _vecs(seed=23, n=80, d=6)
    base = _df(spark, arr)
    batch = _audit(spark, [
        (5, [float(-x) for x in arr[5]], "update", 1),
        (9, [float(x) for x in arr[9]], "delete", 2),
    ])
    final = np.vstack([np.delete(arr, [5, 9], axis=0), (-arr[5])[None, :]])
    fdf = _df(spark, final)

    s2 = {(r["i"], r["j"]): r["s2_q"] for r in incremental_moments(
        base, batch, "embedding", ["vec_id"]).collect()}
    n = len(final)
    mu = np.asarray(column_means(fdf, "embedding"))
    direct = {(r["i"], r["j"]): r["cov_q"] for r in covariance_q(
        fdf, "embedding", mu.tolist()).collect()}
    for (i, j), q in s2.items():
        d1 = (q / COV_QUANT - n * mu[i] * mu[j]) / (n - 1)
        d2 = (direct[(i, j)] / COV_QUANT) / (n - 1)
        # |µ| here is ~0.1 (synthetic, 10× the fixture), so the bias
        # bound sits at ~1e-7; covariances are ~0.6 — six orders clear
        assert abs(d1 - d2) < 1e-6


def test_stream_pca_manifest_matches_batch_train(spark, tmp_path):
    """availableNow drain over three audit files: the rehydrated model's
    MEANS equal batch column_means on the final corpus exactly, the
    maintained S2 equals a recompute integer-exactly, components agree
    with batch pca_train within the mean-quantum bound, every state
    commit is an append, and a restarted drain applies only new files."""
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_pca import (
        current_manifest_pca,
        stream_pca_sync_manifest,
    )
    from cdc_audit_spark.operators.pca import pca_train

    arr, _ = _vecs(seed=29, n=50, d=5)
    SCH = ("vec_id long, embedding array<float>, audit_event string, "
           "audit_pk long")
    batches = [
        [(i, [float(x) for x in arr[i]], "insert", i + 1)
         for i in range(40)],
        [(i, [float(x) for x in arr[i]], "insert", 100 + i)
         for i in range(40, 50)],
        [(3, [float(-x) for x in arr[3]], "update", 200),
         (9, [float(x) for x in arr[9]], "delete", 201)],
    ]
    src = str(tmp_path / "audit_src")
    for rows in batches:
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode(
            "append").parquet(src)

    base_p, state_p = str(tmp_path / "base_t"), str(tmp_path / "state_t")
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    q = stream_pca_sync_manifest(spark, src, schema, base_p, state_p, ck,
                                 "embedding", ["vec_id"],
                                 max_files_per_trigger=1)
    q.awaitTermination(240)

    final = np.vstack([np.delete(arr, [3, 9], axis=0), (-arr[3])[None, :]])
    fdf = _df(spark, final)
    base, model = current_manifest_pca(spark, base_p, state_p, 2)
    assert base.count() == len(final)
    assert model.mean == column_means(fdf, "embedding")  # exact
    batch_model = pca_train(fdf, "embedding", 2)
    for got_w, want_w in zip(model.components, batch_model.components):
        assert np.allclose(got_w, want_w, atol=1e-5)

    state_t = ManifestTable(spark, state_p)
    assert all(state_t.manifest(v)["action"] == "append"
               for v in state_t.versions())

    # restart with one more batch: only it applies
    spark.createDataFrame(
        [(0, [float(x) for x in arr[0]], "delete", 300)], SCH
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_pca_sync_manifest(spark, src, schema, base_p, state_p, ck,
                                  "embedding", ["vec_id"])
    q2.awaitTermination(120)
    _, model2 = current_manifest_pca(spark, base_p, state_p, 2)
    assert model2.mean == column_means(_df(spark, final[1:]), "embedding")


def test_pca_epoch_half_committed_replay(spark, tmp_path):
    """Crash after the state append, before the base merge: the replay
    skips the state half (epoch guard) and catches the base up; a full
    replay is a durable no-op on both tables."""
    from cdc_audit_spark.operators.pca import moment_state_delta
    from cdc_audit_spark.sinks.manifest import ManifestTable
    from cdc_audit_spark.streaming.stream_pca import (
        apply_pca_manifest_epoch,
        current_manifest_pca,
    )

    arr, _ = _vecs(seed=31, n=20, d=4)
    SCH = ("vec_id long, embedding array<float>, audit_event string, "
           "audit_pk long")
    base_t = ManifestTable(spark, str(tmp_path / "base_t"))
    state_t = ManifestTable(spark, str(tmp_path / "state_t"))
    b0 = spark.createDataFrame(
        [(i, [float(x) for x in arr[i]], "insert", i + 1)
         for i in range(20)], SCH)
    apply_pca_manifest_epoch(base_t, state_t, b0, 0, "r1",
                             "embedding", ["vec_id"])

    b1 = spark.createDataFrame(
        [(5, [float(-x) for x in arr[5]], "update", 100)], SCH)
    half = moment_state_delta(base_t.read(), b1, "embedding", ["vec_id"])
    state_t.append(half, extra={"epoch": 1, "run_id": "r1"})

    apply_pca_manifest_epoch(base_t, state_t, b1, 1, "r1",
                             "embedding", ["vec_id"])
    final = np.vstack([np.delete(arr, [5], axis=0), (-arr[5])[None, :]])
    _, model = current_manifest_pca(spark, base_t.path, state_t.path, 2)
    assert model.mean == column_means(_df(spark, final), "embedding")
    snap = (base_t.current_version(), state_t.current_version())
    apply_pca_manifest_epoch(base_t, state_t, b1, 1, "r1",
                             "embedding", ["vec_id"])
    assert (base_t.current_version(), state_t.current_version()) == snap
