"""Distributed k-means: Spark Lloyd ≡ an exact pure-Python mirror (same
init, same micro-quantized integer updates — bit-identical centers, not
approximately equal), k-means|| init determinism and blob coverage,
partitioning-invariance, empty-cluster handling."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from cdc_audit_spark.operators.clustering import (
    QUANT,
    assign_clusters,
    kmeans_parallel_init,
    train_kmeans,
)

BLOBS = [(-4.0, -4.0), (4.0, 4.0), (-4.0, 4.0)]  # well-separated 2-D means


def _blob_rows(n_per=20, dim=4):
    """Deterministic float32 blobs: two signal dims + small structured
    noise in all dims (no RNG — reproducible across engines)."""
    rows = []
    vid = 0
    for b, (mx, my) in enumerate(BLOBS):
        for i in range(n_per):
            noise = [((i * 7 + d * 3 + b) % 11 - 5) / 10.0 for d in range(dim)]
            v = [mx + noise[0], my + noise[1]] + noise[2:]
            rows.append((vid, [float(np.float32(x)) for x in v], b))
            vid += 1
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "vec_id long, embedding array<float>")


def _py_nearest(v, centers):
    d2s = []
    for c in centers:
        acc = 0.0
        for a, b in zip(v, c):
            acc += (a - b) * (a - b)
        d2s.append(acc)
    return min(range(len(centers)), key=lambda i: (d2s[i], i))


def _py_lloyd(vecs, centers, iters):
    """Mirror of train_kmeans' update arithmetic, op for op: sequential
    double d² folds, floor(x·QUANT) BIGINT sums, sum/(QUANT·n) division."""
    centers = [list(map(float, c)) for c in centers]
    k = len(centers)
    dim = len(vecs[0])
    for _ in range(iters):
        sums = [[0] * dim for _ in range(k)]
        counts = [0] * k
        for v in vecs:
            c = _py_nearest(v, centers)
            counts[c] += 1
            for d, x in enumerate(v):
                sums[c][d] += math.floor(x * float(QUANT))
        new_centers = []
        shift = 0.0
        for i in range(k):
            if counts[i] == 0:
                new_centers.append(centers[i])
                continue
            c = [s / (QUANT * counts[i]) for s in sums[i]]
            acc = 0.0
            for a, b in zip(c, centers[i]):
                acc += (a - b) * (a - b)
            shift = max(shift, math.sqrt(acc))
            new_centers.append(c)
        centers = new_centers
        if shift == 0.0:
            break
    return centers


def test_lloyd_matches_python_mirror_exactly(spark):
    rows = _blob_rows()
    df = _df(spark, rows)
    init = [rows[0][1], rows[20][1], rows[40][1]]  # one seed per blob
    model = train_kmeans(df, 3, init_centers=init, iters=5)
    expect = _py_lloyd([r[1] for r in rows], init, 5)
    assert model.centers == expect  # bit-identical, not approx


def test_partitioning_invariance(spark):
    rows = _blob_rows()
    init = [rows[0][1], rows[20][1], rows[40][1]]
    m1 = train_kmeans(_df(spark, rows).repartition(7), 3, init_centers=init, iters=4)
    m2 = train_kmeans(_df(spark, rows).repartition(2), 3, init_centers=init, iters=4)
    assert m1.centers == m2.centers  # integer sums: order-independent
    assert m1.sizes == m2.sizes


def test_blobs_recovered_end_to_end(spark):
    rows = _blob_rows()
    df = _df(spark, rows)
    model = train_kmeans(df, 3, iters=8)  # k-means|| init
    assert sorted(model.sizes) == [20, 20, 20]
    got = {r["vec_id"]: r["cluster"] for r in assign_clusters(df, model).collect()}
    for b in range(3):
        members = {got[r[0]] for r in rows if r[2] == b}
        assert len(members) == 1  # each blob lands in exactly one cluster
    assert model.shifts[-1] < 1e-6 or len(model.shifts) <= 8


def test_init_deterministic_and_covers_blobs(spark):
    rows = _blob_rows()
    df = _df(spark, rows)
    c1 = kmeans_parallel_init(df, 3)
    c2 = kmeans_parallel_init(df.repartition(5), 3)
    assert c1 == c2
    assert len(c1) == 3
    # each seed sits inside a distinct blob's bounding box
    owners = set()
    for c in c1:
        owners.add(min(range(3), key=lambda b: (c[0] - BLOBS[b][0]) ** 2
                       + (c[1] - BLOBS[b][1]) ** 2))
    assert owners == {0, 1, 2}


def test_empty_cluster_keeps_center(spark):
    rows = _blob_rows()
    df = _df(spark, rows)
    far = [100.0, 100.0, 0.0, 0.0]
    init = [rows[0][1], rows[20][1], far]
    model = train_kmeans(df, 3, init_centers=init, iters=3)
    assert model.centers[2] == far
    assert model.sizes[2] == 0


def test_k_larger_than_corpus_refuses(spark):
    df = _df(spark, _blob_rows(n_per=1))
    with pytest.raises(ValueError, match="seed centers"):
        train_kmeans(df, 10, iters=1)


def test_assign_clusters_zero_shuffle(spark):
    rows = _blob_rows()
    df = _df(spark, rows)
    out = assign_clusters(df, [rows[0][1], rows[20][1]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_spherical_kmeans_clusters_by_direction(spark):
    """spherical=True clusters by DIRECTION: same-direction vectors at
    wildly different magnitudes co-cluster (Euclidean would split them),
    centers come out unit-norm, and they feed the cosine IVF contract."""
    dirs = [(1.0, 0.0, 0.0, 0.0), (0.0, 1.0, 0.0, 0.0), (0.0, 0.0, 1.0, 0.0)]
    rows = []
    vid = 0
    for d, base in enumerate(dirs):
        for i in range(10):
            mag = 0.1 + 10.0 * i          # magnitudes span 100x
            jitter = [(i % 3) * 0.02] * 4
            v = [float(np.float32(base[j] * mag + jitter[j] * mag))
                 for j in range(4)]
            rows.append((vid, v, d))
            vid += 1
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "vec_id long, embedding array<float>")

    model = train_kmeans(df, 3, iters=8, spherical=True)
    for c in model.centers:
        assert math.sqrt(sum(x * x for x in c)) == pytest.approx(1.0, abs=1e-9)
    got = {r["vec_id"]: r["cluster"] for r in assign_clusters(df, model).collect()}
    for d in range(3):
        members = {got[r[0]] for r in rows if r[2] == d}
        assert len(members) == 1  # direction family co-clusters
    assert sorted(model.sizes) == [10, 10, 10]

    # determinism under partitioning, like the euclidean path
    m2 = train_kmeans(df.repartition(5), 3, iters=8, spherical=True)
    assert m2.centers == model.centers


def test_spherical_kmeans_drops_zero_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>")
    model = train_kmeans(df, 2, iters=3, spherical=True)
    assert sum(model.sizes) == 2  # the zero vector never assigned
