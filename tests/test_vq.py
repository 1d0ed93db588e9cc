"""Spherical k-means: convergence of the iterative loop + shape claims
of the oracle-checked refinement step."""

from __future__ import annotations

import pytest

from columnar_estimator_sample_spark.operators.vq import K, kmeans_fit
from columnar_estimator_sample_spark.registry import queries

from test_plans import SF, plan_of


def test_kmeans_objective_monotone(spark):
    """Lloyd iterations on the sphere must not decrease the mean-cosine
    objective (up to exact-tie noise), and must actually improve it on
    this data starting from raw seed vectors."""
    _, hist = kmeans_fit(spark, SF, n_iter=4)
    assert len(hist) == 4
    for a, b in zip(hist, hist[1:]):
        assert b >= a - 1e-9, hist
    assert hist[-1] > hist[0], hist


def test_vq_refine_covers_all_vectors(spark):
    df = queries()["q_vq_refine"](spark, SF)
    rows = df.collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_assigned"] for r in rows) == n_vecs
    assert all(0 <= r["centroid_id"] < K for r in rows)
    # refinement is not a no-op on this data: some vector changed cells
    assert sum(r["n_moved_in"] for r in rows) > 0


def test_vq_refine_broadcasts_centroids(spark):
    """Both assignment passes must broadcast the K·dim centroid side —
    the exploded embeddings never shuffle for the dot-product joins."""
    plan = plan_of(spark, "q_vq_refine")
    assert plan.count("BroadcastExchange") >= 2, plan
