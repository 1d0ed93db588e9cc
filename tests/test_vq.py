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


class TestPQ:
    def test_every_vector_coded_once_per_subspace(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.vq import (
            PQ_K, PQ_SUB, q_embed_pq)
        from columnar_estimator_sample_spark.sources.tables import table
        rows = q_embed_pq(spark, sf_dir).collect()
        n_vecs = table(spark, sf_dir, "embeddings").count()
        per_sub = {}
        for r in rows:
            assert 0 <= r.s < PQ_SUB and 0 <= r.code < PQ_K
            assert r.min_d2 <= r.mean_d2 <= r.max_d2
            per_sub[r.s] = per_sub.get(r.s, 0) + r.n_assigned
        # codes partition the vectors: every vector coded in every subspace
        assert per_sub == {s: n_vecs for s in range(PQ_SUB)}

    def test_seed_vectors_code_to_themselves(self, spark, sf_dir):
        """A codebook seed sub-vector is L2 distance 0 from itself, so
        the seed vectors must quantize losslessly (min_d2 == 0 for the
        cell holding each seed)."""
        from columnar_estimator_sample_spark.operators.vq import q_embed_pq
        rows = q_embed_pq(spark, sf_dir).collect()
        zero_cells = {(r.s, r.code) for r in rows if r.min_d2 == 0}
        # each subspace has at least one exact-hit cell (its own seeds)
        assert {s for s, _ in zero_cells} == {r.s for r in rows}
