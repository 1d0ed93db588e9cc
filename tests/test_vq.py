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


class TestPQADC:
    def test_topk_shape_and_recall(self, spark, sf_dir):
        """ADC results are a total-ordered top-5 per query, and the
        12-bit-code approximation still lands its picks well inside the
        true-L2 nearest half of the corpus (lossy != arbitrary)."""
        import numpy as np

        from columnar_estimator_sample_spark.operators.vq import (
            PQ_NQ, PQ_TOPK, q_pq_adc_topk)
        from columnar_estimator_sample_spark.sources.tables import table

        rows = q_pq_adc_topk(spark, sf_dir).collect()
        assert len(rows) == PQ_NQ * PQ_TOPK
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        emb = (table(spark, sf_dir, "embeddings")
               .orderBy("vec_id").collect())
        ids = np.array([r.vec_id for r in emb])
        X = np.array([np.round(np.array(r.embedding, dtype=np.float64), 6)
                      for r in emb])
        pos = {v: k for k, v in enumerate(ids)}
        n = len(ids)
        for q, rs in by_q.items():
            ds = [r.adc_d2 for r in sorted(rs, key=lambda r: r.rank)]
            assert ds == sorted(ds)
            true_d2 = ((X - X[pos[q]]) ** 2).sum(axis=1)
            true_rank = true_d2.argsort(kind="stable").argsort()
            # mean true rank of the ADC picks sits in the nearest half
            mean_rank = np.mean([true_rank[pos[r.neighbor_id]] for r in rs])
            assert mean_rank < n / 2, (q, mean_rank, n)
