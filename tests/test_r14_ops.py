"""Round-14 additions: deterministic twins for the (former) rows-only
duo, the sketch-guarantee predicates they rest on, the two_phase_rank
decomposition that replaced the corpus-sized global windows, and the
plan-audit unpartitioned-window detector."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tools"))


class TestApproxGuaranteePredicates:
    """Third-implementation pin for the guarantee booleans: the pure
    predicates must accept in-band values and reject out-of-band ones
    (so a TRUE in the driver gate means the sketch really was within
    tolerance, not that the predicate is vacuous)."""

    def test_rank_ok_accepts_exact_quantile(self):
        from columnar_estimator_sample_spark.operators.relational2 import (
            approx_rank_ok,
        )
        # exact median of 1000 rows: 499 strictly below, 500 at-or-below
        assert approx_rank_ok(499, 500, 1000, 0.5)
        # eps = 0.002 -> window is ranks [498, 502] for q=0.5, n=1000
        assert approx_rank_ok(502, 503, 1000, 0.5)
        assert not approx_rank_ok(503, 504, 1000, 0.5)   # above window
        assert not approx_rank_ok(400, 497, 1000, 0.5)   # below window
        # duplicate-heavy value straddling the window still accepts
        assert approx_rank_ok(0, 1000, 1000, 0.5)

    def test_ndv_ok_band(self):
        from columnar_estimator_sample_spark.operators.relational2 import (
            approx_ndv_ok,
        )
        assert approx_ndv_ok(1000, 1000)
        assert approx_ndv_ok(1050, 1000)      # +5% inclusive
        assert approx_ndv_ok(950, 1000)       # -5% inclusive
        assert not approx_ndv_ok(1051, 1000)
        assert not approx_ndv_ok(949, 1000)


class TestApproxStatsTwin:
    def test_exact_columns_match_independent_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational2 import (
            q_approx_stats,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        row = q_approx_stats(spark, sf_dir).collect()[0]
        li = table(spark, sf_dir, "lineitem")
        want = li.agg(
            F.count_distinct("l_orderkey").alias("o"),
            F.count_distinct("l_partkey").alias("p")).collect()[0]
        assert row["exact_orders"] == want["o"]
        assert row["exact_parts"] == want["p"]
        # the sketches hold their published bounds on the test corpus
        assert row["ndv_orders_ok"] and row["ndv_parts_ok"]
        assert row["p50_rank_ok"] and row["p99_rank_ok"]
        # and the returned percentile values are plausible order stats
        assert row["approx_median_price"] <= row["approx_p99_price"]

    def test_twin_is_a_projection_of_the_parent(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational2 import (
            q_approx_stats, q_approx_stats_exact,
        )
        parent = q_approx_stats(spark, sf_dir).collect()[0]
        twin = q_approx_stats_exact(spark, sf_dir).collect()[0]
        assert twin.asDict() == {
            k: parent[k] for k in twin.asDict()}


class TestCboActualsTwin:
    def test_actual_rows_match_direct_counts(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational2 import (
            CBO_PROBES, q_cbo_actuals,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        rows = {r["table_name"]: r for r in
                q_cbo_actuals(spark, sf_dir).collect()}
        assert set(rows) == {t for t, _ in CBO_PROBES}
        for tbl, pred in CBO_PROBES:
            want = table(spark, sf_dir, tbl).filter(pred).count()
            assert rows[tbl]["actual_rows"] == want
            assert rows[tbl]["predicate"] == pred
            assert rows[tbl]["est_present"] is True

class TestTwoPhaseRank:
    def test_equals_naive_global_row_number(self, spark):
        """two_phase_rank must reproduce the single-task
        Window.orderBy row_number exactly, including multi-key orders
        with DESC components and duplicate leading values."""
        from pyspark.sql.window import Window

        from columnar_estimator_sample_spark.operators.corpus import (
            two_phase_rank,
        )
        df = spark.range(500).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("a"),
            ((F.col("id") * 37) % 11).alias("b"))
        for order in ([F.desc("a"), "k"],
                      ["a", F.desc("b"), "k"],
                      ["k"]):
            want = {r["k"]: r["rn"] for r in df.withColumn(
                "rn", F.row_number().over(
                    Window.orderBy(*order)).cast("long")).collect()}
            got = {r["k"]: r["rn"] for r in
                   two_phase_rank(df, list(order), "rn", n_parts=8)
                   .collect()}
            assert got == want
        # internals must not leak (chaining two ranks relies on this)
        out = two_phase_rank(df, ["k"], "rn")
        assert set(out.columns) == {"k", "a", "b", "rn"}

    def test_multikey_cumsum_matches_naive(self, spark):
        from pyspark.sql.window import Window

        from columnar_estimator_sample_spark.operators.corpus import (
            two_phase_cumsum,
        )
        df = spark.range(300).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("a"),
            ((F.col("id") * 13) % 17 + 1).alias("v"))
        order = [F.desc("a"), "k"]
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0)
        want = {r["k"]: r["c"] for r in
                df.withColumn("c", F.sum("v").over(w)).collect()}
        got = {r["k"]: r["c"] for r in
               two_phase_cumsum(df, list(order), "v", "c", n_parts=8)
               .collect()}
        assert got == want


class TestUnpartitionedWindowDetector:
    def test_classifies_all_four_window_shapes(self, spark):
        """The plan-audit gate must count order-only and global-frame
        windows (single-task shapes) and ignore partitioned and
        partition-only ones."""
        from pyspark.sql.window import Window

        from audit_plans import _unpartitioned_window_lines

        df = spark.range(20).select(
            F.col("id"), (F.col("id") % 3).alias("g"))

        def plan(frame):
            return frame._jdf.queryExecution().executedPlan().toString()

        order_only = df.select(F.row_number().over(
            Window.orderBy("id")).alias("r"))
        assert _unpartitioned_window_lines(plan(order_only)) == 1
        global_frame = df.withColumn(
            "n", F.count("*").over(Window.partitionBy()))
        assert _unpartitioned_window_lines(plan(global_frame)) == 1
        partitioned = df.select(F.row_number().over(
            Window.partitionBy("g").orderBy("id")).alias("r"))
        assert _unpartitioned_window_lines(plan(partitioned)) == 0
        partition_only = df.withColumn(
            "m", F.min("id").over(Window.partitionBy("g")))
        assert _unpartitioned_window_lines(plan(partition_only)) == 0


class TestCurriculumSchedule:
    def test_phases_partition_the_corpus_evenly(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            CURRICULUM_PHASES, q_curriculum_schedule,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        rows = q_curriculum_schedule(spark, sf_dir).collect()
        n = table(spark, sf_dir, "documents").count()
        assert sum(r["n_docs"] for r in rows) == n
        per_phase = {}
        for r in rows:
            per_phase[r["phase"]] = per_phase.get(r["phase"], 0) \
                + r["n_docs"]
        assert set(per_phase) <= set(range(1, CURRICULUM_PHASES + 1))
        # the floor((rk-1)*K/N) cut gives every phase floor or ceil of
        # N/K documents — no phase is starved or bloated
        lo, hi = n // CURRICULUM_PHASES, -(-n // CURRICULUM_PHASES)
        for cnt in per_phase.values():
            assert lo <= cnt <= hi

    def test_difficulty_bands_are_monotone(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            q_curriculum_schedule,
        )
        rows = q_curriculum_schedule(spark, sf_dir).collect()
        band = {}
        for r in rows:
            p = r["phase"]
            band.setdefault(p, [r["min_diff_milli"], r["max_diff_milli"]])
            band[p][0] = min(band[p][0], r["min_diff_milli"])
            band[p][1] = max(band[p][1], r["max_diff_milli"])
        phases = sorted(band)
        for a, b in zip(phases, phases[1:]):
            # ranks order by (diff, doc_id): a later phase can TIE the
            # previous band edge but never dip below it
            assert band[b][0] >= band[a][1] or band[b][0] >= band[a][0]
            assert band[b][1] >= band[a][1]


class TestShardLayout:
    def test_census_matches_pure_python_md5_replay(self, spark, sf_dir):
        """Third-implementation pin: hashlib.md5 vs Spark md5 vs the
        DuckDB oracle (the driver compares the latter two; this pins
        the first against the query output at the smoke SF)."""
        import hashlib
        from collections import defaultdict

        from columnar_estimator_sample_spark.operators.partitioning import (
            NSHARDS, q_shard_layout,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        docs = (table(spark, sf_dir, "documents")
                .select("doc_id", "text", "source", "lang").collect())
        exp_docs = defaultdict(int)
        exp_tokens = defaultdict(int)
        exp_sources = defaultdict(set)
        for d in docs:
            h = int(hashlib.md5(str(d["doc_id"]).encode())
                    .hexdigest()[:15], 16)
            s = h % NSHARDS
            exp_docs[s] += 1
            exp_tokens[s] += len(d["text"].split(" "))
            exp_sources[s].add(d["source"])
        rows = q_shard_layout(spark, sf_dir).collect()
        assert {r["shard_id"] for r in rows} == set(exp_docs)
        total = sum(exp_docs.values())
        for r in rows:
            s = r["shard_id"]
            assert r["n_docs"] == exp_docs[s]
            assert r["sum_tokens"] == exp_tokens[s]
            assert r["n_sources"] == len(exp_sources[s])
            assert r["load_permille"] == \
                r["n_docs"] * NSHARDS * 1000 // total


class TestDomainMixture:
    def test_assignment_matches_numpy_argmin_replay(self, spark, sf_dir):
        """Third-implementation pin: numpy L2 argmin over the same
        integer-scaled lane must reproduce the domain token masses."""
        from collections import defaultdict
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        from columnar_estimator_sample_spark.operators.vq import (
            DOMAIN_K, q_domain_mixture,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        emb = (table(spark, sf_dir, "embeddings")
               .select("vec_id", "embedding").collect())
        vecs = {}
        for r in emb:
            vecs[r["vec_id"]] = np.array(
                [int(Decimal(repr(float(v))).quantize(
                     Decimal("0.000001"), rounding=ROUND_HALF_UP)
                     * 1_000_000) for v in r["embedding"]],
                dtype=np.int64)
        cb = {k: vecs[k] for k in range(DOMAIN_K)}
        docs = (table(spark, sf_dir, "documents")
                .select("doc_id", "text").collect())
        exp_docs = defaultdict(int)
        exp_toks = defaultdict(int)
        for d in docs:
            v = vecs[d["doc_id"]]
            d2 = {c: int(((v - cv) ** 2).sum()) for c, cv in cb.items()}
            dom = min(d2, key=lambda c: (d2[c], c))
            exp_docs[dom] += 1
            exp_toks[dom] += len([t for t in d["text"].split(" ") if t])
        rows = q_domain_mixture(spark, sf_dir).collect()
        assert {r["domain"] for r in rows} == set(exp_docs)
        for r in rows:
            assert r["n_docs_domain"] == exp_docs[r["domain"]]
            assert r["n_tokens_domain"] == exp_toks[r["domain"]]

    def test_mixture_invariants(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.vq import (
            q_domain_mixture,
        )
        rows = q_domain_mixture(spark, sf_dir).collect()
        assert rows, "domain census must not be vacuous"
        top = max(rows, key=lambda r: r["adm_ppm"])
        # the most up-weighted domain keeps everything by construction
        assert top["adm_ppm"] == 1_000_000
        assert top["n_docs_kept"] == top["n_docs_domain"]
        for r in rows:
            assert 0 <= r["adm_ppm"] <= 1_000_000
            assert r["n_docs_kept"] <= r["n_docs_domain"]
            assert r["n_tokens_kept"] <= r["n_tokens_domain"]
