"""Invariant tests for the sketch/graph/profiling batch: count-min
heavy hitters, triangle counting, correlation matrix."""

from __future__ import annotations

from columnar_estimator_sample_spark.operators.sketches import q_countmin_hh
from columnar_estimator_sample_spark.operators.graph import q_triangle_count
from columnar_estimator_sample_spark.plans.stats_queries import q_corr_matrix
from columnar_estimator_sample_spark.sources.tables import table


class TestCountMin:
    def test_one_sided_error(self, spark, sf_dir):
        rows = q_countmin_hh(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # count-min never undercounts
            assert r.overcount >= 0
            assert r.est_n == r.exact_n + r.overcount
        # report is ordered by exact count desc
        exacts = [r.exact_n for r in rows]
        assert exacts == sorted(exacts, reverse=True)


class TestTriangles:
    def test_handshake_invariants(self, spark, sf_dir):
        rows = q_triangle_count(spark, sf_dir).collect()
        assert rows
        n_nations = table(spark, sf_dir, "nation").count()
        total = sum(r.n_triangles for r in rows)
        # each triangle is counted at exactly 3 nodes
        assert total % 3 == 0 and total > 0
        for r in rows:
            assert 0 <= r.clustering_pm <= 1000
            assert 2 <= r.degree <= n_nations - 1
            # a node in t triangles has at least enough neighbor pairs
            assert r.n_triangles <= r.degree * (r.degree - 1) // 2


class TestCorrMatrix:
    def test_r_bounds_and_coverage(self, spark, sf_dir):
        rows = q_corr_matrix(spark, sf_dir).collect()
        order = ["quantity", "extendedprice", "discount", "tax"]
        assert len(rows) == 6  # C(4,2) unordered pairs
        n_rows = table(spark, sf_dir, "lineitem").count()
        seen = set()
        for r in rows:
            # pairs follow declaration order (col_x earlier than col_y)
            assert order.index(r.col_x) < order.index(r.col_y)
            assert -1.0 <= r.r <= 1.0
            assert r.n == n_rows
            seen.add((r.col_x, r.col_y))
        assert len(seen) == 6

    def test_matches_numpy_pearson(self, spark, sf_dir):
        # independent ground truth: numpy corrcoef over the same
        # cent-scaled integers (float64 path, so tolerance not equality)
        import numpy as np
        rows = {(r.col_x, r.col_y): r.r
                for r in q_corr_matrix(spark, sf_dir).collect()}
        pdf = (table(spark, sf_dir, "lineitem")
               .select("l_quantity", "l_extendedprice", "l_discount",
                       "l_tax").toPandas())
        cents = {
            "quantity": np.rint(pdf["l_quantity"] * 100),
            "extendedprice": np.rint(pdf["l_extendedprice"] * 100),
            "discount": np.rint(pdf["l_discount"] * 100),
            "tax": np.rint(pdf["l_tax"] * 100),
        }
        for (a, b), r in rows.items():
            expected = np.corrcoef(cents[a], cents[b])[0, 1]
            assert abs(r - expected) < 1e-9, (a, b, r, expected)


class TestColumnProfile:
    def test_matches_numpy(self, spark, sf_dir):
        import numpy as np
        from columnar_estimator_sample_spark.plans.stats_queries import (
            q_column_profile)
        rows = {r.col_name: r for r in
                q_column_profile(spark, sf_dir).collect()}
        pdf = (table(spark, sf_dir, "lineitem")
               .select("l_quantity", "l_extendedprice", "l_discount",
                       "l_tax").toPandas())
        for name, col in [("quantity", "l_quantity"),
                          ("extendedprice", "l_extendedprice"),
                          ("discount", "l_discount"), ("tax", "l_tax")]:
            cents = np.rint(pdf[col] * 100)
            r = rows[name]
            assert r.n_rows == len(cents)
            assert r.min_cents == int(cents.min())
            assert r.max_cents == int(cents.max())
            assert abs(r.mean_cents - cents.mean()) < 1e-6
            assert abs(r.stddev_cents - cents.std(ddof=1)) < 1e-6


class TestTableChecksum:
    def test_detects_any_row_change(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.quality import (
            q_table_checksum, _CHECKSUM_TABLES, _CK_MOD)
        rows = {r.table_name: r for r in
                q_table_checksum(spark, sf_dir).collect()}
        assert set(rows) == {t for t, _ in _CHECKSUM_TABLES}
        for r in rows.values():
            assert 0 <= r.checksum40 < _CK_MOD
            assert r.n_rows > 0
        # order independence: recompute over a differently-partitioned
        # shuffle of lineitem and the checksum must not move
        from columnar_estimator_sample_spark.functions.hashing import h64
        from pyspark.sql import functions as F
        li = (table(spark, sf_dir, "lineitem")
              .repartition(7).sortWithinPartitions("l_partkey"))
        canon = F.concat_ws("|", *[F.col(c).cast("string") for c in
                                   _CHECKSUM_TABLES[0][1]])
        again = li.agg(
            (F.sum(h64(canon).cast("decimal(38,0)")) % _CK_MOD)
            .cast("long")).collect()[0][0]
        assert again == rows["lineitem"].checksum40


class TestWindowRanks:
    def test_rank_family_consistency(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.relational2 import (
            q_window_ranks)
        rows = q_window_ranks(spark, sf_dir).collect()
        from collections import defaultdict
        by_nation = defaultdict(list)
        for r in rows:
            by_nation[r.nation].append(r)
        for nation, rs in by_nation.items():
            n = len(rs)
            for i, r in enumerate(rs):
                assert r.rnk == i + 1 or rs[i - 1].n_orders == r.n_orders
                assert r.drnk <= r.rnk
                assert 0.0 <= r.prnk <= 1.0 and 0.0 < r.cdist <= 1.0
                assert 1 <= r.quartile <= 4
            # quartile sizes differ by at most 1
            sizes = defaultdict(int)
            for r in rs:
                sizes[r.quartile] += 1
            if n >= 4:
                assert max(sizes.values()) - min(sizes.values()) <= 1


class TestChiSquare:
    def test_marginals_and_scipy_free_total(self, spark, sf_dir):
        from columnar_estimator_sample_spark.plans.stats_queries import (
            q_chi_square)
        rows = q_chi_square(spark, sf_dir).collect()
        n = sum(r.obs for r in rows)
        # expected counts reproduce the observed marginals exactly
        from collections import defaultdict
        row_exp = defaultdict(float)
        row_obs = defaultdict(int)
        for r in rows:
            assert r.contrib >= 0.0
            assert abs(r.expected - r.row_tot * r.col_tot / n) < 1e-9
            row_exp[r.flag] += r.expected
            row_obs[r.flag] += r.obs
        for flag in row_obs:
            assert abs(row_exp[flag] - row_obs[flag]) < 1e-6


class TestHistogram:
    def test_bins_partition_the_range(self, spark, sf_dir):
        from columnar_estimator_sample_spark.plans.stats_queries import (
            N_HIST_BINS, q_histogram)
        rows = q_histogram(spark, sf_dir).collect()
        n_total = table(spark, sf_dir, "lineitem").count()
        assert sum(r.n for r in rows) == n_total   # every row lands in a bin
        bins = [r.bin for r in rows]
        assert bins == sorted(bins)
        assert 0 <= bins[0] and bins[-1] <= N_HIST_BINS - 1
        los = [r.lo_cents_ge for r in rows]
        assert los == sorted(los)                  # edges monotone


class TestBenford:
    def test_digit_shares(self, spark, sf_dir):
        from columnar_estimator_sample_spark.plans.stats_queries import (
            q_benford)
        rows = q_benford(spark, sf_dir).collect()
        assert {r.digit for r in rows} <= set("123456789")
        tot_pm = sum(r.share_pm for r in rows)
        assert 1000 - len(rows) <= tot_pm <= 1000  # floor-division slack


class TestHLL:
    def test_estimate_error_and_register_bounds(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.sketches import (
            HLL_M, HLL_RHO_CAP, q_hll_ndv)
        rows = q_hll_ndv(spark, sf_dir).collect()
        assert len(rows) == 4
        for r in rows:
            assert 1 <= r.n_registers <= HLL_M
            assert 1 <= r.r_max <= HLL_RHO_CAP
            # 64 registers -> ~13% std error; allow 4 sigma
            assert 480 <= r.ratio_permille <= 1520, r

    def test_registers_merge_across_shards(self, spark, sf_dir):
        """HLL registers from disjoint shards combine by MAX into exactly
        the registers of the union — the mergeability the 100 TB story
        rests on."""
        import pyspark.sql.functions as F
        from columnar_estimator_sample_spark.functions.hashing import h64
        from columnar_estimator_sample_spark.operators.sketches import HLL_M

        li = table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("string").alias("v"))
        hx = li.select(h64(F.concat(F.lit("hll_"), F.col("v"))).alias("h"))
        rho = F.when(F.expr(f"h div {HLL_M}") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.expr(f"bin(h div {HLL_M})")))
        parts = hx.select((F.col("h") % HLL_M).alias("j"),
                          rho.cast("long").alias("r"),
                          (F.col("h") % 2).alias("shard"))

        whole = {r.j: r.m for r in
                 parts.groupBy("j").agg(F.max("r").alias("m")).collect()}
        sharded = (parts.groupBy("shard", "j").agg(F.max("r").alias("m"))
                   .groupBy("j").agg(F.max("m").alias("m")).collect())
        assert {r.j: r.m for r in sharded} == whole


class TestBitmapRetention:
    def test_matches_set_arithmetic(self, spark, sf_dir):
        """Bitmap popcount results must equal plain set intersection /
        union on the same user-day data."""
        import pyspark.sql.functions as F2
        from columnar_estimator_sample_spark.operators.events import (
            US_PER_DAY)
        from columnar_estimator_sample_spark.operators.sketches import (
            q_bitmap_retention)
        rows = q_bitmap_retention(spark, sf_dir).collect()
        assert rows
        ud = (table(spark, sf_dir, "events")
              .select("user_id",
                      F2.expr(f"CAST(us div {US_PER_DAY} AS BIGINT)")
                      .alias("day"))
              .distinct().collect())
        days: dict = {}
        for r in ud:
            days.setdefault(r.day, set()).add(r.user_id)
        for r in rows:
            a, b = days[r.day], days.get(r.day + 1, set())
            assert r.dau == len(a)
            assert r.n_both == len(a & b)
            assert r.n_either == len(a | b)
            assert r.jaccard_permille == 1000 * len(a & b) // len(a | b)


class TestBloomFPR:
    def test_no_false_negatives_and_sane_fpr(self, spark, sf_dir):
        """Members must ALWAYS hit (bloom guarantee); the measured FPR on
        non-members stays within an order of magnitude of theory."""
        import math
        from columnar_estimator_sample_spark.operators.sketches import (
            BF_K, BF_M, q_bloom_fpr)
        row = q_bloom_fpr(spark, sf_dir).collect()[0]
        assert row.n_members > 0
        assert 0 <= row.n_fp <= row.n_probes
        # theory: (1 - e^{-kn/m})^k; allow wide slack (small probe set)
        theo = (1 - math.exp(-BF_K * row.n_members / BF_M)) ** BF_K
        assert row.fpr_permille <= max(1000 * theo * 3, 50) + 1000 * 0.05 \
            or theo > 0.9


class TestCaptureRecapture:
    def test_estimate_brackets_observed(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.sketches import (
            q_capture_recapture)
        r = q_capture_recapture(spark, sf_dir).collect()[0]
        assert r.recaptured <= min(r.n1, r.n2)
        assert max(r.n1, r.n2) <= r.observed <= r.n1 + r.n2
        # with heavy overlap the estimate lands near the observed count
        assert r.lp_est >= max(r.n1, r.n2)


class TestKMVDistinct:
    def test_estimates_within_sketch_error(self, spark, sf_dir):
        """KMV error is ~1/sqrt(K-2) ≈ 13% at K=64; allow 4 sigma. The
        exact_* columns are independently checked against a brute-force
        pandas recomputation."""
        from columnar_estimator_sample_spark.operators.sketches import (
            q_kmv_distinct)
        r = q_kmv_distinct(spark, sf_dir).collect()[0]
        assert r.k == 64
        for est, exact in [(r.est_n1, r.exact_n1), (r.est_n2, r.exact_n2),
                           (r.est_union, r.exact_union)]:
            assert exact > 0
            if exact <= r.k:
                assert est == exact  # sub-K populations are exact
            else:
                assert abs(est - exact) <= 0.52 * exact
        # set algebra invariants on the exact side
        assert r.exact_union <= r.exact_n1 + r.exact_n2
        assert r.exact_intersection <= min(r.exact_n1, r.exact_n2)
        assert (r.exact_union
                == r.exact_n1 + r.exact_n2 - r.exact_intersection)
        # intersection estimate composes rho with the union estimate
        assert 0 <= r.jaccard_permille_est <= 1000


class TestJoinSizeEstimate:
    def test_one_sided_overcount(self, spark, sf_dir):
        """CM inner products only ADD collision cross-terms: every depth
        row's estimate must be >= the exact join size."""
        from columnar_estimator_sample_spark.operators.sketches import (
            JS_D, q_join_size_estimate)
        rows = q_join_size_estimate(spark, sf_dir).collect()
        assert len(rows) == JS_D
        for r in rows:
            assert r.est_join_rows >= r.exact_join_rows > 0
            assert r.ratio_permille >= 1000
        # the min-row estimate is the usable one; it should not be
        # catastrophically loose on a 256-bucket sketch at test scale
        best = min(r.est_join_rows for r in rows)
        exact = rows[0].exact_join_rows
        assert best <= 3 * exact


class TestQuantileSketch:
    def test_within_one_bin_of_exact(self, spark, sf_dir):
        """The histogram quantile can be off by at most one bin width
        (plus interpolation floor); exact numpy nearest-rank is the
        ground truth."""
        import numpy as np
        from columnar_estimator_sample_spark.plans.stats_queries import (
            N_HIST_BINS, q_quantile_sketch)
        rows = q_quantile_sketch(spark, sf_dir).collect()
        assert [r.q_permille for r in rows] == [500, 900, 990]
        pdf = (table(spark, sf_dir, "lineitem")
               .select("l_extendedprice").toPandas())
        cents = np.sort(np.rint(pdf["l_extendedprice"] * 100)
                        .to_numpy().astype(np.int64))
        width = (int(cents.max()) - int(cents.min()) + 1) // N_HIST_BINS
        for r in rows:
            assert r.n_rows == len(cents)
            exact = int(cents[r.target_rank - 1])  # nearest-rank
            assert abs(r.est_cents - exact) <= width + 1


class TestHLLRollup:
    def test_merged_daily_sketches_equal_direct_weekly(self, spark, sf_dir):
        """Register MAX is associative: weekly registers built by merging
        the stored daily sketches must be bit-identical to registers
        computed directly from the raw weekly data — the property that
        makes sketch rollups (day -> week -> month, shard merges,
        streaming micro-batches) exact re-aggregations, not approximations
        of approximations."""
        from pyspark.sql import functions as F

        from columnar_estimator_sample_spark.functions.hashing import h64
        from columnar_estimator_sample_spark.operators.events import (
            US_PER_DAY,
        )
        from columnar_estimator_sample_spark.operators.sketches import (
            HLL_M, HLL_RHO_CAP,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        ev = table(spark, sf_dir, "events").select(
            "user_id", F.expr(f"us div {US_PER_DAY}").alias("day"))
        hx = ev.select(
            F.expr("day div 7").alias("week"), "day",
            h64(F.concat(F.lit("hllr_"), F.col("user_id").cast("string")))
            .alias("h"))
        rho = F.when(F.expr(f"h div {HLL_M}") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.expr(f"bin(h div {HLL_M})")))
        ranked = hx.select("week", "day", (F.col("h") % HLL_M).alias("j"),
                           F.least(rho, F.lit(HLL_RHO_CAP)).cast("long")
                           .alias("r"))
        via_daily = (ranked.groupBy("week", "day", "j")
                     .agg(F.max("r").alias("m"))
                     .groupBy("week", "j").agg(F.max("m").alias("m")))
        direct = ranked.groupBy("week", "j").agg(F.max("r").alias("m"))
        diff = (via_daily.join(direct, ["week", "j"], "full")
                .filter((via_daily.m != direct.m)
                        | via_daily.m.isNull() | direct.m.isNull())
                .count())
        assert diff == 0

    def test_rollup_estimates_within_hll_error(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.sketches import (
            q_hll_rollup,
        )
        rows = q_hll_rollup(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # 64 registers -> ~13% std error; allow 3 sigma
            assert 600 <= r.ratio_permille <= 1400
            assert r.n_sketches >= 1
