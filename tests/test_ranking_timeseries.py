"""Property and plan tests for the ranking and time-series tiers.

The DuckDB oracle pins cross-engine value equality; these tests pin the
*semantic invariants* the oracle can't express (score monotonicity, OHLC
bounds, forward-fill completeness, EWMA convexity) plus plan shapes that
matter at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.operators import ranking, timeseries
from columnar_estimator_sample_spark.sources.tables import table


class TestRanking:
    def test_inverted_index_invariants(self, spark, sf_dir):
        n_docs = table(spark, sf_dir, "documents").count()
        rows = ranking.q_inverted_index(spark, sf_dir).collect()
        assert rows, "index is non-empty"
        for r in rows:
            assert 1 <= r.df <= n_docs
            assert r.cf >= r.df          # cf counts every occurrence
            assert r.max_tf >= 1
        # presentation order: cf desc, term asc
        cfs = [(-r.cf, r.term) for r in rows]
        assert cfs == sorted(cfs)

    def test_bm25_scores_positive_and_ranked(self, spark, sf_dir):
        rows = ranking.q_bm25_search(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.score_micro > 0
            assert 1 <= r.n_terms <= len(ranking.QUERY_TERMS)
        scores = [(-r.score_micro, r.doc_id) for r in rows]
        assert scores == sorted(scores)

    def test_bm25_no_cartesian_in_plan(self, spark, sf_dir):
        plan = ranking.q_bm25_search(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the per-term df side must broadcast, not shuffle
        assert "BroadcastHashJoin" in plan


class TestTimeseries:
    def test_ohlc_bounds(self, spark, sf_dir):
        rows = timeseries.q_resample_ohlc(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.low <= r.high
            assert r.low <= r.open <= r.high
            assert r.low <= r.close <= r.high
            assert r.n >= 1
            if r.n == 1:
                assert r.open == r.close == r.high == r.low

    def test_gap_fill_dense_and_conserving(self, spark, sf_dir):
        out = timeseries.q_gap_fill(spark, sf_dir)
        rows = out.collect()
        ev = (table(spark, sf_dir, "events")
              .select(F.expr(f"us DIV {timeseries.US_PER_DAY}")
                      .alias("day_num")))
        mn, mx = ev.agg(F.min("day_num"), F.max("day_num")).first()
        n_types = (table(spark, sf_dir, "events")
                   .select("event_type").distinct().count())
        # dense grid: every (type, day) cell present exactly once
        assert len(rows) == n_types * (mx - mn + 1)
        # count conservation: zero-filled grid still sums to the raw total
        assert (sum(r.n_events for r in rows)
                == table(spark, sf_dir, "events").count())
        # after a type's first observed day, the ffill is never null
        seen = set()
        for r in sorted(rows, key=lambda r: (r.event_type, r.day_num)):
            if r.n_events > 0:
                seen.add(r.event_type)
            if r.event_type in seen:
                assert r.avg_value_ffill is not None

    def test_ewma_is_convex_combination(self, spark, sf_dir):
        rows = (timeseries.q_ewma(spark, sf_dir)
                .orderBy("user_id", "us", "event_id").collect())
        assert rows
        ev = (table(spark, sf_dir, "events")
              .filter(F.col("user_id") < timeseries.EWMA_USERS)
              .orderBy("user_id", "us", "event_id")
              .select("user_id", "value").collect())
        hist: dict[int, list[float]] = {}
        for r, e in zip(rows, ev):
            assert r.user_id == e.user_id
            tail = hist.setdefault(e.user_id, [])
            tail.append(e.value)
            window = tail[-4:]
            lo, hi = min(window), max(window)
            assert lo - 1e-9 <= r.ewma <= hi + 1e-9

    def test_ohlc_single_exchange_for_windows(self, spark, sf_dir):
        # both ROW_NUMBER passes and the aggregate share one hash
        # partitioning on (hr, event_type): exactly one shuffle of the
        # event rows (plus the tiny presentation sort).
        plan = (timeseries.q_resample_ohlc(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        n_hashpart = plan.count("hashpartitioning")
        assert n_hashpart <= 1, plan


class TestWeekdaySeasonality:
    def test_shares_sum_to_week(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            q_weekday_seasonality)
        rows = q_weekday_seasonality(spark, sf_dir).collect()
        by_type = {}
        for r in rows:
            assert 0 <= r.weekday <= 6
            by_type.setdefault(r.event_type, []).append(r)
        for t, rs in by_type.items():
            n_tot = sum(r.n_events for r in rs)
            # weekday shares of one type cover all its events
            assert n_tot > 0 and len(rs) <= 7
            for r in rs:
                exact = r.n_events * 7 * 1000 // n_tot
                assert r.seasonality_permille == exact


class TestMADOutliers:
    def test_ratio_ordering_and_median_bounds(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            MAD_TOP, q_mad_outliers)
        rows = q_mad_outliers(spark, sf_dir).collect()
        assert 0 < len(rows) <= MAD_TOP
        ratios = [r.ratio_x10 for r in rows]
        assert ratios == sorted(ratios, reverse=True)
        for r in rows:
            assert r.dev_cents == abs(r.total_cents - r.med_cents)
            assert r.mad_cents >= 0
            # the reported cells deviate at least as much as the MAD
            assert r.dev_cents >= r.mad_cents


class TestHybridRRF:
    def test_fusion_is_consistent_with_component_ranks(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.ranking import (
            RRF_K, RRF_TOP, q_hybrid_rrf)
        rows = q_hybrid_rrf(spark, sf_dir).collect()
        assert 0 < len(rows) <= RRF_TOP
        for r in rows:
            assert r.rank_tf >= 1 and r.rank_rarity >= 1
            expect = (1000000 // (RRF_K + r.rank_tf)
                      + 1000000 // (RRF_K + r.rank_rarity))
            assert r.rrf_micro == expect
        fused = [r.rrf_micro for r in rows]
        assert fused == sorted(fused, reverse=True)
        # a doc ranked #1 by BOTH rankers must top the fused list
        for r in rows:
            if r.rank_tf == 1 and r.rank_rarity == 1:
                assert r.doc_id == rows[0].doc_id


class TestSeasonalBacktest:
    def test_errors_nonnegative_and_complete(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            BACKTEST_DAYS, q_seasonal_backtest)
        rows = q_seasonal_backtest(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r.n_test_days <= BACKTEST_DAYS
            assert r.seasonal_mae_milli >= 0
            assert r.naive_mae_milli >= 0


class TestBurstiness:
    def test_fano_matches_numpy(self, spark, sf_dir):
        import numpy as np
        from columnar_estimator_sample_spark.operators.timeseries import (
            US_PER_DAY, q_burstiness)
        rows = q_burstiness(spark, sf_dir).collect()
        assert rows
        ev = (table(spark, sf_dir, "events")
              .selectExpr("event_type",
                          f"CAST(us div {US_PER_DAY} AS BIGINT) AS day")
              .groupBy("event_type", "day").count().collect())
        per_type: dict = {}
        for r in ev:
            per_type.setdefault(r.event_type, []).append(r["count"])
        for r in rows:
            xs = np.array(per_type[r.event_type], dtype=np.int64)
            n, t, sx2 = len(xs), int(xs.sum()), int((xs.astype(object)
                                                     ** 2).sum())
            want = (1000 * (n * sx2 - t * t)) // (t * (n - 1))
            assert r.fano_milli == want
            assert r.fano_milli >= 0


class TestHaarLevels:
    def test_lossless_and_energy_bounds(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            q_haar_levels)
        rows = q_haar_levels(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.n_days_used % 4 == 0
            # losslessness: coarse sums reconstruct the exact total
            assert r.coarse_sum == r.total
            # detail energy is bounded by the signal itself
            assert 0 <= r.detail1_abs <= r.total
            assert 0 <= r.detail2_abs <= r.total


class TestCUSUM:
    def test_peak_matches_direct_computation(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            US_PER_DAY, q_cusum_changepoint)
        rows = {r.event_type: r for r in
                q_cusum_changepoint(spark, sf_dir).collect()}
        assert rows
        daily = (table(spark, sf_dir, "events")
                 .selectExpr("event_type",
                             f"CAST(us div {US_PER_DAY} AS BIGINT) AS day")
                 .groupBy("event_type", "day").count().collect())
        series: dict = {}
        for r in daily:
            series.setdefault(r.event_type, {})[r.day] = r["count"]
        for et, by_day in series.items():
            days = sorted(by_day)
            t = sum(by_day.values())
            n = len(days)
            c, best, best_day = 0, -1, None
            for d in days:
                c += by_day[d] * n - t
                if abs(c) > best:
                    best, best_day = abs(c), d
            assert rows[et].change_day == best_day
            assert rows[et].magnitude_permille == (1000 * best) // (t * n)


class TestTailRisk:
    def test_var_and_es_ordering(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            q_tail_risk)
        rows = q_tail_risk(spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        # expected shortfall is at least as severe as the VaR boundary
        assert r.es_cents <= r.var_cents
        assert r.n_days >= 1


class TestRollingZScore:
    def test_flags_verify_against_direct_computation(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.timeseries import (
            US_PER_DAY, Z_K2, Z_WIN, q_rolling_zscore)
        rows = q_rolling_zscore(spark, sf_dir).collect()
        daily = (table(spark, sf_dir, "events")
                 .selectExpr("event_type",
                             f"CAST(us div {US_PER_DAY} AS BIGINT) AS day")
                 .groupBy("event_type", "day").count().collect())
        series: dict = {}
        for r in daily:
            series.setdefault(r.event_type, {})[r.day] = r["count"]
        flagged = {(r.event_type, r.day) for r in rows}
        for et, by_day in series.items():
            days = sorted(by_day)
            for i, d in enumerate(days):
                win = days[max(0, i - Z_WIN):i]
                if len(win) < 3:
                    continue
                xs = [by_day[v] for v in win]
                n, s = len(xs), sum(xs)
                s2 = sum(v * v for v in xs)
                x = by_day[d]
                want = (n * x - s) ** 2 > Z_K2 * (n * s2 - s * s)
                assert ((et, d) in flagged) == want, (et, d)


class TestOLSTrend:
    def test_matches_numpy_polyfit(self, spark, sf_dir):
        """The integer-rational slope/intercept/r2 must agree with a
        float OLS fit to within the milli-unit floor rounding."""
        import numpy as np
        from pyspark.sql import functions as F2
        from columnar_estimator_sample_spark.operators.events import (
            US_PER_DAY)
        from columnar_estimator_sample_spark.operators.timeseries import (
            q_ols_trend)
        from columnar_estimator_sample_spark.sources.tables import table
        rows = q_ols_trend(spark, sf_dir).collect()
        assert rows
        daily = (table(spark, sf_dir, "events")
                 .select("event_type",
                         F2.expr(f"CAST(us div {US_PER_DAY} AS BIGINT)")
                         .alias("day"))
                 .groupBy("event_type", "day").count().collect())
        series: dict = {}
        for r in daily:
            series.setdefault(r.event_type, []).append((r.day, r["count"]))
        for r in rows:
            pts = sorted(series[r.event_type])
            x = np.array([d for d, _ in pts], dtype=float)
            x -= x.min()
            y = np.array([c for _, c in pts], dtype=float)
            slope, intercept = np.polyfit(x, y, 1)
            assert abs(r.slope_milli - 1000 * slope) <= 1.5
            assert abs(r.intercept_milli - 1000 * intercept) <= 1.5
            cc = np.corrcoef(x, y)[0, 1]
            assert abs(r.r2_permille - 1000 * cc * cc) <= 1.5
