"""Round-14 additions: deterministic twins for the (former) rows-only
duo, and the sketch-guarantee predicates they rest on."""

from __future__ import annotations

import pyspark.sql.functions as F


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
