"""Physical-plan shape tests: the scale claims, asserted.

Each operator's docstring makes claims about its 100 TB behavior
(broadcasts, shuffle counts, pushdown, pruning, top-k). These tests pin
them against the actual executed plan so a regression (lost broadcast,
un-pushed filter, widened scan) fails CI rather than surfacing as a 10×
slowdown on a cluster.
"""

from __future__ import annotations

import re

import pytest

from columnar_estimator_sample_spark.registry import queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    df = queries()[name](spark, SF)
    df.collect()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE plan strings append the discarded "Initial Plan" — count only
    # what actually ran
    return plan.split("== Initial Plan ==")[0]


def n_shuffles(plan: str) -> int:
    return (plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition"))


def scan_widths(plan: str) -> list[int]:
    return [len(s.split(",")) for s in
            re.findall(r"ReadSchema: struct<([^>]*)>", plan) if s]


class TestPlanShapes:
    def test_q03_broadcasts_dims_and_topk(self, spark):
        plan = plan_of(spark, "q03_shipping_priority")
        assert plan.count("BroadcastExchange") >= 1
        assert "TakeOrderedAndProject" in plan  # top-k, no global sort
        assert n_shuffles(plan) <= 2  # only the fact-fact join + agg

    def test_q05_star_join_broadcasts_all_dims(self, spark):
        plan = plan_of(spark, "q05_regional_revenue")
        # region/nation/customer/supplier all broadcast: only lineitem???
        # orders shuffle remains
        assert plan.count("BroadcastExchange") >= 4
        assert n_shuffles(plan) <= 3

    def test_q01_filter_pushdown(self, spark):
        plan = plan_of(spark, "q01_pricing_summary")
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan

    def test_single_column_probe_prunes_scan(self, spark):
        plan = plan_of(spark, "q_single_column_probe")
        widths = scan_widths(plan)
        assert widths and max(widths) == 1  # 1 of 11 lineitem columns read

    def test_join_scans_are_pruned(self, spark):
        plan = plan_of(spark, "q10_top_customers")
        widths = scan_widths(plan)
        assert widths and max(widths) <= 4  # no full-width scans anywhere

    def test_sessionize_single_user_shuffle(self, spark):
        plan = plan_of(spark, "q_sessionize")
        # both window passes + the session aggregation reuse ONE
        # hashpartitioning(user_id) exchange; the trailing range exchange
        # is the output orderBy
        assert plan.count("Exchange hashpartitioning") == 1

    def test_semi_join_stays_semi(self, spark):
        plan = plan_of(spark, "q_semi_join")
        assert "LeftSemi" in plan

    def test_anti_join_stays_anti(self, spark):
        plan = plan_of(spark, "q_anti_join")
        assert "LeftAnti" in plan

    def test_minhash_band_join_narrow_shuffle(self, spark):
        plan = plan_of(spark, "q_dedup_minhash_lsh")
        # the band self-join must not shuffle the shingles arrays: no
        # exchange whose output carries the `shingles` column
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "shingles" not in m.group(1)

    def test_prefix_filter_narrow_shuffles(self, spark):
        """The set-similarity join must never shuffle document text
        through the candidate/verification stages: the only exchange
        allowed to carry `text` is the census fingerprint window
        (hashpartitioning on fp), and the plan has no cartesian
        product. Token exchanges carry the 8-byte hash, not strings."""
        plan = plan_of(spark, "q_dedup_prefix_filter")
        assert "CartesianProduct" not in plan
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)",
                             plan):
            keys = m.group(1)
            if "text" in keys:
                # only legal as part of the fp census partitioning
                assert "fp" in keys
        # the candidate and verification joins key on the token hash
        assert "h#" in plan or "h64" in plan.lower() or "conv(" in plan

    def test_whole_stage_codegen_everywhere(self, spark):
        # every headline relational query keeps its core in codegen
        for q in ["q01_pricing_summary", "q_time_buckets",
                  "q_text_quality"]:
            plan = plan_of(spark, q)
            # codegen'd operators carry the "*(n)" stage prefix
            assert plan.count("*(") >= 1, q


class TestAQEAndStats:
    def test_aqe_enabled(self, spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"

    def test_broadcast_hint_survives(self, spark):
        from columnar_estimator_sample_spark.sources.tables import table
        import pyspark.sql.functions as F
        li = table(spark, SF, "lineitem")
        nation = table(spark, SF, "nation")
        cust = table(spark, SF, "customer")
        j = (li.join(cust, li.l_orderkey % 1500 == cust.c_custkey)
             .join(F.broadcast(nation),
                   cust.c_nationkey == nation.n_nationkey))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestProfiler:
    def test_collect_plan_metrics_reports_real_operators(self, spark, sf_dir):
        import pyspark.sql.functions as F
        from columnar_estimator_sample_spark.plans.profiler import (
            collect_plan_metrics,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        df = (table(spark, sf_dir, "lineitem")
              .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))
        recs = collect_plan_metrics(df)
        ops = [r["op"] for r in recs]
        assert any("HashAggregate" in o for o in ops)
        assert any("Scan" in o for o in ops)
        # actual task metrics present: the final agg counted its output rows
        agg = next(r for r in recs if "HashAggregate" in r["op"])
        assert agg["metrics"]["numOutputRows"][1] >= 1

    def test_dogfood_trace_loop(self, spark, sf_dir, tmp_path):
        """Profile a query, write the reference-shaped timeline, analyze
        it with the engine's OWN flatten->agg->top-k pipeline, and find
        the profiled operators in the result (trainer.py:361-381 loop)."""
        import pyspark.sql.functions as F
        from columnar_estimator_sample_spark.plans.profiler import (
            profile_to_top_ops,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        df = (table(spark, sf_dir, "lineitem")
              .join(table(spark, sf_dir, "orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q")))
        top = profile_to_top_ops(spark, df, str(tmp_path / "timeline.json"))
        names = {r["arg_name"] for r in top.collect()}
        assert any("HashAggregate" in n for n in names)
        assert any("Join" in n for n in names)
        # schema matches the trace-analytics contract
        assert set(top.columns) == {"arg_name", "total_dur", "avg_dur",
                                    "min_dur", "max_dur"}


class TestCBOJoinReorder:
    def test_stats_change_join_order(self, spark, sf_dir):
        """The north-star claim, pinned: ANALYZE'd statistics + CBO must
        actually change the optimized join order of a 3-way join — the
        selective filtered dimension is joined before the wide fact-fact
        join once the optimizer can see row counts."""
        import re
        from columnar_estimator_sample_spark.plans.stats import (
            analyze_tables,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        sources = {"cbo_li": ("lineitem", ["l_orderkey", "l_suppkey",
                                           "l_quantity"]),
                   "cbo_ord": ("orders", ["o_orderkey", "o_custkey"]),
                   "cbo_sup": ("supplier", ["s_suppkey", "s_nationkey"])}
        for name, (src, cols) in sources.items():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (table(spark, sf_dir, src)
             .select(*cols).write.mode("overwrite").saveAsTable(name))
        sql = """
            SELECT COUNT(*) AS n
            FROM cbo_li l
            JOIN cbo_ord o ON l.l_orderkey = o.o_orderkey
            JOIN cbo_sup s ON l.l_suppkey = s.s_suppkey
            WHERE s.s_nationkey = 3
        """

        def join_order(plan: str) -> list[str]:
            return re.findall(r"cbo_(\w+)", plan)

        try:
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
            p_off = (spark.sql(sql)._jdf.queryExecution()
                     .optimizedPlan().toString())
            analyze_tables(spark, ["cbo_li", "cbo_ord", "cbo_sup"])
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
            p_on = (spark.sql(sql)._jdf.queryExecution()
                    .optimizedPlan().toString())
            assert join_order(p_off) == ["li", "ord", "sup"]  # as written
            # reordered: the selective supplier join now precedes orders
            assert join_order(p_on) == ["li", "sup", "ord"]
            # and the answer is identical either way
            assert (spark.sql(sql).collect()[0]["n"]
                    == spark.sql(sql).collect()[0]["n"])
        finally:
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
            for t in ["cbo_li", "cbo_ord", "cbo_sup"]:
                spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestRuntimeBloomFilter:
    """Runtime row-level filtering: a selective dimension predicate is
    turned into a bloom filter probed by the fact-side scan — at 100 TB
    this prunes shuffle input by orders of magnitude when the dim filter
    is selective. Thresholds are lowered because the trigger sizes are
    tuned for cluster-scale inputs (application side >= 10 GB)."""

    def test_selective_dim_injects_bloom_filter(self, spark, sf_dir):
        from columnar_estimator_sample_spark.sources.tables import table
        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
                "100MB",
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            li = table(spark, sf_dir, "lineitem")
            orders = (table(spark, sf_dir, "orders")
                      .filter("o_orderpriority = '1-URGENT'"))
            q = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
                "o_orderpriority").count()
            plan = q._jdf.queryExecution().optimizedPlan().toString()
            # fact side probes the dim-derived filter before the shuffle
            assert "might_contain" in plan
            assert "bloom_filter_agg" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestRound3PlanShapes:
    def test_kmv_uses_partial_topk(self, spark):
        """K-smallest selection must plan as TakeOrderedAndProject
        (per-partition partial top-K), never a global sort."""
        plan = plan_of(spark, "q_kmv_distinct")
        assert plan.count("TakeOrderedAndProject") >= 3  # s1, s2, union
        assert "Sort [h" not in plan.replace(
            "TakeOrderedAndProject", "")

    def test_item_cf_no_cartesian_and_broadcast_prune(self, spark):
        """Pair mining joins on the orderkey; the frequent-item prune is
        broadcast. No cartesian anywhere."""
        plan = plan_of(spark, "q_item_cf")
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastExchange") >= 2  # fa and fb prunes

    def test_join_size_sketch_joins_are_hash(self, spark):
        """The 1024-row sketch inner product must be a hash join on
        (row, bucket); the only nested-loop is the 1-row exact frame
        broadcast."""
        plan = plan_of(spark, "q_join_size_estimate")
        assert "CartesianProduct" not in plan
        assert ("BroadcastHashJoin" in plan
                or "SortMergeJoin" in plan
                or "ShuffledHashJoin" in plan)

    def test_quantile_sketch_aggregates_before_windows(self, spark):
        """Cumulative walk runs on the 20-row bin table: the plan's
        window sits above a hash aggregate, and the scan reads only the
        price column."""
        plan = plan_of(spark, "q_quantile_sketch")
        assert "HashAggregate" in plan and "Window" in plan
        assert min(scan_widths(plan)) == 1  # l_extendedprice only

    def test_media_dedup_shuffles_digests_not_blobs(self, spark):
        """The digest aggregate must not carry the payload column
        through the exchange."""
        plan = plan_of(spark, "q_media_dedup")
        ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
        assert ex_lines  # there is a shuffle (digest-keyed aggregate)
        # every exchange partitions on derived narrow keys, never the blob
        for ln in ex_lines:
            assert "payload" not in ln
        # digest computation happens below the exchange (map-side)
        assert "md5(payload" in plan
