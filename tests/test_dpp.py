"""Dynamic partition pruning: the runtime star-schema scan skip.

At 100 TB the fact table is date/key-partitioned and most queries touch a
handful of partitions selected by a DIMENSION predicate — static pruning
can't see through the join, so Spark inserts a runtime subquery
(`dynamicpruningexpression`) into the fact scan's PartitionFilters, built
from the broadcast dimension. This file pins that the engine's layout +
session config actually produce that plan, and that the pruned result is
exactly the statically-filtered one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from columnar_estimator_sample_spark.sources.tables import table


class TestDynamicPartitionPruning:
    def test_fact_scan_prunes_via_dim_filter(self, spark, sf_dir, tmp_path):
        li = table(spark, sf_dir, "lineitem").withColumn(
            "ship_month", F.month("l_shipdate"))
        path = str(tmp_path / "li_by_month")
        li.write.partitionBy("ship_month").parquet(path)
        fact = spark.read.parquet(path)
        months = spark.createDataFrame(
            [(m, "peak") for m in range(1, 13)], "m INT, tag STRING")
        dim = months.filter(F.col("m").isin(11, 12))
        j = (fact.join(dim, fact.ship_month == dim.m)
             .agg(F.count("*").alias("n"),
                  F.sum("l_quantity").alias("qty")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]

        # pruned result == statically filtered result
        got = j.collect()[0]
        want = (fact.filter(F.col("ship_month").isin(11, 12))
                .agg(F.count("*").alias("n"),
                     F.sum("l_quantity").alias("qty")).collect()[0])
        assert got.n == want.n and got.qty == want.qty

    def test_no_pruning_without_dim_filter(self, spark, sf_dir, tmp_path):
        """Control: an unfiltered dimension gives Catalyst nothing to
        prune with — the subquery filter must not appear (guards against
        the assertion above passing vacuously on plan-text noise)."""
        li = table(spark, sf_dir, "lineitem").withColumn(
            "ship_month", F.month("l_shipdate"))
        path = str(tmp_path / "li_by_month_all")
        li.write.partitionBy("ship_month").parquet(path)
        fact = spark.read.parquet(path)
        months = spark.createDataFrame(
            [(m, "t") for m in range(1, 13)], "m INT, tag STRING")
        j = (fact.join(months, fact.ship_month == months.m)
             .agg(F.count("*").alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" not in plan.lower()


class TestRuntimeBloomFilter:
    def test_selective_dim_injects_bloom_on_fact_scan(self, spark, sf_dir):
        """Runtime row-level Bloom filter: for shuffle joins on
        NON-partition columns, Spark builds a Bloom filter from the
        filtered build side and pushes `might_contain` into the fact
        scan — the row-level sibling of dynamic partition pruning. The
        application-side threshold defaults to 10 GB (it exists to keep
        tiny scans filter-free); at 100 TB any fact scan clears it, and
        the local-scale test lowers it to observe the injected plan."""
        from pyspark.sql import functions as F
        li = table(spark, sf_dir, "lineitem")
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        old_thresh = spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold")
        old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter"
                ".applicationSideScanSizeThreshold", "0")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                 .agg(F.count("*").alias("n")))
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter_agg" in plan
            assert "might_contain" in plan
            n_filtered = j.collect()[0].n
        finally:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter"
                ".applicationSideScanSizeThreshold", old_thresh)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           old_bcast)
        # the Bloom filter is a pure pre-filter: result must be identical
        j2 = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .agg(F.count("*").alias("n")))
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" not in plan2
        assert j2.collect()[0].n == n_filtered
