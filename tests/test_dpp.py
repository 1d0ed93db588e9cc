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
