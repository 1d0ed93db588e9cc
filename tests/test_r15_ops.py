"""Round-15 optimization internals: conf pins, miner dedup keying,
packed-kernel guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F


class TestConfPins:
    """registry._with_conf_pins: a pinned query's build sets its conf,
    and the next (un-pinned) build restores the session default — pins
    can never leak across queries."""

    FLOOR = "spark.sql.adaptive.coalescePartitions.minPartitionSize"

    def test_pin_applies_and_resets(self, spark, sf_dir):
        import __spark_entry__ as entrymod
        from columnar_estimator_sample_spark import registry

        qs = entrymod.queries()
        assert "q01_pricing_summary" in registry._QUERY_CONF_PINS
        qs["q01_pricing_summary"](spark, sf_dir)
        assert spark.conf.get(self.FLOOR) == "1m"
        # a registered query without a pin restores the default
        assert "q03_shipping_priority" not in registry._QUERY_CONF_PINS
        qs["q03_shipping_priority"](spark, sf_dir)
        assert spark.conf.get(self.FLOOR) == \
            registry._default_confs()[self.FLOOR]

    def test_pins_are_registered_names(self):
        import __spark_entry__ as entrymod
        from columnar_estimator_sample_spark import registry

        qs = entrymod.queries()
        missing = [n for n in registry._QUERY_CONF_PINS if n not in qs]
        assert missing == []


class TestDedupItems:
    """basket.dedup_items: the ok-keyed repartition + dropDuplicates is
    set-identical to the old (ok, pk)-keyed dedup."""

    def test_distinct_set(self, spark):
        from columnar_estimator_sample_spark.operators.basket import (
            dedup_items,
        )
        li = spark.createDataFrame(
            [(1, 10), (1, 10), (1, 11), (2, 10), (2, 10), (3, 12)],
            "ok long, pk long")
        got = sorted((r.ok, r.pk) for r in dedup_items(li).collect())
        assert got == [(1, 10), (1, 11), (2, 10), (3, 12)]

    def test_basket_groupby_reuses_partitioning(self, spark):
        """The whole point of keying the dedup by ok: collect_list by ok
        must NOT add an exchange above the dedup aggregate."""
        from columnar_estimator_sample_spark.operators.basket import (
            dedup_items,
        )
        li = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 10)], "ok long, pk long")
        plan = (dedup_items(li).groupBy("ok")
                .agg(F.sort_array(F.collect_list("pk")))
                ._jdf.queryExecution().executedPlan().toString())
        # exactly one exchange: the explicit repartition(ok); the dedup
        # aggregate and the basket aggregate both ride it
        assert plan.count("Exchange ") == 1, plan


class TestListMatrixEmptyBatch:
    def test_raises_loudly(self):
        from columnar_estimator_sample_spark.operators.similarity import (
            _list_matrix,
        )
        col = pa.array([], type=pa.list_(pa.int64()))
        chunk = col.combine_chunks() if hasattr(col, "combine_chunks") \
            else col
        with pytest.raises(ValueError, match="empty batch"):
            _list_matrix(chunk, np)
