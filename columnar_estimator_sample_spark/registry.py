"""Query/operator registry.

The reference dispatches pipeline builders and entry functions *by name*
(`getattr(sys.modules[__name__], ARGS.dataset_function)`,
/root/reference/trainer.py:181-182,515). This module is the engine's
equivalent: a declarative registry mapping a query name to

  * a PySpark implementation ``(spark, sf_dir) -> DataFrame``, and
  * (where SQL-expressible) a DuckDB oracle SQL string over the same
    parquet tables, used by the driver's differential-correctness gate.

``__spark_entry__.py`` re-exports ``queries()`` / ``oracle_sql()`` from
here.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import. Kept explicit so a broken
# optional module can't silently drop the whole registry.
_OPERATOR_MODULES = [
    "columnar_estimator_sample_spark.operators.relational",
    "columnar_estimator_sample_spark.operators.relational2",
    "columnar_estimator_sample_spark.operators.relational3",
    "columnar_estimator_sample_spark.operators.relational4",
    "columnar_estimator_sample_spark.operators.flatten",
    "columnar_estimator_sample_spark.operators.events",
    "columnar_estimator_sample_spark.operators.dedup",
    "columnar_estimator_sample_spark.operators.graph",
    "columnar_estimator_sample_spark.operators.pipeline",
    "columnar_estimator_sample_spark.operators.merge",
    "columnar_estimator_sample_spark.operators.similarity",
    "columnar_estimator_sample_spark.operators.textstats",
    "columnar_estimator_sample_spark.operators.ranking",
    "columnar_estimator_sample_spark.operators.timeseries",
    "columnar_estimator_sample_spark.operators.quality",
    "columnar_estimator_sample_spark.operators.basket",
    "columnar_estimator_sample_spark.operators.sketches",
    "columnar_estimator_sample_spark.operators.corpus",
    "columnar_estimator_sample_spark.operators.vq",
    "columnar_estimator_sample_spark.operators.multimodal",
    "columnar_estimator_sample_spark.operators.partitioning",
    "columnar_estimator_sample_spark.operators.features",
    "columnar_estimator_sample_spark.plans.stats_queries",
    "columnar_estimator_sample_spark.sources.tfrecord",
    "columnar_estimator_sample_spark.operators.geo",
]

_loaded = False


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a query under ``name`` with an optional DuckDB
    oracle SQL twin. Column aliases MUST match between the two."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    # Mark loaded only after every module imported: a failing import must
    # propagate on EVERY call, not silently yield a partial registry on the
    # second one.
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
