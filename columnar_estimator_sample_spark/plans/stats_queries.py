"""Oracle-checked queries for the statistics module.

The catalog itself (plans/stats.py) is API, not a query; what the
differential gate can verify is the *exact* NDV ground truth the sketches
approximate, expressed as a relational query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table

# (table, column) pairs mirroring the reference's vocab_size catalog role:
# the distinct-count-per-categorical-column inventory (trainer.py:91-118).
_NDV_COLUMNS = [
    ("customer", "c_mktsegment"),
    ("customer", "c_nationkey"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("part", "p_brand"),
    ("part", "p_type"),
    ("nation", "n_name"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
]


@register(
    "q_ndv_catalog",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, '{c}' AS column_name,"
        f" COUNT(DISTINCT {c}) AS ndv, COUNT(*) AS n_rows FROM {t}"
        for t, c in _NDV_COLUMNS
    ) + "\nORDER BY table_name, column_name",
)
def q_ndv_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NDV catalog over the categorical columns of the testdata —
    the ground truth that ``plans.stats.ndv_catalog`` (HLL++) estimates
    and that feeds hash-bucket sizing (NDV*5) and Catalyst CBO."""
    parts = []
    for t, c in _NDV_COLUMNS:
        parts.append(
            table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.countDistinct(c).alias("ndv"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("table_name", "column_name")
