"""Merge / upsert: SQL MERGE semantics expressed engine-level.

The reference's only write path is CTAS (README.md:177,196-198); a
warehouse that serves a training pipeline also needs the incremental
path: apply a corrections/arrivals feed onto a large fact table —
UPDATE matched keys, INSERT unmatched ones, keep the rest.

Spark-first shape: MERGE is a full-outer join on the key with
column-wise ``coalesce(source, target)``. With a table format (Delta /
Iceberg) the same statement is `MERGE INTO`; expressing it as a join
keeps the semantics engine-checkable here and is exactly what those
formats execute underneath.

Scale: the target side is 100 TB — the join shuffles on the merge key
unless the layout already provides it (bucketed/storage-partitioned
table → zero-exchange sort-merge; see operators/partitioning.py). A
corrections feed is usually ≪ target and broadcastable, BUT a broadcast
full-outer can't skip unmatched-target rows, so the right plan is
shuffle-on-key with AQE handling skew; copy-on-write table formats then
rewrite only the files containing matched keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.functions.exact import dsum, sql_dsum
from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table

UPDATE_MOD = 97    # orders with key % 97 == 0 get a price correction
INSERT_MOD = 101   # orders with key % 101 == 0 spawn a new late arrival
INSERT_OFFSET = 100_000_000


def merge_upsert(target: DataFrame, source: DataFrame,
                 keys: list[str]) -> DataFrame:
    """MERGE: rows of ``source`` overwrite matching ``keys`` in ``target``
    (all non-key columns), unmatched source rows are inserted, unmatched
    target rows pass through. Schemas must match."""
    assert target.columns == source.columns, "merge requires aligned schemas"
    t = target.alias("t")
    s = source.alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    cols = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*cols)


@register(
    "q_merge_upsert",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice, o_orderdate,
               o_orderpriority
        FROM orders WHERE o_orderkey % {UPDATE_MOD} = 0
        UNION ALL
        SELECT o_orderkey + {INSERT_OFFSET}, o_custkey, 'N',
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % {INSERT_MOD} = 0
    ), merged AS (
        SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
               COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice
        FROM orders t
        FULL JOIN src s ON s.o_orderkey = t.o_orderkey
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_price", 6)}
    FROM merged
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a deterministic corrections feed onto ``orders`` with MERGE
    semantics and audit the result per order status: updated keys land in
    status 'R' with a 10% price correction, late arrivals insert as 'N',
    everything else passes through unchanged."""
    orders = table(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % UPDATE_MOD == 0)
        .select(
            "o_orderkey", "o_custkey",
            F.lit("R").alias("o_orderstatus"),
            (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority"))
    inserts = (
        orders.filter(F.col("o_orderkey") % INSERT_MOD == 0)
        .select(
            (F.col("o_orderkey") + INSERT_OFFSET).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice", "o_orderdate", "o_orderpriority"))
    merged = merge_upsert(orders, updates.unionAll(inserts), ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice"), "total_price", 6))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC between two table versions)
# ---------------------------------------------------------------------------

DIFF_CUTOFF = "1997-07-01 00:00:00"   # v1 = orders strictly before this
DIFF_UPDATE_MOD = 50                  # v2 bumps price on key % 50 == 0
DIFF_DELETE_MOD = 997                 # v2 drops key % 997 == 0 (GDPR purge)


@register(
    "q_snapshot_diff",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderdate < TIMESTAMP '{DIFF_CUTOFF}'
    ), v2 AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DECIMAL(12,2))
                   + CASE WHEN o_orderkey % {DIFF_UPDATE_MOD} = 0
                          THEN CAST('1.00' AS DECIMAL(12,2))
                          ELSE CAST('0.00' AS DECIMAL(12,2)) END
                   AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % {DIFF_DELETE_MOD} <> 0
    ), j AS (
        SELECT v1.o_orderkey AS k1, v2.o_orderkey AS k2,
               CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                    WHEN v2.o_orderkey IS NULL THEN 'delete'
                    WHEN md5(CAST(v1.o_totalprice AS VARCHAR)
                             || '|' || v1.o_orderstatus)
                      <> md5(CAST(v2.o_totalprice AS VARCHAR)
                             || '|' || v2.o_orderstatus)
                         THEN 'update'
                    ELSE 'unchanged' END AS change_type
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(COALESCE(k2, k1)) AS BIGINT) AS min_key,
           CAST(MAX(COALESCE(k2, k1)) AS BIGINT) AS max_key
    FROM j
    GROUP BY change_type
    ORDER BY change_type
    """)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of the orders table
    (v1 = a historical cut, v2 = current with a deterministic price
    correction on 2% of keys and a small key purge): a full-outer join on the primary key
    classifies every row as insert / delete / update / unchanged, with
    updates detected by comparing ROW FINGERPRINTS (md5 over the
    canonicalized payload) instead of column-by-column predicates — the
    O(1)-column-count comparison a snapshot-diff service runs to emit a
    change feed from table-format versions (Delta CDF / Iceberg
    changelog compute exactly this when no log was kept).

    Scale: both sides shuffle once on the key (or zero-exchange when
    the table is bucketed on it, operators/partitioning.py); the
    fingerprint collapses arbitrarily wide payloads to one 128-bit
    compare, and the census aggregate is combiner-friendly. Decimal
    canonicalization keeps the fingerprint text identical across
    engines."""
    orders = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    v1 = (orders.filter(
        F.col("o_orderdate") < F.lit(DIFF_CUTOFF).cast("timestamp_ntz"))
        .select("o_orderkey", price.alias("o_totalprice"),
                "o_orderstatus"))
    bump = (F.when(F.col("o_orderkey") % DIFF_UPDATE_MOD == 0,
                   F.lit("1.00").cast("decimal(12,2)"))
            .otherwise(F.lit("0.00").cast("decimal(12,2)")))
    v2 = (orders.filter(F.col("o_orderkey") % DIFF_DELETE_MOD != 0)
          .select("o_orderkey", (price + bump).cast("decimal(12,2)")
                  .alias("o_totalprice"), "o_orderstatus"))

    def fp(side: str) -> F.Column:
        return F.md5(F.concat(
            F.col(f"{side}.o_totalprice").cast("string"),
            F.lit("|"), F.col(f"{side}.o_orderstatus")))

    j = (v1.alias("a").join(v2.alias("b"),
                            F.col("a.o_orderkey") == F.col("b.o_orderkey"),
                            "full_outer")
         .select(
             F.col("a.o_orderkey").alias("k1"),
             F.col("b.o_orderkey").alias("k2"),
             F.when(F.col("a.o_orderkey").isNull(), "insert")
             .when(F.col("b.o_orderkey").isNull(), "delete")
             .when(fp("a") != fp("b"), "update")
             .otherwise("unchanged").alias("change_type")))
    return (j.groupBy("change_type")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.min(F.coalesce("k2", "k1")).cast("long")
                 .alias("min_key"),
                 F.max(F.coalesce("k2", "k1")).cast("long")
                 .alias("max_key"))
            .orderBy("change_type"))
