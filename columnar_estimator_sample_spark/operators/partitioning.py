"""Partitioning, bucketing, and skew tooling — the shuffle-economics
toolkit for 100 TB operation.

The reference hand-tunes scan parallelism with reader threads and file
interleaving (/root/reference/trainer.py:216-238); on Spark the levers
are partitioning strategy, bucketing, and salting. These helpers make
each lever explicit and testable:

  * :func:`bucketed_ctas` — persist a table bucketed+sorted on its join
    key; two tables bucketed the same way join with ZERO exchange (the
    co-located join that replaces the per-query shuffle with a one-time
    layout cost — the dominant optimization for repeated fact-fact joins).
  * :func:`salted_join` — explode a hot build side into ``n_salts``
    replicas and scatter the probe side, so one pathological key spreads
    over n tasks instead of stalling one straggler. AQE's skew-join
    handles moderate skew automatically; salting is the deterministic
    fallback for the extreme case.
  * :func:`repartition_for` — explicit co-partitioning of two frames
    before a merge-heavy operation, reusing one exchange across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketed_ctas(spark: SparkSession, name: str, df: DataFrame,
                  bucket_col: str, n_buckets: int = 16) -> DataFrame:
    """Persist ``df`` bucketed and sorted by ``bucket_col``. Joins between
    tables bucketed identically on the join key skip both the exchange
    and (with sortBy) the sort."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, bucket_col)
     .sortBy(bucket_col)
     .saveAsTable(name))
    return spark.table(name)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: replicate the small side ``n_salts``
    times, scatter the big side uniformly by a PER-ROW salt, join on
    (key, salt). Output columns = big's columns + small's non-key columns.

    The salt must be independent of the join key — a key-derived salt
    sends every row of a hot key to the same (key, salt) task and spreads
    nothing. ``monotonically_increasing_id`` is per-row (partition id in
    the high bits, row index in the low bits), so a hot key's rows land on
    all ``n_salts`` replicas.

    Only inner/left joins are supported: for right/full joins the
    unmatched small-side rows would surface once per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(outer small-side rows would duplicate per salt replica)")
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    salted_big = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(),
                         F.lit(n_salts)).cast("int"))
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def repartition_for(a: DataFrame, b: DataFrame, key: str,
                    n_partitions: int | None = None)\
        -> tuple[DataFrame, DataFrame]:
    """Co-partition two frames on the same key (and count) so the
    subsequent join/cogroup reuses one exchange per side across stages."""
    if n_partitions:
        return (a.repartition(n_partitions, key),
                b.repartition(n_partitions, key))
    return a.repartition(key), b.repartition(key)


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-skew diagnostic: per-key row counts of the heaviest keys plus
    their share of the table — what you check BEFORE choosing between AQE
    skew-join and explicit salting."""
    total = df.count()
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("share", F.col("n_rows") / F.lit(float(total)))
            .orderBy(F.desc("n_rows"), F.asc(key))
            .limit(top))
