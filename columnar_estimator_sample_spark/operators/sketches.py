"""Count-min sketch: sublinear frequency estimation over a token stream.

The reference's statistics surface is exact/HLL distinct counts feeding
its vocab_size catalog (/root/reference/trainer.py:91-118). A 100 TB
corpus also needs FREQUENCY sketches: a count-min sketch answers "how
often does token t occur" in O(d*w) memory regardless of stream size,
with one-sided error (estimates never undercount). Like the engine's
MinHash/SimHash tiers, the sketch is built relationally — counters are a
(row, bucket) hash aggregate, mergeable across partitions/streams by
plain addition, which is exactly how Spark's map-side partials combine
them for free.

Exactness contract: the hash functions are the portable md5-based
universal family (functions/hashing.py) with literal (a, b)
coefficients, so the DuckDB oracle reproduces the identical sketch bit
for bit — the driver gate checks the ESTIMATES, not just the exact
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.functions.hashing import (
    MERSENNE_P, h64, minhash_params, sql_h64)
from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table

CM_D = 4         # sketch depth (independent hash rows)
CM_W = 256       # sketch width (buckets per row)
CM_TOP = 15      # report: top-k tokens by exact count
_A, _B = minhash_params(CM_D, seed=13)


def _cm_oracle() -> str:
    placed = "\n        UNION ALL\n".join(
        f"        SELECT tok, c, {i} AS row,"
        f" (({_A[i]} * x + {_B[i]}) % {MERSENNE_P}) % {CM_W} AS bucket"
        f" FROM vx"
        for i in range(CM_D))
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    t AS (SELECT tok FROM toks WHERE len(tok) > 0),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY tok),
    vx AS (SELECT tok, c, {sql_h64('tok')} % {MERSENNE_P} AS x FROM vocab),
    placed AS (
{placed}
    ),
    counters AS (
        SELECT row, bucket, CAST(SUM(c) AS BIGINT) AS cnt
        FROM placed GROUP BY 1, 2
    )
    SELECT p.tok, p.c AS exact_n, MIN(ct.cnt) AS est_n,
           MIN(ct.cnt) - p.c AS overcount
    FROM placed p JOIN counters ct USING (row, bucket)
    GROUP BY p.tok, p.c
    ORDER BY exact_n DESC, tok
    LIMIT {CM_TOP}
    """


@register("q_countmin_hh", oracle=_cm_oracle())
def q_countmin_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a d=4 x w=256 count-min sketch over the
    document token stream, reported against exact ground truth: for the
    top tokens by true count, the sketch estimate (min over d counter
    rows) and its overcount (>= 0 always — CM never underestimates).

    Scale: token counts collapse to vocabulary size first, the sketch is
    a (d x w)-row aggregate built FROM the vocab table (identical
    counters to streaming the raw tokens, since addition commutes), and
    the estimate join touches d rows per token. At 100 TB the counters
    table is 1024 rows regardless of corpus size and merges across
    sources/streams by addition."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.length("tok") > 0))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vx = vocab.withColumn("x", h64(F.col("tok")) % MERSENNE_P)
    rows = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            (((F.lit(_A[i]) * F.col("x") + F.lit(_B[i])) % MERSENNE_P)
             % CM_W).alias("bucket"))
        for i in range(CM_D)])
    placed = (vx.select("tok", "c", F.explode(rows).alias("rb"))
              .select("tok", "c", F.col("rb.row").alias("row"),
                      F.col("rb.bucket").alias("bucket")))
    counters = (placed.groupBy("row", "bucket")
                .agg(F.sum("c").cast("long").alias("cnt")))
    return (placed.join(counters, ["row", "bucket"])
            .groupBy("tok", F.col("c").alias("exact_n"))
            .agg(F.min("cnt").alias("est_n"))
            .withColumn("overcount", F.col("est_n") - F.col("exact_n"))
            .orderBy(F.desc("exact_n"), "tok")
            .limit(CM_TOP))
