"""Streaming corpus ingestion: the batch corpus-prep funnel
(operators/pipeline.q_corpus_prep_pipeline) as a Structured Streaming
pipeline — documents arrive as files, pass the quality gate, are
exact-deduplicated against everything seen so far, and feed a running
per-language admission ledger.

This is the online half of the incremental-ingest story
(operators/dedup.q_dedup_incremental is the batch-vs-corpus sketch
check): a crawl drop lands in object storage, the file source picks it
up, and the ledger advances without rescanning history.

State sizing at 100 TB: the dedup state holds one md5 digest per
admitted document (16 bytes + key overhead; ~10⁹ docs ≈ tens of GB
across the cluster — the standard budget for streaming exact dedup). A
production deployment ages digests out with a watermark on ingest time;
the documents fixture carries no timestamp, so the test drains with
availableNow and bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.operators.pipeline import (
    MIN_STOP_DEN, MIN_STOP_NUM, MIN_TOKENS, STOPWORDS,
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table as a file stream (one parquet file per
    micro-batch unit)."""
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def _gated(docs: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    sw = F.array([F.lit(s) for s in STOPWORDS])
    stop_hits = (F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
                 .cast("long"))
    return (docs
            .withColumn("n_tokens", F.size(toks))
            .withColumn("stop_hits", stop_hits)
            .filter((F.col("n_tokens") >= MIN_TOKENS)
                    & (MIN_STOP_DEN * F.col("stop_hits")
                       > MIN_STOP_NUM * F.col("n_tokens"))))


def corpus_ingest_stream(docs: DataFrame) -> DataFrame:
    """Quality gate -> streaming exact dedup -> per-language running
    admission counts (complete-mode aggregation)."""
    admitted = (_gated(docs)
                .withColumn("digest", F.md5("text"))
                .dropDuplicates(["digest", "lang"]))
    return (admitted.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_admitted"),
                 F.sum("n_tokens").alias("admitted_tokens")))


def corpus_ingest_batch(docs: DataFrame) -> DataFrame:
    """Batch twin of :func:`corpus_ingest_stream` for parity testing.
    The dedup key is (digest, lang): every non-key output column is a
    function of the key, so WHICH physical row survives is immaterial
    and stream/batch results match regardless of arrival order."""
    admitted = (_gated(docs)
                .withColumn("digest", F.md5("text"))
                .dropDuplicates(["digest", "lang"]))
    return (admitted.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_admitted"),
                 F.sum("n_tokens").alias("admitted_tokens")))
