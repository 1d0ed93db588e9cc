"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as ``binary``
columns next to typed metadata, processing them with Arrow-batched pandas
UDFs (`mapInPandas`): the Spark-side contract (schema, batch shape,
partitioning) is what this module makes real and tested. The actual
codec work (image decode, resampling, frame extraction) requires
libraries not present in this container, so the decode kernel is a
clearly-marked STUB: ``decode_stub`` raises NotImplementedError unless
``fake=True``, where it derives deterministic pseudo-features so the
pipeline is end-to-end testable.

Scale notes:
  * binary payloads ride Arrow record batches — tune
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` down for megabyte
    blobs so a batch stays within executor memory.
  * feature extraction is embarrassingly parallel (mapInPandas, no
    shuffle); downstream joins happen on the compact metadata/features,
    never on the blobs.
  * blob storage at scale: parquet keeps binaries inline; for >10 MB
    assets the pattern flips to URI columns + ranged reads inside the UDF.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary, "
                "width int, height int")

FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "checksum long, feat array<double>")


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload = utf-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), media_type cycled over image/audio/video,
    plus plausible typed metadata."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
    )


def decode_stub(payload: bytes, media_type: str, *, fake: bool = False)\
        -> list[float]:
    """STUB decode kernel. Real implementation would dispatch to
    PIL/torchaudio/pyav per media_type; those libs are not available
    here. With ``fake=True`` returns a deterministic 8-dim pseudo-feature
    (byte histogram moments) so the pipeline plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            f"no codec for media_type={media_type!r} in this environment; "
            "install an image/audio stack and replace decode_stub")
    n = len(payload) or 1
    buckets = [0.0] * 8
    for b in payload:
        buckets[b & 7] += 1.0
    return [b / n for b in buckets]


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The UDF
    consumes per-partition batch iterators (mapInPandas, SURVEY §2.6 D5:
    batching is the runtime's concern, surfaced only as batch shape)."""
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, m, fake=True)
                     for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "checksum": pdf["payload"].map(
                    lambda b: sum(b) % 2_147_483_647),
                "feat": feats,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


@register(
    "q_media_metadata",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]
                   AS media_type,
               octet_length(encode(text)) AS n_bytes,
               CAST(doc_id % 640 + 32 AS BIGINT) AS width,
               CAST(doc_id % 480 + 32 AS BIGINT) AS height
        FROM documents
    )
    SELECT media_type,
           COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
           CAST(SUM(width * height) AS BIGINT) AS total_pixels
    FROM m
    GROUP BY media_type
    ORDER BY media_type
    """,
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata accounting over the opaque binary media column:
    per-modality asset counts, blob byte mass (octet_length of the
    payload — the real thing, multi-byte UTF-8 and all), and pixel
    budget. This is the catalog pass a media pipeline runs before
    deciding decode fan-out; blobs are scanned only for their length,
    never shuffled.
    """
    media = documents_as_media(table(spark, sf_dir, "documents"))
    return (
        media.select(
            "media_type",
            F.length("payload").alias("n_bytes"),
            (F.col("width").cast("long") * F.col("height"))
            .alias("pixels"))
        .groupBy("media_type")
        .agg(F.count("*").alias("n_assets"),
             F.sum("n_bytes").cast("long").alias("total_bytes"),
             F.max("n_bytes").cast("long").alias("max_bytes"),
             F.sum("pixels").cast("long").alias("total_pixels"))
        .orderBy("media_type")
    )


@register("q_media_features")  # no SQL oracle: Arrow mapInPandas pipeline
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal feature pipeline (rows-only check): binary
    payloads ride Arrow batches through the stubbed decode kernel
    (deterministic fake features), then aggregate per modality. The
    pandas UDF is the one genuinely non-SQL-expressible step in the
    engine; the driver records row-count/schema stability.
    """
    media = documents_as_media(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return (
        feats.select("media_type", "n_bytes", "checksum",
                     F.element_at("feat", 1).alias("f0"))
        .groupBy("media_type")
        .agg(F.count("*").alias("n_assets"),
             F.sum("n_bytes").cast("long").alias("total_bytes"),
             F.sum("checksum").cast("long").alias("checksum_sum"),
             F.min("f0").alias("min_f0"),
             F.max("f0").alias("max_f0"))
        .orderBy("media_type")
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (the decode of the actual frame is the stubbed kernel). Demonstrates
    the explode-based fan-out shape for frame-level datasets."""
    return (media.filter(F.col("media_type") == "video")
            .select("doc_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.least((F.length("payload") / every_n).cast("int"),
                                F.lit(50)))).alias("frame_idx")))


@register(
    "q_media_dedup",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]
                   AS media_type,
               md5(text) AS digest,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ), per_blob AS (
        SELECT media_type, digest,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(MIN(n_bytes) AS BIGINT) AS blob_bytes
        FROM m GROUP BY 1, 2
    )
    SELECT media_type,
           CAST(SUM(cnt) AS BIGINT) AS n_assets,
           CAST(COUNT(*) AS BIGINT) AS n_unique_blobs,
           CAST(SUM(cnt - 1) AS BIGINT) AS dup_assets,
           CAST(SUM((cnt - 1) * blob_bytes) AS BIGINT)
               AS reclaimable_bytes
    FROM per_blob
    GROUP BY media_type
    ORDER BY media_type
    """,
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-asset dedup census: per modality, how many blobs are
    byte-identical duplicates and how much storage a content-addressed
    store would reclaim — the first pass every image/audio corpus gets
    before any expensive near-dup modeling (crawls re-fetch the same
    asset under many URLs). Dedup key is the md5 digest OF THE PAYLOAD
    BYTES; blobs themselves never shuffle — only (16-byte digest, length)
    pairs move, the same contract as q_dedup_exact on text.

    Oracle note: payloads here are the utf-8 bytes of the document text
    (documents_as_media), so md5(payload) == md5(text) and DuckDB
    reproduces the digests without blob support.

    Scale: one scan computing digests map-side, a digest-keyed count
    aggregate (combiner-friendly), then a modality rollup of the
    already-aggregated frame. Identical shape at 100 TB with billions of
    assets; the digest table IS the content-addressed index."""
    media = documents_as_media(table(spark, sf_dir, "documents"))
    per_blob = (media
                .select("media_type",
                        F.md5("payload").alias("digest"),
                        F.length("payload").cast("long").alias("n_bytes"))
                .groupBy("media_type", "digest")
                .agg(F.count("*").cast("long").alias("cnt"),
                     F.min("n_bytes").alias("blob_bytes")))
    return (per_blob.groupBy("media_type")
            .agg(F.sum("cnt").cast("long").alias("n_assets"),
                 F.count("*").cast("long").alias("n_unique_blobs"),
                 F.sum(F.expr("cnt - 1")).cast("long").alias("dup_assets"),
                 F.sum(F.expr("(cnt - 1) * blob_bytes")).cast("long")
                 .alias("reclaimable_bytes"))
            .orderBy("media_type"))
