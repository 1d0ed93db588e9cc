"""Readers/writers: the engine's ingest layer.

Re-expresses the reference's scan stack (SURVEY.md §2.1) Spark-first:

  * S1 glob scan           (trainer.py:177-179,213,231)  -> native path
    globs + ``input_file_name`` provenance.
  * S2/S3 compressed record scan with fused parse/batch
    (trainer.py:185-208)                                 -> format readers;
    batching/parallelism are runtime concerns (maxPartitionBytes), never
    user-visible operators.
  * S4 schema'd parse with per-column defaults
    (trainer.py:120-173)                                 -> explicit
    StructType + ``fillna`` defaults derived from the schema.
  * S5 NDJSON with schema autodetect (README.md:151-171) -> spark.read.json
    (inference on by default), plus a normalizer that rewrites pretty
    JSON to one-doc-per-line (trainer.py:372's replace('\\n',' ')).
  * S6 CTAS (README.md:177,196-198)                      -> saveAsTable /
    CREATE TABLE AS SELECT.
  * S9 JSON file sink (trainer.py:370-381)               -> write.json.

Scale: every reader returns a lazy DataFrame; filters/projections land in
the scan via Catalyst. Defaults are ``coalesce``-style projections, fused
into whole-stage codegen.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; ``path`` may contain globs (S1)."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             defaults: dict[str, object] | None = None,
             header: bool = True, sep: str = ",") -> DataFrame:
    """Schema'd CSV scan with per-column defaults (S4: the
    ``FixedLenFeature(default_value=...)`` contract of trainer.py:120-163).
    Missing/null fields become their declared defaults."""
    df = spark.read.csv(path, schema=schema, header=header, sep=sep)
    return apply_defaults(df, defaults or {})


def read_ndjson(spark: SparkSession, path: str,
                schema: T.StructType | None = None) -> DataFrame:
    """NDJSON load; schema inferred when not given (S5 autodetect)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def apply_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """Replace nulls with declared per-column defaults (trainer.py:122-162
    semantics: 0 for ints, 0.0 for floats, "" for strings)."""
    present = {k: v for k, v in defaults.items() if k in df.columns}
    return df.fillna(present) if present else df


def schema_defaults(schema: T.StructType) -> dict[str, object]:
    """Derive the reference's default-value convention from a schema:
    numeric -> 0/0.0, string -> "" (trainer.py:124-162)."""
    out: dict[str, object] = {}
    for f in schema.fields:
        if isinstance(f.dataType, (T.IntegerType, T.LongType, T.ShortType)):
            out[f.name] = 0
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            out[f.name] = 0.0
        elif isinstance(f.dataType, T.StringType):
            out[f.name] = ""
    return out


def with_provenance(df: DataFrame,
                    col_name: str = "_source_file") -> DataFrame:
    """Attach the originating file per row — the glob-scan provenance the
    reference loses when it interleaves files (trainer.py:216-219)."""
    return df.withColumn(col_name, F.input_file_name())


def normalize_json_lines(src_path: str, dst_path: str) -> int:
    """Rewrite a (possibly pretty-printed) JSON document file to NDJSON:
    one document per line (trainer.py:372,378 replace('\\n', ' ')).
    Driver-side utility, used before handing a path to spark.read.json.
    Returns the number of documents written."""
    with open(src_path) as f:
        text = f.read().strip()
    docs: list[object]
    try:
        docs = [json.loads(line) for line in text.splitlines() if line.strip()]
    except json.JSONDecodeError:
        parsed = json.loads(text)  # single pretty-printed document
        docs = parsed if isinstance(parsed, list) else [parsed]
    with open(dst_path, "w") as f:
        for d in docs:
            f.write(json.dumps(d, separators=(",", ":")) + "\n")
    return len(docs)


def ctas(spark: SparkSession, name: str, df: DataFrame,
         mode: str = "overwrite") -> DataFrame:
    """CREATE TABLE AS SELECT into the session catalog (S6; the
    reference's --destination_table). Statistics can then be ANALYZEd for
    CBO (plans/stats.py)."""
    df.write.mode(mode).saveAsTable(name)
    return spark.table(name)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON sink (S9). ``single_file`` coalesces to one output file — only
    for small results; a 100 TB write keeps its natural partitioning."""
    (df.coalesce(1) if single_file else df).write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar scan (glob-able like S1). ORC carries the same
    pushdown surface as parquet in Spark (predicate pushdown, column
    pruning, vectorized reader) — a second warehouse-native format so the
    engine isn't parquet-only."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str,
              partition_by: list[str] | None = None) -> None:
    """ORC sink, optionally hive-partitioned (same layout contract as
    :func:`write_partitioned_parquet`)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_by: list[str]) -> None:
    """Partition-pruned parquet layout: the 100 TB-scale sink. Readers
    filtering on ``partition_by`` columns scan only matching directories."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def compact_write(df: DataFrame, path: str, target_mb: int = 512,
                  sort_by: list[str] | None = None) -> int:
    """Small-file compaction sink: rewrite ``df`` as parquet sized to
    ``target_mb`` per file. Returns the number of files written.

    The small-files problem is THE operational failure mode of long-lived
    100 TB tables (every micro-batch/task leaves a file; scans then pay a
    per-file open + footer parse, and the driver's file index balloons).
    The fix is what this does: estimate bytes from a sample-free plan
    (Spark's own size statistics for the input), choose
    ceil(bytes / target), and ``repartition(n)`` — or range-partition by
    ``sort_by`` so each output file additionally carries tight min/max
    column stats for row-group skipping (poor man's clustering).

    At warehouse scale this runs per partition-directory (compact
    yesterday's partition, swap atomically); the unit here demonstrates
    the sizing + layout contract.
    """
    import math

    size_bytes = (df.sparkSession._jsparkSession.sessionState()
                  .executePlan(df._jdf.queryExecution().logical(),
                               df._jdf.queryExecution().mode())
                  .optimizedPlan().stats().sizeInBytes())
    n_files = max(1, math.ceil(float(str(size_bytes)) /
                               (target_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(path)
    return n_files


def publish_with_audit(df: DataFrame, dest: str,
                       audits: list, fmt: str = "parquet") -> dict:
    """Write-audit-publish (WAP) sink: the lakehouse pattern that keeps
    half-written or bad data invisible to readers. The frame is written
    to a STAGING path, each audit runs against the staged files as
    re-read from disk (so the audit sees exactly what readers would),
    and only if every audit passes does the staging directory move
    atomically into the destination. On any audit failure the
    destination is untouched and staging is kept for debugging.

    ``audits`` is a list of callables ``(DataFrame) -> (ok, message)``;
    compose them from operators/quality.py checks. Returns a report dict
    ``{published, dest, audits: [(name, ok, message), ...]}``.

    Scale notes: on HDFS-like filesystems the final rename is an O(1)
    metadata move; on object stores the same pattern runs through a
    table format's atomic commit (Iceberg/Delta branch-and-publish) with
    identical semantics — stage, audit the committed-but-unpublished
    snapshot, then swap the pointer. The audit pass is one extra read of
    the staged output, not of the input pipeline."""
    import os
    import shutil

    staging = dest.rstrip("/") + ".__staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df.write.mode("overwrite").format(fmt).save(staging)
    spark = df.sparkSession
    staged = spark.read.format(fmt).load(staging)
    results = []
    ok_all = True
    for audit in audits:
        name = getattr(audit, "__name__", "audit")
        ok, msg = audit(staged)
        results.append((name, bool(ok), msg))
        ok_all = ok_all and bool(ok)
    if ok_all:
        if os.path.exists(dest):
            shutil.rmtree(dest)
        os.rename(staging, dest)
    return {"published": ok_all, "dest": dest if ok_all else None,
            "staging": None if ok_all else staging, "audits": results}
