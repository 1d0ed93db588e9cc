"""columnar_estimator_sample_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the public
reference repo ``vlasenkoalexey/columnar_estimator_sample`` (a columnar
ingest + feature-engineering + trace-analytics sample; see SURVEY.md) as an
idiomatic Spark DataFrame/SQL engine, extended with the statistics /
cardinality-estimation module and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) needed to run the
same workloads at 100 TB scale.

Layout:
    session.py    -- SparkSession builder (AQE, Arrow, UTC, CBO on)
    registry.py   -- query registry: every operator registers a
                     (spark, sf_dir) -> DataFrame callable plus a DuckDB
                     oracle SQL twin for differential testing
    sources/      -- readers/writers: schema'd loads with defaults, glob
                     scans, NDJSON ingest, CTAS
    operators/    -- relational suite, flatten/trace analytics, dedup,
                     similarity, text stats, feature engineering
    functions/    -- portable expression helpers (exact cross-engine
                     aggregates, md5-based hashing, text/vector ops)
    plans/        -- statistics & cardinality estimation (NDV catalog,
                     ANALYZE/CBO integration, estimated-vs-actual report)
    streaming/    -- Structured Streaming tier over the events table
    ml/           -- MLlib train/evaluate loop mirroring the reference's
                     estimators
"""

__version__ = "0.1.0"

from columnar_estimator_sample_spark.registry import queries, oracle_sql  # noqa: F401
