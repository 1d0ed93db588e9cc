from columnar_estimator_sample_spark.sources.tables import table, TABLES  # noqa: F401
