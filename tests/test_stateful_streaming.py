"""Custom stateful streaming operator tests: final state must equal the
batch aggregation over the same input."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_running_user_totals_converges_to_batch(spark, sf_dir, tmp_path):
    from columnar_estimator_sample_spark.streaming.stateful import (
        running_user_totals,
    )
    from columnar_estimator_sample_spark.streaming.windows import (
        events_stream,
    )
    from columnar_estimator_sample_spark.sources.tables import table

    stream = running_user_totals(events_stream(spark, sf_dir))
    q = (stream.writeStream.format("memory").queryName("user_totals")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # update mode: keep the LAST emitted row per user
    got_df = spark.table("user_totals")
    last = (got_df.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("last_us").alias("last_us"),
                 F.min("first_us").alias("first_us")))
    got = {r["user_id"]: (r["n_events"], r["first_us"], r["last_us"])
           for r in last.collect()}

    batch = (table(spark, sf_dir, "events")
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("us").alias("first_us"),
                  F.max("us").alias("last_us")))
    want = {r["user_id"]: (r["n"], r["first_us"], r["last_us"])
            for r in batch.collect()}
    assert got == want


def test_exact_totals_accumulate_across_micro_batches(spark, sf_dir,
                                                      tmp_path):
    """q_stream_user_totals against a MULTI-FILE events directory (the
    Spark-written layout): state must accumulate across micro-batches
    (maxFilesPerTrigger=1 -> one batch per part file) and the final
    integer-micros totals must equal the batch aggregate exactly. Also
    regression-pins the r6 events_stream glob bug where directory
    layouts silently streamed zero rows."""
    from columnar_estimator_sample_spark.registry import queries
    from columnar_estimator_sample_spark.sources.tables import table

    src = table(spark, sf_dir, "events")
    # split the driver's single file into 4 part files under a table
    # directory, preserving the nanosecond ts as-is via us
    (src.repartition(4)
     .write.mode("overwrite").parquet(str(tmp_path / "events.parquet")))
    d = str(tmp_path)

    got = {r.user_id: (r.n_events, r.total_micros, r.first_us, r.last_us)
           for r in queries()["q_stream_user_totals"](spark, d).collect()}
    want = {r.user_id: (r.n, r.tm, r.first_us, r.last_us)
            for r in src.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
                 .cast("long").alias("tm"),
                 F.min("us").alias("first_us"),
                 F.max("us").alias("last_us")).collect()}
    assert len(got) > 0 and got == want
