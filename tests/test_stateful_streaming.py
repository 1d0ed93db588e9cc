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
