"""The reference's complete workload, end-to-end, on this engine.

A user of ``vlasenkoalexey/columnar_estimator_sample`` runs:
  1. ingest a Criteo-shaped table from schema'd files with per-column
     defaults               (trainer.py:120-173, 175-246)
  2. maintain a per-column cardinality catalog
                            (trainer.py:91-118)
  3. build features: normalized numerics + NDV*5-bucket hashed
     categoricals           (trainer.py:256-269)
  4. train + evaluate a linear and a DNN classifier
                            (trainer.py:271-316)
  5. benchmark reader throughput, logging examples/sec per window
                            (trainer.py:318-399)
  6. post-process profile traces with SQL: flatten -> aggregate -> top-k
                            (notebook cells 3-13)

This script runs the same loop on the Spark engine. Every stage prints
the reference's own log vocabulary so outputs are comparable.

Usage: python tools/reference_workload.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_rows: int = 20_000) -> None:
    from columnar_estimator_sample_spark.ml.train import (
        criteo_shaped_frame, train_dnn, train_linear,
    )
    from columnar_estimator_sample_spark.operators.flatten import (
        flatten_trace, trace_top_ops,
    )
    from columnar_estimator_sample_spark.plans.stats import (
        hash_bucket_sizes, ndv_catalog,
    )
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.io import (
        ctas, read_parquet, schema_defaults, apply_defaults,
    )
    import pyspark.sql.functions as F

    spark = get_spark("reference_workload")
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.time()

    # -- 1. ingest ---------------------------------------------------------
    print(f"[1/6] generating + ingesting criteo-shaped table "
          f"({n_rows} rows)")
    raw = criteo_shaped_frame(spark, n_rows=n_rows)
    path = "/tmp/ref_workload_criteo"
    raw.write.mode("overwrite").parquet(path)
    df = apply_defaults(read_parquet(spark, path),
                        schema_defaults(read_parquet(spark, path).schema))
    n_ingested = df.count()
    print(f"      ingested {n_ingested} rows, {len(df.columns)} columns")

    # -- 2. cardinality catalog -------------------------------------------
    cats = [c for c in df.columns if c.startswith("cat")]
    catalog = ndv_catalog(df, cats)
    buckets = hash_bucket_sizes(catalog)
    print(f"[2/6] vocab_size catalog (measured, not hand-maintained): "
          f"{catalog}")
    print(f"      hash buckets (NDV*5): {buckets}")

    # -- 3+4. features + train/evaluate -----------------------------------
    train = df.filter(F.col("id") % 5 != 0).cache()
    test = df.filter(F.col("id") % 5 == 0).cache()
    print(f"[3/6] train/test split: {train.count()}/{test.count()}")
    t0 = time.time()
    lin = train_linear(train, test)
    print(f"[4/6] linear estimator: AUC={lin.auc:.4f} "
          f"({lin.n_features} features, {time.time() - t0:.1f}s)")
    t0 = time.time()
    dnn = train_dnn(train, test, max_iter=40)
    print(f"      DNN estimator:    AUC={dnn.auc:.4f} "
          f"({time.time() - t0:.1f}s)")

    # -- 5. reader benchmark (trainer.py:340-358 log format) --------------
    print("[5/6] reader benchmark (single-column probe, columnar scan)")
    probe = read_parquet(spark, path).select("cat1")
    batch_size = 512
    mini_batch = 100
    t0 = time.time()
    n = probe.count()
    elapsed = max(time.time() - t0, 1e-9)
    steps = max(n // batch_size, 1)
    per_window = (mini_batch * batch_size) / (elapsed / steps * mini_batch)
    print(f"      Processed {n} examples, in {steps} steps, average "
          f"{n / elapsed:.2f} examples per second "
          f"(~{per_window:.0f}/s per {mini_batch}-batch window)")

    # -- 6. trace analytics ------------------------------------------------
    print("[6/6] trace analytics: flatten -> CTAS -> top-20 by duration")
    flat = flatten_trace(spark)
    ctas(spark, "ref_workload_traces", flat)
    top = trace_top_ops(spark.table("ref_workload_traces")).collect()
    print(f"      {spark.table('ref_workload_traces').count()} trace "
          f"events; top op: {top[0]['arg_name']} "
          f"(total_dur={top[0]['total_dur']})")
    spark.sql("DROP TABLE ref_workload_traces")

    print(f"done in {time.time() - t_start:.1f}s "
          f"(linear AUC {lin.auc:.3f}, dnn AUC {dnn.auc:.3f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000)
