"""Probe: incremental IVF maintenance cost vs corpus size.

The r11 verdict's #2: every IVF-family number at 100x was dominated by
the per-session O(N * NLIST) coarse-assignment rebuild. The maintained
inverted file (operators/similarity.ivf_incremental_index) removes it:
once the index is warm, an arriving batch costs O(batch * NLIST) against
broadcast centroid frames plus a bucketed append. This probe measures,
at the given sf_dir (run it at sf0.1, .benchdata/sf1, .benchdata/sf10):

  rebuild : one-shot coarse assignment of the FULL corpus (what every
            per-session build pays; the linear term)
  warm    : coarse assignment of ONLY the arriving IVF_INC_BATCH batch
            (what a maintained index pays per arrival)
  append  : the warm assignment written (appended) into a bucketed
            throwaway table — the full warm maintenance step incl. IO

min-of-PASSES per number, one warm session, same host protocol as
tools/remeasure.py.

    SPARK_GRAFT_SF_DIR=.benchdata/sf10 python tools/probe_ivf_incremental.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 7


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import tempfile

    from pyspark.sql import functions as F

    from columnar_estimator_sample_spark.operators.partitioning import (
        bucketed_ctas,
    )
    from columnar_estimator_sample_spark.operators.similarity import (
        IVF_INC_BATCH, _exploded, _inc_coarse_assign, inc_batch_threshold,
        ivf_nlist_for,
    )
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.tables import (
        register_tempdir, table,
    )

    spark = get_spark("probe_ivf_inc")
    spark.sparkContext.setLogLevel("ERROR")

    def drain(df) -> int:
        return df._jdf.queryExecution().executedPlan().execute().count()

    nlist = ivf_nlist_for(sf_dir)
    thr = inc_batch_threshold(sf_dir)
    n = table(spark, sf_dir, "embeddings").count()  # warms the scan too
    ex = _exploded(table(spark, sf_dir, "embeddings"))
    cex = (ex.filter(F.col("vec_id") < nlist)
           .select(F.col("vec_id").alias("centroid_id"), "i",
                   F.col("vi").alias("ci")))
    cnorms = cex.groupBy("centroid_id").agg(
        F.sum(F.col("ci") * F.col("ci")).alias("nc_s"))

    def mins(fn) -> float:
        samples = []
        for _ in range(PASSES):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        return min(samples)

    full = _inc_coarse_assign(ex, cex, cnorms, "all")
    batch = _inc_coarse_assign(ex.filter(F.col("vec_id") >= thr),
                               cex, cnorms, "batch")
    drain(batch)  # JIT warm
    t_rebuild = mins(lambda: drain(full))
    t_warm = mins(lambda: drain(batch))

    base = register_tempdir(tempfile.mkdtemp(prefix="graft-probe-ivfinc-"))
    tbl = f"probe_ivfinc_{abs(hash(sf_dir)) % 10**8}"
    bucketed_ctas(spark, tbl, batch.limit(0), "centroid_id",
                  n_buckets=nlist, path=os.path.join(base, "idx"))
    t_append = mins(
        lambda: batch.write.mode("append").insertInto(tbl))

    print(f"sf={sf_dir} N={n} nlist={nlist} batch={IVF_INC_BATCH}: "
          f"rebuild {t_rebuild:.3f}s warm {t_warm:.3f}s "
          f"warm+append {t_append:.3f}s (min of {PASSES})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
