"""Split a bench query's wall time into build / plan / execute phases.

For each named query, times three phases over PASSES runs (min reported):
  build  — Python DataFrame construction (fn(spark, sf_dir))
  plan   — analysis + optimization + physical planning
           (queryExecution().executedPlan() on a fresh DF)
  exec   — executing the already-planned query (plan.execute().count())

The sum of the three approximates one bench drain pass; the split says
whether a slow query is slow in Catalyst or in the cluster, which decides
whether the fix is plan-shape (fewer exchanges) or plan-size (fewer
operators / cached session state).

    python tools/profile_phases.py q_dedup_embedding_lsh q_semdedup ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3


def main(argv: list[str]) -> int:
    names = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.tables import table

    spark = get_spark("profile_phases")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        table(spark, sf_dir, t).count()

    for name in names:
        fn = qs[name]
        # warm pass (JIT, page cache)
        df = fn(spark, sf_dir)
        df._jdf.queryExecution().executedPlan().execute().count()
        builds, plans, execs = [], [], []
        for _ in range(PASSES):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            plan = df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            plan.execute().count()
            t3 = time.time()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
        print(f"{name}: build {min(builds):.3f}s plan {min(plans):.3f}s "
              f"exec {min(execs):.3f}s (min of {PASSES}) sf={sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
