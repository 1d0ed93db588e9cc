"""Deliberate re-measure of specific bench queries (SCALE.md §5 rule).

Cross-round bench deltas under ~2x on cheap queries are not signal
unless they reproduce in a deliberate re-measure: one warm session, two
independent min-of-7 passes per query, same host. This is the exact
protocol round 10 applied to the r9 token-path cluster; kept as a tool
so each round's watch items get the same treatment.

    python tools/remeasure.py q_dedup_embedding_lsh [more...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 7
REPEATS = 2


def main(argv: list[str]) -> int:
    names = argv or ["q_dedup_embedding_lsh"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.tables import table

    spark = get_spark("remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def drain(df) -> int:
        return df._jdf.queryExecution().executedPlan().execute().count()

    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        table(spark, sf_dir, t).count()
    for name in names:
        drain(qs[name](spark, sf_dir))  # JIT warm pass
        for rep in range(1, REPEATS + 1):
            samples = []
            for _ in range(PASSES):
                t0 = time.time()
                drain(qs[name](spark, sf_dir))
                samples.append(time.time() - t0)
            samples.sort()
            print(f"{name} run{rep}: min {samples[0]:.3f}s "
                  f"median {samples[len(samples) // 2]:.3f}s "
                  f"max {samples[-1]:.3f}s (of {PASSES}) sf={sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
