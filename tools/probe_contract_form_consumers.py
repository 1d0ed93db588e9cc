"""A/B the contraction form INSIDE its real consumers (r11).

The standalone viral-doc probe (tools/probe_contract_skew.py) measures
the contraction in isolation; consumers differ — the window form lets
``members``/``reps`` share one fp exchange (ReusedExchange), while the
agg+join form rescans/refingerprints the payload per branch. This probe
monkeypatches the selected form into operators.dedup and runs the real
queries, one process per form so no lazy-checkpoint state leaks across
variants.

    python tools/probe_contract_form_consumers.py window|aggjoin [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 5
DEFAULT_QUERIES = ["q_dedup_minhash_lsh", "q_dedup_cosine_setjoin",
                   "q_dedup_prefix_filter", "q_dedup_embedding_lsh"]


def main(argv: list[str]) -> int:
    form = argv[0] if argv else "window"
    names = argv[1:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from columnar_estimator_sample_spark.operators import dedup
    if form == "aggjoin":
        dedup.contract_exact_dups = dedup.contract_exact_dups_aggjoin
    elif form != "window":
        raise SystemExit(f"unknown form {form!r}")

    import __spark_entry__ as entrymod
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.tables import table

    spark = get_spark(f"probe_form_{form}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def drain(df) -> int:
        return df._jdf.queryExecution().executedPlan().execute().count()

    for t in ["lineitem", "documents", "embeddings"]:
        table(spark, sf_dir, t).count()
    for name in names:
        drain(qs[name](spark, sf_dir))  # warm pass
        samples = []
        for _ in range(PASSES):
            t0 = time.time()
            drain(qs[name](spark, sf_dir))
            samples.append(time.time() - t0)
        samples.sort()
        print(f"{name} [{form}]: min {samples[0]:.3f}s median "
              f"{samples[len(samples) // 2]:.3f}s (of {PASSES}) "
              f"sf={sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
