"""Viral-document skew probe for contract_exact_dups (r10 verdict #4).

SCALE.md §4 prices the single-window contraction's trade: one
fingerprint group's members (payload included) land in one task, so a
pathologically viral document concentrates its payload there. This
probe plants a 10^5-copy ~1 KB document next to the sf1 corpus and
measures the window form against the mechanical skew-proof restatement
(``contract_exact_dups_aggjoin``: map-side-combinable fp aggregate +
join back). CAVEAT this probe taught r11: it measures the contraction
IN ISOLATION, where agg+join wins — but inside real consumers the
window form's shared scan + fp exchange wins 1.2-2.9x at 100x
(tools/probe_contract_form_consumers.py is the decisive probe), so the
window form stays the default and agg+join is the viral-corpus switch.

    python tools/probe_contract_skew.py [sf_dir] [viral_copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "/root/repo/.benchdata/sf1"
    copies = int(argv[1]) if len(argv) > 1 else 100_000
    from pyspark.sql import functions as F
    from columnar_estimator_sample_spark.operators.dedup import (
        contract_exact_dups, contract_exact_dups_aggjoin,
    )
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.tables import table

    spark = get_spark("probe_contract_skew")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    viral_text = "lorem ipsum viral payload " * 40  # ~1 KB
    viral = (spark.range(copies)
             .select((F.col("id") + F.lit(10 ** 12)).alias("doc_id"),
                     F.lit(viral_text).alias("text")))
    pool = docs.unionByName(viral).repartition(32).localCheckpoint()
    n = pool.count()
    print(f"pool: {n} rows ({copies} viral copies planted on {sf_dir})")

    def drain(df) -> int:
        return df._jdf.queryExecution().executedPlan().execute().count()

    def run(tag, fn):
        # JIT/codegen warm pass, then min-of-PASSES
        members, reps = fn(pool, "doc_id", "text")
        drain(members), drain(reps)
        samples = []
        for _ in range(PASSES):
            t0 = time.time()
            members, reps = fn(pool, "doc_id", "text")
            nm, nr = drain(members), drain(reps)
            samples.append(time.time() - t0)
        samples.sort()
        print(f"{tag}: min {samples[0]:.3f}s median "
              f"{samples[len(samples) // 2]:.3f}s (of {PASSES}) "
              f"members={nm} reps={nr}")
        return samples[0]

    w = run("window   (default) ", contract_exact_dups)
    a = run("agg+join (switch)  ", contract_exact_dups_aggjoin)
    print(f"verdict: {'agg+join' if a < w else 'window'} wins "
          f"({min(a, w):.2f}s vs {max(a, w):.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
