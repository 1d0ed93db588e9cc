"""Dump .explain("formatted") for headline queries to plans/<tag>/.

    python tools/dump_plans.py r14_before [query ...]

Writes plans/<tag>/<query>.txt (or `_before`/`_after` suffixed copies are
made by the caller). With no query list, dumps every bench headline query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    tag = argv[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    import __spark_entry__ as entrymod
    from columnar_estimator_sample_spark.session import get_spark

    names = argv[1:] or bench.HEADLINE
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: exchanges={n_ex} smj={txt.count('SortMergeJoin')} "
              f"bhj={txt.count('BroadcastHashJoin')} "
              f"arrow={txt.count('ArrowEvalPython') + txt.count('MapInPandas') + txt.count('MapInArrow')} "
              f"batch_py={txt.count('BatchEvalPython')} "
              f"bytes={len(txt)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
