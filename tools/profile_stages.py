"""Per-stage empirical profile of one bench query (guide §1.1/§7.1).

Runs the query once warm, then once instrumented, and prints every stage
the instrumented run scheduled: stage wall time, task count, shuffle
read/write bytes, and the first line of the stage's callsite. Uses the
status API (no UI needed).

    python tools/profile_stages.py q_dedup_embedding_lsh
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from columnar_estimator_sample_spark.session import get_spark
    from columnar_estimator_sample_spark.sources.tables import table

    spark = get_spark("profile_stages", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": "4099"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        table(spark, sf_dir, t).count()

    import urllib.request
    import json

    def stages_snapshot():
        app_id = spark.sparkContext.applicationId
        url = f"http://localhost:4099/api/v1/applications/{app_id}/stages"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    def drain(df):
        return df._jdf.queryExecution().executedPlan().execute().count()

    for name in argv:
        fn = qs[name]
        drain(fn(spark, sf_dir))  # warm
        before_ids = {s["stageId"] for s in stages_snapshot()}
        t0 = time.time()
        drain(fn(spark, sf_dir))
        wall = time.time() - t0
        new = [s for s in stages_snapshot()
               if s["stageId"] not in before_ids
               and s["status"] in ("COMPLETE", "SKIPPED")]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"==== {name}: wall {wall:.3f}s, {len(new)} stages ====")
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"  sum executorRunTime {total_run/1000.0:.3f}s "
              f"(x{spark.sparkContext.defaultParallelism} cores available)")
        from datetime import datetime

        def ts(v):
            return datetime.strptime(v[:23], "%Y-%m-%dT%H:%M:%S.%f")

        spans = []
        for s in new:
            if s.get("submissionTime") and s.get("completionTime"):
                spans.append((ts(s["submissionTime"]),
                              ts(s["completionTime"]), s))
        spans.sort(key=lambda x: x[0])
        for sub, comp, s in spans:
            run = (s.get("executorRunTime") or 0) / 1000.0
            stage_wall = (comp - sub).total_seconds()
            print(f"  stage {s['stageId']}: wall {stage_wall:.3f}s "
                  f"run {run:.3f}s tasks={s.get('numCompleteTasks')} "
                  f"sr={s.get('shuffleReadBytes', 0)//1024}K "
                  f"sw={s.get('shuffleWriteBytes', 0)//1024}K "
                  f"in={s.get('inputBytes', 0)//1024}K "
                  f"| {(s.get('name') or '')[:70]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
