"""Per-operator runtime profiler (U6) + the trace dogfood loop.

The reference captures FULL_TRACE step stats around a window of batches
and writes Chrome-trace ``timeline.json`` files, which it then analyzes
with its own SQL pipeline (/root/reference/trainer.py:328-350, 361-381;
README.md:145-222). The engine's equivalent:

  * :func:`collect_plan_metrics` — after an action, walk the EXECUTED
    physical plan (through AQE / query-stage wrappers) and read every
    operator's SQLMetrics (rows, timings, spills, peak memory) via the
    public py4j bridge. These are actual per-operator task metrics, not
    optimizer estimates — the counterpart of plans/stats.estimation_report.
  * :func:`profile_query` — run a drain action, return a Chrome-trace
    document ``{"traceEvents": [{ph,cat,name,pid,tid,ts,dur,args:{name,
    op}}, ...]}`` shaped exactly like the reference's timeline.json
    (README.md:70-103): one complete-event per physical operator, dur =
    the operator's timing metric in µs, ts = cumulative.
  * :func:`write_timeline` / :func:`profile_to_top_ops` — persist as
    NDJSON and feed the engine's OWN trace-analytics pipeline
    (operators/flatten.flatten_trace -> trace_top_ops): the same
    dogfooding loop the reference performs through BigQuery.

Scale: metric collection is driver-side tree traversal over the plan (a
few dozen nodes), independent of data volume — the metrics themselves are
aggregated by Spark across all tasks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# metric keys treated as an operator's duration, first match wins;
# values are (key, scale-to-microseconds)
_DURATION_METRICS = [
    ("aggTime", 1.0),            # timing: ms -> µs below
    ("scanTime", 1.0),
    ("sortTime", 1.0),
    ("buildTime", 1.0),
    ("pipelineTime", 1.0),
    ("shuffleWriteTime", 1e-3),  # nsTiming: ns -> µs
]


def _node_metrics(node) -> dict[str, int]:
    mets = node.metrics()
    keys = mets.keys().toList()
    out = {}
    for i in range(keys.size()):
        k = keys.apply(i)
        m = mets.apply(k)
        out[str(k)] = (str(m.metricType()), int(m.value()))
    return out


def collect_plan_metrics(df: DataFrame, execute: bool = True) -> list[dict]:
    """Walk the executed plan and return one record per operator:
    {op, depth, metrics:{key:(type,value)}}. Descends through
    AdaptiveSparkPlan final plans and QueryStage wrappers so post-AQE
    operators are reported, not placeholders.

    ``execute=True`` drives THIS DataFrame's own QueryExecution with a
    driver-light JVM-side drain (``plan.execute().count()`` — no rows
    reach the driver); metrics only populate on the executed plan
    instance, and actions like ``df.count()`` build a *different* query.
    Pass ``execute=False`` when the frame was already ``collect()``ed."""
    plan = df._jdf.queryExecution().executedPlan()
    if execute:
        plan.execute().count()
    out: list[dict] = []

    def walk(node, depth: int) -> None:
        name = str(node.nodeName())
        out.append({"op": name, "depth": depth,
                    "metrics": _node_metrics(node)})
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth + 1)
            return
        if "QueryStage" in name:
            walk(node.plan(), depth + 1)
            return
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i), depth + 1)

    walk(plan, 0)
    return out


def _duration_us(metrics: dict[str, tuple[str, int]]) -> int:
    for key, scale in _DURATION_METRICS:
        if key in metrics:
            mtype, value = metrics[key]
            us = value * (1e-3 if mtype == "nsTiming" else 1e3) * scale
            return max(int(us), 0)
    return 0


def profile_query(df: DataFrame) -> dict:
    """Execute ``df`` and emit a Chrome-trace document of its physical
    operators (reference timeline.json shape, README.md:70-103)."""
    events = []
    ts = 0
    for seq, rec in enumerate(collect_plan_metrics(df, execute=True)):
        dur = _duration_us(rec["metrics"])
        rows = rec["metrics"].get("numOutputRows", ("sum", 0))[1]
        events.append({
            "ph": "X",
            "cat": "spark",
            "name": f"{rec['op']}:{seq}",
            "pid": 0,
            "tid": rec["depth"],
            "ts": ts,
            "dur": int(dur),
            "args": {"name": rec["op"], "op": f"rows={rows}"},
        })
        ts += max(int(dur), 1)
    return {"traceEvents": events}


def write_timeline(trace: dict, path: str) -> str:
    """Persist a trace document as NDJSON (one document per line — the
    reference's replace('\\n',' ') normalization, trainer.py:372)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(json.dumps(trace, separators=(",", ":")) + "\n")
    return path


def profile_to_top_ops(spark: SparkSession, df: DataFrame,
                       path: str, k: int = 20) -> DataFrame:
    """The dogfood loop end-to-end: profile ``df``, write timeline NDJSON,
    analyze it with the engine's own flatten->agg->top-k trace pipeline
    (the reference's notebook flow, README.md:145-222)."""
    from columnar_estimator_sample_spark.operators.flatten import (
        flatten_trace,
        trace_top_ops,
    )
    write_timeline(profile_query(df), path)
    return trace_top_ops(flatten_trace(spark, path), k)
