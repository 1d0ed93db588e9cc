"""End-to-end corpus-preparation pipeline: the composed funnel a
training-data pipeline runs over raw documents before tokenization.

    raw docs -> quality gate -> exact dedup -> near-dup (bag-of-words)
            -> per-language corpus accounting

Each stage reuses the primitives registered individually (textstats
quality signals, dedup digests/fingerprints); this query is the proof
they COMPOSE — one Catalyst plan, no materialization between stages.

Scale: the funnel is two narrow projection passes (signals + digests)
and two window-min dedup passes. Both windows partition by a hash key
(digest / fingerprint), so at 100 TB they are hash-partition-local:
survivor selection is a shuffle of (digest, doc_id) pairs, never text.
The final accounting is a per-language rollup joined from per-stage
aggregates (each map-side combinable; the join keys are ~languages,
broadcast-sized).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from columnar_estimator_sample_spark.operators.textstats import STOPWORDS
from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import (
    register_memo,
    table,
)

MIN_TOKENS = 20
# quality gate: stopword ratio > 1/20, tested as the exact integer
# inequality 20*stop_hits > n_tokens (no double anywhere — the
# double->decimal rounding PATH differs between engines for arbitrary
# doubles, per functions/exact.py's numeric contract, and this query was
# driver-red in round 3 for exactly that reason).
MIN_STOP_NUM, MIN_STOP_DEN = 1, 20
PPM = 1_000_000


@register(
    "q_corpus_prep_pipeline",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains({STOPWORDS!r}, t))) AS BIGINT)
               AS stop_hits,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe_tokens,
               md5(text) AS digest,
               md5(array_to_string(
                   list_sort(list_distinct(string_split(text, ' ')),
                             'ASC', 'NULLS FIRST'),
                   ' ')) AS fingerprint
        FROM documents
    ), quality AS (
        SELECT * FROM base
        WHERE n_tokens >= {MIN_TOKENS}
          AND {MIN_STOP_DEN} * stop_hits > {MIN_STOP_NUM} * n_tokens
    ), exact_uniq AS (
        SELECT * FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY digest) AS keep_id
            FROM quality)
        WHERE doc_id = keep_id
    ), near_uniq AS (
        SELECT * FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS nkeep_id
            FROM exact_uniq)
        WHERE doc_id = nkeep_id
    ), s0 AS (
        SELECT lang, COUNT(*) AS n_raw FROM base GROUP BY lang
    ), s1 AS (
        SELECT lang, COUNT(*) AS n_quality FROM quality GROUP BY lang
    ), s2 AS (
        SELECT lang, COUNT(*) AS n_exact_unique FROM exact_uniq GROUP BY lang
    ), s3 AS (
        SELECT lang, COUNT(*) AS n_kept,
               CAST(SUM(n_bpe_tokens) AS BIGINT) AS kept_bpe_tokens,
               CAST(SUM(({PPM} * stop_hits) // n_tokens) // COUNT(*)
                    AS BIGINT) AS avg_stop_ppm
        FROM near_uniq GROUP BY lang
    )
    SELECT s0.lang, n_raw,
           COALESCE(n_quality, 0) AS n_quality,
           COALESCE(n_exact_unique, 0) AS n_exact_unique,
           COALESCE(n_kept, 0) AS n_kept,
           COALESCE(kept_bpe_tokens, 0) AS kept_bpe_tokens,
           avg_stop_ppm
    FROM s0
    LEFT JOIN s1 USING (lang)
    LEFT JOIN s2 USING (lang)
    LEFT JOIN s3 USING (lang)
    ORDER BY lang
    """,
)
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-prep funnel with per-language accounting:
    raw -> quality gate -> exact-dup removal -> bag-of-words near-dup
    removal, reporting per-stage survivor counts, the kept BPE token
    budget, and the kept-set average stopword rate in integer ppm
    (floor((1e6*stop_hits)/n_tokens) per doc, floor-averaged — the
    all-integer lane both engines compute bit-identically)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.array([F.lit(s) for s in STOPWORDS])
    stop_hits = (F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
                 .cast("long"))
    bpe = F.size(F.regexp_extract_all(
        "text", F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0))
    base = docs.select(
        "doc_id", "lang",
        F.size(toks).alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        bpe.alias("n_bpe_tokens"),
        F.md5("text").alias("digest"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
        .alias("fingerprint"),
    )
    quality = base.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (MIN_STOP_DEN * F.col("stop_hits")
           > MIN_STOP_NUM * F.col("n_tokens")))
    exact_uniq = (
        quality.withColumn(
            "keep_id", F.min("doc_id").over(Window.partitionBy("digest")))
        .filter(F.col("doc_id") == F.col("keep_id")))
    near_uniq = (
        exact_uniq.withColumn(
            "nkeep_id",
            F.min("doc_id").over(Window.partitionBy("fingerprint")))
        .filter(F.col("doc_id") == F.col("nkeep_id")))

    s0 = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n_raw"))
    s1 = quality.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    s2 = (exact_uniq.groupBy("lang")
          .agg(F.count(F.lit(1)).alias("n_exact_unique")))
    s3 = near_uniq.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_bpe_tokens").alias("kept_bpe_tokens"),
        F.expr(f"sum(({PPM} * stop_hits) DIV n_tokens) DIV count(1)")
        .cast("long").alias("avg_stop_ppm"),
    )
    return (
        s0.join(s1, "lang", "left")
        .join(s2, "lang", "left")
        .join(s3, "lang", "left")
        .select(
            "lang", "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_exact_unique", F.lit(0)).alias("n_exact_unique"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_bpe_tokens", F.lit(0)).alias("kept_bpe_tokens"),
            "avg_stop_ppm",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Corpus export: the dedup pipeline's MATERIALIZATION step
# ---------------------------------------------------------------------------

# (applicationId, sf_dir) -> landed TABLE NAME. The export writes ONCE
# per session (the corpus is deterministic), the census query reads the
# LANDED table — write-once / read-many, the same contract as the other
# per-session memos (registered with reset_handles()). Landed as a
# bucketed CTAS (lang-partitioned, doc_id-bucketed) so downstream joins
# against the cleaned corpus are exchange-free — see q_corpus_export.
_EXPORT_MEMO: dict[tuple[str, str], str] = register_memo({})

# doc_id bucket count of the landed corpus. 16 suffices at test SFs; at
# 100 TB size it so a bucket's files land near the target file size
# (buckets ~ corpus_bytes / 1 GB), same sizing rule as any bucketed fact
# table — the join-elision property is bucket-count-for-bucket-count.
EXPORT_BUCKETS = 16


def corpus_export_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LANDED training-ready corpus (write-once per session): lang-
    partitioned, doc_id-bucketed+sorted parquet behind a table name —
    reading it back carries hash(doc_id) output partitioning, so a
    downstream join against any equally-bucketed side (labels, scores,
    pack assignments) plans with NO exchange (plan-asserted in
    tests/test_insights.py). This is the bucket/sort spec the export
    sink promises for 100 TB downstream co-location."""
    import hashlib
    import re
    import tempfile

    from columnar_estimator_sample_spark.operators.dedup import (
        exactsubstr_apply, exactsubstr_keepfirst_spans,
    )
    from columnar_estimator_sample_spark.operators.graph import (
        neardup_removed,
    )
    from columnar_estimator_sample_spark.operators.partitioning import (
        bucketed_ctas,
    )
    from columnar_estimator_sample_spark.sources.tables import (
        fanout, register_tempdir,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    name = _EXPORT_MEMO.get(key)
    if name is None:
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text")
        kept = fanout(docs.join(neardup_removed(spark, sf_dir),
                                "doc_id", "left_anti"))
        cleaned = exactsubstr_apply(
            kept, spans=exactsubstr_keepfirst_spans(kept))
        tag = re.sub(r"[^0-9A-Za-z]+", "_",
                     os.path.basename(sf_dir.rstrip("/")) + "_"
                     + hashlib.md5(sf_dir.encode()).hexdigest()[:8] + "_"
                     + spark.sparkContext.applicationId)
        name = f"corpus_export_{tag}"
        base = register_tempdir(
            tempfile.mkdtemp(prefix="spark-graft-export-"))
        bucketed_ctas(
            spark, name,
            cleaned.filter(F.col("kept_toks") > 0)
            .select("doc_id", "lang", "clean_text"),
            "doc_id", n_buckets=EXPORT_BUCKETS,
            path=os.path.join(base, "corpus"), partition_by="lang")
        _EXPORT_MEMO[key] = name
    return spark.table(name)


def _corpus_export_oracle() -> str:
    from columnar_estimator_sample_spark.operators.dedup import (
        SPAN_K, SPAN_MAX_SPREAD, _minhash_pair_ctes,
    )
    from columnar_estimator_sample_spark.functions.hashing import sql_h64
    h = sql_h64("array_to_string(ws[CAST(i AS INT):"
                f"CAST(i + {SPAN_K - 1} AS INT)], ' ')")
    return f"""
    WITH RECURSIVE {_minhash_pair_ctes()},
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(doc_id, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.label
        FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (
        SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
    ),
    rem AS (
        SELECT doc_id FROM comp WHERE doc_id != cluster_id
    ),
    w AS MATERIALIZED (
        SELECT d.doc_id, d.lang, string_split(d.text, ' ') AS ws
        FROM documents d ANTI JOIN rem r ON r.doc_id = d.doc_id
    ),
    anchors AS MATERIALIZED (
        SELECT doc_id, u.p AS p, u.h AS h FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(ws) - {SPAN_K - 1}, 0) + 1),
                       i -> {{'p': i, 'h': {h}}})) AS u
            FROM w)
    ),
    spread AS (
        SELECT h FROM anchors GROUP BY h
        HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {SPAN_MAX_SPREAD}
    ),
    occ AS (
        SELECT a.doc_id, a.p,
               ROW_NUMBER() OVER (PARTITION BY a.h
                                  ORDER BY a.doc_id, a.p) AS rn
        FROM anchors a JOIN spread s ON s.h = a.h
    ),
    shared AS (
        SELECT doc_id, p FROM occ WHERE rn > 1
    ),
    isl AS (
        SELECT doc_id, p,
               CASE WHEN p > COALESCE(MAX(p + {SPAN_K - 1}) OVER (
                       PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS new_isl
        FROM shared
    ),
    grp AS (
        SELECT doc_id, p,
               SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS g
        FROM isl
    ),
    spans AS (
        SELECT doc_id, g, MIN(p) AS lo, MAX(p) + {SPAN_K - 1} AS hi
        FROM grp GROUP BY doc_id, g
    ),
    toks AS MATERIALIZED (
        SELECT doc_id, u.p AS p, u.tok AS tok FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws) + 1),
                       i -> {{'p': i, 'tok': ws[CAST(i AS INT)]}})) AS u
            FROM w)
    ),
    cov AS (
        SELECT DISTINCT t.doc_id, t.p
        FROM toks t JOIN spans s
          ON s.doc_id = t.doc_id AND t.p BETWEEN s.lo AND s.hi
    ),
    kept AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS kept_toks,
               CAST(SUM(len(t.tok)) AS BIGINT) AS kept_len
        FROM toks t ANTI JOIN cov c
          ON c.doc_id = t.doc_id AND c.p = t.p
        GROUP BY t.doc_id
    )
    SELECT w.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(k.kept_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(k.kept_len + GREATEST(k.kept_toks - 1, 0)) AS BIGINT)
               AS n_chars
    FROM kept k JOIN w ON w.doc_id = k.doc_id
    GROUP BY w.lang
    ORDER BY w.lang
    """


@register("q_corpus_export", oracle=_corpus_export_oracle())
def q_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's MATERIALIZATION step — the artifact every
    upstream census only priced: documents lose their near-dup cluster
    non-survivors (:func:`~columnar_estimator_sample_spark.operators.graph.neardup_removed`),
    the survivors lose later occurrences of every verbatim span
    (:func:`~columnar_estimator_sample_spark.operators.dedup.exactsubstr_keepfirst_spans`
    — the Lee et al. keep-one-copy rule), emptied docs drop, and the
    TRAINING-READY corpus lands as REAL parquet partitioned by lang
    (written once per session). The registered census reads the LANDED
    files back — per language: docs, whitespace tokens, characters —
    so the driver's hash gate certifies the bytes on disk, not an
    in-plan projection (the batch twin of q_stream_landing_census).

    Scale: both removal stages are the audited plans of their source
    queries (LSH+CC memo; anchor hashes only); the write is one
    bucketed CTAS — lang-partitioned for partition pruning AND
    doc_id-bucketed+sorted ({EXPORT_BUCKETS} buckets) so downstream
    joins against the cleaned corpus run exchange-free (plan-asserted;
    :func:`corpus_export_table` is the read handle); the census is a
    scan of the landed table with a |langs|-row aggregate."""
    landed = corpus_export_table(spark, sf_dir)
    return (landed.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.size(F.split("clean_text", " ")))
                 .cast("long").alias("n_tokens"),
                 F.sum(F.length("clean_text")).cast("long")
                 .alias("n_chars"))
            .orderBy("lang"))
