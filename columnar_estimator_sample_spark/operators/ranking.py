"""Full-text ranking over the document corpus: inverted index + BM25.

The reference's analytics tier is "load documents into a warehouse, then
rank aggregates" (top-20 ops by total duration, /root/reference/README.md:
210-222). This module is the text-retrieval expression of the same shape
over the driver's ``documents`` table: build a token->postings index with
one explode + hash aggregates, then score a keyword query with BM25.

Numeric design: BM25's (k1=1.2, b=0.75) scoring is restated in EXACT
integer arithmetic — every factor is a rational with a small denominator,
so each per-term score is one integer division producing a "permicro"
(1e-6) fixed-point long. Integer sums/divisions are order-independent and
bit-identical across engines, which keeps these queries on the oracle's
exact-hash surface (same trick as the rational idf in
textstats.q_tfidf_terms). ln()-based idf would rank identically (ln is
monotone) but costs cross-engine ulp risk for zero fidelity gain.

Scale: the token explode is a narrow map; everything after is hash
aggregation on (term) / (doc_id, term) keys plus a broadcast-size join of
per-term df stats onto per-doc-term tf stats. No all-pairs anything; at
100 TB the only shuffle is the (term)-keyed aggregate, and skewed hot
terms are bounded by the per-doc tf cap (a doc contributes one row per
distinct term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table

# The standing keyword query scored by q_bm25_search (3 mid-frequency
# corpus terms; any list works — scores are data-derived).
QUERY_TERMS = ("join", "vector", "stream")

TOP_TOKENS = 25
TOP_DOCS = 15


def _sql_terms() -> str:
    return ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "q_inverted_index",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok GROUP BY term, doc_id
    ),
    post AS (
        SELECT term,
               COUNT(*) AS df,
               CAST(SUM(tf) AS BIGINT) AS cf,
               CAST(MAX(tf) AS BIGINT) AS max_tf
        FROM tf GROUP BY term
    ),
    best AS (
        SELECT term, doc_id AS top_doc FROM (
            SELECT term, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY term
                                      ORDER BY tf DESC, doc_id) AS rk
            FROM tf)
        WHERE rk = 1
    )
    SELECT post.term, df, cf, max_tf, top_doc
    FROM post JOIN best ON post.term = best.term
    ORDER BY cf DESC, post.term
    LIMIT {TOP_TOKENS}
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings catalog: per term, document frequency, collection
    frequency, peak within-doc tf, and the argmax document (deterministic
    tie-break on doc_id). This is the index-build side of retrieval; the
    (doc_id, term) aggregate is map-side-combinable and the per-term
    rollup shuffles only one row per distinct (doc, term)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    post = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.max("tf").cast("long").alias("max_tf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    best = (tf.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("term", F.col("doc_id").alias("top_doc")))
    return (post.join(best, "term")
            .select("term", "df", "cf", "max_tf", "top_doc")
            .orderBy(F.desc("cf"), "term")
            .limit(TOP_TOKENS))


@register(
    "q_bm25_search",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ),
    corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS BIGINT) AS l FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM tok WHERE term IN ({_sql_terms()})
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST((CAST(44 AS HUGEINT) * corpus.l * tf.tf
                     * (2 * corpus.n - 2 * df.df + 1) * 1000000)
                    // ((CAST(20 AS HUGEINT) * corpus.l * tf.tf
                         + 6 * corpus.l + 18 * dl.dl * corpus.n)
                        * (2 * df.df + 1)) AS BIGINT)
               AS term_score
        FROM tf
        JOIN df ON tf.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id, corpus
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(term_score) AS BIGINT) AS score_micro
    FROM scored
    GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id
    LIMIT {TOP_DOCS}
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_DOCS} documents for the standing keyword query under BM25
    (k1=1.2, b=0.75), in exact permicro fixed point.

    Derivation of the integer form — per-term BM25 is

        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with avgdl = L/N (L = corpus token count, N = docs) and the standard
    rational idf (N - df + 1/2)/(df + 1/2). Multiplying numerator and
    denominator by 20*L and by 2 clears every fraction:

        num = 44*L*tf * (2N - 2df + 1)
        den = (20*L*tf + 6*L + 18*dl*N) * (2df + 1)
        score_micro = (num * 1_000_000) div den      -- one integer division

    All factors are positive integers and the per-doc score is an exact
    integer SUM of term scores (order-free — no float association
    hazard). num peaks near 1e6·44·L·tf·2N, which blows int64 already at
    ~1e7 corpus tokens (hit at sf1), so num/den ride 38-digit exact lanes
    — DECIMAL(38,0) in Spark, HUGEINT in DuckDB, identical integral
    division semantics — with headroom past a 1e10-token corpus.

    Scale: filters the token stream to the query terms BEFORE any shuffle
    (predicate on the exploded term — a narrow filter), aggregates
    (doc_id, term), broadcasts the tiny per-term df table and the 1-row
    corpus stats; one (doc_id)-keyed join against per-doc lengths.
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # corpus stats ride a 1-row broadcast INSIDE the plan (the round-2
    # "fold the count() into the plan" treatment) — no job at build time
    stats = dl.agg(F.count("*").cast("long").alias("bm25_n"),
                   F.sum("dl").cast("long").alias("bm25_l"))
    tf = (tok.filter(F.col("term").isin(*QUERY_TERMS))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n, l = F.col("bm25_n"), F.col("bm25_l")
    dec = "decimal(38,0)"
    num = (F.lit(44).cast(dec) * l * F.col("tf")
           * (2 * n - 2 * F.col("df") + 1) * F.lit(1_000_000))
    den = ((F.lit(20).cast(dec) * l * F.col("tf") + F.lit(6).cast(dec) * l
            + F.lit(18).cast(dec) * F.col("dl") * n)
           * (2 * F.col("df") + 1))
    scored = (tf.join(F.broadcast(df), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id",
                      num.cast(dec).alias("num"),
                      den.cast(dec).alias("den"))
              .select("doc_id",
                      F.expr("CAST(num DIV den AS BIGINT)")
                      .alias("term_score")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_terms"),
                 F.sum("term_score").cast("long").alias("score_micro"))
            .orderBy(F.desc("score_micro"), "doc_id")
            .limit(TOP_DOCS))


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid search)
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_TOP = 15


@register(
    "q_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), m AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE term IN ({{terms}})
        GROUP BY 1, 2
    ), df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM m GROUP BY term
    ), scores AS (
        SELECT m.doc_id,
               CAST(SUM(m.tf) AS BIGINT) AS score_tf,
               CAST(SUM(1000000 // df.df) AS BIGINT) AS score_rarity
        FROM m JOIN df USING (term)
        GROUP BY m.doc_id
    ), ranked AS (
        SELECT doc_id, score_tf, score_rarity,
               ROW_NUMBER() OVER (ORDER BY score_tf DESC, doc_id)
                   AS rank_tf,
               ROW_NUMBER() OVER (ORDER BY score_rarity DESC, doc_id)
                   AS rank_rarity
        FROM scores
    )
    SELECT doc_id, rank_tf, rank_rarity,
           (1000000 // ({RRF_K} + rank_tf))
               + (1000000 // ({RRF_K} + rank_rarity)) AS rrf_micro
    FROM ranked
    ORDER BY rrf_micro DESC, doc_id
    LIMIT {RRF_TOP}
    """.format(terms=_sql_terms()))
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two keyword rankers — the hybrid-search
    combinator of a modern retrieval stack (fuse BM25 with dense-vector
    ranks without score calibration, Cormack et al.'s 1/(k+rank) with
    k={RRF_K}), restated exactly: ranker one orders candidates by total
    query-term frequency, ranker two by rarity-weighted coverage
    (sum of 1e6/df over matched terms), and the fused score is the
    integer micro-scaled reciprocal-rank sum. Every rank is a
    ROW_NUMBER with doc_id tiebreak -> total order -> bit-exact fusion.

    Scale: the term filter pushes into the token explode BEFORE any
    shuffle (candidates only — same containment shape as q_bm25_search);
    the df side is a |terms|-row broadcast; both ranks run as
    value-histogram rank decompositions (corpus.rrf_rank — a prefix sum
    over the |distinct score values| frame plus an embarrassingly
    parallel within-value row_number; r14 — was a global row_number
    over the candidate set, the single-task shape the plan-audit
    window gate now rejects)."""
    from columnar_estimator_sample_spark.operators.corpus import rrf_rank
    docs = table(spark, sf_dir, "documents")
    m = (docs.select("doc_id",
                     F.explode(F.split("text", " ")).alias("term"))
         .filter(F.col("term").isin(*QUERY_TERMS))
         .groupBy("doc_id", "term")
         .agg(F.count("*").cast("long").alias("tf")))
    df = m.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scores = (m.join(F.broadcast(df), "term")
              .groupBy("doc_id")
              .agg(F.sum("tf").cast("long").alias("score_tf"),
                   F.sum(F.expr("1000000 div df")).cast("long")
                   .alias("score_rarity")))
    ranked = (scores
              .join(rrf_rank(scores, "score_tf")
                    .withColumnRenamed("rank_score_tf", "rank_tf"),
                    "doc_id")
              .join(rrf_rank(scores, "score_rarity")
                    .withColumnRenamed("rank_score_rarity", "rank_rarity"),
                    "doc_id"))
    return (ranked
            .select("doc_id", "rank_tf", "rank_rarity",
                    F.expr(f"(1000000 div ({RRF_K} + rank_tf))"
                           f" + (1000000 div ({RRF_K} + rank_rarity))")
                    .alias("rrf_micro"))
            .orderBy(F.desc("rrf_micro"), "doc_id")
            .limit(RRF_TOP))


# ---------------------------------------------------------------------------
# Phrase search (positional index)
# ---------------------------------------------------------------------------

PHRASE = ("vector", "stream")
PHRASE_TOP = 15


@register(
    "q_phrase_search",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS k
        FROM documents
    ), a AS (
        SELECT doc_id, k FROM pos WHERE tok = '{PHRASE[0]}'
    ), b AS (
        SELECT doc_id, k FROM pos WHERE tok = '{PHRASE[1]}'
    )
    SELECT a.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrase,
           MIN(a.k) AS first_pos
    FROM a JOIN b ON b.doc_id = a.doc_id AND b.k = a.k + 1
    GROUP BY 1
    ORDER BY n_phrase DESC, doc_id
    LIMIT {PHRASE_TOP}
    """)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search for "{PHRASE[0]} {PHRASE[1]}" via a positional
    index: token positions for each term, adjacency = an equi-join on
    (doc_id, position+1) — the positional-postings technique every
    full-text engine uses for phrase and proximity queries (slop-k is
    the same join with a BETWEEN band; q_bm25_search scores what this
    filters).

    Scale: term filters push into the explode so only the two terms'
    postings ever shuffle (doc-keyed equi-join, no arrays carried);
    the census is per-doc counts, top-k total-ordered."""
    docs = table(spark, sf_dir, "documents")
    pos = (docs.select("doc_id",
                       F.posexplode(F.split("text", " "))
                       .alias("j", "tok")))
    a = (pos.filter(F.col("tok") == PHRASE[0])
         .select("doc_id", (F.col("j") + 1).alias("k")))
    b = (pos.filter(F.col("tok") == PHRASE[1])
         .select("doc_id", (F.col("j") + 1).alias("k2")))
    return (a.join(b, (a.doc_id == b.doc_id)
                   & (b.k2 == a.k + 1))
            .groupBy(a.doc_id)
            .agg(F.count("*").cast("long").alias("n_phrase"),
                 F.min("k").alias("first_pos"))
            .orderBy(F.desc("n_phrase"), "doc_id")
            .limit(PHRASE_TOP))


# ---------------------------------------------------------------------------
# Postings compression census (delta + varint)
# ---------------------------------------------------------------------------


@register(
    "q_postings_delta",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS term, doc_id
        FROM documents
    ), t AS (SELECT term, doc_id FROM tok WHERE len(term) > 0),
    gaps AS (
        SELECT term,
               COALESCE(doc_id - LAG(doc_id)
                        OVER (PARTITION BY term ORDER BY doc_id),
                        doc_id) AS v
        FROM t
    ), sized AS (
        SELECT term,
               CASE WHEN v = 0 THEN 1
                    ELSE (length(bin(v)) + 6) // 7 END AS nbytes
        FROM gaps
    )
    SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
           CAST(SUM(nbytes) AS BIGINT) AS varint_bytes,
           (1000 * (8 * COUNT(*) - CAST(SUM(nbytes) AS BIGINT)))
               // (8 * COUNT(*)) AS saved_permille
    FROM sized
    """)
def q_postings_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-storage engineering census: what delta + varint encoding
    saves on the inverted index's postings lists — each term's sorted
    doc_ids become first-absolute + gaps, and each value costs
    ceil(bits/7) bytes (the LEB128/varint rule every real index format
    uses: Lucene, Parquet RLE hybrids, roaring containers). Dense terms
    compress hardest (small gaps -> 1 byte); the saved_permille headline
    is the number an index-sizing exercise starts from. bin()-string
    bit-length keeps the byte-cost expression identical in both engines
    — no log2, no floats.

    Scale: distinct (term, doc) collapse is map-side combinable; the
    LAG rides ONE term-keyed exchange (the same partitioning the index
    build itself needs); everything after is a scalar rollup. At 100 TB
    the census runs on the postings you are about to write anyway."""
    docs = table(spark, sf_dir, "documents")
    t = (docs.select(F.explode(F.split("text", " ")).alias("term"),
                     "doc_id")
         .filter(F.length("term") > 0)
         .distinct())
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = t.select(
        "term",
        F.coalesce(F.col("doc_id") - F.lag("doc_id").over(w),
                   F.col("doc_id")).alias("v"))
    sized = gaps.select(
        "term",
        F.expr("CASE WHEN v = 0 THEN 1"
               " ELSE (length(bin(v)) + 6) div 7 END").alias("nbytes"))
    return sized.agg(
        F.countDistinct("term").cast("long").alias("n_terms"),
        F.count("*").cast("long").alias("n_postings"),
        (8 * F.count("*")).cast("long").alias("raw_bytes"),
        F.sum("nbytes").cast("long").alias("varint_bytes"),
        F.expr("(1000 * (8 * COUNT(*) - CAST(SUM(nbytes) AS BIGINT)))"
               " div (8 * COUNT(*))").alias("saved_permille"))
