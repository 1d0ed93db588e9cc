"""Property-based cross-engine invariants (hypothesis).

The whole correctness model rests on two claims:
  1. decimal-exact aggregation produces bit-identical doubles in Spark
     and DuckDB for ARBITRARY doubles (not just the testdata's 2-decimal
     money values);
  2. the md5-based portable hash produces identical values for arbitrary
     strings.

These tests generate adversarial inputs within the engine's numeric
contract (functions/exact.py): fixed-point values exactly representable
at scale <= 4 — money-like data, which is what every oracle-checked
column carries. Arbitrary doubles are deliberately OUT of contract: a
double within half an ulp of a decimal tie point (hypothesis found
3435974.5858500004) legally rounds to different scale-4 decimals in
Spark (shortest-string path) vs DuckDB (scaled-binary path).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# Fixed-point doubles: n / 10^d for d <= 4, |value| <= 1e9 — the
# decimal-exact tier's input contract. Both engines recover n exactly
# from the double, and any 40-term sum stays under 2^53/10^4 so the
# final decimal->double cast is exact-integer-then-one-division in both
# engines (beyond that, DuckDB's int128->double->/10^4 double-rounds
# while Spark's BigDecimal.toDouble single-rounds).
finite_doubles = st.builds(
    lambda n, d: n / (10 ** d),
    st.integers(min_value=-10**9, max_value=10**9),
    st.integers(min_value=0, max_value=4))

text_strat = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(finite_doubles, min_size=1, max_size=40))
def test_dsum_bit_identical(spark, xs):
    """dsum over arbitrary finite doubles == DuckDB's decimal sum, bitwise."""
    from columnar_estimator_sample_spark.functions.exact import dsum
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = df.agg(dsum(df.x, "s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(x),) for x in xs])
    want = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    assert got == want or (got is None and want is None), (got, want, xs)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(text_strat, min_size=1, max_size=20))
def test_h64_identical(spark, strings):
    """Portable 60-bit hash matches DuckDB for arbitrary unicode strings."""
    from columnar_estimator_sample_spark.functions.hashing import (
        h64, sql_h64,
    )
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"]
           for r in df.select("s", h64(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT s, {sql_h64('s')} FROM t").fetchall()}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 5), finite_doubles),
                min_size=1, max_size=50))
def test_grouped_dsum_bit_identical(spark, rows):
    """Grouped decimal sums stay bit-identical under arbitrary grouping —
    i.e. partial aggregation order cannot leak into results."""
    from columnar_estimator_sample_spark.functions.exact import dsum
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(k, float(v)) for k, v in rows],
                               "k int, v double").repartition(7)
    got = {r["k"]: r["s"] for r in
           df.groupBy("k").agg(dsum(F.col("v"), "s")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(k, float(v)) for k, v in rows])
    want = {r[0]: r[1] for r in con.execute(
        "SELECT k, CAST(SUM(CAST(v AS DECIMAL(27,4))) AS DOUBLE) FROM t"
        " GROUP BY k").fetchall()}
    assert got == want


def test_shingles_match_duckdb(spark):
    """Character shingling is identical across engines for tricky strings
    (shorter than k, exactly k, unicode)."""
    from columnar_estimator_sample_spark.operators.dedup import (
        _shingles_expr, _sql_shingles,
    )
    cases = ["", "ab", "abcdefgh", "abcdefghi", "ααββγγδδεε", "a b c d e"]
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    got = {r["text"]: sorted(r["sh"]) for r in df.select(
        "text", _shingles_expr("text").alias("sh")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in cases])
    want = {r[0]: sorted(r[1]) for r in con.execute(
        f"SELECT text, {_sql_shingles('text')} FROM t").fetchall()}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=5),
                          st.integers(min_value=0, max_value=1)),
                min_size=2, max_size=60)
       .filter(lambda xs: len({y for _, y in xs}) == 2))
def test_auc_closed_form_matches_pair_counting(spark, xs):
    """The grouped closed-form AUC (q_exact_auc's kernel) equals direct
    win/tie pair counting for arbitrary small (score, label) samples."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(int(s), int(y)) for s, y in xs],
                               "score long, y long")
    g = (df.groupBy("score")
         .agg(F.count("*").cast("long").alias("n_g"),
              F.sum("y").cast("long").alias("pos_g")))
    w = (Window.orderBy("score")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = g.withColumn("cum_before",
                     F.sum("n_g").over(w).cast("long") - F.col("n_g"))
    agg = c.agg(
        F.sum("pos_g").alias("p"),
        F.sum(F.expr("n_g - pos_g")).alias("n"),
        F.sum(F.expr("pos_g * (2 * cum_before + n_g + 1)")).alias("s2"))
    row = agg.select(
        F.expr("(1000000 * (s2 - p * (p + 1))) div (2 * p * n)")
        .alias("auc")).collect()[0]

    pos = sorted(s for s, y in xs if y == 1)
    neg = sorted(s for s, y in xs if y == 0)
    import bisect
    wins = ties = 0
    for s in pos:
        wins += bisect.bisect_left(neg, s)
        ties += bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s)
    want = (1_000_000 * (2 * wins + ties)) // (2 * len(pos) * len(neg))
    assert row.auc == want, (xs, row.auc, want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(-10**12, 10**12),
                          st.integers(1, 10**9)),
                min_size=1, max_size=20))
def test_sign_split_division_identical(spark, pairs):
    """The engine's signed-integer-division contract: DuckDB's `//`
    FLOORS while Spark's `div` TRUNCATES toward zero, so every oracle
    query with a possibly-negative numerator (q_ols_trend's slope/
    intercept) divides the non-negative magnitude and applies the sign
    outside. This pins that the sign-split form produces identical
    values in both engines for arbitrary (num, den) pairs."""
    sdf = spark.createDataFrame(pairs, "num long, den long")
    expr = ("CAST(CASE WHEN num >= 0 THEN num div den"
            " ELSE -((-num) div den) END AS BIGINT)")
    got = [r.q for r in
           sdf.selectExpr(f"{expr} AS q", "num", "den")
           .orderBy("num", "den").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    want = [r[0] for r in con.execute(
        "SELECT CASE WHEN num >= 0 THEN num // den"
        " ELSE -((-num) // den) END FROM t ORDER BY num, den").fetchall()]
    # both must equal python's magnitude-truncating division too
    ref = [(-((-n) // d) if n < 0 else n // d)
           for n, d in sorted(pairs)]
    assert got == want == ref


class TestLindleyClosedForm:
    """q_inventory_clamped's window identity, fuzzed: for ANY flow
    sequence, S_n - min(0, min_{k<=n} S_k) equals the sequential
    max(0, prev + d) recurrence."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.integers(min_value=-1000, max_value=1000),
                    min_size=0, max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_identity(self, flows):
        w = 0
        s = 0
        min_s = 0
        for d in flows:
            w = max(0, w + d)
            s += d
            min_s = min(min_s, s)
            assert w == s - min(0, min_s)


# --- sorted-neighborhood matching: Spark plan vs independent replay ----

_ADJ = ["red", "rd", "blue", "blu", "hot", "hut"]
_NOUN = ["bolt", "bol", "gear"]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from(_ADJ), st.sampled_from(_NOUN),
                          st.integers(0, 2), st.integers(0, 3)),
                min_size=2, max_size=30))
def test_snm_pairs_match_replay(spark, rows):
    """The LEAD-explode sorted-neighborhood plan emits EXACTLY the pairs
    a literal replay of the algorithm produces (block on (noun, size),
    sort by (name, key), window W, Levenshtein <= T) — including on
    adversarial near-collision names and duplicate records."""
    from columnar_estimator_sample_spark.operators.entity import (
        ER_LEV_T, ER_W, snm_pairs,
    )
    recs = [(i, f"{adj} {noun}", f"Brand#{brand}", size)
            for i, (adj, noun, size, brand) in enumerate(rows)]
    df = spark.createDataFrame(
        recs, "p_partkey long, p_name string, p_brand string, p_size int")
    got = {(r.part_a, r.part_b, r.lev, r.same_brand)
           for r in snm_pairs(df).collect()}

    want = set()
    blocks: dict[tuple, list] = {}
    for key, name, brand, size in recs:
        blocks.setdefault((name.split(" ")[1], size), []).append(
            (name, key, brand))
    for members in blocks.values():
        members.sort()
        for i, (na, ka, ba) in enumerate(members):
            for nb, kb, bb in members[i + 1:i + ER_W]:
                d = _lev(na, nb)
                if d <= ER_LEV_T:
                    want.add((ka, kb, d, int(ba == bb)))
    assert got == want


_PF_VOCAB = ["alpha", "beta", "gamma", "delta"]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(_PF_VOCAB), min_size=0,
                         max_size=6),
                min_size=2, max_size=14))
def test_prefix_filter_pairs_match_replay(spark, word_lists):
    """The contraction + length/prefix/positional-filter plan emits
    EXACTLY the word-3-gram Jaccard>=t pairs a literal replay computes —
    the tiny 4-word vocabulary forces frequent exact duplicates (stress
    for the supernode expansion) and heavy n-gram overlap (stress for
    the filters' completeness guarantee), plus token-less short docs."""
    from columnar_estimator_sample_spark.operators.dedup import (
        SSJOIN_T_MILLIS, prefix_filter_pairs,
    )
    texts = {i: " ".join(ws) for i, ws in enumerate(word_lists)}
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    got = {(r.doc_a, r.doc_b, r.inter_size, r.union_size,
            r.jaccard_millis)
           for r in prefix_filter_pairs(df).collect()}

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)} \
            if len(w) >= 3 else set()

    want = set()
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ga, gb = grams(texts[a]), grams(texts[b])
            if not ga or not gb:
                continue
            i, u = len(ga & gb), len(ga | gb)
            if 1000 * i >= SSJOIN_T_MILLIS * u:
                want.add((a, b, i, u, 1000 * i // u))
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(_PF_VOCAB), min_size=0,
                         max_size=6),
                min_size=2, max_size=14))
def test_cosine_setjoin_pairs_match_replay(spark, word_lists):
    """Same completeness property for the binary-cosine measure: the
    cosine-specific length/prefix/positional bounds must lose no pair
    vs a literal replay of i/sqrt(na*nb) >= t."""
    from columnar_estimator_sample_spark.operators.dedup import (
        SSJOIN_COS_T_MILLIS, cosine_setjoin_pairs,
    )
    texts = {i: " ".join(ws) for i, ws in enumerate(word_lists)}
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    got = {(r.doc_a, r.doc_b, r.inter_size, r.cos2_ppm)
           for r in cosine_setjoin_pairs(df).collect()}

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)} \
            if len(w) >= 3 else set()

    t2 = SSJOIN_COS_T_MILLIS * SSJOIN_COS_T_MILLIS
    want = set()
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ga, gb = grams(texts[a]), grams(texts[b])
            if not ga or not gb:
                continue
            i, na, nb = len(ga & gb), len(ga), len(gb)
            if 10**6 * i * i >= t2 * na * nb:
                want.add((a, b, i, 10**6 * i * i // (na * nb)))
    assert got == want
