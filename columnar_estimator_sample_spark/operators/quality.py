"""Data-quality expectations: a constraint audit over the warehouse.

The reference validates its data informally — pinned row counts
(/root/reference/trainer.py:36-37) and a held-out eval pass — and its
parse spec encodes per-column contracts (required label, typed defaults,
trainer.py:120-163). This module turns that idea into the standard
declarative data-quality audit (the Deequ / dbt-test / expectations
shape): each check yields (check_name, violations, total, pass) and the
query returns the whole scorecard in one DataFrame.

Scale design: checks are FUSED per table — all row-level predicates on
``lineitem`` are conditional sums inside ONE scan/aggregate, then
unpivoted to rows; only checks that need a different shape (referential
anti-join, key-uniqueness group-by, cross-table comparison) get their own
plan. At 100 TB you pay one pass per table plus one join per FK check,
not one pass per check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.functions.hashing import sql_h64
from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table


@register(
    "q_expectations",
    oracle="""
    WITH li AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN l_orderkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_null_key,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_qty_range,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_disc_range,
               CAST(SUM(CASE WHEN l_extendedprice <= 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS v_price_pos
        FROM lineitem
    ),
    pk AS (
        SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS dups,
               CAST(COALESCE(SUM(c), 0) AS BIGINT) AS total
        FROM (SELECT COUNT(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    ),
    fk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    ship AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                             THEN 1 ELSE 0 END) AS BIGINT) AS early
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT * FROM (
        SELECT 'lineitem.l_orderkey not null' AS check_name,
               v_null_key AS violations, total FROM li
        UNION ALL
        SELECT 'lineitem.l_quantity in [1,50]', v_qty_range, total FROM li
        UNION ALL
        SELECT 'lineitem.l_discount in [0,0.1]', v_disc_range, total FROM li
        UNION ALL
        SELECT 'lineitem.l_extendedprice > 0', v_price_pos, total FROM li
        UNION ALL
        SELECT 'lineitem pk (orderkey,linenumber) unique', dups, total FROM pk
        UNION ALL
        SELECT 'orders.o_custkey references customer', orphans, total FROM fk
        UNION ALL
        SELECT 'lineitem.l_shipdate >= orders.o_orderdate', early, total
        FROM ship
    )
    ORDER BY check_name
    """,
)
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse constraint scorecard: nullability, value ranges, primary
    key uniqueness, referential integrity, and a cross-table ordering
    invariant — one row per check with its violation count."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    def chk(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    # one fused scan for all row-level lineitem predicates
    fused = li.agg(
        F.count("*").cast("long").alias("total"),
        chk(F.col("l_orderkey").isNull()).alias("v_null_key"),
        chk((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .alias("v_qty_range"),
        chk((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1))
        .alias("v_disc_range"),
        chk(F.col("l_extendedprice") <= 0).alias("v_price_pos"),
    )
    row_checks = fused.selectExpr(
        """stack(4,
            'lineitem.l_orderkey not null', v_null_key,
            'lineitem.l_quantity in [1,50]', v_qty_range,
            'lineitem.l_discount in [0,0.1]', v_disc_range,
            'lineitem.l_extendedprice > 0', v_price_pos
        ) AS (check_name, violations)""", "total")

    pk = (li.groupBy("l_orderkey", "l_linenumber")
          .agg(F.count("*").alias("c"))
          .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long")
               .alias("violations"),
               F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("total"))
          .select(F.lit("lineitem pk (orderkey,linenumber) unique")
                  .alias("check_name"), "violations", "total"))

    fk = (orders.join(F.broadcast(cust),
                      orders.o_custkey == cust.c_custkey, "left")
          .agg(F.count("*").cast("long").alias("total"),
               chk(F.col("c_custkey").isNull()).alias("violations"))
          .select(F.lit("orders.o_custkey references customer")
                  .alias("check_name"), "violations", "total"))

    ship = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .agg(F.count("*").cast("long").alias("total"),
                 chk(F.col("l_shipdate") < F.col("o_orderdate"))
                 .alias("violations"))
            .select(F.lit("lineitem.l_shipdate >= orders.o_orderdate")
                    .alias("check_name"), "violations", "total"))

    return (row_checks.select("check_name", "violations", "total")
            .unionAll(pk).unionAll(fk).unionAll(ship)
            .orderBy("check_name"))


# ---------------------------------------------------------------------------
# Order-independent table checksums (replication / migration verification)
# ---------------------------------------------------------------------------

# (table, canonical key columns) — int/string only: float formatting is
# engine-specific, so doubles stay off the checksum surface by design.
_CHECKSUM_TABLES = [
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                  "l_returnflag"]),
    ("orders", ["o_orderkey", "o_custkey", "o_orderstatus"]),
    ("customer", ["c_custkey", "c_nationkey", "c_mktsegment"]),
    ("documents", ["doc_id", "lang", "source"]),
]
_CK_MOD = 1_099_511_627_776  # 2^40: checksum folds into a clean BIGINT


def _checksum_oracle() -> str:
    from columnar_estimator_sample_spark.functions.hashing import sql_h64
    parts = []
    for t, cols in _CHECKSUM_TABLES:
        canon = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        parts.append(
            f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(SUM({sql_h64(f'({canon})')}) % {_CK_MOD} AS BIGINT)"
            f" AS checksum40"
            f" FROM {t}")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name"


@register("q_table_checksum", oracle=_checksum_oracle())
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum per table: the SUM of portable
    row hashes over canonical key columns, folded to 40 bits. The
    standard anti-entropy primitive for verifying replication, migration,
    or engine-swap fidelity — two stores agree iff (n_rows, checksum)
    agree, regardless of row order or partitioning.

    Scale: embarrassingly parallel — per-row hash + a commutative SUM
    (map-side partials), no shuffle beyond the final 1-row-per-table
    merge; checksums of shards/partitions combine by addition, so
    incremental verification of an appended partition is O(partition).
    Floats are excluded from the canonical form: their string rendering
    is engine-specific, ints and strings are not."""
    from columnar_estimator_sample_spark.functions.hashing import h64
    parts = []
    for t, cols in _CHECKSUM_TABLES:
        canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        parts.append(
            table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.sum(h64(canon).cast("decimal(38,0)")) % _CK_MOD)
                .cast("long").alias("checksum40")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# Gini split-quality scoring (distributed decision-tree step 1)
# ---------------------------------------------------------------------------

# candidate split features over lineitem, as (name, SQL expression)
GINI_FEATURES = [
    ("linestatus", "l_linestatus"),
    ("quantity_decile", "CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100"
                        " AS BIGINT) // 1000 AS VARCHAR)"),
    ("discount_band", "CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100"
                      " AS BIGINT) // 2 AS VARCHAR)"),
]
_GINI_LABEL = "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"


def _gini_oracle() -> str:
    cells = "\n        UNION ALL ".join(
        f"SELECT '{n}' AS feature, {e} AS v, {_GINI_LABEL} AS y"
        f" FROM lineitem"
        for n, e in GINI_FEATURES)
    return f"""
    WITH base AS (
        {cells}
    ), cell AS (
        SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM base GROUP BY 1, 2
    ), parent AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS pp
        FROM cell WHERE feature = '{GINI_FEATURES[0][0]}'
    ), child AS (
        SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM((1000 * (CAST(n AS HUGEINT) * n
                                 - CAST(pos AS HUGEINT) * pos
                                 - CAST(n - pos AS HUGEINT) * (n - pos)))
                        // n) AS HUGEINT) AS t
        FROM cell GROUP BY feature
    )
    SELECT c.feature, c.n_values,
           CAST((1000 * (CAST(p.nn AS HUGEINT) * p.nn
                         - CAST(p.pp AS HUGEINT) * p.pp
                         - CAST(p.nn - p.pp AS HUGEINT) * (p.nn - p.pp)))
                // (CAST(p.nn AS HUGEINT) * p.nn) AS BIGINT)
               AS parent_gini_permille,
           CAST(c.t // p.nn AS BIGINT) AS child_gini_permille,
           CAST((1000 * (CAST(p.nn AS HUGEINT) * p.nn
                         - CAST(p.pp AS HUGEINT) * p.pp
                         - CAST(p.nn - p.pp AS HUGEINT) * (p.nn - p.pp)))
                // (CAST(p.nn AS HUGEINT) * p.nn)
                - c.t // p.nn AS BIGINT) AS gain_permille
    FROM child c CROSS JOIN parent p
    ORDER BY gain_permille DESC, feature
    """


@register("q_split_gini", oracle=_gini_oracle())
def q_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini split-quality scoring — step one of a distributed decision
    tree / feature-importance audit, all-integer: for each candidate
    categorical feature (linestatus, quantity decile, discount band) and
    the binary label returnflag='R', the parent Gini impurity, the
    split's weighted child impurity, and the impurity GAIN, in permille.
    Gini avoids entropy's logarithm entirely — every impurity is the
    rational (n² - pos² - neg²)/n² on exact 128-bit integer lanes, so the
    oracle matches bit for bit (per-cell floor division is part of the
    contract, identically in both engines).

    Scale: one scan fans out rows per feature (no per-feature rescan),
    collapses to (feature, value) cells with map-side partials — the
    classic histogram-based tree-learner layout where split evaluation
    touches aggregates only, never raw rows again."""
    li = table(spark, sf_dir, "lineitem")
    base = None
    for name, expr in GINI_FEATURES:
        spark_expr = expr.replace("//", "div").replace("VARCHAR", "STRING")
        f = li.select(F.lit(name).alias("feature"),
                      F.expr(spark_expr).alias("v"),
                      F.expr(_GINI_LABEL).alias("y"))
        base = f if base is None else base.unionByName(f)
    cell = (base.groupBy("feature", "v")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("y").cast("long").alias("pos")))
    parent = (cell.filter(F.col("feature") == GINI_FEATURES[0][0])
              .agg(F.sum("n").cast("long").alias("nn"),
                   F.sum("pos").cast("long").alias("pp")))
    child = (cell.groupBy("feature")
             .agg(F.count("*").cast("long").alias("n_values"),
                  F.sum(F.expr(
                      "(1000 * (CAST(n AS DECIMAL(38,0)) * n"
                      " - CAST(pos AS DECIMAL(38,0)) * pos"
                      " - CAST(n - pos AS DECIMAL(38,0)) * (n - pos)))"
                      " div n"))
                  .cast("decimal(38,0)").alias("t")))
    parent_pm = ("CAST((1000 * (CAST(nn AS DECIMAL(38,0)) * nn"
                 " - CAST(pp AS DECIMAL(38,0)) * pp"
                 " - CAST(nn - pp AS DECIMAL(38,0)) * (nn - pp)))"
                 " div (CAST(nn AS DECIMAL(38,0)) * nn) AS BIGINT)")
    return (child.crossJoin(F.broadcast(parent))
            .select("feature", "n_values",
                    F.expr(parent_pm).alias("parent_gini_permille"),
                    F.expr("CAST(t div nn AS BIGINT)")
                    .alias("child_gini_permille"),
                    (F.expr(parent_pm)
                     - F.expr("CAST(t div nn AS BIGINT)"))
                    .alias("gain_permille"))
            .orderBy(F.desc("gain_permille"), "feature"))


# ---------------------------------------------------------------------------
# Exact AUC + calibration/lift (model-evaluation family)
# ---------------------------------------------------------------------------

# "model score" proxy: the discount band; label: returned lineitems.
_SCORE = "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q_exact_auc",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE} AS score, {_GINI_LABEL} AS y FROM lineitem
    ), g AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS pos_g
        FROM s GROUP BY score
    ), c AS (
        SELECT score, n_g, pos_g,
               CAST(SUM(n_g) OVER (ORDER BY score) AS BIGINT) - n_g
                   AS cum_before
        FROM g
    ), agg AS (
        SELECT CAST(SUM(pos_g) AS BIGINT) AS p,
               CAST(SUM(n_g - pos_g) AS BIGINT) AS n,
               CAST(SUM(CAST(pos_g AS HUGEINT)
                        * (2 * cum_before + n_g + 1)) AS HUGEINT) AS s2
        FROM c
    )
    SELECT p AS n_pos, n AS n_neg,
           CAST((1000000 * (s2 - CAST(p AS HUGEINT) * (p + 1)))
                // (2 * CAST(p AS HUGEINT) * n) AS BIGINT) AS auc_micro
    FROM agg
    """)
def q_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed AUC (Mann-Whitney U with tie-corrected average
    ranks), no sampling and no sort of raw rows: rows collapse to score
    GROUPS first, average ranks of tie groups come from the closed form
    (2*cum_before + n_g + 1)/2 on the cumulative group counts — kept
    doubled so everything stays integer — and AUC = (S2 - P(P+1)) /
    (2PN) in exact micro-units. The standard "how discriminative is this
    score" metric, here scoring the discount band against returned
    items.

    Scale: one scan -> |distinct scores| rows; the rank window rides the
    tiny group table (score cardinality, not corpus); 128-bit lanes for
    the rank sums. This is how AUC is computed exactly on 100 TB —
    never by ordering raw predictions."""
    li = table(spark, sf_dir, "lineitem")
    g = (li.select(F.expr(_SCORE).alias("score"),
                   F.expr(_GINI_LABEL).alias("y"))
         .groupBy("score")
         .agg(F.count("*").cast("long").alias("n_g"),
              F.sum("y").cast("long").alias("pos_g")))
    from pyspark.sql import Window
    w = (Window.orderBy("score")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = g.withColumn("cum_before",
                     F.sum("n_g").over(w).cast("long") - F.col("n_g"))
    agg = c.agg(
        F.sum("pos_g").cast("long").alias("p"),
        F.sum(F.expr("n_g - pos_g")).cast("long").alias("n"),
        F.sum(F.expr("CAST(pos_g AS DECIMAL(38,0))"
                     " * (2 * cum_before + n_g + 1)"))
        .cast("decimal(38,0)").alias("s2"))
    return agg.select(
        F.col("p").alias("n_pos"), F.col("n").alias("n_neg"),
        F.expr("CAST((1000000 * (s2 - CAST(p AS DECIMAL(38,0)) * (p + 1)))"
               " div (2 * CAST(p AS DECIMAL(38,0)) * n) AS BIGINT)")
        .alias("auc_micro"))


@register(
    "q_calibration_bins",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE} AS score, {_GINI_LABEL} AS y FROM lineitem
    ), b AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM s GROUP BY score
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(pos) AS BIGINT) AS tp
        FROM b
    )
    SELECT b.score, b.n, b.pos,
           (1000 * b.pos) // b.n AS pos_rate_permille,
           ((1000 * b.pos) // b.n) * 1000
               // GREATEST((1000 * t.tp) // t.tn, 1) AS lift_permille
    FROM b CROSS JOIN tot t
    ORDER BY b.score
    """)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / lift table for the score of q_exact_auc: per score
    band, the observed positive rate and its lift over the base rate
    (1000 = average). Together with the AUC this is the standard offline
    model-evaluation pair — discrimination (AUC) plus calibration (does
    a band's observed rate match its nominal score) — all integer.

    Scale: same |scores|-row aggregate as the AUC; base rate broadcasts
    from a 1-row total."""
    li = table(spark, sf_dir, "lineitem")
    b = (li.select(F.expr(_SCORE).alias("score"),
                   F.expr(_GINI_LABEL).alias("y"))
         .groupBy("score")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("y").cast("long").alias("pos")))
    tot = b.agg(F.sum("n").cast("long").alias("tn"),
                F.sum("pos").cast("long").alias("tp"))
    return (b.crossJoin(F.broadcast(tot))
            .select("score", "n", "pos",
                    F.expr("(1000 * pos) div n").alias("pos_rate_permille"),
                    F.expr("((1000 * pos) div n) * 1000"
                           " div GREATEST((1000 * tp) div tn, 1)")
                    .alias("lift_permille"))
            .orderBy("score"))


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test (exact, distributed CDFs)
# ---------------------------------------------------------------------------


@register(
    "q_ks_test",
    oracle=f"""
    WITH cells AS (
        SELECT {_SCORE.replace('l_discount', 'l_extendedprice')} AS cents,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
                    AS BIGINT) AS n2
        FROM lineitem GROUP BY 1
    ), cum AS (
        SELECT cents,
               CAST(SUM(n1) OVER (ORDER BY cents) AS BIGINT) AS c1,
               CAST(SUM(n2) OVER (ORDER BY cents) AS BIGINT) AS c2
        FROM cells
    ), tot AS (
        SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2
        FROM cells
    ), diffs AS (
        SELECT cents,
               ABS(CAST(c1 AS HUGEINT) * t.t2 - CAST(c2 AS HUGEINT) * t.t1)
                   AS d
        FROM cum CROSS JOIN tot t
    )
    SELECT t.t1 AS n_returned, t.t2 AS n_kept,
           CAST((1000 * d.d) // (CAST(t.t1 AS HUGEINT) * t.t2) AS BIGINT)
               AS ks_permille,
           d.cents AS argmax_cents
    FROM diffs d CROSS JOIN tot t
    ORDER BY d.d DESC, d.cents
    LIMIT 1
    """)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic: does the price
    distribution of RETURNED lineitems differ from kept ones? KS is the
    max gap between the two empirical CDFs — computed exactly by
    aggregating to price levels (cents), running BOTH cumulative counts
    through :func:`two_phase_cumsum` (range-partitioned prefix sums — the
    CDF of 100 TB never serializes through one window task), and taking
    the max of |c1*T2 - c2*T1| by integer cross-multiplication. Returns
    the statistic in permille and the price where the distributions
    diverge most.

    No distributional assumptions, no logs, no floats — the
    nonparametric sibling of q_chi_square."""
    from columnar_estimator_sample_spark.operators.corpus import (
        two_phase_cumsum)
    li = table(spark, sf_dir, "lineitem")
    cents = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    cells = (li.select(F.expr(cents).alias("cents"),
                       F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0"
                              " END").alias("y"))
             .groupBy("cents")
             .agg(F.sum("y").cast("long").alias("n1"),
                  F.sum(F.expr("1 - y")).cast("long").alias("n2")))
    c1 = two_phase_cumsum(cells, "cents", "n1", "c1").select("cents", "c1")
    c2 = two_phase_cumsum(cells, "cents", "n2", "c2").select("cents", "c2")
    cum = c1.join(c2, "cents")
    tot = cells.agg(F.sum("n1").cast("long").alias("t1"),
                    F.sum("n2").cast("long").alias("t2"))
    diffs = (cum.crossJoin(F.broadcast(tot))
             .select("cents", "t1", "t2",
                     F.expr("ABS(CAST(c1 AS DECIMAL(38,0)) * t2"
                            " - CAST(c2 AS DECIMAL(38,0)) * t1)")
                     .alias("d")))
    return (diffs
            .orderBy(F.desc("d"), "cents")
            .limit(1)
            .select(F.col("t1").alias("n_returned"),
                    F.col("t2").alias("n_kept"),
                    F.expr("CAST((1000 * d)"
                           " div (CAST(t1 AS DECIMAL(38,0)) * t2)"
                           " AS BIGINT)").alias("ks_permille"),
                    F.col("cents").alias("argmax_cents")))


# ---------------------------------------------------------------------------
# Join-discovery census (value-set containment)
# ---------------------------------------------------------------------------

# candidate (fact column, dim column) pairs scanned by the discovery pass;
# the last pair is a deliberate non-join (the census should score it ~0)
JOINABILITY_PAIRS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("orders", "o_orderkey", "supplier", "s_suppkey"),
]


def _joinability_oracle() -> str:
    blocks = []
    for i, (ta, ca, tb, cb) in enumerate(JOINABILITY_PAIRS):
        blocks.append(f"""
    SELECT '{ta}.{ca} -> {tb}.{cb}' AS pair,
           a.n AS n_a, b.n AS n_b, i.n AS n_inter,
           (1000 * i.n) // a.n AS containment_permille
    FROM (SELECT CAST(COUNT(DISTINCT {ca}) AS BIGINT) AS n FROM {ta}) a,
         (SELECT CAST(COUNT(DISTINCT {cb}) AS BIGINT) AS n FROM {tb}) b,
         (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
             (SELECT DISTINCT {ca} AS v FROM {ta})
             JOIN (SELECT DISTINCT {cb} AS v FROM {tb}) USING (v)) i""")
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY pair"


@register("q_joinability", oracle=_joinability_oracle())
def q_joinability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-discovery census: for candidate column pairs, the exact
    value-set containment |A∩B|/|A| in permille — the statistic that
    auto-detects foreign keys in a data catalog (near 1000 = every fact
    value resolves in the dimension; near 0 = not a join path; the list
    deliberately includes one non-join pair as the control). This is the
    relational core of dataset-search systems' "joinability" indexes.

    Scale: each side collapses to its DISTINCT value set first (map-side
    partial), the intersection is a distinct-distinct equi-join, and at
    100 TB the same census runs on minhash/bitmap summaries (the
    engine's q_dedup_minhash_lsh and q_bitmap_retention machinery) —
    this exact version IS the oracle those sketches approximate."""
    out = None
    for ta, ca, tb, cb in JOINABILITY_PAIRS:
        a = table(spark, sf_dir, ta).select(F.col(ca).alias("v")).distinct()
        b = table(spark, sf_dir, tb).select(F.col(cb).alias("v")).distinct()
        na = a.agg(F.count("*").cast("long").alias("n_a"))
        nb = b.agg(F.count("*").cast("long").alias("n_b"))
        ni = a.join(b, "v").agg(F.count("*").cast("long").alias("n_inter"))
        row = (na.crossJoin(nb).crossJoin(ni)
               .select(F.lit(f"{ta}.{ca} -> {tb}.{cb}").alias("pair"),
                       "n_a", "n_b", "n_inter",
                       F.expr("(1000 * n_inter) div n_a")
                       .alias("containment_permille")))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pair")


# ---------------------------------------------------------------------------
# Completeness matrix (null census per table)
# ---------------------------------------------------------------------------

COMPLETENESS_COLS = [
    ("orders", ["o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"]),
    ("documents", ["text", "lang", "source", "n_chars"]),
    ("embeddings", ["embedding", "label"]),
]


def _completeness_oracle() -> str:
    blocks = []
    for t, cols in COMPLETENESS_COLS:
        cells = ", ".join(
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_{c}" for c in cols)
        blocks.append(
            f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT)"
            f" AS n_rows, {cells} FROM {t}")
    selects = []
    for t, cols in COMPLETENESS_COLS:
        for c in cols:
            selects.append(
                f"SELECT table_name, '{c}' AS column_name, n_rows,"
                f" n_{c} AS n_nulls,"
                f" (1000000 * n_{c}) // n_rows AS null_ppm"
                f" FROM t_{t}")
    ctes = ", ".join(f"t_{t} AS ({b})"
                     for (t, _), b in zip(COMPLETENESS_COLS, blocks))
    return ("WITH " + ctes + "\n"
            + "\nUNION ALL\n".join(selects)
            + "\nORDER BY table_name, column_name")


@register("q_completeness", oracle=_completeness_oracle())
def q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness matrix: per (table, column), the exact null count
    and null rate in ppm — the first page of any data-quality dashboard
    and the complement of q_expectations' pass/fail checks (this is the
    continuous measurement, that is the contract gate).

    Scale: ONE fused scan per table computes every column's null
    conditional-sum (the same scan-fusion as q_expectations), then
    unpivots to rows — never a scan per column."""
    out = None
    for t, cols in COMPLETENESS_COLS:
        df = table(spark, sf_dir, t)
        agg = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            *[F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
              .cast("long").alias(f"n_{c}") for c in cols])
        stack = ", ".join(f"'{c}', n_{c}" for c in cols)
        rows = agg.selectExpr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls)",
            "n_rows").select(
                F.lit(t).alias("table_name"), "column_name", "n_rows",
                "n_nulls",
                F.expr("(1000000 * n_nulls) div n_rows").alias("null_ppm"))
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------------------------------
# K-anonymity / l-diversity audit
# ---------------------------------------------------------------------------

KA_THRESHOLDS = (2, 5, 10)


@register(
    "q_k_anonymity",
    oracle=f"""
    WITH q AS (
        SELECT c_nationkey AS nat,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 100000 AS bal_k,
               c_mktsegment AS sens
        FROM customer
    ), classes AS (
        SELECT nat, bal_k,
               CAST(COUNT(*) AS BIGINT) AS sz,
               CAST(COUNT(DISTINCT sens) AS BIGINT) AS n_sens
        FROM q GROUP BY 1, 2
    )
    SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS min_class,
           CAST(MAX(sz) AS BIGINT) AS max_class,
           {", ".join(
               f"CAST((1000 * CAST(SUM(CASE WHEN sz < {k} THEN sz ELSE 0"
               f" END) AS BIGINT)) // SUM(sz) AS BIGINT) AS risk{k}_pm"
               for k in KA_THRESHOLDS)},
           CAST(MIN(n_sens) AS BIGINT) AS l_diversity_min
    FROM classes
    """)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity / l-diversity audit of the customer table — the
    re-identification-risk scorecard a governance pass runs BEFORE a
    dataset ships (the quantitative sibling of q_pii_redaction's
    scrubbing): quasi-identifiers are (nation, account-balance $1000
    bucket); each equivalence class's size is the crowd a record hides
    in. risk{{k}}_pm = permille of rows in classes smaller than k
    (k in {KA_THRESHOLDS}; risk2 counts records UNIQUE on their QI —
    directly linkable), and l_diversity_min is the smallest number of
    distinct sensitive values (market segment) in any class — size-k
    classes with one sensitive value leak the attribute without
    re-identification.

    Scale: one scan -> QI-keyed aggregate (combiner-friendly count +
    distinct over a 5-value domain) -> scalar rollup; the classes frame
    is |QI-domain|-sized, independent of row count."""
    cust = table(spark, sf_dir, "customer")
    q = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
               " div 100000").alias("bal_k"),
        F.col("c_mktsegment").alias("sens"))
    classes = (q.groupBy("nat", "bal_k")
               .agg(F.count("*").cast("long").alias("sz"),
                    F.countDistinct("sens").cast("long").alias("n_sens")))
    risk = [F.expr(f"(1000 * CAST(SUM(CASE WHEN sz < {k} THEN sz"
                   f" ELSE 0 END) AS BIGINT)) div SUM(sz)")
            .alias(f"risk{k}_pm") for k in KA_THRESHOLDS]
    return classes.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("sz").cast("long").alias("min_class"),
        F.max("sz").cast("long").alias("max_class"),
        *risk,
        F.min("n_sens").cast("long").alias("l_diversity_min"))


# ---------------------------------------------------------------------------
# Differentially-private histogram release (discrete geometric mechanism)
# ---------------------------------------------------------------------------

DP_EPS_PERMILLE = 500    # epsilon = 0.5 per release (sensitivity 1)
DP_NOISE_BOUND = 32      # CDF tail beyond +/-32 is < 1e-6 at eps=0.5
DP_U_MOD = 1_000_000


def _dp_noise_case(u_expr: str) -> str:
    """CASE expression mapping a uniform integer in [0, 1e6) to a
    discrete-Laplace (two-sided geometric) noise draw via its inverse
    CDF. P(K=k) = (1-a)/(1+a) * a^|k| with a = exp(-eps); the CDF
    thresholds are computed ONCE here in Python and embedded as integer
    literals, so Spark and the DuckDB oracle evaluate the identical
    integer comparison chain — no runtime float math, no cross-engine
    ulp risk. This is the geometric mechanism of Ghosh et al. (2009),
    the canonical eps-DP release for integer counts (sensitivity-1
    histograms: add/remove one document shifts one bucket by 1)."""
    import math
    a = math.exp(-DP_EPS_PERMILLE / 1000.0)
    branches = []
    for k in range(-DP_NOISE_BOUND, DP_NOISE_BOUND):
        if k < 0:
            cdf = a ** (-k) / (1.0 + a)
        else:
            cdf = 1.0 - a ** (k + 1) / (1.0 + a)
        t = int(math.floor(cdf * DP_U_MOD))
        branches.append(f"WHEN {u_expr} < {t} THEN {k}")
    return ("CASE " + " ".join(branches)
            + f" ELSE {DP_NOISE_BOUND} END")


@register(
    "q_dp_release",
    oracle=f"""
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source
    ), noised AS (
        SELECT source, n,
               {_dp_noise_case(
                   sql_h64("'dp|' || source") + f" % {DP_U_MOD}")} AS noise
        FROM c
    )
    SELECT source,
           GREATEST(n + noise, 0) AS noisy_docs,
           CAST({DP_EPS_PERMILLE} AS BIGINT) AS epsilon_permille
    FROM noised
    ORDER BY source
    """)
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-source document counts: the governance
    sibling of q_k_anonymity for when aggregate statistics must SHIP
    (dataset cards, public dashboards) — each bucket count is released
    through the eps=0.5 discrete geometric mechanism, integer noise
    drawn by inverse-CDF lookup on a salted hash of the bucket key, and
    clamped at zero. True counts never appear in the output. The salted
    hash stands in for a secure RNG so the release is reproducible
    across engines for differential testing; a production release would
    swap in one secret draw per bucket, leaving plan shape unchanged.

    Scale: one combiner-friendly count per source, a |sources|-row
    stateless noise map, no extra exchange beyond the group-by."""
    docs = table(spark, sf_dir, "documents")
    u = ("CAST(conv(substr(md5('dp|' || source), 1, 15), 16, 10)"
         f" AS BIGINT) % {DP_U_MOD}")
    return (
        docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
        .withColumn("noise", F.expr(_dp_noise_case(u)))
        .select(
            "source",
            F.expr("GREATEST(n + noise, 0)").alias("noisy_docs"),
            F.lit(DP_EPS_PERMILLE).cast("long").alias("epsilon_permille"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Precision/recall/F1 threshold sweep (operating-point selection)
# ---------------------------------------------------------------------------


@register(
    "q_f1_threshold",
    oracle=f"""
    WITH s AS (
        SELECT {_SCORE} AS score, {_GINI_LABEL} AS y FROM lineitem
    ), g AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS pos_g
        FROM s GROUP BY score
    ), tot AS (
        SELECT CAST(SUM(pos_g) AS BIGINT) AS p_all FROM g
    ), c AS (
        SELECT score,
               CAST(SUM(pos_g) OVER (ORDER BY score DESC) AS BIGINT)
                   AS tp,
               CAST(SUM(n_g - pos_g) OVER (ORDER BY score DESC)
                    AS BIGINT) AS fp
        FROM g
    )
    SELECT c.score AS threshold, c.tp, c.fp,
           t.p_all - c.tp AS fn,
           (1000000 * c.tp) // (c.tp + c.fp) AS precision_micro,
           (1000000 * c.tp) // t.p_all AS recall_micro,
           (2000000 * c.tp) // (2 * c.tp + c.fp + (t.p_all - c.tp))
               AS f1_micro
    FROM c, tot t
    ORDER BY threshold
    """)
def q_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection for the score q_exact_auc grades: sweep
    every distinct score as a decision threshold (predict positive when
    score >= t) and report the exact confusion counts plus integer-micro
    precision/recall/F1 — the PR curve a practitioner reads to pick the
    deployment threshold after AUC says the score ranks well.

    Scale: identical shape to q_exact_auc — rows collapse to score
    GROUPS in one combiner aggregate, and the sweep is two cumulative
    windows over the |distinct scores| frame. No per-row threshold
    loop, no repeated scans: the full curve costs one pass regardless
    of corpus size."""
    li = table(spark, sf_dir, "lineitem")
    from pyspark.sql.window import Window as W
    g = (li.select(F.expr(_SCORE).alias("score"),
                   F.expr(_GINI_LABEL).alias("y"))
         .groupBy("score")
         .agg(F.count("*").cast("long").alias("n_g"),
              F.sum("y").cast("long").alias("pos_g")))
    tot = g.agg(F.sum("pos_g").cast("long").alias("p_all"))
    w = (W.orderBy(F.desc("score"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = (g.withColumn("tp", F.sum("pos_g").over(w).cast("long"))
         .withColumn("fp", F.sum(F.expr("n_g - pos_g")).over(w)
                     .cast("long")))
    return (c.crossJoin(F.broadcast(tot))
            .select(
                F.col("score").alias("threshold"), "tp", "fp",
                F.expr("p_all - tp").alias("fn"),
                F.expr("(1000000 * tp) div (tp + fp)")
                .alias("precision_micro"),
                F.expr("(1000000 * tp) div p_all").alias("recall_micro"),
                F.expr("(2000000 * tp) div (2 * tp + fp + (p_all - tp))")
                .alias("f1_micro"))
            .orderBy("threshold"))
