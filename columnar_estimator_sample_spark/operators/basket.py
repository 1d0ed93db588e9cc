"""Market-basket co-occurrence mining over the order fact table.

The reference's analytics tier is group-by aggregation over a flattened
fact stream (/root/reference/README.md:210-222); co-occurrence mining is
the same shape one self-join earlier: which parts appear together in the
same order, how often, and with what lift over independence. This is the
a-priori first pass (frequent items -> frequent pairs) expressed
relationally.

Scale design: the classic blow-up is the per-order pair explosion —
O(sum over orders of k²). The a-priori prune keeps only parts whose
item-level support clears a floor BEFORE pairing (downward closure: no
pair can be frequent if a member isn't), so the self-join runs on the
pruned item set; the join is keyed on l_orderkey so the shuffle is the
fact table's natural key, and the frequent-item filter is a broadcast
semi-join on each side. Lift is integer permille — exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table

ITEM_MINSUP = 3    # a part is frequent when it appears in >= 3 orders
PAIR_MINSUP = 2    # report pairs co-occurring in >= 2 orders
BASKET_TOP = 25


@register(
    "q_copurchase",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_ord AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
              FROM items),
    freq AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
        FROM items GROUP BY l_partkey
        HAVING COUNT(*) >= {ITEM_MINSUP}
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS support,
               MIN(fa.c) AS c_a, MIN(fb.c) AS c_b
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        JOIN freq fa ON fa.l_partkey = a.l_partkey
        JOIN freq fb ON fb.l_partkey = b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, support,
           (1000 * support * n_ord.n) // (c_a * c_b)
               AS lift_pm
    FROM pairs CROSS JOIN n_ord
    WHERE support >= {PAIR_MINSUP}
    ORDER BY support DESC, part_a, part_b
    LIMIT {BASKET_TOP}
    """,
)
def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs with lift: a-priori-pruned
    same-order self-join, support = co-occurring orders, lift_pm =
    1000 * support * n_orders / (c_a * c_b) (integer floor — >1000 means
    the parts co-occur more than independence predicts)."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    # 1-row broadcast, folded into the plan (no driver-side count() at
    # plan-construction time — same contract as q_markov_stationary).
    n_ord = (items.select("l_orderkey").distinct()
             .agg(F.count("*").cast("long").alias("n_orders")))
    freq = (items.groupBy("l_partkey")
            .agg(F.count("*").cast("long").alias("c"))
            .filter(F.col("c") >= ITEM_MINSUP))
    fa = freq.select(F.col("l_partkey").alias("part_a"),
                     F.col("c").alias("c_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"),
                     F.col("c").alias("c_b"))
    a = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(F.broadcast(fa), "part_a")
        .join(b.join(F.broadcast(fb), "part_b"), "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("support"),
             F.min("c_a").alias("c_a"), F.min("c_b").alias("c_b"))
        .filter(F.col("support") >= PAIR_MINSUP))
    return (
        pairs.crossJoin(F.broadcast(n_ord))
        .select(
            "part_a", "part_b", "support",
            F.expr("(1000 * support * n_orders) DIV (c_a * c_b)")
            .alias("lift_pm"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(BASKET_TOP)
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (cosine kNN graph)
# ---------------------------------------------------------------------------

CF_TOPN = 3       # neighbors kept per item
CF_LIMIT = 60     # report rows


@register(
    "q_item_cf",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
        FROM items GROUP BY l_partkey
        HAVING COUNT(*) >= {ITEM_MINSUP}
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS support,
               MIN(fa.c) AS c_a, MIN(fb.c) AS c_b
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        JOIN freq fa ON fa.l_partkey = a.l_partkey
        JOIN freq fb ON fb.l_partkey = b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {PAIR_MINSUP}
    ),
    sym AS (
        SELECT part_a AS item, part_b AS neighbor, support,
               (1000000 * support * support) // (c_a * c_b) AS cos2_ppm
        FROM pairs
        UNION ALL
        SELECT part_b AS item, part_a AS neighbor, support,
               (1000000 * support * support) // (c_a * c_b) AS cos2_ppm
        FROM pairs
    ),
    ranked AS (
        SELECT item, neighbor, support, cos2_ppm,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY cos2_ppm DESC, support DESC,
                                           neighbor) AS rnk
        FROM sym
    )
    SELECT item, CAST(rnk AS BIGINT) AS rnk, neighbor, support, cos2_ppm
    FROM ranked
    WHERE rnk <= {CF_TOPN}
    ORDER BY item, rnk
    LIMIT {CF_LIMIT}
    """,
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: each part's top-{CF_TOPN}
    "customers who bought this also bought" neighbors by cosine
    similarity over order-membership vectors — the batch half of an
    item-kNN recommender. Binary baskets make cosine(a,b) =
    support/sqrt(c_a*c_b); ranking is invariant under squaring, so the
    engines compare the exact integer cos² in ppm and no sqrt ever runs.

    Scale: reuses q_copurchase's a-priori-pruned pair mining (frequent
    items broadcast-filtered BEFORE the orderkey-keyed self-join — the
    shuffle is the fact table's natural key, never all-pairs), then the
    kNN selection is one window over the pair aggregate keyed by item.
    The neighbor lists are exactly the artifact a serving layer ships.

    Reference tie-in: the reference's pipeline feeds a recommender-style
    estimator on co-occurrence features (/root/reference/trainer.py:
    240-267); this is the co-occurrence model expressed as a query."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = (items.groupBy("l_partkey")
            .agg(F.count("*").cast("long").alias("c"))
            .filter(F.col("c") >= ITEM_MINSUP))
    fa = freq.select(F.col("l_partkey").alias("part_a"),
                     F.col("c").alias("c_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"),
                     F.col("c").alias("c_b"))
    a = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(F.broadcast(fa), "part_a")
        .join(b.join(F.broadcast(fb), "part_b"), "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("support"),
             F.min("c_a").alias("c_a"), F.min("c_b").alias("c_b"))
        .filter(F.col("support") >= PAIR_MINSUP)
        .withColumn("cos2_ppm",
                    F.expr("(1000000 * support * support)"
                           " div (c_a * c_b)")))
    sym = (pairs.select(F.col("part_a").alias("item"),
                        F.col("part_b").alias("neighbor"),
                        "support", "cos2_ppm")
           .unionByName(
               pairs.select(F.col("part_b").alias("item"),
                            F.col("part_a").alias("neighbor"),
                            "support", "cos2_ppm")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("item").orderBy(
        F.desc("cos2_ppm"), F.desc("support"), "neighbor")
    return (sym.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= CF_TOPN)
            .select("item", "rnk", "neighbor", "support", "cos2_ppm")
            .orderBy("item", "rnk")
            .limit(CF_LIMIT))
