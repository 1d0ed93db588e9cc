"""Relational operator suite (scan / filter / project / join / agg / sort /
limit / window / set ops / grouping sets).

The reference's own relational surface is scan -> flatten -> project ->
aggregate -> sort -> limit (SURVEY.md §2, /root/reference/README.md:179-222);
this module carries that surface onto the TPC-H-ish testdata and widens it
to the standard operator inventory a warehouse engine needs (joins incl.
semi/anti, windows, rollup/cube, set ops, subqueries) — all DataFrame-API,
all Catalyst-optimizable, each paired with a DuckDB oracle.

Determinism rules used throughout (so the oracle hash-matches):
  * floating aggregates go through functions.exact (decimal-exact);
  * every ORDER BY ... LIMIT has a unique tiebreaker key;
  * timestamps are emitted as formatted strings, never raw;
  * no approximate or RNG-dependent functions.

Scale notes are inline per query; the general stance: small dims
(region/nation/supplier at TPC-H ratios) are explicitly broadcast, fact-fact
joins stay sort-merge on their natural keys, aggregations rely on Catalyst
partial aggregation, and top-k is expressed as orderBy+limit so Catalyst
plans TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from columnar_estimator_sample_spark.functions.exact import (
    davg, dsum, dec, sql_davg, sql_dsum,
)
from columnar_estimator_sample_spark.registry import register
from columnar_estimator_sample_spark.sources.tables import table


# --------------------------------------------------------------------------
# Q1 family: filter + wide aggregation (TPC-H Q1 shape; reference analogue:
# the 4-way duration aggregation at README.md:210-222).
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle="""
    WITH d AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity      AS DECIMAL(12,2)) AS qty_d,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS price_d,
               CAST(l_discount      AS DECIMAL(4,2))  AS disc_d,
               CAST(l_tax           AS DECIMAL(4,2))  AS tax_d
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty_d)   AS DOUBLE) AS sum_qty,
           CAST(SUM(price_d) AS DOUBLE) AS sum_base_price,
           CAST(SUM(price_d * (CAST(1 AS DECIMAL(3,2)) - disc_d))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(price_d * (CAST(1 AS DECIMAL(3,2)) - disc_d)
                            * (CAST(1 AS DECIMAL(3,2)) + tax_d))
                AS DOUBLE) AS sum_charge,
           CAST(SUM(qty_d)   AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(price_d) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(disc_d)  AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM d
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: predicate + 8-aggregate hash aggregation.

    Money columns are 2-decimal values stored as doubles; casting them to
    decimal FIRST and doing all arithmetic in decimal keeps every product
    and sum exact (a double product cast to decimal afterwards can round
    differently across engines at scale boundaries).

    Scale: the shipdate predicate is pushed to the parquet scan
    (row-group min/max skipping); the groupBy has 6 groups so partial
    aggregation collapses nearly all rows map-side — shuffle is O(groups),
    not O(rows).
    """
    li = table(spark, sf_dir, "lineitem")
    # discount/tax are 2-decimal values, so scale-2 casts are lossless and
    # the widest product (charge) has scale 6: its summed integer stays
    # below 2^53 and decimal->double is ONE correctly-rounded IEEE division
    # in both engines (wider scales would round twice in DuckDB -> 1-ulp
    # skew; rescaling first can hit half-way ties the engines break
    # differently).
    qty_d = F.col("l_quantity").cast("decimal(12,2)")
    price_d = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_d = F.col("l_discount").cast("decimal(4,2)")
    tax_d = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = price_d * (one - disc_d)
    charge = disc_price * (one + tax_d)
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00")
                  .cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_d).cast("double").alias("sum_qty"),
            F.sum(price_d).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty_d).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price_d).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc_d).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------

@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k (TPC-H Q3 shape).

    Scale: customer (filtered to one segment) is small relative to the
    facts -> AQE converts its join to broadcast at runtime; orders⋈lineitem
    stays sort-merge on the orderkey. Top-k = TakeOrderedAndProject, no
    global sort. Unique tiebreaker (l_orderkey) keeps LIMIT deterministic.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cust = (table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_regional_revenue",
    oracle=f"""
    SELECT n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join (TPC-H Q5 shape): local-supplier revenue by nation.

    Scale: region/nation/supplier are true dimensions — broadcast them
    explicitly so the only shuffles are the two fact joins
    (orders⋈customer-keyed, lineitem⋈orders). CBO's join reordering (fed by
    plans/stats.py) would pick the same shape from NDV stats.
    """
    region = table(spark, sf_dir, "region").select("r_regionkey")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (table(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >=
                       F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                      & (F.col("o_orderdate") <
                         F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (supp.s_nationkey == cust.c_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q10_top_customers",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue per customer, top 20 (TPC-H Q10 shape)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one finished order.

    Scale: semi-join shuffles only the distinct keys of the probe side;
    Spark plans a shuffled hash semi (or broadcast if the build side fits).
    """
    cust = table(spark, sf_dir, "customer")
    fin = (table(spark, sf_dir, "orders")
           .filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    return (
        cust.join(fin, cust.c_custkey == fin.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q_outer_join_coalesce",
    oracle=f"""
    SELECT n_name,
           COUNT(c_custkey) AS n_customers,
           {sql_dsum("COALESCE(c_acctbal, 0.0)", "total_acctbal")}
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving empty nations, null-safe aggregation."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), "total_acctbal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Distinct / set operations
# --------------------------------------------------------------------------

@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash-distinct; partials collapse map-side)."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "q_set_ops",
    oracle="""
    WITH auto_n AS (SELECT DISTINCT c_nationkey FROM customer
                    WHERE c_mktsegment = 'AUTOMOBILE'),
         bldg_n AS (SELECT DISTINCT c_nationkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
    SELECT 'both' AS tag, c_nationkey FROM
        (SELECT c_nationkey FROM auto_n INTERSECT
         SELECT c_nationkey FROM bldg_n)
    UNION ALL
    SELECT 'auto_only' AS tag, c_nationkey FROM
        (SELECT c_nationkey FROM auto_n EXCEPT
         SELECT c_nationkey FROM bldg_n)
    ORDER BY tag, c_nationkey
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over derived key sets."""
    cust = table(spark, sf_dir, "customer")
    auto_n = (cust.filter(F.col("c_mktsegment") == "AUTOMOBILE")
              .select("c_nationkey").distinct())
    bldg_n = (cust.filter(F.col("c_mktsegment") == "BUILDING")
              .select("c_nationkey").distinct())
    both = auto_n.intersect(bldg_n).select(
        F.lit("both").alias("tag"), "c_nationkey")
    auto_only = auto_n.exceptAll(bldg_n).select(
        F.lit("auto_only").alias("tag"), "c_nationkey")
    return both.unionAll(auto_only).orderBy("tag", "c_nationkey")


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey
                                  ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class (windowed top-k).

    Scale: one shuffle on the partition key; Spark inserts a per-partition
    sort, no global sort. For heavy skew, pre-aggregation or AQE skew
    handling applies; rank predicate prunes early via WindowGroupLimit.
    """
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey)
               AS prev_price
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + LAG per customer (frame-based window aggregation).

    The decimal cast inside the windowed SUM keeps the running total exact
    regardless of how either engine associates the frame accumulation.
    """
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.sum(dec(F.col("o_totalprice"))).over(wf)
             .cast("double").alias("running_total"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .orderBy("o_custkey", "orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube; conditional aggregation (manual pivot)
# --------------------------------------------------------------------------

@register(
    "q_rollup",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_price")}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> priority -> grand total)."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice"), "total_price"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL"))
             .alias("priority"),
            "n_orders", "total_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_items,
           {sql_dsum("l_quantity", "total_qty")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"),
             dsum(F.col("l_quantity"), "total_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL"))
             .alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL"))
             .alias("linestatus"),
            "n_items", "total_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "q_conditional_pivot",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice"
                     " ELSE 0.0 END", "finished_total")},
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice"
                     " ELSE 0.0 END", "open_total")},
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice"
                     " ELSE 0.0 END", "pending_total")},
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (sum-case-when)."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey",
                                                   "c_mktsegment")

    def bucket(status: str, alias: str):
        e = F.when(F.col("o_orderstatus") == status,
                   F.col("o_totalprice")).otherwise(F.lit(0.0))
        return dsum(e, alias)

    return (
        orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(bucket("F", "finished_total"),
             bucket("O", "open_total"),
             bucket("P", "pending_total"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------

@register(
    "q_scalar_subquery",
    oracle=f"""
    WITH cavg AS (
        SELECT o_custkey,
               {sql_davg("o_totalprice", "avg_price", 6)}
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o JOIN cavg ON o.o_custkey = cavg.o_custkey
    WHERE o.o_totalprice > 2.0 * cavg.avg_price
    ORDER BY o.o_orderkey
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate predicate: orders > 2x their customer's mean.

    Decorrelated form (agg + self-join) — the plan Catalyst itself produces
    for the correlated subquery, written explicitly.
    """
    orders = table(spark, sf_dir, "orders")
    cavg = (orders.groupBy(F.col("o_custkey").alias("k"))
            .agg(davg(F.col("o_totalprice"), "avg_price", 6)))
    return (
        orders.join(cavg, orders.o_custkey == cavg.k)
        .filter(F.col("o_totalprice") > 2.0 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q_in_subquery",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_quantity >= 49)
    ORDER BY p_partkey
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as a left-semi join against a filtered key set."""
    part = table(spark, sf_dir, "part")
    keys = (table(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") >= 49).select("l_partkey"))
    return (
        part.join(keys, part.p_partkey == keys.l_partkey, "left_semi")
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Scalar function coverage (string / date / math / case)
# --------------------------------------------------------------------------

@register(
    "q_string_funcs",
    oracle="""
    SELECT n_name,
           upper(n_name)                  AS upper_name,
           lower(n_name)                  AS lower_name,
           length(n_name)                 AS name_len,
           substr(n_name, 1, 3)           AS name_prefix,
           reverse(n_name)                AS name_rev,
           concat(n_name, '#', CAST(n_nationkey AS VARCHAR)) AS tagged,
           replace(n_name, 'A', '@')      AS name_repl,
           ltrim(rtrim(concat(' ', n_name, ' '))) AS name_trim
    FROM nation
    ORDER BY n_name
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (upper/lower/length/substr/reverse/concat/
    replace/trim) — all JVM-side Catalyst expressions, codegen'd."""
    n = table(spark, sf_dir, "nation")
    return (
        n.select(
            "n_name",
            F.upper("n_name").alias("upper_name"),
            F.lower("n_name").alias("lower_name"),
            F.length("n_name").alias("name_len"),
            F.substring("n_name", 1, 3).alias("name_prefix"),
            F.reverse("n_name").alias("name_rev"),
            F.concat(F.col("n_name"), F.lit("#"),
                     F.col("n_nationkey").cast("string")).alias("tagged"),
            F.replace(F.col("n_name"), F.lit("A"), F.lit("@"))
             .alias("name_repl"),
            F.trim(F.concat(F.lit(" "), F.col("n_name"), F.lit(" ")))
             .alias("name_trim"),
        )
        .orderBy("n_name")
    )


@register(
    "q_date_funcs",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_price")}
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    ORDER BY order_year, order_month
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + per-month aggregation."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >=
                F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        .groupBy(F.year("o_orderdate").alias("order_year"),
                 F.month("o_orderdate").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum(F.col("o_totalprice"), "total_price"))
        .orderBy("order_year", "order_month")
    )


@register(
    "q_math_funcs",
    oracle=f"""
    SELECT l_linenumber,
           {sql_dsum("sqrt(l_quantity)", "sum_sqrt_qty", 6)},
           {sql_dsum("abs(l_extendedprice - 1000.0)", "sum_absdev")},
           {sql_dsum("ceil(l_discount * 100)", "sum_ceil_disc")},
           {sql_dsum("floor(l_tax * 100)", "sum_floor_tax")},
           {sql_dsum("CAST(l_orderkey % 7 AS DOUBLE)", "sum_mod7")}
    FROM lineitem
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalars (sqrt/abs/ceil/floor/mod). sqrt is IEEE
    correctly-rounded so it is bit-identical across engines; transcendental
    functions (ln, pow) are deliberately excluded from the oracle-checked
    surface because libm implementations may differ in the last ulp."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linenumber")
        .agg(
            dsum(F.sqrt("l_quantity"), "sum_sqrt_qty", 6),
            dsum(F.abs(F.col("l_extendedprice") - 1000.0), "sum_absdev"),
            dsum(F.ceil(F.col("l_discount") * 100).cast("double"),
                 "sum_ceil_disc"),
            dsum(F.floor(F.col("l_tax") * 100).cast("double"),
                 "sum_floor_tax"),
            dsum((F.col("l_orderkey") % 7).cast("double"), "sum_mod7"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "q_case_expr",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END AS balance_band,
           COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer
    GROUP BY 1
    ORDER BY balance_band
    """,
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + min/max (exact — no accumulation order)."""
    band = (F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .when(F.col("c_acctbal") < 8000, "mid")
            .otherwise("high"))
    return (
        table(spark, sf_dir, "customer")
        .groupBy(band.alias("balance_band"))
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.min("c_acctbal").alias("min_bal"),
             F.max("c_acctbal").alias("max_bal"))
        .orderBy("balance_band")
    )


# --------------------------------------------------------------------------
# Column-pruning probe (the reference's benchmark "query": count rows by
# touching exactly one of 41 columns, trainer.py:327)
# --------------------------------------------------------------------------

@register(
    "q_single_column_probe",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_single_column_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Touch one column of a wide table (reference trainer.py:327 probes
    `cat1` only). Catalyst prunes the parquet scan to that single column —
    ReadSchema in the plan shows 1 of 11 lineitem columns."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )
