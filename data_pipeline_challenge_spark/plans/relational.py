"""Relational query inventory over the star schema.

Covers the reference's read surface (point lookup, partial/exact name search
— ``/root/reference/app/api/main.py:130-184``) re-expressed over the driver's
TPC-H-ish tables, plus the full relational operator set the reference lacks
(joins, aggregations, windows, set ops, rollup/cube, subqueries) — SURVEY.md
§2 "category disposition".

Scale design: all joins are declared (Catalyst/AQE pick broadcast vs
sort-merge at runtime; dims under the 64 MB threshold broadcast), all
aggregations are partial-aggregated map-side by Catalyst, filters sit
directly on scans so parquet row-group stats prune IO. No Python executes
per-row anywhere in this module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .registry import query

def _rev():
    """Revenue expression (TPC-H convention). Built lazily: constructing a
    Column requires an active SparkContext in classic PySpark, and this
    module must import cleanly before the driver creates its session."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                AS sum_qty,
           round(sum(l_extendedprice), 2)                           AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                AS avg_qty,
           round(avg(l_extendedprice), 2)                           AS avg_price,
           round(avg(l_discount), 4)                                AS avg_disc,
           count(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filtered scan → grouped aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_rev()), 2).alias("sum_disc_price"),
            F.round(F.sum(_rev() * (F.lit(1.0) + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join, grouped revenue, deterministic top-10."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join; dims broadcast (AQE confirms)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral trade volume between two nations by year
    (self-joined dimension under two roles)."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q4_late_shipments",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: order-priority counts for orders with at least one
    lineitem shipped >60 days after ordering — correlated EXISTS expressed
    as a left-semi join with a non-equi residual."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top customers by revenue lost to returned items."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"), "n_name"
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "agg_orders_by_status",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           round(avg(o_totalprice), 2) AS avg_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count/sum/avg/min/max — the ledger counter pattern (SURVEY §2 op 13)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to two-phase agg under the hood)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_approx_count_distinct",
    None,  # HLL sketch internals differ across engines — rows-only check.
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-scale distinct.

    At scale an exact distinct shuffles every key; the HLL sketch is
    map-combinable and constant-size. No SQL oracle: sketch estimates are
    engine-specific (driver records a rows-only check).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        )
    )


@query(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping flags — hierarchy subtotals in one pass."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT)   AS g_st,
           CAST(grouping(o_orderpriority) AS INT) AS g_pr,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority — all grouping-set combinations."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.grouping("o_orderpriority").cast("int").alias("g_pr"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "having_nation_counts",
    """
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer GROUP BY c_nationkey HAVING count(*) >= 50
    """,
    tags=("agg", "having"),
)
def having_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") >= 50)
    )


@query(
    "pivot_order_priority",
    """
    SELECT o_orderstatus,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)        AS n_urgent,
           count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)          AS n_high,
           count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)        AS n_medium,
           count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_notspec,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)           AS n_low
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "pivot"),
)
def pivot_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list — at scale never let pivot infer values)."""
    piv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "n_urgent",
        "2-HIGH": "n_high",
        "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_notspec",
        "5-LOW": "n_low",
    }
    out = piv
    for old, new in renames.items():
        out = out.withColumn(new, F.coalesce(F.col(f"`{old}`"), F.lit(0)).cast("long")).drop(old)
    return out


# ---------------------------------------------------------------------------
# Lookup / search (the reference's read endpoints, SURVEY §2 ops 15-17)
# ---------------------------------------------------------------------------


@query(
    "point_lookup_key",
    "SELECT p_partkey, p_name, p_brand, p_type, p_size, round(p_retailprice,2) AS p_retailprice FROM part WHERE p_partkey = 142",
    tags=("filter", "lookup"),
)
def point_lookup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key — op 15 (`GET /product/find/code/{code}`,
    /root/reference/app/api/main.py:130-144). Parquet min/max stats skip
    non-matching row groups; at 100 TB add bucketing on the key."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") == 142)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


@query(
    "search_name_partial",
    """
    SELECT p_partkey, p_name FROM part
    WHERE contains(lower(p_name), 'gear')
    ORDER BY p_partkey LIMIT 20
    """,
    tags=("filter", "search", "limit"),
)
def search_name_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring search, top-20 — op 16
    (`api/main.py:147-167`: regex `.*term.*` option `i`, limit 20).
    Deterministic delta vs reference: ordered by key (the reference returns
    an arbitrary 20; an ordered set is required for a reproducible oracle)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.lower(F.col("p_name")).contains("gear"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
        .limit(20)
    )


@query(
    "search_name_exact",
    "SELECT p_partkey, p_name, p_brand FROM part WHERE p_name = 'red widget'",
    tags=("filter", "search"),
)
def search_name_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match search, case-sensitive, NO limit — op 17 replicates the
    reference code (`api/main.py:170-184` has no .limit despite its
    docstring claiming 20)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name") == "red widget")
        .select("p_partkey", "p_name", "p_brand")
    )


@query(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort", "topk"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (no full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_broadcast_star",
    """
    SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "broadcast"),
    bench=True,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim star join with explicit broadcast hints — no fact shuffle
    for the joins; the only shuffle is the final small aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "join_semi_customers_with_big_orders",
    """
    SELECT c_custkey, c_name, c_nationkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    tags=("join", "semi"),
)
def join_semi_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (existence check) — never duplicates the left side."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("join", "anti"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the 'new files not yet in ledger' discovery pattern
    that replaces the reference's queue consumption in batch mode (SURVEY §2
    op 3)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_outer_customer_order_counts",
    """
    SELECT c_custkey, c_name, coalesce(n, 0) AS n_orders
    FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
    tags=("join", "outer", "agg"),
)
def join_outer_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join against a pre-aggregate (aggregate-before-join keeps
    the shuffled payload small — at 100 TB never join then aggregate)."""
    cust = load_table(spark, sf_dir, "customer")
    counts = (
        load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    )
    return cust.join(counts, cust.c_custkey == counts.o_custkey, "left").select(
        "c_custkey", "c_name", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders")
    )


@query(
    "join_full_outer_nation_presence",
    """
    SELECT coalesce(c.k, s.k) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.k = s.k
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates with coalesced keys."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.ck == s.sk, "full_outer").select(
        F.coalesce(F.col("ck"), F.col("sk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).cast("long").alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).cast("long").alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank_orders_per_customer",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
               CAST(row_number() OVER w AS INT) AS rn,
               CAST(rank()       OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    tags=("window",),
    bench=True,
)
def window_rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window (the keyed-dedup
    primitive behind the reference's upsert merge, SURVEY §2 op 12)."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
           round(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
    FROM orders
    """,
    tags=("window",),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals + lag/lead per customer over order time."""
    order_cols = [F.col("o_orderdate"), F.col("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(wrun), 2).alias("running_total"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@query(
    "window_share_of_nation",
    """
    SELECT c_custkey, c_nationkey,
           round(c_acctbal, 2) AS acctbal,
           round(c_acctbal / sum(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS nation_share,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
    FROM customer
    """,
    tags=("window",),
)
def window_share_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered partition aggregate window + ntile bucketing —
    share-of-group and quartile per nation.

    Shape at scale (r15 re-plan): ~25 nations over the full customer
    table is exactly the hot-stratum window shape the MAD/percentile
    re-plans eliminated, so neither window survives here: the group SUM
    is a map-side-combinable groupBy broadcast-joined back (the window
    form shuffles the whole table into 25 tasks for an aggregate of 25
    numbers), and ntile comes from operators/ranking.py's grouped
    range-partition + offset plan with the SQL-exact
    first-(n%4)-tiles-get-one-extra arithmetic."""
    from ..operators.ranking import with_grouped_ntile

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    sums = cust.groupBy("c_nationkey").agg(
        F.sum("c_acctbal").alias("__nation_sum")
    )
    tiled = with_grouped_ntile(
        cust,
        ["c_nationkey"],
        [F.col("c_acctbal"), F.col("c_custkey")],
        4,
        out="quartile",
    )
    return tiled.join(F.broadcast(sums), "c_nationkey").select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.round(F.col("c_acctbal") / F.col("__nation_sum"), 6).alias(
            "nation_share"
        ),
        F.col("quartile").cast("int").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_nations",
    "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
    tags=("setop",),
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect_nations",
    "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
    tags=("setop",),
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_nations",
    "SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier",
    tags=("setop",),
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # subtract == EXCEPT DISTINCT (exceptAll would differ)


# ---------------------------------------------------------------------------
# Scalar function coverage
# ---------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           upper(p_name)                          AS u_name,
           lower(p_brand)                         AS l_brand,
           length(p_name)                         AS name_len,
           substr(p_name, 1, 5)                   AS name_pfx,
           concat(p_brand, ':', p_type)           AS brand_type,
           replace(p_name, ' ', '_')              AS snake_name,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           reverse(p_type)                        AS rev_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS padded_size
    FROM part WHERE p_partkey <= 100
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar function coverage (all JVM-side, codegen'd)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.upper("p_name").alias("u_name"),
            F.lower("p_brand").alias("l_brand"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_pfx"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.regexp_replace(F.col("p_name"), " ", "_").alias("snake_name"),
            F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("no_vowels"),
            F.reverse(F.col("p_type")).alias("rev_type"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        )
    )


@query(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS yr,
           CAST(month(o_orderdate) AS INT)   AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(day(o_orderdate) AS INT)     AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar coverage over NTZ timestamps (timezone-free by design)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
            F.dayofmonth("o_orderdate").cast("int").alias("dom"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_epoch_start"),
        )
    )


@query(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)      AS abs_disc_delta,
           CAST(ceil(l_quantity) AS BIGINT)      AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)     AS qty_floor,
           round(sqrt(l_quantity), 6)            AS qty_sqrt,
           round(ln(l_extendedprice), 6)         AS price_ln,
           round(pow(l_quantity, 2), 6)          AS qty_sq,
           CAST(l_linenumber % 3 AS INT)         AS ln_mod3,
           CAST(sign(l_discount - 0.05) AS INT)  AS disc_sign
    FROM lineitem WHERE l_orderkey <= 100
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar coverage; rounded to 6 dp (libm vs JVM last-ulp)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc_delta"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        (F.col("l_linenumber") % 3).cast("int").alias("ln_mod3"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "case_when_price_buckets",
    """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY bucket
    """,
    tags=("scalar", "case", "agg"),
)
def case_when_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing feeding an aggregation."""
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@query(
    "subquery_above_avg_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    -- avg rounded to cents on BOTH sides: the raw float avg differs
    -- between engines in the last ulp (summation order), and an order
    -- landing between the two thresholds would flip row membership
    WHERE o_totalprice > 1.5 * round((SELECT avg(o_totalprice) FROM orders), 2)
    """,
    tags=("subquery",),
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery as a broadcast: aggregate once, cross-join the
    single-row threshold (what Catalyst does for an uncorrelated scalar
    subquery)."""
    orders = load_table(spark, sf_dir, "orders")
    thresh = orders.agg((F.round(F.avg("o_totalprice"), 2) * 1.5).alias("thresh"))
    return (
        orders.crossJoin(F.broadcast(thresh))
        .filter(F.col("o_totalprice") > F.col("thresh"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "subquery_correlated_max_order",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("subquery", "window"),
)
def subquery_correlated_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated max-per-group subquery, decorrelated to a window max —
    one shuffle instead of a self-join (how Catalyst rewrites it too)."""
    w = Window.partitionBy("o_custkey")
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("mx", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("mx"))
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )
