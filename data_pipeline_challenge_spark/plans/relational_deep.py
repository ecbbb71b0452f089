"""Deeper TPC-H-family coverage over the slim star schema.

The driver's tables omit several classic TPC-H columns (no partsupp, no
l_commitdate/l_shipmode, no c_phone), so each query here keeps the shape
and optimizer stress of its TPC-H counterpart while using only available
columns. Same contract as plans/relational.py: every computed column is
aliased identically in Spark and oracle, floats rounded on both sides,
deterministic ORDER BY under every LIMIT, no raw timestamps in outputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query


# TPC-H revenue expression: ONE definition (relational.py) — a drifted
# second copy would silently split the rounding/casting policy across
# the two modules' twenty-odd revenue queries.
from .relational import _rev  # noqa: E402,F401


@query(
    "q8_market_share",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'CHINA'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue delivered
    into a region, per order year. Seven-table join; every dim broadcasts,
    the two fact-side joins shuffle on their keys once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "CHINA", _rev()).otherwise(F.lit(0.0)))
                / F.sum(_rev()),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_profit_by_nation_year",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("join", "agg", "tpch"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (sans partsupp): revenue on name-matched parts by
    supplier nation and year. The part filter prunes before the fact
    joins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("profit"))
    )


@query(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts (left join with an
    ON-clause filter, then an aggregation of an aggregation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '2001-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '2001-04-01 00:00:00'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share in one month — conditional aggregate
    over a broadcast part join; the date filter is pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2001-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("2001-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), _rev()).otherwise(F.lit(0.0)))
            / F.sum(_rev()),
            4,
        ).alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '2001-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — derived
    aggregate reused twice (rows + scalar max); the rounded revenue makes
    the equality comparison engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("2001-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    s = load_table(spark, sf_dir, "supplier")
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.5 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=("join", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-half-average-quantity lineitems of one
    brand — the correlated average becomes a per-part aggregate joined
    back (no per-row subquery execution)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice, round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 100
    )
    GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very-large-quantity orders — the HAVING
    subquery is a semi-joinable aggregate, then one grouped join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > round((
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          ), 2)
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
    GROUP BY c_mktsegment
    """,
    tags=("agg", "subquery", "anti", "tpch"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (mktsegment for the missing phone prefix):
    above-average-balance customers with no urgent orders — scalar
    subquery + anti join + aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    # avg rounded to cents on both sides (engine-stable threshold; see
    # subquery_above_avg_orders). q17's per-part avg needs no rounding:
    # integer quantities sum exactly, so that avg is bit-deterministic.
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "doc_length_deciles",
    """
    WITH d AS (
        SELECT doc_id, n_chars,
               ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        FROM documents
    )
    SELECT decile, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           round(avg(n_chars), 2) AS avg_chars
    FROM d GROUP BY decile
    """,
    tags=("window", "agg", "corpus"),
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length decile profile (corpus curation diagnostic). The
    NTILE order carries doc_id as tiebreaker so tied lengths bin
    identically in any engine; binning runs on the distributed global-rank
    operator (operators/ranking.py), not Spark's single-partition global
    window."""
    from ..operators.ranking import with_global_ntile

    docs = load_table(spark, sf_dir, "documents")
    return (
        with_global_ntile(
            docs.select("doc_id", "n_chars"), ("n_chars", "doc_id"), 10, out="decile"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing part
    and lineitem columns. The optimizer stress is disjunction handling:
    Catalyst pushes the part-only disjuncts (brand IN ..., size <= 25)
    below the join so the broadcast build side shrinks before the mixed
    residual applies."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 20) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 25) & q.between(20, 30))
    )
    return j.filter(cond).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


@query(
    "q11_important_parts",
    """
    WITH pv AS (
        SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM pv
    WHERE value > (SELECT sum(l_extendedprice * (1 - l_discount)) * 0.0008
                   FROM lineitem)
    """,
    tags=("agg", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem revenue standing in for partsupp value):
    parts whose total revenue exceeds a scalar-subquery fraction of the
    corpus total. One keyed aggregation + one broadcast scalar — the
    HAVING-against-global-total pattern. The unrounded value feeds the
    comparison on both engines; only the output is rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("value"))
    total = li.agg((F.sum(_rev()) * F.lit(0.0008)).alias("thr"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q21_sole_late_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "semi", "anti", "subquery", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (shipdate vs orderdate+90d standing in for the
    missing commit/receipt dates): suppliers who were the ONLY late
    shipper on a finished multi-supplier order. The classic
    semi-join + anti-join pair against the same fact table, keyed on
    l_orderkey both times so the shuffles align."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    deadline = F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    l1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > deadline)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # EXISTS: some other supplier on the order (any lineitem row).
    others = li.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    sole = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o_k")) & (F.col("l_suppkey") != F.col("o_s")),
        "left_semi",
    )
    # NOT EXISTS: no other supplier was ALSO late on that order.
    late_others = l1.select(
        F.col("l_orderkey").alias("a_k"), F.col("l_suppkey").alias("a_s")
    )
    sole = sole.join(
        late_others,
        (F.col("l_orderkey") == F.col("a_k")) & (F.col("l_suppkey") != F.col("a_s")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(floor(l_extendedprice * 1000000 / l_quantity + 0.5)
                        AS BIGINT)) / count(*) / 1000000.0 AS unit_cost
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT c.l_partkey, c.l_suppkey, c.unit_cost
    FROM cost c
    WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
      AND c.l_partkey <= 200
    """,
    tags=("join", "subquery", "correlated", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (observed unit price standing in for ps_supplycost):
    per part, the ASIA supplier(s) with the minimum average unit cost —
    the correlated-min-over-a-derived-table pattern, decorrelated into a
    self-join against a keyed min. The per-pair mean deliberately contains
    NO float rounding: Spark round() rounds the shortest decimal string
    (HALF_UP) while DuckDB rounds the true binary value, so they disagree
    on representable midpoints (396.12125 -> .1213 vs .1212, observed at
    sf0.1). Instead each unit price becomes integer micros
    (floor(x*1e6+0.5) — floor, integer sum, and int/int division are
    IEEE-identical in both engines), making the mean, the keyed min, and
    the tie equality bit-reproducible. The l_partkey cap bounds the
    output like Q2's LIMIT without needing a sort."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = s.join(
        F.broadcast(n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    cost = (
        li.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * F.lit(1000000.0) / F.col("l_quantity")
                        + F.lit(0.5)
                    ).cast("bigint")
                )
                / F.count(F.lit(1))
                / F.lit(1000000.0)
            ).alias("unit_cost")
        )
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_k")).agg(
        F.min("unit_cost").alias("b_min")
    )
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("b_k")) & (F.col("unit_cost") == F.col("b_min")),
        )
        .filter(F.col("l_partkey") <= 200)
        .select("l_partkey", "l_suppkey", "unit_cost")
    )


@query(
    "q12_shipping_speed_priority",
    """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_speed,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def q12_shipping_speed_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the slim schema has no l_shipmode/l_commitdate, so
    the mode bucket becomes a ship-latency bucket): per speed class, how
    many lineitems came from high- vs low-priority orders. Conditional
    counts via count(CASE...) so both engines emit BIGINT (DuckDB's
    sum(int) would widen to HUGEINT). One shuffle on the join key; the
    date filter prunes the fact scan before the join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "FAST"
            )
            .otherwise("SLOW")
            .alias("ship_speed")
        )
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "anti", "agg", "distinct", "tpch"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp table: observed lineitem
    part-supplier pairs stand in for it; the 'complaints' exclusion
    becomes negative-acctbal suppliers): distinct supplier counts per
    part attribute combo, minus an excluded supplier set. The exclusion
    is a broadcast anti-join (s_suppkey is non-null, so NOT IN == anti);
    part filters push to the dimension scan which then broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_promotable_suppliers",
    """
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 100)
    """,
    tags=("join", "semi", "subquery", "agg", "tpch"),
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp/ps_availqty: the 'excess stock'
    predicate becomes total 1997 shipped quantity of small-parts above a
    threshold): suppliers in one nation qualifying via an aggregated
    nested subquery. The subquery aggregates the fact table once
    (map-side partial sums), the HAVING filters it to a handful of
    suppliers, and the outer query is a broadcast semi-join — no
    supplier-side shuffle at any scale."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualified = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(qualified), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )
