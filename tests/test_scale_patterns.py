"""Scale-pattern tests: salted joins equal plain joins; bucketed tables
co-locate joins (no shuffle exchange)."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_challenge_spark.catalog import load_table
from data_pipeline_challenge_spark.operators.skew import key_skew_profile, salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite: same rows out."""
    li = load_table(spark, SF, "lineitem")
    # manufacture skew: dump most rows onto one supplier key
    skewed = li.withColumn(
        "l_suppkey", F.when(F.col("l_orderkey") % 3 != 0, F.lit(1)).otherwise(F.col("l_suppkey"))
    )
    supp = load_table(spark, SF, "supplier")

    plain = skewed.join(supp, skewed.l_suppkey == supp.s_suppkey).select(
        "l_orderkey", "l_linenumber", "s_suppkey", "s_name"
    )
    salted = salted_join(
        skewed, supp.withColumnRenamed("s_suppkey", "l_suppkey"), key="l_suppkey", salt=8
    ).select("l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s_suppkey"), "s_name")

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    prof = key_skew_profile(skewed, "l_suppkey", top=1).collect()[0]
    assert prof["l_suppkey"] == 1 and prof["share"] > 0.5  # the diagnostic flags it


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """bucketBy(code) co-locates both sides of a same-key join: the
    sort-merge join runs with NO shuffle Exchange — the product-table
    layout called for at 100 TB (README scale notes)."""
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        cust.withColumn("o_custkey", F.col("c_custkey"))
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and it actually runs correctly
        assert joined.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
