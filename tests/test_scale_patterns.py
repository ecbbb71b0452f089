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


def test_pmi_per_doc_cap_bounds_pair_generation(spark):
    """VERDICT r12 #1: a long doc whose every term passes min_df must not
    emit pairs quadratic in its length — the per-doc cap bounds exploded
    pair rows at cap·(cap−1)/2 per doc, and the keep rule (lowest-df,
    lexical tie-break) is deterministic."""
    from data_pipeline_challenge_spark.plans.text import pmi_doc_terms

    n_docs, n_terms, cap = 30, 300, 128
    text = " ".join(f"t{i:03d}" for i in range(n_terms))
    docs = spark.createDataFrame(
        [(f"d{i}", text) for i in range(n_docs)], "doc_id string, text string"
    )
    tf, freq = pmi_doc_terms(docs, min_df=25, per_doc_cap=cap)
    # every term has df = n_docs >= min_df, so WITHOUT the cap tf would be
    # n_docs * n_terms rows and pairs n_docs * n_terms*(n_terms-1)/2
    assert freq.count() == n_terms
    assert tf.count() == n_docs * cap
    a = tf.select("doc_id", F.col("term").alias("t1"))
    b = tf.select("doc_id", F.col("term").alias("t2"))
    exploded_pairs = a.join(b, ["doc_id"]).filter(F.col("t1") < F.col("t2")).count()
    assert exploded_pairs == n_docs * cap * (cap - 1) // 2
    # deterministic keep rule: all dfs tie, so lexical order keeps t000..t127
    kept = sorted(r["term"] for r in tf.filter(F.col("doc_id") == "d0").collect())
    assert kept == [f"t{i:03d}" for i in range(cap)]


def test_windowed_pmi_banding_matches_naive(spark):
    """The banded (doc_id, bucket) equi-join in windowed_pmi must select
    the IDENTICAL pair set as the naive doc_id join with a distance
    post-filter — banding is a physical rewrite, not a semantics change."""
    from data_pipeline_challenge_spark.plans.text import windowed_pmi

    docs = load_table(spark, SF, "documents").limit(120)
    k, min_count, min_pair = 5, 3, 2
    fast = windowed_pmi(docs, window=k, min_count=min_count, min_pair=min_pair, top_k=1000)

    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    c1 = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
        .filter(F.col("c1") >= min_count)
    )
    n_tok = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    tf = toks.join(F.broadcast(c1.select("term")), "term")
    a = tf.select("doc_id", F.col("pos").alias("p1"), F.col("term").alias("w1"))
    b = tf.select("doc_id", F.col("pos").alias("p2"), F.col("term").alias("w2"))
    naive_pairs = (
        a.join(b, ["doc_id"])
        .filter(
            (F.col("p2") > F.col("p1"))
            & (F.col("p2") - F.col("p1") <= k)
            & (F.col("w1") != F.col("w2"))
        )
        .select(
            F.least("w1", "w2").alias("t1"), F.greatest("w1", "w2").alias("t2")
        )
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_pair)
    )
    f1 = c1.select(F.col("term").alias("t1"), F.col("c1").alias("_c1"))
    f2 = c1.select(F.col("term").alias("t2"), F.col("c1").alias("_c2"))
    pmi = F.round(
        F.log(
            (F.col("c12") * F.col("n_tok")).cast("double")
            / (F.col("_c1") * F.col("_c2")).cast("double")
        ),
        6,
    )
    naive = (
        naive_pairs.join(F.broadcast(f1), "t1")
        .join(F.broadcast(f2), "t2")
        .crossJoin(F.broadcast(n_tok))
        .select("t1", "t2", "c12", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "t1", "t2")
        .limit(1000)
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_zorder_compaction_on_real_events_table(spark, tmp_path):
    """The declared maintenance surface for Z-ordering (VERDICT r14 #8):
    ``compact_parquet_dir(zorder_by=[...])`` on the REAL events table —
    not a synthetic grid — must (a) rewrite the small-file mess into the
    target file count with every row intact (including a null-user
    straggler, which the quantize fix pins to cell 0 instead of an
    arbitrary partition), and (b) produce footer stats that prune BOTH a
    user_id slab and a value slab, where the single-key sort_col layout
    prunes only its own column."""
    import pyarrow.parquet as pq

    from data_pipeline_challenge_spark.catalog import load_events
    from data_pipeline_challenge_spark.operators.maintenance import (
        compact_parquet_dir,
    )

    ev = load_events(spark, "/root/testdata/sf0.01").select(
        "event_id", "user_id", "value"
    )
    n_rows = ev.count()
    straggler = spark.createDataFrame(
        [(10**9, None, None)], "event_id long, user_id long, value double"
    )
    messy = ev.unionByName(straggler).repartition(24)

    zdir, ldir = tmp_path / "ev_z", tmp_path / "ev_l"
    messy.write.parquet(str(zdir))
    messy.write.parquet(str(ldir))
    total = sum(p.stat().st_size for p in zdir.rglob("*.parquet"))
    target = max(1, total // 16)

    rep_z = compact_parquet_dir(
        spark, zdir, target_file_bytes=target, zorder_by=["user_id", "value"]
    )
    rep_l = compact_parquet_dir(
        spark, ldir, target_file_bytes=target, sort_col="user_id"
    )
    assert rep_z.rows == rep_l.rows == n_rows + 1
    assert rep_z.files_before == 24 and rep_z.files_after >= 8

    def file_ranges(d, col):
        out = []
        for f in sorted(d.glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    c = row.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        if s.min is None:
                            continue
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
        return out

    def hits(ranges, lo, hi):
        return sum(
            1 for a, b in ranges if a is not None and not (b < lo or a > hi)
        )

    # slabs holding ~1/8 of ROWS (quantile-based: the raw value range is
    # skew-distributed, so a range-based slab would cover most rows and
    # legitimately touch most files in any layout), placed INSIDE a
    # quadrant — a slab centered on the median straddles the top-bit
    # boundary, the one position a z-curve cannot localize
    u_lo, u_hi = ev.approxQuantile("user_id", [0.0625, 0.1875], 0.001)
    v_lo, v_hi = ev.approxQuantile("value", [0.5625, 0.6875], 0.001)

    n_z = len(list(zdir.glob("*.parquet")))
    n_l = len(list(ldir.glob("*.parquet")))
    # value slab: the user-sorted layout prunes ~nothing, z-order skips
    l_v = hits(file_ranges(ldir, "value"), v_lo, v_hi)
    z_v = hits(file_ranges(zdir, "value"), v_lo, v_hi)
    assert l_v >= n_l - 1
    assert z_v <= (2 * n_z) // 3
    # user slab: the z-layout prunes its other dimension too
    z_u = hits(file_ranges(zdir, "user_id"), int(u_lo), int(u_hi))
    assert z_u <= (2 * n_z) // 3


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """Z-order vs linear sort, measured from the parquet footers the
    reader's stats-pruning actually uses: on a 2-D uniform grid written
    to 32 files each way, a single-dimension slab filter must intersect
    (a) nearly every file of the layout sorted on the OTHER column, but
    (b) a small fraction of the z-ordered files — and a 2-D box filter
    must prune the z-ordered layout harder than either 1-D slab."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from data_pipeline_challenge_spark.operators.layout import zorder_write

    n = 1 << 14  # 16384 rows on a 128x128 grid
    grid = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zdir, ldir = tmp_path / "zorder", tmp_path / "linear"
    zorder_write(grid, str(zdir), [("x", 0, 127), ("y", 0, 127)], bits=7, n_files=32)
    (
        grid.repartitionByRange(32, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(ldir))
    )

    def file_ranges(d: Path, col: str):
        out = []
        for f in sorted(d.glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    c = row.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            out.append((lo, hi))
        return out

    def hits(ranges, lo, hi):
        return sum(1 for a, b in ranges if a is not None and not (b < lo or a > hi))

    # y-slab: rows with y in [0, 15] (1/8 of the domain)
    z_y = hits(file_ranges(zdir, "y"), 0, 15)
    l_y = hits(file_ranges(ldir, "y"), 0, 15)
    n_z = len(list(zdir.glob("*.parquet")))
    n_l = len(list(ldir.glob("*.parquet")))
    assert n_z >= 16 and n_l >= 16  # both layouts actually split
    assert l_y >= n_l - 1  # x-sorted layout: y-filter prunes ~nothing
    assert z_y <= n_z // 2  # z-order: y-filter skips at least half

    # x-slab prunes the z-layout too (the point: BOTH dims prune)
    z_x = hits(file_ranges(zdir, "x"), 0, 15)
    assert z_x <= n_z // 2

    # 2-D box [0,15]x[0,15]: intersect per-dim candidate sets
    zx_ranges, zy_ranges = file_ranges(zdir, "x"), file_ranges(zdir, "y")
    box = sum(
        1
        for (ax, bx), (ay, by) in zip(zx_ranges, zy_ranges)
        if not (bx < 0 or ax > 15) and not (by < 0 or ay > 15)
    )
    assert box <= min(z_x, z_y)
    assert box <= max(2, n_z // 8)
