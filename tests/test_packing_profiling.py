"""Sequence packing + column profiling operator tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_challenge_spark.operators.packing import pack_sequences
from data_pipeline_challenge_spark.operators.profiling import profile_columns


def _pack(spark, rows, capacity):
    df = spark.createDataFrame(rows, "g string, ord bigint, tok bigint")
    out = pack_sequences(df, "g", "ord", "tok", capacity=capacity)
    return {(r["g"], r["ord"]): r["bin"] for r in out.collect()}


def test_pack_greedy_differs_from_cumsum_split(spark):
    # tokens 60,70,60 at capacity 120: greedy first-fit opens a new bin for
    # the 70 (60+70 > 120), whereas cumsum-slicing would co-locate 60+70.
    got = _pack(spark, [("a", 1, 60), ("a", 2, 70), ("a", 3, 60)], 120)
    assert got == {("a", 1): 0, ("a", 2): 1, ("a", 3): 2}


def test_pack_fills_and_oversized_item_gets_own_bin(spark):
    rows = [("a", 1, 50), ("a", 2, 50), ("a", 3, 20), ("a", 4, 500), ("a", 5, 10)]
    got = _pack(spark, rows, 120)
    # 50+50+20 = 120 fits exactly; 500 (oversized) alone; 10 starts fresh.
    assert got == {
        ("a", 1): 0,
        ("a", 2): 0,
        ("a", 3): 0,
        ("a", 4): 1,
        ("a", 5): 2,
    }


def test_pack_groups_are_independent_and_order_driven(spark):
    rows = [("b", 10, 100), ("a", 2, 100), ("a", 1, 100), ("b", 11, 10)]
    got = _pack(spark, rows, 110)
    # Bins restart per group; within a group assignment follows ord.
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 10): 0, ("b", 11): 0}


def test_pack_sharded_matches_per_shard_reference(spark):
    """Sharded packing must equal the plain packer run per (group, shard):
    sharding changes the grouping, never the recurrence."""
    from data_pipeline_challenge_spark.operators.packing import (
        pack_sequences_sharded,
    )

    rows = [("a", o, 40 + (o % 3) * 30) for o in range(1, 41)] + [
        ("b", o, 90) for o in range(1, 6)
    ]
    expected = {}
    by_gs = {}
    for g, o, t in rows:
        by_gs.setdefault((g, o % 4), []).append((o, t))
    for (g, sh), items in by_gs.items():
        fill, cur, first = 0, 0, True
        for o, t in sorted(items):
            if not first and fill + t > 120:
                cur += 1
                fill = t
            else:
                fill += t
            first = False
            expected[(g, sh, o)] = cur

    df = spark.createDataFrame(rows, "g string, ord bigint, tok bigint")
    out = pack_sequences_sharded(
        df, "g", "ord", "tok", capacity=120, n_shards=4,
        shard=F.pmod(F.col("ord"), F.lit(4)),
    )
    got = {(r["g"], r["shard"], r["ord"]): r["bin"] for r in out.collect()}
    assert got == expected


def test_pack_sharded_bounds_group_rows_on_skew(spark):
    """On a skewed corpus (one giant source) the default xxhash64 shard must
    keep every applyInPandas group bounded near |group|/n_shards — the
    property that makes the sharded form the 100 TB path."""
    from data_pipeline_challenge_spark.operators.packing import (
        pack_sequences_sharded,
    )

    n_big, n_shards = 4000, 16
    rows = [("big", o, 10) for o in range(n_big)] + [("tiny", o, 10) for o in range(5)]
    df = spark.createDataFrame(rows, "g string, ord bigint, tok bigint")
    out = pack_sequences_sharded(df, "g", "ord", "tok", capacity=120, n_shards=n_shards)
    sizes = {
        (r["g"], r["shard"]): r["n"]
        for r in out.groupBy("g", "shard").agg(F.count("*").alias("n")).collect()
    }
    big_sizes = [n for (g, _), n in sizes.items() if g == "big"]
    assert len(big_sizes) == n_shards  # xxhash64 spread hit every shard
    assert sum(big_sizes) == n_big
    # no shard more than 2x the even split — the walk is O(bounded)
    assert max(big_sizes) <= 2 * (n_big // n_shards)


def test_profile_columns_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "y")], "a bigint, b string"
    )
    rows = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert rows["a"]["n_rows"] == 4
    assert rows["a"]["n_nulls"] == 1
    assert rows["a"]["n_distinct"] == 2  # NULL excluded, SQL rule
    assert rows["b"]["n_nulls"] == 1
    assert rows["b"]["n_distinct"] == 2


def test_profile_columns_approx_mode_single_scan(spark):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    out = profile_columns(df, ["a", "b"], exact=False)
    rows = {r["column"]: r for r in out.collect()}
    # HLL is approximate: wide tolerance on the big column, exact-ish small.
    assert abs(rows["a"]["n_distinct"] - 1000) <= 50
    assert rows["b"]["n_distinct"] == 7
    # No Expand operator in the approximate plan (stays partial-merge).
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_contamination_report_counts(spark):
    from data_pipeline_challenge_spark.operators.decontam import contamination_report

    # eval doc 100 = "a b c d"; eval doc 101 = "x y z".
    ev = spark.createDataFrame(
        [(100, "a b c d"), (101, "x y z")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, "a b c d e"),   # shares "a b c","b c d" with 100
            (2, "x y z w"),     # shares "x y z" with 101
            (3, "p q r s"),     # clean
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shared"], r["n_eval_docs"])
        for r in contamination_report(tr, ev, "doc_id", "text", n=3).collect()
    }
    assert got == {1: (2, 1), 2: (1, 1)}  # doc 3 absent (no overlap)


def test_int8_quantization_edges_and_plan(spark):
    from data_pipeline_challenge_spark.operators.quantization import quantization_stats

    df = spark.createDataFrame(
        [
            (1, [1.0, -1.0, 0.5]),   # x=+scale clamps to 127, -scale -> -127
            (2, [0.0, 0.0, 0.0]),    # zero vector: scale 0, all codes 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = quantization_stats(df, ["vec_id"], "embedding")
    rows = {r["vec_id"]: r for r in out.collect()}
    # codes for vec 1: [127, -127, 64] (floor(0.5*127+0.5)=floor(64)=64)
    assert rows[1]["q_sum"] == 64 and rows[1]["q_abs_sum"] == 318
    assert rows[1]["q_norm2"] == 127**2 * 2 + 64**2
    assert rows[1]["n_saturated"] == 2
    assert rows[2]["scale"] == 0.0 and rows[2]["q_norm2"] == 0
    # Pure map: no exchange anywhere in the plan.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_table_diff_classification(spark):
    from data_pipeline_challenge_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5), (3, "c", 7)], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(2, "b", 5), (3, "CHANGED", 7), (4, "d", None)], "k long, s string, v long"
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    # null-safe: (2, None==None on v is impossible here, but 1 has None v and
    # is removed; add an explicit null-vs-null pair)
    old2 = spark.createDataFrame([(1, None)], "k long, v string")
    new2 = spark.createDataFrame([(1, None)], "k long, v string")
    assert table_diff(old2, new2, ["k"]).collect()[0]["change_type"] == "unchanged"


def test_compact_parquet_dir_reduces_files_and_keeps_data(spark, tmp_path):
    from data_pipeline_challenge_spark.operators.maintenance import compact_parquet_dir

    p = tmp_path / "tbl"
    df = spark.range(10000).selectExpr("id", "id % 17 AS grp")
    df.repartition(40).write.parquet(str(p))
    before = len(list(p.rglob("*.parquet")))
    rep = compact_parquet_dir(spark, p, target_file_bytes=1 << 30, sort_col="id")
    after_files = list(p.rglob("*.parquet"))
    assert rep.files_before == before and before >= 40
    assert rep.files_after == len(after_files) == 1
    assert rep.rows == 10000
    got = spark.read.parquet(str(p))
    assert got.count() == 10000
    assert got.agg({"id": "sum"}).collect()[0][0] == sum(range(10000))


def test_compact_published_table_retention_over_crash_remnant(spark, tmp_path):
    """compact_published_table's retention keeps {compacted, previously
    published} by identity: a complete-but-unpublished higher version (its
    own crash window's remnant) is swept, and the version readers were
    pinned to survives the publish."""
    import os
    import shutil

    from data_pipeline_challenge_spark.operators.maintenance import (
        compact_published_table,
    )

    base = tmp_path / "tbl"
    base.mkdir()
    v0 = base / "data.v0"
    spark.range(100).coalesce(1).write.parquet(str(v0))
    (base / "current").symlink_to("data.v0")
    # crash remnant: complete v1 that was never published
    shutil.copytree(v0, base / "data.v1")

    rep = compact_published_table(spark, base / "current")
    assert rep.rows == 100
    cur = os.readlink(base / "current")
    assert cur == "data.v2"
    assert v0.exists(), "previously published version was deleted"
    assert not (base / "data.v1").exists(), "stale remnant retained"
    assert spark.read.parquet(str(base / "current")).count() == 100


def test_pack_sequences_property_vs_reference(spark):
    """Greedy packing on Spark must equal a plain-Python reference packer
    on randomized corpora (sizes, capacities, group counts)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_challenge_spark.operators.packing import pack_sequences

    @settings(max_examples=12, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["g1", "g2", "g3"]),
                st.integers(min_value=0, max_value=10**6),
                st.integers(min_value=0, max_value=300),
            ),
            max_size=40,
            unique_by=lambda r: (r[0], r[1]),
        ),
        cap=st.integers(min_value=1, max_value=250),
    )
    def check(rows, cap):
        expected = {}
        by_group = {}
        for g, o, t in sorted(rows):
            by_group.setdefault(g, []).append((o, t))
        for g, items in by_group.items():
            fill, cur, first = 0, 0, True
            for o, t in items:
                if not first and fill + t > cap:
                    cur += 1
                    fill = t
                else:
                    fill += t
                first = False
                expected[(g, o)] = cur
        df = spark.createDataFrame(rows, "g string, ord bigint, tok bigint")
        got = {
            (r["g"], r["ord"]): r["bin"]
            for r in pack_sequences(df, "g", "ord", "tok", capacity=cap).collect()
        }
        assert got == expected

    check()


def test_table_diff_property_vs_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_challenge_spark.operators.diff import table_diff

    snap = st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
        max_size=20,
    )

    @settings(max_examples=12, deadline=None)
    @given(old=snap, new=snap)
    def check(old, new):
        expected = {}
        for k in set(old) | set(new):
            if k not in old:
                expected[k] = "added"
            elif k not in new:
                expected[k] = "removed"
            elif old[k] == new[k]:
                expected[k] = "unchanged"
            else:
                expected[k] = "changed"
        o = spark.createDataFrame(list(old.items()) or [(None, None)], "k long, v long").filter("k IS NOT NULL")
        n = spark.createDataFrame(list(new.items()) or [(None, None)], "k long, v long").filter("k IS NOT NULL")
        got = {r["k"]: r["change_type"] for r in table_diff(o, n, ["k"]).collect()}
        assert got == expected

    check()


def test_ivf_indexed_probe_prunes_partitions(spark, tmp_path):
    """The persisted IVF index probes via PARTITION pruning: the cluster
    filter resolves at planning time and non-probed partitions are never
    read; results equal the in-flight ivf_topk."""
    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.catalog import load_table
    from data_pipeline_challenge_spark.operators.similarity import (
        ivf_build_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    rest = emb.filter(F.col("vec_id") != 0)

    idx = tmp_path / "ivf"
    ivf_build_index(rest, idx, n_clusters=8)
    out = ivf_topk_indexed(spark, idx, qvec, k=5, n_probe=3)

    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    seg = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "cluster" in seg  # pruning is a partition filter, not a scan filter

    got = [(r["vec_id"], round(r["sim"], 9)) for r in out.collect()]
    expected = [
        (r["vec_id"], round(r["sim"], 9))
        for r in ivf_topk(rest, qvec, k=5, n_clusters=8, n_probe=3).collect()
    ]
    assert got == expected


def _pq_fixture(spark, tmp_path):
    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.catalog import load_table
    from data_pipeline_challenge_spark.operators.similarity import pq_build_index

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    rest = emb.filter(F.col("vec_id") != 0)
    idx = tmp_path / "pq"
    pq_build_index(rest, idx)
    return qvec, rest, idx


def test_pq_indexed_matches_inflight(spark, tmp_path):
    """The persisted-index serving path returns exactly the rows the
    in-flight pq_topk computes (same seeded codebooks, same LUT/score
    arithmetic, same rerank) — the index changes cost, never results."""
    from data_pipeline_challenge_spark.operators.similarity import (
        pq_topk,
        pq_topk_indexed,
    )

    qvec, rest, idx = _pq_fixture(spark, tmp_path)
    base = [
        (r["vec_id"], round(r["sim"], 9)) for r in pq_topk(rest, qvec, k=10).collect()
    ]
    indexed = [
        (r["vec_id"], round(r["sim"], 9))
        for r in pq_topk_indexed(spark, idx, qvec, rest, k=10).collect()
    ]
    assert indexed == base and len(indexed) == 10


def test_pq_indexed_plan_reads_code_table(spark, tmp_path):
    """The serving plan ADC-scans the persisted code table and contains NO
    pandas-UDF stage: the encode pass ran once at build time, so a query
    at 100 TB reads m-small-int codes, not float vectors, and never pays
    Python. Float vectors appear only via the broadcast-keyed rerank."""
    from data_pipeline_challenge_spark.operators.similarity import pq_topk_indexed

    qvec, rest, idx = _pq_fixture(spark, tmp_path)
    out = pq_topk_indexed(spark, idx, qvec, rest, k=10)
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "pq/codes" in plan  # the shortlist scan reads the code table
    # no Python evaluation anywhere in the serving plan (encode was build-time)
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_lsh_indexed_matches_inflight(spark, tmp_path):
    """The persisted-index LSH probe returns exactly the rows of the
    in-flight ann_topk (same seeded projection, same buckets, same
    cosine), single- and multi-probe alike."""
    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.catalog import load_table
    from data_pipeline_challenge_spark.operators.similarity import (
        ann_topk,
        lsh_build_index,
        lsh_topk_indexed,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    rest = emb.filter(F.col("vec_id") != 0)
    idx = tmp_path / "lsh"
    lsh_build_index(rest, idx, dim=64, n_planes=5)
    for hamming in (0, 1):
        base = [
            (r["vec_id"], round(r["sim"], 9))
            for r in ann_topk(
                rest, qvec, dim=64, k=10, n_planes=5, probe_hamming=hamming
            ).collect()
        ]
        indexed = [
            (r["vec_id"], round(r["sim"], 9))
            for r in lsh_topk_indexed(
                spark, idx, qvec, k=10, probe_hamming=hamming
            ).collect()
        ]
        assert indexed == base and len(indexed) == 10


def test_lsh_indexed_probe_prunes_partitions(spark, tmp_path):
    """The persisted LSH probe is a PARTITION filter resolved at planning
    time — non-probed bucket partitions are never read — and the serving
    plan contains no Python stage (the bucket matmul ran at build time;
    the query's own bucket is driver-side numpy)."""
    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.catalog import load_table
    from data_pipeline_challenge_spark.operators.similarity import (
        lsh_build_index,
        lsh_topk_indexed,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    rest = emb.filter(F.col("vec_id") != 0)
    idx = tmp_path / "lsh"
    lsh_build_index(rest, idx, dim=64, n_planes=5)
    out = lsh_topk_indexed(spark, idx, qvec, k=10, probe_hamming=1)
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    seg = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "bucket" in seg  # pruning is a partition filter, not a scan filter
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_lsh_headline_fills_k(spark):
    """The registered headline LSH queries must actually FILL a top-10:
    the plane count derives from the corpus (expected bucket size >= 4k)
    and Hamming-1 probing covers an unluckily-split neighborhood, so the
    serving registration can't under-fill k the way a fixed plane count
    does on a small corpus. In-flight and indexed twins stay identical."""
    from data_pipeline_challenge_spark.operators.similarity import (
        lsh_planes_for_corpus,
    )
    from data_pipeline_challenge_spark.plans.similarity import (
        ann_lsh_top10,
        ann_lsh_top10_indexed,
    )

    # derivation: expected bucket size >= 4k at every magnitude, capped
    assert lsh_planes_for_corpus(500, 10) == 3  # 8 buckets, ~62/bucket
    assert lsh_planes_for_corpus(2000, 10) == 5  # 32 buckets
    assert lsh_planes_for_corpus(10**9, 10) == 24  # capped fan-out
    assert lsh_planes_for_corpus(1, 10) == 1  # degenerate corpus

    inflight = [
        (r["vec_id"], r["sim"])
        for r in ann_lsh_top10(spark, "/root/testdata/sf0.001").collect()
    ]
    indexed = [
        (r["vec_id"], r["sim"])
        for r in ann_lsh_top10_indexed(spark, "/root/testdata/sf0.001").collect()
    ]
    assert len(inflight) == 10
    assert inflight == indexed


def test_ann_ivf_indexed_query_matches_inflight(spark):
    """The registered serving twin returns exactly the registered
    in-flight query's rows at the registered configuration (16 clusters,
    4 probes, k=10) — the index changes cost, never results."""
    import __spark_entry__ as mod

    qs = mod.queries()
    sf = "/root/testdata/sf0.001"
    a = [(r["vec_id"], r["sim"]) for r in qs["ann_ivf_top10"](spark, sf).collect()]
    b = [
        (r["vec_id"], r["sim"])
        for r in qs["ann_ivf_top10_indexed"](spark, sf).collect()
    ]
    assert a == b
    assert len(a) == 10


def test_group_texts_blocks_invariants(spark):
    """group_texts_blocks (the LM group-texts step): every non-final
    block of a shard holds exactly block_len tokens, the final block at
    most that; each doc's contributions across blocks sum to its token
    count (nothing lost or duplicated at boundaries); docs longer than
    a block span multiple blocks; and the output is
    partitioning-independent."""
    from collections import defaultdict

    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.operators.packing import (
        group_texts_blocks,
    )

    rows = [(i, (i * 37) % 90 + 1) for i in range(120)]  # tok in [1, 90]
    rows += [(1000, 75), (1001, 130)]  # one doc longer than a block
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    L = 64
    out = group_texts_blocks(df, "doc_id", "tok", block_len=L).collect()

    per_block: dict = defaultdict(int)
    per_doc: dict = defaultdict(int)
    blocks_of_doc: dict = defaultdict(set)
    for r in out:
        assert 1 <= r["n_tokens"] <= L
        per_block[(r["shard"], r["block_id"])] += r["n_tokens"]
        per_doc[r["doc_id"]] += r["n_tokens"]
        blocks_of_doc[r["doc_id"]].add((r["shard"], r["block_id"]))
    assert per_doc == dict(rows)  # conservation per doc
    last_block = {}
    for (shard, b), _tot in per_block.items():
        last_block[shard] = max(last_block.get(shard, -1), b)
    for (shard, b), tot in per_block.items():
        if b < last_block[shard]:
            assert tot == L  # every non-final block exactly full
        else:
            assert tot <= L
    assert len(blocks_of_doc[1001]) >= 2  # 130 tokens must span blocks

    again = group_texts_blocks(
        df.repartition(13), "doc_id", "tok", block_len=L
    ).collect()
    key = lambda r: (r["shard"], r["block_id"], r["doc_id"], r["n_tokens"])  # noqa: E731
    assert sorted(map(key, again)) == sorted(map(key, out))

    # custom shard expressions may reference ANY input column (e.g.
    # domain-pure blocks sharded by language): evaluated before the
    # frame is narrowed to (id, tok)
    df_lang = df.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr")
    )
    by_lang = group_texts_blocks(
        df_lang, "doc_id", "tok", block_len=L, shard=F.col("lang")
    ).collect()
    assert {r["shard"] for r in by_lang} == {"en", "fr"}
    for r in by_lang:  # blocks never mix domains
        assert r["shard"] == ("en" if r["doc_id"] % 2 == 0 else "fr")


def test_materialize_block_texts_byte_exact(spark):
    """VERDICT r12 #6: the group-texts reader must reconstruct every
    block's token stream BYTE-exactly from the assignment map's explicit
    slice offsets, and every block except each shard's tail must be
    exactly block_len tokens. Tokens are globally unique so any slice or
    ordering error changes bytes."""
    import hashlib
    from collections import defaultdict

    import pyspark.sql.functions as F

    from data_pipeline_challenge_spark.operators.packing import (
        group_texts_blocks,
        materialize_block_texts,
    )

    L = 32
    rows = []
    for i in range(90):
        n = (i * 29) % 70 + 1  # 1..70 tokens, some docs span blocks
        rows.append((f"doc{i}", [f"d{i}w{j}" for j in range(n)]))
    docs = spark.createDataFrame(rows, "doc_id string, toks array<string>")

    t = docs.select("doc_id", F.size("toks").alias("tok"))
    blocks = group_texts_blocks(t, "doc_id", "tok", block_len=L)
    out = {
        (r["shard"], r["block_id"]): (r["n_tokens"], r["seq_text"])
        for r in materialize_block_texts(blocks, docs, "doc_id", "toks").collect()
    }

    # independent pure-Python reconstruction of the group-texts rule
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    streams: dict = defaultdict(list)
    for doc_id, toks in sorted(rows, key=lambda r: (md5(r[0]), r[0])):
        streams[md5(doc_id)[:2]].extend(toks)
    expect = {}
    for shard, stream in streams.items():
        for b in range((len(stream) + L - 1) // L):
            sub = stream[b * L : (b + 1) * L]
            expect[(shard, b)] = (len(sub), " ".join(sub))
    assert out == expect
    # every non-tail block is exactly full
    tail = {s: max(b for (sh, b) in out if sh == s) for s in {sh for sh, _ in out}}
    for (sh, b), (n, _txt) in out.items():
        assert n == L or b == tail[sh]
