"""Tests: JSONL conversion (splittable landing) + custom stateful operator."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from data_pipeline_challenge_spark.catalog import load_events
from data_pipeline_challenge_spark.pipeline import ProductWarehouse
from data_pipeline_challenge_spark.sources.jsonl import array_to_jsonl, iter_json_array
from data_pipeline_challenge_spark.sources.landing import upload
from data_pipeline_challenge_spark.streaming.stateful import (
    running_user_stats,
    running_user_stats_batch,
)

from .fixtures import products_basic, write_json


def test_iter_json_array_streaming_tokenizer(tmp_path):
    recs = [
        {"code": "A", "nested": {"x": [1, 2, {"y": "}]"}]}, "s": 'tricky "quoted" ]}'},
        {"code": "B", "t": "commas, inside, strings"},
        {"code": "C"},
    ]
    p = tmp_path / "a.json"
    p.write_text(json.dumps(recs, ensure_ascii=False))
    assert list(iter_json_array(p, chunk_bytes=7)) == recs  # tiny chunks: cross-boundary safety

    (tmp_path / "bad.json").write_text('[{"code": "A"}, {"code": ')
    with pytest.raises(ValueError):
        list(iter_json_array(tmp_path / "bad.json"))
    (tmp_path / "notarray.json").write_text('{"code": "A"}')
    with pytest.raises(ValueError):
        list(iter_json_array(tmp_path / "notarray.json"))
    (tmp_path / "empty.json").write_text("[]")
    assert list(iter_json_array(tmp_path / "empty.json")) == []


def test_array_to_jsonl_chunks_and_ingest_parity(spark, tmp_path, landing, warehouse):
    """Chunked JSONL landing produces the same product table as the raw
    array file — the at-scale landing path is semantics-preserving."""
    recs = products_basic(120)
    src = tmp_path / "products.json"
    write_json(src, recs)
    chunks = array_to_jsonl(src, tmp_path / "chunks", records_per_file=50)
    assert [c.name for c in chunks] == [
        "products.part00000.jsonl",
        "products.part00001.jsonl",
        "products.part00002.jsonl",
    ]
    assert sum(1 for c in chunks for _ in open(c)) == 120

    # ingest the chunks (3 parallel parse tasks instead of 1)
    for c in chunks:
        upload(c, landing)
    wh = ProductWarehouse(spark, warehouse)
    wh.ingest(landing)
    jsonl_table = {
        (r["code"], r["product_name"], tuple(sorted(r["attrs"].items())))
        for r in wh.products().collect()
    }

    wh2 = ProductWarehouse(spark, tmp_path / "wh2")
    landing2 = tmp_path / "landing2"
    upload(src, landing2)
    wh2.ingest(landing2)
    array_table = {
        (r["code"], r["product_name"], tuple(sorted(r["attrs"].items())))
        for r in wh2.products().collect()
    }
    assert jsonl_table == array_table


def test_stateful_running_user_stats(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches; the final
    per-user state equals the one-shot batch aggregation."""
    ev = load_events(spark, "/root/testdata/sf0.001").select("user_id", "ts", "value")
    # split by TIME into two source files → most users appear in BOTH
    # micro-batches, so state must accumulate across batches
    mid = ev.approxQuantile("value", [0.5], 0.0)[0]
    half1 = ev.filter(F.col("value") <= mid)
    half2 = ev.filter(F.col("value") > mid)
    src = tmp_path / "src"
    half1.coalesce(1).write.mode("append").parquet(str(src))
    half2.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a user's row on every batch that touches it;
    # n_events grows monotonically, so the final state is the max-n row
    rows = spark.table("state_out").collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"], r["last_event_us"])
    expected = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_event_us"])
        for r in running_user_stats_batch(ev).collect()
    }
    assert final == expected


def test_iter_json_array_property_roundtrip(tmp_path):
    """The streaming tokenizer must agree with json.loads on every valid
    array-of-objects document, at adversarial chunk boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    json_values = st.recursive(
        st.none()
        | st.booleans()
        | st.integers(min_value=-(10**12), max_value=10**12)
        | st.floats(allow_nan=False, allow_infinity=False)
        | st.text(max_size=20),
        lambda inner: st.lists(inner, max_size=4)
        | st.dictionaries(st.text(max_size=8), inner, max_size=4),
        max_leaves=12,
    )
    arrays = st.lists(st.dictionaries(st.text(max_size=8), json_values, max_size=5), max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(recs=arrays, chunk=st.integers(min_value=1, max_value=64), indent=st.sampled_from([None, 1]))
    def check(recs, chunk, indent):
        p = tmp_path / "prop.json"
        p.write_text(json.dumps(recs, ensure_ascii=False, indent=indent))
        assert list(iter_json_array(p, chunk_bytes=chunk)) == recs

    check()


def test_iter_json_array_rejects_malformed_variants(tmp_path):
    cases = {
        "trail.json": '[{"a": 1}] trailing',
        "elem.json": '[{"a": 1}, 42]',
        "unterm.json": '[{"a": 1}',
        "deep_bad.json": '[{"a": {"b": }}]',
        "not_utf8.json": None,  # written as bytes below
    }
    (tmp_path / "not_utf8.json").write_bytes(b'[{"a": "\xff\xfe"}]')
    for name, content in cases.items():
        if content is not None:
            (tmp_path / name).write_text(content)
        with pytest.raises(ValueError):
            list(iter_json_array(tmp_path / name))


def test_json_array_datasource_reads_and_flags_malformed(spark, tmp_path):
    from data_pipeline_challenge_spark.sources.json_array_source import (
        JsonArrayDataSource,
    )

    good = tmp_path / "good.json"
    good.write_text('[{"code": "a", "n": 1}, {"code": "b", "extra": [1, 2]}]')
    bad = tmp_path / "bad.json"
    bad.write_text('[{"code": "a"},')

    spark.dataSource.register(JsonArrayDataSource)
    df = (
        spark.read.format("json_array")
        .option("paths", f"{good},{bad}")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per file
    rows = {(r["file_id"], r["seq"]): r["value"] for r in df.collect()}
    assert rows[("good.json", 0)] == '{"code":"a","n":1}'
    assert rows[("good.json", 1)] == '{"code":"b","extra":[1,2]}'
    # Malformed file: parsed prefix + sentinel; consumers drop the file_id.
    assert rows[("bad.json", -1)] is None
    assert rows[("bad.json", 0)] == '{"code":"a"}'
    assert len(rows) == 4


def test_stateful_running_user_stats_tws(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API) accumulates across
    micro-batches identically to the batch aggregation."""
    # The TWS driver worker speaks protobuf to the JVM state server;
    # without the protobuf package the query cannot even initialize.
    pytest.importorskip("google.protobuf.descriptor")
    from data_pipeline_challenge_spark.streaming.stateful import (
        running_user_stats_batch,
        running_user_stats_tws,
    )

    ev = load_events(spark, "/root/testdata/sf0.001").select("user_id", "ts", "value")
    mid = ev.approxQuantile("value", [0.5], 0.0)[0]
    src = tmp_path / "src"
    ev.filter(F.col("value") <= mid).coalesce(1).write.mode("append").parquet(str(src))
    ev.filter(F.col("value") > mid).coalesce(1).write.mode("append").parquet(str(src))

    # TWS requires the RocksDB state store (the rescalable production
    # backend); scope the conf to this test and restore after.
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    rows = spark.table("tws_out").collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"], r["last_event_us"])
    expected = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_event_us"])
        for r in running_user_stats_batch(ev).collect()
    }
    assert final == expected


def test_json_array_datasource_streaming_tails_directory(spark, tmp_path):
    """The streaming flavor consumes files arriving across micro-batches
    exactly once (SimpleDataSourceStreamReader offsets)."""
    from data_pipeline_challenge_spark.sources.json_array_source import (
        JsonArrayDataSource,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.json").write_text('[{"k": 1}, {"k": 2}]')
    (land / "b.json").write_text('[{"k": 3}]')

    spark.dataSource.register(JsonArrayDataSource)
    out = tmp_path / "out"

    def run_once():
        q = (
            spark.readStream.format("json_array").option("dir", str(land)).load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_ja"))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second run restarts from the checkpoint: a new file lands, only IT
    # is consumed (exactly-once across restarts)
    (land / "c.json").write_text('[{"k": 4}]')
    run_once()
    rows = sorted(
        (r["file_id"], r["seq"], r["value"])
        for r in spark.read.parquet(str(out)).collect()
    )
    assert rows == [
        ("a.json", 0, '{"k":1}'),
        ("a.json", 1, '{"k":2}'),
        ("b.json", 0, '{"k":3}'),
        ("c.json", 0, '{"k":4}'),
    ]


def test_load_events_normalizes_all_ts_encodings(spark, tmp_path):
    """events.parquet's physical ts type has changed across driver
    generations: INT64(TIMESTAMP_NANOS), TIMESTAMP_NTZ(us), and plain
    TIMESTAMP(us). load_events must yield the identical (ts, ts_ns) pair
    for the same wall-clock instants under every encoding — and do it
    without consulting the session timezone (regression for the
    regenerated-testdata breakage where unix_micros rejected NTZ)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_challenge_spark.catalog import load_events

    # the third instant's UTC wall time (2025-03-09 02:30) falls inside
    # America/New_York's spring-forward gap — a session-timezone cast in
    # the NTZ path would shift it by 1h (see catalog.ntz_epoch_us)
    wall_us = [0, 1_700_000_123_456_789, 1_741_487_400_000_000, 1_800_000_000_000_000]
    base = {
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([10, 20, 30, 40], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        "props": pa.array(["{}"] * 4),
    }
    encodings = {
        "nanos": pa.array([u * 1000 for u in wall_us], pa.timestamp("ns")),
        "ntz_us": pa.array(wall_us, pa.timestamp("us")),
        "tz_us": pa.array(wall_us, pa.timestamp("us", tz="UTC")),
    }
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # hostile-driver condition: a DST session timezone
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {}
        for name, ts_arr in encodings.items():
            d = tmp_path / name
            d.mkdir()
            pq.write_table(
                pa.table({**base, "ts": ts_arr}), str(d / "events.parquet")
            )
            df = load_events(spark, str(d))
            rows = sorted(
                (r["event_id"], r["ts_ns"]) for r in df.collect()
            )
            got[name] = rows
            assert [r[1] for r in rows] == [u * 1000 for u in wall_us], name
        assert got["nanos"] == got["ntz_us"] == got["tz_us"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_json_array_source_replay_tolerates_gcd_file(spark, tmp_path):
    """readBetweenOffsets replay of a committed range can race the
    pipeline's landing GC: a vanished file must yield zero rows (its rows
    were delivered in the original run), not wedge the restart; a
    present-but-malformed file still takes the sentinel path."""
    import json as _json

    from data_pipeline_challenge_spark.sources.json_array_source import (
        JsonArrayDataSource,
    )

    spark.dataSource.register(JsonArrayDataSource)
    good = tmp_path / "g.json"
    good.write_text(_json.dumps([{"code": "1"}]))
    df = (
        spark.read.format("json_array")
        .option("paths", f"{tmp_path}/vanished.json,{good}")
        .load()
    )
    rows = df.collect()
    assert {r["file_id"] for r in rows} == {"g.json"}
    assert len(rows) == 1


def test_foreign_cpu_meter_excludes_own_subtree():
    """bench.py's contention stamp: CPU burned by THIS process tree must
    not count as foreign load (a quiet bench saturating local[32] would
    otherwise flag itself), while the meter still reports a number on a
    plain Linux /proc."""
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from bench import _ForeignCpuMeter

    meter = _ForeignCpuMeter()
    meter.start()
    if meter._start is None:  # hardened /proc: meter legitimately disabled
        pytest.skip("/proc accounting unavailable")
    start = meter._start
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < 1.0:  # burn ~1 core in-process
        x += 1
    elapsed = time.monotonic() - t0
    foreign = meter.foreign_cores_avg()
    end = meter._sample()
    assert foreign is not None and end is not None
    import os

    hz = os.sysconf("SC_CLK_TCK") or 100
    total_busy = (end[0] - start[0]) / (hz * elapsed)
    # contention-robust relative check: the ~1 core WE burned must be
    # attributed to self, i.e. foreign sits well below total busy —
    # regardless of how loaded the box otherwise is.
    assert foreign <= total_busy - 0.6
