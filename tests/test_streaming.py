"""Streaming parity tests (M6): file-drop source → watermarked
event-time windows → memory sink, plus running-count (A1) and
foreachBatch (T5) behavior. All deterministic: processAllAvailable
drains each stage, no sleeps."""

import json

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etlp_spark import ops
from etlp_spark.streaming import (
    StreamingPipeline,
    file_stream,
    running_counts,
    tumbling_counts,
    with_event_time,
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    return d


def _write_batch(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_file_stream_tumbling_window_with_late_data(spark, stream_dir, tmp_path):
    _write_batch(
        stream_dir,
        "b1.jsonl",
        [
            {"ts": "2024-01-01 00:00:30", "user": 1},
            {"ts": "2024-01-01 00:01:10", "user": 2},
            {"ts": "2024-01-01 00:02:20", "user": 1},
        ],
    )
    src = file_stream(spark, str(stream_dir), "ts timestamp, user long", fmt="json")
    windowed = tumbling_counts(with_event_time(src, "ts", "10 minutes"), "ts", "1 minute")
    pipe = StreamingPipeline(source=windowed, output_mode="complete")
    q = pipe.start(spark, ("memory", "win1"))
    try:
        q.processAllAvailable()
        # late arrival within the 10-minute watermark joins its window
        _write_batch(stream_dir, "b2.jsonl", [{"ts": "2024-01-01 00:00:45", "user": 3}])
        q.processAllAvailable()
        got = {
            r.window.start.strftime("%H:%M"): r.n
            for r in spark.sql("select * from win1").collect()
        }
        assert got == {"00:00": 2, "00:01": 1, "00:02": 1}
    finally:
        q.stop()


def test_streaming_session_window_merges_across_batches(spark, stream_dir):
    """Streaming session windows (the stateful twin of the batch
    w9_session_window_builtin query): events arriving in DIFFERENT
    micro-batches but within the gap merge into ONE session in the
    state store; append mode emits a session only once the watermark
    passes its end (session aggregations reject update mode — the
    merged window's identity isn't stable until finalized)."""
    from etlp_spark.streaming import StreamingPipeline, session_counts

    _write_batch(
        stream_dir,
        "b1.jsonl",
        [
            {"ts": "2024-01-01 00:00:00", "user": 1},
            {"ts": "2024-01-01 00:10:00", "user": 1},
        ],
    )
    src = file_stream(spark, str(stream_dir), "ts timestamp, user long", fmt="json")
    sess = session_counts(
        with_event_time(src, "ts", "10 minutes"), "ts", "30 minutes", "user"
    )
    pipe = StreamingPipeline(source=sess, output_mode="append")
    q = pipe.start(spark, ("memory", "sess1"))
    try:
        q.processAllAvailable()
        # watermark (00:10 - 10min) hasn't passed any session end yet
        assert spark.sql("select * from sess1").count() == 0
        # batch 2: 00:35 lands inside the open session's gap → merges
        # (end extends to 01:05); 02:00 starts a new session AND
        # advances the watermark to 01:50, finalizing the merged one
        _write_batch(
            stream_dir,
            "b2.jsonl",
            [
                {"ts": "2024-01-01 00:35:00", "user": 1},
                {"ts": "2024-01-01 02:00:00", "user": 1},
            ],
        )
        q.processAllAvailable()
        got = {
            (r.user, r.session_window.start.strftime("%H:%M"),
             r.session_window.end.strftime("%H:%M")): r.n
            for r in spark.sql("select * from sess1").collect()
        }
        assert got == {(1, "00:00", "01:05"): 3}  # merged across batches
        # batch 3: push the watermark past the 02:00 session's end
        _write_batch(stream_dir, "b3.jsonl", [{"ts": "2024-01-01 04:00:00", "user": 2}])
        q.processAllAvailable()
        got = {
            (r.user, r.session_window.start.strftime("%H:%M"),
             r.session_window.end.strftime("%H:%M")): r.n
            for r in spark.sql("select * from sess1").collect()
        }
        assert got[(1, "02:00", "02:30")] == 1  # beyond gap → own session
        assert got[(1, "00:00", "01:05")] == 3
    finally:
        q.stop()


def test_running_counts_update_mode(spark, stream_dir):
    """A1: the atom-held running count as a streaming aggregation."""
    _write_batch(stream_dir, "b1.jsonl", [{"k": "a"}, {"k": "a"}, {"k": "b"}])
    src = file_stream(spark, str(stream_dir), "k string", fmt="json")
    pipe = StreamingPipeline(source=running_counts(src, "k"), output_mode="complete")
    q = pipe.start(spark, ("memory", "counts1"))
    try:
        q.processAllAvailable()
        _write_batch(stream_dir, "b2.jsonl", [{"k": "a"}])
        q.processAllAvailable()
        got = {r.k: r.n for r in spark.sql("select * from counts1").collect()}
        assert got == {"a": 3, "b": 1}
    finally:
        q.stop()


def test_foreach_batch_side_effects(spark, stream_dir):
    """T5 batch-then-act: per-micro-batch callback like the
    reference's partition-all + save-into-database."""
    _write_batch(stream_dir, "b1.jsonl", [{"v": 1}, {"v": 2}])
    seen: list[tuple[int, int]] = []

    def per_batch(df, epoch_id):
        seen.append((epoch_id, df.count()))

    src = file_stream(spark, str(stream_dir), "v long", fmt="json")
    pipe = StreamingPipeline(source=src, transforms=[ops.where(F.col("v") > 0)])
    q = pipe.start(spark, per_batch)
    try:
        q.processAllAvailable()
        _write_batch(stream_dir, "b2.jsonl", [{"v": 3}])
        q.processAllAvailable()
        assert sorted(seen) == [(0, 2), (1, 1)]
    finally:
        q.stop()


def test_checkpoint_recovery(spark, stream_dir, tmp_path):
    """The reference loses its atoms on crash (SURVEY.md §4.2); here
    state survives a stop/restart via the checkpoint."""
    ckpt = str(tmp_path / "ckpt")
    out_tbl = "recov1"
    _write_batch(stream_dir, "b1.jsonl", [{"k": "a"}])

    def build():
        src = file_stream(spark, str(stream_dir), "k string", fmt="json")
        return StreamingPipeline(
            source=running_counts(src, "k"), output_mode="complete", checkpoint=ckpt
        )

    q1 = build().start(spark, ("memory", out_tbl))
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    _write_batch(stream_dir, "b2.jsonl", [{"k": "a"}, {"k": "b"}])
    q2 = build().start(spark, ("memory", out_tbl))
    try:
        q2.processAllAvailable()
        got = {r.k: r.n for r in spark.sql(f"select * from {out_tbl}").collect()}
        # counts include the pre-restart batch exactly once
        assert got == {"a": 2, "b": 1}
    finally:
        q2.stop()


def test_sessionize_stateful(spark, stream_dir):
    """applyInPandasWithState sessionization: state survives across
    micro-batches; sessions close when the gap is exceeded."""
    from etlp_spark.streaming import sessionize

    _write_batch(
        stream_dir,
        "b1.jsonl",
        [
            {"ts": "2024-01-01 00:00:00", "user": 1},
            {"ts": "2024-01-01 00:10:00", "user": 1},
        ],
    )
    src = file_stream(spark, str(stream_dir), "ts timestamp, user long", fmt="json")
    q = (
        sessionize(src, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions1")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # b2: one event inside the gap (extends), one far outside (closes)
        _write_batch(stream_dir, "b2.jsonl", [{"ts": "2024-01-01 00:20:00", "user": 1}])
        q.processAllAvailable()
        assert spark.sql("select * from sessions1").count() == 0  # still open
        _write_batch(stream_dir, "b3.jsonl", [{"ts": "2024-01-01 09:00:00", "user": 1}])
        q.processAllAvailable()
        rows = spark.sql("select * from sessions1").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.n_events == 3  # the three-event session closed
        assert r.session_start.strftime("%H:%M") == "00:00"
        assert r.session_end.strftime("%H:%M") == "00:20"
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks attach to impressions
    of the same key within the interval."""
    import pathlib

    from etlp_spark.streaming import interval_join

    d1 = tmp_path / "imps"; d1.mkdir()
    d2 = tmp_path / "clicks"; d2.mkdir()
    (d1 / "b1.jsonl").write_text(
        '{"k": 1, "its": "2024-01-01 00:00:00"}\n{"k": 2, "its": "2024-01-01 00:00:30"}\n'
    )
    (d2 / "b1.jsonl").write_text(
        '{"k": 1, "cts": "2024-01-01 00:04:00"}\n'   # within 10 min → joins
        '{"k": 2, "cts": "2024-01-01 02:00:00"}\n'   # outside → dropped
    )
    imps = file_stream(spark, str(d1), "k long, its timestamp").withWatermark("its", "1 hour")
    clicks = file_stream(spark, str(d2), "k long, cts timestamp").withWatermark("cts", "1 hour")
    joined = interval_join(imps, clicks, "k", "its", "cts", within="10 minutes")
    q = joined.select("l.k", "its", "cts").writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from ssj").collect()
        assert [(r.k) for r in rows] == [1]
    finally:
        q.stop()


def test_count_log_sink_matches_reference_sequence(spark, stream_dir):
    """A1 parity artifact (VERDICT r1 #7): replay events as a file
    stream and assert the envelope-wrapped count-log sequence equals
    the reference's partition-all-100 behavior — one cumulative line
    per 100 records regardless of micro-batch boundaries, plus the
    final partial batch on close (stdout.clj:20-27,44)."""
    from etlp_spark.envelope import ENVELOPE_VERSION
    from etlp_spark.streaming import CountLogSink

    # micro-batches of 250, 70, 85 records → boundary crossings at
    # 100, 200 (batch 0), 300 (batch 1), 400 (batch 2), flush → 405
    for i, n in enumerate([250, 70, 85]):
        _write_batch(stream_dir, f"b{i}.jsonl", [{"v": j} for j in range(n)])

    sink = CountLogSink(batch_size=100, timestamp=0)
    src = file_stream(spark, str(stream_dir), "v long", fmt="json", max_files_per_trigger=1)
    q = StreamingPipeline(source=src).start(spark, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink.flush(spark)

    parsed = [json.loads(line) for line in sink.logs]
    assert [p["data"] for p in parsed] == [
        f"Total Count of Records:: {n}" for n in (100, 200, 300, 400, 405)
    ]
    assert all(
        p["type"] == "log"
        and p["version"] == ENVELOPE_VERSION
        and p["schema"] == "etlp_raw"
        and p["timestamp"] == 0
        for p in parsed
    )
    assert sink.total == 405


def test_streaming_dedup_within_watermark(spark, stream_dir):
    """Streaming exact dedup: same fingerprint arriving again within
    the watermark window is dropped; distinct fingerprints pass."""
    from etlp_spark.streaming import streaming_dedup

    _write_batch(
        stream_dir,
        "b1.jsonl",
        [
            {"fp": "aaa", "ts": "2024-01-01T00:00:00", "v": 1},
            {"fp": "aaa", "ts": "2024-01-01T00:00:01", "v": 2},
            {"fp": "bbb", "ts": "2024-01-01T00:00:02", "v": 3},
        ],
    )
    src = file_stream(spark, str(stream_dir), "fp string, ts timestamp, v long", fmt="json")
    deduped = streaming_dedup(src, "ts", "10 minutes", "fp")
    q = StreamingPipeline(source=deduped).start(spark, ("memory", "dedup1"))
    try:
        q.processAllAvailable()
        _write_batch(
            stream_dir,
            "b2.jsonl",
            [
                {"fp": "aaa", "ts": "2024-01-01T00:00:03", "v": 4},
                {"fp": "ccc", "ts": "2024-01-01T00:00:04", "v": 5},
            ],
        )
        q.processAllAvailable()
        rows = spark.sql("select fp, v from dedup1").collect()
        assert sorted((r.fp, r.v) for r in rows) == [("aaa", 1), ("bbb", 3), ("ccc", 5)]
    finally:
        q.stop()


def test_stream_static_enrichment_join(spark, stream_dir):
    """Stream-static join: each micro-batch joins against a static
    dimension (broadcast per batch — the standard streaming enrich;
    no state, unlike stream-stream joins)."""
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "uid long, tier string")
    _write_batch(stream_dir, "b1.jsonl", [{"uid": 1, "v": 10}, {"uid": 2, "v": 20}, {"uid": 3, "v": 30}])
    src = file_stream(spark, str(stream_dir), "uid long, v long", fmt="json")
    enriched = src.join(F.broadcast(dim), "uid", "left")
    q = StreamingPipeline(source=enriched).start(spark, ("memory", "enrich1"))
    try:
        q.processAllAvailable()
        rows = spark.sql("select uid, v, tier from enrich1").collect()
        assert sorted(((r.uid, r.v, r.tier) for r in rows), key=str) == sorted(
            [(1, 10, "gold"), (2, 20, "silver"), (3, 30, None)], key=str
        )
    finally:
        q.stop()


def test_count_log_sink_retried_epoch_is_idempotent(spark):
    """foreachBatch is at-least-once: replaying the same epoch must
    not double-count or emit duplicate log lines."""
    from etlp_spark.streaming import CountLogSink

    sink = CountLogSink(batch_size=100, timestamp=0)
    df = spark.range(150).selectExpr("id AS v")
    sink(df, epoch_id=0)
    sink(df, epoch_id=0)  # retry of the same micro-batch
    sink(df, epoch_id=1)
    sink.flush(spark)
    parsed = [json.loads(l)["data"] for l in sink.logs]
    assert parsed == [
        "Total Count of Records:: 100",
        "Total Count of Records:: 200",
        "Total Count of Records:: 300",
    ]
    assert sink.total == 300


def test_running_counts_transform_with_state(spark, stream_dir, tmp_path):
    """A1 on Spark 4's transformWithStateInPandas (StatefulProcessor +
    typed RocksDB value state): counts accumulate across micro-batches
    and only touched keys re-emit (Update mode).

    RUNS FOR REAL as of round 5. This container installs no protobuf
    distribution, but ``etlp_spark.protobuf_vendor.ensure_protobuf``
    (invoked in conftest before the JVM starts) path-injects the
    pure-Python protobuf 6.32.0 runtime bundled with the public
    Google Cloud SDK and sets protobuf's own documented
    ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch for
    the one-minor-version gencode pin (6.33 gencode / 6.32 runtime —
    same wire format). Workers inherit it via PYTHONPATH. Skips only
    where no runtime can be vendored at all."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime (StateMessage_pb2 "
        "gencode); none installed and none vendorable on this host",
    )
    from etlp_spark.streaming import running_counts_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(stream_dir, "b1.jsonl", [{"k": "a"}, {"k": "a"}, {"k": "b"}])
        src = file_stream(spark, str(stream_dir), "k string", fmt="json")
        q = (
            running_counts_tws(src, "k")
            .writeStream.format("memory")
            .queryName("tws1")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .start()
        )
        try:
            q.processAllAvailable()
            got1 = {(r.k, r.n) for r in spark.sql("select * from tws1").collect()}
            assert got1 == {("a", 2), ("b", 1)}
            _write_batch(stream_dir, "b2.jsonl", [{"k": "a"}])
            q.processAllAvailable()
            rows = [(r.k, r.n) for r in spark.sql("select * from tws1").collect()]
            # update mode appends the re-emitted rows; the latest 'a' is 3,
            # 'b' was untouched by batch 2 so it does not re-emit
            assert ("a", 3) in rows
            assert rows.count(("b", 1)) == 1
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_running_counts_tws_plan_builds(spark, stream_dir):
    """The TWS operator's logical plan and output schema resolve
    without the state server (which needs protobuf) — so the API
    surface is verified even where the runtime dependency is absent."""
    from etlp_spark.streaming import running_counts_tws

    _write_batch(stream_dir, "b1.jsonl", [{"k": "a"}])
    src = file_stream(spark, str(stream_dir), "k string", fmt="json")
    out = running_counts_tws(src, "k")
    assert out.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("k", "string"), ("n", "bigint"),
    ]


def test_heavy_hitters_tws_across_batches(spark, stream_dir, tmp_path):
    """Cross-batch streaming top-k on MapState: per-bucket counts
    persist in RocksDB and keep accumulating as later micro-batches
    arrive; each batch re-emits the bucket's refreshed top-k with
    deterministic (count desc, value) ordering."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import heavy_hitters_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "h1.jsonl",
            [{"v": "x"}, {"v": "x"}, {"v": "y"}, {"v": "z"}, {"v": "y"}],
        )
        src = file_stream(spark, str(stream_dir), "v string", fmt="json")
        # buckets=1: every value lands in one state group, so the
        # emitted top-k IS the global top-k (keeps the assert exact)
        q = (
            heavy_hitters_tws(src, "v", k=2, buckets=1)
            .writeStream.format("memory")
            .queryName("tws_topk")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_topk"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = [(r.value, r.cnt) for r in spark.sql(
                "select * from tws_topk order by cnt desc, value").collect()]
            assert got == [("x", 2), ("y", 2)]  # tie → value asc, k=2
            # second batch: z overtakes via PERSISTED count state
            _write_batch(stream_dir, "h2.jsonl",
                         [{"v": "z"}, {"v": "z"}, {"v": "z"}])
            q.processAllAvailable()
            rows = [(r.value, r.cnt) for r in spark.sql(
                "select * from tws_topk").collect()]
            assert ("z", 4) in rows  # 1 (batch 1, from state) + 3 (batch 2)
            assert ("x", 2) in rows
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_ewma_tws_across_batches(spark, stream_dir, tmp_path):
    """Cross-batch stateful EWMA on transformWithStateInPandas: the
    smoothed value persists in RocksDB value state and keeps folding
    as later micro-batches arrive — verified against a pure-Python
    fold over the same value sequence."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import ewma_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "e1.jsonl",
            [{"k": "a", "v": 10.0}, {"k": "a", "v": 20.0}, {"k": "b", "v": 5.0}],
        )
        src = file_stream(spark, str(stream_dir), "k string, v double", fmt="json")
        q = (
            ewma_tws(src, "k", "v", alpha=0.5)
            .writeStream.format("memory")
            .queryName("tws_ewma")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {(r.k): (r.ewma, r.n) for r in spark.sql(
                "select * from tws_ewma").collect()}
            # a: 10 -> 0.5*20 + 0.5*10 = 15 ; b: 5
            assert got["a"] == (15.0, 2)
            assert got["b"] == (5.0, 1)
            _write_batch(stream_dir, "e2.jsonl", [{"k": "a", "v": 7.0}])
            q.processAllAvailable()
            rows = [(r.k, r.ewma, r.n) for r in spark.sql(
                "select * from tws_ewma").collect()]
            # a continues from persisted state: 0.5*7 + 0.5*15 = 11
            assert ("a", 11.0, 3) in rows
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_spacesaving_tws_bounded_state_matches_exact_topk(spark, stream_dir, tmp_path):
    """SpaceSaving bounded-state heavy hitters (VERDICT r6 #3): on a
    skewed two-micro-batch stream with MORE distinct values than the
    m=6 counter budget, the bounded variant's top-k set matches the
    exact top-k, the heavy values' counts are exact (inserted before
    any eviction pressure, never evicted), every emitted count
    brackets the truth (cnt - err <= true <= cnt), and counts keep
    accumulating across the checkpoint boundary."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import heavy_hitters_spacesaving_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        # skew: hot=8, warm=5, then 8 singletons (11 distinct > m=6)
        batch1 = (
            [{"v": "hot"}] * 8
            + [{"v": "warm"}] * 5
            + [{"v": f"rare{i}"} for i in range(8)]
        )
        _write_batch(stream_dir, "s1.jsonl", batch1)
        src = file_stream(spark, str(stream_dir), "v string", fmt="json")
        q = (
            heavy_hitters_spacesaving_tws(src, "v", k=2, m=6, buckets=1)
            .writeStream.format("memory")
            .queryName("tws_ss")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {r.value: (r.cnt, r.err) for r in spark.sql(
                "select * from tws_ss").collect()}
            # top-2 set matches exact top-2; heavy counts are exact
            assert set(got) == {"hot", "warm"}
            assert got["hot"] == (8, 0)
            assert got["warm"] == (5, 0)
            # second batch: warm2 surges past warm via PERSISTED state
            _write_batch(
                stream_dir, "s2.jsonl",
                [{"v": "hot"}] * 3 + [{"v": "warm2"}] * 7,
            )
            q.processAllAvailable()
            rows = {r.value: (r.cnt, r.err) for r in spark.sql(
                "select * from tws_ss").collect()}
            assert rows["hot"] == (11, 0)  # 8 (from state) + 3
            # warm2 entered by evicting some minimum counter: its
            # count OVERESTIMATES truth (7) by exactly err, never
            # underestimates
            c, e = rows["warm2"]
            assert c - e <= 7 <= c
            # the memory sink accumulates update-mode emissions, so
            # batch 1's rows remain — assert batch 2's top-2 arrived
            assert {"hot", "warm2"} <= set(rows)
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_session_gap_tws_event_time_timers(spark, stream_dir, tmp_path):
    """Event-time TIMERS on transformWithStateInPandas (the fourth
    TWS capability exercised, after value/EWMA/map state): a key's
    open session closes with NO further data on that key when the
    WATERMARK passes session_end + gap — the semantics the
    applyInPandasWithState NoTimeout sessionizer cannot give. Also
    covers the in-batch gap split (a later event > gap after the open
    session closes it immediately)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import session_gap_tws, with_event_time

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "g1.jsonl",
            [
                {"k": "a", "ts": "2024-01-01T00:00:00"},
                {"k": "a", "ts": "2024-01-01T00:00:30"},
                {"k": "b", "ts": "2024-01-01T00:00:00"},
            ],
        )
        src = with_event_time(
            file_stream(spark, str(stream_dir), "k string, ts timestamp",
                        fmt="json"),
            "ts", "0 seconds",
        )
        q = (
            session_gap_tws(src, "k", "ts", gap_seconds=60)
            .writeStream.format("memory")
            .queryName("tws_sess")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
            .start()
        )
        try:
            q.processAllAvailable()
            # batch 2: a's 00:10 event is > gap after its open session
            # -> in-batch close; watermark advances to 00:10
            _write_batch(stream_dir, "g2.jsonl",
                         [{"k": "a", "ts": "2024-01-01T00:10:00"}])
            q.processAllAvailable()
            # batch 3: b's timer (00:01:30) < watermark (00:10) fires
            # -> b's session closes with NO new data on key b
            _write_batch(stream_dir, "g3.jsonl",
                         [{"k": "c", "ts": "2024-01-01T00:20:00"}])
            q.processAllAvailable()
            rows = {
                (r.k, str(r.session_start), str(r.session_end), r.n_events)
                for r in spark.sql("select * from tws_sess").collect()
            }
            assert ("a", "2024-01-01 00:00:00", "2024-01-01 00:00:30", 2) in rows
            assert ("b", "2024-01-01 00:00:00", "2024-01-01 00:00:00", 1) in rows
            # a's second session ALSO closed by timer: batch 3's
            # watermark advance (to 00:20) triggers a follow-up batch
            # where a's 00:11 deadline has passed — closure with no
            # further data on key a, which is the timer's whole point
            assert ("a", "2024-01-01 00:10:00", "2024-01-01 00:10:00", 1) in rows
            assert len([r for r in rows if r[0] == "a"]) == 2
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_session_gap_tws_late_out_of_order_events(spark, stream_dir, tmp_path):
    """ADVICE r7 (medium): with watermark delay > gap, a late group
    can arrive entirely BEFORE the open session. The one-sided merge
    check (`g_start - cur[1] <= gap`) is always true for such groups
    (negative difference), so events arbitrarily far in the past were
    absorbed into the open session and session_start was never
    extended backwards. Now: two-sided within-gap check, start =
    min() on a backward merge, and an earlier DISJOINT group closes
    as its own session immediately."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import session_gap_tws, with_event_time

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "h1.jsonl",
            [{"k": "a", "ts": "2024-01-01T00:10:00"}],
        )
        src = with_event_time(
            file_stream(spark, str(stream_dir), "k string, ts timestamp",
                        fmt="json"),
            "ts", "30 minutes",  # delay >> gap: late data is legal
        )
        q = (
            session_gap_tws(src, "k", "ts", gap_seconds=60)
            .writeStream.format("memory")
            .queryName("tws_sess_late")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_sess_late"))
            .start()
        )
        try:
            q.processAllAvailable()
            # batch 2, all LATE relative to the open (00:10, 00:10)
            # session: 00:09:30 is within gap BEFORE start (backward
            # merge, start extends to 00:09:30); 00:01:00 is disjoint
            # BEFORE (own closed session, open session unaffected)
            _write_batch(
                stream_dir, "h2.jsonl",
                [
                    {"k": "a", "ts": "2024-01-01T00:09:30"},
                    {"k": "a", "ts": "2024-01-01T00:01:00"},
                ],
            )
            q.processAllAvailable()
            # advance the watermark far past every deadline so the
            # merged open session closes by timer
            _write_batch(stream_dir, "h3.jsonl",
                         [{"k": "z", "ts": "2024-01-01T02:00:00"}])
            q.processAllAvailable()
            rows = {
                (r.k, str(r.session_start), str(r.session_end), r.n_events)
                for r in spark.sql(
                    "select * from tws_sess_late where k = 'a'"
                ).collect()
            }
            assert ("a", "2024-01-01 00:01:00", "2024-01-01 00:01:00", 1) in rows
            assert ("a", "2024-01-01 00:09:30", "2024-01-01 00:10:00", 2) in rows
            assert len(rows) == 2
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_approx_distinct_tws_matches_batch_hll_exactly(spark, stream_dir, tmp_path):
    """Streaming HLL (approx_distinct_tws): registers persisted in
    MapState are md5-derived and therefore BIT-IDENTICAL to the batch
    kernel's — after two micro-batches (with overlap between them),
    the emitted est_e6 per key EQUALS hll_estimate over the union of
    both batches, exactly. No tolerance band: this is the portability
    claim of functions/sketches.py under checkpointed streaming."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.functions.sketches import py_hll_estimate, py_hll_update
    from etlp_spark.streaming import approx_distinct_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        b1 = {"a": [f"u{i}" for i in range(300)], "b": ["x", "y", "z"]}
        b2 = {"a": [f"u{i}" for i in range(150, 500)], "b": ["z", "w"]}
        _write_batch(
            stream_dir, "d1.jsonl",
            [{"k": k, "v": v} for k, vs in b1.items() for v in vs],
        )
        src = file_stream(spark, str(stream_dir), "k string, v string", fmt="json")
        q = (
            approx_distinct_tws(src, "k", "v")
            .writeStream.format("memory")
            .queryName("tws_hll")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "d2.jsonl",
                [{"k": k, "v": v} for k, vs in b2.items() for v in vs],
            )
            q.processAllAvailable()
            # memory sink in update mode accumulates; the LAST emission
            # per key is the live estimate
            rows = spark.sql("select * from tws_hll").collect()
            latest = {}
            for r in rows:
                latest[r.k] = r.est_e6  # emissions arrive in batch order
            for k in ("a", "b"):
                union = set(b1.get(k, [])) | set(b2.get(k, []))
                regs: dict[int, int] = {}
                py_hll_update(union, regs)
                assert latest[k] == py_hll_estimate(regs), k
            # sanity: "a" has 500 true distinct; estimate within 20%
            assert abs(latest["a"] / 1e6 - 500) / 500 < 0.2
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_ddsketch_tws_matches_batch_kernel_exactly(spark, stream_dir, tmp_path):
    """Streaming DDSketch (ddsketch_tws): bucket counts persisted in
    MapState merge additively, so after two micro-batches the emitted
    p50/p95/p99 per key EQUAL the batch kernel (dd_sketch +
    dd_quantiles) over the union of both batches — exact equality,
    the same portability claim approx_distinct_tws makes for HLL."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.functions.sketches import dd_quantiles, dd_sketch
    from etlp_spark.streaming import ddsketch_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        b1 = {"a": [1.0005 ** i for i in range(0, 2000)], "b": [5.0, 50.0, 500.0]}
        b2 = {"a": [1.0005 ** i for i in range(2000, 3000)], "b": [0.5]}
        _write_batch(
            stream_dir, "q1.jsonl",
            [{"k": k, "v": v} for k, vs in b1.items() for v in vs],
        )
        src = file_stream(spark, str(stream_dir), "k string, v double", fmt="json")
        q = (
            ddsketch_tws(src, "k", "v")
            .writeStream.format("memory")
            .queryName("tws_dd")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "q2.jsonl",
                [{"k": k, "v": v} for k, vs in b2.items() for v in vs],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_dd").collect():
                latest[(r.k, r.pct)] = r.est_e6  # batch order: last wins
            for k in ("a", "b"):
                union = b1.get(k, []) + b2.get(k, [])
                df = spark.createDataFrame([(v,) for v in union], "v double")
                batch = {
                    int(r.q * 100 + 0.5): r.est_e6
                    for r in dd_quantiles(dd_sketch(df, "v"), (0.5, 0.95, 0.99)).collect()
                }
                for pct in (50, 95, 99):
                    assert latest[(k, pct)] == batch[pct], (k, pct)
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_cusum_tws_matches_batch_closed_form_exactly(spark, stream_dir, tmp_path):
    """Streaming CUSUM (cusum_tws): all-integer state (P, min prefix,
    n), so after two micro-batches the emitted S per key EQUALS the
    x120 prefix-sum closed form over the concatenated series — exact
    equality, no floats anywhere (the strongest form of the
    approx_distinct/ddsketch portability claim)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import cusum_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    MU, SLACK = 10_000_000, 1_000_000  # mean 10/unit, 10% slack (e6)
    b1 = {"a": [10, 11, 9, 30, 31], "b": [10, 10]}
    b2 = {"a": [32, 28], "b": [9]}
    try:
        _write_batch(
            stream_dir, "c1.jsonl",
            [{"k": k, "v": v} for k, vs in b1.items() for v in vs],
        )
        src = file_stream(spark, str(stream_dir), "k string, v long", fmt="json")
        q = (
            cusum_tws(src, "k", "v", mu_e6=MU, slack_e6=SLACK)
            .writeStream.format("memory")
            .queryName("tws_cusum")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "c2.jsonl",
                [{"k": k, "v": v} for k, vs in b2.items() for v in vs],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_cusum").collect():
                latest[r.k] = (r.s_e6, r.n, r.alarmed)  # last batch wins
            for k in ("a", "b"):
                series = b1.get(k, []) + b2.get(k, [])
                p, minp = 0, 0
                for x in series:  # the x120 closed form, driver-side
                    p += x * 1_000_000 - MU - SLACK
                    minp = min(minp, p)
                s = p - min(0, minp)
                assert latest[k] == (s, len(series), s > MU), (k, latest[k], s)
            # key 'a' drifted +3x mean for 4 of 7 points: must alarm;
            # key 'b' hovered at the mean: must not
            assert latest["a"][2] is True
            assert latest["b"][2] is False
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_psi_drift_tws_matches_batch_fold(spark, stream_dir, tmp_path):
    """Streaming PSI (psi_drift_tws): live bin counts are integer
    state, so after two micro-batches the emitted psi_e6 per key
    equals x139's BATCH fold (JVM doubles, F.aggregate in bin order)
    over the concatenated series — the drift-family twin the r9
    verdict asked for. Key 'a' is replayed matching the reference
    (no drift); key 'b' piles into the top bin (must alarm). Key 'a'
    also carries NEGATIVE values in batch 2: out of the histogram's
    documented nonnegative domain, they must be SKIPPED (not wrapped
    into the top bin by Python negative indexing, not counted in n)
    — the r10 advice finding."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import psi_drift_tws

    REF = [6, 3, 1]  # reference histogram: bins [0,10) [10,20) [20,inf)
    BIN_W = 10
    b1 = {"a": [1, 2, 11, 3], "b": [25, 27, 29]}
    # -7 would land in counts[-1] (the top bin) under naive
    # `v // bin_width` indexing; -40 would raise IndexError.
    b2 = {"a": [4, 5, 21, -7, -40], "b": [31, 33, 2]}

    def batch_psi(values):
        # x139's batch arithmetic verbatim: spine join + ordered fold
        n_bins = len(REF)
        live = spark.createDataFrame([(v,) for v in values], "v long")
        cnt = (
            live.select(
                F.expr(f"least(v div {BIN_W}, {n_bins - 1})").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        spine = spark.createDataFrame(
            [(i, REF[i]) for i in range(n_bins)], "bin long, ca long"
        )
        filled = spine.join(cnt, "bin", "left").select(
            "bin", "ca", F.coalesce("cb", F.lit(0)).alias("cb")
        )
        tot = filled.groupBy().agg(
            F.sum("ca").cast("long").alias("na"),
            F.sum("cb").cast("long").alias("nb"),
            F.count(F.lit(1)).cast("long").alias("v"),
            F.array_sort(F.collect_list(F.struct("bin", "ca", "cb"))).alias("arr"),
        )
        na, nb, v = F.col("na"), F.col("nb"), F.col("v")
        psi = F.aggregate(
            F.transform(
                F.col("arr"),
                lambda s: (
                    ((s["cb"] + F.lit(1.0)) / (nb + v))
                    - ((s["ca"] + F.lit(1.0)) / (na + v))
                )
                * F.log(
                    ((s["cb"] + F.lit(1.0)) / (nb + v))
                    / ((s["ca"] + F.lit(1.0)) / (na + v))
                ),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        return tot.select(
            F.floor(psi * 1000000 + F.lit(0.5)).cast("long").alias("psi_e6")
        ).first()["psi_e6"]

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "p1.jsonl",
            [{"k": k, "v": v} for k, vs in b1.items() for v in vs],
        )
        src = file_stream(spark, str(stream_dir), "k string, v long", fmt="json")
        q = (
            psi_drift_tws(src, "k", "v", ref_counts=REF, bin_width=BIN_W)
            .writeStream.format("memory")
            .queryName("tws_psi")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_psi"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "p2.jsonl",
                [{"k": k, "v": v} for k, vs in b2.items() for v in vs],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_psi").collect():
                latest[r.k] = (r.n, r.psi_e6, r.drifted)  # last batch wins
            for k in ("a", "b"):
                # the equals-batch claim is scoped to the nonnegative
                # domain; negatives are dropped by contract
                series = [v for v in b1.get(k, []) + b2.get(k, []) if v >= 0]
                want = batch_psi(series)
                assert latest[k] == (len(series), want, want > 200_000), (
                    k, latest[k], want,
                )
            # 'b' lives entirely in the reference's rarest bin → alarm;
            # 'a' tracks the reference shape → quiet
            assert latest["b"][2] is True
            assert latest["a"][2] is False
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_ks_drift_tws_matches_batch_statistic(spark, stream_dir, tmp_path):
    """Streaming KS (ks_drift_tws): the live per-value histogram is
    integer MapState, so after two micro-batches the emitted
    (d_cross, d_e6, rejected) per key equals x133's BATCH arithmetic
    (integer cross-multiplication over the merged support, float
    critical-value compare) with the frozen reference as side 1 and
    the concatenated live series as side 2 — the rank/CDF drift twin
    the r10 verdict asked for. Key 'a' tracks the reference's
    support; key 'b' lives entirely above it (D = 1, must reject);
    ties with reference values exercise the same-x stepping."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import ks_drift_tws

    REF = {1: 3, 2: 4, 3: 2, 5: 1}  # n1 = 10
    b1 = {"a": [1, 2, 2, 3], "b": [20, 25, 21]}
    b2 = {"a": [5, 1, 2], "b": [30, 22, 24, 29]}

    def batch_ks(live):
        # x133's batch arithmetic verbatim (hist -> cumulative window
        # -> integer cross-multiplied max), ref as src0, live as src1
        two = spark.createDataFrame(
            [("src0", v) for v, c in REF.items() for _ in range(c)]
            + [("src1", v) for v in live],
            "source string, n_chars long",
        )
        hist = two.groupBy("n_chars").agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("f1"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("f2"),
        )
        sz = hist.agg(F.sum("f1").alias("n1"), F.sum("f2").alias("n2"))
        w = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
        steps = hist.select(
            F.sum("f1").over(w).alias("c1"), F.sum("f2").over(w).alias("c2")
        )
        d = steps.crossJoin(F.broadcast(sz)).agg(
            F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
                  ).alias("d_cross"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
        crit = F.lit(1.358102) * F.sqrt(
            (F.col("n1").cast("double") + F.col("n2"))
            / (F.col("n1").cast("double") * F.col("n2"))
        )
        r = d.select(
            "d_cross",
            F.expr("(d_cross * 1000000) div (n1 * n2)").alias("d_e6"),
            (F.col("d_cross").cast("double")
             / (F.col("n1").cast("double") * F.col("n2")) > crit
             ).alias("rejected"),
        ).first()
        return (r.d_cross, r.d_e6, r.rejected)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "ks1.jsonl",
            [{"k": k, "v": v} for k, vs in b1.items() for v in vs],
        )
        src = file_stream(spark, str(stream_dir), "k string, v long", fmt="json")
        q = (
            ks_drift_tws(src, "k", "v", ref_hist=REF)
            .writeStream.format("memory")
            .queryName("tws_ks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_ks"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "ks2.jsonl",
                [{"k": k, "v": v} for k, vs in b2.items() for v in vs],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_ks").collect():
                latest[r.k] = (r.n1, r.n2, r.d_cross, r.d_e6, r.rejected)
            for k in ("a", "b"):
                series = b1.get(k, []) + b2.get(k, [])
                want = batch_ks(series)
                assert latest[k] == (10, len(series), *want), (k, latest[k], want)
            assert latest["b"][4] is True  # disjoint support: D = 1
            assert latest["a"][4] is False
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_mann_whitney_tws_matches_batch_arithmetic(spark, stream_dir, tmp_path):
    """Streaming Mann-Whitney (mann_whitney_tws): after two
    micro-batches the emitted (u1_x2, z_e6, rejected) per key equals
    x140's BATCH arithmetic (doubled midranks over the per-value
    histogram, exact tie correction, double variance product,
    e6-floored z) with the frozen reference as side 1 and the
    concatenated live series as side 2. Key 'a' interleaves the
    reference's own values (heavy TIES — exercises the Lehmann
    correction); key 'b' sits entirely above (location shift, must
    reject)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import mann_whitney_tws

    REF = {10: 4, 20: 3, 30: 3}  # n1 = 10
    b1 = {"a": [10, 20, 20, 30], "b": [50, 55, 60]}
    b2 = {"a": [30, 10, 20], "b": [52, 58, 61, 57]}

    def batch_mw(live):
        # x140's batch arithmetic verbatim over (ref=src0, live=src1)
        dec = "decimal(38,0)"
        two = spark.createDataFrame(
            [("src0", v) for v, c in REF.items() for _ in range(c)]
            + [("src1", v) for v in live],
            "source string, n_chars long",
        )
        hist = two.groupBy("n_chars").agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
            .cast("long").alias("f1"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
            .cast("long").alias("f2"),
        )
        wb = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, -1)
        rk = hist.select(
            "f1", "f2",
            F.coalesce(F.sum(F.col("f1") + F.col("f2")).over(wb), F.lit(0)
                       ).alias("cb"),
        )
        f, f1c = F.col("f1") + F.col("f2"), F.col("f1")
        m = rk.agg(
            F.sum("f1").cast("long").alias("n1"),
            F.sum("f2").cast("long").alias("n2"),
            F.sum(f1c.cast(dec) * (F.lit(2) * F.col("cb") + f + 1)).alias("r1x2"),
            F.sum(f.cast(dec) * f * f - f).alias("t3"),
        )
        n1, n2 = F.col("n1"), F.col("n2")
        n = n1 + n2
        s = m.select(
            n1, n2,
            (F.col("r1x2") - n1.cast(dec) * (n1 + 1)).alias("u1x2"),
            (F.col("r1x2") - n1.cast(dec) * (n1 + 1) - n1.cast(dec) * n2
             ).alias("u2d"),
            (n1.cast("double") * n2
             * (n.cast(dec) * n * n - n - F.col("t3")).cast("double")
             ).alias("n1n2a_d"),
            (F.lit(12).cast(dec) * n * (n - 1)).alias("dvar"),
        )
        zv = (F.col("u2d").cast("double") / F.lit(2.0)) / F.sqrt(
            F.col("n1n2a_d") / F.col("dvar").cast("double")
        )
        r = s.select(
            F.col("u1x2").cast("long").alias("u1_x2"),
            F.floor(zv * 1000000 + F.lit(0.5)).cast("long").alias("z_e6"),
            (F.abs(zv) > 1.959964).alias("rejected"),
        ).first()
        return (r.u1_x2, r.z_e6, r.rejected)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "mw1.jsonl",
            [{"k": k, "v": v} for k, vs in b1.items() for v in vs],
        )
        src = file_stream(spark, str(stream_dir), "k string, v long", fmt="json")
        q = (
            mann_whitney_tws(src, "k", "v", ref_hist=REF)
            .writeStream.format("memory")
            .queryName("tws_mw")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_mw"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "mw2.jsonl",
                [{"k": k, "v": v} for k, vs in b2.items() for v in vs],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_mw").collect():
                latest[r.k] = (r.n1, r.n2, r.u1_x2, r.z_e6, r.rejected)
            for k in ("a", "b"):
                series = b1.get(k, []) + b2.get(k, [])
                want = batch_mw(series)
                assert latest[k] == (10, len(series), *want), (k, latest[k], want)
            assert latest["b"][4] is True  # pure location shift
            assert latest["a"][4] is False  # replays the reference
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_int_hist_accumulate_rejects_non_integral():
    """The rank/CDF twins' integer-domain contract is ENFORCED, not
    just documented (r11 ADVICE): NULL/NaN skip, exact-integral
    floats fold, 3.7 raises instead of silently truncating to 3 and
    biasing the drift statistic."""
    import pandas as pd
    import pytest as _pt

    from etlp_spark.streaming import _int_hist_accumulate

    local: dict = {}
    _int_hist_accumulate(
        local, pd.Series([1, 2.0, 2, None, float("nan")]), "t"
    )
    assert local == {1: 1, 2: 2}
    with _pt.raises(ValueError, match="non-integral value 3.7"):
        _int_hist_accumulate(local, pd.Series([3.7]), "t")


def test_conformal_tws_matches_batch_arithmetic(spark, stream_dir, tmp_path):
    """Streaming split-conformal (conformal_tws): after two
    micro-batches the emitted (n_cal, n_eval, q_hat_cents, covered,
    coverage_e6) per key equals x142's BATCH arithmetic (truncating
    integer mean, ceil-rank order statistic off the distinct-residual
    histogram, eval-half coverage count) over the concatenated
    series — the last batch-only member of the monitoring family
    gains its twin (r11 verdict item 6). Key 'a' mixes calibration
    (even id) and eval (odd id) rows with ties; key 'b' is
    ALL-NEGATIVE cents (exercises the truncate-toward-zero mean,
    where Python floor would differ) and has no eval rows until
    batch 2 (NULL coverage first)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import conformal_tws

    b1 = {
        "a": [(0, 100), (2, 140), (4, 100), (1, 120), (3, 260)],
        "b": [(10, -100), (12, -105), (14, -109)],
    }
    b2 = {
        "a": [(6, 160), (8, 100), (5, 115), (7, 99)],
        # cal sum -417 over 4: trunc div -> -104, floor would be -105
        "b": [(16, -103), (11, -101), (13, -250)],
    }

    def batch_conformal(rows):
        # x142's Spark plan verbatim, adapted to (id, cents)
        pts = spark.createDataFrame(rows, "event_id long, cents long")
        cal = pts.where(F.col("event_id") % 2 == 0)
        mu = cal.agg(
            F.expr("sum(cents) div count(*)").cast("long").alias("mu_cents"),
            F.count(F.lit(1)).cast("long").alias("n_cal"),
        )
        res = cal.crossJoin(F.broadcast(mu)).select(
            F.abs(F.col("cents") - F.col("mu_cents")).alias("r")
        )
        hist = res.groupBy("r").agg(F.count(F.lit(1)).alias("f"))
        wc = W.orderBy("r").rowsBetween(W.unboundedPreceding, W.currentRow)
        cum = hist.select("r", F.sum("f").over(wc).alias("c"))
        k = mu.select(
            "mu_cents", "n_cal",
            F.least(
                F.expr("(9 * (n_cal + 1) + 9) div 10"), F.col("n_cal")
            ).alias("kr"),
        )
        q = (
            cum.crossJoin(F.broadcast(k))
            .where(F.col("c") >= F.col("kr"))
            .groupBy("mu_cents", "n_cal")
            .agg(F.min("r").alias("q_hat"))
        )
        ev = (
            pts.where(F.col("event_id") % 2 == 1)
            .crossJoin(F.broadcast(q))
            .groupBy("n_cal", "q_hat")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_eval"),
                F.sum(
                    F.when(
                        F.abs(F.col("cents") - F.col("mu_cents"))
                        <= F.col("q_hat"), 1,
                    ).otherwise(0)
                ).cast("long").alias("covered"),
            )
        )
        r = ev.select(
            "n_cal", "n_eval",
            F.col("q_hat").cast("long").alias("q_hat_cents"),
            "covered",
            F.expr("(covered * 1000000) div n_eval").cast("long")
            .alias("coverage_e6"),
        ).collect()
        if not r:  # no eval rows: interval only
            r2 = q.crossJoin(
                pts.where(F.col("event_id") % 2 == 0)
                .agg(F.count(F.lit(1)).alias("nc"))
            ).first()
            return (r2.n_cal, 0, r2.q_hat, None, None)
        row = r[0]
        return (row.n_cal, row.n_eval, row.q_hat_cents, row.covered,
                row.coverage_e6)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "cf1.jsonl",
            [{"k": k, "id": i, "v": v}
             for k, rows in b1.items() for i, v in rows],
        )
        src = file_stream(
            spark, str(stream_dir), "k string, id long, v long", fmt="json"
        )
        q = (
            conformal_tws(src, "k", "v", "id")
            .writeStream.format("memory")
            .queryName("tws_conformal")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_cf"))
            .start()
        )
        try:
            q.processAllAvailable()
            mid = {}
            for r in spark.sql("select * from tws_conformal").collect():
                mid[r.k] = (r.n_cal, r.n_eval, r.q_hat_cents, r.covered,
                            r.coverage_e6)
            # key 'b' has no eval rows yet: coverage NULL, interval live
            assert mid["b"][1] == 0 and mid["b"][4] is None
            assert mid["b"][2] is not None
            _write_batch(
                stream_dir, "cf2.jsonl",
                [{"k": k, "id": i, "v": v}
                 for k, rows in b2.items() for i, v in rows],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_conformal").collect():
                latest[r.k] = (r.n_cal, r.n_eval, r.q_hat_cents, r.covered,
                               r.coverage_e6)
            for k in ("a", "b"):
                series = b1.get(k, []) + b2.get(k, [])
                want = batch_conformal(series)
                assert latest[k] == want, (k, latest[k], want)
            # late calibration rows RETROACTIVELY moved 'a's interval:
            # batch-1 interval differs from the final one (the frozen-mu
            # failure mode this design structurally avoids)
            assert mid["a"][2] != latest["a"][2]
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_funnel_tws_matches_batch_walk(spark, stream_dir, tmp_path):
    """Streaming ordered funnel (funnel_tws): after two micro-batches
    the per-key (stage, ts0, ts1, ts2) equals x39's BATCH walk (min
    signup, min click strictly after, min purchase strictly after)
    over the concatenated events — and a LATE signup EARLIER than the
    one already seen retroactively re-qualifies clicks that sat
    "before signup", exactly as a batch recompute would (the
    frozen-stage-pointer failure mode this design avoids). Ties
    (click at exactly the signup timestamp) are excluded on both
    engines; non-funnel event types are ignored."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import funnel_tws

    b1 = [
        # key 'a': click+purchase arrive BEFORE any qualifying signup
        ("a", "click", 50), ("a", "purchase", 60), ("a", "signup", 100),
        # key 'b': signup first; an early click that precedes it
        ("b", "signup", 10), ("b", "click", 5), ("b", "view", 7),
        # key 'c': no signup at all
        ("c", "click", 1), ("c", "purchase", 2),
        # key 'd': tie cases — strictly-after excludes equal ts
        ("d", "signup", 10), ("d", "click", 10), ("d", "click", 11),
        ("d", "purchase", 11),
    ]
    b2 = [
        # the retroactive case: a LATE signup EARLIER than a's first
        ("a", "signup", 10),
        ("b", "click", 20), ("b", "purchase", 15), ("b", "purchase", 30),
        ("c", "click", 3),
        ("d", "purchase", 11),
    ]

    def batch_funnel(rows):
        # x39's three-stage batch walk, per key
        pts = spark.createDataFrame(rows, "k string, et string, ts long")
        s = (pts.where(F.col("et") == "signup")
             .groupBy("k").agg(F.min("ts").alias("t0")))
        c = (pts.where(F.col("et") == "click")
             .join(s, "k").where(F.col("ts") > F.col("t0"))
             .groupBy("k").agg(F.min("ts").alias("t1")))
        p = (pts.where(F.col("et") == "purchase")
             .join(c, "k").where(F.col("ts") > F.col("t1"))
             .groupBy("k").agg(F.min("ts").alias("t2")))
        out = {}
        t1s = {r.k: r.t1 for r in c.collect()}
        t2s = {r.k: r.t2 for r in p.collect()}
        for r in s.collect():
            t1, t2 = t1s.get(r.k), t2s.get(r.k)
            stage = 1 + (t1 is not None) + (t2 is not None)
            out[r.k] = (stage, r.t0, t1, t2)
        return out

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "fn1.jsonl",
            [{"k": k, "et": et, "ts": ts} for k, et, ts in b1],
        )
        src = file_stream(
            spark, str(stream_dir), "k string, et string, ts long",
            fmt="json",
        )
        q = (
            funnel_tws(src, "k", "et", "ts")
            .writeStream.format("memory")
            .queryName("tws_funnel")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_fn"))
            .start()
        )
        try:
            q.processAllAvailable()
            mid = {r.k: (r.stage, r.ts0_us, r.ts1_us, r.ts2_us)
                   for r in spark.sql("select * from tws_funnel").collect()}
            # 'a' is stuck at stage 1: its click/purchase precede the
            # only signup seen so far
            assert mid["a"] == (1, 100, None, None)
            assert mid["c"] == (0, None, None, None)
            # tie exclusion: d's click@10 == signup@10 doesn't count
            assert mid["d"] == (2, 10, 11, None)
            _write_batch(
                stream_dir, "fn2.jsonl",
                [{"k": k, "et": et, "ts": ts} for k, et, ts in b2],
            )
            q.processAllAvailable()
            latest = {r.k: (r.stage, r.ts0_us, r.ts1_us, r.ts2_us)
                      for r in spark.sql("select * from tws_funnel").collect()}
            want = batch_funnel(b1 + b2)
            for k in ("a", "b", "d"):
                assert latest[k] == want[k], (k, latest[k], want.get(k))
            # the late earlier signup retroactively completed a's funnel
            assert latest["a"] == (3, 10, 50, 60)
            assert latest["c"] == (0, None, None, None)
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_bootstrap_ci_tws_matches_batch_arithmetic(spark, stream_dir, tmp_path):
    """Streaming Poisson-bootstrap CI (bootstrap_ci_tws): all-integer
    replicate state, so after two micro-batches the emitted interval
    per key EQUALS x116's batch arithmetic (md5-sliced 16-bit
    uniforms -> inverse-CDF Poisson weights -> integer replicate
    means -> 2nd/31st order statistic) over the concatenated rows.
    Re-delivering a row draws the SAME weights (resample identity),
    which is the at-least-once-safety claim.

    Key 'c' exercises the r10 advice findings: NEGATIVE cents whose
    replicate means need Spark's truncate-toward-zero `div` (Python
    // floors -905/3 to -302; div gives -301), and a small n whose
    zero-weight replicates must rank NULLS FIRST like the batch
    row_number — rid 20 alone leaves 11 of 32 replicates empty, so
    the 2nd order statistic is NULL, never a fabricated 0 ranked
    above the (negative) real means."""
    import hashlib as _hl

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import _BOOT_THRESHOLDS, bootstrap_ci_tws

    b1 = {"a": [(1, 1000), (2, 1200), (3, 800), (4, 2000)],
          "b": [(10, 50), (11, 70)],
          "c": [(20, -305)]}
    b2 = {"a": [(5, 1500), (6, 900)], "b": [(12, 60), (13, 6000)],
          "c": [(21, -300)]}

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    def batch_ci(rows):
        s = [[0, 0] for _ in range(32)]
        tot = 0
        for rid, v in rows:
            digs = [_hl.md5(f"{rid}#B{j}".encode()).hexdigest() for j in range(4)]
            for r in range(32):
                u = int(digs[r // 8][(r % 8) * 4 : (r % 8) * 4 + 4], 16)
                w = 5
                for wi, t in enumerate(_BOOT_THRESHOLDS):
                    if u < t:
                        w = wi
                        break
                s[r][0] += w * v
                s[r][1] += w
            tot += v
        # x116's rank semantics: mean_r ASC NULLS FIRST, replicate
        # id tiebreak; an empty replicate's div is NULL
        means = sorted(
            (1, tdiv(sw, cw), r) if cw else (0, 0, r)
            for r, (sw, cw) in enumerate(s)
        )

        def stat(e):
            return e[1] if e[0] else None

        return (len(rows), tdiv(tot, len(rows)), stat(means[1]), stat(means[30]))

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "bc1.jsonl",
            [{"k": k, "rid": i, "cents": v}
             for k, rows in b1.items() for i, v in rows],
        )
        src = file_stream(
            spark, str(stream_dir), "k string, rid long, cents long", fmt="json"
        )
        q = (
            bootstrap_ci_tws(src, "k", "cents", "rid")
            .writeStream.format("memory")
            .queryName("tws_boot")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_boot"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write_batch(
                stream_dir, "bc2.jsonl",
                [{"k": k, "rid": i, "cents": v}
                 for k, rows in b2.items() for i, v in rows],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_boot").collect():
                latest[r.k] = (r.n, r.est_cents, r.boot_lo_cents, r.boot_hi_cents)
            for k in ("a", "b", "c"):
                assert latest[k] == batch_ci(b1[k] + b2[k]), k
            # b's outlier (6000 vs ~60) must blow its interval wide open
            assert (latest["b"][3] - latest["b"][2]) > (
                latest["a"][3] - latest["a"][2]
            )
            # c: >=2 replicates sampled neither row -> NULL lower
            # bound (NULLS FIRST), while rank 31 is a real (negative,
            # truncate-divided) mean — the fixture is chosen so both
            # fixed paths actually fire
            assert latest["c"][2] is None
            assert latest["c"][3] is not None and latest["c"][3] < 0
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_paths_tws_matches_batch_sessionization(spark, stream_dir, tmp_path):
    """Streaming session paths (paths_tws): after two micro-batches
    the per-key (n_sessions, paths) equals w7's BATCH walk (gap
    sessionization, (ts, event_id)-ordered type sequence per session)
    over the concatenated events — and a chain of LATE events landing
    between two existing sessions retroactively MERGES them into one,
    while a late event inside a session reorders its path, exactly as
    a batch recompute would (both are wrong under a
    frozen-session-pointer design). Same-timestamp events order by
    event_id on both engines."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import paths_tws

    GAP = 1000  # micros, to keep fixture numbers small
    b1 = [
        # key 'a': two sessions under gap=1000 — [100, 200], [5000]
        ("a", "view", 100, 1), ("a", "click", 200, 2),
        ("a", "view", 5000, 3),
        # key 'b': same-ts tiebreak — event_id orders A before B
        ("b", "B", 10, 2), ("b", "A", 10, 1),
    ]
    b2 = [
        # late event INSIDE a's first session: reorders its path
        ("a", "addcart", 150, 4),
        # late chain BRIDGING a's two sessions into one
        ("a", "x1", 1100, 5), ("a", "x2", 2000, 6), ("a", "x3", 2900, 7),
        ("a", "x4", 3800, 8), ("a", "x5", 4700, 9),
        ("b", "C", 2000, 3),
    ]

    def batch_paths(rows):
        # w7's batch idiom, parameterized by the integer gap
        pts = spark.createDataFrame(
            rows, "k string, et string, ts long, eid long"
        )
        w = W.partitionBy("k").orderBy("ts", "eid")
        gaps = pts.select(
            "k", "ts", "eid", "et",
            F.when(
                F.lag("ts").over(w).isNull()
                | (F.col("ts") - F.lag("ts").over(w) > GAP), 1,
            ).otherwise(0).alias("new_sess"),
        )
        wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        sess = gaps.select(
            "k", "ts", "eid", "et",
            F.sum("new_sess").over(wcum).alias("sess_id"),
        )
        per_sess = sess.groupBy("k", "sess_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "eid", "et"))
                    ),
                    lambda s: s["et"],
                ),
                ">",
            ).alias("path")
        )
        out = {}
        for r in per_sess.orderBy("k", "sess_id").collect():
            ns, ps = out.get(r.k, (0, []))
            ps.append(r.path)
            out[r.k] = (ns + 1, ps)
        return {k: (n, "|".join(ps)) for k, (n, ps) in out.items()}

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "pt1.jsonl",
            [{"k": k, "et": et, "ts": ts, "eid": eid}
             for k, et, ts, eid in b1],
        )
        src = file_stream(
            spark, str(stream_dir),
            "k string, et string, ts long, eid long", fmt="json",
        )
        q = (
            paths_tws(src, "k", "et", "ts", "eid", gap_us=GAP)
            .writeStream.format("memory")
            .queryName("tws_paths")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_pt"))
            .start()
        )
        try:
            q.processAllAvailable()
            mid = {r.k: (r.n_sessions, r.paths)
                   for r in spark.sql("select * from tws_paths").collect()}
            assert mid["a"] == (2, "view>click|view")
            assert mid["b"] == (1, "A>B")  # eid tiebreak at ts=10
            _write_batch(
                stream_dir, "pt2.jsonl",
                [{"k": k, "et": et, "ts": ts, "eid": eid}
                 for k, et, ts, eid in b2],
            )
            q.processAllAvailable()
            latest = {r.k: (r.n_sessions, r.paths)
                      for r in spark.sql("select * from tws_paths").collect()}
            want = batch_paths(b1 + b2)
            assert latest == want, (latest, want)
            # the merge happened: a's two sessions became ONE, with
            # the late in-session event reordered into place
            assert latest["a"] == (
                1, "view>addcart>click>x1>x2>x3>x4>x5>view",
            )
            # b gained a second session (2000 - 10 > gap)
            assert latest["b"] == (2, "A>B|C")
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_cdc_tws_matches_batch_apply(spark, stream_dir, tmp_path):
    """Streaming CDC apply (cdc_tws): after two micro-batches each
    key's winning (op, seq, attr, num) equals x96's BATCH window
    (ORDER BY seq DESC, op ASC, rn=1) over the concatenated feed —
    including a LATE OUT-OF-ORDER update (lower seq arriving after
    the winner: must change nothing), a same-seq D-vs-U conflict
    (op-ascending tiebreak: D wins), and a delete followed by a late
    stale update (the tombstone must NOT be resurrected)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import cdc_tws

    b1 = [
        # key 'a': insert then update — U@2 wins batch 1
        ("a", "I", 1, "O", 100), ("a", "U", 2, "O", 107),
        # key 'b': delete at seq 3
        ("b", "I", 1, "F", 50), ("b", "D", 3, "F", 0),
        # key 'c': same-seq conflict — D beats U at seq 4 (op asc)
        ("c", "U", 4, "P", 70), ("c", "D", 4, "P", 0),
    ]
    b2 = [
        # late OUT-OF-ORDER stale update for 'a' (seq 1 < winner 2)
        ("a", "U", 1, "O", 999),
        # late stale update for deleted 'b' — no resurrection
        ("b", "U", 2, "F", 60),
        # genuine newer update for 'c' overrides the tombstone
        ("c", "U", 6, "P", 75),
        # new key 'd'
        ("d", "I", 1, "O", 10),
    ]

    def batch_apply(rows):
        feed = spark.createDataFrame(
            rows, "k string, op string, seq long, st string, cents long"
        )
        w = W.partitionBy("k").orderBy(F.col("seq").desc(), "op")
        latest = (
            feed.select(
                "k", "op", "seq", "st", "cents",
                F.row_number().over(w).alias("rn"),
            ).where(F.col("rn") == 1)
        )
        return {
            r.k: (r.op, r.seq, r.st, r.cents) for r in latest.collect()
        }

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _write_batch(
            stream_dir, "cdc1.jsonl",
            [{"k": k, "op": op, "seq": s, "st": st, "cents": c}
             for k, op, s, st, c in b1],
        )
        src = file_stream(
            spark, str(stream_dir),
            "k string, op string, seq long, st string, cents long",
            fmt="json",
        )
        q = (
            cdc_tws(src, "k", "op", "seq", "st", "cents")
            .writeStream.format("memory")
            .queryName("tws_cdc")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_cdc"))
            .start()
        )
        try:
            q.processAllAvailable()
            mid = {
                r.k: (r.op, r.seq, r.attr, r.num)
                for r in spark.sql("select * from tws_cdc").collect()
            }
            assert mid == batch_apply(b1)
            assert mid["c"][0] == "D"  # same-seq tiebreak: D beat U

            _write_batch(
                stream_dir, "cdc2.jsonl",
                [{"k": k, "op": op, "seq": s, "st": st, "cents": c}
                 for k, op, s, st, c in b2],
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.sql("select * from tws_cdc").collect():
                # memory sink in update mode appends one row per
                # touched key per batch; the state winner's seq is
                # monotone non-decreasing, so max-by-(seq, op desc)
                # picks the final emission without relying on
                # collect() preserving batch order
                cand = (r.op, r.seq, r.attr, r.num)
                prev = latest.get(r.k)
                if prev is None or (cand[1], prev[0]) > (prev[1], cand[0]):
                    latest[r.k] = cand
            expected = batch_apply(b1 + b2)
            assert latest == expected
            assert latest["a"] == ("U", 2, "O", 107)  # stale ignored
            assert latest["b"] == ("D", 3, "F", 0)  # not resurrected
            assert latest["c"] == ("U", 6, "P", 75)  # newer overrides D
            assert latest["d"] == ("I", 1, "O", 10)
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_cdc_config_nameable(spark):
    """The 'cdc' op resolves from STREAM_STATEFUL_OPS config —
    including the optional tombstone-ageing knobs."""
    from etlp_spark.config import STREAM_STATEFUL_OPS

    build = STREAM_STATEFUL_OPS["cdc"](
        {"key": "k", "op": "op", "seq": "seq", "attr": "st",
         "num": "cents"}
    )
    assert callable(build)
    aged = STREAM_STATEFUL_OPS["cdc"](
        {"key": "k", "op": "op", "seq": "seq", "attr": "st",
         "num": "cents", "ts": "ts", "max_lateness_us": 300_000_000}
    )
    assert callable(aged)


def test_read_warc_stream_source(spark, stream_dir, tmp_path):
    """read_warc_stream: a crawl drop directory as an unbounded
    source — each landing .warc/.warc.gz file explodes to record
    rows through the same walk as batch read_warc, damaged files
    contained as audit rows (strict=False), late-arriving files
    picked up by the next micro-batch."""
    from etlp_spark.functions.warc import encode_warc, read_warc_stream

    def cv(i):
        return {
            "warc_type": "conversion", "record_id": f"<urn:rec:{i}>",
            "target_uri": f"https://e.org/{i}",
            "content_type": "text/plain", "body": f"stream text {i}",
        }

    drop = stream_dir / "warcdrop"
    drop.mkdir()
    (drop / "a.warc").write_bytes(encode_warc([cv(1), cv(2)]))
    (drop / "b.warc.gz").write_bytes(
        encode_warc([cv(3)], gzip_members=True)
    )
    q = (
        read_warc_stream(spark, str(drop), max_files_per_trigger=10)
        .writeStream.format("memory")
        .queryName("warc_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_warc"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from warc_stream").collect()
        texts = {r.text for r in rows if r.text is not None}
        assert {"stream text 1", "stream text 2", "stream text 3"} <= texts
        assert {r.compressed for r in rows} == {0, 1}
        # a damaged file lands later: contained as an audit row in a
        # NEW micro-batch, never a dead query
        (drop / "c.warc").write_bytes(b"junk, not warc")
        q.processAllAvailable()
        rows2 = spark.sql("select * from warc_stream").collect()
        bad = [r for r in rows2 if r.parse_error]
        assert len(rows2) == len(rows) + 1 and len(bad) == 1
        assert bad[0].media_id.endswith("c.warc")
    finally:
        q.stop()


def test_cdc_tws_tombstone_ageing_boundary(spark, stream_dir, tmp_path):
    """Tombstone ageing (cdc_tws ts_col + max_lateness_us, r15
    verdict item 7): the equivalence boundary is proved on BOTH
    sides of the max-lateness window.

    - key 'a': tombstone D@5 whose change time is long past — the
      watermark crosses its deadline, the timer DROPS it, and a
      later stale update (seq 2 < 5) RESURRECTS the key. That is the
      documented divergence from the batch window (which still says
      D@5) — the price of O(live keys) state.
    - key 'c': tombstone INSIDE the window — the same stale update
      is ignored, batch-equal, exactly as the unaged twin behaves.
    - key 'b': a genuine newer update overrides its tombstone before
      the deadline; the timer is disarmed and a later stale update
      still loses — LIVE winners never age (log-compaction keeps
      latest values forever)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS needs a google.protobuf runtime; none vendorable",
    )
    from etlp_spark.streaming import cdc_tws, with_event_time

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    T = "2024-01-01T00:{m:02d}:00"

    def row(k, op, seq, cents, m):
        return {"k": k, "op": op, "seq": seq, "st": "S",
                "cents": cents, "ts": T.format(m=m)}

    try:
        _write_batch(
            stream_dir, "age1.jsonl",
            [
                row("a", "I", 1, 100, 0), row("a", "D", 5, 0, 0),
                row("b", "D", 3, 0, 17),
                row("c", "D", 2, 0, 18),
            ],
        )
        src = with_event_time(
            file_stream(
                spark, str(stream_dir),
                "k string, op string, seq long, st string, "
                "cents long, ts timestamp",
                fmt="json",
            ),
            "ts", "0 seconds",
        )
        q = (
            cdc_tws(
                src, "k", "op", "seq", "st", "cents",
                ts_col="ts", max_lateness_us=5 * 60 * 1_000_000,
            )
            .writeStream.format("memory")
            .queryName("tws_cdc_age")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_age"))
            .start()
        )

        from collections import Counter

        def emissions():
            # memory sink in update mode: one row per touched key per
            # batch; collect() order is not guaranteed, so per-batch
            # deltas are MULTISET differences, never list slices
            return Counter(
                (r.k, r.op, r.seq, r.num)
                for r in spark.sql("select * from tws_cdc_age").collect()
            )

        try:
            # b1: watermark -> 00:18; a's deadline (00:00 + 5 min =
            # 00:05) is already behind it, so the follow-up batch
            # drops a's tombstone; b (00:22) and c (00:23) survive
            q.processAllAvailable()
            seen = emissions()
            assert ("a", "D", 5, 0) in seen and ("c", "D", 2, 0) in seen

            # b2 @00:19: stale seq for a RESURRECTS (tombstone aged);
            # the SAME stale seq for c is ignored (inside window);
            # b's genuine newer update disarms its timer
            before = emissions()
            _write_batch(
                stream_dir, "age2.jsonl",
                [row("a", "U", 2, 999, 19), row("c", "U", 1, 888, 19),
                 row("b", "U", 9, 777, 19)],
            )
            q.processAllAvailable()
            new = emissions() - before
            assert ("a", "U", 2, 999) in new, "aged tombstone must resurrect"
            assert ("b", "U", 9, 777) in new
            # c was touched, so it RE-EMITS its winner — which must
            # still be the tombstone, not the stale update
            assert ("c", "D", 2, 0) in new
            assert ("c", "U", 1, 888) not in new, (
                "in-window tombstone must ignore the stale update"
            )

            # b3 @00:30: watermark passes c's 00:23 deadline (timer
            # drops c AFTER this batch's inputs are applied — the
            # stale update for b is still ignored: live winners never
            # age even though b's old timer deadline has passed)
            before = emissions()
            _write_batch(
                stream_dir, "age3.jsonl",
                [row("z", "I", 1, 10, 30), row("b", "U", 4, 111, 30)],
            )
            q.processAllAvailable()
            new = emissions() - before
            assert ("z", "I", 1, 10) in new
            assert ("b", "U", 9, 777) in new, (
                "touched live key re-emits its retained winner"
            )
            assert ("b", "U", 4, 111) not in new, (
                "stale update for the live key b must lose"
            )

            # b4 @00:31: c's tombstone is now aged out — the boundary
            # crossed on the SAME key: the stale update that lost in
            # b2 now resurrects c
            before = emissions()
            _write_batch(
                stream_dir, "age4.jsonl", [row("c", "U", 1, 888, 31)]
            )
            q.processAllAvailable()
            new = emissions() - before
            assert ("c", "U", 1, 888) in new, (
                "post-expiry stale update must apply as if new key"
            )
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_robots_gate_stream(spark, stream_dir, tmp_path):
    """robots_gate_stream: stream-static gate — frontier rows landing
    as files are gated per micro-batch against a static hosts-sized
    rules table, decisions identical to the batch x158 semantics
    (longest match, Allow wins ties, no-rule hosts allowed), with NO
    streaming aggregation (append mode, no state store); late files
    are gated by the next batch."""
    import json

    from etlp_spark.functions.robots import extract_robots_rules
    from etlp_spark.streaming import robots_gate_stream

    robots = (
        "User-agent: *\n"
        "Disallow: /p/priv*\n"
        "Allow: /p/private-ok$\n"
        "Crawl-delay: 2\n"
    )
    rules = extract_robots_rules(
        spark.createDataFrame(
            [("a.org", robots), ("open.org", "User-agent: *\n")],
            "host string, robots string",
        )
    )
    drop = stream_dir / "frontier"
    drop.mkdir()
    def put(name, rows):
        (drop / name).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
    put("b1.json", [
        {"host": "a.org", "path": "/p/1"},
        {"host": "a.org", "path": "/p/priv/7"},
        {"host": "a.org", "path": "/p/private-ok"},
        {"host": "open.org", "path": "/anything"},
        {"host": "unknown.org", "path": "/x"},
    ])
    urls = (
        spark.readStream.schema("host string, path string")
        .json(str(drop))
    )
    q = (
        robots_gate_stream(urls, rules)
        .writeStream.format("memory")
        .queryName("robots_gate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rgs"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.host, r.path): (r.allowed, r.matched, r.crawl_delay_ms)
            for r in spark.sql(
                "select * from robots_gate_stream"
            ).collect()
        }
        assert got[("a.org", "/p/1")] == (1, "none", 2000)
        assert got[("a.org", "/p/priv/7")] == (0, "/p/priv*", 2000)
        # Allow wins by LENGTH over the /p/priv* wildcard
        assert got[("a.org", "/p/private-ok")] == (
            1, "/p/private-ok$", 2000
        )
        # rule-less host: allowed, delay surfaced as -1-free None?
        # extract_robots_rules yields a pattern-NULL row with NULL
        # delay -> coalesced to -1
        assert got[("open.org", "/anything")] == (1, "none", -1)
        # host with NO robots row at all: allowed (left join miss)
        assert got[("unknown.org", "/x")] == (1, "none", -1)
        # a late frontier file is gated by the NEXT micro-batch
        put("b2.json", [{"host": "a.org", "path": "/p/priv/late"}])
        q.processAllAvailable()
        got2 = {
            (r.host, r.path): (r.allowed, r.matched)
            for r in spark.sql(
                "select * from robots_gate_stream"
            ).collect()
        }
        assert got2[("a.org", "/p/priv/late")] == (0, "/p/priv*")
        assert len(got2) == 6
    finally:
        q.stop()
