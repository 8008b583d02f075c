"""Streaming tests (SURVEY.md §5.2(5)): ingest convergence under
out-of-order/replayed batches, downsampling task vs batch recompute,
threshold check notifications."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.sources.bucket import BucketStore
from aws_greengrass_labs_database_influxdb_spark.streaming import (
    DownsampleTask,
    ThresholdCheck,
    stream_lineprotocol_ingest,
)
from aws_greengrass_labs_database_influxdb_spark.control.broker import Broker

T0 = 1704067200_000_000_000  # 2024-01-01T00:00:00Z
MIN_NS = 60 * 10**9


@pytest.fixture()
def store(spark, tmp_path):
    s = BucketStore(spark, str(tmp_path / "store"))
    s.create_bucket("o", "b")
    return s


def _run_ingest(spark, store, in_dir, ckpt):
    q = stream_lineprotocol_ingest(
        spark, str(in_dir), store, "o", "b", checkpoint=str(ckpt)
    )
    q.awaitTermination(120)


def test_ingest_end_to_end_and_out_of_order_convergence(spark, store, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    # batch 1: two series, 5 minutes of data
    (in_dir / "a.txt").write_text(
        "\n".join(
            f"SystemMetrics,host=h{j} CpuUsage={10 * j + i}.0 {T0 + i * MIN_NS}"
            for j in (1, 2)
            for i in range(5)
        )
    )
    _run_ingest(spark, store, in_dir, ckpt)
    assert store.read_points("o", "b").count() == 10

    # batch 2 arrives LATE and out-of-order: rewrites an old timestamp and
    # adds an even older one — both must be accepted (no watermark drop)
    (in_dir / "b.txt").write_text(
        f"SystemMetrics,host=h1 CpuUsage=99.0 {T0}\n"
        f"SystemMetrics,host=h1 CpuUsage=5.0 {T0 - 3600 * 10**9}\n"
    )
    _run_ingest(spark, store, in_dir, ckpt)
    pts = store.read_points("o", "b")
    assert pts.count() == 11  # 10 + 1 new (1 overwrite)
    assert (
        pts.filter((F.col("time_ns") == T0) & (F.col("series_key").contains("h1")))
        .first()
        .f_float
        == 99.0
    )


def test_rollup_maintenance_task_keeps_routing_fresh(spark, store, tmp_path):
    """Continuous rollup maintenance: after late writes (an overwrite
    in an existing day + points in a brand-new day), one availableNow
    pass of RollupMaintenanceTask makes the routed coarse aggregate
    match a direct recompute over the updated bucket, and the
    watermark advances to cover the new day."""
    from aws_greengrass_labs_database_influxdb_spark.operators.windows import (
        aggregate_window,
    )
    from aws_greengrass_labs_database_influxdb_spark.plans.rollup import RollupCatalog
    from aws_greengrass_labs_database_influxdb_spark.streaming import (
        RollupMaintenanceTask,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt_i, ckpt_m = tmp_path / "cki", tmp_path / "ckm"
    by = ("measurement", "series_key", "field")

    (in_dir / "a.txt").write_text(
        "\n".join(
            f"SystemMetrics,host=h{j} CpuUsage={10 * j + i}.0 {T0 + i * MIN_NS}"
            for j in (1, 2)
            for i in range(120)
        )
    )
    _run_ingest(spark, store, in_dir, ckpt_i)

    cat = RollupCatalog(spark, str(tmp_path / "rollups"))
    cat.materialize("cpu_1m", store.read_points("o", "b"), "1m", by)
    wm0 = cat.get("cpu_1m").watermark_ns

    # late batch: overwrite an old minute + a whole new day of points
    day2 = T0 + 86_400 * 10**9
    (in_dir / "b.txt").write_text(
        f"SystemMetrics,host=h1 CpuUsage=999.0 {T0}\n"
        + "\n".join(
            f"SystemMetrics,host=h1 CpuUsage={i}.5 {day2 + i * MIN_NS}"
            for i in range(60)
        )
    )
    _run_ingest(spark, store, in_dir, ckpt_i)

    task = RollupMaintenanceTask(
        spark, store, "o", "b", cat, "cpu_1m", checkpoint=str(ckpt_m)
    )
    task.start(available_now=True).awaitTermination(120)

    spec = cat.get("cpu_1m")
    assert spec.watermark_ns > wm0  # new day is now routable

    pts = store.read_points("o", "b")
    routed = cat.aggregate_window(
        pts, "1h", "max", by=by,
        range_start=T0, range_stop=day2 + 3600 * 10**9,
    )
    direct = aggregate_window(pts, "1h", "max", by=by)
    key = lambda r: (r.series_key, r["_start_ns"])  # noqa: E731
    a = {key(r): r["max"] for r in routed.collect()}
    b = {key(r): r["max"] for r in direct.collect()}
    assert a == b
    h1_first_hour = [
        v for (sk, ws), v in a.items() if "h1" in sk and ws == T0
    ]
    assert h1_first_hour == [999.0]  # overwrite reflected through the rollup


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """Duplicate text arriving in a LATER micro-batch is dropped (the
    state store remembers hashes across batches); distinct texts all
    pass; the dedup key matches the batch operator's normalization
    (whitespace/case-insensitive)."""
    import json

    from aws_greengrass_labs_database_influxdb_spark.streaming import stream_exact_dedup

    in_dir, ckpt, out_dir = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    in_dir.mkdir()

    def run_batch():
        src = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .json(str(in_dir))
        )
        deduped = stream_exact_dedup(src, watermark="1 hour")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = "2024-01-01T00:{m:02d}:00.000Z"
    (in_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "alpha beta gamma", "ts": t.format(m=0)},
                {"doc_id": 2, "text": "delta epsilon", "ts": t.format(m=1)},
            ]
        )
    )
    run_batch()
    (in_dir / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                # same text as doc 1 modulo case/whitespace → duplicate
                {"doc_id": 3, "text": "  Alpha   BETA gamma ", "ts": t.format(m=5)},
                {"doc_id": 4, "text": "zeta eta", "ts": t.format(m=6)},
            ]
        )
    )
    run_batch()
    got = {r.doc_id for r in spark.read.parquet(str(out_dir)).collect()}
    assert got == {1, 2, 4}


def test_streaming_lsh_dedup_across_batches(spark, tmp_path):
    """Near-duplicate (not just exact) documents arriving in later
    micro-batches are rejected against the persisted signature store;
    in-batch near-dup collisions resolve min-id; distinct docs pass."""
    import json

    from aws_greengrass_labs_database_influxdb_spark.streaming.lsh_dedup import LshDedupStore

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    near = base.replace("green", "dark")  # 1-token edit → near-dup
    other = (
        "completely different content about spark query planning and "
        "shuffle partitioning with adaptive execution at large scale"
    )
    in_dir, ckpt, out_dir = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    in_dir.mkdir()
    store = LshDedupStore(spark, str(tmp_path / "sigs"), n=3, num_hashes=32, bands=16)

    def run_batch():
        src = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        q = (
            src.writeStream.foreachBatch(
                store.foreach_batch(
                    lambda df, _bid: df.write.mode("append").parquet(str(out_dir))
                )
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (in_dir / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": other},
        ])
    )
    run_batch()
    (in_dir / "b2.json").write_text(
        "\n".join(json.dumps(r) for r in [
            {"doc_id": 3, "text": near},          # near-dup of admitted 1
            {"doc_id": 4, "text": "tiny fresh doc about nothing else"},
        ])
    )
    run_batch()
    got = {r.doc_id for r in spark.read.parquet(str(out_dir)).collect()}
    assert got == {1, 2, 4}


def test_lsh_dedup_in_batch_collision_keeps_min_id(spark, tmp_path):
    from aws_greengrass_labs_database_influxdb_spark.streaming.lsh_dedup import LshDedupStore

    text = (
        "one shared document body repeated across two ids in the same "
        "incoming batch so the bucket winner rule decides who is kept"
    )
    df = spark.createDataFrame(
        [(7, text), (5, text), (9, "an unrelated little text body here")],
        "doc_id long, text string",
    )
    store = LshDedupStore(spark, str(tmp_path / "sigs"))
    out = {r.doc_id for r in store.process_batch(df).collect()}
    assert out == {5, 9}  # min-id wins its bucket
    # replay of the same content later is rejected by the store
    df2 = spark.createDataFrame([(11, text)], "doc_id long, text string")
    assert store.process_batch(df2).count() == 0


def test_downsample_task_matches_batch_recompute(spark, store, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "a.txt").write_text(
        "\n".join(
            f"m,host=h1 v={i}.0 {T0 + i * MIN_NS}" for i in range(180)  # 3 hours
        )
    )
    _run_ingest(spark, store, in_dir, tmp_path / "ckpt1")

    task = DownsampleTask(
        spark,
        store,
        "o",
        "b",
        target_path=str(tmp_path / "downsampled"),
        checkpoint=str(tmp_path / "ckpt2"),
        every="1 hour",
        fn="mean",
        watermark="1 minute",
    )
    q = task.start(available_now=True)
    q.awaitTermination(180)
    # second run advances the watermark past the closed windows and
    # flushes them (streaming restarts resume from the checkpoint)
    q2 = task.start(available_now=True)
    q2.awaitTermination(180)

    ds = spark.read.parquet(str(tmp_path / "downsampled"))
    batch = (
        store.read_points("o", "b")
        .groupBy(F.window("time", "1 hour").alias("w"))
        .agg(F.avg("f_float").alias("mean"))
        .select(F.col("w.start").alias("w_start"), "mean")
    )
    got = {(r.w_start, round(r.mean, 9)) for r in ds.select("w_start", "mean").collect()}
    want = {(r.w_start, round(r.mean, 9)) for r in batch.collect()}
    # the watermark holds back the final (open) window — finalized ones match
    assert got.issubset(want)
    assert len(got) >= 2


def test_threshold_check_publishes_statuses(spark, store, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "a.txt").write_text(
        "\n".join(f"m,host=h1 v=10.0 {T0 + i * MIN_NS}" for i in range(60))
        + "\n"
        + "\n".join(f"m,host=h2 v=90.0 {T0 + i * MIN_NS}" for i in range(60))
    )
    _run_ingest(spark, store, in_dir, tmp_path / "ckpt1")

    broker = Broker()
    got = []
    broker.subscribe("greengrass/monitor/status", lambda t, m: got.append(m))
    chk = ThresholdCheck(
        spark,
        store,
        "o",
        "b",
        checkpoint=str(tmp_path / "ckpt3"),
        broker=broker,
        warn=50.0,
        crit=95.0,
    )
    q = chk.start()
    q.awaitTermination(180)

    levels = {(m["series_key"], m["level"]) for m in got}
    assert ("host=h1|v", "ok") in {(k.split("|")[1] + "|" + k.split("|")[2], lvl) for k, lvl in levels} or any(
        "h1" in k and lvl == "ok" for k, lvl in levels
    )
    assert any("h2" in k and lvl == "warn" for k, lvl in levels)


def test_streaming_state_count_continues_across_batches(spark, store, tmp_path):
    """applyInPandasWithState stateCount: run counts survive micro-batch
    boundaries (state store), converging to the batch semantics."""
    from aws_greengrass_labs_database_influxdb_spark.streaming.stateful import apply_streaming_state_count

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_state")
    out_dir = str(tmp_path / "state_out")

    def run_batch(name, lines):
        (in_dir / name).write_text("\n".join(lines))
        stream = (
            spark.readStream.schema("value string")
            .text(str(in_dir))
        )
        from aws_greengrass_labs_database_influxdb_spark.sources.lineprotocol import lines_df_to_points

        pts = lines_df_to_points(stream).withColumn(
            "host", F.col("tags")["host"]
        ).select("host", "time_ns", "f_float")
        q = (
            apply_streaming_state_count(pts, ["host"], threshold=50.0)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1: two above-threshold points → run 1,2
    run_batch("a.txt", [f"m,host=h1 v=60.0 {T0}", f"m,host=h1 v=70.0 {T0 + MIN_NS}"])
    # batch 2: run continues (3), then resets, then restarts
    run_batch("b.txt", [
        f"m,host=h1 v=80.0 {T0 + 2 * MIN_NS}",
        f"m,host=h1 v=10.0 {T0 + 3 * MIN_NS}",
        f"m,host=h1 v=90.0 {T0 + 4 * MIN_NS}",
    ])
    got = {
        r.time_ns: r.state_count
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        T0: 1,
        T0 + MIN_NS: 2,
        T0 + 2 * MIN_NS: 3,  # continued across the micro-batch boundary
        T0 + 3 * MIN_NS: -1,
        T0 + 4 * MIN_NS: 1,
    }


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The SAME session_window operator runs under Structured Streaming
    (watermark + append mode): closed sessions emitted by the stream
    equal the batch recompute over all the data — events split across
    micro-batches merge into one session when within the gap."""
    import json

    from aws_greengrass_labs_database_influxdb_spark.operators import session_window

    in_dir, ckpt, out_dir = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    in_dir.mkdir()

    def run_stream():
        src = (
            spark.readStream.schema("user string, time timestamp")
            .json(str(in_dir))
            .withWatermark("time", "10 minutes")
        )
        sessions = session_window(src, "5m", by=("user",))
        q = (
            sessions.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = "2024-01-01T00:{m:02d}:00.000Z"
    rows1 = [{"user": "a", "time": t.format(m=0)},
             {"user": "a", "time": t.format(m=3)},
             {"user": "b", "time": t.format(m=1)}]
    (in_dir / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    run_stream()
    rows2 = [{"user": "a", "time": t.format(m=6)},   # within gap of m=3 → merges
             {"user": "a", "time": t.format(m=30)},  # far future: closes all prior
             {"user": "b", "time": t.format(m=45)}]
    (in_dir / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    run_stream()
    run_stream()  # one more empty pass lets the watermark close sessions

    got = {
        (r.user, r.session_start.isoformat(), r.n_events)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    batch = spark.read.schema("user string, time timestamp").json(str(in_dir))
    expected_all = {
        (r.user, r.session_start.isoformat(), r.n_events)
        for r in session_window(batch, "5m", by=("user",)).collect()
    }
    # stream emits only watermark-closed sessions; everything it emitted
    # must match the batch result exactly, and the first sessions of a/b
    # (long closed) must be present
    assert got <= expected_all
    assert ("a", "2024-01-01T00:00:00", 3) in got
    assert ("b", "2024-01-01T00:01:00", 1) in got


def test_ingest_resumes_after_crash_between_write_and_commit(spark, store, tmp_path):
    """Failure injection (r9): the ingest foreachBatch crashes AFTER
    the store write succeeds but BEFORE the checkpoint commits its
    offsets — the worst-case window for duplicates. On restart the
    batch is re-delivered (offsets were never committed) and rewritten
    with a newer ingest_seq; LWW resolution converges to exactly one
    value per (series, time, field) — the value-idempotence claim in
    streaming/ingest.py:15-20, now tested on a crashed run."""
    from pyspark.sql.streaming import StreamingQueryException

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "a.txt").write_text(
        "\n".join(
            f"SystemMetrics,host=h1 CpuUsage={i}.0 {T0 + i * MIN_NS}"
            for i in range(10)
        )
    )

    real_write = store.write_points
    crashed = {"done": False}

    def crashing_write(org, bucket, pts):
        real_write(org, bucket, pts)  # the write LANDS...
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before offset commit")

    store.write_points = crashing_write
    try:
        with pytest.raises(StreamingQueryException):
            q = stream_lineprotocol_ingest(
                spark, str(in_dir), store, "o", "b",
                checkpoint=str(tmp_path / "ck"),
            )
            q.awaitTermination(120)
    finally:
        store.write_points = real_write
    assert crashed["done"]

    # restart, same checkpoint: the uncommitted batch re-delivers and
    # is written a SECOND time — LWW must keep exactly one copy
    _run_ingest(spark, store, in_dir, tmp_path / "ck")

    pts = store.read_points("o", "b")
    rows = pts.filter(F.col("field") == "CpuUsage").collect()
    assert len(rows) == 10  # no duplicates despite the double write
    got = {r.time_ns: r.f_float for r in rows}
    assert got == {T0 + i * MIN_NS: float(i) for i in range(10)}


def test_rollup_maintenance_resumes_after_midbatch_crash(spark, store, tmp_path):
    """Failure injection (r9): RollupMaintenanceTask's foreachBatch is
    killed mid-refresh — the first touched day partition is rebuilt,
    then the sink raises, so the batch dies with the rollup half-
    updated and offsets uncommitted. A restart on the same checkpoint
    must re-deliver the batch, rebuild ALL touched days (day-rebuild
    is idempotent: dynamic partition overwrite from LWW-resolved
    points), and converge to the batch recompute — the exactly-once
    claim of streaming/tasks.py RollupMaintenanceTask, tested on a
    crashed run instead of a clean one."""
    from pyspark.sql.streaming import StreamingQueryException

    from aws_greengrass_labs_database_influxdb_spark.operators.windows import (
        aggregate_window,
    )
    from aws_greengrass_labs_database_influxdb_spark.plans.rollup import RollupCatalog
    from aws_greengrass_labs_database_influxdb_spark.streaming import (
        RollupMaintenanceTask,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt_i, ckpt_m = tmp_path / "cki", tmp_path / "ckm"
    by = ("measurement", "series_key", "field")

    (in_dir / "a.txt").write_text(
        "\n".join(
            f"SystemMetrics,host=h1 CpuUsage={i}.0 {T0 + i * MIN_NS}"
            for i in range(120)
        )
    )
    _run_ingest(spark, store, in_dir, ckpt_i)

    cat = RollupCatalog(spark, str(tmp_path / "rollups"))
    cat.materialize("cpu_1m", store.read_points("o", "b"), "1m", by)

    # late batch touching TWO days: an overwrite in day 1 + new day 11
    day2 = T0 + 10 * 86_400 * 10**9
    (in_dir / "b.txt").write_text(
        f"SystemMetrics,host=h1 CpuUsage=999.0 {T0}\n"
        + "\n".join(
            f"SystemMetrics,host=h1 CpuUsage={i}.5 {day2 + i * MIN_NS}"
            for i in range(60)
        )
    )
    _run_ingest(spark, store, in_dir, ckpt_i)

    class CrashingCatalog:
        """Delegates to the real catalog; first refresh_days call
        rebuilds only ONE of the touched days, then dies."""

        def __init__(self, real):
            self._real = real
            self.crashed = False

        def refresh_days(self, name, pts, days):
            if not self.crashed and len(days) > 1:
                self.crashed = True
                self._real.refresh_days(name, pts, sorted(days)[:1])
                raise RuntimeError("injected crash mid-refresh")
            return self._real.refresh_days(name, pts, days)

    wrapper = CrashingCatalog(cat)
    with pytest.raises(StreamingQueryException):
        task = RollupMaintenanceTask(
            spark, store, "o", "b", wrapper, "cpu_1m", checkpoint=str(ckpt_m)
        )
        task.start(available_now=True).awaitTermination(120)
    assert wrapper.crashed  # the partial write + crash really happened

    # restart on the SAME checkpoint: batch re-delivers, full refresh
    task = RollupMaintenanceTask(
        spark, store, "o", "b", wrapper, "cpu_1m", checkpoint=str(ckpt_m)
    )
    task.start(available_now=True).awaitTermination(120)

    pts = store.read_points("o", "b")
    routed = cat.aggregate_window(
        pts, "1h", "max", by=by,
        range_start=T0, range_stop=day2 + 3600 * 10**9,
    )
    direct = aggregate_window(pts, "1h", "max", by=by)
    key = lambda r: (r.series_key, r["_start_ns"])  # noqa: E731
    a = {key(r): r["max"] for r in routed.collect()}
    b = {key(r): r["max"] for r in direct.collect()}
    assert a == b
    assert [v for (sk, ws), v in a.items() if ws == T0] == [999.0]
