"""Structured Streaming execution: router queries, checkpoint-replay
redelivery, watermark dedup, windowed aggregation, session windows.

Ports the delivery-guarantee behaviors of the universal suite that require
the *streaming* model (SURVEY.md §5/§7 hard parts):
- TestResendOnError  (`test_pubsub.go:484-529`): failure ⇒ redelivery,
  nothing lost — here: a failing foreachBatch leaves the checkpoint
  uncommitted; restarting the query re-processes the batch.
- TestContinueAfterSubscribeClose (`:607`): close/reopen loses nothing —
  here: stop the query, publish more, restart with same checkpoint.
- Deduplicator streaming form: dropDuplicatesWithinWatermark.
- Throttle streaming form: maxFilesPerTrigger bounds per-batch intake.
"""

from __future__ import annotations

import uuid as _uuid

import pytest
from pyspark.sql import functions as F

from watermill_spark.message import messages_df, new_message
from watermill_spark.sources import ParquetPubSub
from watermill_spark.streaming import Router
from watermill_spark.streaming.router import passthrough_handler


def _msgs(spark, n, start=0):
    return messages_df(
        spark,
        [new_message(f"p{i}", metadata={"n": str(i)}) for i in range(start, start + n)],
    )


def _t(p):
    return f"{p}-{_uuid.uuid4().hex[:6]}"


@pytest.fixture
def ps(spark, tmp_path):
    return ParquetPubSub(spark, str(tmp_path / "topics"))


def test_stream_router_end_to_end(ps, spark, tmp_path):
    tin, tout = _t("in"), _t("out")
    ps.publish(tin, _msgs(spark, 20))
    r = Router()
    r.add_handler(
        "upper", tin, ps, tout, ps,
        lambda df: df.withColumn(
            "payload", F.upper(F.col("payload").cast("string")).cast("binary")
        ),
    )
    r.run_stream(str(tmp_path / "ckpt"), available_now=True)
    r.await_termination()
    rows = ps.subscribe(tout).collect()
    assert len(rows) == 20
    assert all(bytes(x["payload"]).decode().startswith("P") for x in rows)


def test_stream_continue_after_close_no_loss(ps, spark, tmp_path):
    """Close/reopen with the same checkpoint: the second run processes only
    the new backlog; nothing lost, nothing reprocessed."""
    tin, tout = _t("in"), _t("out")
    ckpt = str(tmp_path / "ckpt")
    ps.publish(tin, _msgs(spark, 10))

    r = Router()
    r.add_handler("h", tin, ps, tout, ps, passthrough_handler)
    r.run_stream(ckpt, available_now=True)
    r.await_termination()
    r.close()
    assert ps.subscribe(tout).count() == 10

    ps.publish(tin, _msgs(spark, 5, start=10))
    r2 = Router()
    r2.add_handler("h", tin, ps, tout, ps, passthrough_handler)
    r2.run_stream(ckpt, available_now=True)
    r2.await_termination()
    rows = ps.subscribe(tout).collect()
    assert len(rows) == 15
    # exactly-once across restart: no uuid duplicated
    assert len({x["uuid"] for x in rows}) == 15


def test_stream_resend_on_error(ps, spark, tmp_path):
    """Nack ⇒ replay: first attempt fails mid-batch (checkpoint not
    committed); restart redelivers the same messages; nothing lost."""
    tin, tout = _t("in"), _t("out")
    ckpt = str(tmp_path / "ckpt")
    ps.publish(tin, _msgs(spark, 8))

    attempts = {"n": 0}

    def flaky(df):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("transient sink failure")
        return df

    r = Router()
    r.add_handler("h", tin, ps, tout, ps, flaky)
    r.run_stream(ckpt, available_now=True)
    with pytest.raises(Exception):
        r.await_termination()
    r.close()
    assert ps.subscribe(tout).count() == 0  # failed batch published nothing

    r2 = Router()
    r2.add_handler("h", tin, ps, tout, ps, flaky)
    r2.run_stream(ckpt, available_now=True)
    r2.await_termination()
    got = ps.subscribe(tout).collect()
    assert {x["metadata"]["n"] for x in got} == {str(i) for i in range(8)}


def test_stream_dedup_within_watermark(ps, spark, tmp_path):
    """Deduplicator streaming form: dropDuplicatesWithinWatermark keyed on
    payload hash (`middleware/deduplicator.go` ≙ state-store dedup with
    watermark-based expiry)."""
    tin, tout = _t("in"), _t("out")
    msgs = [new_message("dup", uuid=f"u{i}") for i in range(4)] + [new_message("uniq")]
    ps.publish(tin, messages_df(spark, msgs))

    stream = ps.subscribe_stream(tin)
    deduped = (
        stream.withColumn("_key", F.sha2(F.col("payload"), 256))
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["_key"])
        .drop("_key")
    )
    q = (
        deduped.writeStream.foreachBatch(lambda bdf, _i: ps.publish(tout, bdf))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert ps.subscribe(tout).count() == 2


def test_stream_windowed_aggregation(ps, spark, tmp_path):
    """Tumbling event-time window + watermark (the streaming twin of
    q_events_hourly)."""
    tin = _t("in")
    rows = [
        new_message(
            "x",
            metadata={"k": str(i % 2)},
            event_time=__import__("datetime").datetime(2024, 1, 1, 0, i),
        )
        for i in range(10)
    ]
    ps.publish(tin, messages_df(spark, rows))
    agg = (
        ps.subscribe_stream(tin)
        .withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", "5 minutes"))
        .count()
    )
    # complete mode: append would emit a window only once the watermark
    # passes its end, which never happens inside a single availableNow batch
    out = []
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(lambda bdf, _i: (out.clear(), out.extend(bdf.collect())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(r["count"] for r in out) == 10
    assert len(out) == 2  # minutes 0-4 and 5-9


def test_stream_throttle_max_files_per_trigger(ps, spark, tmp_path):
    """Throttle at the source: maxFilesPerTrigger bounds each micro-batch
    (`middleware/throttle.go` ≙ maxOffsets/maxFiles per trigger)."""
    tin = _t("in")
    for i in range(4):  # 4 separate files
        ps.publish(tin, _msgs(spark, 5, start=i * 5))
    batch_sizes = []
    stream = (
        spark.readStream.schema(ps.subscribe(tin).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ps._dir(tin))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _i: batch_sizes.append(bdf.count())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(batch_sizes) == 20
    assert max(batch_sizes) <= 5  # one file (5 msgs) per micro-batch


def test_stream_consumer_groups(ps, spark, tmp_path):
    """Consumer groups (`test_pubsub.go:817-842`): every group receives every
    message. A group == a (query, checkpoint) pair; two routers with distinct
    checkpoints over the same topic each process the full backlog."""
    tin = _t("in")
    outs = [_t("g1"), _t("g2")]
    ps.publish(tin, _msgs(spark, 12))
    for i, tout in enumerate(outs):
        r = Router()
        r.add_handler(f"g{i}", tin, ps, tout, ps, passthrough_handler)
        r.run_stream(str(tmp_path / f"ckpt{i}"), available_now=True)
        r.await_termination()
        r.close()
    for tout in outs:
        got = ps.subscribe(tout).collect()
        assert {x["metadata"]["n"] for x in got} == {str(i) for i in range(12)}


def test_stream_concurrent_subscribe_volume(ps, spark, tmp_path):
    """TestConcurrentSubscribe shape (`test_pubsub.go:284`): a large backlog
    across several publishes arrives complete (scaled to 2000 msgs here; the
    reference uses 5000 x 50 subscribers — volume is covered by bench)."""
    tin, tout = _t("in"), _t("out")
    for c in range(4):
        ps.publish(tin, _msgs(spark, 500, start=c * 500))
    r = Router()
    r.add_handler("h", tin, ps, tout, ps, passthrough_handler)
    r.run_stream(str(tmp_path / "ckpt"), available_now=True)
    r.await_termination()
    r.close()
    rows = ps.subscribe(tout).collect()
    assert len(rows) == 2000
    assert len({x["uuid"] for x in rows}) == 2000


def test_stream_session_window(ps, spark, tmp_path):
    """Streaming sessionization: session_window with a 5-minute gap (the
    streaming twin of q_events_sessionize)."""
    import datetime as _dt

    tin = _t("in")
    # two sessions per key: minutes 0-2 and 20-21 (gap > 5 min splits)
    rows = [
        new_message("x", metadata={"k": "a"}, event_time=_dt.datetime(2024, 1, 1, 0, m))
        for m in (0, 1, 2, 20, 21)
    ]
    ps.publish(tin, messages_df(spark, rows))
    agg = (
        ps.subscribe_stream(tin)
        .withWatermark("event_time", "10 minutes")
        # session_window requires a grouping key in streaming (no global
        # session aggregation) — key per message, like a Kafka partition key
        .groupBy(
            F.element_at("metadata", "k").alias("k"),
            F.session_window("event_time", "5 minutes"),
        )
        .count()
    )
    out = []
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(lambda bdf, _i: (out.clear(), out.extend(bdf.collect())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(out) == 2
    assert sorted(r["count"] for r in out) == [2, 3]


def test_exactly_once_idempotent_sink(ps, spark, tmp_path):
    """Exactly-once recipe (SURVEY.md §7d; reference: exactly-once delivery
    counter example): an IdempotentBatchSink commits each batch_id once —
    replaying the stream from scratch (same source, fresh checkpoint ⇒ same
    deterministic batch ids) must not double-write."""
    from watermill_spark.streaming.exactly_once import IdempotentBatchSink

    t = _t("eo")
    ps.publish(t, _msgs(spark, 15))
    out_dir = str(tmp_path / "out")
    writes = []

    def write_fn(df, batch_id):
        writes.append(batch_id)
        df.write.mode("append").parquet(out_dir)

    sink = IdempotentBatchSink(str(tmp_path / "commits"), write_fn)

    def run(ckpt):
        q = (
            ps.subscribe_stream(t)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ckpt1")
    n_first = len(writes)
    assert n_first >= 1
    assert spark.read.parquet(out_dir).count() == 15

    # full replay: fresh checkpoint re-delivers every batch (at-least-once
    # source) — the sink's commit log makes it exactly-once end to end
    run("ckpt2")
    assert len(writes) == n_first  # write_fn never re-ran
    assert spark.read.parquet(out_dir).count() == 15


def test_stream_stream_join_on_correlation_id(ps, spark, tmp_path):
    """Stream-stream inner join with watermarks (the streaming form of
    request/reply correlation, SURVEY §2.A.41): commands and replies arrive
    on separate topics and join on correlation_id."""
    t_cmd, t_rep = _t("cmd"), _t("rep")
    import datetime as _dt

    t0 = _dt.datetime(2026, 1, 1, 12, 0, 0)
    cmds = messages_df(
        spark,
        [
            new_message(
                f"c{i}",
                metadata={"correlation_id": f"op{i}"},
                event_time=t0 + _dt.timedelta(seconds=i),
            )
            for i in range(8)
        ],
    )
    reps = messages_df(
        spark,
        # replies for even ops only, ~1 min after their command
        [
            new_message(
                f"r{i}",
                metadata={"correlation_id": f"op{i}"},
                event_time=t0 + _dt.timedelta(seconds=60 + i),
            )
            for i in range(0, 8, 2)
        ],
    )
    ps.publish(t_cmd, cmds)
    ps.publish(t_rep, reps)

    def keyed(topic, side):
        s = (
            spark.readStream.schema(ps.subscribe(topic).schema)
            .parquet(ps._dir(topic))
            .select(
                F.element_at("metadata", "correlation_id").alias(f"corr_{side}"),
                F.col("payload").alias(f"payload_{side}"),
                F.col("event_time").alias(f"t_{side}"),
            )
            .withWatermark(f"t_{side}", "1 minute")
        )
        return s

    joined = keyed(t_cmd, "cmd").join(
        keyed(t_rep, "rep"),
        F.expr(
            "corr_cmd = corr_rep AND t_rep BETWEEN t_cmd - INTERVAL 5 MINUTES "
            "AND t_cmd + INTERVAL 5 MINUTES"
        ),
    )
    out = str(tmp_path / "joined")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4  # only the even ops matched
    assert {r["corr_cmd"] for r in rows} == {"op0", "op2", "op4", "op6"}


def test_stream_chaos_kill_replay_exactly_once(ps, spark, tmp_path):
    """TestReconnect analog (`pubsub/tests/test_pubsub.go:1042`): the query
    is killed mid-stream — repeatedly, after data is written but before the
    sink commit — and restarted from the SAME checkpoint each time. Contract:
    no message lost, none double-counted (IdempotentBatchSink + deterministic
    per-batch overwrite = exactly-once through crashes)."""
    from pyspark.sql.streaming import StreamingQueryException

    from watermill_spark.streaming.exactly_once import IdempotentBatchSink

    t = _t("chaos")
    n_files, per_file = 6, 10
    for b in range(n_files):
        ps.publish(t, _msgs(spark, per_file, start=b * per_file))

    out_root = tmp_path / "out"
    attempts: dict[int, int] = {}
    bombs = {1: 1, 3: 2}  # batch_id -> crashes to inject (post-write, pre-commit)

    def write_fn(df, batch_id):
        # idempotent per batch: deterministic overwrite of a batch-keyed dir
        df.write.mode("overwrite").parquet(str(out_root / f"batch={batch_id}"))
        n = attempts.get(batch_id, 0)
        attempts[batch_id] = n + 1
        if n < bombs.get(batch_id, 0):
            raise RuntimeError(f"chaos kill at batch {batch_id}")

    sink = IdempotentBatchSink(str(tmp_path / "commits"), write_fn)
    base = ps.subscribe_stream(t)
    ckpt = str(tmp_path / "ckpt-chaos")

    def run_until_done(max_restarts=8):
        for _ in range(max_restarts):
            q = (
                spark.readStream.schema(base.schema)
                .option("maxFilesPerTrigger", "1")  # one file per micro-batch
                .parquet(ps._dir(t))
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                return  # clean completion
            except StreamingQueryException:
                pass  # killed mid-batch -> restart from checkpoint
        raise AssertionError("did not converge within restart budget")

    run_until_done()
    got = spark.read.parquet(str(out_root))
    assert got.count() == n_files * per_file
    assert got.dropDuplicates(["uuid"]).count() == n_files * per_file
    # bombed batches re-ran exactly bombs+1 times; committed batches once
    for bid, crashes in bombs.items():
        assert attempts[bid] == crashes + 1
    assert all(
        n == 1 for bid, n in attempts.items() if bid not in bombs
    ), attempts


def test_stream_soak_concurrent_handlers_chaos(ps, spark, tmp_path):
    """Stress-mode analog of the reference's parallel suite run
    (`pubsub/tests/test_pubsub.go:216-233`: whole acceptance suite x20 in
    parallel under -race): four CONCURRENT run_stream handlers over two
    shared topics, >=20 micro-batches each (maxFilesPerTrigger=1), with
    chaos injected twice mid-run — a hard router kill (close() while
    batches are in flight) and a transiently-failing handler (nack =>
    replay) — then restarts on the SAME checkpoints while *new* data keeps
    arriving. Contract: per consumer group no message is lost, and no
    duplicate passes the idempotent (dedup-by-uuid) sink boundary.
    """
    t1, t2 = _t("soak-a"), _t("soak-b")
    o1, o2, o3, o4 = _t("o1"), _t("o2"), _t("o3"), _t("o4")
    ckpt = str(tmp_path / "soak-ckpt")
    n_files, per_file = 20, 3  # 20 micro-batches per handler per run

    for b in range(n_files):
        ps.publish(t1, _msgs(spark, per_file, start=b * per_file))
        ps.publish(t2, _msgs(spark, per_file, start=1000 + b * per_file))

    flaky_state = {"fails_left": 1}

    def flaky(df):
        # one transient failure across the whole soak: the first processed
        # batch nacks; the restart must replay it with nothing lost
        if flaky_state["fails_left"] > 0:
            flaky_state["fails_left"] -= 1
            raise RuntimeError("soak: injected transient handler failure")
        return df

    def upper(df):
        return df.withColumn(
            "payload", F.upper(F.col("payload").cast("string")).cast("binary")
        )

    def build_router():
        r = Router()
        # two consumer groups sharing t1, two sharing t2 (one flaky)
        r.add_handler("g1", t1, ps, o1, ps, passthrough_handler)
        r.add_handler("g2", t1, ps, o2, ps, upper)
        r.add_handler("g3", t2, ps, o3, ps, flaky)
        r.add_handler("g4", t2, ps, o4, ps, passthrough_handler)
        return r

    # run 1: all four handlers start concurrently; kill the router hard
    # while batches are in flight (close() stops mid-run; the flaky handler
    # may also have nacked by now — both are fine, checkpoints hold)
    r = build_router()
    r.run_stream(ckpt, available_now=True, max_files_per_trigger=1)
    import time as _time

    _time.sleep(3)  # let a few micro-batches commit, then kill mid-run
    r.close()

    # new data arrives while the router is down (continue-after-close)
    for b in range(n_files, n_files + 4):
        ps.publish(t1, _msgs(spark, per_file, start=b * per_file))
        ps.publish(t2, _msgs(spark, per_file, start=1000 + b * per_file))
    total = (n_files + 4) * per_file

    # run 2..n: restart on the same checkpoints until every handler drains
    for _ in range(6):
        r = build_router()
        r.run_stream(ckpt, available_now=True, max_files_per_trigger=1)
        try:
            r.await_termination()
            r.close()
            break
        except Exception:
            r.close()  # flaky nack or in-flight kill residue -> restart
    else:
        raise AssertionError("soak did not converge within restart budget")

    exp1 = {str(i) for i in range(total)}
    exp2 = {str(1000 + i) for i in range(total)}
    for topic, exp in ((o1, exp1), (o2, exp1), (o3, exp2), (o4, exp2)):
        rows = ps.subscribe(topic).collect()
        got = {x["metadata"]["n"] for x in rows}
        assert got == exp, f"{topic}: lost {len(exp - got)} messages"
        # at-least-once transport may append a replayed batch twice; the
        # idempotent sink boundary (dedup by uuid) must see exactly one
        uuids = [x["uuid"] for x in rows]
        assert len(set(uuids)) == total
    # the shared-topic groups transformed independently: g2 uppercased,
    # g1 did not
    p1 = {bytes(x["payload"]).decode() for x in ps.subscribe(o1).collect()}
    p2 = {bytes(x["payload"]).decode() for x in ps.subscribe(o2).collect()}
    assert all(p.startswith("p") for p in p1)
    assert all(p.startswith("P") for p in p2)


def test_stream_survives_file_vanishing_mid_run(ps, spark, tmp_path):
    """Pins the `ignoreMissingFiles` contract of `subscribe_stream` that
    `compact()` relies on: a file listed by the source but deleted before
    its batch is read (exactly what the compact generation swap does to an
    in-flight reader at volume — observed FILE_NOT_EXIST at sf1) must be
    SKIPPED, not kill the query; the consolidated generation then
    re-delivers the contents as new files (at-least-once)."""
    import os

    t = _t("vanish")
    for i in range(3):
        ps.publish(t, _msgs(spark, 10, start=i * 10).coalesce(1))
    d = os.path.join(ps.base_dir, t)
    files = sorted(
        (os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    seen, state = [], {"deleted": False}

    def sink(bdf, bid):
        seen.extend(r.uuid for r in bdf.select("uuid").collect())
        if not state["deleted"]:
            os.remove(files[-1])  # listed by the source, not yet read
            state["deleted"] = True

    q = (
        ps.subscribe_stream(t, max_files_per_trigger=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck-vanish"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None  # the vanished file must not kill the query
    assert len(seen) == 20  # two surviving files delivered, third skipped
