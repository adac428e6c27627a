"""applyInPandasWithState sessionizer vs the batch sessionize oracle.

The stream is fed the events table in two micro-batches split mid-history;
sessions must survive the batch boundary in managed state, and every CLOSED
session must match the batch (rel_sessionize-style) computation exactly.
"""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from addressparser_spark.streaming.stateful import (
    SESSION_GAP_SECONDS,
    sessionize_stream,
)


def _batch_sessions(ev):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    g = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_idx", F.sum("new_sess").over(run) - 1
    )
    return g.groupBy("user_id", "sess_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


def test_event_time_timeout_flushes_trailing_session(spark, tmp_path):
    """The timeout variant emits a user's FINAL session with no sentinel
    event for that user — the watermark alone proves the gap."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, name):
        df = spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts timestamp, value double"
        )
        d = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(d)
        shutil.copy(
            glob.glob(f"{d}/part-*.parquet")[0], f"{tmp_path}/in/{name}.parquet"
        )

    os.makedirs(str(tmp_path / "in"), exist_ok=True)
    # b0: user 1's only-ever events (an open 2-event session) + a user-2 event
    mk([(1, 1, t0, 1.5), (1, 2, t0 + dt.timedelta(seconds=60), 2.0),
        (2, 3, t0, 5.0)], "b0")
    # b1/b2: only user 2 — each advances the watermark past user 1's
    # last_event + gap, so user 1's trailing session must flush by timeout
    mk([(2, 4, t0 + dt.timedelta(hours=2), 1.0)], "b1")
    mk([(2, 5, t0 + dt.timedelta(hours=3), 1.0)], "b2")

    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    q = (
        sessionize_stream(stream, event_time_timeout=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("timeout_sessions")
        .option("checkpointLocation", str(tmp_path / "ck_timeout"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = {
        (r["user_id"], r["sess_idx"]): (r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM timeout_sessions").collect()
    }
    # user 1: trailing session emitted BY TIMEOUT alone (no later user-1 event)
    # user 2: sessions 0 and 1 closed by later events; session 2 still open
    #         (watermark hasn't passed its last_event + gap)
    assert got == {
        (1, 0): (2, 3.5),
        (2, 0): (1, 5.0),
        (2, 1): (1, 1.0),
    }


def test_multi_chunk_group_in_one_microbatch(spark, tmp_path):
    """A group larger than the Arrow batch size arrives as MULTIPLE pandas
    chunks, in no particular order: the fold must materialize + globally sort
    the group before folding (sorting per chunk and folding in arrival order
    splits sessions at chunk boundaries — the round-2 review finding)."""
    import datetime as dt
    import os
    import random

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # one user, 200 events in 5 sessions of 40 (1-min steps inside a
    # session, 1-hour jumps between sessions), plus a final closer event
    rows = []
    eid = 0
    ts = t0
    for sess in range(5):
        for _ in range(40):
            rows.append((1, eid, ts, 1.0))
            eid += 1
            ts += dt.timedelta(seconds=60)
        ts += dt.timedelta(hours=1)
    rows.append((1, eid, ts, 1.0))  # closes session 4
    rng = random.Random(3)
    rng.shuffle(rows)  # file order != time order across chunk boundaries

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    d = str(tmp_path / "stage")
    df.coalesce(1).write.parquet(d)
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{in_dir}/b0.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        stream = (
            spark.readStream.schema(
                "user_id bigint, event_id bigint, ts timestamp, value double"
            )
            .parquet(in_dir)
        )
        q = (
            sessionize_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("chunked_sessions")
            .option("checkpointLocation", str(tmp_path / "ck_chunk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {
        r["sess_idx"]: (r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM chunked_sessions").collect()
    }
    # all five 40-event sessions closed (the +1 closer leaves one open)
    assert got == {i: (40, 40.0) for i in range(5)}


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        .filter(F.col("user_id") < 20)
    )
    import os

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    # two micro-batches split by event TIME (batch 0 strictly precedes
    # batch 1 for every user): sessions spanning the split must be carried
    # across batches in state. A non-time split would deliver out-of-order
    # events across batches, which the gap fold (correctly) treats
    # differently from a globally-sorted batch computation.
    ev = ev.withColumn("ts_s", F.col("ts").cast("long"))
    cut = ev.approxQuantile("ts_s", [0.5], 0.0)[0]
    parts = [ev.filter(F.col("ts_s") <= cut).drop("ts_s"),
             ev.filter(F.col("ts_s") > cut).drop("ts_s")]
    ev = ev.drop("ts_s")
    for i, part in enumerate(parts):
        d = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(d)
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{in_dir}/b{i}.parquet")

    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = {
        (r["user_id"], r["sess_idx"]): (r["n_events"], r["session_value"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # oracle: batch sessionization; the stream can only emit sessions CLOSED
    # by a later event, so drop each user's final (still-open) session
    batch = _batch_sessions(ev)
    wmax = Window.partitionBy("user_id")
    closed_batch = batch.withColumn("mx", F.max("sess_idx").over(wmax)).filter(
        F.col("sess_idx") < F.col("mx")
    )
    want = {
        (r["user_id"], r["sess_idx"]): (r["n_events"], r["session_value"])
        for r in closed_batch.collect()
    }
    assert len(want) > 0
    assert got == want


def test_gap_uses_floored_seconds(spark, tmp_path):
    """The session gap compares FLOORED seconds, matching the batch twin's
    unix_timestamp() diff and the DuckDB oracle's date_diff('second'): a
    raw gap of 1800.7s (floored diff 1800) must NOT split, while a floored
    diff of 1801 must."""
    import datetime as dt

    from addressparser_spark.streaming.stateful import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0, 200_000)
    t1 = t0 + dt.timedelta(seconds=1800, microseconds=700_000)  # floored: 1800
    t2 = t1 + dt.timedelta(seconds=1800, microseconds=900_000)  # floored: 1801
    t3 = t2 + dt.timedelta(hours=2)  # closes the second session
    rows = [(1, 1, t0, 1.0), (1, 2, t1, 1.0), (1, 3, t2, 1.0), (1, 4, t3, 1.0)]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    ).coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(
        "user_id bigint, event_id bigint, ts timestamp, value double"
    ).parquet(in_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("floored_gap")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        r["sess_idx"]: r["n_events"]
        for r in spark.sql("SELECT * FROM floored_gap").collect()
    }
    # session 0 = events 1+2 (1800.7s raw gap stays together), session 1 =
    # event 3 alone; session 2 (event 4) is still open -> not emitted
    assert got == {0: 2, 1: 1}, got
