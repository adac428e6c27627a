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
