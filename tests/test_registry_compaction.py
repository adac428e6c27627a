"""Streaming registry: append-delta writes, compaction, crash-state reads."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from addressparser_spark.data.transcripts import transcripts_df
from addressparser_spark.streaming import incremental as inc


def test_compaction_folds_deltas_and_flips_pointer(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setattr(inc, "COMPACT_EVERY", 2)
    t = transcripts_df(spark, sf_dir)
    in_dir = str(tmp_path / "in")
    out_dir, reg_dir, ck_dir = (
        str(tmp_path / "out"), str(tmp_path / "reg"), str(tmp_path / "ck"),
    )
    os.makedirs(in_dir)
    slices = [
        t.filter(F.col("conv_id") < "conv_000030"),
        t.filter((F.col("conv_id") >= "conv_000030") & (F.col("conv_id") < "conv_000060")),
        t.filter(F.col("conv_id") >= "conv_000060"),
    ]
    for i, s in enumerate(slices):
        d = str(tmp_path / f"stage{i}")
        s.coalesce(1).write.parquet(d)
        src = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.copy(src, f"{in_dir}/batch_{i}.parquet")

    q = inc.incremental_linkage(spark, in_dir, out_dir, reg_dir, ck_dir)
    q.awaitTermination(180)

    # epoch 0 -> delta0; epoch 1 -> delta1, 2 deltas >= COMPACT_EVERY ->
    # compacted base, deltas removed; epoch 2 -> one fresh delta
    assert os.path.isfile(os.path.join(reg_dir, "_CURRENT"))
    with open(os.path.join(reg_dir, "_CURRENT")) as f:
        base_name = f.read().strip()
    assert os.path.isdir(os.path.join(reg_dir, base_name))
    deltas = glob.glob(f"{reg_dir}/delta_epoch=*")
    assert len(deltas) == 1, deltas

    registry = inc._load_registry(spark, reg_dir)
    n = registry.count()
    assert n == registry.select("sig").distinct().count()
    # registry covers every entity resolved across all epochs
    resolved = spark.read.parquet(out_dir)
    assert n == resolved.select("entity_id").distinct().count()


def test_load_registry_dedupes_crash_state(spark, tmp_path):
    """Base + a not-yet-deleted delta holding the same entity reads as one row."""
    reg_dir = str(tmp_path / "reg")
    os.makedirs(reg_dir)
    row = [("e1", "c1", "sig1")]
    df = spark.createDataFrame(row, inc.REGISTRY_SCHEMA)
    df.write.parquet(os.path.join(reg_dir, "base_v000001"))
    df.write.parquet(os.path.join(reg_dir, "delta_epoch=5"))
    with open(os.path.join(reg_dir, "_CURRENT"), "w") as f:
        f.write("base_v000001")
    assert inc._load_registry(spark, reg_dir).count() == 1
