"""Incremental linkage via Structured Streaming.

Two streaming shapes:

1. :func:`incremental_linkage` — ``readStream`` over a transcripts directory;
   each micro-batch runs the full linkage pipeline in ``foreachBatch`` and
   resolves against (then extends) the persistent entity registry — the
   streaming MERGE pattern. ``foreachBatch`` is the exactly-once seam: the
   registry write is idempotent because entity ids are content-derived
   (md5 of signature, see operators/resolve.py), so replaying a batch after
   failure converges to the same registry.

2. :func:`turn_rate_stream` — watermarked sliding-window aggregation over
   turn arrivals (the windowed-agg + late-data operator family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking, pairs as pairs_op, scoring
from ..operators.clustering import assign_clusters, connected_components
from ..operators.resolve import REGISTRY_SCHEMA, merge_registry, resolve_entities

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _load_registry(spark: SparkSession, registry_dir: str) -> DataFrame:
    if os.path.isdir(registry_dir) and any(
        f.endswith(".parquet") for f in os.listdir(registry_dir)
    ):
        return spark.read.parquet(registry_dir)
    return spark.createDataFrame([], REGISTRY_SCHEMA)


def link_batch(batch: DataFrame, registry: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Run linkage on one micro-batch against the current registry.

    Returns (resolved, new_registry). Registry lookup is the broadcast
    reference-dictionary join; profile batches are micro-batch-sized, so the
    scoring join uses the broadcast path.
    """
    profiles = blocking.conv_profiles(blocking.normalize_turns(batch)).cache()
    cand = pairs_op.candidate_pairs(blocking.block_table(profiles))
    scored = scoring.score_pairs(cand, profiles, with_jw=False, broadcast_profiles=True)
    comp = connected_components(scoring.matched_edges(scored))
    clusters = assign_clusters(profiles, comp)
    resolved = resolve_entities(clusters, profiles, registry)
    new_registry = merge_registry(resolved, profiles, registry)
    return resolved, new_registry


def incremental_linkage(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    registry_dir: str,
    checkpoint_dir: str,
):
    """Streaming query: new transcript files -> resolved entities, registry grows.

    Returns the StreamingQuery (caller drives with processAllAvailable/stop).
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        registry = _load_registry(spark, registry_dir)
        resolved, new_registry = link_batch(batch, registry)
        resolved.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(output_dir)
        # registry rewrite: content-derived ids make this idempotent on replay
        staged = registry_dir.rstrip("/") + ".staging"
        new_registry.write.mode("overwrite").parquet(staged)
        spark.read.parquet(staged).write.mode("overwrite").parquet(registry_dir)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def turn_rate_stream(spark: SparkSession, input_dir: str):
    """Watermarked 10-minute sliding window of turn counts per role."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )
    return (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
