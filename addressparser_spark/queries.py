"""Named engine queries for the driver contract (``__spark_entry__.py``).

Each function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/types match the DuckDB oracle in ``oracle.py`` exactly
(the driver hash-compares values after sorting by column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .data.transcripts import transcripts_df
from .operators import blocking, pairs as pairs_op, scoring
from .operators.clustering import assign_clusters, connected_components


def _profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocking.conv_profiles(
        blocking.normalize_turns(transcripts_df(spark, sf_dir))
    )


def er_normalize_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = blocking.normalize_turns(transcripts_df(spark, sf_dir))
    return t.select("conv_id", "turn_idx", "role", "norm_text")


def er_conv_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profiles(spark, sf_dir).select("conv_id", "n_turns", "sig", "prefix_key")


def er_exact_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _profiles(spark, sf_dir)
    w = Window.partitionBy("sig")
    return p.select("conv_id", F.min("conv_id").over(w).alias("cluster_id"))


def er_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _profiles(spark, sf_dir)
    return blocking.band_keys(blocking.minhash_signature(p))


def er_block_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocking.block_table(_profiles(spark, sf_dir))


def er_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pairs_op.candidate_pairs(blocking.block_table(_profiles(spark, sf_dir)))


def er_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _profiles(spark, sf_dir)
    cand = pairs_op.candidate_pairs(blocking.block_table(p))
    return scoring.score_pairs(cand, p, with_jw=False)


def er_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _profiles(spark, sf_dir)
    cand = pairs_op.candidate_pairs(blocking.block_table(p))
    scored = scoring.score_pairs(cand, p, with_jw=False)
    comp = connected_components(scoring.matched_edges(scored))
    return assign_clusters(p, comp)
