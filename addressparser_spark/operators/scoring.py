"""Pairwise scoring: the deterministic verdict cascade.

Analog of the reference's categorical comparator
``CompareAddresses -> {Exact, WithoutRoom, WithoutHouse, Partial, Far}``
(``AddressParser/Core/AddressComparer.cs:81-104,148-204``): an ordered ladder
of cheap-to-expensive checks, each fully deterministic so clusters are
identical run-to-run regardless of partitioning.

Verdicts (first match wins):

- ``exact``       signatures equal (normalization made the convs identical)
- ``near_dup``    shingle-set Jaccard >= 0.9
- ``resumption``  shingle containment >= 0.9 (one side truncates the other)
- ``partial``     Jaccard >= 0.5
- ``far``         otherwise

``jaccard``/``containment`` are Catalyst array expressions; ``lev_sim`` is the
JVM built-in Levenshtein on capped prefixes; ``jw`` is the Arrow-batched
pandas-UDF Jaro-Winkler (the one sanctioned Python hop). The cascade itself
depends only on sig/jaccard/containment, so the verdict is reproducible in
the ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import (
    containment_col,
    jaccard_col,
    jaro_winkler_col,
    levenshtein_sim_col,
)

JACCARD_NEAR = 0.9
CONTAIN_NEAR = 0.9
JACCARD_PARTIAL = 0.5

MATCH_VERDICTS = ("exact", "near_dup", "resumption")


def _side(profiles: DataFrame, suffix: str) -> DataFrame:
    return profiles.select(
        F.col("conv_id").alias(f"conv_{suffix}"),
        F.col("sig").alias(f"sig_{suffix}"),
        F.col("shingles").alias(f"sh_{suffix}"),
        F.col("concat_text").alias(f"text_{suffix}"),
        F.col("n_turns").alias(f"n_{suffix}"),
    )


def score_pairs(pairs: DataFrame, profiles: DataFrame, with_jw: bool = True) -> DataFrame:
    """(conv_a, conv_b, jaccard, containment, lev_sim[, jw], verdict)."""
    j = pairs.join(_side(profiles, "a"), "conv_a").join(_side(profiles, "b"), "conv_b")
    j = j.withColumn("jaccard", F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 6))
    j = j.withColumn("containment", F.round(containment_col(F.col("sh_a"), F.col("sh_b")), 6))
    j = j.withColumn("lev_sim", F.round(levenshtein_sim_col(F.col("text_a"), F.col("text_b")), 6))
    if with_jw:
        j = j.withColumn("jw", F.round(jaro_winkler_col(F.col("text_a"), F.col("text_b")), 6))
    verdict = (
        F.when(F.col("sig_a") == F.col("sig_b"), "exact")
        .when(F.col("jaccard") >= JACCARD_NEAR, "near_dup")
        .when(F.col("containment") >= CONTAIN_NEAR, "resumption")
        .when(F.col("jaccard") >= JACCARD_PARTIAL, "partial")
        .otherwise("far")
    )
    cols = ["conv_a", "conv_b", "jaccard", "containment", "lev_sim"] + (["jw"] if with_jw else [])
    return j.withColumn("verdict", verdict).select(*cols, "verdict")


def matched_edges(scored: DataFrame) -> DataFrame:
    """Edges feeding the clustering stage."""
    return scored.filter(F.col("verdict").isin(*MATCH_VERDICTS)).select(
        F.col("conv_a").alias("src"), F.col("conv_b").alias("dst")
    )
